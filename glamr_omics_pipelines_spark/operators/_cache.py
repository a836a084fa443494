"""Persist-handle registry: a release path for operator-internal caches.

Several operators persist() intermediates that feed multiple subplans (LSH
bucket tables, shingle inverted indexes, closure frontiers). The DataFrames
they return reference those caches lazily, so the operator cannot know when
its consumer is done and must not unpersist eagerly. This registry keeps a
weak handle to every such cache so library consumers can release them all
with one call once their results are materialized:

    from glamr_omics_pipelines_spark.operators import _cache
    ...  # run dedup / similarity pipelines, collect/write results
    _cache.release_caches()

``spark.catalog.clearCache()`` (what bench.py uses between queries) is the
global-hammer equivalent; release_caches() only touches caches this library
created. Handles are weak references: a cache whose DataFrame was garbage
collected is skipped (Spark frees its blocks with the RDD).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_HANDLES: list["weakref.ref[DataFrame]"] = []


def register(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() a DataFrame and record a releasable weak handle to it."""
    df.persist(storage_level) if storage_level is not None else df.persist()
    _HANDLES.append(weakref.ref(df))
    return df


def release_caches() -> int:
    """Unpersist every still-live registered cache; returns how many."""
    released = 0
    for ref in _HANDLES:
        df = ref()
        if df is None:
            continue
        try:
            df.unpersist()
            released += 1
        except Exception:  # session already stopped — nothing to release
            pass
    _HANDLES.clear()
    return released
