"""Amplicon/ASV operators (SURVEY A15, §2.11 grouped-map).

Reference: the dada2 R pipeline denoises per sample (error model →
merge → chimera removal, code/ampliconTrunc.R:280-323) and emits a
sample × ASV count matrix (ampliconTrunc.R:318-323).

Spark-first split (SURVEY §7.2 milestone 8): the *relational tail* (count,
pivot) is pure DataFrame; the per-sample statistical denoise is a grouped-map
``applyInPandas`` — Arrow-batched, one task per sample, exactly the
reference's per-sample parallelization unit (future_map over samples).

The denoiser here is a deterministic dada2-*shaped* stand-in: identical-read
counting + single-substitution error pooling (a read's count merges into a
≥ ``min_fold``× more abundant neighbor at Hamming distance 1 — the core
dada2 intuition without the learned error rates). Swap `_pool_errors` for a
real error model at deployment; the Spark plumbing is identical.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _neighbors1(seq: str, alphabet: str = "ACGT") -> Iterator[str]:
    for i, c in enumerate(seq):
        for b in alphabet:
            if b != c:
                yield seq[:i] + b + seq[i + 1:]


def _pool_errors(counts: Counter, min_fold: int) -> Counter:
    """Merge low-abundance reads into a Hamming-1 neighbor that is at least
    min_fold x more abundant (deterministic: most-abundant neighbor wins,
    ties by sequence order)."""
    out = Counter()
    for seq in sorted(counts, key=lambda s: (-counts[s], s)):
        n = counts[seq]
        best = None
        for nb in _neighbors1(seq):
            if out.get(nb, 0) >= min_fold * n:
                cand = (out[nb], nb)
                if best is None or cand > best:
                    best = cand
        if best is not None:
            out[best[1]] += n
        else:
            out[seq] += n
    return out


def denoise_asvs(reads: DataFrame, sample_col: str = "sample",
                 seq_col: str = "seq", min_fold: int = 10) -> DataFrame:
    """Per-sample ASV inference via grouped-map applyInPandas.

    Input: one row per read. Output: (sample, asv_seq, count).
    Scale: one Arrow batch stream per sample; state is the per-sample
    Counter (bounded by distinct reads per sample, the same bound dada2
    itself needs)."""
    schema = f"{sample_col} string, asv_seq string, count bigint"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        sample = pdf[sample_col].iloc[0]
        pooled = _pool_errors(Counter(pdf[seq_col]), min_fold)
        return pd.DataFrame(
            [(sample, s, c) for s, c in sorted(pooled.items())],
            columns=[sample_col, "asv_seq", "count"])

    return reads.select(sample_col, seq_col).groupBy(sample_col) \
        .applyInPandas(fn, schema)


def asv_matrix(asvs: DataFrame, sample_col: str = "sample",
               seq_col: str = "asv_seq", count_col: str = "count",
               samples: list[str] | None = None) -> DataFrame:
    """sample × ASV wide matrix (ampliconTrunc.R:318-323): ASVs as rows,
    samples as columns, absent → 0. Long format is the scale-safe canonical
    form; pivot at export (SURVEY §7.3 hard part 3)."""
    g = asvs.groupBy(seq_col)
    p = g.pivot(sample_col, samples) if samples else g.pivot(sample_col)
    return p.agg(F.first(count_col)).na.fill(0)
