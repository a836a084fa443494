"""Tabular sinks (SURVEY §2.1 S11/S12, §2.8 R8).

The reference ends most Layer-B pipelines in ``write_tsv``/``write_csv`` —
sometimes headerless for tool-consumption (`code/make_das_and_drep_inputs.R:64`,
`code/merge_bracken.R:72,78`) — and has one fan-out export that slices a wide
coverage matrix into one two-column headerless depth file per sample for
maxbin (`code/create_maxbin_coverage.R:36-54`, a driver ``for`` loop of
``select + write_tsv``).

Spark-first disposition:

* ``write_tsv`` is a thin, partition-parallel ``df.write.csv`` wrapper —
  the reference's single-file outputs exist because R is single-process;
  at 100 TB a directory of part files IS the artifact, with an opt-in
  ``single_file`` coalesce for small tool-input exports.
* The maxbin fan-out is re-expressed as ONE pass: unpivot wide→long, then
  ``partitionBy(sample)`` write. The reference's loop re-reads the matrix
  once per sample (N scans); the long-format write reads it once and lets
  the committer fan files out — the difference between O(N·|data|) and
  O(|data|) at 1000 samples.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def write_tsv(df: DataFrame, path: str, header: bool = True,
              single_file: bool = False, mode: str = "overwrite") -> None:
    """S11: ``write_tsv`` analog (`merge_bracken.R:72`). ``header=False``
    matches the reference's headerless tool inputs
    (`make_das_and_drep_inputs.R:64`)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("sep", "\t").option("header", header).csv(path)


def export_matrix_column_slices(df: DataFrame, id_col: str, out_dir: str,
                                value_cols: list[str] | None = None,
                                mode: str = "overwrite") -> None:
    """R8: per-sample depth-file export (`create_maxbin_coverage.R:36-54`).

    Wide matrix (id × sample columns) → one ``sample=<s>/`` directory of
    headerless ``(id, depth)`` TSV per sample, in a single data pass:
    ``stack`` to long, write ``partitionBy(sample)``. Replaces the
    reference's per-sample select+write loop (N full scans of the matrix).
    """
    value_cols = value_cols or [c for c in df.columns if c != id_col]
    long = df.unpivot(id_col, value_cols, "sample", "depth")
    (long.repartition("sample")
     .write.mode(mode).partitionBy("sample")
     .option("sep", "\t").option("header", False)
     .csv(out_dir))


def write_depths_manifest(out_dir: str, manifest_path: str) -> list[str]:
    """The ``depths.txt`` list-of-files the reference writes for maxbin
    (`create_maxbin_coverage.R:52-54`). Driver-side: it lists paths, not
    data."""
    dirs = sorted(d for d in os.listdir(out_dir) if d.startswith("sample="))
    with open(manifest_path, "w") as fh:
        fh.write("\n".join(os.path.join(out_dir, d) for d in dirs) + "\n")
    return dirs
