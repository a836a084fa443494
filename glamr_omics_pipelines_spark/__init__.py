"""glamr_omics_pipelines_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Geo-omics/GLAMR_omics_pipelines.

The reference (studied read-only at /root/reference) is a multi-omics platform:
a Snakemake file dataflow producing tabular results, R-tidyverse post-processing,
and a Postgres warehouse queried through lazy dbplyr pipelines. This package
re-expresses that surface Spark-first: declarative DataFrame/SQL plans optimized
by Catalyst, partitioned Parquet warehouse semantics, and library operators for
the handful of constructs Spark lacks natively (taxonomic subtree rollup, LCA
aggregation, tie-discarding top-1, TPM/RPKM normalization, FASTQ/FASTA scans).

Layout:
  session    — SparkSession bootstrap tuned for local testing, documented for scale
  schema     — infer-then-pin schema registry (postgres.Rmd:281-284 semantics)
  sources    — typed file readers with path-derived columns; FASTQ/FASTA; warehouse merge
  operators  — abundance math, windows, taxonomy, dedup, similarity, text, reshape
  functions  — scalar helpers (bio sequence ops, hashing, json)
  plans      — composed multi-operator views (bin_summary-style)
  streaming  — incremental file ingestion (Trigger.AvailableNow)
"""

from glamr_omics_pipelines_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
