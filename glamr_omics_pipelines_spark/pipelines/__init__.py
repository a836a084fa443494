"""End-to-end GLAMR domain pipelines re-expressed Spark-first."""
