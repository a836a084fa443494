"""FASTQ / FASTA DataFrame readers (SURVEY S1/S2) — sequence-native sources.

Reference semantics:
  - FASTQ: 4-line records (@id / seq / + / qual), gzip transparent, paired
    files interleave-checked (pypelib/raw_reads.py:291-338,
    code/RemovePolyPairs.pl:32-40).
  - FASTA: '>'-delimited records, header fields split into columns
    (code/rename_contigs.R:46-83, code/standardize_bins.R:128-137).

Spark-first:
  - FASTA uses the Hadoop text input format with a custom record delimiter
    ('\\n>') so record assembly happens at SPLIT level — each multi-GB FASTA
    splits across executors with no driver involvement and no 4-line
    alignment problem.
  - FASTQ's 4-line framing is not split-safe on raw text (a split boundary
    can land mid-record, and gzip is unsplittable anyway), so the reader
    processes one FILE per task via mapPartitions over a file list —
    parallelism across files (the reference's own unit of work: one fastq
    per sample per direction). For splittable scale-out of a single huge
    uncompressed FASTQ, re-frame via the '@'-delimiter variant.
"""

from __future__ import annotations

import gzip
import io
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

FASTQ_SCHEMA = StructType([
    StructField("read_id", StringType()),
    StructField("seq", StringType()),
    StructField("qual", StringType()),
    StructField("file", StringType()),
    StructField("record_index", LongType()),
])

FASTA_SCHEMA = StructType([
    StructField("header", StringType()),
    StructField("seq", StringType()),
])


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """FASTA → DataFrame(header, seq) via custom record delimiter.

    Splittable: Hadoop's TextInputFormat honors textinputformat.record.delimiter,
    so each '>' record is one row regardless of file size. (Same plan the
    reference's readDNAStringSet implies, minus the single-node memory cap.)
    """
    conf = {"textinputformat.record.delimiter": "\n>"}
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf=conf).map(lambda kv: kv[1])

    def assemble(rec: str):
        rec = rec.lstrip(">").strip()
        if not rec:
            return None
        head, _, body = rec.partition("\n")
        return (head.strip(), body.replace("\n", ""))

    rows = rdd.map(assemble).filter(lambda r: r is not None)
    return spark.createDataFrame(rows, FASTA_SCHEMA)


def read_fastq(spark: SparkSession, paths: list[str] | str,
               parallelism: int | None = None) -> DataFrame:
    """FASTQ(.gz) → DataFrame(read_id, seq, qual, file, record_index).

    One file per task (gzip is unsplittable; 4-line framing is not
    boundary-safe). Python-side parse is a generator over the stream —
    constant memory per task.
    """
    if isinstance(paths, str):
        paths = [paths]
    paths = [os.path.abspath(p) for p in paths]
    sc = spark.sparkContext
    n = parallelism or len(paths)

    def parse_file(path: str):
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rb") as fh:
            text = io.TextIOWrapper(fh)
            idx = 0
            while True:
                h = text.readline()
                if not h:
                    return
                seq = text.readline().rstrip("\n")
                text.readline()  # '+'
                qual = text.readline().rstrip("\n")
                yield (h.rstrip("\n").lstrip("@"), seq, qual, path, idx)
                idx += 1

    rdd = sc.parallelize(paths, n).flatMap(parse_file)
    return spark.createDataFrame(rdd, FASTQ_SCHEMA)


def read_fastq_pairs(spark: SparkSession, fwd: str, rev: str) -> DataFrame:
    """Paired FASTQ → one row per pair (fwd_*, rev_*), joined on record index.

    Mirrors the reference's interleave check (raw_reads.py:291-338): pairing
    is positional; the join on (record_index) enforces it, and a count
    mismatch surfaces as unmatched rows (inner join drops them — compare
    counts to detect).
    """
    f = read_fastq(spark, fwd).select(
        F.col("read_id").alias("fwd_id"), F.col("seq").alias("fwd_seq"),
        F.col("qual").alias("fwd_qual"), "record_index")
    r = read_fastq(spark, rev).select(
        F.col("read_id").alias("rev_id"), F.col("seq").alias("rev_seq"),
        F.col("qual").alias("rev_qual"), "record_index")
    return f.join(r, "record_index", "inner")
