"""FASTQ / FASTA DataFrame readers (SURVEY S1/S2) — sequence-native sources.

Reference semantics:
  - FASTQ: 4-line records (@id / seq / + / qual), gzip transparent, paired
    files interleave-checked (pypelib/raw_reads.py:271-338,
    code/RemovePolyPairs.pl:32-40).
  - FASTA: '>'-delimited records, header fields split into columns
    (code/rename_contigs.R:46-83, code/standardize_bins.R:128-137).

Spark-first (and the 100 TB scan path):
  - FASTA is read by the JVM text datasource with a custom ``lineSep`` of
    '\\n>', so record framing happens at SPLIT level inside the scan — each
    multi-GB FASTA splits across executors with no driver involvement — and
    record assembly (header/body split, newline removal) is pure Column
    expressions inside whole-stage codegen. No Python evaluates in the plan.
  - FASTQ's 4-line framing is not split-safe on raw text (a split boundary
    can land mid-record, and gzip is unsplittable anyway), so the reader
    processes one FILE per task — parallelism across files, the reference's
    own unit of work (one fastq per sample per direction). Parsing is
    Arrow-batched ``mapInPandas`` over a file-name frame: the stream parser
    accumulates bounded record batches and ships them as Arrow columns, so
    the per-record Python-object tax of an rdd.flatMap generator is replaced
    by one columnar transfer per ~8k records. For splittable scale-out of a
    single huge uncompressed FASTQ, re-frame via an '@'-delimiter variant.
"""

from __future__ import annotations

import gzip
import io
import os
from collections.abc import Iterator

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
    """FASTA → DataFrame(header, seq), fully JVM-side.

    ``spark.read.text`` with ``lineSep='\\n>'`` frames one '>' record per row
    at split level (splittable, no driver listing), then Column expressions
    assemble the record: first line → header ('>' and trailing CR trimmed),
    remaining lines → seq with newlines removed. The whole plan stays inside
    whole-stage codegen — no Python worker ever sees a contig byte.
    (Same result as the reference's readDNAStringSet, code/rename_contigs.R:46,
    minus the single-node memory cap.)
    """
    raw = spark.read.option("lineSep", "\n>").text(path)
    first_line = F.substring_index("value", "\n", 1)
    header = F.trim(F.translate(F.regexp_replace(first_line, "^>+", ""),
                                "\r", ""))
    # body = everything after the first newline; absent newline -> ''
    body = F.expr(
        "substring(value, length(substring_index(value, '\n', 1)) + 2)")
    seq = F.translate(body, "\n\r", "")
    return (raw.filter(F.trim("value") != "")
            .select(header.alias("header"), seq.alias("seq")))


def read_fastq(spark: SparkSession, paths: list[str] | str,
               parallelism: int | None = None,
               batch_size: int = 8192) -> DataFrame:
    """FASTQ(.gz) → DataFrame(read_id, seq, qual, file, record_index).

    One file per task (gzip is unsplittable; 4-line framing is not
    boundary-safe). Arrow-batched: ``mapInPandas`` over a file-name frame —
    the stream parser yields one pandas batch per ``batch_size`` records, so
    data crosses the JVM↔Python boundary as columnar Arrow buffers, not
    per-record Python tuples. Constant memory per task (one batch in flight).
    """
    if isinstance(paths, str):
        paths = [paths]
    paths = [os.path.abspath(p) for p in paths]
    n = parallelism or len(paths)
    files = spark.createDataFrame(
        [(p,) for p in paths],
        StructType([StructField("file", StringType())])).repartition(n)

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def flush(ids, seqs, quals, path, start):
            return pd.DataFrame({
                "read_id": ids, "seq": seqs, "qual": quals,
                "file": path,
                "record_index": range(start, start + len(ids))})

        for pdf in batches:
            for path in pdf["file"].tolist():
                opener = gzip.open if path.endswith(".gz") else open
                with opener(path, "rb") as fh:
                    text = io.TextIOWrapper(fh)
                    ids, seqs, quals = [], [], []
                    emitted = 0
                    while True:
                        h = text.readline()
                        if not h:
                            break
                        if not h.strip():
                            # trailing blank line (file concatenation,
                            # editor artifacts): skip, don't emit a
                            # phantom empty record
                            continue
                        # rstrip('\r\n'), matching datasource.FastqReader:
                        # a CRLF file must not leak '\r' into seq/qual
                        # (off-by-one lengths, Phred decode of chr(13))
                        ids.append(h.rstrip("\r\n").lstrip("@"))
                        seqs.append(text.readline().rstrip("\r\n"))
                        text.readline()  # '+' separator line
                        quals.append(text.readline().rstrip("\r\n"))
                        if len(ids) >= batch_size:
                            yield flush(ids, seqs, quals, path, emitted)
                            emitted += len(ids)
                            ids, seqs, quals = [], [], []
                    if ids:
                        yield flush(ids, seqs, quals, path, emitted)

    return files.mapInPandas(parse, FASTQ_SCHEMA)


def _strip_pair_suffix(col) -> "F.Column":
    """Read id with the pair-direction suffix removed.

    Handles both common conventions: legacy '/1' '/2' suffixes and the
    space-separated Casava '1:...' '2:...' comment (id token before first
    whitespace), per the reference's interleave check
    (pypelib/raw_reads.py:271-338)."""
    token = F.substring_index(F.substring_index(col, " ", 1), "\t", 1)
    return F.regexp_replace(token, "/[12]$", "")


def read_fastq_pairs(spark: SparkSession, fwd: str, rev: str,
                     id_check: str = "flag") -> DataFrame:
    """Paired FASTQ → one row per pair (fwd_*, rev_*), joined on record index.

    Pairing is positional, as in the reference (raw_reads.py:291-333), but —
    unlike a bare positional zip — each pair's read ids are verified to agree
    after stripping the '/1'-'/2' (or Casava comment) direction suffix, the
    reference's interleave check (raw_reads.py:271-338). ``id_check``:

      - ``"flag"`` (default): adds boolean ``id_match`` so mis-paired rows
        are diagnosable downstream (distributed-friendly: no driver action).
      - ``"strict"``: raises ``ValueError`` naming the first few mismatched
        record indexes (forces a count — use at ingest boundaries).
      - ``"none"``: positional pairing only (pre-round-4 behavior).

    A length mismatch between the files surfaces as dropped rows (inner join
    on record_index) — compare counts to detect, as the reference does via
    its spots invariant (raw_reads.py:17-49).
    """
    if id_check not in ("flag", "strict", "none"):
        raise ValueError(f"id_check must be flag|strict|none, got {id_check!r}")
    f = read_fastq(spark, fwd).select(
        F.col("read_id").alias("fwd_id"), F.col("seq").alias("fwd_seq"),
        F.col("qual").alias("fwd_qual"), "record_index")
    r = read_fastq(spark, rev).select(
        F.col("read_id").alias("rev_id"), F.col("seq").alias("rev_seq"),
        F.col("qual").alias("rev_qual"), "record_index")
    pairs = f.join(r, "record_index", "inner")
    if id_check == "none":
        return pairs
    match = (_strip_pair_suffix(F.col("fwd_id"))
             == _strip_pair_suffix(F.col("rev_id")))
    pairs = pairs.withColumn("id_match", match)
    if id_check == "strict":
        bad = (pairs.filter(~F.col("id_match"))
               .select("record_index", "fwd_id", "rev_id").limit(5).collect())
        if bad:
            detail = ", ".join(
                f"#{b['record_index']}: {b['fwd_id']!r} vs {b['rev_id']!r}"
                for b in bad)
            raise ValueError(
                f"paired FASTQ id mismatch between {fwd} and {rev}: {detail}")
        return pairs.drop("id_match")
    return pairs
