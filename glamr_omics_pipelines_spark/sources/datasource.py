"""Spark Python DataSource API (Spark 4) wrappers for sequence formats.

Gives the sequence readers the NATIVE Spark source UX —

    register_sequence_sources(spark)
    df = spark.read.format("fasta").load("/data/contigs/*.fa")
    df = spark.read.format("fastq").load("/data/reads/*.fastq.gz")

— with one input partition per file, so a directory of run files
parallelizes across executors exactly like a built-in file source (the
reference's per-sample file layout, Snakefile results trees, maps 1:1 onto
partitions). The parse kernels are the same record framings as
``sources/sequences.py`` (read_fasta's '>' records, read_fastq's 4-line
records with gzip support).

Positioning vs the primary readers: ``read_fasta`` (JVM lineSep scan, zero
Python in the plan) stays the 100 TB scan path for plain-text FASTA — this
DataSource runs its parse in Python workers, so it trades peak scan
throughput for the standard source API, schema discovery, and per-file
partition pruning. For gzip FASTQ the two paths cost the same (gzip framing
is unsplittable either way, and the primary reader is Arrow-batched Python
too).
"""

from __future__ import annotations

import glob as _glob
import gzip
import io

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

FASTA_DS_SCHEMA = "header string, seq string, file string"
FASTQ_DS_SCHEMA = ("read_id string, seq string, qual string, file string, "
                   "record_index bigint")


def _open_text(path: str):
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"))
    return open(path, "r")


def _expand(path_opt: str) -> list[str]:
    paths = sorted(p for pat in path_opt.split(",")
                   for p in _glob.glob(pat.strip()))
    if not paths:
        raise FileNotFoundError(f"no files match {path_opt!r}")
    return paths


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class FastaDataSource(DataSource):
    """``spark.read.format('fasta')`` — one row per '>' record."""

    @classmethod
    def name(cls) -> str:
        return "fasta"

    def schema(self) -> str:
        return FASTA_DS_SCHEMA

    def reader(self, schema) -> "FastaReader":
        return FastaReader(self.options)


class FastaReader(DataSourceReader):
    def __init__(self, options):
        self._paths = _expand(options.get("path"))

    def partitions(self):
        return [_FilePartition(p) for p in self._paths]

    def read(self, partition):
        path = partition.path
        header, chunks = None, []
        with _open_text(path) as fh:
            for line in fh:
                line = line.rstrip("\r\n")
                if line.startswith(">"):
                    if header is not None:
                        yield (header, "".join(chunks), path)
                    header, chunks = line.lstrip(">").strip(), []
                elif line:
                    chunks.append(line)
        if header is not None:
            yield (header, "".join(chunks), path)


class FastqDataSource(DataSource):
    """``spark.read.format('fastq')`` — one row per 4-line record, gzip ok."""

    @classmethod
    def name(cls) -> str:
        return "fastq"

    def schema(self) -> str:
        return FASTQ_DS_SCHEMA

    def reader(self, schema) -> "FastqReader":
        return FastqReader(self.options)


class FastqReader(DataSourceReader):
    def __init__(self, options):
        self._paths = _expand(options.get("path"))

    def partitions(self):
        return [_FilePartition(p) for p in self._paths]

    def read(self, partition):
        path = partition.path
        with _open_text(path) as fh:
            idx = 0
            while True:
                h = fh.readline()
                if not h:
                    break
                if not h.strip():  # trailing blank line: no phantom record
                    continue
                seq = fh.readline().rstrip("\r\n")
                fh.readline()  # '+' separator
                qual = fh.readline().rstrip("\r\n")
                yield (h.rstrip("\r\n").lstrip("@"), seq, qual, path, idx)
                idx += 1


def register_sequence_sources(spark) -> None:
    """Register both formats on this session (idempotent)."""
    spark.dataSource.register(FastaDataSource)
    spark.dataSource.register(FastqDataSource)
