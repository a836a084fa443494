"""Spark 4 Python DataSource wrappers: format('fasta') / format('fastq')
must agree with the primary sources/sequences.py readers on real files."""

import gzip

from glamr_omics_pipelines_spark.sources import sequences
from glamr_omics_pipelines_spark.sources.datasource import (
    register_sequence_sources)

FASTA = ">c1 desc\nACGT\nTTAA\n>c2\nGGGG\n"
FASTQ = "@r1\nACGT\n+\nIIII\n@r2\nTT\n+\nII\n"


def test_fasta_datasource_matches_primary_reader(spark, tmp_path):
    f1 = tmp_path / "a.fa"; f1.write_text(FASTA)
    f2 = tmp_path / "b.fa"; f2.write_text(">x\nAC\n")
    register_sequence_sources(spark)
    df = spark.read.format("fasta").load(str(tmp_path / "*.fa"))
    got = {(r.header, r.seq) for r in df.collect()}
    assert got == {("c1 desc", "ACGTTTAA"), ("c2", "GGGG"), ("x", "AC")}
    # per-file partitions: files parallelize like a built-in source
    assert df.rdd.getNumPartitions() == 2
    # agreement with the JVM lineSep reader on the same file
    jvm = {(r.header, r.seq)
           for r in sequences.read_fasta(spark, str(f1)).collect()}
    assert jvm == {("c1 desc", "ACGTTTAA"), ("c2", "GGGG")}


def test_fastq_datasource_reads_gzip_and_plain(spark, tmp_path):
    plain = tmp_path / "r1.fastq"; plain.write_text(FASTQ)
    gz = tmp_path / "r2.fastq.gz"
    with gzip.open(gz, "wt") as fh:
        fh.write("@g1\nAAAA\n+\nFFFF\n")
    register_sequence_sources(spark)
    df = spark.read.format("fastq").load(str(tmp_path / "*.fastq*"))
    rows = {(r.read_id, r.seq, r.qual, r.record_index) for r in df.collect()}
    assert rows == {("r1", "ACGT", "IIII", 0), ("r2", "TT", "II", 1),
                    ("g1", "AAAA", "FFFF", 0)}


def test_datasource_missing_glob_raises(spark, tmp_path):
    import pytest as _pytest
    register_sequence_sources(spark)
    with _pytest.raises(Exception):
        spark.read.format("fasta").load(str(tmp_path / "nope*.fa")).collect()
