"""Storage reclaim (sources/retention.py) — the reduce_storage.R analog.

Reference rule under test (code/reduce_storage.R:17-45): intermediate contig
directories are delete-eligible iff the finished assembly artifact exists;
the report sums candidate bytes per sample.
"""

import os

from pyspark.sql import functions as F

from glamr_omics_pipelines_spark.sources import readers
from glamr_omics_pipelines_spark.sources.retention import (
    ReclaimRule, reclaim_summary, storage_reclaim)

RULES = [
    ReclaimRule(
        "megahit_intermediate",
        r"(samp_\d+)/assembly/intermediate_contigs/",
        r"(samp_\d+)/assembly/final\.contigs\.fa$"),
]


def _inventory(spark, rows):
    return spark.createDataFrame(rows, "path string, file_size long")


def test_eligible_only_when_artifact_exists(spark):
    inv = _inventory(spark, [
        ("samp_1/assembly/intermediate_contigs/k21.fa", 100),
        ("samp_1/assembly/intermediate_contigs/k33.fa", 50),
        ("samp_1/assembly/final.contigs.fa", 10),
        ("samp_2/assembly/intermediate_contigs/k21.fa", 70),
        # samp_2 has no final contigs -> not eligible
    ])
    out = {r["sample_id"]: r for r in
           storage_reclaim(inv, RULES).collect()}
    assert out["samp_1"]["eligible"] and out["samp_1"]["bytes"] == 150
    assert out["samp_1"]["n_files"] == 2
    assert not out["samp_2"]["eligible"] and out["samp_2"]["bytes"] == 70


def test_artifact_rows_are_not_candidates(spark):
    inv = _inventory(spark, [
        ("samp_1/assembly/final.contigs.fa", 10),
    ])
    assert storage_reclaim(inv, RULES).count() == 0  # artifact != candidate


def test_summary_counts_eligible_only(spark):
    inv = _inventory(spark, [
        ("samp_1/assembly/intermediate_contigs/k21.fa", 100),
        ("samp_1/assembly/final.contigs.fa", 10),
        ("samp_2/assembly/intermediate_contigs/k21.fa", 70),
    ])
    s = reclaim_summary(storage_reclaim(inv, RULES)).collect()
    assert len(s) == 1
    assert s[0]["rule"] == "megahit_intermediate"
    assert s[0]["n_eligible_samples"] == 1
    assert s[0]["reclaimable_bytes"] == 100


def test_multiple_rules_union(spark):
    inv = _inventory(spark, [
        ("samp_1/reads/raw_fwd.fastq.gz", 500),
        ("samp_1/reads/decon_fwd.fastq.gz", 20),
        ("samp_1/assembly/intermediate_contigs/k21.fa", 100),
    ])
    rules = RULES + [ReclaimRule(
        "raw_reads", r"(samp_\d+)/reads/raw_fwd\.fastq\.gz$",
        r"(samp_\d+)/reads/decon_fwd\.fastq\.gz$")]
    out = storage_reclaim(inv, rules)
    by_rule = {r["rule"]: r for r in out.collect()}
    assert set(by_rule) == {"megahit_intermediate", "raw_reads"}
    assert by_rule["raw_reads"]["eligible"]
    assert not by_rule["megahit_intermediate"]["eligible"]


def test_end_to_end_on_real_tree(spark, tmp_path):
    """list_files inventory scan -> storage_reclaim on an actual directory
    tree — the full reduce_storage.R loop with no driver-side glob."""
    for samp, finished in [("samp_1", True), ("samp_2", False)]:
        d = tmp_path / samp / "assembly" / "intermediate_contigs"
        d.mkdir(parents=True)
        (d / "k21.fa").write_text("ACGT" * 10)
        if finished:
            (tmp_path / samp / "assembly" / "final.contigs.fa").write_text("A")
    # a glob element matching a directory (intermediate_contigs) lists the
    # files inside it — same as the reference's recursive fs::dir_ls
    inv = readers.list_files(spark, os.path.join(str(tmp_path), "*", "assembly", "*"))
    out = {r["sample_id"]: r for r in storage_reclaim(
        inv.select("path", "file_size"), RULES).collect()}
    assert out["samp_1"]["eligible"] and out["samp_1"]["bytes"] == 40
    assert not out["samp_2"]["eligible"]
