"""Storage retention / vacuum analog (SURVEY §2.1 residue).

Reference semantics: ``code/reduce_storage.R:17-45`` (and the ~10 sibling
stanzas below it) glob candidate intermediate files, parse the SampleID out
of each path (unglue), check whether the downstream artifact that supersedes
them exists (``file.exists`` on a template path), sum candidate sizes, and
report "can clean up N bytes" per rule before deleting. The relational core
is: inventory scan -> path-parse -> existence join -> per-sample rollup.
Actual deletion stays an ops action outside the engine (the reference pipes
the eligible list to ``rm -rf`` via a shell script).

Spark-first: ONE inventory DataFrame (path, file_size) — from
``readers.list_files`` on a real tree, or any table of paths — feeds every
rule. Per rule, candidates and artifacts are two regexp branches over that
scan; eligibility is an equi-join at SAMPLE grain (both sides are first
reduced to per-sample rows, so the shuffle carries O(samples) rows, never
O(files)), and the rollup partial-aggregates map-side. No driver-side glob
loop, no per-file existence stat calls — at 100 TB / 10^9 files the
inventory is a listing-only scan and everything else is sample-grain.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ReclaimRule(NamedTuple):
    """One clean-up stanza of reduce_storage.R.

    ``candidate_re``: regex whose group 1 extracts the sample id from a
    delete-candidate path (non-matching paths are not candidates).
    ``artifact_re``: regex whose group 1 extracts the sample id from the
    downstream artifact whose existence makes the candidates deletable
    (e.g. final.contigs.renamed.fa supersedes intermediate_contigs,
    reduce_storage.R:20-21; decon reads supersede raw reads,
    reduce_storage.R:113-118).
    """

    name: str
    candidate_re: str
    artifact_re: str


def storage_reclaim(inventory: DataFrame, rules: list[ReclaimRule],
                    path_col: str = "path",
                    size_col: str = "file_size") -> DataFrame:
    """Per-(rule, sample) storage-reclamation report.

    Returns (rule, sample_id, n_files, bytes, eligible): how many candidate
    files the sample holds under the rule, their total size, and whether the
    superseding artifact exists — ``eligible AND bytes`` is what the
    reference's ``str_glue("Can clean up ...")`` sums (reduce_storage.R:26).

    Each rule is two row-local regexp branches over the same inventory scan
    (Catalyst reuses the exchange across the union), aggregated to sample
    grain BEFORE the existence join, so no join side ever carries file-grain
    rows.
    """
    if not rules:
        raise ValueError("storage_reclaim needs at least one ReclaimRule "
                         "(an empty rule list has no report shape)")
    path, size = F.col(path_col), F.col(size_col)
    reports = []
    for r in rules:
        cand_sample = F.regexp_extract(path, r.candidate_re, 1)
        agg = (inventory
               .select(cand_sample.alias("sample_id"), size.alias("_sz"))
               .filter(F.col("sample_id") != "")
               .groupBy("sample_id")
               .agg(F.count(F.lit(1)).alias("n_files"),
                    F.sum("_sz").alias("bytes")))
        art_sample = F.regexp_extract(path, r.artifact_re, 1)
        art = (inventory
               .select(art_sample.alias("sample_id"))
               .filter(F.col("sample_id") != "")
               .distinct()
               .withColumn("_have", F.lit(True)))
        rep = (agg.join(art, "sample_id", "left")
               .select(F.lit(r.name).alias("rule"), "sample_id",
                       "n_files", "bytes",
                       F.coalesce(F.col("_have"), F.lit(False))
                       .alias("eligible")))
        reports.append(rep)
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out


def reclaim_summary(report: DataFrame) -> DataFrame:
    """Per-rule rollup of ``storage_reclaim``: the reference's "Can clean up
    {bytes} of extraneous ... output" line (reduce_storage.R:26,45,80) as a
    table — (rule, n_eligible_samples, n_files, reclaimable_bytes), eligible
    rows only."""
    return (report.filter(F.col("eligible"))
            .groupBy("rule")
            .agg(F.count(F.lit(1)).alias("n_eligible_samples"),
                 F.sum("n_files").alias("n_files"),
                 F.sum("bytes").alias("reclaimable_bytes")))
