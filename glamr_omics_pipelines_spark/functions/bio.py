"""Bio-sequence scalar functions (SURVEY §2.9) — all pure Column expressions.

Reference precedents: gc_content column (postgres.Rmd:1196), homopolymer
detection + uppercase normalization (code/RemovePolyPairs.pl:32-40), read
quality filters (fastp args, Snakefile:557-572), seqkit stats
(Snakefile:4606-4619).

No UDFs: every helper compiles to JVM expressions inside whole-stage codegen,
so read-level filters run at scan speed on 100 TB of sequence data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def seq_length(seq) -> Column:
    return F.length(seq)


def gc_content(seq) -> Column:
    """Fraction of G/C bases (case-insensitive)."""
    up = F.upper(F.col(seq) if isinstance(seq, str) else seq)
    gc = F.length(F.regexp_replace(up, "[^GC]", ""))
    return gc / F.greatest(F.length(up), F.lit(1))


def n_count(seq) -> Column:
    """Count of ambiguous (N) bases."""
    up = F.upper(F.col(seq) if isinstance(seq, str) else seq)
    return F.length(F.regexp_replace(up, "[^N]", ""))


def reverse_complement(seq) -> Column:
    """Reverse complement via translate + reverse (JVM-side)."""
    up = F.upper(F.col(seq) if isinstance(seq, str) else seq)
    return F.reverse(F.translate(up, "ACGTN", "TGCAN"))


def has_homopolymer(seq, min_run: int = 20) -> Column:
    """True when any base repeats >= min_run times (RemovePolyPairs.pl:36)."""
    pat = "|".join(f"{b}{{{min_run},}}" for b in "ACGT")
    return F.upper(F.col(seq) if isinstance(seq, str) else seq).rlike(pat)


def mean_qual(qual, offset: int = 33) -> Column:
    """Mean Phred quality of a quality string — decode via higher-order
    functions (ascii(c)-offset averaged), no UDF."""
    chars = F.filter(F.split(F.col(qual) if isinstance(qual, str) else qual, ""),
                     lambda c: c != "")
    total = F.aggregate(chars, F.lit(0), lambda acc, c: acc + F.ascii(c) - offset)
    return total / F.greatest(F.array_size(chars), F.lit(1))


def quality_filter(df: DataFrame, seq: str = "seq", min_len: int = 50,
                   max_n: int = 5, max_homopolymer: int = 20) -> DataFrame:
    """fastp-shaped read filter (P5/P6): min length, N cap, homopolymer drop."""
    return df.filter((seq_length(seq) >= min_len)
                     & (n_count(seq) <= max_n)
                     & ~has_homopolymer(seq, max_homopolymer))


def dedup_pairs(df: DataFrame, fwd: str = "fwd_seq", rev: str = "rev_seq") -> DataFrame:
    """Exact read-pair dedup on (fwd_seq, rev_seq) (RemovePolyPairs.pl:58-80)."""
    return df.dropDuplicates([fwd, rev])


def seqkit_stats(df: DataFrame, group_cols: list[str], len_col: str) -> DataFrame:
    """seqkit-stats aggregate (A14): n, sum, min, Q1/Q2/Q3, max per group.

    Exact percentile (not approx) to match seqkit's quartiles — fine for
    per-sample groups; switch to percentile_approx for billion-read groups.
    """
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("num_seqs"),
        F.sum(len_col).alias("sum_len"),
        F.min(len_col).alias("min_len"),
        F.expr(f"percentile({len_col}, 0.25)").alias("q1"),
        F.expr(f"percentile({len_col}, 0.5)").alias("q2"),
        F.expr(f"percentile({len_col}, 0.75)").alias("q3"),
        F.max(len_col).alias("max_len"))
