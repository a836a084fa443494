"""Bio-sequence scalar functions (SURVEY §2.9) — all pure Column expressions.

Reference precedents: gc_content column (postgres.Rmd:1196), homopolymer
detection + uppercase normalization (code/RemovePolyPairs.pl:32-40), read
quality filters (fastp args, Snakefile:557-572), seqkit stats
(Snakefile:4606-4619).

No UDFs: every helper compiles to JVM expressions inside whole-stage codegen,
so read-level filters run at scan speed on 100 TB of sequence data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def phred_array(qual, offset: int = 33) -> Column:
    """array<int> of Phred scores decoded from a quality string (no UDF)."""
    chars = F.filter(F.split(F.col(qual) if isinstance(qual, str) else qual, ""),
                     lambda c: c != "")
    return F.transform(chars, lambda c: F.ascii(c) - offset)


def sequence_complexity(seq) -> Column:
    """fastp sequence complexity: percent of positions whose base differs from
    the next base (Snakefile:566 --low_complexity_filter). 0 for length<=1.

    Computed via run-collapsing, not per-char lambdas: collapsing every
    repeat run to one char (regexp_replace '(.)\\1+' -> '$1') gives
    runs = length(collapsed), and adjacent-differing pairs = runs − 1 —
    identical math, but pure JVM regex instead of an interpreted
    higher-order fold (measured 10.9 s -> sub-second on 4k reads; HOF
    lambdas evaluate interpreted per element)."""
    up = F.upper(F.col(seq) if isinstance(seq, str) else seq)
    n = F.length(up)
    runs = F.length(F.regexp_replace(up, r"(.)\1+", "$1"))
    return (F.when(n <= 1, F.lit(0.0))
            .otherwise(F.lit(100.0) * (runs - 1) / (n - 1)))


def low_complexity_filter(df: DataFrame, seq: str = "seq",
                          threshold: float = 30.0) -> DataFrame:
    """Drop reads below the complexity threshold (fastp
    --complexity_threshold; the reference pipeline uses 7, Snakefile:566)."""
    return df.filter(sequence_complexity(seq) >= threshold)


def sliding_window_trim(df: DataFrame, seq: str = "seq", qual: str = "qual",
                        window: int = 4, min_mean_q: int = 20,
                        offset: int = 33, cut_front: bool = True,
                        cut_tail: bool = True,
                        out_seq: str = "trimmed_seq",
                        out_qual: str = "trimmed_qual") -> DataFrame:
    """fastp --cut_front/--cut_tail sliding-window quality trim
    (Snakefile:568-571: --cut_window_size=4 --cut_mean_quality 20).

    Semantics (fastp's documented behavior, deterministic and oracle-exact):
      - front: slide a window of ``window`` bases (clipped at the read end)
        from the 5' end; trim one base while the window mean quality is below
        ``min_mean_q``; keep from the first position whose window passes.
        A read with no passing window trims to empty.
      - tail: symmetric from the 3' end — keep up to the last position whose
        ENDING window (clipped at the read start) passes.

    Pure Column expressions (higher-order functions over the decoded Phred
    array) — no Python in the plan. The Phred array and the front/tail cut
    positions are MATERIALIZED as intermediate columns (``_p``/``_f``/``_t``):
    higher-order lambdas inline whatever expression tree they reference, so
    leaving them as raw expressions re-evaluates the array decode inside
    every window probe and the whole front scan inside every tail probe — a
    multiplicative interpreted blowup measured at ~50 ms/row. With the
    columns pinned (CollapseProject keeps multi-referenced non-cheap aliases
    un-inlined), the cost is the intended O(len*window) per read. Adds
    ``out_seq``/``out_qual`` (trimmed) plus ``front_cut``/``tail_cut`` counts.
    """
    W, Q = window, min_mean_q
    df = df.withColumn("_p", phred_array(qual, offset))
    p = F.col("_p")
    n = F.size(p)

    def wmean_from(i):  # window STARTING at 0-based i, clipped at the end
        sl = F.slice(p, i + 1, F.least(F.lit(W), n - i))
        return F.aggregate(sl, F.lit(0), lambda a, x: a + x) / F.size(sl)

    def wmean_to(j):  # window ENDING at 1-based j, clipped at the start
        sl = F.slice(p, F.greatest(j - W + 1, F.lit(1)), F.least(F.lit(W), j))
        return F.aggregate(sl, F.lit(0), lambda a, x: a + x) / F.size(sl)

    if cut_front:
        ok_from = F.filter(F.sequence(F.lit(0), n - 1),
                           lambda i: wmean_from(i) >= Q)
        front = (F.when(n == 0, F.lit(0))
                 .otherwise(F.coalesce(F.get(ok_from, 0), n)))
    else:
        front = F.lit(0)
    df = df.withColumn("_f", front)
    fcol = F.col("_f")
    if cut_tail:
        ok_to = F.filter(F.sequence(F.lit(1), n),
                         lambda j: (j > fcol) & (wmean_to(j) >= Q))
        tail = (F.when(n == 0, F.lit(0))
                .otherwise(F.coalesce(F.try_element_at(ok_to, F.lit(-1)), fcol)))
    else:
        tail = n
    df = df.withColumn("_t", tail)
    keep_len = F.col("_t") - F.col("_f")
    return (df.withColumn(out_seq,
                          F.substring(F.col(seq), F.col("_f") + 1, keep_len))
            .withColumn(out_qual,
                        F.substring(F.col(qual), F.col("_f") + 1, keep_len))
            .withColumn("front_cut", F.col("_f").cast("bigint"))
            .withColumn("tail_cut",
                        (F.length(seq) - F.col("_t")).cast("bigint"))
            .drop("_p", "_f", "_t"))


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


def kmer_spectrum(df: DataFrame, seq_col: str = "seq", k: int = 4) -> DataFrame:
    """k-mer spectrum: occurrence count of every length-k substring across
    all sequences — the bio analog of an n-gram vocabulary (sourmash/k-mer
    profile territory, Snakefile:2529's sketch inputs; also the shingle stage
    of MinHash dedup applied to DNA).

    sequence() + transform + explode keeps extraction inside whole-stage
    codegen (no UDF); the count is a map-side partial agg over k-byte
    strings, so the shuffle carries (kmer, partial_count) pairs — bounded by
    4^k distinct k-mers for DNA, not by corpus size. Sequences shorter than
    k are dropped up front so sequence(1, n) never sees a negative span.
    """
    kmers = (df.filter(F.length(seq_col) >= k)
             .select(F.explode(F.expr(
                 f"transform(sequence(1, length({seq_col}) - {k - 1}), "
                 f"i -> substring({seq_col}, i, {k}))")).alias("kmer")))
    return kmers.groupBy("kmer").agg(F.count(F.lit(1)).alias("n"))


def nx_stats(df: DataFrame, group_cols: list[str], len_col: str,
             id_col: str, fractions=(0.5, 0.9)) -> DataFrame:
    """Assembly Nx/Lx ladder (seqkit stats -a / QUAST shape): per group, the
    N50/N90-style contiguity stats the reference's assembly QC reports
    (Snakefile:4606-4619 runs seqkit stats -a on every assembly; QUAST rules
    report N50 per bin). Nx = length of the contig at which the cumulative
    length of contigs sorted longest-first first reaches x% of the total;
    Lx = how many contigs that takes.

    One shuffle on the group key: the desc-ordered cumulative sum, the
    partition total, and the row number all share a single exchange (same
    partitioning), and the crossing point is found with conditional MAX/MIN
    aggregates — no second pass, no driver-side sort. The x% threshold is
    compared in exact integer arithmetic (cum*100 >= tot*pct), so there is
    no float boundary to disagree across engines. ``id_col`` breaks length
    ties so row numbers are deterministic.
    """
    w_ord = Window.partitionBy(*group_cols).orderBy(
        F.col(len_col).desc(), F.col(id_col))
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.partitionBy(*group_cols)
    d = (df.select(*group_cols, len_col, id_col)
         .withColumn("_cum", F.sum(len_col).over(w_cum))
         .withColumn("_tot", F.sum(len_col).over(w_tot))
         .withColumn("_rn", F.row_number().over(w_ord)))
    aggs = [F.count(F.lit(1)).alias("num_seqs"),
            F.max("_tot").alias("total_len"),
            F.max(len_col).alias("max_len")]
    for frac in fractions:
        pct = int(round(frac * 100))
        cond = F.col("_cum") * 100 >= F.col("_tot") * pct
        aggs.append(F.max(F.when(cond, F.col(len_col))).alias(f"n{pct}"))
        aggs.append(F.min(F.when(cond, F.col("_rn"))).alias(f"l{pct}"))
    return d.groupBy(*group_cols).agg(*aggs)


# Standard genetic code (NCBI table 1), generated from the canonical
# TCAG-ordered amino-acid string so no hand-typed 64-entry table can drift.
_BASES = "TCAG"
_AA64 = "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
CODON_TABLE: dict[str, str] = {
    b1 + b2 + b3: _AA64[i1 * 16 + i2 * 4 + i3]
    for i1, b1 in enumerate(_BASES)
    for i2, b2 in enumerate(_BASES)
    for i3, b3 in enumerate(_BASES)
}


def translate_dna(df: DataFrame, seq_col: str, frame: int = 0,
                  out: str = "protein") -> DataFrame:
    """DNA → protein translation in a reading frame (standard genetic code;
    stops as '*', unknown/ambiguous codons as 'X') — the relational core of
    the reference's gene-calling annotation steps (prodigal/ORF products
    feed every downstream hmmscan table).

    Pure Column expressions: codon extraction is sequence()+substring with
    step 3 and the lookup is a 64-entry map literal resolved by
    whole-stage codegen at scan stage — zero shuffle, zero UDF, so
    translating 100 TB of contigs costs exactly one scan. Sequences
    shorter than frame+3 yield ''.
    """
    entries = ", ".join(f"'{c}', '{a}'"
                        for c, a in sorted(CODON_TABLE.items()))
    expr = (
        f"CASE WHEN length(upper({seq_col})) >= {frame + 3} THEN "
        f"array_join(transform("
        f"sequence({frame + 1}, length(upper({seq_col})) - 2, 3), "
        f"i -> coalesce(element_at(map({entries}), "
        f"substring(upper({seq_col}), i, 3)), 'X')), '') "
        f"ELSE '' END")
    return df.withColumn(out, F.expr(expr))


def debruijn_stats(df: DataFrame, seq_col: str, k: int = 5) -> DataFrame:
    """de Bruijn graph summary of a read set: nodes are distinct k-mers,
    a directed edge joins kmers overlapping by k−1 WITHIN a read
    (consecutive positions — the assembly-graph construction actual
    assemblers use, not the all-pairs overlap). Per-node in/out degrees
    classify the graph: LINEAR nodes (in ≤ 1 and out ≤ 1) chain into
    unitigs, BRANCHING nodes (out > 1) are repeat boundaries, TIPS
    (in = 0) are read starts / errors. The 'how tangled is this
    metagenome' diagnostic behind every assembly QC.

    Consecutive-kmer edges explode row-locally (O(len) per read, never
    all-pairs); edge dedup + two degree partial aggs are the only
    shuffles, all bounded by 4^k distinct k-mers — corpus-size
    independent, the same bound as kmer_spectrum.
    """
    edges = (df.filter(F.length(seq_col) >= k + 1)
             .select(F.explode(F.expr(
                 f"transform(sequence(1, length({seq_col}) - {k}), "
                 f"i -> struct(substring({seq_col}, i, {k}) AS src, "
                 f"substring({seq_col}, i + 1, {k}) AS dst))"))
                 .alias("e"))
             .select("e.src", "e.dst").distinct())
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg"))
    indeg = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("indeg"))
    nodes = (outdeg.join(indeg, "node", "full")
             .select("node",
                     F.coalesce("indeg", F.lit(0)).alias("indeg"),
                     F.coalesce("outdeg", F.lit(0)).alias("outdeg")))
    return nodes.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.when((F.col("indeg") <= 1) & (F.col("outdeg") <= 1), 1)
              .otherwise(0)).alias("n_linear"),
        F.sum(F.when(F.col("outdeg") > 1, 1).otherwise(0))
        .alias("n_branching"),
        F.sum(F.when(F.col("indeg") == 0, 1).otherwise(0)).alias("n_tips"),
        F.sum(F.col("outdeg")).alias("n_edges"))


def minimizer_stats(df: DataFrame, seq_col: str, k: int = 5,
                    w: int = 4) -> DataFrame:
    """Minimizer (winnowing) sketch density per sequence (Roberts 2004 /
    minimap2): in every window of ``w`` consecutive k-mers keep the one
    with the smallest hash; the distinct kept k-mers are the sequence's
    minimizer sketch (expected density 2/(w+1)). The modern long-read
    seeding/sketching primitive next to the bottom-k sketch.

    Entirely row-local higher-order expressions — hash array once
    (md5, engine-portable), window minima via slice+array_min
    (O(len·w) per read, bounded by read length), distinct via
    array_distinct; zero shuffle, so sketching 100 TB of reads is pure
    scan. Adds n_kmers, n_minimizers, density.
    """
    L = f"length({seq_col})"
    harr = (f"transform(sequence(1, {L} - {k - 1}), "
            f"i -> md5(substring({seq_col}, i, {k})))")
    mins = (f"array_distinct(transform("
            f"sequence(1, size(_h) - {w - 1}), "
            f"j -> array_min(slice(_h, j, {w}))))")
    d = (df.filter(F.expr(f"{L} >= {k + w - 1}"))
         .withColumn("_h", F.expr(harr))
         .withColumn("_m", F.expr(mins)))
    return (d.withColumn("n_kmers", F.size("_h").cast("bigint"))
            .withColumn("n_minimizers", F.size("_m").cast("bigint"))
            .withColumn("density",
                        F.round(F.size("_m") / F.size("_h"), 4))
            .drop("_h", "_m"))
