"""Temporal / interval join operators: as-of join and binned range join.

The reference has no native theta/range/as-of joins (SURVEY §2.3): its one
interval-containment semantic — gene↔contig coordinate mapping — is resolved
by string convention (`gene = contig + "_" + k`, postgres.Rmd:1194-1199), and
bedtools-style containment happens inside external tools. At 100 TB these
become first-class engine operators, and a naive implementation is a
cartesian-product trap: Spark executes a non-equi join as
BroadcastNestedLoopJoin (or worse), which is O(|L|·|R|) per key.

Spark-first designs used here:

  asof_join — the "latest right row at or before each left row" join
    (market-data / event-attribution staple). Implemented as the classic
    union-merge: tag both sides, union, ONE shuffle on the key, sort by
    (ts, side, tiebreak) within each key partition, and carry the most
    recent right payload forward with last(ignorenulls=True) over an
    unbounded-preceding running window. Cost: one exchange + one sort —
    identical shape to any windowed aggregate over the same key, with no
    join blowup at all. Works unmodified on a 1000-executor cluster: each
    key's timeline is processed within its hash partition.

  range_join_binned — point-in-interval join (point BETWEEN start AND end)
    via bin quantization: points land in exactly one fixed-width bin;
    intervals explode into the bins they cover (ceil(len/width)+1 rows,
    small for bounded intervals); the join becomes an EQUI join on
    (keys…, bin) that Catalyst executes as a plain shuffled hash join with
    partial pruning, followed by the exact BETWEEN filter. No duplicate
    elimination is needed: a (point, interval) pair meets in exactly the
    point's single bin. This is the standard genomic-interval / telemetry
    pattern; bin width should be chosen ≈ the typical interval length so
    the explode factor stays ~2.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str, tiebreak: str,
              direction: str = "backward", tolerance: int | None = None,
              right_prefix: str = "right_") -> DataFrame:
    """As-of join: attach to each left row the nearest right row at-or-before
    (backward) / at-or-after (forward) its timestamp, per join key.

    Parameters
    ----------
    on : equi-join key columns (present in both sides).
    left_ts / right_ts : ordering columns (numeric or timestamp; must be
        mutually comparable).
    tiebreak : right-side column ordering ties among equal ``right_ts`` rows —
        the greatest (backward) / least (forward) tiebreak value wins. Required
        so results are deterministic (a requirement the oracle compare shares).
    tolerance : optional max |left_ts - right_ts| (same units as the ts cols);
        matches farther away are nulled out, like pandas.merge_asof.
    right_prefix : prefix for the attached right-side payload columns.

    Returns the left frame + prefixed right payload columns (null when no
    match) — left-outer as-of semantics. One shuffle, no join blowup.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # SQL equi-join semantics: a NULL key matches nothing. Window.partitionBy
    # would happily group NULL keys together, so drop null-keyed RIGHT rows
    # (they can never match); null-keyed LEFT rows stay and get null matches.
    for k in on:
        right = right.filter(F.col(k).isNotNull())
    payload_cols = [c for c in right.columns if c not in on]
    r_payload = F.struct(*[F.col(c) for c in payload_cols])

    # side tag sorts the right row FIRST at equal ts (backward) so an exact-ts
    # match is visible to the left row — as-of is at-or-before / at-or-after.
    r2 = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tie"),
        r_payload.alias("_r"))
    l2 = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r2.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(r2.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"))
    merged = r2.withColumn("_l", F.lit(None).cast(l2.schema["_l"].dataType)) \
        .unionByName(l2)

    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc()]
    else:
        order = [F.col("_ts").desc(), F.col("_side").asc(), F.col("_tie").desc()]
    w = (Window.partitionBy(*on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = F.last("_r", ignorenulls=True).over(w)
    matched_ts = F.last(F.when(F.col("_side") == 0, F.col("_ts")),
                        ignorenulls=True).over(w)

    out = (merged.withColumn("_m", matched).withColumn("_mts", matched_ts)
           .filter(F.col("_side") == 1))
    if tolerance is not None:
        dist = F.abs(F.col("_ts").cast("double") - F.col("_mts").cast("double"))
        out = out.withColumn("_m", F.when(dist <= F.lit(tolerance), F.col("_m")))
    cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in payload_cols]
    return out.select(*cols)


def explode_interval_bins(intervals: DataFrame, start_col: str, end_col: str,
                          bin_width: int, out: str = "_bin") -> DataFrame:
    """One row per fixed-width bin an [start, end] interval covers."""
    lo = F.floor(F.col(start_col).cast("long") / F.lit(bin_width))
    hi = F.floor(F.col(end_col).cast("long") / F.lit(bin_width))
    return intervals.withColumn(out, F.explode(F.sequence(lo, hi)))


def range_join_binned(points: DataFrame, intervals: DataFrame, keys: list[str],
                      point_col: str, start_col: str, end_col: str,
                      bin_width: int) -> DataFrame:
    """Point-in-interval join (point BETWEEN start AND end, equi on ``keys``)
    as a binned EQUI join — never a nested-loop non-equi join.

    Each point gets its single bin; each interval explodes into covered bins;
    the (keys…, bin) equi-join meets every qualifying pair exactly once, then
    the exact BETWEEN predicate keeps true containments. Inner semantics:
    intervals containing no point produce no row.
    """
    p = points.withColumn(
        "_bin", F.floor(F.col(point_col).cast("long") / F.lit(bin_width)))
    i = explode_interval_bins(intervals, start_col, end_col, bin_width)
    cond = F.col(point_col).between(F.col(start_col), F.col(end_col))
    return p.join(i, keys + ["_bin"]).filter(cond).drop("_bin")


def interval_join_binned(left: DataFrame, right: DataFrame, keys: list[str],
                         l_start: str, l_end: str, r_start: str, r_end: str,
                         bin_width: int) -> DataFrame:
    """Interval-OVERLAP join (l_start <= r_end AND r_start <= l_end, equi on
    ``keys``) as a binned EQUI join — the bedtools-intersect / telemetry
    overlap staple, never a nested-loop non-equi join.

    Both sides explode into the fixed-width bins they cover; the
    (keys…, bin) equi-join meets each overlapping pair in EVERY shared bin,
    so the join keeps a pair only in its FIRST shared bin — which for
    overlapping intervals is exactly ``max(start_bin_l, start_bin_r)`` (the
    later-starting side's first bin, which the earlier side must cover since
    they overlap). That makes the dedup a row-local predicate instead of a
    distinct shuffle. Start/end column names must differ across the two
    sides (rename before calling if needed).
    """
    lb = explode_interval_bins(left, l_start, l_end, bin_width, out="_bin")
    rb = explode_interval_bins(right, r_start, r_end, bin_width, out="_bin")
    overlap = ((F.col(l_start) <= F.col(r_end))
               & (F.col(r_start) <= F.col(l_end)))
    first_shared = F.col("_bin") == F.greatest(
        F.floor(F.col(l_start).cast("long") / F.lit(bin_width)),
        F.floor(F.col(r_start).cast("long") / F.lit(bin_width)))
    return lb.join(rb, keys + ["_bin"]).filter(overlap & first_shared) \
        .drop("_bin")


def haversine_km(lat_a: Column, lon_a: Column, lat_b: Column,
                 lon_b: Column) -> Column:
    """Great-circle distance in km (haversine, mean Earth radius 6371.0088).
    Pure builtin trig — codegen'd, byte-identical formula to the SQL oracle."""
    dlat = F.radians(lat_b - lat_a) / 2
    dlon = F.radians(lon_b - lon_a) / 2
    a = (F.sin(dlat) * F.sin(dlat)
         + F.cos(F.radians(lat_a)) * F.cos(F.radians(lat_b))
         * F.sin(dlon) * F.sin(dlon))
    return F.lit(2 * 6371.0088) * F.asin(F.sqrt(a))


def geo_neighbor_pairs(df: DataFrame, id_col: str, lat_col: str = "lat",
                       lon_col: str = "lon", radius_km: float = 10.0,
                       max_abs_lat: float = 60.0) -> DataFrame:
    """All pairs of rows within ``radius_km`` great-circle km of each other —
    the sample-proximity question over the reference's georeferenced sample
    table (every GLAMR sample carries lat/lon, postgres.Rmd:65; the atlas UI
    is a sample map). A naive formulation is an all-pairs cross join that
    Spark executes as BroadcastNestedLoop — O(n²) at any scale.

    Spark-first design (grid-cell binning, the spatial twin of
    ``range_join_binned``): each row lands in ONE lat/lon grid cell sized so
    that any two points within ``radius_km`` differ by at most one cell
    index per axis (lat cell = radius/111.0°; lon cell widened by
    1/cos(max_abs_lat) so it stays wide enough at the highest usable
    latitude). One side explodes to its 3×3 neighbor cells (bounded ×9
    fan-out); the join is then a plain EQUI join on the cell id followed by
    the exact haversine predicate. Each unordered pair meets exactly once
    (in the left row's own cell), so no distinct/dedup shuffle is needed;
    ``id_a < id_b`` removes the mirror. Scale: shuffle is O(9n) small rows,
    join work is confined to co-located cells — no cross product at any n.

    Caveats (documented, acceptable for the inland/limnology use case):
    rows with |lat| > ``max_abs_lat`` would need wider lon cells (raise the
    parameter); pairs straddling the ±180° antimeridian are not matched.
    """
    lat_cell = radius_km / 111.0
    lon_cell = radius_km / (111.0 * math.cos(math.radians(max_abs_lat)))
    left = df.select(
        F.col(id_col).alias("id_a"),
        F.col(lat_col).alias("lat_a"), F.col(lon_col).alias("lon_a"),
        F.floor(F.col(lat_col) / F.lit(lat_cell)).alias("_clat"),
        F.floor(F.col(lon_col) / F.lit(lon_cell)).alias("_clon"))
    offs = F.explode(F.array(*[
        F.struct(F.lit(i).alias("di"), F.lit(j).alias("dj"))
        for i in (-1, 0, 1) for j in (-1, 0, 1)])).alias("_off")
    right = (df.select(
        F.col(id_col).alias("id_b"),
        F.col(lat_col).alias("lat_b"), F.col(lon_col).alias("lon_b"),
        F.floor(F.col(lat_col) / F.lit(lat_cell)).alias("_blat"),
        F.floor(F.col(lon_col) / F.lit(lon_cell)).alias("_blon"))
        .select("*", offs)
        .select("id_b", "lat_b", "lon_b",
                (F.col("_blat") + F.col("_off.di")).alias("_clat"),
                (F.col("_blon") + F.col("_off.dj")).alias("_clon")))
    dist = haversine_km(F.col("lat_a"), F.col("lon_a"),
                        F.col("lat_b"), F.col("lon_b"))
    return (left.join(right, ["_clat", "_clon"])
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("dist_km", dist)
            .filter(F.col("dist_km") <= F.lit(radius_km))
            .select("id_a", "id_b", "dist_km"))


def bitset_prune_semi_join(big: DataFrame, small: DataFrame, key: str,
                           num_bits: int = 1 << 20) -> DataFrame:
    """Semi join with a broadcast-bitset pre-filter (the engine-level form
    of runtime bloom pruning, which Spark only applies internally): the
    small side's key hashes fold into a ``num_bits``-wide bitset —
    ``num_bits/64`` longs via a bit_or partial agg — that broadcasts to
    the big side's SCAN, where a row-local mask probe discards non-members
    BEFORE the exact semi join.

    Result is exactly ``big SEMI JOIN small ON key`` (the bitset is a
    superset filter; the exact join removes false positives), but the
    semi-join shuffle now carries only probable matches: with a 1%-
    selective small side, 99% of the big side never leaves its scan
    stage. Use when the small side's distinct keys are too many to
    broadcast raw (a raw-key broadcast IS the degenerate bitset) yet
    num_bits/8 bytes fit comfortably — 1M bits = 128 KB regardless of
    key count; size num_bits ≥ ~10× distinct keys to keep false-positive
    probing low.
    """
    m = num_bits

    def _word_bit(col):
        b = F.pmod(F.xxhash64(col), F.lit(m))
        return F.shiftright(b, 6), F.pmod(b, F.lit(64)).cast("int")

    sw, sb = _word_bit(F.col(key))
    # DataFrame-API shiftleft/shiftright take a python-int shift only;
    # the column-shift forms go through F.expr
    bitset = (small.select(sw.alias("_word"), sb.alias("_bit"))
              .groupBy("_word")
              .agg(F.bit_or(F.expr("shiftleft(1L, _bit)")).alias("_mask")))
    bw, bb = _word_bit(F.col(key))
    probed = (big.withColumn("_word", bw).withColumn("_bit", bb)
              .join(F.broadcast(bitset), "_word", "inner")
              .filter(F.expr("(shiftright(_mask, _bit) & 1L) = 1L"))
              .drop("_word", "_bit", "_mask"))
    return probed.join(small.select(key).distinct(), key, "left_semi")


def nearest_station(points: DataFrame, stations: DataFrame, id_col: str,
                    station_col: str, lat_col: str = "lat",
                    lon_col: str = "lon") -> DataFrame:
    """Assign every point to its nearest reference station (min haversine)
    — 'which monitoring buoy does this sample belong to', the spatial
    dimension-attach every georeferenced sample table needs.

    The station dimension is SMALL by definition (buoys/sites, not
    samples): broadcast it, fan each point out ×|stations| row-locally,
    and take the argmin with the map-side struct-min aggregate — no
    shuffle of the point table beyond the final agg, no cross product in
    the dangerous direction. Ties break toward the smaller station id.
    (A continent-scale station set would first grid-prune candidates like
    geo_neighbor_pairs; at that point it stops being a dimension.)
    """
    p = points.select(F.col(id_col), F.col(lat_col).alias("_plat"),
                      F.col(lon_col).alias("_plon"))
    s = stations.select(F.col(station_col).alias("_sid"),
                        F.col(lat_col).alias("_slat"),
                        F.col(lon_col).alias("_slon"))
    j = p.join(F.broadcast(s))
    dist = haversine_km(F.col("_plat"), F.col("_plon"),
                        F.col("_slat"), F.col("_slon"))
    packed = F.struct(dist.alias("_d"), F.col("_sid").alias("_s"))
    # min over when(dist notNull): a station (or point) with null
    # coordinates yields null distance, and a null struct field sorts FIRST
    # in struct ordering — unguarded, one corrupt station row would win the
    # argmin for EVERY point. Guarded, such rows are ignored; points with
    # no valid distance at all get a null station.
    agg = j.groupBy(id_col).agg(
        F.min(F.when(dist.isNotNull(), packed)).alias("_w"))
    return agg.select(id_col, F.col("_w._s").alias("station"),
                      F.col("_w._d").alias("dist_km"))
