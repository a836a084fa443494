"""Z-order layout: Morton key algebra + file clustering effects."""

import glob

from pyspark.sql import Row, functions as F

from glamr_omics_pipelines_spark.operators import layout


def _morton2(x, y, bits=16):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    rows = [Row(x=x, y=y) for x in (0, 1, 5, 255, 1023)
            for y in (0, 2, 7, 1023)]
    df = spark.createDataFrame(rows)
    out = df.select("x", "y", layout.zorder_key(["x", "y"], 10).alias("z"))
    for r in out.collect():
        assert r.z == _morton2(r.x, r.y, 10), (r.x, r.y)


def test_zorder_key_single_column_is_identity(spark):
    df = spark.createDataFrame([Row(x=i) for i in (0, 1, 77, 1000)])
    out = {r.x: r.z
           for r in df.select("x", layout.zorder_key(["x"], 16).alias("z"))
           .collect()}
    assert all(out[x] == x for x in out)


def test_zorder_key_rejects_overflow(spark):
    import pytest as _pytest
    with _pytest.raises(ValueError):
        layout.zorder_key(["a", "b", "c", "d"], bits=16)  # 64 > 63
    with _pytest.raises(ValueError):
        layout.zorder_key([], bits=8)


def test_compact_zorder_preserves_rows_and_tightens_files(spark, tmp_path):
    """Compaction must preserve the row multiset, and the per-file
    bounding boxes of the interleaved columns must be DISJOINT along the
    curve (each file covers a contiguous z range) — the property row-group
    skipping exploits."""
    rows = [Row(a=i % 64, b=(i * 37) % 64, payload=i) for i in range(4000)]
    df = spark.createDataFrame(rows)
    out = str(tmp_path / "z")
    layout.compact_zorder(df, ["a", "b"], out, num_files=4, bits=6)
    back = spark.read.parquet(out)
    assert sorted(r.payload for r in back.collect()) == list(range(4000))
    # per-file z ranges must not overlap
    spans = []
    for f in sorted(glob.glob(out + "/part-*.parquet")):
        pf = spark.read.parquet(f)
        zs = [r.z for r in pf.select(
            layout.zorder_key(["a", "b"], 6).alias("z")).collect()]
        if zs:
            spans.append((min(zs), max(zs)))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, spans


def test_compaction_plan_bins_and_oversize(spark):
    """Exclusive-cumsum binning: small files pack toward the target; an
    oversize file occupies its own bin without stalling assignment."""
    from glamr_omics_pipelines_spark.operators import layout as L
    rows = [("p", "a", 40), ("p", "b", 40), ("p", "c", 40),
            ("p", "d", 250),            # oversize (target 100)
            ("p", "e", 40), ("q", "f", 10)]
    df = spark.createDataFrame(rows, ["part", "path", "bytes"])
    out = {(r["part"], r["bin"]): (r["n_files"], r["bin_bytes"],
                                   r["needs_compaction"])
           for r in L.compaction_plan(df, "path", "bytes", 100,
                                      ["part"]).collect()}
    # pre-cumsums: a=0 b=40 c=80 -> bin 0; d=120 -> bin 1; e=370 -> bin 3
    assert out[("p", 0)] == (3, 120, True)
    assert out[("p", 1)] == (1, 250, False)
    assert out[("p", 3)] == (1, 40, False)
    assert out[("q", 0)] == (1, 10, False)


def test_compaction_plan_guard(spark):
    from glamr_omics_pipelines_spark.operators import layout as L
    import pytest as _pytest
    df = spark.createDataFrame([("a", 1)], ["path", "bytes"])
    with _pytest.raises(ValueError):
        L.compaction_plan(df, "path", "bytes", 0)
