"""Hand-computed fixtures for the interval toolkit (bedtools analogs).

merge = bedtools merge (book-ended merges), coverage = genomecov sweep,
nearest = bedtools closest with deterministic tie rules.
"""

from pyspark.sql import Row

from glamr_omics_pipelines_spark.operators import intervals


def test_merge_intervals_islands(spark):
    df = spark.createDataFrame([
        # g1: [0,10) [5,12) overlap; [12,20) book-ends -> one island [0,20)
        Row(g="g1", s=0, e=10),
        Row(g="g1", s=5, e=12),
        Row(g="g1", s=12, e=20),
        # g1: gap, then [25,30)
        Row(g="g1", s=25, e=30),
        # g2: containment — [0,100) swallows [10,20)
        Row(g="g2", s=0, e=100),
        Row(g="g2", s=10, e=20),
    ])
    out = {(r.g, r.merged_start): (r.merged_end, r.n_merged)
           for r in intervals.merge_intervals(df, ["g"], "s", "e").collect()}
    assert out == {("g1", 0): (20, 3), ("g1", 25): (30, 1),
                   ("g2", 0): (100, 2)}


def test_merge_intervals_equal_starts(spark):
    # equal starts join the same island regardless of sort tie order
    df = spark.createDataFrame([Row(g="g", s=0, e=5), Row(g="g", s=0, e=3),
                                Row(g="g", s=4, e=9)])
    rows = intervals.merge_intervals(df, ["g"], "s", "e").collect()
    assert len(rows) == 1 and rows[0].merged_end == 9 and rows[0].n_merged == 3


def test_coverage_depth_segments(spark):
    # [0,10) + [5,15): depth 1 on [0,5), 2 on [5,10), 1 on [10,15)
    df = spark.createDataFrame([Row(g="c", s=0, e=10), Row(g="c", s=5, e=15)])
    segs = {(r.seg_start, r.seg_end): r.depth
            for r in intervals.coverage_depth(df, ["g"], "s", "e").collect()}
    assert segs == {(0, 5): 1, (5, 10): 2, (10, 15): 1}


def test_coverage_histogram_bases(spark):
    df = spark.createDataFrame([Row(g="c", s=0, e=10), Row(g="c", s=5, e=15)])
    hist = {r.depth: r.bases
            for r in intervals.coverage_histogram(df, ["g"], "s", "e").collect()}
    # depth 1: [0,5)+[10,15)=10 bases; depth 2: [5,10)=5 bases
    assert hist == {1: 10, 2: 5}


def test_coverage_adjacent_intervals_no_false_gap(spark):
    # [0,5) and [5,10): no overlap, uniform depth 1 across [0,10)
    df = spark.createDataFrame([Row(g="c", s=0, e=5), Row(g="c", s=5, e=10)])
    hist = {r.depth: r.bases
            for r in intervals.coverage_histogram(df, ["g"], "s", "e").collect()}
    assert hist == {1: 10}


def test_nearest_feature_two_sided(spark):
    pts = spark.createDataFrame([Row(g="c", pid=1, pos=10),
                                 Row(g="c", pid=2, pos=95),
                                 Row(g="d", pid=3, pos=50)])
    feats = spark.createDataFrame([Row(g="c", fid=100, fpos=0),
                                   Row(g="c", fid=101, fpos=30),
                                   Row(g="c", fid=102, fpos=90)])
    out = {r.pid: (r.nearest_id, r.distance)
           for r in intervals.nearest_feature(
               pts, feats, ["g"], "pid", "pos", "fid", "fpos").collect()}
    # pid=1: dist 10 to fid=100 (left) vs 20 to fid=101 -> left wins
    # pid=2: dist 5 to fid=102 -> right/left of 90? pos 95 > 90, prev wins
    # pid=3: group d has no features -> dropped (inner semantics)
    assert out == {1: (100, 10), 2: (102, 5)}


def test_nearest_feature_tie_prefers_min_id(spark):
    pts = spark.createDataFrame([Row(g="c", pid=1, pos=50)])
    feats = spark.createDataFrame([Row(g="c", fid=200, fpos=40),
                                   Row(g="c", fid=150, fpos=60)])
    # equidistant (10 either side) -> min feature id wins
    r = intervals.nearest_feature(pts, feats, ["g"], "pid", "pos",
                                  "fid", "fpos").collect()[0]
    assert (r.nearest_id, r.distance) == (150, 10)


def test_nearest_feature_colocated_distance_zero(spark):
    pts = spark.createDataFrame([Row(g="c", pid=1, pos=7)])
    feats = spark.createDataFrame([Row(g="c", fid=9, fpos=7),
                                   Row(g="c", fid=8, fpos=7)])
    # two features AT the point position collapse to min fid, distance 0
    r = intervals.nearest_feature(pts, feats, ["g"], "pid", "pos",
                                  "fid", "fpos").collect()[0]
    assert (r.nearest_id, r.distance) == (8, 0)


def test_subtract_intervals_hand_computed(spark):
    a = spark.createDataFrame([Row(g="c", s=0, e=20), Row(g="c", s=30, e=40)])
    b = spark.createDataFrame([Row(g="c", s=5, e=10), Row(g="c", s=18, e=35)])
    out = sorted((r.sub_start, r.sub_end)
                 for r in intervals.subtract_intervals(
                     a, b, ["g"], "s", "e").collect())
    # [0,20) minus [5,10) and [18,35): [0,5), [10,18); [30,40) minus -> [35,40)
    assert out == [(0, 5), (10, 18), (35, 40)]


def test_subtract_intervals_no_b_returns_merged_a(spark):
    a = spark.createDataFrame([Row(g="c", s=0, e=5), Row(g="c", s=3, e=9)])
    b = spark.createDataFrame([], "g string, s long, e long")
    out = [(r.sub_start, r.sub_end)
           for r in intervals.subtract_intervals(a, b, ["g"], "s", "e").collect()]
    assert out == [(0, 9)]  # overlapping A re-merges into one maximal span


def test_subtract_intervals_total_cover_empty(spark):
    a = spark.createDataFrame([Row(g="c", s=2, e=8)])
    b = spark.createDataFrame([Row(g="c", s=0, e=10)])
    assert intervals.subtract_intervals(a, b, ["g"], "s", "e").count() == 0
