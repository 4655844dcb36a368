"""Operator-level goldens ported from the reference's embedded tests
(``coring/sectionSummary.py:255-272``, ``coring/measurement.py:59-69``,
``coring/affine.py:104-109``, ``coring/manualCorrelation.py:125-131``,
``coring/sparseSplice.py:39-45``) — same fixtures, same expected values,
Spark operators."""

import os

import pytest
from pyspark.sql import functions as F

from feldman_spark.engine import (
    load_affine,
    load_measurement,
    load_section_summary,
    load_sparse_splice,
)
from feldman_spark.formats.registry import MANUAL_CORRELATION_FORMAT
from feldman_spark.io.csv import read_tabular
from feldman_spark.ops.filters import (
    conjunctive_filter,
    in_filter,
    point_in_interval,
    range_filter,
    valid_section_column,
)
from feldman_spark.ops.gaps import gap_above, parse_gaps
from feldman_spark.splice import section_lookup


@pytest.fixture(scope="module")
def secsumm(spark, ref_testdata):
    return load_section_summary(
        spark, os.path.join(ref_testdata, "GLAD9_SectionSummary.csv")).cache()


@pytest.fixture(scope="module")
def xrf(spark, ref_testdata):
    return load_measurement(
        spark, os.path.join(ref_testdata, "GLAD9_Site1_XRF.csv"),
        depth_column="Sediment Depth, scaled (MBS / CSF-B)").cache()


def test_section_summary_goldens(spark, secsumm):
    # coring/sectionSummary.py:256-262
    assert secsumm.select("Site").distinct().count() == 7
    assert conjunctive_filter(secsumm, Site="1", Hole="A", Core="33").count() > 0
    assert conjunctive_filter(secsumm, Site="1", Hole="A", Core="34").count() == 0
    look = section_lookup(secsumm)
    top = conjunctive_filter(look, Site="1", Hole="A", Core="33", Section="9") \
        .select("SecTop").first()[0]
    assert top == 92.73
    # getSectionAtDepth('1','B','2',4.4) == '3' (point-in-interval, F4)
    sec = point_in_interval(secsumm, 4.4, Site="1", Hole="B", Core="2") \
        .select("Section").first()[0]
    assert sec == "3"


def test_gaps_goldens(spark, ref_testdata):
    from feldman_spark.formats.registry import SECTION_SUMMARY_FORMAT

    ss = read_tabular(spark, os.path.join(ref_testdata, "SectionSummaryWithGaps.csv"),
                      SECTION_SUMMARY_FORMAT)
    ss = ss.withColumn("GapsParsed", parse_gaps(F.col("Gaps")))

    def gaps_of(core, section):
        row = conjunctive_filter(ss, Site="1", Hole="A", Core=core, Section=section).first()
        return [(g["top"], g["bot"]) for g in row["GapsParsed"]]

    def gap_above_val(core, section, depth):
        row = (
            conjunctive_filter(ss, Site="1", Hole="A", Core=core, Section=section)
            .select(gap_above(F.col("GapsParsed"), F.lit(depth)).alias("g"))
            .first()
        )
        return row["g"]

    # coring/sectionSummary.py:264-272
    assert gaps_of("2", "1") == []
    assert gaps_of("3", "2") == [(0.0, 2.5)]
    assert gap_above_val("3", "2", 0.0) == 0.0
    assert gap_above_val("3", "2", 1.0) == 2.5
    assert gaps_of("18", "1") == [(0.0, 0.5), (94.5, 96.0), (151.0, 152.5)]
    assert gap_above_val("18", "1", 95.0) == 2.0
    assert gap_above_val("18", "1", 152.5) == 3.5


def test_measurement_goldens(spark, xrf):
    # coring/measurement.py:59-69
    depth = "Sediment Depth, scaled (MBS / CSF-B)"
    assert "Tool" in xrf.columns
    assert range_filter(xrf, depth, 74.0, 75.0).count() == 185
    assert conjunctive_filter(range_filter(xrf, depth, 74.0, 75.0), Core="25").count() == 84
    full = conjunctive_filter(range_filter(xrf, depth, 74.0, 76.0),
                              Site="1", Hole="A", Core="25")
    assert in_filter(full, "Section", ["1"]).count() == 148
    full2 = conjunctive_filter(range_filter(xrf, depth, 74.0, 78.0),
                               Site="1", Hole="A", Core="25")
    assert in_filter(full2, "Section", ["2", "3"]).count() == 141
    assert in_filter(full2, "Section", ["1", "2", "3"]).count() == 289
    whole = conjunctive_filter(xrf, Site="1", Hole="A", Core="25")
    assert in_filter(whole, "Section", ["1", "2", "3"]).count() == 289
    assert conjunctive_filter(xrf, Core="25").count() == 643


def test_affine_goldens(spark, ref_testdata):
    # coring/affine.py:104-109
    aff = load_affine(spark, os.path.join(ref_testdata, "GLAD9_Site1_Affine.csv"))
    assert aff.count() == 94
    assert [r["Site"] for r in aff.select("Site").distinct().collect()] == ["1"]
    off = conjunctive_filter(aff, Site="1", Hole="B", Core="2", Tool="H") \
        .select("Offset").first()[0]
    assert off == 0.298


def test_manual_correlation_goldens(spark, ref_testdata):
    # coring/manualCorrelation.py:125-131
    mct = read_tabular(spark, os.path.join(ref_testdata, "ManualCorrelationTable.csv"),
                       MANUAL_CORRELATION_FORMAT)
    assert mct.count() == 90
    row = conjunctive_filter(mct, Site1="1", Hole1="D", Core1="2").first()
    assert row["SectionDepth1"] == 0.5
    assert row["SectionDepth2"] == 30


def test_sparse_splice_goldens(spark, ref_testdata):
    # coring/sparseSplice.py:39-45
    sp = load_sparse_splice(spark, os.path.join(ref_testdata, "GLAD9_Site1_SparseSplice.csv"))
    assert sp.count() == 58
    assert sp.select("Gap").first()[0] is None
    assert sp.filter(F.col("Site") == "1").count() > 0
    assert sp.select("Hole").distinct().count() == 3
    # F7 validation
    assert valid_section_column(sp, "TopSection")
    assert valid_section_column(sp, "BottomSection")


def test_salted_join_equivalence(spark):
    """salted_join must be row-identical to a plain join on skewed data."""
    from feldman_spark.ops.skew import salted_join

    # heavy-tailed key: 90% of left rows share key 0
    left = spark.range(0, 20000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 50 END AS k", "id AS v")
    right = spark.range(0, 50).selectExpr("id AS k", "id * 100 AS payload")

    plain = left.join(right, ["k"], "inner").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    salted = salted_join(left, right, ["k"], buckets=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    a = {(r["k"]): (r["n"], r["sv"]) for r in plain.collect()}
    b = {(r["k"]): (r["n"], r["sv"]) for r in salted.collect()}
    assert a == b

    # left join keeps unmatched rows exactly once
    right_partial = right.filter(F.col("k") < 10)
    pl = left.join(right_partial, ["k"], "left").count()
    sl = salted_join(left, right_partial, ["k"], buckets=8, how="left").count()
    assert pl == sl

    # two-path (hot-key-only) mode: same equivalences, and only key 0
    # (18k rows vs ~40 for the rest) qualifies as hot at the threshold
    b2 = {(r["k"]): (r["n"], r["sv"]) for r in
          salted_join(left, right, ["k"], buckets=8, hot_threshold=1000)
          .groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                            F.sum("v").alias("sv")).collect()}
    assert a == b2
    sl2 = salted_join(left, right_partial, ["k"], buckets=8, how="left",
                      hot_threshold=1000).count()
    assert sl2 == pl
    # explicit hot_keys frame: skip the counting pass entirely
    hk = spark.createDataFrame([(0,)], ["k"])
    b3 = {(r["k"]): (r["n"], r["sv"]) for r in
          salted_join(left, right, ["k"], buckets=8, hot_keys=hk)
          .groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                            F.sum("v").alias("sv")).collect()}
    assert a == b3
    # a hot key absent from the right under how='left': exactly one
    # null-extended row survives
    hk_missing = spark.createDataFrame([(0,), (777,)], ["k"])
    lf2 = left.unionByName(spark.createDataFrame([(777, 1)], ["k", "v"]))
    sl3 = salted_join(lf2, right_partial, ["k"], buckets=8, how="left",
                      hot_keys=hk_missing)
    assert sl3.filter(F.col("k") == 777).count() == 1


def test_nearest_value_join_tiebreaks_and_driver_sort(spark):
    """Nearest-key join over an UNSORTED dimension with duplicate
    values: the dimension sorts driver-side (numpy argsort over the
    Arrow collect — no Spark sort exchange), several right rows sharing
    a value collapse to the smallest id, and an exact midpoint tie
    resolves to the smaller id."""
    from feldman_spark.ops.joins import nearest_value_join

    left = spark.createDataFrame(
        [(1, 10.0), (2, 14.9), (3, 15.0), (4, 100.0)],
        "lid int, x double")
    # unsorted, value 20.0 duplicated with ids 7 and 5 -> 5 must win;
    # x=15.0 is the exact midpoint of 10.0 and 20.0 -> id tie-break:
    # min(ids at 10.0)=6 vs min(ids at 20.0)=5 -> 5
    right = spark.createDataFrame(
        [(7, 20.0), (6, 10.0), (5, 20.0), (9, 30.0)],
        "rid int, y double")
    out = {r["lid"]: (r["nid"], r["nv"]) for r in nearest_value_join(
        left, right, left_value="x", right_value="y", right_id="rid",
        out_id="nid", out_value="nv").collect()}
    assert out == {1: (6, 10.0), 2: (6, 10.0), 3: (5, 20.0),
                   4: (9, 30.0)}


def test_asof_join_backward(spark):
    """Backward as-of: latest right row at-or-before each left ts per key;
    unmatched rows null; exact-simultaneous right row visible; tolerance
    nulls stale matches. No join in the plan — union + one window pass."""
    from feldman_spark.ops.joins import asof_join

    left = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, "b"), ("u1", 5, "c"), ("u2", 7, "d")],
        "k string, ts int, tag string")
    right = spark.createDataFrame(
        [("u1", 8, 1.0), ("u1", 10, 2.0), ("u1", 15, 3.0), ("u3", 1, 9.0)],
        "k string, ts int, val double")

    out = {(r["k"], r["ts"]): (r["val_r"], r["ts_r"])
           for r in asof_join(left, right, on=["k"],
                              right_cols=["val"]).collect()}
    assert out == {
        ("u1", 10): (2.0, 10),   # simultaneous right row wins over ts=8
        ("u1", 20): (3.0, 15),
        ("u1", 5): (None, None),  # nothing at-or-before
        ("u2", 7): (None, None),  # key absent on the right
    }

    tol = {(r["k"], r["ts"]): r["val_r"]
           for r in asof_join(left, right, on=["k"], right_cols=["val"],
                              tolerance_seconds=3).collect()}
    assert tol == {("u1", 10): 2.0, ("u1", 20): None,  # 20-15=5 > 3 stale
                   ("u1", 5): None, ("u2", 7): None}

    plan = asof_join(left, right, on=["k"], right_cols=["val"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window only


def test_asof_join_null_right_attrs_not_backfilled(spark):
    """The matched right row's NULL attributes stay NULL — they must not
    backfill from an older right row (the match is a single row, carried
    as one struct)."""
    from feldman_spark.ops.joins import asof_join

    left = spark.createDataFrame([("u1", 30, "a")], "k string, ts int, tag string")
    right = spark.createDataFrame(
        [("u1", 10, 1.0, "old"), ("u1", 20, None, "new")],
        "k string, ts int, val double, label string")

    [row] = asof_join(left, right, on=["k"],
                      right_cols=["val", "label"]).collect()
    # matched row is ts=20: label from it, val stays NULL (NOT 1.0 from ts=10)
    assert row["ts_r"] == 20
    assert row["label_r"] == "new"
    assert row["val_r"] is None


def test_asof_join_forward(spark):
    """Forward as-of: earliest right row at-or-after each left ts."""
    from feldman_spark.ops.joins import asof_join

    left = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, "b"), ("u1", 16, "c")],
        "k string, ts int, tag string")
    right = spark.createDataFrame(
        [("u1", 8, 1.0), ("u1", 10, 2.0), ("u1", 15, 3.0)],
        "k string, ts int, val double")

    out = {r["ts"]: (r["val_r"], r["ts_r"])
           for r in asof_join(left, right, on=["k"], right_cols=["val"],
                              direction="forward").collect()}
    assert out == {
        10: (2.0, 10),       # simultaneous right row wins
        16: (None, None),    # nothing at-or-after 16
        20: (None, None),
    }

    tol = {r["ts"]: r["val_r"]
           for r in asof_join(left, right, on=["k"], right_cols=["val"],
                              direction="forward", tolerance_seconds=4).collect()}
    assert tol == {10: 2.0, 16: None, 20: None}


def test_scd2_intervals(spark):
    from feldman_spark.ops.windows import scd2_intervals

    log = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 00:00:00", "a"),
            (1, 11, "2024-01-02 00:00:00", "b"),
            (1, 12, "2024-01-03 00:00:00", "c"),
            (2, 20, "2024-01-05 00:00:00", "x"),
            # simultaneous changes: tiebreak on event_id orders them
            (3, 31, "2024-01-01 00:00:00", "v2"),
            (3, 30, "2024-01-01 00:00:00", "v1"),
        ],
        ["user_id", "event_id", "ts", "attr"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_id"]: r for r in scd2_intervals(
        log, key=["user_id"], ts_col="ts", tiebreak=["event_id"]).collect()}
    assert str(out[10]["valid_to"]) == "2024-01-02 00:00:00"
    assert str(out[11]["valid_to"]) == "2024-01-03 00:00:00"
    assert out[12]["valid_to"] is None and out[12]["is_current"]
    assert out[20]["valid_to"] is None and out[20]["is_current"]
    # same-ts changes: lower event_id closes first, at the SAME instant
    assert str(out[30]["valid_to"]) == "2024-01-01 00:00:00"
    assert out[31]["is_current"]


def test_time_gapfill_rejects_misaligned_step(spark):
    """A step that cannot align with date_trunc(unit) buckets must raise,
    not silently report 0 for populated periods."""
    import pytest

    from feldman_spark.ops.windows import time_gapfill

    ev = spark.createDataFrame(
        [("2024-01-01 00:10:00", "a")], ["ts", "event_type"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="whole multiple"):
        time_gapfill(ev, "ts", ["event_type"], unit="hour", step="30 minutes")
    with pytest.raises(ValueError, match="same unit"):
        time_gapfill(ev, "ts", ["event_type"], unit="month", step="30 days")
    with pytest.raises(ValueError, match="form"):
        time_gapfill(ev, "ts", ["event_type"], unit="hour", step="hourly")
    # aligned coarser steps stay legal (downsampled grid)
    assert time_gapfill(
        ev, "ts", ["event_type"], unit="hour", step="2 hours").count() == 1
    assert time_gapfill(
        ev, "ts", ["event_type"], unit="month", step="1 month").count() == 1


def test_time_gapfill_emits_zero_rows(spark):
    from feldman_spark.ops.windows import time_gapfill

    ev = spark.createDataFrame(
        [("2024-01-01 00:10:00", "a"), ("2024-01-01 00:40:00", "a"),
         ("2024-01-01 03:10:00", "a"), ("2024-01-01 01:20:00", "b")],
        ["ts", "event_type"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(str(r["bucket"]), r["event_type"]): r["n"]
           for r in time_gapfill(ev, "ts", ["event_type"]).collect()}
    # full 4-hour x 2-type grid, silent cells explicit zeros
    assert len(out) == 8
    assert out[("2024-01-01 00:00:00", "a")] == 2
    assert out[("2024-01-01 01:00:00", "a")] == 0
    assert out[("2024-01-01 02:00:00", "b")] == 0
    assert out[("2024-01-01 01:00:00", "b")] == 1


def test_binned_range_join_matches_naive(spark):
    """Binned equi-join + residual == the naive theta join, including
    negative values and boundary-inclusive matches."""
    import random

    from feldman_spark.ops.joins import binned_range_join

    rng = random.Random(7)
    pts = spark.createDataFrame(
        [(i, round(rng.uniform(-100, 100), 2)) for i in range(300)],
        ["pid", "v"],
    )
    ivs = spark.createDataFrame(
        [
            (j, lo := round(rng.uniform(-110, 90), 2), round(lo + rng.uniform(0, 30), 2))
            for j in range(40)
        ],
        ["iid", "lo", "hi"],
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in binned_range_join(pts, ivs, "v", "lo", "hi", bin_width=10.0).collect()
    )
    want = sorted(
        (r["pid"], r["iid"])
        for r in pts.crossJoin(ivs)
        .filter(F.col("v").between(F.col("lo"), F.col("hi")))
        .collect()
    )
    assert got == want and len(got) > 0


def test_binned_range_join_exactly_once_across_bins(spark):
    """An interval spanning many bins still matches a contained point
    exactly once (pairs meet only in the point's own bin)."""
    from feldman_spark.ops.joins import binned_range_join

    pts = spark.createDataFrame([(1, 55.0), (2, 5.0), (3, 95.0)], ["pid", "v"])
    ivs = spark.createDataFrame([(10, 0.0, 100.0)], ["iid", "lo", "hi"])
    out = binned_range_join(pts, ivs, "v", "lo", "hi", bin_width=10.0).collect()
    assert sorted((r["pid"], r["iid"]) for r in out) == [(1, 10), (2, 10), (3, 10)]


def test_binned_range_join_plan_is_equi_join(spark):
    """The point of the operator: a shuffled/broadcast HASH join on the
    bin id — never the BroadcastNestedLoopJoin a raw range predicate
    would plan."""
    from feldman_spark.ops.joins import binned_range_join

    pts = spark.range(1000).select(F.col("id").alias("pid"),
                                   (F.col("id") % 97).cast("double").alias("v"))
    ivs = spark.range(50).select(F.col("id").alias("iid"),
                                 (F.col("id") * 2.0).alias("lo"),
                                 (F.col("id") * 2.0 + 5.0).alias("hi"))
    out = binned_range_join(pts, ivs, "v", "lo", "hi", bin_width=5.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert out.count() > 0


def test_binned_range_join_rejects_column_overlap(spark):
    from feldman_spark.ops.joins import binned_range_join

    pts = spark.createDataFrame([(1, 1.0)], ["pid", "v"])
    ivs = spark.createDataFrame([(2, 0.0, 2.0)], ["pid", "lo", "hi"])
    try:
        binned_range_join(pts, ivs, "v", "lo", "hi", bin_width=1.0)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "pid" in str(e)


def test_range_joins_reject_nonpositive_bin_width(spark):
    """bin_width=0 would floor every value into one Long.MaxValue bin —
    a silent full cross product; both operators must fail fast."""
    import pytest

    from feldman_spark.ops.joins import (binned_range_join,
                                         interval_overlap_join)

    pts = spark.createDataFrame([(1, 1.0)], ["pid", "v"])
    ivs = spark.createDataFrame([(2, 0.0, 2.0)], ["iid", "lo", "hi"])
    for bad in (0, 0.0, -1.5):
        with pytest.raises(ValueError, match="bin_width"):
            binned_range_join(pts, ivs, "v", "lo", "hi", bin_width=bad)
        with pytest.raises(ValueError, match="bin_width"):
            interval_overlap_join(
                pts.select("pid", F.col("v").alias("alo"),
                           (F.col("v") + 1).alias("ahi")),
                ivs, "alo", "ahi", "lo", "hi", bin_width=bad)


def test_binned_range_join_auto_bin_width_matches_explicit(spark):
    """bin_width=None auto-sizes from the median interval span and must
    produce the identical pair set (binning never changes semantics)."""
    import random

    from feldman_spark.ops.joins import binned_range_join

    rng = random.Random(11)
    pts = spark.createDataFrame(
        [(i, round(rng.uniform(-50, 150), 2)) for i in range(200)],
        ["pid", "v"])
    ivs = spark.createDataFrame(
        [(j, lo := round(rng.uniform(-60, 140), 2),
          round(lo + rng.uniform(0, 25), 2)) for j in range(30)],
        ["iid", "lo", "hi"])
    auto = sorted((r["pid"], r["iid"]) for r in
                  binned_range_join(pts, ivs, "v", "lo", "hi").collect())
    manual = sorted((r["pid"], r["iid"]) for r in
                    binned_range_join(pts, ivs, "v", "lo", "hi",
                                      bin_width=10.0).collect())
    assert auto == manual and len(auto) > 0


def test_interval_overlap_join_auto_bin_width_matches_explicit(spark):
    import random

    from feldman_spark.ops.joins import interval_overlap_join

    rng = random.Random(13)
    a = spark.createDataFrame(
        [(i, lo := round(rng.uniform(0, 200), 2),
          round(lo + rng.uniform(0, 15), 2)) for i in range(120)],
        ["aid", "alo", "ahi"])
    b = spark.createDataFrame(
        [(j, lo := round(rng.uniform(0, 200), 2),
          round(lo + rng.uniform(0, 30), 2)) for j in range(80)],
        ["bid", "blo", "bhi"])
    auto = sorted((r["aid"], r["bid"]) for r in interval_overlap_join(
        a, b, "alo", "ahi", "blo", "bhi").collect())
    manual = sorted((r["aid"], r["bid"]) for r in interval_overlap_join(
        a, b, "alo", "ahi", "blo", "bhi", bin_width=12.0).collect())
    assert auto == manual and len(auto) > 0


def test_auto_bin_width_degenerate_point_intervals(spark):
    """All intervals zero-span: auto sizing must still pick a positive
    width (domain/1024 fallback) and match the brute-force pairs."""
    from feldman_spark.ops.joins import binned_range_join

    pts = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], ["pid", "v"])
    ivs = spark.createDataFrame(
        [(j, float(j * 7), float(j * 7)) for j in range(8)],
        ["iid", "lo", "hi"])
    out = sorted((r["pid"], r["iid"]) for r in
                 binned_range_join(pts, ivs, "v", "lo", "hi").collect())
    assert out == [(j * 7, j) for j in range(8)]


def test_rolling_time_agg_matches_model(spark):
    """Trailing 1h RANGE frame vs a python model, with equal timestamps
    (peers must see each other) and sub-second edges (a row 3599.9999s
    back is in, 3600.000001s back is out)."""
    from datetime import datetime, timedelta

    from feldman_spark.ops.windows import rolling_time_agg

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, t0, 10.0),
        (2, 1, t0 + timedelta(seconds=100), 20.0),
        (3, 1, t0 + timedelta(seconds=100), 30.0),          # tie with 2
        (4, 1, t0 + timedelta(seconds=3700, microseconds=1), 40.0),
        (5, 1, t0 + timedelta(seconds=3700), 50.0),          # 1h after 2/3
        (6, 2, t0, 60.0),                                    # other key
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    out = {r["event_id"]: r for r in
           rolling_time_agg(df, ["user_id"], "ts", "value", 3600).collect()}
    assert out[1]["rolling_n"] == 1 and out[1]["rolling_sum"] == 10.0
    # ties see each other
    assert out[2]["rolling_n"] == 3 and out[2]["rolling_sum"] == 60.0
    assert out[3]["rolling_n"] == 3
    # row 5 at +3700: includes 2,3 (3600s back exactly) but not 1
    assert out[5]["rolling_n"] == 3 and out[5]["rolling_sum"] == 100.0
    # row 4 one microsecond later: 2,3 fall out of the hour
    assert out[4]["rolling_n"] == 2 and out[4]["rolling_sum"] == 90.0
    assert out[6]["rolling_n"] == 1  # keys are independent
    assert out[2]["rolling_avg"] == 20.0


def test_winsorize_clamps_tails_only(spark):
    from feldman_spark.ops.filters import winsorize

    # 1..100 plus two absurd outliers; p01/p99 of the 102 values
    vals = list(range(1, 101)) + [10_000, -10_000]
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)],
                               "id long, v double")
    out = {r["id"]: r["v_w"] for r in winsorize(df, "v").collect()}
    # outliers clamped to the interpolated bounds, interior untouched
    assert out[100] < 10_000 and out[101] > -10_000
    assert out[49] == 50.0
    assert min(out.values()) == out[101] and max(out.values()) == out[100]
    assert winsorize(df, "v").count() == 102  # clamping, not filtering
    import pytest as _pytest
    with _pytest.raises(ValueError):
        winsorize(df, "v", lower=0.9, upper=0.1)


def test_merge_upsert_semantics(spark):
    from feldman_spark.ops.merge import merge_upsert

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id int, name string, v double")
    chg = spark.createDataFrame(
        [(2, "b2", 21.0, 100, "upsert"),   # superseded by seq 101
         (2, "b3", 22.0, 101, "upsert"),
         (3, None, 0.0, 100, "delete"),    # key removed
         (4, "d", 40.0, 100, "upsert"),    # fresh insert
         (5, "e", 50.0, 100, "delete")],   # delete of an absent key: no-op
        "id int, name string, v double, seq int, op string")
    out = {r["id"]: r for r in merge_upsert(snap, chg, ["id"], "seq").collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["name"] == "a"            # untouched snapshot row carries
    assert out[2]["name"] == "b3" and out[2]["v"] == 22.0  # latest seq wins
    assert out[4]["name"] == "d"
    # a delete then a later re-insert of the same key survives
    chg2 = spark.createDataFrame(
        [(3, "x", 1.0, 100, "delete"), (3, "c2", 31.0, 101, "upsert")],
        "id int, name string, v double, seq int, op string")
    out2 = {r["id"]: r for r in merge_upsert(snap, chg2, ["id"], "seq").collect()}
    assert out2[3]["name"] == "c2"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        merge_upsert(snap, chg.drop("op"), ["id"], "seq")


def test_bloom_semi_join_exact_and_bounded_fp(spark):
    from feldman_spark.ops.joins import (bloom_might_contain,
                                         bloom_semi_join, semi_join)

    big = spark.range(0, 30000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("x"))
    keys = spark.range(0, 30000, 3).select(F.col("id").alias("k"))
    exact = semi_join(big, keys, ["k"])
    got = bloom_semi_join(big, keys, ["k"], fpp=0.01)
    assert got.count() == exact.count() == 10000
    assert got.exceptAll(exact).count() == 0
    # prefilter alone: ALL true matches survive (no false negatives),
    # false positives bounded near the design fpp
    pref = bloom_might_contain(big, keys, ["k"], fpp=0.01)
    surv = pref.count()
    assert surv >= 10000                       # zero false negatives
    fp_rate = (surv - 10000) / 20000
    assert fp_rate < 0.03                      # 3x design fpp headroom
    # disjoint key sets: survivors are pure false positives, still bounded
    alien = spark.range(100000, 130000).select(F.col("id").alias("k"))
    fp_only = bloom_might_contain(alien, keys, ["k"], fpp=0.01).count()
    assert fp_only / 30000 < 0.03
    assert bloom_semi_join(alien, keys, ["k"], fpp=0.01).count() == 0


def test_table_diff_classification(spark):
    from feldman_spark.ops.diff import table_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (5, "e", 5.0)],
        "id int, name string, v double")
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "cX", 3.0), (4, "d", 4.0)],
        "id int, name string, v double")
    got = {r["id"]: r["diff_status"]
           for r in table_diff(old, new, ["id"]).collect()}
    assert got == {1: "unchanged", 2: "unchanged",  # NULL == NULL (null-safe)
                   3: "changed", 4: "added", 5: "removed"}
    # null -> value flips are 'changed', not 'unchanged'
    new2 = new.withColumn("v", F.when(F.col("id") == 2, 9.0)
                          .otherwise(F.col("v")))
    assert {r["id"]: r["diff_status"]
            for r in table_diff(old, new2, ["id"]).collect()}[2] == "changed"
    # compare_cols restricts the payload: name-only diff ignores v changes
    sub = table_diff(old, new2, ["id"], compare_cols=["name"])
    assert {r["id"]: r["diff_status"] for r in sub.collect()}[2] == "unchanged"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        table_diff(old, new, ["id"], compare_cols=["missing"])


def test_heavy_hitters_exact_over_sketch(spark):
    from feldman_spark.ops.skew import heavy_hitters

    # 3 hot keys (1000/500/200 rows) in a sea of 5000 singletons: the
    # exact output must equal the full group-by, however the sketch
    # candidates fall
    rows = ([("hot1",)] * 1000 + [("hot2",)] * 500 + [("hot3",)] * 200
            + [(f"cold{i}",) for i in range(5000)])
    df = spark.createDataFrame(rows, "k string").repartition(8)
    got = {r["k"]: r["n"]
           for r in heavy_hitters(df, ["k"], min_count=200).collect()}
    assert got == {"hot1": 1000, "hot2": 500, "hot3": 200}
    # threshold excludes borderline keys exactly
    got2 = heavy_hitters(df, ["k"], min_count=201)
    assert {r["k"] for r in got2.collect()} == {"hot1", "hot2"}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        heavy_hitters(df, ["k"], min_count=0)
    with _pytest.raises(ValueError):
        heavy_hitters(df, ["k"], min_count=10, support=1.5)


def test_grouped_topk_matches_window_twin(spark):
    from feldman_spark.ops.windows import grouped_topk

    # skewed: one hot group with 5000 rows, many singleton groups;
    # duplicate order values exercised with a unique tiebreak
    rows = [(i, "hot", float(i % 97)) for i in range(5000)]
    rows += [(10000 + g, f"g{g}", float(g)) for g in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    df = df.unionByName(spark.createDataFrame(
        [(99999, "hot", None)], "id long, grp string, score double"))

    fast = grouped_topk(df, ["grp"], "score", 4, tiebreak_cols=["id"])
    slow = grouped_topk(df, ["grp"], "score", 4, tiebreak_cols=["id"],
                        partial=False)
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0
    got = fast.filter(F.col("grp") == "hot").orderBy("id").collect()
    # top score 96 appears many times; lowest ids win the tiebreak
    assert [r["id"] for r in got] == [96, 193, 290, 387]
    # null scores excluded, singleton groups keep their row
    assert fast.filter(F.col("id") == 99999).count() == 0
    assert fast.filter(F.col("grp") == "g7").count() == 1
    # ascending order flips the winners
    asc = grouped_topk(df, ["grp"], "score", 1, tiebreak_cols=["id"],
                       descending=False)
    assert asc.filter(F.col("grp") == "hot").first()["score"] == 0.0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        grouped_topk(df, ["grp"], "score", 0)


# ---------------------------------------------------------------------------
# J13 interval-overlap join
# ---------------------------------------------------------------------------

def test_interval_overlap_join_matches_brute_force(spark):
    """Binned overlap join == the theta-join model, each pair exactly
    once, including intervals spanning many bins and exact-touch
    endpoints (closed-interval semantics)."""
    from feldman_spark.ops.joins import interval_overlap_join

    a_rows = [(1, 0.0, 100.0), (2, 10.0, 12.0), (3, 50.0, 50.0),
              (4, 200.0, 210.0)]
    b_rows = [(10, 5.0, 11.0), (11, 12.0, 49.0), (12, 50.0, 60.0),
              (13, 150.0, 199.0), (14, 210.0, 300.0)]
    a = spark.createDataFrame(a_rows, ["aid", "alo", "ahi"])
    b = spark.createDataFrame(b_rows, ["bid", "blo", "bhi"])
    got = sorted(
        (r["aid"], r["bid"])
        for r in interval_overlap_join(
            a, b, "alo", "ahi", "blo", "bhi", bin_width=7.0).collect())
    want = sorted(
        (ai, bi)
        for ai, lo1, hi1 in a_rows for bi, lo2, hi2 in b_rows
        if lo1 <= hi2 and lo2 <= hi1)
    assert got == want


def test_interval_overlap_join_plan_is_equi_join(spark):
    from feldman_spark.ops.joins import interval_overlap_join

    a = spark.range(500).select(
        F.col("id").alias("aid"),
        (F.col("id") * 2.0).alias("alo"),
        (F.col("id") * 2.0 + 9.0).alias("ahi"))
    b = spark.range(300).select(
        F.col("id").alias("bid"),
        (F.col("id") * 3.0).alias("blo"),
        (F.col("id") * 3.0 + 4.0).alias("bhi"))
    out = interval_overlap_join(a, b, "alo", "ahi", "blo", "bhi",
                                bin_width=8.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert out.count() > 0


def test_interval_overlap_join_rejects_column_overlap(spark):
    from feldman_spark.ops.joins import interval_overlap_join

    a = spark.createDataFrame([(1, 0.0, 1.0)], ["x", "lo", "hi"])
    b = spark.createDataFrame([(2, 0.0, 1.0)], ["x", "l2", "h2"])
    with pytest.raises(ValueError, match="x"):
        interval_overlap_join(a, b, "lo", "hi", "l2", "h2", bin_width=1.0)


# ---------------------------------------------------------------------------
# J14 fuzzy entity linkage
# ---------------------------------------------------------------------------

def test_fuzzy_link_finds_best_match_and_caps_distance(spark):
    from feldman_spark.ops.linkage import fuzzy_link

    catalog = spark.createDataFrame(
        [(1, "blue widget"), (2, "blue widgets"), (3, "blue bolt"),
         (4, "red gear")],
        ["cid", "cname"])
    probes = spark.createDataFrame(
        [(100, "blue widgft"),   # 1 sub from "blue widget"
         (101, "bluf bolt"),     # 1 sub from "blue bolt"
         (102, "zzzz nothing")], # nothing within distance 2
        ["pid", "pname"])
    out = {r["pid"]: (r["cid"], r["distance"])
           for r in fuzzy_link(probes, catalog, "pid", "pname",
                               "cid", "cname", max_distance=2).collect()}
    assert out[100] == (1, 1)     # widgets would be dist 2; widget wins
    assert out[101] == (3, 1)
    assert 102 not in out


def test_fuzzy_link_tiebreak_on_catalog_id(spark):
    from feldman_spark.ops.linkage import fuzzy_link

    catalog = spark.createDataFrame(
        [(7, "abcx"), (5, "abcy")], ["cid", "cname"])
    probes = spark.createDataFrame([(1, "abcz")], ["pid", "pname"])
    out = fuzzy_link(probes, catalog, "pid", "pname", "cid", "cname",
                     max_distance=2).collect()
    assert len(out) == 1 and out[0]["cid"] == 5  # dist ties -> min cid


def test_fuzzy_link_recall_is_complete(spark):
    """PassJoin pigeonhole guarantee: EVERY pair within max_distance is
    found — brute-force python levenshtein as the oracle, including
    corruptions that destroy the leading characters (the case prefix
    blocking misses) and short strings (< tau+1 chars, side path)."""
    from feldman_spark.ops.linkage import fuzzy_link

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    catalog = [(i, n) for i, n in enumerate(
        ["olive green metal", "olive green steel", "xlive green metal",
         "navy blue metal", "ab", "a", "zebra stripe paint"])]
    probes = [(100 + i, n) for i, n in enumerate(
        ["Xlive green metal",   # head corruption: prefix block would miss
         "olive green metaXY",  # 2 appends
         "navy blue meta",      # 1 deletion
         "b", "abc",            # short-string side path
         "totally unrelated"])]
    got = {r["pid"]: (r["cid"], r["distance"])
           for r in fuzzy_link(
               spark.createDataFrame(probes, ["pid", "pname"]),
               spark.createDataFrame(catalog, ["cid", "cname"]),
               "pid", "pname", "cid", "cname", max_distance=2).collect()}
    for pid, pname in probes:
        best = min(((lev(pname.lower(), cname.lower()), cid, cname)
                    for cid, cname in catalog), key=lambda t: (t[0], t[1]))
        if best[0] <= 2:
            assert got[pid] == (best[1], best[0]), (pid, pname, best)
        else:
            assert pid not in got, (pid, pname)


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------

def test_funnel_steps_ordering_semantics(spark):
    """Step i counts only users whose step-i event is at-or-after their
    step-(i-1) time: u1 completes A->B->C, u2 has B before A (B never
    reached), u3 stops after A."""
    from feldman_spark.ops.windows import funnel_steps
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, t(1), "A"), (1, t(2), "B"), (1, t(3), "C"),
        (2, t(5), "B"), (2, t(6), "A"),
        (3, t(1), "A"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "etype"])
    steps = [("A", F.col("etype") == "A"),
             ("B", F.col("etype") == "B"),
             ("C", F.col("etype") == "C")]
    out = {r["step"]: (r["users"], r["conv_rate"])
           for r in funnel_steps(df, "user_id", "ts", steps).collect()}
    assert out["A"] == (3, 1.0)
    assert out["B"] == (1, round(1 / 3, 4))
    assert out["C"] == (1, round(1 / 3, 4))


def test_funnel_steps_single_exchange(spark):
    """All step windows share one partitionBy(user) spec: the physical
    plan carries exactly one shuffle exchange for the window stage (plus
    the final single-partition aggregate)."""
    from feldman_spark.ops.windows import funnel_steps

    df = spark.range(100).select(
        (F.col("id") % 10).alias("user_id"),
        F.timestamp_seconds(F.col("id") + 1700000000).alias("ts"),
        F.concat(F.lit("t"), (F.col("id") % 3)).alias("etype"))
    steps = [("s0", F.col("etype") == "t0"),
             ("s1", F.col("etype") == "t1"),
             ("s2", F.col("etype") == "t2")]
    out = funnel_steps(df, "user_id", "ts", steps)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # windows + per-user collapse reuse one hash-partitioning on user_id
    assert plan.count("hashpartitioning(user_id") <= 1


def test_with_group_zscore_values_and_constant_group(spark):
    from feldman_spark.ops.filters import with_group_zscore, zscore_outliers
    from pyspark.sql import functions as F

    rows = [("g1", 1.0), ("g1", 2.0), ("g1", 3.0),
            ("g2", 5.0), ("g2", 5.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {(r["g"], r["v"]): r["z"]
           for r in with_group_zscore(df, ["g"], "v").collect()}
    # g1: mu=2, sd_pop=sqrt(2/3)=0.8165 -> z = +-1.2247, 0
    assert got[("g1", 1.0)] == -1.2247
    assert got[("g1", 2.0)] == 0.0
    assert got[("g1", 3.0)] == 1.2247
    # constant group: sd=0 -> z NULL, never a division error
    assert got[("g2", 5.0)] is None

    out = zscore_outliers(df, ["g"], "v", threshold=1.0).collect()
    assert sorted((r["g"], r["v"]) for r in out) == [
        ("g1", 1.0), ("g1", 3.0)]


def test_profile_skew_stats(spark):
    from feldman_spark.pipeline.profile import profile_skew

    # key a x6, b x2, c x2 -> n_keys 3, max 6, avg 10/3, ratio 1.8
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] * 2
    row = profile_skew(spark.createDataFrame(rows, ["k"]), ["k"]).collect()[0]
    assert row["n_keys"] == 3 and row["n_rows"] == 10
    assert row["max_n"] == 6 and row["avg_n"] == 3.3333
    assert row["p50_n"] == 2.0
    assert row["skew_ratio"] == 1.8
    assert row["top_key"] == "a"


def test_join_cardinality_exact_and_hot_key(spark):
    from feldman_spark.pipeline.profile import join_cardinality

    l = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("x",)], ["k"])
    r = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 1 + [("y",)] * 2, ["k"])
    row = join_cardinality(l, r, "k", "k").collect()[0]
    assert (row["n_left"], row["n_right"]) == (6, 7)
    assert (row["n_left_keys"], row["n_right_keys"]) == (3, 3)
    assert row["n_common_keys"] == 2
    assert row["join_rows"] == 3 * 4 + 2 * 1  # == actual join size
    assert row["max_key_rows"] == 12
    assert l.join(r, "k").count() == row["join_rows"]

    # disjoint keys: zero join rows, no null leakage
    row = join_cardinality(
        l, spark.createDataFrame([("z",)], ["k"]), "k", "k").collect()[0]
    assert row["join_rows"] == 0 and row["max_key_rows"] == 0


def test_psi_drift_identical_and_shifted(spark):
    from feldman_spark.pipeline.profile import psi_drift
    import math

    ref = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    out = psi_drift(ref, ref, "v", buckets=5).collect()
    assert len(out) == 5 and all(r["contrib"] == 0.0 for r in out)
    assert all(r["n_ref"] == r["n_cur"] == 20 for r in out)

    # current shifted far right: clamps into the top bucket
    cur = spark.createDataFrame([(1000.0,)] * 50, ["v"])
    rows = {r["bucket"]: r for r in
            psi_drift(ref, cur, "v", buckets=5).collect()}
    assert rows[4]["n_cur"] == 50
    psi = sum(r["contrib"] for r in rows.values())
    assert psi > 0.25  # "shifted" on the standard PSI scale
    assert all(math.isfinite(r["contrib"]) for r in rows.values())


def test_event_transitions_counts_and_probs(spark):
    from feldman_spark.ops.windows import event_transitions

    rows = [
        ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "a"), ("u1", 4, "b"),
        ("u2", 1, "a"), ("u2", 2, "b"),
    ]
    df = spark.createDataFrame(rows, ["u", "t", "s"])
    got = {(r["prev_state"], r["state"]): (r["n"], r["prob"])
           for r in event_transitions(df, "u", "s", ["t"]).collect()}
    # a->b x3 (prob 1.0 out of a), b->a x1 (prob 1.0 out of b)
    assert got == {("a", "b"): (3, 1.0), ("b", "a"): (1, 1.0)}


def test_retention_cohorts_two_cohorts(spark):
    import datetime as dt
    from feldman_spark.ops.windows import retention_cohorts

    d = dt.datetime
    rows = [
        # u1, u2 first seen week of Mon 2024-01-01; u1 returns next week
        ("u1", d(2024, 1, 2, 10)), ("u2", d(2024, 1, 3, 9)),
        ("u1", d(2024, 1, 9, 8)),
        # u3 first seen the following week
        ("u3", d(2024, 1, 10, 12)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {(str(r["cohort"]), r["offset"]): (r["active_users"], r["retention"])
           for r in retention_cohorts(df, "user_id", "ts").collect()}
    assert got == {
        ("2024-01-01", 0): (2, 1.0),
        ("2024-01-01", 1): (1, 0.5),
        ("2024-01-08", 0): (1, 1.0),
    }


def test_lm_score_prefers_typical_sequences(spark):
    from feldman_spark.pipeline.text import lm_score

    # corpus dominated by "the cat sat"; doc 4 is an atypical sequence
    rows = [(1, "the cat sat"), (2, "the cat sat"), (3, "the cat sat"),
            (4, "sat the tac"), (5, "x")]  # doc 5: <2 tokens, omitted
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_logprob"])
           for r in lm_score(df).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1] == got[2] == got[3]
    assert got[1][0] == 2 and got[4][0] == 2
    assert got[1][1] > got[4][1]


# ---------------------------------------------------------------------------
# round-10b: merge_intervals / grouped_mode
# ---------------------------------------------------------------------------

def test_merge_intervals_islands(spark):
    from feldman_spark.ops.windows import merge_intervals

    df = spark.createDataFrame(
        [("u1", 0, 10),   # island 1 (overlaps next)
         ("u1", 5, 12),
         ("u1", 20, 25),  # island 2 (touches next: start == prev end)
         ("u1", 25, 30),
         ("u1", 50, 51),  # island 3
         ("u2", 1, 2),    # other group unaffected
         ("u2", None, 9)],  # null start dropped
        "u string, s int, e int")
    got = {(r["u"], r["island"]): (r["island_start"], r["island_end"],
                                   r["n_merged"])
           for r in merge_intervals(df, ["u"], "s", "e").collect()}
    assert got == {
        ("u1", 1): (0, 12, 2),
        ("u1", 2): (20, 30, 2),
        ("u1", 3): (50, 51, 1),
        ("u2", 1): (1, 2, 1),
    }


def test_merge_intervals_contained_interval_extends_nothing(spark):
    from feldman_spark.ops.windows import merge_intervals

    # an interval fully inside the running island must not split it even
    # when a LATER interval starts after the contained one's end — the
    # running max(e), not lag(e), is what the next start compares against
    df = spark.createDataFrame(
        [("u", 0, 100), ("u", 10, 20), ("u", 30, 40), ("u", 150, 160)],
        "u string, s int, e int")
    rows = (merge_intervals(df, ["u"], "s", "e")
            .orderBy("island").collect())
    assert [(r["island_start"], r["island_end"], r["n_merged"])
            for r in rows] == [(0, 100, 3), (150, 160, 1)]


def test_grouped_mode_tiebreak_and_nulls(spark):
    from feldman_spark.ops.windows import grouped_mode

    df = spark.createDataFrame(
        [("u1", "b"), ("u1", "b"), ("u1", "a"), ("u1", "a"),  # tie -> 'a'
         ("u2", "z"), ("u2", "z"), ("u2", "y"),
         ("u3", None)],  # null-only group disappears
        "u string, v string")
    got = {r["u"]: (r["mode"], r["mode_count"])
           for r in grouped_mode(df, ["u"], "v").collect()}
    assert got == {"u1": ("a", 2), "u2": ("z", 2)}


def test_grid_radius_join_exact_vs_cross(spark):
    from feldman_spark.ops.joins import grid_radius_join
    from pyspark.sql import functions as F

    import random
    rnd = random.Random(7)
    left = spark.createDataFrame(
        [(i, rnd.uniform(-10, 10), rnd.uniform(-10, 10)) for i in range(60)],
        "lid bigint, lx double, ly double")
    right = spark.createDataFrame(
        [(j, rnd.uniform(-10, 10), rnd.uniform(-10, 10)) for j in range(80)],
        "rid bigint, rx double, ry double")
    got = {(r["lid"], r["rid"]) for r in grid_radius_join(
        left, right, radius=2.5, left_xy=("lx", "ly"),
        right_xy=("rx", "ry")).collect()}
    # brute-force twin: cross join + exact filter
    want = {(r["lid"], r["rid"]) for r in left.crossJoin(right).filter(
        (F.col("lx") - F.col("rx")) ** 2 + (F.col("ly") - F.col("ry")) ** 2
        <= 2.5 ** 2).collect()}
    assert got == want and len(want) > 0


def test_grid_radius_join_validates(spark):
    import pytest
    from feldman_spark.ops.joins import grid_radius_join

    df = spark.createDataFrame([(1, 0.0, 0.0)], "i bigint, x double, y double")
    other = spark.createDataFrame([(2, 0.0, 0.0)],
                                  "j bigint, u double, v double")
    with pytest.raises(ValueError):
        grid_radius_join(df, other, radius=0.0, left_xy=("x", "y"),
                         right_xy=("u", "v"))
    with pytest.raises(ValueError):
        grid_radius_join(df, other, radius=1.0, cell=0.5,
                         left_xy=("x", "y"), right_xy=("u", "v"))
    with pytest.raises(ValueError):  # overlapping coord names
        grid_radius_join(df, df, radius=1.0, left_xy=("x", "y"),
                         right_xy=("x", "y"))


# ---------------------------------------------------------------------------
# round-10c: resample_interpolate / cusum_changepoint / weighted_percentile /
# mad_outliers
# ---------------------------------------------------------------------------

def test_resample_interpolate_linear_and_exact_hits(spark):
    from feldman_spark.ops.windows import resample_interpolate

    # samples at x=0 (y=0), x=10 (y=100), x=25 (y=40): grid step 5 ->
    # points 0,5,10,15,20,25; 0/10/25 are exact sample hits, the rest
    # linear between their brackets
    df = spark.createDataFrame(
        [("g", 0, 0.0), ("g", 10, 100.0), ("g", 25, 40.0)],
        "g string, x long, y double")
    got = {r["grid_x"]: r["y_interp"]
           for r in resample_interpolate(df, ["g"], "x", "y", 5).collect()}
    assert got == {0: 0.0, 5: 50.0, 10: 100.0, 15: 80.0, 20: 60.0, 25: 40.0}


def test_resample_interpolate_duplicates_avg_and_single_sample(spark):
    from feldman_spark.ops.windows import resample_interpolate

    df = spark.createDataFrame(
        # duplicates at x=10 average to 30; lone off-grid group -> no rows
        [("a", 10, 20.0), ("a", 10, 40.0), ("a", 20, 50.0),
         ("b", 7, 1.0),
         ("c", 30, 9.0)],  # single sample ON the grid -> its own value
        "g string, x long, y double")
    out = resample_interpolate(df, ["g"], "x", "y", 10)
    got = {(r["g"], r["grid_x"]): r["y_interp"] for r in out.collect()}
    assert got == {("a", 10): 30.0, ("a", 20): 50.0, ("c", 30): 9.0}


def test_resample_interpolate_validates_step(spark):
    from feldman_spark.ops.windows import resample_interpolate

    df = spark.createDataFrame([("g", 1, 1.0)], "g string, x long, y double")
    with pytest.raises(ValueError, match="step"):
        resample_interpolate(df, ["g"], "x", "y", 0)


def test_cusum_changepoint_finds_step_and_direction(spark):
    from feldman_spark.ops.windows import cusum_changepoint

    # clean level shift up after t=5: cusum minimizes exactly at the
    # last low point (t=5), direction +1
    rows = [("k", t, 1.0) for t in range(1, 6)] + \
           [("k", t, 9.0) for t in range(6, 11)]
    # down-shift twin
    rows += [("d", t, 9.0) for t in range(1, 6)] + \
            [("d", t, 1.0) for t in range(6, 11)]
    # flat group (sd == 0) and tiny group are dropped
    rows += [("flat", t, 3.0) for t in range(1, 10)]
    rows += [("tiny", 1, 1.0), ("tiny", 2, 100.0)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {r["k"]: (r["cp_t"], r["direction"], r["n_points"])
           for r in cusum_changepoint(df, ["k"], "v", ["t"],
                                      min_points=8).collect()}
    assert got == {"k": (5, 1, 10), "d": (5, -1, 10)}


def test_cusum_changepoint_tie_breaks_earliest(spark):
    from feldman_spark.ops.windows import cusum_changepoint

    # symmetric square wave: |S| peaks equally at t=2 and t=6 (S=-2 and
    # +2 if mean=5 over 1,1,9,9,9,9,1,1? construct simple symmetric):
    # values 0,0,10,10,10,10,0,0 -> mean 5, S: -5,-10,-5,0,5,10,5,0 —
    # unique peak at t=2. Use a truly tied shape: 0,10,0,10 -> mean 5,
    # S: -5,0,-5,0 — |S| ties at t=1 and t=3; earliest (t=1) must win.
    df = spark.createDataFrame(
        [("k", 1, 0.0), ("k", 2, 10.0), ("k", 3, 0.0), ("k", 4, 10.0)],
        "k string, t int, v double")
    r = cusum_changepoint(df, ["k"], "v", ["t"], min_points=2).collect()
    assert len(r) == 1 and r[0]["cp_t"] == 1


def test_weighted_percentile_median_and_weights_matter(spark):
    from feldman_spark.ops.windows import weighted_percentile

    df = spark.createDataFrame(
        # unweighted median of (1,2,100) is 2; weight 100 heavily
        [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 100.0, 10.0),
         # zero/negative/null weights carry no mass
         ("g", 0.5, 0.0), ("g", 0.1, -3.0), ("g", 0.2, None),
         ("h", 5.0, 2.0), ("h", 7.0, 1.0)],
        "g string, v double, w double")
    got = {r["g"]: r["wpct"]
           for r in weighted_percentile(df, ["g"], "v", "w", 0.5).collect()}
    # g: total 12, cum at v=100 first reaches 6 -> 100; h: cum at 5 is
    # 2 >= 1.5 -> 5
    assert got == {"g": 100.0, "h": 5.0}
    with pytest.raises(ValueError, match="0 < p < 1"):
        weighted_percentile(df, ["g"], "v", "w", 1.0)


def test_weighted_percentile_modes_agree(spark):
    # r10 optimization: the size-adaptive binned plan (threshold-bin
    # exact pick) must select the same value as the single-sort plan
    # for every group shape — constant-value, single-row, duplicated
    # values straddling bins, and weights that skip the threshold
    from feldman_spark.ops.windows import weighted_percentile

    rows = [("g", float(v % 97) * 1.5 - 20.0, float(v % 7 + 1))
            for v in range(500)]
    rows += [("one", 42.0, 3.0), ("const", 3.14, 1.0)] * 5
    rows += [("dup", 1.0, 10.0), ("dup", 1.0, 10.0), ("dup", 2.0, 1.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    for p in (0.1, 0.5, 0.9):
        a = {r["g"]: r["x"] for r in weighted_percentile(
            df, ["g"], "v", "w", p, "x", mode="sort").collect()}
        b = {r["g"]: r["x"] for r in weighted_percentile(
            df, ["g"], "v", "w", p, "x", mode="binned").collect()}
        assert a == b, (p, a, b)


def test_mad_outliers_flags_tail_not_dragged_by_it(spark):
    from feldman_spark.ops.filters import mad_outliers

    # 20 values near 10 plus one wild point: plain z would be diluted,
    # robust z flags it decisively; constant group contributes nothing
    rows = [("a", float(v)) for v in
            [9, 10, 11, 10, 9, 11, 10, 10, 9, 11,
             10, 9, 11, 10, 10, 9, 11, 10, 9, 11]] + \
           [("a", 1000.0)] + [("c", 5.0)] * 10
    df = spark.createDataFrame(rows, "g string, v double")
    out = mad_outliers(df, ["g"], "v", threshold=3.5).collect()
    assert [(r["g"], r["v"]) for r in out] == [("a", 1000.0)]
    assert out[0]["robust_z"] > 3.5


def test_mad_outliers_signed_and_grouped(spark):
    from feldman_spark.ops.filters import mad_outliers

    rows = ([("g", float(v)) for v in range(1, 12)]  # median 6, MAD 3
            + [("g", -94.0), ("g", 106.0)])
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["v"]: r["robust_z"]
           for r in mad_outliers(df, ["g"], "v", threshold=3.5).collect()}
    # 0.6745*(106-6)/3 = 22.4833; symmetric negative for -94
    assert got == {106.0: 22.4833, -94.0: -22.4833}


def test_locf_fill_forward_and_backfill(spark):
    from feldman_spark.ops.windows import locf_fill

    df = spark.createDataFrame(
        [("u", 1, None), ("u", 2, 5.0), ("u", 3, None), ("u", 4, None),
         ("u", 5, 7.0), ("u", 6, None),
         ("v", 1, None)],  # group with no observations stays all-null
        "g string, t int, v double")
    fwd = {(r["g"], r["t"]): r["v_filled"]
           for r in locf_fill(df, ["g"], ["t"], ["v"]).collect()}
    assert fwd == {("u", 1): None, ("u", 2): 5.0, ("u", 3): 5.0,
                   ("u", 4): 5.0, ("u", 5): 7.0, ("u", 6): 7.0,
                   ("v", 1): None}
    back = {(r["g"], r["t"]): r["v_filled"]
            for r in locf_fill(df, ["g"], ["t"], ["v"],
                               backfill=True).collect()}
    assert back[("u", 1)] == 5.0 and back[("v", 1)] is None
    # row count and original column untouched
    assert locf_fill(df, ["g"], ["t"], ["v"]).count() == 7


def test_grouped_trend_exact_line_constant_and_minpoints(spark):
    from feldman_spark.pipeline.profile import grouped_trend

    rows = [("line", float(x), 2.0 * x + 1.0) for x in range(5)]
    rows += [("const", float(x), 4.0) for x in range(5)]
    rows += [("tiny", 0.0, 0.0), ("tiny", 1.0, 1.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: (r["n_points"], r["slope"], r["intercept"], r["r2"])
           for r in grouped_trend(df, ["g"], "x", "y",
                                  min_points=3).collect()}
    assert got["line"] == (5, 2.0, 1.0, 1.0)
    assert got["const"][1] == 0.0 and got["const"][3] is None
    assert "tiny" not in got
    with pytest.raises(ValueError, match="min_points"):
        grouped_trend(df, ["g"], "x", "y", min_points=1)


def test_session_paths_order_topk_and_maxsteps(spark):
    from feldman_spark.ops.windows import session_paths

    rows = [
        # session s1: A>B>C (twice via s1/s2), s3: A>B, s4: B (count 1)
        ("s1", 1, "A"), ("s1", 2, "B"), ("s1", 3, "C"),
        ("s2", 1, "A"), ("s2", 2, "B"), ("s2", 3, "C"),
        ("s3", 5, "A"), ("s3", 9, "B"),
        ("s4", 1, "B"),
        ("s5", 2, "A"), ("s5", 1, "B"),  # order matters: B>A
    ]
    df = spark.createDataFrame(rows, "sid string, t int, step string")
    got = [(r["path"], r["n_sessions"])
           for r in session_paths(df, ["sid"], "step", ["t"],
                                  top_k=3).collect()]
    # count desc, then path asc tie-break
    assert got == [("A>B>C", 2), ("A>B", 1), ("B", 1)]
    trunc = {r["path"]: r["n_sessions"]
             for r in session_paths(df, ["sid"], "step", ["t"],
                                    top_k=10, max_steps=2).collect()}
    assert trunc == {"A>B": 3, "B": 1, "B>A": 1}
    with pytest.raises(ValueError, match="top_k"):
        session_paths(df, ["sid"], "step", ["t"], top_k=0)
