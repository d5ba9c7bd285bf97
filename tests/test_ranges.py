"""Range-join contracts: bucketed path equals the naive predicate join,
pair multiplicity is exactly one, and the plan is an equi-join (no
nested-loop) on the scale path."""

import pytest
from pyspark.sql import functions as F

from polars_order_book_spark.operators import ranges

POINTS = [
    (1, 0.0), (2, 4.9), (3, 5.0), (4, 19.99), (5, 20.0),
    (6, 55.5), (7, 100.0), (8, -3.0), (9, None),
]
BANDS = [
    ("a", 0.0, 5.0), ("b", 5.0, 20.0), ("c", 20.0, 60.0),
    ("neg", -10.0, 0.0), ("wide", 0.0, 100.0), ("null_lo", None, 50.0),
]


def _naive(points, bands, closed="left"):
    out = set()
    for pid, p in points:
        if p is None:
            continue
        for band, lo, hi in bands:
            if lo is None or hi is None:
                continue
            hit = lo <= p < hi if closed == "left" else lo <= p <= hi
            if hit:
                out.add((pid, band))
    return out


@pytest.mark.parametrize("closed", ["left", "both"])
def test_range_join_matches_naive(spark, closed):
    pts = spark.createDataFrame(POINTS, "pid long, p double")
    bds = spark.createDataFrame(BANDS, "band string, lo double, hi double")
    got = {
        (r["pid"], r["band"])
        for r in ranges.range_join(
            pts, bds, point_col="p", lo_col="lo", hi_col="hi",
            bucket_width=7.0, closed=closed,
        ).collect()
    }
    assert got == _naive(POINTS, BANDS, closed)


def test_range_join_no_duplicate_pairs(spark):
    """A point meets each containing interval in exactly one bucket — even
    when the interval spans many buckets."""
    pts = spark.createDataFrame([(i, float(i)) for i in range(50)], "pid long, p double")
    bds = spark.createDataFrame([("all", 0.0, 1000.0)], "band string, lo double, hi double")
    out = ranges.range_join(
        pts, bds, point_col="p", lo_col="lo", hi_col="hi", bucket_width=3.0
    )
    assert out.count() == 50
    assert out.select("pid").distinct().count() == 50


def test_range_join_broadcast_path(spark):
    pts = spark.createDataFrame(POINTS, "pid long, p double")
    bds = spark.createDataFrame(BANDS, "band string, lo double, hi double")
    got = {
        (r["pid"], r["band"])
        for r in ranges.range_join(
            pts, bds, point_col="p", lo_col="lo", hi_col="hi",
            broadcast_intervals=True,
        ).collect()
    }
    assert got == _naive(POINTS, BANDS)


def test_range_join_bucketed_plan_is_equi_join(spark):
    """The scale path must not be a nested-loop: the bucket id turns the
    range predicate into a hash-joinable equi-key."""
    pts = spark.createDataFrame(POINTS, "pid long, p double")
    bds = spark.createDataFrame(BANDS, "band string, lo double, hi double")
    plan = ranges.range_join(
        pts, bds, point_col="p", lo_col="lo", hi_col="hi", bucket_width=7.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_validates_args(spark):
    pts = spark.createDataFrame(POINTS, "pid long, p double")
    bds = spark.createDataFrame(BANDS, "band string, lo double, hi double")
    with pytest.raises(ValueError, match="bucket_width"):
        ranges.range_join(pts, bds, point_col="p", lo_col="lo", hi_col="hi")
    with pytest.raises(ValueError, match="closed"):
        ranges.range_join(
            pts, bds, point_col="p", lo_col="lo", hi_col="hi",
            bucket_width=1.0, closed="right",
        )


INTERVALS_A = [(1, 0.0, 10.0), (2, 9.5, 12.0), (3, 30.0, 31.0), (4, 50.0, 90.0)]
INTERVALS_B = [(10, 5.0, 9.6), (11, 10.0, 30.0), (12, 30.5, 60.0), (13, 90.0, 95.0)]


def test_interval_overlap_join_matches_naive(spark):
    a = spark.createDataFrame(INTERVALS_A, "aid long, a_lo double, a_hi double")
    b = spark.createDataFrame(INTERVALS_B, "bid long, b_lo double, b_hi double")
    got = {
        (r["aid"], r["bid"])
        for r in ranges.interval_overlap_join(
            a, b, left_lo="a_lo", left_hi="a_hi",
            right_lo="b_lo", right_hi="b_hi", bucket_width=4.0,
        ).collect()
    }
    want = {
        (aid, bid)
        for aid, alo, ahi in INTERVALS_A
        for bid, blo, bhi in INTERVALS_B
        if alo < bhi and blo < ahi
    }
    assert got == want
    # half-open: interval 4 [50,90) does not overlap 13 [90,95)
    assert (4, 13) not in got


def test_interval_overlap_join_canonical_bucket_dedup(spark):
    """Two long co-extensive intervals share many buckets but the pair is
    emitted exactly once (canonical-bucket rule, no distinct pass)."""
    a = spark.createDataFrame([(1, 0.0, 100.0)], "aid long, a_lo double, a_hi double")
    b = spark.createDataFrame([(2, 1.0, 99.0)], "bid long, b_lo double, b_hi double")
    out = ranges.interval_overlap_join(
        a, b, left_lo="a_lo", left_hi="a_hi",
        right_lo="b_lo", right_hi="b_hi", bucket_width=5.0,
    )
    assert out.count() == 1
