"""distribution_drift (TV/KS exact integer chains) + centroid_drift."""

import pytest

from pyspark.sql import functions as F

from polars_order_book_spark.operators.linalg import centroid_drift
from polars_order_book_spark.operators.profiling import distribution_drift


def _lab(spark, rows):
    return spark.createDataFrame(rows, "seg string, cohort string, bucket long")


def test_drift_zero_when_distributions_match(spark):
    rows = [("a", c, b) for c in ("base", "current") for b in (0, 1, 2) for _ in range(4)]
    out = distribution_drift(
        _lab(spark, rows), by=["seg"], cohort_col="cohort", bucket_col="bucket"
    ).collect()
    assert out[0]["tv"] == 0.0 and out[0]["ks"] == 0.0
    assert out[0]["n_base"] == 12 and out[0]["n_current"] == 12


def test_drift_one_when_disjoint(spark):
    rows = [("a", "base", 0)] * 5 + [("a", "current", 9)] * 3
    out = distribution_drift(
        _lab(spark, rows), by=["seg"], cohort_col="cohort", bucket_col="bucket"
    ).collect()
    assert out[0]["tv"] == 1.0 and out[0]["ks"] == 1.0


def test_drift_known_value_and_unequal_sizes(spark):
    # base: 3 rows in bucket 0, 1 in bucket 1 (p = 3/4, 1/4)
    # current: 1 row in bucket 0, 1 in bucket 1 (q = 1/2, 1/2)
    rows = [("a", "base", 0)] * 3 + [("a", "base", 1)] + [
        ("a", "current", 0),
        ("a", "current", 1),
    ]
    r = distribution_drift(
        _lab(spark, rows), by=["seg"], cohort_col="cohort", bucket_col="bucket"
    ).collect()[0]
    assert r["tv"] == pytest.approx(0.25)  # 1/2 * (|3/4-1/2| + |1/4-1/2|)
    assert r["ks"] == pytest.approx(0.25)  # max CDF gap at bucket 0


def test_drift_drops_one_sided_segments(spark):
    rows = [("only_base", "base", 0), ("both", "base", 0), ("both", "current", 1)]
    segs = {
        r["seg"]
        for r in distribution_drift(
            _lab(spark, rows), by=["seg"], cohort_col="cohort", bucket_col="bucket"
        ).collect()
    }
    assert segs == {"both"}


def test_centroid_drift_identical_cohorts_cosine_one(spark):
    rows = [(1, "base", [1.0, 2.0]), (1, "current", [2.0, 4.0])]  # same direction
    df = spark.createDataFrame(rows, "label int, cohort string, embedding array<double>")
    r = centroid_drift(df, by="label", cohort_col="cohort", dim=2).collect()[0]
    assert r["centroid_cosine"] == pytest.approx(1.0)


def test_centroid_drift_orthogonal_cohorts(spark):
    rows = [
        (1, "base", [1.0, 0.0]),
        (1, "base", [3.0, 0.0]),
        (1, "current", [0.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, "label int, cohort string, embedding array<double>")
    r = centroid_drift(df, by="label", cohort_col="cohort", dim=2).collect()[0]
    assert r["centroid_cosine"] == pytest.approx(0.0)
    assert r["n_base"] == 2 and r["n_current"] == 1


def test_centroid_drift_requires_both_cohorts(spark):
    rows = [(1, "base", [1.0, 0.0]), (2, "current", [1.0, 0.0])]
    df = spark.createDataFrame(rows, "label int, cohort string, embedding array<double>")
    assert centroid_drift(df, by="label", cohort_col="cohort", dim=2).count() == 0


def test_drift_from_counts_matches_row_level(spark):
    """The count-level entry point (the streaming/serving shape) must be
    bit-identical to distribution_drift over the raw rows — including
    buckets absent from one histogram."""
    from polars_order_book_spark.operators.profiling import drift_from_counts

    rows = (
        [("a", "base", 0)] * 3
        + [("a", "base", 1)]
        + [("a", "current", 0), ("a", "current", 2)]  # bucket 2 absent in base
    )
    df = _lab(spark, rows)
    expected = sorted(
        map(
            tuple,
            distribution_drift(
                df, by=["seg"], cohort_col="cohort", bucket_col="bucket"
            ).collect(),
        )
    )
    base = (
        df.where(F.col("cohort") == "base")
        .groupBy("seg", "bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    cur = (
        df.where(F.col("cohort") == "current")
        .groupBy("seg", "bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    got = sorted(
        map(
            tuple,
            drift_from_counts(base, cur, by=["seg"], bucket_col="bucket").collect(),
        )
    )
    assert got == expected
