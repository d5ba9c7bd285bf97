"""Incremental aggregate maintenance: the invariant is bit-equality with a
full recompute over base ∪ delta (self-maintainability of count/sum/min/max
under insert-only deltas)."""

import pytest
from pyspark.sql import functions as F

from polars_order_book_spark.operators.incremental import (
    combine_aggregates,
    incremental_agg,
)


def _facts(spark, rows):
    return spark.createDataFrame(rows, "k string, v long, d date")


ROWS = [
    ("a", 10, "2024-01-01"),
    ("a", 5, "2024-01-03"),
    ("b", 7, "2024-01-02"),
    ("b", -2, "2024-01-05"),
    ("c", 100, "2024-01-04"),
]


def _agg(df):
    return df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("v").cast("decimal(18,0)")).alias("sum_v"),
        F.min("d").alias("min_d"),
        F.max("d").alias("max_d"),
    )


def _rowmap(df):
    return {r["k"]: r.asDict() for r in df.collect()}


@pytest.mark.parametrize("cutoff", ["2024-01-01", "2024-01-03", "2024-01-06"])
def test_incremental_equals_full_recompute(spark, cutoff):
    facts = _facts(
        spark, [(k, v, __import__("datetime").date.fromisoformat(d)) for k, v, d in ROWS]
    )
    base = _agg(facts.where(F.col("d") < cutoff))
    merged = incremental_agg(
        base,
        facts.where(F.col("d") >= cutoff),
        ["k"],
        count_col="n_rows",
        sum_exprs={"sum_v": F.sum(F.col("v").cast("decimal(18,0)"))},
        min_exprs={"min_d": F.min("d")},
        max_exprs={"max_d": F.max("d")},
    )
    assert _rowmap(merged) == _rowmap(_agg(facts))


def test_combine_handles_one_sided_keys(spark):
    left = spark.createDataFrame([("a", 2, 10)], "k string, n long, s long")
    right = spark.createDataFrame([("b", 3, 7)], "k string, n long, s long")
    out = _rowmap(combine_aggregates(left, right, ["k"], counts=["n"], sums=["s"]))
    assert out["a"]["n"] == 2 and out["a"]["s"] == 10
    assert out["b"]["n"] == 3 and out["b"]["s"] == 7


def test_combine_min_max_one_sided_passthrough(spark):
    left = spark.createDataFrame([("a", 5)], "k string, mx long")
    right = spark.createDataFrame([("b", 9)], "k string, mx long")
    out = _rowmap(combine_aggregates(left, right, ["k"], maxs=["mx"]))
    assert out["a"]["mx"] == 5 and out["b"]["mx"] == 9


def test_validation(spark):
    df = spark.createDataFrame([("a", 1)], "k string, n long")
    with pytest.raises(ValueError, match="at least one key"):
        combine_aggregates(df, df, [], counts=["n"])
    with pytest.raises(ValueError, match="missing columns"):
        combine_aggregates(df, df, ["k"], counts=["nope"])
