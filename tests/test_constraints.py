"""Data-quality constraint checker: rule kinds, single-pass fold, counts."""

import pytest

from polars_order_book_spark.operators import constraints as C


def test_all_rule_kinds_count_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 100), (2, -5.0, 100), (2, 3.0, None), (4, 0.5, 999)],
        "id long, amount double, ref_id long",
    )
    ref = spark.createDataFrame([(100,), (200,)], "ref_id long")
    out = {r["rule"]: r for r in C.check_constraints(
        df,
        [
            C.not_null("ref_not_null", "ref_id"),
            C.unique("id_unique", "id"),
            C.predicate("amount_positive", "amount > 0"),
            C.in_range("amount_range", "amount", 0, 100),
            C.foreign_key("ref_fk", "ref_id", "ref"),
        ],
        refs={"ref": ref},
    ).collect()}
    assert all(r["n_checked"] == 4 for r in out.values())
    assert out["ref_not_null"]["n_violations"] == 1
    assert out["id_unique"]["n_violations"] == 1          # id=2 twice
    assert out["amount_positive"]["n_violations"] == 1    # -5
    assert out["amount_range"]["n_violations"] == 1       # -5 (0.5, 3, 10 in range)
    # 999 unmatched + NULL violates a mandatory relationship
    assert out["ref_fk"]["n_violations"] == 2


def test_clean_table_reports_zero(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id long, v double")
    out = C.check_constraints(
        df, [C.unique("u", "id"), C.predicate("p", "v > 0")]
    )
    assert [r["n_violations"] for r in out.collect()] == [0, 0]


def test_validation_errors(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="non-empty"):
        C.check_constraints(df, [])
    with pytest.raises(ValueError, match="missing refs"):
        C.check_constraints(df, [C.foreign_key("fk", "id", "nope")])
    with pytest.raises(ValueError, match="unknown rule kinds"):
        C.check_constraints(df, [C.Rule("x", "bogus")])


def test_predicates_fold_into_one_aggregate(spark):
    """All row-level rules must share one scan: the plan contains exactly one
    aggregate source scan of the input, not one per rule."""
    df = spark.createDataFrame([(1, 5.0)], "id long, v double")
    out = C.check_constraints(
        df,
        [C.predicate("a", "v > 0"), C.predicate("b", "v < 10"),
         C.not_null("c", "id"), C.unique("d", "id")],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LocalRelation") <= 2  # base agg reused across rule rows


def test_observe_quality_piggybacks_on_the_job(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, 0.0)], "id long, v double"
    )
    observed, obs = C.observe_quality(
        df, [C.predicate("v_positive", "v > 0"), C.not_null("id_nn", "id")]
    )
    # the caller's real action drives the metrics — no separate quality scan
    assert observed.where("v > -100").count() == 3
    got = obs.get
    assert got["v_positive"] == 2  # -5 and 0
    assert got["id_nn"] == 0
    assert got["__n"] == 3


def test_observe_quality_rejects_non_predicate_rules(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="predicate"):
        C.observe_quality(df, [C.unique("u", "id")])
    with pytest.raises(ValueError, match="predicate"):
        C.observe_quality(df, [])


def test_unique_counts_null_keys_as_violations(spark):
    df = spark.createDataFrame(
        [(1,), (None,), (None,)], "id long"
    )
    out = C.check_constraints(df, [C.unique("u", "id")]).collect()[0]
    # 3 rows - 1 distinct non-null key = 2: both null-keyed rows violate
    assert out["n_violations"] == 2


def test_in_range_quotes_string_bounds(spark):
    from polars_order_book_spark.operators.constraints import check_constraints, in_range

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("2024-06-15",), ("2025-06-15",)], "d string"
    ).select(F.col("d").cast("timestamp").alias("d"))
    report = {r["rule"]: r for r in check_constraints(
        df, [in_range("d_in_2024", "d", "2024-01-01", "2024-12-31")]
    ).collect()}
    # the raw interpolation bug parsed 2024-01-01 as integer arithmetic and
    # flagged every row; properly quoted bounds flag exactly the 2025 row
    assert report["d_in_2024"]["n_violations"] == 1


def test_empty_table_reports_zero_violations_not_null(spark):
    """r8 self-review: sum() over zero rows is NULL — predicate rules on an
    empty table reported n_violations NULL (unique rules reported 0), so a
    max(n_violations) == 0 gate saw neither pass nor fail."""
    empty = spark.createDataFrame([], "a int, b int")
    rules = [C.Rule("nn", "predicate", expr="a IS NOT NULL"),
             C.Rule("uq", "unique", cols=("a",))]
    got = {r["rule"]: r["n_violations"]
           for r in C.check_constraints(empty, rules).collect()}
    assert got == {"nn": 0, "uq": 0}
    obs_df, obs = C.observe_quality(empty, [rules[0]])
    obs_df.count()
    assert obs.get["nn"] == 0
