"""Snapshot diff operator: change classification, null-safety, schema rules."""

import pytest

from pyspark.sql import functions as F

from polars_order_book_spark.operators.diff import diff_snapshots, row_fingerprint


def _df(spark, rows, schema="k long, a string, b string"):
    return spark.createDataFrame(rows, schema)


def test_classifies_added_removed_changed(spark):
    old = _df(spark, [(1, "x", "p"), (2, "y", "q"), (3, "z", "r")])
    new = _df(spark, [(2, "y", "q"), (3, "Z", "r"), (4, "w", "s")])
    out = {r["k"]: r["change_type"] for r in diff_snapshots(old, new, ["k"]).collect()}
    assert out == {1: "removed", 3: "changed", 4: "added"}  # 2 unchanged -> dropped


def test_keep_unchanged_and_fingerprints(spark):
    old = _df(spark, [(1, "x", "p")])
    new = _df(spark, [(1, "x", "p")])
    rows = diff_snapshots(old, new, ["k"], keep_unchanged=True).collect()
    assert len(rows) == 1 and rows[0]["change_type"] == "unchanged"
    assert rows[0]["old_fingerprint"] == rows[0]["new_fingerprint"]


def test_null_values_are_distinct_from_empty_and_absent(spark):
    # null vs '' must differ (null sentinel), and a null field still diffs
    old = _df(spark, [(1, None, "p"), (2, "", "p")])
    new = _df(spark, [(1, "", "p"), (2, "", "p")])
    out = {r["k"]: r["change_type"] for r in diff_snapshots(old, new, ["k"]).collect()}
    assert out == {1: "changed"}


def test_compare_cols_default_ignores_evolution_columns(spark):
    old = _df(spark, [(1, "x", "p")])
    new = spark.createDataFrame([(1, "x", 7)], "k long, a string, c long")
    # shared non-key columns = {a}; b/c ignored -> unchanged -> empty diff
    assert diff_snapshots(old, new, ["k"]).count() == 0


def test_validation(spark):
    df = _df(spark, [(1, "x", "p")])
    with pytest.raises(ValueError, match="key_cols"):
        diff_snapshots(df, df, [])
    only_keys = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="compare_cols"):
        diff_snapshots(only_keys, only_keys, ["k"])


def test_composite_keys(spark):
    old = spark.createDataFrame([(1, 1, "x"), (1, 2, "y")], "k1 long, k2 long, a string")
    new = spark.createDataFrame([(1, 1, "x"), (1, 3, "y")], "k1 long, k2 long, a string")
    out = {(r["k1"], r["k2"]): r["change_type"]
           for r in diff_snapshots(old, new, ["k1", "k2"]).collect()}
    assert out == {(1, 2): "removed", (1, 3): "added"}


def test_row_fingerprint_is_order_sensitive(spark):
    df = _df(spark, [(1, "ab", "c")])
    f1 = df.select(row_fingerprint(["a", "b"]).alias("f")).first()["f"]
    f2 = df.select(row_fingerprint(["b", "a"]).alias("f")).first()["f"]
    assert f1 != f2


def test_diff_null_keys_match_null_safely(spark):
    from polars_order_book_spark.operators.diff import diff_snapshots

    old = spark.createDataFrame([(None, "x"), (1, "a")], "k long, v string")
    new = spark.createDataFrame([(None, "x"), (1, "b")], "k long, v string")
    out = {r["k"]: r["change_type"]
           for r in diff_snapshots(old, new, ["k"], compare_cols=["v"]).collect()}
    # identical null-keyed row must NOT churn as removed+added — with
    # unchanged rows dropped (default) it must simply be absent
    assert None not in out
    assert out == {1: "changed"}


def test_diff_rejects_duplicate_keys_including_null_pairs(spark):
    """r8 self-review: two NULL-keyed rows per side cross-paired under
    eqNullSafe (phantom 'changed' on identical snapshots); duplicate
    non-null keys cross-paired silently too. Both are now loud."""
    two_nulls = spark.createDataFrame(
        [(None, "a"), (None, "b")], "k int, v string"
    )
    with pytest.raises(Exception, match="duplicate key"):
        diff_snapshots(two_nulls, two_nulls, ["k"]).collect()
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "k int, v string")
    ok = spark.createDataFrame([(2, "c")], "k int, v string")
    with pytest.raises(Exception, match="duplicate key"):
        diff_snapshots(dup, ok, ["k"]).collect()
    # single NULL-keyed row per side still diffs fine (eqNullSafe pairing)
    one_null_a = spark.createDataFrame([(None, "a"), (1, "x")], "k int, v string")
    one_null_b = spark.createDataFrame([(None, "a"), (1, "y")], "k int, v string")
    got = {r["k"]: r["change_type"]
           for r in diff_snapshots(one_null_a, one_null_b, ["k"]).collect()}
    assert got == {1: "changed"}
