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


# --- incremental JOIN-view maintenance ------------------------------------

from polars_order_book_spark.operators.incremental import (  # noqa: E402
    incremental_join_agg,
    join_delta,
)


def _r(spark, rows):
    return spark.createDataFrame(rows, "rk long, j long, v long")


def _s(spark, rows):
    return spark.createDataFrame(rows, "sk long, j long, grp string")


R_ROWS = [(1, 10, 5), (2, 10, 7), (3, 20, 1), (4, 30, 9), (5, 20, 4), (6, 40, 2)]
S_ROWS = [(100, 10, "x"), (101, 20, "y"), (102, 20, "x"), (103, 40, "z"), (104, 50, "y")]


def _split(rows, pred):
    return [r for r in rows if not pred(r)], [r for r in rows if pred(r)]


@pytest.mark.parametrize(
    "r_pred,s_pred",
    [
        # deltas on both sides (all three algebra terms non-empty)
        (lambda r: r[0] % 2 == 0, lambda s: s[0] % 2 == 0),
        # delta on R only
        (lambda r: r[0] >= 5, lambda s: False),
        # delta on S only
        (lambda r: False, lambda s: s[0] == 102),
        # everything is delta (base join empty)
        (lambda r: True, lambda s: True),
    ],
)
def test_join_delta_completes_the_join(spark, r_pred, s_pred):
    """base⨝base ∪ join_delta == full⨝full as bags (the distributivity
    identity the stored view relies on)."""
    base_r_rows, delta_r_rows = _split(R_ROWS, r_pred)
    base_s_rows, delta_s_rows = _split(S_ROWS, s_pred)
    base_r, delta_r = _r(spark, base_r_rows or []), _r(spark, delta_r_rows or [])
    base_s, delta_s = _s(spark, base_s_rows or []), _s(spark, delta_s_rows or [])

    full = _r(spark, R_ROWS).join(_s(spark, S_ROWS), "j", "inner")
    old = base_r.join(base_s, "j", "inner")
    delta = join_delta(base_r, delta_r, base_s, delta_s, "j")
    got = sorted(tuple(x.asDict().items()) for x in old.unionByName(delta).collect())
    want = sorted(tuple(x.asDict().items()) for x in full.collect())
    assert got == want


def test_incremental_join_agg_equals_full_recompute(spark):
    base_r_rows, delta_r_rows = _split(R_ROWS, lambda r: r[0] % 2 == 0)
    base_s_rows, delta_s_rows = _split(S_ROWS, lambda s: s[0] % 2 == 0)
    base_r, delta_r = _r(spark, base_r_rows), _r(spark, delta_r_rows)
    base_s, delta_s = _s(spark, base_s_rows), _s(spark, delta_s_rows)

    def view(df):
        return df.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v").cast("decimal(18,0)")).alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )

    base_view = view(base_r.join(base_s, "j", "inner"))
    merged = incremental_join_agg(
        base_view,
        base_r,
        delta_r,
        base_s,
        delta_s,
        "j",
        ["grp"],
        count_col="n_rows",
        sum_exprs={"sum_v": F.sum(F.col("v").cast("decimal(18,0)"))},
        min_exprs={"min_v": F.min("v")},
        max_exprs={"max_v": F.max("v")},
    )
    full_view = view(_r(spark, R_ROWS).join(_s(spark, S_ROWS), "j", "inner"))
    got = {r["grp"]: r.asDict() for r in merged.collect()}
    want = {r["grp"]: r.asDict() for r in full_view.collect()}
    assert got == want


# --- hypothesis: the delta algebra holds for ARBITRARY splits ---------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_HSETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_HSETTINGS)
@given(
    rmask=st.lists(st.booleans(), min_size=6, max_size=6),
    smask=st.lists(st.booleans(), min_size=5, max_size=5),
)
def test_join_delta_distributivity_any_split(spark, rmask, smask):
    base_r = _r(spark, [r for r, m in zip(R_ROWS, rmask) if not m])
    delta_r = _r(spark, [r for r, m in zip(R_ROWS, rmask) if m])
    base_s = _s(spark, [s for s, m in zip(S_ROWS, smask) if not m])
    delta_s = _s(spark, [s for s, m in zip(S_ROWS, smask) if m])
    full = _r(spark, R_ROWS).join(_s(spark, S_ROWS), "j", "inner")
    old = base_r.join(base_s, "j", "inner")
    got = sorted(
        tuple(sorted(x.asDict().items()))
        for x in old.unionByName(
            join_delta(base_r, delta_r, base_s, delta_s, "j")
        ).collect()
    )
    want = sorted(tuple(sorted(x.asDict().items())) for x in full.collect())
    assert got == want


# --- retraction (deletion) maintenance ---------------------------------------

from polars_order_book_spark.operators.incremental import retract_agg  # noqa: E402


def test_retract_equals_recompute_over_complement(spark):
    facts = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 7), ("b", 3), ("c", 100)],
        "k string, v long",
    )
    def agg(df):
        return df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v").cast("decimal(18,0)")).alias("sum_v"),
        )
    # delete one of a's rows and ALL of c's rows (the forgotten-user path)
    deleted = facts.where((F.col("v") == 5) | (F.col("k") == "c"))
    got = {r["k"]: (r["n_rows"], int(r["sum_v"]))
           for r in retract_agg(agg(facts), deleted, ["k"],
                                sum_exprs={"sum_v": F.sum(F.col("v").cast("decimal(18,0)"))}).collect()}
    keep = facts.where(~((F.col("v") == 5) | (F.col("k") == "c")))
    want = {r["k"]: (r["n_rows"], int(r["sum_v"])) for r in agg(keep).collect()}
    assert got == want
    assert "c" not in got  # zero-count keys drop, no tombstone


def test_retract_surfaces_never_aggregated_deletions_as_negative(spark):
    base = spark.createDataFrame([("a", 1, 10)], "k string, n_rows long, s long")
    bogus = spark.createDataFrame([("a", 1), ("a", 2)], "k string, v long")
    out = retract_agg(base, bogus, ["k"],
                      sum_exprs={"s": F.sum(F.col("v"))}).collect()
    # 1 - 2 = -1: kept and negative, loudly wrong rather than silently clamped
    assert out[0]["n_rows"] == -1


def test_retract_keeps_key_when_counts_cancel_but_sums_differ(spark):
    """Contract-violation visibility: deleted counts that exactly cancel the
    base count while the sums disagree must KEEP the row (nonzero sum), not
    drop it on the count==0 test alone — that residue is exactly the
    reconciliation bug the keep-it-loud guarantee exists to expose."""
    base = spark.createDataFrame([("a", 2, 10)], "k string, n_rows long, s long")
    # two deletions for key a (count cancels) but their sum is 13, not 10
    deleted = spark.createDataFrame([("a", 6), ("a", 7)], "k string, v long")
    out = {r["k"]: r for r in
           retract_agg(base, deleted, ["k"],
                       sum_exprs={"s": F.sum(F.col("v"))}).collect()}
    assert out["a"]["n_rows"] == 0 and out["a"]["s"] == -3


def test_retract_surfaces_orphan_key_deletions(spark):
    """A deletion whose key never existed in the rollup must appear as a
    negative row (full-outer semantics), not vanish."""
    base = spark.createDataFrame([("a", 2, 10)], "k string, n_rows long, s long")
    orphan = spark.createDataFrame([("z", 5)], "k string, v long")
    out = {r["k"]: r for r in
           retract_agg(base, orphan, ["k"],
                       sum_exprs={"s": F.sum(F.col("v"))}).collect()}
    assert out["a"]["n_rows"] == 2  # untouched
    assert out["z"]["n_rows"] == -1 and out["z"]["s"] == -5


def test_combine_groups_null_keys_like_a_recompute(spark):
    """NULL keys must combine into ONE row (groupBy semantics), not split
    into two partial rows the way a full-outer equi-join would."""
    left = spark.createDataFrame([(None, 2, 10)], "k string, n long, s long")
    right = spark.createDataFrame([(None, 3, 7)], "k string, n long, s long")
    rows = combine_aggregates(left, right, ["k"], counts=["n"], sums=["s"]).collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 5 and rows[0]["s"] == 17
