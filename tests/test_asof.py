"""asof_join semantics: backward/forward, ties, tolerance, null payloads."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from polars_order_book_spark.operators.asof import asof_join

L_SCHEMA = StructType([
    StructField("k", StringType()),
    StructField("t", LongType()),
    StructField("ev", StringType()),
])
R_SCHEMA = StructType([
    StructField("k", StringType()),
    StructField("t", LongType()),
    StructField("px", DoubleType()),
])


def _frames(spark):
    left = spark.createDataFrame(
        [("a", 5, "x"), ("a", 10, "y"), ("a", 20, "z"), ("b", 7, "w"), ("b", 8, "v")],
        L_SCHEMA,
    )
    right = spark.createDataFrame(
        [("a", 4, 1.0), ("a", 10, 2.0), ("a", 15, 3.0), ("b", 9, 9.0)],
        R_SCHEMA,
    )
    return left, right


def _by_key(df, cols):
    return {(r["k"], r["t"]): tuple(r[c] for c in cols) for r in df.collect()}


def test_asof_backward_with_equal_ts_match(spark):
    left, right = _frames(spark)
    got = _by_key(asof_join(left, right, on="t", by=["k"], right_on_as="rt"),
                  ["px", "rt"])
    assert got[("a", 5)] == (1.0, 4)     # greatest right t <= 5
    assert got[("a", 10)] == (2.0, 10)   # equal t matches (>= semantics)
    assert got[("a", 20)] == (3.0, 15)
    assert got[("b", 7)] == (None, None)  # no right row at or before 7
    assert got[("b", 8)] == (None, None)


def test_asof_forward(spark):
    left, right = _frames(spark)
    got = _by_key(
        asof_join(left, right, on="t", by=["k"], direction="forward", right_on_as="rt"),
        ["px", "rt"],
    )
    assert got[("a", 5)] == (2.0, 10)    # least right t >= 5
    assert got[("a", 10)] == (2.0, 10)
    assert got[("a", 20)] == (None, None)
    assert got[("b", 7)] == (9.0, 9)


def test_asof_tolerance_nulls_far_matches(spark):
    left, right = _frames(spark)
    got = _by_key(
        asof_join(left, right, on="t", by=["k"], tolerance=F.lit(2), right_on_as="rt"),
        ["px", "rt"],
    )
    assert got[("a", 5)] == (1.0, 4)      # gap 1 <= 2
    assert got[("a", 20)] == (None, None)  # gap 5 > 2 -> nulled


def test_asof_null_payload_does_not_skip_back(spark):
    """A right row with a NULL payload value still 'wins' its time slot — the
    fill must not reach past it to an older non-null row (struct fill)."""
    left = spark.createDataFrame([("a", 10, "x")], L_SCHEMA)
    right = spark.createDataFrame([("a", 4, 1.0), ("a", 8, None)], R_SCHEMA)
    got = _by_key(asof_join(left, right, on="t", by=["k"], right_on_as="rt"),
                  ["px", "rt"])
    assert got[("a", 10)] == (None, 8)  # matched the t=8 row, whose px is null


def test_asof_rejects_column_collision(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("px", "ev"), on="t", by=["k"])


def test_asof_preserves_left_row_count(spark):
    left, right = _frames(spark)
    assert asof_join(left, right, on="t", by=["k"]).count() == left.count()


from hypothesis import HealthCheck, given, settings, strategies as st


@st.composite
def asof_case(draw):
    keys = ["a", "b"]
    left = [
        (draw(st.sampled_from(keys)), draw(st.integers(0, 50)), f"e{i}")
        for i in range(draw(st.integers(1, 12)))
    ]
    # right unique per (k, t) — the operator's determinism contract
    rts = draw(
        st.lists(
            st.tuples(st.sampled_from(keys), st.integers(0, 50)),
            min_size=1, max_size=10, unique=True,
        )
    )
    right = [(k, t, float(i)) for i, (k, t) in enumerate(rts)]
    return left, right


@settings(
    max_examples=12, deadline=None, derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=asof_case(), direction=st.sampled_from(["backward", "forward"]))
def test_asof_differential_vs_pandas_merge_asof(spark, case, direction):
    import pandas as pd

    left_rows, right_rows = case
    left = spark.createDataFrame(left_rows, L_SCHEMA)
    right = spark.createDataFrame(right_rows, R_SCHEMA)
    got = {
        (r["k"], r["t"], r["ev"]): r["px"]
        for r in asof_join(left, right, on="t", by=["k"], direction=direction).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["k", "t", "ev"]).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(right_rows, columns=["k", "t", "px"]).sort_values("t", kind="mergesort")
    exp_df = pd.merge_asof(lp, rp, on="t", by="k", direction=direction)
    exp = {
        (r.k, r.t, r.ev): (None if pd.isna(r.px) else r.px)
        for r in exp_df.itertuples()
    }
    assert got == exp


def test_asof_null_on_and_null_by_never_match(spark):
    left = spark.createDataFrame(
        [("a", None, "nullt"), (None, 5, "nullk"), ("a", 5, "ok")], L_SCHEMA
    )
    right = spark.createDataFrame([("a", 4, 1.0), (None, 4, 2.0)], R_SCHEMA)
    for direction in ("backward", "forward"):
        got = {r["ev"]: r["px"] for r in asof_join(
            left, right, on="t", by=["k"], direction=direction
        ).collect()}
        assert got["nullt"] is None   # null `on` matches nothing
        assert got["nullk"] is None   # null `by` matches nothing
        assert got["ok"] == (1.0 if direction == "backward" else None)


def test_book_asof_sampling_matches_fold_at_event_seqs(spark):
    """ob_book_asof composition: sampling the book at an EXACT event seq must
    equal that event's fold snapshot, and between events it must equal the
    most recent snapshot (step function, no interpolation)."""
    from polars_order_book_spark import top_n_levels_from_price_mutations, snapshot_columns

    rows = [
        # book 0: two bids then an ask
        (0, 10, True, 100, 5),
        (0, 20, True, 101, 3),
        (0, 40, False, 105, 2),
        # book 1: single level built in two steps
        (1, 15, True, 50, 1),
        (1, 35, True, 50, 4),
    ]
    stream = spark.createDataFrame(
        rows, "book int, seq long, is_bid boolean, price long, qty long"
    )
    snaps = top_n_levels_from_price_mutations(stream, by=["book"], n=1).select(
        "book", "seq", *snapshot_columns(1)
    )
    grid = spark.createDataFrame(
        [(0, 20), (0, 30), (0, 39), (0, 40), (1, 15), (1, 34), (1, 99)],
        "book int, seq long",
    )
    from polars_order_book_spark.operators.asof import asof_join

    got = {
        (r["book"], r["seq"]): (r["bid_price_1"], r["bid_qty_1"], r["ask_price_1"], r["ask_qty_1"])
        for r in asof_join(grid, snaps, on="seq", by=["book"]).collect()
    }
    assert got[(0, 20)] == (101, 3, None, None)   # exact event seq
    assert got[(0, 30)] == (101, 3, None, None)   # between events: step holds
    assert got[(0, 39)] == (101, 3, None, None)
    assert got[(0, 40)] == (101, 3, 105, 2)       # ask arrives exactly at 40
    assert got[(1, 15)] == (50, 1, None, None)
    assert got[(1, 34)] == (50, 1, None, None)
    assert got[(1, 99)] == (50, 5, None, None)    # qty 1+4 after second add


def test_right_on_as_rejects_payload_collision(spark):
    """r8 self-review: right_on_as equal to a right payload column emitted
    two identically-named output columns; empty string was treated as
    None. Both now refuse loudly."""
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame([(1, 9, 5)], "k long, ts long, x long")
    with pytest.raises(ValueError, match="payload"):
        asof_join(left, right, on="ts", by=["k"], right_on_as="x")
    with pytest.raises(ValueError, match="non-empty"):
        asof_join(left, right, on="ts", by=["k"], right_on_as="")
