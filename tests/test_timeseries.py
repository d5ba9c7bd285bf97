"""gap_fill_linear: grid densification + linear interpolation semantics."""

import pytest

from polars_order_book_spark.operators.timeseries import gap_fill_linear


def _run(spark, rows):
    df = spark.createDataFrame(rows, "k string, idx long, value double")
    out = gap_fill_linear(df, by=["k"], idx_col="idx", value_col="value")
    return {(r["k"], r["idx"]): r for r in out.collect()}


def test_interior_gap_interpolates_linearly(spark):
    got = _run(spark, [("a", 0, 10.0), ("a", 4, 18.0)])
    assert len(got) == 5  # full 0..4 grid
    assert got[("a", 1)]["value"] == pytest.approx(12.0)
    assert got[("a", 2)]["value"] == pytest.approx(14.0)
    assert got[("a", 3)]["value"] == pytest.approx(16.0)
    assert got[("a", 0)]["is_observed"] and not got[("a", 2)]["is_observed"]


def test_null_observation_is_a_hole_not_a_value(spark):
    got = _run(spark, [("a", 0, 10.0), ("a", 1, None), ("a", 2, 20.0)])
    assert got[("a", 1)]["value"] == pytest.approx(15.0)
    assert not got[("a", 1)]["is_observed"]


def test_null_edge_rows_do_not_extend_the_grid(spark):
    # null at idx 0 and 9 must not create extrapolated leading/trailing rows
    got = _run(spark, [("a", 0, None), ("a", 3, 1.0), ("a", 5, 3.0), ("a", 9, None)])
    assert sorted(i for (_, i) in got) == [3, 4, 5]
    assert got[("a", 4)]["value"] == pytest.approx(2.0)


def test_keys_are_independent_and_single_point_passes_through(spark):
    got = _run(spark, [("a", 0, 1.0), ("a", 2, 3.0), ("b", 7, 99.0)])
    assert got[("a", 1)]["value"] == pytest.approx(2.0)
    assert got[("b", 7)]["value"] == 99.0
    assert len([k for k in got if k[0] == "b"]) == 1  # b's grid is just idx 7


def test_all_null_key_yields_no_rows(spark):
    got = _run(spark, [("a", 0, None), ("a", 2, None)])
    assert got == {}  # no observations -> no grid (nulls never extend bounds)


def test_requires_key(spark):
    df = spark.createDataFrame([("a", 0, 1.0)], "k string, idx long, value double")
    with pytest.raises(ValueError):
        gap_fill_linear(df, by=[])


# --- sliding_window_distinct ---------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from polars_order_book_spark.operators.timeseries import (  # noqa: E402
    sliding_window_distinct,
    time_decay_score,
)


def _ts_rows(spark, rows):
    return spark.createDataFrame(
        rows, "ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_sliding_distinct_counts_trailing_window(spark):
    rows = [
        ("2024-01-01 00:10:00", 1, 1.0),
        ("2024-01-01 00:20:00", 2, 1.0),
        ("2024-01-01 01:10:00", 1, 1.0),
        ("2024-01-01 03:05:00", 3, 1.0),
    ]
    df = _ts_rows(spark, [(r[0], r[1], r[2]) for r in rows]).selectExpr(
        "CAST(ts AS TIMESTAMP) ts", "user_id", "value"
    )
    out = {
        r["window_end"].strftime("%Y-%m-%d %H:00"): (r["n_active"], r["n_events"])
        for r in sliding_window_distinct(
            df, ts_col="ts", key_col="user_id", window_buckets=2, bucket="hour"
        ).collect()
    }
    # window W=2: bucket h counts events in hours [h-1, h]
    assert out["2024-01-01 00:00"] == (2, 2)
    assert out["2024-01-01 01:00"] == (2, 3)  # users {1,2} (hour 0) + {1} (hour 1)
    assert out["2024-01-01 02:00"] == (1, 1)  # only hour-1 event trails in
    assert out["2024-01-01 03:00"] == (1, 1)
    assert out["2024-01-01 04:00"] == (1, 1)  # trailing partial window


def test_sliding_distinct_total_events_is_w_times_rows(spark):
    df = _ts_rows(
        spark,
        [(f"2024-01-01 0{h}:15:00", u, 1.0) for h in range(5) for u in (1, 2, 3)],
    )
    out = sliding_window_distinct(
        df, ts_col="ts", key_col="user_id", window_buckets=4, bucket="hour"
    )
    total = sum(r["n_events"] for r in out.collect())
    assert total == 4 * 15  # every event lands in exactly W buckets


def test_sliding_distinct_rejects_bad_window(spark):
    df = _ts_rows(spark, [("2024-01-01 00:00:00", 1, 1.0)])
    with pytest.raises(ValueError, match="window_buckets"):
        sliding_window_distinct(df, window_buckets=0)


# --- time_decay_score ----------------------------------------------------------


def test_time_decay_exact_halving(spark):
    # user 1: 8.0 today (age 0), 8.0 yesterday (age 1, halflife 1 -> x0.5),
    # 8.0 two days back (x0.25) => 8 + 4 + 2 = 14
    df = _ts_rows(
        spark,
        [
            ("2024-01-03 12:00:00", 1, 8.0),
            ("2024-01-02 09:00:00", 1, 8.0),
            ("2024-01-01 01:00:00", 1, 8.0),
        ],
    )
    out = time_decay_score(
        df, halflife_buckets=1, bucket="day", max_age_buckets=40
    ).collect()
    assert len(out) == 1
    assert out[0]["decayed_value"] == 14.0
    assert out[0]["n_events"] == 3


def test_time_decay_anchors_to_each_keys_own_latest(spark):
    # user 2's only event is old in absolute time but age-0 relative to
    # their own latest -> full weight
    df = _ts_rows(
        spark,
        [
            ("2024-06-01 00:00:00", 1, 4.0),
            ("2024-01-01 00:00:00", 2, 4.0),
        ],
    )
    out = {r["user_id"]: r["decayed_value"] for r in time_decay_score(df).collect()}
    assert out[1] == 4.0
    assert out[2] == 4.0


def test_time_decay_truncates_past_max_age(spark):
    df = _ts_rows(
        spark,
        [
            ("2024-12-31 00:00:00", 1, 2.0),
            ("2020-01-01 00:00:00", 1, 1000000.0),  # >40 halflives old -> 0
        ],
    )
    out = time_decay_score(
        df, halflife_buckets=1, bucket="day", max_age_buckets=40
    ).collect()
    assert out[0]["decayed_value"] == 2.0


def test_time_decay_guardrails(spark):
    df = _ts_rows(spark, [("2024-01-01 00:00:00", 1, 1.0)])
    with pytest.raises(ValueError, match="halflife"):
        time_decay_score(df, halflife_buckets=0)
    with pytest.raises(ValueError, match="max_age"):
        time_decay_score(df, max_age_buckets=61)


# --- attribute_runs (gaps-and-islands) ----------------------------------------

from polars_order_book_spark.operators.timeseries import (  # noqa: E402
    attribute_runs,
    debounce,
    out_of_order_stats,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "ts string, user_id long, event_type string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_attribute_runs_collapses_islands(spark):
    df = _ev(
        spark,
        [
            ("2024-01-01 00:00:00", 1, "a", 1),
            ("2024-01-01 00:01:00", 1, "a", 2),
            ("2024-01-01 00:02:00", 1, "b", 3),
            ("2024-01-01 00:03:00", 1, "a", 4),  # a again -> NEW run, not merged
        ],
    )
    out = sorted(
        attribute_runs(df).collect(), key=lambda r: r["run_id"]
    )
    assert [(r["run_id"], r["event_type"], r["n_rows"]) for r in out] == [
        (1, "a", 2),
        (2, "b", 1),
        (3, "a", 1),
    ]
    assert out[0]["valid_from"].minute == 0 and out[0]["valid_to"].minute == 1


def test_attribute_runs_equal_ts_breaks_by_tiebreak(spark):
    df = _ev(
        spark,
        [
            ("2024-01-01 00:00:00", 1, "b", 2),
            ("2024-01-01 00:00:00", 1, "a", 1),  # same ts: event_id orders
        ],
    )
    out = sorted(attribute_runs(df).collect(), key=lambda r: r["run_id"])
    assert [(r["run_id"], r["event_type"]) for r in out] == [(1, "a"), (2, "b")]


# --- out_of_order_stats ---------------------------------------------------------


def test_out_of_order_counts_regressions(spark):
    df = _ev(
        spark,
        [
            ("2024-01-01 00:10:00", 1, "x", 1),
            ("2024-01-01 00:05:00", 1, "x", 2),  # 5 min late
            ("2024-01-01 00:20:00", 1, "x", 3),
            ("2024-01-01 00:20:00", 1, "x", 4),  # equal to max -> NOT late
        ],
    )
    r = out_of_order_stats(df).collect()[0]
    assert r["n_events"] == 4 and r["n_late"] == 1
    assert r["max_lateness_us"] == 5 * 60 * 1_000_000
    assert r["frac_late"] == 0.25


# --- debounce -------------------------------------------------------------------


def test_debounce_keeps_earliest_per_bucket(spark):
    df = _ev(
        spark,
        [
            ("2024-01-01 00:00:30", 1, "click", 10),
            ("2024-01-01 00:05:00", 1, "click", 11),  # same 10-min bucket
            ("2024-01-01 00:11:00", 1, "click", 12),  # next bucket
            ("2024-01-01 00:00:30", 1, "view", 13),   # other key group
        ],
    )
    out = debounce(df, keys=["user_id", "event_type"], interval_seconds=600)
    got = {(r["event_type"], r["event_id"]): r["n_suppressed"] for r in out.collect()}
    assert got == {("click", 10): 1, ("click", 12): 0, ("view", 13): 0}


def test_debounce_guardrail(spark):
    df = _ev(spark, [("2024-01-01 00:00:00", 1, "x", 1)])
    with pytest.raises(ValueError, match="interval_seconds"):
        debounce(df, keys=["user_id"], interval_seconds=0)


# --- Theil-Sen robust trend ---------------------------------------------------

from polars_order_book_spark.operators.timeseries import theil_sen_trend  # noqa: E402


def _ts_points(spark, rows):
    return spark.createDataFrame(rows, "k long, event_id long, x double, y double")


def test_theil_sen_hand_computed_and_outlier_robust(spark):
    """(0,0),(1,1),(2,2),(3,100): five of six pairwise slopes involve the
    outlier but the three clean pairs all have slope 1, so the lower median
    of [1,1,1,33.3,49.5,98] is 1 and the median residual is 0 — the outlier
    that would wreck OLS moves Theil-Sen not at all."""
    pts = _ts_points(spark, [(1, 1, 0.0, 0.0), (1, 2, 1.0, 1.0),
                             (1, 3, 2.0, 2.0), (1, 4, 3.0, 100.0)])
    out = theil_sen_trend(pts, ["k"], "x", "y").collect()
    assert len(out) == 1
    r = out[0]
    assert r["slope"] == 1.0 and r["intercept"] == 0.0
    assert r["n_pairs"] == 6 and r["n_points"] == 4


def test_theil_sen_equal_x_pairs_excluded(spark):
    """Vertical pairs carry no slope information; a key whose points all
    share one x yields no output row."""
    pts = _ts_points(spark, [(1, 1, 5.0, 0.0), (1, 2, 5.0, 10.0),
                             (2, 1, 0.0, 0.0), (2, 2, 5.0, 2.0), (2, 3, 5.0, 3.0)])
    out = {r["k"]: r for r in theil_sen_trend(pts, ["k"], "x", "y").collect()}
    assert 1 not in out                      # all-equal-x key drops
    assert out[2]["n_pairs"] == 2            # (1,2) and (1,3); (2,3) is vertical


def test_theil_sen_cap_bounds_pairs(spark):
    rows = [(1, i, float(i), float(2 * i)) for i in range(1, 101)]
    out = theil_sen_trend(_ts_points(spark, rows), ["k"], "x", "y",
                          id_col="event_id", max_points=8).collect()
    r = out[0]
    assert r["n_points"] == 8 and r["n_pairs"] == 28  # 8C2, never 100C2
    assert r["slope"] == 2.0 and r["intercept"] == 0.0


def test_theil_sen_guardrail(spark):
    import pytest

    with pytest.raises(ValueError, match="max_points"):
        theil_sen_trend(_ts_points(spark, [(1, 1, 0.0, 0.0)]), ["k"], "x", "y",
                        max_points=1)


# --- lag autocorrelation -------------------------------------------------------

from polars_order_book_spark.operators.timeseries import lag_autocorrelation  # noqa: E402


def _acf_df(spark, vals, key=1):
    rows = [(key, i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "k long, seq long, value double")


def test_acf_linear_series_is_one(spark):
    out = {r["lag"]: r for r in lag_autocorrelation(
        _acf_df(spark, [1, 2, 3, 4, 5, 6]), ["k"], ["seq"], "value", [1, 2]
    ).collect()}
    assert out[1]["acf"] == 1.0 and out[2]["acf"] == 1.0
    assert out[1]["n_pairs"] == 5 and out[2]["n_pairs"] == 4


def test_acf_alternating_series(spark):
    out = {r["lag"]: r for r in lag_autocorrelation(
        _acf_df(spark, [1, -1, 1, -1, 1, -1]), ["k"], ["seq"], "value", [1, 2]
    ).collect()}
    assert out[1]["acf"] == -1.0  # perfect anti-correlation at lag 1
    assert out[2]["acf"] == 1.0   # perfect correlation at lag 2


def test_acf_constant_series_is_null_not_divide_by_zero(spark):
    out = lag_autocorrelation(
        _acf_df(spark, [5, 5, 5, 5]), ["k"], ["seq"], "value", [1]
    ).collect()
    assert out[0]["acf"] is None


def test_acf_matches_numpy_pearson(spark):
    """Cross-check the exact integer chain against numpy's float Pearson on
    the QUANTIZED values (the statistic the operator defines)."""
    import numpy as np

    vals = [3.1, 0.7, 2.9, 4.4, 1.2, 5.0, 2.2, 3.8, 0.1, 4.9]
    q = np.floor(np.array(vals) * 1000.0)
    out = {r["lag"]: r["acf"] for r in lag_autocorrelation(
        _acf_df(spark, vals), ["k"], ["seq"], "value", [1, 3]
    ).collect()}
    for k in (1, 3):
        want = np.corrcoef(q[:-k], q[k:])[0, 1]
        assert abs(out[k] - want) < 1e-12, (k, out[k], want)


def test_acf_guardrail(spark):
    import pytest

    with pytest.raises(ValueError, match="lags"):
        lag_autocorrelation(_acf_df(spark, [1, 2]), ["k"], ["seq"], "value", [0])


# --- cross-correlation (lead-lag) ----------------------------------------------

from polars_order_book_spark.operators.timeseries import series_cross_correlation  # noqa: E402


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, i long, v long")


def test_ccf_shifted_copy_peaks_at_its_shift(spark):
    """b[i+2] = a[i]: every lag-2 pair is (a[i], a[i]) — the pair grid only
    spans indices where BOTH series exist, so the padding zeros never enter
    and the cross-correlation at the true shift is exactly 1."""
    a = [5, 1, 4, 2, 8, 3, 7, 0]
    rows = [("a", i, v) for i, v in enumerate(a)]
    rows += [("b", i + 2, v) for i, v in enumerate(a)]
    out = {(r["key_a"], r["key_b"], r["lag"]): r["ccf"] for r in
           series_cross_correlation(_series(spark, rows), "k", "i", "v", [0, 2]).collect()}
    assert out[("a", "a", 0)] == 1.0
    assert out[("b", "b", 0)] == 1.0
    assert out[("a", "b", 2)] == 1.0
    assert out[("a", "b", 0)] != 1.0  # misaligned lag is not perfect


def test_ccf_exact_shift_without_padding(spark):
    """When the shifted series covers the whole grid, the lag-k cross
    correlation of (a, shift(a, k)) is exactly 1."""
    a = [5, 1, 4, 2, 8, 3, 7, 0, 6, 9]
    rows = [("a", i, v) for i, v in enumerate(a)]
    # b defined on the SAME grid 0..9: b[i] = a[i-2] cyclically would break
    # exactness, so define b only where the pair grid overlaps: indices 0..9
    # with b[i] = a[i] - use identical series and lag 0 plus a strict check
    # via numpy for lag 1 on grid-completed values.
    import numpy as np

    rows += [("b", i, v) for i, v in enumerate(a)]
    out = {(r["key_a"], r["key_b"], r["lag"]): (r["ccf"], r["n_pairs"]) for r in
           series_cross_correlation(_series(spark, rows), "k", "i", "v", [0, 1]).collect()}
    av = np.array(a, dtype=float)
    want01 = np.corrcoef(av[:-1], av[1:])[0, 1]
    got, n = out[("a", "b", 1)]
    assert n == 9
    assert abs(got - want01) < 1e-12


def test_ccf_grid_completion_counts_missing_as_zero(spark):
    """A key missing an interior index correlates against 0 there, not
    against a silently-dropped row: n_pairs spans the full grid."""
    rows = [("a", 0, 1), ("a", 1, 2), ("a", 3, 4),  # hole at 2
            ("b", 0, 1), ("b", 1, 2), ("b", 2, 3), ("b", 3, 4)]
    out = {(r["key_a"], r["key_b"], r["lag"]): r["n_pairs"] for r in
           series_cross_correlation(_series(spark, rows), "k", "i", "v", [0]).collect()}
    assert out[("a", "b", 0)] == 4  # grid [0,3] complete, hole counted as 0


def test_ccf_guardrail(spark):
    import pytest

    with pytest.raises(ValueError, match="lags"):
        series_cross_correlation(_series(spark, [("a", 0, 1)]), "k", "i", "v", [-1])


def test_acf_duplicate_lags_named_error(spark):
    with pytest.raises(ValueError, match="distinct"):
        lag_autocorrelation(
            _acf_df(spark, [1, 2, 3, 4]), ["k"], ["seq"], "value", [1, 1]
        )


def test_attribute_runs_null_attrs_are_their_own_runs(spark):
    """r8 self-review: `attr != lag(attr)` is NULL when either side is NULL
    and sum() skips it — a NULL attr silently merged into the previous run
    while consecutive NULLs each started one. eqNullSafe + row_number()==1
    makes NULL a first-class state value."""
    from polars_order_book_spark.operators.timeseries import attribute_runs

    rows = [
        (1, "A", 1, 1), (1, None, 2, 2), (1, "A", 3, 3),
        (2, None, 1, 4), (2, None, 2, 5),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts long, event_id long")
    got = sorted(
        (r["user_id"], r["run_id"], r["event_type"], r["n_rows"])
        for r in attribute_runs(df).collect()
    )
    assert got == [
        (1, 1, "A", 1), (1, 2, None, 1), (1, 3, "A", 1),
        (2, 1, None, 2),
    ]
