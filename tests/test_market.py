"""Market analytics operators: VWAP, L1 metrics, realized variance, OFI, OHLC."""

import pytest

from pyspark.sql import functions as F

from polars_order_book_spark.operators.market import (
    l1_metrics,
    ohlc_bars,
    order_flow_imbalance,
    realized_variance,
    vwap_by_bucket,
)


def test_vwap_excludes_negative_qty_and_buckets(spark):
    stream = spark.createDataFrame(
        [(0, 1, 10, 2), (0, 2, 20, 2), (0, 3, 30, -5), (0, 600, 40, 1)],
        "book long, seq long, price long, qty long",
    )
    out = {(r["book"], r["bucket"]): r for r in
           vwap_by_bucket(stream, 500, by=["book"]).collect()}
    assert out[(0, 0)]["vwap"] == pytest.approx((10 * 2 + 20 * 2) / 4)
    assert out[(0, 0)]["volume"] == 4          # the -5 delete is excluded
    assert out[(0, 1)]["vwap"] == 40.0
    with pytest.raises(ValueError):
        vwap_by_bucket(stream, 0)


def test_l1_metrics_values_and_one_sided_nulls(spark):
    snaps = spark.createDataFrame(
        [(0, 1, 10, 4, 12, 1), (0, 2, None, None, 12, 1)],
        "book long, seq long, bid_price_1 long, bid_qty_1 long, "
        "ask_price_1 long, ask_qty_1 long",
    )
    out = {r["seq"]: r for r in l1_metrics(snaps, by=["book"]).collect()}
    assert out[1]["spread"] == 2 and out[1]["mid2"] == 22
    # microprice = (10*1 + 12*4) / (4+1)
    assert out[1]["microprice"] == pytest.approx(58 / 5)
    assert out[2]["spread"] is None and out[2]["mid2"] is None
    assert out[2]["microprice"] is None


def test_ofi_hand_computed_contributions(spark):
    # (bp, bq, ap, aq) per seq on one book.
    snaps = spark.createDataFrame(
        [
            (0, 1, 10, 4, 12, 3),   # first row: no previous -> dropped
            (0, 2, 11, 2, 12, 5),   # bp up: +2; bp>=pbp only. ap==pap: -5 +3
            (0, 3, 10, 6, 13, 1),   # bp down: -2 (prev bq). ap up: +5
        ],
        "book long, seq long, bid_price_1 long, bid_qty_1 long, "
        "ask_price_1 long, ask_qty_1 long",
    )
    out = {r["bucket"]: r for r in
           order_flow_imbalance(snaps, 500, by=["book"]).collect()}
    # seq2: [11>=10]*2 - 0 - [12<=12]*5 + [12>=12]*3 = 0
    # seq3: 0 - [10<=11]*2 - 0 + [13>=12]*5 = 3
    assert out[0]["ofi"] == 0 + 3
    assert out[0]["n_flows"] == 2
    with pytest.raises(ValueError):
        order_flow_imbalance(snaps, 0)


def test_ofi_null_side_breaks_chain_not_zero(spark):
    snaps = spark.createDataFrame(
        [
            (0, 1, 10, 4, 12, 3),
            (0, 2, None, None, 12, 3),  # no bid: this row AND the next drop
            (0, 3, 10, 4, 12, 3),
        ],
        "book long, seq long, bid_price_1 long, bid_qty_1 long, "
        "ask_price_1 long, ask_qty_1 long",
    )
    rows = order_flow_imbalance(snaps, 500, by=["book"]).collect()
    assert rows == []  # every candidate flow touches a no-quote boundary


def test_ohlc_bars_argminmax_and_null_exclusion(spark):
    l1 = spark.createDataFrame(
        [(0, 1, 20), (0, 2, 26), (0, 3, None), (0, 4, 18), (0, 5, 22),
         (0, 600, 40)],
        "book long, seq long, mid2 long",
    )
    out = {r["bucket"]: r for r in ohlc_bars(l1, 500, by=["book"]).collect()}
    b0 = out[0]
    assert (b0["open2"], b0["high2"], b0["low2"], b0["close2"]) == (20, 26, 18, 22)
    assert b0["n_quotes"] == 4  # the null-mid row is not a quote
    assert out[1]["open2"] == out[1]["close2"] == 40
    with pytest.raises(ValueError):
        ohlc_bars(l1, -1)


def test_realized_variance_breaks_chain_at_null(spark):
    l1 = spark.createDataFrame(
        [(0, 1, 20), (0, 2, 24), (0, 3, None), (0, 4, 30), (0, 5, 30)],
        "book long, seq long, mid2 long",
    )
    out = {r["bucket"]: r for r in
           realized_variance(l1, 500, by=["book"]).collect()}
    # moves: 24-20=4 (rv 16/4=4); 3->None and None->4 dropped; 30-30=0
    assert out[0]["rv_ticks2"] == pytest.approx((4 * 4 + 0) / 4.0)
    assert out[0]["n_moves"] == 2


def test_depth_profile_partial_levels_and_empty_side(spark):
    from polars_order_book_spark.operators.market import depth_profile

    snaps = spark.createDataFrame(
        [
            # full book: depths 4+2+1 vs 3+5+7
            (0, 1, 10, 4, 9, 2, 8, 1, 12, 3, 13, 5, 14, 7),
            # only 1 bid level, no asks at all
            (0, 2, 10, 4, None, None, None, None, None, None, None, None, None, None),
        ],
        "book long, seq long, bid_price_1 long, bid_qty_1 long, "
        "bid_price_2 long, bid_qty_2 long, bid_price_3 long, bid_qty_3 long, "
        "ask_price_1 long, ask_qty_1 long, ask_price_2 long, ask_qty_2 long, "
        "ask_price_3 long, ask_qty_3 long",
    )
    out = {r["seq"]: r for r in depth_profile(snaps, 3, by=["book"]).collect()}
    assert out[1]["bid_depth"] == 7 and out[1]["ask_depth"] == 15
    assert out[1]["imbalance"] == pytest.approx(7 / 22)
    assert out[2]["bid_depth"] == 4          # partial book still has depth
    assert out[2]["ask_depth"] is None       # empty side is null, not zero
    assert out[2]["imbalance"] is None
    with pytest.raises(ValueError):
        depth_profile(snaps, 0)
