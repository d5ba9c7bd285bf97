"""Market analytics operators: VWAP, L1 metrics, realized variance."""

import pytest

from pyspark.sql import functions as F

from polars_order_book_spark.operators.market import (
    l1_metrics,
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
