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
