"""Item co-occurrence recommender: hand-computed golden values, cap
semantics (the skew bound), deterministic tie-breaks, and top-k symmetry."""

import math

import pytest
from pyspark.sql import functions as F

from polars_order_book_spark.operators.recsys import (
    item_cooccurrence,
    top_similar_items,
)


def _interactions(spark, rows):
    return spark.createDataFrame(rows, "user_id long, item string")


def test_golden_counts_and_similarity(spark):
    # u1: {a,b}, u2: {a,b}, u3: {a,c}  ->  (a,b): n_ab=2, (a,c): n_ab=1
    df = _interactions(
        spark,
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")],
    )
    out = item_cooccurrence(
        df, user_col="user_id", item_col="item", per_user_cap=10, min_pair_count=1
    )
    got = {(r["item_a"], r["item_b"]): r.asDict() for r in out.collect()}
    assert set(got) == {("a", "b"), ("a", "c")}
    ab = got[("a", "b")]
    assert (ab["n_ab"], ab["n_a"], ab["n_b"]) == (2, 3, 2)
    assert ab["cosine"] == 2.0 / math.sqrt(3.0 * 2.0)
    assert ab["jaccard"] == 2.0 / (3.0 + 2.0 - 2.0)


def test_min_pair_count_filters(spark):
    df = _interactions(
        spark,
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")],
    )
    out = item_cooccurrence(df, item_col="item", per_user_cap=10, min_pair_count=2)
    pairs = {(r["item_a"], r["item_b"]) for r in out.collect()}
    assert pairs == {("a", "b")}


def test_cap_bounds_power_user_but_popularity_stays_exact(spark):
    # one power user with 6 items, cap=3 -> at most C(3,2)=3 pairs from them;
    # the cap keeps the top-3 by (n_inter desc, item asc).
    rows = [(1, it) for it in "abcdef"]
    rows += [(1, "e"), (1, "f"), (1, "f")]  # e seen 2x, f 3x -> cap keeps f,e,a
    rows += [(2, "a"), (2, "b")]  # second user so n_users differs per item
    df = _interactions(spark, rows)
    out = item_cooccurrence(df, item_col="item", per_user_cap=3, min_pair_count=1)
    res = {(r["item_a"], r["item_b"]): r.asDict() for r in out.collect()}
    # user 1 contributes only pairs among {f, e, a}; user 2 among {a, b}
    assert set(res) == {("a", "e"), ("a", "f"), ("e", "f"), ("a", "b")}
    # popularity is computed on the UNCAPPED set: b appears for users {1, 2}
    assert res[("a", "b")]["n_b"] == 2


def test_cap_tiebreak_is_item_asc(spark):
    # equal n_inter everywhere: cap=2 keeps the lexicographically smallest
    df = _interactions(spark, [(1, "d"), (1, "b"), (1, "c"), (1, "a")])
    out = item_cooccurrence(df, item_col="item", per_user_cap=2, min_pair_count=1)
    pairs = {(r["item_a"], r["item_b"]) for r in out.collect()}
    assert pairs == {("a", "b")}


def test_null_users_and_items_excluded(spark):
    df = spark.createDataFrame(
        [(None, "a"), (1, None), (1, "a"), (2, "a"), (1, "b"), (2, "b")],
        "user_id long, item string",
    )
    out = item_cooccurrence(df, item_col="item", per_user_cap=5, min_pair_count=1)
    got = {(r["item_a"], r["item_b"]): r["n_ab"] for r in out.collect()}
    assert got == {("a", "b"): 2}


def test_top_similar_symmetrizes_and_ranks(spark):
    df = _interactions(
        spark,
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"), (4, "b"), (4, "c")],
    )
    cooc = item_cooccurrence(df, item_col="item", per_user_cap=10, min_pair_count=1)
    top = top_similar_items(cooc, k=1)
    by_item = {r["item"]: r for r in top.collect()}
    assert set(by_item) == {"a", "b", "c"}
    assert all(r["rank"] == 1 for r in by_item.values())
    # a's best neighbor is b: cos(a,b)=2/sqrt(9)=2/3 > cos(a,c)=1/sqrt(6)
    assert by_item["a"]["neighbor"] == "b"


def test_validation_errors(spark):
    df = _interactions(spark, [(1, "a")])
    with pytest.raises(ValueError, match="per_user_cap"):
        item_cooccurrence(df, item_col="item", per_user_cap=1)
    cooc = item_cooccurrence(df, item_col="item", per_user_cap=None)
    with pytest.raises(ValueError, match="metric"):
        top_similar_items(cooc, metric="dot")


def test_uncapped_mode(spark):
    df = _interactions(spark, [(1, "a"), (1, "b"), (1, "c")])
    out = item_cooccurrence(df, item_col="item", per_user_cap=None, min_pair_count=1)
    assert out.count() == 3  # all C(3,2) pairs survive without the cap
