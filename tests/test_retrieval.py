"""Reciprocal-rank fusion: hand-computed fusion, rank-vs-score sources,
missing-document semantics, determinism of score-derived ranks."""

import pytest

from polars_order_book_spark.operators.retrieval import rrf_fuse


def test_rrf_hand_computed(spark):
    lex = spark.createDataFrame(
        [(1, 900), (2, 500), (3, 100)], ["doc_id", "s"]
    )
    dense = spark.createDataFrame([(2, 1), (4, 2)], ["doc_id", "rank"])
    out = {
        r["doc_id"]: (r["rank_lex"], r["rank_dense"], r["rrf"])
        for r in rrf_fuse(
            [("lex", lex, "score", "s"), ("dense", dense, "rank", "rank")]
        ).collect()
    }
    assert out[1] == (1, None, 1.0 / 61 + 0.0)
    assert out[2] == (2, 1, 1.0 / 62 + 1.0 / 61)
    assert out[3] == (3, None, 1.0 / 63 + 0.0)
    assert out[4] == (None, 2, 0.0 + 1.0 / 62)


def test_rrf_score_tie_breaks_by_id(spark):
    df = spark.createDataFrame([(5, 10), (3, 10), (9, 10)], ["doc_id", "s"])
    out = {
        r["doc_id"]: r["rank_a"]
        for r in rrf_fuse([("a", df, "score", "s")]).collect()
    }
    # equal scores rank by ascending id
    assert out == {3: 1, 5: 2, 9: 3}


def test_rrf_custom_k_and_errors(spark):
    df = spark.createDataFrame([(1, 2)], ["doc_id", "s"])
    out = rrf_fuse([("a", df, "score", "s")], k=10).collect()[0]
    assert out["rrf"] == 1.0 / 11
    with pytest.raises(ValueError, match="sources"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="kind"):
        rrf_fuse([("a", df, "weird", "s")])
