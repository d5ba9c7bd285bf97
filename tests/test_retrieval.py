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


# --- MMR rerank ---------------------------------------------------------------

def _vec(*xs):
    return list(map(float, xs))


def test_mmr_diversity_demotes_near_duplicate(spark):
    """Three candidates: two near-identical highly relevant, one distinct
    slightly less relevant. Pure relevance ranks the twins 1-2; MMR must
    slot the distinct vector at rank 2."""
    from polars_order_book_spark.operators.retrieval import mmr_rerank

    rows = [
        (1, _vec(1.0, 0.0, 0.0, 0.0)),      # twin A (best rel)
        (2, _vec(0.999, 0.01, 0.0, 0.0)),   # twin B (near-dup of A)
        (3, _vec(0.6, 0.0, 0.8, 0.0)),      # distinct, lower rel
    ]
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(100, _vec(1.0, 0.0, 0.1, 0.0))], "query_id long, embedding array<float>"
    )
    got = (
        mmr_rerank(vectors, queries, k=3, m_candidates=3, lam=0.5)
        .toPandas()
        .sort_values("mmr_rank")
    )
    assert list(got["neighbor_id"]) == [1, 3, 2]


def test_mmr_lam_one_is_pure_relevance(spark):
    """lam=1 removes the diversity term: MMR order == cosine top-k order."""
    from polars_order_book_spark.operators.retrieval import mmr_rerank
    from polars_order_book_spark.operators.similarity import cosine_topk_bruteforce

    import random

    rng = random.Random(7)
    rows = [(i, _vec(*[rng.uniform(-1, 1) for _ in range(8)])) for i in range(30)]
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(99, rows[0][1])], "query_id long, embedding array<float>"
    )
    mmr = (
        mmr_rerank(vectors, queries, k=5, m_candidates=10, lam=1.0)
        .toPandas()
        .sort_values("mmr_rank")
    )
    topk = (
        cosine_topk_bruteforce(vectors, queries, k=5)
        .toPandas()
        .sort_values("rank")
    )
    assert list(mmr["neighbor_id"]) == list(topk["neighbor_id"])


def test_mmr_guardrails(spark):
    from polars_order_book_spark.operators.retrieval import mmr_rerank

    vectors = spark.createDataFrame(
        [(1, _vec(1.0, 0.0))], "vec_id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(2, _vec(1.0, 0.0))], "query_id long, embedding array<float>"
    )
    import pytest

    with pytest.raises(ValueError, match="m_candidates >= k"):
        mmr_rerank(vectors, queries, k=5, m_candidates=3)
    with pytest.raises(ValueError, match="lam must be"):
        mmr_rerank(vectors, queries, k=1, m_candidates=1, lam=1.5)


def test_mmr_fewer_candidates_than_k_emits_what_exists(spark):
    """r8 self-review: a query with fewer than k candidates (tiny corpus,
    self excluded) must emit the available ranks instead of crashing on an
    empty greedy step."""
    from polars_order_book_spark.operators.retrieval import mmr_rerank

    rows = [
        (1, _vec(1.0, 0.0, 0.0, 0.0)),
        (2, _vec(0.9, 0.1, 0.0, 0.0)),
        (3, _vec(0.6, 0.0, 0.8, 0.0)),
    ]
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(1, _vec(1.0, 0.0, 0.1, 0.0))], "query_id long, embedding array<float>"
    )
    # query_id 1 collides with vec_id 1 -> self excluded -> 2 candidates
    got = (
        mmr_rerank(vectors, queries, k=5, m_candidates=5, lam=0.7)
        .toPandas()
        .sort_values("mmr_rank")
    )
    assert list(got["mmr_rank"]) == [1, 2]
    assert set(got["neighbor_id"]) == {2, 3}
