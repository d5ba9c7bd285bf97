"""Session-7 mining ops: hard negatives, MRR eval, negative sampling."""

import pytest

from pyspark.sql import functions as F

from polars_order_book_spark.operators.retrieval import hard_negatives
from polars_order_book_spark.operators.sampling import negative_samples
from polars_order_book_spark.operators.similarity import topk_mrr


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hard_negatives_excludes_self_and_positives(spark):
    vecs = _vecs(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),   # most similar to 0 but a positive
            (2, [0.8, 0.2]),
            (3, [0.0, 1.0]),
        ],
    )
    queries = vecs.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    positives = spark.createDataFrame([(0, 1)], "query_id long, positive_id long")
    out = hard_negatives(vecs, queries, positives, k=2).collect()
    got = [(r["rank"], r["neighbor_id"]) for r in sorted(out, key=lambda r: r["rank"])]
    # 1 excluded (positive), 0 excluded (self) -> 2 then 3, ranks re-packed
    assert got == [(1, 2), (2, 3)]


def test_hard_negatives_sim_ceiling_drops_unlabeled_positives(spark):
    vecs = _vecs(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),   # identical: cosine 1.0 >= ceiling -> dropped
            (2, [0.5, 0.5]),
        ],
    )
    queries = vecs.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    empty_pos = spark.createDataFrame([], "query_id long, positive_id long")
    out = hard_negatives(vecs, queries, empty_pos, k=5, sim_ceiling=0.999).collect()
    assert [r["neighbor_id"] for r in out] == [2]


def test_topk_mrr_hit_and_miss(spark):
    exact = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (1, 20, 1)],
        "query_id long, neighbor_id long, rank long",
    )
    approx = spark.createDataFrame(
        [(0, 11, 1), (0, 10, 2), (1, 99, 1)],
        "query_id long, neighbor_id long, rank long",
    )
    out = {r["query_id"]: r for r in topk_mrr(approx, exact).collect()}
    assert out[0]["best_rank"] == 2 and out[0]["rr"] == 0.5 and out[0]["hit"]
    assert out[1]["best_rank"] is None and out[1]["rr"] == 0.0 and not out[1]["hit"]


def _inter(spark, rows):
    return spark.createDataFrame(rows, "user_id long, item long")


def test_negative_samples_never_emits_a_positive(spark):
    rows = [(u, i) for u in range(4) for i in range(8) if (u + i) % 3 != 0]
    out = negative_samples(
        _inter(spark, rows), k=3, candidate_pool=8, salt="t"
    ).collect()
    seen = {(r["user"], r["item"]) for r in out}
    assert seen and seen.isdisjoint(set(rows))


def test_negative_samples_deterministic_and_salted(spark):
    rows = [(u, i) for u in range(4) for i in range(10) if i % 2 == u % 2]
    df = _inter(spark, rows)
    a = sorted(map(tuple, negative_samples(df, k=2, candidate_pool=6).collect()))
    b = sorted(map(tuple, negative_samples(df, k=2, candidate_pool=6).collect()))
    c = sorted(
        map(tuple, negative_samples(df, k=2, candidate_pool=6, salt="x").collect())
    )
    assert a == b
    assert {t[:2] for t in a} != {t[:2] for t in c}  # independent redraw


def test_negative_samples_exhausted_user_underfills(spark):
    # user 0 interacted with the whole pool -> zero negatives for them
    rows = [(0, i) for i in range(4)] + [(1, 0)]
    out = negative_samples(_inter(spark, rows), k=3, candidate_pool=4).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user"], []).append(r["item"])
    assert 0 not in by_user
    assert sorted(by_user[1]) == [1, 2, 3]


def test_negative_samples_guardrails(spark):
    df = _inter(spark, [(0, 1)])
    with pytest.raises(ValueError, match="candidate_pool"):
        negative_samples(df, k=5, candidate_pool=3)


# --- 2-D Pareto frontier (two-phase distributed skyline) -----------------------

from polars_order_book_spark.operators.profiling import pareto_frontier  # noqa: E402


def _sky(spark, rows):
    return spark.createDataFrame(rows, "k string, id long, x long, y long")


def test_pareto_hand_case_with_ties_and_dominance(spark):
    rows = [
        ("a", 1, 10, 1),   # frontier (max x)
        ("a", 2, 8, 5),    # frontier
        ("a", 3, 8, 5),    # duplicate of 2: mutually non-dominated, kept
        ("a", 4, 8, 4),    # dominated by 2 (same x, smaller y)
        ("a", 5, 3, 9),    # frontier (max y)
        ("a", 6, 2, 9),    # dominated by 5 (smaller x, same y)
        ("a", 7, 1, 1),    # dominated by everything
        ("b", 8, 1, 1),    # other key: its own frontier
    ]
    got = sorted(r["id"] for r in pareto_frontier(
        _sky(spark, rows), ["k"], "x", "y", id_col="id").collect())
    assert got == [1, 2, 3, 5, 8]


def test_pareto_salt_composability(spark):
    """skyline(union of local skylines) == skyline(full): any salt split
    yields the same frontier."""
    import random

    rng = random.Random(7)
    rows = [("k", i, rng.randrange(50), rng.randrange(50)) for i in range(300)]
    base = _sky(spark, rows)
    a = sorted(r["id"] for r in pareto_frontier(
        base, ["k"], "x", "y", id_col="id", salt_parts=1).collect())
    b = sorted(r["id"] for r in pareto_frontier(
        base, ["k"], "x", "y", id_col="id", salt_parts=8).collect())
    # brute-force truth
    pts = {i: (x, y) for _, i, x, y in rows}
    def dominated(i):
        xi, yi = pts[i]
        return any((xb >= xi and yb >= yi and (xb > xi or yb > yi))
                   for j, (xb, yb) in pts.items() if j != i)
    want = sorted(i for i in pts if not dominated(i))
    assert a == want and b == want


def test_pareto_null_measures_excluded(spark):
    rows = [("k", 1, 5, 5), ("k", 2, None, 9), ("k", 3, 9, None)]
    df = spark.createDataFrame(rows, "k string, id long, x long, y long")
    got = [r["id"] for r in pareto_frontier(df, ["k"], "x", "y", id_col="id").collect()]
    assert got == [1]


def test_pareto_guardrail(spark):
    import pytest

    with pytest.raises(ValueError, match="salt_parts"):
        pareto_frontier(_sky(spark, [("k", 1, 1, 1)]), ["k"], "x", "y",
                        id_col="id", salt_parts=0)


def test_pareto_refuses_fractional_measures(spark):
    """The strictly-greater-x range frame is exact only for integers; a
    double measure would silently hide dominators within (x, x+1)."""
    df = spark.createDataFrame([("k", 1, 2.0, 5.0)],
                               "k string, id long, x double, y double")
    with pytest.raises(ValueError, match="INTEGER measures"):
        pareto_frontier(df, ["k"], "x", "y", id_col="id")


def test_pareto_frontier_global_no_keys(spark):
    """r8 self-review: keys=[] (global skyline) must work — the null-key
    filter was previously F.expr('') which failed at plan time."""
    from polars_order_book_spark.operators.profiling import pareto_frontier

    rows = [(1, 5, 1), (2, 4, 2), (3, 3, 3), (4, 5, 0), (5, 1, 1)]
    df = spark.createDataFrame(rows, "doc_id long, x long, y long")
    got = sorted(
        r["doc_id"]
        for r in pareto_frontier(df, [], "x", "y", id_col="doc_id").collect()
    )
    # frontier: (5,1) id1, (4,2) id2, (3,3) id3; id4 dominated by id1, id5 by id3
    assert got == [1, 2, 3]
