"""PageRank operator invariants on hand-checkable graphs."""

import pytest

from pyspark.sql import functions as F

from polars_order_book_spark.operators.graph import SCALE, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_star_center_dominates(spark):
    # star: 1 -- {2,3,4,5}; the hub must outrank every leaf, leaves tie
    out = pagerank(_edges(spark, [(1, 2), (1, 3), (1, 4), (1, 5)]), iters=3)
    ranks = {r["node"]: r["rank_scaled"] for r in out.collect()}
    assert set(ranks) == {1, 2, 3, 4, 5}
    assert ranks[1] > max(ranks[n] for n in (2, 3, 4, 5))
    assert len({ranks[n] for n in (2, 3, 4, 5)}) == 1  # symmetry => exact tie


def test_mass_approximately_conserved(spark):
    out = pagerank(_edges(spark, [(1, 2), (2, 3), (3, 1), (4, 1)]), iters=4)
    total = out.agg(F.sum("rank_scaled")).first()[0]
    # integer truncation only ever LOSES sub-ulp mass: total in (0.999, 1.0] x SCALE
    assert SCALE * 0.999 < total <= SCALE


def test_symmetrization_and_determinism(spark):
    # duplicate + reversed edges collapse to one undirected edge set
    e1 = _edges(spark, [(1, 2), (2, 1), (1, 2)])
    e2 = _edges(spark, [(1, 2)])
    r1 = sorted(pagerank(e1, iters=3).collect())
    r2 = sorted(pagerank(e2, iters=3).collect())
    assert r1 == r2
    # two-node symmetric graph: exact tie
    assert r1[0]["rank_scaled"] == r1[1]["rank_scaled"]


def test_validation_and_empty(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        pagerank(e, iters=0)
    with pytest.raises(ValueError):
        pagerank(e, damping_pct=100)
    empty = pagerank(_edges(spark, []), iters=2)
    assert empty.count() == 0
