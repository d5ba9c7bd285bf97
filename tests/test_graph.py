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


# --- differential: random graphs vs a pure-Python integer-arithmetic model ---

from hypothesis import HealthCheck, given, settings as hsettings, strategies as st


def _pagerank_py(edges, iters=3, damping_pct=85):
    """Reference model: same integer arithmetic as operators/graph.py."""
    sym = set()
    for a, b in edges:
        sym.add((a, b))
        sym.add((b, a))
    nodes = sorted({s for s, _ in sym})
    if not nodes:
        return {}
    out = {}
    for s, d in sym:
        out.setdefault(s, []).append(d)
    n = len(nodes)
    base = (15 * SCALE) // (100 * n)
    rank = {v: SCALE // n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0 for v in nodes}
        for s in nodes:
            c = rank[s] // len(out[s])
            for d in out[s]:
                contrib[d] += c
        rank = {v: base + (85 * contrib[v]) // 100 for v in nodes}
    return rank


@hsettings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
    ),
    iters=st.integers(1, 4),
)
def test_pagerank_matches_python_model(spark, edges, iters):
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(_edges(spark, edges), iters=iters).collect()
    }
    assert got == _pagerank_py(edges, iters=iters)


# --- triangle counting -------------------------------------------------------

def test_triangle_count_k4_minus_edge(spark):
    from polars_order_book_spark.operators.graph import triangle_count

    # K4 minus edge (3,4): triangles {1,2,3} and {1,2,4}.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "src long, dst long"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_count_ignores_duplicates_direction_and_loops(spark):
    from polars_order_book_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)], "src long, dst long"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_count_triangle_free_graph_is_empty(spark):
    from polars_order_book_spark.operators.graph import triangle_count

    # 4-cycle: no triangles.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    assert triangle_count(edges).collect() == []
