"""Property-based differential testing: strategy A (exact pandas fold) vs
strategy B (relational) on hypothesis-generated VALID event streams.

Generators interpret hypothesis choices into streams that respect the error
contract (deletes never exceed available qty, modifies always move existing
qty), so any A/B divergence is an engine bug, not an invalid input. This
extends the fixed-seed differential tests with structured search + shrinking.
"""

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql.types import BooleanType, LongType, StructField, StructType

from polars_order_book_spark import (
    modify_to_mutations,
    snapshot_columns,
    top_n_levels_from_price_mutations,
    top_n_levels_from_price_mutations_with_modify,
    top_n_levels_from_price_updates,
    top_n_levels_relational,
)

SCHEMA3 = StructType([
    StructField("seq", LongType()),
    StructField("is_bid", BooleanType()),
    StructField("price", LongType()),
    StructField("qty", LongType()),
])
SCHEMA5 = StructType(SCHEMA3.fields + [
    StructField("prev_price", LongType()),
    StructField("prev_qty", LongType()),
])

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def mutation_stream(draw):
    m = draw(st.integers(8, 48))
    book: dict = {}
    rows = []
    for s in range(m):
        b = draw(st.booleans())
        live = sorted((p for (bb, p), q in book.items() if bb == b and q > 0))
        if live and draw(st.booleans()):
            p = draw(st.sampled_from(live))
            q = -draw(st.integers(1, book[(b, p)]))
        else:
            p = draw(st.integers(1, 8))
            q = draw(st.integers(0, 6))  # includes no-op zeros
        book[(b, p)] = book.get((b, p), 0) + q
        rows.append((s, b, p, q))
    return rows


@st.composite
def update_stream(draw):
    m = draw(st.integers(8, 48))
    return [
        (
            s,
            draw(st.booleans()),
            draw(st.integers(1, 8)),
            draw(st.integers(0, 6)),  # 0 = delete level (or ignored if absent)
        )
        for s in range(m)
    ]


@st.composite
def modify_stream(draw):
    m = draw(st.integers(8, 40))
    book: dict = {}
    rows = []
    for s in range(m):
        b = draw(st.booleans())
        live = sorted((p for (bb, p), q in book.items() if bb == b and q > 0))
        op = draw(st.integers(0, 3)) if live else 0
        if op == 0:  # plain add
            p, q = draw(st.integers(1, 8)), draw(st.integers(1, 6))
            book[(b, p)] = book.get((b, p), 0) + q
            rows.append((s, b, p, q, None, None))
        elif op == 1:  # full modify: move dq from pp to p
            pp = draw(st.sampled_from(live))
            dq = draw(st.integers(1, book[(b, pp)]))
            p = draw(st.integers(1, 8))
            book[(b, pp)] -= dq
            book[(b, p)] = book.get((b, p), 0) + dq
            rows.append((s, b, p, dq, pp, dq))
        elif op == 2:  # modify-to-zero: delete pq at pp
            pp = draw(st.sampled_from(live))
            pq = draw(st.integers(1, book[(b, pp)]))
            book[(b, pp)] -= pq
            rows.append((s, b, pp, 0, pp, pq))
        else:  # qty-only shrink: level pq -> q at p
            p = draw(st.sampled_from(live))
            pq = book[(b, p)]
            q = draw(st.integers(1, pq))
            book[(b, p)] = q
            rows.append((s, b, p, q, None, pq))
    return rows


def by_seq(df, cols):
    return {r["seq"]: tuple(r[c] for c in cols) for r in df.collect()}


@settings(**SETTINGS)
@given(rows=mutation_stream(), n=st.sampled_from([1, 3]))
def test_property_mutations_a_equals_b(spark, rows, n):
    df = spark.createDataFrame(rows, SCHEMA3)
    cols = snapshot_columns(n)
    a = by_seq(top_n_levels_from_price_mutations(df, n=n), cols)
    b = by_seq(top_n_levels_relational(df, n=n, variant="mutations"), cols)
    assert a == b


@settings(**SETTINGS)
@given(rows=update_stream(), n=st.sampled_from([1, 3]))
def test_property_updates_a_equals_b(spark, rows, n):
    df = spark.createDataFrame(rows, SCHEMA3)
    cols = snapshot_columns(n)
    a = by_seq(top_n_levels_from_price_updates(df, n=n), cols)
    b = by_seq(top_n_levels_relational(df, n=n, variant="updates"), cols)
    assert a == b


@settings(**SETTINGS)
@given(rows=modify_stream(), n=st.sampled_from([1, 2]))
def test_property_modify_a_equals_b(spark, rows, n):
    df = spark.createDataFrame(rows, SCHEMA5)
    cols = snapshot_columns(n)
    a = by_seq(
        top_n_levels_from_price_mutations_with_modify(
            df, prev_price="prev_price", prev_qty="prev_qty", n=n
        ),
        cols,
    )
    deltas = modify_to_mutations(df)
    b = by_seq(top_n_levels_relational(deltas, n=n, variant="mutations"), cols)
    assert set(a) == set(b)  # every input seq must appear in both
    assert a == b


# --- triangle counting vs brute force ---------------------------------------

@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0,
        max_size=25,
    )
)
def test_property_triangle_count_matches_bruteforce(spark, edges):
    from itertools import combinations

    from polars_order_book_spark.operators.graph import triangle_count

    adj = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in adj for n in e})
    expected = {}
    for u, v, w in combinations(nodes, 3):
        if ((u, v) in adj and (u, w) in adj and (v, w) in adj):
            for n in (u, v, w):
                expected[n] = expected.get(n, 0) + 1

    df = spark.createDataFrame(
        edges or [(0, 0)], "src long, dst long"  # empty-list schema workaround
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == expected


# --- gap-fill invariants ------------------------------------------------------

@settings(**SETTINGS)
@given(
    obs=st.dictionaries(
        st.integers(0, 12), st.integers(-50, 50), min_size=1, max_size=6
    )
)
def test_property_gap_fill_monotone_between_neighbors(spark, obs):
    """Filled values are exact at observations, and every hole lies within
    [min(prev, next), max(prev, next)] of its bracketing observations."""
    from polars_order_book_spark.operators.timeseries import gap_fill_linear

    rows = [("k", i, float(v)) for i, v in obs.items()]
    df = spark.createDataFrame(rows, "k string, idx long, value double")
    out = sorted(
        gap_fill_linear(df, by=["k"], idx_col="idx", value_col="value").collect(),
        key=lambda r: r["idx"],
    )
    lo, hi = min(obs), max(obs)
    assert [r["idx"] for r in out] == list(range(lo, hi + 1))
    sorted_obs = sorted(obs.items())
    for r in out:
        if r["idx"] in obs:
            assert r["is_observed"] and r["value"] == float(obs[r["idx"]])
        else:
            prev = max((i, v) for i, v in sorted_obs if i < r["idx"])
            nxt = min((i, v) for i, v in sorted_obs if i > r["idx"])
            lo_v, hi_v = sorted((prev[1], nxt[1]))
            assert lo_v - 1e-9 <= r["value"] <= hi_v + 1e-9
            assert not r["is_observed"]
