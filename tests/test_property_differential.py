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
