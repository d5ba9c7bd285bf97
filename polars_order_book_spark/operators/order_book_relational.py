"""Top-N order-book snapshots — pure relational formulation (strategy B).

Same semantics as ``order_book`` for valid inputs, expressed entirely in
DataFrame/window operators so Catalyst/Tungsten own the physical plan
(SURVEY.md §4.3-B). No Python in the hot path: whole-stage codegen applies,
AQE can re-plan the shuffles, and the fold's per-book serialization disappears.

Shape: level quantity after each event is a running aggregate per
``(book, side, price)`` — running SUM of deltas for mutations
(ref: update.rs:113-123), running LAST of set-values for updates
(ref: update.rs:101-105). The book as-of every event seq is materialized on a
grid of (event seq × distinct touched levels), then ranked side-aware and
pivoted into the 4·n snapshot columns.

Scale analysis (100 TB): the grid is |events| × |distinct price levels per
book|. Real books have a bounded live-price domain (the reference's own
benches use depth ≤ 10k, ref: order_book/benches/book_side.rs:31-74), so the
grid is a constant factor, the distinct-level side of the join is broadcast,
and everything else is one shuffle per window key reused across both windows.
This is also the independent oracle used to differential-test strategy A.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def modify_to_mutations(
    df: DataFrame,
    price: str = "price",
    qty: str = "qty",
    is_bid: str = "is_bid",
    prev_price: str = "prev_price",
    prev_qty: str = "prev_qty",
    *,
    seq: str = "seq",
) -> DataFrame:
    """Explode modify events into plain signed-delta rows sharing the seq.

    The 9-way decision table (ref: update.rs:132-162) reduces to at most two
    deltas per event: −prev_qty@prev_price and +qty@price (degenerate cases
    collapse to one). Emitting deltas keeps the whole stream in the mutations
    algebra, so strategy B (and the SQL oracle) apply unchanged.
    """
    pp, pq, q, p = F.col(prev_price), F.col(prev_qty), F.col(qty), F.col(price)
    delta_del = F.when(
        pp.isNotNull() & pq.isNotNull(), F.struct(pp.alias("d_price"), (-pq).alias("d_qty"))
    ).when(
        pp.isNull() & pq.isNotNull() & (q == 0), F.struct(p.alias("d_price"), (-pq).alias("d_qty"))
    ).when(
        pp.isNull() & pq.isNotNull() & (q > 0),
        F.struct(p.alias("d_price"), (q - pq).alias("d_qty")),
    )
    delta_add = F.when(
        pp.isNotNull() & pq.isNotNull() & (q != 0), F.struct(p.alias("d_price"), q.alias("d_qty"))
    ).when(pp.isNull() & pq.isNull(), F.struct(p.alias("d_price"), q.alias("d_qty")))
    other = [c for c in df.columns if c not in (price, qty, prev_price, prev_qty)]
    exploded = df.select(
        *other, F.explode(F.array(delta_del, delta_add)).alias("__d")
    ).where(F.col("__d").isNotNull())
    # Zero-delta rows (pure no-op q=0, qty-only modify with q == prev_qty) are
    # kept: they don't move the running sum, but their seq must still appear in
    # the events grid so strategy B emits a snapshot row per input event,
    # matching strategy A's one-row-per-event contract.
    return exploded.select(
        *other,
        F.col("__d.d_price").alias(price),
        F.col("__d.d_qty").alias(qty),
    )


def top_n_levels_relational(
    df: DataFrame,
    price: str = "price",
    qty: str = "qty",
    is_bid: str = "is_bid",
    *,
    seq: str = "seq",
    by: Sequence[str] | None = None,
    n: int = 1,
    variant: str = "mutations",
) -> DataFrame:
    """Book snapshots via windows + grid join; returns (by..., seq, 4·n cols).

    ``variant``: ``"mutations"`` (running sum of deltas) or ``"updates"``
    (running last of set-values). For modify streams, pre-apply
    :func:`modify_to_mutations`.
    """
    keys = list(by) if by else []
    kc = [F.col(k) for k in keys]

    events = df.select(*keys, seq).distinct()
    levels = df.select(*keys, is_bid, price).distinct()
    # Touched-level dimension is small and bounded → broadcast, no shuffle.
    grid = events.join(F.broadcast(levels), on=keys) if keys else events.crossJoin(
        F.broadcast(levels)
    )

    deltas = df.select(*keys, seq, is_bid, price, qty)
    if variant == "mutations":
        # Collapse multiple deltas hitting the same (seq, side, price) — e.g.
        # a same-price modify exploded into delete+add — so the grid join
        # stays 1:1 and the rank never sees a duplicated level.
        deltas = deltas.groupBy(*keys, seq, is_bid, price).agg(F.sum(qty).alias(qty))
    g = grid.join(deltas, on=[*keys, seq, is_bid, price], how="left")

    w = (
        Window.partitionBy(*kc, F.col(is_bid), F.col(price))
        .orderBy(seq)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if variant == "mutations":
        lq = F.sum(F.coalesce(F.col(qty), F.lit(0))).over(w)
    elif variant == "updates":
        lq = F.last(F.col(qty), ignorenulls=True).over(w)
    else:
        raise ValueError(f"unknown variant {variant!r}")
    booked = g.select(*keys, seq, is_bid, price, lq.alias("level_qty")).where(
        F.col("level_qty") > 0
    )

    # Side-aware rank: best = greatest bid / least ask (the reference encodes
    # this as AskPrice's reversed Ord, ref: price_level.rs:88-92).
    rank_w = Window.partitionBy(*kc, F.col(seq), F.col(is_bid)).orderBy(
        F.when(F.col(is_bid), -F.col(price)).otherwise(F.col(price))
    )
    ranked = booked.withColumn("rn", F.row_number().over(rank_w))

    aggs = []
    for i in range(1, n + 1):
        hit = F.col("rn") == i
        bid = F.col(is_bid)
        aggs += [
            F.max(F.when(hit & bid, F.col(price))).alias(f"bid_price_{i}"),
            F.max(F.when(hit & bid, F.col("level_qty"))).alias(f"bid_qty_{i}"),
            F.max(F.when(hit & ~bid, F.col(price))).alias(f"ask_price_{i}"),
            F.max(F.when(hit & ~bid, F.col("level_qty"))).alias(f"ask_qty_{i}"),
        ]
    snaps = ranked.groupBy(*keys, seq).agg(*aggs)
    # Keep every event row, even those whose book is empty (all-null snapshot).
    return events.join(snaps, on=[*keys, seq], how="left")
