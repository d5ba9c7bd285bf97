"""Market analytics over book event streams and level-1 snapshots.

The reference computes the book itself; the questions asked OF a book —
traded-volume-weighted price, quoted spread/midprice, short-horizon realized
variance — are the downstream analytics layer. Everything here follows the
repo's exactness discipline: prices and quantities are integer ticks, so
every aggregate is an exact BIGINT sum (order-independent, engine-portable)
with at most one final float division — the same reason q1 sums decimals.

Scale shapes:
* ``vwap_by_bucket`` — one groupBy((keys, bucket)): map-side partial agg,
  shuffle sized by buckets x books.
* ``l1_metrics`` — pure row-wise projection on snapshots; no shuffle.
* ``realized_variance`` — one lag window per book (shuffle on keys, sort by
  seq) + one groupBy((keys, bucket)); mid is carried as 2x mid (bid+ask) so
  squared moves stay integers (no /2 rounding loss — divide by 4 at the end,
  outside the sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def vwap_by_bucket(
    stream: DataFrame,
    bucket_size: int,
    *,
    by: "list[str]" = (),
    seq_col: str = "seq",
    price_col: str = "price",
    qty_col: str = "qty",
) -> DataFrame:
    """Volume-weighted average price per seq bucket (and per ``by`` keys).

    Negative quantities (deletes/trades in mutation streams) are excluded —
    VWAP weights executed/added volume, and a signed mix would corrupt the
    denominator. Sums are exact BIGINTs; ``vwap`` is the single final
    float64 division (bit-identical cross-engine on identical sums).
    """
    if bucket_size <= 0:
        raise ValueError(f"bucket_size must be > 0, got {bucket_size}")
    keys = list(by)
    pos = stream.where(F.col(qty_col) > 0)
    return (
        pos.groupBy(
            *keys, F.expr(f"`{seq_col}` div {int(bucket_size)}").alias("bucket")
        )
        .agg(
            F.sum(F.col(price_col) * F.col(qty_col)).alias("pv"),
            F.sum(F.col(qty_col)).alias("volume"),
        )
        .select(
            *keys,
            "bucket",
            (F.col("pv").cast("double") / F.col("volume").cast("double")).alias("vwap"),
            "volume",
        )
    )


def l1_metrics(
    snapshots: DataFrame,
    *,
    by: "list[str]" = (),
    seq_col: str = "seq",
) -> DataFrame:
    """Quoted spread, 2x midprice, and microprice from level-1 snapshots.

    ``mid2`` = bid + ask (twice the midprice) keeps the value integral — no
    half-tick rounding enters any downstream integer aggregate; consumers
    divide by 2 (or 4 for squared moves) at the very end. ``microprice`` is
    the qty-weighted fair price (bid_price*ask_qty + ask_price*bid_qty) /
    (bid_qty + ask_qty): exact integer numerator/denominator, one final
    float division. Rows missing either side yield nulls (no quote, no
    metric). Pure projection — composes onto any book output with no
    shuffle.
    """
    bid_p, bid_q = F.col("bid_price_1"), F.col("bid_qty_1")
    ask_p, ask_q = F.col("ask_price_1"), F.col("ask_qty_1")
    both = bid_p.isNotNull() & ask_p.isNotNull()
    return snapshots.select(
        *by,
        F.col(seq_col).alias("seq"),
        F.when(both, ask_p - bid_p).alias("spread"),
        F.when(both, ask_p + bid_p).alias("mid2"),
        F.when(
            both,
            (bid_p * ask_q + ask_p * bid_q).cast("double")
            / (bid_q + ask_q).cast("double"),
        ).alias("microprice"),
    )


def order_flow_imbalance(
    l1: DataFrame,
    bucket_size: int,
    *,
    by: "list[str]" = (),
    seq_col: str = "seq",
) -> DataFrame:
    """Order-flow imbalance (Cont/Kukanov/Stoikov) per seq bucket from L1
    snapshots — the standard microstructure driver of short-horizon price
    moves.

    Per-event contribution, with (bp, bq, ap, aq) the level-1 snapshot and
    primes the previous event's values::

        e = [bp >= bp']*bq - [bp <= bp']*bq' - [ap <= ap']*aq + [ap >= ap']*aq'

    Every term is an integer tick/qty product of indicator*qty, so the
    bucket sum ``ofi`` is an exact BIGINT — order-independent and
    engine-portable with no float step at all. Events where either side of
    the current OR previous snapshot is absent (one-sided book) break the
    chain: their contribution is null and excluded, the same discipline as
    ``realized_variance`` (a flow into or out of a no-quote state is not a
    measurable imbalance).

    Scale shape: one lag window per book (shuffle on ``by``, sort by seq)
    then one map-side-partial groupBy((by, bucket)) — identical to
    ``realized_variance``; the two share the window shuffle when composed.
    The default ``by=()`` is the SINGLE-BOOK convenience form: an
    unpartitioned ordered window serializes the whole stream into one task
    — at scale always pass the book keys (the registered queries do), or
    pre-chunk like the NBBO segmented scan.
    """
    if bucket_size <= 0:
        raise ValueError(f"bucket_size must be > 0, got {bucket_size}")
    keys = list(by)
    w = Window.partitionBy(*keys).orderBy(seq_col) if keys else Window.orderBy(seq_col)
    bp, bq = F.col("bid_price_1"), F.col("bid_qty_1")
    ap, aq = F.col("ask_price_1"), F.col("ask_qty_1")
    pbp, pbq = F.lag("bid_price_1").over(w), F.lag("bid_qty_1").over(w)
    pap, paq = F.lag("ask_price_1").over(w), F.lag("ask_qty_1").over(w)
    contrib = (
        F.when(bp >= pbp, bq).otherwise(F.lit(0))
        - F.when(bp <= pbp, pbq).otherwise(F.lit(0))
        - F.when(ap <= pap, aq).otherwise(F.lit(0))
        + F.when(ap >= pap, paq).otherwise(F.lit(0))
    )
    # Comparisons with null operands are null; F.when(null, x).otherwise(0)
    # takes the otherwise-branch, which would silently treat a no-quote
    # boundary as zero flow. Gate explicitly: all 8 inputs present or null.
    complete = (
        bp.isNotNull() & ap.isNotNull() & pbp.isNotNull() & pap.isNotNull()
    )
    rows = l1.select(
        *keys,
        F.expr(f"`{seq_col}` div {int(bucket_size)}").alias("bucket"),
        F.when(complete, contrib).alias("e"),
    ).where(F.col("e").isNotNull())
    return rows.groupBy(*keys, "bucket").agg(
        F.sum("e").alias("ofi"), F.count(F.lit(1)).alias("n_flows")
    )


def ohlc_bars(
    l1: DataFrame,
    bucket_size: int,
    *,
    by: "list[str]" = (),
    seq_col: str = "seq",
    mid2_col: str = "mid2",
) -> DataFrame:
    """Open/high/low/close bars of the (2x) midprice per seq bucket — the
    canonical downsample of an event-resolution quote stream to fixed bars.

    open/close are argmin/argmax-by-seq (``min_by``/``max_by``: one agg
    pass, no rank-then-filter second shuffle); high/low are plain min/max.
    All four stay in integral 2x-mid ticks (callers divide by 2 at the
    edge), so the whole row is exact BIGINTs. No-quote events (null mid2)
    are excluded — a bar summarizes quotes that existed. seq is unique per
    book, so every argmin is deterministic.

    Scale shape: ONE map-side-partial groupBy((by, bucket)); output is
    bars-sized, not events-sized. This is the operator to feed dashboards /
    downstream models instead of shipping raw snapshots.
    """
    if bucket_size <= 0:
        raise ValueError(f"bucket_size must be > 0, got {bucket_size}")
    keys = list(by)
    quotes = l1.where(F.col(mid2_col).isNotNull()).select(
        *keys,
        F.expr(f"`{seq_col}` div {int(bucket_size)}").alias("bucket"),
        F.col(seq_col).alias("_seq"),
        F.col(mid2_col).alias("_m"),
    )
    return quotes.groupBy(*keys, "bucket").agg(
        F.min_by("_m", "_seq").alias("open2"),
        F.max("_m").alias("high2"),
        F.min("_m").alias("low2"),
        F.max_by("_m", "_seq").alias("close2"),
        F.count(F.lit(1)).alias("n_quotes"),
    )


def depth_profile(
    snapshots: DataFrame,
    n: int,
    *,
    by: "list[str]" = (),
    seq_col: str = "seq",
) -> DataFrame:
    """Aggregate visible depth and book imbalance over the top-``n`` levels
    of each snapshot row — the standard liquidity features derived from a
    top-N feed (imbalance over the visible book predicts short-horizon
    drift; depth gates order sizing).

    ``bid_depth``/``ask_depth`` sum the present levels' quantities (absent
    levels contribute nothing — a 2-level book has the depth of 2 levels,
    not null); sides with NO levels at all yield null depth, preserving
    the no-quote/zero-quote distinction. ``imbalance`` = bid/(bid+ask) as
    the single final double division, null unless both sides quote.

    Pure row-wise projection over the snapshot columns — composes onto any
    book output with zero extra shuffle, exactly like ``l1_metrics``.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    bid_qs = [F.col(f"bid_qty_{i}") for i in range(1, n + 1)]
    ask_qs = [F.col(f"ask_qty_{i}") for i in range(1, n + 1)]

    def total(cols):
        some = cols[0].isNotNull()  # levels fill best-first: level 1 null => side empty
        s = cols[0]
        for c in cols[1:]:
            s = s + F.coalesce(c, F.lit(0))
        return F.when(some, s)

    bid_d, ask_d = total(bid_qs), total(ask_qs)
    both = bid_d.isNotNull() & ask_d.isNotNull()
    return snapshots.select(
        *by,
        F.col(seq_col).alias("seq"),
        bid_d.alias("bid_depth"),
        ask_d.alias("ask_depth"),
        F.when(
            both, bid_d.cast("double") / (bid_d + ask_d).cast("double")
        ).alias("imbalance"),
    )


def realized_variance(
    l1: DataFrame,
    bucket_size: int,
    *,
    by: "list[str]" = (),
    seq_col: str = "seq",
    mid2_col: str = "mid2",
) -> DataFrame:
    """Sum of squared midprice moves per seq bucket — the realized-variance
    estimator at event resolution, in exact integer tick² units.

    Input is ``l1_metrics`` output (or anything carrying 2x mid). Moves are
    lag-differences within each ``by`` group ordered by seq; null mid2 rows
    (one-sided books) break the chain explicitly (a move TO or FROM a no-
    quote state is not a price move). ``rv_ticks2`` = sum((Δmid2)²)/4 as the
    one final float division; ``n_moves`` counts the exact moves summed.
    Like ``order_flow_imbalance``, the default ``by=()`` serializes the
    stream into one ordered-window task — pass book keys at scale.
    """
    if bucket_size <= 0:
        raise ValueError(f"bucket_size must be > 0, got {bucket_size}")
    keys = list(by)
    w = Window.partitionBy(*keys).orderBy(seq_col) if keys else Window.orderBy(seq_col)
    d = F.col(mid2_col) - F.lag(mid2_col).over(w)
    moves = l1.select(
        *keys,
        F.expr(f"`{seq_col}` div {int(bucket_size)}").alias("bucket"),
        d.alias("dm"),
    ).where(F.col("dm").isNotNull())
    return (
        moves.groupBy(*keys, "bucket")
        .agg(
            (F.sum(F.col("dm") * F.col("dm")).cast("double") / F.lit(4.0)).alias(
                "rv_ticks2"
            ),
            F.count(F.lit(1)).alias("n_moves"),
        )
    )
