"""As-of (time-series) join — the canonical market-data operator Spark lacks.

``asof_join(left, right, on=ts, by=keys)`` attaches to every left row the
right row with the greatest ``on`` ≤ the left row's ``on`` (direction
'backward'; 'forward' = least ≥), optionally within a tolerance. Polars/pandas
expose this as ``join_asof``/``merge_asof``; DuckDB as ``ASOF JOIN`` — which
the oracle uses verbatim.

Spark-first composition (no UDFs, no per-row Python): union the two sides
with a side tag, forward-fill the right side's payload with one
``last(struct, ignorenulls=True)`` window per partition, keep left rows. Cost
= ONE shuffle+sort on (by, on) over |L|+|R| rows — the same partitioning a
sort-merge join would pay, but with no join explosion and inherently
skew-tolerant (a hot key is one sort partition, not a quadratic blowup).
Payload columns ride in a single struct so a null value INSIDE a right row
does not make the fill skip back to an older right row (the struct itself is
never null for right rows).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side__"
_PAY = "__asof_payload__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: Sequence[str] = (),
    direction: str = "backward",
    tolerance=None,
    right_on_as: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row plus the temporally nearest right row's
    payload columns (all right columns except ``by``/``on``), nulls when no
    right row qualifies.

    * ``direction='backward'``: greatest right ``on`` ≤ left ``on`` (ties:
      a right row at the same ``on`` matches, like DuckDB's ``>=``).
      ``'forward'``: least right ``on`` ≥ left ``on``.
    * ``tolerance``: optional Column/literal; matches farther than this from
      the left row's ``on`` are nulled out (pandas ``merge_asof`` semantics).
      Expressed as ``left.on - matched.on`` for backward (and reversed for
      forward) — pass a matching type (e.g. ``F.expr("INTERVAL 1 HOUR")`` for
      timestamps, an int for longs).
    * ``right_on_as``: also attach the matched right row's ``on`` under this
      name (needed by callers that want the match distance).

    Right payload column names must not collide with left columns — rename
    before joining (explicit beats implicit suffixing).

    Scale note: ``by=()`` builds an UNPARTITIONED ordered window — the
    union of both sides sorts in a single task. Pass the entity keys at
    scale (the registered query joins per user); the empty-``by`` form is
    for single-series frames only.

    Determinism contract: ``right`` should be unique per (``by``, ``on``) —
    with duplicates, which of the tied rows wins is partition-order dependent
    (pandas ``merge_asof`` has the same caveat, resolved by input order,
    which Spark does not have). Pre-aggregate ties (e.g.
    ``groupBy(by, on).agg(...)``) as the registered query does.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    payload = [c for c in right.columns if c not in by and c != on]
    clash = [c for c in payload if c in left.columns]
    if clash:
        raise ValueError(f"right payload columns collide with left: {clash}")
    if right_on_as is not None:
        # r8 self-review: validate against BOTH output column sources — a
        # right_on_as equal to a right payload column would silently emit
        # duplicate output columns, failing far from the call site.
        if right_on_as in left.columns:
            raise ValueError(
                f"right_on_as {right_on_as!r} collides with a left column"
            )
        if right_on_as in payload:
            raise ValueError(
                f"right_on_as {right_on_as!r} collides with a right payload "
                "column — the output would carry two columns of that name"
            )
        if not right_on_as:
            raise ValueError("right_on_as must be a non-empty column name")
    # Right rows carry their payload (plus their own `on`) in ONE struct —
    # never null for a right row — so the window fill cannot skip past a
    # right row whose individual payload value is null.
    pay_struct = F.struct(
        *[F.col(c).alias(c) for c in payload], F.col(on).alias("__on")
    )
    left_cols = [c for c in left.columns]
    r_tagged = right.select(
        *by, F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in by and c != on],
        pay_struct.alias(_PAY),
        F.lit(0).alias(_SIDE),
    )
    l_tagged = left.select(
        *by, F.col(on),
        *[F.col(c) for c in left_cols if c not in by and c != on],
        F.lit(None).cast(r_tagged.schema[_PAY].dataType).alias(_PAY),
        F.lit(1).alias(_SIDE),
    )
    unioned = r_tagged.unionByName(l_tagged.select(*r_tagged.columns))

    order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(order, F.col(_SIDE).asc())  # right before left at equal `on`
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))
    res = filled.where(F.col(_SIDE) == 1).drop(_SIDE)

    matched_on = F.col(_PAY)["__on"]
    # Null semantics match pandas merge_asof / DuckDB ASOF: a left row with a
    # null `on` or a null `by` key never matches. Without this guard the
    # forward direction's descending sort parks null `on` rows after every
    # right row (window covers everything → spurious smallest-`on` match),
    # and null `by` keys would group with each other while the oracle's
    # equality join excludes them.
    joinable = F.col(on).isNotNull()
    for k in by:
        joinable = joinable & F.col(k).isNotNull()
    if tolerance is not None:
        gap = (F.col(on) - matched_on) if direction == "backward" else (matched_on - F.col(on))
        in_tol = joinable & matched_on.isNotNull() & (gap <= tolerance)
    else:
        in_tol = joinable & matched_on.isNotNull()
    cols = [*by, on, *[c for c in left_cols if c not in by and c != on]]
    proj = [F.col(c) for c in cols]
    for c in payload:
        proj.append(F.when(in_tol, F.col(_PAY)[c]).alias(c))
    if right_on_as:
        proj.append(F.when(in_tol, matched_on).alias(right_on_as))
    return res.select(*proj)
