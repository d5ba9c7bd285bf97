"""Continuous per-segment heavy hitters: a keyed Misra-Gries summary as
managed streaming state.

Completes the sketch family's streaming limb (book fold, survivor dedup, and
user profiles already stream): each key (segment) carries ONE mergeable
Misra-Gries summary — at most ``k`` counters plus two longs — updated every
micro-batch via ``applyInPandasWithState`` (dependency-free, like
``book_stream``/``dedup_stream``; the container lacks the protobuf runtime
``transformWithStateInPandas`` needs, see ``profile_stream.tws_available``).

Emission contract (update mode): after folding a micro-batch, the operator
emits every item whose OPTIMISTIC count clears the support threshold —
``counter + cut_sum ≥ ceil(support · n_seen)`` with the exact-decimal ceil of
``operators.frequency`` — where ``cut_sum`` is the cumulative Misra-Gries
decrement, the per-item undercount bound (for every item:
``true − cut_sum ≤ counter ≤ true``). Consequences, both pinned by test:

* **No false negatives, ever**: a true heavy hitter's counter can be under
  its true count by at most ``cut_sum``, so the optimistic test keeps it.
* **Exact when k ≥ distinct items per key**: no pruning happens, so
  ``cut_sum = 0``, counters ARE the true counts, and the emission equals the
  batch GROUP BY/HAVING heavy hitters — the regime the driver oracle checks.
  Below that, emissions are a superset (candidates) with ``n`` a lower
  bound; a batch verify pass (``operators.frequency.heavy_hitters_by``)
  exactifies when needed.

Scale shape: state per key is O(k), sharded by key hash across executors;
each micro-batch touches only the keys present in it. No shuffle beyond the
groupBy(key) the state store already requires. Item values are BIGINT in
state (the state schema is fixed); use the batch operator for arbitrary item
types.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_order_book_spark.operators.order_book import _register_self_by_value

_register_self_by_value(__name__)


def _fold_mg(pdfs, prior, k: int):
    """Fold a micro-batch's item frames into the (items, counts, cut_sum,
    n_seen) state tuple. Shared by the stream processor and its tests so the
    arithmetic cannot drift. Returns None when the batch had no rows."""
    from polars_order_book_spark.operators.frequency import _mg_merge_tracked

    summary = None
    cut_sum = 0
    n_new = 0
    if prior is not None:
        items, counts, cut_sum, n_seen0 = prior
        summary = pd.Series(list(counts), index=list(items), dtype="int64")
        cut_sum = int(cut_sum)
    else:
        n_seen0 = 0
    for pdf in pdfs:
        if pdf.empty:
            continue
        n_new += int(len(pdf))
        counts = pdf["__item"].value_counts(sort=False)
        summary, cut = _mg_merge_tracked(summary, counts, k)
        cut_sum += cut
    if n_new == 0:
        return None
    return (
        [int(i) for i in summary.index],
        [int(c) for c in summary.to_numpy()],
        cut_sum,
        int(n_seen0) + n_new,
    )


def _emit_rows(
    key,
    state,
    support,
    key_name: str,
    item_name: str,
    min_count: "int | None" = None,
) -> pd.DataFrame:
    """Rows for every item whose optimistic count clears the threshold —
    ``ceil(support · n_seen)`` (exact-decimal) by default, or the ABSOLUTE
    ``min_count`` when given (the scale-aware contract: relative support
    dilutes as the stream grows, an absolute count does not). The optimistic
    ``counter + cut_sum`` test preserves no-false-negatives in both modes."""
    from fractions import Fraction

    items, counts, cut_sum, n_seen = state
    if min_count is not None:
        thr = int(min_count)
    else:
        fr = Fraction(str(support)) * n_seen
        thr = -(-fr.numerator // fr.denominator)  # exact ceil
    keep = [
        (i, c) for i, c in zip(items, counts) if c + cut_sum >= thr
    ]
    return pd.DataFrame(
        {
            key_name: [key[0]] * len(keep),
            item_name: [i for i, _ in keep],
            "n": pd.Series([c for _, c in keep], dtype="int64"),
            "n_seen": pd.Series([n_seen] * len(keep), dtype="int64"),
            "support": pd.Series(
                [c / n_seen for _, c in keep], dtype="float64"
            ),
        }
    )


def heavy_hitters_stream(
    events: DataFrame,
    key_col: str,
    item_col: str,
    *,
    support: float = 0.01,
    k: int | None = None,
    min_count: int | None = None,
) -> DataFrame:
    """Continuous per-key frequent items over a stream →
    (key_col, item_col long, n long, n_seen long, support double), update
    mode. ``n_seen`` (the key's total non-null rows so far) makes each
    emission's recency self-describing: in an update-mode sink, a key's
    CURRENT heavy-hitter set is exactly its rows at max(n_seen) — each
    emission lists every qualifying item of the key, so older emissions are
    wholly superseded.

    ``k`` is the summary width per key (default ceil(1/support)+1, the batch
    operator's guarantee minimum). ``n`` is the Misra-Gries counter — exact
    while the key's distinct items fit in ``k``, a lower bound past that
    (module docstring). Null keys/items are excluded up front, matching the
    batch operator's documented rule.

    ``min_count`` switches the emission threshold to an ABSOLUTE count
    (``counter + cut_sum ≥ min_count``), the streaming twin of
    ``operators.frequency.heavy_hitters_by_count``: relative support
    dilutes as the stream grows (the sf10 sweep's 0-row finding), an
    absolute contract emits a set bounded a priori at n_seen/min_count at
    every scale. ``support`` then only sizes the default ``k``; pass ``k``
    explicitly to control summary width directly."""
    if not (0 < support <= 1):
        raise ValueError(f"support must be in (0, 1], got {support}")
    if min_count is not None and min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    import math

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    kk = max(k or 0, math.ceil(1.0 / support) + 1)
    key_dt = events.schema[key_col].dataType.simpleString()

    prepared = events.select(
        F.col(key_col).alias("__key"),
        F.col(item_col).cast("long").alias("__item"),
    ).where(F.col("__key").isNotNull() & F.col("__item").isNotNull())

    out_schema = (
        f"{key_col} {key_dt}, {item_col} bigint, n bigint, n_seen bigint, "
        "support double"
    )
    state_schema = "items array<bigint>, counts array<bigint>, cut_sum bigint, n_seen bigint"

    def update(
        key: "tuple[Any, ...]",
        pdfs: "Iterator[pd.DataFrame]",
        state: "GroupState",
    ) -> "Iterator[pd.DataFrame]":
        prior = state.get if state.exists else None
        acc = _fold_mg(pdfs, prior, kk)
        if acc is None:
            return
        state.update(acc)
        yield _emit_rows(key, acc, support, key_col, item_col, min_count)

    return prepared.groupBy("__key").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
