"""Structured Streaming continuous order book.

The reference has NO streaming mode — it assumes a pre-sorted batch frame
(ref: README.md:182). This module is the additive Spark-native extension
planned in SURVEY.md §7 PR5: a continuous top-N book over an unbounded event
stream, keyed by book (e.g. ``product_id``), with the book state held in
Spark's managed per-key state store (``applyInPandasWithState``).

Semantics: identical to the batch operators in ``operators.order_book`` —
both paths call the same ``_fold_arrays`` event loop, with the streaming path
persisting the two ``_Side`` structures into the state store between
micro-batches. Events must arrive in ``seq`` order ACROSS micro-batches for a
given book (within a batch we sort); this mirrors the reference's own
"always sort your data" contract and is the documented delta from a
watermark/late-data design (which would need to buffer and reorder — see
module notes at the bottom).

Scale notes (100 TB design): state per book is O(live price levels), a few KB;
the state store shards by key hash across executors, so throughput scales with
the number of books exactly like the batch path. Checkpointing gives exactly-
once output; the fold is deterministic so replays are safe.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from polars_order_book_spark.operators.order_book import (
    _Side,
    _as_list,
    _check_n,
    _fold_arrays,
    _register_self_by_value,
    _side_from_lists,
    _side_to_lists,
    snapshot_columns,
)

# Ship this module inside the UDF closure too (the fold closure references
# module-level helpers here); see operators.order_book for rationale.
_register_self_by_value(__name__)

_STATE_SCHEMA = StructType(
    [
        StructField("bid_prices", ArrayType(LongType()), True),
        StructField("bid_qtys", ArrayType(LongType()), True),
        StructField("ask_prices", ArrayType(LongType()), True),
        StructField("ask_qtys", ArrayType(LongType()), True),
    ]
)


def top_n_levels_stream(
    df: DataFrame,
    variant: str = "mutations",
    price: str = "price",
    qty: str = "qty",
    is_bid: str = "is_bid",
    prev_price: str | None = None,
    prev_qty: str | None = None,
    *,
    seq: str = "seq",
    by: Sequence[str] = ("product_id",),
    n: int = 1,
) -> DataFrame:
    """Continuous top-N book over a streaming DataFrame.

    Returns a streaming DataFrame with the book-key columns, ``seq``, and the
    4·n snapshot columns — one output row per input event, exactly the batch
    operator's contract, in ``update`` output mode.

    ``variant`` ∈ {'updates', 'mutations', 'modify'} with the semantics of the
    matching batch operator (ref: update.rs:101-162). ``by`` must be non-empty:
    streaming state is keyed, and a single global book would serialize the
    stream through one task anyway (the reference's own constraint,
    ref: README.md:184-197).
    """
    _check_n(n)
    if variant not in ("updates", "mutations", "modify"):
        raise ValueError(f"unknown variant: {variant}")
    if variant == "modify" and (prev_price is None or prev_qty is None):
        raise ValueError("modify variant requires prev_price and prev_qty")
    if not by:
        raise ValueError("streaming book requires at least one key column in `by`")

    key_fields = [df.schema[k] for k in by]
    out_schema = StructType(
        list(key_fields)
        + [StructField(seq, LongType(), False)]
        + [StructField(c, LongType(), True) for c in snapshot_columns(n)]
    )
    snap_cols = snapshot_columns(n)
    keys = list(by)

    def fold_batches(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bp, bq, ap, aq = state.get
            bids = _side_from_lists(bp, bq)
            asks = _side_from_lists(ap, aq)
        else:
            bids, asks = _Side(), _Side()

        # applyInPandasWithState delivers one group's micro-batch as MULTIPLE
        # Arrow chunks in arbitrary post-shuffle order (chunking kicks in past
        # spark.sql.execution.arrow.maxRecordsPerBatch). Sorting each chunk
        # independently would apply events out of seq order across chunks and
        # corrupt book state — so gather the whole micro-batch, sort once,
        # fold once.
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(seq, kind="mergesort", ignore_index=True)
            out, mask, bids, asks = _fold_arrays(
                variant,
                n,
                pdf[seq].to_numpy(),
                _as_list(pdf[is_bid]),
                _as_list(pdf[price]),
                _as_list(pdf[qty]),
                _as_list(pdf[prev_price]) if prev_price else None,
                _as_list(pdf[prev_qty]) if prev_qty else None,
                bids=bids,
                asks=asks,
            )
            res = pd.DataFrame({k: pdf[k] for k in keys})
            res[seq] = pdf[seq]
            for j, c in enumerate(snap_cols):
                res[c] = pd.arrays.IntegerArray(out[j], mask[j])
            yield res

        bp2, bq2 = _side_to_lists(bids)
        ap2, aq2 = _side_to_lists(asks)
        state.update((bp2, bq2, ap2, aq2))

    return (
        df.groupBy(*[F.col(k) for k in keys])
        .applyInPandasWithState(
            fold_batches,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
