"""Streaming deduplication for continuous document ingestion.

The batch dedup operators (operators.dedup) assume a bounded corpus; a
training-data pipeline ingesting documents continuously needs duplicates
dropped ACROSS micro-batches. Two Spark-native paths:

* :func:`drop_exact_duplicates_stream` — the built-in path:
  ``withWatermark + dropDuplicates`` on the content hash. Spark's state store
  keeps one entry per distinct hash inside the watermark horizon and evicts
  beyond it; idiomatic and zero custom code, but emits only the survivors.
* :func:`dedup_stream_with_survivor` — stateful variant
  (``applyInPandasWithState`` keyed by content hash) that emits EVERY incoming
  document tagged with the canonical survivor (``keep_id`` = first seen,
  min-id within a batch) and ``is_first`` — the mapping downstream joins need
  to redirect references to the kept copy. State is one row (the survivor id)
  per distinct content hash, sharded across executors by key hash.

Both paths compute the hash with md5 (portable, matches operators.dedup's
exact_duplicates and its DuckDB oracle).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from polars_order_book_spark.operators.order_book import _register_self_by_value

_register_self_by_value(__name__)

_STATE_SCHEMA = StructType([StructField("keep_id", LongType(), True)])


def drop_exact_duplicates_stream(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Built-in streaming dedup: keep the first arrival of each distinct text
    within the watermark horizon. State size = distinct hashes per horizon.

    Uses ``dropDuplicatesWithinWatermark`` — with plain ``dropDuplicates``
    the watermark does NOT evict state unless the event-time column is part
    of the dedup subset, so state would grow one entry per distinct hash
    FOREVER (the exact pitfall :func:`drop_duplicates_within_watermark`
    documents). The horizon is the semantic contract either way: a
    duplicate arriving later than ``watermark`` after the original is a
    new document by declaration."""
    return (
        df.withColumn("content_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def dedup_stream_with_survivor(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tag every streamed document with its canonical survivor.

    Output (update mode): one row per input document —
    ``(content_hash, doc_id, keep_id, is_first)`` where ``keep_id`` is the
    min doc id of the hash's first micro-batch, then sticky forever after.
    Unbounded state (one id per distinct hash) is inherent to exact global
    dedup; bound it with the watermark path when the horizon allows.
    """
    out_schema = StructType(
        [
            StructField("content_hash", StringType(), False),
            StructField("doc_id", LongType(), False),
            StructField("keep_id", LongType(), False),
            StructField("is_first", BooleanType(), False),
        ]
    )

    def tag(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        chunks = [p for p in pdfs if not p.empty]
        if not chunks:
            if not state.exists:
                state.update((None,))
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        ids = pdf[id_col].astype("int64")
        if state.exists and state.get[0] is not None:
            keep = int(state.get[0])
            first = False
        else:
            keep = int(ids.min())
            first = True
            state.update((keep,))
        yield pd.DataFrame(
            {
                "content_hash": key[0],
                "doc_id": ids,
                "keep_id": keep,
                "is_first": first & (ids == keep),
            }
        )

    # Null rule (r8 self-review): md5(NULL text) is NULL — all null-text
    # docs would collapse into ONE dedup group keyed (None,) and the output
    # would smuggle a null into the non-nullable content_hash field. A doc
    # with no content has no content identity; exclude up front (the batch
    # dedup family's documented null convention).
    hashed = df.where(F.col(text_col).isNotNull()).withColumn(
        "content_hash", F.md5(F.col(text_col))
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        tag,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drop_duplicates_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins key dedup with bounded state
    (``dropDuplicatesWithinWatermark``, Spark 3.5+): unlike plain streaming
    ``dropDuplicates`` — whose state grows forever when the event-time column
    is not part of the key — this keeps one state row per key only until the
    watermark passes the key's first arrival, then evicts. Use it when
    duplicates arrive close together in event time (retries, at-least-once
    sources) but keys recur forever (user ids): state is bounded by the
    horizon, not by key cardinality. Emits each surviving row immediately
    (append mode works without waiting for the watermark)."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
