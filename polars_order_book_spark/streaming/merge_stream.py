"""Streaming CDC apply: fold a change-record stream into a maintained table.

The batch :mod:`operators.merge` gives MERGE semantics for one change batch;
continuous pipelines receive change batches forever (metadata fixes, takedown
deletes, re-scored columns). Structured Streaming's contract for arbitrary
sinks is ``foreachBatch``: each micro-batch is a bounded DataFrame, applied
transactionally-per-batch by batch id. This module wires the two together:

    apply_changes_stream(changes, base_path, keys, ...)  ->  StreamingQuery

Each micro-batch B_i rewrites the target as ``merge_upsert(current, B_i)``.
Batch-wise LWW equals global LWW when versions are monotone per key across
batches (the usual CDC log guarantee: a key's later changes carry higher
versions) — under that contract the maintained table equals a single-shot
MERGE of the whole log, which is exactly what the driver oracle replays.

Scale shape: per batch, one broadcast anti-join against the current table
(change batches are deltas — small vs the base) plus the rewrite. The
full-table rewrite here is the format's limitation, not the operator's: on a
transactional table format (Delta/Iceberg) the same foreachBatch body calls
the format's MERGE and rewrites only matched files. With plain parquet we
keep the rewrite honest and atomic-per-batch by writing to a versioned
subdirectory (``_v{batch_id}``) and only then repointing a _CURRENT marker —
a reader never sees a half-written table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from polars_order_book_spark.operators.merge import merge_upsert

_CURRENT = "_CURRENT"


def _write_marker(base_path: str, vdir: str) -> None:
    """Atomically repoint the _CURRENT marker: write a temp file and
    os.replace it over the marker. A plain open(marker, 'w') truncates
    first, so a concurrent read_current could observe an empty or
    half-written marker — violating the 'a reader never sees a
    half-written table' guarantee (r8 self-review)."""
    marker = os.path.join(base_path, _CURRENT)
    tmp = marker + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(vdir)
    os.replace(tmp, marker)


def _current_version_path(base_path: str) -> str | None:
    marker = os.path.join(base_path, _CURRENT)
    if not os.path.exists(marker):
        return None
    with open(marker, encoding="utf-8") as f:
        rel = f.read().strip()
    return os.path.join(base_path, rel) if rel else None


def read_current(spark: SparkSession, base_path: str) -> DataFrame:
    """Read the maintained table's current version (marker-pointed)."""
    path = _current_version_path(base_path)
    if path is None:
        raise FileNotFoundError(f"no _CURRENT marker under {base_path}")
    return spark.read.parquet(path)


def init_table(base: DataFrame, base_path: str) -> None:
    """Seed the maintained table (version directory + marker)."""
    os.makedirs(base_path, exist_ok=True)
    vdir = "_v_init"
    base.write.mode("overwrite").parquet(os.path.join(base_path, vdir))
    _write_marker(base_path, vdir)


def apply_changes_stream(
    changes: DataFrame,
    base_path: str,
    key_cols: list[str],
    version_col: str = "version",
    tombstone_col: str = "tombstone",
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Start the maintenance query: every micro-batch of ``changes`` is
    MERGEd into the table at ``base_path``. Returns the StreamingQuery.

    The foreachBatch body is replay-safe (Spark may retry a batch after
    failure): if the retry happens before the marker flip, the batch
    rewrites ``_v{batch_id}`` from the unchanged predecessor state; if it
    happens after, MERGE of an already-applied batch is a fixpoint (updates
    re-replace with identical rows, deletes stay deleted, inserts re-insert
    themselves), so the rewritten version is identical either way.
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        vdir_this = f"_v{batch_id}"
        marker = os.path.join(base_path, _CURRENT)
        # Replay safety: if the driver died between writing the marker and
        # committing the streaming checkpoint, the retried batch would read
        # from _v{batch_id} while overwriting that same path (AnalysisException,
        # wedged query). The marker already naming this batch's version means
        # the merge fully completed — make the retry a no-op.
        if os.path.exists(marker):
            with open(marker, encoding="utf-8") as f:
                if f.read().strip() == vdir_this:
                    return
        current = read_current(spark, base_path)
        merged = merge_upsert(
            current,
            batch_df,
            key_cols,
            version_col=version_col,
            tombstone_col=tombstone_col,
        )
        merged.write.mode("overwrite").parquet(os.path.join(base_path, vdir_this))
        _write_marker(base_path, vdir_this)

    # Default the checkpoint to a subdirectory of the TABLE (r8
    # self-review): batch ids are monotonic only within one checkpoint
    # lineage, and the _v{batch_id} version dirs + replay guard key on
    # them — a fresh temp checkpoint against a persisted table would
    # restart ids at 0, colliding with existing version dirs. Pinning the
    # checkpoint to the table makes the two move (and get deleted)
    # together.
    if checkpoint is None:
        checkpoint = os.path.join(base_path, "_checkpoint")
    writer = (
        changes.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
