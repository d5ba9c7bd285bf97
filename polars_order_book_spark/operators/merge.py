"""Batch MERGE (upsert + delete) — the lakehouse table-maintenance primitive.

A training-data pipeline repeatedly folds change batches into curated tables
(metadata fixes, re-scored quality columns, takedown deletions). Without a
transactional table format, the portable Spark expression of MERGE is a
keyed combine of base and change relations; this module provides it as a
deterministic operator:

* ``latest_changes`` — collapse a change batch to one row per key
  (last-writer-wins by an explicit version column, id-tiebroken — never
  "whichever partition happened to arrive last").
* ``merge_upsert``   — apply the collapsed changes to the base: matched keys
  are replaced (or deleted when the tombstone flag is set), unmatched change
  rows are inserted, untouched base rows pass through.

Semantics mirror ANSI/Delta ``MERGE WHEN MATCHED THEN UPDATE / WHEN MATCHED
AND tombstone THEN DELETE / WHEN NOT MATCHED THEN INSERT``.

Scale shape: one shuffle on the merge key for the anti-join (base vs change
keys) — and even that disappears when the change batch is small enough to
broadcast, the common case (daily deltas vs a 100 TB base). The change-set
collapse shuffles only the change batch. No windows over the base, no full
rewrites of unmatched data; at 1000 executors the base table streams through
the anti-join map-side against a broadcast key set. Combine with
write_partitioned + dynamic partition overwrite (sinks module) to rewrite
only the partitions that received changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """One row per key: the change with the highest (version, then key-order
    deterministic) wins. Shuffles only the change batch."""
    order = [F.col(version_col).desc()] + [F.col(c) for c in changes.columns]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    version_col: str | None = None,
    tombstone_col: str | None = None,
    broadcast_changes: bool = True,
) -> DataFrame:
    """MERGE ``changes`` into ``base`` on ``key_cols``.

    * matched + tombstone       -> row deleted
    * matched, no tombstone     -> base row replaced by the change row
    * unmatched change          -> inserted (unless tombstoned)
    * unmatched base            -> unchanged

    ``changes`` must carry the same data columns as ``base`` (plus optionally
    ``version_col``/``tombstone_col``, which never appear in the output).
    When ``version_col`` is given the batch is first collapsed with
    :func:`latest_changes`; otherwise the batch must already be unique per
    key (duplicate keys would make the result order-dependent — validate
    upstream).

    ``broadcast_changes`` (default) hints the collapsed change relation to
    both the anti-join and the insert union — the delta-vs-big-base case.
    Disable for change batches near the base's own size.
    """
    data_cols = base.columns
    extra = set(changes.columns) - set(data_cols) - {version_col, tombstone_col}
    if extra:
        raise ValueError(f"change columns not in base schema: {sorted(extra)}")
    missing = set(data_cols) - set(changes.columns)
    if missing:
        raise ValueError(f"change batch missing base columns: {sorted(missing)}")

    if version_col is not None:
        changes = latest_changes(changes, key_cols, version_col)

    if tombstone_col is not None:
        survivors = changes.where(~F.coalesce(F.col(tombstone_col), F.lit(False)))
    else:
        survivors = changes

    change_keys = changes.select(*key_cols).distinct()
    if broadcast_changes:
        change_keys = F.broadcast(change_keys)
    untouched = base.join(change_keys, on=key_cols, how="left_anti")
    return untouched.unionByName(survivors.select(*data_cols))
