"""Output sinks: partitioned / bucketed parquet writers.

The reference has no sinks (its output is an in-memory frame); a 100 TB
engine needs durable, layout-aware output. Two shapes:

* :func:`write_partitioned` — hive-style directory partitioning. Readers
  filtering on the partition columns scan only matching directories
  (PartitionFilters in the plan — pinned by tests/test_sinks.py).
* :func:`write_bucketed` — bucketed + sorted table (saveAsTable; bucketing
  metadata lives in the catalog). Joins/aggregations on the bucket keys read
  co-located data and skip the shuffle.

Both default to dynamic partition overwrite so re-running a job replaces only
the partitions it produced — idempotent backfills.
"""

from __future__ import annotations

import os

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def _warehouse_local_path(raw: str) -> "str | None":
    """Local-filesystem path of a warehouse URI, or None for remote schemes.

    Bare 'file:' prefix-stripping was wrong two ways (review finding): an
    hdfs:/s3a: warehouse kept its scheme (os.path.isdir then always false,
    so the orphan cleanup silently no-oped while overwrite could still fail
    with LOCATION_ALREADY_EXISTS), and 'file://host/path' stripped to a
    scheme-relative '//host/path'. urlparse handles both: local paths and
    LOCAL file: URIs return a real path; anything else returns None so the
    caller can warn loudly instead of doing nothing. A file:// URI with a
    REMOTE host (non-empty netloc other than localhost) is NOT local —
    treating its path as local would rmtree an unrelated driver-side
    directory (second review finding), strictly worse than the old no-op.
    """
    from urllib.parse import urlparse

    parsed = urlparse(raw)
    if parsed.scheme == "":
        return raw
    if parsed.scheme == "file" and parsed.netloc in ("", "localhost"):
        return parsed.path or None
    return None


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write hive-partitioned parquet. ``max_records_per_file`` caps file size
    (small-file control is the other half: repartition on the partition cols
    first so each task writes few files)."""
    # Per-write option (not session conf): under the default STATIC mode an
    # overwrite deletes EVERY existing partition dir, including ones this
    # write does not produce — dynamic mode replaces only written partitions,
    # which is what makes re-runs idempotent backfills (pinned by test).
    writer = (
        df.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Re-read a partitioned dataset; partition columns come back as columns
    and predicates on them prune directories at planning time."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (optionally sorted) managed table. Equi-joins between
    tables bucketed the same way on the same keys skip the shuffle.

    Overwrite semantics across SESSIONS: a fresh SparkSession starts with an
    empty in-memory catalog, but the previous run's managed location is
    still on disk — saveAsTable then fails with LOCATION_ALREADY_EXISTS
    because the table isn't registered to overwrite. Drop any registered
    table AND clear an orphaned location first so overwrite means overwrite.
    """
    if mode == "overwrite":
        import shutil
        import warnings

        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        raw = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        warehouse = _warehouse_local_path(raw)
        if warehouse is None:
            warnings.warn(
                f"write_bucketed: warehouse {raw!r} is not a local "
                "filesystem; skipping orphaned-location cleanup — if the "
                "previous run left data at the managed location, overwrite "
                "may fail with LOCATION_ALREADY_EXISTS (drop the location "
                "with the appropriate filesystem tool)",
                stacklevel=2,
            )
        else:
            # Managed-table location layout: <warehouse>/<table> for the
            # DEFAULT database (whether written bare, 'default.t', or
            # 'spark_catalog.default.t' — the default db lives at the
            # warehouse ROOT, not default.db/; r8 self-review),
            # <warehouse>/<db>.db/<table> for any other database.
            parts = [p.lower() for p in table.split(".")]
            if parts and parts[0] == "spark_catalog":
                parts = parts[1:]
            if len(parts) == 1 or parts[-2] == "default":
                loc = os.path.join(warehouse, parts[-1])
            else:
                loc = os.path.join(warehouse, f"{parts[-2]}.db", parts[-1])
            if os.path.isdir(loc):
                shutil.rmtree(loc, ignore_errors=True)
    # One FILE per bucket: Spark trusts sortBy metadata (and skips the SMJ
    # sort) only when every bucket is a single file; without the repartition
    # each write task emits its own file per bucket it touches.
    if sort_by:
        df = df.repartition(n_buckets, *[df[c] for c in bucket_by])
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def append_stream_batch(batch_df: DataFrame, batch_id: int, root: str) -> None:
    """Replay-safe streaming append: the ``foreachBatch`` body for landing a
    micro-batch stream in parquet. Each batch writes its own hive partition
    directory ``batch_id=<id>`` with an overwrite scoped to that directory,
    so a REPLAYED batch (Spark retries a batch after task/driver failure,
    re-invoking foreachBatch with the same batch_id) rewrites its own
    directory idempotently instead of double-appending — the file-sink
    equivalent of the _CURRENT-marker discipline in
    streaming/agg_stream.py, for append-shaped output instead of a
    maintained rollup. Batch ids are only monotonic within one checkpoint
    lineage: pair one ``root`` with one checkpointLocation, like every
    foreachBatch sink here."""
    batch_df.write.mode("overwrite").parquet(
        os.path.join(root, f"batch_id={batch_id}")
    )


def read_stream_batches(spark: SparkSession, root: str) -> DataFrame:
    """Read back everything :func:`append_stream_batch` landed under ``root``.
    Partition discovery exposes ``batch_id`` as a column (dropped here — it
    is sink bookkeeping, not data); keep checkpoints OUTSIDE ``root`` or
    discovery trips on the non-hive directory."""
    return spark.read.parquet(root).drop("batch_id")


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_by: Sequence[str],
    max_records_per_file: int | None = None,
) -> None:
    """Rewrite a hive-partitioned dataset with consolidated files — the
    small-files maintenance pass every long-lived 100 TB table needs (each
    streaming/append job leaves one file per task per partition; thousands of
    tiny files turn scan planning and NameNode/listing into the bottleneck).

    One repartition on the partition columns routes every partition's rows to
    a single task, so each partition is rewritten as one file (capped by
    ``max_records_per_file`` when given). Dynamic partition overwrite keeps
    the rewrite idempotent and atomic per partition — concurrent readers see
    old or new files, never a half-written partition. Partition-column
    skew caveat: one giant partition = one write task; raise
    ``max_records_per_file`` granularity by salting upstream if that bites.
    """
    df = spark.read.parquet(path)
    compacted = df.repartition(*[df[c] for c in partition_by])
    write_partitioned(
        compacted,
        path,
        partition_by,
        max_records_per_file=max_records_per_file,
    )
