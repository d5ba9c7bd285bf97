"""Frame-shape helpers for reference workflows Spark lacks primitives for.

``pl.concat(how="horizontal")`` (ref: README.md:161) zips two frames row-by-
row positionally. Spark DataFrames have no intrinsic row order, so the Spark
analog is a join: on an explicit shared id when one exists (the scale path —
plain equi join, shuffle on the id), else by row position derived from
per-side ordering columns (SURVEY.md §2.3's join-on-row-id mapping).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_POS = "__hconcat_pos__"


def hconcat(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str] | None = None,
    left_order: str | Sequence[str] | None = None,
    right_order: str | Sequence[str] | None = None,
) -> DataFrame:
    """Horizontal concat of two equal-length frames.

    ``on``: shared id column(s) to align by — the scalable path (a plain
    equi join; Catalyst broadcasts or shuffles as appropriate).

    ``left_order``/``right_order``: when there is no shared id, align by ROW
    POSITION under each side's explicit ordering (``right_order`` defaults to
    ``left_order`` if the column exists on both sides). Positions come from a
    SEGMENTED rank (r5, replacing two single-task global sorts): each side is
    range-partitioned on its order columns, row_number runs per partition in
    parallel, and partition-count prefix offsets (a partitions-sized relation,
    broadcast back) make the ids global — the only unpartitioned window in
    the plan orders the per-partition counts, never the data. Prefer a real
    key (`on`) anyway for 100 TB work, like the reference's own examples join
    on "id" (ref: test_calculate_bbo.py:60): positional semantics still need
    a total order to be well-defined.
    The positional path EAGERLY counts both sides and raises ValueError on a
    length mismatch (Polars' horizontal concat errors too; a silent inner-join
    truncation would mask the caller's off-by-one). The `on` path stays lazy.

    Overlapping non-key column names take the left side's values; the right
    side's duplicates are dropped (matching Polars, which errors on duplicate
    names — we prefer the lenient join idiom).
    """
    if on is None and left_order is None:
        raise ValueError("hconcat needs `on` (shared id) or `left_order` (positional)")
    if on is not None:
        keys = [on] if isinstance(on, str) else list(on)
        dup = [c for c in right.columns if c in left.columns and c not in keys]
        return left.join(right.drop(*dup), on=keys)

    lo = [left_order] if isinstance(left_order, str) else list(left_order)
    ro = (
        ([right_order] if isinstance(right_order, str) else list(right_order))
        if right_order is not None
        else lo
    )
    # Single eager action for the guard (not one count() job per side); the
    # positional path is documented as eager + moderate-frame-only.
    counts = dict(
        left.groupBy().count().select(F.lit("l").alias("s"), "count")
        .unionByName(right.groupBy().count().select(F.lit("r").alias("s"), "count"))
        .collect()
    )
    if counts["l"] != counts["r"]:
        raise ValueError(
            f"hconcat positional alignment needs equal lengths: "
            f"left={counts['l']} right={counts['r']} (Polars raises here too)"
        )
    lnum = _with_positions(left, lo)
    rnum = _with_positions(right, ro)
    dup = [c for c in rnum.columns if c in lnum.columns and c != _POS]
    return lnum.join(rnum.drop(*dup), on=_POS).drop(_POS)


def _with_positions(df: DataFrame, order: "list[str]") -> DataFrame:
    """Global 1-based row positions under ``order`` without a global sort:
    range-partition on the order columns (partition i's keys all precede
    partition i+1's), rank within each partition in parallel, then add each
    partition's exclusive prefix count — derived from a partitions-sized
    aggregate, broadcast back. localCheckpoint truncates lineage so the
    range-shuffled relation feeds both the ranking and the counts once."""
    from polars_order_book_spark.functions.runtime import shuffle_partitions

    spark = df.sparkSession
    n_parts = shuffle_partitions(spark, fallback_df=df)
    ranged = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("__pid").orderBy(*order)
    local = ranged.withColumn("__local", F.row_number().over(w_local))
    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(_POS, (F.col("__off") + F.col("__local")).cast("long"))
        .drop("__pid", "__local", "__off")
    )
