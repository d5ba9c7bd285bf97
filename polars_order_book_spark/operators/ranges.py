"""Range joins without nested-loop plans.

Spark turns a bare inequality join (``lo <= p AND p < hi``) into a
``BroadcastNestedLoopJoin`` (small side) or a ``CartesianProduct`` (big-big) —
the latter is a non-starter at 100 TB. These operators re-express range
predicates as *bucket equi-joins*: decompose the numeric domain into
fixed-width buckets, explode each interval onto the buckets it overlaps,
map each point to its single bucket, equi-join on the bucket id (a plain
shuffled/broadcast hash join Catalyst can optimize, AQE can skew-split), and
refine with the exact predicate. This is the standard interval-bucketing
strategy used by large-scale engines for range/interval joins.

Matching-pair multiplicity is handled structurally, not with ``distinct``:

- point-in-interval: a point lives in exactly one bucket, so each qualifying
  (point, interval) pair meets in exactly one bucket — no dedup pass.
- interval-overlap: two intervals can share many buckets, so a pair is kept
  only in its *canonical* bucket (the bucket of the overlap's left edge,
  ``max(a_lo, b_lo)``) — one deterministic bucket per pair, again no dedup.

Beyond-reference extension (the reference engine has no range join; its
closest surface is the as-of family — ref: polars_order_book/README.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_of(col: Column, width: float) -> Column:
    return F.floor(col / F.lit(width)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float | None = None,
    closed: str = "left",
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Join each point row to every interval row containing it.

    ``closed='left'`` keeps ``lo <= p < hi`` (half-open, the default for
    banding); ``closed='both'`` keeps ``lo <= p <= hi``. Null points or null
    bounds never match.

    Two physical strategies:

    - ``broadcast_intervals=True``: broadcast + range predicate — a
      ``BroadcastNestedLoopJoin`` whose build side is the interval table.
      Right only when intervals are dimension-sized (the same smallness
      contract as ``F.broadcast``).
    - ``bucket_width=W`` (the scale path): intervals explode onto
      ``floor(lo/W) .. floor(hi/W)`` bucket ids, points map to their single
      bucket, and the join is a hash equi-join on the bucket id plus the
      exact refine filter. Shuffle volume is O(points + intervals ×
      buckets-per-interval); pick W near the typical interval length so the
      explode factor stays small. Hot buckets are ordinary join skew — AQE
      splits them.

    Output: all point columns, then all interval columns (name collisions are
    the caller's to resolve beforehand, as with any join).
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    p = F.col(point_col)
    lo, hi = F.col(lo_col), F.col(hi_col)
    refine = (lo <= p) & ((p < hi) if closed == "left" else (p <= hi))

    if broadcast_intervals:
        return points.join(F.broadcast(intervals), on=refine, how="inner")
    if bucket_width is None or bucket_width <= 0:
        raise ValueError("bucket_width (> 0) is required unless broadcast_intervals=True")

    w = float(bucket_width)
    iv = intervals.withColumn(
        "__rj_bucket",
        F.explode(F.sequence(_bucket_of(lo, w), _bucket_of(hi, w))),
    )
    pt = points.withColumn("__rj_bucket", _bucket_of(p, w))
    return pt.join(iv, on="__rj_bucket", how="inner").where(refine).drop("__rj_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Join interval pairs that overlap: ``a_lo < b_hi AND b_lo < a_hi``
    (half-open intervals; touching endpoints do not overlap).

    Both sides explode onto their bucket ranges and equi-join on the bucket
    id; a qualifying pair is emitted only where the join bucket equals the
    bucket of ``greatest(a_lo, b_lo)`` — the overlap's left edge — so every
    pair survives in exactly one bucket and no ``distinct`` pass is needed.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")
    w = float(bucket_width)
    a_lo, a_hi = F.col(left_lo), F.col(left_hi)
    b_lo, b_hi = F.col(right_lo), F.col(right_hi)

    lhs = left.withColumn(
        "__rj_bucket", F.explode(F.sequence(_bucket_of(a_lo, w), _bucket_of(a_hi, w)))
    )
    rhs = right.withColumn(
        "__rj_bucket", F.explode(F.sequence(_bucket_of(b_lo, w), _bucket_of(b_hi, w)))
    )
    overlap = (a_lo < b_hi) & (b_lo < a_hi)
    canonical = F.col("__rj_bucket") == _bucket_of(F.greatest(a_lo, b_lo), w)
    return lhs.join(rhs, on="__rj_bucket", how="inner").where(overlap & canonical).drop(
        "__rj_bucket"
    )
