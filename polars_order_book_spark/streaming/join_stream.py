"""Stream-stream interval join (event-time bounded, watermarked).

The batch engine joins bounded relations; joining two UNBOUNDED streams
(clicks->purchases attribution, order->fill matching, impression->conversion)
needs Spark's stream-stream join: each side buffers rows in the state store,
matches emit as they arrive, and the event-time range condition plus the
watermarks tell Spark exactly when a buffered row can never match again and
is evicted. Without the range bound the state grows forever; with it, state
per side is O(rows inside the join window + watermark delay) — the 100 TB
shape, sharded across executors by the equality key.

Spark requires the equality key + time-range condition to plan this as a
StreamingSymmetricHashJoin (shuffle on the key, symmetric state on both
sides); that is exactly the shape :func:`interval_join_stream` constructs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    upper: str = "INTERVAL 30 MINUTES",
    left_watermark: str | None = "7 days",
    right_watermark: str | None = "7 days",
    how: str = "inner",
) -> DataFrame:
    """Join two (possibly streaming) frames on an equality key where the
    right event lands in ``[left_ts, left_ts + upper)``.

    ``how``: "inner" or "left_outer". Left-outer emits the unmatched left row
    (right columns null) only once the watermark proves no match can still
    arrive — so outer results trail the watermark delay, and Spark REQUIRES
    watermarks on both sides for outer stream-stream joins (enforced here
    rather than failing at runtime). On an availableNow replay Spark runs a
    final no-data batch that advances the watermark to max(event time) -
    delay, flushing unmatched rows whose join window closed before it; rows
    inside the final watermark window stay buffered (exactly the continuous-
    stream contract — a bounded replay is just a stream that stops getting
    data, not one whose end is known to be THE end).

    Column-name contract: ``left_ts`` and ``right_ts`` must be distinct names
    (rename before calling); all other column names must not collide.
    Watermarks are REQUIRED for unbounded continuous streams (they bound the
    join state); pass None only for bounded availableNow INNER replays, where
    eviction never fires inside the single micro-batch anyway. The same code
    runs unchanged on two batch frames — Catalyst plans it as an ordinary
    range-predicate equi-join.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    lf, rf = left, right
    if lf.isStreaming and left_watermark is not None:
        lf = lf.withWatermark(left_ts, left_watermark)
    if rf.isStreaming and right_watermark is not None:
        rf = rf.withWatermark(right_ts, right_watermark)
    if how == "left_outer" and lf.isStreaming and rf.isStreaming:
        if left_watermark is None or right_watermark is None:
            raise ValueError(
                "stream-stream left_outer interval join requires watermarks "
                "on both sides (unmatched rows emit only when the watermark "
                "closes their join window)"
            )
    # Rename the right key before joining: both sides often derive from the
    # SAME source (self-joins like clicks/purchases splits), where attribute
    # references are ambiguous and drop(rf[on]) can silently keep the
    # null-extended right column on outer joins. Distinct names are
    # resolution-proof.
    rkey = f"__{on}__right"
    rf = rf.withColumnRenamed(on, rkey)
    cond = (
        (F.col(on) == F.col(rkey))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) < F.col(left_ts) + F.expr(upper))
    )
    return lf.join(rf, cond, how).drop(rkey)
