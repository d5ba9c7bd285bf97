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
) -> DataFrame:
    """Inner-join two (possibly streaming) frames on an equality key where the
    right event lands in ``[left_ts, left_ts + upper)``.

    Column-name contract: ``left_ts`` and ``right_ts`` must be distinct names
    (rename before calling); all other column names must not collide.
    Watermarks are REQUIRED for unbounded continuous streams (they bound the
    join state); pass None only for bounded availableNow replays, where
    eviction never fires inside the single micro-batch anyway. The same code
    runs unchanged on two batch frames — Catalyst plans it as an ordinary
    range-predicate equi-join.
    """
    lf, rf = left, right
    if lf.isStreaming and left_watermark is not None:
        lf = lf.withWatermark(left_ts, left_watermark)
    if rf.isStreaming and right_watermark is not None:
        rf = rf.withWatermark(right_ts, right_watermark)
    cond = (
        (lf[on] == rf[on])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) < F.col(left_ts) + F.expr(upper))
    )
    return lf.join(rf, cond, "inner").drop(rf[on])
