"""Streaming gap sessionization with ``session_window``.

The batch sessionizer (plans/queries.py events_sessionize) derives sessions
with a lag + running-sum window pair; on an unbounded stream that formulation
needs the whole history. Structured Streaming's ``session_window`` is the
native operator: per key, an event opens a window ``[ts, ts + gap)``;
overlapping windows merge, and state per key is O(open sessions), evicted by
the watermark.

Boundary parity with the batch version (pinned by test): ``session_window``
merges an event at exactly ``prev + gap`` into the running session (split
requires ``gap > gapDuration``), which is precisely the batch lag-rule's
``gap > 30min`` session-start condition — the two formulations agree on all
inputs, including exact-boundary gaps.

Output schema (no ordinal session_no — an ordinal needs total per-user
history, which a stream cannot give): (user_id, n_events, start_us, end_us)
where start/end are min/max event micros in the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Gap sessions over a (possibly streaming) events relation.

    ``watermark`` (e.g. ``"1 hour"``) bounds state for append-mode continuous
    streams; leave None for complete-mode / availableNow batch-replay, where
    every session is (re)emitted on each trigger and no state is dropped.
    min/max event times are aggregated explicitly rather than read off the
    window struct (``session_window.end`` is last-event + gap, not max ts).
    """
    ev = events
    if watermark is not None:
        ev = ev.withWatermark(ts_col, watermark)
    return (
        ev.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min(ts_col)).alias("start_us"),
            F.unix_micros(F.max(ts_col)).alias("end_us"),
        )
        .drop("session_window")
    )
