"""Streaming per-key lifetime profiles via transformWithStateInPandas.

Spark 4's arbitrary-stateful API (transformWithState) supersedes
applyInPandasWithState with typed, individually-evictable state variables
(ValueState/ListState/MapState + per-variable TTL) and timers. The book fold
(book_stream) and survivor dedup (dedup_stream) use the older API; this
module exercises the new one on the canonical accumulator shape: a per-user
lifetime profile (event count, exact value sum, last-seen time) updated every
micro-batch — the "user feature store" limb of a training-data pipeline.

Exactness contract: the caller pre-converts event time to epoch micros and
value to scaled-integer micros JVM-side (unix_micros / floor(v*1e6 + 0.5) —
floor(x+0.5) rounds identically in Spark and DuckDB, unlike round()'s
half-even vs half-away divergence), so the processor only ever sums BIGINTs:
exact, overflow-checked by numpy int64, and order-independent — an oracle
can hash the output bit-for-bit.

Scale shape: state is ONE fixed-width row per user, sharded by key hash
across executors; each micro-batch touches only the users present in it.
Optional ``ttl_ms`` evicts profiles idle past the TTL (processing-time) —
the knob that bounds state when the key space grows forever.

Environment gate: transformWithState's Python worker speaks protobuf to the
JVM state server; containers without ``google.protobuf`` cannot run it
(Spark crashes the runner with an opaque ImportError mid-stream). We check
UP FRONT and raise a clear NotImplementedError instead — the applyInPandas-
WithState operators (book_stream, dedup_stream) cover the same ground
dependency-free. The test suite runs the full parity check where protobuf
exists and the gate check where it doesn't.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from polars_order_book_spark.operators.order_book import _register_self_by_value

_register_self_by_value(__name__)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.stateful_processor import TimerValues

def tws_available() -> bool:
    """True when the transformWithState Python worker can run here (its
    JVM<->Python state protocol requires google.protobuf)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


_STATE_SCHEMA = "n BIGINT, v BIGINT, last_us BIGINT"
_OUT_SCHEMA = "user_id BIGINT, n_events BIGINT, value_sum_micros BIGINT, last_us BIGINT"


def _fold_profile(rows, prior):
    """Shared accumulator for both state backends: fold the micro-batch's
    rows into (n, v_micros, last_us) on top of the prior state tuple (or
    None). ONE definition — the tws processor and the applyInPandasWithState
    fallback must never drift (their parity test assumes identical
    arithmetic). Returns None when the batch carried no rows for the key."""
    n = v = 0
    last = None
    for pdf in rows:
        if pdf.empty:
            continue
        n += int(len(pdf))
        v += int(pdf["v_micros"].sum())
        m = int(pdf["ts_us"].max())
        last = m if last is None else max(last, m)
    if n == 0:
        return None
    if prior is not None:
        pn, pv, plast = prior
        n, v = n + int(pn), v + int(pv)
        last = max(last, int(plast))
    return n, v, last


def _profile_row(key, acc):
    n, v, last = acc
    return pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "n_events": [n],
            "value_sum_micros": [v],
            "last_us": [last],
        }
    )


class _ProfileProcessor(StatefulProcessor):
    def __init__(self, ttl_ms: "int | None" = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", _STATE_SCHEMA, self._ttl_ms)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: "TimerValues"
    ) -> Iterator[pd.DataFrame]:
        prior = self._state.get() if self._state.exists() else None
        acc = _fold_profile(rows, prior)
        if acc is None:
            return
        self._state.update(acc)
        yield _profile_row(key, acc)

    def close(self) -> None:
        pass


def _prepare(events: DataFrame, user_col: str, ts_col: str, value_col: str) -> DataFrame:
    # Null rule (r8 self-review, same convention as heavy_hitters_stream):
    # a NULL user id would group under key (None,) and crash the processor
    # at int(key[0]); a NULL ts makes the batch max NaN; a NULL value would
    # be skipped by the pandas sum but still counted in n_events, silently
    # desynchronizing count and sum. Rows missing any field are excluded
    # up front.
    return events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.expr(f"CAST(floor({value_col} * 1000000 + 0.5) AS BIGINT)").alias("v_micros"),
    ).where(
        F.col("user_id").isNotNull()
        & F.col("ts_us").isNotNull()
        & F.col("v_micros").isNotNull()
    )


def user_profile_stream(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    ttl_ms: "int | None" = None,
    impl: str = "auto",
) -> DataFrame:
    """Per-user lifetime (count, exact value sum in micros, last-seen micros),
    re-emitted for every user touched by each micro-batch (update mode).

    ``impl``: "tws" (transformWithStateInPandas — typed state + TTL),
    "apply" (applyInPandasWithState — dependency-free, no TTL), or "auto"
    (tws where the environment supports it, else apply). Both produce the
    same output contract; the parity test pins them equal where both run.

    ``ttl_ms`` (tws only) bounds state for unbounded key spaces: a profile
    idle longer than the TTL is evicted and restarts from zero on the user's
    next event (an explicit, documented reset — not silent data loss)."""
    if impl not in ("auto", "tws", "apply"):
        raise ValueError(f"impl must be 'auto', 'tws', or 'apply', got {impl!r}")
    if impl == "auto":
        impl = "tws" if tws_available() else "apply"
    if impl == "apply" and ttl_ms is not None:
        raise ValueError("ttl_ms requires impl='tws' (GroupState has no per-key TTL)")
    prepared = _prepare(events, user_col, ts_col, value_col)
    if impl == "tws":
        if not tws_available():
            raise NotImplementedError(
                "transformWithStateInPandas requires google.protobuf (the "
                "Python<->JVM state-server protocol), which is not installed "
                "in this environment; impl='apply' provides the same operator "
                "on applyInPandasWithState"
            )
        return prepared.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_ProfileProcessor(ttl_ms),
            outputStructType=_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None" if ttl_ms is None else "ProcessingTime",
        )

    from typing import Iterable, Tuple

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: "Tuple[Any, ...]",
        pdfs: "Iterable[pd.DataFrame]",
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        prior = state.get if state.exists else None
        acc = _fold_profile(pdfs, prior)
        if acc is None:
            return
        state.update(acc)
        yield _profile_row(key, acc)

    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
