"""Custom stateful streaming operator: per-key session aggregation via
``applyInPandasWithState`` (the batch twin is the oracle-checked
``sessionize`` harness query).

State model: one open session per user (start, last_ts, n_events). An
incoming batch extends the open session or closes it when the
inactivity gap exceeds the timeout; closed sessions are emitted
downstream. Processing-time timeouts flush idle sessions. State size is
O(active users) — bounded, checkpointed by the engine.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_fn(gap_us: int, timeout_ms: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append((user_id, start, last, n))
                state.remove()
            yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])
            return

        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(v) for v in pdf["ts_us"])
        ts_list.sort()

        start, last, n = state.get if state.exists else (None, None, 0)
        for t in ts_list:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if start is not None:
            state.update((start, last, n))
            if timeout_ms > 0:
                state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])

    return fn


def stateful_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """events(user_id, ts_us) stream -> closed sessions stream.

    Works on a streaming DataFrame (real state store + timeouts); the
    same grouping also runs on a batch frame for testing via
    ``applyInPandasWithState`` semantics.

    ``idle_timeout_ms`` is the PROCESSING-time idleness after which an
    open session is flushed; it defaults to the event-time gap
    (gap_minutes in ms) so a session is never force-closed before the
    inactivity gap could possibly have elapsed — matching the batch
    ``sessionize`` twin whenever processing time tracks event time.
    (Under replay/backfill, where processing time runs faster than
    event time, a flush can still close a session the batch twin would
    have merged; pass a larger timeout to trade latency for parity.)

    ``idle_timeout_ms=0`` disables the processing-time timeout entirely
    (GroupStateTimeout.NoTimeout): only gap-closed sessions are ever
    emitted and open sessions stay in state. This is the right mode for
    drain-and-stop runs (``trigger(availableNow=True)``) — with a
    registered timeout the engine keeps scheduling empty micro-batches
    until the timeout fires, so a finite run would otherwise spin for
    the full idle window after the data is exhausted."""
    from .._shipping import ensure_package_shipped

    ensure_package_shipped(events.sparkSession)
    if idle_timeout_ms is None:
        idle_timeout_ms = gap_minutes * 60 * 1000
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.selectExpr(f"{user_col} as user_id", f"{ts_us_col} as ts_us")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes * 60 * 1_000_000, idle_timeout_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )
