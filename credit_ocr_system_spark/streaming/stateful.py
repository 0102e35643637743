"""Custom stateful streaming: gap-based sessionization with
``applyInPandasWithState``.

The batch twin (``operators/relational.py::sessionize_events``) closes
sessions with window functions; on an unbounded stream the same
semantics need per-key state + event-time timeouts: a user's session
stays open in the state store while events keep arriving within the
gap, and is emitted exactly once when the watermark passes
``last_event + gap``. State is per user (the grain Spark partitions
by), so this scales the same way the batch job does — no global state.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 30 * 60

OUTPUT_SCHEMA = ("user_id bigint, n_events bigint, "
                 "t_start timestamp, t_end timestamp, sum_value double")
STATE_SCHEMA = ("n_events bigint, t_start timestamp, t_end timestamp, "
                "sum_value double")


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, t_start, t_end, sum_value = state.get
        state.remove()
        yield pd.DataFrame([{
            "user_id": user_id, "n_events": n, "t_start": t_start,
            "t_end": t_end, "sum_value": sum_value,
        }])
        return

    closed = []
    if state.exists:
        n, t_start, t_end, sum_value = state.get
    else:
        n, t_start, t_end, sum_value = 0, None, None, 0.0

    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    for ts, value in zip(rows["ts"], rows["value"]):
        ts = ts.to_pydatetime()
        if t_end is not None and \
                (ts - t_end).total_seconds() > SESSION_GAP_SECONDS:
            closed.append({"user_id": user_id, "n_events": n,
                           "t_start": t_start, "t_end": t_end,
                           "sum_value": sum_value})
            n, t_start, t_end, sum_value = 0, None, None, 0.0
        n += 1
        t_start = t_start or ts
        t_end = ts
        sum_value += float(value)

    state.update((n, t_start, t_end, sum_value))
    # close the open session when the watermark passes last_event + gap
    state.setTimeoutTimestamp(
        int(t_end.timestamp() * 1000) + SESSION_GAP_SECONDS * 1000)
    if closed:
        yield pd.DataFrame(closed)


def stream_sessionize(events_stream, watermark: str = "10 minutes"):
    """events stream → closed-session rows (append mode).

    ``events_stream`` needs (event_id, ts, user_id, value). Emits a
    session either when a later event exceeds the gap (mid-batch) or
    when the event-time watermark passes its timeout.
    """
    return (
        events_stream
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
