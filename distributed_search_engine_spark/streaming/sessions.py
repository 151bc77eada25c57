"""Custom stateful streaming operator: per-user sessionization with
applyInPandasWithState.

The batch twin is the oracle-gated events_sessionize query (gap > gap_sec
starts a new session); this is the continuous form: per-user session state
lives in the Spark state store (checkpointed, exactly-once across query
restarts), sessions CLOSE either when a later event arrives beyond the gap
or when the event-time watermark passes last_ts + gap (EventTimeTimeout).

Scale shape: one stateful shuffle on user_id per micro-batch; state is
four scalars per open session, so memory is O(active users), not O(events).
The reference engine has no streaming at all (SURVEY §1.4) — this extends
the engine the way a training-data pipeline needs it.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SEC = 1800

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
STATE_SCHEMA = "start double, last double, n long, total double"


def _session_row(user_id: int, start: float, last: float, n: int, total: float):
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.to_datetime(start, unit="s")],
            "session_end": [pd.to_datetime(last, unit="s")],
            "n_events": [n],
            "total_value": [total],
        }
    )


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = SESSION_GAP_SEC,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "0 seconds",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, total_value) of
    CLOSED sessions; open sessions stay in state until closed by a later
    event or the watermark timeout."""

    def _fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield _session_row(user_id, start, last, n, total)
            return
        batch = pd.concat(list(pdf_iter))
        batch = batch.sort_values(ts_col, kind="mergesort")
        ts = batch[ts_col].astype("int64").to_numpy() / 1e9
        vals = batch[value_col].to_numpy()
        if state.exists:
            start, last, n, total = state.get
        else:
            start = None
            last = n = total = None
        closed = []
        for t, v in zip(ts.tolist(), vals.tolist()):
            if start is None:
                start, last, n, total = t, t, 1, v
            elif t - last > gap_sec:
                closed.append((start, last, n, total))
                start, last, n, total = t, t, 1, v
            else:
                last, n, total = t, n + 1, total + v
        state.update((start, last, n, total))
        # close the open session once event time passes last + gap
        state.setTimeoutTimestamp(int((last + gap_sec) * 1000))
        for s in closed:
            yield _session_row(user_id, *s)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            _fn, OUT_SCHEMA, STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
