"""Custom stateful streaming operator: incremental gap sessionization
via applyInPandasWithState (the escape hatch SURVEY §7 prescribes when
built-in operators can't express the semantics — here, emitting
CLOSED sessions incrementally with explicit per-key state).

State per user: the currently-open session (start, last-seen, count).
Each micro-batch merges its events into that state and emits every
session closed by a gap > SESSION_GAP. The open tail stays in state —
bounded by #active keys, the 100 TB state-discipline requirement
(SURVEY §7 risk 6); GroupStateTimeout evicts idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SEC = 1800

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"
_US = 1_000_000


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us = last_us = n = None

    closed: list[tuple[int, int, int, int]] = []
    ts_us_sorted = []
    for pdf in pdfs:
        ts_us_sorted.extend(int(t.value) // 1000 for t in pd.to_datetime(pdf["ts"]))
    ts_us_sorted.sort()

    for t in ts_us_sorted:
        if start_us is None:
            start_us, last_us, n = t, t, 1
        elif t - last_us > SESSION_GAP_SEC * _US:
            closed.append((user_id, start_us, last_us, n))
            start_us, last_us, n = t, t, 1
        else:
            last_us, n = t, n + 1

    if start_us is not None:
        state.update((int(start_us), int(last_us), int(n)))
        state.setTimeoutDuration(3600 * 1000)  # evict idle keys after 1 h

    if state.hasTimedOut:
        # key idle past the timeout: flush the open session and drop state
        if start_us is not None:
            closed.append((user_id, start_us, last_us, n))
        state.remove()

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                "n_events": [c[3] for c in closed],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events(user_id, ts, ...) streaming DataFrame → closed sessions.
    Arrow-batched state function, one state row per active user."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# --- streaming EWMA ----------------------------------------------------------

EWMA_OUTPUT_SCHEMA = "user_id bigint, event_id bigint, ts timestamp, ewma double"
EWMA_STATE_SCHEMA = "s double"


def _ewma_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:  # pragma: no cover - NoTimeout below
        state.remove()
        return
    s = state.get[0] if state.exists else None

    pdf = pd.concat(list(pdfs), ignore_index=True)
    if pdf.empty:
        return
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    out = []
    for x, eid, ts in zip(pdf["value"], pdf["event_id"], pdf["ts"]):
        x = float(x)
        s = x if s is None else (s + x) * 0.5
        out.append((user_id, int(eid), ts, s))
    state.update((float(s),))
    yield pd.DataFrame(out, columns=["user_id", "event_id", "ts", "ewma"])


def ewma_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the events_ewma recursion, over the FULL
    per-user history instead of an 8-row frame: s₁ = x₁,
    sₜ = (sₜ₋₁ + xₜ)/2 carried across micro-batches in one
    8-byte state row per user — the smallest possible stateful
    operator, and the state-discipline contrast to the batch query
    (state is O(active users), never O(events)). Events are folded in
    (ts, event_id) order within each batch; the same halving fold as
    the batch twin, so replaying a corpus through the stream yields
    bit-identical ewma values to a batch fold over the same prefix."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _ewma_group,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
