"""Custom stateful streaming operator: incremental last-touch
attribution via applyInPandasWithState — the streaming twin of
operators/events.events_attribution (same 7-day lookback contract,
gated equal in tests/test_stateful.py).

State per user: the most recent non-purchase touch (type, ts). Each
micro-batch replays its events in (ts, event_id) order; purchases emit
an attribution row (channel = the stored touch if within the lookback,
else 'direct'), non-purchases just overwrite the state cell. State is
ONE tiny row per active user — the 100 TB state-discipline requirement
(SURVEY §7 risk 6) — and the batch/stream equivalence holds because the
batch operator's carry-forward window reads exactly this "last touch
strictly before me" relation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LOOKBACK_US = 7 * 86400 * 1_000_000

ATTR_OUTPUT_SCHEMA = (
    "user_id bigint, event_id bigint, channel string, value double, delay_us bigint"
)
ATTR_STATE_SCHEMA = "touch_type string, touch_us bigint"


def _attribute_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        touch_type, touch_us = state.get
    else:
        touch_type, touch_us = None, None

    rows: list[tuple[int, int, str, float]] = []
    for pdf in pdfs:
        # normalize to ns before the int cast: pandas 2.x may hand the
        # Arrow column over as datetime64[us], and a us-resolution
        # series through astype(int64)//1000 would yield MILLIseconds —
        # silently scaling every delay and the 7-day lookback 1000×
        ts_us = (
            pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64") // 1000
        ).tolist()
        rows.extend(
            zip(ts_us, pdf["event_id"].astype("int64"), pdf["event_type"], pdf["value"])
        )
    rows.sort(key=lambda r: (r[0], r[1]))  # event-time order, id tiebreak

    out: list[tuple[int, int, str, float, int | None]] = []
    for ts, eid, etype, value in rows:
        if etype == "purchase":
            if touch_us is None or ts - touch_us > LOOKBACK_US:
                out.append((user_id, int(eid), "direct", float(value), None))
            else:
                out.append(
                    (user_id, int(eid), touch_type, float(value), int(ts - touch_us))
                )
        else:
            touch_type, touch_us = str(etype), int(ts)

    if touch_us is not None:
        state.update((touch_type, int(touch_us)))

    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "channel", "value", "delay_us"]
        ).astype({"delay_us": "Int64"})


def attribute_stream(events: DataFrame) -> DataFrame:
    """events(user_id, event_id, ts, event_type, value) streaming
    DataFrame → one attribution row per purchase, emitted in the
    micro-batch the purchase arrives in."""
    return events.groupBy("user_id").applyInPandasWithState(
        _attribute_group,
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
