"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch twin is ops.events.w2_user_sessions (lag window + break-flag
sum). The streaming rendition cannot use a lag window (unbounded state);
instead each user carries explicit GroupState ``(last_ts, n_sessions,
n_events)`` across micro-batches — a session breaks when the gap to the
previous event exceeds SESSION_GAP_MIN. This is the
``applyInPandasWithState`` pattern for operators Structured Streaming's
built-ins can't express (vs stream_dedup_exact, where the built-in
dropDuplicatesWithinWatermark IS the right tool).

Caveat (same as any event-time sessionization without a global sort):
per-user correctness relies on per-user event order within and across
micro-batches; the file source replays in file order, and each batch is
sorted per user before folding into state.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SEC = 30 * 60

OUTPUT_SCHEMA = "user_id long, n_sessions int, n_events long"
STATE_SCHEMA = "last_ts double, n_sessions int, n_events long"


def _update_sessions(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_ts, n_sessions, n_events = state.get
    else:
        last_ts, n_sessions, n_events = None, 0, 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        for t in pdf["ts"]:
            epoch = t.timestamp()
            if last_ts is None or epoch - last_ts > SESSION_GAP_SEC:
                n_sessions += 1
            last_ts = epoch
            n_events += 1
    state.update((last_ts if last_ts is not None else 0.0, n_sessions, n_events))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def stream_user_sessions(events_stream: DataFrame) -> DataFrame:
    """Per-user running session/event counts, one row per user per
    micro-batch (update mode)."""
    return (
        events_stream.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_sessions,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
