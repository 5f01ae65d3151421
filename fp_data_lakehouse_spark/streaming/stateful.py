"""Custom stateful streaming: gap-based sessionization via
``applyInPandasWithState`` — the streaming twin of the batch
``ev02_user_sessions`` operator (same 30-minute inactivity gap, same
output measures).

Why a custom state machine instead of ``session_window``: the built-in
session window cannot carry arbitrary per-session state or emit
mid-stream summaries; this is the template for any operator that needs
one (per-user rate limiting, fraud scoring, CDC folding).

Semantics:
- All events for a user arriving in one micro-batch are folded in event
  order; every session CLOSED by the gap rule inside the batch is
  emitted immediately (correct under the watermark contract: an event
  that could reopen the session would be late beyond the watermark).
- The still-open tail session is kept in the state store with an
  event-time timeout at ``last_ep + gap``; when the watermark passes it,
  the timeout fires and the session flushes.
- State per key is three longs — the state store stays O(active users),
  not O(events); this is what makes the operator viable on an unbounded
  stream where the batch window formulation (shuffle ALL events per
  user) cannot run.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SEC = 30 * 60

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_epoch", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("duration_sec", T.LongType()),
    ]
)

# (session_start_epoch, last_event_epoch, n_events)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ep", T.LongType()),
        T.StructField("last_ep", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _close(user_id: int, start_ep: int, last_ep: int, n: int) -> dict[str, Any]:
    return {
        "user_id": user_id,
        "session_start_epoch": start_ep,
        "n_events": n,
        "duration_sec": last_ep - start_ep,
    }


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch rows into gap sessions.

    Pure function of (sorted event epochs, prior state) — deterministic
    regardless of batch boundaries, which is what the convergence test
    asserts against the batch operator.
    """
    user_id = key[0]
    closed: list[dict[str, Any]] = []

    if state.hasTimedOut:
        # Watermark passed last_ep + gap: the open session is final.
        start_ep, last_ep, n = state.get
        closed.append(_close(user_id, start_ep, last_ep, n))
        state.remove()
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_OUTPUT_SCHEMA])
        return

    eps: list[int] = []
    for pdf in pdfs:
        eps.extend(int(v) for v in pdf["ep"])
    eps.sort()

    if state.exists:
        start_ep, last_ep, n = state.get
    else:
        start_ep, last_ep, n = eps[0], eps[0] - 1, 0  # sentinel: no open session yet

    for ep in eps:
        if n > 0 and ep - last_ep > SESSION_GAP_SEC:
            closed.append(_close(user_id, start_ep, last_ep, n))
            start_ep, last_ep, n = ep, ep, 0
        elif n == 0:
            start_ep, last_ep = ep, ep
        else:
            # Late-but-admitted event (cross-batch, ep may precede the
            # stored tail): merge into the open session — never rewind
            # last_ep, or the next on-time event could wrongly split.
            start_ep = min(start_ep, ep)
            last_ep = max(last_ep, ep)
        n += 1

    state.update((start_ep, last_ep, n))
    # Event-time timeout: fire when the watermark passes the gap horizon.
    # Clamped above the current watermark — an admitted event more than
    # one gap behind it would otherwise produce a timestamp the API
    # rejects (INVALID_TIMEOUT_TIMESTAMP kills the whole query).
    state.setTimeoutTimestamp(
        max((last_ep + SESSION_GAP_SEC) * 1000, state.getCurrentWatermarkMs() + 1)
    )

    yield pd.DataFrame(closed, columns=[f.name for f in SESSION_OUTPUT_SCHEMA])


def sessionize_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization over a timestamped events stream.

    Input must carry ``user_id`` and a ``ts`` TimestampType column (the
    shape ``read_events_stream`` produces). Output appends one row per
    CLOSED session; open sessions flush when the watermark passes their
    gap horizon.
    """
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", watermark)
        .select("user_id", F.unix_timestamp("ts").alias("ep"), "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
