"""Custom stateful streaming operator: cross-batch sessionization via
``applyInPandasWithState`` — the sanctioned Arrow path for stateful
logic Structured Streaming's built-ins can't express.

Reference analog: none directly (the reference is batch-only); this is
the streaming form of the batch gap-sessionization in the catalog
(`sessionize_events`), with the session state carried in the streaming
state store so a session spanning many micro-batches (or a stream
restart — state lives in the checkpoint) is still assembled correctly.

Scale shape: state is per-key and O(1) (one open session tuple), the
grouping shuffle is the only exchange, and each micro-batch's per-key
rows arrive as Arrow-batched pandas frames — no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
# open-session state: epoch seconds (long) keeps the state row fixed-width
STATE_SCHEMA = "start_s long, end_s long, n long"


def _fn_factory(gap_sec: int):
    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        # null timestamps carry no ordering information — drop them BEFORE
        # the epoch conversion (astype on NaT raises / corrupts state)
        ts = pd.concat([pdf[["ts"]] for pdf in pdfs])["ts"].dropna().sort_values()
        secs = (ts.astype("int64") // 1_000_000_000).tolist()
        if state.exists:
            start_s, end_s, n = state.get
        else:
            start_s = end_s = None
            n = 0
        closed = []
        for s in secs:
            if start_s is None:
                start_s, end_s, n = s, s, 1
            elif s - end_s <= gap_sec:
                # late arrivals (s < end_s, possible across micro-batches)
                # must extend the session bounds monotonically, never
                # regress them — a regressed end_s would let the next
                # in-order event spuriously close the session
                start_s, end_s, n = min(start_s, s), max(end_s, s), n + 1
            else:
                closed.append((key[0], start_s, end_s, n))
                start_s, end_s, n = s, s, 1
        if start_s is not None:
            state.update((start_s, end_s, n))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime([c[1] for c in closed], unit="s"),
                    "session_end": pd.to_datetime([c[2] for c in closed], unit="s"),
                    "n_events": [c[3] for c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame, gap_sec: int = 1800
) -> DataFrame:
    """CLOSED sessions per user from a streaming (user_id, ts) frame:
    a session closes when a later event arrives more than ``gap_sec``
    after its last event.  The open session per user rides in the state
    store (checkpoint-durable), so sessions spanning micro-batches and
    query restarts are assembled exactly once.

    Note: the final open session per user is emitted only when a
    newer event closes it — correct streaming semantics for an
    unbounded source (a batch flush would claim sessions that may
    still grow).
    """
    return (
        events.selectExpr("user_id", "cast(ts as timestamp) as ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _fn_factory(gap_sec),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
