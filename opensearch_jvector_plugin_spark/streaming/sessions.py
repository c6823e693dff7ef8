"""Stateful streaming sessionization — applyInPandasWithState.

The custom-stateful-operator surface of Structured Streaming (SURVEY
§2.9): the streaming twin of the batch `sessionize` query (30-minute-gap
sessions over the events table), with per-user session state carried
across micro-batches in the state store instead of a whole-corpus window.

Per user the state holds ONLY the open session (5 scalars), so state size
is O(active users), not O(events) — the property that lets this run
against an unbounded stream. Each micro-batch emits:

- one row per session CLOSED by this batch's events (`closed = true`,
  final aggregates), and
- one snapshot row for the still-open session (`closed = false`,
  aggregates so far) — the "update" output mode contract: downstream
  sinks upsert on (user_id, session_id).

Session numbering matches the batch operator: 1-based per user,
incremented when an event arrives more than `gap_s` after the open
session's last event. Events are processed in (ts, event_id) order within
each batch; cross-batch order is the stream's arrival order (the standard
at-least-once streaming caveat — an event-time watermark variant would
trade latency for reordering tolerance).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

OUT_SCHEMA = (
    "user_id LONG, session_id LONG, n_events LONG, t_start LONG, "
    "t_end LONG, sum_value DOUBLE, closed BOOLEAN"
)
STATE_SCHEMA = (
    "session_id LONG, t_start LONG, t_end LONG, n_events LONG, "
    "sum_value DOUBLE"
)


def _session_kernel(gap_s: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        ev = pd.concat(list(pdfs), ignore_index=True)
        if not len(ev):
            return
        # Pin the unit: parquet/Arrow round-trips may surface datetime64[us]
        # (pandas 2.x), where a bare astype('int64') would yield
        # microseconds and shrink every epoch second 1000x.
        ts = (
            ev["ts"].astype("datetime64[ns]").astype("int64") // 10**9
        ).to_numpy()
        order = ev.assign(_t=ts).sort_values(["_t", "event_id"]).index
        out: list[tuple] = []
        if state.exists:
            sid, t0, t1, n, sv = state.get
        else:
            sid, t0, t1, n, sv = 0, 0, 0, 0, 0.0
        for i in order:
            t = int(ts[i])
            v = float(ev["value"].iloc[i])
            if n == 0:
                sid, t0, t1, n, sv = sid + 1, t, t, 1, v
            elif t - t1 > gap_s:
                out.append((user_id, sid, n, t0, t1, sv, True))
                sid, t0, t1, n, sv = sid + 1, t, t, 1, v
            else:
                t1, n, sv = t, n + 1, sv + v
        state.update((int(sid), int(t0), int(t1), int(n), float(sv)))
        out.append((user_id, sid, n, t0, t1, sv, False))
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "session_id", "n_events", "t_start", "t_end",
                "sum_value", "closed",
            ],
        )

    return fn


def sessionize_stream(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Streaming DataFrame of session updates/closures (OUT_SCHEMA) from a
    streaming `events` relation with (user_id, event_id, ts, value).
    Output mode: update."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_kernel(int(gap_s)),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
