"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState (SURVEY.md §2.9 — 'applyInPandasWithState for
custom stateful operators').

Semantics match the batch q_sessionize closure exactly: events of a user
belong to one session while consecutive event gaps are ≤ `gap_s`; a larger
gap (or the first event) opens a new session. The streaming operator keys
state by user_id and carries (last_ts, session_count, events_in_user) so
arbitrarily many micro-batches compose to the same answer as one batch —
pinned by the batch-equivalence test (tests/test_streaming_sessions.py),
which feeds the same events in 1 batch and in K batches and requires
identical final (user_id, n_sessions, n_events) rows.

ARRIVAL-ORDER CONTRACT (ADVICE r2 #2): the operator assumes per-user
event-time-ORDERED arrival across micro-batches (a time-partitioned
file/kafka source); within one batch order is free (sorted internally).
A cross-batch regression (an event with ts < the saved last_ts) is
counted against last_ts, which can split or merge sessions differently
than the batch closure would after a global sort — for out-of-order
sources use event-time session windows with a watermark
(F.session_window + withWatermark) instead of this operator.

State size is O(active users). Eviction is OPT-IN via `state_timeout_ms`
(ProcessingTimeTimeout): users idle past the timeout are finalized and
evicted. Because eviction forgets the user, counts after a revival CANNOT
stay cumulative under the same output key — so every output row carries an
`epoch_start` (event-time seconds of the epoch's first event): the
update-mode sink keeps the latest row per (user_id, epoch_start), and the
user's cumulative totals are the SUM over that user's epochs. With
NoTimeout there is exactly one epoch per user and the row itself is the
cumulative total. (Round 2 emitted bare user_id rows, so a revived user's
fresh counts OVERWROTE the true totals — ADVICE r2 #2.) The default is
NoTimeout because a processing-time timer makes the query schedule timer
batches continuously, so `processAllAvailable()`-style drains (tests,
backfills) would never settle; continuous production queries should set
it (e.g. 2×gap) to bound state.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("epoch_start", T.DoubleType()),  # first event ts (epoch s)
    T.StructField("n_sessions", T.LongType()),
    T.StructField("n_events", T.LongType()),
])

_STATE = T.StructType([
    T.StructField("last_ts", T.DoubleType()),      # epoch seconds
    T.StructField("epoch_start", T.DoubleType()),
    T.StructField("n_sessions", T.LongType()),
    T.StructField("n_events", T.LongType()),
])


def _update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState,
            gap_s: float, state_timeout_ms: int | None
            ) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        last_ts, epoch_start, n_sessions, n_events = state.get
        state.remove()
        # final row of this epoch (same key the running rows used — the
        # sink's latest-per-(user,epoch) is already this value)
        yield pd.DataFrame({"user_id": [key[0]],
                            "epoch_start": [epoch_start],
                            "n_sessions": [n_sessions],
                            "n_events": [n_events]})
        return
    last_ts, epoch_start, n_sessions, n_events = (
        state.get if state.exists else (None, None, 0, 0))
    ts_all = pd.concat([p["ts"] for p in pdfs]).sort_values()
    for ts in ts_all:
        t = ts.timestamp()
        if epoch_start is None:
            epoch_start = t  # new epoch (first sight or post-eviction)
        if last_ts is None or t - last_ts > gap_s:
            n_sessions += 1
        last_ts = t
        n_events += 1
    state.update((float(last_ts), float(epoch_start),
                  int(n_sessions), int(n_events)))
    if state_timeout_ms is not None:
        state.setTimeoutDuration(state_timeout_ms)
    # emit the running totals (update-mode sink keeps the latest per key)
    yield pd.DataFrame({"user_id": [key[0]], "epoch_start": [epoch_start],
                        "n_sessions": [n_sessions], "n_events": [n_events]})


def sessionize_stream(events: DataFrame, gap_s: float = 1800.0,
                      state_timeout_ms: int | None = None) -> DataFrame:
    """events(ts timestamp, user_id long, ...) → running
    (user_id, epoch_start, n_sessions, n_events), state keyed per user;
    cumulative per-user totals = sum over the user's epochs (one epoch
    unless eviction is on — see module docstring).
    state_timeout_ms: enable idle-user eviction."""
    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        return _update(key, pdfs, state, gap_s, state_timeout_ms)

    timeout = (GroupStateTimeout.NoTimeout if state_timeout_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (events.select("user_id", "ts")
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, outputStructType=SESSION_OUT, stateStructType=_STATE,
                outputMode="update", timeoutConf=timeout))


def sessionize_batch_py(rows: list[tuple[Any, float]],
                        gap_s: float = 1800.0) -> dict[Any, tuple[int, int]]:
    """Pure-Python oracle: [(user_id, epoch_s)] → user_id →
    (n_sessions, n_events). Shared closure with q_sessionize."""
    by_user: dict[Any, list[float]] = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    out = {}
    for u, ts in by_user.items():
        ts.sort()
        n = 0
        last = None
        for t in ts:
            if last is None or t - last > gap_s:
                n += 1
            last = t
        out[u] = (n, len(ts))
    return out
