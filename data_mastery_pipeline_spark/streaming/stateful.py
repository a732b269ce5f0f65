"""Custom stateful streaming operator via ``applyInPandasWithState``.

The capability SURVEY §2.J marks ∅ in the reference: arbitrary per-key
state across micro-batches. Example operator: per-user sessionization —
counts 30-minute-gap sessions, carrying (last_ts, session_count,
event_count) as state between batches so a session spanning two
micro-batches is counted once.

Scale notes: state lives in the state store, partitioned by key — the
shuffle is on user_id, so one hot user is one hot partition (same skew
calculus as any keyed agg). The timeout (ProcessingTimeTimeout) is what
evicts idle keys; without it state grows monotonically.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_STATE = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, microseconds
# Evict a user's state after this much processing-time idleness. Any idle
# key past the session gap can be dropped without changing semantics: a
# later event would start a new session anyway, and (n_sessions, n_events)
# totals are emitted downstream each update. Kept > GAP_US so an in-flight
# session is never cut short by eviction.
STATE_TTL_MS = 60 * 60 * 1000  # 1 hour


def _make_sessionize(state_ttl_ms: int | None):
    """Build the per-group fold. ``state_ttl_ms`` None ⇒ no timer calls
    (required under NoTimeout, where setTimeoutDuration raises)."""

    def _sessionize(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Fold this batch's events for one user into the running state
        and emit the updated (n_sessions, n_events) row."""
        if state.hasTimedOut:
            # Idle-key eviction: emit the final totals once and drop the
            # state so an unbounded user-id stream has bounded state.
            last_ts, n_sessions, n_events = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_sessions": [n_sessions],
                    "n_events": [n_events],
                }
            )
            return
        last_ts, n_sessions, n_events = (
            state.get if state.exists else (None, 0, 0)
        )
        ts_all = []
        for pdf in pdfs:
            # Drop null timestamps BEFORE the int cast (review r6, 11th
            # pass — verified on pandas 2.2.2): NaT.astype('int64')
            # silently yields the int64 MIN sentinel, which would count
            # a phantom session at t≈−9.2e18 µs AND make the next real
            # event open yet another session. A null event time carries
            # no session information; it contributes nothing.
            col = pdf["ts"].dropna()
            # ns→µs ints: avoids float rounding for comparisons below.
            ts_all.append(col.astype("int64") // 1000)
        ts = (
            pd.concat(ts_all).sort_values()
            if ts_all
            else pd.Series([], dtype="int64")
        )
        for t in ts:
            t = int(t)
            if last_ts is not None and t < last_ts:
                # LATE event (older than state): arrival order crossed
                # micro-batches (review r6, 11th pass). Folding it
                # forward would regress last_ts and merge sessions a
                # true event-time order separates; with no watermarked
                # buffer in this operator the principled cheap choice is
                # count-the-event, keep-the-frontier: n_events stays
                # exact, n_sessions is a LOWER bound under disorder
                # (the documented contract; session_window with a
                # watermark is the exact-under-lateness operator).
                n_events += 1
                continue
            if last_ts is None or t - last_ts > GAP_US:
                n_sessions += 1
            last_ts = t
            n_events += 1
        state.update((last_ts, n_sessions, n_events))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return _sessionize


def sessionize_users(
    df: DataFrame, state_ttl_ms: int | None = STATE_TTL_MS
) -> DataFrame:
    """Per-user session/event counters with cross-batch state.

    Update-mode semantics: one row per (user, micro-batch) carrying the
    state as of that batch; the final batch's row per user is the total.

    Ordering contract: events are sorted WITHIN each batch; ACROSS
    batches the fold keeps a monotone frontier — an event older than
    the stored last_ts (a replay / out-of-order delivery) is counted in
    n_events but cannot regress the frontier or open a session, so
    n_events is exact and n_sessions is a lower bound under disorder.
    Null event times are dropped (they carry no session information).
    For exact session semantics under late data use the engine's
    watermarked ``session_window`` (streaming/windows.py) instead.

    ``state_ttl_ms`` bounds state on an unbounded user-id stream: idle
    keys are evicted by a processing-time timer (their final totals
    emitted once on eviction). Pass ``None`` to disable timers — REQUIRED
    for finite ``availableNow`` drains (tests, backfills): processing-time
    timers keep scheduling empty timeout micro-batches, so the drain never
    terminates (measured: batchId grows forever at 0 input rows). A
    continuous production stream keeps the default.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return df.groupBy("user_id").applyInPandasWithState(
        _make_sessionize(state_ttl_ms),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="update",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# transformWithState twin (r10): the same per-user session fold on
# Spark 4's StatefulProcessor API — the successor surface to
# applyInPandasWithState, with NAMED state primitives (value/list/map
# state with per-state TTL), timers decoupled from state, and a
# lifecycle (init/close). Requires the RocksDB state-store provider
# (streaming/core.py::rocksdb_state); the HDFS-backed default provider
# rejects transformWithState queries at start.
#
# Semantics are kept IDENTICAL to sessionize_users (same monotone
# frontier, same null/late-event contract), so both operators share
# one oracle — the cheapest possible proof that the old and new API
# surfaces compute the same thing.
# ---------------------------------------------------------------------------


def make_session_processor():
    """Build the StatefulProcessor class lazily (the import lives in
    pyspark.sql.streaming.stateful_processor, present since 4.0; the
    deferral keeps this module importable if the surface moves)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SessionProcessor(StatefulProcessor):
        """Per-user (last_ts_us, n_sessions, n_events) fold, one
        ValueState per key. NO TTL is configured here: per-state TTL on
        this API (getValueState(ttlDurationMs=...)) requires a
        time-mode the operator runs without (timeMode="None" — the
        finite-drain configuration), and the environment block means a
        TTL'd configuration could not be exercised by any test in this
        container. A production deployment on a continuous stream
        should declare the TTL at getValueState AND run with
        timeMode="ProcessingTime" — the API-level win over
        applyInPandasWithState, where eviction needs explicit per-key
        timer handling inside the fold."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "sess",
                "last_ts_us LONG, n_sessions LONG, n_events LONG",
            )

        def handleInputRows(self, key, rows, timerValues):
            exists = self._state.exists()
            last_ts, n_sessions, n_events = (
                self._state.get() if exists else (None, 0, 0)
            )
            ts_all = []
            for pdf in rows:
                # same null contract as sessionize_users: NaT carries no
                # session information and must not reach the int cast
                col = pdf["ts"].dropna()
                ts_all.append(col.astype("int64") // 1000)
            ts = (
                pd.concat(ts_all).sort_values()
                if ts_all
                else pd.Series([], dtype="int64")
            )
            for t in ts:
                t = int(t)
                if last_ts is not None and t < last_ts:
                    # late event: count it, never regress the frontier
                    n_events += 1
                    continue
                if last_ts is None or t - last_ts > GAP_US:
                    n_sessions += 1
                last_ts = t
                n_events += 1
            self._state.update((last_ts, n_sessions, n_events))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_sessions": [n_sessions],
                    "n_events": [n_events],
                }
            )

        def close(self) -> None:
            pass

    return SessionProcessor


def sessionize_users_tws(df: DataFrame) -> DataFrame:
    """transformWithStateInPandas form of :func:`sessionize_users` —
    identical output contract (update-mode row per (user, batch); the
    final batch's row per user is the total). Start the query inside
    ``core.rocksdb_state`` — the operator requires the RocksDB
    provider.

    ENVIRONMENT-BLOCKED in this container (the multimodal-decoder
    class of gap): transformWithState's state server speaks protobuf
    between the JVM and the Python driver worker, and ``google.protobuf``
    is not installed here (and installs are off-limits) — the stream
    would die at start with an opaque "driver worker exited
    unexpectedly". The precondition below turns that into a clear
    error; on a cluster with protobuf present the operator runs as
    written (the full drain is covered by a skipif-gated test)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas needs the protobuf package for "
            "its JVM<->Python state-server protocol; it is not installed "
            "in this container (pip installs are off-limits). Use "
            "sessionize_users (applyInPandasWithState) — identical "
            "semantics — or run on an environment with protobuf."
        ) from e
    cls = make_session_processor()
    return df.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=cls(),
        outputStructType=SESSION_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )
