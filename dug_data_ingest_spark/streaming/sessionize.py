"""Marker-based sessionization — a custom stateful operator.

``F.session_window`` merges purely on time gaps; these sessions ALSO
close on an explicit terminal event (e.g. ``purchase``), which no
built-in window expresses. Two implementations of the same semantics:

- ``marker_sessions`` (batch): gaps-and-islands with lag + running
  sum — one window shuffle on user_id, whole-stage codegen, SQL-
  expressible (DuckDB oracle replays it).
- ``marker_sessions_stream`` (streaming): ``applyInPandasWithState``
  with event-time timeout — per-user state is (start, last_ts, n,
  n_terminal), bounded by the watermark horizon, so state size is
  O(active users), not O(events).

Session rule: a new session starts at the first event, after an
inter-event gap > ``gap``, or after a terminal event (the terminal
event closes its own session).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_terminal", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("n_terminal", T.LongType()),
    ]
)


def _gap_seconds(gap: str) -> int:
    qty, unit = gap.split()
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[unit.rstrip("s")]
    return int(qty) * mult


def marker_sessions(
    events: DataFrame, gap: str = "4 hours", terminal: str = "purchase"
) -> DataFrame:
    """Batch twin: lag-based break detection + running-sum session id.

    One shuffle (the user_id window); the session aggregation reuses
    the same partitioning so AQE plans it shuffle-free.
    """
    gap_s = _gap_seconds(gap)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    prev_type = F.lag("event_type").over(w)
    is_break = (
        prev_ts.isNull()
        # gap semantics: SECOND-BOUNDARY CROSSINGS (each operand
        # truncates to whole seconds), matching the oracle's
        # date_diff('second', ...) — not the fractional difference,
        # which would break one boundary-second earlier
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > gap_s)
        | (prev_type == terminal)
    )
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    with_sess = events.withColumn("__sess", F.sum(is_break.cast("long")).over(run))
    return (
        with_sess.groupBy("user_id", "__sess")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count("*").alias("n_events"),
            F.sum((F.col("event_type") == terminal).cast("long")).alias("n_terminal"),
        )
        .select("user_id", "session_start", "n_events", "n_terminal")
    )


def marker_sessions_stream(
    events: DataFrame, gap: str = "4 hours", terminal: str = "purchase"
) -> DataFrame:
    """Streaming implementation over ``applyInPandasWithState``.

    Emits a session row when the session closes (terminal event, gap
    break seen in-stream, or event-time timeout at watermark + gap).
    The pandas batch is sorted in-task; state carries only the open
    session's counters.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = _gap_seconds(gap) * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, _last, n, n_term = state.get
            state.remove()
            yield _session_row(user_id, start_us, n, n_term)
            return

        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        # single source of truth for the output row shape: _session_row
        # (shared with the transformWithStateInPandas twin)
        out: list[pd.DataFrame] = []
        if state.exists:
            start_us, last_us, n, n_term = state.get
        else:
            start_us = last_us = n = n_term = None

        def close():
            out.append(_session_row(user_id, start_us, n, n_term))

        for row in rows.itertuples(index=False):
            ts_us = int(row.ts.value // 1000)  # pandas ns → µs
            # gap semantics: SECOND-BOUNDARY CROSSINGS, matching the
            # batch twin's unix_timestamp difference and the oracle's
            # date_diff('second', ...) — a µs-exact comparison would
            # close sessions one boundary-second earlier than both
            if (
                start_us is not None
                and ts_us // 1_000_000 - last_us // 1_000_000 > gap_us // 1_000_000
            ):
                close()
                start_us = None
            if start_us is None:
                start_us, n, n_term = ts_us, 0, 0
            last_us = ts_us
            n += 1
            if row.event_type == terminal:
                n_term += 1
                close()
                start_us = None
        if start_us is not None:
            state.update((start_us, last_us, n, n_term))
            state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        else:
            state.remove()
        if out:
            yield pd.concat(out)

    return (
        events.withWatermark("ts", gap)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )




def _session_row(user_id, start_us, n, n_term) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [
                pd.Timestamp(start_us, unit="us").strftime("%Y-%m-%d %H:%M:%S")
            ],
            "n_events": [n],
            "n_terminal": [n_term],
        }
    )


def make_marker_session_processor(gap: str = "4 hours", terminal: str = "purchase"):
    """Build the StatefulProcessor behind ``marker_sessions_tws``.

    Module-level factory (not a closure inside the operator) so the
    processor's session-walk SEMANTICS are unit-testable against the
    batch twin with a fake state handle — necessary because executing
    transformWithStateInPandas requires protobuf (Spark's TWS
    state-server wire protocol), which not every runtime ships; the
    semantics tests run everywhere, the wire-protocol equivalence
    test gates on the import (tests/test_streaming.py).
    """
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    gap_us = _gap_seconds(gap) * 1_000_000

    class _MarkerSessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._open = handle.getValueState(
                "open_session",
                "start_us long, last_us long, n long, n_terminal long",
            )

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            (user_id,) = key
            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            if self._open.exists():
                start_us, last_us, n, n_term = self._open.get()
            else:
                start_us = last_us = n = n_term = None
            out = []
            for row in pdf.itertuples(index=False):
                ts_us = int(row.ts.value // 1000)  # pandas ns -> us
                # gap rule: SECOND-BOUNDARY crossings (batch-twin and
                # oracle semantics — see marker_sessions_stream)
                if (
                    start_us is not None
                    and ts_us // 1_000_000 - last_us // 1_000_000
                    > gap_us // 1_000_000
                ):
                    out.append(_session_row(user_id, start_us, n, n_term))
                    start_us = None
                if start_us is None:
                    start_us, n, n_term = ts_us, 0, 0
                last_us = ts_us
                n += 1
                if row.event_type == terminal:
                    n_term += 1
                    out.append(_session_row(user_id, start_us, n, n_term))
                    start_us = None
            # at most one live timer per user: drop stale ones before
            # arming the trailing-session timeout
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            if start_us is not None:
                self._open.update((start_us, last_us, n, n_term))
                self._handle.registerTimer(last_us // 1000 + gap_us // 1000)
            else:
                self._open.clear()
            if out:
                yield pd.concat(out)

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ):
            if self._open.exists():
                start_us, _last, n, n_term = self._open.get()
                self._open.clear()
                (user_id,) = key
                yield _session_row(user_id, start_us, n, n_term)

        def close(self) -> None:
            pass

    return _MarkerSessionProcessor()


def marker_sessions_tws(
    events: DataFrame, gap: str = "4 hours", terminal: str = "purchase"
) -> DataFrame:
    """Same semantics on ``transformWithStateInPandas`` — Spark 4's
    StatefulProcessor API (the successor to applyInPandasWithState:
    named state variables, explicit event-time timers, initial-state
    support). Kept alongside the classic implementation so both
    stateful-operator surfaces stay exercised; both are held to the
    same ``marker_sessions`` batch ground truth.

    State is one ValueState row per open session (bounded by active
    users); a timer at last_event + gap closes the trailing session
    when the watermark passes it. Runtime note: executing this
    operator needs the ``protobuf`` package (the TWS state-server
    wire protocol) — plan construction does not.
    """
    return (
        events.withWatermark("ts", gap)
        .groupBy("user_id")
        .transformWithStateInPandas(
            make_marker_session_processor(gap, terminal),
            outputStructType=SESSION_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
