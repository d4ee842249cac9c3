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
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [
                        pd.Timestamp(start_us, unit="us").strftime("%Y-%m-%d %H:%M:%S")
                    ],
                    "n_events": [n],
                    "n_terminal": [n_term],
                }
            )
            return

        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        out = {"user_id": [], "session_start": [], "n_events": [], "n_terminal": []}
        if state.exists:
            start_us, last_us, n, n_term = state.get
        else:
            start_us = last_us = n = n_term = None

        def close():
            out["user_id"].append(user_id)
            out["session_start"].append(
                pd.Timestamp(start_us, unit="us").strftime("%Y-%m-%d %H:%M:%S")
            )
            out["n_events"].append(n)
            out["n_terminal"].append(n_term)

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
        yield pd.DataFrame(out)

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
