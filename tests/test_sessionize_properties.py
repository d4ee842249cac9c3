"""Model-based property test for ``marker_sessions``
(streaming/sessionize.py): the gap-OR-terminal session rule replayed
by a sequential pure-Python walk and checked for exact output
equality on hypothesis-generated event sets.

The generated timestamps magnetize the two boundaries a fixed
scenario under-samples: inter-event gaps dead-on the 4-hour limit
(same session — the rule is strictly-greater) and sub-second parts
straddling a second boundary (the gap compares SECOND-TRUNCATED
epochs, so 3:59:59.9 → +4:00:00.2 crosses while fractional math says
it doesn't). Terminal events must close their OWN session, including
back-to-back terminals (one single-event session each).
"""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from dug_data_ingest_spark.streaming.sessionize import marker_sessions

_BASE = dt.datetime(2026, 3, 1, 0, 0, 0)
_GAP_S = 4 * 3600

# cumulative inter-event steps (µs): ordinary minutes, boundary
# magnets around the 4 h gap, and sub-second jitter
_STEP_US = st.one_of(
    st.integers(min_value=0, max_value=30 * 60).map(lambda s: s * 1_000_000),
    st.integers(
        min_value=_GAP_S * 1_000_000 - 2_000_000,
        max_value=_GAP_S * 1_000_000 + 2_000_000,
    ),
    st.integers(min_value=0, max_value=2_500_000),
)

_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),  # user_id
        st.sampled_from(["purchase", "click", "view"]),
        _STEP_US,
    ),
    min_size=1,
    max_size=12,
)


def _rows(raw):
    rows, clock = [], defaultdict(lambda: _BASE)
    for i, (uid, etype, step) in enumerate(raw):
        clock[uid] += dt.timedelta(microseconds=step)
        rows.append((i, uid, etype, clock[uid]))
    return rows


def _epoch_s(ts: dt.datetime) -> int:
    # second-truncated epoch, the unix_timestamp(ts) the engine compares
    return int(ts.replace(tzinfo=dt.timezone.utc).timestamp())


def _model(rows):
    by_user = defaultdict(list)
    for r in rows:
        by_user[r[1]].append(r)
    out = []
    for uid, evs in by_user.items():
        evs.sort(key=lambda r: (r[3], r[0]))
        sess = None
        prev = None
        for eid, _, etype, ts in evs:
            brk = (
                prev is None
                or _epoch_s(ts) - _epoch_s(prev[3]) > _GAP_S
                or prev[2] == "purchase"
            )
            if brk:
                if sess:
                    out.append(sess)
                sess = [uid, ts, 0, 0]
            sess[2] += 1
            sess[3] += etype == "purchase"
            prev = (eid, uid, etype, ts)
        out.append(sess)
    return sorted(
        (uid, start.strftime("%Y-%m-%d %H:%M:%S"), n, nt)
        for uid, start, n, nt in out
    )


@given(raw=_events)
@settings(max_examples=20, deadline=None)
def test_marker_sessions_match_sequential_walk(spark, raw):
    rows = _rows(raw)
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = sorted(
        (r.user_id, r.session_start, r.n_events, r.n_terminal)
        for r in marker_sessions(df).collect()
    )
    assert got == _model(rows)
