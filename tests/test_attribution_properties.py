"""Model-based property tests for the attribution-window family
(streaming/events.py): purchase_click_attribution (candidate pairs),
unattributed_purchases (the complement), and the last-touch winner —
all checked against one pure-Python model on hypothesis-generated
event sets.

The generated timestamps cluster within minutes of a base instant
with sub-second parts, so the cases a fixed scenario misses are
routine here: a click dead-on the 30-minute lookback edge (kept —
the bound is closed), a click at exactly the purchase instant
(dropped — strictly before), several clicks in the same second
(winner by µs then id), users with purchases only / clicks only, and
the pair/complement partition (every purchase is attributed XOR
unattributed).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from dug_data_ingest_spark.streaming.events import (
    purchase_click_attribution,
    unattributed_purchases,
)

_BASE = dt.datetime(2026, 3, 1, 12, 0, 0)
_LOOKBACK_US = 30 * 60 * 1_000_000

# offsets in µs spanning ±40 min with deliberate edge magnets
_EDGY_US = st.one_of(
    st.integers(min_value=-40 * 60, max_value=40 * 60).map(lambda s: s * 1_000_000),
    st.integers(min_value=-_LOOKBACK_US - 3, max_value=-_LOOKBACK_US + 3),
    st.integers(min_value=-3, max_value=3),
)

_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.sampled_from(["purchase", "click"]),
        _EDGY_US,
    ),
    min_size=1,
    max_size=14,
)


def _rows(raw):
    return [
        (i, uid, etype, _BASE + dt.timedelta(microseconds=off))
        for i, (uid, etype, off) in enumerate(raw)
    ]


def _model_pairs(rows):
    """(purchase_id, click_id, lag_sec) for clicks strictly before the
    purchase and at most 30 min older (closed lower edge)."""
    out = set()
    for pid, puid, pt, pts in rows:
        if pt != "purchase":
            continue
        for cid, cuid, ct, cts in rows:
            if ct != "click" or cuid != puid:
                continue
            lag_us = (pts - cts) // dt.timedelta(microseconds=1)
            if 0 < lag_us <= _LOOKBACK_US:
                out.add((pid, cid, lag_us // 1_000_000))
    return out


@given(raw=_events)
@settings(max_examples=20, deadline=None)
def test_attribution_family_matches_model(spark, raw):
    rows = _rows(raw)
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )

    expected = _model_pairs(rows)
    got = {
        (r.purchase_id, r.click_id, r.lag_sec)
        for r in purchase_click_attribution(df).collect()
    }
    assert got == expected

    # complement: exactly the purchases with no candidate click
    purchase_ids = {pid for pid, _, t, _ in rows if t == "purchase"}
    attributed = {p for p, _, _ in expected}
    gap = {r.purchase_id for r in unattributed_purchases(df).collect()}
    assert gap == purchase_ids - attributed

    # last-touch winner: µs-latest click, id tie-break (same reduction
    # events-last-touch registers; re-derived here on the raw pairs)
    by_ts = {eid: ts for eid, _, _, ts in rows}
    winners = {}
    for pid, cid, _ in expected:
        key = (by_ts[cid], cid)
        if pid not in winners or key > winners[pid][0]:
            winners[pid] = (key, cid)
    pairs = purchase_click_attribution(df, keep_click_ts=True)
    import pyspark.sql.functions as F

    got_w = {
        r.purchase_id: r.click_id
        for r in pairs.groupBy("purchase_id")
        .agg(
            F.max_by(
                "click_id",
                F.struct(F.col("c_ts").alias("k"), F.col("click_id").alias("t")),
            ).alias("click_id")
        )
        .collect()
    }
    assert got_w == {p: cid for p, (_, cid) in winners.items()}
