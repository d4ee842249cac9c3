"""Engine agreement on NULL-bearing events data for the two slugs
whose round-8 review found latent cross-engine divergence: the driver
compare (Spark query vs DuckDB oracle on the same parquet) replayed on
a synthetic events table that contains what the shipped testdata
currently lacks — NULL prices and a NULL event_type.

- ts-resample-ohlc: DuckDB's arg_min/arg_max SKIP NULL-argument rows;
  Spark's min_by/max_by return the NULL value. The query now
  aggregates min/max over a (ordkey, value) struct that is NULL when
  the value is NULL, so both engines open/close on the earliest/latest
  NON-NULL price.
- agg-sketch-rollup: groupBy (and the oracle's GROUP BY) emit a NULL
  event_type group, but a plain equi-join between the exact and sketch
  rollups would drop it; the join is now null-safe.
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
import pytest


def _events_with_nulls(tmp_path) -> str:
    """Write a tiny events.parquet whose FIRST and LAST ticks of one
    bucket carry NULL values, plus a NULL event_type row."""
    base = datetime.datetime(2025, 1, 1, 0, 0, 0)
    rows = [
        # one 15-min bucket of type 'a': NULL open and close candidates
        (1, base + datetime.timedelta(seconds=0), 10, "a", None, "{}"),
        (2, base + datetime.timedelta(seconds=60), 11, "a", 5.0, "{}"),
        (3, base + datetime.timedelta(seconds=120), 12, "a", 7.5, "{}"),
        (4, base + datetime.timedelta(seconds=180), 10, "a", None, "{}"),
        # same-second tie inside the bucket: event_id breaks it
        (5, base + datetime.timedelta(seconds=60), 13, "a", 6.0, "{}"),
        # a NULL event_type group with two users
        (6, base + datetime.timedelta(seconds=30), 20, None, 1.0, "{}"),
        (7, base + datetime.timedelta(seconds=90), 21, None, 2.0, "{}"),
        # an all-NULL-value bucket: open/close NULL in both engines
        (8, base + datetime.timedelta(seconds=1000), 30, "b", None, "{}"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


def _norm(df):
    cols = sorted(df.columns)
    return sorted(map(repr, df[cols].itertuples(index=False, name=None)))


@pytest.mark.parametrize(
    "slug",
    [
        "ts-resample-ohlc",
        "agg-sketch-rollup",
        # graded this round with the exact-decimal value sum: NULL
        # values must be skipped identically by both engines' sums and
        # an all-NULL bucket must sum to NULL on both sides
        "stream-tumbling-agg",
    ],
)
def test_null_events_grade_identically(spark, tmp_path, slug):
    from dug_data_ingest_spark.queries import all_oracles, all_queries

    sf_dir = _events_with_nulls(tmp_path)
    sp = all_queries()[slug](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    du = con.sql(all_oracles()[slug]).df()
    assert len(sp) == len(du) and len(sp) > 0
    assert _norm(sp) == _norm(du)
    if slug == "agg-sketch-rollup":
        # the NULL event_type group must be PRESENT (the old equi-join
        # silently dropped it)
        assert sp["event_type"].isna().any()
    elif slug == "stream-tumbling-agg":
        # NULL values are skipped by both engines' sums; the all-NULL
        # bucket 'b' sums to NULL on both sides
        b = sp[sp["event_type"] == "b"].iloc[0]
        assert pd.isna(b["total_value"]) and b["n"] == 1
    else:
        # type-a bucket: open is the earliest NON-NULL price (5.0 at
        # t=60 with event_id tiebreak), close the latest (7.5 at
        # t=120) — not the NULL ticks at the bucket edges
        a = sp[sp["event_type"] == "a"].iloc[0]
        assert a["open"] == 5.0 and a["close"] == 7.5
        # all-NULL bucket stays NULL in both engines
        b = sp[sp["event_type"] == "b"].iloc[0]
        assert pd.isna(b["open"]) and pd.isna(b["close"])


def _events_null_type_ties(tmp_path) -> str:
    """Events where a NULL event_type TIES a real type per user — the
    argmax/struct-max corner (Spark orders a NULL struct field
    smallest; DuckDB's QUALIFY ... DESC puts NULLs last) — plus
    multi-day NULL-type activity for the transition/cume rewrites."""
    base = datetime.datetime(2025, 1, 1, 0, 0, 0)
    day = datetime.timedelta(days=1)
    rows = [
        # user 1: NULL type x2 ties 'a' x2 — the tie NULL must lose in
        # BOTH engines; 'b' x1 trails
        (11, base, 1, None, 1.0, "{}"),
        (12, base + day, 1, None, 1.0, "{}"),
        (13, base, 1, "a", 1.0, "{}"),
        (14, base + day, 1, "a", 1.0, "{}"),
        (15, base + 2 * day, 1, "b", 1.0, "{}"),
        # user 2: NULL type strictly wins the mode
        (21, base, 2, None, 1.0, "{}"),
        (22, base + day, 2, None, 1.0, "{}"),
        (23, base, 2, "a", 1.0, "{}"),
        # user 3: same-timestamp tie between NULL and 'a' (event_id
        # breaks transition chains)
        (31, base, 3, None, 1.0, "{}"),
        (32, base, 3, "a", 1.0, "{}"),
        (33, base + day, 3, "a", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


@pytest.mark.parametrize(
    "slug",
    [
        "agg-mode-per-group",
        "events-path-transitions",
        "win-cume-distinct",
        # round-8-window regrades over the same table: NULL types must
        # form a group (windowed aggs) / a dedup partition identically
        "stream-sliding-agg",
        "stream-dedup-first",
        "stream-session-window",
    ],
)
def test_null_type_ties_grade_identically(spark, tmp_path, slug):
    from dug_data_ingest_spark.queries import all_oracles, all_queries

    sf_dir = _events_null_type_ties(tmp_path)
    sp = all_queries()[slug](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    du = con.sql(all_oracles()[slug]).df()
    assert len(sp) == len(du) and len(sp) > 0
    assert _norm(sp) == _norm(du)
    if slug == "agg-mode-per-group":
        by_user = {r["user_id"]: r for _, r in sp.iterrows()}
        # tie: NULL loses to 'a' in both engines (struct-max NULL-
        # smallest == QUALIFY DESC NULLS LAST)
        assert by_user[1]["mode_type"] == "a"
        # strict winner: the NULL-type mode must be REPRESENTED, not
        # silently replaced by the runner-up
        assert pd.isna(by_user[2]["mode_type"]) and by_user[2]["mode_n"] == 2
