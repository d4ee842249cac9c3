"""Streaming-extension slugs (SURVEY.md §2.9), run in batch mode over
the events table so DuckDB can oracle them. The identical
transformations run as true Structured Streaming queries in
tests/test_streaming.py (file-source → memory sink) — Spark's unified
API guarantees the same logical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dug_data_ingest_spark.queries import load, query
from dug_data_ingest_spark.streaming.events import (
    first_event_dedup,
    purchase_click_attribution,
    unattributed_purchases,
    session_counts,
    sliding_counts,
    tumbling_counts,
)


@query(
    "stream-tumbling-agg",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '6 hours', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
           event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load(spark, sf_dir, "events"), width="6 hours")


@query(
    "stream-sliding-agg",
    oracle="""
    WITH shifted AS (
      SELECT event_type,
             unnest([time_bucket(INTERVAL '3 hours', ts),
                     time_bucket(INTERVAL '3 hours', ts) - INTERVAL '3 hours'])
               AS w_start_ts
      FROM events
    )
    SELECT strftime(w_start_ts, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM shifted GROUP BY 1, 2
    """,
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # width 6h / slide 3h → every event is in exactly 2 windows: the
    # one starting at its 3h bucket and the one 3h earlier (what the
    # oracle's unnest replays).
    return sliding_counts(load(spark, sf_dir, "events"), width="6 hours", slide="3 hours")


@query(
    "stream-session-window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL '4 hours'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    islands AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM islands GROUP BY user_id, session_no
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_counts(load(spark, sf_dir, "events"), gap="4 hours")


@query(
    "stream-dedup-first",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) = 1
    """,
)
def stream_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    return first_event_dedup(load(spark, sf_dir, "events"))


@query(
    "stream-stream-join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS lag_sec
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join, batch twin (the missing
    streaming class per VERDICT r5): purchase×click attribution pairs
    within a 30-minute lookback. The true-stream run and its
    batch-equality assertion live in tests/test_streaming.py."""
    return purchase_click_attribution(load(spark, sf_dir, "events"))


@query(
    "stream-marker-sessionize",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             lag(ts) OVER w AS prev_ts,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR date_diff('second', prev_ts, ts) > 14400
                       OR prev_type = 'purchase'
                     THEN 1 ELSE 0 END AS brk
      FROM ordered
    ),
    islands AS (
      SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess
      FROM flagged
    )
    SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_terminal
    FROM islands GROUP BY user_id, sess
    """,
)
def stream_marker_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-based sessions (close on gap OR terminal event) — the
    custom stateful operator's batch twin; the streaming
    applyInPandasWithState implementation is exercised in
    tests/test_streaming.py."""
    from dug_data_ingest_spark.streaming.sessionize import marker_sessions

    return marker_sessions(load(spark, sf_dir, "events"))


@query(
    "stream-stream-left-outer",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts
    FROM events p
    WHERE p.event_type = 'purchase'
      AND NOT EXISTS (
        SELECT 1 FROM events c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
      )
    """,
)
def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer watermarked stream-stream join, batch twin: the
    attribution GAP (purchases with no preceding click in 30 min).
    Streaming emission semantics — null rows withheld until the
    watermark closes the match window — are asserted against this
    batch twin in tests/test_streaming.py."""
    return unattributed_purchases(load(spark, sf_dir, "events"))


@query(
    "events-last-touch",
    oracle="""
    WITH pairs AS (
      SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             c.ts AS c_ts
      FROM events p JOIN events c
        ON c.user_id = p.user_id
       AND p.event_type = 'purchase' AND c.event_type = 'click'
       AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE)
    SELECT purchase_id, click_id, n_candidates FROM (
      SELECT purchase_id, click_id,
             row_number() OVER (PARTITION BY purchase_id
                                ORDER BY c_ts DESC, click_id DESC) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT)
               AS n_candidates
      FROM pairs) WHERE rn = 1
    """,
)
def events_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH attribution: the stream-stream-join candidate pairs
    reduced to one winning click per purchase — the attribution model
    itself, not just its candidate set. The winner is an argmax
    AGGREGATE — max_by on the µs-exact click timestamp (click_id
    tie-break for identical timestamps) — so assignment adds ONE keyed
    aggregation to the join: no rank window, no second scan. The µs
    timestamp comes from the shared join's opt-in keep_click_ts column
    (the floored lag_sec would tie clicks landing in the same second
    and mis-pick against the oracle's exact ordering)."""
    pairs = purchase_click_attribution(
        load(spark, sf_dir, "events"), keep_click_ts=True
    )
    return pairs.groupBy("purchase_id").agg(
        F.max_by(
            "click_id", F.struct(F.col("c_ts").alias("k"), F.col("click_id").alias("t"))
        ).alias("click_id"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
