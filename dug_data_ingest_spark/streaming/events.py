"""Windowed event-stream operators.

Each transformation takes any events DataFrame (batch or streaming —
Spark's unified API executes the identical logical plan either way;
in streaming the watermark bounds state). Column contract:
``ts timestamp, user_id long, event_type string, value double``.

Scale notes: windowed aggs shuffle on (window, key) with map-side
partial aggregation; session windows shuffle on user_id; watermarks
cap state so a 100 TB/day stream holds only the open windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_watermark_if_streaming(df: DataFrame, delay: str = "1 hour") -> DataFrame:
    return df.withWatermark("ts", delay) if df.isStreaming else df


def tumbling_counts(events: DataFrame, width: str = "6 hours") -> DataFrame:
    """Per (tumbling window, event_type): count + value sum. The sum
    is over the EXACT 2-decimal value (dec_money): SUM(double) is
    order-dependent in the last bits, so the rounded total could
    differ between engines — or between two runs with different
    partitionings — when a window lands on a .xx5 boundary."""
    from dug_data_ingest_spark.queries import dec_money

    df = with_watermark_if_streaming(events)
    return (
        df.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec_money("value")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "6 hours", slide: str = "3 hours"
) -> DataFrame:
    """Per (sliding window, event_type) count — each event lands in
    width/slide windows."""
    df = with_watermark_if_streaming(events)
    return (
        df.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
            "n",
        )
    )


def session_counts(events: DataFrame, gap: str = "4 hours") -> DataFrame:
    """Per-user session windows (gap-merged): start + event count.

    In streaming this is F.session_window state; the batch plan is the
    same gaps-and-islands result, which the DuckDB oracle replays.
    """
    df = with_watermark_if_streaming(events)
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


def first_event_dedup(events: DataFrame) -> DataFrame:
    """Keep the first event per (user_id, event_type) — the batch
    equivalent of ``dropDuplicatesWithinWatermark`` on those keys,
    made deterministic with an explicit (ts, event_id) order."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        )
    )


def _attribution_pair_base(events: DataFrame, delay: str, lookback: str):
    """The shared (purchases, clicks, join condition) triple behind
    purchase_click_attribution and unattributed_purchases — ONE
    definition of the attribution window so the inner and left-outer
    reports can never silently diverge on its boundary semantics."""
    base = with_watermark_if_streaming(events, delay)
    purchases = base.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("p_ts"),
    )
    clicks = base.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_uid"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (F.col("p_uid") == F.col("c_uid"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return purchases, clicks, cond


def purchase_click_attribution(
    events: DataFrame, lookback: str = "30 minutes", delay: str = "1 hour",
    keep_click_ts: bool = False,
) -> DataFrame:
    """Stream-stream JOIN with watermarks: every (purchase, click) pair
    for the same user where the click precedes the purchase by at most
    ``lookback`` — last-touch attribution's candidate set.

    Batch and streaming run the identical logical plan (unified API).
    In streaming, both join inputs are branches of one watermarked
    source, and the join condition time-bounds the click against the
    purchase, which is exactly what lets Spark expire per-side join
    state: a buffered click older than watermark − lookback can never
    match a future purchase and is dropped, so state is O(rate ×
    (delay + lookback)) instead of unbounded. Inner joins emit pairs
    as soon as both sides arrive — nothing is withheld — so the
    streaming result equals the batch twin on a replayed file
    (asserted in tests/test_streaming.py).

    At 100 TB/day the join shuffles both sides on user_id; the range
    predicate evaluates inside each co-partitioned user group, never as
    a cross product (same shape as join-range-events)."""
    purchases, clicks, cond = _attribution_pair_base(events, delay, lookback)
    # microsecond-exact lag, floored to whole seconds with integer
    # arithmetic (unix_timestamp would floor each operand separately —
    # off by one whenever the click's sub-second part exceeds the
    # purchase's)
    cols = [
        F.col("purchase_id"),
        F.col("click_id"),
        F.expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000").alias(
            "lag_sec"
        ),
    ]
    if keep_click_ts:
        # µs-exact click time for downstream winner selection
        # (events-last-touch) — opt-in so the registered join slug's
        # schema stays unchanged
        cols.append(F.col("c_ts"))
    return purchases.join(clicks, cond).select(*cols)


def streaming_dedup(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """True streaming dedup: watermark-bounded state."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to TIMESTAMP whatever the
    on-disk encoding was:

    - TIMESTAMP(NANOS) parquet read with nanos-as-long → epoch-nanos
      BIGINT: rebuild with ``timestamp_micros(ts div 1000)``. `div`,
      not `/`: epoch-nanos (~1.7e18) exceed a double's 53-bit
      mantissa, so float division rounds the microsecond off by ±1 vs
      an exact ns→us truncation.
    - timestamp[us] without timezone → TIMESTAMP_NTZ: cast to
      TIMESTAMP. The session timezone is pinned to UTC (session.py),
      so the cast is value-identical to the epoch arithmetic above.
    - already TIMESTAMP: pass through.
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# Substrings identifying the one failure the nanos-as-long retry can
# fix: Spark's parquet schema converter rejecting TIMESTAMP(NANOS).
# Any other read failure (missing path, corrupt footer, permissions)
# must propagate untouched — blanket-retrying would leak a session-wide
# legacy conf that silently changes how every later nanos-typed parquet
# column is read.
_NANOS_ERR_MARKERS = ("TIMESTAMP(NANOS", "Illegal Parquet type")


def read_events_parquet(spark, path: str) -> DataFrame:
    """Batch-read an events parquet file under either historical ``ts``
    encoding (plain timestamp[us], or TIMESTAMP(NANOS) which Spark only
    reads with ``spark.sql.legacy.parquet.nanosAsLong``). The legacy
    conf is set only when the default read fails with the specific
    nanos schema-conversion error, and is rolled back if the retry
    fails too, so unrelated failures never leave it behind."""
    try:
        return spark.read.parquet(path)
    except Exception as e:
        if not any(m in str(e) for m in _NANOS_ERR_MARKERS):
            raise
        try:
            prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
        except Exception:
            prev = None
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            return spark.read.parquet(path)
        except Exception:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
            raise


def read_events_stream(spark, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (the landing-zone
    pattern: new files appear, the query incrementally processes
    them). A stream needs its schema up front, so probe the actual
    on-disk schema with a driver-side batch footer read, then apply
    the same ts normalization as the batch loader."""
    path = f"{sf_dir}/events.parquet"
    disk_schema = read_events_parquet(spark, path).schema
    raw = (
        spark.readStream.schema(disk_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_events_ts(raw)


def unattributed_purchases(
    events: DataFrame, lookback: str = "30 minutes", delay: str = "1 hour"
) -> DataFrame:
    """Stream-stream LEFT OUTER join with watermarks: purchases with NO
    click from the same user in the preceding ``lookback`` — the
    attribution gap report (paid-traffic purchases, broken tracking).

    Same join graph as purchase_click_attribution but left_outer, and
    that changes the streaming emission contract: a purchase's null row
    can only be emitted once the watermark passes the end of its match
    window (before that, a matching click could still arrive). So the
    stream result lags the batch twin by the watermark horizon — on a
    replayed finite file the purchases in the final delay+lookback
    stripe stay withheld. tests/test_streaming.py asserts exactly
    that: stream ⊆ batch, equality on the watermark-closed prefix.
    State stays O(rate × (delay + lookback)) per side, as for the
    inner join."""
    purchases, clicks, cond = _attribution_pair_base(events, delay, lookback)
    # "no match" keys on c_uid, not click_id: the join condition's
    # p_uid = c_uid equality is null-rejecting, so a MATCHED row always
    # carries a non-null c_uid — whereas a matched click whose event_id
    # happens to be NULL would leave click_id null and misreport the
    # purchase as unattributed (once per such click, duplicating it).
    return (
        purchases.join(clicks, cond, "left_outer")
        .filter(F.col("c_uid").isNull())
        .select(
            "purchase_id",
            F.col("p_uid").alias("user_id"),
            F.col("p_ts").alias("ts"),
        )
    )
