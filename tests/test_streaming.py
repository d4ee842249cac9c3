"""True Structured Streaming runs of the windowed operators
(file source → memory sink, processAllAvailable) checked against the
batch plans — the unified-API guarantee, observed.
"""

from __future__ import annotations

import pytest

from dug_data_ingest_spark.queries import load
from dug_data_ingest_spark.streaming.events import (
    read_events_stream,
    streaming_dedup,
    tumbling_counts,
)
from tests.conftest import TEST_SF_DIR


def _run_stream(df, name: str):
    q = (
        df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_checkpointed_restart_is_exactly_once(spark, tmp_path):
    # The landing-zone restart property a recurring ingest depends on:
    # stop the query, new files land, restart with the SAME checkpoint
    # — every input file contributes exactly once (the source tracks
    # processed files in the checkpoint, the parquet sink commits via
    # its _spark_metadata transaction log), and an idle restart
    # appends nothing.
    import pyspark.sql.functions as F

    inp, out, cp = (str(tmp_path / d) for d in ("in", "out", "cp"))

    def land(tag: str) -> None:
        spark.range(0, 100).select(
            "id", F.lit(tag).alias("tag")
        ).write.mode("append").parquet(inp)

    def drain() -> None:
        q = (
            spark.readStream.schema("id long, tag string")
            .parquet(inp)
            .writeStream.format("parquet")
            .option("checkpointLocation", cp)
            .option("path", out)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    land("b1")
    drain()
    land("b2")
    drain()  # restart from checkpoint: must pick up ONLY b2
    drain()  # idle restart: must append nothing
    got = (
        spark.read.parquet(out)
        .groupBy("tag")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert {r.tag: r.n for r in got} == {"b1": 100, "b2": 100}


def test_tumbling_stream_matches_batch(spark):
    stream = read_events_stream(spark, TEST_SF_DIR)
    _run_stream(tumbling_counts(stream), "tumbling_out")
    got = {
        (r.w_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    want = {
        (r.w_start, r.event_type): (r.n, r.total_value)
        for r in tumbling_counts(load(spark, TEST_SF_DIR, "events")).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_dedup_bounds_state(spark):
    stream = read_events_stream(spark, TEST_SF_DIR)
    deduped = streaming_dedup(stream)
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n = spark.sql("SELECT COUNT(*) AS n FROM dedup_out").collect()[0].n
    total = load(spark, TEST_SF_DIR, "events").count()
    distinct = (
        load(spark, TEST_SF_DIR, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    # watermark-bounded dedup keeps at least the distinct keys and
    # never more than the input
    assert distinct <= n <= total


def test_session_window_streaming_runs(spark):
    from dug_data_ingest_spark.streaming.events import session_counts

    stream = read_events_stream(spark, TEST_SF_DIR)
    _run_stream(session_counts(stream), "session_out")
    n = spark.sql("SELECT COUNT(*) AS n FROM session_out").collect()[0].n
    assert n > 0


def test_marker_sessionize_stream_matches_batch_closed_sessions(spark):
    """The applyInPandasWithState sessions equal the batch twin's for
    every session the stream can close (terminal event or in-stream
    gap); only each user's trailing open session may be withheld
    pending the event-time timeout."""
    from dug_data_ingest_spark.streaming.sessionize import (
        marker_sessions,
        marker_sessions_stream,
    )

    stream = read_events_stream(spark, TEST_SF_DIR)
    q = (
        marker_sessions_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.session_start): (r.n_events, r.n_terminal)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    batch = marker_sessions(load(spark, TEST_SF_DIR, "events")).collect()
    want = {
        (r.user_id, r.session_start): (r.n_events, r.n_terminal) for r in batch
    }
    assert len(got) > 0
    # every emitted session matches the batch result exactly
    for k, v in got.items():
        assert want.get(k) == v, (k, v, want.get(k))
    # and nothing beyond one trailing session per user is missing
    missing = set(want) - set(got)
    users = {u for u, _ in missing}
    assert len(missing) == len(users), f"non-trailing sessions missing: {missing}"


def test_stream_stream_join_matches_batch(spark):
    """Watermarked stream-stream inner join: pairs are emitted as both
    sides arrive (nothing withheld), so replaying the events file
    through the stream must produce EXACTLY the batch twin's pairs."""
    from dug_data_ingest_spark.streaming.events import (
        purchase_click_attribution,
    )

    stream = read_events_stream(spark, TEST_SF_DIR)
    q = (
        purchase_click_attribution(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.purchase_id, r.click_id, r.lag_sec)
        for r in spark.sql("SELECT * FROM attrib_out").collect()
    }
    want = {
        (r.purchase_id, r.click_id, r.lag_sec)
        for r in purchase_click_attribution(
            load(spark, TEST_SF_DIR, "events")
        ).collect()
    }
    assert got == want and len(got) > 0


def test_curation_sampling_works_on_streams(spark):
    """hash_sample / mix_sample are stateless row-local transforms, so
    the same functions drop onto a readStream unchanged (the unified
    API) — a streaming ingest can apply the training-mix recipe
    file-by-file as data lands, keeping exactly the batch-selected
    rows."""
    from pyspark.sql import types as T

    from dug_data_ingest_spark.ext.curation import hash_sample, mix_sample

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(TEST_SF_DIR)
    )
    weights = spark.createDataFrame([("en", 50), ("es", 25)], ["lang", "pct"])
    q = (
        mix_sample(hash_sample(stream, 60).drop("bucket"), weights)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("mix_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id for r in spark.sql("SELECT doc_id FROM mix_out").collect()}
    batch = load(spark, TEST_SF_DIR, "documents")
    want = {
        r.doc_id
        for r in mix_sample(
            hash_sample(batch, 60).drop("bucket"), weights
        ).collect()
    }
    assert got == want and len(got) > 0


def test_unattributed_detection_is_null_safe(spark):
    # a matching click whose event_id is NULL must still attribute the
    # purchase (the old click_id-IS-NULL detection misread it as
    # no-match); an actually-unmatched purchase reports exactly once
    from dug_data_ingest_spark.streaming.events import (
        unattributed_purchases,
    )

    rows = [
        (None, 1, "click", "2024-01-01 10:00:00"),   # NULL-id click
        (100, 1, "purchase", "2024-01-01 10:10:00"),  # attributed by it
        (200, 2, "purchase", "2024-01-01 10:10:00"),  # no click at all
    ]
    from pyspark.sql import functions as F

    events = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = unattributed_purchases(events).collect()
    assert [r.purchase_id for r in got] == [200]


def test_stream_stream_left_outer_withholds_open_windows(spark):
    """Left-outer stream-stream join: null rows (unattributed
    purchases) are emitted only once the watermark closes their match
    window. On a replayed finite file the stream result must be a
    SUBSET of the batch twin, and EQUAL on the watermark-closed prefix
    (purchases older than max_ts - delay - lookback)."""
    from dug_data_ingest_spark.streaming.events import unattributed_purchases

    stream = read_events_stream(spark, TEST_SF_DIR)
    q = (
        unattributed_purchases(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("unattrib_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.purchase_id, r.user_id, r.ts)
        for r in spark.sql("SELECT * FROM unattrib_out").collect()
    }
    batch = unattributed_purchases(load(spark, TEST_SF_DIR, "events")).collect()
    want = {(r.purchase_id, r.user_id, r.ts) for r in batch}
    assert got <= want
    import datetime

    max_ts = max(r.ts for r in batch)
    cutoff = max_ts - datetime.timedelta(hours=1, minutes=30)
    closed = {t for t in want if t[2] <= cutoff}
    assert closed <= got and len(closed) > 0


def test_marker_sessionize_gap_boundary_is_truncated_seconds(spark):
    """All three implementations (batch twin, streaming state walker,
    DuckDB oracle) count the session gap in SECOND-BOUNDARY CROSSINGS:
    a fractional gap of 14400.8s whose truncated difference is exactly
    14400 must NOT split the session in any of them — a µs-exact
    comparison would. Constructed because the generated testdata never
    lands a gap inside (14400, 14401)."""
    import datetime as dt

    from dug_data_ingest_spark.streaming.sessionize import marker_sessions

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0, 100000), 9, "click", 1.0),
        # exact gap 14400.8 s; floor(ts2) - floor(ts1) = 14400 (not >)
        (2, dt.datetime(2024, 1, 1, 4, 0, 0, 900000), 9, "view", 1.0),
        # and one clearly-beyond gap that MUST split
        (3, dt.datetime(2024, 1, 1, 9, 0, 0, 0), 9, "view", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = sorted(
        (r.session_start, r.n_events) for r in marker_sessions(ev).collect()
    )
    assert got == [("2024-01-01 00:00:00", 2), ("2024-01-01 09:00:00", 1)]


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()
        self.timers = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, t):
        self.timers.append(t)


def test_tws_processor_semantics_match_batch(spark):
    """The StatefulProcessor behind marker_sessions_tws, driven
    directly with a fake state handle (executing the real operator
    needs protobuf — Spark's TWS wire protocol — absent here): feed
    each user's events in timestamp order, fire the trailing timer,
    and the emitted sessions must equal the batch twin's EXACTLY,
    including the trailing open session the timer closes."""
    import pandas as pd

    from dug_data_ingest_spark.streaming.sessionize import (
        make_marker_session_processor,
        marker_sessions,
    )

    events = load(spark, TEST_SF_DIR, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    pdf = events.toPandas()

    got = {}
    for user_id, rows in pdf.groupby("user_id"):
        proc = make_marker_session_processor()
        handle = _FakeHandle()
        proc.init(handle)
        outs = list(proc.handleInputRows((user_id,), iter([rows]), None))
        outs.extend(proc.handleExpiredTimer((user_id,), None, None))
        for out in outs:
            for r in out.itertuples(index=False):
                got[(r.user_id, r.session_start)] = (r.n_events, r.n_terminal)
        # state cleared after the timer; at most one timer was live
        assert not handle.state.exists()
        assert len(handle.timers) <= 1

    want = {
        (r.user_id, r.session_start): (r.n_events, r.n_terminal)
        for r in marker_sessions(events).collect()
    }
    assert got == want


def test_tws_processor_resumes_from_carried_state(spark):
    """Split each user's stream across two micro-batches at an
    arbitrary boundary: the ValueState carried between
    handleInputRows calls must stitch sessions identically to the
    single-batch walk."""
    from dug_data_ingest_spark.streaming.sessionize import (
        make_marker_session_processor,
        marker_sessions,
    )

    events = load(spark, TEST_SF_DIR, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    pdf = events.toPandas()

    got = {}
    for user_id, rows in pdf.groupby("user_id"):
        rows = rows.sort_values(["ts", "event_id"])
        cut = len(rows) // 2
        proc = make_marker_session_processor()
        handle = _FakeHandle()
        proc.init(handle)
        outs = []
        for batch in (rows.iloc[:cut], rows.iloc[cut:]):
            if len(batch):
                outs.extend(proc.handleInputRows((user_id,), iter([batch]), None))
        outs.extend(proc.handleExpiredTimer((user_id,), None, None))
        for out in outs:
            for r in out.itertuples(index=False):
                got[(r.user_id, r.session_start)] = (r.n_events, r.n_terminal)

    want = {
        (r.user_id, r.session_start): (r.n_events, r.n_terminal)
        for r in marker_sessions(events).collect()
    }
    assert got == want


def test_marker_sessionize_tws_matches_batch_closed_sessions(spark):
    """Wire-protocol equivalence: the real transformWithStateInPandas
    stream against the batch twin. Needs protobuf (the TWS
    state-server protocol), so it self-skips where that isn't
    shipped — the semantics tests above run everywhere."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas execution needs protobuf",
    )
    from dug_data_ingest_spark.streaming.sessionize import (
        marker_sessions,
        marker_sessions_tws,
    )

    stream = read_events_stream(spark, TEST_SF_DIR)
    q = (
        marker_sessions_tws(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_tws_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.session_start): (r.n_events, r.n_terminal)
        for r in spark.sql("SELECT * FROM sessions_tws_out").collect()
    }
    batch = marker_sessions(load(spark, TEST_SF_DIR, "events")).collect()
    want = {
        (r.user_id, r.session_start): (r.n_events, r.n_terminal) for r in batch
    }
    assert len(got) > 0
    for k, v in got.items():
        assert want.get(k) == v, (k, v, want.get(k))
    missing = set(want) - set(got)
    users = {u for u, _ in missing}
    assert len(missing) == len(users), f"non-trailing sessions missing: {missing}"
