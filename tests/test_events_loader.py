"""The events loader's dtype branch, exercised against all three ts
encodings the testdata has shipped (or could ship): TIMESTAMP(NANOS),
timestamp[us] (no timezone → TIMESTAMP_NTZ in Spark), and
timestamp[us, UTC] (→ TIMESTAMP). Every branch must yield the same
TIMESTAMP column with identical values — the invariant that broke in
round 3 when the testdata regenerated under a hard-coded loader.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dug_data_ingest_spark.queries import load

_TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 7, 179575),
    datetime.datetime(2024, 1, 15, 12, 30, 0, 1),
    datetime.datetime(2024, 1, 30, 23, 57, 12, 194062),
]


def _write_events(dirpath, ts_type):
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS).cast(ts_type),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["view", "click", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}', '{"k": 3}']),
        }
    )
    # version 2.6 keeps nanosecond precision as TIMESTAMP(NANOS)
    pq.write_table(table, f"{dirpath}/events.parquet", version="2.6")


@pytest.mark.parametrize(
    "ts_type",
    [pa.timestamp("ns"), pa.timestamp("us"), pa.timestamp("us", tz="UTC")],
    ids=["nanos", "micros-ntz", "micros-utc"],
)
def test_load_normalizes_every_ts_encoding(spark, tmp_path, ts_type):
    _write_events(tmp_path, ts_type)
    df = load(spark, str(tmp_path), "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp", df.schema
    got = [r.ts for r in df.orderBy("event_id").select("ts").collect()]
    assert got == _TS, got


def test_stream_source_matches_batch_loader(spark, tmp_path):
    from dug_data_ingest_spark.streaming.events import read_events_stream

    _write_events(tmp_path, pa.timestamp("us"))
    stream = read_events_stream(spark, str(tmp_path))
    assert stream.isStreaming
    assert stream.schema == load(spark, str(tmp_path), "events").schema


def test_unrelated_read_error_does_not_leak_legacy_conf(spark, tmp_path):
    # A missing path (or any non-nanos failure) must propagate without
    # setting spark.sql.legacy.parquet.nanosAsLong session-wide — the
    # blanket retry used to leave it behind, silently changing how
    # every later nanos-typed parquet column was read.
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        spark.conf.unset(conf_key)
    except Exception:
        pass
    with pytest.raises(Exception):
        load(spark, str(tmp_path / "nope"), "events")
    # registered SQL confs report their default when unset — the leak
    # would read back "true"
    assert spark.conf.get(conf_key, "false") != "true"


def test_nanos_retry_rolls_back_conf_on_second_failure(spark, tmp_path):
    # A file that fails with the nanos marker but then fails again on
    # retry must restore the previous conf value.
    from dug_data_ingest_spark.streaming import events as ev

    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        spark.conf.unset(conf_key)
    except Exception:
        pass

    calls = {"n": 0}
    real_reader = spark.read.parquet

    class FakeErr(Exception):
        pass

    def fake_read(path):
        calls["n"] += 1
        if calls["n"] == 1:
            raise FakeErr("Illegal Parquet type: INT64 (TIMESTAMP(NANOS,true))")
        raise FakeErr("second failure")

    class FakeReadAttr:
        parquet = staticmethod(fake_read)

    class FakeSpark:
        read = FakeReadAttr()
        conf = spark.conf

    with pytest.raises(FakeErr, match="second failure"):
        ev.read_events_parquet(FakeSpark(), "whatever")
    assert calls["n"] == 2
    # rolled back: must not still read "true" after the failed retry
    assert spark.conf.get(conf_key, "false") != "true"
