"""Production HTTP fetch callables (sources/http_client.py) against a
local in-process server — no external network. Exercises the
reference-mirrored semantics: pagination with short-page termination
(get_bdc_studies_from_gen3.py:32-82), per-key N+1 GETs (:84-97),
retry-with-backoff on transient failures, fail-fast on 4xx, and the
primary→mirror download fallback (get_dbgap_data_dicts.py:92-104).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import types as T

from dug_data_ingest_spark.sources.http_client import (
    download_gen3_list,
    fallback_download_fetcher,
    gen3_page_fetcher,
    http_get,
    keyed_item_fetcher,
)
from dug_data_ingest_spark.sources.rest import keyed_fetch, paginated_fetch

STUDIES = [{"study_id": f"phs{i:06d}", "name": f"study {i}"} for i in range(23)]


class _Handler(BaseHTTPRequestHandler):
    server_version = "fixture/0"

    def log_message(self, *args):  # quiet
        pass

    def _send(self, code: int, payload: bytes, ctype="application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_GET(self):  # noqa: N802 (stdlib API)
        srv = self.server
        parsed = urlparse(self.path)
        with srv.lock:
            srv.hits.append(parsed.path)
            remaining = srv.fail_next.get(parsed.path, 0)
            if remaining > 0:
                srv.fail_next[parsed.path] = remaining - 1
                self._send(503, b'{"error": "transient"}')
                return
        if parsed.path == "/studies":
            q = parse_qs(parsed.query)
            off, lim = int(q["offset"][0]), int(q["limit"][0])
            body = json.dumps(STUDIES[off : off + lim]).encode()
            self._send(200, body)
        elif parsed.path.startswith("/meta/"):
            sid = parsed.path.rsplit("/", 1)[1]
            idx = int(sid[3:])
            body = json.dumps({"study_id": sid, "name": f"study {idx}"}).encode()
            self._send(200, body)
        elif parsed.path.startswith("/mirror/"):
            name = parsed.path.rsplit("/", 1)[1]
            self._send(200, f"mirror-bytes:{name}".encode(), "application/octet-stream")
        elif parsed.path.startswith("/primary/"):
            name = parsed.path.rsplit("/", 1)[1]
            if name.startswith("broken"):
                self._send(404, b"not here")
            else:
                self._send(200, f"primary-bytes:{name}".encode(), "application/octet-stream")
        else:
            self._send(404, b"unknown path")


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.hits, srv.fail_next, srv.lock = [], {}, threading.Lock()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


@pytest.fixture()
def base(server):
    server.hits.clear()
    server.fail_next.clear()
    return f"http://127.0.0.1:{server.server_address[1]}"


SCHEMA = T.StructType(
    [T.StructField("study_id", T.StringType()), T.StructField("name", T.StringType())]
)


def test_paginated_fetch_over_real_http(spark, base, server):
    fetch = gen3_page_fetcher(f"{base}/studies?src=test", ["study_id", "name"])
    out = paginated_fetch(spark, fetch, total=23, limit=10, schema=SCHEMA)
    rows = sorted((r.study_id, r.name) for r in out.collect())
    assert rows == sorted((s["study_id"], s["name"]) for s in STUDIES)
    # 3 offset ranges -> exactly 3 page GETs, no duplicate pulls
    assert server.hits.count("/studies") == 3


def test_retry_recovers_from_transient_503(spark, base, server):
    server.fail_next["/studies"] = 2  # first two hits 503, then fine
    fetch = gen3_page_fetcher(
        f"{base}/studies?src=retry", ["study_id", "name"], backoff=0.01
    )
    out = paginated_fetch(spark, fetch, total=23, limit=25, schema=SCHEMA)
    assert out.count() == 23
    assert server.hits.count("/studies") == 3  # 2 failures + 1 success


def test_http_get_backoff_schedule_and_exhaustion(base, server):
    server.fail_next["/studies"] = 99
    sleeps: list[float] = []
    with pytest.raises(RuntimeError, match="503"):
        http_get(
            f"{base}/studies?x=1&limit=1&offset=0",
            max_retries=3,
            backoff=0.5,
            sleep=sleeps.append,
        )
    assert sleeps == [0.5, 1.0, 2.0]  # exponential, bounded
    assert server.hits.count("/studies") == 4  # 1 try + 3 retries


def test_http_get_fails_fast_on_404(base, server):
    sleeps: list[float] = []
    with pytest.raises(RuntimeError, match="404"):
        http_get(f"{base}/nope", max_retries=3, sleep=sleeps.append)
    assert sleeps == []  # permanent error: no retry, no sleep
    assert server.hits.count("/nope") == 1


def test_keyed_fetch_n_plus_one_over_real_http(spark, base, server):
    keys = spark.createDataFrame(
        [(s["study_id"],) for s in STUDIES[:7]], ["study_id"]
    )
    fetch = keyed_item_fetcher(
        base + "/meta/{key}", "study_id", ["study_id", "name"]
    )
    out = keyed_fetch(keys, fetch, SCHEMA, partitions=4)
    got = {r.study_id: r.name for r in out.collect()}
    assert got == {s["study_id"]: s["name"] for s in STUDIES[:7]}
    assert sum(h.startswith("/meta/") for h in server.hits) == 7


def test_fallback_download_uses_mirror_on_primary_failure(spark, base, server):
    files = spark.createDataFrame(
        [("data_dict.xml",), ("broken_dict.xml",)], ["fname"]
    )
    fetch = fallback_download_fetcher(
        base + "/primary/{key}", base + "/mirror/{key}", "fname"
    )
    schema = T.StructType(
        [
            T.StructField("fname", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    out = keyed_fetch(files, fetch, schema)
    got = {r.fname: (r.source, bytes(r.content)) for r in out.collect()}
    assert got["data_dict.xml"] == ("primary", b"primary-bytes:data_dict.xml")
    assert got["broken_dict.xml"] == ("mirror", b"mirror-bytes:broken_dict.xml")


def test_driver_side_gen3_list_short_page_termination(base, server):
    # unknown-total path: serial loop stops on the first short page
    items = download_gen3_list(
        f"{base}/studies?src=serial", download_limit=10
    )
    assert len(items) == 23
    assert server.hits.count("/studies") == 3  # 10 + 10 + 3(short -> stop)


def test_incremental_fetch_only_pulls_missing_keys(spark, base, server):
    # idempotent bulk download: listing minus manifest -> only the
    # remainder hits the network (reference skip-if-downloaded,
    # get_dbgap_data_dicts.py:230-235, as a broadcast anti-join)
    from dug_data_ingest_spark.sources.rest import incremental_fetch

    listing = spark.createDataFrame(
        [(s["study_id"],) for s in STUDIES[:10]], ["study_id"]
    )
    manifest = spark.createDataFrame(
        [(s["study_id"],) for s in STUDIES[:6]], ["study_id"]
    )
    fetch = keyed_item_fetcher(
        base + "/meta/{key}", "study_id", ["study_id", "name"]
    )
    out = incremental_fetch(listing, manifest, "study_id", fetch, SCHEMA)
    got = sorted(r.study_id for r in out.collect())
    assert got == sorted(s["study_id"] for s in STUDIES[6:10])
    assert sum(h.startswith("/meta/") for h in server.hits) == 4  # only missing


def test_fallback_mirror_retries_transient_503(spark, base, server):
    # the mirror is the LAST line of defense: one transient 503 there
    # must be retried away, not kill the task
    server.fail_next["/mirror/broken_dict.xml"] = 1
    files = spark.createDataFrame([("broken_dict.xml",)], ["fname"])
    fetch = fallback_download_fetcher(
        base + "/primary/{key}", base + "/mirror/{key}", "fname",
        backoff=0.01,
    )
    schema = T.StructType(
        [
            T.StructField("fname", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    out = keyed_fetch(files, fetch, schema).collect()
    assert out[0].source == "mirror"
    assert bytes(out[0].content) == b"mirror-bytes:broken_dict.xml"


def test_keys_are_url_escaped(spark, base, server):
    # generic key_col contract: a key containing '?', '#', '&', ' ',
    # or '/' must reach the server as ONE percent-encoded path segment
    keys = spark.createDataFrame([("we ird?id#1/x",)], ["study_id"])
    fetch = keyed_item_fetcher(
        base + "/meta/{key}", "study_id", ["study_id", "name"]
    )
    schema = T.StructType(
        [
            T.StructField("study_id", T.StringType()),
            T.StructField("name", T.StringType()),
        ]
    )
    # the fixture server only serves numeric ids — the point here is
    # the REQUEST LINE: the encoded key must arrive as one path
    # segment (unescaped, '?' and '#' would truncate it into a query/
    # fragment and the server would log a bare '/meta/we ird')
    with pytest.raises(Exception):
        keyed_fetch(keys, fetch, schema).collect()
    hit = [h for h in server.hits if h.startswith("/meta/")][-1]
    assert hit == "/meta/we%20ird%3Fid%231%2Fx"
