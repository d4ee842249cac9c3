"""snk-object-store end-to-end: partitioned parquet write + LakeFS
REST commit (sources/lakefs.py) against an in-process test double of
the commit API (reference flow: scripts/bdc/ingest.sh:85-100 —
rclone sync, then curl POST .../branches/{branch}/commits).

The double verifies the contract pieces that matter: basic auth,
write-BEFORE-commit ordering (the commit handler checks the parquet
_SUCCESS marker of the path named in the commit metadata), and
idempotent re-run (second identical publish = "no changes" commit,
treated as success).
"""

from __future__ import annotations

import base64
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from dug_data_ingest_spark.sources.files import write_partitioned
from dug_data_ingest_spark.sources.lakefs import LakeFSClient, lakefs_commit_hook
from tests.conftest import TEST_SF_DIR


class _LakeFSDouble(BaseHTTPRequestHandler):
    def log_message(self, *args):
        pass

    def _send(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):  # noqa: N802 (stdlib API)
        srv = self.server
        auth = self.headers.get("Authorization", "")
        expect = "Basic " + base64.b64encode(b"user:secret").decode()
        if auth != expect:
            self._send(401, {"message": "unauthorized"})
            return
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        path = body.get("metadata", {}).get("path")
        # write-then-commit ordering: the data this commit publishes
        # must already be fully on disk (Spark's _SUCCESS marker)
        committed_ok = bool(path) and os.path.exists(os.path.join(path, "_SUCCESS"))
        with srv.lock:
            if srv.no_changes:
                srv.commits.append({"empty_rejected": True, "path": path})
                self._send(400, {"message": "commit: no changes"})
                return
            srv.commits.append(
                {"path": path, "data_on_disk": committed_ok, "body": body}
            )
        self._send(
            201, {"id": f"c{len(srv.commits)}", "message": body["message"]}
        )


@pytest.fixture()
def lakefs_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _LakeFSDouble)
    srv.commits, srv.no_changes, srv.lock = [], False, threading.Lock()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _client(srv) -> LakeFSClient:
    return LakeFSClient(
        f"http://127.0.0.1:{srv.server_address[1]}", "user", "secret"
    )


def test_write_then_commit_ordering(spark, lakefs_server, tmp_path):
    out = str(tmp_path / "nation_by_region")
    df = spark.read.parquet(f"{TEST_SF_DIR}/nation.parquet")
    hook = lakefs_commit_hook(
        _client(lakefs_server), "bdc-ingest-logs", "main", "publish nations"
    )
    write_partitioned(df, out, "n_regionkey", commit_hook=hook)
    assert len(lakefs_server.commits) == 1
    c = lakefs_server.commits[0]
    assert c["path"] == out
    assert c["data_on_disk"], "commit arrived before the write finished"
    assert c["body"]["message"] == "publish nations"
    # and the published data is readable
    assert spark.read.parquet(out).count() == df.count()


def test_idempotent_rerun_empty_commit_is_success(spark, lakefs_server, tmp_path):
    out = str(tmp_path / "rerun")
    df = spark.read.parquet(f"{TEST_SF_DIR}/region.parquet")
    client = _client(lakefs_server)
    hook = lakefs_commit_hook(client, "repo", "main", "publish")
    write_partitioned(df, out, "r_regionkey", commit_hook=hook)
    # second run publishes identical content -> LakeFS says no changes
    lakefs_server.no_changes = True
    write_partitioned(df, out, "r_regionkey", commit_hook=hook)  # must not raise
    assert [("empty_rejected" in c) for c in lakefs_server.commits].count(True) == 1
    # but a real failure still surfaces when empty isn't the cause
    with pytest.raises(RuntimeError, match="failed: 400"):
        client.commit("repo", "main", "msg", ignore_empty=False)


def test_delta_sync_commits_only_when_something_changed(
    spark, lakefs_server, tmp_path
):
    # the rclone-sync analogue end-to-end: sync #1 publishes and the
    # commit metadata records the action counts; an unchanged re-run
    # performs NO commit at all (the server never even sees an empty
    # one); a changed key commits again with upload=1
    from dug_data_ingest_spark.sources.delta_sync import delta_sync_write
    from dug_data_ingest_spark.sources.lakefs import lakefs_delta_commit_hook

    out = str(tmp_path / "delta")
    df = spark.read.parquet(f"{TEST_SF_DIR}/nation.parquet")
    hook = lakefs_delta_commit_hook(
        _client(lakefs_server), "repo", "main", "delta publish"
    )
    delta_sync_write(df, out, "n_regionkey", ["n_nationkey", "n_name"], commit_hook=hook)
    assert len(lakefs_server.commits) == 1
    meta = lakefs_server.commits[0]["body"]["metadata"]
    assert int(meta["upload"]) > 0 and meta["empty"] == "False"

    delta_sync_write(df, out, "n_regionkey", ["n_nationkey", "n_name"], commit_hook=hook)
    assert len(lakefs_server.commits) == 1, "unchanged re-run must not commit"

    from pyspark.sql import functions as F

    changed = df.withColumn(
        "n_name",
        F.when(
            F.col("n_regionkey") == 0, F.concat(F.col("n_name"), F.lit("-v2"))
        ).otherwise(F.col("n_name")),
    )
    delta_sync_write(
        changed, out, "n_regionkey", ["n_nationkey", "n_name"], commit_hook=hook
    )
    assert len(lakefs_server.commits) == 2
    assert lakefs_server.commits[1]["body"]["metadata"]["upload"] == "1"


def test_bad_credentials_raise(lakefs_server):
    bad = LakeFSClient(
        f"http://127.0.0.1:{lakefs_server.server_address[1]}", "user", "wrong"
    )
    with pytest.raises(RuntimeError, match="401"):
        bad.commit("repo", "main", "msg")
    assert lakefs_server.commits == []
