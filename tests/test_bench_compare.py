"""Pins for tools/bench_compare.py's pure parts: driver-file recovery
(tail-truncated JSON), history medians, and the min(raw, adjusted)
flag rule — the tool that decides whether a bench delta is drift or
host noise must not itself drift.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from tools.bench_compare import _normalize, main


def test_normalize_recovers_truncated_driver_tail():
    doc = {
        "rc": 0,
        "parsed": None,
        # front-truncated mid-pair, exactly the driver's shape
        "tail": ', "olap-a": 0.631, "dedup-b": 1.25}, '
        '"sf": 0.1, "calib_spark_sec": 0.199, "calib_numpy_sec": 0.3}',
    }
    out = _normalize(doc)
    assert out["queries"] == {"olap-a": 0.631, "dedup-b": 1.25}
    assert out["calib_spark_sec"] == 0.199


def test_normalize_passes_through_parsed_and_plain():
    plain = {"queries": {"q": 1.0}, "calib_spark_sec": 0.1}
    assert _normalize(plain) is plain
    wrapped = {"parsed": {"queries": {"q": 2.0}}, "tail": "ignored"}
    assert _normalize(wrapped)["queries"] == {"q": 2.0}


def test_flag_rule_requires_both_hypotheses(tmp_path, capsys, monkeypatch):
    # base ran on a transiently-loaded host (calib 0.2), head on a calm
    # one (calib 0.1): every unchanged query halved its raw time, so
    # pure calib adjustment doubles it back — the min(raw, adj) rule
    # must flag ONLY the query that is slower in BOTH views.
    base = {
        "queries": {"steady": 1.0, "regressed": 1.0, "hostnoise": 2.0},
        "calib_spark_sec": 0.2,
    }
    head = {
        "queries": {"steady": 0.5, "regressed": 2.0, "hostnoise": 2.1},
        "calib_spark_sec": 0.1,
    }
    b, h = tmp_path / "b.json", tmp_path / "h.json"
    b.write_text(json.dumps(base))
    h.write_text(json.dumps(head))
    rc = main([str(b), str(h)])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    flagged = json.loads(out)["flagged"]
    # steady: raw 0.5 (faster) — not flagged even though adj is 1.0
    # hostnoise: raw 1.05, adj 2.1 — min is 1.05, not flagged
    # regressed: raw 2.0, adj 4.0 — slower under both -> flagged
    assert set(flagged) == {"regressed"}
    assert rc == 1
