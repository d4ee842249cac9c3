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


def test_history_median_trailing_window_and_noisy_order(monkeypatch):
    # Two pins from the r11 verdict/advice:
    # 1. the current run is sliced off BEFORE the noisy filter, so a
    #    flagged current run doesn't also eat the newest clean prior
    #    (the off-by-one: filter-then-slice dropped one clean entry);
    # 2. the median base is a TRAILING window (last 10 clean entries
    #    per query), so documented plan trades stop re-alarming
    #    against all-history medians forever.
    import tools.bench_compare as bc

    rows = (
        # 15 old clean entries at 1.0s — outside the trailing-10 window
        [{"queries": {"q": 1.0}, "calib_spark_sec": 0.1} for _ in range(15)]
        # 10 recent clean entries at 3.0s — the post-trade steady state
        + [{"queries": {"q": 3.0}, "calib_spark_sec": 0.1} for _ in range(10)]
        # current run, flagged noisy — must be excluded by the SLICE,
        # without costing an extra clean prior
        + [{"queries": {"q": 9.0}, "calib_spark_sec": 0.5, "noisy_host": True}]
    )
    monkeypatch.setattr(bc, "_history_rows", lambda: rows)
    name, doc = bc._load_history_median()
    # trailing-10 of the 25 clean priors = the ten 3.0s entries
    assert doc["queries"]["q"] == 3.0
    assert "25 clean entries" in name
