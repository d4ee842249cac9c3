"""Calibration-adjusted bench comparison — separates host noise from
real per-query drift, mechanizing the check every round's verdict does
by hand ("the apparent regressions are host noise, verified").

    python tools/bench_compare.py [BASE] [HEAD] [--threshold R]

BASE / HEAD are bench JSON files (e.g. BENCH_r07.json BENCH_r08.json)
or the literals:
  driver  — the newest BENCH_r*.json at the repo root
  clean   — the last BENCH_HISTORY.jsonl entry (default HEAD)
  history — per-query MEDIAN of the prior BENCH_HISTORY entries
            (excluding the last, so `history clean` compares the
            newest run against its own medians — the default BASE:
            robust to any single run's transient, which a one-entry
            base is not)

Each bench line carries ``calib_spark_sec`` — the wall time of a fixed
tiny Spark job on the same host moments before the run. Two ratios
are computed per query: RAW (head/base) and CALIB-ADJUSTED (raw
divided by the hosts' calib ratio). Neither alone is trustworthy: the
calib probe samples an instant while the bench samples minutes, so a
transient-load base run makes pure adjustment over-correct by exactly
the calib factor (observed r8 vs the clean rerun of identical code).
A query is flagged only when the SMALLER of the two ratios exceeds
the threshold (default 1.5) — slower under both the host-unchanged
and the host-scaled hypothesis — AND the smaller delta clears a
0.15 s scheduling-noise floor (sub-second queries bounce ±0.1 s on an
idle host; see BASELINE.md practice notes).

Prints one human table plus a final JSON line:
{"adjusted_total_ratio": ..., "flagged": {...}} — rc 1 when anything
is flagged, so a round-close script can gate on it.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOISE_FLOOR_SEC = 0.15


def _normalize(doc: dict) -> dict:
    """Driver BENCH_r*.json wraps the bench stdout: ``parsed`` holds
    the JSON line when the driver could parse it, else ``tail`` holds
    a front-truncated suffix of stdout. Recover what we can: regex out
    the '"slug": sec' pairs (the truncation only ever cuts leading
    queries, and every surviving pair is well-formed) plus the
    trailing calib fields."""
    if isinstance(doc.get("queries"), dict):
        return doc
    parsed = doc.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        out = dict(parsed)
        return out
    tail = doc.get("tail", "")
    meta = {"metric", "value", "unit", "sf", "calib_spark_sec", "calib_numpy_sec", "queries"}
    queries = {
        k: float(v)
        for k, v in re.findall(r'"([\w-]+)":\s*([0-9.]+)', tail)
        if k not in meta
    }
    out = {"queries": queries}
    m = re.search(r'"calib_spark_sec":\s*([0-9.]+)', tail)
    if m:
        out["calib_spark_sec"] = float(m.group(1))
    return out


def _load_driver() -> tuple[str, dict]:
    files = sorted(
        glob.glob(os.path.join(ROOT, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not files:
        raise SystemExit("no BENCH_r*.json at repo root")
    path = files[-1]
    with open(path) as fh:
        return os.path.basename(path), _normalize(json.load(fh))


def _history_rows() -> list[dict]:
    path = os.path.join(ROOT, "BENCH_HISTORY.jsonl")
    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    if not rows:
        raise SystemExit("BENCH_HISTORY.jsonl is empty")
    return rows


TRAILING_WINDOW = 10


def _load_clean() -> tuple[str, dict]:
    row = _history_rows()[-1]
    if row.get("noisy_host"):
        print(
            "WARNING: BENCH_HISTORY[-1] is flagged noisy_host — "
            "comparing a contended run; prefer a fresh quiet-host entry",
            file=sys.stderr,
        )
    return "BENCH_HISTORY[-1]", row


def _load_history_median() -> tuple[str, dict]:
    import statistics

    rows = _history_rows()
    # Slice the current run off FIRST, then drop host-contaminated
    # entries (flagged "noisy_host": true — they would drag every
    # per-query median upward and mask real drift). Doing it in the
    # other order silently dropped the newest clean prior run whenever
    # the current run was itself flagged (r11 ADVICE off-by-one).
    prior = rows[:-1] or rows
    clean = [r for r in prior if not r.get("noisy_host")] or prior
    # Trailing-window median: documented plan trades (exact-decimal
    # money aggs, stratified-exact rewrite) shifted some queries'
    # steady state; an all-history median re-alarms on them every
    # round (r11 verdict item 2). Use the last TRAILING_WINDOW clean
    # entries *per query* (a query absent from recent runs falls back
    # to its newest appearances).
    per_q: dict[str, list[float]] = {}
    calibs: list[float] = []
    for r in clean:
        for q, s in r.get("queries", {}).items():
            per_q.setdefault(q, []).append(s)
        if r.get("calib_spark_sec"):
            calibs.append(r["calib_spark_sec"])
    doc = {
        "queries": {
            q: statistics.median(v[-TRAILING_WINDOW:]) for q, v in per_q.items()
        },
    }
    if calibs:
        doc["calib_spark_sec"] = statistics.median(calibs[-TRAILING_WINDOW:])
    return (
        f"BENCH_HISTORY[:-1] trailing-{TRAILING_WINDOW} median "
        f"({len(clean)} clean entries)",
        doc,
    )


def _load(spec: str) -> tuple[str, dict]:
    if spec == "driver":
        return _load_driver()
    if spec == "clean":
        return _load_clean()
    if spec == "history":
        return _load_history_median()
    with open(spec) as fh:
        return os.path.basename(spec), _normalize(json.load(fh))


def main(argv: list[str]) -> int:
    # hand-rolled parse: `--threshold 1.4` consumes its value token so
    # it never lands in the positional list (`--threshold=1.4` works
    # too; a bare trailing --threshold is an error)
    args: list[str] = []
    threshold = 1.5
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                threshold = float(a.split("=", 1)[1])
            else:
                if i + 1 >= len(argv):
                    print("--threshold requires a value", file=sys.stderr)
                    return 2
                threshold = float(argv[i + 1])
                i += 1
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    base_spec = args[0] if len(args) > 0 else "history"
    head_spec = args[1] if len(args) > 1 else "clean"
    base_name, base = _load(base_spec)
    head_name, head = _load(head_spec)

    cb = base.get("calib_spark_sec")
    ch = head.get("calib_spark_sec")
    calib_ratio = (ch / cb) if (cb and ch) else 1.0
    print(
        f"BASE {base_name} (calib {cb})  ->  HEAD {head_name} (calib {ch}); "
        f"host ratio {calib_ratio:.2f} "
        f"({'no calib in one side — raw compare' if not (cb and ch) else 'dividing HEAD by it'})"
    )

    bq, hq = base.get("queries", {}), head.get("queries", {})
    shared = sorted(set(bq) & set(hq))
    only_base = sorted(set(bq) - set(hq))
    only_head = sorted(set(hq) - set(bq))
    if only_base:
        print(f"only in BASE ({len(only_base)}): {only_base[:8]}{'…' if len(only_base) > 8 else ''}")
    if only_head:
        print(f"only in HEAD ({len(only_head)}): {only_head[:8]}{'…' if len(only_head) > 8 else ''}")

    flagged: dict[str, dict] = {}
    rows = []
    for q in shared:
        b, h = bq[q], hq[q]
        if not b:
            continue
        raw = h / b
        adj = raw / calib_ratio
        worst = min(raw, adj)
        rows.append((worst, raw, adj, q, b, h))
        min_delta = min(h - b, h / calib_ratio - b)
        if worst > threshold and min_delta > NOISE_FLOOR_SEC:
            flagged[q] = {
                "base_sec": b,
                "head_sec": h,
                "raw_ratio": round(raw, 2),
                "adjusted_ratio": round(adj, 2),
            }
    rows.sort(reverse=True)
    print(
        f"\nworst min(raw, calib-adjusted) ratios "
        f"(threshold {threshold}, floor {NOISE_FLOOR_SEC}s):"
    )
    for worst, raw, adj, q, b, h in rows[:10]:
        mark = " <-- FLAG" if q in flagged else ""
        print(
            f"  {q:32s} {b:7.3f} -> {h:7.3f}  raw x{raw:5.2f} adj x{adj:5.2f}{mark}"
        )

    tb = sum(bq[q] for q in shared)
    th = sum(hq[q] for q in shared)
    raw_total = round(th / tb, 3) if tb else None
    adj_total = round(th / calib_ratio / tb, 3) if tb else None
    print(
        f"\nshared-query total: {tb:.1f} -> {th:.1f} s; "
        f"raw ratio {raw_total}, calib-adjusted {adj_total}"
    )
    print(
        json.dumps(
            {
                "raw_total_ratio": raw_total,
                "adjusted_total_ratio": adj_total,
                "flagged": flagged,
            }
        )
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
