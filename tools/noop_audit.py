"""One-shot audit of the bench harness's count() blind spot: for a
pure projection, ``df.count()`` lets Catalyst prune every output
column, so the bench times a bare scan while the operator's real
per-row work (regex, array folds, hashing) goes unmeasured — which is
exactly how text-token-entropy hid an O(tokens²) inline-HOF blowup
behind a 0.31 s bench number (caught only by the sf1 checkpoint's
noop sink at 109.7 s).

    python tools/noop_audit.py [sf_dir]

Finds every registered slug whose executed plan at sf0.001 contains
no Exchange (the projection family — exactly the plans count() can
fully prune), then times count() vs a noop-sink write at ``sf_dir``
(warmed, fresh plan per measurement) and prints the ratio. Big
ratios are not bugs — they are bench blind spots: the operator's
honest cost lives in SCALE.md / the sf1 checkpoint, not in
BENCH_HISTORY. Ratios far beyond the family's (e.g. 30x when
siblings sit at 2-5x) flag a hidden re-evaluation hazard worth a
plan read.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from dug_data_ingest_spark.queries import all_queries
    from dug_data_ingest_spark.session import get_spark

    spark = get_spark("noop-audit")
    qs = all_queries()
    plan_sf = "/root/testdata/sf0.001"

    candidates = []
    for slug, fn in qs.items():
        try:
            df = fn(spark, plan_sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception:  # noqa: BLE001 — audit is best-effort per slug
            continue
        if "Exchange" not in plan and "EvalPython" not in plan:
            candidates.append(slug)
    print(f"projection-family candidates (no Exchange): {len(candidates)}",
          flush=True)

    out = {}
    for slug in sorted(candidates):
        fn = qs[slug]
        try:
            fn(spark, sf_dir).count()  # warm codegen
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            c = time.perf_counter() - t0
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            n = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001
            print(f"SKIP {slug}: {type(exc).__name__}"[:120], flush=True)
            continue
        out[slug] = {
            "count_s": round(c, 3),
            "noop_s": round(n, 3),
            "ratio": round(n / c, 1) if c > 0.001 else None,
        }
        print(json.dumps({slug: out[slug]}), flush=True)

    worst = sorted(
        ((v["ratio"] or 0, k) for k, v in out.items()), reverse=True
    )[:10]
    print("\nworst noop/count ratios (bench blind-spot size):")
    for r, k in worst:
        v = out[k]
        print(f"  {k:32s} count {v['count_s']:7.3f}  noop {v['noop_s']:7.3f}  x{r}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
