"""Contention-robust isolated pin: wall time AND JVM/Python CPU-seconds
per query rep.

    python tools/cpu_pin.py SLUG [SLUG ...] [--reps N] [--sf DIR] [--noop]

Why: the shared host's external tenants inflate wall-clock 2-10x
(BENCH_HISTORY noisy_host saga), but the CPU-seconds this process
family actually burns per query measures the PLAN'S work almost
independently of who else is on the box (descheduled tasks consume no
CPU). In local mode the executors live in the driver JVM, so the JVM's
utime+stime delta around a rep is the whole Spark-side cost; the
Python worker pool (mapInPandas/Arrow UDFs) is charged via the
children-CPU counters of this process tree. Use wall numbers only from
quiet windows (calib < 0.35); use cpu-seconds to compare plans across
any window.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CLK = os.sysconf("SC_CLK_TCK")


def _proc_cpu(pid: int) -> float:
    """utime+stime (+children, which for the JVM covers any forked
    helpers) of one pid, in seconds."""
    try:
        with open(f"/proc/{pid}/stat") as fh:
            parts = fh.read().rsplit(") ", 1)[1].split()
        # fields 13..16 (0-based after comm): utime stime cutime cstime
        return sum(int(parts[i]) for i in (11, 12, 13, 14)) / _CLK
    except OSError:
        return 0.0


def _tree_cpu(root: int) -> float:
    """CPU-seconds of root + all LIVE descendants (dead children are
    folded into cutime/cstime by _proc_cpu). Python workers are
    long-lived under spark.python.worker.reuse, so live traversal
    catches them."""
    pids = {root}
    by_ppid: dict[int, list[int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as fh:
                ppid = int(fh.read().rsplit(") ", 1)[1].split()[1])
            by_ppid.setdefault(ppid, []).append(int(d))
        except OSError:
            continue
    frontier = [root]
    while frontier:
        p = frontier.pop()
        for c in by_ppid.get(p, ()):
            if c not in pids:
                pids.add(c)
                frontier.append(c)
    return sum(_proc_cpu(p) for p in pids)


def main(argv: list[str]) -> int:
    reps = 5
    sf_dir = "/root/testdata/sf0.1"
    noop = False
    slugs: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--reps":
            reps = int(argv[i + 1]); i += 1
        elif a == "--sf":
            sf_dir = argv[i + 1]; i += 1
        elif a == "--noop":
            noop = True
        else:
            slugs.append(a)
        i += 1
    if not slugs:
        print("usage: cpu_pin.py SLUG [SLUG ...] [--reps N] [--sf DIR] [--noop]",
              file=sys.stderr)
        return 2

    from dug_data_ingest_spark.queries import all_queries
    from dug_data_ingest_spark.session import get_spark

    spark = get_spark("cpu-pin")
    me = os.getpid()

    def _run(df) -> None:
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    qs = all_queries()
    out: dict[str, dict] = {"sink": "noop" if noop else "count"}
    for slug in slugs:
        fn = qs[slug]
        _run(fn(spark, sf_dir))  # warmup (codegen/JIT)
        walls, cpus = [], []
        for _ in range(reps):
            c0 = _tree_cpu(me)
            t0 = time.perf_counter()
            _run(fn(spark, sf_dir))
            walls.append(round(time.perf_counter() - t0, 3))
            cpus.append(round(_tree_cpu(me) - c0, 2))
        out[slug] = {
            "wall": walls, "cpu": cpus,
            "wall_min": min(walls), "cpu_min": min(cpus),
            "cpu_median": sorted(cpus)[len(cpus) // 2],
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
