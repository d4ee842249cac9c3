"""Per-slug oracle parity check — sweep_parity.py's strict compare,
restricted to the named slugs so an optimization can be verified in
seconds instead of re-running the whole registry.

    python tools/parity_one.py SLUG [SLUG ...] [--sf 0.01] [--master local[32]]
        [--shuffle N] [--aqe off]

Same normalization as tools/sweep_parity.py (floats via repr, rows
sorted) so a PASS here means the full sweep would pass for that slug
under the same session shape.
"""

from __future__ import annotations

import json
import sys
import traceback

sys.path.insert(0, __file__.rsplit("/", 2)[0])

TABLES = [
    "documents", "embeddings", "events", "files", "studies",
    "variables", "lineitem", "orders", "customer", "supplier",
    "part", "partsupp", "nation", "region", "media", "ticks",
]


def main() -> int:
    slugs: list[str] = []
    sf, master, shuffle, aqe = "0.01", "local[32]", None, "on"
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf = args[i + 1]; i += 1
        elif a == "--master":
            master = args[i + 1]; i += 1
        elif a == "--shuffle":
            shuffle = args[i + 1]; i += 1
        elif a == "--aqe":
            aqe = args[i + 1]; i += 1
        else:
            slugs.append(a)
        i += 1
    if not slugs:
        print("usage: parity_one.py SLUG [...] [--sf X] [--master M] "
              "[--shuffle N] [--aqe off]", file=sys.stderr)
        return 2
    sf_dir = f"/root/testdata/sf{sf}"

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if shuffle is not None:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
    if aqe == "off":
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    import os

    for t in TABLES:
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )

    def norm(d):
        return sorted(
            map(repr, d[sorted(d.columns)].itertuples(index=False, name=None))
        )

    fails, n_ok = [], 0
    for slug in slugs:
        if slug not in qs:
            print(f"ERROR {slug}: not a registered slug", flush=True)
            fails.append(slug)
            continue
        try:
            sp = qs[slug](spark, sf_dir).toPandas()
            if slug in oracles:
                du = con.sql(oracles[slug]).df()
                ok = norm(sp) == norm(du)
            else:
                ok = len(sp) >= 0
            if ok:
                n_ok += 1
                print(f"PASS {slug}: {len(sp)} rows", flush=True)
            else:
                fails.append(slug)
                print(f"FAIL {slug}: rows {len(sp)}/{len(du)}", flush=True)
        except Exception as exc:  # noqa: BLE001 — isolate per slug
            fails.append(slug)
            print(f"ERROR {slug}: {type(exc).__name__}: {exc}", flush=True)
            traceback.print_exc()

    print(json.dumps({"sf": sf, "master": master, "ok": n_ok,
                      "total": len(slugs), "fails": fails}))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
