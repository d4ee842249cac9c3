"""One-shot sf1.0 scale checkpoint for the dedup/curation family
(VERDICT r10 item 5): inflate sf0.1 documents 10x in DISJOINT mode
(every word copy-tagged, so per-copy near-dup structure is preserved
while volume grows — the linear-scaling stress), write a scratch
sf-layout directory, then run the heaviest REGISTERED slugs
unmodified against it, recording wall time and executor shuffle
read/write bytes per query.

    python tools/sf1_checkpoint.py [sf_dir] [scratch_dir]

Prints one JSON line per query plus a trailing summary line; paste
the summary into SCALE.md. Shuffle bytes come from the
ExecutorMetrics totals of a dedicated job group per query (delta of
the JVM-wide shuffle counters around the action), so numbers are
per-query as long as nothing else runs concurrently (this tool runs
queries serially).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from dug_data_ingest_spark.session import get_spark  # noqa: E402

HEAVY = [
    "dedup-ngram-jaccard",
    "dedup-cluster",
    "dedup-substring",
    "dedup-strip-spans",
    "pipeline-incremental-dedup",
    "pipeline-curate-corpus",
    "text-lm-score",
    "text-keyword-tfidf",
    # r11 heavies (VERDICT r11 item 6) — winnow-pairs and kn-lm read
    # the inflated documents; pagerank and zorder read events/lineitem,
    # inflated 10x below for the same linear-volume stress
    "dedup-winnow-pairs",
    "text-kn-lm-score",
    "graph-pagerank",
    "layout-zorder",
    # r12 heavies — all over the inflated documents table
    "curate-gate-documents",
    "curate-dsir-weights",
    "text-bm25-topk",
    "text-ngram-novelty",
    "text-token-entropy",
    # r13 (VERDICT r12 item 7): the r12-close pair — phash decodes
    # synthesized image payloads off the inflated documents, asof
    # joins the inflated events — plus the newly-promoted composed
    # CCNet pipeline
    "mm-phash-clusters",
    "join-asof-tolerance",
    "ccnet-curate",
    # r13 optimization round: the remaining queries this round
    # restructured (bloom literal probe, decontaminate build side)
    "dedup-bloom-exact",
    "text-decontaminate",
    # r14: hashed-candidate + exact-confirm containment restructure
    "dedup-containment",
]


def _shuffle_totals(sc) -> tuple[int, int]:
    """JVM-wide cumulative shuffle (read, write) bytes across all
    executors (local mode: the one driver executor), via the status
    store's executor summaries."""
    store = sc._jsc.sc().statusStore()
    read = write = 0
    it = store.executorList(False).iterator()
    while it.hasNext():
        e = it.next()
        read += e.totalShuffleRead()
        write += e.totalShuffleWrite()
    return read, write


def main() -> int:
    args = list(sys.argv[1:])
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    scratch = args[1] if len(args) > 1 else "/tmp/spark_graft_sf1"
    spark = get_spark("sf1-checkpoint")
    sc = spark.sparkContext

    docs_path = os.path.join(scratch, "documents.parquet")
    if not os.path.exists(docs_path):
        os.makedirs(scratch, exist_ok=True)
        base = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # the copy offset must dominate every source id or copies
        # collide (corrupting dedup-family results at sf1)
        max_id = base.agg(F.max("doc_id")).first()[0] or 0
        assert max_id < 1_000_000_000, (
            f"doc_id {max_id} >= 1e9: raise the inflation offset"
        )
        copies = [
            base.select(
                (F.col("doc_id") + F.lit(i * 1_000_000_000)).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"c{i}$1").alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            for i in range(10)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.repartition(32).write.mode("overwrite").parquet(docs_path)
        # the other tables ride along unchanged (the facts axis is
        # covered by scale_smoke facts mode); copy cheaply via link
        for t in (
            "region nation customer supplier part orders lineitem "
            "events embeddings".split()
        ):
            src = f"{sf_dir}/{t}.parquet"
            dst = os.path.join(scratch, f"{t}.parquet")
            if os.path.exists(src) and not os.path.exists(dst):
                if os.path.isdir(src):
                    shutil.copytree(src, dst)
                else:
                    shutil.copy(src, dst)

    # events and lineitem get the same 10x disjoint inflation
    # (graph-pagerank walks events; layout-zorder clusters lineitem —
    # at the unchanged sf0.1 copies their "sf1" rows would be
    # meaningless). Marker files make this idempotent over a scratch
    # dir written by the pre-r12 tool, which copied them UNinflated.
    def _ensure_inflated(table: str, build) -> None:
        path = os.path.join(scratch, f"{table}.parquet")
        marker = os.path.join(scratch, f".{table}.inflated")
        if os.path.exists(marker):
            return
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)
        build().repartition(32).write.mode("overwrite").parquet(path)
        open(marker, "w").close()

    def _events_10x():
        base = spark.read.parquet(f"{sf_dir}/events.parquet")
        mx = base.agg(F.greatest(F.max("event_id"), F.max("user_id"))).first()[0] or 0
        assert mx < 1_000_000_000, f"id {mx} >= 1e9: raise the offset"
        copies = [
            base.select(
                (F.col("event_id") + F.lit(i * 1_000_000_000)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * 1_000_000_000)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for i in range(10)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        return out

    def _lineitem_10x():
        base = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        mx = base.agg(F.max("l_orderkey")).first()[0] or 0
        assert mx < 1_000_000_000, f"l_orderkey {mx} >= 1e9: raise the offset"
        copies = [
            base.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * 1_000_000_000)
            )
            for i in range(10)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        return out

    _ensure_inflated("events", _events_10x)
    _ensure_inflated("lineitem", _lineitem_10x)

    n_docs = spark.read.parquet(docs_path).count()
    print(json.dumps({"scratch": scratch, "n_docs": n_docs}))

    from dug_data_ingest_spark.queries import all_queries

    queries = all_queries()
    results = {}
    for slug in HEAVY:
        if only is not None and slug not in only:
            continue
        fn = queries[slug]
        # noop sink, not count(): count() lets Catalyst prune every
        # expensive output column (observed: strip-spans' clean_text
        # rebuild optimized away entirely), under-measuring the op.
        # The DataFrame is REBUILT fresh inside each timed rep: a
        # reused plan instance replays its AQE-materialized stages
        # and localCheckpoints for free (observed: rep 2 of
        # dedup-cluster at 0.04 s), and some queries do eager work at
        # construction. Two reps, min taken (host noise waves); rows
        # counted untimed afterwards.
        walls = []
        reads, writes = [], []
        for _ in range(2):
            spark.catalog.clearCache()
            r0, w0 = _shuffle_totals(sc)
            t0 = time.time()
            fn(spark, scratch).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.time() - t0)
            r1, w1 = _shuffle_totals(sc)
            reads.append(r1 - r0)
            writes.append(w1 - w0)
        pick = walls.index(min(walls))
        n = fn(spark, scratch).count()
        results[slug] = {
            "wall_s": round(walls[pick], 2),
            "walls": [round(w, 2) for w in walls],
            "rows": n,
            "shuffle_read_mb": round(reads[pick] / 1e6, 1),
            "shuffle_write_mb": round(writes[pick] / 1e6, 1),
        }
        print(json.dumps({slug: results[slug]}))
    print(json.dumps({"sf1_checkpoint": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
