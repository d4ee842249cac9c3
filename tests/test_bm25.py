"""Model pins for ext/retrieval.py — Okapi BM25 scored against a
pure-Python walk of the published formula (Robertson & Zaragoza 2009,
the +1-inside-log idf variant), plus the determinism contracts the
docstrings promise.
"""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from dug_data_ingest_spark.ext.retrieval import bm25_scores, bm25_topk

DOCS = [
    (1, "hash join beats sort merge join for small tables"),
    (2, "filter pushdown then hash the probe side"),
    (3, "a broadcast join avoids the shuffle entirely"),
    (4, "no relevant terms here at all"),
    (5, ""),
    (6, None),
    (7, "join join join join join"),
]
TERMS = ["hash", "join", "filter"]


def _words(text):
    if text is None:
        return []
    return [w for w in re.sub(r"[^a-z0-9 ]", "", text.lower()).strip().split(" ") if w]


def _model(k1=1.2, b=0.75):
    toks = {i: _words(t) for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(w) for w in toks.values()) / n
    out = {}
    for i, ws in toks.items():
        score = 0.0
        for t in TERMS:
            tf = ws.count(t)
            if not tf:
                continue
            df = sum(1 for w in toks.values() if t in w)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            score += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * len(ws) / avgdl)
            )
        out[i] = round(score, 4)
    return out


def test_bm25_matches_python_model(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(df, TERMS).collect()
    }
    assert got == _model()


def test_bm25_topk_orders_by_rounded_score_then_id(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_topk(df, TERMS, k=3).collect()
    model = _model()
    want = sorted(model, key=lambda i: (-model[i], i))[:3]
    assert [r["doc_id"] for r in rows] == want


def test_bm25_zero_for_no_term_null_and_empty(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, TERMS).collect()}
    assert got[4] == 0.0 and got[5] == 0.0 and got[6] == 0.0


def test_bm25_rejects_bad_queries(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        bm25_scores(df, ["join", "join"])


def test_bm25_partition_invariant(spark):
    # the determinism contract: fixed-order term summation means the
    # scores cannot move with partitioning
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    one = {r["doc_id"]: r["bm25"]
           for r in bm25_scores(df.coalesce(1), TERMS).collect()}
    many = {r["doc_id"]: r["bm25"]
            for r in bm25_scores(df.repartition(7, "doc_id"), TERMS).collect()}
    assert one == many
