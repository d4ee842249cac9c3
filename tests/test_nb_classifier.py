"""Model pins for the hashed-n-gram naive-Bayes quality classifier
(ext/curation.py::nb_quality_log_odds — the closed-form stand-in for
the CCNet/LLaMA fasttext quality-classifier stage): log-odds replayed
by a pure-Python md5 walk, the prior-only score of featureless docs,
the empty-class guard, and the row-local scoring plan.
"""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F
import pytest

from dug_data_ingest_spark.ext.curation import nb_quality_log_odds

B = 64  # small bucket count so collisions actually occur in the test


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ids(text: str | None) -> list[int]:
    if text is None:
        return []
    w = [t for t in text.lower().strip().split(" ") if t != ""]
    grams = w + [f"{a} {b}" for a, b in zip(w, w[1:])]
    return [_md5_60(g) % B for g in grams]


POS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a fox and a dog play near the barn in the field"),
]
NEG = [
    (10, "zzz qqq xxx vvv kkk jjj click here buy now"),
    (11, "buy now zzz qqq limited offer click here now"),
    (12, "offer offer offer click click click zzz"),
]
DOCS = POS + NEG + [(20, "the quick dog near the barn"), (21, None), (22, "")]


def _model_log_odds(text: str | None) -> float:
    def logprobs(texts):
        counts = [0] * B
        for t in texts:
            for i in _ids(t):
                counts[i] += 1
        total = sum(counts) + B
        return [math.log((c + 1.0) / total) for c in counts]

    lp_p = logprobs([t for _, t in POS])
    lp_n = logprobs([t for _, t in NEG])
    prior = math.log(len(POS) / len(NEG))
    s = 0.0
    for i in _ids(text):
        s += lp_p[i] - lp_n[i]
    return prior + s


def _frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    pos = spark.createDataFrame(POS, "doc_id int, text string")
    neg = spark.createDataFrame(NEG, "doc_id int, text string")
    return docs, pos, neg


def test_log_odds_match_python_model(spark):
    docs, pos, neg = _frames(spark)
    got = {
        r["doc_id"]: r["nb_log_odds"]
        for r in nb_quality_log_odds(docs, pos, neg, n_buckets=B).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == pytest.approx(
            _model_log_odds(text), abs=1e-9
        ), doc_id


def test_positive_doc_scores_above_negative(spark):
    # sanity on the learned direction: a doc of positive-class words
    # must outscore a doc of negative-class words
    docs, pos, neg = _frames(spark)
    got = {
        r["doc_id"]: r["nb_log_odds"]
        for r in nb_quality_log_odds(docs, pos, neg, n_buckets=B).collect()
    }
    assert got[20] > got[10]


def test_featureless_doc_scores_exactly_the_prior(spark):
    # NULL and empty text contribute zero grams: score == ln(n_p/n_n)
    docs, pos, neg = _frames(spark)
    got = {
        r["doc_id"]: r["nb_log_odds"]
        for r in nb_quality_log_odds(docs, pos, neg, n_buckets=B).collect()
    }
    prior = math.log(len(POS) / len(NEG))
    assert got[21] == pytest.approx(prior, abs=1e-12)
    assert got[22] == pytest.approx(prior, abs=1e-12)


def test_empty_class_raises(spark):
    docs, pos, neg = _frames(spark)
    with pytest.raises(ValueError, match="both classes"):
        nb_quality_log_odds(docs, pos, neg.filter(F.lit(False)), n_buckets=B)


def test_out_col_collision_raises(spark):
    docs, pos, neg = _frames(spark)
    with pytest.raises(ValueError, match="nb_log_odds"):
        nb_quality_log_odds(
            docs.withColumn("nb_log_odds", F.lit(0.0)), pos, neg, n_buckets=B
        )


def test_scoring_is_row_local(spark):
    # the scored corpus must never shuffle: since r13 the ratios ride
    # as a constant-folded literal array (the old 1-row broadcast
    # crossJoin copied the array onto every row), so the scoring plan
    # has NO join of any kind, no hash exchange, no Python
    docs, pos, neg = _frames(spark)
    out = nb_quality_log_odds(docs, pos, neg, n_buckets=B)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Join" not in plan, plan
