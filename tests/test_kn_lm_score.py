"""Pins for ext/curation.py::kneser_ney_bigram_scores — interpolated
Kneser-Ney bigram scoring (the KN-smoothed LM behind CCNet's quality
filter, Wenzek et al. 2020 §3.3). The probability is a closed-form
function of four integer count tables, so the pin replays it in pure
Python token-for-token; partition stability and the no-head-cap
contract (every >=2-token doc scored) are pinned on the same corpus.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from dug_data_ingest_spark.ext.curation import kneser_ney_bigram_scores

D = 0.75

ROWS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the hat"),
    (2, "a dog ran in the park"),
    (3, "the dog sat in the park"),
    (4, "singleton"),  # 1 token: no bigrams, no output row
    (5, None),  # NULL text: no output row
    (6, "the cat the cat the cat"),  # within-doc repeats count
]


def _norm_words(text):
    return [w for w in re.sub(r"[^a-z0-9 ]", "", text.lower()).split() if w]


def _model_scores():
    bi_per_doc = {}
    corpus = Counter()
    for doc_id, text in ROWS:
        if text is None:
            continue
        w = _norm_words(text)
        bis = [f"{a} {b}" for a, b in zip(w, w[1:])]
        if bis:
            bi_per_doc[doc_id] = bis
            corpus.update(bis)
    c1dot = Counter()
    n1p_fw = Counter()
    n1p_end = Counter()
    for bg, c in corpus.items():
        w1, w2 = bg.split(" ")
        c1dot[w1] += c
        n1p_fw[w1] += 1
        n1p_end[w2] += 1
    n_types = len(corpus)
    out = {}
    for doc_id, bis in bi_per_doc.items():
        logps = []
        for bg in bis:
            w1, w2 = bg.split(" ")
            p = max(corpus[bg] - D, 0.0) / c1dot[w1] + (
                (D * n1p_fw[w1]) / c1dot[w1]
            ) * (n1p_end[w2] / n_types)
            logps.append(math.log(p))
        out[doc_id] = (len(bis), round(sum(logps) / len(logps), 4))
    return out


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id int, text string")


def test_kn_scores_match_pure_python_model(spark):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in kneser_ney_bigram_scores(_df(spark), discount=D).collect()
    }
    assert got == _model_scores()


def test_every_multiword_doc_is_scored(spark):
    # the no-head-cap contract: unlike corpus_lm_scores, no doc with
    # >= 2 tokens goes unscored
    ids = {
        r["doc_id"]
        for r in kneser_ney_bigram_scores(_df(spark)).select("doc_id").collect()
    }
    assert ids == {0, 1, 2, 3, 6}


def test_probabilities_sum_to_one_per_prefix(spark):
    # interpolated KN is a proper conditional distribution: summing
    # P(w2|w1) over the OBSERVED continuations of w1 plus the backoff
    # mass spread over unobserved w2 gives 1; equivalently the
    # discounted mass max(c-D,0)/c1dot plus D*N1+(w1.)/c1dot equals 1
    # restricted to observed types when P_cont sums to 1. Check the
    # algebraic identity on the model tables directly.
    model = _model_scores()
    assert model  # sanity: the identity below exercised real tables
    corpus = Counter()
    for doc_id, text in ROWS:
        if text is None:
            continue
        w = _norm_words(text)
        corpus.update(f"{a} {b}" for a, b in zip(w, w[1:]))
    c1dot = Counter()
    n1p_fw = Counter()
    n1p_end = Counter()
    for bg, c in corpus.items():
        w1, w2 = bg.split(" ")
        c1dot[w1] += c
        n1p_fw[w1] += 1
        n1p_end[w2] += 1
    n_types = len(corpus)
    pcont_total = sum(n1p_end.values()) / n_types  # == 1.0 by construction
    assert pcont_total == pytest.approx(1.0)
    for w1 in c1dot:
        observed = sum(
            max(corpus[bg] - D, 0.0) / c1dot[w1]
            for bg in corpus
            if bg.split(" ")[0] == w1
        )
        backoff_mass = (D * n1p_fw[w1]) / c1dot[w1]
        assert observed + backoff_mass == pytest.approx(1.0)


def test_partition_stable(spark):
    df = _df(spark)
    a = sorted(
        map(tuple, kneser_ney_bigram_scores(df.repartition(7)).collect())
    )
    b = sorted(
        map(tuple, kneser_ney_bigram_scores(df.coalesce(1)).collect())
    )
    assert a == b


def test_discount_validation(spark):
    with pytest.raises(ValueError, match="discount"):
        kneser_ney_bigram_scores(_df(spark), discount=1.5)


# --- held-out scoring (kneser_ney_score_batch) -----------------------------

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the hat"),
    (2, "a dog ran in the park"),
]
BATCH = [
    (10, "the cat sat"),  # all pairs seen
    (11, "the cat flew home"),  # "cat flew": w1 seen, w2 OOV; "flew home": both OOV
    (12, "mat the cat"),  # "mat the": pair unseen, w1 seen (backoff), w2 seen
    (13, "zzz the cat"),  # "zzz the": w1 unseen, w2 "the" seen (continuation tier)
    (14, "single"),  # no bigrams -> no row
]


def _model_batch():
    corpus = Counter()
    for _, text in CORPUS:
        w = _norm_words(text)
        corpus.update(f"{a} {b}" for a, b in zip(w, w[1:]))
    c1dot = Counter()
    n1p_fw = Counter()
    n1p_end = Counter()
    for bg, c in corpus.items():
        w1, w2 = bg.split(" ")
        c1dot[w1] += c
        n1p_fw[w1] += 1
        n1p_end[w2] += 1
    n_types = len(corpus)
    out = {}
    for doc_id, text in BATCH:
        w = _norm_words(text)
        bis = [f"{a} {b}" for a, b in zip(w, w[1:])]
        if not bis:
            continue
        logps, oov = [], 0
        for bg in bis:
            w1, w2 = bg.split(" ")
            if bg in corpus:
                p = max(corpus[bg] - D, 0.0) / c1dot[w1] + (
                    (D * n1p_fw[w1]) / c1dot[w1]
                ) * (n1p_end[w2] / n_types)
            elif w1 in c1dot and w2 in n1p_end:
                p = ((D * n1p_fw[w1]) / c1dot[w1]) * (n1p_end[w2] / n_types)
            elif w2 in n1p_end:
                p = n1p_end[w2] / n_types
            else:
                oov += 1
                continue
            logps.append(math.log(p))
        avg = round(sum(logps) / len(logps), 4) if logps else None
        out[doc_id] = (len(bis), oov, avg)
    return out


def test_heldout_scoring_matches_model_all_tiers(spark):
    from dug_data_ingest_spark.ext.curation import kneser_ney_score_batch

    corpus = spark.createDataFrame(CORPUS, "doc_id int, text string")
    batch = spark.createDataFrame(BATCH, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_oov"], r["avg_logprob"])
        for r in kneser_ney_score_batch(batch, corpus, discount=D).collect()
    }
    want = _model_batch()
    assert got == want
    # the fixture must actually exercise every tier: full-KN (10),
    # backoff (12), continuation-only (13), and OOV (11)
    assert want[11][1] == 2  # two OOV bigrams
    assert 12 in want and 13 in want


def test_heldout_all_oov_doc_scores_null(spark):
    from dug_data_ingest_spark.ext.curation import kneser_ney_score_batch

    corpus = spark.createDataFrame(CORPUS, "doc_id int, text string")
    batch = spark.createDataFrame(
        [(20, "qqq www eee")], "doc_id int, text string"
    )
    rows = kneser_ney_score_batch(batch, corpus).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_bigrams"], r["n_oov"], r["avg_logprob"]) == (2, 2, None)


def test_heldout_partition_stable(spark):
    from dug_data_ingest_spark.ext.curation import kneser_ney_score_batch

    corpus = spark.createDataFrame(CORPUS, "doc_id int, text string")
    batch = spark.createDataFrame(BATCH, "doc_id int, text string")
    a = sorted(map(tuple, kneser_ney_score_batch(
        batch.repartition(5), corpus.repartition(3)).collect()))
    b = sorted(map(tuple, kneser_ney_score_batch(
        batch.coalesce(1), corpus.coalesce(1)).collect()))
    assert a == b
