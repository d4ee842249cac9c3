"""Model pins for ext/dedup.py::winnow_fingerprints (Schleimer et al.
2003). The selection is replayed by a pure-Python winnow over the same
md5 k-gram hashes; the paper's two properties are pinned directly —
density (~2/(w+1) per token, never more than one per window) and the
guarantee (a verbatim overlap of >= w+k-1 tokens shares at least one
fingerprint) — plus partition stability and the row-local no-exchange
plan.
"""

from __future__ import annotations

import hashlib
import re

import pytest

from dug_data_ingest_spark.ext.dedup import winnow_fingerprints

K, W = 3, 4


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _norm_words(text: str | None) -> list[str]:
    if text is None:
        return []
    s = re.sub(r"[^a-z0-9 ]", "", text.lower()).strip()
    return [w for w in s.split(" ") if w != ""]


def _model_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    words = _norm_words(text)
    if len(words) < w + k - 1:
        return set()
    hs = [
        _md5_60(" ".join(words[i : i + k]))
        for i in range(len(words) - k + 1)
    ]
    out: set[tuple[int, int]] = set()
    for j in range(len(hs) - w + 1):
        # rightmost minimum of hs[j .. j+w-1], positions 1-based
        best_p = j
        for p in range(j, j + w):
            if hs[p] <= hs[best_p]:
                best_p = p
        out.add((best_p + 1, hs[best_p]))
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the old barn today again"),
    (1, "stock prices fell sharply as markets digested the surprise earnings news overnight"),
    (2, "short text"),  # below w+k-1: emits nothing
    (3, None),
    (4, ""),
    # doc 5 repeats an exact 10-token span of doc 0 (>= w+k-1 = 6):
    # the guarantee demands a shared fingerprint
    (5, "completely different opening words then the quick brown fox jumps over the lazy dog near something else entirely"),
]


def _got(spark, df=None):
    frame = df if df is not None else spark.createDataFrame(
        DOCS, "doc_id int, text string"
    )
    rows = winnow_fingerprints(frame, k=K, w=W).collect()
    out: dict[int, set] = {}
    for r in rows:
        out.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    return out


def test_selection_matches_python_winnow(spark):
    got = _got(spark)
    for doc_id, text in DOCS:
        expect = _model_winnow(text) if text else set()
        assert got.get(doc_id, set()) == expect, doc_id
    assert 2 not in got and 3 not in got and 4 not in got


def test_density_bound(spark):
    # never more than one fingerprint per window, i.e. <= n_windows,
    # and empirically near 2/(w+1) per k-gram on natural-ish text
    got = _got(spark)
    for doc_id, text in DOCS:
        if not text:
            continue
        n_grams = max(0, len(_norm_words(text)) - K + 1)
        n_windows = n_grams - W + 1
        if n_windows < 1:
            continue
        assert 1 <= len(got[doc_id]) <= n_windows
        # w-fold reduction vs the every-position index on real sizes
        if n_grams >= 10:
            assert len(got[doc_id]) < n_grams


def test_shared_span_guarantee(spark):
    # docs 0 and 5 share an exact 10-token span >= w+k-1=6: they MUST
    # share at least one fingerprint VALUE (positions differ)
    got = _got(spark)
    fps0 = {fp for _, fp in got[0]}
    fps5 = {fp for _, fp in got[5]}
    assert fps0 & fps5, "guaranteed shared fingerprint missing"
    # disjoint docs share nothing
    fps1 = {fp for _, fp in got[1]}
    assert not (fps0 & fps1)


def test_partition_stability_and_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    assert _got(spark, df.repartition(7)) == _got(spark, df.coalesce(1))
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, w=1)


def test_plan_is_row_local(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    plan = (
        winnow_fingerprints(df, k=K, w=W)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


# --- candidate pairs (winnow_candidate_pairs) -------------------------------


def test_candidate_pairs_find_the_planted_overlap(spark):
    # docs 0 and 5 share a 10-token verbatim span (>= w+k-1): the
    # guarantee gives >= 1 shared fingerprint, and MOSS's pair step
    # must surface the pair at min_shared=1
    from dug_data_ingest_spark.ext.dedup import winnow_candidate_pairs

    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    pairs = {
        (r["a"], r["b"]): r["n_shared"]
        for r in winnow_candidate_pairs(
            df, k=K, w=W, min_shared=1, max_doc_freq=None
        ).collect()
    }
    assert (0, 5) in pairs
    # unrelated docs share nothing
    assert (0, 1) not in pairs and (1, 5) not in pairs


def test_candidate_pairs_match_set_model(spark):
    # n_shared equals the intersection size of the distinct
    # fingerprint sets — replayed from winnow_fingerprints itself
    from dug_data_ingest_spark.ext.dedup import winnow_candidate_pairs

    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    fps = _got(spark)
    sets = {d: {fp for _, fp in v} for d, v in fps.items()}
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            n = len(sets[a] & sets[b])
            if n >= 1:
                want[(a, b)] = n
    got = {
        (r["a"], r["b"]): r["n_shared"]
        for r in winnow_candidate_pairs(
            df, k=K, w=W, min_shared=1, max_doc_freq=None
        ).collect()
    }
    assert got == want


def test_candidate_pairs_df_cap_drops_boilerplate(spark):
    # a fingerprint present in every doc is boilerplate: with
    # max_doc_freq below the corpus size it must not generate pairs
    from dug_data_ingest_spark.ext.dedup import winnow_candidate_pairs

    boiler = "exactly the same boilerplate sentence repeated verbatim here"
    docs = [(i, f"{boiler} unique tail {i} " + " ".join(
        f"w{i}x{j}" for j in range(8))) for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    capped = winnow_candidate_pairs(df, k=K, w=W, min_shared=1, max_doc_freq=3)
    uncapped = winnow_candidate_pairs(
        df, k=K, w=W, min_shared=1, max_doc_freq=None
    )
    assert uncapped.count() == 15  # all C(6,2) pairs share boilerplate
    # the all-doc boilerplate fingerprints (df = 6 > 3) are dropped;
    # only boundary k-grams straddling the boilerplate/tail junction
    # (whose distinct digits keep their df under the cap) survive, so
    # the pair list shrinks and every surviving pair carries strictly
    # fewer shared fingerprints than its uncapped twin
    n_capped = capped.count()
    assert n_capped < 15, n_capped
    cap_map = {(r["a"], r["b"]): r["n_shared"] for r in capped.collect()}
    full_map = {(r["a"], r["b"]): r["n_shared"] for r in uncapped.collect()}
    for pair, n in cap_map.items():
        assert n < full_map[pair], (pair, n, full_map[pair])


def test_candidate_pairs_validation(spark):
    import pytest as _pytest

    from dug_data_ingest_spark.ext.dedup import winnow_candidate_pairs

    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    with _pytest.raises(ValueError, match="min_shared"):
        winnow_candidate_pairs(df, min_shared=0)
