"""Model pins for CCNet paragraph-level dedup (ext/dedup.py::
paragraph_dedup, Wenzek et al. 2020 §3.1): the Spark plan replayed by
a pure-Python walk of the same rules — normalized-hash counting,
corpus-wide first-occurrence canonical, structural (empty-normalized)
paragraphs exempt. Library surface with a model pin (the output is a
rebuilt corpus, not an engine-exact aggregate), like semantic_dedup
and DSIR.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from dug_data_ingest_spark.ext.dedup import normalized_paragraph, paragraph_dedup

# Adversarial corpus: cross-doc boilerplate that only matches after
# normalization (case / punctuation / digit-collapse), a within-doc
# triplicate, pure-structure docs, NULL and empty texts, and a full
# verbatim doc pair.
DOCS = [
    ("d01", "Cookie Banner!\n\nunique alpha text one\ncookie   banner"),
    ("d02", "COOKIE banner?\nunique beta text two"),
    ("d03", "same para\nsame para\nsame para\ntail gamma"),
    ("d04", "version 2 release\nonly in delta"),
    ("d05", "version 3 release\nonly in epsilon"),
    ("d06", "!!!\n...\n???"),
    ("d07", None),
    ("d08", ""),
    ("d09", "twin body first\n\ntwin body second"),
    ("d10", "twin body first\n\ntwin body second"),
]


def _norm(p: str) -> str:
    p = re.sub(r"[0-9]", "0", p.lower())
    p = re.sub(r"[^a-z0 ]", "", p)
    return re.sub(r" +", " ", p).strip()


def _model(docs, keep="first", min_count=2):
    """Pure-Python walk of the documented semantics."""
    paras = [
        (d, i, p, _norm(p))
        for d, t in docs
        if t is not None
        for i, p in enumerate(t.split("\n"))
    ]
    counts: dict[str, int] = {}
    canon: dict[str, tuple[str, int]] = {}
    for d, i, _p, n in paras:
        if n == "":
            continue
        counts[n] = counts.get(n, 0) + 1
        if n not in canon or (d, i) < canon[n]:
            canon[n] = (d, i)
    out = {}
    for d, t in docs:
        if t is None:
            out[d] = (None, 0, 0)
            continue
        kept, dropped, total = [], 0, 0
        for i, p in enumerate(t.split("\n")):
            total += 1
            n = _norm(p)
            dup = n != "" and counts[n] >= min_count
            if dup and not (keep == "first" and canon[n] == (d, i)):
                dropped += 1
            else:
                kept.append(p)
        out[d] = ("\n".join(kept), total, dropped)
    return out


def _run(spark, keep="first", min_count=2):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    got = paragraph_dedup(df, keep=keep, min_count=min_count).collect()
    return {r.doc_id: (r.clean_text, r.n_paras, r.n_dropped) for r in got}


def test_paragraph_dedup_matches_model_keep_first(spark):
    assert _run(spark) == _model(DOCS)


def test_paragraph_dedup_matches_model_keep_none(spark):
    assert _run(spark, keep="none") == _model(DOCS, keep="none")


def test_paragraph_dedup_matches_model_min_count_3(spark):
    # at min_count=3 the cross-doc pairs (digit-collapse, twins)
    # survive; the triple-count paragraphs (same-para x3, cookie
    # banner x3) still dedup
    assert _run(spark, min_count=3) == _model(DOCS, min_count=3)


def test_paragraph_dedup_keep_first_invariants(spark):
    got = _run(spark)
    # canonical survives: d01 keeps its first banner, d02 loses its
    # normalized twin, d03 keeps exactly one of three
    assert got["d01"][0].startswith("Cookie Banner!")
    assert "banner" not in got["d02"][0].lower()
    assert got["d03"] == ("same para\ntail gamma", 4, 2)
    # digit collapse: d04 (earlier id) keeps, d05 drops
    assert got["d04"][2] == 0 and got["d05"][2] == 1
    # structure-only docs and empty/NULL texts pass through
    assert got["d06"] == ("!!!\n...\n???", 3, 0)
    assert got["d07"] == (None, 0, 0)
    assert got["d08"] == ("", 1, 0)
    # verbatim twin: d09 intact, d10 keeps only the blank separator
    assert got["d09"][0] == "twin body first\n\ntwin body second"
    assert got["d10"] == ("", 3, 2)


def test_paragraph_dedup_partition_stable(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string").repartition(7)
    got = {
        r.doc_id: (r.clean_text, r.n_paras, r.n_dropped)
        for r in paragraph_dedup(df).collect()
    }
    assert got == _model(DOCS)


def test_paragraph_dedup_plan_has_no_pairwise_stage(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    plan = paragraph_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_normalized_paragraph_expression(spark):
    rows = (
        spark.range(1)
        .select(
            normalized_paragraph(F.lit("  Ver 2.0 -- Beta!  ")).alias("a"),
            normalized_paragraph(F.lit("?!.")).alias("b"),
            normalized_paragraph(F.lit(None).cast("string")).alias("c"),
        )
        .collect()[0]
    )
    assert rows.a == "ver 00 beta"
    assert rows.b == ""
    assert rows.c is None


def test_paragraph_dedup_rejects_bad_keep(spark):
    import pytest

    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    with pytest.raises(ValueError):
        paragraph_dedup(df, keep="last")
