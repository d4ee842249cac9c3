"""Composition pin for ext/curation.py::ccnet_curate — the CCNet
pipeline (Wenzek et al. 2020) end to end. Each stage carries its own
model pins (test_paragraph_dedup, test_text_functions' langid,
text-lm-score's oracle, test_perplexity_buckets); this file checks the
HANDOFFS: dedup feeds langid feeds scoring feeds buckets, and the
documented drop/NULL semantics hold at the seams.
"""

from __future__ import annotations

from dug_data_ingest_spark.ext.curation import ccnet_curate

BOILER = "accept all cookies to continue reading this site"

EN = [
    "the quick brown fox jumps over the lazy dog in the field today",
    "a fox and a dog play near the barn while the farmer watches them",
    "the lazy dog sleeps in the warm sun near the old barn every day",
    "every farmer in the field watches the quick brown fox with a dog",
    "the dog and the fox run through the field near the barn together",
    "a quick brown fox jumps over a lazy dog near the field again",
]

ROWS = (
    # six content docs, each with the boilerplate paragraph attached
    [(i, f"{BOILER}\n{EN[i]}") for i in range(6)]
    # a doc that is ONLY boilerplate: emptied by the scrub, must drop
    + [(20, BOILER)]
    # NULL text: never enters the pipeline
    + [(21, None)]
)


def _run(spark):
    docs = spark.createDataFrame(ROWS, "doc_id int, text string")
    return ccnet_curate(docs).collect()


def test_ccnet_stage_handoffs(spark):
    rows = {r["doc_id"]: r for r in _run(spark)}

    # boilerplate-only and NULL-text docs leave the corpus
    assert 20 not in rows and 21 not in rows
    assert set(rows) == set(range(6))

    # §3.1: the scrub kept the corpus-wide FIRST boilerplate occurrence
    # (doc 0) and stripped it everywhere else; content survives intact
    assert rows[0]["text"] == f"{BOILER}\n{EN[0]}"
    for i in range(1, 6):
        assert rows[i]["text"] == EN[i], rows[i]["text"]
        assert rows[i]["n_dropped"] == 1 and rows[i]["n_paras"] == 2

    # §3.2: language ID ran over the CLEANED text
    assert all(r["lang"] is not None for r in rows.values())

    # §3.3: scored docs carry a bucket; orientation is logprob-descending
    # (head is the most fluent) — check ordering within each lang group
    by_lang: dict = {}
    for r in rows.values():
        if r["avg_logprob"] is not None and r["ppl_bucket"] is not None:
            by_lang.setdefault(r["lang"], []).append(r)
    assert by_lang, "no scored docs at all"
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, rs in by_lang.items():
        rs = sorted(rs, key=lambda r: (-r["avg_logprob"], r["doc_id"]))
        buckets = [order[r["ppl_bucket"]] for r in rs]
        assert buckets == sorted(buckets), (lang, [(r["doc_id"], r["avg_logprob"], r["ppl_bucket"]) for r in rs])

    # unscored (no in-head bigram) => NULL bucket, never "tail"
    for r in rows.values():
        if r["avg_logprob"] is None:
            assert r["ppl_bucket"] is None


def test_ccnet_output_schema(spark):
    docs = spark.createDataFrame(ROWS, "doc_id int, text string")
    out = ccnet_curate(docs)
    assert out.columns == [
        "doc_id", "text", "n_paras", "n_dropped", "lang",
        "n_bigrams", "avg_logprob", "ppl_bucket",
    ]


def test_lm_head_take_ordered(spark):
    # the LM frequency head inside corpus_lm_scores is a
    # TakeOrderedAndProject (per-partition heaps, k-row driver merge),
    # never a range-partitioned global sort — pinned here because
    # ccnet_curate's returned plan hides it behind the r13
    # localCheckpoint of the scored table
    from dug_data_ingest_spark.ext.curation import corpus_lm_scores

    docs = spark.createDataFrame(ROWS, "doc_id int, text string").where(
        "text is not null"
    )
    out = corpus_lm_scores(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
