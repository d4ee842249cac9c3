"""Pins for ext/curation.py::perplexity_buckets — the CCNet §3.3
head/middle/tail split. The cuts are per-stratum approx quantiles
(exact in the small-n regime, see the docstring), so the pins are
semantic: bucket boundaries are monotone within every stratum, counts
track the fractions, strata are independent, NULL score/lang behave
per contract, and the assignment plan is a broadcast join plus a
row-local projection.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dug_data_ingest_spark.ext.curation import perplexity_buckets

# two languages with disjoint score ranges so cross-stratum leakage
# would be caught immediately, plus a NULL-language stratum and NULL
# scores sprinkled in
ROWS = (
    [(i, "en", float(i)) for i in range(30)]
    + [(100 + i, "fr", 1000.0 + i) for i in range(12)]
    + [(200 + i, None, 50.0 + i) for i in range(9)]
    + [(300, "en", None), (301, None, None)]
)


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id int, lang string, ppl double")


def _buckets(df):
    return {
        r["doc_id"]: r["ppl_bucket"]
        for r in df.select("doc_id", "ppl_bucket").collect()
    }


def test_buckets_are_monotone_and_fraction_sized_per_stratum(spark):
    out = perplexity_buckets(_df(spark), "ppl")
    rows = out.where("ppl is not null").collect()
    for lang, n in (("en", 30), ("fr", 12), (None, 9)):
        part = [r for r in rows if r["lang"] == lang]
        by = {
            lab: sorted(r["ppl"] for r in part if r["ppl_bucket"] == lab)
            for lab in ("head", "middle", "tail")
        }
        assert all(by.values()), f"{lang}: empty bucket {by}"
        assert max(by["head"]) <= min(by["middle"]) <= max(by["middle"]) <= min(by["tail"])
        # terciles of n rows: each bucket within 1 of n/3
        for lab in by:
            assert abs(len(by[lab]) - n / 3) <= 1, (lang, lab, by)


def test_null_score_gets_null_bucket_and_rows_are_preserved(spark):
    df = _df(spark)
    out = perplexity_buckets(df, "ppl")
    assert out.count() == df.count()
    got = _buckets(out)
    assert got[300] is None and got[301] is None


def test_strata_are_independent(spark):
    # fr scores are 1000+ yet must still split head/middle/tail —
    # global cuts would shove all of fr into tail
    got = _buckets(perplexity_buckets(_df(spark), "ppl"))
    fr = [got[100 + i] for i in range(12)]
    assert set(fr) == {"head", "middle", "tail"}
    assert fr == sorted(fr, key=("head", "middle", "tail").index)


def test_descending_orientation_flips_head(spark):
    # avg_logprob convention: HIGH score = fluent = head
    got = _buckets(
        perplexity_buckets(_df(spark), "ppl", ascending=False)
    )
    assert got[29] == "head" and got[0] == "tail"


def test_global_mode_and_custom_fractions(spark):
    out = perplexity_buckets(
        _df(spark),
        "ppl",
        group_col=None,
        fractions=(0.5,),
        labels=("keep", "drop"),
        bucket_col="half",
    )
    rows = [r for r in out.collect() if r["ppl"] is not None]
    keep = sorted(r["ppl"] for r in rows if r["half"] == "keep")
    drop = sorted(r["ppl"] for r in rows if r["half"] == "drop")
    assert keep and drop and max(keep) <= min(drop)
    assert abs(len(keep) - len(rows) / 2) <= 1


def test_partition_stability_in_the_exact_regime(spark):
    df = _df(spark)
    a = _buckets(perplexity_buckets(df.repartition(7), "ppl"))
    b = _buckets(perplexity_buckets(df.coalesce(1), "ppl"))
    assert a == b


def test_argument_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        perplexity_buckets(df, "ppl", labels=("a", "b"))  # len mismatch
    with pytest.raises(ValueError):
        perplexity_buckets(df, "ppl", fractions=(0.7, 0.3))
    with pytest.raises(ValueError):
        perplexity_buckets(df, "ppl", fractions=(0.0, 0.5))
    with pytest.raises(ValueError):
        perplexity_buckets(
            df.withColumn("ppl_bucket", df.doc_id), "ppl"
        )


def test_staging_column_collisions_survive(spark):
    # a caller's own __ppl_cuts / __ppl_g columns must come back
    # intact (the gate_documents lesson)
    df = (
        _df(spark)
        .withColumn("__ppl_cuts", F.lit("mine"))
        .withColumn("__ppl_g", F.lit(7))
    )
    out = perplexity_buckets(df, "ppl")
    assert out.count() == df.count()
    row = out.where("doc_id = 0").collect()[0]
    assert row["__ppl_cuts"] == "mine" and row["__ppl_g"] == 7
    assert row["ppl_bucket"] == "head"


def test_assignment_plan_is_broadcast_plus_projection(spark):
    out = perplexity_buckets(_df(spark), "ppl")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    # no global single-partition exchange anywhere: the rollup is a
    # per-stratum hash aggregate, never a sort of the corpus
    assert "Exchange SinglePartition" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
