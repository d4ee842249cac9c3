"""Local twin of the driver gate for the prefix-filtered exact
Jaccard family (the round-10 switch, rehearsed in round 9 and graded
from round 10 on).

Since round 10 the registered ``dedup-ngram-jaccard`` /
``dedup-cluster`` / ``dedup-survivors`` pairs run
``ngram_jaccard_pairs_prefix`` against EXACT-semantics DuckDB oracles
(the capped oracle minus its QUALIFY). These tests run the SAME
graded pairs through the same frame comparison the driver gate uses,
so any drift between the prefix path and the exact SQL definition
surfaces locally before a driver round does.
"""

from __future__ import annotations

from dug_data_ingest_spark.queries.extensions import (
    _CLUSTER_ORACLE,
    _JACCARD_ORACLE,
    _SURVIVORS_ORACLE,
)
from tests.conftest import TEST_SF_DIR, assert_frames_match


def test_prefix_path_matches_exact_oracle(spark, duck):
    from dug_data_ingest_spark.ext.dedup import ngram_jaccard_pairs_prefix

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    df = ngram_jaccard_pairs_prefix(docs, threshold=0.8)
    assert_frames_match(df, duck.sql(_JACCARD_ORACLE), "prefix-jaccard-exact")


def test_prefix_cluster_matches_exact_reachability(spark, duck):
    from dug_data_ingest_spark.ext.dedup import (
        duplicate_clusters,
        ngram_jaccard_pairs_prefix,
    )

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    pairs = ngram_jaccard_pairs_prefix(docs, threshold=0.8)
    assert_frames_match(
        duplicate_clusters(pairs),
        duck.sql(_CLUSTER_ORACLE),
        "prefix-cluster-exact",
    )


def test_prefix_survivors_match_exact_reachability(spark, duck):
    from dug_data_ingest_spark.ext.dedup import (
        ngram_jaccard_pairs_prefix,
        non_canonical_ids,
    )

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    pairs = ngram_jaccard_pairs_prefix(docs, threshold=0.8)
    drop = non_canonical_ids(pairs)
    survivors = docs.join(drop, "doc_id", "left_anti").select("doc_id")
    assert_frames_match(
        survivors, duck.sql(_SURVIVORS_ORACLE), "prefix-survivors-exact"
    )
