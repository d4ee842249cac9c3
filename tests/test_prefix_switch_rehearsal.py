"""Round-10 switch rehearsal: the prefix-filtered exact Jaccard path
against the EXACT-semantics DuckDB oracle (the capped oracle minus its
QUALIFY), through the same frame comparison the driver gate uses.

When round 10 swaps the graded jaccard-pair family onto
``ngram_jaccard_pairs_prefix`` (SURVEY round-9 notes), both sides of
the new pair are already written and proven here — the swap becomes a
move, not new work, and any drift between the prefix path and the
exact SQL definition surfaces a round early.
"""

from __future__ import annotations

from dug_data_ingest_spark.queries.extensions import _SHINGLES_CTE
from tests.conftest import TEST_SF_DIR, assert_frames_match

# _JACCARD_ORACLE without the _KEPT_CTE df cap: the literal exact
# definition the prefix path implements
EXACT_JACCARD_ORACLE = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM sh x JOIN sh y USING (s) WHERE x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT a, b, ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE ROUND(i * 1.0 / (sa.n + sb.n - i), 4) >= 0.8
"""


_EXACT_GRAPH_CTES = f"""
{_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM sh x JOIN sh y USING (s) WHERE x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
pairs AS (
  SELECT a, b FROM inter JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE ROUND(i * 1.0 / (sa.n + sb.n - i), 4) >= 0.8
),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
),
comp AS (SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node)
"""

EXACT_CLUSTER_ORACLE = f"""
WITH RECURSIVE {_EXACT_GRAPH_CTES}
SELECT doc_id, component FROM comp
"""

EXACT_SURVIVORS_ORACLE = f"""
WITH RECURSIVE {_EXACT_GRAPH_CTES}
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id != component)
"""


def test_prefix_path_matches_exact_oracle(spark, duck):
    from dug_data_ingest_spark.ext.dedup import ngram_jaccard_pairs_prefix

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    df = ngram_jaccard_pairs_prefix(docs, threshold=0.8)
    assert_frames_match(df, duck.sql(EXACT_JACCARD_ORACLE), "prefix-jaccard-exact")


def test_prefix_cluster_matches_exact_reachability(spark, duck):
    from dug_data_ingest_spark.ext.dedup import (
        duplicate_clusters,
        ngram_jaccard_pairs_prefix,
    )

    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
    pairs = ngram_jaccard_pairs_prefix(docs, threshold=0.8)
    assert_frames_match(
        duplicate_clusters(pairs),
        duck.sql(EXACT_CLUSTER_ORACLE),
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
        survivors, duck.sql(EXACT_SURVIVORS_ORACLE), "prefix-survivors-exact"
    )
