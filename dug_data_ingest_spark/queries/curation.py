"""Curation slugs: the post-dedup corpus-preparation operators an
LLM training-data pipeline runs (decontamination, reproducible
sampling, sequence packing, vocabulary). Oracles replay the exact
deterministic algorithm in DuckDB — same normalization as
functions/text.py, same md5 bucketing as ext/dedup.py, and a
recursive CTE that replays the greedy packer — so the gate verifies
values, not just shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dug_data_ingest_spark.ext.curation import (
    decontaminate,
    hash_sample,
    mix_sample,
    pack_sequences,
    vocab_topk,
    with_token_counts,
)
from dug_data_ingest_spark.queries import load, query

# Same normalization as extensions._WORDS (functions/text.py::normalized_words).
_WORDS = (
    "regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' +')"
)

# k=5 shingles (the decontamination width; extensions._SHINGLES_CTE is k=3).
_SHINGLES5_CTE = f"""
words5 AS (SELECT doc_id, {_WORDS} AS w FROM documents),
sh5 AS (
  SELECT DISTINCT doc_id, s FROM words5,
  unnest(CASE WHEN len(w) >= 5
              THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
              ELSE []::VARCHAR[] END) t(s)
)
"""

# The eval-set stand-in: every 10th doc plays the benchmark corpus.
_EVAL_PRED = "doc_id % 10 = 7"


@query(
    "text-decontaminate",
    oracle=f"""
    WITH {_SHINGLES5_CTE},
    eval_sh AS (SELECT DISTINCT s FROM sh5 WHERE {_EVAL_PRED}),
    contaminated AS (
      SELECT DISTINCT doc_id FROM sh5
      WHERE NOT ({_EVAL_PRED}) AND s IN (SELECT s FROM eval_sh)
    )
    SELECT doc_id, source FROM documents
    WHERE NOT ({_EVAL_PRED})
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any 5-gram
    shingle with the eval split are dropped. Eval side is the small
    side by construction (benchmarks), so its shingle set broadcasts
    and the corpus is scanned exactly once (ext/curation.py:
    decontaminate). Reference analogue: the reference screens input
    rows against a known-id skiplist (filters in its ingest scripts);
    this is the content-level version a training pipeline needs."""
    docs = load(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 10 == 7
    survivors = decontaminate(docs.filter(~is_eval), docs.filter(is_eval), k=5)
    return survivors.select("doc_id", "source")


@query(
    "pipeline-hash-sample",
    oracle="""
    WITH b AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % 100 AS bucket
      FROM documents)
    SELECT doc_id, source, bucket FROM b WHERE bucket < 7
    """,
)
def pipeline_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 7% subsample via md5 bucketing of the key — the
    engine-portable sample (same rows kept under any partitioning,
    any engine), proven by DuckDB computing the identical kept set
    from the identical formula. Row-local: no shuffle, fully pushed
    scan (ext/curation.py:hash_sample)."""
    docs = load(spark, sf_dir, "documents")
    return hash_sample(docs, pct=7).select("doc_id", "source", "bucket")


@query(
    "pipeline-pack-sequences",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT source, doc_id,
             CAST(COALESCE(len(regexp_split_to_array(trim(text), '\\s+')), 0) AS INT)
               AS n_tok,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ),
    pack AS (
      SELECT source, doc_id, n_tok, rn, 1 AS chunk, n_tok AS acc
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.source, t.doc_id, t.n_tok, t.rn,
             CASE WHEN p.acc + t.n_tok <= 256 THEN p.chunk ELSE p.chunk + 1 END,
             CASE WHEN p.acc + t.n_tok <= 256 THEN p.acc + t.n_tok ELSE t.n_tok END
      FROM toks t JOIN pack p ON t.source = p.source AND t.rn = p.rn + 1
    )
    SELECT source, doc_id, n_tok, CAST(chunk AS INT) AS chunk FROM pack
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing into 256-token training chunks, one
    independent packing per source. The sequential walk is the
    DuckDB recursive CTE on the oracle side and a per-group pandas
    walk on the Spark side (ext/curation.py:pack_sequences) — the
    gate proves the distributed packer reproduces the sequential
    semantics exactly, per group, at every row."""
    docs = load(spark, sf_dir, "documents")
    return pack_sequences(docs, cap=256)


@query(
    "pipeline-mix-sample",
    oracle="""
    SELECT doc_id, lang, source, bucket FROM (
      SELECT doc_id, lang, source,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % 100 AS bucket,
             CASE lang WHEN 'en' THEN 50 WHEN 'es' THEN 25 WHEN 'zh' THEN 25
                  ELSE 5 END AS pct
      FROM documents)
    WHERE bucket < pct
    """,
)
def pipeline_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mix sampling: en at 50%, es/zh at 25%, everything else at
    5% — the per-stratum rate table broadcast-joined, the keep
    decision the same md5 bucket as pipeline-hash-sample (so mixes
    nest across recipe revisions; ext/curation.py:mix_sample). The
    oracle collapses the broadcast join to the equivalent CASE — the
    values must agree exactly."""
    docs = load(spark, sf_dir, "documents")
    weights = spark.createDataFrame(
        [("en", 50), ("es", 25), ("zh", 25)], ["lang", "pct"]
    )
    return mix_sample(docs, weights, default_pct=5).select(
        "doc_id", "lang", "source", "bucket"
    )


@query(
    "pipeline-curate-corpus",
    oracle=f"""
    WITH {_SHINGLES5_CTE},
    train AS (SELECT * FROM documents WHERE NOT ({_EVAL_PRED})),
    dedup AS (
      SELECT * FROM train
      QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5(text))
    ),
    eval_sh AS (SELECT DISTINCT s FROM sh5 WHERE {_EVAL_PRED}),
    contaminated AS (
      SELECT DISTINCT doc_id FROM sh5
      WHERE doc_id IN (SELECT doc_id FROM dedup)
        AND s IN (SELECT s FROM eval_sh)
    ),
    good AS (
      SELECT doc_id, source,
             CAST(COALESCE(len(regexp_split_to_array(trim(text), '\\s+')), 0) AS INT)
               AS n_tok
      FROM dedup
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT doc_id, source, n_tok, bucket FROM (
      SELECT *,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % 100 AS bucket
      FROM good WHERE n_tok >= 20)
    WHERE bucket < 50
    """,
)
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline as ONE declarative plan: exact
    dedup (min-id per content hash; window not join, so null-text
    groups keep a survivor) → benchmark decontamination (5-gram
    overlap with the eval split) → quality gate (≥ 20 whitespace
    tokens) → reproducible 50% md5-bucket sample.

    Composition is where the Spark-first design pays: every stage is
    Column expressions or a broadcast join, so Catalyst sees the
    whole pipeline at once — the scan is shared, the quality gate and
    the sample predicate are row-local, and the only corpus shuffles
    are the two keyed ones the semantics force (content-hash window,
    shingle explode for the contamination check). Stage order is
    semantic, not accidental: dedup before decontaminate (cheaper
    contamination check over survivors), sample last (sampling before
    dedup would make 'duplicate' depend on the sample)."""
    docs = load(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 10 == 7
    train, eval_docs = docs.filter(~is_eval), docs.filter(is_eval)
    w = Window.partitionBy(F.md5(F.col("text")))
    deduped = (
        train.withColumn("_canon", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_canon"))
        .drop("_canon")
    )
    clean = decontaminate(deduped, eval_docs, k=5)
    good = with_token_counts(clean).filter(F.col("n_tok") >= 20)
    return hash_sample(good, pct=50).select("doc_id", "source", "n_tok", "bucket")


@query(
    "text-vocab-topk",
    oracle=f"""
    WITH words AS (SELECT doc_id, unnest({_WORDS}) AS token FROM documents),
    counts AS (
      SELECT token, CAST(count(DISTINCT doc_id) AS INT) AS n_docs,
             CAST(count(*) AS INT) AS n_total
      FROM words WHERE token IS NOT NULL AND token != '' GROUP BY token
    )
    SELECT token, n_docs, n_total FROM counts
    ORDER BY n_total DESC, token LIMIT 50
    """,
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus vocabulary with document and total frequencies;
    deterministic tie-break so the top-k SET is engine-stable. Plan:
    one partial-aggregated groupBy + TakeOrderedAndProject
    (ext/curation.py:vocab_topk)."""
    docs = load(spark, sf_dir, "documents")
    return vocab_topk(docs, n=50)
