"""Deduplication operators over the documents table.

Five strategies, all shuffle-on-key DataFrame plans (no driver-side
state, no pairwise O(n²) over the full corpus):

- exact: hash-groupBy on md5(text)
- minhash LSH: shingle → k md5-derived min-hashes → banded signatures
  → bucket join (candidate pairs only ever compare within a bucket)
- simhash: 16-bit sign-aggregate of per-word hashes; near-dups share
  (or nearly share) the code
- n-gram Jaccard: shared-shingle candidate pairs + exact Jaccard
- embedding cosine: label-blocked (or LSH-blocked) pair generation

Scale notes: every strategy is (corpus → per-doc sketch → groupBy
sketch-key), so the only shuffle is on the sketch key; the pairwise
step touches candidate buckets, never the cross product. Cross-engine
determinism: hashes derive from md5 hex prefixes (xxhash64 differs
between engines), so the DuckDB oracles can replay them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dug_data_ingest_spark.functions.text import normalized_words, shingles


def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content hash: canonical (min) id + count."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_docs"),
        )
    )


def _md5_hash64(col: Column) -> Column:
    """Deterministic 60-bit integer hash from an md5 hex prefix —
    reproducible in any engine with md5 + hex parsing."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def doc_shingles(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Distinct k-word shingles per document: (id, shingle)."""
    return (
        docs.select(F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    doc_shingles_df: DataFrame, num_hashes: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """(id, seed, min_hash): k permutations via seeded md5 hashes.
    The crossJoin side is a k-row literal frame (broadcast); the min
    is a map-side-combined groupBy."""
    spark = doc_shingles_df.sparkSession
    seeds = spark.range(num_hashes).select(F.col("id").cast("int").alias("seed"))
    hashed = doc_shingles_df.crossJoin(F.broadcast(seeds)).select(
        F.col(id_col),
        "seed",
        _md5_hash64(
            F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("shingle"))
        ).alias("h"),
    )
    return hashed.groupBy(id_col, "seed").agg(F.min("h").alias("min_hash"))


def minhash_bands(
    signatures: DataFrame, rows_per_band: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """(id, band, band_key): md5 over the band's seed-ordered
    signature values — the LSH bucket key."""
    banded = signatures.withColumn(
        "band", (F.col("seed") / rows_per_band).cast("int")
    )
    ordered_vals = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("seed"), F.col("min_hash").alias("v")))
        ),
        lambda s: s.getField("v").cast("string"),
    )
    return banded.groupBy(id_col, "band").agg(
        F.md5(F.array_join(ordered_vals, ",")).alias("band_key")
    )


def minhash_candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Docs sharing ≥1 band bucket: (a, b, n_shared_bands). The join
    is on (band, band_key) — bucket-local, never the cross product."""
    left = bands.select(
        F.col(id_col).alias("a"), "band", "band_key"
    )
    right = bands.select(F.col(id_col).alias("b"), "band", "band_key")
    return (
        left.join(right, ["band", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_shared_bands"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs that share
    at least one shingle: (a, b, jaccard ≥ threshold).

    The shared-shingle join bounds work to documents with real
    overlap; at 100 TB you'd pre-bucket by minhash band first and run
    this as the verify stage (compose with minhash_candidate_pairs).
    """
    sh = doc_shingles(docs, text_col, id_col, k)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash16(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash: per-word 60-bit md5 hash; each bit position
    votes +1/-1; the sign vector is packed into an int.

    16 bits keeps the bit-vote aggregation a flat sum() list that any
    SQL engine can replay; widen num bits for production use."""
    words = docs.select(
        F.col(id_col), F.explode(normalized_words(F.col(text_col))).alias("w")
    )
    hashed = words.select(id_col, _md5_hash64(F.col("w")).alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(16)
    ]
    agg = hashed.groupBy(id_col).agg(*votes)
    code = sum(
        (
            F.when(F.col(f"b{j}") > 0, 2**j).otherwise(0)
            for j in range(16)
        ),
        F.lit(0),
    )
    return agg.select(F.col(id_col), code.cast("int").alias("simhash"))
