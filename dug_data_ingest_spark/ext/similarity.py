"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the correctness baseline (one pass over
  the corpus per query, no index)
- IVF-style search: coarse quantize to centroids, probe only the
  nearest cell(s) — the scale path (touches 1/n_cells of the corpus)

Both are pure DataFrame plans; the vector math is Column expressions
(functions/vectors.py), not UDFs, so it stays inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dug_data_ingest_spark.functions.vectors import as_double, cosine


def topk_bruteforce(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by cosine similarity to a literal query vector.

    The query vector folds into the plan as a literal array (the
    moral broadcast); ordering ties broken by id for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine(as_double(F.col(vec_col)), q), 4).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell centroid via posexplode + positional mean — one
    shuffle on (label, pos), rebuilt into an ordered array.

    (With learned IVF cells you'd k-means first; here the stored
    label plays the coarse-quantizer cell id.)
    """
    pos = embeddings.select(
        F.col(label_col),
        F.posexplode(as_double(F.col(vec_col))).alias("pos", "x"),
    )
    means = pos.groupBy(label_col, "pos").agg(F.avg("x").alias("m"))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("m").alias("v")))),
        lambda s: s.getField("v"),
    )
    return means.groupBy(label_col).agg(ordered.alias("centroid"))


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 5,
    n_probe: int = 1,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: rank centroids by cosine to the query, search only
    the best ``n_probe`` cells. Returns (vec_id, cos_sim, label).

    At scale: centroids are tiny (n_cells rows) → the cell choice is
    a broadcast; the corpus scan prunes to the probed cells (partition
    pruning when the table is written partitionBy(label)).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cents = label_centroids(embeddings, label_col, vec_col)
    best_cells = (
        cents.select(
            F.col(label_col), cosine(F.col("centroid"), q).alias("cent_sim")
        )
        .orderBy(F.desc("cent_sim"), F.col(label_col))
        .limit(n_probe)
    )
    probed = embeddings.join(
        F.broadcast(best_cells.select(label_col)), label_col, "inner"
    )
    scored = probed.select(
        F.col(id_col),
        F.col(label_col),
        F.round(cosine(as_double(F.col(vec_col)), q), 4).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs, blocked: only pairs in the same block
    are compared (label here; minhash band or LSH bucket in general —
    the blocking is what makes this feasible at corpus scale).
    """
    a = embeddings.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("a"),
        as_double(F.col(vec_col)).alias("va"),
    )
    b = embeddings.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("b"),
        as_double(F.col(vec_col)).alias("vb"),
    )
    pairs = a.join(b, "blk").filter(F.col("a") < F.col("b"))
    return (
        pairs.select(
            "a", "b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )
