"""Graph operators over edge DataFrames.

The repo's graph surface is deliberately edge-table-shaped (no vertex
RDD abstraction): an edge DataFrame + DataFrame joins express the
iterative algorithms Spark is actually used for at scale (connected
components live in ext/dedup.py::duplicate_clusters — pointer
jumping; triangle counting in queries/analytics.py). This module adds
weighted PageRank: the canonical iterate-join-aggregate shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_weighted(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    damping: float = 0.85,
    n_iters: int = 3,
) -> DataFrame:
    """Weighted PageRank with uniform dangling-mass redistribution:

        r_{k+1}(v) = (1-d)/N + d * (Σ_{u→v} r_k(u)·w(u,v)/w_out(u)
                                     + dangling_mass_k / N)

    over a FIXED number of iterations (deterministic — replayable by
    an unrolled SQL oracle; no convergence test). Returns
    (node, pagerank) with pagerank ROUND(,4) (aggregation-order ulp
    absorption, the zipf-slope convention).

    Scale shape: whatever produced ``edges`` has already paid the
    corpus cost — this function localCheckpoints the edge table once
    (every iteration consumes it; uncheckpointed, each of the
    n_iters+1 consumers would re-derive the full upstream lineage,
    e.g. the per-user lag window over the fact table) and then every
    iteration is a join+aggregate among node-bounded tables: rank and
    out-weight tables are |V| rows, the scalar N and dangling-mass
    rows ride the 1-row broadcast crossJoin idiom. Nothing in the
    loop scales with the corpus. For web-scale |V| the same loop
    holds with the rank table shuffle-joined on src — AQE picks the
    strategy per size, which is why the joins are unhinted.
    """
    if not (0.0 < damping < 1.0):
        raise ValueError(
            f"pagerank_weighted: damping must be in (0, 1), got {damping}"
        )
    if n_iters < 1:
        raise ValueError(
            f"pagerank_weighted: n_iters must be >= 1, got {n_iters}"
        )
    d = float(damping)
    # one derivation of the upstream lineage, n_iters+1 consumers
    edges = edges.select(
        F.col(src_col).alias("__src"),
        F.col(dst_col).alias("__dst"),
        F.col(weight_col).alias("__w"),
    ).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("__src").alias("node"))
        .unionByName(edges.select(F.col("__dst").alias("node")))
        .distinct()
    ).localCheckpoint(eager=False)
    out_w = edges.groupBy("__src").agg(F.sum("__w").alias("w_out"))
    n_row = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(n_iters):
        contrib = (
            edges.join(out_w, "__src")
            .join(ranks, F.col("__src") == F.col("node"))
            .select(
                F.col("__dst").alias("node2"),
                (
                    F.col("rank")
                    * (F.col("__w").cast("double") / F.col("w_out"))
                ).alias("c"),
            )
            .groupBy("node2")
            .agg(F.sum("c").alias("cin"))
        )
        dangling = ranks.join(
            out_w, F.col("node") == F.col("__src"), "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
        ranks = (
            nodes.join(contrib, F.col("node") == F.col("node2"), "left")
            .crossJoin(F.broadcast(n_row))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(1.0 - d) / F.col("n_nodes")
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("cin"), F.lit(0.0))
                        + F.col("dang") / F.col("n_nodes")
                    )
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 4).alias("pagerank"))
