"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the correctness baseline (one pass over
  the corpus per query, no index)
- IVF-style search: coarse quantize to centroids, probe only the
  nearest cell(s) — the scale path (touches 1/n_cells of the corpus)

Both are pure DataFrame plans; the vector math is Column expressions
(functions/vectors.py), not UDFs, so it stays inside codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dug_data_ingest_spark.functions.vectors import as_double, cosine, dot


def _scored(
    embeddings: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, _raw, cos_sim): raw and 4dp cosine of every vector against
    the literal query — the single scoring projection behind
    topk_bruteforce and range_search (one place to change precision or
    vector handling). Top-k ordering MUST use ``_raw``: the DuckDB
    oracles order by the raw cosine, so ordering by the rounded value
    could pick a different row set when a rounded tie straddles the
    LIMIT boundary."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    raw = cosine(as_double(F.col(vec_col)), q)
    return embeddings.select(
        F.col(id_col),
        raw.alias("_raw"),
        F.round(raw, 4).alias("cos_sim"),
    )


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
    scored = _scored(embeddings, query_vec, id_col, vec_col)
    return (
        scored.orderBy(F.desc("_raw"), F.col(id_col))
        .limit(k)
        .select(id_col, "cos_sim")
    )


def range_search(
    embeddings: DataFrame,
    query_vec: list[float],
    threshold: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All vectors with cosine ≥ threshold against a literal query —
    the range-query sibling of topk_bruteforce (radius instead of k:
    the caller bounds QUALITY, not count). Same scale shape: the
    query folds into the plan as a literal array, the corpus is
    scanned once with zero shuffles, and the filter is codegen-fused;
    at 100 TB compose with the IVF probe exactly like topk."""
    return (
        _scored(embeddings, query_vec, id_col, vec_col)
        .filter(F.col("cos_sim") >= threshold)
        .select(id_col, "cos_sim")
    )


def hard_negatives(
    embeddings: DataFrame,
    query_vec: list[float],
    query_label,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive hard-negative mining: the top-``k`` most-similar
    vectors whose ``label_col`` DIFFERS from the query's — the pairs a
    contrastive/embedding training pipeline feeds as hard negatives
    (high-similarity, wrong class; the in-batch-negatives upgrade
    every public recipe since SimCLR/DPR documents).

    Same scale shape as topk_bruteforce: the query folds into the
    plan as a literal array, the label filter is codegen-fused into
    the one corpus scan (zero shuffles), top-k plans as
    TakeOrderedAndProject ordered by the RAW cosine (ties broken by
    id; the rounded value is for display/oracles — see _scored's
    boundary note). NULL labels count as a different class
    (null-safe inequality), never silently dropped."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    raw = cosine(as_double(F.col(vec_col)), q)
    return (
        embeddings.filter(~F.col(label_col).eqNullSafe(F.lit(query_label)))
        .select(
            F.col(id_col),
            F.col(label_col),
            raw.alias("_raw"),
            F.round(raw, 4).alias("cos_sim"),
        )
        .orderBy(F.desc("_raw"), F.col(id_col))
        .limit(k)
        .select(id_col, label_col, "cos_sim")
    )


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
    raw = cosine(as_double(F.col(vec_col)), q)
    scored = probed.select(
        F.col(id_col),
        F.col(label_col),
        raw.alias("_raw"),
        F.round(raw, 4).alias("cos_sim"),
    )
    # order by the RAW score (the oracle convention; see _scored)
    return (
        scored.orderBy(F.desc("_raw"), F.col(id_col))
        .limit(k)
        .select(id_col, label_col, "cos_sim")
    )


def cosine_to_query_arrow(query_vec: list[float]):
    """Vectorized (Arrow + numpy) cosine-to-query column — the wide-
    vector alternative to the zip_with/aggregate expression path.

    Higher-order functions evaluate interpreted per element; at 64
    dims the JVM expression wins on overhead, but for 768–4096-dim
    embeddings one numpy matmul per Arrow batch is the faster plan.
    Both paths produce identical scores (asserted in tests)."""
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    @pandas_udf("double")
    def _cos(vs: pd.Series) -> pd.Series:
        m = np.vstack(vs.to_numpy())
        denom = np.linalg.norm(m, axis=1) * qn
        with np.errstate(divide="ignore", invalid="ignore"):
            s = (m @ q) / denom
        # zero-norm rows (and a zero query) must come back NULL, not
        # NaN: Spark sorts NaN ABOVE every number, so a corrupted
        # all-zero embedding would win rank 1 — the codegen path's
        # try_divide returns NULL there (ranks last under desc), and
        # the two scorers must stay interchangeable
        out = pd.array(s, dtype="Float64")
        out[denom == 0] = pd.NA
        return pd.Series(out, dtype="Float64")

    return _cos


def topk_arrow(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """topk_bruteforce with the Arrow-vectorized scorer."""
    score = cosine_to_query_arrow(query_vec)
    # two-step select so the pandas UDF is evaluated ONCE and the
    # rounding derives from the materialized column
    scored = embeddings.select(
        F.col(id_col), score(as_double(F.col(vec_col))).alias("_raw")
    ).select(id_col, "_raw", F.round("_raw", 4).alias("cos_sim"))
    # order by the RAW score (the oracle convention; see _scored)
    return (
        scored.orderBy(F.desc("_raw"), F.col(id_col))
        .limit(k)
        .select(id_col, "cos_sim")
    )


def random_hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim, derived
    from md5 so any engine (or oracle) regenerates the same planes.
    These are model parameters: they fold into the plan as literals,
    i.e. the moral broadcast — nothing is shuffled to distribute them.
    """
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16) % 2001 - 1000)
            / 1000.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def _dim_checked(vec: Column, dim: int, caller: str) -> Column:
    """Fail LOUDLY on an embedding/hyperplane dim mismatch: zip_with
    null-pads the shorter side, which nulls the dot product, which
    would otherwise quietly resolve every sign bit to 0 — every row in
    bucket 0 and the 'bucket-local' self-join degenerating to a full
    cross product. Wrong results at test scale, an OOM at corpus
    scale, and nothing to catch it; better one raise_error row than
    that."""
    return F.when(F.size(vec) == F.lit(dim), vec).otherwise(
        F.raise_error(
            F.printf(
                F.lit(
                    f"{caller}: embedding has %s dims, expected {dim}; "
                    "pass dim=<real width> to the entry point"
                ),
                F.size(vec),
            )
        )
    )


def rp_lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-projection LSH bucket id: one sign bit per hyperplane,
    packed to an int. Vectors with high cosine similarity agree on
    most signs, so near-duplicates collide with high probability.
    Dim mismatches raise (see _dim_checked)."""
    guarded = _dim_checked(
        vec, len(planes[0]) if planes else 0, "rp_lsh_bucket"
    )
    bit = F.lit(0)
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = bit + F.when(dot(guarded, p) > 0, F.lit(2**j)).otherwise(F.lit(0))
    return bit


def lsh_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH blocking —
    the scale path: candidate pairs come only from same-bucket
    collisions (corpus² / 2^n_planes expected comparisons), then exact
    cosine verifies. Deterministic planes (see random_hyperplanes) keep
    it oracle-replayable.

    At 100 TB: bucket the corpus once (a write partitionBy(bucket)),
    then the self-join is bucket-local; raise n_planes (and/or use
    banded multi-probe) to keep per-bucket sizes bounded.
    """
    planes = random_hyperplanes(n_planes, dim)
    bucketed = embeddings.select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("v"),
        rp_lsh_bucket(as_double(F.col(vec_col)), planes).alias("bucket"),
    )
    a = bucketed.select(
        F.col("bucket"), F.col(id_col).alias("a"), F.col("v").alias("va")
    )
    b = bucketed.select(
        F.col("bucket"), F.col(id_col).alias("b"), F.col("v").alias("vb")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_banded_pairs(
    embeddings: DataFrame,
    threshold: float,
    n_planes: int = 8,
    band_size: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via BANDED sign-LSH: the n_planes sign
    bits split into bands of band_size; a pair is a candidate if it
    collides in ANY band (OR across bands), then exact cosine
    verifies. Same amplification move as the minhash bands and the
    4×16-bit SimHash lanes: per-band collision probability for a
    cosine-s pair is (1 - arccos(s)/pi)^band_size, and OR-ing b bands
    lifts recall to 1-(1-p)^b — at s=0.3 with 4 bands of 2 that is
    ~0.83 where the single 8-plane band manages ~0.017 (measured by
    sim-lsh-recall / sim-lsh-recall-banded).

    Plan shape: the band keys are row-local Column arithmetic over
    the same plane literals (no shuffle to distribute them), the
    bands stack via posexplode (rows ×b, still row-local), and the
    candidate join is per-(band, key) equality — bucket-local at any
    scale. A pair colliding in several bands is deduplicated by the
    distinct on (a, b, cos_sim) after the verify, so the b-way
    multiplicity never survives the stage."""
    if n_planes % band_size:
        raise ValueError("lsh_banded_pairs: band_size must divide n_planes")
    planes = random_hyperplanes(n_planes, dim)
    n_bands = n_planes // band_size
    v = _dim_checked(as_double(F.col(vec_col)), dim, "lsh_banded_pairs")
    bits = [
        F.when(dot(v, F.array(*[F.lit(x) for x in p])) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        for p in planes
    ]
    band_keys = [
        sum(
            (bits[b * band_size + j] * F.lit(2**j) for j in range(band_size)),
            F.lit(0),
        )
        for b in range(n_bands)
    ]
    kv = embeddings.select(
        F.col(id_col), v.alias("v"), F.posexplode(F.array(*band_keys)).alias("band", "key")
    )
    a = kv.select("band", "key", F.col(id_col).alias("a"), F.col("v").alias("va"))
    b = kv.select("band", "key", F.col(id_col).alias("b"), F.col("v").alias("vb"))
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def _assign(embeddings: DataFrame, cents: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment by squared L2 — one broadcast join
    (centroids are k rows) + a window-free argmin via groupBy-min
    struct ordering. Deterministic tie-break on cluster id."""
    dist2 = F.aggregate(
        F.zip_with(
            as_double(F.col(vec_col)), F.col("centroid"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # Raw doubles, NOT rounded: the DuckDB oracle's argmin orders by
    # the un-rounded distance, and both engines fold the squared
    # differences left-to-right over array positions, so the doubles
    # match bit-for-bit — rounding on one side only would flip
    # tie-breaks for clusters within the rounding epsilon.
    scored = embeddings.join(F.broadcast(cents)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cluster"),
        dist2.alias("d2"),
    )
    best = F.min(F.struct(F.col("d2"), F.col("cluster"))).alias("best")
    return (
        scored.groupBy(id_col)
        .agg(best, F.first(vec_col).alias(vec_col))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("best.cluster").alias("cluster"),
        )
    )


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_centroids: bool = False,
) -> DataFrame:
    """Lloyd's k-means on DataFrames — the learned coarse quantizer
    for IVF (ivf_topk uses stored labels; this learns real cells).

    Deterministic: init assigns cluster = id % k (seeded-sample init
    would work too but breaks oracle replay); each iteration is
    (assign: broadcast join + argmin) → (update: posexplode +
    per-position mean), i.e. one shuffle per iteration on (cluster,
    pos). k and dim are small (centroids always fit one broadcast);
    the corpus is never shuffled — only scanned per iteration.

    Returns (cluster, n_members); with ``with_centroids=True`` also
    the learned ``centroid`` vector per cell (the coarse-quantizer
    table an IVF probe broadcasts). The oracle-replayed query keeps
    the default: per-position avg() goes through partial aggregation
    in partition order, so centroid doubles are not guaranteed
    bit-identical across engines, while populations are exact.
    """
    from dug_data_ingest_spark.ext.dedup import fan_out

    if with_centroids and n_iters < 1:
        raise ValueError(
            "kmeans_centroids: with_centroids requires n_iters >= 1 "
            "(no centroid table exists before the first update step)"
        )
    assigned = fan_out(embeddings).select(
        F.col(id_col), F.col(vec_col), (F.col(id_col) % k).cast("int").alias("cluster")
    )
    cents = None
    for _ in range(n_iters):
        # the update step IS label_centroids with cluster as the label
        cents = label_centroids(assigned, "cluster", vec_col)
        assigned = _assign(embeddings, cents, id_col, vec_col)
    pops = assigned.groupBy("cluster").agg(F.count("*").alias("n_members"))
    if with_centroids and cents is not None:
        return pops.join(cents, "cluster").select("cluster", "centroid", "n_members")
    return pops


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


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 8,
    n_iters: int = 2,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    jump: bool | None = None,
) -> tuple[DataFrame, DataFrame]:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): drop all-but-one of every group of embeddings
    whose cosine similarity exceeds ``threshold``, comparing only
    WITHIN k-means cells. Returns ``(survivors, drop)`` — survivors is
    the input minus the drop set; drop is the (id)-frame of
    non-canonical (non-min-id) members of each within-cell near-dup
    component.

    Composition of existing verified parts: ``kmeans_centroids``
    (deterministic Lloyd; or pass precomputed ``centroids`` —
    (cluster, centroid) rows — to skip training), ``_assign``
    (broadcast-join argmin, corpus never shuffled),
    ``cosine_dup_pairs`` blocked on the learned cell,
    ``non_canonical_ids`` (min-label components, adaptive pointer
    jumping), and a broadcast-friendly LEFT ANTI for the survivors.

    Scale shape: centroids are k rows (always broadcast); the one
    quadratic step is the within-cell pair join, ~ (n/k)^2 per cell —
    size ``n_cells`` so a cell fits a task budget (the published
    recipe uses k ~ 11k cells for a 100M-embedding corpus, the same
    n/k arithmetic). The corpus is scanned per k-means iteration and
    shuffled only on the cell id for the pair join.

    Inherent recall caveat (the technique's, not this plan's): a
    near-dup pair straddling a cell boundary is never compared —
    SemDeDup trades that tail for tractability. Pinned in
    tests/test_semantic_dedup.py so the trade stays visible.

    Library surface, not a registered slug: learned-float centroids
    are engine-inexact (see kmeans_centroids), so the gate is a model
    pin with EXPLICIT centroids, not a DuckDB hash oracle.
    """
    if centroids is None:
        centroids = kmeans_centroids(
            embeddings,
            k=n_cells,
            n_iters=n_iters,
            id_col=id_col,
            vec_col=vec_col,
            with_centroids=True,
        )
    cents = centroids.select("cluster", "centroid")
    assigned = _assign(embeddings, cents, id_col, vec_col)
    pairs = cosine_dup_pairs(
        assigned, threshold, block_col="cluster", id_col=id_col, vec_col=vec_col
    )
    from dug_data_ingest_spark.ext.dedup import non_canonical_ids

    drop = non_canonical_ids(pairs, id_col=id_col, jump=jump)
    survivors = embeddings.join(drop, id_col, "left_anti")
    return survivors, drop


# ---------------------------------------------------------------------------
# Product quantization (PQ): the 100-TB ANN memory answer. IVF prunes
# WHICH vectors a query scans; PQ shrinks WHAT is scanned — each
# d-dim float vector becomes m small codes (one per d/m-dim subspace,
# each quantized to its own k-centroid codebook), a 32x-64x
# compression, and query scoring becomes m table lookups per vector
# (asymmetric distance, ADC) instead of d multiplies. Spark shape:
# training is Lloyd over the (id x subspace) exploded frame — ONE
# assign shuffle per iteration for ALL subspaces together, corpus
# scanned never shuffled; codebooks are m*k rows and always
# broadcast; encoded scoring is a row-local expression over a
# literal distance table, so top-k plans as TakeOrderedAndProject.
# Exact arithmetic is pinned to a numpy reference model in
# tests/test_pq_properties.py (float sums differ across engines in
# low-order bits, so this stays library surface rather than a
# hash-gated oracle slug — same caveat kmeans_centroids documents).
# ---------------------------------------------------------------------------


def _pq_subvectors(
    embeddings: DataFrame, m: int, dim: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, subspace, subvec): the vector split into m contiguous
    d/m-dim slices, exploded — the frame PQ trains and encodes on."""
    if dim % m:
        raise ValueError(
            f"pq: m={m} must divide the vector dimension {dim}; ragged "
            "subspaces would silently misalign codes against codebooks"
        )
    d = dim // m
    # _dim_checked first: slicing an undersized vector would yield
    # empty subvectors, missing codebook entries, and NULL-padded
    # zip_with distances downstream — silently, without it
    vec = _dim_checked(F.col(vec_col), dim, "pq")
    slices = F.array(*[as_double(F.slice(vec, s * d + 1, d)) for s in range(m)])
    return embeddings.select(
        F.col(id_col), F.posexplode(slices).alias("subspace", "subvec")
    )


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Learn PQ codebooks: (subspace, cluster, centroid[d/m]).

    Deterministic Lloyd, all m subspaces in one pipeline: init
    cluster = id % k (the kmeans_centroids convention — replayable,
    no RNG). EAGER since r14: each round is ONE map-side-combined
    (subspace, cluster) groupBy whose d per-position means land in one
    bounded collect (m*k rows at any corpus size), and re-assignment
    folds the collected centroids into a row-local literal argmin —
    no broadcast join, no per-iteration (id, subspace) argmin shuffle,
    no per-round corpus exchange at all (the corpus is scanned once
    per round, never shuffled). The returned codebook is a
    local-relation DataFrame, so a caller's collect()/broadcast of it
    is free and every consumer reads the ONE learned snapshot (the
    avg partial-merge-order caveat cannot produce divergent copies)."""
    if n_iters < 1:
        raise ValueError(
            f"pq_train: n_iters must be >= 1 (got {n_iters}); no "
            "codebook exists before the first update step"
        )
    d = dim // m
    sub = _pq_subvectors(embeddings, m, dim, id_col, vec_col)
    rows = None
    for it in range(n_iters):
        if it == 0:
            assigned = sub.withColumn(
                "cluster", (F.col(id_col) % k).cast("int")
            )
        else:
            assigned = sub.withColumn(
                "cluster",
                _pq_nearest_cluster(
                    _pq_books_by_subspace(rows, m, d, "pq_train"), d
                ),
            )
        means = assigned.groupBy("subspace", "cluster").agg(
            *[
                F.avg(F.element_at("subvec", p + 1)).alias(f"_p{p}")
                for p in range(d)
            ]
        )
        rows = means.select(
            "subspace",
            "cluster",
            F.array(*[F.col(f"_p{p}") for p in range(d)]).alias("centroid"),
        ).collect()
    return _pq_books_df(embeddings.sparkSession, rows)


def _pq_books_df(spark: SparkSession, rows: list) -> DataFrame:
    """The collected codebook as a VALUES inline table — a true
    LocalRelation, unlike createDataFrame(rows) which parallelizes an
    RDD (collect() on it launches a real Spark job; measured ~0.5 s of
    the query's construction). Collecting, broadcasting, or folding a
    LocalRelation is driver-local and free. Doubles round-trip
    bit-exactly via _sql_double."""
    if not rows:
        return spark.createDataFrame(
            [], "subspace int, cluster int, centroid array<double>"
        )
    vals = ", ".join(
        "({}, {}, array({}))".format(
            int(r.subspace),
            int(r.cluster),
            ", ".join(_sql_double(float(v)) for v in r.centroid),
        )
        for r in rows
    )
    return spark.sql(
        "SELECT CAST(subspace AS INT) AS subspace, "
        "CAST(cluster AS INT) AS cluster, centroid "
        f"FROM VALUES {vals} AS t(subspace, cluster, centroid)"
    )


def _pq_books_by_subspace(
    codebook_rows: list, m: int, d: int, caller: str
) -> dict[int, list[tuple[int, list[float]]]]:
    """{subspace: [(cluster, centroid)] sorted by cluster} from the
    collected codebook, with the pq_adc_topk validation posture:
    ragged sub-centroids and missing subspaces fail loudly instead of
    silently truncating distances or dropping codes."""
    by_s: dict[int, list[tuple[int, list[float]]]] = {}
    for r in codebook_rows:
        if len(r.centroid) != d:
            raise ValueError(
                f"{caller}: codebook sub-centroid has "
                f"{len(r.centroid)} dims, expected d={d} — codebook "
                "and m/dim disagree"
            )
        by_s.setdefault(r.subspace, []).append(
            (r.cluster, [float(c) for c in r.centroid])
        )
    if sorted(by_s) != list(range(m)):
        raise ValueError(
            f"{caller}: codebook covers subspaces {sorted(by_s)}, "
            f"expected 0..{m - 1} — codebook and m disagree"
        )
    return {s: sorted(entries) for s, entries in by_s.items()}


def _sql_double(v: float) -> str:
    """Bit-exact SQL double literal: repr() is the shortest string
    that round-trips the IEEE double, and Java's parseDouble is
    correctly rounded, so the JVM re-materializes the identical bits."""
    import math

    if math.isnan(v):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(v):
        return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
    return f"{v!r}D"


def _pq_cents_sql(entries: list[tuple[int, list[float]]]) -> str:
    """One subspace's [(cluster, centroid)] as an array-of-structs SQL
    literal. Two measured dead ends this shape avoids: (a) a ~400-node
    arithmetic expansion of the argmin blew janino's generated-method
    limits and fell back to interpreted projection (10x slower than
    the r13 broadcast join it replaced); (b) composing the table from
    nested F.lit/F.struct/F.array Columns cost ~2.3 s of driver-side
    py4j round trips PER expression build. One F.expr parse is
    milliseconds, every child is foldable, and ConstantFolding
    collapses the table into a single Literal node; the higher-order
    zip_with/aggregate argmin below keeps the expression TREE tiny
    while the per-row work is the same d multiplies per candidate."""
    return "array({})".format(
        ", ".join(
            "named_struct('cluster', CAST({} AS INT), 'centroid', array({}))".format(
                int(c), ", ".join(_sql_double(float(v)) for v in cent)
            )
            for c, cent in entries
        )
    )


def _pq_argmin_sql(cands_sql: str, subvec_sql: str) -> str:
    """Nearest entry of ``cands_sql`` (array<struct<cluster,centroid>>)
    to ``subvec_sql``: array_min over (d2, cluster) structs — the
    lowest-cluster tie-break via lexicographic struct order, the same
    left-to-right (x-y)^2 fold the reference model replays."""
    return (
        "array_min(transform({cands}, e -> named_struct("
        "'d2', aggregate(zip_with({sv}, e.centroid, "
        "(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x), "
        "'cluster', e.cluster))).cluster"
    ).format(cands=cands_sql, sv=subvec_sql)


def _pq_nearest_cluster(
    by_s: dict[int, list[tuple[int, list[float]]]], d: int
) -> Column:
    """Row-local nearest-codebook-entry id for the exploded
    (subspace, subvec) frame: element_at on a constant-folded
    per-subspace table literal selects the candidate list, the
    argmin picks the entry. Replaces a broadcast join + corpus-wide
    groupBy argmin with a constant-folded expression: zero exchanges
    (the r13 DSIR literal-fold idiom applied to the learned
    centroids)."""
    tbl = "array({})".format(
        ", ".join(_pq_cents_sql(by_s[s]) for s in sorted(by_s))
    )
    return F.expr(
        _pq_argmin_sql(f"element_at({tbl}, subspace + 1)", "subvec")
    )


def _pq_codes_expr(
    codebook_rows: list,
    m: int,
    dim: int,
    vec_col: str,
    caller: str = "pq_encode",
) -> Column:
    """``codes[m]`` as ONE row-local expression over the raw vector
    column: per subspace, the literal-table argmin on the contiguous
    d-dim slice. No explode, no join, no shuffle — encoding a 100-TB
    corpus is a pure projection over one scan. Built as a single
    parsed SQL string (the _pq_cents_sql rationale); the dim guard is
    the SQL form of _dim_checked and the element casts the SQL form
    of as_double, so the checked/cast values are bit-identical."""
    if dim % m:
        raise ValueError(
            f"{caller}: m={m} must divide the vector dimension {dim}; "
            "ragged subspaces would silently misalign codes against "
            "codebooks"
        )
    d = dim // m
    by_s = _pq_books_by_subspace(codebook_rows, m, d, caller)
    vq = vec_col.replace("`", "``")
    checked = (
        f"CASE WHEN size(`{vq}`) = {dim} THEN `{vq}` "
        f"ELSE raise_error(printf('{caller}: embedding has %s dims, "
        f"expected {dim}; pass dim=<real width> to the entry point', "
        f"size(`{vq}`))) END"
    )
    subvecs = [
        (
            f"transform(slice({checked}, {s * d + 1}, {d}), "
            "x -> CAST(x AS DOUBLE))"
        )
        for s in range(m)
    ]
    return F.expr(
        "array({})".format(
            ", ".join(
                _pq_argmin_sql(_pq_cents_sql(by_s[s]), subvecs[s])
                for s in range(m)
            )
        )
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes[m]): each vector reduced to its per-subspace nearest
    codebook ids, ordered by subspace. At rest this is the compressed
    index a 100-TB corpus stores instead of raw floats.

    Since r14 the collected codebook folds into a literal argmin
    (``_pq_codes_expr``), so encoding is a single row-local projection
    — the r13 shape (explode to (id, subspace, subvec), broadcast
    join, TWO corpus-wide groupBys) shuffled the exploded corpus
    twice per encode. The collect is m*k rows, bounded by
    construction (and free when ``codebooks`` is pq_train's
    local-relation output). A codebook that covers no subspace at all
    (trained on an empty corpus) still encodes to zero rows, matching
    the old inner-join behavior; a PARTIALLY covering codebook now
    fails loudly here instead of emitting short codes arrays that
    _adc_score would reject later."""
    rows = codebooks.collect()
    if not rows:
        return embeddings.select(
            F.col(id_col), F.lit(None).cast("array<int>").alias("codes")
        ).filter(F.lit(False))
    codes = _pq_codes_expr(rows, m, dim, vec_col, "pq_encode")
    return embeddings.select(F.col(id_col), codes.alias("codes"))


def _adc_score(table: Column, m: int, caller: str) -> Column:
    """Row-local ADC score of the ``codes`` column against a literal
    (m x n_clusters) squared-distance table — the one scoring
    expression behind pq_adc_topk and ivf_pq_topk so a guard fix can
    never drift between them. Codes shorter than m would NULL-pad the
    zip, NULL the score, and ascending sort is nulls-FIRST — corrupted
    rows would win the top-k silently. Validate the length loudly
    instead (the _dim_checked posture), and belt-and-braces guard the
    folded score against NULLs."""
    checked = F.when(
        F.size(F.col("codes")) == F.lit(m), F.col("codes")
    ).otherwise(
        F.raise_error(
            F.printf(
                F.lit(
                    f"{caller}: codes array has %s entries, expected "
                    f"m={m}; codes and codebook disagree"
                ),
                F.size(F.col("codes")),
            )
        )
    )
    score = F.aggregate(
        F.zip_with(
            checked,
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda code, s: F.element_at(
                F.element_at(table, s + F.lit(1)), code + F.lit(1)
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(score.isNotNull(), score).otherwise(
        F.raise_error(
            F.lit(
                f"{caller}: NULL ADC score (NULL code entry?) — "
                "refusing to rank it above real candidates"
            )
        )
    )


def pq_adc_topk(
    codes: DataFrame,
    codebook_rows: list,
    query_vec: list,
    k: int = 10,
    m: int = 8,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query stays a full
    float vector, each candidate contributes m table lookups.

    ``codebook_rows`` is the COLLECTED codebook (m*k rows — bounded by
    construction, the PQ analogue of broadcasting IVF centroids). The
    per-(subspace, cluster) squared distance to the query folds into a
    literal nested-array table, so scoring is a row-local expression
    over the codes column — no join, no shuffle; ``orderBy.limit``
    plans as TakeOrderedAndProject."""
    dim = len(query_vec)
    if dim % m:
        raise ValueError(f"pq_adc_topk: m={m} must divide query dim {dim}")
    d = dim // m
    table: dict[int, dict[int, float]] = {}
    n_clusters = 0
    for row in codebook_rows:
        if len(row.centroid) != d:
            # zip() would silently truncate — half-scored distances,
            # wrong ranking, no error (the _dim_checked posture)
            raise ValueError(
                f"pq_adc_topk: codebook sub-centroid has "
                f"{len(row.centroid)} dims, expected d={d} (dim={dim}, "
                f"m={m}) — query and codebook trained at different dims"
            )
        q_sub = query_vec[row.subspace * d : (row.subspace + 1) * d]
        dist2 = sum((float(q) - float(c)) ** 2 for q, c in zip(q_sub, row.centroid))
        table.setdefault(row.subspace, {})[row.cluster] = dist2
        n_clusters = max(n_clusters, row.cluster + 1)
    if sorted(table) != list(range(m)):
        raise ValueError(
            f"pq_adc_topk: codebook covers subspaces {sorted(table)}, "
            f"expected 0..{m - 1} — codebook and m disagree"
        )
    # Lloyd can leave a cluster id empty; score it +inf so a stale
    # code pointing at it can never win silently. One parsed SQL
    # string, not nested F.lit/F.array: the per-Column py4j round
    # trips dominated query CONSTRUCTION time (the _pq_cents_lit
    # lesson), and ConstantFolding collapses it identically.
    lit_table = F.expr(
        "array({})".format(
            ", ".join(
                "array({})".format(
                    ", ".join(
                        _sql_double(table[s].get(c, float("inf")))
                        for c in range(n_clusters)
                    )
                )
                for s in range(m)
            )
        )
    )
    score = _adc_score(lit_table, m, "pq_adc_topk")
    return (
        codes.select(F.col(id_col), score.alias("adc_dist2"))
        .orderBy(F.col("adc_dist2").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_topk_reranked(
    embeddings: DataFrame,
    codes: DataFrame,
    codebook_rows: list,
    query_vec: list,
    k: int = 10,
    shortlist: int = 100,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cand: DataFrame | None = None,
) -> DataFrame:
    """PQ as deployed: ADC over the compressed codes produces a
    ``shortlist`` of candidates, then ONLY those ids are re-scored
    with exact L2 against their raw vectors — the standard
    two-stage trade (quantization error never decides the final
    ranking, and the expensive exact pass touches shortlist rows,
    not the corpus). The shortlist is id-cardinality bounded, so the
    join back to raw vectors broadcasts; at 100 TB the corpus side
    is scanned once and never shuffled.

    ``cand``: optionally the ALREADY-BUILT shortlist id frame (the
    ``pq_adc_topk(k=shortlist).select(id_col)`` output, ideally
    snapshot via localCheckpoint) for callers that also consume the
    shortlist themselves — without it the corpus-wide ADC pass runs
    once here and once in the caller (recompute elimination, guide
    §5; at 100 TB that is a second full scan of the coded corpus)."""
    if shortlist < k:
        raise ValueError(
            f"pq_topk_reranked: shortlist={shortlist} must be >= k={k} "
            "(a shortlist smaller than the answer set guarantees "
            "missing results)"
        )
    if cand is None:
        cand = pq_adc_topk(
            codes, codebook_rows, query_vec, k=shortlist, m=m, id_col=id_col
        ).select(id_col)
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    # _dim_checked: a vector shorter than the query would NULL-pad the
    # zip, NULL dist2, and rank FIRST under ascending nulls-first
    d2 = F.aggregate(
        F.zip_with(
            as_double(_dim_checked(F.col(vec_col), len(query_vec), "pq_topk_reranked")),
            q,
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        embeddings.join(F.broadcast(cand), id_col)
        .select(F.col(id_col), d2.alias("dist2"))
        .orderBy(F.col("dist2").asc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the composition production ANN indexes actually ship
# (FAISS's IVFPQ): a coarse k-means quantizer prunes WHICH cells a
# query scans (IVF), and PQ codes over the RESIDUAL (vector minus its
# cell centroid) shrink WHAT is scanned — residuals are centered near
# zero, so the same codebook budget quantizes them with far less
# error than raw vectors. Query cost: nprobe cells' worth of rows,
# each scored by m table lookups against that cell's own distance
# table (the query residual differs per cell).
# ---------------------------------------------------------------------------


def ivf_pq_index(
    embeddings: DataFrame,
    n_cells: int = 8,
    m: int = 8,
    k: int = 16,
    n_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list, DataFrame, DataFrame]:
    """Build the index: returns ``(cells, codebooks, coded)`` where
    cells is the COLLECTED coarse-quantizer table [(cluster,
    centroid, n_members)] (n_cells rows — the IVF probe list), and
    coded is (id, cell, codes[m]) — the compressed inverted file.
    One Lloyd pipeline for the coarse quantizer, one for the m
    sub-codebooks; the corpus is scanned per iteration, never
    shuffled except the (cluster, pos) mean updates."""
    cells_df = kmeans_centroids(
        embeddings, k=n_cells, n_iters=n_iters, id_col=id_col,
        vec_col=vec_col, with_centroids=True,
    )
    cents = cells_df.select("cluster", "centroid")
    assigned = _assign(embeddings, cents, id_col, vec_col)
    residuals = assigned.join(F.broadcast(cents), "cluster").select(
        F.col(id_col),
        F.col("cluster").alias("cell"),
        F.zip_with(
            as_double(_dim_checked(F.col(vec_col), dim, "ivf_pq_index")),
            F.col("centroid"),
            lambda x, c: x - c,
        ).alias("residual"),
    # localCheckpoint: residuals feed every pq_train iteration, the
    # encode pass, and the final cell join — uncheckpointed, the
    # corpus-wide argmin + residual subtraction would re-execute
    # ~(2*n_iters + 3) times per index build (the duplicate_clusters
    # lineage-truncation idiom; lazy — the first consumer
    # materializes it)
    ).localCheckpoint(eager=False)
    books = pq_train(
        residuals, m=m, k=k, n_iters=n_iters, dim=dim,
        id_col=id_col, vec_col="residual",
    )
    # codes as a row-local literal-argmin projection WITH the cell id
    # riding along — the r13 shape joined pq_encode's output back to
    # the residual frame by id just to re-attach ``cell`` (one whole
    # exchange + a second corpus pass, removed)
    rows = books.collect()  # free: pq_train returns a local relation
    if rows:
        coded = residuals.select(
            F.col(id_col),
            "cell",
            _pq_codes_expr(rows, m, dim, "residual", "pq_encode").alias(
                "codes"
            ),
        )
    else:
        coded = residuals.select(
            F.col(id_col), "cell", F.lit(None).cast("array<int>").alias("codes")
        ).filter(F.lit(False))
    return cells_df.collect(), books, coded


def ivf_pq_topk(
    coded: DataFrame,
    cells: list,
    codebook_rows: list,
    query_vec: list,
    k: int = 10,
    nprobe: int = 2,
    m: int = 8,
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe-bounded ADC top-k over the IVF-PQ index: score only the
    ``nprobe`` cells whose centroids are nearest the query, each with
    its OWN distance table built from the query's residual in that
    cell. The per-cell tables fold into a literal when-chain keyed on
    the row's cell id, so scoring stays a row-local expression and
    the cell filter prunes (1 - nprobe/n_cells) of the corpus before
    any arithmetic; top-k plans as TakeOrderedAndProject."""
    dim = len(query_vec)
    if dim % m:
        raise ValueError(f"ivf_pq_topk: m={m} must divide query dim {dim}")
    d = dim // m
    # zip() truncates silently on a dimension mismatch (half-scored
    # distances, wrong ranking, no error) — fail loudly first, matching
    # the DataFrame side's _dim_checked/_adc_score posture
    for r in cells:
        if len(r.centroid) != dim:
            raise ValueError(
                f"ivf_pq_topk: cell centroid has {len(r.centroid)} dims, "
                f"expected the query's {dim} — index and query trained "
                "at different dims"
            )
    by_dist = sorted(
        cells,
        key=lambda r: (
            sum((float(q) - float(c)) ** 2 for q, c in zip(query_vec, r.centroid)),
            r.cluster,
        ),
    )
    probed = by_dist[: max(1, nprobe)]

    books: dict[int, dict[int, list[float]]] = {}
    n_clusters = 0
    for row in codebook_rows:
        if len(row.centroid) != d:
            raise ValueError(
                f"ivf_pq_topk: codebook sub-centroid has "
                f"{len(row.centroid)} dims, expected d={d} (dim={dim}, "
                f"m={m}) — query and codebook trained at different dims"
            )
        books.setdefault(row.subspace, {})[row.cluster] = [
            float(c) for c in row.centroid
        ]
        n_clusters = max(n_clusters, row.cluster + 1)
    if sorted(books) != list(range(m)):
        raise ValueError(
            f"ivf_pq_topk: codebook covers subspaces {sorted(books)}, "
            f"expected 0..{m - 1} — codebook and m disagree"
        )

    def cell_table(cell_row):
        # residual of the query IN THIS CELL → (m x n_clusters) table,
        # emitted as one parsed SQL string (the _pq_cents_lit lesson:
        # nested F.lit/F.array py4j round trips dominate construction)
        resid = [
            float(q) - float(c) for q, c in zip(query_vec, cell_row.centroid)
        ]
        return F.expr(
            "array({})".format(
                ", ".join(
                    "array({})".format(
                        ", ".join(
                            _sql_double(
                                sum(
                                    (resid[s * d + p] - books[s][c][p]) ** 2
                                    for p in range(d)
                                )
                                if c in books[s]
                                else float("inf")
                            )
                            for c in range(n_clusters)
                        )
                    )
                    for s in range(m)
                )
            )
        )

    # when-chain keyed on the row's cell id: built from the LAST
    # probed cell inward so each earlier cell's branch wraps the rest
    # (the final fallthrough is unreachable — rows outside the probed
    # cells are filtered below before scoring)
    table = None
    for cell_row in reversed(probed):
        branch = cell_table(cell_row)
        table = (
            branch
            if table is None
            else F.when(F.col("cell") == F.lit(cell_row.cluster), branch).otherwise(
                table
            )
        )

    score = _adc_score(table, m, "ivf_pq_topk")
    probed_ids = [r.cluster for r in probed]
    return (
        coded.filter(F.col("cell").isin(probed_ids))
        .select(F.col(id_col), F.col("cell"), score.alias("adc_dist2"))
        .orderBy(F.col("adc_dist2").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_pq_topk_reranked(
    embeddings: DataFrame,
    coded: DataFrame,
    cells: list,
    codebook_rows: list,
    query_vec: list,
    k: int = 10,
    shortlist: int = 50,
    nprobe: int = 2,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cand: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ as deployed (FAISS IVFPQ + refine): the probe-bounded
    ADC pass produces a ``shortlist`` of candidate ids, then ONLY
    those rows are re-scored with exact L2 against their raw vectors
    — quantization error never decides the final ranking, and the
    recall ceiling becomes cell confinement alone (what nprobe
    bought), not ADC distortion. Same two-stage trade as
    ``pq_topk_reranked``, with the IVF cell filter pruning
    (1 - nprobe/n_cells) of the corpus before any scoring.

    Scale shape: the shortlist is id-cardinality bounded, so the join
    back to raw vectors broadcasts; the corpus side is scanned once
    (cell-filtered) and never shuffled.

    ``cand``: optionally the ALREADY-BUILT shortlist id frame (the
    ``ivf_pq_topk(k=shortlist).select(id_col)`` output) for callers
    that also consume the shortlist themselves — without it the
    probe-bounded ADC pass runs once here and once in the caller
    (recompute elimination, guide §5)."""
    if shortlist < k:
        raise ValueError(
            f"ivf_pq_topk_reranked: shortlist={shortlist} must be >= "
            f"k={k} (a shortlist smaller than the answer set "
            "guarantees missing results)"
        )
    if cand is None:
        cand = ivf_pq_topk(
            coded, cells, codebook_rows, query_vec,
            k=shortlist, nprobe=nprobe, m=m, id_col=id_col,
        ).select(id_col)
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    d2 = F.aggregate(
        F.zip_with(
            as_double(
                _dim_checked(
                    F.col(vec_col), len(query_vec), "ivf_pq_topk_reranked"
                )
            ),
            q,
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        embeddings.join(F.broadcast(cand), id_col)
        .select(F.col(id_col), d2.alias("dist2"))
        .orderBy(F.col("dist2").asc(), F.col(id_col).asc())
        .limit(k)
    )
