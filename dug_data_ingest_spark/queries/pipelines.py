"""Pipeline-level slugs for the driver's oracle gate (SURVEY.md §3).

The pipeline plans (plans/bdc.py, plans/heal.py) normally run on
reference-shaped metadata; here the same *pipeline code* runs on
metadata derived deterministically from the driver's TPC-H-ish tables
(customer → Gen3 studies, orders → PicSure variables, part → HEAL
fields), and each DuckDB oracle replays derivation + pipeline in pure
SQL — so the correctness gate covers the composed plans end-to-end,
not just the leaf operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dug_data_ingest_spark.plans.bdc import (
    clean_picsure,
    summarize,
    validate_gen3,
)
from dug_data_ingest_spark.plans.heal import normalize_fields, variable_index
from dug_data_ingest_spark.queries import dec_money, load, query

# ---------------------------------------------------------------------------
# Derivations: TPC-H rows → reference-shaped metadata
# ---------------------------------------------------------------------------


def _gen3_from_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        F.when(
            F.col("c_custkey") % 10 == 3, F.concat(F.lit("study-"), F.col("c_custkey"))
        )
        .otherwise(
            F.concat(F.lit("phs"), F.lpad(F.col("c_custkey").cast("string"), 6, "0"), F.lit(".v1.p1"))
        )
        .alias("Accession"),
        F.lit("c1").alias("Consent"),
        F.when(F.col("c_custkey") % 10 == 5, "").otherwise(F.col("c_name")).alias("Study Name"),
        F.col("c_mktsegment").alias("Program"),
        F.lit("2024-01-01").alias("Last modified"),
        F.lit("").alias("Notes"),
        F.when(F.col("c_custkey") % 10 == 6, "").otherwise(F.col("c_mktsegment")).alias("Description"),
    )


_GEN3_SQL = """
  SELECT CASE WHEN c_custkey % 10 = 3 THEN 'study-' || c_custkey
              ELSE 'phs' || lpad(CAST(c_custkey AS VARCHAR), 6, '0') || '.v1.p1' END AS accession,
         CASE WHEN c_custkey % 10 = 5 THEN '' ELSE c_name END AS study_name,
         c_mktsegment AS program,
         CASE WHEN c_custkey % 10 = 6 THEN '' ELSE c_mktsegment END AS description
  FROM customer
"""


def _picsure_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        F.concat(F.lit("phs"), F.lpad((F.col("o_custkey") % 2000).cast("string"), 6, "0")).alias("studyId"),
        F.when(F.col("o_orderkey") % 19 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("pht"), (F.col("o_orderkey") % 50).cast("string"))
        ).alias("dtId"),
        F.when(F.col("o_orderkey") % 13 == 0, F.concat(F.lit("bad"), F.col("o_orderkey")))
        .otherwise(F.concat(F.lit("phv"), F.col("o_orderkey").cast("string")))
        .alias("varId"),
        F.col("o_orderpriority").alias("derived_var_name"),
        F.col("o_orderpriority").alias("derived_group_name"),
        F.col("o_orderstatus").alias("description"),
        F.col("o_orderpriority").alias("columnmeta_name"),
        F.col("o_orderstatus").alias("columnmeta_description"),
        F.lit(None).cast("string").alias("columnmeta_var_group_description"),
        (F.col("o_orderkey") % 2 == 0).alias("is_categorical"),
        F.lit(None).cast("string").alias("values"),
    )


_PICSURE_CLEAN_SQL = """
  SELECT 'phs' || lpad(CAST(o_custkey % 2000 AS VARCHAR), 6, '0') AS study_id
  FROM orders
  WHERE o_orderkey % 19 <> 0 AND o_orderkey % 13 <> 0
"""


# ---------------------------------------------------------------------------
# EP1 slugs
# ---------------------------------------------------------------------------


@query(
    "pipeline-bdc-summary",
    oracle=f"""
    WITH gen3 AS ({_GEN3_SQL}),
    valid AS (
      SELECT string_split(accession, '.')[1] AS study_id, accession, program
      FROM gen3
      WHERE accession <> '' AND study_name <> '' AND description <> ''
        AND regexp_matches(accession, '^phs[0-9]+')
    ),
    vc AS (
      SELECT study_id, COUNT(*) AS n_vars FROM ({_PICSURE_CLEAN_SQL}) GROUP BY study_id
    )
    SELECT v.study_id, v.accession AS accession_id,
           CASE WHEN vc.n_vars > 0 THEN 'SUCCESS' ELSE 'FAILED' END AS status,
           CASE WHEN vc.n_vars > 0 THEN 'XML_generator' ELSE 'both_methods_failed' END AS method,
           coalesce(printf('%d variables rendered', vc.n_vars),
                    'no PicSure variables for study') AS details,
           lower(regexp_replace(trim(string_split(v.program, '|')[1]), '[ /]', '_', 'g')) AS program
    FROM valid v LEFT JOIN vc ON v.study_id = vc.study_id
    """,
)
def pipeline_bdc_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    studies_valid, _ = validate_gen3(_gen3_from_customer(spark, sf_dir))
    variables_clean = clean_picsure(_picsure_from_orders(spark, sf_dir))
    return summarize(studies_valid, variables_clean)


@query(
    "pipeline-bdc-quarantine",
    oracle=f"""
    WITH gen3 AS ({_GEN3_SQL})
    SELECT accession AS "Accession",
           CASE WHEN trim(accession) = '' THEN 'missing required field: Accession'
                WHEN trim(study_name) = '' THEN 'missing required field: Study Name'
                WHEN trim(description) = '' THEN 'missing required field: Description'
                ELSE 'not a dbGaP accession' END AS reject_reason
    FROM gen3
    WHERE trim(accession) = '' OR trim(study_name) = '' OR trim(description) = ''
       OR NOT regexp_matches(accession, '^phs[0-9]+')
    """,
)
def pipeline_bdc_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, quarantine = validate_gen3(_gen3_from_customer(spark, sf_dir))
    return quarantine.select("Accession", "reject_reason")


@query(
    "pipeline-bdc-scoreboard",
    oracle=f"""
    WITH gen3 AS ({_GEN3_SQL}),
    valid AS (
      SELECT string_split(accession, '.')[1] AS study_id
      FROM gen3
      WHERE accession <> '' AND study_name <> '' AND description <> ''
        AND regexp_matches(accession, '^phs[0-9]+')
    ),
    vc AS (
      SELECT study_id, COUNT(*) AS n_vars FROM ({_PICSURE_CLEAN_SQL}) GROUP BY study_id
    )
    SELECT CASE WHEN vc.n_vars > 0 THEN 'SUCCESS' ELSE 'FAILED' END AS status,
           CASE WHEN vc.n_vars > 0 THEN 'XML_generator' ELSE 'both_methods_failed' END AS method,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM valid v LEFT JOIN vc ON v.study_id = vc.study_id
    GROUP BY 1, 2
    """,
)
def pipeline_bdc_scoreboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dug_data_ingest_spark.plans.bdc import scoreboard

    studies_valid, _ = validate_gen3(_gen3_from_customer(spark, sf_dir))
    variables_clean = clean_picsure(_picsure_from_orders(spark, sf_dir))
    return scoreboard(summarize(studies_valid, variables_clean))


# ---------------------------------------------------------------------------
# EP2 slug — HEAL variable index over part-derived fields
# ---------------------------------------------------------------------------


def _heal_fields_from_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    name = F.concat(F.lit("f_"), (F.col("p_partkey") % 7).cast("string"))
    return p.select(
        F.concat(F.lit("HDP"), F.lpad((F.col("p_partkey") % 40).cast("string"), 5, "0")).alias("hdp_id"),
        F.concat(F.lit("dd-"), (F.col("p_partkey") % 3).cast("string")).alias("dd_id"),
        F.when(F.col("p_partkey") % 4 == 1, F.lit(None)).otherwise(name).alias("name"),
        F.when(F.col("p_partkey") % 4 == 1, name).otherwise(F.lit(None)).alias("property"),
        F.when(F.col("p_partkey") % 4 == 0, F.col("p_brand")).otherwise(F.lit(None)).alias("section"),
        F.when(F.col("p_partkey") % 4 == 1, F.col("p_type")).otherwise(F.lit(None)).alias("module"),
        F.when(F.col("p_partkey") % 4 == 2, F.lit("NodeX")).otherwise(F.lit(None)).alias("node"),
        F.col("p_name").alias("title"),
        F.col("p_type").alias("description"),
        F.lit("string").alias("type"),
        F.when(F.col("p_size") % 5 == 0, F.col("p_size").cast("double")).alias("minimum"),
        F.when(F.col("p_size") % 5 == 0, (F.col("p_size") + 10).cast("double")).alias("maximum"),
        F.lit(None).cast("array<string>").alias("enum"),
        F.lit(None).cast("map<string,string>").alias("enumLabels"),
        F.when(F.col("p_partkey") % 5 == 0, F.lit("1=Male|2=Female")).alias("encodings"),
        F.col("p_partkey").cast("int").alias("ord"),
    )


@query(
    "pipeline-heal-variable-index",
    oracle="""
    WITH fields AS (
      SELECT 'HDP' || lpad(CAST(p_partkey % 40 AS VARCHAR), 5, '0') AS hdp_id,
             'dd-' || CAST(p_partkey % 3 AS VARCHAR) AS dd_id,
             'f_' || CAST(p_partkey % 7 AS VARCHAR) AS name,
             CASE WHEN p_partkey % 4 = 0 THEN p_brand
                  WHEN p_partkey % 4 = 1 THEN p_type
                  WHEN p_partkey % 4 = 2 THEN 'NodeX'
                  ELSE 'dd-' || CAST(p_partkey % 3 AS VARCHAR) END AS section,
             p_name AS title, p_type AS description, 'string' AS type,
             CASE WHEN p_size % 5 = 0 THEN CAST(CAST(p_size AS DOUBLE) AS VARCHAR) END AS logical_min,
             CASE WHEN p_size % 5 = 0 THEN CAST(CAST(p_size + 10 AS DOUBLE) AS VARCHAR) END AS logical_max,
             CASE WHEN p_partkey % 5 = 0 THEN '1=Male|2=Female' END AS encodings,
             p_partkey AS ord
      FROM part
    ),
    uniq AS (
      SELECT *, row_number() OVER (PARTITION BY hdp_id, name ORDER BY ord) AS rn
      FROM fields
    )
    SELECT hdp_id AS study_id, dd_id,
           CASE WHEN rn > 1 THEN name || '_' || CAST(rn - 1 AS VARCHAR) ELSE name END AS name,
           section, title, description, type, encodings, logical_min, logical_max
    FROM uniq
    """,
)
def pipeline_heal_variable_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return variable_index(normalize_fields(_heal_fields_from_part(spark, sf_dir)))


# ---------------------------------------------------------------------------
# Ingest QC — the checks an ingest job runs before promoting a load
# (the reference's pipelines validate required fields / uniqueness by
# hand, e.g. /root/reference/scripts/bdc/bdc_utils.py's per-study
# checks; these are the same gates expressed as single-pass Spark
# aggregates over arbitrary tables).
# ---------------------------------------------------------------------------

# dq-profile: per-column profile (nulls, exact distincts, min/max) of
# the customer dim in ONE aggregate pass — every metric for every
# column rides the same scan/shuffle; the wide 1-row result is then
# reshaped to a tall (column, metric...) frame driver-free via
# unpivot-style stacking of struct literals. Exact count_distinct over
# k columns makes Catalyst Expand the scan k-fold; that is the
# documented cost of an exact profile — the 100-TB swap is
# approx_count_distinct, which collapses the Expand back to one pass
# (same plan shape, HLL partials instead).

_DQ_PROFILE_ORACLE = """
SELECT * FROM (
  SELECT 'c_custkey' AS col_name, COUNT(*) AS n_rows,
         COUNT(*) - COUNT(c_custkey) AS n_nulls,
         COUNT(DISTINCT c_custkey) AS n_distinct,
         CAST(MIN(c_custkey) AS VARCHAR) AS min_val,
         CAST(MAX(c_custkey) AS VARCHAR) AS max_val
  FROM customer
  UNION ALL
  SELECT 'c_name', COUNT(*), COUNT(*) - COUNT(c_name),
         COUNT(DISTINCT c_name), MIN(c_name), MAX(c_name) FROM customer
  UNION ALL
  SELECT 'c_mktsegment', COUNT(*), COUNT(*) - COUNT(c_mktsegment),
         COUNT(DISTINCT c_mktsegment), MIN(c_mktsegment), MAX(c_mktsegment)
  FROM customer
  UNION ALL
  SELECT 'c_nationkey', COUNT(*), COUNT(*) - COUNT(c_nationkey),
         COUNT(DISTINCT c_nationkey),
         CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR)
  FROM customer)
"""

_DQ_COLS = ["c_custkey", "c_name", "c_mktsegment", "c_nationkey"]


@query("dq-profile", oracle=_DQ_PROFILE_ORACLE)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact=True — the oracle-verifiable form (expressions identical to
    # the pre-factor inline build, so the graded plan is unchanged);
    # profile_columns(exact=False) is the documented 100-TB swap,
    # plan-pinned Expand-free in tests/test_plan_shapes.py.
    from dug_data_ingest_spark.operators.aggregates import profile_columns

    cust = load(spark, sf_dir, "customer")
    return profile_columns(cust, _DQ_COLS, exact=True)


# pipeline-snapshot-diff: SCD-style change capture between two loads
# WITHOUT materializing (or self-joining) either snapshot: per-customer
# order aggregates "as of" the cutoff vs. "now" come from ONE scan via
# conditional aggregation, and the added/changed/unchanged verdict is
# row-local on the rollup. The naive form — full-outer-join snapshot A
# to snapshot B on key — scans the fact twice and shuffles both sides;
# this shape is the one that survives a 100-TB fact.

_SNAPSHOT_CUTOFF = "1996-12-31"

_SNAPSHOT_DIFF_ORACLE = f"""
WITH rolled AS (
  SELECT o_custkey,
         COUNT(*) FILTER (o_orderdate <= TIMESTAMP '{_SNAPSHOT_CUTOFF} 00:00:00')
           AS old_orders,
         COUNT(*) AS new_orders,
         CAST(ROUND(COALESCE(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)))
           FILTER (o_orderdate <= TIMESTAMP '{_SNAPSHOT_CUTOFF} 00:00:00'), 0), 2)
           AS DOUBLE) AS old_spend,
         CAST(ROUND(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))), 2)
           AS DOUBLE) AS new_spend
  FROM orders GROUP BY o_custkey)
SELECT o_custkey, old_orders, new_orders, old_spend, new_spend,
       CASE WHEN old_orders = 0 THEN 'added'
            WHEN new_orders > old_orders THEN 'changed'
            ELSE 'unchanged' END AS change_type
FROM rolled
"""


@query("pipeline-snapshot-diff", oracle=_SNAPSHOT_DIFF_ORACLE)
def pipeline_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    in_old = F.col("o_orderdate") <= F.lit(f"{_SNAPSHOT_CUTOFF} 00:00:00").cast(
        "timestamp"
    )
    dec_price = dec_money("o_totalprice")
    zero = F.lit(0).cast("decimal(18,2)")
    rolled = orders.groupBy("o_custkey").agg(
        F.count(F.when(in_old, 1)).alias("old_orders"),
        F.count(F.lit(1)).alias("new_orders"),
        F.round(F.sum(F.when(in_old, dec_price).otherwise(zero)), 2)
        .cast("double")
        .alias("old_spend"),
        F.round(F.sum(dec_price), 2).cast("double").alias("new_spend"),
    )
    return rolled.withColumn(
        "change_type",
        F.when(F.col("old_orders") == 0, "added")
        .when(F.col("new_orders") > F.col("old_orders"), "changed")
        .otherwise("unchanged"),
    )


# audit-row-hash: cross-engine content fingerprint of a load. Every
# row is rendered through an engine-stable serialization (bigints and
# varchars verbatim, money via ROUND→DECIMAL(18,2)→string, dates via
# an explicit yyyy-MM-dd format, NULL via a sentinel) and md5-hashed;
# the table fingerprint is the per-bucket (first 2 hex chars, 256
# buckets) row count + min/max hash + the exact sum of each hash's
# 60-bit chunk. Order-insensitive by construction, one
# map-side-combined groupBy over ≤256 groups — audit cost is scan
# cost at any scale, and two independent engines (here Spark and
# DuckDB; in production the upstream warehouse vs. the lake copy)
# agree bucket-for-bucket exactly when the tables hold identical row
# multisets, up to md5/60-bit-sum collisions (the count/min/max-only
# variant would miss a same-bucket drop+duplicate; the chunk sum
# catches it — see test_audit_fingerprint_catches_swap_corruption).

_AUDIT_HASH_ORACLE = """
WITH hashed AS (
  SELECT md5(COALESCE(CAST(o_orderkey AS VARCHAR), '<NULL>') || '|' ||
             COALESCE(CAST(o_custkey AS VARCHAR), '<NULL>') || '|' ||
             COALESCE(o_orderstatus, '<NULL>') || '|' ||
             COALESCE(o_orderpriority, '<NULL>') || '|' ||
             COALESCE(CAST(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))
                           AS VARCHAR), '<NULL>') || '|' ||
             COALESCE(strftime(o_orderdate, '%Y-%m-%d'), '<NULL>')) AS h
  FROM orders)
SELECT substr(h, 1, 2) AS bucket, COUNT(*) AS n_rows,
       MIN(h) AS min_hash, MAX(h) AS max_hash,
       CAST(SUM(CAST(CAST(('0x' || substr(h, 3, 15)) AS BIGINT)
                AS DECIMAL(38,0))) AS VARCHAR) AS sum_hash60
FROM hashed GROUP BY bucket
"""


def fingerprint_orders(orders: DataFrame) -> DataFrame:
    """256-bucket md5 fingerprint of an orders-shaped frame (see the
    audit-row-hash docstring). Exposed so audits — and the
    mutation-sensitivity property test — can fingerprint arbitrary
    snapshots, not just the registered table."""
    # EVERY field is null-coalesced to the sentinel BEFORE concat_ws:
    # Spark's concat_ws silently skips null args (shifting separators)
    # while SQL's || nulls the whole row — the sentinel keeps the
    # serialization total, identical in both engines, and able to
    # distinguish (1, NULL) from (NULL, 1).
    sentinel = F.lit("<NULL>")
    rendered = F.concat_ws(
        "|",
        F.coalesce(F.col("o_orderkey").cast("string"), sentinel),
        F.coalesce(F.col("o_custkey").cast("string"), sentinel),
        F.coalesce("o_orderstatus", sentinel),
        F.coalesce("o_orderpriority", sentinel),
        F.coalesce(dec_money("o_totalprice").cast("string"), sentinel),
        F.coalesce(F.date_format("o_orderdate", "yyyy-MM-dd"), sentinel),
    )
    hashed = orders.select(F.md5(rendered).alias("h"))
    # sum_hash60 makes the bucket fingerprint a COMPLETE checksum:
    # count/min/max alone cannot see a drop-one-duplicate-another
    # corruption inside a bucket ({a,b,c} vs {a,a,c} when b is not an
    # extremum), but the exact DECIMAL(38,0) sum of each hash's
    # 60-bit chunk (hex chars 3-17; chars 1-2 are the bucket id)
    # shifts by b-a. The sum is order-insensitive and map-side
    # mergeable, so the audit stays one scan + one tiny groupBy.
    chunk = F.conv(F.substring("h", 3, 15), 16, 10).cast("bigint")
    return hashed.groupBy(F.substring("h", 1, 2).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("h").alias("min_hash"),
        F.max("h").alias("max_hash"),
        # rendered as a string: pandas demotes DECIMAL(38,0) to
        # float64 (silently losing low digits), strings stay exact
        F.sum(chunk.cast("decimal(38,0)")).cast("string").alias("sum_hash60"),
    )


@query("audit-row-hash", oracle=_AUDIT_HASH_ORACLE)
def audit_row_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint_orders(load(spark, sf_dir, "orders"))


# dq-expectations: the promote/quarantine gate an ingest job runs as a
# RULE TABLE — uniqueness, format, range, and domain expectations —
# evaluated as conditional aggregates in ONE pass over the load (no
# per-rule rescans; the per-rule reshape is a struct explode of the
# 1-row wide result, as dq-profile). The acctbal bound is set tight
# enough that real rows fail it, so the gate's failure path is
# value-verified, not just its all-green path.

_DQ_EXPECTATIONS_ORACLE = """
SELECT 'custkey_unique' AS rule, COUNT(*) AS n_checked,
       COUNT(*) - COUNT(DISTINCT c_custkey) AS n_failed,
       (COUNT(*) - COUNT(DISTINCT c_custkey)) = 0 AS passed
FROM customer
UNION ALL
SELECT 'name_format', COUNT(*),
       COUNT(*) FILTER (c_name IS NULL
                        OR NOT regexp_matches(c_name, '^Customer#[0-9]+$')),
       COUNT(*) FILTER (c_name IS NULL
                        OR NOT regexp_matches(c_name, '^Customer#[0-9]+$')) = 0
FROM customer
UNION ALL
SELECT 'acctbal_range', COUNT(*),
       COUNT(*) FILTER (c_acctbal IS NULL OR c_acctbal < -1000
                        OR c_acctbal > 8000),
       COUNT(*) FILTER (c_acctbal IS NULL OR c_acctbal < -1000
                        OR c_acctbal > 8000) = 0
FROM customer
UNION ALL
SELECT 'nationkey_domain', COUNT(*),
       COUNT(*) FILTER (c_nationkey IS NULL OR c_nationkey < 0
                        OR c_nationkey > 24),
       COUNT(*) FILTER (c_nationkey IS NULL OR c_nationkey < 0
                        OR c_nationkey > 24) = 0
FROM customer
"""


@query("pipeline-dq-expectations", oracle=_DQ_EXPECTATIONS_ORACLE)
def pipeline_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    fails = {
        "name_format": F.col("c_name").isNull()
        | ~F.col("c_name").rlike("^Customer#[0-9]+$"),
        "acctbal_range": F.col("c_acctbal").isNull()
        | (F.col("c_acctbal") < -1000)
        | (F.col("c_acctbal") > 8000),
        "nationkey_domain": F.col("c_nationkey").isNull()
        | (F.col("c_nationkey") < 0)
        | (F.col("c_nationkey") > 24),
    }
    aggs = [
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias(
            "custkey_unique__failed"
        ),
    ] + [
        F.count(F.when(cond, 1)).alias(f"{rule}__failed")
        for rule, cond in fails.items()
    ]
    wide = cust.agg(*aggs)
    rules = ["custkey_unique", *fails]
    per_rule = F.array(
        *[
            F.struct(
                F.lit(r).alias("rule"),
                F.col("n_checked").alias("n_checked"),
                F.col(f"{r}__failed").alias("n_failed"),
                (F.col(f"{r}__failed") == 0).alias("passed"),
            )
            for r in rules
        ]
    )
    return wide.select(F.explode(per_rule).alias("x")).select("x.*")


# pipeline-upsert-latest: the ingest MERGE shape — a base load plus a
# late-arriving update batch, last-writer-wins per key. The update
# batch derives deterministically from orders (every 7th key arrives
# again with a bumped version and status); the merge is union →
# per-key rank by (version DESC) → keep rank 1 — the window
# formulation a table format's MERGE INTO compiles to when the engine
# has to do it itself. Scale: ONE shuffle on the merge key over
# base+updates; no join of base against updates (an upsert join would
# shuffle base twice).

_UPSERT_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)) AS DOUBLE)
           AS price, 1 AS version
  FROM orders),
updates AS (
  SELECT o_orderkey, 'X' AS o_orderstatus,
         CAST(CAST(ROUND(o_totalprice + 10, 2) AS DECIMAL(18,2)) AS DOUBLE)
           AS price, 2 AS version
  FROM orders WHERE o_orderkey % 7 = 0),
merged AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY version DESC) AS rn
  FROM (SELECT * FROM base UNION ALL SELECT * FROM updates))
SELECT o_orderkey, o_orderstatus, price,
       CAST(version AS INT) AS version
FROM merged WHERE rn = 1
"""


@query("pipeline-upsert-latest", oracle=_UPSERT_ORACLE)
def pipeline_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_orderstatus",
        dec_money("o_totalprice").cast("double").alias("price"),
        F.lit(1).alias("version"),
    )
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        dec_money(F.col("o_totalprice") + 10).cast("double").alias("price"),
        F.lit(2).alias("version"),
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    return (
        base.unionAll(updates)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey", "o_orderstatus", "price",
            F.col("version").cast("int").alias("version"),
        )
    )


# graph-triangle-count: triangles in the co-purchase category graph
# (categories co-occurring in an order, high-quantity lines only) —
# the clustering-structure primitive recommendation and community
# pipelines start from. Edges are oriented u < v once, so each
# triangle is counted exactly once by the two-join wedge-close
# (e1(u,v) ⋈ e2(v,w) ⋈ e3(u,w)); at 100 TB the standard refinement
# orients edges by DEGREE instead of id, bounding every wedge list by
# the arboricity — same plan shape, different orientation key.

_TRIANGLE_ORACLE = """
WITH cats AS (
  SELECT DISTINCT l_orderkey, l_partkey % 500 AS cat
  FROM lineitem WHERE l_quantity >= 45),
edges AS (
  SELECT DISTINCT a.cat AS u, b.cat AS v
  FROM cats a JOIN cats b ON a.l_orderkey = b.l_orderkey AND a.cat < b.cat),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1 JOIN edges e2 ON e1.v = e2.u
       JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)
SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
       n_triangles
FROM tri
"""


@query("graph-triangle-count", oracle=_TRIANGLE_ORACLE)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cats = (
        li.filter(F.col("l_quantity") >= 45)
        .select("l_orderkey", (F.col("l_partkey") % 500).alias("cat"))
        .distinct()
    )
    b = cats.select(
        F.col("l_orderkey").alias("bk"), F.col("cat").alias("v")
    )
    edges = (
        cats.join(b, (F.col("l_orderkey") == F.col("bk")) & (F.col("cat") < F.col("v")))
        .select(F.col("cat").alias("u"), "v")
        .distinct()
    )
    return count_triangles(edges)


def count_triangles(edges: DataFrame, orient_by_degree: bool = False) -> DataFrame:
    """One-row (n_edges, n_triangles) over an oriented edge set
    (u < v, distinct). The two-join wedge-close counts each triangle
    exactly once BECAUSE the orientation is acyclic: under any total
    order on nodes, a triangle has exactly one source node with two
    out-edges, so it matches only as e1=(a,b), e2=(b,c), e3=(a,c).
    Factored from the graded query so the exactly-once property is
    checkable against a brute-force model on arbitrary small graphs
    (tests/test_blocking_properties.py) — the oracle mirrors the same
    join shape and could not catch a double-count both sides share.

    ``orient_by_degree=True`` is the at-scale refinement the id
    orientation's docprose promises: re-orient every edge from its
    lower-(degree, id) endpoint to the higher, which bounds each
    node's out-degree — and therefore every wedge list the first join
    materializes — by O(sqrt(edges)) (graph arboricity), instead of
    letting one low-id hub own a quadratic wedge set. Exactly-once
    counting is orientation-independent (any total order is acyclic),
    property-tested by comparing both orientations to the same model.
    Costs two node-keyed joins to attach degrees; the join pattern
    afterwards is identical."""
    if orient_by_degree:
        deg = (
            edges.select(F.explode(F.array("u", "v")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        withdeg = (
            edges.join(deg.withColumnRenamed("node", "u"), "u")
            .withColumnRenamed("deg", "du")
            .join(deg.withColumnRenamed("node", "v"), "v")
            .withColumnRenamed("deg", "dv")
        )
        u_first = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        edges = withdeg.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("u"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("v"),
        )
    e1 = edges
    e2 = edges.select(F.col("u").alias("v2u"), F.col("v").alias("w"))
    e3 = edges.select(F.col("u").alias("cu"), F.col("v").alias("cw"))
    tri = (
        e1.join(e2, F.col("v") == F.col("v2u"))
        .join(e3, (F.col("u") == F.col("cu")) & (F.col("w") == F.col("cw")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return n_edges.crossJoin(tri)
