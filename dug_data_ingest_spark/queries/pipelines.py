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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dug_data_ingest_spark.plans.bdc import (
    clean_picsure,
    summarize,
    validate_gen3,
)
from dug_data_ingest_spark.plans.heal import normalize_fields, variable_index
from dug_data_ingest_spark.queries import load, query

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
