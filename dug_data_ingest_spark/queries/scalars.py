"""SURVEY.md §2.8 scalar-function slugs over the testdata tables.

Every one of these is a pure JVM-side Column expression (no Python in
the hot path). Reference citations live in the docstrings; the
binding columns come from FIXTURES.md §A.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dug_data_ingest_spark.queries import load, query


@query(
    "str-split-part",
    oracle="""
    SELECT o_orderkey,
           split_part(o_orderpriority, '-', 1) AS prio_code,
           split_part(o_orderpriority, '-', 2) AS prio_name
    FROM orders
    """,
)
def str_split_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split('.')[i] family (scripts/bdc/run_dbgap_xml_gen_fallback.py:69,
    xml_generator.py:29-32)."""
    df = load(spark, sf_dir, "orders")
    parts = F.split(F.col("o_orderpriority"), "-")
    return df.select(
        "o_orderkey",
        parts.getItem(0).alias("prio_code"),
        parts.getItem(1).alias("prio_name"),
    )


@query(
    "str-startswith",
    oracle="""
    SELECT p_partkey, starts_with(p_name, 'small') AS is_small FROM part
    """,
)
def str_startswith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """startswith('phv'/'phs'/'<?xml')
    (scripts/bdc/get_bdc_studies_md_from_picsure.py:45)."""
    df = load(spark, sf_dir, "part")
    return df.select(
        "p_partkey", F.col("p_name").startswith("small").alias("is_small")
    )


@query(
    "str-case-trim",
    oracle="""
    SELECT p_partkey, lower(p_type) AS type_lower,
           trim(p_name) AS name_trim,
           replace(p_name, ' ', '_') AS name_us
    FROM part
    """,
)
def str_case_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/strip/replace (scripts/bdc/run_dbgap_xml_gen_fallback.py:177,
    get_dbgap_data_dicts.py:204)."""
    df = load(spark, sf_dir, "part")
    return df.select(
        "p_partkey",
        F.lower("p_type").alias("type_lower"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.translate(F.col("p_name"), " ", "_").alias("name_us"),
    )


@query(
    "str-concat-format",
    oracle="""
    SELECT p_partkey,
           printf('%s (%s): %d', p_name, p_brand, p_size) AS label,
           concat_ws('|', p_brand, p_type) AS pair
    FROM part
    """,
)
def str_concat_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f-string templating of ids/filenames/messages
    (scripts/bdc/xml_generator.py:119,133,210)."""
    df = load(spark, sf_dir, "part")
    return df.select(
        "p_partkey",
        F.format_string("%s (%s): %d", "p_name", "p_brand", "p_size").alias("label"),
        F.concat_ws("|", "p_brand", "p_type").alias("pair"),
    )


@query(
    "str-regex",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '^Customer#(\\d+)$', 1) AS digits,
           regexp_matches(c_name, '^Customer#\\d+$') AS is_valid
    FROM customer
    """,
)
def str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """re.match/fullmatch with groups
    (scripts/bdc/get_bdc_studies_from_gen3.py:204, 214, 295)."""
    df = load(spark, sf_dir, "customer")
    return df.select(
        "c_custkey",
        F.regexp_extract("c_name", r"^Customer#(\d+)$", 1).alias("digits"),
        F.col("c_name").rlike(r"^Customer#\d+$").alias("is_valid"),
    )


@query(
    "date-now",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), current_date) AS BIGINT)
             AS age_days
    FROM orders
    """,
)
def date_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """current date as string + date arithmetic
    (scripts/bdc/get_bdc_studies_from_gen3.py:190, xml_utils.py:35)."""
    df = load(spark, sf_dir, "orders")
    return df.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.datediff(F.current_date(), F.col("o_orderdate")).cast("bigint").alias(
            "age_days"
        ),
    )


@query(
    "math-count-inc",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS total_qty,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           ROUND(100.0 * SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                 / COUNT(*), 2) AS pct_returned
    FROM lineitem
    """,
)
def math_count_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """counters / offsets / success percentages
    (scripts/bdc/run_dbgap_xml_gen_fallback.py:81-86)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.round(
            100.0
            * F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            / F.count("*"),
            2,
        ).alias("pct_returned"),
    )


@query(
    "arr-parse-literal",
    oracle="""
    WITH lit AS (
      SELECT doc_id, '[''' || lang || ''', ''' || source || ''']' AS values_str
      FROM documents
    )
    SELECT doc_id, values_str,
           string_split(replace(replace(replace(values_str, '[', ''), ']', ''), '''', ''),
                        ', ')[1] AS first_value,
           CAST(len(string_split(values_str, ', ')) AS INT) AS n_values
    FROM lit
    """,
)
def arr_parse_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse a stringified Python list safely — the reference used
    ``eval(str(row['values']))`` (scripts/bdc/xml_generator.py:146-156);
    we from_json directly (SURVEY §7 hard-part 2): Spark's JSON reader
    accepts single-quoted strings (allowSingleQuotes default), so no
    quote-normalization pass — a regexp ' -> " swap would corrupt any
    element containing an apostrophe (same lesson as plans/bdc.py
    generate_xml).
    """
    df = load(spark, sf_dir, "documents")
    values_str = F.concat(
        F.lit("['"), F.col("lang"), F.lit("', '"), F.col("source"), F.lit("']")
    )
    arr = F.from_json(values_str, T.ArrayType(T.StringType()))
    return df.select(
        "doc_id",
        values_str.alias("values_str"),
        arr.getItem(0).alias("first_value"),
        F.size(arr).cast("int").alias("n_values"),
    )


@query(
    "map-enum-labels",
    oracle="""
    SELECT event_id, user_id % 3 AS code,
           CASE WHEN user_id % 3 = 1 THEN 'Male'
                WHEN user_id % 3 = 2 THEN 'Female'
                ELSE CAST(user_id % 3 AS VARCHAR) END AS label
    FROM events
    """,
)
def map_enum_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """code→label map from a legacy "k=v|k=v" encodings string, with
    key-fallback-to-code
    (scripts/heal/get_heal_platform_mds_data_dicts.py:443-467).
    """
    df = load(spark, sf_dir, "events")
    code = (F.col("user_id") % 3).cast("bigint")
    enc_map = F.str_to_map(F.lit("1=Male|2=Female"), F.lit(r"\|"), F.lit("="))
    label = F.coalesce(
        F.element_at(enc_map, code.cast("string")), code.cast("string")
    )
    return df.select("event_id", code.alias("code"), label.alias("label"))


@query(
    "map-gender-code",
    oracle="""
    SELECT event_id,
           CAST(CASE WHEN event_type = 'purchase' THEN 1
                     WHEN event_type = 'signup' THEN 2
                     ELSE 0 END AS INT) AS type_code
    FROM events
    """,
)
def map_gender_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hardcoded value encoding, Male→1 / Female→2
    (scripts/bdc/xml_generator.py:151-156)."""
    df = load(spark, sf_dir, "events")
    return df.select(
        "event_id",
        F.when(F.col("event_type") == "purchase", 1)
        .when(F.col("event_type") == "signup", 2)
        .otherwise(0)
        .cast("int")
        .alias("type_code"),
    )


@query(
    "json-access",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.absent') AS absent
    FROM events
    """,
)
def json_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """.get() chains with defaults over parsed JSON
    (scripts/bdc/get_bdc_studies_from_gen3.py:302-317)."""
    df = load(spark, sf_dir, "events")
    return df.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.get_json_object("props", "$.absent").alias("absent"),
    )


@query(
    "json-shape-dispatch",
    oracle="""
    WITH shaped AS (
      SELECT event_id,
             CASE WHEN event_id % 2 = 0
                  THEN '[' || json_extract_string(props, '$.k') || ']'
                  ELSE props END AS payload
      FROM events
    )
    SELECT event_id,
           CASE WHEN payload LIKE '[%' THEN 'list' ELSE 'dict' END AS shape,
           CAST(CASE WHEN payload LIKE '[%'
                     THEN json_extract_string(payload, '$[0]')
                     ELSE json_extract_string(payload, '$.k') END AS BIGINT) AS k
    FROM shaped
    """,
)
def json_shape_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime list-vs-dict shape dispatch — the reference's
    ``isinstance`` laddering over polymorphic ``data_dictionary``
    payloads (scripts/heal/get_heal_platform_mds_data_dicts.py:176-216).
    Normalized at read with a conditional parse, not imperative code.
    """
    df = load(spark, sf_dir, "events")
    payload = F.when(
        F.col("event_id") % 2 == 0,
        F.concat(F.lit("["), F.get_json_object("props", "$.k"), F.lit("]")),
    ).otherwise(F.col("props"))
    shaped = df.select("event_id", payload.alias("payload"))
    is_list = F.col("payload").startswith("[")
    k = F.when(is_list, F.get_json_object("payload", "$[0]")).otherwise(
        F.get_json_object("payload", "$.k")
    )
    return shaped.select(
        "event_id",
        F.when(is_list, "list").otherwise("dict").alias("shape"),
        k.cast("bigint").alias("k"),
    )


@query(
    "events-props-flatten",
    oracle="""
    WITH mutated AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 13 = 0 THEN 'oops' || props
                  WHEN event_id % 7 = 0 THEN replace(props, '"k"', '"key"')
                  ELSE props END AS p2
      FROM events
    ),
    flat AS (
      SELECT event_id, event_type,
             CASE WHEN json_valid(p2) THEN
               COALESCE(TRY_CAST(json_extract_string(p2, '$.k') AS BIGINT),
                        TRY_CAST(json_extract_string(p2, '$.key') AS BIGINT))
             END AS k
      FROM mutated
    )
    SELECT event_id, event_type, k,
           CAST(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_valid
    FROM flat
    """,
)
def events_props_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read bronze ingest (SURVEY §7 hard-part 1): a JSON
    STRING column is parsed ONCE into a typed struct with ``from_json``
    and flattened to columns — the pattern for wide extraction, where
    per-field ``get_json_object`` (json-access) re-parses the document
    per field. Alias tolerance: producers disagree on field names
    (``k`` vs ``key``), so the flatten coalesces over the candidate
    paths; malformed documents parse to a null struct (PERMISSIVE) and
    surface as ``is_valid = 0`` instead of failing the job.

    The testdata's props are uniform, so both engines deterministically
    REWRITE a slice in-query first — event_id % 7 renames the field
    (exercises the coalesce), % 13 corrupts the document (exercises
    null-on-corrupt) — turning a no-op corpus into a positive
    verification of both behaviors (same pattern as text-pii-redact's
    injected spans). At 100 TB this is a zero-shuffle projection that
    stays in whole-stage codegen; from_json prunes to the requested
    struct fields."""
    df = load(spark, sf_dir, "events")
    p2 = (
        F.when(
            F.col("event_id") % 13 == 0,
            F.concat(F.lit("oops"), F.col("props")),
        )
        .when(
            F.col("event_id") % 7 == 0,
            F.replace(F.col("props"), F.lit('"k"'), F.lit('"key"')),
        )
        .otherwise(F.col("props"))
    )
    parsed = F.from_json(p2, "k BIGINT, key BIGINT")
    flat = df.select(
        "event_id",
        "event_type",
        F.coalesce(parsed["k"], parsed["key"]).alias("k"),
    )
    return flat.withColumn(
        "is_valid",
        F.when(F.col("k").isNotNull(), 1).otherwise(0).cast("int"),
    )
