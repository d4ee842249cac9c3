"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``dug_data_ingest_spark/``; the slug → query
bindings (with their DuckDB oracles) are in
``dug_data_ingest_spark/queries/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (EP3 duplicate-index report shape — SURVEY.md §3)
    on /root/testdata/sf0.001."""
    from dug_data_ingest_spark.queries import all_queries

    return all_queries()["flagship-index-report"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dug_data_ingest_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from dug_data_ingest_spark.queries import all_oracles

    return all_oracles()
