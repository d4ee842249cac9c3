"""Query registry: binds every SURVEY.md §2 slug (plus the §7
extension operators) to the driver's testdata tables.

Each entry is a callable ``(spark, sf_dir) -> DataFrame`` plus, where
SQL-expressible, an ANSI-SQL oracle string that DuckDB runs on the same
parquet (views: region nation customer supplier part orders lineitem
events documents embeddings). The driver hash-compares the two — this
is the correctness gate described in /root/repo/__spark_entry__.py.

Import side effects register queries; ``all_queries()`` /
``all_oracles()`` expose the final dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(slug: str, oracle: str | None = None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under
    ``slug`` with an optional DuckDB oracle SQL string."""

    def deco(fn):
        QUERIES[slug] = fn
        if oracle is not None:
            ORACLES[slug] = " ".join(oracle.split())
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a testdata table.

    ``events.parquet`` stores ``ts`` as TIMESTAMP(NANOS), which Spark's
    parquet reader rejects by default; read nanos as long (runtime SQL
    conf, so it also works on the driver's own session) and rebuild a
    microsecond timestamp column.
    """
    if table == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        # `ts div 1000`, not `ts / 1000`: epoch-nanos (~1.7e18) exceed a
        # double's 53-bit mantissa, so float division rounds the
        # microsecond value off by ±1 vs DuckDB's exact ns→us truncation
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _register_all() -> None:
    # Import for side effects: each module registers its slugs.
    from dug_data_ingest_spark.queries import (  # noqa: F401
        analytics,
        relational,
        scalars,
        sources,
        extensions,
        pipelines,
        streaming,
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _register_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    _register_all()
    return dict(ORACLES)
