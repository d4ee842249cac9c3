"""SparkSession factory.

The reference runs on a 1-core / 1-GiB Kubernetes pod
(charts/dug-data-ingest/values.yaml:27-33) with no parallelism at all;
we target a multi-executor cluster. Defaults here are tuned for the
local[N] test harness but every setting is the one you'd ship to a
real cluster (AQE on, Arrow on, UTC, shuffle width ~ cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dug-data-ingest-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    - AQE + partition coalescing + skew-join handling: runtime re-plan
      so the same code survives sf0.001 fixtures and 100 TB tables.
    - Arrow: every mapInPandas/applyInPandas operator (XML parse/render,
      fetch stages, vector ops) moves batches, not rows.
    - UTC session timezone: required for DuckDB-oracle comparability
      (duckdb timestamps are UTC-naive).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", max(cpus, 4))
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
