"""Fixture-replayable remote-fetch stages (SURVEY.md §2.1:
src-rest-paginated, src-rest-keyed, src-ftp-files).

The reference fetches serially on one thread (paginated Gen3 pulls at
scripts/bdc/get_bdc_studies_from_gen3.py:32-82, per-key N+1 GETs at
:84-132, FTP downloads with HTTP fallback at
scripts/bdc/get_dbgap_data_dicts.py:46-136). Spark-first, a fetch is
a ``mapInPandas`` stage over a partitioned work-list (offset ranges or
key batches): each partition holds one connection/session, retries
in-task, and the pages that the reference pulled one-by-one download
in parallel across executors.

Every fetcher takes a ``fetch_batch(pdf) -> pdf`` callable. In
production that callable does HTTP/FTP; in tests and in the driver's
correctness gate it replays from a local parquet fixture — same plan,
no network (SURVEY §5's ``--use-cached`` practice, systematized).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _spark_schema_for(path: str) -> T.StructType:
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    return from_arrow_schema(pq.read_schema(path))


def parquet_page_fetcher(path: str, order_cols: list[str]) -> Callable:
    """A fixture 'API server': returns rows [offset, offset+limit) of
    the parquet at ``path`` in deterministic ``order_cols`` order."""

    def fetch(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        table = pq.read_table(path)
        pdf = table.to_pandas().sort_values(order_cols, kind="mergesort")
        out = []
        for row in batch.itertuples(index=False):
            out.append(pdf.iloc[row.offset : row.offset + row.limit])
        return pd.concat(out) if out else pdf.iloc[0:0]

    return fetch


def paginated_fetch(
    spark: SparkSession,
    fetch_page: Callable[[pd.DataFrame], pd.DataFrame],
    total: int,
    limit: int,
    schema: T.StructType,
) -> DataFrame:
    """Parallel paginated list fetch: one task per offset range.

    Reference: serial ``while True: download_gen3_list(offset, limit)``
    (scripts/bdc/get_bdc_studies_from_gen3.py:32-82,
    GEN3_DOWNLOAD_LIMIT=50 at :25). Here the offset range is a
    DataFrame and pages fetch concurrently; short-page termination
    becomes an explicit ``total`` (or a pre-flight count request).
    """
    offsets = spark.range(0, total, limit).select(
        F.col("id").cast("long").alias("offset"), F.lit(limit).alias("limit")
    )
    # Spread page fetches across the cluster: one page per partition up
    # to the parallelism cap.
    n_parts = max(1, min(int(spark.sparkContext.defaultParallelism), (total + limit - 1) // limit))
    offsets = offsets.repartition(n_parts)
    # the page work-list IS a key frame: same one-session-per-batch
    # mapInPandas stage
    return keyed_fetch(offsets, fetch_page, schema)


def keyed_fetch(
    keys: DataFrame,
    fetch_batch: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType,
    partitions: int | None = None,
) -> DataFrame:
    """Per-key detail fetch (the reference's N+1 GET pattern), batched:
    each partition fetches its keys with one session.

    Reference: ``retrieve_bdc_study_info(base, id)`` per study
    (scripts/bdc/get_bdc_studies_from_gen3.py:84-97, 110-132; HEAL
    per-study/per-dd at get_heal_platform_mds_data_dicts.py:113-171).
    """
    if partitions:
        keys = keys.repartition(partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                yield fetch_batch(batch)

    return keys.mapInPandas(run, schema=schema)


def incremental_fetch(
    listing: DataFrame,
    manifest: DataFrame,
    key: str,
    fetch_batch: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType,
) -> DataFrame:
    """Idempotent bulk download: anti-join the full listing against the
    already-ingested manifest and fetch ONLY the remainder. Returns
    just the newly fetched rows — the caller decides whether to union
    them with the manifest's rows (whose schema usually differs from
    the fetch output) or write them alongside; see
    queries/sources.py:src-ftp-files for the union-back shape.

    Reference: skip-if-already-downloaded
    (scripts/bdc/get_dbgap_data_dicts.py:230-235) plus the FTP
    download-with-retry loop (:46-136). The retry/fallback logic lives
    inside ``fetch_batch`` (per-task); the skip is a broadcast
    anti-join instead of an ``os.path.exists`` check, so it holds on a
    1000-executor cluster where local disk proves nothing.
    """
    todo = listing.join(F.broadcast(manifest.select(key)), key, "left_anti")
    return keyed_fetch(todo, fetch_batch, schema)
