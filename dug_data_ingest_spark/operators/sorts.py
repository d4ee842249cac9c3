"""Sort / limit / top-k operators (SURVEY.md §2.6).

Scale note: a global orderBy is a range-partitioned shuffle + local
sort; Spark samples keys to balance ranges, so sorted output scales
where the reference's in-memory ``sorted()`` cannot. ``limit(n)``
short-circuits per partition before the final single-partition take.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sort_by(df: DataFrame, *cols: str) -> DataFrame:
    """Deterministic processing order by id.

    Reference: ``sorted(discovery_list)``
    (scripts/bdc/get_bdc_studies_from_gen3.py:125;
    get_bdc_studies_md_from_gen3.py:94).
    """
    return df.orderBy(*cols)


def sorted_distinct_join(df: DataFrame, col: str, sep: str = "|", alias: str = "joined") -> DataFrame:
    """``sep.join(sorted(set(values)))`` — dedup + sort + string-agg,
    one map-side-combined aggregation.

    Reference: program list assembly
    (scripts/bdc/get_bdc_studies_from_gen3.py:229-236;
    get_bdc_studies_md_from_gen3.py:157).
    """
    return df.agg(
        F.array_join(F.array_sort(F.collect_set(F.col(col))), sep).alias(alias)
    )


def top_k(df: DataFrame, order: Sequence[Column], k: int = 1) -> DataFrame:
    """Reference: ``head -1`` / ``iloc[0]`` point lookups
    (scripts/bdc/ingest.sh:49)."""
    return df.orderBy(*order).limit(k)


def page(df: DataFrame, order_col: str, after, limit: int) -> DataFrame:
    """Keyset pagination: rows with ``order_col > after``, first
    ``limit`` in order — the scalable form of the reference's
    limit/offset API pulls (offset pagination re-reads every earlier
    page; keyset pagination prunes them at the scan).

    Reference: ``GEN3_DOWNLOAD_LIMIT`` paging
    (scripts/bdc/get_bdc_studies_from_gen3.py:25, 53-72).
    """
    return df.filter(F.col(order_col) > F.lit(after)).orderBy(order_col).limit(limit)
