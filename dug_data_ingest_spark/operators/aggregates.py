"""Aggregation operators (SURVEY.md §2.4).

All aggregates are built-ins (hash aggregation with map-side partial
combine — the reference's Counter/defaultdict walks, distributed).
``collect_list`` appears only inside bounded groups (a data table's
variables, 10^2–10^3 rows) per SURVEY §4's scale note.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def group_collect(
    df: DataFrame,
    key: str,
    order_col: str,
    collect_expr: Column,
    label_expr: Column | None = None,
) -> DataFrame:
    """Group rows by ``key``; deterministically collect an ordered list
    and (optionally) the first row's label.

    Reference: ``picsure_df.groupby('dtId')`` one-XML-doc-per-group
    with first-of-group label (scripts/bdc/xml_generator.py:201-212,
    :122, :205-209). First-of-group is made deterministic with min_by
    over an explicit ordering column — the reference relied on file
    row order.
    """
    aggs = [
        F.count("*").alias("n_rows"),
        F.array_sort(F.collect_list(collect_expr)).alias("items"),
    ]
    if label_expr is not None:
        aggs.append(F.min_by(label_expr, F.col(order_col)).alias("label"))
    return df.groupBy(key).agg(*aggs)


def dup_detect(df: DataFrame, *keys: str) -> DataFrame:
    """Keys occurring more than once — the reference's loud pagination
    sanity check, as a DataFrame instead of a raise.

    Reference: ``Counter(...).items() if count > 1``
    (scripts/bdc/get_bdc_studies_from_gen3.py:74-82; raising clone at
    get_bdc_studies_md_from_gen3.py:74-77; duplicate-study guard at
    scripts/heal/get_heal_platform_mds_data_dicts.py:123-125).
    """
    return df.groupBy(*keys).agg(F.count("*").alias("n")).filter(F.col("n") > 1)


def summary_counts(df: DataFrame, status_col: str) -> DataFrame:
    """Pipeline scoreboard: counts per status in one pass.

    Reference: scripts/bdc/run_dbgap_xml_gen_fallback.py:80-126.
    """
    return df.groupBy(status_col).agg(F.count("*").alias("n"))


def nested_counts(
    df: DataFrame,
    keys: Sequence[str],
    distinct_cols: Sequence[tuple[str, str]],
) -> DataFrame:
    """Per-key distinct-counts + total rows: the index report's
    "#DDs / #sections / #variables" cell.

    Reference: scripts/lakefs/generate_lakefs_dbgap_xml_index.py:274-288.
    """
    aggs = [F.countDistinct(src).alias(alias) for src, alias in distinct_cols]
    aggs.append(F.count("*").alias("n_rows"))
    return df.groupBy(*keys).agg(*aggs)


def first_wins(df: DataFrame, key: str, order: Sequence[Column]) -> DataFrame:
    """Deterministic first-wins consolidation: one row per key, chosen
    by an explicit ordering (NOT dropDuplicates, which is
    partition-order-dependent).

    Reference: ``study_dict`` first-wins at
    scripts/bdc/get_bdc_studies_from_gen3.py:335-352, which depends on
    sorted-id iteration at :125 — here the ordering is explicit.
    """
    w = W.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def pivot_report(
    df: DataFrame,
    row_key: str,
    pivot_col: str,
    pivot_values: Sequence[str],
    cell: Column,
) -> DataFrame:
    """Pivot with an explicit column set (determinism + oracle
    comparability) plus a non-null-cell count per row.

    Reference: the duplicate-index report — rows=study_id,
    columns=repository, cell=formatted counts string,
    ``repository_count`` (scripts/lakefs/generate_lakefs_dbgap_xml_index.py:266-291).
    SURVEY §7 hard-part 7: always pass explicit pivot values.
    """
    pivoted = df.groupBy(row_key).pivot(pivot_col, list(pivot_values)).agg(cell)
    count_expr = sum(
        (F.when(F.col(v).isNotNull(), 1).otherwise(0) for v in pivot_values),
        F.lit(0),
    )
    return pivoted.withColumn(f"{pivot_col}_count", count_expr)


def rollup_counts(df: DataFrame, *keys: str) -> DataFrame:
    """Per-group counts at every rollup level (per-dd, per-study,
    grand total in one pass).

    Reference: running totals at
    scripts/heal/get_heal_platform_mds_data_dicts.py:363-367, 374-376,
    476, 511 — the reference walks the data three times; ROLLUP is one
    shuffle.
    """
    return df.rollup(*keys).agg(F.count("*").alias("n"))
