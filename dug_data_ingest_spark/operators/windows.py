"""Window operators (SURVEY.md §2.5).

The reference's whole window surface is three idioms; each is one
Window expression here. All windows partition by a key, so at scale
they shuffle once on that key and never collect to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def first_per_group(
    df: DataFrame, key: str, order: Sequence[Column], value: str, alias: str
) -> DataFrame:
    """One row per key carrying the first value by an explicit order.

    Reference: ``group['derived_var_name'].iloc[0]`` group labels
    (scripts/bdc/xml_generator.py:122, 205;
    scripts/bdc/run_dbgap_xml_gen_fallback.py:203).
    """
    w = W.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(key), F.col(value).alias(alias))
    )


def uniquify_ids(
    df: DataFrame, name_col: str, order: Sequence[Column], out_col: str
) -> DataFrame:
    """Append ``_1, _2, …`` to duplicate ids, deterministically.

    Reference: the global seen-set walk at
    scripts/heal/get_heal_platform_mds_data_dicts.py:358-400. The
    reference's suffix numbering depends on iteration order across all
    dds in a file; here the order is an explicit column so output is
    stable across partitionings (SURVEY §7 hard-part 3).
    """
    w = W.partitionBy(name_col).orderBy(*order)
    rn = F.row_number().over(w)
    return df.withColumn(
        out_col,
        F.when(rn > 1, F.concat(F.col(name_col), F.lit("_"), (rn - 1).cast("string")))
        .otherwise(F.col(name_col)),
    )


def latest_by(df: DataFrame, order: Sequence[Column]) -> DataFrame:
    """Global top-1 by descending order.

    Reference: ``find … | sort -r | head -n 1`` latest-output pick
    (scripts/bdc/ingest.sh:49, 59).
    """
    return df.orderBy(*[c.desc() for c in order]).limit(1)
