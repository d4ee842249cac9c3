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

    Collision guard: the reference's sequential seen-set would dodge
    an input that ALREADY contains a generated-looking name (['a',
    'a', 'a_1'] → its walk emits a_1_1 for the literal a_1); a
    one-pass window cannot, so rather than silently emitting
    duplicate "unique" ids, a second window over the OUTPUT raises on
    any residual collision with the offending id in the message.
    Costs one extra out_col-keyed window on id-cardinality data —
    loud beats wrong for the column whose entire job is uniqueness.
    """
    w = W.partitionBy(name_col).orderBy(*order)
    rn = F.row_number().over(w)
    candidate = F.when(
        rn > 1, F.concat(F.col(name_col), F.lit("_"), (rn - 1).cast("string"))
    ).otherwise(F.col(name_col))
    out = df.withColumn(out_col, candidate)
    n_out = F.count(F.lit(1)).over(W.partitionBy(out_col))
    return out.withColumn(
        out_col,
        F.when(n_out == 1, F.col(out_col)).otherwise(
            F.raise_error(
                F.printf(
                    F.lit(
                        "uniquify_ids: suffixed id '%s' still collides "
                        "(the input already contained a name of that "
                        "shape); rename the conflicting input ids"
                    ),
                    F.col(out_col),
                )
            )
        ),
    )


def latest_by(df: DataFrame, order: Sequence[Column]) -> DataFrame:
    """Global top-1 by descending order.

    Reference: ``find … | sort -r | head -n 1`` latest-output pick
    (scripts/bdc/ingest.sh:49, 59).
    """
    return df.orderBy(*[c.desc() for c in order]).limit(1)


def global_row_number(
    df: DataFrame, order: Sequence[Column], out_col: str,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact global ``row_number`` over ``order`` WITHOUT the
    single-partition window (an unpartitioned ``Window.orderBy`` makes
    WindowExec move EVERY row to one partition — the one plan shape
    that cannot survive a fact-grain input at scale).

    Classic distributed ranking instead — ONE data shuffle, no window:
    range-repartition on the order key (each partition holds one
    contiguous key slice), sort within each slice, then read the
    in-slice position straight off ``monotonically_increasing_id``
    (slice index in the upper bits, the materialized-order row number
    in the lower 33 — and the materialized order IS the sort order).
    Slice sizes are a P-bounded map-side-combined aggregate,
    prefix-summed driver-side (P integers, never data); the per-slice
    offset joins back as a broadcast. Every operator is bounded by a
    partition, never the table.

    ``order`` must be a total order (add a unique tiebreak column) or
    ranks of tied rows are partition-order-dependent. Returns
    ``(df_with_out_col, total_row_count)`` — the count rides the
    slice-size pass, so callers get N for percent_rank / cume_dist /
    ntile arithmetic without a second scan. The lazy localCheckpoint
    freezes the id assignment so the size pass and the ranked output
    read the same materialization (same idiom as ext/dedup.py's label
    propagation).
    """
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    mid = F.monotonically_increasing_id()
    sliced = (
        df.repartitionByRange(p, *order)
        .sortWithinPartitions(*order)
        .select("*", F.shiftrightunsigned(mid, 33).alias("__slice"),
                (mid % F.lit(1 << 33)).alias("__pos"))
        .localCheckpoint(eager=False)
    )
    sizes = sliced.groupBy("__slice").count().collect()
    offsets, acc = [], 0
    for row in sorted(sizes, key=lambda r: r["__slice"]):
        if row["count"] >= 1 << 33:
            raise ValueError(
                "global_row_number: a range slice holds ≥ 2^33 rows, "
                "overflowing the per-partition id field; raise "
                "num_partitions"
            )
        offsets.append((row["__slice"], acc))
        acc += row["count"]
    off = spark.createDataFrame(offsets, "__slice bigint, __off bigint")
    out = (
        sliced.join(F.broadcast(off), "__slice")
        .withColumn(out_col, (F.col("__off") + F.col("__pos") + 1).cast("bigint"))
        .drop("__slice", "__pos", "__off")
    )
    return out, acc
