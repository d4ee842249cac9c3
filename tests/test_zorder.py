"""Pins for functions/zorder.py — Morton interleave, min/max grid
normalization, and the layout contract (tight two-dimensional
envelopes per z-range, the property that makes skip indexes prune on
either key).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dug_data_ingest_spark.functions.zorder import (
    normalize_to_bits,
    z_value_2d,
    zorder_key_2d,
)


def _interleave(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_bit_model(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 3), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = [
        r["z"]
        for r in df.select(
            z_value_2d(F.col("x"), F.col("y"), bits=16).alias("z")
        ).collect()
    ]
    assert got == [_interleave(x, y, 16) for x, y in rows]


def test_z_locality_orders_quadrants(spark):
    # the curve's defining property: the four 2x2 quadrants of a
    # [0,2^b)^2 grid occupy disjoint, ordered z-ranges
    b = 8
    half = 1 << (b - 1)
    quads = [(0, 0), (half, 0), (0, half), (half, half)]
    df = spark.createDataFrame(quads, "x long, y long")
    zs = [
        r["z"]
        for r in df.select(
            z_value_2d(F.col("x"), F.col("y"), bits=b).alias("z")
        ).collect()
    ]
    assert zs == sorted(zs)  # (0,0) < (half,0) < (0,half) < (half,half)


def test_normalize_degenerate_span_maps_to_zero(spark):
    df = spark.createDataFrame([(7,), (7,)], "x long")
    out = df.select(
        normalize_to_bits(
            F.col("x"), F.lit(7), F.lit(7), bits=16
        ).alias("s")
    ).collect()
    assert [r["s"] for r in out] == [0, 0]


def test_zorder_key_plan_is_scan_plus_broadcast(spark):
    # one fact scan, the min/max row broadcast back, a row-local z
    # projection — no hash exchange of the fact table
    df = spark.range(0, 1000).select(
        F.col("id").alias("x"), (F.col("id") * 7 % 997).alias("y")
    )
    out = zorder_key_2d(df, "x", "y", bits=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "EvalPython" not in plan, plan


def test_zorder_buckets_are_tight_in_both_dims(spark):
    # the layout payoff: cutting the z-curve into 16 ranges yields
    # per-range envelopes whose AVERAGE span is well under the global
    # span in BOTH dimensions (a single-key sort is tight in one
    # dimension only — its secondary-key spans stay ~global)
    n = 4096
    df = spark.range(0, n).select(
        F.col("id").alias("x"),
        ((F.col("id") * 2654435761) % n).alias("y"),  # decorrelated
    )
    z = zorder_key_2d(df, "x", "y", bits=16).withColumn(
        "bucket", F.shiftright("zval", 28)
    )
    spans = z.groupBy("bucket").agg(
        (F.max("x") - F.min("x")).alias("xs"),
        (F.max("y") - F.min("y")).alias("ys"),
    ).collect()
    avg_xs = sum(r["xs"] for r in spans) / len(spans)
    avg_ys = sum(r["ys"] for r in spans) / len(spans)
    assert avg_xs < 0.5 * (n - 1), avg_xs
    assert avg_ys < 0.5 * (n - 1), avg_ys


def test_bits_validation(spark):
    with pytest.raises(ValueError, match="bits"):
        z_value_2d(F.lit(1), F.lit(1), bits=0)


def test_normalize_clamps_out_of_range_stats(spark):
    # a caller with sampled/stale min-max stats can hand x outside
    # [x_min, x_max]; the scaled value must clamp to the grid ends,
    # never go negative or above 2**bits-1 (sign bits in the Morton
    # interleave produce garbage keys silently)
    df = spark.createDataFrame([(-50,), (0,), (100,), (175,)], "x long")
    got = [
        r[0]
        for r in df.select(
            normalize_to_bits(F.col("x"), F.lit(0), F.lit(100), bits=8)
        ).collect()
    ]
    assert got == [0, 0, 255, 255]


def test_normalize_null_passthrough(spark):
    # NULL coordinate or NULL min/max stats must yield a NULL cell,
    # not cell 0: Spark's greatest/least SKIP null operands, so the
    # clamp alone would silently park null rows at the grid origin
    # with a valid-looking Morton key (r12 ADVICE)
    df = spark.createDataFrame([(None,), (0,), (100,)], "x long")
    got = [
        r[0]
        for r in df.select(
            normalize_to_bits(F.col("x"), F.lit(0), F.lit(100), bits=8)
        ).collect()
    ]
    assert got == [None, 0, 255]
    # null stats (e.g. min/max over an all-null or empty slice)
    got2 = df.filter(F.col("x").isNotNull()).select(
        normalize_to_bits(
            F.col("x"), F.lit(None).cast("long"), F.lit(100), bits=8
        )
    ).collect()
    assert [r[0] for r in got2] == [None, None]


def test_zorder_key_survives_colliding_stat_names(spark):
    # suffix-until-free guard: an input already carrying __xmin must
    # not collide with the staged broadcast stats row
    df = spark.createDataFrame(
        [(1, 2, 99), (3, 4, 98)], "x long, y long, __xmin long"
    )
    out = zorder_key_2d(df, "x", "y", bits=8)
    assert "__xmin" in out.columns and "zval" in out.columns
    assert out.filter(F.col("__xmin").isin(98, 99)).count() == 2
