"""Star-schema OLAP queries over the full testdata scale.

The reference workload is metadata-sized (thousands of studies), so
none of its operators ever stress the shuffle machinery. These queries
are the engine's large-fact-table surface — the shapes a 100 TB
training-data warehouse actually runs (BASELINE.json north star;
SURVEY.md §7 M6): full-scan aggregation with map-side combine,
multi-way dim joins that must stay broadcast, top-k without a global
sort, windowed rollups, and time-series lag — each over ``lineitem``
(the largest table at every sf) with a DuckDB oracle.

Scale notes per query are inline; the plan properties are locked in by
``tests/test_plan_shapes.py`` (broadcast of every dim side, shipdate
filter pushed to the parquet scan, TakeOrderedAndProject for top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from dug_data_ingest_spark.queries import (
    DEC_MONEY_SQL,
    DEC_REV_SQL,
    dec_money,
    dec_rev,
    load,
    query,
)

# Every money aggregate in this file sums EXACT decimals (dec_money /
# dec_rev and their SQL twins) instead of raw doubles: SUM(double) is
# order-dependent in the last bits, which flips ROUND(·,2) when a
# group lands on a .xx5 boundary — engine-divergent under different
# partitionings (observed: 307843.595 at sf0.01). The decimal sum is
# associative, so the group total is bit-identical under any plan.
_DEC_PRICE_SQL = DEC_MONEY_SQL.format(x="l_extendedprice")
_DEC_TOTAL_SQL = DEC_MONEY_SQL.format(x="o_totalprice")

# ---------------------------------------------------------------------------
# Pricing summary (TPC-H Q1 shape): one full scan of the fact table,
# 4 output groups. All aggregates are partial-aggregated map-side, so
# the single shuffle moves ~groups × partitions rows, never the data.
# The shipdate predicate reaches the parquet scan (PushedFilters).
# ---------------------------------------------------------------------------

# sum_qty / avg_qty / avg_disc stay plain doubles: l_quantity is
# integer-valued and l_discount 2dp×100 is integer-valued, so their
# double sums are EXACT (every partial < 2^53) and order-independent
# already. The price-derived aggregates sum exact decimals — the
# charge has ≤6 decimal digits (2dp price × 2dp discount × 2dp tax),
# so ROUND(·,6) recovers it exactly. avg_price divides the exact
# decimal sum (as a double) by the count: deterministic given the sum.
_PRICING_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       CAST(SUM({_DEC_PRICE_SQL}) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM({DEC_REV_SQL}), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
                           AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 2) AS avg_qty,
       ROUND(CAST(SUM({_DEC_PRICE_SQL}) AS DOUBLE) / COUNT(*), 2) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-31'
GROUP BY l_returnflag, l_linestatus
"""


@query("olap-pricing-summary", oracle=_PRICING_ORACLE)
def olap_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = F.round(disc_price * (1 + F.col("l_tax")), 6).cast("decimal(18,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-31").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.sum(dec_money("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(F.sum(dec_rev()), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(
                F.sum(dec_money("l_extendedprice")).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Revenue by nation (TPC-H Q5 shape): fact ⋈ orders ⋈ customer ⋈
# supplier ⋈ nation ⋈ region with the local-supplier predicate
# (c_nationkey = s_nationkey). Every dim side is explicitly
# broadcast — at 100 TB the only shuffle this plan may contain is the
# lineitem ⋈ orders equi-join (both sides huge); nation/region/
# customer/supplier are O(sf) and must never trigger a sort-merge of
# the fact. The orderdate/region filters prune before the fact join.
# ---------------------------------------------------------------------------

_REVENUE_NATION_ORACLE = f"""
SELECT n_name, CAST(ROUND(SUM({DEC_REV_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


@query("olap-revenue-by-nation", oracle=_REVENUE_NATION_ORACLE)
def olap_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        # orders is the FACT side of this join (the header declares it
        # the plan's one permissible shuffle at 100 TB) — no hard
        # broadcast hint; AQE still broadcasts it at small sf
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(dec_rev()), 2).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Top unshipped orders (TPC-H Q3 shape): top-10 by revenue WITHOUT a
# global sort — Spark plans orderBy+limit as TakeOrderedAndProject
# (per-partition heap of 10, driver merge of 10×partitions rows).
# ---------------------------------------------------------------------------

_TOP_ORDERS_ORACLE = f"""
SELECT l_orderkey,
       CAST(ROUND(SUM({DEC_REV_SQL}), 2) AS DOUBLE) AS revenue,
       STRFTIME(MIN(o_orderdate), '%Y-%m-%d') AS orderdate,
       MIN(o_orderpriority) AS o_orderpriority
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-07-01'
  AND l_shipdate > TIMESTAMP '1998-07-01'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("olap-top-orders", oracle=_TOP_ORDERS_ORACLE)
def olap_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        # orders (date-filtered ≈ the whole fact) must not carry a
        # hard broadcast hint — AQE broadcasts at small sf, shuffles
        # at scale; the revenue cut key sums exact decimals so the
        # top-10 SET is engine-identical
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey")
        .agg(
            F.round(F.sum(dec_rev()), 2).cast("double").alias("revenue"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("orderdate"),
            F.min("o_orderpriority").alias("o_orderpriority"),
        )
        # l_orderkey tiebreak: a revenue tie at the LIMIT boundary
        # must pick the same SET in both engines
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Nation rank within region: aggregate-then-window. The window runs
# over the ~25-row rollup, not the fact — the cheap place for ranking;
# ranking the fact first would shuffle everything per region.
# ---------------------------------------------------------------------------

_NATION_RANK_ORACLE = f"""
WITH rollup_rev AS (
  SELECT r_name, n_name, SUM({_DEC_TOTAL_SQL}) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name, CAST(rev AS DOUBLE) AS revenue,
       CAST(RANK() OVER (PARTITION BY r_name ORDER BY rev DESC) AS INT) AS rev_rank
FROM rollup_rev
"""


@query("olap-nation-rank-window", oracle=_NATION_RANK_ORACLE)
def olap_nation_rank_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    rollup = (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(dec_money("o_totalprice")).alias("rev"))
    )
    return rollup.select(
        "r_name",
        "n_name",
        F.col("rev").cast("double").alias("revenue"),
        F.rank()
        .over(W.partitionBy("r_name").orderBy(F.desc("rev")))
        .cast("int")
        .alias("rev_rank"),
    )


# ---------------------------------------------------------------------------
# Monthly revenue with month-over-month delta: time-series lag over a
# pre-aggregated monthly rollup (one shuffle to months, then a single-
# partition window over ~80 rows — bounded regardless of sf).
# ---------------------------------------------------------------------------

_MONTHLY_LAG_ORACLE = f"""
WITH monthly AS (
  SELECT STRFTIME(o_orderdate, '%Y-%m') AS month, SUM({_DEC_TOTAL_SQL}) AS rev
  FROM orders GROUP BY 1
)
SELECT month, CAST(rev AS DOUBLE) AS revenue,
       CAST(rev - LAG(rev) OVER (ORDER BY month) AS DOUBLE) AS mom_delta
FROM monthly
"""


@query("olap-monthly-revenue-lag", oracle=_MONTHLY_LAG_ORACLE)
def olap_monthly_revenue_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.sum(dec_money("o_totalprice")).alias("rev"))
    return monthly.select(
        "month",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev") - F.lag("rev").over(W.orderBy("month")))
        .cast("double")
        .alias("mom_delta"),
    )


# ---------------------------------------------------------------------------
# Rollup (grouping sets): the reference has none (SURVEY §2.4); the
# engine exposes Spark's native rollup — subtotals and grand total in
# ONE pass (a single shuffle computes every grouping set; the naive
# alternative is 3 scans + a union).
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({_DEC_PRICE_SQL}) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("olap-rollup-summary", oracle=_ROLLUP_ORACLE)
def olap_rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(dec_money("l_extendedprice")).cast("double").alias("sum_price"),
        F.count("*").alias("n_items"),
    )


_GSETS_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       CAST(GROUPING(CAST(year(l_shipdate) AS INT)) AS INT) AS g_year,
       CAST(SUM({_DEC_PRICE_SQL}) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY GROUPING SETS (
  (l_returnflag, l_linestatus), (CAST(year(l_shipdate) AS INT)), ()
)
"""


@query("olap-grouping-sets", oracle=_GSETS_ORACLE)
def olap_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARBITRARY grouping sets — (flag, status), (ship_year), () — with
    GROUPING() null-vs-subtotal markers, beyond what rollup/cube can
    express (the sets are not a prefix/power-set family). One pass:
    Spark plans a single Expand (3 replicas of each input row, one per
    set) feeding ONE partial+final aggregate — the same shuffle count
    as a plain groupBy, where the naive alternative is 3 scans + union.
    The GROUPING() markers disambiguate a genuine NULL dimension value
    from a subtotal row, which is what makes the output safely
    machine-consumable downstream.

    At 100 TB the Expand multiplies the aggregate INPUT, not the
    shuffle: partial aggregation collapses each replica to its set's
    group cardinality map-side, so the exchange carries ~|groups|
    rows. Extension surface: the reference has no grouping-set idiom
    (SURVEY §2.4 notes the absence); rollup landed as
    olap-rollup-summary, this adds the general form."""
    li = load(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate").cast("int")
    )
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["ship_year"], []],
        "l_returnflag", "l_linestatus", "ship_year",
    ).agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.grouping("ship_year").cast("int").alias("g_year"),
        F.sum(dec_money("l_extendedprice")).cast("double").alias("sum_price"),
        F.count("*").alias("n_items"),
    )


_RUNNING_TOTAL_ORACLE = f"""
SELECT o_custkey, o_orderkey,
       CAST(SUM({_DEC_TOTAL_SQL}) OVER w AS DOUBLE) AS running_spend,
       CAST(SUM({_DEC_TOTAL_SQL}) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS sum3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING)
"""


@query("win-running-total", oracle=_RUNNING_TOTAL_ORACLE)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running customer spend + 3-order moving sum — the
    cumulative/moving window family (§2.5 depth beyond
    first/latest/uniquify). ONE shuffle on o_custkey serves both frames
    (same partition + order spec); ties are broken by o_orderkey so the
    running sums are deterministic, and both engines accumulate the
    same doubles in the same frame order, making the rounded values
    bit-identical (a moving AVERAGE would divide first and round on a
    half-cent tie, where the engines' binary .xx5 neighborhoods
    disagree — measured 4/1500 rows off by one cent). At 100 TB the per-customer sequences are short, so
    the sort inside each partition is cheap; a window over a MONSTER
    partition key would instead want the two-pass prefix-sum
    decomposition (per-bucket partials + carried offsets)."""
    ev = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w3 = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    return ev.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec_money("o_totalprice")).over(w).cast("double").alias("running_spend"),
        F.sum(dec_money("o_totalprice")).over(w3).cast("double").alias("sum3"),
    )


_CUBE_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) * 2
         + CAST(GROUPING(l_linestatus) AS INT) AS gid,
       CAST(SUM({_DEC_PRICE_SQL}) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("olap-cube-summary", oracle=_CUBE_ORACLE)
def olap_cube_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — every subset of the dims (4 grouping sets here) in one
    pass, with a composed GROUPING_ID-style marker (Spark's
    grouping_id() and DuckDB's GROUPING() bit-compose identically:
    flag-bit·2 + status-bit). Same single Expand + one-shuffle
    aggregate shape as olap-grouping-sets; the Expand factor is 2^dims,
    which is why real pipelines cube only low-cardinality dims — noted
    here because at 100 TB a 4-dim cube means 16× aggregate input
    (still map-side-collapsed before the exchange)."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.sum(dec_money("l_extendedprice")).cast("double").alias("sum_price"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Range join: events within a time window of each other, same user.
# The reference has no range/theta joins (SURVEY §2.3); here the equi
# component (user_id) keeps the join hash-partitioned — the range
# predicate evaluates inside each matched user group, so there's no
# cross product. At 100 TB you additionally bucket both sides by
# (user_id, time_bucket) so a window never spans partitions.
# ---------------------------------------------------------------------------

_RANGE_JOIN_ORACLE = """
SELECT e.event_id, COUNT(c.ts) AS n_clicks_10m
FROM events e LEFT JOIN events c
  ON c.user_id = e.user_id AND c.event_type = 'click'
 AND c.ts > e.ts AND c.ts <= e.ts + INTERVAL 10 MINUTE
WHERE e.event_type = 'error'
GROUP BY e.event_id
"""


@query("join-range-events", oracle=_RANGE_JOIN_ORACLE)
def join_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks by the same user within 10 minutes after each error."""
    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", F.col("user_id").alias("euid"), "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cuid"), F.col("ts").alias("cts")
    )
    cond = (
        (F.col("euid") == F.col("cuid"))
        & (F.col("cts") > F.col("ts"))
        & (F.col("cts") <= F.col("ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    return (
        errors.join(clicks, cond, "left")
        .groupBy("event_id")
        .agg(F.count("cts").alias("n_clicks_10m"))
    )


# ---------------------------------------------------------------------------
# As-of join (backward): latest preceding click per error event.
# Composition: equi+inequality join, then max / max_by pick the as-of
# row — no window over the fact, no sort of the big side. Same
# bucketing strategy as the range join at scale.
# ---------------------------------------------------------------------------

# The as-of pick tie-breaks on the VALUE among clicks sharing the max
# timestamp (same-ts events exist in this data): both engines take the
# lexicographic max of (ts, k, value) with k = COALESCE(value, -1e308)
# — the NULL-free key field, because Spark sorts a NULL struct field
# smallest while DuckDB sorts it largest, so a bare (ts, value) key
# could diverge when a tied-ts click has NULL value. A (ts, k) tie
# implies equal value, so the third field never decides alone.
_ASOF_ORACLE = """
SELECT e.event_id,
       epoch_us(MAX(c.ts)) AS last_click_us,
       ROUND((MAX({'t': c.ts, 'k': COALESCE(c.value, -1e308), 'v': c.value})).v,
             2) AS last_click_value
FROM events e LEFT JOIN events c
  ON c.user_id = e.user_id AND c.event_type = 'click' AND c.ts < e.ts
WHERE e.event_type = 'error'
GROUP BY e.event_id
"""


@query("join-asof-events", oracle=_ASOF_ORACLE)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of: each error event picks the most recent earlier
    click (timestamp + its value) by the same user."""
    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", F.col("user_id").alias("euid"), "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cuid"),
        F.col("ts").alias("cts"),
        F.col("value").alias("cvalue"),
    )
    cond = (F.col("euid") == F.col("cuid")) & (F.col("cts") < F.col("ts"))
    return (
        errors.join(clicks, cond, "left")
        .groupBy("event_id")
        .agg(
            F.unix_micros(F.max("cts")).alias("last_click_us"),
            F.round(
                # deterministic under ts ties — see _ASOF_ORACLE
                F.max_by(
                    "cvalue",
                    F.struct(
                        F.col("cts").alias("t"),
                        F.coalesce("cvalue", F.lit(-1e308)).alias("k"),
                    ),
                ),
                2,
            ).alias("last_click_value"),
        )
    )


# ---------------------------------------------------------------------------
# Returned-item revenue (TPC-H Q10 shape): which customers returned
# the most revenue in a quarter. Fact ⋈ orders ⋈ customer ⋈ nation
# with every dim broadcast; top-20 via TakeOrderedAndProject (no
# global sort). Secondary sort key c_custkey makes the top-k SET
# deterministic across engines even under revenue ties.
# ---------------------------------------------------------------------------

# Exact-revenue idiom (used by the round-2 money queries): the true
# item revenue l_extendedprice·(1−l_discount) has ≤4 decimal digits
# (2dp price × 2dp discount), so ROUND(·,4) recovers the exact value
# from the double, and summing as DECIMAL is associative — the group
# total is identical under ANY partitioning / summation order, in
# both engines. Plain SUM(double) is order-dependent in the last
# bits, which flips ROUND(·,2) when a group lands on a .xx5 boundary
# (observed: 307843.595 at sf0.01).
_DEC_REV_SQL = DEC_REV_SQL  # canonical copy lives in queries/__init__.py

_RETURNED_ITEMS_ORACLE = f"""
SELECT c_custkey, c_name, n_name,
       CAST(ROUND(SUM({_DEC_REV_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


_dec_rev = dec_rev  # canonical copy lives in queries/__init__.py


@query("olap-returned-items", oracle=_RETURNED_ITEMS_ORACLE)
def olap_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_dec_rev()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Customer order-count distribution (TPC-H Q13 shape). The naive plan
# left-joins two big tables then double-aggregates; the scale-smart
# formulation aggregates orders down to one row per customer FIRST
# (map-side combine over the fact), then the ≤|customer| rollup joins
# customer as the broadcast side — the fact table never shuffles for
# the join at all. Zero-order customers come from the left join's
# nulls, coalesced to 0. Integer-only output: hash-exact across
# engines by construction.
# ---------------------------------------------------------------------------

_CUST_ORDER_DIST_ORACLE = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT CAST(c_count AS INT) AS c_count, COUNT(*) AS n_custs
FROM per_cust GROUP BY c_count
"""


@query("olap-cust-order-dist", oracle=_CUST_ORDER_DIST_ORACLE)
def olap_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    customer = load(spark, sf_dir, "customer")
    per_cust_orders = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders")
    )
    per_cust = (
        customer.join(
            F.broadcast(per_cust_orders),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .select(
            "c_custkey",
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("int").alias("c_count"),
        )
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("n_custs"))


# ---------------------------------------------------------------------------
# Promo revenue share (TPC-H Q14 shape): conditional aggregation over
# a one-month fact slice with the part dim broadcast. The CASE folds
# into the single map-side partial aggregate — one shuffle of one
# partial row per partition, one output row.
# ---------------------------------------------------------------------------

_PROMO_SHARE_ORACLE = f"""
SELECT ROUND(
         100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                          THEN {_DEC_REV_SQL}
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM({_DEC_REV_SQL}) AS DOUBLE), 4) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


@query("olap-promo-share", oracle=_PROMO_SHARE_ORACLE)
def olap_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    zero_dec = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", _dec_rev()).otherwise(zero_dec)
                ).cast("double")
                / F.sum(_dec_rev()).cast("double"),
                4,
            ).alias("promo_share_pct")
        )
    )


# ---------------------------------------------------------------------------
# Small-quantity revenue (TPC-H Q17 shape): lineitems ordering less
# than 20% of their part's average quantity. The correlated subquery
# becomes an aggregate-then-join: per-part averages are ≤|part| rows,
# broadcast back onto the fact — the fact is scanned twice but never
# shuffled. The threshold is rounded to 6dp IN BOTH ENGINES so the
# float comparison can't flip on last-bit summation differences.
# ---------------------------------------------------------------------------

_SMALL_QTY_ORACLE = """
WITH avg_qty AS (
  SELECT l_partkey AS ap_partkey,
         ROUND(0.2 * AVG(l_quantity), 6) AS qty_threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 2) AS avg_yearly
FROM lineitem JOIN avg_qty ON l_partkey = ap_partkey
WHERE l_quantity < qty_threshold
"""


@query("olap-small-qty-revenue", oracle=_SMALL_QTY_ORACLE)
def olap_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(dec_money("l_extendedprice"))
                .cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Distribution stats: per-source length quantiles over documents —
# the profile every corpus-quality pass starts from. Registered with
# EXACT percentile (Spark `percentile` == DuckDB `quantile_cont`,
# both linear-interpolated) so the oracle verifies values; at 100 TB
# swap in `approx_percentile` — a mergeable sketch that partial-
# aggregates map-side instead of sorting each group.
# ---------------------------------------------------------------------------

_QUANTILES_ORACLE = """
SELECT source,
       ROUND(quantile_cont(n_chars, 0.5), 2) AS p50,
       ROUND(quantile_cont(n_chars, 0.9), 2) AS p90,
       ROUND(quantile_cont(n_chars, 0.99), 2) AS p99,
       COUNT(*) AS n_docs
FROM documents GROUP BY source
"""


@query("text-length-quantiles", oracle=_QUANTILES_ORACLE)
def text_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.round(F.expr("percentile(n_chars, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 2).alias("p90"),
        F.round(F.expr("percentile(n_chars, 0.99)"), 2).alias("p99"),
        F.count("*").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Mergeable-sketch distinct counting: the 100 TB path for COUNT
# DISTINCT. Exact count_distinct plans an Expand (row duplication per
# distinct aggregate) + a shuffle keyed on the value; HLL++ partial-
# aggregates map-side into a fixed-size sketch and merges — the only
# viable shape when the value cardinality itself is huge. The oracle
# verifies the exact column value-for-value and the sketch via a
# deterministic tolerance flag: HLL++ is a pure function of the data
# (no RNG), so "within 3×rsd of exact" is a stable, replayable bit —
# an honest oracle for an approximate operator.
# ---------------------------------------------------------------------------


@query(
    "agg-approx-distinct",
    oracle="""
    SELECT source,
           CAST(count(DISTINCT text) AS BIGINT) AS n_exact,
           TRUE AS sketch_within_3rsd
    FROM documents GROUP BY source
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    rsd = 0.05
    return docs.groupBy("source").agg(
        F.count_distinct("text").alias("n_exact"),
        (
            F.abs(F.approx_count_distinct("text", rsd) - F.count_distinct("text"))
            <= F.greatest(
                F.round(F.count_distinct("text") * 3 * rsd), F.lit(1)
            )
        ).alias("sketch_within_3rsd"),
    )


# ---------------------------------------------------------------------------
# Order-priority check (TPC-H Q4 shape): orders with at least one
# late-shipping lineitem, counted by priority. The EXISTS becomes a
# LEFT SEMI join — at 100 TB both sides are huge, so this is a
# legitimate shuffle-on-orderkey join (no broadcast possible); the
# orderdate range prunes the probe side at the scan and the semi join
# short-circuits per key instead of materializing matches.
# ---------------------------------------------------------------------------

_ORDER_PRIORITY_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


@query("olap-order-priority", oracle=_ORDER_PRIORITY_ORACLE)
def olap_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# ---------------------------------------------------------------------------
# Bilateral shipping volume (TPC-H Q7 shape): revenue between two
# nations by direction and ship year. Nation pre-joins fold into the
# customer/supplier dims (both broadcast), which prunes orders and
# lineitem down to the two nations BEFORE the one unavoidable
# fact-fact shuffle join (lineitem ⋈ orders). The shipdate filter is
# pushed to the parquet scan.
# ---------------------------------------------------------------------------

_VOLUME_SHIPPING_ORACLE = f"""
SELECT cust_nation, supp_nation, l_year,
       CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         {DEC_REV_SQL} AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY cust_nation, supp_nation, l_year
"""


@query("olap-volume-shipping", oracle=_VOLUME_SHIPPING_ORACLE)
def olap_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ("NATION_1", "NATION_2")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(dec_rev()), 2).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Brand market share (TPC-H Q8 shape): one brand's fraction of ASIA
# revenue per order year. Both aggregates ride the same shuffle
# (conditional-sum / sum), so the share costs one pass; part joins on
# l_partkey as broadcast, the region/nation prune folds into the
# broadcast customer dim.
# ---------------------------------------------------------------------------

_MARKET_SHARE_ORACLE = f"""
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN p_brand = 'Brand#12' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 4) AS brand_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         {DEC_REV_SQL} AS volume, p_brand
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  JOIN part ON l_partkey = p_partkey
  WHERE r_name = 'ASIA'
) t
GROUP BY o_year
"""


@query("olap-market-share", oracle=_MARKET_SHARE_ORACLE)
def olap_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    volume = dec_rev()
    zero = F.lit("0").cast("decimal(18,4)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("p_brand") == "Brand#12", volume).otherwise(zero)
                ).cast("double")
                / F.sum(volume).cast("double"),
                4,
            ).alias("brand_share")
        )
    )


# ---------------------------------------------------------------------------
# Funnel conversion (product-analytics shape): users reaching
# view → click → purchase in strict timestamp order. One shuffle on
# user_id builds all three stage timestamps as conditional mins in a
# single partial-aggregated pass; the final single-row reduction
# moves one row per partition.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH stages AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(t_view) AS n_view,
       COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
       COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view
             THEN 1 END) AS n_view_click_purchase
FROM stages
"""


@query("events-funnel", oracle=_FUNNEL_ORACLE)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    stage = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    stages = ev.groupBy("user_id").agg(
        stage("view").alias("t_view"),
        stage("click").alias("t_click"),
        stage("purchase").alias("t_purchase"),
    )
    return stages.agg(
        F.count("t_view").alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("n_view_click"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("n_view_click_purchase"),
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention: users bucketed by first-active week,
# counted per (cohort week, active week). ONE shuffle on user_id: the
# per-user week set builds with a map-side-combined collect_set
# (bounded — it holds calendar weeks, not events), the cohort is the
# set minimum, and the final (cohort, week) agg is group-count-sized.
# Week keys rendered as dates so the matrix is engine-stable.
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH activity AS (
  SELECT DISTINCT user_id,
         strftime(date_trunc('week', ts), '%Y-%m-%d') AS week
  FROM events
),
cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM activity GROUP BY user_id
)
SELECT cohort_week, week, COUNT(*) AS n_users
FROM activity JOIN cohort USING (user_id)
GROUP BY cohort_week, week
"""


@query("events-retention", oracle=_RETENTION_ORACLE)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = (
        ev.select(
            "user_id",
            F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias(
                "week"
            ),
        )
        .groupBy("user_id")
        .agg(F.collect_set("week").alias("weeks"))
    )
    return (
        per_user.select(
            F.array_min("weeks").alias("cohort_week"),
            F.explode("weeks").alias("week"),
        )
        .groupBy("cohort_week", "week")
        .agg(F.count("*").alias("n_users"))
    )


_RETENTION_PIVOT_ORACLE = """
WITH activity AS (
  SELECT DISTINCT user_id,
         strftime(date_trunc('week', ts), '%Y-%m-%d') AS week
  FROM events
),
cohort AS (
  SELECT user_id,
         strftime(min(date_trunc('week', ts)), '%Y-%m-%d') AS cohort_week
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
tall AS (
  SELECT cohort_week,
         CAST(date_diff('day', CAST(cohort_week AS DATE), CAST(week AS DATE))
              // 7 AS INT) AS week_no
  FROM activity JOIN cohort USING (user_id)
  WHERE week >= cohort_week
)
SELECT cohort_week,
       CAST(SUM(CASE WHEN week_no = 0 THEN 1 ELSE 0 END) AS BIGINT) AS w0,
       CAST(SUM(CASE WHEN week_no = 1 THEN 1 ELSE 0 END) AS BIGINT) AS w1,
       CAST(SUM(CASE WHEN week_no = 2 THEN 1 ELSE 0 END) AS BIGINT) AS w2,
       CAST(SUM(CASE WHEN week_no = 3 THEN 1 ELSE 0 END) AS BIGINT) AS w3,
       CAST(SUM(CASE WHEN week_no = 4 THEN 1 ELSE 0 END) AS BIGINT) AS w4,
       CAST(SUM(CASE WHEN week_no = 5 THEN 1 ELSE 0 END) AS BIGINT) AS w5,
       CAST(SUM(CASE WHEN week_no = 6 THEN 1 ELSE 0 END) AS BIGINT) AS w6,
       CAST(SUM(CASE WHEN week_no = 7 THEN 1 ELSE 0 END) AS BIGINT) AS w7
FROM tall WHERE week_no <= 7
GROUP BY cohort_week
"""


@query("events-retention-pivot", oracle=_RETENTION_PIVOT_ORACLE)
def events_retention_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention as a WIDE matrix: users cohorted by their
    FIRST-PURCHASE week, one row per cohort, one column per
    weeks-since-cohort (w0..w7) counting weekly-active cohort members —
    the report shape analysts consume, produced through the
    EXPLICIT-VALUES pivot idiom of agg-pivot-report (relational.py):
    enumerating pivot values keeps the schema static (no
    value-discovery scan, no data-dependent columns). Missing cells
    coalesce to 0.

    Plan: ONE user_id shuffle computes per-user (weeks set, purchase
    cohort) together in a single aggregate; the pivot then runs a
    (cohort, week_no) cell-count pre-aggregate and a pivotfirst over
    the ≤ |cohorts|×8 cells — both trivially small exchanges after the
    first aggregate has collapsed the fact table."""
    ev = load(spark, sf_dir, "events")
    week_of_ts = F.date_format(
        F.date_trunc("week", F.col("ts")), "yyyy-MM-dd"
    )
    per_user = (
        ev.select(
            "user_id",
            week_of_ts.alias("week"),
            F.when(F.col("event_type") == "purchase", week_of_ts).alias(
                "purchase_week"
            ),
        )
        .groupBy("user_id")
        .agg(
            F.collect_set("week").alias("weeks"),
            F.min("purchase_week").alias("cohort_week"),
        )
        .filter(F.col("cohort_week").isNotNull())
    )
    tall = (
        per_user.select(
            "cohort_week", F.explode("weeks").alias("week")
        )
        .filter(F.col("week") >= F.col("cohort_week"))
        .withColumn(
            "week_no", F.expr("datediff(week, cohort_week) div 7").cast("int")
        )
        .filter(F.col("week_no") <= 7)
    )
    wide = (
        tall.groupBy("cohort_week")
        .pivot("week_no", list(range(8)))
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "cohort_week",
        *[
            F.coalesce(F.col(str(i)), F.lit(0)).cast("long").alias(f"w{i}")
            for i in range(8)
        ],
    )


# ---------------------------------------------------------------------------
# Heavy hitters: top-20 users by event count. Partial-aggregated
# groupBy then TakeOrderedAndProject (per-partition heaps, driver
# merges 20 rows) — never a global sort of the user dimension.
# ---------------------------------------------------------------------------

_HEAVY_HITTERS_ORACLE = """
SELECT user_id, COUNT(*) AS n_events
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id LIMIT 20
"""


@query("events-heavy-hitters", oracle=_HEAVY_HITTERS_ORACLE)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.col("n_events").desc(), "user_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Cheapest-supplier-per-part (TPC-H Q2 shape without partsupp: the
# arg-min join-back family). One groupBy computes min price AND the
# arg-min supplier via min_by over a (price, suppkey) struct — the
# deterministic-tiebreak argmin in a single partial-aggregated pass,
# no join-back of the fact table; part + supplier dims broadcast.
# Float caveat: MIN over stored doubles and equality on them are
# exact (no accumulation), so cross-engine agreement is guaranteed.
# ---------------------------------------------------------------------------

_CHEAPEST_SUPPLIER_ORACLE = """
WITH m AS (
  SELECT l_partkey, MIN(l_extendedprice) AS min_price
  FROM lineitem GROUP BY l_partkey
),
s AS (
  SELECT l.l_partkey, MIN(l.l_suppkey) AS suppkey, MIN(m.min_price) AS min_price
  FROM lineitem l
  JOIN m ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.min_price
  GROUP BY l.l_partkey
)
SELECT p.p_partkey, p.p_brand, su.s_name AS supplier,
       ROUND(s.min_price, 2) AS min_price
FROM s
JOIN part p ON s.l_partkey = p.p_partkey
JOIN supplier su ON s.suppkey = su.s_suppkey
WHERE p.p_size = 15
"""


@query("olap-cheapest-supplier", oracle=_CHEAPEST_SUPPLIER_ORACLE)
def olap_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey", "p_brand")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    best = li.groupBy("l_partkey").agg(
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.min_by(
            "l_suppkey", F.struct("l_extendedprice", "l_suppkey")
        ).alias("suppkey"),
    )
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), best.suppkey == supp.s_suppkey)
        .select(
            "p_partkey", "p_brand", F.col("s_name").alias("supplier"), "min_price"
        )
    )


# ---------------------------------------------------------------------------
# Important-stock parts (TPC-H Q11 shape: groups whose value exceeds a
# GLOBAL aggregate-derived threshold). The global scalar is a 1-row
# broadcast crossJoin onto the per-part aggregate — never a driver
# collect. The threshold is a multiple of the AVERAGE part value
# (scale-free: Q11's fraction-of-total shrinks as 1/n_parts and
# selects nothing at larger SFs on uniformish data); both sides are
# cent-rounded so the float boundary is engine-identical.
# ---------------------------------------------------------------------------

_IMPORTANT_STOCK_ORACLE = """
WITH v AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_extendedprice * l_quantity, 2) AS DECIMAL(18,2)))
           AS pv
  FROM lineitem GROUP BY l_partkey
),
t AS (SELECT ROUND(CAST(SUM(pv) AS DOUBLE) / COUNT(*) * 1.25, 2) AS threshold
      FROM v)
SELECT l_partkey, CAST(pv AS DOUBLE) AS part_value
FROM v, t WHERE CAST(pv AS DOUBLE) > threshold
"""


@query("olap-important-stock", oracle=_IMPORTANT_STOCK_ORACLE)
def olap_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    v = li.groupBy("l_partkey").agg(
        F.sum(dec_money(F.col("l_extendedprice") * F.col("l_quantity"))).alias(
            "pv"
        )
    )
    t = v.agg(
        F.round(
            F.sum("pv").cast("double") / F.count(F.lit(1)) * 1.25, 2
        ).alias("threshold")
    )
    return (
        v.crossJoin(F.broadcast(t))
        .withColumn("part_value", F.col("pv").cast("double"))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


# ---------------------------------------------------------------------------
# DAU/WAU stickiness: the multi-granularity distinct-count rollup of
# product analytics. Two exact count-distinct shuffles (day grain,
# week grain) + a join on the tiny week dimension. At 100 TB you swap
# the exact count_distinct for approx_count_distinct (HLL++, see
# agg-approx-distinct) — the plan shape is identical.
# ---------------------------------------------------------------------------

# ONE copy of the stickiness CTE body, interpolated into both the
# exact and the approx oracle (which appends only the approx_ok
# column) — a definition fix applied here grades both slugs.
_STICKINESS_CTES = """
WITH d AS (
  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         user_id
  FROM events
),
dau AS (SELECT week, day, COUNT(DISTINCT user_id) AS dau FROM d GROUP BY week, day),
wau AS (SELECT week, COUNT(DISTINCT user_id) AS wau FROM d GROUP BY week)
"""

_STICKINESS_ORACLE = f"""
{_STICKINESS_CTES}
SELECT w.week, CAST(w.wau AS BIGINT) AS wau,
       ROUND(AVG(a.dau) / w.wau, 4) AS stickiness
FROM wau w JOIN dau a USING (week)
GROUP BY w.week, w.wau
"""


@query("events-stickiness", oracle=_STICKINESS_ORACLE)
def events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    dau = ev.groupBy("week", "day").agg(
        F.count_distinct("user_id").alias("dau")
    )
    wau = ev.groupBy("week").agg(F.count_distinct("user_id").alias("wau"))
    return (
        wau.join(dau, "week")
        .groupBy("week", "wau")
        # wau is a grouping key — reference it directly, no first() agg
        .agg(F.round(F.avg("dau") / F.col("wau"), 4).alias("stickiness"))
        .select("week", F.col("wau").cast("bigint").alias("wau"), "stickiness")
    )


_STICKINESS_APPROX_ORACLE = f"""
{_STICKINESS_CTES}
SELECT w.week, CAST(w.wau AS BIGINT) AS wau,
       ROUND(AVG(a.dau) / w.wau, 4) AS stickiness,
       CAST(1 AS INT) AS approx_ok
FROM wau w JOIN dau a USING (week)
GROUP BY w.week, w.wau
"""


@query("events-stickiness-approx", oracle=_STICKINESS_APPROX_ORACLE)
def events_stickiness_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events-stickiness at the 100-TB tier: DAU/WAU via HLL++
    (``approx_count_distinct``) instead of exact COUNT DISTINCT. Exact
    distinct plans an Expand + a shuffle keyed on (week, user_id);
    HLL++ partial-aggregates into a fixed-size mergeable sketch
    map-side — the only viable shape when the per-key cardinality is
    itself huge. Oracle pattern per agg-approx-distinct: the exact wau
    and stickiness are value-verified, the sketch through a
    deterministic tolerance flag (HLL++ has no RNG, so "approx within
    3×rsd of exact, ratio within 15%" is a stable, replayable bit —
    an honest oracle for an approximate operator)."""
    rsd = 0.02
    ev = load(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    dau = ev.groupBy("week", "day").agg(
        F.count_distinct("user_id").alias("dau"),
        F.approx_count_distinct("user_id", rsd).alias("dau_ap"),
    )
    wau = ev.groupBy("week").agg(
        F.count_distinct("user_id").alias("wau"),
        F.approx_count_distinct("user_id", rsd).alias("wau_ap"),
    )
    per_week = (
        wau.join(dau, "week")
        .groupBy("week", "wau", "wau_ap")
        .agg(
            F.avg("dau").alias("avg_dau"),
            F.avg("dau_ap").alias("avg_dau_ap"),
        )
    )
    st = F.col("avg_dau") / F.col("wau")
    st_ap = F.col("avg_dau_ap") / F.col("wau_ap")
    ok = (
        (F.abs(F.col("wau_ap") - F.col("wau")) <= 3 * rsd * F.col("wau"))
        & (F.abs(st_ap - st) <= 0.15 * st)
    )
    return per_week.select(
        "week",
        F.col("wau").cast("bigint").alias("wau"),
        F.round(st, 4).alias("stickiness"),
        ok.cast("int").alias("approx_ok"),
    )


# ---------------------------------------------------------------------------
# Mergeable-sketch quantiles: the 100 TB companion to
# text-length-quantiles. Exact `percentile` sorts every group;
# `approx_percentile` (Greenwald-Khanna) partial-aggregates into a
# fixed-size mergeable sketch — the only viable shape on huge groups.
# Oracle pattern follows agg-approx-distinct: the exact quantiles are
# value-verified, the sketch via a deterministic bracket flag — GK at
# accuracy 10000 has rank error 1e-4, so its p50 value MUST lie
# between the exact p40 and p60 (a stable, replayable bit; no RNG in
# the sketch).
# ---------------------------------------------------------------------------

_APPROX_QUANTILES_ORACLE = """
SELECT source,
       ROUND(quantile_cont(n_chars, 0.5), 2) AS p50_exact,
       TRUE AS sketch_in_bracket,
       COUNT(*) AS n_docs
FROM documents GROUP BY source
"""


@query("agg-approx-quantiles", oracle=_APPROX_QUANTILES_ORACLE)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE exact-percentile buffer yields all three bracket quantiles
    # (separate percentile() calls would each buffer every group
    # value — tripling the very cost this slug's sketch story is
    # about). Tiny groups are exempted from the bracket: GK returns an
    # actual element while exact percentile interpolates, so for
    # n < 50 the element can legitimately sit outside [p40, p60]; the
    # rank-error argument only binds at scale.
    docs = load(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(
        F.expr("percentile(n_chars, array(0.4, 0.5, 0.6))").alias("qs"),
        F.expr("approx_percentile(n_chars, 0.5, 10000)").alias("ap"),
        F.count("*").alias("n_docs"),
    )
    in_bracket = (F.col("ap") >= F.col("qs")[0]) & (
        F.col("ap") <= F.col("qs")[2]
    )
    return g.select(
        "source",
        F.round(F.col("qs")[1], 2).alias("p50_exact"),
        (in_bracket | (F.col("n_docs") < 50)).alias("sketch_in_bracket"),
        "n_docs",
    )


# ---------------------------------------------------------------------------
# Revenue forecast (TPC-H Q6 shape): the purest predicate-pushdown
# query — three range filters and a two-column projection over the
# fact, no join, one output row. All three predicates reach the
# parquet scan (PushedFilters) and ReadSchema carries exactly
# shipdate/discount/quantity/extendedprice; at 100 TB this plan's cost
# is I/O on pruned row groups, nothing else. Per-item discount revenue
# is DECIMAL(18,4) so both engines sum exactly.
# ---------------------------------------------------------------------------

_FORECAST_ORACLE = """
SELECT CAST(ROUND(SUM(CAST(ROUND(l_extendedprice * l_discount, 4)
                           AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("olap-revenue-forecast", oracle=_FORECAST_ORACLE)
def olap_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_rev = F.round(
        F.col("l_extendedprice") * F.col("l_discount"), 4
    ).cast("decimal(18,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(disc_rev), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Product profit by nation and year (TPC-H Q9 shape, adapted: the
# testdata has no partsupp, so profit is discounted revenue rather
# than revenue minus supplycost). Fact ⋈ orders is the only allowed
# shuffle; the part slice (LIKE-filtered), supplier, and nation are
# broadcast. YEAR() folds into the aggregate key — at 100 TB the
# output is |nation| × |years| rows regardless of input size.
# ---------------------------------------------------------------------------

_PRODUCT_PROFIT_ORACLE = f"""
SELECT n_name, CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST(ROUND(SUM({_DEC_REV_SQL}), 2) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, o_year
"""


@query("olap-product-profit", oracle=_PRODUCT_PROFIT_ORACLE)
def olap_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "n_name", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(F.round(F.sum(_dec_rev()), 2).cast("double").alias("profit"))
    )


# ---------------------------------------------------------------------------
# Late-shipment priority mix (TPC-H Q12 shape, adapted: no l_shipmode
# or commit/receipt dates in the testdata, so "late" is shipped more
# than 90 days after the order date and the grouping column is
# l_returnflag). The join predicate is the equi-key; the interval
# comparison stays a post-join filter on two already-present
# timestamp columns — no casts, no UDFs, codegen-fused.
# ---------------------------------------------------------------------------

_LATE_SHIPMENTS_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_returnflag
"""


@query("olap-late-shipments", oracle=_LATE_SHIPMENTS_ORACLE)
def olap_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Top supplier (TPC-H Q15 shape): quarterly revenue per supplier, then
# the supplier(s) achieving the maximum. The revenue relation is
# ≤|supplier| rows, so BOTH the 1-row max aggregate and the equality
# join back onto it are broadcast — the fact is scanned once and
# shuffles once (the groupBy). Revenue is compared as DECIMAL(18,2),
# so "equals max" can't flip on double last-bits; tie semantics are
# exact in both engines.
# ---------------------------------------------------------------------------

_TOP_SUPPLIER_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(ROUND(SUM({_DEC_REV_SQL}), 2) AS DECIMAL(18,2)) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
"""


@query("olap-top-supplier", oracle=_TOP_SUPPLIER_ORACLE)
def olap_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supplier = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(_dec_rev()), 2).cast("decimal(18,2)").alias("total_rev")
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(max_rev), F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Supplier diversity per part class (TPC-H Q16 shape, adapted: the
# lineitem fact stands in for the missing partsupp as the
# part↔supplier association, and the excluded-supplier subquery keys
# on negative account balance instead of complaint comments). The
# association is DISTINCT-ed BEFORE joining part (shrinks the shuffle
# to unique pairs); the exclusion list is a broadcast anti-join, never
# a NOT IN over a shuffle.
# ---------------------------------------------------------------------------

_PARTS_SUPPLIER_ORACLE = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) assoc
JOIN part ON l_partkey = p_partkey
WHERE NOT (p_brand = 'Brand#5' AND p_type = 'PROMO')
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@query("olap-parts-supplier", oracle=_PARTS_SUPPLIER_ORACLE)
def olap_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        ~((F.col("p_brand") == "Brand#5") & (F.col("p_type") == "PROMO"))
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_suppliers = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    assoc = li.select("l_partkey", "l_suppkey").distinct()
    return (
        assoc.join(
            F.broadcast(bad_suppliers),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Large-volume orders (TPC-H Q18 shape): orders whose total quantity
# exceeds 300. The HAVING becomes an aggregate-then-filter over the
# fact (one shuffle, map-side combined); the ~dozens of surviving
# orderkeys then BROADCAST back onto orders and customer — the
# classic "tiny qualifying set drives the lookup" plan that at 100 TB
# touches the dimension tables via broadcast hash joins only.
# ---------------------------------------------------------------------------

_LARGE_ORDERS_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       ROUND(total_qty, 2) AS total_qty
FROM (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


@query("olap-large-orders", oracle=_LARGE_ORDERS_ORACLE)
def olap_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Disjunctive-predicate revenue (TPC-H Q19 shape, adapted to the
# columns the testdata has: brand × size-range × quantity-range
# triples OR-ed together). The p-side conjuncts stay on the broadcast
# dim; the OR of AND-groups is a single codegen-fused filter after
# the join — no union-of-three-scans rewrite, the fact is read once.
# ---------------------------------------------------------------------------

_DISJUNCTIVE_REV_ORACLE = f"""
SELECT CAST(ROUND(SUM({_DEC_REV_SQL}), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
"""


@query("olap-disjunctive-rev", oracle=_DISJUNCTIVE_REV_ORACLE)
def olap_disjunctive_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & size.between(1, 15) & qty.between(1, 20))
        | (
            (F.col("p_brand") == "Brand#12")
            & size.between(10, 30)
            & qty.between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & size.between(20, 50)
            & qty.between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(_dec_rev()), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Dormant high-balance customers (TPC-H Q22 shape, adapted: the
# testdata has no c_phone, so the country-code grouping becomes
# c_mktsegment and "no recent orders" replaces "never ordered" —
# every synthetic customer has at least one order). Two scale
# mechanisms on display: the scalar average is a 1-row broadcast
# cross join (not a recomputed subquery), and NOT EXISTS is a
# left_anti join against the date-pruned orders projection.
# ---------------------------------------------------------------------------

_DORMANT_CUSTOMERS_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(ROUND(c_acctbal, 2) AS DECIMAL(18,2))), 2)
            AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT ROUND(CAST(SUM(CAST(ROUND(c_acctbal, 2)
                                              AS DECIMAL(18,2))) AS DOUBLE)
                         / COUNT(*), 6)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1999-01-01'
  )
GROUP BY c_mktsegment
"""


@query("olap-dormant-customers", oracle=_DORMANT_CUSTOMERS_ORACLE)
def olap_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    recent_orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    # the mean divides the EXACT decimal sum (as a double) by the
    # count, then ROUND(.., 6) pins the threshold: the old
    # AVG(double) summed in engine-specific order, so a balance near
    # the unrounded mean could flip the > between them.
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.round(
            F.sum(dec_money("c_acctbal")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_bal")
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            recent_orders,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(
                F.sum(dec_money("c_acctbal")), 2
            )
            .cast("double")
            .alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Batch gap sessionization: the window-function formulation of the
# session split (gap > 30 min starts a new session), complementing the
# streaming stateful version (stream-marker-sessionize). Both the lag
# marker and the running session ordinal ride ONE user-keyed
# Window exchange (same partition/order spec → Spark reuses the sort);
# the session rollup then re-aggregates on (user, seq) — at 100 TB
# this is one fact shuffle plus a near-local second agg. Gap compare
# is integer epoch-seconds; tie-break on event_id makes the order
# total, so session boundaries are engine-exact.
# ---------------------------------------------------------------------------

_SESSIONIZE_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR date_diff('second', LAG(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked
)
SELECT user_id, CAST(session_seq AS INT) AS session_seq,
       COUNT(*) AS n_events, MIN(ts) AS start_ts, MAX(ts) AS end_ts,
       CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec
FROM sess GROUP BY user_id, session_seq
"""


def sessionize_events(ev: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """DataFrame-level gap sessionization (see events-sessionize).
    Exposed separately so tests can assert repartition invariance on
    the same implementation the registered query runs."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_s = F.when(
        prev_ts.isNull()
        | ((F.col("ts").cast("long") - prev_ts.cast("long")) > gap_sec),
        1,
    ).otherwise(0)
    marked = ev.select("user_id", "ts", "event_id", new_s.alias("new_s"))
    session_seq = (
        F.sum("new_s")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("int")
    )
    return (
        marked.select("user_id", "ts", session_seq.alias("session_seq"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            (F.max("ts").cast("long") - F.min("ts").cast("long")).alias(
                "duration_sec"
            ),
        )
    )


@query("events-sessionize", oracle=_SESSIONIZE_ORACLE)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize_events(load(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Mergeable-sketch rollup (Datasketches HLL): per-(event_type, day)
# user sketches built ONCE, then re-rolled to per-type totals with
# hll_union_agg — the pre-aggregation pattern that makes 100-TB
# distinct counting cheap: daily partials are tiny fixed-size blobs,
# and any rollup (weekly, monthly, all-time, cross-type) is a union
# over partials instead of a rescan of raw events. The oracle pins
# the exact distinct counts; the sketch estimate must land within
# 5% (lgK=12 → ~1.6% rsd, so the flag is deterministic in practice).
# ---------------------------------------------------------------------------

_SKETCH_ROLLUP_ORACLE = f"""
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_tol
FROM events GROUP BY event_type
"""


@query("agg-sketch-rollup", oracle=_SKETCH_ROLLUP_ORACLE)
def agg_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.expr("hll_sketch_agg(user_id, 12)").alias("s"))
    merged = daily.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(s, false))").alias("est")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    # null-SAFE join key: groupBy emits a NULL event_type group (and
    # the oracle's GROUP BY keeps it), so a plain equi-join would
    # silently drop that group from the result — rows_match=False on
    # any dataset with a NULL event_type
    merged = merged.withColumnRenamed("event_type", "et")
    return (
        exact.join(
            F.broadcast(merged), exact["event_type"].eqNullSafe(merged["et"])
        )
        .drop("et")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users")) / F.col("exact_users")
                <= 0.05
            ).alias("within_tol"),
        )
    )


# ---------------------------------------------------------------------------
# Audience overlap (Datasketches Theta): |viewers ∩ purchasers|
# estimated from two per-segment sketches — the set-operation
# capability HLL lacks. At 100 TB the two segment sketches are built
# in one grouped pass and intersected as two fixed-size blobs; the
# exact overlap (a distinct-distinct join) exists here only to gate
# the estimate (5% tolerance; at lgK=12 the sketch is exact below
# 4096 entries). All four outputs derive from 1-row broadcast
# aggregates — no driver collect.
# ---------------------------------------------------------------------------

_AUDIENCE_OVERLAP_ORACLE = """
WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
b AS (SELECT COUNT(*) AS c FROM v JOIN p USING (user_id))
SELECT (SELECT COUNT(*) FROM v) AS n_view_users,
       (SELECT COUNT(*) FROM p) AS n_purchase_users,
       b.c AS n_both_exact,
       TRUE AS overlap_within_tol
FROM b
"""


@query("events-audience-overlap", oracle=_AUDIENCE_OVERLAP_ORACLE)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both segment sketches build in ONE conditional global aggregate
    # (a global agg always yields exactly one row, so a regenerated
    # dataset with an empty segment still matches the oracle's
    # unconditional 1-row output — a per-segment filter+groupBy would
    # return 0 rows there). Tolerance is absolute-or-relative
    # (max(5%, 1)) so a zero exact overlap can't divide by zero; the
    # sketch is exact below 2^12 entries, so est = 0 exactly there.
    ev = load(spark, sf_dir, "events")
    is_v = F.col("event_type") == "view"
    is_p = F.col("event_type") == "purchase"
    one = ev.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'view' THEN user_id END, 12)"
        ).alias("sv"),
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END, 12)"
        ).alias("sp"),
        F.count_distinct(F.when(is_v, F.col("user_id"))).alias("n_view_users"),
        F.count_distinct(F.when(is_p, F.col("user_id"))).alias(
            "n_purchase_users"
        ),
    )
    both = (
        ev.filter(is_v)
        .select("user_id")
        .distinct()
        .join(ev.filter(is_p).select("user_id").distinct(), "user_id")
        .agg(F.count("*").alias("n_both_exact"))
    )
    est = F.coalesce(
        F.expr("theta_sketch_estimate(theta_intersection(sv, sp))").cast(
            "double"
        ),
        F.lit(0.0),
    )
    tol = F.greatest(0.05 * F.col("n_both_exact"), F.lit(1.0))
    return one.crossJoin(F.broadcast(both)).select(
        "n_view_users",
        "n_purchase_users",
        "n_both_exact",
        (F.abs(est - F.col("n_both_exact")) <= tol).alias("overlap_within_tol"),
    )


# ---------------------------------------------------------------------------
# Heavy hitters with a bounded-state sketch (approx_top_k): the
# exact top-10 (deterministic tie-break) gated against the sketch's
# estimates. maxItemsTracked bounds executor state regardless of key
# cardinality — the property that matters when user_id has 10⁹
# distinct values; the sketch list is asked for a deep superset
# (k=1000) so tie-order at the exact cutoff can't drop a tracked
# item. Estimates are exact whenever cardinality ≤ maxItemsTracked,
# making the equality flag deterministic at test scales.
# ---------------------------------------------------------------------------

_HH_APPROX_ORACLE = """
SELECT user_id, COUNT(*) AS n_events, TRUE AS sketch_exact
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id LIMIT 10
"""


@query("events-heavy-hitters-approx", oracle=_HH_APPROX_ORACLE)
def events_heavy_hitters_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    exact_top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
    )
    approx = (
        ev.agg(F.expr("approx_top_k(user_id, 1000, 10000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("user_id"), F.col("e.count").alias("est"))
    )
    # coalesce to FALSE: an exact-top user missing from the sketch
    # list entirely (possible once cardinality > maxItemsTracked)
    # must fail the flag honestly — a NULL here would surface as an
    # opaque hash mismatch against the oracle's TRUE instead of a
    # readable sketch_exact=false
    return exact_top.join(F.broadcast(approx), "user_id", "left").select(
        "user_id",
        "n_events",
        F.coalesce(F.col("est") == F.col("n_events"), F.lit(False)).alias(
            "sketch_exact"
        ),
    )


# ---------------------------------------------------------------------------
# Spend quartiles (ntile): customers bucketed into 4 equal-frequency
# tiers by total spend — the segmentation primitive. One orders
# shuffle for the per-customer rollup; the ranking then runs through
# global_row_number (range-partitioned two-pass — the per-customer
# aggregate is itself customer-grain, which scales with the data, so
# an unpartitioned ntile window would still funnel it through one
# partition). ntile is closed-form in (rn, N): with q, r = divmod(N,
# 4), the first r buckets take q+1 rows — exactly the sizes both
# engines' ntile assigns under the unique (spend desc, custkey)
# order. Decimal-rounded spend keeps tier boundaries engine-exact.
# ---------------------------------------------------------------------------

_NTILE_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
           AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT CAST(q AS INT) AS quartile, COUNT(*) AS n_custs,
       CAST(ROUND(SUM(CAST(total_spend AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS tier_spend
FROM (
  SELECT o_custkey, total_spend,
         ntile(4) OVER (ORDER BY total_spend DESC, o_custkey) AS q
  FROM spend)
GROUP BY q
"""


@query("win-ntile-quartiles", oracle=_NTILE_ORACLE)
def win_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dug_data_ingest_spark.operators.windows import global_row_number

    orders = load(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(dec_money("o_totalprice"))
        .cast("double")
        .alias("total_spend")
    )
    ranked, n = global_row_number(
        spend, [F.desc("total_spend"), F.asc("o_custkey")], "__rn"
    )
    q, r = divmod(n, 4)
    rn = F.col("__rn")
    if q == 0:  # fewer rows than buckets: ntile gives row i bucket i
        bucket = rn
    else:
        # first r buckets have q+1 rows; floor on double is exact for
        # any realistic N (rn < 2^53)
        head = F.floor((rn - 1) / F.lit(q + 1)) + 1
        tail = F.lit(r) + F.floor((rn - F.lit(r * (q + 1)) - 1) / F.lit(q)) + 1
        bucket = F.when(rn <= r * (q + 1), head).otherwise(tail)
    return (
        ranked.select(
            "o_custkey", "total_spend", bucket.cast("int").alias("quartile")
        )
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_custs"),
            F.round(F.sum(F.col("total_spend").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("tier_spend"),
        )
    )


# ---------------------------------------------------------------------------
# Top-N per group: the 3 highest-revenue parts per brand — the
# generalized rank-filter (win-first-per-group is its N=1 special
# case). Revenue aggregates FIRST (one fact shuffle, map-side
# combined); the rank window then runs over the ≤|part| rollup.
# Deterministic: decimal revenue, partkey tie-break, row_number not
# rank (no tie inflation).
# ---------------------------------------------------------------------------

_TOPN_PER_GROUP_ORACLE = f"""
WITH rev AS (
  SELECT p_brand, l_partkey,
         CAST(ROUND(SUM({_DEC_REV_SQL}), 2) AS DOUBLE) AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, l_partkey
)
SELECT p_brand, l_partkey, revenue, CAST(rn AS INT) AS brand_rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY p_brand
                               ORDER BY revenue DESC, l_partkey) AS rn
  FROM rev)
WHERE rn <= 3
"""


@query("olap-topn-per-group", oracle=_TOPN_PER_GROUP_ORACLE)
def olap_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregate the fact by l_partkey FIRST, join part onto the
    # ≤|part| rollup after: the brand column never rides the fact
    # shuffle and the broadcast probe side is 20k rows, not 600k.
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    per_part = li.groupBy("l_partkey").agg(
        F.round(F.sum(_dec_rev()), 2).cast("double").alias("revenue")
    )
    rev = per_part.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).select("p_brand", "l_partkey", "revenue")
    w = W.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("l_partkey"))
    return (
        rev.withColumn("brand_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("brand_rank") <= 3)
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram: lineitem price distribution in 1000-unit
# buckets. The bucket id is a row-local floor — the whole histogram
# is ONE map-side-combined groupBy whose output is |buckets| rows,
# the shape that profiles a 100-TB column for skew/outliers at scan
# cost. Integer bucket + count: hash-exact by construction.
# ---------------------------------------------------------------------------

_HISTOGRAM_ORACLE = """
SELECT CAST(FLOOR(l_extendedprice / 1000) AS INT) AS bucket,
       COUNT(*) AS n,
       CAST(ROUND(MIN(l_extendedprice), 2) AS DOUBLE) AS lo,
       CAST(ROUND(MAX(l_extendedprice), 2) AS DOUBLE) AS hi
FROM lineitem GROUP BY bucket
"""


@query("agg-histogram", oracle=_HISTOGRAM_ORACLE)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_extendedprice") / 1000).cast("int").alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_extendedprice"), 2).cast("double").alias("lo"),
            F.round(F.max("l_extendedprice"), 2).cast("double").alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# Excess-share suppliers (TPC-H Q20 shape, adapted: lineitem stands in
# for the missing partsupp, so "excess availability" becomes shipping
# more than 1.5× the part's average per-supplier volume). The nested
# subquery chain flattens to aggregate → broadcast threshold join →
# semi join: the fact shuffles once for the (supp, part) rollup;
# everything after runs on ≤|part×supp-pairs| rows with part,
# threshold, supplier, and nation all broadcast.
# ---------------------------------------------------------------------------

_EXCESS_SUPPLIERS_ORACLE = """
WITH shipped AS (
  SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%gear%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_partkey
),
thr AS (
  SELECT l_partkey AS t_part, ROUND(1.5 * AVG(qty), 6) AS cut
  FROM shipped GROUP BY l_partkey
),
excess AS (
  SELECT DISTINCT l_suppkey FROM shipped
  JOIN thr ON l_partkey = t_part WHERE qty > cut
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM excess)
"""


@query("olap-excess-suppliers", oracle=_EXCESS_SUPPLIERS_ORACLE)
def olap_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    gear = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    shipped = (
        li.join(F.broadcast(gear), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thr = shipped.groupBy(F.col("l_partkey").alias("t_part")).agg(
        F.round(1.5 * F.avg("qty"), 6).alias("cut")
    )
    excess = (
        shipped.join(F.broadcast(thr), F.col("l_partkey") == F.col("t_part"))
        .filter(F.col("qty") > F.col("cut"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            F.broadcast(excess), F.col("s_suppkey") == F.col("l_suppkey"), "semi"
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Per-user activity anomalies: days where a user's event count sits
# ≥2 standard deviations above their own mean — the self-baselined
# outlier detector (abuse spikes, runaway clients). Two aggregations
# on the SAME user_id key: the day rollup shuffles the fact once, the
# per-user stats reduce the ≤|user×days| rollup, and the stats join
# back broadcast. Boundary safety: the nearest z to the 2.0 cut is
# 3e-4 away at gate scale (ulps are 1e-15), so the flag can't flip
# between engines.
# ---------------------------------------------------------------------------

_ANOMALY_ORACLE = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT user_id, AVG(n) AS mu, stddev_samp(n) AS sd
  FROM daily GROUP BY user_id
)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n,
       ROUND((n - mu) / sd, 2) AS z
FROM daily JOIN stats USING (user_id)
WHERE sd > 0 AND (n - mu) / sd >= 2
"""


@query("events-anomaly-zscore", oracle=_ANOMALY_ORACLE)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n"))
    stats = daily.groupBy(F.col("user_id").alias("s_uid")).agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        daily.join(F.broadcast(stats), F.col("user_id") == F.col("s_uid"))
        .filter((F.col("sd") > 0) & (z >= 2))
        # day rendered as a string key: DuckDB's date_trunc over a
        # TIMESTAMP is DATE at the SQL-type level (the pandas bridge
        # hides it), Spark's is TIMESTAMP — the repo-wide convention
        # for calendar keys is an explicit string render on both sides
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            F.round(z, 2).alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# Year-over-year growth per supplier nation: the lag-ratio time
# series. Year comes from l_shipdate, so the whole series needs only
# lineitem ⋈ broadcast(supplier) ⋈ broadcast(nation) — no orders
# join at all; the lag window runs over the |nation|×|years| rollup.
# Revenue is decimal-rounded IDENTICALLY in both engines before the
# ratio, so the 4dp growth figures are bit-equal.
# ---------------------------------------------------------------------------

_YOY_ORACLE = f"""
WITH rev AS (
  SELECT n_name, CAST(YEAR(l_shipdate) AS INT) AS yr,
         CAST(ROUND(SUM({_DEC_REV_SQL}), 2) AS DOUBLE) AS revenue
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, yr
)
SELECT n_name, yr, revenue,
       ROUND(revenue / LAG(revenue) OVER (PARTITION BY n_name ORDER BY yr)
             - 1, 4) AS yoy_growth
FROM rev QUALIFY yoy_growth IS NOT NULL
"""


@query("olap-yoy-growth", oracle=_YOY_ORACLE)
def olap_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    # Aggregate the fact by (suppkey, year) FIRST: decimal sums
    # regroup exactly, so summing the ~|supplier|x|years| partials per
    # nation gives bit-identical revenue while the broadcast joins and
    # the nation rollup run over thousands of rows instead of the
    # whole fact (measured 2x on the bench).
    per_supp = li.groupBy(
        "l_suppkey", F.year("l_shipdate").cast("int").alias("yr")
    ).agg(F.sum(_dec_rev()).alias("rev4"))
    rev = (
        per_supp.join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "yr")
        .agg(F.round(F.sum("rev4"), 2).cast("double").alias("revenue"))
    )
    w = W.partitionBy("n_name").orderBy("yr")
    return (
        rev.withColumn(
            "yoy_growth",
            F.round(F.col("revenue") / F.lag("revenue").over(w) - 1, 4),
        )
        .filter(F.col("yoy_growth").isNotNull())
    )


# ---------------------------------------------------------------------------
# Per-user modal event type via max_by — the argmax AGGREGATE (one
# struct-max per group, no rank window): two keyed aggregations, the
# second reducing the |user×type| rollup. Tie-break is inside the
# comparison key itself (count, then event_type descending
# lexicographically via the struct order), so the argmax is total.
# ---------------------------------------------------------------------------

_MODE_ORACLE = """
SELECT user_id, event_type AS mode_type, n AS mode_n
FROM (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
)
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY n DESC, event_type DESC) = 1
"""


@query("agg-mode-per-group", oracle=_MODE_ORACLE)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    best = counts.groupBy("user_id").agg(
        F.max(F.struct(F.col("n"), F.col("event_type"))).alias("best")
    )
    return best.select(
        "user_id",
        F.col("best.event_type").alias("mode_type"),
        F.col("best.n").alias("mode_n"),
    )


# ---------------------------------------------------------------------------
# Relative standing (percent_rank / cume_dist): the top-5% customers
# by account balance with their exact percentile position. Both
# functions are exact rationals of ranks ((rank-1)/(n-1), rank/n), so
# the 6dp values and the 0.95 cut are engine-identical by
# construction — no float-boundary hazard. The ranking runs through
# operators/windows.global_row_number — the two-pass range-partitioned
# form (range shuffle, per-slice local ranks, P-bounded offset
# broadcast) — NEVER an unpartitioned Window, whose WindowExec would
# move every row to one partition. percent_rank/cume_dist become
# plain arithmetic on the global row number: the order carries a
# unique tiebreak, so rank == row_number, pr = (rn-1)/(N-1) and
# cd = rn/N — the exact rationals both engines' window functions
# compute, at any grain.
# ---------------------------------------------------------------------------

_PERCENT_RANK_ORACLE = """
SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal,
       ROUND(pr, 6) AS pct_rank, ROUND(cd, 6) AS cume
FROM (
  SELECT c_custkey, c_acctbal,
         percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
  FROM customer
  WINDOW w AS (ORDER BY c_acctbal, c_custkey)
)
WHERE pr >= 0.95
"""


@query("win-percent-rank", oracle=_PERCENT_RANK_ORACLE)
def win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dug_data_ingest_spark.operators.windows import global_row_number

    customer = load(spark, sf_dir, "customer")
    ranked, n = global_row_number(
        customer.select("c_custkey", "c_acctbal"),
        [F.col("c_acctbal"), F.col("c_custkey")],
        "__rn",
    )
    # unique total order (custkey tiebreak) → rank == row_number, so
    # percent_rank and cume_dist are closed-form in rn and N
    pr = (
        (F.col("__rn") - 1) / F.lit(n - 1) if n > 1 else F.lit(0.0)
    )
    cd = F.col("__rn") / F.lit(n)
    return (
        ranked.withColumn("pr", pr)
        .withColumn("cd", cd)
        .filter(F.col("pr") >= 0.95)
        .select(
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.round("pr", 6).alias("pct_rank"),
            F.round("cd", 6).alias("cume"),
        )
    )


# ---------------------------------------------------------------------------
# Time-range rolling window: 7-day trailing spend per customer. The
# frame is a RANGE (time interval) frame, not a ROWS frame — the one
# window-frame family win-running-total (rows) doesn't cover: each
# order sums every order of the same customer whose date falls in the
# trailing 6-day window, however many rows that is. Spark expresses
# interval frames as rangeBetween over epoch seconds; 6*86400 s ==
# INTERVAL 6 DAY here because the session pins
# spark.sql.session.timeZone=UTC (session.py) — in a DST-observing
# session timezone, midnights across a transition sit 86400±3600 s
# apart and the epoch frame would disagree with the oracle's calendar
# INTERVAL frame. Scale: the window is partitioned by
# o_custkey — per-customer sort, no global ordering, so a 100-TB fact
# fans out across executors by key; sums ride DECIMAL(18,2) so the
# trailing total is exact regardless of intra-frame order.
# ---------------------------------------------------------------------------

_MOVING_RANGE_ORACLE = """
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       CAST(ROUND(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) OVER w, 2)
            AS DOUBLE) AS trailing_7d_spend,
       CAST(COUNT(*) OVER w AS BIGINT) AS trailing_7d_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
"""


@query("win-moving-avg-range", oracle=_MOVING_RANGE_ORACLE)
def win_moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    dec_price = dec_money("o_totalprice")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-6 * 86400, W.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.round(F.sum(dec_price).over(w), 2)
        .cast("double")
        .alias("trailing_7d_spend"),
        F.count(F.lit(1)).over(w).alias("trailing_7d_orders"),
    )


# ---------------------------------------------------------------------------
# Time-spine gap-fill + LOCF: the bronze→silver timeseries shape. A
# daily rollup of events has holes (days where an event_type never
# fired); downstream models need a dense matrix. Build the complete
# type × day spine with sequence()+explode — the spine derives from a
# 1-row global bounds aggregate crossJoined with the distinct-type
# dim, so it never touches the fact again — left-join the rollup onto
# it, fill counts with 0, and forward-fill. Instead of building the
# spine and JOINING the rollup onto it (two fact scans + a join),
# each rollup row EXPLODES its own run of days — itself, the gap up
# to the next observation (lead), and, for a type's first row, the
# head back to the global min day — inheriting its LOCF value from
# the source row. Scale: the fact is scanned exactly ONCE and there
# is NO join; the only post-rollup work is two window passes and an
# explode over |types|·|days| rows, which the calendar bounds at any
# corpus scale (the unpartitioned bounds window included —
# plan-pinned in tests/test_plan_shapes.py). NULL event_type rows
# are excluded by contract (see the function body); the oracle
# replays the equivalent spine construction declaratively.
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
         CAST(ROUND(AVG(value), 2) AS DOUBLE) AS avg_value
  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
spine AS (
  SELECT t.event_type, CAST(g.d AS DATE) AS day
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
              FROM bounds) g)
SELECT s.event_type, strftime(s.day, '%Y-%m-%d') AS day,
       COALESCE(d.n_events, 0) AS n_events,
       (d.n_events IS NULL) AS gap_filled,
       last_value(d.avg_value IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value_locf
FROM spine s LEFT JOIN daily d USING (event_type, day)
"""


@query("ts-gapfill-locf", oracle=_GAPFILL_ORACLE)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Contract: NULL event_type rows are excluded up front — a plain
    # equi-join/groupBy key can never reunite a NULL series with its
    # rollup rows (NULL = NULL is never true in either engine), so
    # carrying them would silently zero their counts; excluding them
    # is the honest semantic and the filter is pushed to the scan.
    events = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 2).cast("double").alias("avg_value"),
    )
    # Gap days are generated FROM the rollup rows themselves (each
    # observed day explodes the run up to the next observation, and
    # inherits its LOCF value from the source row) — no spine table,
    # no join, and the fact is scanned exactly once. Global bounds
    # ride an unpartitioned window over the rollup: |types|·|days|
    # rows at ANY corpus scale, so the single-partition pass is
    # bounded by the calendar, not the data.
    wt = W.partitionBy("event_type").orderBy("day")
    wg = W.partitionBy(F.lit(1))
    d2 = daily.select(
        "event_type",
        "day",
        "n_events",
        F.last("avg_value", ignorenulls=True)
        .over(wt.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("carried"),
        F.lead("day").over(wt).alias("next_day"),
        F.row_number().over(wt).alias("rn"),
    ).select(
        "*",
        F.min("day").over(wg).alias("glo"),
        F.max("day").over(wg).alias("ghi"),
    )
    exploded = d2.select(
        "event_type",
        "day",
        "n_events",
        "carried",
        F.explode(
            F.expr(
                """
                concat(
                  CASE WHEN rn = 1 AND day > glo
                       THEN sequence(glo, date_sub(day, 1)) ELSE array() END,
                  array(day),
                  CASE WHEN coalesce(date_sub(next_day, 1), ghi) > day
                       THEN sequence(date_add(day, 1),
                                     coalesce(date_sub(next_day, 1), ghi))
                       ELSE array() END)
                """
            )
        ).alias("d"),
    )
    return exploded.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.when(F.col("d") == F.col("day"), F.col("n_events"))
        .otherwise(F.lit(0))
        .alias("n_events"),
        (F.col("d") != F.col("day")).alias("gap_filled"),
        # days BEFORE a type's first observation have no value to
        # carry (LOCF null, as the oracle's IGNORE NULLS spine walk
        # produces); every other day — observed or gap — carries the
        # source row's last non-null average forward.
        F.when(F.col("d") < F.col("day"), F.lit(None).cast("double"))
        .otherwise(F.col("carried"))
        .alias("avg_value_locf"),
    )



# ---------------------------------------------------------------------------
# TPC-H Q21 shape: "waiting suppliers" — the supplier who was the ONLY
# late shipper in a multi-supplier finished order. The textbook SQL is
# a triple self-correlation (EXISTS another supplier's line, NOT
# EXISTS another LATE supplier's line) that a naive planner answers
# with two extra fact self-joins; the aggregate-first rework below
# answers all three correlations from ONE per-order aggregate of the
# same joined lines (distinct suppliers, distinct late suppliers,
# the unique late supplier), so the fact shuffles once on l_orderkey
# and the self-joins vanish. Reference: adapted to the reduced schema
# (late = shipped > 90 days after order date, as olap-late-shipments).
# ---------------------------------------------------------------------------

_WAITING_SUPPLIERS_ORACLE = """
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT l_suppkey) FILTER (late) AS n_late_supp,
         MIN(l_suppkey) FILTER (late) AS the_late_supp
  FROM lines GROUP BY l_orderkey)
SELECT s_name, COUNT(*) AS numwait
FROM per_order JOIN supplier ON the_late_supp = s_suppkey
WHERE n_supp > 1 AND n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 10
"""


@query("olap-waiting-suppliers", oracle=_WAITING_SUPPLIERS_ORACLE)
def olap_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    lines = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select("l_orderkey", "l_suppkey", late.alias("late"))
    # Two plain keyed aggregates instead of two countDistincts: the
    # distinct rewrite would Expand every joined row 2x before its
    # shuffle; rolling up to (order, supplier) grain first moves the
    # same information un-expanded. The second groupBy(orderkey) does
    # re-shuffle (hashpartitioning on (orderkey, suppkey) does NOT
    # satisfy a grouping on orderkey alone), but it shuffles the
    # supplier-grain rollup, not the fact — the win is the dropped
    # Expand plus the smaller second exchange.
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("supp_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.count(F.when(F.col("supp_late"), 1)).alias("n_late_supp"),
        F.min(F.when(F.col("supp_late"), F.col("l_suppkey"))).alias(
            "the_late_supp"
        ),
    )
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supplier), F.col("the_late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Event path transitions: the per-user first-order Markov matrix —
# counts of consecutive (prev_type → next_type) steps in each user's
# timeline, the input for funnel discovery / next-action models. ONE
# user-keyed window (lag) and ONE tiny groupBy over |types|² keys;
# the lag ordering tie-breaks on event_id so simultaneous events
# produce the identical chain in both engines.
# ---------------------------------------------------------------------------

_PATH_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n_steps
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


@query("events-path-transitions", oracle=_PATH_TRANSITIONS_ORACLE)
def events_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return path_transitions(load(spark, sf_dir, "events"))


def path_transitions(events: DataFrame) -> DataFrame:
    """Markov transition counts over each user's (ts, event_id)-ordered
    event stream. The tiebreak matters: same-timestamp events order by
    event_id, so the bigram counts are a pure function of the data —
    property-tested against a sorted-walk model under adversarial ties
    and partitionings (tests/test_blocking_properties.py)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_steps"))
    )


# ---------------------------------------------------------------------------
# OHLC time-bar resample: 15-minute open/high/low/close bars per event
# type — the canonical timeseries downsample (metrics rollups, market
# bars). open/close are argmin/argmax AGGREGATES over a scalar
# (epoch·10⁷ + event_id) order key — no rank window, no self-join, so
# the whole resample is ONE map-side-combined groupBy over
# |types|·|buckets| keys at any fact size. The composite key fits a
# bigint while event_id < 10⁷ (testdata ids are ≪ that; a production
# run would widen to a decimal key). Both engines TRUNCATE the epoch
# to whole seconds (Spark's unix_timestamp truncates; the oracle
# FLOORs before casting — a bare CAST would ROUND and order
# same-second-after-rounding pairs differently), so sub-second order
# resolves identically: by event_id.
# ---------------------------------------------------------------------------

_OHLC_ORACLE = """
SELECT event_type,
       CAST(FLOOR(epoch(ts) / 900) * 900 AS BIGINT) AS bucket_start,
       ROUND(arg_min(value,
                     CAST(FLOOR(epoch(ts)) AS BIGINT) * 10000000 + event_id),
             2) AS open,
       ROUND(MAX(value), 2) AS high,
       ROUND(MIN(value), 2) AS low,
       ROUND(arg_max(value,
                     CAST(FLOOR(epoch(ts)) AS BIGINT) * 10000000 + event_id),
             2) AS close,
       COUNT(*) AS n_events
FROM events GROUP BY event_type, bucket_start
"""


@query("ts-resample-ohlc", oracle=_OHLC_ORACLE)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    ordkey = epoch * 10_000_000 + F.col("event_id")
    # open/close must SKIP NULL prices like the oracle's arg_min /
    # arg_max do (DuckDB ignores NULL-argument rows): min/max over a
    # (ordkey, value) struct that is NULL when value is NULL — min/max
    # skip NULLs, and ordkey is unique so the struct order IS the
    # ordkey order. Spark's min_by/max_by would return the NULL value
    # itself, diverging the engines on any NULL-priced tick.
    tick = F.when(
        F.col("value").isNotNull(),
        F.struct(ordkey.alias("o"), F.col("value").alias("v")),
    )
    return events.groupBy(
        "event_type",
        (F.floor(epoch / 900) * 900).cast("bigint").alias("bucket_start"),
    ).agg(
        F.round(F.min(tick)["v"], 2).alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.max(tick)["v"], 2).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Cumulative distinct count: per user-day, how many DISTINCT event
# types the user has touched so far — the running-engagement-breadth
# series (neither engine has COUNT(DISTINCT) OVER). The classic exact
# rewrite: a type's FIRST day per user (one keyed agg) marks where the
# running count increments; daily new-type counts then running-sum
# over a per-user ordered window. Two rollup-sized shuffles; the fact
# is scanned once and never windows at event grain.
# ---------------------------------------------------------------------------

_CUME_DISTINCT_ORACLE = """
WITH firsts AS (
  SELECT user_id, event_type, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY user_id, event_type),
daily AS (
  SELECT user_id, first_day AS day, COUNT(*) AS n_new_types
  FROM firsts GROUP BY user_id, first_day)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n_new_types,
       CAST(SUM(n_new_types) OVER (PARTITION BY user_id ORDER BY day
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_types_cum
FROM daily
"""


@query("win-cume-distinct", oracle=_CUME_DISTINCT_ORACLE)
def win_cume_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    firsts = events.groupBy("user_id", "event_type").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    daily = firsts.groupBy(
        "user_id", F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_new_types"))
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return daily.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_new_types",
        F.sum("n_new_types").over(w).alias("n_types_cum"),
    )


# ---------------------------------------------------------------------------
# Mergeable HLL sketch state — the RE-AGGREGATABLE rollup pattern
# agg-approx-distinct (one-shot approx_count_distinct) doesn't cover:
# build one Datasketches HLL per source, UNION the stored sketches,
# estimate from the merged state. This is the shape incremental
# pipelines persist (per-partition/per-day sketch columns, merged at
# query time — no re-scan of history, the bloom_build sibling for
# cardinality instead of membership). Sketches are fixed-size, so the
# rollup is map-side-combined and the merge input is |sources| rows
# at any corpus size. The oracle pins both exact columns
# value-for-value and the merged estimate via a deterministic
# tolerance flag (HLL is a pure function of the data; measured
# relerr <= 1.3% across sfs, flagged at 5%) — the agg-approx-distinct
# precedent.
# ---------------------------------------------------------------------------


@query(
    "agg-sketch-partial-merge",
    oracle="""
    SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT text) AS BIGINT) AS n_exact,
           TRUE AS merged_within_tol
    FROM documents
    """,
)
def agg_sketch_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(F.hll_sketch_agg("text").alias("sk"))
    est = per_src.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = docs.agg(
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct("text").alias("n_exact"),
    )
    return exact.crossJoin(est).select(
        "n_sources",
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= F.greatest(F.round(F.col("n_exact") * 0.05), F.lit(3))
        ).alias("merged_within_tol"),
    )


# ---------------------------------------------------------------------------
# Weighted PageRank over the event-type transition graph — the
# iterative-join pattern (GraphX's core shape) done Spark-right: the
# corpus contributes exactly ONE pass (the same per-user lag window
# events-path-transitions grades), the resulting edge table is
# |types|²-bounded and checkpointed, and every PageRank iteration is
# a join among bounded broadcast-sized tables — at 100 TB the fact
# table is scanned once and the iterations cost nothing that scales
# with it. Damping 0.85, 3 fixed iterations (deterministic — no
# convergence test, so the oracle unrolls the same three), dangling
# mass redistributed uniformly. ROUND(,4) absorbs aggregation-order
# ulps (the zipf-slope precedent).
# ---------------------------------------------------------------------------

_PR_EDGES_SQL = """
seq AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
edges AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n_steps
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT prev_type AS node FROM edges
    UNION ALL SELECT next_type FROM edges)),
outw AS (SELECT prev_type, SUM(n_steps) AS w_out FROM edges
         GROUP BY prev_type),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)
"""


def _pr_iter_sql(i: int) -> str:
    prev = f"r{i - 1}"
    return f""",
c{i} AS (
  SELECT e.next_type AS node,
         SUM(r.rank * (CAST(e.n_steps AS DOUBLE) / o.w_out)) AS cin
  FROM edges e JOIN outw o USING (prev_type)
  JOIN {prev} r ON r.node = e.prev_type
  GROUP BY e.next_type),
d{i} AS (
  SELECT COALESCE(SUM(rank), 0.0) AS dang FROM {prev} p
  WHERE NOT EXISTS (SELECT 1 FROM outw o WHERE o.prev_type = p.node)),
r{i} AS (
  SELECT n.node,
         (1.0 - 0.85) / nn.n
           + 0.85 * (COALESCE(c.cin, 0.0) + d{i}.dang / nn.n) AS rank
  FROM nodes n LEFT JOIN c{i} c ON c.node = n.node, nn, d{i})"""


_PAGERANK_ORACLE = (
    "WITH "
    + _PR_EDGES_SQL.strip()
    + _pr_iter_sql(1)
    + _pr_iter_sql(2)
    + _pr_iter_sql(3)
    + " SELECT node, ROUND(rank, 4) AS pagerank FROM r3"
)


@query("graph-pagerank", oracle=_PAGERANK_ORACLE)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dug_data_ingest_spark.ext.graph import pagerank_weighted

    edges = path_transitions(load(spark, sf_dir, "events"))
    return pagerank_weighted(
        edges,
        src_col="prev_type",
        dst_col="next_type",
        weight_col="n_steps",
        damping=0.85,
        n_iters=3,
    )


# ---------------------------------------------------------------------------
# Z-order clustering quality — the multi-dimensional layout op behind
# Delta's OPTIMIZE ZORDER / Iceberg z-curves (functions/zorder.py):
# Morton-interleave (l_orderkey, l_partkey) onto a 32-bit curve, cut
# it into 16 equal z-ranges (the file-boundary stand-ins), and report
# each range's row count and min/max ENVELOPE in both dimensions —
# tight spans are exactly what lets per-file skip indexes prune scans
# on EITHER key. All integer/fixed-order-IEEE math, replayed term for
# term by the oracle. Scale shape: one min/max aggregate collapsed to
# a broadcast row, a row-local z projection, ONE 16-group map-side-
# combined aggregate; the fact table is scanned once, shuffled never.
# ---------------------------------------------------------------------------

_ZORDER_ORACLE = """
WITH s AS (
  SELECT min(l_orderkey) AS xmin, max(l_orderkey) AS xmax,
         min(l_partkey) AS ymin, max(l_partkey) AS ymax
  FROM lineitem),
g AS (
  SELECT l_orderkey, l_partkey,
         CAST(floor((CAST(l_orderkey - s.xmin AS DOUBLE) * 65535.0)
              / CAST(s.xmax - s.xmin AS DOUBLE)) AS BIGINT) AS sx,
         CAST(floor((CAST(l_partkey - s.ymin AS DOUBLE) * 65535.0)
              / CAST(s.ymax - s.ymin AS DOUBLE)) AS BIGINT) AS sy
  FROM lineitem, s),
z AS (
  SELECT l_orderkey, l_partkey,
         list_sum([((sx >> i) & 1) * (1::BIGINT << (2 * i))
                   + ((sy >> i) & 1) * (1::BIGINT << (2 * i + 1))
                   for i in range(0, 16)]) AS zval
  FROM g)
SELECT CAST(zval >> 28 AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(max(l_orderkey) - min(l_orderkey) AS BIGINT) AS o_span,
       CAST(max(l_partkey) - min(l_partkey) AS BIGINT) AS p_span
FROM z GROUP BY bucket
"""


@query("layout-zorder", oracle=_ZORDER_ORACLE)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dug_data_ingest_spark.functions.zorder import zorder_key_2d

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    z = zorder_key_2d(li, "l_orderkey", "l_partkey", bits=16)
    return (
        z.withColumn("bucket", F.shiftright("zval", 28).cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("l_orderkey") - F.min("l_orderkey"))
            .cast("bigint")
            .alias("o_span"),
            (F.max("l_partkey") - F.min("l_partkey"))
            .cast("bigint")
            .alias("p_span"),
        )
    )


# ---------------------------------------------------------------------------
# Daily-volume anomaly detection — the monitoring query every ingest
# pipeline runs over its own event stream: per (event_type, day)
# counts z-scored against that type's own daily distribution,
# |z| > 2 flagged. Two bounded aggregates (days x types, then types),
# the |types|-row stats table broadcast back, flagging row-local;
# the corpus is scanned once and shuffles only into the daily rollup.
# Dates travel as formatted strings (the repo's date convention) and
# ROUND(,4) absorbs the stddev algorithm's cross-engine ulps.
# ---------------------------------------------------------------------------


@query(
    "events-volume-anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, AVG(cnt) AS mu, stddev_samp(cnt) AS sigma
      FROM daily GROUP BY event_type)
    SELECT d.event_type, d.day, CAST(d.cnt AS BIGINT) AS cnt,
           ROUND((d.cnt - s.mu) / nullif(s.sigma, 0.0), 4) AS z,
           CASE WHEN s.sigma IS NULL OR s.sigma = 0.0 THEN NULL
                ELSE abs((d.cnt - s.mu) / s.sigma) > 2.0 END AS is_anomaly
    FROM daily d JOIN stats s USING (event_type)
    """,
)
def events_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = daily.groupBy("event_type").agg(
        F.avg("cnt").alias("mu"), F.stddev_samp("cnt").alias("sigma")
    )
    dev = (F.col("cnt") - F.col("mu")) / F.col("sigma")
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(
                (F.col("cnt") - F.col("mu"))
                / F.when(F.col("sigma") != 0.0, F.col("sigma")),
                4,
            ).alias("z"),
            F.when(
                F.col("sigma").isNull() | (F.col("sigma") == 0.0),
                F.lit(None).cast("boolean"),
            )
            .otherwise(F.abs(dev) > 2.0)
            .alias("is_anomaly"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join with tolerance — the bounded-lookback variant every
# production asof implementation ships (kdb's `wj` window, pandas
# merge_asof(tolerance=...), TimescaleDB): the latest preceding click
# per error, but only within a 15-minute window; staler matches are
# NULL, not silently joined. The tolerance is also the SCALE story:
# bounding the lookback turns the half-open inequality into a closed
# time-range join, so at 100 TB both sides can be bucketed into
# aligned time slices and each slice joins only its neighbour — the
# unbounded asof cannot prune history at all. Same deterministic
# (ts, coalesced-value) tie-break as join-asof-events.
# ---------------------------------------------------------------------------

_ASOF_TOL_ORACLE = """
SELECT e.event_id,
       epoch_us(MAX(c.ts)) AS last_click_us,
       ROUND((MAX({'t': c.ts, 'k': COALESCE(c.value, -1e308), 'v': c.value})).v,
             2) AS last_click_value
FROM events e LEFT JOIN events c
  ON c.user_id = e.user_id AND c.event_type = 'click' AND c.ts < e.ts
 AND c.ts >= e.ts - INTERVAL 15 MINUTE
WHERE e.event_type = 'error'
GROUP BY e.event_id
"""


@query("join-asof-tolerance", oracle=_ASOF_TOL_ORACLE)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", F.col("user_id").alias("euid"), "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cuid"),
        F.col("ts").alias("cts"),
        F.col("value").alias("cvalue"),
    )
    cond = (
        (F.col("euid") == F.col("cuid"))
        & (F.col("cts") < F.col("ts"))
        & (F.col("cts") >= F.col("ts") - F.expr("INTERVAL 15 MINUTES"))
    )
    return (
        errors.join(clicks, cond, "left")
        .groupBy("event_id")
        .agg(
            F.unix_micros(F.max("cts")).alias("last_click_us"),
            F.round(
                F.max_by(
                    "cvalue",
                    F.struct(
                        F.col("cts").alias("t"),
                        F.coalesce("cvalue", F.lit(-1e308)).alias("k"),
                    ),
                ),
                2,
            ).alias("last_click_value"),
        )
    )
