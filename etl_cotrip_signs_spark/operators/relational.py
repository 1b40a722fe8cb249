"""Relational core: scans, joins, aggregations, windows, sorts, set ops.

The reference ETL has zero relational operators (its whole dataflow is
project → explode → filter, ``/root/reference/task.ts:76-112``); this module
is the [EXT] surface mandated by BASELINE.json — classic star-schema
analytics, expressed declaratively so Catalyst chooses physical strategies.

Scale design notes (100 TB):
- Dimension tables (region/nation/supplier, and `part`/`customer` at star
  ratios) are broadcast explicitly — no shuffle of the fact table for
  dim joins.
- Fact-fact joins (lineitem ⋈ orders) are plain equi-joins: sort-merge with
  AQE skew splitting; at petabyte scale the intended deployment buckets
  both tables by orderkey to make this co-located (see README).
- Aggregations rely on Catalyst's partial (map-side) aggregation; high
  cardinality groupBys shuffle once on the group key.
- Floating-point sums are rounded (2-4 decimals) in BOTH engines: parallel
  summation order is nondeterministic, low bits are noise, and the rounded
  value is scale-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.money import avg_fixed, sum_fixed
from ..io import load_table
from ..registry import query


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)      AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
                               AS DECIMAL(18,4))) AS DOUBLE), 2)                 AS sum_disc_price,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
                               AS DECIMAL(18,6))) AS DOUBLE), 2)                 AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4)      AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4)      AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate scan of the fact table.

    One shuffle on a 6-value group key; everything else is map-side.
    The shipdate filter pushes down to the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_fixed(F.col("l_quantity")).alias("sum_qty"),
            sum_fixed(F.col("l_extendedprice")).alias("sum_base_price"),
            sum_fixed(disc, scale=4).alias("sum_disc_price"),
            sum_fixed(charge, scale=6).alias("sum_charge"),
            avg_fixed(F.col("l_quantity")).alias("avg_qty"),
            avg_fixed(F.col("l_extendedprice")).alias("avg_price"),
            avg_fixed(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_stats_orders",
    oracle="""
    SELECT o_orderpriority,
           count(*)                        AS n_orders,
           count(DISTINCT o_custkey)       AS n_customers,
           round(min(o_totalprice), 2)     AS min_price,
           round(max(o_totalprice), 2)     AS max_price,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)             AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basic stats aggregate incl. count-distinct (expand + two-phase agg)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        avg_fixed(F.col("o_totalprice")).alias("avg_price"),
        sum_fixed(F.col("o_totalprice")).alias("sum_price"),
    )


@query(
    "agg_rollup_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')    AS orderstatus,
           coalesce(o_orderpriority, 'ALL')  AS orderpriority,
           count(*)                          AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals; NULL group keys coalesced for stable hashing."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sum_fixed(F.col("o_totalprice")).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "sum_price",
        )
    )


@query(
    "agg_cube_flags",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*)                      AS n_items,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the two lineitem flag columns (all 2^2 grouping sets)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            sum_fixed(F.col("l_quantity")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
    )


@query("agg_approx_distinct")  # no oracle: HLL/quantile sketches are engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct + quantiles (HyperLogLog++ / Greenwald-Khanna).

    Sketch-based: constant memory per partition regardless of scale — the
    100 TB answer to countDistinct's shuffle explosion. Rows-only checked
    (DuckDB's approx sketches differ numerically).

    Output-shape note: each quantile is its own scalar column (not one
    array<double>) — the driver's canonicalizer hashes flat columns only.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("price_p50"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("price_p90"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("price_p99"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@query(
    "q5_regional_revenue",
    oracle="""
    SELECT r_name, n_name,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
                               AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY r_name, n_name
    """,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-table star join, revenue by region/nation for one year.

    Join strategy at scale: lineitem⋈orders is the only fact-fact join
    (sort-merge, AQE-skew-safe); customer/nation/region are broadcast so
    the fact side never shuffles for them. The orderdate filter prunes
    orders before the join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            sum_fixed(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
                               AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered 3-way join + agg + global top-k.

    orderBy+limit compiles to TakeOrderedAndProject — no global sort
    materialization. Tie-broken on l_orderkey for cross-engine determinism.
    """
    cutoff = F.lit("1998-03-15").cast("timestamp_ntz")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            sum_fixed(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "join_broadcast_brand_revenue",
    oracle="""
    SELECT p_brand,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4)
                               AS DECIMAL(18,4))) AS DOUBLE), 2)             AS revenue,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)  AS sum_qty,
           count(*)                                          AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def join_broadcast_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dim: the fact table never shuffles for the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            sum_fixed(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("revenue"),
            sum_fixed(F.col("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_semi_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
)
def join_semi_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having a >400k order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_anti_customers",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_nationkey"
    )


@query(
    "join_theta_price_band",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('micro', 0.0, 50000.0),
               ('small', 50000.0, 150000.0),
               ('medium', 150000.0, 300000.0),
               ('large', 300000.0, 450000.0),
               ('jumbo', 450000.0, 1e18)
    )
    SELECT band, count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def join_theta_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta (non-equi) join against a tiny broadcast band table.

    Non-equi joins are BroadcastNestedLoop — only sane when one side is
    broadcast-small, which is exactly this shape.
    """
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            ("micro", 0.0, 50000.0),
            ("small", 50000.0, 150000.0),
            ("medium", 150000.0, 300000.0),
            ("large", 300000.0, 450000.0),
            ("jumbo", 450000.0, 1e18),
        ],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sum_fixed(F.col("o_totalprice")).alias("sum_price"),
        )
    )


@query(
    "join_asof_latest_order",
    oracle="""
    SELECT event_id, o_orderkey AS asof_orderkey,
           CAST(o_orderdate AS DATE) AS asof_orderdate
    FROM (
        SELECT e.event_id, o.o_orderkey, o.o_orderdate,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
               ) AS rn
        FROM events e
        JOIN orders o
          ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
    """,
)
def join_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the latest order of that user at event time.

    Spark lacks a native ASOF JOIN. The naive form (equi-join on user +
    time predicate + per-event row_number) materializes events ×
    orders-per-user pairs — quadratic in per-key density. This is the
    merge-asof formulation instead: union both sides into one stream keyed
    by (user, time), sort once per key, and carry the most recent order
    forward with last(ignorenulls) — O((E+O) log) per key, no pair blow-up.

    Ordering guarantees: at equal timestamps orders sort before events
    (kind 0 < 1, '<=' semantics), and same-date orders sort by orderkey so
    the carried order is the max-(date, orderkey) one — identical to the
    oracle's row_number over (o_orderdate DESC, o_orderkey DESC).
    """
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    o_part = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("t"),
        F.lit(0).alias("kind"),
        F.struct("o_orderkey", "o_orderdate").alias("order_info"),
        F.lit(None).cast("long").alias("event_id"),
    )
    e_part = e.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("struct<o_orderkey:bigint,o_orderdate:timestamp_ntz>").alias(
            "order_info"
        ),
        "event_id",
    )
    w = (
        W.partitionBy("k")
        .orderBy("t", "kind", F.col("order_info.o_orderkey").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = o_part.unionByName(e_part).withColumn(
        "asof", F.last("order_info", ignorenulls=True).over(w)
    )
    return (
        merged.filter((F.col("kind") == 1) & F.col("asof").isNotNull())
        .select(
            "event_id",
            F.col("asof.o_orderkey").alias("asof_orderkey"),
            F.to_date("asof.o_orderdate").alias("asof_orderdate"),
        )
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@query(
    "window_topk_orders_per_cust",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the canonical top-k-per-group window."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
        )
    )


@query(
    "window_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total
    FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (rowsBetween frame; deterministic order)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ), 2) AS delta,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS next_type
    FROM events
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics over the event stream, per user."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "window_rank_customers",
    oracle="""
    SELECT c_custkey, c_nationkey,
           rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drnk,
           ntile(4)     OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
)
def window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family (rank / dense_rank / ntile) per nation."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


# --------------------------------------------------------------------------
# Sorts / limits / set ops / distinct
# --------------------------------------------------------------------------

@query(
    "sort_topk_orders",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — no full sort at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "o_orderpriority",
        )
    )


@query(
    "setops_customer_keys",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def setops_customer_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / UNION(distinct) / EXCEPT chain over customer-key sets.

    Mirrors SQL's left-associative set-op evaluation ((A∩B)∪C)∖D.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    negative = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    machinery = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    return building.intersect(big).union(negative).distinct().exceptAll(
        machinery.distinct()
    )


@query(
    "distinct_order_status",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def distinct_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a composite key (hash-agg on the pair)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).distinct()


@query(
    "pivot_returnflag",
    oracle="""
    SELECT l_returnflag,
           round(CAST(sum(CASE WHEN l_linestatus = 'O'
                               THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS "O",
           round(CAST(sum(CASE WHEN l_linestatus = 'F'
                               THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS "F"
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list → no extra pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2))
    )
