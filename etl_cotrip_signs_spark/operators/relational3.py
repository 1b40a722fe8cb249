"""Relational surface, part 3: outer joins, collect/first/last aggregates,
range window frames, and the full predicate family — the remaining
SURVEY.md §2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.money import sum_fixed
from ..io import load_table
from ..registry import query


@query(
    "join_outer_customers_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           coalesce(n_orders, 0)            AS n_orders,
           coalesce(sum_price, 0.0)         AS sum_price
    FROM customer
    LEFT JOIN (
        SELECT o_custkey,
               count(*) AS n_orders,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
        FROM orders GROUP BY o_custkey
    ) o ON c_custkey = o.o_custkey
    """,
)
def join_outer_customers_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join (aggregate-then-join: the pre-aggregation shrinks the
    probe side before the join — never join raw facts then aggregate when
    only per-key totals are needed)."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sum_fixed(F.col("o_totalprice")).alias("sum_price"),
        )
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("sum_price", F.lit(0.0)).alias("sum_price"),
    )


@query(
    "join_full_outer_nations",
    oracle="""
    SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
           coalesce(n_customers, 0) AS n_customers,
           coalesce(n_suppliers, 0) AS n_suppliers
    FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers
          FROM customer GROUP BY 1) cn
    FULL OUTER JOIN
         (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
          FROM supplier GROUP BY 1) sn
    USING (nationkey)
    """,
)
def join_full_outer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two aggregates (nations present on either side)."""
    cn = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return cn.join(sn, "nationkey", "full_outer").select(
        "nationkey",
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "agg_collect_first_last",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderstatus)), '|')            AS statuses,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS priorities,
           min_by(o_orderkey, epoch_ms(o_orderdate) * 1000000 + o_orderkey) AS first_orderkey,
           max_by(o_orderkey, epoch_ms(o_orderdate) * 1000000 + o_orderkey) AS last_orderkey
    FROM orders
    WHERE o_custkey % 20 = 0
    GROUP BY o_custkey
    """,
)
def agg_collect_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / collect_set (sorted for determinism — raw collect
    order is partition-dependent) + first/last by event order via
    min_by/max_by on a scalar composite key (date-millis * 1e6 + orderkey —
    DuckDB's min_by can't order by a struct/list, so both engines use the
    same packed-long ordering).

    Output-shape note: the sorted arrays are serialized with '|' joins —
    the driver's canonicalizer can hash only flat scalar columns.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 20 == 0)
    order_key = (
        F.unix_millis(F.col("o_orderdate").cast("timestamp")) * 1_000_000
        + F.col("o_orderkey")
    )
    return o.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_list("o_orderstatus")), "|").alias(
            "statuses"
        ),
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), "|").alias(
            "priorities"
        ),
        F.min_by("o_orderkey", order_key).alias("first_orderkey"),
        F.max_by("o_orderkey", order_key).alias("last_orderkey"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           count(*) OVER (
               PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
               RANGE BETWEEN 7776000000000 PRECEDING AND CURRENT ROW
           ) AS orders_90d,
           first_value(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS first_key,
           last_value(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_key
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (trailing 90 days counted by value distance, not row
    count) + first_value/last_value analytics."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "odate_us", F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    )
    ninety_days_us = 90 * 24 * 3600 * 1_000_000
    w_range = (
        W.partitionBy("o_custkey")
        .orderBy("odate_us")
        .rangeBetween(-ninety_days_us, W.currentRow)
    )
    w_order = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w_order.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w_range).alias("orders_90d"),
        F.first("o_orderkey").over(w_order).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
    )


@query(
    "subquery_max_acctbal",
    oracle="""
    SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
    FROM customer c1
    WHERE c_acctbal = (
        SELECT max(c2.c_acctbal) FROM customer c2
        WHERE c2.c_nationkey = c1.c_nationkey
    )
    """,
)
def subquery_max_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: the richest customer per nation.

    Catalyst de-correlates this into an aggregate + join — same plan the
    window formulation produces, but exercised through the SQL subquery
    surface."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
        FROM customer c1
        WHERE c_acctbal = (
            SELECT max(c2.c_acctbal) FROM customer c2
            WHERE c2.c_nationkey = c1.c_nationkey
        )
        """
    )


@query(
    "lateral_top_orders",
    oracle="""
    SELECT n_name, o.o_orderkey, round(o.o_totalprice, 2) AS totalprice
    FROM nation,
         LATERAL (
             SELECT o_orderkey, o_totalprice
             FROM orders JOIN customer ON o_custkey = c_custkey
             WHERE c_nationkey = n_nationkey
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 3
         ) o
    """,
)
def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: top-3 orders per nation.

    The SQL-standard formulation of top-k-per-group; Catalyst rewrites the
    lateral limit into a ranked window under the hood."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, o.o_orderkey, round(o.o_totalprice, 2) AS totalprice
        FROM nation,
             LATERAL (
                 SELECT o_orderkey, o_totalprice
                 FROM orders JOIN customer ON o_custkey = c_custkey
                 WHERE c_nationkey = n_nationkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 LIMIT 3
             ) o
        """
    )


@query(
    "agg_exact_percentile",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90_price,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_exact_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines implement the standard
    continuous-quantile definition). The sketch-based scale path is
    agg_approx_distinct's percentile_approx."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99_price"),
    )


@query(
    "agg_stat_moments",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 2)              AS price_stddev,
           round(var_samp(l_quantity), 4)                      AS qty_var,
           round(corr(l_extendedprice, l_quantity), 6)         AS price_qty_corr,
           round(covar_samp(l_extendedprice, l_discount), 4)   AS price_disc_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments: stddev/variance/correlation/covariance.

    Both engines use numerically-stable single-pass moment updates; values
    are ~1e3-1e5 with relative error ~1e-12, so 2-6dp rounding is stable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 4).alias(
            "price_disc_covar"
        ),
    )


@query(
    "filter_predicate_family",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_name LIKE '%gold%'
       OR regexp_matches(p_type, '^STANDARD.*BRASS$')
       OR p_size BETWEEN 47 AND 50
       OR p_brand IS NOT DISTINCT FROM 'Brand#55'
    """,
)
def filter_predicate_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate family: LIKE, RLIKE, BETWEEN, null-safe equality — the
    disjunction still prunes/pushes where the format allows."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%gold%")
        | F.col("p_type").rlike("^STANDARD.*BRASS$")
        | F.col("p_size").between(47, 50)
        | F.col("p_brand").eqNullSafe("Brand#55")
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@query(
    "profile_columns",
    oracle="""
    SELECT 'o_orderstatus' AS col_name, count(*) AS n_rows,
           count(*) - count(o_orderstatus) AS n_nulls,
           count(DISTINCT o_orderstatus) AS n_distinct,
           min(o_orderstatus) AS min_val, max(o_orderstatus) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
    FROM orders
    """,
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the Deequ/data-quality shape): null count,
    distinct count, min/max per column — computed in ONE scan (a single
    agg produces every metric; stack() pivots to long form), where the
    oracle's UNION ALL formulation re-reads the table per column. At
    100 TB one-pass-many-metrics vs N passes is the difference that
    matters. min/max are emitted as strings for a uniform profile schema;
    the money column goes through DECIMAL(18,2) so both engines print
    identical text."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
        ]
    aggs += [
        F.min("o_orderstatus").alias("o_orderstatus__min"),
        F.max("o_orderstatus").alias("o_orderstatus__max"),
        F.min("o_orderpriority").alias("o_orderpriority__min"),
        F.max("o_orderpriority").alias("o_orderpriority__max"),
        F.min("o_custkey").cast("string").alias("o_custkey__min"),
        F.max("o_custkey").cast("string").alias("o_custkey__max"),
        F.min("o_totalprice").cast("decimal(18,2)").cast("string").alias("o_totalprice__min"),
        F.max("o_totalprice").cast("decimal(18,2)").cast("string").alias("o_totalprice__max"),
    ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " AS (col_name, n_nulls, n_distinct, min_val, max_val)"
        ),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


@query(
    "window_distribution_funcs",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6)    AS cume,
           ntile(4) OVER w                 AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist / ntile)
    over a tie-broken ORDER BY — the tie-break makes all three
    deterministic and therefore oracle-checkable. One window pass, one
    shuffle on the partition key."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_time_range_events",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS n_in_window,
           round(CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2))) OVER w AS DOUBLE), 2)
               AS sum_in_window
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW
    )
    """,
)
def window_time_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per user, the rolling 10-minute count and
    exact-DECIMAL sum ending at each event — the time-based sliding
    aggregate that rowsBetween cannot express when events are unevenly
    spaced. Spark's rangeBetween needs a numeric ORDER BY, so the frame
    runs over unix MICROseconds (the fixture's ts carries sub-second
    precision) — the same instants DuckDB's INTERVAL frame sees."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-600 * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_in_window"),
        F.round(
            F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)"))
            .over(w)
            .cast("double"),
            2,
        ).alias("sum_in_window"),
    )


@query(
    "window_topk_via_agg",
    # Same result contract as the window row_number() top-k: top-3 orders
    # by (totalprice desc, orderkey asc) per customer, flattened.
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY round(o_totalprice, 2) DESC, o_orderkey
               ) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
)
def window_topk_via_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group WITHOUT a window: collect each group's rows into a
    sorted array and slice the top 3. The payoff is the execution shape —
    a window top-k must shuffle EVERY row to its partition before ranking,
    while the aggregate form gets map-side partial aggregation: each map
    task pre-reduces its local rows per key, so only per-key partial
    arrays cross the wire. With k << group size (the 100 TB norm: top-3 of
    millions per key) the shuffle shrinks by ~group_size/k.

    (Caveat honored: partial aggregation buffers whole local groups before
    the slice — the refinement when even that is too big is slicing inside
    the partial via a custom Aggregator; builtin composition shown here.)

    Determinism: sort key is (rounded price desc, orderkey) — total order,
    so the slice is unique and the window oracle reproduces it exactly."""
    o = load_table(spark, sf_dir, "orders")
    item = F.struct(
        (-F.round(F.col("o_totalprice"), 2)).alias("neg_price"),
        F.col("o_orderkey").alias("o_orderkey"),
    )
    topk = (
        o.groupBy("o_custkey")
        .agg(F.slice(F.array_sort(F.collect_list(item)), 1, 3).alias("top"))
        .select("o_custkey", F.posexplode("top").alias("pos", "it"))
    )
    return topk.select(
        "o_custkey",
        F.col("it.o_orderkey").alias("o_orderkey"),
        (-F.col("it.neg_price")).alias("totalprice"),
        (F.col("pos") + 1).cast("int").alias("rk"),
    )
