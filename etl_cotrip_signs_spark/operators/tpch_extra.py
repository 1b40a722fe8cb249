"""TPC-H-shape extension queries q4/q6/q7/q10/q14/q18 [EXT beyond task.ts
— engine surface breadth].

Adapted to the fixture schema (no partsupp/commitdate/shipmode columns):
each keeps the canonical TPC-H plan shape — the part that matters for the
engine — with predicates rewritten onto available columns. All are
oracle-checked and use the exact-DECIMAL money summation discipline
(functions/money.py) so hashes are stable across engines.

Scale notes (100 TB): every dimension join is an explicit broadcast
(nation/supplier/part); fact-fact joins shuffle on the join key only after
the selective filters are pushed into the scans; top-k queries compile to
TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.money import sql_sum_fixed, sum_fixed
from ..io import load_table
from ..registry import query


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_sum_fixed('l_extendedprice * l_discount', 4)} AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-side filter + ungrouped agg — the query whose
    entire cost is how much of the scan the pushed predicates skip. All
    four predicates reach the parquet reader (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            sum_fixed(
                F.col("l_extendedprice") * F.col("l_discount"), scale=4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join + agg.
    Adapted predicate (no commitdate/receiptdate in the fixture): a line
    shipped >60 days after the order date marks the order late. The semi
    join carries only the join key + the date predicate — no lineitem
    payload columns survive past the probe."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           {sql_sum_fixed('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
        OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-nation trade-flow rollup. The nation pair
    filter is applied on the broadcast side BEFORE the fact join, so the
    big lineitem⋈orders shuffle only carries rows that can still qualify
    (supplier side prunes in the scan-adjacent broadcast join)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nations = ("NATION_9", "NATION_10")  # the fixture's nation names are synthetic
    n1 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    )
    supp = F.broadcast(s.join(F.broadcast(n1), s.s_nationkey == n1.s_nkey))
    cust = c.join(F.broadcast(n2), c.c_nationkey == n2.c_nkey)
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            sum_fixed(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_sum_fixed('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           round(c.c_acctbal, 2) AS acctbal,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, top 20. The returnflag
    filter prunes lineitem in the scan; nation is a broadcast; the final
    orderBy+limit is TakeOrderedAndProject. Tie-broken on c_custkey."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            sum_fixed(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "acctbal", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT {sql_sum_fixed(
        "CASE WHEN starts_with(p_type, 'PROMO') "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 4)} AS promo_revenue,
           {sql_sum_fixed('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one month. part is a broadcast
    dim; the shipdate window prunes the fact scan. Emits the two exact
    sums rather than their ratio — the division of two correctly-rounded
    doubles is the one step engines can disagree on at the ulp level."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            sum_fixed(
                F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0),
                scale=4,
            ).alias("promo_revenue"),
            sum_fixed(rev, scale=4).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q18_large_volume_customer",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           round(o.o_totalprice, 2) AS totalprice,
           {sql_sum_fixed('l.l_quantity', 2)} AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200
    )
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders (HAVING sum(qty) > threshold as a
    semi join). The heavy-orders set is computed once with a map-side
    partial agg, then semi-joined — lineitem is scanned twice but never
    carries payload through the IN. Threshold 200 keeps the result
    non-degenerate at the fixture scale (~900 qualifying orders at sf0.01)."""
    li = load_table(spark, sf_dir, "lineitem")
    heavy = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 200)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders").join(
        heavy.withColumnRenamed("l_orderkey", "h_orderkey"),
        F.col("o_orderkey") == F.col("h_orderkey"),
        "left_semi",
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .agg(sum_fixed(F.col("l_quantity"), scale=2).alias("sum_qty"))
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with a join-side predicate (the filter
    must NOT drop customers — it lives in the join condition, not a WHERE),
    then a two-level aggregation (count per customer → distribution).

    Scale: the outer join shuffles both sides on custkey once; the second
    aggregation runs over one row per customer — negligible. The classic
    Q13 skew risk (many zero-order customers landing in c_count=0) is a
    single hot *output* group, not a hot join key, so no salting needed."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH part_avg AS (
        SELECT l_partkey, avg(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_sum_fixed('l.l_extendedprice', 2)} AS total_revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#1'
    JOIN part_avg a ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < 0.5 * a.avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into a self-aggregate + join — the rewrite
    Catalyst itself performs for scalar subqueries, written explicitly.

    Scale: the per-part aggregate is a map-side-combined shuffle over the
    fact table; the re-join hits the same key so AQE can reuse the
    exchange; the part-brand filter broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    part_avg = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            sum_fixed(F.col("l_extendedprice"), scale=2).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q22_dormant_accounts",
    oracle="""
    WITH threshold AS (
        SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey, count(*) AS n_cust,
           round(CAST(sum(CAST(round(c.c_acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total_bal
    FROM customer c, threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
)
def q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global-scalar-subquery threshold + NOT EXISTS
    (anti-join) + aggregation — customers with above-average balances who
    never ordered, by nation.

    Scale: the scalar threshold is a one-row broadcast; NOT EXISTS is a
    left_anti shuffle on custkey (no row explosion possible); the final
    agg groups on a 25-value key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            sum_fixed(F.col("c_acctbal"), scale=2).alias("total_bal"),
        )
    )


@query(
    "q12_priority_by_flag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → returnflag on this schema): fact-fact
    join + conditional aggregation, the filter pushed into the lineitem
    scan so the join sees one year of data.

    Scale: both sides shuffle on orderkey (or co-locate when bucketed —
    see bucketed_join_roundtrip); the CASE counts are map-side partial."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH min_bal AS (
        SELECT s_nationkey, min(s_acctbal) AS min_bal
        FROM supplier GROUP BY s_nationkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name,
           round(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN min_bal m ON s.s_nationkey = m.s_nationkey
                  AND s.s_acctbal = m.min_bal
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated min subquery (the per-region min-cost
    supplier) decorrelated into a grouped-min + equality re-join — on this
    schema, the minimum-balance supplier per nation.

    Scale: the grouped min is a tiny aggregate (one row per nation),
    broadcast back onto the supplier scan; the nation dim broadcasts. No
    shuffle touches the fact-sized side beyond the initial aggregate."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    min_bal = s.groupBy("s_nationkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(min_bal.withColumnRenamed("s_nationkey", "mk")),
            (F.col("s_nationkey") == F.col("mk"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
        )
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH per_supp AS (
        SELECT l_suppkey,
               round(CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)))
                     AS DOUBLE), 2) AS supp_value
        FROM lineitem GROUP BY l_suppkey
    ),
    total AS (
        SELECT CAST(sum(CAST(supp_value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM per_supp
    )
    SELECT p.l_suppkey, p.supp_value
    FROM per_supp p, total t
    WHERE p.supp_value > t.total_value * 0.011
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against a global-scalar fraction — keep
    suppliers whose lineitem value exceeds 1.1% of the total. The global
    scalar is the same aggregate re-reduced, joined back as a one-row
    broadcast (Catalyst's rewrite of scalar subqueries, written out).

    Scale: one supplier-keyed shuffle with map-side combine; AQE reuses
    the exchange for the total; the threshold join is a literal
    comparison against a broadcast single row."""
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.round(F.col("l_extendedprice"), 2).cast("decimal(18,2)")).cast(
                "double"
            ),
            2,
        ).alias("supp_value")
    )
    total = per_supp.agg(
        F.sum(F.col("supp_value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value")
    )
    return (
        per_supp.join(F.broadcast(total))
        .filter(F.col("supp_value") > F.col("total_value") * 0.011)
        .select("l_suppkey", "supp_value")
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey,
               round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 2)
                     AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregated view + scalar-max filter — the
    top-revenue supplier for a quarter, ties preserved (all max-revenue
    suppliers survive, the spec's required tie semantics — NOT a limit 1).

    Scale: the revenue view is one combined shuffle; the max is a one-row
    broadcast; supplier joins broadcast. The quarter filter pushes to the
    lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
                    ).cast("decimal(18,2)")
                ).cast("double"),
                2,
            ).alias("total_revenue")
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        s.join(revenue, s.s_suppkey == revenue.l_suppkey)
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {sql_sum_fixed('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-AND predicate blocks spanning both join
    sides. Catalyst extracts the common join key and pushes the
    per-relation parts of each disjunct (brand/size to part, quantity to
    lineitem as an OR-range) into the scans; the residual disjunction
    evaluates post-join.

    Scale: the part side (brand-filtered by the union of disjuncts)
    broadcasts; nothing degenerates to a nested-loop join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    disj = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 50))
    )
    return j.filter(disj).agg(
        sum_fixed(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=4
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q21_waiting_orders",
    oracle="""
    SELECT l1.l_suppkey, CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS n_waiting
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
    )
    GROUP BY l1.l_suppkey
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: double-correlated EXISTS + NOT EXISTS on the same
    fact table — suppliers who were the LAST to ship in multi-supplier
    finished orders. Both correlations decorrelate to per-order aggregates
    (supplier count; max shipdate of OTHER suppliers), computed once and
    re-joined — three shuffles on orderkey total, instead of two
    nested-loop correlations.

    The NOT EXISTS becomes: no other supplier shipped later ⇔ this row's
    shipdate equals the order's max shipdate AND (single tie-holder ⇔ the
    max is held only by this supplier). Computed via per-(order, supplier)
    max vs per-order max over others: max_other = max over the order
    excluding rows of this supplier, derived from the top-2 distinct
    (shipdate, suppkey) pairs per order."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li_f = li.join(o, li.l_orderkey == o.o_orderkey).drop("o_orderkey")
    per_order = li_f.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.max("l_shipdate").alias("max_ship"),
    )
    # per (order, supplier): my latest shipment
    per_os = li_f.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("my_max")
    )
    # max shipdate among OTHER suppliers = max over per_os rows of the
    # order excluding mine: top-2 my_max values per order suffice
    from pyspark.sql import Window as W

    w = W.partitionBy("l_orderkey").orderBy(F.col("my_max").desc())
    top2 = (
        per_os.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .groupBy("l_orderkey")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("my_max"))).alias("m1"),
            F.max(F.when(F.col("rk") == 1, F.col("l_suppkey"))).alias("s1"),
            F.max(F.when(F.col("rk") == 2, F.col("my_max"))).alias("m2"),
        )
    )
    cand = (
        per_os.join(per_order, "l_orderkey")
        .join(top2, "l_orderkey")
        .filter(F.col("n_supp") >= 2)  # EXISTS other supplier
        .withColumn(
            "max_other",
            F.when(F.col("l_suppkey") == F.col("s1"), F.col("m2")).otherwise(
                F.col("m1")
            ),
        )
        # NOT EXISTS other-supplier-later ⇔ my latest >= every other's
        .filter(F.col("my_max") >= F.col("max_other"))
    )
    return cand.groupBy("l_suppkey").agg(
        F.countDistinct("l_orderkey").alias("n_waiting")
    )
