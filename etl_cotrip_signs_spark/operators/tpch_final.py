"""TPC-H-shape completion: q8 / q9 / q16 / q20 [EXT beyond task.ts —
engine surface breadth; closes the last 4 of the 22 canonical shapes].

q8 needs no partsupp at all (prior rounds mis-filed it as blocked); it
runs verbatim on the fixture columns. q9/q16/q20 DO reference partsupp,
which the fixture lacks — they run against a DERIVED partsupp: the
distinct (l_partkey, l_suppkey) pairs observed in lineitem (exactly the
pairs real TPC-H lineitem is allowed to use) with ps_supplycost /
ps_availqty computed by fixed integer arithmetic on the two keys. Both
engines derive the identical relation from the identical parquet, so the
oracle comparison stays exact; no synthetic data is written anywhere.

Scale notes (100 TB): the derivation is one distinct over two fact
columns (map-side combinable; at production scale you'd materialize it
once as a bucketed table — see io_queries bucketing). Each query keeps
the canonical plan shape: dimension joins broadcast, fact-fact joins
shuffle on join keys only after pushed filters, correlated subqueries
decorrelated to aggregate+join (q20) exactly like q17's treatment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.money import sql_sum_fixed, sum_fixed
from ..io import load_table
from ..registry import query

# DuckDB twin of derived_partsupp(); interpolated into q9/q16/q20 oracles.
PARTSUPP_CTE = """
partsupp AS (
    SELECT ps_partkey,
           ps_suppkey,
           ((ps_partkey * 7 + ps_suppkey * 13) % 1000 + 100) / 100.0 AS ps_supplycost,
           (ps_partkey * 31 + ps_suppkey * 17) % 9999 + 1 AS ps_availqty
    FROM (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem
    )
)
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture's missing partsupp, derived deterministically.

    Pairs = distinct (l_partkey, l_suppkey) from lineitem — the honest
    dimension for the fixture, since lineitem references exactly these.
    supplycost/availqty are pure integer arithmetic on the keys (no
    randomness, no floats until the final /100.0), so Spark and DuckDB
    compute bit-identical values.
    """
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    pk, sk = F.col("ps_partkey"), F.col("ps_suppkey")
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        (((pk * 7 + sk * 13) % 1000 + 100) / F.lit(100.0)).alias("ps_supplycost"),
        ((pk * 31 + sk * 17) % 9999 + 1).alias("ps_availqty"),
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_6' THEN vol_d
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(sum(vol_d) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                    AS DECIMAL(18,4)) AS vol_d,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the deepest canonical join tree —
    8 relations, two roles for nation. Plan shape: part filter prunes the
    lineitem probe first (broadcast, most selective), then the
    fact-fact chain lineitem->orders shuffles on orderkey, and every
    dimension hop (supplier/customer/nation x2/region) is a broadcast.
    The share division happens once per group after exact DECIMAL sums.

    Fixture adaptation: p_type is a single word here ('ECONOMY' ~1/6 of
    parts); market nation NATION_6 is one of region AMERICA's five.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")

    cust_side = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            cust.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    vol = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust_side), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            .cast("decimal(18,4)")
            .alias("vol_d"),
            "nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("nation") == "NATION_6", F.col("vol_d")).otherwise(zero))
            .cast("double")
            / F.sum("vol_d").cast("double"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    WITH {PARTSUPP_CTE}
    SELECT nation, o_year,
           {sql_sum_fixed('amount', 4)} AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                 - ps.ps_supplycost * l.l_quantity AS amount
        FROM lineitem l
        JOIN partsupp ps
          ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit): lineitem joined to partsupp on the
    COMPOSITE (partkey, suppkey) key — the one canonical query exercising
    a two-column join key against the biggest dimension. Here partsupp is
    the derived relation (distinct fact pairs + arithmetic costs); the
    join itself shuffles both sides on the composite key, which at 100 TB
    is where bucketing partsupp by (partkey, suppkey) would delete the
    Exchange. part/supplier/nation/orders-date are broadcast or
    key-pruned as usual.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ps = derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")

    profit = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(orders.select("o_orderkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "nation",
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("ps_supplycost") * F.col("l_quantity")
            ).alias("amount"),
        )
    )
    return profit.groupBy("nation", "o_year").agg(
        sum_fixed(F.col("amount"), scale=4).alias("sum_profit")
    )


@query(
    "q16_supplier_part_counts",
    oracle=f"""
    WITH {PARTSUPP_CTE}
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps.ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): partsupp x part with a
    NOT IN supplier exclusion and COUNT(DISTINCT) over 3 grouping keys.
    Shape: the exclusion list is tiny -> broadcast LEFT ANTI join (never
    a shuffled NOT IN); the part predicate set (brand <>, type <>,
    size IN) prunes before the join; the distinct-count shuffles once on
    the grouping keys with partial distinct aggregation map-side.

    Fixture adaptation: the canonical '%Customer%Complaints%' comment
    filter has no comment column here — s_acctbal < 0 (6 of 100
    suppliers) keeps the anti-join shape with similar selectivity.
    """
    ps = derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin([1, 4, 7, 10, 13, 16, 19, 22])
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(excluded), ps.ps_suppkey == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_excess_availability",
    oracle=f"""
    WITH {PARTSUPP_CTE}
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT ps.ps_suppkey
        FROM partsupp ps
        WHERE ps.ps_partkey IN (
                  SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
              )
          AND ps.ps_availqty > (
                  SELECT 0.5 * sum(l.l_quantity)
                  FROM lineitem l
                  WHERE l.l_partkey = ps.ps_partkey
                    AND l.l_suppkey = ps.ps_suppkey
                    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
              )
    )
    """,
)
def q20_excess_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): nested IN + a CORRELATED
    scalar subquery over lineitem. Decorrelation (same treatment as q17):
    aggregate 1997 shipments once per (partkey, suppkey), inner-join to
    partsupp on the composite key (the correlated sum is NULL -> predicate
    false for pairs with no 1997 shipments, which inner join reproduces),
    filter availqty > 0.5*shipped, then a LEFT SEMI into supplier. The
    oracle keeps the correlated form, so this also cross-checks the
    decorrelation itself. Part filter is a broadcast semi join.
    """
    ps = derived_partsupp(spark, sf_dir)
    small_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty_1997"))
    )
    qualifying = (
        ps.join(F.broadcast(small_parts), ps.ps_partkey == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey) & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty_1997"))
        .select("ps_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(
        qualifying, supp.s_suppkey == F.col("ps_suppkey"), "left_semi"
    ).select("s_name", "s_acctbal")
