"""Skew-mitigation and mergeable-sketch queries [EXT beyond task.ts —
engine surface: the scale-out answers for hot keys and two-pass distinct].

- ``agg_salted_skew`` makes the salted two-phase aggregation
  (functions/skew.py) driver-visible: l_returnflag has 3 values over the
  whole fact table — the textbook hot-key shape where one reducer would
  absorb a third of 100 TB. Salting spreads each key over 16 partials;
  because the summed measures are DECIMAL, the two-phase result is
  bit-identical to the plain GROUP BY the oracle runs (double sums would
  not be: float addition is order-sensitive, decimal addition is not).

- ``agg_hll_mergeable`` exercises Spark's DataSketches HLL column type:
  per-group sketches that MERGE (hll_union_agg) into a global sketch
  without rescanning — the property that lets 100 TB distinct-counts be
  maintained incrementally per partition/day and rolled up on demand.
  Rows-only: DuckDB's HLL implementation yields different estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.skew import salted_agg
from ..io import load_table
from ..registry import query


@query(
    "agg_salted_skew",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_items,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_qty,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over a 3-value hot key, hash-equal to
    the plain GROUP BY (exact DECIMAL partials make merge order moot)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(18,2)").alias("qty_dec"),
        "l_extendedprice",
    )
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "n_items": ("count", "l_returnflag"),
            "sum_qty_dec": ("sum", "qty_dec"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
        },
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        "n_items",
        F.round(F.col("sum_qty_dec").cast("double"), 2).alias("sum_qty"),
        F.round("min_price", 2).alias("min_price"),
        F.round("max_price", 2).alias("max_price"),
    )


@query("agg_hll_mergeable")  # rows-only: DataSketches estimates are Spark-specific
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-priority HLL sketches of
    o_custkey, estimated per group AND unioned into a corpus-wide sketch
    — the global estimate comes from merging the 5 group sketches, not
    from a second scan. Deterministic for fixed input (no sampling)."""
    o = load_table(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).select(F.lit("ALL").alias("o_orderpriority"), F.col("est"), F.lit(None).cast("long").alias("n_orders"))
    per_group_est = per_group.select(
        "o_orderpriority",
        F.hll_sketch_estimate("sk").alias("est"),
        "n_orders",
    )
    return per_group_est.unionByName(
        merged.select("o_orderpriority", "est", "n_orders")
    ).select(
        "o_orderpriority",
        F.col("est").cast("long").alias("approx_distinct_custkeys"),
        "n_orders",
    )


@query(
    "udaf_trimmed_mean",
    # Deterministic trimmed mean: per group, order by (value, orderkey),
    # drop floor(n/10) rows at each end, average the integer-cents of the
    # rest — both engines sum exact cents over the identical row subset.
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey
               ) AS rn,
               count(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
    )
    SELECT o_orderpriority,
           CAST(max(n) AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                 / count(*) / 100, 4) AS trimmed_mean
    FROM ranked
    WHERE rn > CAST(floor(n / 10) AS BIGINT)
      AND rn <= n - CAST(floor(n / 10) AS BIGINT)
    GROUP BY o_orderpriority
    """,
)
def udaf_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via GROUPED_AGG pandas_udf (the batch UDAF API):
    10% trimmed mean of order totals per priority. The trim needs a
    per-group sort — not expressible as a builtin aggregate — so the group
    arrives as an Arrow batch and numpy does the order statistics. Exact
    integer-cents summation keeps the result bit-identical to the SQL
    oracle's window formulation."""
    import pandas as pd
    from pyspark.sql import types as T

    # explicit GROUPED_AGG: module-level `from __future__ import annotations`
    # stringifies the hints, defeating signature-based inference
    @F.pandas_udf(T.DoubleType(), F.PandasUDFType.GROUPED_AGG)
    def trimmed_mean(price, key):
        df = pd.DataFrame({"p": price, "k": key}).sort_values(["p", "k"])
        n = len(df)
        cut = n // 10
        kept = df.iloc[cut : n - cut]["p"]
        cents = (kept * 100).round().astype("int64").sum()
        return round(float(cents) / len(kept) / 100, 4)

    o = load_table(spark, sf_dir, "orders")
    # a GROUPED_AGG UDF cannot share an agg() with builtin aggregates —
    # two aggs over the same grouping, joined on the (5-value) key
    counts = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.count(F.lit(1)) - 2 * F.floor(F.count(F.lit(1)) / 10)).alias("n_kept"),
    )
    means = o.groupBy("o_orderpriority").agg(
        trimmed_mean("o_totalprice", "o_orderkey").alias("trimmed_mean")
    )
    return counts.join(means, "o_orderpriority").select(
        "o_orderpriority", "n_orders", "n_kept", "trimmed_mean"
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT l.l_returnflag, o.o_orderpriority,
           count(*) AS n,
           round(CAST(sum(CAST(round(l.l_extendedprice, 2) AS DECIMAL(18,2)))
                 AS DOUBLE), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag, o.o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew JOIN: the fact side's join key is salted into
    ``SALT`` sub-keys and the (small, filtered) build side is replicated
    once per salt value — the manual form of AQE's skew-join split, usable
    when one key dominates so heavily that even AQE's partition splitting
    leaves a straggler (or on engines/paths where AQE cannot apply, e.g.
    inside some streaming joins). Result is hash-equal to the plain join:
    salting only re-routes rows, it never changes the match set.

    At 100 TB: the replicated side costs |build| × SALT rows of shuffle —
    chosen only for build sides small enough that broadcast would almost
    apply; the probe side's hot key spreads over SALT reducers instead of
    one straggler."""
    SALT = 8
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderpriority")
    # probe side: deterministic salt from the row's own content
    li_salted = li.withColumn(
        "__salt", (F.pmod(F.xxhash64("l_orderkey", "l_returnflag", "l_extendedprice"), F.lit(SALT))).cast("int")
    )
    # build side: one replica per salt value (explode a literal range)
    o_rep = o.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    )
    joined = li_salted.join(o_rep, (li_salted.l_orderkey == o_rep.o_orderkey) & (li_salted.__salt == o_rep.__salt))
    return joined.groupBy("l_returnflag", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.round(F.col("l_extendedprice"), 2).cast("decimal(18,2)")).cast("double"),
            2,
        ).alias("revenue"),
    )
