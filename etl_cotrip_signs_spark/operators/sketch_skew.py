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
