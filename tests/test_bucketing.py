"""Bucketed co-located join: the no-shuffle fact-fact join strategy.

At 100 TB the lineitem⋈orders sort-merge shuffle is the dominant cost;
bucketing both tables by the join key at write time removes the exchange
entirely. This test proves the property on the real plan: the bucketed
join has NO shuffle on either side.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_cotrip_signs_spark.io import load_table
from etl_cotrip_signs_spark.plans.explain import formatted_plan

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # external tables with explicit tmp paths — no warehouse-dir dependency
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    li = load_table(spark, SF_SMALL, "lineitem")
    o = load_table(spark, SF_SMALL, "orders")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{warehouse}/li_bucketed")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{warehouse}/o_bucketed")
        .mode("overwrite")
        .saveAsTable("o_bucketed")
    )
    yield "li_bucketed", "o_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try:
        joined = (
            spark.table(li_t)
            .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("s"))
        )
        plan = formatted_plan(joined)
        # co-located: the join itself introduces no shuffle; the only
        # exchange allowed is the final small groupBy
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange" not in join_section, join_section
        # and results are still correct
        expected = (
            load_table(spark, SF_SMALL, "lineitem")
            .join(
                load_table(spark, SF_SMALL, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("s"))
        )
        got = {(r["o_orderpriority"], round(r["s"], 2)) for r in joined.collect()}
        want = {(r["o_orderpriority"], round(r["s"], 2)) for r in expected.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_composite_key_bucketed_partsupp_join_no_exchange(spark, tmp_path_factory):
    """q9's scale claim, proven on the real plan: bucketing the derived
    partsupp AND lineitem by the COMPOSITE (partkey, suppkey) key makes
    their two-column equi join exchange-free on both sides. (The live q9
    reads plain parquet and shuffles; this is the materialized-layout
    variant a production deployment would run.)"""
    from etl_cotrip_signs_spark.operators.tpch_final import derived_partsupp

    warehouse = str(tmp_path_factory.mktemp("warehouse_ps"))
    ps = derived_partsupp(spark, SF_SMALL)
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    spark.sql("DROP TABLE IF EXISTS ps_bucketed")
    spark.sql("DROP TABLE IF EXISTS li2_bucketed")
    (
        ps.write.bucketBy(8, "ps_partkey", "ps_suppkey")
        .sortBy("ps_partkey", "ps_suppkey")
        .option("path", f"{warehouse}/ps_bucketed")
        .mode("overwrite")
        .saveAsTable("ps_bucketed")
    )
    (
        li.write.bucketBy(8, "l_partkey", "l_suppkey")
        .sortBy("l_partkey", "l_suppkey")
        .option("path", f"{warehouse}/li2_bucketed")
        .mode("overwrite")
        .saveAsTable("li2_bucketed")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li2_bucketed").join(
            spark.table("ps_bucketed"),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        ).select(
            (F.col("l_extendedprice") - F.col("ps_supplycost") * F.col("l_quantity"))
            .alias("margin")
        )
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()  # every lineitem pair exists in ps
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS ps_bucketed")
        spark.sql("DROP TABLE IF EXISTS li2_bucketed")
