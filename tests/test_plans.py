"""Physical-plan assertions: the scale-critical properties must hold.

These tests pin the *shape* of the plans, not their results: dimension
joins stay broadcast, scan-level filters push into parquet, hot paths stay
inside whole-stage codegen, and top-k compiles to TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_cotrip_signs_spark import registry
from etl_cotrip_signs_spark.io import load_table
from etl_cotrip_signs_spark.plans.explain import (
    assert_broadcast_join,
    assert_pushed_filters,
    assert_wholestage_codegen,
    formatted_plan,
    plan_has,
)

from .conftest import SF_SMALL

registry.load_all()


def test_q5_broadcasts_dimensions(spark):
    df = registry.QUERIES["q5_regional_revenue"](spark, SF_SMALL)
    plan = formatted_plan(df)
    # customer/nation/region joins are all broadcast; only lineitem⋈orders
    # is allowed to be a shuffle join.
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert_wholestage_codegen(df)


def test_q1_filter_pushes_to_parquet_scan(spark):
    df = registry.QUERIES["q1_pricing_summary"](spark, SF_SMALL)
    assert_pushed_filters(df)
    assert_wholestage_codegen(df)


def test_projection_prunes_scan_columns(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    plan = formatted_plan(li)
    assert "l_extendedprice" not in plan, plan  # pruned at the scan


def test_topk_uses_take_ordered(spark):
    df = registry.QUERIES["sort_topk_orders"](spark, SF_SMALL)
    assert plan_has(df, "TakeOrderedAndProject"), formatted_plan(df)


def test_theta_band_join_is_broadcast_nested_loop(spark):
    df = registry.QUERIES["join_theta_price_band"](spark, SF_SMALL)
    assert_broadcast_join(df)


def test_semi_join_stays_semi(spark):
    df = registry.QUERIES["join_semi_customers"](spark, SF_SMALL)
    assert plan_has(df, "LeftSemi"), formatted_plan(df)


def test_knn_broadcasts_query_side(spark):
    df = registry.QUERIES["knn_exact_cosine"](spark, SF_SMALL)
    assert_broadcast_join(df)


def test_partial_aggregation_present(spark):
    # groupBy compiles to partial (map-side) + final hash aggregate.
    df = (
        load_table(spark, SF_SMALL, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"))
    )
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2, plan


def test_lsh_candidates_shuffle_ids_only(spark):
    """The LSH candidate plan's load-bearing properties: (a) both self-join
    branches read the SAME checkpointed bucket RDD (the pandas-UDF stage
    runs once), and (b) no Exchange moves embedding arrays — candidate
    shuffles carry bare ids."""
    import re

    from etl_cotrip_signs_spark.operators.similarity import _label_lsh_candidates

    e = load_table(spark, SF_SMALL, "embeddings")
    plan = formatted_plan(_label_lsh_candidates(e).select("vec_a", "vec_b"))

    rdd_ids = re.findall(r"MapPartitionsRDD\[(\d+)\]", plan)
    assert len(rdd_ids) >= 2 and len(set(rdd_ids)) == 1, plan

    for m in re.finditer(r"\(\d+\) Exchange\n((?:.+\n){1,3})", plan):
        assert "embedding" not in m.group(1), m.group(1)
