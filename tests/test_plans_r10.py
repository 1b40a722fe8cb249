"""Physical-plan pins for the round-10 wave operators: the
scale-critical shapes that make them 100 TB-safe must hold.

The recurring discipline: metadata-side joins stay broadcast (never
SortMergeJoin), per-event windows stay PARTITIONED (the only
unpartitioned windows run over bounded metadata tables — minute
buckets, value bins, a 1-row aggregate's explode), and the corpus
contributes a small constant number of scans (re-scanning beats caching
at 100 TB; each consumer is a reduction)."""

from __future__ import annotations

import re

from etl_cotrip_signs_spark import registry
from etl_cotrip_signs_spark.plans.explain import formatted_plan

from .conftest import SF_SMALL

registry.load_all()


def _specs(plan: str) -> list[str]:
    return re.findall(r"windowspecdefinition\([^)]*\)", plan)


def test_zonemap_pruning_all_joins_broadcast(spark):
    plan = formatted_plan(
        registry.QUERIES["layout_zonemap_pruning"](spark, SF_SMALL)
    )
    # zone/predicate/matched joins are all broadcast (the key-range frame
    # and predicate table are 1-to-4-row metadata); a shuffle join
    # anywhere here would mean the fact table got joined on the data path
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_watermark_lateness_per_event_window_is_bucket_partitioned(spark):
    plan = formatted_plan(
        registry.QUERIES["events_watermark_lateness"](spark, SF_SMALL)
    )
    specs = _specs(plan)
    # exactly one window runs over per-event rows and it is PARTITIONED
    # by the minute bucket (spec leads with b#..., then arr_us ordering);
    # the only bucket-ordered global window runs over the bucket table
    assert any(
        s.startswith("windowspecdefinition(b#") and "arr_us#" in s
        for s in specs
    ), specs
    # no window orders the corpus globally by arrival without a partition
    assert not any(
        s.startswith("windowspecdefinition(arr_us#") for s in specs
    ), specs
    assert "SortMergeJoin" not in plan, plan


def test_fisher_exact_explode_sits_above_one_row_aggregate(spark):
    plan = formatted_plan(
        registry.QUERIES["stat_fisher_exact"](spark, SF_SMALL)
    )
    # the support explode (Generate) consumes the 1-row margins
    # aggregate, never the corpus: Generate appears above HashAggregate
    # in the operator list, and the corpus is scanned a bounded number
    # of times
    assert "Generate" in plan and "HashAggregate" in plan, plan
    assert plan.count("Scan parquet") <= 2, plan


def test_pacf_lag_windows_run_over_daily_table(spark):
    plan = formatted_plan(registry.QUERIES["trend_pacf_daily"](spark, SF_SMALL))
    specs = _specs(plan)
    # every lag window orders the calendar-bounded day_x series
    assert specs and all("day_x#" in s for s in specs), specs
    assert plan.count("Scan parquet") <= 2, plan


def test_granger_lag_window_over_daily_table(spark):
    plan = formatted_plan(
        registry.QUERIES["events_granger_lag1"](spark, SF_SMALL)
    )
    specs = _specs(plan)
    assert specs and all("day_x#" in s for s in specs), specs
    assert plan.count("Scan parquet") <= 2, plan


def test_jonckheere_prefix_windows_over_bin_table(spark):
    plan = formatted_plan(
        registry.QUERIES["stat_jonckheere_terpstra"](spark, SF_SMALL)
    )
    specs = _specs(plan)
    # all five cumulative windows order the bounded hundred-dollar bins
    assert specs and all("bin#" in s for s in specs), specs
    assert plan.count("Scan parquet") <= 2, plan


def test_kl_source_divergence_windows_partition_by_marginals(spark):
    plan = formatted_plan(
        registry.QUERIES["text_kl_source_divergence"](spark, SF_SMALL)
    )
    specs = _specs(plan)
    # the token and source marginals are PARTITIONED window sums over the
    # vocab table; only the single global-total window is unpartitioned
    assert any(s.startswith("windowspecdefinition(t#") for s in specs), specs
    assert any(
        s.startswith("windowspecdefinition(source#") for s in specs
    ), specs
    assert plan.count("Scan parquet") <= 2, plan
