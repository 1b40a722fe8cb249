"""Partitioning-invariance: results must not depend on the physical
partitioning — the property that makes local[32] results transfer to a
1000-executor cluster.

Each sampled query runs under the session default (32 shuffle
partitions) and again under a deliberately hostile layout (7 shuffle
partitions + tiny scan splits, so every scan fragments and every shuffle
re-buckets differently); the canonicalized results must be identical.
Queries chosen to cover the operator families where partitioning bugs
actually hide: aggregation (partial/final merge), window top-k
(per-partition WindowGroupLimit), iterative label propagation, posting
self-joins, TakeOrderedAndProject merge, and the deterministic sampler.
"""

from __future__ import annotations

import pytest

from etl_cotrip_signs_spark import registry

from .conftest import SF_SMALL

registry.load_all()

QUERIES = [
    "q1_pricing_summary",
    "window_topk_orders_per_cust",
    "sort_topk_orders",
    "dedup_ngram_jaccard",
    "dedup_components_ngram",
    "sample_weighted_reservoir",
    "agg_salted_skew",
    # round-4c families: per-key window chains, pointer doubling (range
    # exchange boundaries re-sample under re-execution), bucket selection
    # (driver-side prefix sums), the layout-independence-claiming Merkle
    # summary, and the two-pass global numbering
    "events_ewma_dyadic",
    "hierarchy_closure_doubling",
    "kth_statistic_iterative",
    "table_merkle_summary",
    "global_row_number_two_pass",
    # round-5 late waves: synchronous LPA (per-node top-1 tie rule must
    # not depend on which partition counts first), PPJoin (prefix ranks
    # come from a doc-partitioned window over a shuffled frequency join),
    # the loop-free isotonic fit (suffix-min window over the pair table),
    # the BPE tokenizer (mapInPandas batch boundaries move under hostile
    # splits; per-batch memos must not change results), and Holt smoothing
    # (single-group applyInPandas must re-sort its rows, not trust arrival
    # order)
    "graph_lpa_communities",
    "dedup_ppjoin_prefix",
    "isotonic_regression_daily",
    "text_bpe_apply",
    "orders_holt_linear",
    # round-5 continuation-2 families: IBLT (xor-cell build is a
    # combinable aggregate whose peel must not depend on which partition
    # built which cell), Borůvka MSF (per-component min-edge picks + the
    # pointer-jump contraction loop must converge to the same forest
    # under re-bucketed rounds), Bellman-Ford (relax order must not
    # matter), the hashed feature encoder (explode + combinable signed
    # sums), LTTB (single-group applyInPandas must re-sort its series),
    # and the decision stump (histogram merge + single-partition window
    # over the bucket table)
    "sketch_iblt_diff",
    "graph_minimum_spanning_forest",
    "graph_sssp_weighted",
    "feature_hashing_trick",
    "orders_lttb_downsample",
    "ml_decision_stump_gini",
    # round-5 continuation-4 families: deterministic walks (the adjacency
    # row_number index must be id-ordered, not arrival-ordered), the KM
    # fold (array_sort before the sequential recurrence — collect_list
    # order is partitioning-dependent by contract), the item-item argmax
    # (window over a shuffled pair table), RAKE (prefix-window run ids +
    # phrase reassembly from sort_array, never collect order), the bitmap
    # rollup (bit_or merge across whatever partitions built the words),
    # and phrase search (posting adjacency joins under re-bucketing)
    "graph_random_walk_xxh",
    "orders_survival_km",
    "recsys_item_item_cosine",
    "text_rake_keywords",
    "agg_bitmap_distinct_rollup",
    "text_phrase_search",
]

HOSTILE = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": "65536",
    "spark.sql.files.openCostInBytes": "0",
}


def _canon(df):
    cols = sorted(df.columns)
    return sorted(map(str, (tuple(r[c] for c in cols) for r in df.collect())))


@pytest.mark.parametrize("name", QUERIES)
def test_partitioning_invariance(spark, name):
    fn = registry.QUERIES[name]
    baseline = _canon(fn(spark, SF_SMALL))
    old = {k: spark.conf.get(k, None) for k in HOSTILE}
    try:
        for k, v in HOSTILE.items():
            spark.conf.set(k, v)
        hostile = _canon(fn(spark, SF_SMALL))
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert baseline == hostile, (
        f"{name}: result depends on physical partitioning "
        f"({len(baseline)} vs {len(hostile)} canonical rows)"
    )
