#!/usr/bin/env python
"""10x scale check: replicate the sf0.1 tables tenfold (~sf1: 6M lineitem,
50k documents) and time a representative query slice at 1x vs 10x.

The point is the GROWTH RATE, not the absolute seconds: a scale-safe plan
grows ~linearly in rows (modulo fixed job overhead amortizing away); a
pair-quadratic or recompute-prone plan jumps superlinearly. Results are
recorded in SCALE.md.

Usage: python tools/scale_check.py [base_sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line: {"queries": {name: {"x1": s, "x10": s, "ratio": r}},
"calibration": s}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from etl_cotrip_signs_spark import registry
from etl_cotrip_signs_spark.session import get_spark

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPLICAS = 10
OFFSET = 100_000_000

# One query per scale-critical family; chosen to stress the shuffles that
# dominate at 100 TB (fact agg, star join, posting self-join, banding,
# window top-k, global top-k).
QUERIES = [
    "q1_pricing_summary",
    "q5_regional_revenue",
    "q18_large_volume_customer",
    "sort_topk_orders",
    "window_topk_orders_per_cust",
    "dedup_exact_docs",
    "dedup_minhash_docs",
    "dedup_ngram_jaccard",
    "knn_exact_cosine",
    "text_token_stats",
    "sample_weighted_reservoir",
    "dedup_substring_spans",
    # round-4c families: per-key window chains, pointer-doubling closure,
    # bucket selection, sketch build+probe, bounded-frame median
    "events_ewma_dyadic",
    "events_cusum_drift",
    "hierarchy_closure_doubling",
    "kth_statistic_iterative",
    "sketch_cms_heavy_hitters",
    "window_rolling_median",
]

ID_COLS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build_10x(spark) -> str:
    """Replicate fact/doc tables 10x with offset ids; keep dimension keys
    intact (region/nation stay as-is; customer/supplier/part replicate so
    fact FKs resolve — original FK rows land in replica 0). Staged under
    the per-user 0o700 scratch root (session.scratch_dir), not a fixed
    world-writable /tmp path."""
    from etl_cotrip_signs_spark.session import scratch_dir

    out = scratch_dir("scale10x", BASE)
    reps = spark.range(REPLICAS).select(F.col("id").alias("__rep"))
    for table, ids in ID_COLS.items():
        src = spark.read.parquet(f"{BASE}/{table}.parquet")
        if not ids:
            src.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
            continue
        df = src.crossJoin(F.broadcast(reps))
        for c in ids:
            df = df.withColumn(c, F.col(c) + F.col("__rep") * OFFSET)
        df.drop("__rep").write.mode("overwrite").parquet(f"{out}/{table}.parquet")
    return out


def main() -> None:
    registry.load_all()
    spark = get_spark("scale-check")
    registry.QUERIES["q1_pricing_summary"](spark, BASE).write.format("noop").mode(
        "overwrite"
    ).save()
    big = build_10x(spark)

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(50_000_000, numPartitions=32).select(
            F.avg(F.xxhash64("id"))
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    try:
        results = {}
        for name in QUERIES:
            x1 = run(name, BASE)
            x10 = run(name, big)
            results[name] = {
                "x1": x1,
                "x10": x10,
                "ratio": round(x10 / x1, 2) if x1 else None,
            }
            print(f"# {name}: x1={x1}s x10={x10}s ratio={results[name]['ratio']}",
                  file=sys.stderr, flush=True)
        print(json.dumps({"queries": results, "calibration": calib()}))
        spark.stop()
    finally:
        # ~sf1 of parquet; don't leak it even when a timed query throws
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
