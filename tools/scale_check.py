#!/usr/bin/env python
"""10x scale check: replicate the sf0.1 tables tenfold (~sf1: 6M lineitem,
50k documents) and time queries at 1x vs 10x.

The point is the GROWTH RATE, not the absolute seconds: a scale-safe plan
grows ~linearly in rows (modulo fixed job overhead amortizing away); a
pair-quadratic or recompute-prone plan jumps superlinearly. Results are
recorded in SCALE.md / SCALE_r{N}.json.

Round-5 methodology changes:
- Default query set = the FULL bench headline list (bench.HEADLINE), so the
  100x-readiness claim has a standing measured artifact per round.
- Each query runs in a FRESH SparkSession (x1 and x10 back-to-back inside
  it): round 5 measured that accumulated session state inflates later
  timings 2-5x (even the constant-work calibration read 0.271 vs 0.108),
  which would corrupt exactly the cross-query comparisons this tool exists
  to make. Per-query session restart costs ~3 s and removes the bias.

Usage:
  python tools/scale_check.py [--base DIR] [--queries a,b,c] [--out FILE]
Prints one JSON line: {"queries": {name: {"x1": s, "x10": s, "ratio": r}},
"calibration": s} and, with --out, also writes it to FILE.
"""

from __future__ import annotations

import argparse
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

REPLICAS = 10
OFFSET = 100_000_000

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


def build_10x(spark, base: str, replicas: int = REPLICAS) -> str:
    """Replicate fact/doc tables ``replicas``x with offset ids; keep
    dimension keys consistent per replica (each replica is a
    self-consistent universe). Staged under the per-user 0o700 scratch
    root (session.scratch_dir), not a fixed world-writable /tmp path.
    Reused if already staged."""
    from etl_cotrip_signs_spark.session import scratch_dir

    out = scratch_dir(f"scale{replicas}x", base)
    done_marker = os.path.join(out, "_STAGED")
    if os.path.exists(done_marker):
        return out
    reps = spark.range(replicas).select(F.col("id").alias("__rep"))
    for table, ids in ID_COLS.items():
        src = spark.read.parquet(f"{base}/{table}.parquet")
        df = src
        if ids:
            df = src.crossJoin(F.broadcast(reps))
            for c in ids:
                df = df.withColumn(c, F.col(c) + F.col("__rep") * OFFSET)
            df = df.drop("__rep")
        if table == "events":
            # The streaming file source reads `{sf_dir}` with
            # pathGlobFilter=events.parquet — a glob over FILE names, so the
            # staged table must be a plain file like the testdata layout,
            # not a directory (a directory staged here silently streams 0
            # rows, which round 5 caught as an impossible 0.17x ratio).
            tmp = f"{out}/_events_tmp"
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(
                e for e in os.listdir(tmp) if e.endswith(".parquet")
            )
            target = f"{out}/events.parquet"
            if os.path.isdir(target):
                shutil.rmtree(target)
            shutil.move(os.path.join(tmp, part), target)
            shutil.rmtree(tmp)
            continue
        df.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
    open(done_marker, "w").write("staged\n")
    return out


def _run(spark, name: str, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        if df.isStreaming:  # pragma: no cover
            df.count()
        else:
            df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _calib(spark) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(50_000_000, numPartitions=32).select(
            F.avg(F.xxhash64("id"))
        ).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


# The radius-graph family's x1→x10 wall ratio is dominated by FIXTURE
# physics, not plan shape: replicating 10x more points into the same
# 100k x 100k coordinate grid densifies it ~100x in EDGES (every cell
# holds 10x points → ~100x within-radius pairs). Round 5 adjudicated the
# walk's 21.9x ratio that way from prose; the ladder now RECORDS the edge
# counts so the per-edge growth rate is a measured artifact.
RADIUS_GRAPH_QUERIES = {
    "graph_random_walk_xxh",
    "graph_minimum_spanning_forest",
    "graph_sssp_weighted",
    "graph_sssp_frontier",
    "graph_clustering_coefficient",
}


def _radius_edge_count(spark, sf_dir: str, memo: dict[str, int]) -> int:
    if sf_dir not in memo:
        from etl_cotrip_signs_spark.operators.graph import _msf_weighted_edges

        memo[sf_dir] = _msf_weighted_edges(spark, sf_dir).count()
    return memo[sf_dir]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset (default: bench.HEADLINE)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--replicas", type=int, default=REPLICAS,
                    help="replication factor for the big side (default 10; "
                    "use 100 for the x100 readiness run — VERDICT r6 task 4)")
    ap.add_argument("--keep-10x", action="store_true",
                    help="leave the staged big dir for a follow-up chunk")
    args = ap.parse_args()

    import bench

    names = args.queries.split(",") if args.queries else list(bench.HEADLINE)
    registry.load_all()

    spark = get_spark("scale-check")
    big = build_10x(spark, args.base, args.replicas)
    calibration = _calib(spark)
    spark.stop()

    try:
        results = {}
        edge_memo: dict[str, int] = {}
        for name in names:
            spark = get_spark("scale-check")
            # warm the fresh session once (JVM codegen + parquet footers)
            registry.QUERIES["q1_pricing_summary"](spark, args.base).write.format(
                "noop"
            ).mode("overwrite").save()
            x1 = _run(spark, name, args.base)
            x10 = _run(spark, name, big)
            bk = f"x{args.replicas}"
            results[name] = {
                "x1": x1,
                bk: x10,
                "ratio": round(x10 / x1, 2) if x1 else None,
            }
            if name in RADIUS_GRAPH_QUERIES:
                e1 = _radius_edge_count(spark, args.base, edge_memo)
                e10 = _radius_edge_count(spark, big, edge_memo)
                results[name]["edges_x1"] = e1
                results[name][f"edges_x{args.replicas}"] = e10
                # wall growth divided by edge growth: ~1.0 means the plan
                # scaled linearly in the quantity that actually grew
                if x1 and e1 and e10:
                    results[name]["ratio_per_edge"] = round(
                        (x10 / x1) / (e10 / e1), 3
                    )
            print(
                f"# {name}: x1={x1}s {bk}={x10}s ratio={results[name]['ratio']}",
                file=sys.stderr,
                flush=True,
            )
            spark.stop()
            # flush partial results after every query: an x100 run can be
            # killed mid-ladder (the radius-graph family densifies
            # quadratically) without losing the completed entries
            if args.out:
                with open(args.out, "w") as f:
                    f.write(json.dumps(
                        {"replicas": args.replicas, "queries": results,
                         "calibration": calibration, "partial": True}
                    ) + "\n")
        payload = json.dumps(
            {
                "replicas": args.replicas,
                "queries": results,
                "calibration": calibration,
            }
        )
        print(payload)
        if args.out:
            with open(args.out, "w") as f:
                f.write(payload + "\n")
    finally:
        if not args.keep_10x:
            # ~sf1 of parquet; don't leak it even when a timed query throws
            shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
