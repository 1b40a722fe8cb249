"""Densification-free x10 scale probe for graph_k_truss (VERDICT r8 item 4).

The generic scale_check replication copies each embedding VERBATIM (same
vector, same label), so replicas of neighboring vectors form cosine-1.0
cliques across replicas — the similarity graph densifies ~100x in EDGES for
10x rows, and the r8 ladder's 10.3x wall ratio measured that fixture
physics, not the peel. This probe replicates embeddings with a
REPLICA-QUALIFIED label (label + replica * 1000): same-label pairs can only
form within a replica, so the edge set grows EXACTLY 10x and the x1->x10
wall ratio finally measures the plan — two equi-joins + one agg per peel
round over the surviving edge set.

Usage: python tools/truss_scale.py [--base DIR] [--out FILE]
Prints one JSON line with walls, edge counts, and the per-edge ratio.
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
LABEL_OFFSET = 1000


def stage(spark, base: str, replicas: int = REPLICAS) -> str:
    from etl_cotrip_signs_spark.session import scratch_dir

    out = scratch_dir(f"truss{replicas}x", base)
    marker = os.path.join(out, "_STAGED")
    if os.path.exists(marker):
        return out
    reps = spark.range(replicas).select(F.col("id").alias("__rep"))
    src = spark.read.parquet(f"{base}/embeddings.parquet")
    (
        src.crossJoin(F.broadcast(reps))
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * OFFSET)
        .withColumn("label", F.col("label") + F.col("__rep") * LABEL_OFFSET)
        .drop("__rep")
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )
    open(marker, "w").write("staged\n")
    return out


def run_once(spark, sf_dir: str, query: str) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = registry.QUERIES[query](spark, sf_dir).count()
    return time.perf_counter() - t0, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--query", default="graph_k_truss",
                    help="any similarity-graph query (graph_k_truss, "
                    "graph_densest_subgraph_peel)")
    ap.add_argument("--replicas", type=int, default=REPLICAS)
    args = ap.parse_args()
    registry.load_all()

    spark = get_spark("truss-scale")
    big = stage(spark, args.base, args.replicas)
    from etl_cotrip_signs_spark.operators.similarity import (
        similarity_threshold_pairs,
    )

    e1 = similarity_threshold_pairs(spark, args.base).count()
    eN = similarity_threshold_pairs(spark, big).count()
    spark.stop()

    bk = f"x{args.replicas}"
    try:
        spark = get_spark("truss-scale")
        w1 = min(run_once(spark, args.base, args.query)[0] for _ in range(2))
        t1 = run_once(spark, args.base, args.query)[1]
        spark.stop()
        spark = get_spark("truss-scale")
        wN, tN = run_once(spark, big, args.query)
        spark.stop()
        ratio = round(wN / w1, 2)
        payload = json.dumps(
            {
                "query": args.query,
                "replication": "replica-qualified labels (no cross-replica edges)",
                "edges_x1": e1,
                f"edges_{bk}": eN,
                "edge_ratio": round(eN / e1, 2),
                "rows_x1": t1,
                f"rows_{bk}": tN,
                "x1": round(w1, 2),
                bk: round(wN, 2),
                "ratio": ratio,
                "ratio_per_edge": round(ratio / (eN / e1), 3),
            }
        )
        print(payload)
        if args.out:
            open(args.out, "w").write(payload + "\n")
    finally:
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
