"""Focused pins for the round-10 optimization rework.

Each test pins an operator-internal equivalence or plan property that the
r10 optimization relies on, so a later edit cannot silently reintroduce
the removed work or break the algebra the speedup leans on:

- k-core ladder NESTING: each rung of graph_kcore peels the previous
  rung's surviving edge list; correct only because cores nest — pinned by
  comparing every ladder rung against a from-scratch peel of the full
  graph.
- SSSP convergence detector: the (count, sum) fixpoint test must stop at
  the same distances as the frontier variant (both share one oracle).
- MinHash band self-join: the band-candidate join must stay a BROADCAST
  join (the r10 band-checkpoint experiment degraded it to a shuffle
  strategy under density, 1.31 -> 2.99 normalized on the 10x probe, and
  was reverted — this pin catches any future materialization that loses
  the inline plan's statistics the broadcast decision depends on).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_cotrip_signs_spark import registry
from etl_cotrip_signs_spark.plans.explain import formatted_plan

registry.load_all()

SF_SMALL = "/root/testdata/sf0.001"


def test_kcore_ladder_rungs_match_from_scratch_peels(spark):
    """Core nesting: the laddered graph_kcore profile must equal what a
    from-scratch peel of the FULL graph produces at every k."""
    from pyspark.sql import functions as F

    from etl_cotrip_signs_spark.operators.graph import kcore_nodes
    from etl_cotrip_signs_spark.operators.text import fuzzy_join_del1

    profile = {
        r["k"]: (r["n_nodes"], r["max_core_degree"])
        for r in registry.QUERIES["graph_kcore"](spark, SF_SMALL).collect()
    }
    pairs = fuzzy_join_del1(spark, SF_SMALL).localCheckpoint(eager=True)
    for k, (n_nodes, max_deg) in profile.items():
        scratch = kcore_nodes(pairs, k=k, src_col="name_a", dst_col="name_b")
        row = scratch.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.max("core_degree"), F.lit(0)).alias("m"),
        ).first()
        assert (row["n"], row["m"]) == (n_nodes, max_deg), (
            f"k={k}: ladder {(n_nodes, max_deg)} != scratch "
            f"{(row['n'], row['m'])}"
        )


def test_sssp_weighted_fixpoint_matches_frontier_variant(spark):
    """The monotone (count, sum) convergence detector must stop at the
    same distance table the frontier-optimized loop produces."""
    full = {
        r["id"]: r["dist_d2"]
        for r in registry.QUERIES["graph_sssp_weighted"](
            spark, SF_SMALL
        ).collect()
    }
    frontier = {
        r["id"]: r["dist_d2"]
        for r in registry.QUERIES["graph_sssp_frontier"](
            spark, SF_SMALL
        ).collect()
    }
    assert full == frontier and full


def test_minhash_band_join_stays_broadcast(spark):
    """The LSH band candidate self-join must plan as a broadcast join:
    the r10 band-checkpoint experiment showed that materializing the band
    table loses the statistics the broadcast decision rides on and the
    join degrades to a shuffle strategy (2.3x slower on the 10x density
    probe). Any re-materialization that reintroduces that shift fails
    here before it reaches a bench."""
    import re

    df = registry.QUERIES["dedup_minhash_docs"](spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    # ADVICE r10: scope the assertion to the band self-join subtree (the
    # only join keyed on band_hash) instead of a global SMJ ban — an
    # unrelated join legitimately planning as SMJ at another scale or AQE
    # setting must not fail this pin.
    band_joins = [
        b
        for b in re.split(r"\n\(\d+\) ", plan)
        if "Join" in b.split("\n", 1)[0] and "band_hash" in b
    ]
    assert band_joins, plan  # the band join must exist
    for b in band_joins:
        head = b.split("\n", 1)[0]
        assert head.startswith("BroadcastHashJoin"), b


def test_densest_peel_edge_count_identity(spark):
    """ne == sum(deg) / 2 — the identity the folded peel-loop aggregate
    relies on — holds on the live similarity edge list."""
    from pyspark.sql import functions as F

    from etl_cotrip_signs_spark.operators.similarity import (
        similarity_threshold_pairs,
    )

    edges = similarity_threshold_pairs(spark, SF_SMALL).select(
        F.col("vec_a").alias("s"), F.col("vec_b").alias("d")
    )
    ne = edges.count()
    deg = (
        edges.select(F.col("s").alias("v"))
        .unionAll(edges.select(F.col("d").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    sig = deg.agg(F.sum("deg").alias("sum_deg")).first()
    assert int(sig["sum_deg"]) == 2 * ne
