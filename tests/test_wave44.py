"""Pins for wave 44: k-truss defining property + subset relations, and
the exponential mechanism's Gumbel-max replay."""

from __future__ import annotations

import math

import pandas as pd

from etl_cotrip_signs_spark.operators.graph import _TRUSS_K, graph_k_truss
from etl_cotrip_signs_spark.operators.ops_audit import privacy_dp_exponential

from .conftest import SF_SMALL


def test_k_truss_defining_property(spark):
    out = graph_k_truss(spark, SF_SMALL).toPandas()
    assert len(out) > 0, "fixture similarity graph should contain a 4-truss"
    # defining property: every surviving edge closes >= k-2 triangles
    # WITHIN the truss (support was recomputed on the final edge set)
    assert (out.support >= _TRUSS_K - 2).all()
    # the truss is a subgraph of the base similarity graph
    from etl_cotrip_signs_spark.operators.similarity import (
        similarity_threshold_pairs,
    )

    base = {
        (r.vec_a, r.vec_b)
        for r in similarity_threshold_pairs(spark, SF_SMALL)
        .select("vec_a", "vec_b")
        .collect()
    }
    assert {(r.s, r.d) for r in out.itertuples()} <= base
    # closed under one more peel: recount triangles within the truss and
    # confirm no edge falls below threshold (fixpoint reached)
    edges = {(r.s, r.d) for r in out.itertuples()}
    sup: dict[tuple, int] = {}
    nodes = sorted({v for e in edges for v in e})
    es = set(edges)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if (x, y) not in es:
                continue
            for z in nodes:
                if z <= y:
                    continue
                if (y, z) in es and (x, z) in es:
                    for e in ((x, y), (y, z), (x, z)):
                        sup[e] = sup.get(e, 0) + 1
    for e in edges:
        assert sup.get(e, 0) >= _TRUSS_K - 2
        assert sup[e] == int(out.set_index(["s", "d"]).loc[e, "support"])


def test_dp_exponential_gumbel_replay(spark):
    out = privacy_dp_exponential(spark, SF_SMALL).toPandas()
    assert out.selected.sum() == 1  # exactly one winner
    # replay: winner = argmax of round(0.25*n + gumbel, 6) with key
    # tiebreak; rebuild gumbel from the score column itself
    ranked = out.sort_values(
        ["score", "o_orderpriority"], ascending=[False, True]
    )
    assert ranked.iloc[0].selected == 1
    assert (ranked.iloc[1:].selected == 0).all()
    # gumbel component is finite and the score is utility-dominated for
    # large count gaps: reconstruct g = score - 0.25*n, must be sane
    g = out.score - 0.25 * out.n_exact
    assert g.apply(math.isfinite).all()
    assert (g.abs() < 20).all()  # Gumbel(0,1) tail bound, loose
