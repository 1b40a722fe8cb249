"""Pins for wave 51: modularity's exact-integer identity vs a pure-python
recomputation, kappa identities, and Hill estimator algebra."""

from __future__ import annotations

import math

import pandas as pd

from etl_cotrip_signs_spark.operators.graph import graph_modularity_score
from etl_cotrip_signs_spark.operators.robust_stats import (
    _HILL_K,
    orders_hill_tail_index,
)
from etl_cotrip_signs_spark.operators.stats3 import stat_cohens_kappa

from .conftest import SF_SMALL


def test_modularity_matches_python(spark):
    from etl_cotrip_signs_spark.operators.graph import graph_lpa_communities
    from etl_cotrip_signs_spark.operators.text import fuzzy_join_del1

    row = graph_modularity_score(spark, SF_SMALL).toPandas().iloc[0]
    labels = dict(
        graph_lpa_communities(spark, SF_SMALL)
        .select("name", "community")
        .collect()
    )
    edges = [
        (r.name_a, r.name_b)
        for r in fuzzy_join_del1(spark, SF_SMALL).collect()
    ]
    m = len(edges)
    assert row.m_edges == m
    ec: dict[str, int] = {}
    deg: dict[str, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        if labels[a] == labels[b]:
            ec[labels[a]] = ec.get(labels[a], 0) + 1
    dc: dict[str, int] = {}
    for node, d in deg.items():
        dc[labels[node]] = dc.get(labels[node], 0) + d
    q_scaled = sum(4 * m * ec.get(c, 0) - d * d for c, d in dc.items())
    assert row.q_scaled == q_scaled
    assert row.n_communities == len(dc)
    assert math.isclose(
        row.modularity, round(q_scaled / (4 * m * m), 6), abs_tol=1e-9
    )
    # modularity is bounded in [-1/2, 1)
    assert -0.5 <= row.modularity < 1.0


def test_kappa_identities(spark):
    row = stat_cohens_kappa(spark, SF_SMALL).toPandas().iloc[0]
    n, a, b, c, d = row.n, row.a, row.b, row.c, row.d
    assert n == a + b + c + d
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    assert math.isclose(row.kappa, round((po - pe) / (1 - pe), 6), abs_tol=1e-9)
    assert -1.0 <= row.kappa <= 1.0
    # both raters must fire on a nontrivial share of the fixture
    assert 0 < a + b < n and 0 < a + c < n


def test_hill_estimator_algebra(spark):
    row = orders_hill_tail_index(spark, SF_SMALL).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    cents = sorted(
        (math.floor(v * 100) for v in orders.o_totalprice), reverse=True
    )
    assert row.k == _HILL_K
    assert row.x_ref_cents == cents[_HILL_K]  # the (k+1)-th largest
    s = sum(
        math.floor(math.log(x / cents[_HILL_K]) * 1_000_000)
        for x in cents[:_HILL_K]
    )
    assert row.sum_ln_micro == s
    assert math.isclose(
        row.hill_alpha, round(1_000_000 * _HILL_K / s, 6), abs_tol=1e-9
    )
    assert row.hill_alpha > 0
