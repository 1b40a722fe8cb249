"""Independent pins for the stats2 batch: Welch's t against a direct
numpy computation, the two-feature OLS against numpy lstsq, and the
Markov stationary iteration against a plain python replay — the same
third-implementation discipline kmeans/SSSP/PAVA use (the DuckDB oracle
is the second engine; these pins are the third, algorithm-independent
formulation)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from etl_cotrip_signs_spark.operators.stats2 import (
    events_markov_stationary,
    events_retention_matrix,
    stats_welch_ttest,
    trend_ols_two_features,
)

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_pdf():
    return pd.read_parquet(f"{SF_SMALL}/events.parquet")


def test_welch_matches_direct_numpy(spark, events_pdf):
    row = stats_welch_ttest(spark, SF_SMALL).toPandas().iloc[0]
    arms = {}
    for name, t in (("a", "purchase"), ("b", "click")):
        x = np.floor(
            events_pdf.loc[events_pdf.event_type == t, "value"].to_numpy() * 1000
        ).astype(np.int64)
        arms[name] = (len(x), x.mean(), x.var(ddof=1))
    (na, ma, va), (nb, mb, vb) = arms["a"], arms["b"]
    t_direct = (ma - mb) / math.sqrt(va / na + vb / nb)
    dof_direct = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    assert row["n_a"] == na and row["n_b"] == nb
    # direct float formulation differs only by rounding order
    assert abs(row["t_stat"] - t_direct) < 1e-9
    assert abs(row["welch_dof"] - dof_direct) < 1e-6


def test_ols_matches_numpy_lstsq(spark, events_pdf):
    out = trend_ols_two_features(spark, SF_SMALL).toPandas()
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    for _, r in out.iterrows():
        g = li[li.l_returnflag == r["l_returnflag"]]
        x1 = g.l_quantity.to_numpy().astype(np.int64)
        x2 = np.floor(g.l_discount.to_numpy() * 1000).astype(np.int64)
        y = np.floor(g.l_extendedprice.to_numpy() * 100).astype(np.int64)
        A = np.column_stack([np.ones_like(x1), x1, x2]).astype(float)
        beta = np.linalg.lstsq(A, y.astype(float), rcond=None)[0]
        assert abs(r["beta_qty"] - beta[1]) < 1e-6 * max(1, abs(beta[1]))
        assert abs(r["beta_disc"] - beta[2]) < 1e-6 * max(1, abs(beta[2]))


def test_markov_matches_python_replay(spark, events_pdf):
    got = {
        r["event_type"]: r["rank_ppm"]
        for _, r in events_markov_stationary(spark, SF_SMALL).toPandas().iterrows()
    }
    ev = events_pdf.sort_values(["user_id", "ts", "event_id"])
    trans: dict[tuple[str, str], int] = {}
    for _, g in ev.groupby("user_id"):
        seq = g.event_type.tolist()
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    outs: dict[str, int] = {}
    for (a, _), n in trans.items():
        outs[a] = outs.get(a, 0) + n
    states = sorted(events_pdf.event_type.unique())
    rank = {s: 1_000_000 // len(states) for s in states}
    for _ in range(4):
        nxt: dict[str, int] = {}
        for (a, b), n in trans.items():
            nxt[b] = nxt.get(b, 0) + (rank.get(a, 0) * n) // outs[a]
        rank = nxt
    assert got == rank


def test_retention_cells_are_consistent(spark):
    pdf = events_retention_matrix(spark, SF_SMALL).toPandas()
    # offset-0 cell is the whole cohort by definition
    base = pdf[pdf.week_offset == 0]
    assert (base.n_active == base.cohort_users).all()
    assert (base.retention_ppm == 1_000_000).all()
    assert (pdf.week_offset >= 0).all()
    assert (pdf.n_active <= pdf.cohort_users).all()
