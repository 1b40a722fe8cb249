"""Pins for wave 33: W1 drift against scipy-free numpy integration and
the WOE/IV identities."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from etl_cotrip_signs_spark.operators.analytics import drift_wasserstein_exact
from etl_cotrip_signs_spark.operators.features import feature_woe_iv

from .conftest import SF_SMALL


def test_wasserstein_matches_numpy(spark):
    row = drift_wasserstein_exact(spark, SF_SMALL).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    a = np.floor(
        ev[ev.event_type == "click"].value.to_numpy() * 100
    ).astype(np.int64)
    b = np.floor(
        ev[ev.event_type == "purchase"].value.to_numpy() * 100
    ).astype(np.int64)
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    w1 = float(np.sum(np.abs(fa - fb)[:-1] * np.diff(grid)))
    assert row.n_a == len(a) and row.n_b == len(b)
    # exact floor of 1000*W1
    assert row.w1_centi_milli == math.floor(w1 * 1000 + 1e-9)


def test_woe_iv_identities(spark):
    out = feature_woe_iv(spark, SF_SMALL).toPandas()
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    bad = (orders.o_orderstatus == "F").astype(int)
    g_tot = int((1 - bad).sum())
    b_tot = int(bad.sum())
    assert out.n_good.sum() == g_tot
    assert out.n_bad.sum() == b_tot
    for _, r in out.iterrows():
        woe = math.log((r.n_good * b_tot) / (r.n_bad * g_tot))
        iv = (r.n_good / g_tot - r.n_bad / b_tot) * woe
        assert abs(r.woe - woe) < 1e-12
        assert abs(r.iv_term - iv) < 1e-12
        # IV terms are non-negative by construction (same sign factors)
        assert r.iv_term >= -1e-15
