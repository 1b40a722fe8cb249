"""Pins for wave 46: CMS width-sweep monotonicity, randomized-response
estimator identities, Grubbs exactness vs numpy, and balanced-sample
partition axioms."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from etl_cotrip_signs_spark.operators.ops_audit import (
    privacy_randomized_response,
)
from etl_cotrip_signs_spark.operators.selection import sample_balanced_class
from etl_cotrip_signs_spark.operators.sketches3 import (
    _CMSW_D,
    _CMSW_WIDTHS,
    sketch_cms_width_sweep,
)
from etl_cotrip_signs_spark.operators.stats3 import stat_grubbs_outlier

from .conftest import SF_SMALL


def test_cms_width_sweep_error_monotone(spark):
    out = (
        sketch_cms_width_sweep(spark, SF_SMALL)
        .toPandas()
        .sort_values("w")
        .reset_index(drop=True)
    )
    assert list(out.w) == list(_CMSW_WIDTHS)
    assert (out.d == _CMSW_D).all()
    # one sweep row per width over the SAME key stream
    assert out.n_keys.nunique() == 1
    assert out.n_total.nunique() == 1
    # CMS never underestimates: collision mass is >= 0 everywhere
    assert (out.sum_overest >= 0).all()
    assert (out.max_overest >= 0).all()
    # wider sketch -> no more total collision mass (2x width halves the
    # expected mass; the fixture must at least not INCREASE it)
    assert (out.sum_overest.diff().dropna() <= 0).all()
    assert out.n_overestimated.iloc[-1] <= out.n_overestimated.iloc[0]


def test_randomized_response_estimator_identity(spark):
    row = privacy_randomized_response(spark, SF_SMALL).toPandas().iloc[0]
    # the shared estimator expression equals its definition
    share = row.n_reported_yes / row.n_users
    assert math.isclose(
        row.est_share_yes, round((share + 0.75 - 1.0) / 0.5, 6), abs_tol=1e-9
    )
    assert 0 <= row.n_reported_yes <= row.n_users
    assert 0 <= row.n_true_yes <= row.n_users
    # with p=3/4 the estimator is unbiased; on the fixture it should land
    # within a loose CLT band of the true share (sd ~ 1/sqrt(n))
    true_share = row.n_true_yes / row.n_users
    band = 6.0 / math.sqrt(row.n_users)
    assert abs(row.est_share_yes - true_share) < band


def test_grubbs_matches_numpy(spark):
    out = stat_grubbs_outlier(spark, SF_SMALL).toPandas()
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    cents = (
        np.floor(orders.o_totalprice.to_numpy() * 100).astype(np.int64)
    )
    for _, r in out.iterrows():
        grp = cents[(orders.o_orderpriority == r.o_orderpriority).to_numpy()]
        g_np = np.max(np.abs(grp - grp.mean())) / grp.std(ddof=1)
        assert math.isclose(r.g_stat, g_np, rel_tol=1e-6), (
            r.o_orderpriority,
            r.g_stat,
            g_np,
        )
        assert bool(r.is_outlier) == (round(g_np, 6) > 3.0)


def test_balanced_class_partition_axioms(spark):
    out = sample_balanced_class(spark, SF_SMALL).toPandas()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    by_lang = docs.groupby("lang").size()
    k = by_lang.min()
    # every class keeps exactly k docs — that is the balance contract
    assert (out.n_kept == k).all()
    assert (out.n_in.to_numpy() == by_lang.loc[out.lang].to_numpy()).all()
    # kept sets are genuine subsets: checksums bounded by class totals
    sums = docs.groupby("lang").doc_id.sum()
    assert (out.kept_id_sum <= sums.loc[out.lang].to_numpy()).all()
    chars = docs.groupby("lang").n_chars.sum()
    assert (out.kept_chars <= chars.loc[out.lang].to_numpy()).all()
