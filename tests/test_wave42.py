"""Pins for wave 42: Cochran-Q integer identity and the Zipf fit's
log-log regression replayed in numpy."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from etl_cotrip_signs_spark.operators.stats3 import _FRIED_K, stat_cochran_q
from etl_cotrip_signs_spark.operators.text import _ZIPF_N, text_zipf_fit

from .conftest import SF_SMALL


def test_cochran_q_identity_and_ranges(spark):
    r = stat_cochran_q(spark, SF_SMALL).toPandas().iloc[0]
    assert r.k == _FRIED_K
    # column/row moment bounds: C_j <= n_blocks, R_i <= k
    assert 0 <= r.n_success <= r.n_blocks * r.k
    assert r.sum_c2 <= r.n_success * r.n_blocks
    assert r.sum_r2 <= r.n_success * r.k
    # replay Q from the emitted exact moments
    num = (r.k - 1) * (r.k * r.sum_c2 - r.n_success**2)
    den = r.k * r.n_success - r.sum_r2
    expect = round(num / den, 6) if den else None
    assert r.q_stat == expect
    assert r.q_stat is None or r.q_stat >= 0


def test_cochran_q_pandas_replay(spark):
    r = stat_cochran_q(spark, SF_SMALL).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    blk = (
        pd.to_datetime(ev.ts).dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days // 7
    cells = (
        ev.assign(blk=blk).groupby(["blk", "event_type"]).size().rename("c")
    ).reset_index()
    complete = cells.groupby("blk").size()
    complete = set(complete[complete == _FRIED_K].index)
    cc = cells[cells.blk.isin(complete)]
    tot = cc.groupby("event_type").agg(tot_t=("c", "sum"), nb=("c", "size"))
    x = cc.merge(tot, on="event_type")
    x["x"] = (x.c * x.nb >= x.tot_t).astype(int)
    cj = x.groupby("event_type").x.sum()
    ri = x.groupby("blk").x.sum()
    assert r.n_blocks == len(complete)
    assert r.n_success == cj.sum()
    assert r.sum_c2 == (cj**2).sum()
    assert r.sum_r2 == (ri**2).sum()


def test_zipf_fit_numpy_replay(spark):
    r = text_zipf_fit(spark, SF_SMALL).toPandas().iloc[0]
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    words = docs.text.str.strip().str.split().explode()
    freq = words.value_counts()
    ordered = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_N]
    xm = np.array(
        [round(math.log(i + 1) * 1e6) for i in range(len(ordered))],
        dtype=np.int64,
    )
    ym = np.array([round(math.log(f) * 1e6) for _, f in ordered], dtype=np.int64)
    n = len(xm)
    sx, sy = xm.sum(), ym.sum()
    sxx, sxy = (xm * xm).sum(), (xm * ym).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n / 1e6
    assert r.n_terms == n == min(_ZIPF_N, len(freq))
    assert r.zipf_slope == round(slope, 6)
    assert r.ln_c_intercept == round(intercept, 6)
    # natural-ish corpus: slope is negative (frequencies decay with rank)
    assert r.zipf_slope < 0
