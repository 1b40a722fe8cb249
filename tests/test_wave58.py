"""Round-10 wave 58 pins: Fano factor and term burstiness against
independent pandas/numpy replays at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .conftest import SF_SMALL


def test_fano_factor_matches_numpy_with_empty_windows(spark):
    from etl_cotrip_signs_spark.operators.timeseries import events_fano_factor

    out = events_fano_factor(spark, SF_SMALL).toPandas()
    e = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    t_us = e.ts.astype("datetime64[us]").astype("int64")
    w = t_us // 60_000_000
    lo, hi = w.min(), w.max()
    n_windows = hi - lo + 1
    for _, r in out.iterrows():
        ww = w[e.event_type == r.event_type]
        counts = ww.value_counts()
        full = np.zeros(n_windows, dtype=np.int64)
        full[(counts.index - lo).to_numpy()] = counts.to_numpy()
        mean = full.mean()
        var = full.var()  # population variance, matching Var*n^2 = n*S2-S1^2
        fano = var / mean
        assert r.n_windows == n_windows
        assert r.n_events == len(ww)
        assert r.nonempty_windows == (full > 0).sum()
        assert r.fano_e6 == int(np.floor(fano * 1_000_000))
    # event arrivals are roughly Poisson on this fixture: F near 1
    assert (out.fano_e6 > 500_000).all() and (out.fano_e6 < 2_000_000).all()


def test_term_burstiness_matches_numpy_gaps(spark):
    from etl_cotrip_signs_spark.operators.text import text_term_burstiness

    out = text_term_burstiness(spark, SF_SMALL).toPandas()
    assert len(out) == 10
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    posting: dict = {}
    for _, row in d.iterrows():
        for t in set(x for x in row.text.strip().split(" ") if x):
            posting.setdefault(t, []).append(row.doc_id)
    dfs = {t: len(v) for t, v in posting.items()}
    top = sorted(dfs, key=lambda t: (-dfs[t], t))[:10]
    assert set(out.term) == set(top)
    for _, r in out.iterrows():
        docs = np.array(sorted(posting[r.term]))
        g = np.diff(docs).astype(np.float64)
        mu = g.mean()
        sigma = np.sqrt(((g - mu) ** 2).mean())
        b = (sigma - mu) / (sigma + mu)
        assert r.df == dfs[r.term]
        assert r.n_gaps == len(g)
        assert abs(r.mean_gap - mu) < 1e-5
        assert abs(r.burstiness - b) < 1e-5
        assert -1 < r.burstiness < 1
