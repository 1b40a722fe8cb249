"""Pins for wave 43: Mann-Kendall pair identity, HLL sweep error
monotonicity, bigram-LM probability axioms, IQR fence ground truth."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etl_cotrip_signs_spark.operators.ops_audit import dq_outlier_iqr_fences
from etl_cotrip_signs_spark.operators.sketches3 import (
    _HLLP_PS,
    sketch_hll_precision_sweep,
)
from etl_cotrip_signs_spark.operators.text import text_bigram_perplexity
from etl_cotrip_signs_spark.operators.timeseries import trend_mann_kendall

from .conftest import SF_SMALL


def test_mann_kendall_numpy_replay(spark):
    r = trend_mann_kendall(spark, SF_SMALL).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    cents = np.floor(orders.o_totalprice.to_numpy() * 100).astype(np.int64)
    days = orders.o_orderdate.astype("datetime64[ns]")
    daily = (
        pd.DataFrame({"d": days.dt.normalize(), "c": cents})
        .groupby("d")
        .c.sum()
        .sort_index()
        .to_numpy()
    )
    n = len(daily)
    s = int(np.sign(daily[None, :] - daily[:, None])[np.triu_indices(n, 1)].sum())
    _, t = np.unique(daily, return_counts=True)
    tie = int((t * (t - 1) * (2 * t + 5))[t > 1].sum())
    var18 = n * (n - 1) * (2 * n + 5) - tie
    assert r.n == n and r.s_stat == s and r.var18 == var18
    import math

    if s > 0:
        z = (s - 1) / math.sqrt(var18 / 18)
    elif s < 0:
        z = (s + 1) / math.sqrt(var18 / 18)
    else:
        z = 0.0
    assert r.z_mk == round(z, 6)


def test_hll_sweep_error_shrinks_with_precision(spark):
    out = (
        sketch_hll_precision_sweep(spark, SF_SMALL)
        .toPandas()
        .set_index("p")
    )
    assert list(out.index) == list(_HLLP_PS)
    assert (out.m == [16, 64, 256]).all()
    # one exact count, three estimates; the finest precision must not be
    # the worst of the sweep (the whole point of paying 16x the state)
    errs = out.err_ppm.abs()
    assert errs.loc[8] <= errs.loc[4]
    assert (out.zeros <= out.m).all()
    assert (out.n_exact > 0).all()


def test_bigram_perplexity_axioms(spark):
    r = text_bigram_perplexity(spark, SF_SMALL).toPandas().iloc[0]
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    assert r.n_train_docs + r.n_test_docs == len(docs)
    # add-one smoothing: every bigram probability is in (0, 1), so the
    # corpus logprob is negative and perplexity > 1
    assert r.sum_logp_micro < 0
    assert r.perplexity > 1
    # perplexity can never exceed V (uniform add-one floor p >= 1/(c1+V)
    # is loose, but ppl <= V holds when every test w1 was seen rarely) —
    # use the hard bound: ppl <= vocab_v since p >= 1/(max_c1 + V) and the
    # model assigns at least 1/(c1+V) >= 1/(N+V); keep the sanity loose
    assert r.perplexity < 10 * r.vocab_v
    # replay perplexity from the exact integer sum
    import math

    assert r.perplexity == round(
        math.exp(-r.sum_logp_micro / 1e6 / r.n_test_bigrams), 4
    )


def test_iqr_fences_ground_truth(spark):
    out = dq_outlier_iqr_fences(spark, SF_SMALL).toPandas()
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["x"] = np.floor(ev.value.to_numpy() * 1000).astype(np.int64)
    for r in out.itertuples():
        g = np.sort(ev[ev.event_type == r.event_type].x.to_numpy())
        n = len(g)
        q1 = int(g[(n + 3) // 4 - 1])
        q3 = int(g[(3 * n + 3) // 4 - 1])
        assert (r.n, r.q1_milli, r.q3_milli) == (n, q1, q3)
        lo2, hi2 = 2 * q1 - 3 * (q3 - q1), 2 * q3 + 3 * (q3 - q1)
        assert r.n_low == int((2 * g < lo2).sum())
        assert r.n_high == int((2 * g > hi2).sum())
