"""Pins for wave 49: AMS estimator algebra, tau-b vs scipy-free
bruteforce, Theil U bounds/identities, decay-sum literal-weight replay,
and the streaming CMS's non-idempotent-merge replay protection."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from etl_cotrip_signs_spark.operators.sketches3 import _AMS_D, sketch_ams_f2
from etl_cotrip_signs_spark.operators.stats3 import (
    stat_kendall_tau_b,
    stat_theil_u,
)
from etl_cotrip_signs_spark.operators.timeseries import (
    _DECAY_H,
    _DECAY_W,
    window_exponential_decay_sum,
)

from .conftest import SF_SMALL


def test_ams_f2_estimator_algebra(spark):
    out = sketch_ams_f2(spark, SF_SMALL).toPandas()
    assert list(out.r) == list(range(_AMS_D))
    assert out.f2_exact.nunique() == 1
    f2 = int(out.f2_exact.iloc[0])
    # per-row identities
    assert (out.f2_est == out.x * out.x).all()
    # Spark DIV and DuckDB // both truncate toward zero (unlike Python //)
    trunc = ((out.f2_est - f2) * 1_000_000 / f2).astype(int)
    assert (out.err_ppm == trunc).all()
    # |X_r| <= total mass (triangle inequality on the signed sum)
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    assert (out.x.abs() <= len(li)).all()
    # the mean estimate should land within a loose variance band of F2
    # (Var(X^2) <= 2*F2^2 -> sd of the 8-row mean <= F2/2)
    mean_est = out.f2_est.mean()
    assert abs(mean_est - f2) < 2.5 * f2 / 2


def test_kendall_tau_b_matches_bruteforce(spark):
    row = stat_kendall_tau_b(spark, SF_SMALL).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    orders["cents"] = (orders.o_totalprice * 100).apply(math.floor)
    daily = orders.groupby(pd.to_datetime(orders.o_orderdate).dt.date).agg(
        x=("cents", "sum"), y=("cents", "size")
    )
    xs, ys = daily.x.to_list(), daily.y.to_list()
    n = len(xs)
    nc = nd = 0
    for i in range(n):
        for j in range(i + 1, n):
            a, b = xs[j] - xs[i], ys[j] - ys[i]
            if a * b > 0:
                nc += 1
            elif a * b < 0 and a != 0 and b != 0:
                nd += 1
    tx = sum(t * (t - 1) // 2 for t in daily.x.value_counts() if t > 1)
    ty = sum(t * (t - 1) // 2 for t in daily.y.value_counts() if t > 1)
    n0 = n * (n - 1) // 2
    assert (row.n, row.n0, row.nc, row.nd) == (n, n0, nc, nd)
    assert (row.tx, row.ty) == (tx, ty)
    tau = (nc - nd) / math.sqrt((n0 - tx) * (n0 - ty))
    assert math.isclose(row.tau_b, round(tau, 6), abs_tol=1e-9)
    assert -1.0 <= row.tau_b <= 1.0


def test_theil_u_bounds_and_identity(spark):
    row = stat_theil_u(spark, SF_SMALL).toPandas().iloc[0]
    # conditioning cannot raise entropy; U in [0, 1]
    assert 0.0 <= row.h_x_given_y <= row.h_x + 1e-12
    assert 0.0 <= row.theil_u <= 1.0
    assert math.isclose(
        row.theil_u, (row.h_x - row.h_x_given_y) / row.h_x, rel_tol=1e-9
    )
    assert row.n_total == sum(row[f"x{i}"] for i in range(1, 6))


def test_decay_sum_matches_python_replay(spark):
    out = (
        window_exponential_decay_sum(spark, SF_SMALL)
        .toPandas()
        .sort_values("d")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["day"] = pd.to_datetime(ev.ts).dt.date
    ev["milli"] = ev.value.apply(lambda v: math.floor(v * 1000))
    daily = ev.groupby("day").milli.sum().to_dict()
    for _, r in out.iterrows():
        d = r.d if not hasattr(r.d, "date") else r.d.date()
        expect = sum(
            daily.get(d - pd.Timedelta(days=l).to_pytimedelta(), 0) * _DECAY_W[l]
            for l in range(_DECAY_H)
        )
        assert r.decay_scaled == expect
        assert math.isclose(
            r.decay_score, round(expect / 1e9, 6), abs_tol=1e-9
        )
        assert r.v_milli == daily[d]


def test_stream_cms_replay_is_rejected(spark, tmp_path):
    """Sum-merge is NOT idempotent — this pins that the versioned-pointer
    protocol alone keeps a replayed batch from double-counting."""
    from etl_cotrip_signs_spark.streaming.queries import make_cms_merge_fn

    def batch(ids):
        return spark.createDataFrame([(i,) for i in ids], "user_id long")

    merge, read_ptr = make_cms_merge_fn(str(tmp_path / "cms"))
    merge(batch([1, 2, 3]), 0)
    state0 = (
        spark.read.parquet(read_ptr()["dir"])
        .agg(F.sum("cell"))
        .collect()[0][0]
    )
    merge(batch([1, 2, 3]), 0)  # replay — must be a no-op
    state1 = (
        spark.read.parquet(read_ptr()["dir"])
        .agg(F.sum("cell"))
        .collect()[0][0]
    )
    assert state0 == state1 == 3 * 4  # 3 keys x d=4 rows
    merge(batch([1]), 1)
    state2 = (
        spark.read.parquet(read_ptr()["dir"])
        .agg(F.sum("cell"))
        .collect()[0][0]
    )
    assert state2 == state0 + 1 * 4
    assert read_ptr()["batch"] == 1
