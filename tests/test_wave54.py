"""Round-10 wave 54 pins: PACF (Durbin-Levinson) and lag-1 Granger
causality against independent numpy replays at sf0.001 — the third
formulation beside the Spark plan and the DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .conftest import SF_SMALL


def _daily_orders_cents():
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    o["day_x"] = (o.o_orderdate - pd.Timestamp("1970-01-01")).dt.days
    o["cents"] = np.floor(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    return o.groupby("day_x").cents.sum().sort_index().to_numpy(
        dtype=np.float64
    )


def test_pacf_matches_numpy_durbin_levinson(spark):
    from etl_cotrip_signs_spark.operators.timeseries import trend_pacf_daily

    row = trend_pacf_daily(spark, SF_SMALL).collect()[0]
    y = _daily_orders_cents()
    n = len(y)
    m = y.mean()
    # biased autocovariances over ROW-adjacent observations (the series is
    # the observed day sequence), gamma_k = (1/n) sum (y_t-m)(y_{t-k}-m)
    gam = np.array(
        [((y[k:] - m) * (y[: n - k] - m)).sum() for k in range(6)]
    )
    r = gam[1:] / gam[0]
    assert row.n_days == n
    for k in range(1, 6):
        assert abs(row[f"acf_{k}"] - r[k - 1]) < 1e-6, k
    # Durbin-Levinson
    phi = np.zeros((6, 6))
    phi[1, 1] = r[0]
    pacf = [r[0]]
    for k in range(2, 6):
        num = r[k - 1] - sum(
            phi[k - 1, j] * r[k - 1 - j] for j in range(1, k)
        )
        den = 1 - sum(phi[k - 1, j] * r[j - 1] for j in range(1, k))
        phi[k, k] = num / den
        for j in range(1, k):
            phi[k, j] = phi[k - 1, j] - phi[k, k] * phi[k - 1, k - j]
        pacf.append(phi[k, k])
    for k in range(1, 6):
        assert abs(row[f"pacf_{k}"] - pacf[k - 1]) < 1e-4, k


def test_granger_matches_numpy_lstsq(spark):
    from etl_cotrip_signs_spark.operators.timeseries import events_granger_lag1

    row = events_granger_lag1(spark, SF_SMALL).collect()[0]
    e = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    e["day_x"] = (e.ts - pd.Timestamp("1970-01-01")).dt.days
    e["cents"] = np.floor(e.value.to_numpy() * 100).astype(np.int64)
    daily = (
        e.pivot_table(
            index="day_x",
            columns="event_type",
            values="cents",
            aggfunc="sum",
            fill_value=0,
        )
        .sort_index()
    )
    y = daily["view"].to_numpy(dtype=np.float64)
    x = daily["click"].to_numpy(dtype=np.float64)
    yt, y1, x1 = y[1:], y[:-1], x[:-1]
    n1 = len(yt)
    assert row.n_pairs == n1

    def rss(design):
        beta, res, *_ = np.linalg.lstsq(design, yt, rcond=None)
        return ((yt - design @ beta) ** 2).sum(), beta

    ones = np.ones(n1)
    rss_r, _ = rss(np.column_stack([ones, y1]))
    rss_u, beta_u = rss(np.column_stack([ones, y1, x1]))
    f = (rss_r - rss_u) / (rss_u / (n1 - 3))
    assert abs(row.beta_y1 - beta_u[1]) < 1e-4
    assert abs(row.beta_x1 - beta_u[2]) < 1e-4
    assert abs(row.f_granger - f) < 1e-2
