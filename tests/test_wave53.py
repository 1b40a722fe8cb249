"""Round-10 wave 53 pins: the three new inference-stats operators
(mutual information / G-test, Jonckheere-Terpstra, Bartlett) against
independent numpy/brute-force replays at sf0.001 — third formulations
beside the Spark plan and the DuckDB oracle, so a shared algebra mistake
cannot hide in the parity check. Also pins the exact floor-division
fix-up idiom (Spark's `div` casts DECIMAL operands to LONG and wraps)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .conftest import SF_SMALL


def test_mutual_information_matches_numpy(spark):
    from etl_cotrip_signs_spark.operators.stats3 import stat_mutual_information

    row = stat_mutual_information(spark, SF_SMALL).collect()[0]
    e = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ct = pd.crosstab(e.event_type, e.user_id % 8).to_numpy().astype(float)
    n = ct.sum()
    p = ct / n
    px = p.sum(1, keepdims=True)
    py = p.sum(0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        contrib = np.where(p > 0, p * np.log(p / (px * py)), 0.0)
    mi = contrib.sum()
    assert row.n == n
    assert row.n_cells == int((ct > 0).sum())
    # the 1e-9 per-cell quantization bounds the drift by n_cells/1e9/n
    assert abs(row.mi_nats - mi) < 1e-6
    assert abs(row.g_stat - 2 * n * mi) < 1e-2


def test_jonckheere_matches_bruteforce(spark):
    from etl_cotrip_signs_spark.operators.stats3 import (
        stat_jonckheere_terpstra,
    )

    row = stat_jonckheere_terpstra(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    bins = np.floor(o.o_totalprice.to_numpy() / 100).astype(np.int64)
    grp = o.o_orderpriority.str[0].astype(int).to_numpy()
    groups = [bins[grp == i] for i in range(1, 6)]
    jt2 = 0
    for i in range(5):
        for j in range(i + 1, 5):
            x, y = groups[i], groups[j]
            jt2 += 2 * int((x[:, None] < y[None, :]).sum()) + int(
                (x[:, None] == y[None, :]).sum()
            )
    n = len(bins)
    ni = np.array([len(g) for g in groups], dtype=np.int64)
    assert row.jt_x2 == jt2
    assert row.n == n
    assert row.e_jt_x4 == n * n - int((ni * ni).sum())
    # tie-corrected null variance (Hollander & Wolfe)
    t = pd.Series(bins).value_counts().to_numpy().astype(np.int64)
    a = (
        n * (n - 1) * (2 * n + 5)
        - int((ni * (ni - 1) * (2 * ni + 5)).sum())
        - int((t * (t - 1) * (2 * t + 5)).sum())
    )
    b = int((ni * (ni - 1) * (ni - 2)).sum()) * int(
        (t * (t - 1) * (t - 2)).sum()
    )
    c = int((ni * (ni - 1)).sum()) * int((t * (t - 1)).sum())
    var = (
        a / 72
        + b / (36 * n * (n - 1) * (n - 2))
        + c / (8 * n * (n - 1))
    )
    z = (jt2 / 2 - (n * n - int((ni * ni).sum())) / 4) / np.sqrt(var)
    assert abs(row.z_jt - z) < 1e-5


def test_bartlett_matches_numpy(spark):
    from etl_cotrip_signs_spark.operators.stats3 import stat_bartlett

    row = stat_bartlett(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    cents = np.floor(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    grp = o.o_orderpriority.to_numpy()
    ss, dofs = [], []
    for g in np.unique(grp):
        x = cents[grp == g].astype(np.float64)
        ss.append(((x - x.mean()) ** 2).sum())
        dofs.append(len(x) - 1)
    ss, dofs = np.array(ss), np.array(dofs, dtype=np.int64)
    k = len(ss)
    nk = int(dofs.sum())  # N - k
    sp2 = ss.sum() / nk
    chi2 = nk * np.log(sp2) - (dofs * np.log(ss / dofs)).sum()
    c = 1 + ((1 / dofs).sum() - 1 / nk) / (3 * (k - 1))
    assert row.k == k and row.n == nk + k
    assert abs(row.chi2_bartlett - chi2 / c) < 1e-2


def test_exact_floor_division_fixup_idiom(spark):
    """The Bartlett/Cramér floor-division idiom must be a TRUE floor for
    decimals far beyond LONG range (where Spark's `div` wraps)."""
    df = spark.sql(
        """
        SELECT CAST(q0 - (CASE WHEN q0 * d > big THEN 1 ELSE 0 END)
                    AS DECIMAL(38,0)) AS fd, expect
        FROM (
            SELECT CAST(big / d AS DECIMAL(38,0)) AS q0, big, d, expect
            FROM VALUES
                (CAST(20000000000000000000000000 AS DECIMAL(38,0)),
                 CAST(3 AS BIGINT),
                 CAST(6666666666666666666666666 AS DECIMAL(38,0))),
                (CAST(20000000000000000000000002 AS DECIMAL(38,0)),
                 CAST(2 AS BIGINT),
                 CAST(10000000000000000000000001 AS DECIMAL(38,0))),
                (CAST(7 AS DECIMAL(38,0)), CAST(2 AS BIGINT),
                 CAST(3 AS DECIMAL(38,0)))
                AS t(big, d, expect)
        )
        """
    ).collect()
    for r in df:
        assert r.fd == r.expect, (r.fd, r.expect)
