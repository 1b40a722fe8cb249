"""Round-10 pins: the knn_*_recall decision-hash graduation (VERDICT r9
item 5). The five recall twins now hash their exact-twin counts against
DuckDB and assert a measured-floor boolean; these tests pin that the
boolean actually trips on a collapsed approximate path (the failure mode
the graduation exists to catch) and that the floors hold with margin on
the real fixtures."""

from __future__ import annotations

from etl_cotrip_signs_spark.operators import similarity

from .conftest import SF_SMALL


def test_recall_floor_trips_on_collapsed_ann(spark):
    """An ANN path returning zero candidates must read recall_ge_floor =
    FALSE (a driver hash mismatch), not a null or a vacuous TRUE."""
    exact = similarity.knn_exact_cosine(spark, SF_SMALL).select(
        "query_id", "neighbor_id"
    )
    empty_ann = exact.filter("query_id < 0")
    row = similarity._recall_vs_exact(
        exact, empty_ann, similarity._RECALL_FLOOR_PQ
    ).collect()[0]
    assert row.recall_ge_floor is False
    assert row.n_exact > 0


def test_recall_floor_trips_on_empty_exact(spark):
    """An empty exact set is a collapse (FALSE), never a divide-by-zero."""
    exact = similarity.knn_exact_cosine(spark, SF_SMALL).select(
        "query_id", "neighbor_id"
    )
    none = exact.filter("query_id < 0")
    row = similarity._recall_vs_exact(
        none, none, similarity._RECALL_FLOOR_PQ
    ).collect()[0]
    assert row.recall_ge_floor is False
    assert row.n_exact == 0


def test_recall_decisions_true_on_fixture(spark):
    """All five graduated rows must clear their floors on the small
    fixture (measured r10: LSH 0.99, IVF 0.64, PQ 0.22, OPQ 0.22,
    IVF-PQ 0.21 — each comfortably above its floor)."""
    for fn in [
        similarity.knn_lsh_recall,
        similarity.knn_ivf_recall,
        similarity.knn_pq_recall,
        similarity.knn_opq_recall,
        similarity.knn_ivfpq_recall,
    ]:
        row = fn(spark, SF_SMALL).collect()[0]
        assert row.recall_ge_floor is True, fn.__name__
        assert row.n_queries == 20 and row.n_exact == 100, fn.__name__


# --- wave 52: inference stats vs independent numpy/pandas replays ---


def _daily_cents():
    import numpy as np
    import pandas as pd

    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    o["day_x"] = (o.o_orderdate - pd.Timestamp("1970-01-01")).dt.days
    o["cents"] = np.floor(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    return o.groupby("day_x").cents.sum().sort_index()


def test_cramers_v_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from etl_cotrip_signs_spark.operators.stats3 import stat_cramers_v

    row = stat_cramers_v(spark, SF_SMALL).collect()[0]
    e = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ct = pd.crosstab(e.event_type, e.user_id % 4).to_numpy()
    n = ct.sum()
    exp = np.outer(ct.sum(1), ct.sum(0)) / n
    chi2 = ((ct - exp) ** 2 / exp).sum()
    v = np.sqrt(chi2 / (n * (min(ct.shape) - 1)))
    # the scaled-integer chi2 truncates <= 1e-6 per cell
    assert abs(row.chi2_e6 / 1e6 - chi2) < 1e-3
    assert abs(row.cramers_v - v) < 1e-4
    assert row.n == n and row.n_rows == 5 and row.n_cols == 4


def test_jarque_bera_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from etl_cotrip_signs_spark.operators.stats3 import stat_jarque_bera

    out = stat_jarque_bera(spark, SF_SMALL).toPandas()
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    o["cents"] = np.floor(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    for _, r in out.iterrows():
        x = o[o.o_orderpriority == r.o_orderpriority].cents.to_numpy(
            dtype=np.float64
        )
        n = len(x)
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        m3 = ((x - m) ** 3).mean()
        m4 = ((x - m) ** 4).mean()
        skew = m3 / (m2 * np.sqrt(m2))
        kurt = m4 / (m2 * m2)
        jb = n / 6 * (skew**2 + (kurt - 3) ** 2 / 4)
        assert r["n"] == n
        # r.skew would resolve to the pandas Series METHOD, not the column
        assert abs(r["skew"] - skew) < 1e-5
        assert abs(r["kurtosis"] - kurt) < 1e-5
        assert abs(r["jb_stat"] - jb) < 1e-2


def test_durbin_watson_matches_numpy(spark):
    import numpy as np

    from etl_cotrip_signs_spark.operators.stats3 import stat_durbin_watson

    row = stat_durbin_watson(spark, SF_SMALL).collect()[0]
    daily = _daily_cents()
    t = daily.index.to_numpy(dtype=np.float64)
    y = daily.to_numpy(dtype=np.float64)
    n = len(y)
    b = (n * (t * y).sum() - t.sum() * y.sum()) / (
        n * (t * t).sum() - t.sum() ** 2
    )
    a = (y.sum() - b * t.sum()) / n
    es = np.floor(y - a - b * t)
    d = np.diff(es)
    dw = (d * d).sum() / (es * es).sum()
    assert row.n_days == n
    assert abs(row.dw - dw) < 1e-4
    assert abs(row.rho_lag1 - (1 - dw / 2)) < 1e-4


def test_cox_stuart_matches_bruteforce(spark):
    import numpy as np

    from etl_cotrip_signs_spark.operators.stats3 import stat_cox_stuart

    row = stat_cox_stuart(spark, SF_SMALL).collect()[0]
    y = _daily_cents().to_numpy()
    n = len(y)
    m = n // 2
    diffs = [y[i + (n - m)] - y[i] for i in range(m)]
    s_plus = sum(1 for d in diffs if d > 0)
    s_minus = sum(1 for d in diffs if d < 0)
    n_eff = s_plus + s_minus
    z = (2 * s_plus - n_eff) / np.sqrt(n_eff)
    assert row.n_days == n and row.n_pairs == m
    assert row.s_plus == s_plus and row.s_minus == s_minus
    assert abs(row.z_cs - z) < 1e-6


def test_cliffs_delta_matches_bruteforce_pairs(spark):
    import numpy as np
    import pandas as pd

    from etl_cotrip_signs_spark.operators.stats3 import stat_cliffs_delta

    row = stat_cliffs_delta(spark, SF_SMALL).collect()[0]
    e = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    cents = np.floor(e.value.to_numpy() * 100).astype(np.int64)
    x = cents[(e.event_type == "click").to_numpy()]
    y = cents[(e.event_type == "error").to_numpy()]
    gt = int((x[:, None] > y[None, :]).sum())
    lt = int((x[:, None] < y[None, :]).sum())
    delta = (gt - lt) / (len(x) * len(y))
    assert row.n1 == len(x) and row.n2 == len(y)
    assert abs(row.cliffs_delta - delta) < 1e-6
    bands = [(0.147, "negligible"), (0.33, "small"), (0.474, "medium")]
    expect = next((m for b, m in bands if abs(delta) < b), "large")
    assert row.magnitude == expect
