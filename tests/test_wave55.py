"""Round-10 wave 55 pins: zone-map pruning invariants and Fisher's exact
test against an independent lgamma-based hypergeometric replay."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .conftest import SF_SMALL


def test_zonemap_clustered_prunes_hashed_does_not(spark):
    from etl_cotrip_signs_spark.operators.io_queries import (
        layout_zonemap_pruning,
    )

    out = layout_zonemap_pruning(spark, SF_SMALL).toPandas()
    assert len(out) == 8
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    day = (li.l_shipdate - pd.Timestamp("1970-01-01")).dt.days.to_numpy()
    for _, r in out.iterrows():
        # scanned is always a superset of matched, never exceeds the table
        assert r.rows_matched <= r.rows_scanned <= len(li)
        assert r.files_scanned <= r.files_total == 64
        assert r.amp_ppm == 1_000_000 * r.rows_scanned // max(
            r.rows_matched, 1
        )
    m = out.set_index(["layout", "pred"])
    # exact match counts are layout-independent and replayable in pandas
    for pred, lo, hi in [
        ("q1_1996", 9496, 9586),
        ("y_1997", 9862, 10226),
        ("jun_1998", 10378, 10407),
        ("all_time", 0, 30000),
    ]:
        expect = int(((day >= lo) & (day <= hi)).sum())
        assert m.loc[("clustered", pred), "rows_matched"] == expect
        assert m.loc[("hashed", pred), "rows_matched"] == expect
    # the whole point: range clustering prunes a selective predicate,
    # hash layout scans everything
    assert (
        m.loc[("clustered", "jun_1998"), "files_scanned"]
        < m.loc[("hashed", "jun_1998"), "files_scanned"]
    )
    assert m.loc[("hashed", "jun_1998"), "files_scanned"] == 64
    # the all-time predicate prunes nothing anywhere
    assert m.loc[("clustered", "all_time"), "rows_scanned"] == len(li)
    assert m.loc[("hashed", "all_time"), "rows_scanned"] == len(li)


def test_fisher_exact_matches_lgamma_replay(spark):
    from etl_cotrip_signs_spark.operators.stats3 import stat_fisher_exact

    row = stat_fisher_exact(spark, SF_SMALL).collect()[0]
    e = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    cents = np.floor(e.value.to_numpy() * 100).astype(np.int64)
    is_p = (e.event_type == "purchase").to_numpy()
    is_big = cents >= 45_000
    a = int((is_p & is_big).sum())
    r = int(is_p.sum())
    c = int(is_big.sum())
    n = len(e)
    assert (row.a, row.r_margin, row.c_margin, row.n) == (a, r, c, n)
    kmin, kmax = max(0, r + c - n), min(r, c)
    assert row.k_support == kmax - kmin + 1

    def lpmf(k):
        lg = math.lgamma
        return (
            lg(r + 1)
            - lg(k + 1)
            - lg(r - k + 1)
            + lg(n - r + 1)
            - lg(c - k + 1)
            - lg(n - r - c + k + 1)
            + lg(c + 1)
            + lg(n - c + 1)
            - lg(n + 1)
        )

    ls = np.array([lpmf(k) for k in range(kmin, kmax + 1)])
    w = np.exp(ls - ls.max())
    tot = w.sum()
    la = lpmf(a)
    ks = np.arange(kmin, kmax + 1)
    # tiny relative tolerance absorbs the 1e-12 quantization at the
    # inclusion boundary (same role as R's 1e-7 relative epsilon)
    p_two = w[ls <= la + 1e-9].sum() / tot
    p_left = w[ks <= a].sum() / tot
    p_right = w[ks >= a].sum() / tot
    assert abs(row.p_two - p_two) < 1e-4
    assert abs(row.p_left - p_left) < 1e-4
    assert abs(row.p_right - p_right) < 1e-4
