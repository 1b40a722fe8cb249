"""Round-10 wave 57 pins: bloom-file skipping invariants against a
pure-python bloom replay, exact motif distances against numpy
brute force, and Page's L against a scipy-free rank replay."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etl_cotrip_signs_spark.functions.xxh64_ref import xxh64, xxh64_signed

from .conftest import SF_SMALL


def test_bloomfilter_pruning_matches_python_bloom(spark):
    from etl_cotrip_signs_spark.operators.io_queries import (
        _FB_K,
        _FB_M,
        _FB_PROBES,
        layout_bloomfilter_pruning,
    )

    out = layout_bloomfilter_pruning(spark, SF_SMALL).toPandas()
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    day = (li.l_shipdate - pd.Timestamp("1970-01-01")).dt.days.to_numpy()
    mnd, mxd = day.min(), day.max()
    f = np.minimum(63, (day - mnd) * 64 // (mxd - mnd + 1))
    pk = li.l_partkey.to_numpy()
    seeds = [xxh64(f"fb{i}".encode(), 42) for i in range(_FB_K)]

    def bits(key):
        return [
            xxh64_signed(int(key).to_bytes(8, "little", signed=True), s)
            % _FB_M
            for s in seeds
        ]

    # per-file bloom = set of bits over all member keys
    blooms = {}
    for fid in range(64):
        keys = np.unique(pk[f == fid])
        bset = set()
        for k in keys:
            bset.update(bits(k))
        blooms[fid] = (bset, set(keys))
    m = out.set_index("probe_key")
    for probe in _FB_PROBES:
        pb = bits(probe)
        passing = [fid for fid in blooms if all(b in blooms[fid][0] for b in pb)]
        with_match = [fid for fid in blooms if probe in blooms[fid][1]]
        row = m.loc[probe]
        assert row.files_total == 64
        assert row.files_passing == len(passing)
        assert row.files_with_match == len(with_match)
        assert row.false_positive_files == len(set(passing) - set(with_match))
        assert row.rows_scanned == int(np.isin(f, passing).sum())
        assert row.rows_matched == int((pk == probe).sum())
        # a bloom NEVER misses a true match
        assert set(with_match) <= set(passing)
    # the absent probe matches nothing (and any passing file is a FP)
    absent = m.loc[986021]
    assert absent.rows_matched == 0
    assert absent.files_with_match == 0


def test_motif_matches_numpy_bruteforce(spark):
    from etl_cotrip_signs_spark.operators.timeseries import trend_motif_daily

    out = trend_motif_daily(spark, SF_SMALL).toPandas()
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    o["day_x"] = (o.o_orderdate - pd.Timestamp("1970-01-01")).dt.days
    o["cents"] = np.floor(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    daily = o.groupby("day_x").cents.sum().sort_index() // 100
    y = daily.to_numpy()
    days = daily.index.to_numpy()
    n = len(y)
    wins = np.lib.stride_tricks.sliding_window_view(y, 7)
    cands = []
    for i in range(len(wins)):
        for j in range(i + 7, len(wins)):
            d2 = int(((wins[i] - wins[j]) ** 2).sum())
            cands.append((d2, days[i], days[j]))
    cands.sort()
    for row, expect in zip(out.itertuples(), cands[:5]):
        assert (row.d2, row.day_a, row.day_b) == expect


def test_page_trend_matches_rank_replay(spark):
    from etl_cotrip_signs_spark.operators.stats3 import stat_page_trend

    row = stat_page_trend(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    o["day_x"] = (o.o_orderdate - pd.Timestamp("1970-01-01")).dt.days
    o["cents"] = np.floor(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    daily = o.groupby("day_x").cents.sum()
    df = pd.DataFrame(
        {
            "wk": (daily.index + 3) // 7,
            "dow": (daily.index + 3) % 7 + 1,
            "y": daily.to_numpy(),
        }
    )
    # zero-fill missing weekdays so every observed week is a block
    grid = (
        pd.MultiIndex.from_product(
            [sorted(df.wk.unique()), range(1, 8)], names=["wk", "dow"]
        )
        .to_frame(index=False)
        .merge(df, on=["wk", "dow"], how="left")
        .fillna({"y": 0})
    )
    df = grid
    b = df.wk.nunique()
    # average ranks within each week (doubled to stay integral)
    df["r2"] = (
        df.groupby("wk").y.rank(method="average").to_numpy() * 2
    ).astype(np.int64)
    l2 = int((df.dow * df.r2).sum())
    assert row.b == b
    assert row.l2 == l2
    e_l = b * 7 * 64 / 4
    var_l = b * 49 * 8 * 48 / 144
    z = (l2 / 2 - e_l) / np.sqrt(var_l)
    assert abs(row.z_page - z) < 1e-5
    assert row.e_l2_x2 == b * 7 * 64
