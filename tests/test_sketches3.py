"""Invariants for the exact-oracle sketch twins (operators/sketches3.py),
the decision stump (operators/ml_basic.py), and the dynamic-overwrite IO
operator — semantic properties the hash parity alone doesn't state."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from etl_cotrip_signs_spark import registry
from etl_cotrip_signs_spark.operators.ml_basic import _BUCKET_CENTS
from etl_cotrip_signs_spark.session import scratch_dir

from .conftest import SF_SMALL

registry.load_all()


def test_bloom_no_false_negatives(spark):
    pdf = registry.QUERIES["sketch_bloom_membership"](spark, SF_SMALL).toPandas()
    present = pdf[pdf.truly_present == 1]
    assert len(present) > 0
    # The Bloom contract: membership queries for inserted keys ALWAYS hit.
    assert (present.bloom_hit == 1).all()
    # Probes for absent keys exist on this fixture (partkeys extend past
    # the custkey range), so the false-positive measurement is
    # non-degenerate.
    assert (pdf.truly_present == 0).any()


def test_hll_merge_is_max_and_estimate_sane(spark):
    pdf = registry.QUERIES["sketch_hll_exact_registers"](spark, SF_SMALL).toPandas()
    groups = sorted(pdf.grp.unique())
    assert "ALL" in groups
    # Grid-complete: every group carries all 64 buckets exactly once.
    assert (pdf.groupby("grp").bucket.count() == 64).all()
    # Merge identity: the ALL register is the max over group registers.
    per_group = pdf[pdf.grp != "ALL"].groupby("bucket").register.max()
    merged = pdf[pdf.grp == "ALL"].set_index("bucket").register
    assert (per_group == merged.loc[per_group.index]).all()
    # pow2_term is the dyadic estimate term.
    assert (pdf.pow2_term == (59 - pdf.register).apply(lambda r: 1 << int(r))).all()
    # The raw HLL estimate from the merged registers lands within 3 standard
    # errors (1.04/sqrt(m)) of the true distinct count — the published bound.
    m = 64
    all_rows = pdf[pdf.grp == "ALL"]
    # Sum in python ints: 64 terms of up to 2^59 overflow pandas int64.
    s = float(sum(int(t) for t in all_rows.pow2_term)) / float(1 << 59)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / s
    # Published small-range correction: below 2.5m, linear counting over
    # the empty-register count is the estimator.
    zeros = int((all_rows.register == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    true = duckdb.sql(
        f"SELECT count(DISTINCT o_custkey) FROM '{SF_SMALL}/orders.parquet'"
    ).fetchone()[0]
    assert abs(est - true) / true < 3 * 1.04 / math.sqrt(m)


def test_stump_matches_brute_force(spark):
    got = registry.QUERIES["ml_decision_stump_gini"](spark, SF_SMALL).toPandas()
    src = duckdb.sql(
        f"""SELECT CAST(floor(o_totalprice * 100) AS BIGINT) // {_BUCKET_CENTS}
                   AS bucket,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
            FROM '{SF_SMALL}/orders.parquet'"""
    ).df()
    hist = src.groupby("bucket").agg(n=("y", "size"), pos=("y", "sum")).sort_index()
    nn, pp = int(hist.n.sum()), int(hist.pos.sum())
    best = None
    a = pl = 0
    for bucket, row in hist.iterrows():
        a += int(row.n)
        pl += int(row.pos)
        b, pr = nn - a, pp - pl
        if b == 0:
            continue
        score = (pl * pl + (a - pl) ** 2) / a + (pr * pr + (b - pr) ** 2) / b
        if best is None or score > best[0] + 1e-12:
            best = (score, bucket, a, pl, b, pr)
    assert int(got.threshold_cents.iloc[0]) == (best[1] + 1) * _BUCKET_CENTS
    assert int(got.n_left.iloc[0]) == best[2]
    assert int(got.pos_left.iloc[0]) == best[3]
    # The emitted exact fraction reproduces the float score.
    num, den = int(got.score_num.iloc[0]), int(got.score_den.iloc[0])
    assert abs(num / den - best[0]) < 1e-9


def test_dynamic_overwrite_preserves_other_partitions(spark):
    pdf = registry.QUERIES["partition_overwrite_dynamic"](spark, SF_SMALL).toPandas()
    # All five priority partitions survive the single-partition overwrite —
    # STATIC mode would have truncated to one.
    assert len(pdf) == 5
    path = scratch_dir("orders_dynover", SF_SMALL)
    dirs = [d for d in os.listdir(path) if d.startswith("o_orderpriority=")]
    assert len(dirs) == 5
    # The urgent partition carries the restated (doubled) prices.
    src = duckdb.sql(
        f"""SELECT round(CAST(sum(CAST(o_totalprice + o_totalprice
                                       AS DECIMAL(18,2))) AS DOUBLE), 2)
            FROM '{SF_SMALL}/orders.parquet'
            WHERE o_orderpriority = '1-URGENT'"""
    ).fetchone()[0]
    urgent = pdf[pdf.o_orderpriority == "1-URGENT"].sum_price.iloc[0]
    assert abs(urgent - src) < 0.01


def test_hll_bloom_schemas_are_driver_safe():
    # Both queries return flat scalar columns only (registry enforcement
    # happens at call time; this pins the intent at import time too).
    assert "sketch_hll_exact_registers" in registry.ORACLES
    assert "sketch_bloom_membership" in registry.ORACLES
    assert "ml_decision_stump_gini" in registry.ORACLES
    assert "xml_scan_roundtrip" in registry.ORACLES
    assert "partition_overwrite_dynamic" in registry.ORACLES


def test_iblt_recovers_exact_symmetric_difference(spark):
    got = registry.QUERIES["sketch_iblt_diff"](spark, SF_SMALL).toPandas()
    a = duckdb.sql(
        f"SELECT o_orderkey AS k FROM '{SF_SMALL}/orders.parquet'"
    ).df()
    a_keys = set(int(k) for k in a.k)
    deleted = {k for k in a_keys if k < 600 and k % 7 == 3}
    inserted = {1000000000000 + 37 * i for i in range(1, 51)}
    # FULL recovery within the unrolled peel rounds: the derived diff
    # (~136 keys) is far under the 2048-cell budget, so every key decodes.
    rec_deleted = set(int(k) for k in got[got.side == 1].key)
    rec_inserted = set(int(k) for k in got[got.side == -1].key)
    assert rec_deleted == deleted
    assert rec_inserted == inserted
    assert len(got) == len(deleted) + len(inserted)


def test_bitmap_rollup_matches_pandas_distinct(spark):
    """Third implementation: pandas nunique per week/day, plus a direct
    python bitmap build for the xor checksum."""
    import pandas as pd

    from etl_cotrip_signs_spark.operators.sketches3 import (
        agg_bitmap_distinct_rollup,
    )

    out = (
        agg_bitmap_distinct_rollup(spark, SF_SMALL)
        .toPandas()
        .set_index("week")
        .sort_index()
    )
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    day = (ev.ts.dt.floor("D") - pd.Timestamp("1970-01-01")).dt.days
    df = pd.DataFrame({"week": day // 7, "day": day, "u": ev.user_id})
    for week, g in df.groupby("week"):
        row = out.loc[week]
        assert row["distinct_users_merged"] == g.u.nunique()
        assert row["n_days_active"] == g.day.nunique()
        assert row["day_distinct_sum"] == g.groupby("day").u.nunique().sum()
        words: dict[int, int] = {}
        for u in g.u.unique():
            words[u // 63] = words.get(u // 63, 0) | (1 << (u % 63))
        xor = 0
        for w in words.values():
            xor ^= w
        assert row["bitmap_xor"] == xor
