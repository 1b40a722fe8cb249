"""Pins for wave 50: McNemar's 2x2 accounting, runs-test z vs the
closed form, hapax identities, and median-of-means robustness axioms."""

from __future__ import annotations

import math

import pandas as pd

from etl_cotrip_signs_spark.operators.robust_stats import (
    _MOM_K,
    agg_median_of_means,
)
from etl_cotrip_signs_spark.operators.stats3 import (
    stat_mcnemar_test,
    stat_runs_test,
)
from etl_cotrip_signs_spark.operators.text import text_hapax_ratio

from .conftest import SF_SMALL


def test_mcnemar_table_accounting(spark):
    row = stat_mcnemar_test(spark, SF_SMALL).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    split = pd.Timestamp("2024-01-16")
    big = ev.event_type.eq("purchase") & (ev.value > 280)
    per = ev.assign(
        p1=(big & (ev.ts < split)), p2=(big & (ev.ts >= split))
    ).groupby("user_id")[["p1", "p2"]].any()
    a = int((per.p1 & per.p2).sum())
    b = int((per.p1 & ~per.p2).sum())
    c = int((~per.p1 & per.p2).sum())
    d = int((~per.p1 & ~per.p2).sum())
    assert (row.a, row.b, row.c, row.d) == (a, b, c, d)
    assert row.n_users == a + b + c + d == per.shape[0]
    assert b + c > 0, "fixture must keep discordant mass in play"
    chi2 = (abs(b - c) - 1.0) ** 2 / (b + c)
    assert math.isclose(row.chi2_cc, round(chi2, 6), abs_tol=1e-9)


def test_runs_test_matches_python(spark):
    row = stat_runs_test(spark, SF_SMALL).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    orders["cents"] = (orders.o_totalprice * 100).apply(math.floor)
    daily = (
        orders.groupby(pd.to_datetime(orders.o_orderdate).dt.date)
        .cents.sum()
        .sort_index()
    )
    med = sorted(daily)[(len(daily) - 1) // 2]
    signs = [1 if x > med else 0 for x in daily if x != med]
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n1, n2 = sum(signs), len(signs) - sum(signs)
    assert (row.r_runs, row.n1, row.n2) == (runs, n1, n2)
    n = n1 + n2
    mu = 2 * n1 * n2 / n + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    assert math.isclose(
        row.z_runs, round((runs - mu) / math.sqrt(var), 6), abs_tol=1e-9
    )


def test_hapax_identities(spark):
    out = text_hapax_ratio(spark, SF_SMALL).toPandas()
    assert (out.n_hapax <= out.n_types).all()
    assert (out.n_types <= out.n_tokens).all()
    assert (out.hapax_type_ppm == out.n_hapax * 1_000_000 // out.n_types).all()
    assert (out.ttr_ppm == out.n_types * 1_000_000 // out.n_tokens).all()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    s0 = out.iloc[0]
    toks = [
        t
        for txt in docs[docs.source == s0.source].text
        for t in txt.strip().split(" ")
        if t
    ]
    counts = pd.Series(toks).value_counts()
    assert s0.n_tokens == len(toks)
    assert s0.n_types == len(counts)
    assert s0.n_hapax == int((counts == 1).sum())
    assert s0.n_dis_legomena == int((counts == 2).sum())


def test_median_of_means_axioms(spark):
    row = agg_median_of_means(spark, SF_SMALL).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    cents = (orders.o_totalprice * 100).apply(math.floor)
    assert row.n_rows == len(orders)
    assert row.k_buckets == _MOM_K
    assert row.plain_mean_milli == int(cents.sum()) * 1000 // len(orders)
    # MoM lies within the bucket-mean range, which lies within data range
    assert cents.min() * 1000 <= row.mom_milli <= cents.max() * 1000
    # on this clean fixture the two estimators should agree within 5%
    assert abs(row.mom_vs_mean_ppm) < 50_000
