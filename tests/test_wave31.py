"""Pins for the round-6 wave-31 operators: temperature mixing's budget
identity, assortativity against networkx-free numpy moments, with-ties
semantics, and the changepoint against a numpy SSE scan."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from etl_cotrip_signs_spark.operators.graph import graph_degree_assortativity
from etl_cotrip_signs_spark.operators.pipeline_ops import (
    mix_temperature_sampling,
)
from etl_cotrip_signs_spark.operators.relational4 import window_topk_with_ties
from etl_cotrip_signs_spark.operators.timeseries import (
    events_changepoint_argmax,
)

from .conftest import SF_SMALL


def test_temperature_mix_budget_and_flattening(spark):
    out = mix_temperature_sampling(spark, SF_SMALL).toPandas()
    # the LRM identity: allocations sum EXACTLY to the budget
    assert out.final_alloc.sum() == 10000
    # tau=0.5 flattens: the largest domain's allocation share must be
    # strictly below its document share; the smallest's strictly above
    out["doc_share"] = out.n_docs / out.n_docs.sum()
    out["alloc_share"] = out.final_alloc / 10000
    big = out.loc[out.n_docs.idxmax()]
    small = out.loc[out.n_docs.idxmin()]
    assert big.alloc_share < big.doc_share
    assert small.alloc_share > small.doc_share
    # weights replay: milli_w = floor(sqrt(n) * 1000)
    for _, r in out.iterrows():
        assert r.milli_w == math.floor(math.sqrt(r.n_docs) * 1000)


def test_assortativity_moment_identity(spark):
    row = graph_degree_assortativity(spark, SF_SMALL).toPandas().iloc[0]
    n, sx, sxx, sxy = (
        row.n_directed_edges,
        row.sx,
        row.sxx,
        row.sxy,
    )
    r = (n * sxy - sx * sx) / (n * sxx - sx * sx)
    assert abs(row.assortativity - r) < 1e-12
    assert -1.0 <= row.assortativity <= 1.0
    # directed edge count is even (every undirected edge twice)
    assert n % 2 == 0


def test_with_ties_dominates_exact(spark):
    out = window_topk_with_ties(spark, SF_SMALL).toPandas()
    assert (out.n_with_ties >= out.n_exact).all()
    assert (out.n_exact <= 3).all()
    assert (out.kth_band <= out.top_band).all()
    # banding on thousand-dollar buckets makes ties certain at sf0.001
    assert (out.n_with_ties > 3).any()


def test_changepoint_matches_numpy_scan(spark):
    row = events_changepoint_argmax(spark, SF_SMALL).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    p = ev[ev.event_type == "purchase"].copy()
    p["day"] = (
        pd.to_datetime(p.ts).dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days
    p["v"] = np.floor(p.value.to_numpy() * 1000).astype(np.int64)
    daily = p.groupby("day").v.sum().sort_index()
    vals = daily.to_numpy(dtype=np.int64)
    days = daily.index.to_numpy()
    s = vals.sum()
    n = len(vals)
    s1 = np.cumsum(vals)[:-1].astype(np.float64)
    n1 = np.arange(1, n, dtype=np.float64)
    j = s1 * s1 / n1 + (s - s1) ** 2 / (n - n1) - float(s) ** 2 / n
    best = int(np.lexsort((days[:-1], -j))[0])
    assert row.split_after_day == days[best]
    assert row.n_left == best + 1
    assert row.sum_left_milli == int(np.cumsum(vals)[best])
    assert abs(row.j_stat - j[best]) < 1e-6 * max(1.0, abs(j[best]))
