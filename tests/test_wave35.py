"""Pins for wave 35: streaming MinHash slice-independence + python hash
replay, and JSD against scipy-free numpy."""

from __future__ import annotations

import shutil

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from etl_cotrip_signs_spark.functions.xxh64_ref import xxh64
from etl_cotrip_signs_spark.functions.xxh64_sql import chain_seed
from etl_cotrip_signs_spark.operators.stats3 import drift_jsd_events
from etl_cotrip_signs_spark.session import scratch_dir
from etl_cotrip_signs_spark.streaming.queries import (
    _MH_K,
    make_minhash_merge_fn,
)

from .conftest import SF_SMALL


def _events(spark):
    from etl_cotrip_signs_spark.io import load_table

    return load_table(spark, SF_SMALL, "events").select("ts", "user_id")


def _signatures(spark, tag, slices):
    base = scratch_dir(tag, SF_SMALL)
    shutil.rmtree(base, ignore_errors=True)
    merge, read_ptr = make_minhash_merge_fn(base)
    for bid, df in enumerate(slices):
        merge(df, bid)
    sig = spark.read.parquet(read_ptr()["dir"]).toPandas()
    return sig.sort_values(["week", "k"]).reset_index(drop=True)


def test_minhash_slice_independent_and_replays_python(spark):
    ev = _events(spark)
    one = _signatures(spark, "mh_test_one", [ev])
    two = _signatures(
        spark,
        "mh_test_two",
        [ev.filter(F.col("user_id") % 2 == 0), ev.filter(F.col("user_id") % 2 == 1)],
    )
    pd.testing.assert_frame_equal(one, two)

    # python replay of one (week, k) cell from the raw parquet
    pdf = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    days = (
        pd.to_datetime(pdf.ts).dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days
    pdf = pdf.assign(week=days // 7)
    wk = int(one.week.iloc[0])
    users = pdf[pdf.week == wk].user_id.unique()
    for k in (0, _MH_K - 1):
        seed = chain_seed(f"mh{k}")
        hs = []
        for u in users:
            h = xxh64(int(u).to_bytes(8, "little", signed=True), seed)
            if h >= 1 << 63:
                h -= 1 << 64
            hs.append(h)
        expect = min(hs)
        got = int(one[(one.week == wk) & (one.k == k)].sig.iloc[0])
        assert got == expect


def test_jsd_matches_numpy(spark):
    row = drift_jsd_events(spark, SF_SMALL).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    early = pd.to_datetime(ev.ts).dt.date < pd.Timestamp("2024-01-16").date()
    types = ["click", "error", "purchase", "signup", "view"]
    a = np.array([(early & (ev.event_type == t)).sum() for t in types], float)
    b = np.array([(~early & (ev.event_type == t)).sum() for t in types], float)
    p, q = a / a.sum(), b / b.sum()
    m = (p + q) / 2

    def _h(x, y):
        mask = x > 0
        return float((x[mask] / 2 * np.log(x[mask] / y[mask])).sum())

    jsd = _h(p, m) + _h(q, m)
    assert row.na == int(a.sum()) and row.nb == int(b.sum())
    assert abs(row.jsd_nats - jsd) < 1e-12
    assert 0.0 <= row.jsd_nats <= np.log(2) + 1e-12
    assert abs(row.js_distance - np.sqrt(jsd)) < 1e-9


def test_prefix_recall_numpy_replay(spark):
    from etl_cotrip_signs_spark.operators.similarity import (
        embedding_prefix_recall,
    )

    out = (
        embedding_prefix_recall(spark, SF_SMALL)
        .toPandas()
        .set_index("query_id")
        .sort_index()
    )
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    q = emb[emb.vec_id < 20]
    c = emb[emb.vec_id >= 20].reset_index(drop=True)
    cv = np.vstack(c.embedding.map(lambda v: np.array(v, float)))

    def top5(qv, dims):
        a, b = qv[:dims], cv[:, :dims]
        cos = np.round(
            (b @ a) / (np.linalg.norm(b, axis=1) * np.linalg.norm(a)), 5
        )
        order = sorted(range(len(c)), key=lambda i: (-cos[i], c.vec_id.iloc[i]))
        return {int(c.vec_id.iloc[i]) for i in order[:5]}

    for _, row in q.iterrows():
        qv = np.array(row.embedding, float)
        full, pref = top5(qv, 64), top5(qv, 16)
        assert out.loc[int(row.vec_id), "n_overlap_top5"] == len(full & pref)
    assert out.n_overlap_top5.between(0, 5).all()


def test_share_of_parent_identities(spark):
    from etl_cotrip_signs_spark.operators.relational4 import (
        rollup_share_of_parent,
    )

    out = rollup_share_of_parent(spark, SF_SMALL).toPandas()
    # per-region nation shares sum to <= 1e6 with floor remainder < k
    for region, g in out.groupby("region"):
        assert 1_000_000 - len(g) < g.share_of_region_ppm.sum() <= 1_000_000
        # every nation in a region reports the SAME region share
        assert g.region_share_of_total_ppm.nunique() == 1
    # region shares (deduped) also sum to <= 1e6
    rs = out.groupby("region").region_share_of_total_ppm.first()
    assert 1_000_000 - len(rs) < rs.sum() <= 1_000_000
    # cents reconcile with the raw tables
    import pandas as pd

    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    total_cents = (
        (orders.o_totalprice * 100).round().astype("int64").sum()
    )
    assert out.cents.sum() == total_cents
