"""Pins for wave 39: LSH S-curve monotonicity, LISTAGG determinism,
Friedman exact-rank replay, and shard-plan contiguity invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etl_cotrip_signs_spark.operators.dedup import dedup_minhash_band_tuning
from etl_cotrip_signs_spark.operators.pipeline_ops import (
    _SHARD_BUDGET_BYTES,
    _SHARD_OVERHEAD,
    multimodal_shard_pack,
)
from etl_cotrip_signs_spark.operators.spark4_surface import (
    agg_listagg_ordered,
)
from etl_cotrip_signs_spark.operators.stats3 import stat_friedman_test

from .conftest import SF_SMALL


def test_band_tuning_scurve_monotone(spark):
    out = (
        dedup_minhash_band_tuning(spark, SF_SMALL)
        .toPandas()
        .set_index("config")
    )
    # more bands / fewer rows per band => weakly more candidates (recall
    # direction) — the S-curve's defining monotonicity
    assert (
        out.loc["b16r1", "n_candidates"]
        >= out.loc["b8r2", "n_candidates"]
        >= out.loc["b4r4", "n_candidates"]
    )
    # verified pairs can never exceed candidates
    assert (out.n_verified <= out.n_candidates).all()
    # the b8r2 config is the shipping dedup_minhash_docs layout: its
    # verified count must equal that query's pair count
    from etl_cotrip_signs_spark.operators.dedup import dedup_minhash_docs

    shipped = dedup_minhash_docs(spark, SF_SMALL).count()
    assert int(out.loc["b8r2", "n_verified"]) == shipped


def test_listagg_is_sorted_and_distinct(spark):
    out = agg_listagg_ordered(spark, SF_SMALL).toPandas()
    for _, r in out.iterrows():
        pris = r.priorities.split(",")
        assert pris == sorted(pris)
        assert len(pris) == len(set(pris)) == r.n_priorities


def test_friedman_q_numpy_replay(spark):
    out = stat_friedman_test(spark, SF_SMALL).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev = ev.assign(
        blk=(pd.to_datetime(ev.ts).dt.normalize()
             - pd.Timestamp("1970-01-01")).dt.days // 7,
        v=np.floor(ev.value.to_numpy() * 1000).astype(np.int64),
    )
    cells = ev.groupby(["blk", "event_type"], as_index=False).v.sum()
    k = cells.event_type.nunique()
    complete = cells.groupby("blk").size()
    complete = set(complete[complete == k].index)
    cells = cells[cells.blk.isin(complete)]
    # doubled midranks within block
    cells["dr"] = cells.groupby("blk").v.rank(method="average") * 2
    dr_t = cells.groupby("event_type").dr.sum()
    n = len(complete)
    sum_dr2 = float((dr_t**2).sum())
    q = 3.0 * sum_dr2 / (n * k * (k + 1)) - 3.0 * n * (k + 1)
    assert int(out.n_blocks) == n
    assert int(out.sum_dr2) == int(sum_dr2)
    assert abs(out.q_stat - q) < 1e-9 * max(1.0, abs(q))


def test_shard_plan_contiguous_and_budgeted(spark):
    out = (
        multimodal_shard_pack(spark, SF_SMALL)
        .toPandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    assert out.n_docs.sum() == len(docs)
    # contiguity: shard id ranges ascend and never overlap
    assert (out.first_doc <= out.last_doc).all()
    assert (out.last_doc.iloc[:-1].to_numpy()
            < out.first_doc.iloc[1:].to_numpy()).all()
    # budget: every shard except possibly the last holds >= budget only
    # via its final doc (next-fit: bytes-before-last < budget)
    sizes = docs.assign(
        b=docs.text.str.encode("utf-8").str.len() + _SHARD_OVERHEAD
    ).set_index("doc_id").b
    for _, r in out.iterrows():
        assert r.bytes == sizes.loc[r.first_doc : r.last_doc].sum()


def test_minhash_signatures_stable_across_plan_builds(spark):
    """Two independent plan builds must produce identical signatures —
    pins the _mh_perm factory fix (a defaulted lambda param made PySpark
    pass the array index as the seed discriminator, so signatures used
    to vary with the session's fresh-variable counter)."""
    from etl_cotrip_signs_spark.functions.xxh64_ref import xxh64
    from etl_cotrip_signs_spark.functions.xxh64_sql import chain_seed
    from etl_cotrip_signs_spark.io import load_table
    from etl_cotrip_signs_spark.operators.dedup import (
        hashed_shingles,
        minhash_signatures,
    )

    docs = load_table(spark, SF_SMALL, "documents").filter("doc_id < 20")
    a = minhash_signatures(docs).toPandas().sort_values("doc_id")
    b = minhash_signatures(docs).toPandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    # and they equal the documented chain: min over xxh64(le8(h), mh_i)
    hs = (
        hashed_shingles(docs)
        .filter("doc_id = 0")
        .select("hs")
        .collect()[0]["hs"]
    )

    def long_hash(x, seed):
        h = xxh64((x & ((1 << 64) - 1)).to_bytes(8, "little"), seed)
        return h - (1 << 64) if h >= (1 << 63) else h

    for i in (0, 7, 15):
        want = min(long_hash(h, chain_seed(f"mh{i}")) for h in hs)
        assert int(a[a.doc_id == 0][f"mh_{i}"].iloc[0]) == want
