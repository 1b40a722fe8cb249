"""Pins for wave 41: BH step-up arithmetic, BM25 numpy replay, bloom-join
false-positive accounting, Hurst R/S block physics, Neyman apportionment
invariants, and vacuum-plan retention monotonicity."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from etl_cotrip_signs_spark.operators.lakehouse import table_vacuum_plan
from etl_cotrip_signs_spark.operators.selection import (
    _NEY_T,
    sample_stratified_neyman,
)
from etl_cotrip_signs_spark.operators.sketches3 import join_bloom_pruned
from etl_cotrip_signs_spark.operators.stats3 import stat_benjamini_hochberg
from etl_cotrip_signs_spark.operators.text import text_bm25_topk
from etl_cotrip_signs_spark.operators.timeseries import (
    _HURST_NS,
    events_hurst_rs,
)

from .conftest import SF_SMALL


def test_bh_stepup_arithmetic(spark):
    out = stat_benjamini_hochberg(spark, SF_SMALL).toPandas()
    m = len(out)
    assert sorted(out.p_rank) == list(range(1, m + 1))
    # re-run the step-up in plain python on the emitted rounded p's
    ranked = out.sort_values("p_rank")
    hits = [
        r.p_rank
        for r in ranked.itertuples()
        if r.p_approx * m * 10 <= r.p_rank  # q = 0.10
    ]
    kstar = max(hits) if hits else 0
    assert (ranked.rejected == (ranked.p_rank <= kstar).astype(int)).all()
    # rejection set is a prefix of the p-ranking (step-up property)
    rej = ranked[ranked.rejected == 1].p_rank.tolist()
    assert rej == list(range(1, len(rej) + 1))


def test_bm25_numpy_replay(spark):
    out = text_bm25_topk(spark, SF_SMALL).toPandas()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    toks = docs.text.str.strip().str.split()
    tf: dict[tuple[int, str], int] = {}
    total: dict[str, int] = {}
    df: dict[str, int] = {}
    for doc_id, words in zip(docs.doc_id, toks):
        seen = {}
        for w in words:
            seen[w] = seen.get(w, 0) + 1
        for w, c in seen.items():
            tf[(doc_id, w)] = c
            total[w] = total.get(w, 0) + c
            df[w] = df.get(w, 0) + 1
    qterms = sorted(total, key=lambda w: (-total[w], w))[:3]
    n_docs = len(docs)
    avgdl = sum(len(w) for w in toks) / n_docs
    k1, b = 1.2, 0.75
    scores = {}
    for doc_id, words in zip(docs.doc_id, toks):
        s, nm = 0.0, 0
        for q in qterms:
            t = tf.get((doc_id, q), 0)
            if t == 0:
                continue
            nm += 1
            idf = math.log(1.0 + (n_docs - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * (t * (k1 + 1)) / (t + k1 * (1 - b + b * len(words) / avgdl))
        if nm:
            scores[doc_id] = (round(s, 6), nm)
    top = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
    assert [d for d, _ in top] == out.doc_id.tolist()
    assert [s for _, (s, _) in top] == [round(v, 6) for v in out.score_bm25]
    assert [n for _, (_, n) in top] == out.n_terms_matched.tolist()


def test_bloom_join_accounting(spark):
    r = join_bloom_pruned(spark, SF_SMALL).toPandas().iloc[0]
    # zero false negatives: every matched row passed the bloom
    assert r.n_matched <= r.n_bloom_pass
    assert r.n_false_pos == r.n_bloom_pass - r.n_matched
    assert r.n_bloom_pass <= r.n_probe_rows
    # exact join ground truth
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    urgent = set(orders[orders.o_orderpriority == "1-URGENT"].o_orderkey)
    matched = li[li.l_orderkey.isin(urgent)]
    assert r.n_matched == len(matched)
    assert r.matched_cents == int(
        np.floor(matched.l_extendedprice.to_numpy() * 100).astype(np.int64).sum()
    )
    assert r.n_build_keys == len(urgent)


def test_hurst_block_counts(spark):
    out = events_hurst_rs(spark, SF_SMALL).toPandas().set_index("block_n")
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    n_days = orders.o_orderdate.astype("datetime64[ns]").dt.normalize().nunique()
    for n in _HURST_NS:
        assert out.loc[n, "n_blocks"] == n_days // n
        # R/S is nonnegative and the mean matches the integer-sum identity
        assert out.loc[n, "rs_sum_micro"] >= 0
        assert out.loc[n, "rs_mean"] == round(
            out.loc[n, "rs_sum_micro"] / out.loc[n, "n_blocks"] / 1e6, 6
        )
    # E[R/S] grows with n (any H > 0 series) — weak sanity, strict here
    means = [out.loc[n, "rs_mean"] for n in _HURST_NS]
    assert means == sorted(means)


def test_neyman_allocation_invariants(spark):
    out = sample_stratified_neyman(spark, SF_SMALL).toPandas()
    assert out.n_alloc.sum() == _NEY_T
    # sample realized exactly the allocation (no stratum ran short)
    assert (out.sample_n == out.n_alloc.clip(upper=out.n_rows)).all()
    # largest-remainder: every alloc within 1 of the exact share
    w = out.neyman_weight.to_numpy(dtype=float)
    exact = _NEY_T * w / w.sum()
    assert (np.abs(out.n_alloc.to_numpy() - exact) < 1.0 + 1e-9).all()


def test_vacuum_plan_retention_monotone(spark):
    out = table_vacuum_plan(spark, SF_SMALL).toPandas().set_index(
        "retention_versions"
    )
    # tighter retention frees weakly more
    assert (
        out.loc[0, "n_files_deletable"]
        >= out.loc[1, "n_files_deletable"]
        >= out.loc[2, "n_files_deletable"]
    )
    # staged history: f1 (removed v2) + f2 (removed v3) at R=0; only f1
    # at R=1; nothing at R=2
    assert out.n_files_deletable.tolist() == [2, 1, 0]
    assert (out.n_files_deletable + out.n_files_kept == 4).all()
    assert out.loc[2, "bytes_deletable"] == 0 and out.loc[2, "rows_deletable"] == 0
