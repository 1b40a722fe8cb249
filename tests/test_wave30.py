"""Pins for the round-6 wave-30 operators: the cogroup as-of kernel
against a pure-pandas whole-table replay, the kNN classifier's vote
algebra, and the parameterized-SQL template against its static twin."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from etl_cotrip_signs_spark.operators.arrow_ops import cogroup_asof_interp
from etl_cotrip_signs_spark.operators.ml_basic import ml_knn_classifier_exact
from etl_cotrip_signs_spark.operators.spark4_surface import (
    sql_identifier_parameterized,
)

from .conftest import SF_SMALL


def test_cogroup_asof_matches_pandas_replay(spark):
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    micros = ev.ts.astype("datetime64[us]").astype("int64")
    p = pd.DataFrame(
        {"user_id": ev.user_id, "t": micros}
    )[ev.event_type.to_numpy() == "purchase"]
    c = pd.DataFrame(
        {"user_id": ev.user_id, "t": micros}
    )[ev.event_type.to_numpy() == "click"]

    out = (
        cogroup_asof_interp(spark, SF_SMALL)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert out.n_purchases.sum() == len(p)
    clicks_by_user = {u: np.sort(g.t.to_numpy()) for u, g in c.groupby("user_id")}
    for uid, g in p.groupby("user_id"):
        ts = np.sort(g.t.to_numpy())
        cl = clicks_by_user.get(uid, np.array([], dtype=np.int64))
        idx = np.searchsorted(cl, ts, side="right") - 1
        matched = idx >= 0
        gaps = ts[matched] - cl[idx[matched]]
        assert out.loc[uid, "n_purchases"] == len(ts)
        assert out.loc[uid, "n_matched"] == int(matched.sum())
        assert out.loc[uid, "sum_gap_us"] == int(gaps.sum()) if matched.any() else out.loc[uid, "sum_gap_us"] == 0
        if matched.any():
            assert out.loc[uid, "max_gap_us"] == int(gaps.max())


def test_knn_classifier_vote_algebra(spark):
    out = ml_knn_classifier_exact(spark, SF_SMALL).toPandas()
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    assert len(out) == min(20, (emb.vec_id < 20).sum())
    # votes bounded by k, prediction label exists in the corpus labels
    assert out.n_votes.between(1, 5).all()
    corpus_labels = set(emb[emb.vec_id >= 20].label)
    assert set(out.pred_label) <= corpus_labels
    # replay one query end-to-end in numpy
    q = emb[emb.vec_id == 0].iloc[0]
    corp = emb[emb.vec_id >= 20].reset_index(drop=True)
    qv = np.array(q.embedding, dtype=np.float64)
    cv = np.vstack(corp.embedding.map(lambda v: np.array(v, dtype=np.float64)))
    cos = np.round(
        (cv @ qv) / (np.linalg.norm(cv, axis=1) * np.linalg.norm(qv)), 5
    )
    order = sorted(
        range(len(corp)), key=lambda i: (-cos[i], corp.vec_id.iloc[i])
    )[:5]
    votes: dict[int, int] = {}
    for i in order:
        votes[int(corp.label.iloc[i])] = votes.get(int(corp.label.iloc[i]), 0) + 1
    pred = min(votes, key=lambda l: (-votes[l], l))
    row = out[out.query_id == 0].iloc[0]
    assert row.pred_label == pred
    assert row.n_votes == votes[pred]


def test_parameterized_sql_equals_static(spark):
    out = (
        sql_identifier_parameterized(spark, SF_SMALL)
        .toPandas()
        .set_index("o_orderpriority")
        .sort_index()
    )
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    for prio in ("1-URGENT", "2-HIGH"):
        sub = orders[orders.o_orderpriority == prio]
        assert out.loc[prio, "n_orders"] == len(sub)
        cents = (sub.o_totalprice * 100).round().astype("int64").sum()
        assert out.loc[prio, "sum_cents"] == cents
