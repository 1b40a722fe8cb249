"""Pins for the round-6 wave-32 operators: confusion-matrix identities,
entropy against numpy, and partition-evolution generation mixing."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etl_cotrip_signs_spark.operators.lakehouse import partition_evolution_read
from etl_cotrip_signs_spark.operators.stats3 import events_type_entropy
from etl_cotrip_signs_spark.operators.text import text_langid_confusion

from .conftest import SF_SMALL


def test_confusion_matrix_identities(spark):
    out = text_langid_confusion(spark, SF_SMALL).toPandas()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    # cells partition the corpus
    assert out.n_docs.sum() == len(docs)
    # per-class ppm shares sum to ~1e6 (floor division loses < k ppm)
    for lang, g in out.groupby("lang"):
        assert g.n_docs.sum() == (docs.lang == lang).sum()
        assert 1_000_000 - len(g) < g.class_ppm.sum() <= 1_000_000


def test_entropy_matches_numpy(spark):
    row = events_type_entropy(spark, SF_SMALL).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    counts = ev.event_type.value_counts()
    p = counts.to_numpy() / counts.sum()
    h = float(-(p * np.log(p)).sum())
    assert row.n == len(ev)
    assert abs(row.entropy_nats - h) < 1e-9
    assert abs(row.perplexity - np.exp(h)) < 1e-6
    assert 0.0 <= row.entropy_normalized <= 1.0


def test_partition_evolution_mixes_generations(spark):
    out = partition_evolution_read(spark, SF_SMALL).toPandas()
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    sub = orders[orders.o_orderkey % 11 == 0]
    assert out.n_rows.sum() == len(sub)
    per = sub.groupby("o_orderpriority").o_orderkey.count()
    for _, r in out.iterrows():
        assert r.n_rows == per[r.o_orderpriority]
    # both physical generations contribute rows (parity split is non-empty
    # on both sides at this sf)
    assert (sub.o_orderkey % 2 == 0).any() and (sub.o_orderkey % 2 == 1).any()
