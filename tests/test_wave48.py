"""Pins for wave 48: audio frame features vs a pure-python PCM replay,
image pooling identities, count-vectorizer axioms, entropy-rate bounds,
and densest-peel density dominance."""

from __future__ import annotations

import math

import pandas as pd

from etl_cotrip_signs_spark.functions.xxh64_ref import xxh64
from etl_cotrip_signs_spark.operators.features import (
    feature_count_vectorizer_df,
)
from etl_cotrip_signs_spark.operators.graph import (
    graph_densest_subgraph_peel,
)
from etl_cotrip_signs_spark.operators.pipeline_ops import (
    _AF_FRAME,
    _AF_SAMPLES,
    _AF_STRIDE,
    _IT_DIM,
    _IT_STRIDE,
    _IT_TILE,
    multimodal_audio_frames,
    multimodal_image_tiles_pool,
)
from etl_cotrip_signs_spark.operators.stats3 import (
    _ETYPES,
    events_entropy_rate_markov,
)

from .conftest import SF_SMALL


def _h64_long(x: int) -> int:
    """xxhash64 of a Spark LongType cell (little-endian 8 bytes, seed 42)."""
    return xxh64(int(x).to_bytes(8, "little", signed=True), 42)


def test_audio_frames_match_python_pcm(spark):
    out = multimodal_audio_frames(spark, SF_SMALL).toPandas()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    doc_ids = sorted(d for d in docs.doc_id if d % 50 == 0)
    assert sorted(out.doc_id.unique()) == doc_ids
    d0 = doc_ids[0]
    pcm = [
        _h64_long(d0 * _AF_STRIDE + i) % 65536 - 32768
        for i in range(_AF_SAMPLES)
    ]
    for frame in range(_AF_SAMPLES // _AF_FRAME):
        seg = pcm[frame * _AF_FRAME : (frame + 1) * _AF_FRAME]
        row = out[(out.doc_id == d0) & (out.frame == frame)].iloc[0]
        assert row.n_samples == _AF_FRAME
        assert row.energy == sum(s * s for s in seg)
        assert row.peak == max(abs(s) for s in seg)
        zc = sum(
            1
            for a, b in zip(seg, seg[1:])
            if (a >= 0) != (b >= 0)
        )
        assert row.zero_crossings == zc


def test_image_tiles_pool_identities(spark):
    out = multimodal_image_tiles_pool(spark, SF_SMALL).toPandas()
    n_tiles = (_IT_DIM // _IT_TILE) ** 2
    per_doc = out.groupby("doc_id").size()
    assert (per_doc == n_tiles).all()
    # integer average-pool identity + 8-bit range
    assert (out.pooled_mean == out.tile_sum // (_IT_TILE * _IT_TILE)).all()
    assert (out.tile_min >= 0).all() and (out.tile_max <= 255).all()
    assert (out.tile_min <= out.pooled_mean).all()
    assert (out.pooled_mean <= out.tile_max).all()
    # one tile replayed in pure python
    d0 = int(out.doc_id.min())
    vals = [
        _h64_long(d0 * _IT_STRIDE + p) % 256
        for p in range(_IT_DIM * _IT_DIM)
        if (p // _IT_DIM) < _IT_TILE and (p % _IT_DIM) < _IT_TILE
    ]
    r = out[
        (out.doc_id == d0) & (out.tile_row == 0) & (out.tile_col == 0)
    ].iloc[0]
    assert r.tile_sum == sum(vals)
    assert r.tile_min == min(vals) and r.tile_max == max(vals)


def test_count_vectorizer_axioms(spark):
    out = feature_count_vectorizer_df(spark, SF_SMALL).toPandas()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    # every doc on this fixture contains at least one frequent token
    assert len(out) == len(docs)
    assert (out.n_vocab_terms >= 1).all()
    assert (out.total_count >= out.n_vocab_terms).all()
    # checksum >= sum of vocab ids (each kept term contributes id*cnt >= id)
    assert (out.vector_checksum >= out.n_vocab_terms).all()


def test_entropy_rate_bounds(spark):
    row = events_entropy_rate_markov(spark, SF_SMALL).toPandas().iloc[0]
    k = len(_ETYPES)
    assert 0.0 <= row.h_rate_nats <= math.log(k) + 1e-9
    assert math.isclose(row.perplexity_rate, math.exp(row.h_rate_nats), rel_tol=1e-9)
    assert math.isclose(
        row.h_rate_normalized, row.h_rate_nats / math.log(k), rel_tol=1e-9
    )
    assert row.n_total == row[[f"r{i}" for i in range(1, 6)]].sum()


def test_densest_peel_density_dominates_round0(spark):
    row = graph_densest_subgraph_peel(spark, SF_SMALL).toPandas().iloc[0]
    assert row.converged
    assert 1 <= row.rounds_total <= 64
    assert 0 <= row.best_round < row.rounds_total
    assert row.density_ppm == row.n_edges * 1_000_000 // row.n_vertices
    # the winner dominates the full graph's density by construction
    from etl_cotrip_signs_spark.operators.similarity import (
        similarity_threshold_pairs,
    )

    e = similarity_threshold_pairs(spark, SF_SMALL).toPandas()
    nv = len(set(e.vec_a) | set(e.vec_b))
    assert row.density_ppm >= len(e) * 1_000_000 // nv
