"""Round-10 wave 56 pins: Good-Turing count-of-counts, per-source KL
divergence, and the watermark-lateness audit against independent
pandas/numpy replays at sf0.001."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd

from .conftest import SF_SMALL


def _token_counts():
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    counts: collections.Counter = collections.Counter()
    per_source: dict = collections.defaultdict(collections.Counter)
    for _, row in d.iterrows():
        toks = [t for t in row.text.strip().split(" ") if t]
        counts.update(toks)
        per_source[row.source].update(toks)
    return counts, per_source


def _trigram_counts():
    d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    counts: collections.Counter = collections.Counter()
    for _, row in d.iterrows():
        a = row.text.strip().split(" ")
        counts.update(
            " ".join(a[i : i + 3]) for i in range(len(a) - 2)
        )
    return counts


def test_good_turing_matches_counter_replay(spark):
    from etl_cotrip_signs_spark.operators.text import text_good_turing

    out = text_good_turing(spark, SF_SMALL).toPandas()
    counts = _trigram_counts()
    coc = collections.Counter(counts.values())
    n_tokens = sum(counts.values())
    n_types = len(counts)
    assert (out.n_tokens == n_tokens).all()
    assert (out.n_types == n_types).all()
    assert (out.p0_ppm == coc[1] * 1_000_000 // n_tokens).all()
    for _, r in out.iterrows():
        assert r.n_r == coc[r.r]
        assert r.n_r_next == coc.get(r.r + 1, 0)
        assert r.r_star_e6 == (r.r + 1) * coc.get(r.r + 1, 0) * 1_000_000 // coc[r.r]
    # every r in 1..8 that exists in the corpus is present
    assert set(out.r) == {r for r in coc if r <= 8}


def test_kl_source_divergence_matches_numpy(spark):
    from etl_cotrip_signs_spark.operators.text import text_kl_source_divergence

    out = text_kl_source_divergence(spark, SF_SMALL).toPandas()
    counts, per_source = _token_counts()
    n = sum(counts.values())
    for _, r in out.iterrows():
        src = per_source[r.source]
        n_s = sum(src.values())
        assert r.n_tokens == n_s
        assert r.n_types == len(src)
        kl = sum(
            c * np.log((c * n) / (n_s * counts[t])) for t, c in src.items()
        ) / n_s
        assert abs(r.kl_nats - kl) < 1e-6
        assert r.kl_e9_sum >= 0  # KL >= 0 with quantization slack absorbed
    # the n_s-weighted average of per-source KLs is the source<->token MI
    tot = out.n_tokens.sum()
    mi = (out.n_tokens * out.kl_nats).sum() / tot
    assert mi >= 0


def test_watermark_lateness_matches_numpy_prefix_max(spark):
    from etl_cotrip_signs_spark.functions.xxh64_ref import xxh64, xxh64_signed
    from etl_cotrip_signs_spark.operators.timeseries import (
        events_watermark_lateness,
    )

    row = events_watermark_lateness(spark, SF_SMALL).collect()[0]
    e = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    t_us = e.ts.astype("datetime64[us]").astype("int64").to_numpy()
    seed = xxh64(b"jit", 42)
    jit = np.array(
        [
            xxh64_signed(int(i).to_bytes(8, "little", signed=True), seed)
            % 120_000_000
            for i in e.event_id
        ]
    )
    arr_us = t_us + jit
    order = np.lexsort((e.event_id.to_numpy(), arr_us))
    t_sorted = t_us[order]
    hwm = np.maximum.accumulate(t_sorted)
    # watermark BEFORE each event = running max over strictly earlier
    # arrivals; the first arrival is never late
    prior = np.concatenate([[t_sorted[0]], hwm[:-1]])
    late = np.maximum(0, prior - t_sorted)
    assert late.max() > 0  # the jitter model produces REAL lateness
    assert row.n_events == len(e)
    assert row.n_late == int((late > 0).sum())
    assert row.n_late_1m == int(((late > 0) & (late <= 60_000_000)).sum())
    assert row.n_late_1h == int(
        ((late > 60_000_000) & (late <= 3_600_000_000)).sum()
    )
    assert row.n_late_gt_1h == int((late > 3_600_000_000).sum())
    assert row.max_late_us == int(late.max())
    for i, d in enumerate([0, 60_000_000, 3_600_000_000]):
        assert row[f"dropped_at_{i}"] == int((late > d).sum())
    # histogram buckets partition the late set
    assert row.n_late == row.n_late_1m + row.n_late_1h + row.n_late_gt_1h
