"""Unit tests for dedup / similarity / text operators on constructed data."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_cotrip_signs_spark.functions.shingles import distinct_shingles, word_shingles
from etl_cotrip_signs_spark.functions.vectors import cosine, to_double
from etl_cotrip_signs_spark.operators.dedup import exact_jaccard, minhash_candidates


def test_word_shingles_order_and_count(spark):
    df = spark.createDataFrame([("a b c d e",)], "text string")
    row = df.select(word_shingles(F.col("text"), 3).alias("s")).collect()[0]
    assert row["s"] == ["a b c", "b c d", "c d e"]


def test_word_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    row = df.select(word_shingles(F.col("text"), 3).alias("s")).collect()[0]
    assert row["s"] == []


def test_exact_jaccard_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [("a b c d", "a b c d"), ("a b c d", "x y z w")], "ta string, tb string"
    )
    rows = df.select(
        exact_jaccard(F.col("ta"), F.col("tb")).alias("j")
    ).collect()
    assert rows[0]["j"] == 1.0
    assert rows[1]["j"] == 0.0


def test_minhash_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words about spark catalyst optimizer plans here now"
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in minhash_candidates(docs).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_cosine_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0]), ([1.0, 0.0], [-1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    vals = [r["c"] for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert abs(vals[0] - 0.0) < 1e-12
    assert abs(vals[1] - 1.0) < 1e-12
    assert abs(vals[2] + 1.0) < 1e-12


def test_lsh_ann_recall_against_exact(spark):
    """LSH kNN must recover a decent fraction of true top-5 neighbors."""
    from etl_cotrip_signs_spark.operators.similarity import knn_exact_cosine, knn_lsh_ann

    sf = "/root/testdata/sf0.001"
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in knn_exact_cosine(spark, sf).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"]) for r in knn_lsh_ann(spark, sf).collect()
    }
    recall = len(exact & approx) / len(exact)
    # random 64-dim embeddings are a worst case for LSH; just require signal
    assert recall > 0.7, f"LSH recall collapsed: {recall}"  # multi-probe: ~0.99 measured


def _near_dup_embeddings(spark, n_base=60, n_labels=3, seed=3):
    """Corpus with planted near-dups: each base vector gets one noisy copy
    (cos ~0.99) under the next id block."""
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_base):
        v = rng.randn(64)
        v /= np.linalg.norm(v)
        dup = v + 0.05 * rng.randn(64)
        dup /= np.linalg.norm(dup)
        label = f"l{i % n_labels}"
        rows.append((i, label, [float(x) for x in v]))
        rows.append((i + 1000, label, [float(x) for x in dup]))
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    )


def test_threshold_pairs_lsh_recall_and_subquadratic(spark):
    """The LSH-bucketed near-dup variant must (a) recover most planted
    near-dup pairs with no false positives and (b) examine far fewer
    candidates than the label self-join."""
    from etl_cotrip_signs_spark.operators.similarity import (
        _label_lsh_candidates,
        threshold_pairs_lsh,
    )

    e = _near_dup_embeddings(spark)
    got = {(r["vec_a"], r["vec_b"]) for r in threshold_pairs_lsh(e).collect()}
    planted = {(i, i + 1000) for i in range(60)}
    recall = len(got & planted) / len(planted)
    assert recall > 0.8, f"LSH near-dup recall collapsed: {recall}"
    assert got <= planted  # exact verify → no random pair sneaks past 0.9

    n_label_pairs = (
        e.groupBy("label")
        .count()
        .select((F.col("count") * (F.col("count") - 1) / 2).alias("p"))
        .agg(F.sum("p"))
        .first()[0]
    )
    n_lsh_cands = _label_lsh_candidates(e).count()
    assert n_lsh_cands < 0.3 * n_label_pairs, (
        f"LSH candidates ({n_lsh_cands}) not well below label-pair space "
        f"({n_label_pairs})"
    )


def test_dedup_embedding_cosine_lsh_drops_planted_dups(spark):
    from etl_cotrip_signs_spark.operators.similarity import (
        dedup_embedding_cosine_lsh,
        threshold_pairs_lsh,
    )

    e = _near_dup_embeddings(spark)
    dominated = {r["vec_b"] for r in threshold_pairs_lsh(e).collect()}
    survivors = {
        r["vec_id"]
        for r in e.join(
            threshold_pairs_lsh(e).select(F.col("vec_b").alias("vec_id")).distinct(),
            "vec_id",
            "left_anti",
        ).collect()
    }
    # every base vector survives; found duplicates are dropped
    assert set(range(60)) <= survivors
    assert survivors == {r["vec_id"] for r in e.collect()} - dominated
    # the registered query runs against the parquet fixture (no dups there →
    # passthrough) without error
    assert dedup_embedding_cosine_lsh(spark, "/root/testdata/sf0.001").count() == 500


def test_simhash_close_texts_low_hamming(spark, tmp_path, monkeypatch):
    """Near-identical docs land within hamming threshold; disjoint docs don't pair."""
    import etl_cotrip_signs_spark.operators.dedup as dd

    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok59", "other")
    far = " ".join(f"zzz{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    monkeypatch.setattr(
        dd, "load_table", lambda spark_, sf_dir_, name_: docs
    )
    rows = dd.dedup_simhash_docs.__wrapped__(spark, "ignored") if hasattr(
        dd.dedup_simhash_docs, "__wrapped__"
    ) else dd.dedup_simhash_docs(spark, "ignored")
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows.collect()}
    assert (1, 2) in got
    assert got[(1, 2)] <= 12


def test_simhash_parameterized_threshold_natural_text(spark):
    """Natural-text-like corpus (diverse vocabulary): near-dups that differ
    in several tokens need a threshold in the 3-8 band — the parameterized
    operator finds them there, while unrelated docs stay out."""
    import random

    from etl_cotrip_signs_spark.operators.dedup import simhash_pairs

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(5000)]
    rows = []
    for d in range(8):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(120)]
        rows.append((d * 2, " ".join(words)))
        # near-dup: perturb 3 of 120 tokens — measured hamming lands in the
        # 1-7 range on this corpus, past a tight <=2 threshold for most pairs
        mutated = list(words)
        for _ in range(3):
            mutated[rng.randrange(len(mutated))] = vocab[rng.randrange(len(mutated))]
        rows.append((d * 2 + 1, " ".join(mutated)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(docs, max_hamming=8).collect()
    }
    planted = {(d * 2, d * 2 + 1) for d in range(8)}
    found = planted & set(got)
    # 16-bit banding guarantees candidates only for hamming <= 3; higher-
    # distance pairs are probabilistic, so require most-but-not-all found
    assert len(found) >= 6
    # several pairs genuinely need the loosened natural-text band
    assert any(h > 2 for h in got.values())
    # unrelated random docs don't collide at this threshold
    assert set(got) <= planted


def test_simhash_derived_threshold_in_range(spark):
    from etl_cotrip_signs_spark.operators.dedup import (
        derive_hamming_threshold,
        simhash_signatures,
    )

    base = " ".join(f"tok{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, base), (2, base.replace("tok59", "x")), (3, base.replace("tok1", "y"))],
        "doc_id long, text string",
    )
    t = derive_hamming_threshold(simhash_signatures(docs))
    assert 1 <= t <= 16


def test_multimodal_decode_batch_shape(spark):
    from etl_cotrip_signs_spark.operators.multimodal import blobs, decode_features

    out = decode_features(blobs(spark, "/root/testdata/sf0.001")).limit(5).collect()
    assert len(out) == 5
    for r in out:
        assert r["n_bytes"] > 0
        assert len(r["feat"]) == 8
        assert abs(sum(r["feat"]) - 1.0) < 1e-9  # normalized histogram
        assert 0 <= r["mean_byte"] <= 255


def test_greedy_packing_invariants(spark):
    """First-fit packing: every bin within budget (modulo single oversized
    docs), no docs lost, bin count at least the information-theoretic floor
    ceil(total_tokens/512), and deterministic across runs.

    Note greedy can legitimately use MORE bins than contiguous packing:
    contiguous bins (floor(tokens_before/512)) may exceed the 512 budget
    when a doc straddles a boundary, while greedy enforces <=512/bin."""
    from etl_cotrip_signs_spark import registry
    from .conftest import SF_ORACLE

    registry.load_all()
    greedy = registry.QUERIES["pack_sequences_greedy"](spark, SF_ORACLE).toPandas()
    contig = registry.QUERIES["pack_sequences"](spark, SF_ORACLE).toPandas()
    # every multi-doc bin within the 512 budget (a single oversized doc may
    # own an over-budget bin by design)
    over = greedy[(greedy.bin_tokens > 512) & (greedy.n_docs > 1)]
    assert over.empty, over
    # doc conservation
    assert greedy.n_docs.sum() == contig.n_docs.sum()
    # bin count can never beat the token-budget floor ceil(total/512)
    import math

    g_bins = greedy.groupby("lang").bin_id.nunique()
    g_tokens = greedy.groupby("lang").bin_tokens.sum()
    floor_bins = g_tokens.apply(lambda t: math.ceil(t / 512))
    assert (g_bins >= floor_bins.reindex(g_bins.index)).all(), (g_bins, floor_bins)
    # deterministic
    again = registry.QUERIES["pack_sequences_greedy"](spark, SF_ORACLE).toPandas()
    a = greedy.sort_values(["lang", "bin_id"]).reset_index(drop=True)
    b = again.sort_values(["lang", "bin_id"]).reset_index(drop=True)
    assert a.equals(b)


def test_kmeans_lloyd_invariants(spark):
    """Lloyd's k-means: every vector assigned exactly once, at most k
    clusters, non-negative inertia, and bit-identical across reruns
    (deterministic init + fixed iteration count)."""
    from etl_cotrip_signs_spark import registry
    from .conftest import SF_ORACLE

    registry.load_all()
    from etl_cotrip_signs_spark.operators.similarity import kmeans_lloyd_detail

    out, _ = kmeans_lloyd_detail(spark, SF_ORACLE)
    out = out.toPandas()
    assert out.n_vectors.sum() == 500  # all vectors assigned
    assert len(out) <= 8
    assert (out.inertia >= 0).all()
    again, _ = kmeans_lloyd_detail(spark, SF_ORACLE)
    again = again.toPandas()
    a = out.sort_values("cluster").reset_index(drop=True)
    b = again.sort_values("cluster").reset_index(drop=True)
    assert a.equals(b)
    # the registered decision row must read all-TRUE on the fixture
    row = registry.QUERIES["kmeans_lloyd_embeddings"](spark, SF_ORACLE).collect()[0]
    assert row.covered_all and row.clusters_nonempty
    assert row.inertia_nonincreasing and row.inertia_lt_total_ss
    assert row.n_total == 500


def test_kmeans_inertia_improves_over_first_assignment(spark):
    """Three Lloyd's rounds must not be worse than the round-0 assignment
    (inertia is non-increasing in exact arithmetic; FP avg noise is far
    below the gap on this fixture)."""
    from etl_cotrip_signs_spark.operators.similarity import kmeans_lloyd_detail
    from .conftest import SF_ORACLE

    one, _ = kmeans_lloyd_detail(spark, SF_ORACLE, n_iter=1)
    three, inertias = kmeans_lloyd_detail(spark, SF_ORACLE, n_iter=3)
    assert three.toPandas().inertia.sum() <= one.toPandas().inertia.sum() + 1e-6
    # per-round inertia trace is monotone non-increasing (Lloyd theorem)
    assert all(
        inertias[i + 1] <= inertias[i] + 1e-6 for i in range(len(inertias) - 1)
    )


def test_ngram_jaccard_df_cap_matches_oracle_on_hot_only_pairs(spark, tmp_path):
    """The DF-cap ≡ oracle equivalence must hold on a corpus where it
    BITES: docs 0-9 overlap each other ONLY via two ubiquitous (hot,
    df=10/10 > 0.5) shingles with jaccard 0.2 ≥ 0.05 — candidacy must drop
    all 45 such pairs on BOTH sides (the oracle's ≥1-shared-cold-shingle
    clause mirrors the operator's cap; before round 4 the oracle had no
    cap and would emit them). One genuinely cold-overlapping pair
    (100, 101) must survive on both sides."""
    import duckdb

    from etl_cotrip_signs_spark.operators.dedup import (
        NGRAM_PAIRS_ORACLE,
        dedup_ngram_jaccard,
    )

    rows = []
    for i in range(10):  # hot-only overlap: "alpha beta gamma delta" ∀ docs
        text = f"alpha beta gamma delta u{i}a u{i}b u{i}c u{i}d"
        rows.append((i, "en", len(text), text))
    for d, tail in ((100, "x1 x2 x3"), (101, "y1 y2 y3")):
        text = f"zeta eta theta iota kappa {tail}"
        rows.append((d, "en", len(text), text))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    oracle = {
        (a, b): j for a, b, j in con.execute(NGRAM_PAIRS_ORACLE).fetchall()
    }
    assert set(got) == {(100, 101)}, got
    assert got == oracle, (got, oracle)


def test_pq_twin_vectors_get_identical_codes(spark):
    """PQ encode must be deterministic and map identical vectors to
    identical codes (the planted-twin invariant behind ADC retrieval);
    codes stay in [0, ks)."""
    import random

    from etl_cotrip_signs_spark.operators.similarity import (
        _PQ_KS,
        _PQ_M,
        pq_encode,
        pq_train_codebooks,
    )

    rng = random.Random(11)
    base = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(40)]
    rows = [(i, v) for i, v in enumerate(base)] + [
        (i + 1000, v) for i, v in enumerate(base)  # exact twins
    ]
    e = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = pq_train_codebooks(e)
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(e, cents).collect()}
    for i in range(40):
        assert codes[i] == codes[i + 1000], (i, codes[i], codes[i + 1000])
        assert len(codes[i]) == _PQ_M
        assert all(0 <= c < _PQ_KS for c in codes[i])


def test_triangle_count_orientation_invariance(spark):
    """Degree-oriented and id-oriented triangle enumeration must agree on
    (n_triangles, n_edges) — orientation changes the join fan-out bound,
    never the count."""
    from etl_cotrip_signs_spark.operators.graph import (
        graph_triangle_count,
        graph_triangle_count_degree,
    )

    a = graph_triangle_count(spark, "/root/testdata/sf0.001").collect()[0]
    b = graph_triangle_count_degree(spark, "/root/testdata/sf0.001").collect()[0]
    assert a.asDict() == b.asDict()


def test_weighted_reservoir_prefers_heavy_weights(spark, tmp_path):
    """Ten documents carry 10^4x the weight of the other 200 — the
    exponential-keys sample must (deterministically, with this seed)
    include every heavy document in its k=50 reservoir."""
    from etl_cotrip_signs_spark.operators.pipeline_ops import (
        sample_weighted_reservoir,
    )

    rows = [(i, "en", 10, "x") for i in range(200)] + [
        (1000 + i, "en", 100_000, "y") for i in range(10)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    got = {r["doc_id"] for r in sample_weighted_reservoir(spark, sf_dir).collect()}
    assert len(got) == 50
    assert {1000 + i for i in range(10)} <= got


def test_pca_spectrum_matches_numpy(spark):
    """The distributed Gram-partial PCA must reproduce numpy's full-data
    covariance spectrum (same top eigenvalues to rounding), and the
    explained fractions must be a valid decreasing distribution."""
    import numpy as np

    from etl_cotrip_signs_spark import registry

    registry.load_all()
    out = sorted(
        registry.QUERIES["embedding_pca_top_components"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r["component"],
    )
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    m = np.vstack([np.asarray(r["embedding"], dtype="float64") for r in e.collect()])
    cov = np.cov(m, rowvar=False, bias=True)
    ref = np.linalg.eigvalsh(cov)[::-1]
    for r in out:
        assert abs(r["eigenvalue"] - ref[r["component"]]) < 1e-6, (r, ref[:5])
    fr = [r["explained_frac"] for r in out]
    assert all(a >= b for a, b in zip(fr, fr[1:]))
    assert 0 < sum(fr) <= 1.0


def test_opq_eigenvalue_allocation_beats_plain_pq_on_anisotropic_data(spark):
    """The OPQ rotation must pay exactly where it claims to: on an
    anisotropic corpus (low-dim latent mapped up to 64-d), balanced
    eigenvalue allocation beats coordinate-order PQ decisively —
    measured 0.80 vs 0.61 recall@5 with this fixed seed. (Plain
    PCA-then-slice without the allocation step scored 0.11 — the
    balancing IS the operator.) Fully deterministic: fixed numpy seed,
    hash-free init, exact numpy ground truth."""
    import numpy as np

    import etl_cotrip_signs_spark.operators.similarity as sim

    rng = np.random.RandomState(3)
    latent = rng.randn(600, 6)
    proj = rng.randn(6, 64)
    x = latent @ proj + 0.05 * rng.randn(600, 64)
    rows = [(i, [float(v) for v in x[i]]) for i in range(600)]
    e = spark.createDataFrame(rows, "vec_id long, v array<double>").repartition(
        8, "vec_id"
    )
    d2 = ((x[:20, None, :] - x[None, :, :]) ** 2).sum(-1)
    exact = {
        q: {j for _, j in sorted((d2[q][j], j) for j in range(600) if j != q)[:5]}
        for q in range(20)
    }

    def recall(e_in):
        cents = sim.pq_train_codebooks(e_in)
        codes = {
            r["vec_id"]: list(r["codes"]) for r in sim.pq_encode(e_in, cents).collect()
        }
        vecs = {r["vec_id"]: np.asarray(r["v"]) for r in e_in.collect()}
        hits = 0
        for q in range(20):
            lut = np.array(sim._pq_lut(vecs[q], cents))
            scored = sorted(
                (sum(lut[s][c] for s, c in enumerate(codes[j])), j)
                for j in codes
                if j != q
            )[:5]
            hits += len({j for _, j in scored} & exact[q])
        return hits / 100.0

    r_pq = recall(e)
    rot = sim.pca_rotation_for("pytest-aniso", e)
    # orthonormal: rotation preserves distances, so ADC estimates the same L2
    assert np.allclose(rot.T @ rot, np.eye(64), atol=1e-8)
    er = e.select(
        "vec_id", sim._rotate_udf(rot)(sim.F.col("v")).alias("v")
    ).localCheckpoint(eager=True)
    r_opq = recall(er)
    assert r_opq > r_pq + 0.05, (r_pq, r_opq)


def test_bpe_apply_word_reference():
    """Pin the BPE inference loop against hand-computed merges."""
    from etl_cotrip_signs_spark.operators.text import bpe_apply_word

    # ranks: 'ab' merges first, then 'abc' ('ab'+'c'), then 'de'
    ranks = {"ab": 0, "abc": 1, "de": 2}
    assert bpe_apply_word("ababc", ranks) == ["ab", "abc"]
    assert bpe_apply_word("abcdef", ranks) == ["abc", "de", "f"]
    assert bpe_apply_word("xyz", ranks) == ["x", "y", "z"]
    assert bpe_apply_word("", ranks) == []
    assert bpe_apply_word("a", ranks) == ["a"]
    # every-occurrence merge in one round: 'abab' -> ab ab
    assert bpe_apply_word("abab", ranks) == ["ab", "ab"]


def test_text_bpe_apply_invariants(spark):
    from etl_cotrip_signs_spark import registry

    from .conftest import SF_SMALL

    registry.load_all()
    pdf = (
        registry.QUERIES["text_bpe_apply"](spark, SF_SMALL)
        .limit(200)
        .toPandas()
    )
    assert (pdf["n_bpe_tokens"] >= pdf["n_words"]).all()  # merges never cross words
    assert (pdf["n_bpe_tokens"] > 0).all()


def test_kmeans_exact_partitions_corpus(spark):
    """Integer k-means: exactly k clusters, membership partitions the
    corpus, inertia strings parse as non-negative ints, and a second run
    is bit-identical (pure integer function of the data)."""
    from etl_cotrip_signs_spark import registry
    from etl_cotrip_signs_spark.io import load_table
    from .conftest import SF_SMALL

    registry.load_all()
    q = registry.QUERIES["kmeans_lloyd_exact"]
    rows = sorted(
        (r["cluster"], r["n_vectors"], r["inertia_e12"], r["centroid_sum"])
        for r in q(spark, SF_SMALL).collect()
    )
    n_vecs = load_table(spark, SF_SMALL, "embeddings").count()
    assert [c for c, *_ in rows] == [0, 1, 2, 3]
    assert sum(n for _, n, *_ in rows) == n_vecs
    assert all(int(i) >= 0 for *_, i, _ in rows)
    rows2 = sorted(
        (r["cluster"], r["n_vectors"], r["inertia_e12"], r["centroid_sum"])
        for r in q(spark, SF_SMALL).collect()
    )
    assert rows == rows2
