"""Exact classical-ML training primitives expressible as aggregates
[EXT beyond task.ts — engine surface].

The ML family so far covers clustering (kmeans_lloyd_exact), regression
trends (trend_daily_revenue / trend_theil_sen / isotonic_regression_daily)
and encodings (feature_target_encoding_loo). This module adds supervised
TREE induction at its smallest honest unit: a depth-1 decision stump with
an exact Gini-impurity split search — the inner loop of every distributed
tree learner (the histogram trick is exactly what Spark MLlib's
DecisionTree and XGBoost/LightGBM do, as published; this is an
independent expression of the textbook algorithm, not a port).

Scale shape: the ONLY data-sized work is one map-side-combinable
(bucket -> n, pos) histogram aggregate; the split search is a prefix-sum
window plus an argmax over the FIXED-WIDTH bucket table (price-range /
65536 buckets, independent of row count). That is the 100 TB design: a
tree node's split search shuffles a histogram, never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io import load_table
from ..functions.vectors import lit_long_array
from ..registry import query

# Fixed bucket width in cents ($655.36): data-independent, so the split
# candidate set (and the bucket table's size) is a constant of the schema,
# not of the scale factor.
_BUCKET_CENTS = 65536


@query(
    "ml_decision_stump_gini",
    oracle=f"""
    WITH base AS (
        SELECT CAST(floor(o_totalprice * 100) AS BIGINT) // {_BUCKET_CENTS}
                   AS bucket,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    bk AS (SELECT bucket, count(*) AS n, sum(y) AS pos FROM base GROUP BY bucket),
    cum AS (
        SELECT bucket,
               sum(n) OVER (ORDER BY bucket) AS a,
               sum(pos) OVER (ORDER BY bucket) AS pl,
               sum(n) OVER () AS nn,
               sum(pos) OVER () AS pp
        FROM bk
    ),
    sc AS (
        SELECT bucket, a, pl, nn - a AS b, pp - pl AS pr
        FROM cum WHERE nn - a > 0
    ),
    scored AS (
        SELECT bucket, a, pl, b, pr,
               (CAST(pl AS DECIMAL(38,0)) * pl
                + CAST(a - pl AS DECIMAL(38,0)) * (a - pl)) * b
             + (CAST(pr AS DECIMAL(38,0)) * pr
                + CAST(b - pr AS DECIMAL(38,0)) * (b - pr)) * a AS num,
               CAST(a AS DECIMAL(38,0)) * b AS den
        FROM sc
    )
    SELECT CAST((bucket + 1) * {_BUCKET_CENTS} AS BIGINT) AS threshold_cents,
           CAST(a AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
           CAST(b AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
           CAST(num AS VARCHAR) AS score_num,
           CAST(den AS VARCHAR) AS score_den
    FROM scored
    ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE) DESC, bucket ASC
    LIMIT 1
    """,
)
def ml_decision_stump_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-1 decision tree: the o_totalprice threshold that best splits
    o_orderstatus = 'F' by Gini impurity, found EXACTLY over histogram
    buckets.

    Minimizing weighted Gini n_L*g_L + n_R*g_R is equivalent to maximizing
    (pos_L^2 + neg_L^2)/n_L + (pos_R^2 + neg_R^2)/n_R; with the common
    denominator n_L*n_R that is the exact integer fraction num/den emitted
    here (DECIMAL(38,0) Spark-side / HUGEINT->DECIMAL in DuckDB — BIGINT
    wraps past n ~ 2e5^3 under the cube of the row count). The winning
    split is the argmax under the SHARED total order (IEEE double of the
    exact fraction, bucket ascending as the tie-break) — the Theil-Sen
    cross-engine ordering rule, deterministic by construction in both
    engines. floor() for the cents conversion per the repo-wide half-up vs
    half-away rule; left branch = cents < threshold_cents."""
    base = load_table(spark, sf_dir, "orders").select(
        F.expr(
            f"CAST(floor(o_totalprice * 100) AS BIGINT) div {_BUCKET_CENTS}"
        ).alias("bucket"),
        F.when(F.col("o_orderstatus") == "F", F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
    )
    bk = base.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    # Prefix sums over the bucket table: single-partition window, but the
    # table is price-range/65536 rows (~900) regardless of scale factor.
    w_cum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_all = W.orderBy("bucket").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = bk.select(
        "bucket",
        F.sum("n").over(w_cum).alias("a"),
        F.sum("pos").over(w_cum).alias("pl"),
        F.sum("n").over(w_all).alias("nn"),
        F.sum("pos").over(w_all).alias("pp"),
    )
    sc = cum.select(
        "bucket",
        "a",
        "pl",
        (F.col("nn") - F.col("a")).alias("b"),
        (F.col("pp") - F.col("pl")).alias("pr"),
    ).filter(F.col("b") > 0)
    d38 = "decimal(38,0)"
    scored = sc.select(
        "bucket",
        "a",
        "pl",
        "b",
        "pr",
        (
            (
                F.col("pl").cast(d38) * F.col("pl")
                + (F.col("a") - F.col("pl")).cast(d38) * (F.col("a") - F.col("pl"))
            )
            * F.col("b")
            + (
                F.col("pr").cast(d38) * F.col("pr")
                + (F.col("b") - F.col("pr")).cast(d38) * (F.col("b") - F.col("pr"))
            )
            * F.col("a")
        ).alias("num"),
        (F.col("a").cast(d38) * F.col("b")).alias("den"),
    )
    return (
        scored.orderBy(
            (F.col("num").cast("double") / F.col("den").cast("double")).desc(),
            F.col("bucket").asc(),
        )
        .limit(1)
        .select(
            ((F.col("bucket") + 1) * _BUCKET_CENTS)
            .cast("long")
            .alias("threshold_cents"),
            F.col("a").cast("long").alias("n_left"),
            F.col("pl").cast("long").alias("pos_left"),
            F.col("b").cast("long").alias("n_right"),
            F.col("pr").cast("long").alias("pos_right"),
            F.col("num").cast("string").alias("score_num"),
            F.col("den").cast("string").alias("score_den"),
        )
    )


# --- Farthest-point (maximin) k-means initialization -----------------------

_MAXIMIN_K = 4

# Squared-L2 between the quantized embedding e.v and a chosen center c.v —
# textually the kmeans_lloyd_exact distance, parameterized on the chosen
# table's alias.
_MM_DIST = (
    "list_sum(list_transform(range(1, 65), i -> "
    "(e.v[i::INT] - c.v[i::INT]) * (e.v[i::INT] - c.v[i::INT])))"
)


def _maximin_oracle() -> str:
    """Unrolled greedy selection: round r computes every candidate's min
    distance to the r chosen centers and picks the argmax (ties to the
    smaller vec_id) — the kmeans/pagerank unroll discipline applied to
    k-center seeding."""
    stages = []
    prev = "ch0"
    for r in range(1, _MAXIMIN_K):
        stages.append(
            f"""d{r} AS (
        SELECT e.vec_id, CAST(min({_MM_DIST}) AS BIGINT) AS dmin
        FROM e, {prev} c
        WHERE e.vec_id NOT IN (SELECT vec_id FROM {prev})
        GROUP BY e.vec_id
    ),
    p{r} AS (
        SELECT d.vec_id, e.v, {r} AS sel_order, d.dmin AS maximin_d2
        FROM d{r} d JOIN e USING (vec_id)
        ORDER BY d.dmin DESC, d.vec_id LIMIT 1
    ),
    ch{r} AS (
        SELECT vec_id, v, sel_order, maximin_d2 FROM {prev}
        UNION ALL
        SELECT vec_id, v, sel_order, maximin_d2 FROM p{r}
    )"""
        )
        prev = f"ch{r}"
    joined = ",\n    ".join(stages)
    return f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                                        AS BIGINT)) AS v
        FROM embeddings
    ),
    ch0 AS (
        SELECT vec_id, v, 0 AS sel_order, CAST(NULL AS BIGINT) AS maximin_d2
        FROM e ORDER BY vec_id LIMIT 1
    ),
    {joined}
    SELECT sel_order, vec_id, maximin_d2 FROM {prev}
    """


@query("kmeans_maximin_init", oracle=_maximin_oracle())
def kmeans_maximin_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic farthest-point (maximin) k-means seeding — the
    2-approximation k-center greedy that k-means++ randomizes, made
    cross-engine exact: coordinates floor-quantized to 1e-6 units (the
    kmeans_lloyd_exact discipline), distances exact BIGINT squared-L2,
    seed = the minimum vec_id, each round's pick = argmax of the min
    distance to the chosen set with ties to the smaller vec_id. No RNG
    anywhere, so the DuckDB oracle unrolls the same greedy and must pick
    the identical k=4 centers; the emitted maximin_d2 IS the k-center
    radius bound at each step.

    Scale shape: each round is ONE map-side fold over a literal chosen
    array (k x 64 ints — broadcast-sized codebook state, the
    kmeans-assignment plan) followed by a TakeOrdered(1) argmax — no
    Window, no cross join of data rows. Total data passes = k - 1; the
    driver holds only the chosen centers. This is exactly how
    scalable-k-means++ seeds its first center set at 100 TB.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000000).cast("long"),
        ).alias("v"),
    ).localCheckpoint(eager=True)

    first = emb.orderBy("vec_id").limit(1).collect()[0]
    chosen: list[tuple[int, list[int], int | None]] = [
        (int(first["vec_id"]), [int(x) for x in first["v"]], None)
    ]
    for r in range(1, _MAXIMIN_K):
        chosen_lit = F.array(
            *[lit_long_array(vec) for _, vec, _ in chosen]
        )
        dmin = F.array_min(
            F.transform(
                chosen_lit,
                lambda c: F.aggregate(
                    F.zip_with(
                        F.col("v"), c, lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ),
            )
        )
        pick = (
            emb.filter(~F.col("vec_id").isin([i for i, _, _ in chosen]))
            .select("vec_id", "v", dmin.alias("dmin"))
            .orderBy(F.col("dmin").desc(), F.col("vec_id").asc())
            .limit(1)
            .collect()[0]
        )
        chosen.append(
            (int(pick["vec_id"]), [int(x) for x in pick["v"]], int(pick["dmin"]))
        )
    rows = [
        (i, vec_id, d2) for i, (vec_id, _, d2) in enumerate(chosen)
    ]
    return spark.createDataFrame(
        rows, "sel_order int, vec_id long, maximin_d2 long"
    )


@query(
    "ml_knn_classifier_exact",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe, label AS true_label
        FROM embeddings WHERE vec_id < 20
    ),
    c AS (
        SELECT vec_id AS cid, embedding AS ce, label AS cl
        FROM embeddings WHERE vec_id >= 20
    ),
    s AS (
        SELECT query_id, true_label, cid, cl,
               round(list_cosine_similarity(CAST(qe AS DOUBLE[]),
                                            CAST(ce AS DOUBLE[])), 5) AS cos
        FROM q, c
    ),
    r AS (
        SELECT query_id, true_label, cl,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, cid) AS rn
        FROM s
    ),
    votes AS (
        SELECT query_id, true_label, cl, CAST(count(*) AS BIGINT) AS v
        FROM r WHERE rn <= 5 GROUP BY query_id, true_label, cl
    ),
    pred AS (
        SELECT query_id, true_label, cl AS pred_label, v,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY v DESC, cl) AS pr
        FROM votes
    )
    SELECT query_id, true_label, pred_label, v AS n_votes
    FROM pred WHERE pr = 1
    """,
)
def ml_knn_classifier_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification (k=5, majority vote) over the embedding
    corpus: each of the 20 probe vectors is labeled by its 5 exact
    nearest corpus neighbors (probes excluded from the corpus — no
    self-vote leakage), tie-broken by the smallest label. The lazy
    classifier that needs no training pass — the baseline every learned
    classifier must beat, and the direct consumer of the kNN machinery
    (exact here; at scale the LSH/IVF candidate generators feed the
    same vote).

    Ranking discipline is knn_exact_cosine's: 5-dp-rounded cosine with
    id tie-break so both engines pick identical neighbor sets; the vote
    and its (count DESC, label) argmax are exact integers.

    Shape at 100 TB: bounded query set broadcast against the corpus
    (the documented oracle-baseline shape); production swaps the
    cross-probe for knn_lsh_ann's bucket join and keeps the vote
    unchanged — votes are a groupBy over candidate ids, never vectors.
    """
    from ..functions.vectors import cosine, to_double
    from pyspark.sql import Window as W

    src = load_table(spark, sf_dir, "embeddings")
    q = src.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        to_double(F.col("embedding")).alias("qv"),
        F.col("label").alias("true_label"),
    )
    c = src.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("cid"),
        to_double(F.col("embedding")).alias("cv"),
        F.col("label").alias("cl"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 5))
    )
    wr = W.partitionBy("query_id").orderBy(F.col("cos").desc(), "cid")
    top = scored.withColumn("rn", F.row_number().over(wr)).filter(
        F.col("rn") <= 5
    )
    votes = top.groupBy("query_id", "true_label", "cl").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    wp = W.partitionBy("query_id").orderBy(F.col("v").desc(), "cl")
    return (
        votes.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("cl").alias("pred_label"),
            F.col("v").alias("n_votes"),
        )
    )


_NB_CLASSES = ("click", "error", "purchase", "signup", "view")
_NB_VBUCKETS = 5
_NB_DOWS = 7
# Laplace-smoothed posterior score as ONE shared double expression over the
# row's exact integer counts: prior * p(dow|c) * p(vb|c). Pure * and / of
# integers in IEEE double — both exactly-rounded operations, so the score
# is bit-identical across engines (no ln, whose last ULP is libm's choice).
_NB_SCORE = (
    "(CAST(n_c + 1 AS DOUBLE) / (n_all + {k}))"
    " * (CAST(n_cd + 1 AS DOUBLE) / (n_c + {d}))"
    " * (CAST(n_cv + 1 AS DOUBLE) / (n_c + {v}))"
).format(k=len(_NB_CLASSES), d=_NB_DOWS, v=_NB_VBUCKETS)


@query(
    "ml_naive_bayes_events",
    oracle=f"""
    WITH base AS (
        SELECT event_type AS c,
               (epoch(CAST(ts AS DATE))::BIGINT // 86400) % 7 AS dow,
               least(CAST(floor(value * 1000) AS BIGINT) // 20000,
                     {_NB_VBUCKETS - 1}) AS vb
        FROM events
    ),
    tot AS (SELECT count(*) AS n_all FROM base),
    per_c AS (SELECT c, count(*) AS n_c FROM base GROUP BY c),
    per_cd AS (SELECT c, dow, count(*) AS n_cd FROM base GROUP BY c, dow),
    per_cv AS (SELECT c, vb, count(*) AS n_cv FROM base GROUP BY c, vb),
    cells AS (SELECT dow, vb, count(*) AS n_cell FROM base GROUP BY dow, vb),
    classes AS (SELECT unnest(['click','error','purchase','signup','view']) AS c),
    scored AS (
        SELECT cl.dow, cl.vb, cl.n_cell, k.c,
               (SELECT n_all FROM tot) AS n_all,
               coalesce(pc.n_c, 0) AS n_c,
               coalesce(pd.n_cd, 0) AS n_cd,
               coalesce(pv.n_cv, 0) AS n_cv
        FROM cells cl CROSS JOIN classes k
        LEFT JOIN per_c pc ON pc.c = k.c
        LEFT JOIN per_cd pd ON pd.c = k.c AND pd.dow = cl.dow
        LEFT JOIN per_cv pv ON pv.c = k.c AND pv.vb = cl.vb
    ),
    ranked AS (
        SELECT dow, vb, n_cell, c, {_NB_SCORE} AS score,
               row_number() OVER (
                   PARTITION BY dow, vb ORDER BY {_NB_SCORE} DESC, c
               ) AS rn
        FROM scored
    )
    SELECT CAST(dow AS BIGINT) AS dow, CAST(vb AS BIGINT) AS vb,
           CAST(n_cell AS BIGINT) AS n_cell, c AS pred_class,
           round(score, 9) AS score
    FROM ranked WHERE rn = 1
    """,
)
def ml_naive_bayes_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes, trained and applied in one pass: predict
    the event type from (day-of-week, value bucket) with Laplace-smoothed
    count estimates — the classic first classifier over categorical
    features, and the canonical example of ML that IS just aggregation
    (training = three groupBys; inference = an argmax over a score that
    multiplies count ratios).

    Engine-safety: the usual log-likelihood sum is avoided entirely —
    with two features the posterior is a product of THREE integer ratios,
    computed as one shared double expression (IEEE * and / are
    exactly-rounded, unlike ln, so the score is bit-identical across
    engines and the per-cell argmax cannot flip on a ULP). Day-of-week is
    epoch-day mod 7 (unix_date vs epoch()//86400 — pure integers; both
    engines' calendar DOW functions disagree on week start). Ties break on class name.

    Scale shape: three map-combinable count aggregates over facts (class,
    class x dow, class x vb) — each k-bounded output; scoring joins the
    35-cell grid against BROADCAST count tables; the argmax is a window
    over 175 rows. Facts are scanned once (Spark caches nothing here; the
    three aggregates share the one scan via the same source).
    """
    base = load_table(spark, sf_dir, "events").selectExpr(
        "event_type AS c",
        "unix_date(CAST(ts AS DATE)) % 7 AS dow",
        f"least(CAST(floor(value * 1000) AS BIGINT) DIV 20000,"
        f" {_NB_VBUCKETS - 1}) AS vb",
    )
    tot = base.agg(F.count(F.lit(1)).alias("n_all"))
    per_c = base.groupBy("c").agg(F.count(F.lit(1)).alias("n_c"))
    per_cd = base.groupBy("c", "dow").agg(F.count(F.lit(1)).alias("n_cd"))
    per_cv = base.groupBy("c", "vb").agg(F.count(F.lit(1)).alias("n_cv"))
    cells = base.groupBy("dow", "vb").agg(F.count(F.lit(1)).alias("n_cell"))
    classes = spark.createDataFrame([(c,) for c in _NB_CLASSES], "c string")
    scored = (
        cells.crossJoin(F.broadcast(classes))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(per_c), "c", "left")
        .join(F.broadcast(per_cd), ["c", "dow"], "left")
        .join(F.broadcast(per_cv), ["c", "vb"], "left")
        .select(
            "dow",
            "vb",
            "n_cell",
            "c",
            "n_all",
            F.coalesce("n_c", F.lit(0)).alias("n_c"),
            F.coalesce("n_cd", F.lit(0)).alias("n_cd"),
            F.coalesce("n_cv", F.lit(0)).alias("n_cv"),
        )
    )
    ranked = scored.withColumn("score", F.expr(_NB_SCORE)).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("dow", "vb").orderBy(F.col("score").desc(), "c")
        ),
    )
    return ranked.filter(F.col("rn") == 1).select(
        F.col("dow").cast("long").alias("dow"),
        F.col("vb").cast("long").alias("vb"),
        F.col("n_cell").cast("long").alias("n_cell"),
        F.col("c").alias("pred_class"),
        F.round("score", 9).alias("score"),
    )
