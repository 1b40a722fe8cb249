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
