"""Mergeable-sketch operators with EXACT oracles [EXT — engine surface
breadth]: a log-bucket quantile sketch and a count-min sketch, both
built so every intermediate is a deterministic integer and the DuckDB
oracle reproduces the sketch bit-for-bit — unlike the approx_* builtins
(whose estimates are engine-internal), these register hash-green
CORRECTNESS rows while still demonstrating the mergeable-summary shape
that matters at 100 TB.

Companions to the rows-only approximate family (`agg_hll_mergeable`,
`agg_approx_distinct`, `agg_approx_error_bounds` in sketch_skew.py):
those instrument engine builtins; these implement the sketch itself in
plan algebra, so correctness is checkable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import load_table
from ..registry import query

_QUANTILES = [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]

# Count-min sketch geometry: d hash rows × w buckets. With the fixture's
# ~2000 distinct keys and w=256, collisions are guaranteed (by design —
# that's what the min-over-rows corrects for).
CMS_D = 4
CMS_W = 256


@query(
    "sketch_quantile_mergeable",
    oracle=f"""
    WITH x AS (
        SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    hist AS (
        SELECT length(CAST(cents AS VARCHAR)) AS digits,
               CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS first_digit,
               count(*) AS bucket_n
        FROM x GROUP BY 1, 2
    ),
    walk AS (
        SELECT digits, first_digit, bucket_n,
               sum(bucket_n) OVER (
                   ORDER BY digits, first_digit
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum,
               sum(bucket_n) OVER () AS n
        FROM hist
    ),
    qs AS (
        {" UNION ALL ".join(
            f"SELECT '{label}' AS q_label, {q} AS q" for label, q in _QUANTILES
        )}
    ),
    est AS (
        SELECT q_label,
               CAST(ceil(q * n) AS BIGINT) AS k_target,
               min(first_digit * CAST(pow(10, digits - 1) AS BIGINT))
                   AS est_lower
        FROM qs JOIN walk ON walk.cum >= CAST(ceil(q * walk.n) AS BIGINT)
        GROUP BY q_label, CAST(ceil(q * n) AS BIGINT)
    )
    SELECT e.q_label, e.k_target, e.est_lower,
           (SELECT count(*) FROM x WHERE cents < e.est_lower) AS n_below_est,
           (SELECT count(*) FROM x) AS n_total
    FROM est e
    """,
)
def sketch_quantile_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a mergeable log-bucket histogram, exactly checkable.

    The sketch: bucket every value by (decimal digit count, leading
    digit) — ~1.5 significant figures, 40-odd buckets over any BIGINT
    range — and keep per-bucket counts. Counts are map-side-combinable
    partial aggregates: the sketch merges across partitions, days, or
    streams by addition, which is the entire point at 100 TB (a
    per-day 40-row summary answers "p99 over any date range" without
    re-reading the data). Quantile read-out walks the cumulative
    histogram and returns the bucket's lower bound; the accuracy
    instrumentation (n_below_est vs k_target) is a distributed COUNT,
    not a global sort — checking a quantile estimate never needs the
    kth order statistic itself.

    Determinism: bucketing is string arithmetic on integers (no log()
    floats — floor(log10) via float diverges near powers of ten);
    ceil(q*n) is a single double product both engines round
    identically. The read-out window runs over the ~40-row histogram —
    single-partition by construction, metadata-scale, same legitimacy
    class as k-means centroid state.
    """
    x = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    xs = x.withColumn("s", F.col("cents").cast("string"))
    # The 40-row sketch is checkpointed: the walk, n_total and the final
    # join all consume it, and n_total comes from the sketch itself — a
    # separate x.count() would be a third full scan (review finding).
    hist = (
        xs.groupBy(
            F.length("s").alias("digits"),
            F.substring("s", 1, 1).cast("long").alias("first_digit"),
        )
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .localCheckpoint(eager=True)
    )
    w_cum = Window.orderBy("digits", "first_digit").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walk = hist.select(
        "digits",
        "first_digit",
        F.sum("bucket_n").over(w_cum).alias("cum"),
        F.sum("bucket_n").over(Window.partitionBy()).alias("n"),
    )
    qs = spark.createDataFrame(_QUANTILES, "q_label string, q double")
    est = (
        qs.join(walk, walk["cum"] >= F.ceil(qs["q"] * walk["n"]).cast("long"))
        .groupBy("q_label", F.ceil(F.col("q") * F.col("n")).cast("long").alias("k_target"))
        .agg(
            F.min(
                F.col("first_digit")
                * F.pow(F.lit(10.0), F.col("digits") - 1).cast("long")
            ).alias("est_lower")
        )
    )
    n_total = sum(r["bucket_n"] for r in hist.select("bucket_n").collect())
    below = (
        x.join(F.broadcast(est), F.col("cents") < F.col("est_lower"))
        .groupBy("q_label")
        .agg(F.count(F.lit(1)).alias("n_below_est"))
    )
    return (
        est.join(below, "q_label", "left")
        .select(
            "q_label",
            "k_target",
            "est_lower",
            F.coalesce("n_below_est", F.lit(0)).alias("n_below_est"),
            F.lit(n_total).alias("n_total"),
        )
    )


def _cms_bucket_spark(key: F.Column, row: int) -> F.Column:
    """Row-r CMS bucket: md5 of "<key>#<row>", first 8 hex chars mod w."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(key.cast("string"), F.lit(f"#{row}")).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % CMS_W
    )


def _cms_bucket_sql(key_expr: str, row: int) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '#{row}'), 1, 8)) "
        f"AS BIGINT) % {CMS_W}"
    )


@query(
    "sketch_cms_heavy_hitters",
    oracle=f"""
    WITH keyed AS (
        SELECT l_partkey AS key, count(*) AS exact_cnt
        FROM lineitem GROUP BY l_partkey
    ),
    cells AS (
        {" UNION ALL ".join(
            f"SELECT {r} AS r, {_cms_bucket_sql('key', r)} AS bucket, "
            "sum(exact_cnt) AS cell FROM keyed GROUP BY 1, 2"
            for r in range(CMS_D)
        )}
    ),
    probes AS (
        {" UNION ALL ".join(
            f"SELECT key, exact_cnt, {r} AS r, {_cms_bucket_sql('key', r)} AS bucket "
            "FROM keyed"
            for r in range(CMS_D)
        )}
    ),
    est AS (
        SELECT p.key, p.exact_cnt,
               CAST(min(c.cell) AS BIGINT) AS cms_est
        FROM probes p JOIN cells c ON p.r = c.r AND p.bucket = c.bucket
        GROUP BY p.key, p.exact_cnt
    )
    SELECT key AS l_partkey, cms_est, exact_cnt
    FROM est
    ORDER BY cms_est DESC, l_partkey
    LIMIT 20
    """,
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch build + heavy-hitter probe, exact cross-engine.

    The CMS is d×w = 1024 integer cells: row r hashes every key with an
    independent seed (md5 of "key#r") and adds its count to one of w
    buckets; a key's estimate is the MIN over its d cells —
    overestimates only, bounded by the collision mass. Cells are
    map-side-combinable sums, so the sketch merges across partitions /
    streams / days by addition into cluster-constant state (1024 rows
    regardless of data size) — the frequency analogue of the HLL
    registers in agg_hll_mergeable, but with every number exactly
    reproducible by the oracle (md5 is the engine-portable hash, the
    same discipline as the split/shuffle operators).

    Output: top-20 keys by estimate with their exact counts beside —
    on the fixture w=256 << 2000 keys forces real collisions, so the
    readout demonstrates est >= exact with visible overestimation, and
    the hash match proves both engines built the identical sketch.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("key")
    )
    # keyed (the only data-sized pass: lineitem scan + per-key count) is
    # eagerly materialized ONCE (r10): the previous 2 x CMS_D union branches
    # each re-derived it — 8 full lineitem scans + aggregates in the plan
    # (12 Exchanges, plans/r10/sketch_cms_heavy_hitters_before.txt). The
    # probe rows for all d sketch rows come from ONE posexplode of the d
    # bucket ids (pos IS the row index r), and the cells are a re-aggregate
    # of those probe rows — identical (r, bucket, cell) algebra, one pass.
    keyed = (
        li.groupBy("key")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .localCheckpoint(eager=True)
    )
    probes = keyed.select(
        "key",
        "exact_cnt",
        F.posexplode(
            F.array(
                *[_cms_bucket_spark(F.col("key"), r) for r in range(CMS_D)]
            )
        ).alias("r", "bucket"),
    )
    cells = probes.groupBy("r", "bucket").agg(
        F.sum("exact_cnt").alias("cell")
    )
    est = (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("key", "exact_cnt")
        .agg(F.min("cell").alias("cms_est"))
    )
    return (
        est.orderBy(F.col("cms_est").desc(), F.col("key"))
        .limit(20)
        .select(F.col("key").alias("l_partkey"), "cms_est", "exact_cnt")
    )
