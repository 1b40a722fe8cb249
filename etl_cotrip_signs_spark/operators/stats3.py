"""Nonparametric + resampling inference operators [EXT beyond task.ts —
engine surface breadth]: Mann-Whitney U with exact midranks, Spearman
rank correlation, a deterministic sign-flip permutation test, and lagged
cross-correlation between two daily series.

Companions to stats2.py's parametric tests (Welch t, OLS): these are the
rank/resampling half of the analyst's inference toolbox — what you reach
for when the value distribution is skewed (ranks) or when you refuse
distributional assumptions entirely (permutation). The shared discipline
is stat_corr_moments': every data-dependent reduction is an EXACT
integer (doubled midranks so ties never produce .5; BIGINT /
DECIMAL(38,0) Spark-side, HUGEINT-cast-back in DuckDB), and each final
float is ONE textually identical double expression on both engines.

The permutation test's "randomness" is xxhash64 over (user_id*64 + b) —
Spark's builtin replayed bit-for-bit by the DuckDB XXH64 macros
(functions/xxh64_sql.py), so a Monte-Carlo procedure becomes
hash-oracle-checkable: both engines enumerate the SAME 64 sign
assignments. This is the md5-bucket determinism rule
(sample_stratified / events_ab_test_lift) applied to resampling
inference.

Scale notes (100 TB):
- Mann-Whitney reduces the fact table to the distinct-value count table
  (the drift_ks_exact shape); the single-partition prefix window runs
  over values, not rows — bounded by the value domain, and a 1e6-cell
  milli-unit domain is metadata next to the fact table.
- Spearman's ranks need two sorts per group (one per variable) — that is
  the honest cost of rank statistics; both windows share the group
  partitioning so the second sort is within-partition. The moment
  aggregate then ships 6 numbers per group.
- The permutation test is one per-user reduction (the shuffle
  sessionization already pays) followed by a 64x replicate explode of
  the per-user table — combinable aggregate per replicate, never a
  second pass over facts. B=64 replicates bound the blow-up; the
  resolution (p in units of 1/64) is stated in the output.
- Cross-correlation runs entirely on the per-day aggregate (calendar-
  bounded): 15 lags x |days| rows is metadata regardless of event
  volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.xxh64_sql import XXH64_MACROS, chain_seed
from ..io import load_table
from ..registry import query

_EPOCH = "1970-01-01"

# z-statistic with the standard tie correction, as one shared double
# expression over the exact integers (u2_a is the DOUBLED U so the /2
# happens in float exactly once, like the doubled-midrank literature
# form). Kept textually identical in Spark selectExpr and DuckDB SELECT.
_MWU_Z = (
    "(CAST(u2_a AS DOUBLE) - CAST(n_a AS DOUBLE) * n_b) / 2"
    " / sqrt(CAST(n_a AS DOUBLE) * n_b / 12"
    " * ((n_a + n_b + 1)"
    " - CAST(tt AS DOUBLE) / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1))))"
)


@query(
    "stat_mann_whitney_u",
    oracle=f"""
    WITH vals AS (
        SELECT CAST(floor(value * 1000) AS BIGINT) AS x,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ia,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ib
        FROM events WHERE event_type IN ('purchase', 'click')
    ),
    per AS (
        SELECT x, sum(ia) AS ca, sum(ib) AS cb, count(*) AS c
        FROM vals GROUP BY x
    ),
    ranked AS (
        SELECT x, ca, cb, c,
               coalesce(sum(c) OVER (
                   ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS cumc
        FROM per
    ),
    m AS (
        SELECT CAST(sum(ca) AS BIGINT) AS n_a,
               CAST(sum(cb) AS BIGINT) AS n_b,
               CAST(sum(ca * (2 * cumc + c + 1)) AS BIGINT) AS r2_a,
               CAST(sum(c * c * c - c) AS BIGINT) AS tt
        FROM ranked
    ),
    u AS (
        SELECT n_a, n_b, tt,
               r2_a - n_a * (n_a + 1) AS u2_a,
               2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS u2_b
        FROM m
    )
    SELECT n_a, n_b, u2_a, u2_b, tt, {_MWU_Z} AS z_stat FROM u
    """,
)
def stat_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (purchase vs click event values) with EXACT
    tie-corrected midranks — the rank-based twin of stats_welch_ttest,
    insensitive to the value distribution's shape.

    Midranks are kept DOUBLED so ties never create half-integers: a tie
    group of size c whose exclusive prefix count is cumc has doubled
    midrank 2*cumc + c + 1, an odd integer. R2_a = sum over the a-arm,
    and 2*U_a = R2_a - n_a(n_a+1) stays exactly integer. The normal
    z-approximation (standard tie-corrected variance) is the one shared
    double expression; the tie term sum(c^3 - c) rides along exactly.

    Shape: facts reduce to the per-distinct-value (ca, cb) table; one
    prefix window over values (the drift_ks_exact merged-CDF shape);
    the output is a single row.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            F.floor(F.col("value") * 1000).cast("long").alias("x"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("ia"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("ib"),
        )
    )
    per = ev.groupBy("x").agg(
        F.sum("ia").alias("ca"),
        F.sum("ib").alias("cb"),
        F.count(F.lit(1)).alias("c"),
    )
    w = W.orderBy("x").rowsBetween(W.unboundedPreceding, -1)
    ranked = per.withColumn("cumc", F.coalesce(F.sum("c").over(w), F.lit(0)))
    m = ranked.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(F.col("ca") * (2 * F.col("cumc") + F.col("c") + 1))
        .cast("long")
        .alias("r2_a"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tt"),
    )
    u = m.selectExpr(
        "n_a",
        "n_b",
        "tt",
        "r2_a - n_a * (n_a + 1) AS u2_a",
        "2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS u2_b",
    )
    return u.selectExpr("n_a", "n_b", "u2_a", "u2_b", "tt", f"{_MWU_Z} AS z_stat")


_SPEAR_RHO = (
    "CAST(n * sxy - srx * sry AS DOUBLE)"
    " / sqrt(CAST(n * sxx - srx * srx AS DOUBLE)"
    " * CAST(n * syy - sry * sry AS DOUBLE))"
)


@query(
    "stat_spearman_rank",
    oracle=f"""
    WITH base AS (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS xq,
               CAST(floor(l_extendedprice * 100) AS BIGINT) AS yc
        FROM lineitem
    ),
    ranked AS (
        SELECT l_returnflag,
               2 * rank() OVER (PARTITION BY l_returnflag ORDER BY xq)
                 + count(*) OVER (PARTITION BY l_returnflag, xq) - 1 AS rx,
               2 * rank() OVER (PARTITION BY l_returnflag ORDER BY yc)
                 + count(*) OVER (PARTITION BY l_returnflag, yc) - 1 AS ry
        FROM base
    ),
    m AS (
        SELECT l_returnflag,
               count(*) AS n,
               sum(rx) AS srx, sum(ry) AS sry,
               sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
               sum(rx * ry) AS sxy
        FROM ranked GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           CAST(CAST(n * sxy - srx * sry AS HUGEINT) AS VARCHAR) AS num,
           {_SPEAR_RHO} AS rho
    FROM m
    """,
)
def stat_spearman_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (quantity vs price, per returnflag) via
    Pearson on DOUBLED midranks — the robust twin of stat_corr_moments,
    invariant to any monotone transform of either variable.

    A tie group of size t starting at dense position r has midrank
    r + (t-1)/2; doubled, 2*rank() + count_ties - 1 — an integer, so the
    moment sums stay exact (the doubling cancels in rho: numerator and
    both variance terms each carry the factor 4). rho is the one shared
    double expression; the exact integer numerator rides as a string
    (HUGEINT->pandas is lossy float64, the stat_corr_moments rule).

    Shape: two within-group sorts (the honest cost of ranks — both
    windows share the group partitioning), then a 6-number moment
    aggregate per group. At 100 TB the rank windows are the cost of ONE
    extra sort over a repartitioned-by-group table; the alternative
    two-pass join-by-value formulation reads facts twice and is rejected.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("xq"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("yc"),
    )
    ranked = li.select(
        "l_returnflag",
        (
            2 * F.rank().over(W.partitionBy("l_returnflag").orderBy("xq"))
            + F.count(F.lit(1)).over(W.partitionBy("l_returnflag", "xq"))
            - 1
        ).alias("rx"),
        (
            2 * F.rank().over(W.partitionBy("l_returnflag").orderBy("yc"))
            + F.count(F.lit(1)).over(W.partitionBy("l_returnflag", "yc"))
            - 1
        ).alias("ry"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = ranked.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("rx"))).alias("srx"),
        F.sum(dec(F.col("ry"))).alias("sry"),
        F.sum(dec(F.col("rx") * F.col("rx"))).alias("sxx"),
        F.sum(dec(F.col("ry") * F.col("ry"))).alias("syy"),
        F.sum(dec(F.col("rx") * F.col("ry"))).alias("sxy"),
    )
    return m.selectExpr(
        "l_returnflag",
        "n",
        "CAST(CAST(n * sxy - srx * sry AS DECIMAL(38,0)) AS STRING) AS num",
        f"{_SPEAR_RHO} AS rho",
    )


_SF_SEED = chain_seed("sf")
_SF_B = 64  # replicates; p-value resolution 1/64, stated in the output


@query(
    "stat_signflip_permutation",
    oracle=XXH64_MACROS
    + f"""
    WITH diffs AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(floor(value * 1000) AS BIGINT)
                             ELSE 0 END)
                  - sum(CASE WHEN event_type = 'click'
                             THEN CAST(floor(value * 1000) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS d
        FROM events
        WHERE event_type IN ('purchase', 'click')
        GROUP BY user_id
    ),
    obs AS (
        SELECT CAST(sum(d) AS BIGINT) AS t_obs, count(*) AS n_users
        FROM diffs
    ),
    reps AS (
        SELECT b.b,
               CAST(sum(CASE WHEN xxh64_long(
                        user_id * {_SF_B} + b.b, {_SF_SEED}::UBIGINT) >= 0
                    THEN d ELSE -d END) AS BIGINT) AS t_rep
        FROM diffs
        CROSS JOIN (SELECT unnest(range(0, {_SF_B})) AS b) b
        GROUP BY b.b
    )
    SELECT CAST(n_users AS BIGINT) AS n_users,
           t_obs AS t_obs_milli,
           CAST({_SF_B} AS BIGINT) AS n_replicates,
           CAST((SELECT count(*) FROM reps
                 WHERE abs(t_rep) >= abs(obs.t_obs)) AS BIGINT)
               AS n_as_extreme,
           CAST((SELECT min(t_rep) FROM reps) AS BIGINT) AS t_rep_min,
           CAST((SELECT max(t_rep) FROM reps) AS BIGINT) AS t_rep_max
    FROM obs
    """,
)
def stat_signflip_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sign-flip permutation test on the per-user
    purchase-minus-click value difference — distribution-free
    significance for events_ab_test_lift's effect, with ZERO
    distributional assumptions (the rank tests still assume
    exchangeability of shapes).

    Under H0 the per-user differences are sign-symmetric, so T = sum(d_u)
    is compared against replicates that flip each user's sign. The flips
    are xxhash64('sf', user_id*64 + b) >= 0 — Spark's builtin replayed
    bit-for-bit by the DuckDB macros — so both engines enumerate the SAME
    64 replicates and the whole Monte-Carlo procedure hash-matches
    (the md5-bucket determinism rule applied to resampling). p-value
    resolution is 1/64; n_as_extreme rides with n_replicates so the
    reader forms p = (n_as_extreme)/64 themselves.

    Shape at 100 TB: one per-user reduction over facts (combinable),
    then a 64x explode of the per-user table into one combinable
    aggregate per replicate — the replicate pass never re-reads facts.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "user_id",
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 1000).cast("long"),
            )
            .otherwise(-F.floor(F.col("value") * 1000).cast("long"))
            .alias("sd"),
        )
    )
    diffs = ev.groupBy("user_id").agg(F.sum("sd").cast("long").alias("d"))
    diffs = diffs.localCheckpoint(eager=True)  # obs + reps both read it
    obs = diffs.agg(
        F.sum("d").cast("long").alias("t_obs_milli"),
        F.count(F.lit(1)).alias("n_users"),
    )
    reps = (
        diffs.withColumn(
            "b", F.explode(F.sequence(F.lit(0), F.lit(_SF_B - 1)))
        )
        .withColumn(
            "s",
            F.when(
                F.xxhash64(
                    F.lit("sf"),
                    (F.col("user_id") * _SF_B + F.col("b")).cast("long"),
                )
                >= 0,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
        .groupBy("b")
        .agg(F.sum(F.col("s") * F.col("d")).cast("long").alias("t_rep"))
    )
    summary = reps.agg(
        F.min("t_rep").cast("long").alias("t_rep_min"),
        F.max("t_rep").cast("long").alias("t_rep_max"),
    )
    # The extreme-count needs |t_obs| beside every replicate: broadcast the
    # 1-row obs (the documented 1-row metric-merge crossJoin pattern).
    extreme = (
        reps.crossJoin(F.broadcast(obs))
        .filter(F.abs(F.col("t_rep")) >= F.abs(F.col("t_obs_milli")))
        .agg(F.count(F.lit(1)).cast("long").alias("n_as_extreme"))
    )
    return (
        obs.crossJoin(F.broadcast(extreme))
        .crossJoin(F.broadcast(summary))
        .select(
            F.col("n_users").cast("long").alias("n_users"),
            "t_obs_milli",
            F.lit(_SF_B).cast("long").alias("n_replicates"),
            "n_as_extreme",
            "t_rep_min",
            "t_rep_max",
        )
    )


_XCORR_R = (
    "CAST(n_pairs * sab - sa * sb AS DOUBLE)"
    " / sqrt(CAST(n_pairs * saa - sa * sa AS DOUBLE)"
    " * CAST(n_pairs * sbb - sb * sb AS DOUBLE))"
)


@query(
    "events_cross_correlation",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '{_EPOCH}' AS BIGINT) AS day,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(floor(value * 1000) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS b
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    pairs AS (
        SELECT lg.lag_days, l.a AS a, r.b AS b
        FROM daily l
        CROSS JOIN (SELECT unnest(range(-7, 8)) AS lag_days) lg
        JOIN daily r ON r.day = l.day + lg.lag_days
    ),
    m AS (
        SELECT lag_days, count(*) AS n_pairs,
               sum(a) AS sa, sum(b) AS sb,
               sum(a * a) AS saa, sum(b * b) AS sbb,
               sum(a * b) AS sab
        FROM pairs GROUP BY lag_days
    )
    SELECT CAST(lag_days AS BIGINT) AS lag_days,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           {_XCORR_R} AS corr_ab
    FROM m
    """,
)
def events_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the daily purchase-revenue series
    and the daily click-count series, lags -7..+7 — the does-marketing-
    lead-revenue diagnostic beside events_autocorr_lag1's self-version.

    Day buckets are epoch-day arithmetic (the seasonality rule: calendar
    builtins disagree across engines). Pairing is an inner join on the
    day table with itself shifted by each lag — days absent from the data
    drop out identically in both engines, so no zero-fill convention is
    needed. Per lag, Pearson r comes from exact integer moments
    (DECIMAL(38,0)-widened) with the one shared double expression.

    Shape at 100 TB: facts reduce once to the per-day aggregate
    (calendar-bounded); everything after runs on |days| x 15 rows —
    metadata. The moments are per-lag combinable aggregates.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            f"CAST(datediff(CAST(ts AS DATE), DATE '{_EPOCH}') AS BIGINT)"
        ).alias("day")
    ).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 1000).cast("long"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("b"),
    )
    daily = daily.localCheckpoint(eager=True)  # both sides of the self-join
    left = daily.withColumn(
        "lag_days", F.explode(F.sequence(F.lit(-7), F.lit(7)))
    ).select("lag_days", (F.col("day") + F.col("lag_days")).alias("rday"), "a")
    right = daily.select(F.col("day").alias("rday"), "b")
    pairs = left.join(right, "rday")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = pairs.groupBy("lag_days").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(dec(F.col("a"))).alias("sa"),
        F.sum(dec(F.col("b"))).alias("sb"),
        F.sum(dec(F.col("a") * F.col("a"))).alias("saa"),
        F.sum(dec(F.col("b") * F.col("b"))).alias("sbb"),
        F.sum(dec(F.col("a") * F.col("b"))).alias("sab"),
    )
    return m.selectExpr(
        "CAST(lag_days AS BIGINT) AS lag_days",
        "CAST(n_pairs AS BIGINT) AS n_pairs",
        f"{_XCORR_R} AS corr_ab",
    )
