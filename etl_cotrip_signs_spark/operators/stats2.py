"""Statistical-inference + behavioral-model operators [EXT beyond
task.ts — engine surface breadth]: weekly cohort retention, Welch's
unequal-variance t-test from exact moments, two-feature OLS via centered
normal equations, and the stationary distribution of the behavioral
Markov chain.

All four are oracle-checked. The shared discipline is the
``stat_corr_moments`` one: every data-dependent reduction is an EXACT
integer (BIGINT / DECIMAL(38,0) Spark-side, HUGEINT-widened in DuckDB),
and any final float emerges from ONE textually identical double
expression evaluated on those exact integers — each IEEE op is correctly
rounded, so identical expression trees on identical inputs are
bit-identical across engines and hashable by the driver.

Scale notes (100 TB):
- retention reduces to one distinct user-week table (the same shuffle
  sessionization pays) + two metadata-sized aggregates; the cohort-size
  join is broadcast (|weeks| rows);
- Welch and OLS are single-pass map-side-combinable moment aggregates —
  the whole test/fit ships 6-9 numbers per group through the shuffle,
  never rows; a two-pass mean-then-deviation formulation reads the data
  twice and is rejected here for that reason;
- the Markov chain's state is the |types|x|types| count matrix —
  metadata-sized — so power iteration runs on a table of a few dozen
  rows regardless of event volume; only the one transition-count window
  touches the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io import load_table
from ..registry import query

# Fixed literal day-0 anchor: both engines difference against the epoch
# date, giving exact integer days (Spark datediff INT, DuckDB DATE-DATE
# BIGINT — both cast to BIGINT before the div-7 week bucketing).
_EPOCH = "1970-01-01"


@query(
    "events_retention_matrix",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id,
               (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS week
        FROM events
    ),
    cohort AS (
        SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
    ),
    sizes AS (
        SELECT cohort_week, count(*) AS cohort_users
        FROM cohort GROUP BY cohort_week
    ),
    cells AS (
        SELECT c.cohort_week,
               uw.week - c.cohort_week AS week_offset,
               count(*) AS n_active
        FROM uw JOIN cohort c USING (user_id)
        GROUP BY c.cohort_week, uw.week - c.cohort_week
    )
    SELECT CAST(cells.cohort_week AS BIGINT) AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           n_active,
           cohort_users,
           (1000000 * n_active) // cohort_users AS retention_ppm
    FROM cells JOIN sizes USING (cohort_week)
    """,
)
def events_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by the calendar
    week of their FIRST event (cohort), each later week's cell is the
    share of the cohort still active — the standard growth-analytics
    readout beside orders_cohort_ltv's revenue curve (retention counts
    WHO returns; LTV sums what they spend).

    Weeks are absolute epoch-day // 7 buckets (arithmetic, not
    weekofyear() — week-numbering builtins disagree across engines on
    ISO/locale rules the same way dayofweek() does, per
    events_seasonality_profile). Retention is exact integer ppm; both
    counts ride in the row so the division is auditable.

    Shape: distinct user-week (one shuffle on user_id also reused by the
    cohort min), then two metadata-sized aggregates joined broadcast —
    the output is O(weeks^2) cells regardless of event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.expr(
            f"CAST(datediff(CAST(ts AS DATE), DATE '{_EPOCH}') AS BIGINT) div 7"
        ).alias("week"),
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    cells = (
        uw.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_users",
        F.expr("(1000000 * n_active) div cohort_users").alias("retention_ppm"),
    )


@query(
    "stats_welch_ttest",
    oracle="""
    WITH m AS (
        SELECT
          sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_a,
          sum(CASE WHEN event_type = 'purchase' THEN x ELSE 0 END) AS sx_a,
          sum(CASE WHEN event_type = 'purchase' THEN x * x ELSE 0 END) AS sx2_a,
          sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_b,
          sum(CASE WHEN event_type = 'click' THEN x ELSE 0 END) AS sx_b,
          sum(CASE WHEN event_type = 'click' THEN x * x ELSE 0 END) AS sx2_b
        FROM (
            SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS x
            FROM events
            WHERE event_type IN ('purchase', 'click')
        )
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(sx_a AS VARCHAR) AS sum_a_milli,
           CAST(sx_b AS VARCHAR) AS sum_b_milli,
           (CAST(sx_a AS DOUBLE) / n_a - CAST(sx_b AS DOUBLE) / n_b)
             / sqrt(
                 CAST(n_a * sx2_a - sx_a * sx_a AS DOUBLE)
                   / (CAST(n_a AS DOUBLE) * (n_a - 1) * n_a)
                 + CAST(n_b * sx2_b - sx_b * sx_b AS DOUBLE)
                   / (CAST(n_b AS DOUBLE) * (n_b - 1) * n_b)
             ) AS t_stat,
           (
             CAST(n_a * sx2_a - sx_a * sx_a AS DOUBLE)
               / (CAST(n_a AS DOUBLE) * (n_a - 1) * n_a)
             + CAST(n_b * sx2_b - sx_b * sx_b AS DOUBLE)
               / (CAST(n_b AS DOUBLE) * (n_b - 1) * n_b)
           ) * (
             CAST(n_a * sx2_a - sx_a * sx_a AS DOUBLE)
               / (CAST(n_a AS DOUBLE) * (n_a - 1) * n_a)
             + CAST(n_b * sx2_b - sx_b * sx_b AS DOUBLE)
               / (CAST(n_b AS DOUBLE) * (n_b - 1) * n_b)
           ) / (
             (CAST(n_a * sx2_a - sx_a * sx_a AS DOUBLE)
               / (CAST(n_a AS DOUBLE) * (n_a - 1) * n_a))
             * (CAST(n_a * sx2_a - sx_a * sx_a AS DOUBLE)
               / (CAST(n_a AS DOUBLE) * (n_a - 1) * n_a)) / (n_a - 1)
             + (CAST(n_b * sx2_b - sx_b * sx_b AS DOUBLE)
               / (CAST(n_b AS DOUBLE) * (n_b - 1) * n_b))
             * (CAST(n_b * sx2_b - sx_b * sx_b AS DOUBLE)
               / (CAST(n_b AS DOUBLE) * (n_b - 1) * n_b)) / (n_b - 1)
           ) AS welch_dof
    FROM m
    """,
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (purchase vs click event values)
    from exact integer moments — the A/B analyst's significance readout
    beside events_ab_test_lift's effect size.

    Values floor to integer milli-units once; each arm contributes
    (n, sum, sum-of-squares) through ONE conditional map-side-combinable
    aggregate (single pass, single row out). The t-statistic and the
    Welch-Satterthwaite dof are then one shared double expression over
    those integers: se2_i = (n*sx2 - sx^2) / (n * (n-1) * n) is the
    standard-error-squared with the sample-variance correction, kept as
    a single division so both engines round identically. The sums ride
    along as strings (HUGEINT->pandas is lossy float64).

    Shape at 100 TB: the test IS the moment aggregate — 6 numbers through
    the shuffle; the final row is arithmetic.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "event_type",
            F.floor(F.col("value") * 1000).cast("long").alias("x"),
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a = F.col("event_type") == "purchase"
    b = F.col("event_type") == "click"
    m = ev.agg(
        F.sum(F.when(a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(a, dec(F.col("x"))).otherwise(dec(F.lit(0)))).alias("sx_a"),
        F.sum(
            F.when(a, dec(F.col("x") * F.col("x"))).otherwise(dec(F.lit(0)))
        ).alias("sx2_a"),
        F.sum(F.when(b, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(b, dec(F.col("x"))).otherwise(dec(F.lit(0)))).alias("sx_b"),
        F.sum(
            F.when(b, dec(F.col("x") * F.col("x"))).otherwise(dec(F.lit(0)))
        ).alias("sx2_b"),
    )
    se2_a = (
        "CAST(n_a * sx2_a - sx_a * sx_a AS DOUBLE)"
        " / (CAST(n_a AS DOUBLE) * (n_a - 1) * n_a)"
    )
    se2_b = (
        "CAST(n_b * sx2_b - sx_b * sx_b AS DOUBLE)"
        " / (CAST(n_b AS DOUBLE) * (n_b - 1) * n_b)"
    )
    return m.selectExpr(
        "n_a",
        "n_b",
        "CAST(sx_a AS STRING) AS sum_a_milli",
        "CAST(sx_b AS STRING) AS sum_b_milli",
        f"(CAST(sx_a AS DOUBLE) / n_a - CAST(sx_b AS DOUBLE) / n_b)"
        f" / sqrt({se2_a} + {se2_b}) AS t_stat",
        f"({se2_a} + {se2_b}) * ({se2_a} + {se2_b})"
        f" / (({se2_a}) * ({se2_a}) / (n_a - 1)"
        f" + ({se2_b}) * ({se2_b}) / (n_b - 1)) AS welch_dof",
    )


@query(
    "trend_ols_two_features",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               count(*) AS n,
               sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
               sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
               sum(x1 * x2) AS s12,
               sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
        FROM (
            SELECT l_returnflag,
                   CAST(l_quantity AS BIGINT) AS x1,
                   CAST(floor(l_discount * 1000) AS BIGINT) AS x2,
                   CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem
        )
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(n * s11 - sx1 * sx1 AS VARCHAR) AS a11,
           CAST(n * s22 - sx2 * sx2 AS VARCHAR) AS a22,
           CAST(n * s12 - sx1 * sx2 AS VARCHAR) AS a12,
           (CAST(n * s22 - sx2 * sx2 AS DOUBLE)
              * CAST(n * s1y - sx1 * sy AS DOUBLE)
            - CAST(n * s12 - sx1 * sx2 AS DOUBLE)
              * CAST(n * s2y - sx2 * sy AS DOUBLE))
           / (CAST(n * s11 - sx1 * sx1 AS DOUBLE)
                * CAST(n * s22 - sx2 * sx2 AS DOUBLE)
              - CAST(n * s12 - sx1 * sx2 AS DOUBLE)
                * CAST(n * s12 - sx1 * sx2 AS DOUBLE)) AS beta_qty,
           (CAST(n * s11 - sx1 * sx1 AS DOUBLE)
              * CAST(n * s2y - sx2 * sy AS DOUBLE)
            - CAST(n * s12 - sx1 * sx2 AS DOUBLE)
              * CAST(n * s1y - sx1 * sy AS DOUBLE))
           / (CAST(n * s11 - sx1 * sx1 AS DOUBLE)
                * CAST(n * s22 - sx2 * sx2 AS DOUBLE)
              - CAST(n * s12 - sx1 * sx2 AS DOUBLE)
                * CAST(n * s12 - sx1 * sx2 AS DOUBLE)) AS beta_disc
    FROM m
    """,
)
def trend_ols_two_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature least squares (price ~ quantity + discount, per
    returnflag) via CENTERED normal equations on exact integer moments —
    the multi-feature generalization of trend_daily_revenue's single
    slope.

    Nine moments accumulate exactly in one map-side-combinable pass
    (per-row products fit BIGINT; sums widen to DECIMAL(38,0) /
    HUGEINT). The centered 2x2 system n*S - s*s' stays integer-exact —
    at n=1e12 rows the entries sit ~1e33, inside DECIMAL(38) — and
    Cramer's rule is applied in DOUBLE (entries cast once, then one
    shared expression tree), because the determinant's PRODUCT of two
    ~1e33 entries would overflow 128-bit exact types; the float step is
    confined to the final 3-operation ratio where both engines round
    identically. The exact matrix entries ride along as strings for
    audit.

    Shape at 100 TB: the fit is the aggregate — 10 numbers per group
    through the shuffle, one arithmetic row out per group.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 1000).cast("long").alias("x2"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x1"))).alias("sx1"),
        F.sum(dec(F.col("x2"))).alias("sx2"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x1") * F.col("x1"))).alias("s11"),
        F.sum(dec(F.col("x2") * F.col("x2"))).alias("s22"),
        F.sum(dec(F.col("x1") * F.col("x2"))).alias("s12"),
        F.sum(dec(F.col("x1") * F.col("y"))).alias("s1y"),
        F.sum(dec(F.col("x2") * F.col("y"))).alias("s2y"),
    )
    a11 = "CAST(n * s11 - sx1 * sx1 AS DOUBLE)"
    a22 = "CAST(n * s22 - sx2 * sx2 AS DOUBLE)"
    a12 = "CAST(n * s12 - sx1 * sx2 AS DOUBLE)"
    b1 = "CAST(n * s1y - sx1 * sy AS DOUBLE)"
    b2 = "CAST(n * s2y - sx2 * sy AS DOUBLE)"
    det = f"({a11} * {a22} - {a12} * {a12})"
    return m.selectExpr(
        "l_returnflag",
        "n",
        "CAST(CAST(n * s11 - sx1 * sx1 AS DECIMAL(38,0)) AS STRING) AS a11",
        "CAST(CAST(n * s22 - sx2 * sx2 AS DECIMAL(38,0)) AS STRING) AS a22",
        "CAST(CAST(n * s12 - sx1 * sx2 AS DECIMAL(38,0)) AS STRING) AS a12",
        f"({a22} * {b1} - {a12} * {b2}) / {det} AS beta_qty",
        f"({a11} * {b2} - {a12} * {b1}) / {det} AS beta_disc",
    )


_MARKOV_ROUNDS = 4


def _markov_oracle() -> str:
    """Unrolled power iteration: counts/out-degrees once, then
    _MARKOV_ROUNDS rank tables each a pure integer function of the
    previous (the kmeans/pagerank unroll discipline). States with no
    outgoing transitions contribute nothing (guarded by the join);
    absorbed mass simply decays, identically in both engines."""
    stages = []
    prev = "r0"
    for i in range(1, _MARKOV_ROUNDS + 1):
        stages.append(
            f"""r{i} AS (
        SELECT t.next_type AS event_type,
               sum(({prev}.rank_ppm * t.n) // o.out_n) AS rank_ppm
        FROM trans t
        JOIN outs o ON o.event_type = t.event_type
        JOIN {prev} ON {prev}.event_type = t.event_type
        GROUP BY t.next_type
    )"""
        )
        prev = f"r{i}"
    joined = ",\n    ".join(stages)
    return f"""
    WITH ordered AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    trans AS (
        SELECT event_type, next_type, count(*) AS n
        FROM ordered WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    ),
    outs AS (
        SELECT event_type, sum(n) AS out_n FROM trans GROUP BY event_type
    ),
    states AS (SELECT DISTINCT event_type FROM events),
    nstates AS (SELECT count(*) AS k FROM states),
    r0 AS (
        SELECT event_type, 1000000 // k AS rank_ppm
        FROM states, nstates
    ),
    {joined}
    SELECT event_type, CAST(rank_ppm AS BIGINT) AS rank_ppm
    FROM {prev}
    """


@query("events_markov_stationary", oracle=_markov_oracle())
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the behavioral Markov chain: power
    iteration over events_transition_counts' matrix, in exact integer
    ppm — the long-run where-do-users-end-up readout that turns the
    transition matrix into a prioritized list.

    Update rule: rank'(j) = sum_i (rank(i) * n_ij) // out(i), every term
    a pure integer function — so {_MARKOV_ROUNDS} Spark iterations over
    the metadata-sized (|types|^2) count table hash-match the oracle's
    unrolled CTE chain (the kmeans_lloyd_exact discipline; float
    PageRank stays honestly rows-only, the integer twin is this).
    Truncation loses <|types| ppm per round to rounding — determinism is
    the point, the analyst reads ppm.

    Shape at 100 TB: one window + one count aggregate touch the fact
    table; iteration runs on a handful of rows. The chain state is
    broadcast-sized by construction.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select("event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    outs = trans.groupBy("event_type").agg(F.sum("n").alias("out_n"))
    k = ev.select("event_type").distinct().count()
    ranks = (
        ev.select("event_type")
        .distinct()
        .select("event_type", F.lit(1000000 // k).cast("long").alias("rank_ppm"))
    )
    edges = trans.join(outs, "event_type").select(
        "event_type", "next_type", "n", "out_n"
    )
    for _ in range(_MARKOV_ROUNDS):
        ranks = (
            edges.join(ranks, "event_type")
            .groupBy("next_type")
            .agg(F.expr("sum((rank_ppm * n) div out_n)").alias("rank_ppm"))
            .withColumnRenamed("next_type", "event_type")
        )
    return ranks.select("event_type", F.col("rank_ppm").cast("long").alias("rank_ppm"))
