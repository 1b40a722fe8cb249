"""Robust / order-statistic operators [EXT — engine surface breadth]:
rolling median, weighted median, and an equi-depth histogram. All
oracle-checked, all exact-integer (cents), because order statistics are
where float ties and engine-specific interpolation rules bite hardest:
every median here is the LOWER median (quantile_disc semantics), never
an interpolated average two engines might round apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.xxh64_sql import XXH64_MACROS
from ..io import load_table
from ..registry import query

ROLL_FRAME = 7  # rolling median over the last 7 observations


def grouped_discrete_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tie_cols: list[str],
    qmap: dict[str, float],
    count_col: str | None = None,
) -> DataFrame:
    """Per-group discrete (lower) quantiles: one wide row per group with a
    column per requested q, each the value at rank ceil(q*n) in
    (value, *tie_cols) order — DuckDB quantile_disc positioning, probed
    at the discriminating n=202/q=0.9 boundary. ONE window pass serves
    every q. Shared by winsorized_mean_events and ops_audit's MAD
    medians (review finding: the subtle rank formula + tie-break lived
    in two drifting copies)."""
    w = Window.partitionBy(group_col).orderBy(value_col, *tie_cols)
    wn = Window.partitionBy(group_col)
    ranked = df.select(
        group_col,
        value_col,
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * F.lit(q)),
                F.col(value_col),
            )
        ).alias(name)
        for name, q in qmap.items()
    ]
    if count_col is not None:
        # n is constant per group — emit it for free instead of forcing
        # callers into a second aggregation + join (review finding)
        aggs.append(F.max("n").alias(count_col))
    return ranked.groupBy(group_col).agg(*aggs)



@query(
    "window_rolling_median",
    oracle=f"""
    WITH v AS (
        SELECT user_id, ts, event_id,
               CAST(floor(value * 100) AS BIGINT) AS v_cents
        FROM events
    )
    SELECT user_id, event_id,
           CAST(quantile_disc(v_cents, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {ROLL_FRAME - 1} PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rolling_median_cents
    FROM v
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over the trailing 7 observations per user.

    Spark has NO median window function — the re-expression:
    collect_list over the ROWS frame, array_sort, pick the lower-middle
    element. The intermediate is a bounded 7-element array per row
    (frame-sized, not partition-sized — memory is O(frame), safe at any
    scale), sorted JVM-side inside whole-stage codegen; one exchange on
    user_id serves everything. The DuckDB oracle uses its native
    quantile_disc window aggregate — an independent engine path.

    Lower median (discrete), not interpolated: for even-length frames
    engines disagree on interpolation rounding; element k = (n+1) div 2
    of the sorted frame is tie-free.
    """
    v = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ROLL_FRAME - 1), Window.currentRow)
    )
    frame = F.array_sort(F.collect_list("v_cents").over(w))
    return v.select(
        "user_id",
        "event_id",
        F.element_at(frame, ((F.size(frame) + 1) / 2).cast("int")).alias(
            "rolling_median_cents"
        ),
    )


@query(
    "weighted_median_lineitem",
    oracle="""
    WITH v AS (
        SELECT l_returnflag,
               CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
               CAST(l_quantity AS BIGINT) AS w,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    cum AS (
        SELECT l_returnflag, cents, w,
               sum(w) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY cents, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cw,
               sum(w) OVER (PARTITION BY l_returnflag) AS total_w
        FROM v
    )
    SELECT l_returnflag,
           CAST(min(CASE WHEN 2 * cw >= total_w THEN cents END) AS BIGINT)
               AS weighted_median_cents,
           CAST(max(total_w) AS BIGINT) AS total_weight
    FROM cum
    GROUP BY l_returnflag
    """,
)
def weighted_median_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (lower) median: the price at which half the QUANTITY mass
    sits at-or-below — the robust aggregate behind fair-price and
    capacity-planning readouts, un-skewable by outlier rows.

    Shape: one window pass builds the cumulative weight in value order,
    the answer is the first value whose doubled cumulative weight
    reaches the total — a min over a CASE, not a second sort. All
    integers (cents × quantity units); both engines run the same
    formulation with a fully tie-broken ORDER BY so the cumulative sums
    are identical row-for-row.
    """
    v = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = v.select(
        "l_returnflag",
        "cents",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_all).alias("total_w"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.min(F.when(2 * F.col("cw") >= F.col("total_w"), F.col("cents"))).alias(
            "weighted_median_cents"
        ),
        F.max("total_w").alias("total_weight"),
    )


@query(
    "agg_histogram_equidepth",
    oracle="""
    WITH v AS (
        SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
        FROM orders
    ),
    tiled AS (
        SELECT cents,
               ntile(10) OVER (ORDER BY cents, o_orderkey) AS bucket
        FROM v
    )
    SELECT bucket,
           CAST(min(cents) AS BIGINT) AS lo_cents,
           CAST(max(cents) AS BIGINT) AS hi_cents,
           count(*) AS n
    FROM tiled
    GROUP BY bucket
    """,
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (10 buckets of equal row count) — the
    optimizer-statistics twin of the equi-width `agg_histogram_orders`.

    Equi-depth bounds are what a CBO keeps for selectivity estimation
    (equal-width buckets collapse under skew). ntile over a fully
    tie-broken total order makes bucket assignment deterministic in
    both engines. The fixture path uses the direct ntile window; at
    100 TB the bounds come from `kth_statistic_iterative`'s two-pass
    bucket selection at the 10 decile ks — same output, no global
    window (documented trade, same readout).
    """
    v = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    tiled = v.select(
        "cents",
        F.ntile(10).over(Window.orderBy("cents", "o_orderkey")).alias("bucket"),
    )
    return tiled.groupBy("bucket").agg(
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "winsorized_mean_events",
    oracle="""
    WITH v AS (
        SELECT event_type,
               CAST(floor(value * 100) AS BIGINT) AS v_cents
        FROM events
    ),
    bounds AS (
        SELECT event_type,
               CAST(quantile_disc(v_cents, 0.1) AS BIGINT) AS p10,
               CAST(quantile_disc(v_cents, 0.9) AS BIGINT) AS p90
        FROM v GROUP BY event_type
    )
    SELECT v.event_type,
           max(b.p10) AS p10_cents,
           max(b.p90) AS p90_cents,
           count(*) AS n,
           CAST(sum(greatest(b.p10, least(b.p90, v.v_cents))) AS BIGINT)
               // count(*) AS winsorized_mean_cents
    FROM v JOIN bounds b USING (event_type)
    GROUP BY v.event_type
    """,
)
def winsorized_mean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean: clip to [p10, p90], then average — the robust
    location estimate that keeps sample size (unlike trimming, which
    drops the tails; the trimmed twin is udaf_trimmed_mean).

    The discrete quantile bounds come from the same row_number identity
    as the MAD medians, generalized: the lower q-quantile is the value
    at rank ceil(q*n) — the inverse-CDF definition, verified to match
    DuckDB's quantile_disc positioning (rank 182 at n=202, q=0.9; a
    floor((n-1)q)+1 formulation differs exactly there). One window
    pass for ranks, a broadcast of the 5-row bounds table back, one
    exact-integer aggregate with the final integer division.
    """
    v = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    bounds = grouped_discrete_quantiles(
        v, "event_type", "v_cents", ["event_id"], {"p10": 0.1, "p90": 0.9}
    )
    return (
        v.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("p10").alias("p10_cents"),
            F.max("p90").alias("p90_cents"),
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "sum(greatest(p10, least(p90, v_cents))) div count(1)"
            ).alias("winsorized_mean_cents"),
        )
    )


@query(
    "isotonic_regression_daily",
    # Isotonic (monotone nondecreasing) regression of daily revenue over
    # time via the MINIMAX identity: the PAVA solution satisfies
    # fit_i = max_{j<=i} min_{k>=i} avg(y[j..k]) (Robertson/Wright/Dykstra
    # 1988, the standard characterization). Averages are floor-quantized
    # to millicents, and because floor is monotone it COMMUTES with the
    # min and the max — so the quantized minimax equals
    # floor(1000 * exact PAVA) exactly (pinned against a pure-python PAVA
    # in tests/test_isotonic.py). The pair space is C(days, 2): calendar-
    # bounded like trend_theil_sen, independent of row count.
    oracle="""
    WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_orderdate
    ),
    idx AS (
        SELECT day, cents,
               row_number() OVER (ORDER BY day) AS i,
               sum(cents) OVER (ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS s
        FROM daily
    ),
    a AS (
        -- widened 1000x: the full-range pair's numerator is 1000 * total
        -- corpus cents, past BIGINT at extreme sf (review finding, r5)
        SELECT j.i AS j, k.i AS k,
               CAST(1000 AS HUGEINT) * (k.s - j.s + j.cents)
                   // (k.i - j.i + 1) AS v
        FROM idx j JOIN idx k ON j.i <= k.i
    ),
    m AS (
        SELECT j, k AS i,
               min(v) OVER (PARTITION BY j ORDER BY k DESC
                            ROWS UNBOUNDED PRECEDING) AS mn
        FROM a
    ),
    fit AS (SELECT i, CAST(max(mn) AS BIGINT) AS fit_millicents
            FROM m GROUP BY i)
    SELECT d.day, d.cents AS daily_cents, f.fit_millicents
    FROM idx d JOIN fit f ON d.i = f.i
    """,
)
def isotonic_regression_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression of the daily-revenue series — the monotone
    trend fit (and, on probability columns, the standard ML calibration
    curve). No PAVA loop anywhere: the minimax identity turns the
    pool-adjacent-violators recursion into two windows over the
    calendar-bounded pair table — suffix-min along k per start j, then a
    plain max aggregate over j <= i (every pair row of partition i has
    j <= i by construction).

    Scale shape: the daily rollup is the only data-sized aggregate;
    prefix sums over the day table, a broadcast self-join bounded by
    C(days, 2), one window, one combinable max — the same
    calendar-not-corpus scaling argument as trend_theil_sen."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderdate",
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("o_orderdate")
        .agg(F.sum("c").alias("cents"))
    )
    w_ord = Window.orderBy("o_orderdate")
    idx = daily.select(
        F.col("o_orderdate").alias("day"),
        "cents",
        F.row_number().over(w_ord).alias("i"),
        F.sum("cents").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "s"
        ),
    ).localCheckpoint(eager=True)  # pair join + final join both consume it
    j = idx.select(
        F.col("i").alias("j"), F.col("s").alias("sj"), F.col("cents").alias("cj")
    )
    k = idx.select(F.col("i").alias("k"), F.col("s").alias("sk"))
    a = j.join(F.broadcast(k), F.col("j") <= F.col("k")).select(
        "j",
        "k",
        # DECIMAL-widened to mirror the oracle's HUGEINT (review finding,
        # r5); div on DECIMAL truncates to LONG = DuckDB HUGEINT //
        F.expr(
            "CAST(1000 AS DECIMAL(38,0)) * (sk - sj + cj) div (k - j + 1)"
        ).alias("v"),
    )
    w_sfx = (
        Window.partitionBy("j")
        .orderBy(F.col("k").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = a.select("j", F.col("k").alias("i"), F.min("v").over(w_sfx).alias("mn"))
    fit = m.groupBy("i").agg(F.max("mn").cast("long").alias("fit_millicents"))
    return idx.join(fit, "i").select(
        "day", F.col("cents").alias("daily_cents"), "fit_millicents"
    )


# --- wave 50 (round 9) ---

_MOM_K = 16  # buckets; bucket = xxhash64 of the row key mod k


@query(
    "agg_median_of_means",
    oracle=XXH64_MACROS
    + f"""
    WITH b AS (
        SELECT ((xxh64_long(o_orderkey, 42::UBIGINT) % {_MOM_K})
                + {_MOM_K}) % {_MOM_K} AS bucket,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    per AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents) * 1000 // count(*) AS BIGINT) AS mean_milli
        FROM b GROUP BY bucket
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY mean_milli, bucket) AS rk
        FROM per
    ),
    mom AS (
        SELECT CAST(mean_milli AS BIGINT) AS mom_milli
        FROM ranked WHERE rk = ({_MOM_K} + 1) // 2
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(cents) * 1000 // count(*) AS BIGINT)
                   AS plain_mean_milli
        FROM b
    )
    SELECT t.n_rows, {_MOM_K} AS k_buckets,
           t.plain_mean_milli, m.mom_milli,
           CAST((m.mom_milli - t.plain_mean_milli) * 1000000
                // t.plain_mean_milli AS BIGINT) AS mom_vs_mean_ppm
    FROM tot t CROSS JOIN mom m
    """,
)
def agg_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means robust mean estimator (Nemirovsky-Yudin 1983; the
    standard heavy-tail telemetry estimator): rows hash-partition into
    k = {_MOM_K} buckets, each bucket reports its mean, and the estimate
    is the MEDIAN of the k means — sub-Gaussian deviation bounds under
    nothing but finite variance, where the plain mean is at an
    adversarial outlier's mercy. The readout carries both estimators and
    their ppm gap (a large gap IS the heavy-tail/outlier alarm).

    Exactness: buckets are xxhash64-deterministic (engine-replayed);
    bucket means are integer milli-units (sum·1000 DIV n), the median is
    an exact order statistic of the k means with bucket-id tie-break,
    and the comparison column is integer ppm.

    Scale shape: one combinable (bucket) aggregate — k cells of state —
    plus a k-row sort. The robust estimator costs exactly one extra
    GROUP BY key over the plain mean at any scale.
    """
    from pyspark.sql import Window as W

    b = load_table(spark, sf_dir, "orders").select(
        F.pmod(F.xxhash64("o_orderkey"), F.lit(_MOM_K)).alias("bucket"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    b = b.localCheckpoint(eager=True)  # per-bucket agg + the total both read
    per = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.expr("CAST(sum(cents) * 1000 DIV count(*) AS BIGINT)").alias(
            "mean_milli"
        ),
    )
    ranked = per.withColumn(
        "rk", F.row_number().over(W.orderBy("mean_milli", "bucket"))
    )
    mom = ranked.filter(F.col("rk") == (_MOM_K + 1) // 2).select(
        F.col("mean_milli").alias("mom_milli")
    )
    tot = b.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("CAST(sum(cents) * 1000 DIV count(*) AS BIGINT)").alias(
            "plain_mean_milli"
        ),
    )
    return tot.crossJoin(F.broadcast(mom)).select(
        "n_rows",
        F.lit(_MOM_K).cast("int").alias("k_buckets"),
        "plain_mean_milli",
        "mom_milli",
        F.expr(
            "CAST((mom_milli - plain_mean_milli) * 1000000"
            " DIV plain_mean_milli AS BIGINT)"
        ).alias("mom_vs_mean_ppm"),
    )


# Hill tail-index estimator over the top-k order values: per-row
# micro-quantized ln(x_i / x_ref) (the text_zipf_fit discipline — quantize
# BEFORE the sum so the corpus statistic is an exact integer sum), then
# alpha_hat = 1 / mean(ln terms).
_HILL_K = 100


@query(
    "orders_hill_tail_index",
    oracle=f"""
    WITH c AS (
        SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
               row_number() OVER (
                   ORDER BY floor(o_totalprice * 100) DESC, o_orderkey
               ) AS rk
        FROM orders
    ),
    ref AS (SELECT cents AS x_ref FROM c WHERE rk = {_HILL_K + 1}),
    terms AS (
        SELECT CAST(floor(ln(CAST(c.cents AS DOUBLE)
                             / CAST(r.x_ref AS DOUBLE)) * 1000000)
                    AS BIGINT) AS ln_micro
        FROM c CROSS JOIN ref r WHERE c.rk <= {_HILL_K}
    )
    SELECT {_HILL_K} AS k,
           (SELECT CAST(x_ref AS BIGINT) FROM ref) AS x_ref_cents,
           CAST(sum(ln_micro) AS BIGINT) AS sum_ln_micro,
           round(1000000.0 * {_HILL_K} / CAST(sum(ln_micro) AS DOUBLE), 6)
               AS hill_alpha
    FROM terms
    """,
)
def orders_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator (1975) of the Pareto tail index over the top-{_HILL_K}
    order values: alpha_hat = k / Σ ln(x_(i) / x_(k+1)) — THE heavy-tail
    diagnostic for revenue/latency/degree distributions (alpha <= 2 means
    infinite variance: means stop converging and median-of-means becomes
    mandatory; this estimator tells you WHICH regime the column is in,
    making it the companion readout to agg_median_of_means).

    Exactness: the top-k and the reference order statistic x_(k+1) come
    from an exact rank (value desc, key tie-break); each ln ratio is
    micro-quantized to an integer BEFORE the sum (the text_zipf_fit
    discipline), so the corpus statistic is an exact BIGINT sum and
    alpha is one shared division.

    Scale shape: the rank is a top-(k+1) problem — at 100 TB this plans
    as per-partition bounded heaps feeding one merge, never a full sort;
    the ln arithmetic touches k+1 rows. Output is 1 row.
    """
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    ranked = (
        c.withColumn(
            "rk",
            F.row_number().over(
                W.orderBy(F.col("cents").desc(), F.col("o_orderkey"))
            ),
        )
        .filter(F.col("rk") <= _HILL_K + 1)
        .localCheckpoint(eager=True)  # ref + terms consume it
    )
    ref = ranked.filter(F.col("rk") == _HILL_K + 1).select(
        F.col("cents").alias("x_ref")
    )
    terms = (
        ranked.filter(F.col("rk") <= _HILL_K)
        .crossJoin(F.broadcast(ref))
        .select(
            F.floor(
                F.log(
                    F.col("cents").cast("double")
                    / F.col("x_ref").cast("double")
                )
                * 1_000_000
            )
            .cast("long")
            .alias("ln_micro"),
            "x_ref",
        )
    )
    return terms.agg(
        F.lit(_HILL_K).cast("int").alias("k"),
        F.max("x_ref").cast("long").alias("x_ref_cents"),
        F.sum("ln_micro").cast("long").alias("sum_ln_micro"),
    ).selectExpr(
        "k",
        "x_ref_cents",
        "sum_ln_micro",
        f"round(1000000.0 * {_HILL_K} / CAST(sum_ln_micro AS DOUBLE), 6)"
        " AS hill_alpha",
    )
