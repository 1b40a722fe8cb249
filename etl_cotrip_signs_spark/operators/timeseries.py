"""Time-series operators [EXT beyond task.ts — engine surface breadth]:
EWMA smoothing, time-weighted average, CUSUM drift detection, and
gaps-and-islands interval merging.

All four are oracle-checked. The recurring determinism discipline:
time-series math is float-heavy, and parallel double summation is
order-nondeterministic — so every operator here converts to exact
integer units first (cents, epoch micros), does ALL accumulation in
integers (order-independent, engine-independent), and only divides at
the very end with integer division on non-negative operands (Spark
`div` truncates, DuckDB `//` floors — identical when non-negative).
round() is avoided for the double->cent conversion: Spark rounds
half-up, DuckDB half-away; floor() of the identical product is
tie-free.

The common scale shape: ONE hash exchange on the series key
(user_id / o_custkey) followed by partition-local window work — the
layout a 100 TB time-series table would already be bucketed in, making
every operator here exchange-free on a bucketed source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.xxh64_sql import XXH64_MACROS, chain_seed
from ..io import load_table
from ..registry import query

# EWMA with alpha=1/2 truncated to the last EWMA_TERMS observations.
# Weights 2^(EWMA_TERMS-1-l) for lag l are exact integers; the
# (numerator, denominator) pair is an exact rational — no float anywhere.
EWMA_TERMS = 8

_W = 2 ** (EWMA_TERMS - 1)
_EWMA_LAG_SQL = ", ".join(
    f"lag(v_cents, {l}) OVER w AS l{l}" for l in range(1, EWMA_TERMS)
)
_EWMA_NUM_SQL = " ".join(
    f"+ coalesce(l{l}, 0) * {2 ** (EWMA_TERMS - 1 - l)}"
    for l in range(1, EWMA_TERMS)
)
_EWMA_DEN_SQL = " ".join(
    f"+ CASE WHEN l{l} IS NULL THEN 0 ELSE {2 ** (EWMA_TERMS - 1 - l)} END"
    for l in range(1, EWMA_TERMS)
)

_V_CENTS_SQL = "CAST(floor(value * 100) AS BIGINT)"


@query(
    "events_ewma_dyadic",
    oracle=f"""
    WITH v AS (
        SELECT user_id, ts, event_id, {_V_CENTS_SQL} AS v_cents
        FROM events
    ),
    lagged AS (
        SELECT user_id, v_cents, {_EWMA_LAG_SQL},
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn_desc,
               count(*) OVER (PARTITION BY user_id) AS n_events
        FROM v
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, n_events,
           ((v_cents * {_W} {_EWMA_NUM_SQL}) * 1000000)
               // ({_W} {_EWMA_DEN_SQL}) AS ewma_e6
    FROM lagged
    WHERE rn_desc = 1
    """,
)
def events_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=1/2, 8-term), exact.

    The recursive EWMA s_i = a*x_i + (1-a)*s_{i-1} is the canonical
    "not a plain window function" — but its truncated form IS one: with
    alpha=1/2 the 8-term tail sum(x_{i-l} * 2^(7-l)) / sum(2^(7-l))
    captures all but 2^-8 of the mass and unrolls into lag() columns
    over a single (user_id, ts) window — one shuffle, one
    partition-local sort, no iteration, no Python. All eight lags share
    one WindowSpec, so they compile into ONE Window node. Numerator and
    denominator are exact BIGINTs (weights are powers of two, values
    are cents), so the oracle hash match is exact, not a float
    coincidence.

    Output: the final smoothed value per user (the last event's EWMA,
    scaled 1e6) — the "current state" a monitoring pipeline publishes.
    """
    v = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.col("v_cents") * _W
    den = F.lit(_W).cast("long")
    for l in range(1, EWMA_TERMS):
        lv = F.lag("v_cents", l).over(w)
        num = num + F.coalesce(lv, F.lit(0)) * (2 ** (EWMA_TERMS - 1 - l))
        den = den + F.when(lv.isNull(), 0).otherwise(2 ** (EWMA_TERMS - 1 - l))
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        v.select(
            "user_id",
            F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_events"),
            F.row_number().over(wd).alias("rn_desc"),
            (num * 1000000).alias("_num"),
            den.alias("_den"),
        )
        .filter(F.col("rn_desc") == 1)
        .select("user_id", "n_events", F.expr("_num div _den").alias("ewma_e6"))
    )


@query(
    "events_twap",
    oracle=f"""
    WITH v AS (
        SELECT user_id,
               CAST(ts AS DATE) AS day,
               {_V_CENTS_SQL} AS v_cents,
               CAST(epoch_us(lead(ts) OVER w) - epoch_us(ts) AS BIGINT) AS dur_us
        FROM events
        WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id)
    )
    SELECT user_id, day,
           CAST(sum(v_cents * dur_us) AS BIGINT) // CAST(sum(dur_us) AS BIGINT)
               AS twap_e2,
           CAST(sum(dur_us) AS BIGINT) AS held_us,
           count(*) AS n_held
    FROM v
    WHERE dur_us IS NOT NULL AND dur_us > 0
    GROUP BY user_id, day
    """,
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) per user per day.

    The telemetry/finance staple: each observation holds until the next
    one, so the day's average weights each value by its holding
    duration — a plain avg() over irregular samples is wrong. Shape:
    lead() over (user, day) to get the holding interval, then an
    ordinary partial+final aggregate of BIGINT products — exact
    epoch-microsecond weights, exact cent values, integer division
    last. Zero-duration observations (same-timestamp ticks) carry no
    time mass and are excluded on both sides; the day's final
    observation has no successor and likewise carries none.

    DuckDB's sum(BIGINT) widens to HUGEINT — the oracle casts back to
    BIGINT so schemas agree (cross-engine rule learned round 3).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    v = (
        e.select(
            "user_id",
            F.to_date("ts").alias("day"),
            "ts",
            "event_id",
            F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
        )
        .withColumn(
            "dur_us",
            (
                F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
                - F.unix_micros(F.col("ts").cast("timestamp"))
            ).cast("long"),
        )
        .filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
    )
    return v.groupBy("user_id", "day").agg(
        F.expr("sum(v_cents * dur_us) div sum(dur_us)").alias("twap_e2"),
        F.sum("dur_us").alias("held_us"),
        F.count(F.lit(1)).alias("n_held"),
    )


# CUSUM reference level: deviations are measured against a fixed target
# (150.00 in value units). A per-series mean would also work but makes the
# statistic two-pass; monitoring CUSUMs use a fixed target by design.
CUSUM_TARGET_CENTS = 15000


@query(
    "events_cusum_drift",
    oracle=f"""
    WITH v AS (
        SELECT user_id, ts, event_id,
               {_V_CENTS_SQL} - {CUSUM_TARGET_CENTS} AS dev
        FROM events
    ),
    pre AS (
        SELECT user_id, ts, event_id,
               CAST(sum(dev) OVER w AS BIGINT) AS prefix
        FROM v
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    drift AS (
        SELECT user_id,
               prefix
                   - least(0, min(prefix) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     )) AS drift
        FROM pre
    )
    SELECT user_id,
           CAST(max(drift) AS BIGINT) AS max_drift_e2,
           count(*) AS n_events,
           CAST(count(CASE WHEN drift >= 100000 THEN 1 END) AS BIGINT)
               AS n_alarms
    FROM drift
    GROUP BY user_id
    """,
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift statistic per user, exact integers.

    The textbook CUSUM s_i = max(0, s_{i-1} + (x_i - target)) is a
    recursion — but its value is algebraically
    prefix_i - min(0, min(prefix_j, j<=i)): the 0 term is the EMPTY
    prefix (s_0 = 0), without which a series whose deviations are
    positive from the very first event reports drift 0 at that event
    (caught in review; the buggy identity was mirrored in the oracle,
    so only re-derivation caught it). A plain composition of
    two same-spec windows (running sum, then running min of it). That
    identity turns an apparently-stateful scan into two partition-local
    window passes over one exchange — the same trick a 100 TB
    changepoint sweep needs, because a sequential stateful scan cannot
    parallelize but prefix windows can.

    Output per user: the maximum drift ever reached (scaled cents), the
    event count, and how many observations sat above a 1000.00-unit
    alarm threshold.
    """
    dev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.floor(F.col("value") * 100).cast("long") - CUSUM_TARGET_CENTS).alias(
            "dev"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = dev.select(
        "user_id", "ts", "event_id", F.sum("dev").over(w).alias("prefix")
    )
    drift = pre.select(
        "user_id",
        (
            F.col("prefix") - F.least(F.lit(0), F.min("prefix").over(w))
        ).alias("drift"),
    )
    return drift.groupBy("user_id").agg(
        F.max("drift").alias("max_drift_e2"),
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("drift") >= 100000, 1)).alias("n_alarms"),
    )


@query(
    "orders_interval_islands",
    oracle="""
    WITH iv AS (
        SELECT o_custkey,
               o_orderdate AS s,
               o_orderdate + INTERVAL 30 DAY AS e,
               o_orderkey
        FROM orders
    ),
    flagged AS (
        SELECT o_custkey, s, e, o_orderkey,
               CASE WHEN s > max(e) OVER (
                        PARTITION BY o_custkey ORDER BY s, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT o_custkey, s, e,
               sum(new_island) OVER (
                   PARTITION BY o_custkey ORDER BY s, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island_id
        FROM flagged
    ),
    merged AS (
        SELECT o_custkey, island_id,
               min(s) AS island_start, max(e) AS island_end, count(*) AS n_orders
        FROM islands
        GROUP BY o_custkey, island_id
    )
    SELECT o_custkey,
           count(*) AS n_islands,
           CAST(max(n_orders) AS BIGINT) AS max_orders_in_island,
           CAST(sum(date_diff('day', island_start, island_end)) AS BIGINT)
               AS covered_days
    FROM merged
    GROUP BY o_custkey
    """,
)
def orders_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: merge overlapping 30-day activity intervals.

    Each order opens a [orderdate, orderdate+30d] activity interval;
    overlapping intervals per customer merge into "islands" of
    continuous engagement. The classic SQL formulation — running
    max(end) over preceding rows flags island starts, a running sum of
    flags numbers the islands — is two same-partition windows plus two
    aggregations, all after a single exchange on o_custkey. No
    self-join: the naive interval-overlap self-join is O(n²) per
    customer and this is the standard linear replacement.

    The first interval of each customer has an empty preceding frame:
    max(e) is NULL, `s > NULL` is NULL, and BOTH engines' CASE treat
    the non-true condition as 0 — island ids therefore start at 0 in
    each engine consistently (ids are internal; only per-customer
    rollups are emitted).

    Output per customer: island count, the busiest island's order
    count, and total covered days.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("e"),
        "o_orderkey",
    )
    w_prev = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = o.select(
        "o_custkey",
        "s",
        "e",
        "o_orderkey",
        F.when(F.col("s") > F.max("e").over(w_prev), 1).otherwise(0).alias(
            "new_island"
        ),
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        "o_custkey", "s", "e", F.sum("new_island").over(w_run).alias("island_id")
    )
    merged = islands.groupBy("o_custkey", "island_id").agg(
        F.min("s").alias("island_start"),
        F.max("e").alias("island_end"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return merged.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("n_orders").alias("max_orders_in_island"),
        F.sum(
            F.datediff(F.col("island_end"), F.col("island_start")).cast("long")
        ).alias("covered_days"),
    )


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH tagged AS (
        SELECT user_id, ts, event_id, event_type,
               max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_click_us
        FROM events
    ),
    purchases AS (
        SELECT CAST(ts AS DATE) AS day,
               CASE WHEN last_click_us IS NOT NULL
                         AND epoch_us(ts) - last_click_us
                             <= 604800000000
                    THEN epoch_us(ts) - last_click_us END AS gap_us
        FROM tagged
        WHERE event_type = 'purchase'
    )
    SELECT day,
           count(*) AS n_purchases,
           CAST(count(gap_us) AS BIGINT) AS n_attributed,
           CAST(coalesce(CAST(sum(gap_us) AS BIGINT), 0) AS BIGINT)
               AS total_gap_us
    FROM purchases
    GROUP BY day
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution with a 7-day lookback window.

    Each purchase is attributed to the user's most recent PRIOR click
    within 7 days. The single-pass shape: a conditional running max of
    click timestamps over the (user, time) window — the same
    union-and-carry-forward trick as the as-of join
    (relational.py:422), here with a CASE instead of a union — then a
    per-day aggregate of the attribution gaps. One exchange on
    user_id, exact epoch-microsecond arithmetic throughout (monotone
    epoch micros make max() the correct "latest"; the 1-PRECEDING
    frame excludes a same-row self-match by construction).

    A purchase with no prior click, or one outside the lookback, counts
    in n_purchases but not n_attributed — the unattributed remainder
    is the metric marketing actually argues about.
    """
    e = load_table(spark, sf_dir, "events")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.max(
            F.when(
                F.col("event_type") == "click",
                F.unix_micros(F.col("ts").cast("timestamp")),
            )
        )
        .over(w_prev)
        .alias("last_click_us"),
    )
    purchases = tagged.filter(F.col("event_type") == "purchase").select(
        F.to_date("ts").alias("day"),
        F.when(
            F.col("last_click_us").isNotNull()
            & (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.col("last_click_us")
                <= 7 * 86400 * 1000000
            ),
            F.unix_micros(F.col("ts").cast("timestamp")) - F.col("last_click_us"),
        ).alias("gap_us"),
    )
    return purchases.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("gap_us").alias("n_attributed"),
        F.coalesce(F.sum("gap_us"), F.lit(0)).cast("long").alias("total_gap_us"),
    )


@query(
    "events_cep_click_purchase",
    oracle="""
    WITH tagged AS (
        SELECT user_id, ts, event_id, event_type,
               max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
                   OVER w AS last_click_us,
               max(CASE WHEN event_type = 'error' THEN epoch_us(ts) END)
                   OVER w AS last_error_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CAST(ts AS DATE) AS day,
           count(*) AS n_purchases,
           CAST(count(CASE WHEN last_click_us IS NOT NULL
                      AND epoch_us(ts) - last_click_us <= 3600000000
                      AND (last_error_us IS NULL
                           OR last_error_us < last_click_us)
                      THEN 1 END) AS BIGINT) AS n_clean_conversions
    FROM tagged
    WHERE event_type = 'purchase'
    GROUP BY CAST(ts AS DATE)
    """,
)
def events_cep_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP-style sequence pattern: click → purchase within 1 hour with NO
    intervening error — the MATCH_RECOGNIZE shape (A then B within T,
    no C between) that Spark lacks as a construct.

    The single-pass re-expression: carry conditional running maxima of
    the last click and last error epochs over the (user, time) window;
    a purchase is a clean conversion iff the click is within the hour
    AND the last error (if any) predates that click — "no C between A
    and B" reduces to comparing two running maxima, no self-join, no
    per-row pattern automaton. One exchange on user_id; both maxima
    share one Window node (same spec). Exact epoch-micros arithmetic;
    the 1h literal is written as 3600000000 (DuckDB evaluates int
    literal products in INT32).
    """
    e = load_table(spark, sf_dir, "events")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    tagged = e.select(
        "ts",
        "event_type",
        F.max(F.when(F.col("event_type") == "click", us(F.col("ts"))))
        .over(w_prev)
        .alias("last_click_us"),
        F.max(F.when(F.col("event_type") == "error", us(F.col("ts"))))
        .over(w_prev)
        .alias("last_error_us"),
    )
    purchases = tagged.filter(F.col("event_type") == "purchase")
    clean = (
        F.col("last_click_us").isNotNull()
        & (us(F.col("ts")) - F.col("last_click_us") <= 3600000000)
        & (
            F.col("last_error_us").isNull()
            | (F.col("last_error_us") < F.col("last_click_us"))
        )
    )
    return purchases.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count(F.when(clean, 1)).alias("n_clean_conversions"),
    )


@query(
    "orders_backlog_sweep",
    oracle="""
    WITH deltas AS (
        SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta FROM orders
        UNION ALL
        SELECT CAST(o_orderdate AS DATE) + 30 AS day, -1 FROM orders
    ),
    daily AS (
        SELECT day, CAST(sum(delta) AS BIGINT) AS net_change
        FROM deltas GROUP BY day
    )
    SELECT day, net_change,
           CAST(sum(net_change) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS open_orders
    FROM daily
    """,
)
def orders_backlog_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-interval counting via the SWEEP-LINE identity: each
    order opens an interval [orderdate, orderdate+30d); the number open
    on any day is the running sum of +1/−1 boundary deltas — the
    room-occupancy / connection-count / backlog primitive.

    The naive form joins every day against every overlapping interval
    (O(days · open)); the sweep needs ONE union, ONE combinable
    aggregate to daily deltas (|days| rows — tiny), and ONE ordered
    prefix sum over that day table. The global window runs on the
    per-day aggregate, never the fact table — the same
    "reduce first, window the reduction" shape as the concentration
    and ABC queries.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d")
    )
    deltas = o.select(F.col("d").alias("day"), F.lit(1).alias("delta")).unionByName(
        o.select(F.date_add("d", 30).alias("day"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").alias("net_change"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day", "net_change", F.sum("net_change").over(w).alias("open_orders")
    )


@query(
    "events_autocorr_lag1",
    # Lag-1 autocorrelation from EXACT integer moments — the stationarity
    # probe of a metric stream. Same determinism discipline as
    # stat_corr_moments (relational4.py:230): cents via floor (tie-free
    # cross-engine), five exact moments over the (x, lead(x)) pairs, ONE
    # identically-shaped float expression at the end (IEEE divide/sqrt are
    # correctly rounded, so identical BIGINT inputs give identical bits).
    oracle="""
    WITH v AS (
        SELECT event_type,
               CAST(floor(value * 100) AS BIGINT) AS x,
               lead(CAST(floor(value * 100) AS BIGINT)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               ) AS y
        FROM events
    ),
    m AS (
        -- moments stay HUGEINT (DuckDB's native sum widening): the final
        -- products n*sxy / sx*sy exceed BIGINT from sf1 (n ~2e6/type,
        -- sxy ~5e13) — the stat_corr_moments discipline, 128-bit exact
        -- until the single cast to double
        SELECT event_type, count(*) AS n_pairs,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sx2, sum(y * y) AS sy2
        FROM v WHERE y IS NOT NULL
        GROUP BY event_type
    )
    SELECT event_type, n_pairs,
           CAST(sxy AS VARCHAR) AS sum_xy_cents2,
           CAST(n_pairs * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(n_pairs * sx2 - sx * sx AS DOUBLE)
                      * CAST(n_pairs * sy2 - sy * sy AS DOUBLE)) AS autocorr
    FROM m
    """,
)
def events_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type lag-1 autocorrelation of the value stream: is the next
    observation predictable from the last (drift / momentum) or white
    noise? x = value cents, y = next value in (ts, event_id) order.

    Scale shape: one exchange on event_type for the lead() window, then a
    5-number moment aggregate (map-side combinable); the per-row products
    stay in BIGINT (cents ~1e4, squared 1e8, × row count well under 2^63
    at sf ≤ 100)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("x"),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pairs = e.withColumn("y", F.lead("x").over(w)).filter(F.col("y").isNotNull())
    # DECIMAL(38,0) sums: the final n*sxy / sx*sy products exceed BIGINT
    # from sf1 — 128-bit exact both engines, one cast to double at the end
    # (the stat_corr_moments discipline, relational4.py:230)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sx2"),
        F.sum(dec(F.col("y") * F.col("y"))).alias("sy2"),
    )
    return m.select(
        "event_type",
        "n_pairs",
        F.col("sxy").cast("decimal(38,0)").cast("string").alias("sum_xy_cents2"),
        (
            (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / F.sqrt(
                (
                    F.col("n_pairs") * F.col("sx2") - F.col("sx") * F.col("sx")
                ).cast("double")
                * (
                    F.col("n_pairs") * F.col("sy2") - F.col("sy") * F.col("sy")
                ).cast("double")
            )
        ).alias("autocorr"),
    )


@query(
    "events_seasonal_decompose",
    # Classical decomposition, cross-engine EXACT: trend = centered 7-row
    # moving average over the per-day cent series — kept as the INTEGER
    # window sum (trend×7), so detrended×7 = 7·value − window_sum needs no
    # division; the day-of-week seasonal component is then the mean of the
    # detrended values per dow, emitted as a truncating integer division
    # (sign-safe: both engines truncate). Day-of-week by the arithmetic
    # (epoch_days+4)%7 rule — dayofweek() builtins disagree across engines.
    # Full windows only (count = 7): partial edge windows would make the
    # "centered MA" a different estimator at the series boundaries.
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    win AS (
        SELECT event_type, day, cents,
               CAST(sum(cents) OVER w AS BIGINT) AS win_sum,
               count(*) OVER w AS win_n
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    detr AS (
        SELECT event_type,
               CAST((epoch(day) // 86400 + 4) % 7 AS INT) AS dow,
               7 * cents - win_sum AS detr7
        FROM win WHERE win_n = 7
    )
    SELECT event_type, dow,
           count(*) AS n_windows,
           CAST(sum(detr7) AS BIGINT) AS sum_detr7,
           CAST(sum(detr7) AS BIGINT) // count(*) AS seasonal_c7
    FROM detr GROUP BY event_type, dow
    """,
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend/seasonal split of the per-type daily revenue series: centered
    7-day moving-average trend, day-of-week seasonal means of the
    detrended series — the classical-decomposition shape, in exact
    integers end to end (seasonal_c7 is the dow seasonal component ×7 in
    cents).

    Scale shape: one exchange on event_type for the daily rollup, the
    centered window rides the same partitioning (count + sum share ONE
    WindowSpec → one Window node), and the dow aggregate is map-side
    combinable. At 100 TB the daily table is tiny (types × days) — the
    expensive step is the first rollup, which is the same partial+final
    hash agg every fact rollup uses."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    daily = e.groupBy("event_type", "day").agg(F.sum("v_cents").alias("cents"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    win = daily.select(
        "event_type",
        "day",
        "cents",
        F.sum("cents").over(w).alias("win_sum"),
        F.count(F.lit(1)).over(w).alias("win_n"),
    )
    detr = win.filter(F.col("win_n") == 7).select(
        "event_type",
        ((F.unix_date(F.col("day")) + 4) % 7).cast("int").alias("dow"),
        (F.lit(7) * F.col("cents") - F.col("win_sum")).alias("detr7"),
    )
    return detr.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("detr7").alias("sum_detr7"),
        F.expr("sum(detr7) div count(1)").alias("seasonal_c7"),
    )


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (rounds toward zero, like Spark's `div`
    and DuckDB's `//` — the cross-engine rule pinned by nation_revenue_yoy).
    Python's // floors, so negatives need the sign fix-up."""
    return -((-a) // b) if a < 0 else a // b


@query(
    "orders_holt_linear",
    # Holt's linear (double exponential) smoothing of daily revenue with
    # dyadic parameters alpha = beta = 1/4, kept in exact integers:
    #   l_t = (y_t + 3*(l_{t-1} + b_{t-1})) div 4
    #   b_t = ((l_t - l_{t-1}) + 3*b_{t-1}) div 4
    # Every step is a pure integer function of the previous state, so the
    # DuckDB oracle replays the identical recursion as a recursive CTE over
    # the day index (calendar-bounded) and hash-matches the Spark run.
    # div is TRUNCATING in both engines (b_t can be negative), matched by
    # _tdiv in the executor loop.
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS day_num,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_orderdate
    ),
    idx AS (
        SELECT day_num, cents,
               row_number() OVER (ORDER BY day_num) AS i
        FROM daily
    ),
    hw(i, l, b, fitted) AS (
        SELECT 1, cents, CAST(0 AS BIGINT), cents FROM idx WHERE i = 1
        UNION ALL
        SELECT x.i,
               (x.cents + 3 * (h.l + h.b)) // 4,
               (((x.cents + 3 * (h.l + h.b)) // 4) - h.l + 3 * h.b) // 4,
               h.l + h.b
        FROM hw h JOIN idx x ON x.i = h.i + 1
    )
    SELECT d.day_num, d.cents,
           h.l AS level_cents, h.b AS trend_cents,
           h.fitted AS fitted_cents,
           d.cents - h.fitted AS resid_cents
    FROM hw h JOIN idx d USING (i)
    """,
)
def orders_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing over the daily-revenue
    series — the classic short-horizon forecaster (level + trend state,
    one-step-ahead fitted values and residuals), with dyadic smoothing
    weights so the whole recursion stays in exact integers and both
    engines replay it bit-identically.

    Scale shape: the daily rollup is the only data-sized aggregate. The
    recursion itself is inherently sequential, so it runs as ONE
    applyInPandas task over the calendar-bounded day table (~thousands of
    rows at any corpus scale — the same metadata-scale-state class as
    k-means codebooks); at 100 TB you run one such task per series, keyed
    by the series id, all in parallel."""
    import pandas as pd

    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.unix_date(F.col("o_orderdate").cast("date"))
            .cast("long")
            .alias("day_num"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("day_num")
        .agg(F.sum("c").alias("cents"))
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day_num").reset_index(drop=True)
        ys = pdf["cents"].tolist()
        levels, trends, fitteds = [], [], []
        l = b = 0
        for t, y in enumerate(ys):
            if t == 0:
                l, b, fitted = int(y), 0, int(y)
            else:
                fitted = l + b
                l_new = _tdiv(int(y) + 3 * (l + b), 4)
                b = _tdiv((l_new - l) + 3 * b, 4)
                l = l_new
            levels.append(l)
            trends.append(b)
            fitteds.append(fitted)
        return pd.DataFrame(
            {
                "day_num": pdf["day_num"],
                "cents": pdf["cents"],
                "level_cents": levels,
                "trend_cents": trends,
                "fitted_cents": fitteds,
                "resid_cents": pdf["cents"] - pd.Series(fitteds),
            }
        )

    return (
        daily.groupBy(F.lit(0).alias("__series"))
        .applyInPandas(
            lambda _, pdf: fit(pdf),
            "day_num long, cents long, level_cents long, trend_cents long, "
            "fitted_cents long, resid_cents long",
        )
    )


@query(
    "events_attribution_position",
    # Position-based (U-shaped) multi-touch attribution with EXACT integer
    # credit: per purchase, the clicks by the same user in the 7-day
    # lookback share 1,000,000 ppm of credit — 40/20/40 (first/middles/
    # last), degenerating to 100 for a single click and 50/50 for two; the
    # middle share divides by floor with the REMAINDER assigned to the
    # last middle (rank k-1) so every conversion's credit sums to exactly
    # 1e6 and both engines place every ppm identically.
    oracle="""
    WITH clicks AS (
        SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
        FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, event_id AS conv_id, epoch_us(ts) AS p_us
        FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
        SELECT p.conv_id, c.click_id, c.user_id,
               row_number() OVER (PARTITION BY p.conv_id
                                  ORDER BY c.c_us, c.click_id) AS i,
               count(*) OVER (PARTITION BY p.conv_id) AS k
        FROM purchases p JOIN clicks c
          ON c.user_id = p.user_id
         AND c.c_us < p.p_us AND p.p_us - c.c_us <= 604800000000
    ),
    credited AS (
        SELECT click_id, user_id, conv_id,
               CASE WHEN k = 1 THEN 1000000
                    WHEN k = 2 THEN 500000
                    WHEN i = 1 OR i = k THEN 400000
                    ELSE 200000 // (k - 2)
                         + CASE WHEN i = k - 1 THEN 200000 % (k - 2)
                                ELSE 0 END
               END AS credit_ppm
        FROM pairs
    )
    SELECT click_id, user_id,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions,
           CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm_total
    FROM credited GROUP BY click_id, user_id
    """,
)
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every purchase
    distributes exactly 1,000,000 ppm of credit over the user's clicks in
    the 7-day lookback — 40% first touch, 40% last touch, 20% split over
    the middles (floor division, remainder pinned to the last middle so
    the books balance to the ppm). Complements last-touch attribution
    with the model marketing actually reconciles budgets against.

    Scale shape: the click-purchase pairing is an equi-join on user_id
    with the time window as a join-side predicate — per-user bounded, the
    same shape as the CEP and funnel operators; ranking is one window
    over the conversion partition and credit is pure integer arithmetic.
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("c_us"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("conv_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("p_us"),
    )
    pairs = (
        purchases.join(clicks, purchases["p_user"] == clicks["user_id"])
        .filter(
            (F.col("c_us") < F.col("p_us"))
            & (F.col("p_us") - F.col("c_us") <= 604800000000)
        )
        .select("conv_id", "click_id", "user_id", "c_us")
    )
    w = Window.partitionBy("conv_id").orderBy("c_us", "click_id")
    wk = Window.partitionBy("conv_id")
    credited = pairs.select(
        "click_id",
        "user_id",
        "conv_id",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wk).alias("k"),
    ).select(
        "click_id",
        "user_id",
        "conv_id",
        F.when(F.col("k") == 1, 1000000)
        .when(F.col("k") == 2, 500000)
        .when((F.col("i") == 1) | (F.col("i") == F.col("k")), 400000)
        .otherwise(
            F.expr(
                "200000 div (k - 2) + CASE WHEN i = k - 1 "
                "THEN 200000 % (k - 2) ELSE 0 END"
            )
        )
        .alias("credit_ppm"),
    )
    return credited.groupBy("click_id", "user_id").agg(
        F.countDistinct("conv_id").cast("long").alias("n_conversions"),
        F.sum("credit_ppm").cast("long").alias("credit_ppm_total"),
    )


@query(
    "orders_lttb_downsample",
    # Largest-Triangle-Three-Buckets (Steinarsson 2013 — the published
    # dashboard downsampler): keep first + last, split interior points
    # into 60 index buckets, and per bucket keep the point maximizing the
    # triangle area with the PREVIOUSLY KEPT point and the NEXT bucket's
    # centroid. The centroid's sum/count division is cleared by
    # multiplying the area through by cnt_next, so the comparison is the
    # exact integer |(x_p*c - sx)*(y_cand - y_p) - (x_p - x_cand)*(sy -
    # y_p*c)| (HUGEINT oracle-side, python int kernel-side); ties break
    # to the earliest day. The sequential prev-point dependency makes
    # this the recursive-CTE + NOT-EXISTS-argmax shape, one row per step.
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS day_num,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    n_t AS (SELECT count(*) AS n FROM daily),
    firstp AS (SELECT day_num, cents FROM daily ORDER BY day_num LIMIT 1),
    lastp AS (SELECT day_num, cents FROM daily ORDER BY day_num DESC LIMIT 1),
    interior AS (
        SELECT day_num, cents,
               row_number() OVER (ORDER BY day_num) - 1 AS idx
        FROM daily
        WHERE day_num > (SELECT day_num FROM firstp)
          AND day_num < (SELECT day_num FROM lastp)
    ),
    cand AS (
        SELECT day_num, cents,
               (idx * 60) // (SELECT count(*) FROM interior) AS bucket
        FROM interior
    ),
    bstats AS (
        SELECT bucket, count(*) AS cnt, sum(day_num) AS sx, sum(cents) AS sy
        FROM cand GROUP BY bucket
    ),
    nstats AS (
        SELECT b.bucket,
               CASE WHEN b.bucket < 59 THEN nb.cnt ELSE 1 END AS cnt,
               CASE WHEN b.bucket < 59 THEN nb.sx
                    ELSE (SELECT day_num FROM lastp) END AS sx,
               CASE WHEN b.bucket < 59 THEN nb.sy
                    ELSE (SELECT cents FROM lastp) END AS sy
        FROM bstats b LEFT JOIN bstats nb ON nb.bucket = b.bucket + 1
    ),
    sel AS (
        SELECT CAST(0 AS BIGINT) AS i, day_num, cents FROM firstp
        UNION ALL
        SELECT s.i + 1, c.day_num, c.cents
        FROM sel s
        JOIN cand c ON c.bucket = s.i
        JOIN nstats ns ON ns.bucket = s.i
        WHERE s.i < 60
          AND NOT EXISTS (
            SELECT 1 FROM cand c2
            WHERE c2.bucket = s.i AND (
              abs((s.day_num::HUGEINT * ns.cnt - ns.sx)
                      * (c2.cents - s.cents)
                  - (s.day_num - c2.day_num)::HUGEINT
                      * (ns.sy - s.cents::HUGEINT * ns.cnt))
              > abs((s.day_num::HUGEINT * ns.cnt - ns.sx)
                        * (c.cents - s.cents)
                    - (s.day_num - c.day_num)::HUGEINT
                        * (ns.sy - s.cents::HUGEINT * ns.cnt))
              OR (abs((s.day_num::HUGEINT * ns.cnt - ns.sx)
                          * (c2.cents - s.cents)
                      - (s.day_num - c2.day_num)::HUGEINT
                          * (ns.sy - s.cents::HUGEINT * ns.cnt))
                  = abs((s.day_num::HUGEINT * ns.cnt - ns.sx)
                            * (c.cents - s.cents)
                        - (s.day_num - c.day_num)::HUGEINT
                            * (ns.sy - s.cents::HUGEINT * ns.cnt))
                  AND c2.day_num < c.day_num)
            )
          )
    )
    SELECT i AS step, day_num, cents FROM sel
    WHERE (SELECT n FROM n_t) > 62
    UNION ALL
    SELECT CAST(61 AS BIGINT) AS step, day_num, cents FROM lastp
    WHERE (SELECT n FROM n_t) > 62
    UNION ALL
    SELECT row_number() OVER (ORDER BY day_num) - 1 AS step, day_num, cents
    FROM daily WHERE (SELECT n FROM n_t) <= 62
    """,
)
def orders_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB downsampling of the daily-revenue series to 62 points — the
    monitoring/dashboard reducer that preserves visual shape (spikes and
    inflections survive; uniform striding would erase them). Exact
    integers end to end: the next-bucket centroid division is cleared by
    cross-multiplying the triangle area with the bucket count, ties break
    to the earliest day.

    Scale shape: the daily rollup is the only data-sized aggregate; the
    prev-point recursion runs as ONE applyInPandas task over the
    calendar-bounded day table (the orders_holt_linear discipline — at
    100 TB one such task per series id, all parallel). The oracle replays
    the same selection as a recursive CTE whose argmax is a NOT EXISTS
    anti-condition, one selected row per step."""
    import pandas as pd

    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.unix_date(F.col("o_orderdate").cast("date"))
            .cast("long")
            .alias("day_num"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("day_num")
        .agg(F.sum("c").alias("cents"))
    )

    def lttb(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day_num").reset_index(drop=True)
        pts = [(int(d), int(c)) for d, c in zip(pdf.day_num, pdf.cents)]
        n = len(pts)
        if n <= 62:
            return pd.DataFrame(
                {
                    "step": range(n),
                    "day_num": [p[0] for p in pts],
                    "cents": [p[1] for p in pts],
                }
            )
        first, last = pts[0], pts[-1]
        interior = pts[1:-1]
        n_int = len(interior)
        buckets: list[list[tuple[int, int]]] = [[] for _ in range(60)]
        for idx, p in enumerate(interior):
            buckets[idx * 60 // n_int].append(p)
        out = [first]
        prev = first
        for b in range(60):
            if b < 59:
                nxt = buckets[b + 1]
                cnt, sx, sy = (
                    len(nxt),
                    sum(p[0] for p in nxt),
                    sum(p[1] for p in nxt),
                )
            else:
                cnt, sx, sy = 1, last[0], last[1]
            xp, yp = prev

            def area2c(p: tuple[int, int]) -> int:
                return abs(
                    (xp * cnt - sx) * (p[1] - yp)
                    - (xp - p[0]) * (sy - yp * cnt)
                )

            best = max(buckets[b], key=lambda p: (area2c(p), -p[0]))
            out.append(best)
            prev = best
        out.append(last)
        return pd.DataFrame(
            {
                "step": range(len(out)),
                "day_num": [p[0] for p in out],
                "cents": [p[1] for p in out],
            }
        )

    return (
        daily.groupBy(F.lit(0).alias("__series"))
        .applyInPandas(
            lambda _k, pdf: lttb(pdf),
            schema="step long, day_num long, cents long",
        )
        .select("step", "day_num", "cents")
    )


_HAAR_LEVELS = 6  # 2^6 = 64-day analysis window


@query(
    "events_haar_wavelet",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
               CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    d0 AS (SELECT min(day) AS d0 FROM daily),
    rel AS (
        SELECT day - d0 AS r, v FROM daily, d0 WHERE day - d0 < 64
    ),
    lv AS (SELECT unnest(range(1, {_HAAR_LEVELS + 1})) AS level),
    coeffs AS (
        SELECT lv.level,
               rel.r // (1 << lv.level) AS idx,
               CAST(sum(CASE WHEN rel.r % (1 << lv.level)
                                  < (1 << (lv.level - 1))
                             THEN rel.v ELSE -rel.v END) AS BIGINT) AS coeff
        FROM rel CROSS JOIN lv
        GROUP BY lv.level, rel.r // (1 << lv.level)
    ),
    approx AS (
        SELECT CAST({_HAAR_LEVELS + 1} AS BIGINT) AS level,
               CAST(0 AS BIGINT) AS idx,
               CAST(sum(v) AS BIGINT) AS coeff
        FROM rel
    )
    SELECT CAST(level AS BIGINT) AS level, CAST(idx AS BIGINT) AS idx, coeff
    FROM coeffs
    UNION ALL
    SELECT level, idx, coeff FROM approx
    """,
)
def events_haar_wavelet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar wavelet decomposition of the daily revenue
    series (64-day dyadic window) — multi-resolution analysis beside the
    seasonality grid: level-k detail coefficients localize WHERE in time
    the variance lives (day-scale noise vs month-scale drift), and the
    full transform is losslessly invertible.

    The recursion a_k = pairwise-sum(a_{k-1}) never materializes: a
    level-k detail coefficient is sum(v * ±1) over one dyadic block
    (+ on the first half, − on the second), so the whole 6-level
    transform is ONE explode (6 rows per day) + ONE combinable integer
    aggregate — no sequential dependency, unlike the KM fold. The
    normalization 1/sqrt(2^k) is deliberately omitted (unnormalized
    integer Haar is exactly invertible; scaling is display-time).

    Shape at 100 TB: facts reduce once per day; the transform runs on
    the calendar-bounded daily table (64 rows here); levels explode
    metadata, not facts. For per-key wavelets (a million series), the
    same expression adds the key to the GROUP BY — still one pass.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)"
        ).alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v")
    )
    d0 = daily.agg(F.min("day").alias("d0"))
    rel = (
        daily.crossJoin(F.broadcast(d0))
        .select((F.col("day") - F.col("d0")).alias("r"), "v")
        .filter(F.col("r") < 64)
        .localCheckpoint(eager=True)  # detail levels + approx row share it
    )
    lv = rel.withColumn(
        "level", F.explode(F.sequence(F.lit(1), F.lit(_HAAR_LEVELS)))
    )
    coeffs = (
        lv.select(
            "level",
            F.expr("r DIV shiftleft(1, level)").alias("idx"),
            F.when(
                F.expr("r % shiftleft(1, level) < shiftleft(1, level - 1)"),
                F.col("v"),
            )
            .otherwise(-F.col("v"))
            .alias("sv"),
        )
        .groupBy("level", "idx")
        .agg(F.sum("sv").cast("long").alias("coeff"))
    )
    approx = rel.agg(
        F.lit(_HAAR_LEVELS + 1).cast("long").alias("level"),
        F.lit(0).cast("long").alias("idx"),
        F.sum("v").cast("long").alias("coeff"),
    )
    return coeffs.selectExpr(
        "CAST(level AS BIGINT) AS level", "CAST(idx AS BIGINT) AS idx", "coeff"
    ).unionAll(approx)


@query(
    "forecast_backtest_rolling",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
               CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    d0 AS (SELECT min(day) AS d0, max(day) AS dmax FROM daily),
    rel AS (SELECT day - d0 AS r, v FROM daily, d0),
    folds AS (SELECT unnest(range(0, 4)) AS fold),
    -- fold f tests the 3 days starting at origin_f = 16 + 3*f (the
    -- fixture spans 30 days); the "models" need only lagged values, so
    -- training is implicit.
    test AS (
        SELECT f.fold, t.r, t.v,
               coalesce(n1.v, 0) AS pred_naive,
               coalesce(s7.v, 0) AS pred_seasonal
        FROM folds f
        JOIN rel t ON t.r >= 16 + 3 * f.fold AND t.r < 19 + 3 * f.fold
        LEFT JOIN rel n1 ON n1.r = 16 + 3 * f.fold - 1
        LEFT JOIN rel s7 ON s7.r = t.r - 7
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(abs(v - pred_naive)) AS BIGINT) AS mae_naive_milli,
           CAST(sum(abs(v - pred_seasonal)) AS BIGINT)
               AS mae_seasonal_milli,
           CAST(CASE WHEN sum(abs(v - pred_seasonal))
                          <= sum(abs(v - pred_naive))
                     THEN 1 ELSE 0 END AS BIGINT) AS seasonal_wins
    FROM test GROUP BY fold
    """,
)
def forecast_backtest_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtesting — the evaluation harness every
    forecasting deployment needs (train on days < T, score the next
    window, slide T): four 3-day folds over the 30-day fixture span
    compare the seasonal-naive model
    (predict from 7 days earlier) against the last-known-value naive,
    with exact integer milli-unit absolute errors per fold.

    Both 'models' are lag lookups, so the backtest is pure joins — the
    point of the operator is the FOLD HARNESS (leakage-free by
    construction: every prediction reads only days strictly before the
    fold's origin or the aligned seasonal lag inside the test week,
    never the target day) and the deterministic model-comparison
    verdict, not the model.

    Shape at 100 TB: facts reduce once to the daily table; folds explode
    calendar-bounded metadata. Swapping in a real model changes the
    prediction join, not the harness.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)"
        ).alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v")
    )
    d0 = daily.agg(F.min("day").alias("d0"))
    rel = (
        daily.crossJoin(F.broadcast(d0))
        .select((F.col("day") - F.col("d0")).alias("r"), "v")
        .localCheckpoint(eager=True)  # test rows + both lag joins share it
    )
    folds = spark.range(4).select(F.col("id").cast("long").alias("fold"))
    test = (
        folds.crossJoin(rel.select(F.col("r"), F.col("v")))
        .filter(
            (F.col("r") >= 16 + 3 * F.col("fold"))
            & (F.col("r") < 19 + 3 * F.col("fold"))
        )
    )
    n1 = rel.select(F.col("r").alias("r_n1"), F.col("v").alias("pv_n1"))
    s7 = rel.select(F.col("r").alias("r_s7"), F.col("v").alias("pv_s7"))
    joined = (
        test.join(
            F.broadcast(n1),
            F.col("r_n1") == 16 + 3 * F.col("fold") - 1,
            "left",
        )
        .join(F.broadcast(s7), F.col("r_s7") == F.col("r") - 7, "left")
        .select(
            "fold",
            "v",
            F.coalesce(F.col("pv_n1"), F.lit(0)).alias("pred_naive"),
            F.coalesce(F.col("pv_s7"), F.lit(0)).alias("pred_seasonal"),
        )
    )
    return joined.groupBy("fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.abs(F.col("v") - F.col("pred_naive")))
        .cast("long")
        .alias("mae_naive_milli"),
        F.sum(F.abs(F.col("v") - F.col("pred_seasonal")))
        .cast("long")
        .alias("mae_seasonal_milli"),
        F.when(
            F.sum(F.abs(F.col("v") - F.col("pred_seasonal")))
            <= F.sum(F.abs(F.col("v") - F.col("pred_naive"))),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("seasonal_wins"),
    )


@query(
    "forecast_conformal_coverage",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
               CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    d0 AS (SELECT min(day) AS d0 FROM daily),
    rel AS (SELECT day - d0 AS r, v FROM daily, d0),
    resid AS (
        SELECT t.r, abs(t.v - l.v) AS e,
               CASE WHEN t.r < 22 THEN 'cal' ELSE 'test' END AS split
        FROM rel t JOIN rel l ON l.r = t.r - 7
        WHERE t.r >= 7
    ),
    cal AS (
        SELECT e, count(*) AS c FROM resid WHERE split = 'cal' GROUP BY e
    ),
    q AS (
        SELECT min(e) AS q90
        FROM (
            SELECT e,
                   sum(c) OVER (ORDER BY e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                   sum(c) OVER () AS tot
            FROM cal
        )
        WHERE 10 * cum >= 9 * tot
    )
    SELECT CAST((SELECT sum(c) FROM cal) AS BIGINT) AS n_cal,
           q.q90 AS q90_milli,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN t.e <= q.q90 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered,
           CAST(sum(CASE WHEN t.e <= q.q90 THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS coverage_ppm
    FROM resid t, q WHERE t.split = 'test'
    GROUP BY q.q90
    """,
)
def forecast_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction-interval audit for the seasonal-naive
    forecaster: the 90th-percentile absolute residual on a calibration
    window becomes the interval half-width, and the held-out window
    reports empirical coverage — the distribution-free uncertainty
    wrapper (Vovk; Lei et al.) any point forecaster gets for free.

    The quantile is the EXACT upper empirical quantile (smallest
    residual with 10*cum >= 9*total over the per-distinct-residual
    count table — the clean_impute_median discipline, no interpolation
    semantics trusted), and coverage is integer ppm. Calibration/test
    split is temporal (days < 22 vs >= 22), never random — exchange-
    ability along time is exactly what the audit probes.

    Shape at 100 TB: residuals are one self-join of the daily table on
    the seasonal lag; the quantile reads the residual-domain count
    table; coverage is one combinable aggregate. Per-series conformal
    bands add the key to every GROUP BY — same two passes.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)"
        ).alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v")
    )
    d0 = daily.agg(F.min("day").alias("d0"))
    rel = (
        daily.crossJoin(F.broadcast(d0))
        .select((F.col("day") - F.col("d0")).alias("r"), "v")
        .localCheckpoint(eager=True)
    )
    lag = rel.select(F.col("r").alias("rl"), F.col("v").alias("vl"))
    resid = (
        rel.filter(F.col("r") >= 7)
        .join(F.broadcast(lag), F.col("rl") == F.col("r") - 7)
        .select(
            "r",
            F.abs(F.col("v") - F.col("vl")).alias("e"),
            F.when(F.col("r") < 22, "cal").otherwise("test").alias("split"),
        )
        .localCheckpoint(eager=True)  # quantile + coverage both read it
    )
    cal = (
        resid.filter(F.col("split") == "cal")
        .groupBy("e")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = Window.orderBy("e").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    q = (
        cal.withColumn("cum", F.sum("c").over(wcum))
        .withColumn("tot", F.sum("c").over(Window.partitionBy()))
        .filter(10 * F.col("cum") >= 9 * F.col("tot"))
        .agg(F.min("e").alias("q90_milli"))
    )
    n_cal = cal.agg(F.sum("c").cast("long").alias("n_cal"))
    test = resid.filter(F.col("split") == "test")
    return (
        test.crossJoin(F.broadcast(q))
        .crossJoin(F.broadcast(n_cal))
        .groupBy("n_cal", "q90_milli")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(F.when(F.col("e") <= F.col("q90_milli"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
        )
        .selectExpr(
            "n_cal",
            "q90_milli",
            "n_test",
            "n_covered",
            "n_covered * 1000000 DIV n_test AS coverage_ppm",
        )
    )


# Between-segment objective for a split after prefix index i (1 <= i < N):
# J(i) = S1^2/n1 + S2^2/n2 - S^2/N  (the variance-decomposition identity:
# maximizing J minimizes total within-segment SSE). One shared double
# expression over exact integer prefix sums; the argmax tie-breaks on day.
_CHG_J = (
    "CAST(s1 AS DOUBLE) * s1 / n1"
    " + (CAST(s AS DOUBLE) - s1) * (CAST(s AS DOUBLE) - s1) / (n - n1)"
    " - CAST(s AS DOUBLE) * s / n"
)


@query(
    "events_changepoint_argmax",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
               CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    pref AS (
        SELECT day, v,
               CAST(sum(v) OVER (ORDER BY day) AS BIGINT) AS s1,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS n1
        FROM daily
    ),
    tot AS (
        SELECT CAST(sum(v) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
        FROM daily
    ),
    scored AS (
        SELECT day, s1, n1, s, n, {_CHG_J} AS j
        FROM pref, tot WHERE n1 < n
    ),
    best AS (
        SELECT *, row_number() OVER (ORDER BY j DESC, day) AS rn FROM scored
    )
    SELECT day AS split_after_day, n1 AS n_left, n - n1 AS n_right,
           s1 AS sum_left_milli, s - s1 AS sum_right_milli,
           j AS j_stat
    FROM best WHERE rn = 1
    """,
)
def events_changepoint_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection on the daily purchase-revenue
    series: the split that maximizes the between-segment variance
    J(i) = S1²/n1 + S2²/n2 − S²/N (equivalently, minimizes total
    within-segment SSE — the binary-segmentation step every changepoint
    method iterates). The level-shift localizer that pairs with
    events_cusum_drift's drift detector: CUSUM says WHETHER the mean
    moved; this says WHERE the single best break is.

    Exactness: prefix sums and counts are exact integer milli; J is one
    shared double expression evaluated per candidate split (|days| − 1
    candidates), and the argmax tie-breaks on day, so both engines pick
    the identical split even under float-equal plateaus.

    Shape at 100 TB: facts reduce to the daily table (combinable), one
    prefix window over |days| rows (calendar-bounded metadata), one
    top-1. Recursing binary segmentation re-runs this on each side —
    O(log k) rounds for k changepoints, never re-scanning facts.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .selectExpr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)"
            " AS day",
            "CAST(floor(value * 1000) AS BIGINT) AS v_milli",
        )
        .groupBy("day")
        .agg(F.sum("v_milli").cast("long").alias("v"))
    )
    # r11 (guide §2.4): the totals used to be a SECOND derivation of
    # `daily` (scan + aggregate) cross-joined back in — the before-plan
    # carried two events scans. The full-frame window rides the same
    # single sort as the prefix window (both order by day over the
    # calendar-bounded daily table), so (s, n) cost no extra exchange,
    # scan, or join.
    w = Window.orderBy("day")
    wfull = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pref = daily.select(
        "day",
        F.sum("v").over(w).cast("long").alias("s1"),
        F.row_number().over(w).cast("long").alias("n1"),
        F.sum("v").over(wfull).cast("long").alias("s"),
        F.count(F.lit(1)).over(wfull).cast("long").alias("n"),
    )
    scored = pref.filter(F.col("n1") < F.col("n")).selectExpr(
        "day", "s1", "n1", "s", "n", f"{_CHG_J} AS j"
    )
    best = scored.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("j").desc(), "day"))
        .alias("rn"),
    ).filter(F.col("rn") == 1)
    return best.selectExpr(
        "day AS split_after_day",
        "n1 AS n_left",
        "n - n1 AS n_right",
        "s1 AS sum_left_milli",
        "s - s1 AS sum_right_milli",
        "j AS j_stat",
    )


_ACF_LAGS = 7
# Pearson r over the lag-k pair set, one shared double expression over the
# six exact DECIMAL(38,0) moments (daily-cents squares pass BIGINT range
# around x100 of sf0.1 — same widening as drift_wasserstein_exact).
# nullif(..., 0) on the denominator (ADVICE r7 item 4): a lag bucket with
# n=1 pairs or a constant series has zero variance, where Spark's non-ANSI
# Divide returns NULL but DuckDB returns Inf/NaN — both engines now yield
# NULL on the degenerate bucket. nullif parses identically in Spark SQL
# and DuckDB, so the shared expression stays shared.
_ACF_R = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0)"
)


@query(
    "events_acf_multi_lag",
    oracle=f"""
    WITH daily AS (
        SELECT epoch(CAST(o_orderdate AS DATE)) // 86400 AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS c
        FROM orders GROUP BY 1
    ),
    lags AS (SELECT unnest(range(1, {_ACF_LAGS + 1})) AS lag),
    pairs AS (
        SELECT l.lag, a.c AS x, b.c AS y
        FROM lags l
        JOIN daily a ON true
        JOIN daily b ON b.d = a.d + l.lag
    ),
    m AS (
        SELECT lag,
               CAST(count(*) AS BIGINT) AS n,
               sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
               sum(x::HUGEINT * x) AS sxx, sum(y::HUGEINT * y) AS syy,
               sum(x::HUGEINT * y) AS sxy
        FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, n, round({_ACF_R}, 6) AS acf
    FROM m
    """,
)
def events_acf_multi_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily revenue series at lags 1-7 —
    the diagnostic that picks the seasonal period / AR order before any
    forecasting model is chosen (events_autocorr_lag1 reads one point of
    this curve; the weekly bump at lag 7 is what seasonal-naive
    forecasting exploits). Pairs are formed per lag over days where BOTH
    endpoints exist (gap-robust — no imputation leaks into the
    statistic), so each lag's r is a plain Pearson correlation on the
    overlap set.

    Exactness: one combinable cents aggregate builds the calendar-sized
    daily table; per-lag moments are exact DECIMAL(38,0) sums (daily-cent
    products pass BIGINT near x100 scale); r is one shared double
    expression rounded to 1e-6.

    Scale shape: facts reduce to |days| rows once; the lag join is
    7 x |days| against a BROADCAST copy of the same table; moments are
    map-side combinable per lag. Event volume only touches the first
    aggregate.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.unix_date(F.col("o_orderdate").cast("date")).alias("d"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("c")
        )
    )
    lags = spark.range(1, _ACF_LAGS + 1).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("d").alias("da"), F.col("c").alias("x"))
    b = daily.select(F.col("d").alias("db"), F.col("c").alias("y"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(F.broadcast(b), F.col("db") == F.col("da") + F.col("lag"))
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
    )
    return m.select(
        F.col("lag").cast("int").alias("lag"),
        "n",
        F.round(F.expr(_ACF_R), 6).alias("acf"),
    )


# --- wave 41 (round 8) ---

_HURST_NS = (8, 16, 32, 64)
# Per-block rescaled range from exact integer moments: with block sums
# S1 = sum(x), S2 = sum(x^2), prefix sums P_k and positions k, the
# cumulative deviation Z_k = P_k - k*S1/n has exact numerator
# num_k = n*P_k - k*S1, and R/S = (max(num)-min(num)) / sqrt(n*S2 - S1^2)
# (the n's cancel: R = range(num)/n, S = sqrt((n*S2-S1^2)/n^2)). One
# sqrt + one division per BLOCK; everything feeding them is integer.
_HURST_RS = (
    "CAST(r_num AS DOUBLE) / nullif(sqrt(CAST(var_num AS DOUBLE)), 0)"
)


@query(
    "events_hurst_rs",
    oracle=f"""
    WITH daily AS (
        SELECT epoch(CAST(o_orderdate AS DATE)) // 86400 AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS x
        FROM orders GROUP BY 1
    ),
    seq AS (
        SELECT x, row_number() OVER (ORDER BY d) AS rn FROM daily
    ),
    ns AS (SELECT unnest([{", ".join(str(n) for n in _HURST_NS)}]) AS n),
    cells AS (
        SELECT ns.n, (s.rn - 1) // ns.n AS blk,
               ((s.rn - 1) % ns.n) + 1 AS k, s.x,
               sum(s.x) OVER (PARTITION BY ns.n, (s.rn - 1) // ns.n
                              ORDER BY s.rn
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS p_k
        FROM seq s CROSS JOIN ns
    ),
    blocks AS (
        SELECT n, blk,
               count(*) AS n_obs,
               max(n * p_k - k * sum_x1) - min(n * p_k - k * sum_x1)
                   AS r_num,
               n::HUGEINT * sum_x2 - sum_x1::HUGEINT * sum_x1 AS var_num
        FROM (
            SELECT c.*,
                   sum(x) OVER (PARTITION BY n, blk) AS sum_x1,
                   sum(x::HUGEINT * x) OVER (PARTITION BY n, blk) AS sum_x2
            FROM cells c
        )
        GROUP BY n, blk, sum_x1, sum_x2
        HAVING count(*) = n
    ),
    rs AS (
        SELECT n, CAST(round({_HURST_RS} * 1000000) AS BIGINT) AS rs_micro
        FROM blocks
    )
    SELECT CAST(n AS INT) AS block_n,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(rs_micro) AS BIGINT) AS rs_sum_micro,
           round(CAST(sum(rs_micro) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS rs_mean
    FROM rs GROUP BY n
    """,
)
def events_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range (R/S) table of the daily revenue series at block
    sizes 8-64 — the Hurst-exponent diagnostic (Hurst 1951; Mandelbrot &
    Wallis 1969): long-memory series show E[R/S] growing like n^H with
    H > 0.5, and the slope operators read off this table is what
    separates trending from mean-reverting demand before any forecaster
    is fitted (the ACF at lag 7 sees the weekly cycle; R/S sees the
    long-range dependence ACF truncates).

    Exactness: each block's R and S reduce to integer arithmetic — the
    cumulative-deviation numerators n*P_k - k*S1 are exact BIGINTs, the
    variance numerator n*S2 - S1^2 is exact DECIMAL(38,0)/HUGEINT — so
    the only float per block is one shared sqrt-division expression,
    immediately micro-quantized (round-half-up x 1e6, a positive-domain
    cast both engines share); the per-n mean is then integer-summed,
    making the output independent of block summation order.

    Scale shape: facts reduce once to the calendar-sized daily table;
    blocks are a window over (n, blk) partitions of that table — 4x
    |days| rows of metadata; nothing returns to the fact table.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.unix_date(F.col("o_orderdate").cast("date")).alias("d"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("x")
        )
    )
    seq = daily.select("x", F.row_number().over(Window.orderBy("d")).alias("rn"))
    ns = spark.createDataFrame(
        [(n,) for n in _HURST_NS], "n int"
    )
    cells = seq.crossJoin(F.broadcast(ns)).select(
        "n",
        ((F.col("rn") - 1) / F.col("n")).cast("long").alias("blk"),
        (F.pmod(F.col("rn") - 1, F.col("n")) + 1).alias("k"),
        "x",
        "rn",
    )
    w_blk = Window.partitionBy("n", "blk")
    w_pre = w_blk.orderBy("rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = F.col("x").cast("decimal(38,0)")
    enriched = cells.select(
        "n",
        "blk",
        "k",
        F.sum("x").over(w_pre).alias("p_k"),
        F.sum("x").over(w_blk).alias("sum_x1"),
        F.sum(dec * F.col("x")).over(w_blk).alias("sum_x2"),
    )
    num = F.col("n") * F.col("p_k") - F.col("k") * F.col("sum_x1")
    blocks = (
        enriched.groupBy("n", "blk", "sum_x1", "sum_x2")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            (F.max(num) - F.min(num)).alias("r_num"),
        )
        .filter(F.col("n_obs") == F.col("n"))
        .select(
            "n",
            "r_num",
            (
                F.col("n").cast("decimal(38,0)") * F.col("sum_x2")
                - F.col("sum_x1").cast("decimal(38,0)") * F.col("sum_x1")
            ).alias("var_num"),
        )
    )
    rs = blocks.select(
        "n",
        F.expr(f"CAST(round({_HURST_RS} * 1000000) AS BIGINT)").alias(
            "rs_micro"
        ),
    )
    return rs.groupBy("n").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("rs_micro").cast("long").alias("rs_sum_micro"),
        F.round(
            F.sum("rs_micro").cast("double")
            / F.count(F.lit(1)).cast("double")
            / 1000000.0,
            6,
        ).alias("rs_mean"),
    ).select(
        F.col("n").cast("int").alias("block_n"),
        "n_blocks",
        "rs_sum_micro",
        "rs_mean",
    )


# Mann-Kendall z with continuity correction: one shared double expression
# over exact integer S and 18*Var(S).
_MK_Z = (
    "CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)"
    " / nullif(sqrt(CAST(var18 AS DOUBLE) / 18.0), 0)"
    " WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)"
    " / nullif(sqrt(CAST(var18 AS DOUBLE) / 18.0), 0)"
    " ELSE CAST(0.0 AS DOUBLE) END"
)


@query(
    "trend_mann_kendall",
    oracle=f"""
    WITH daily AS (
        SELECT epoch(CAST(o_orderdate AS DATE)) // 86400 AS d,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS x
        FROM orders GROUP BY 1
    ),
    s AS (
        SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                             WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_stat
        FROM daily a JOIN daily b ON b.d > a.d
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
    ties AS (
        SELECT coalesce(CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
                   AS tie_term
        FROM (SELECT count(*) AS t FROM daily GROUP BY x HAVING count(*) > 1)
    ),
    m AS (
        SELECT s.s_stat, nn.n,
               nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term AS var18
        FROM s, nn, ties
    )
    SELECT n, s_stat, CAST(var18 AS BIGINT) AS var18,
           round({_MK_Z}, 6) AS z_mk
    FROM m
    """,
)
def trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test (Mann 1945; Kendall 1975) on the daily
    revenue series — the significance companion to trend_theil_sen's
    slope estimate: S = sum of sign(x_j − x_i) over ordered day pairs,
    Var(S) with the standard tie correction, z with continuity
    correction. The nonparametric pair: Theil-Sen says HOW STEEP, MK says
    WHETHER the monotone trend is distinguishable from noise — run before
    believing any drift dashboard.

    Exactness: S and 18·Var(S) are exact BIGINTs (the tie term sums
    t(t−1)(2t+5) over the value-tie groups); z is one shared
    sqrt-division with the sign-dependent ±1 continuity branch, rounded
    to 1e-6.

    Scale shape: facts reduce once to the calendar-bounded daily table;
    the pair join is |days|² over that REDUCTION (≤ 36,525² rows for a
    century of days — metadata next to the fact table), never over
    events. At larger day counts S also has an O(n log n) merge-sort
    inversion-count formulation; the pair join is chosen because the
    reduction is calendar-bounded by construction.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.unix_date(F.col("o_orderdate").cast("date")).alias("d"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("x")
        )
        .localCheckpoint(eager=True)  # pair join (a, b sides) + ties + n
    )
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    s = (
        a.join(b, F.col("db") > F.col("da"))
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nn = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    m = (
        s.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ties))
        .select(
            "s_stat",
            "n",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie_term")
            )
            .cast("long")
            .alias("var18"),
        )
    )
    return m.selectExpr(
        "n", "s_stat", "var18", f"round({_MK_Z}, 6) AS z_mk"
    )


# --- wave 47 (round 9) ---


@query(
    "trend_seasonal_mann_kendall",
    oracle=f"""
    WITH monthly AS (
        SELECT CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS season,
               CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS y,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS x
        FROM orders GROUP BY 1, 2
    ),
    per AS (
        SELECT a.season,
               CAST(sum(CASE WHEN b.x > a.x THEN 1
                             WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_m,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM monthly a JOIN monthly b
          ON b.season = a.season AND b.y > a.y
        GROUP BY a.season
    ),
    nm AS (
        SELECT season, CAST(count(*) AS BIGINT) AS n_m
        FROM monthly GROUP BY season
    ),
    tie_m AS (
        SELECT season,
               coalesce(CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
                   AS tie_term
        FROM (SELECT season, count(*) AS t FROM monthly
              GROUP BY season, x HAVING count(*) > 1)
        GROUP BY season
    ),
    tot AS (
        SELECT CAST(sum(p.s_m) AS BIGINT) AS s_stat,
               CAST(sum(nm.n_m * (nm.n_m - 1) * (2 * nm.n_m + 5)
                        - coalesce(t.tie_term, 0)) AS BIGINT) AS var18,
               CAST(count(*) AS BIGINT) AS n_seasons,
               CAST(sum(nm.n_m) AS BIGINT) AS n_points
        FROM per p JOIN nm ON nm.season = p.season
        LEFT JOIN tie_m t ON t.season = p.season
    )
    SELECT n_seasons, n_points, s_stat, var18,
           round({_MK_Z}, 6) AS z_smk
    FROM tot
    """,
)
def trend_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall (Hirsch & Slack 1984) on monthly revenue:
    the trend test that survives seasonality — S is computed WITHIN each
    calendar-month season across years (January-vs-January only), then
    summed; Var(S) is the per-season tie-corrected sum. A plain MK over
    a seasonal series reads the seasonal cycle as noise (or trend); the
    seasonal form compares like with like, which is why drift monitors
    over weekly/monthly-periodic metrics run exactly this.

    Exactness: per-season S_m and 18·Var_m are exact BIGINTs summed as
    integers; z is the same shared continuity-corrected expression
    trend_mann_kendall pins ({_MK_Z.count('CASE')} branch).

    Scale shape: facts reduce to the (season, year) table — calendar-
    bounded (12 x years rows) regardless of order volume; the within-
    season pair join is over that reduction only. Output is 1 row.
    """
    monthly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.month(F.col("o_orderdate").cast("date")).cast("int").alias("season"),
            F.year(F.col("o_orderdate").cast("date")).cast("int").alias("y"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("x")
        )
        .localCheckpoint(eager=True)  # pair join + ties + counts consume it
    )
    a = monthly.select(
        F.col("season").alias("sa"), F.col("y").alias("ya"), F.col("x").alias("xa")
    )
    b = monthly.select(
        F.col("season").alias("sb"), F.col("y").alias("yb"), F.col("x").alias("xb")
    )
    per = (
        a.join(b, (F.col("sb") == F.col("sa")) & (F.col("yb") > F.col("ya")))
        .groupBy(F.col("sa").alias("season"))
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_m")
        )
    )
    nm = monthly.groupBy("season").agg(F.count(F.lit(1)).cast("long").alias("n_m"))
    tie_m = (
        monthly.groupBy("season", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("season")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("long")
            .alias("tie_term")
        )
    )
    tot = (
        per.join(nm, "season")
        .join(tie_m, "season", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_seasons"),
            F.sum("n_m").cast("long").alias("n_points"),
            F.sum("s_m").cast("long").alias("s_stat"),
            F.sum(
                F.col("n_m") * (F.col("n_m") - 1) * (2 * F.col("n_m") + 5)
                - F.coalesce(F.col("tie_term"), F.lit(0))
            )
            .cast("long")
            .alias("var18"),
        )
    )
    return tot.selectExpr(
        "n_seasons", "n_points", "s_stat", "var18",
        f"round({_MK_Z}, 6) AS z_smk",
    )


# Exponentially-decayed daily engagement: score(d) = sum over lag l of
# w_l * V(d-l), horizon 14 days, lambda = 0.3/day. The weights are
# INTEGER-QUANTIZED IN PYTHON (w_l_micro = round(e^{-0.3 l} * 1e6)) and
# embedded as literals in BOTH engines' plans, so the decayed sum is an
# exact BIGINT — the float-sum trap (engine-ordered exp terms) never
# opens. The one float column derives from the integer by a shared
# division.
import math as _math

_DECAY_H = 14
_DECAY_W = tuple(round(_math.exp(-0.3 * l) * 1_000_000) for l in range(_DECAY_H))


@query(
    "window_exponential_decay_sum",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
                   AS v_milli
        FROM events GROUP BY 1
    ),
    w AS (
        SELECT unnest(range({_DECAY_H})) AS l,
               unnest([{", ".join(str(w) for w in _DECAY_W)}]) AS wm
    ),
    contrib AS (
        SELECT daily.d + CAST(w.l AS INT) AS target, daily.v_milli * w.wm AS c
        FROM daily, w
    )
    SELECT t.d, t.v_milli,
           CAST(sum(c.c) AS BIGINT) AS decay_scaled,
           round(CAST(sum(c.c) AS DOUBLE) / 1000000000.0, 6) AS decay_score
    FROM daily t JOIN contrib c ON c.target = t.d
    GROUP BY t.d, t.v_milli
    ORDER BY t.d
    """,
)
def window_exponential_decay_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed rolling engagement score per day
    (half-life ≈ {round(_math.log(2) / 0.3, 1)} days): the recency-weighted
    activity feature every engagement/churn model consumes, computed as
    score(d) = Σ_l w_l·V(d−l) over a {_DECAY_H}-day horizon. The naive
    form is a per-day window scan; the OFFSET-EXPLODE form used here
    (each day broadcasts its value forward to the {_DECAY_H} target days
    it influences — the events_rolling_active_users shape) turns it into
    one explode + one combinable integer aggregate with no window at all.

    Exactness: the decay weights are integer-quantized in Python and
    embedded as the SAME literals in both plans, so every contribution
    V_milli·w_micro and the per-day sum are exact BIGINTs; the float
    score is one shared division.

    Scale shape: facts reduce to the calendar-bounded daily table; the
    explode is {_DECAY_H}x that reduction. Bounded-horizon decay at
    100 TB costs one shuffle on the day key.
    """
    daily = load_table(spark, sf_dir, "events").groupBy(
        F.col("ts").cast("date").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("v_milli")
    ).localCheckpoint(eager=True)  # contribution explode + target join
    w = spark.createDataFrame(
        list(enumerate(_DECAY_W)), "l int, wm long"
    )
    contrib = daily.crossJoin(F.broadcast(w)).select(
        F.date_add(F.col("d"), F.col("l")).alias("target"),
        (F.col("v_milli") * F.col("wm")).alias("c"),
    )
    return (
        daily.join(contrib, daily.d == contrib.target)
        .groupBy("d", "v_milli")
        .agg(
            F.sum("c").cast("long").alias("decay_scaled"),
            F.round(F.sum("c").cast("double") / 1_000_000_000.0, 6).alias(
                "decay_score"
            ),
        )
        .orderBy("d")
    )


# --- wave 54 (round 10) ---

# PACF via Durbin-Levinson. The autocovariance RATIOS r_k = G_k/G_0 are
# ratios of exact DECIMAL(38,0) integers (G_k = n²·A_k − n·S1·(B_k+C_k)
# + (n−k)·S1², the n³-scaled biased autocovariance), so the float tail —
# the DL recursion itself — consumes identical doubles in both engines
# and uses only IEEE +,-,*,/ in textually identical expressions, staged
# one level at a time (chained selects / CTEs) so no expression swells
# exponentially.
_PACF_LAGS = 5

# (new_column, shared SQL expression) in Durbin-Levinson order; each level
# references only columns defined by earlier stages.
_PACF_STAGES: list[tuple[str, str]] = [
    ("p11", "r1"),
    ("p22", "(r2 - p11 * r1) / (1 - p11 * r1)"),
    ("p21", "p11 - p22 * p11"),
    (
        "p33",
        "(r3 - (p21 * r2 + p22 * r1)) / (1 - (p21 * r1 + p22 * r2))",
    ),
    ("p31", "p21 - p33 * p22"),
    ("p32", "p22 - p33 * p21"),
    (
        "p44",
        "(r4 - (p31 * r3 + p32 * r2 + p33 * r1))"
        " / (1 - (p31 * r1 + p32 * r2 + p33 * r3))",
    ),
    ("p41", "p31 - p44 * p33"),
    ("p42", "p32 - p44 * p32"),
    ("p43", "p33 - p44 * p31"),
    (
        "p55",
        "(r5 - (p41 * r4 + p42 * r3 + p43 * r2 + p44 * r1))"
        " / (1 - (p41 * r1 + p42 * r2 + p43 * r3 + p44 * r4))",
    ),
]


def _pacf_g_exprs() -> list[str]:
    """The shared G_k expressions over the lag-moment columns, k=0..5."""
    return [
        f"n * n * a{k} - n * s1 * (b{k} + c{k})"
        f" + (n - {k}) * s1 * s1 AS g{k}"
        for k in range(_PACF_LAGS + 1)
    ]


_PACF_R = [
    f"CAST(g{k} AS DOUBLE) / CAST(g0 AS DOUBLE) AS r{k}"
    for k in range(1, _PACF_LAGS + 1)
]


def _pacf_oracle() -> str:
    lag_cols = ",\n               ".join(
        f"lag(y, {k}) OVER (ORDER BY day_x) AS y{k}"
        for k in range(1, _PACF_LAGS + 1)
    )
    mom_cols = ",\n               ".join(
        f"sum(CASE WHEN y{k} IS NOT NULL THEN CAST(y AS HUGEINT) * y{k} END) AS a{k},"
        f" sum(CASE WHEN y{k} IS NOT NULL THEN CAST(y AS HUGEINT) END) AS b{k},"
        f" sum(CAST(y{k} AS HUGEINT)) AS c{k}"
        for k in range(1, _PACF_LAGS + 1)
    )
    g_cols = ",\n               ".join(_pacf_g_exprs())
    stages_sql = ""
    prev = "r"
    for i, (col, expr) in enumerate(_PACF_STAGES):
        stages_sql += f", s{i} AS (SELECT *, {expr} AS {col} FROM {prev})\n"
        prev = f"s{i}"
    return f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS day_x,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    lagged AS (
        SELECT day_x, y,
               {lag_cols}
        FROM daily
    ),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               sum(CAST(y AS HUGEINT)) AS s1,
               sum(CAST(y AS HUGEINT) * y) AS a0,
               sum(CAST(y AS HUGEINT)) AS b0,
               sum(CAST(y AS HUGEINT)) AS c0,
               {mom_cols}
        FROM lagged
    ),
    g AS (
        SELECT n,
               {g_cols}
        FROM mom
    ),
    r AS (
        SELECT CAST(n AS BIGINT) AS n_days,
               {", ".join(_PACF_R)}
        FROM g
    )
    {stages_sql}
    SELECT n_days,
           {", ".join(f"round(r{k}, 9) AS acf_{k}" for k in range(1, 6))},
           round(p11, 6) AS pacf_1, round(p22, 6) AS pacf_2,
           round(p33, 6) AS pacf_3, round(p44, 6) AS pacf_4,
           round(p55, 6) AS pacf_5
    FROM {prev}
    """


@query("trend_pacf_daily", oracle=_pacf_oracle())
def trend_pacf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily-revenue series at lags 1-5 via
    the Durbin-Levinson recursion — THE AR-order selection readout (the
    lag where PACF cuts off is the AR(p) order), completing the Box-
    Jenkins identification pair with events_acf_multi_lag. An LLM-data
    pipeline uses it to decide how many lag features a forecasting head
    actually needs.

    Exactness: the autocovariance ratios r_k = G_k/G_0 are ratios of
    exact DECIMAL(38,0) integers (G_k = n²A_k − n·S1(B_k+C_k) + (n−k)S1²;
    daily cents squared times n² overflows BIGINT at sf1, hence decimal);
    the DL recursion is staged one level at a time with textually
    identical IEEE +,-,*,/ expressions in both engines — no pow, no
    cross-row float sums.

    Scale shape: one combinable daily rollup, ONE lag window over the
    calendar-bounded day series (~2.4k rows regardless of corpus size),
    a 23-integer moment row, then scalar recursion. Corpus scanned once.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            ).alias("day_x"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("day_x")
        .agg(F.sum("cents").cast("long").alias("y"))
    )
    w = Window.orderBy("day_x")
    lagged = daily.select(
        "y",
        *[F.lag("y", k).over(w).alias(f"y{k}") for k in range(1, 6)],
    )
    d38 = "CAST(y AS DECIMAL(38,0))"
    mom = lagged.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.expr(f"sum({d38})").alias("s1"),
        F.expr(f"sum({d38} * y)").alias("a0"),
        F.expr(f"sum({d38})").alias("b0"),
        F.expr(f"sum({d38})").alias("c0"),
        *[
            c
            for k in range(1, 6)
            for c in (
                F.expr(
                    f"sum(CASE WHEN y{k} IS NOT NULL THEN {d38} * y{k} END)"
                ).alias(f"a{k}"),
                F.expr(
                    f"sum(CASE WHEN y{k} IS NOT NULL THEN {d38} END)"
                ).alias(f"b{k}"),
                F.expr(f"sum(CAST(y{k} AS DECIMAL(38,0)))").alias(f"c{k}"),
            )
        ],
    )
    g = mom.selectExpr("n", *_pacf_g_exprs())
    r = g.selectExpr("CAST(n AS BIGINT) AS n_days", *_PACF_R)
    cur = r
    for col, expr in _PACF_STAGES:
        cur = cur.selectExpr("*", f"{expr} AS {col}")
    return cur.selectExpr(
        "n_days",
        *[f"round(r{k}, 9) AS acf_{k}" for k in range(1, 6)],
        "round(p11, 6) AS pacf_1",
        "round(p22, 6) AS pacf_2",
        "round(p33, 6) AS pacf_3",
        "round(p44, 6) AS pacf_4",
        "round(p55, 6) AS pacf_5",
    )


# Granger causality (lag-1): does yesterday's CLICK volume improve the
# prediction of today's VIEW volume beyond yesterday's views alone? The
# restricted (y~y1) and unrestricted (y~y1+x1) OLS fits come from exact
# integer moments; F is one shared textual expression. The centered
# second moments (n1·Σab − Σa·Σb) are exact DECIMAL(38,0) integers.
_GRANGER_S = {
    "syy": ("yt", "yt"),
    "sya": ("yt", "y1"),
    "syb": ("yt", "x1"),
    "saa": ("y1", "y1"),
    "sbb": ("x1", "x1"),
    "sab": ("y1", "x1"),
}
_GRANGER_FINAL = """
    round(CAST(c_sya AS DOUBLE) / CAST(c_saa AS DOUBLE), 6) AS beta_r,
    round((CAST(c_sbb AS DOUBLE) * CAST(c_sya AS DOUBLE)
           - CAST(c_sab AS DOUBLE) * CAST(c_syb AS DOUBLE))
          / (CAST(c_saa AS DOUBLE) * CAST(c_sbb AS DOUBLE)
             - CAST(c_sab AS DOUBLE) * CAST(c_sab AS DOUBLE)), 6) AS beta_y1,
    round((CAST(c_saa AS DOUBLE) * CAST(c_syb AS DOUBLE)
           - CAST(c_sab AS DOUBLE) * CAST(c_sya AS DOUBLE))
          / (CAST(c_saa AS DOUBLE) * CAST(c_sbb AS DOUBLE)
             - CAST(c_sab AS DOUBLE) * CAST(c_sab AS DOUBLE)), 6) AS beta_x1,
    round(((CAST(c_syy AS DOUBLE)
            - CAST(c_sya AS DOUBLE) * c_sya / CAST(c_saa AS DOUBLE))
           - (CAST(c_syy AS DOUBLE)
              - ((CAST(c_sbb AS DOUBLE) * CAST(c_sya AS DOUBLE)
                  - CAST(c_sab AS DOUBLE) * CAST(c_syb AS DOUBLE))
                 * c_sya
                 + (CAST(c_saa AS DOUBLE) * CAST(c_syb AS DOUBLE)
                    - CAST(c_sab AS DOUBLE) * CAST(c_sya AS DOUBLE))
                 * c_syb)
                / (CAST(c_saa AS DOUBLE) * CAST(c_sbb AS DOUBLE)
                   - CAST(c_sab AS DOUBLE) * CAST(c_sab AS DOUBLE))))
          / ((CAST(c_syy AS DOUBLE)
              - ((CAST(c_sbb AS DOUBLE) * CAST(c_sya AS DOUBLE)
                  - CAST(c_sab AS DOUBLE) * CAST(c_syb AS DOUBLE))
                 * c_sya
                 + (CAST(c_saa AS DOUBLE) * CAST(c_syb AS DOUBLE)
                    - CAST(c_sab AS DOUBLE) * CAST(c_sya AS DOUBLE))
                 * c_syb)
                / (CAST(c_saa AS DOUBLE) * CAST(c_sbb AS DOUBLE)
                   - CAST(c_sab AS DOUBLE) * CAST(c_sab AS DOUBLE)))
             / (n1 - 3)), 4) AS f_granger
"""


def _granger_oracle() -> str:
    raw = ", ".join(
        f"sum(CAST({u} AS HUGEINT) * {v}) AS m_{k}"
        for k, (u, v) in _GRANGER_S.items()
    )
    cent = ", ".join(
        f"CAST(n1 * m_{k} - s_{u} * s_{v} AS HUGEINT) AS c_{k}"
        for k, (u, v) in _GRANGER_S.items()
    )
    return f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) AS BIGINT) AS day_x,
               CAST(sum(CASE WHEN event_type = 'view'
                             THEN CAST(floor(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y,
               CAST(sum(CASE WHEN event_type = 'click'
                             THEN CAST(floor(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    lagged AS (
        SELECT y AS yt,
               lag(y) OVER (ORDER BY day_x) AS y1,
               lag(x) OVER (ORDER BY day_x) AS x1
        FROM daily
    ),
    pairs AS (SELECT * FROM lagged WHERE y1 IS NOT NULL),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n1,
               sum(CAST(yt AS HUGEINT)) AS s_yt,
               sum(CAST(y1 AS HUGEINT)) AS s_y1,
               sum(CAST(x1 AS HUGEINT)) AS s_x1,
               {raw}
        FROM pairs
    ),
    cent AS (
        SELECT CAST(n1 AS BIGINT) AS n1, {cent}
        FROM mom
    )
    SELECT n1 AS n_pairs, {_GRANGER_FINAL}
    FROM cent
    """


@query("events_granger_lag1", oracle=_granger_oracle())
def events_granger_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger causality F-test (1969): does yesterday's click
    revenue improve today's view-revenue forecast beyond yesterday's
    views alone? F = (RSS_restricted − RSS_unrestricted)/(RSS_u/(n−3)) —
    the leading-indicator screen a feature pipeline runs before paying
    for cross-series lag features.

    Exactness: daily series in integer cents (missing type-days coalesce
    to 0 over the shared day spine); all raw and centered second moments
    are exact DECIMAL(38,0)/HUGEINT integers; the two OLS fits and F are
    closed-form Cramer expressions over those integers, textually
    identical in both engines.

    Scale shape: one combinable (day × type) conditional rollup, one lag
    window over the calendar-bounded day series, a 10-integer moment
    row, scalar algebra. Corpus scanned once.
    """
    e = load_table(spark, sf_dir, "events").select(
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("day_x"),
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = e.groupBy("day_x").agg(
        F.sum(F.when(F.col("event_type") == "view", F.col("cents")).otherwise(0))
        .cast("long")
        .alias("y"),
        F.sum(
            F.when(F.col("event_type") == "click", F.col("cents")).otherwise(0)
        )
        .cast("long")
        .alias("x"),
    )
    w = Window.orderBy("day_x")
    pairs = (
        daily.select(
            F.col("y").alias("yt"),
            F.lag("y").over(w).alias("y1"),
            F.lag("x").over(w).alias("x1"),
        )
        .filter(F.col("y1").isNotNull())
    )
    mom = pairs.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n1"),
        F.expr("sum(CAST(yt AS DECIMAL(38,0)))").alias("s_yt"),
        F.expr("sum(CAST(y1 AS DECIMAL(38,0)))").alias("s_y1"),
        F.expr("sum(CAST(x1 AS DECIMAL(38,0)))").alias("s_x1"),
        *[
            F.expr(f"sum(CAST({u} AS DECIMAL(38,0)) * {v})").alias(f"m_{k}")
            for k, (u, v) in _GRANGER_S.items()
        ],
    )
    cent = mom.selectExpr(
        "CAST(n1 AS BIGINT) AS n1",
        *[
            f"CAST(n1 * m_{k} - s_{u} * s_{v} AS DECIMAL(38,0)) AS c_{k}"
            for k, (u, v) in _GRANGER_S.items()
        ],
    )
    return cent.selectExpr("n1 AS n_pairs", *_granger_final_cols())


def _granger_final_cols() -> list[str]:
    """Split the shared final SELECT into per-column expressions for
    Spark's selectExpr (DuckDB consumes the same text as one block)."""
    cols, depth, cur = [], 0, []
    for ch in _GRANGER_FINAL:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            cols.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    cols.append("".join(cur).strip())
    return [c for c in cols if c]


# Watermark-lateness audit: each event ARRIVES at its event time plus a
# deterministic network-jitter delay (xxh64 mod 2 minutes — the fixture's
# event_id order is exactly event-time order, so real out-of-orderness
# must be modeled, and the hash makes it replayable). Lateness = how far
# behind the high-water mark (max event-time seen so far in arrival
# order) the event's own timestamp is — this prices Spark's
# withWatermark(delay) BEFORE deploying it: the drop counts at candidate
# delays are exactly the events a streaming job with that watermark
# would discard. The global prefix max uses the two-pass discipline over
# MINUTE buckets of arrival time — per-bucket maxima first, a window
# over the bucket table (calendar-bounded metadata), then
# partition-local combine — never a single-partition window over the
# corpus.
_WM_JITTER_US = 120_000_000   # 0..2 min deterministic arrival jitter
_WM_BUCKET_US = 60_000_000    # 1-minute arrival buckets
_WM_DELAYS_US = [0, 60_000_000, 3_600_000_000]  # 0s, 1min, 1h


@query(
    "events_watermark_lateness",
    oracle=XXH64_MACROS
    + f"""
    WITH raw AS (
        SELECT event_id, epoch_us(ts) AS t_us FROM events
    ),
    base AS (
        SELECT event_id, t_us,
               t_us + ((xxh64_long(event_id, {chain_seed("jit")}::UBIGINT)
                        % {_WM_JITTER_US}) + {_WM_JITTER_US})
                      % {_WM_JITTER_US} AS arr_us
        FROM raw
    ),
    based AS (
        SELECT *, arr_us // {_WM_BUCKET_US} AS b FROM base
    ),
    bmax AS (
        SELECT b, max(t_us) AS bmx FROM based GROUP BY 1
    ),
    bpre AS (
        SELECT b, max(bmx) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND 1 PRECEDING) AS prior_mx
        FROM bmax
    ),
    hwm AS (
        SELECT e.event_id, e.t_us,
               greatest(
                   coalesce(p.prior_mx, -1000000000000000000),
                   coalesce(max(e.t_us) OVER (
                       PARTITION BY e.b ORDER BY e.arr_us, e.event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       -1000000000000000000)) AS wm
        FROM based e JOIN bpre p USING (b)
    ),
    lat AS (
        SELECT greatest(0, wm - t_us) AS late_us FROM hwm
    )
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
           CAST(sum(CASE WHEN late_us > 0 AND late_us <= 60000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late_1m,
           CAST(sum(CASE WHEN late_us > 60000000
                         AND late_us <= 3600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late_1h,
           CAST(sum(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_late_gt_1h,
           CAST(max(late_us) AS BIGINT) AS max_late_us,
           {", ".join(f"CAST(sum(CASE WHEN late_us > {d} THEN 1 ELSE 0 END) AS BIGINT) AS dropped_at_{i}" for i, d in enumerate(_WM_DELAYS_US))}
    FROM lat
    """,
)
def events_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-lateness audit over the events stream: each event
    arrives at its event time plus a deterministic xxh64 network-jitter
    delay (0-2 min; the fixture's id order IS time order, so real
    out-of-orderness must be modeled — and the hash makes the model
    replayable in DuckDB). Per-arrival lateness vs the high-water mark
    (max event-time seen so far in arrival order) feeds a lateness
    histogram plus EXACT drop counts at candidate watermark delays
    0s/1min/1h — the numbers that price ``withWatermark(delay)`` BEFORE
    a streaming job deploys it (each drop count is exactly what that
    delay would discard).

    Exactness: everything is integer micros on deterministic hashes; the
    prefix maxima and drop decisions replay exactly in both engines.

    Scale shape: the global prefix max uses the
    global_row_number_two_pass discipline over MINUTE buckets of arrival
    time — per-bucket maxima (one combinable aggregate), ONE window over
    the bucket table (calendar-bounded metadata), then a partition-local
    prefix within each minute. No single-partition window ever sees the
    corpus.
    """
    raw = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
    )
    base = raw.select(
        "event_id",
        "t_us",
        (
            F.col("t_us")
            + F.pmod(
                F.xxhash64(F.lit("jit"), F.col("event_id")),
                F.lit(_WM_JITTER_US),
            )
        ).alias("arr_us"),
    ).withColumn("b", F.expr(f"arr_us div {_WM_BUCKET_US}"))
    bmax = base.groupBy("b").agg(F.max("t_us").alias("bmx"))
    bpre = bmax.select(
        "b",
        F.max("bmx")
        .over(
            Window.orderBy("b").rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        .alias("prior_mx"),
    )
    # sentinel far below any real epoch-micros but safe from ANSI
    # overflow in wm - t_us (long-min minus a positive would wrap)
    neg_inf = -1_000_000_000_000_000_000
    hwm = base.join(F.broadcast(bpre), "b").select(
        F.greatest(
            F.coalesce(F.col("prior_mx"), F.lit(neg_inf)),
            F.coalesce(
                F.max("t_us").over(
                    Window.partitionBy("b")
                    .orderBy("arr_us", "event_id")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(neg_inf),
            ),
        ).alias("wm"),
        "t_us",
    )
    lat = hwm.select(F.greatest(F.lit(0), F.col("wm") - F.col("t_us")).alias("late_us"))
    return lat.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum((F.col("late_us") > 0).cast("int")).cast("long").alias("n_late"),
        F.sum(
            ((F.col("late_us") > 0) & (F.col("late_us") <= 60_000_000)).cast(
                "int"
            )
        )
        .cast("long")
        .alias("n_late_1m"),
        F.sum(
            (
                (F.col("late_us") > 60_000_000)
                & (F.col("late_us") <= 3_600_000_000)
            ).cast("int")
        )
        .cast("long")
        .alias("n_late_1h"),
        F.sum((F.col("late_us") > 3_600_000_000).cast("int"))
        .cast("long")
        .alias("n_late_gt_1h"),
        F.max("late_us").cast("long").alias("max_late_us"),
        *[
            F.sum((F.col("late_us") > d).cast("int"))
            .cast("long")
            .alias(f"dropped_at_{i}")
            for i, d in enumerate(_WM_DELAYS_US)
        ],
    )


# --- wave 57 (round 10): daily-series motif discovery ---

# Matrix-profile-style motif search (Yeh et al. 2016's problem, solved
# exactly): the closest pair of non-overlapping 7-day windows in the
# daily-revenue series, by exact integer squared Euclidean distance on
# FLOOR-DOLLAR daily revenue (cents div 100 — a squared cents difference
# summed over 7 days would pass BIGINT range near sf1; dollars keep the
# whole metric in exact BIGINTs on both engines).
# The all-pairs join is |days|² — CALENDAR-bounded metadata that
# does not grow with corpus rows (2400² ≈ 2.9M pairs at every SF), which
# is what makes the exact quadratic affordable where a corpus-quadratic
# join never is.
_MOTIF_W = 7
_MOTIF_TOPK = 5


@query(
    "trend_motif_daily",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS day_x,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    // 100 AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    seq AS (
        SELECT row_number() OVER (ORDER BY day_x) AS rn, day_x, y
        FROM daily
    ),
    win AS (
        SELECT rn, day_x,
               {", ".join(f"lead(y, {k}) OVER (ORDER BY rn) AS y{k}" for k in range(1, _MOTIF_W))},
               y AS y0
        FROM seq
    ),
    full_win AS (
        SELECT rn, day_x,
               {", ".join(f"y{k}" for k in range(_MOTIF_W))}
        FROM win WHERE y{_MOTIF_W - 1} IS NOT NULL
    ),
    pairs AS (
        SELECT a.rn AS rn_a, b.rn AS rn_b, a.day_x AS day_a,
               b.day_x AS day_b,
               {" + ".join(f"(a.y{k} - b.y{k}) * (a.y{k} - b.y{k})" for k in range(_MOTIF_W))}
                   AS d2
        FROM full_win a JOIN full_win b
          ON b.rn >= a.rn + {_MOTIF_W}
    )
    SELECT day_a, day_b, CAST(d2 AS BIGINT) AS d2
    FROM pairs
    ORDER BY d2, day_a, day_b
    LIMIT {_MOTIF_TOPK}
    """,
)
def trend_motif_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_MOTIF_TOPK} motif pairs of the daily-revenue series: the
    closest non-overlapping 7-day window pairs by EXACT integer squared
    Euclidean distance — the repeated-pattern detector (matrix-profile
    motif, Yeh et al. 2016) that surfaces recurring demand shapes, and
    the honest exact baseline an approximate MP implementation would be
    graded against.

    Exactness: distances are sums of squared integer FLOOR-DOLLAR
    differences (cents div 100 first — squared cents would pass BIGINT
    range near sf1; dollars keep every d2 an exact BIGINT on both
    engines); the top-k is ordered by (d2, day_a, day_b) so ties break
    deterministically.

    Scale shape: the all-pairs join is |days|² — CALENDAR-bounded
    metadata (≈2.9M pairs regardless of corpus size), planned as a
    range self-join over the ~2.4k-row window table, then
    TakeOrderedAndProject. The corpus contributes one combinable daily
    rollup.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            ).alias("day_x"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("day_x")
        .agg(F.expr("sum(cents) div 100").cast("long").alias("y"))
    )
    w = Window.orderBy("rn")
    seq = daily.select(
        F.row_number().over(Window.orderBy("day_x")).alias("rn"),
        "day_x",
        F.col("y").alias("y0"),
    )
    win = seq.select(
        "rn",
        "day_x",
        "y0",
        *[F.lead("y0", k).over(w).alias(f"y{k}") for k in range(1, _MOTIF_W)],
    ).filter(F.col(f"y{_MOTIF_W - 1}").isNotNull())
    win = win.localCheckpoint(eager=True)  # both sides of the self-join
    a = win.select(
        F.col("rn").alias("rn_a"),
        F.col("day_x").alias("day_a"),
        *[F.col(f"y{k}").alias(f"a{k}") for k in range(_MOTIF_W)],
    )
    b = win.select(
        F.col("rn").alias("rn_b"),
        F.col("day_x").alias("day_b"),
        *[F.col(f"y{k}").alias(f"b{k}") for k in range(_MOTIF_W)],
    )
    d2 = " + ".join(
        f"(a{k} - b{k}) * (a{k} - b{k})" for k in range(_MOTIF_W)
    )
    pairs = a.join(b, F.col("rn_b") >= F.col("rn_a") + _MOTIF_W).selectExpr(
        "day_a", "day_b", f"CAST({d2} AS BIGINT) AS d2"
    )
    return pairs.orderBy("d2", "day_a", "day_b").limit(_MOTIF_TOPK)


# --- wave 58 (round 10): burstiness ---

# Fano factor per event type over 1-minute windows, empty windows
# included: F = Var(N)/E[N], the dispersion index that separates
# Poisson-like (F≈1) from bursty (F>1) and regular (F<1) streams — the
# capacity-planning readout beside events_interarrival_stats. The window
# spine is the global minute span (calendar-bounded), so empty windows
# are counted without generating them: Var·n² = n·ΣC² − S1² needs only
# the NONEMPTY window counts plus the spine size.
_FANO_WIN_US = 60_000_000
_FANO_SCALE = 1_000_000


@query(
    "events_fano_factor",
    oracle=f"""
    WITH base AS (
        SELECT event_type, epoch_us(ts) // {_FANO_WIN_US} AS w
        FROM events
    ),
    spine AS (
        SELECT max(w) - min(w) + 1 AS n_windows FROM base
    ),
    wc AS (
        SELECT event_type, w, CAST(count(*) AS BIGINT) AS c
        FROM base GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS nonempty_windows,
               CAST(sum(c) AS BIGINT) AS n_events,
               CAST(sum(c * c) AS BIGINT) AS s2
        FROM wc GROUP BY 1
    )
    SELECT m.event_type,
           CAST(s.n_windows AS BIGINT) AS n_windows,
           m.n_events, m.nonempty_windows,
           CAST((s.n_windows * m.s2 - m.n_events * m.n_events)
                * {_FANO_SCALE}
                // (s.n_windows * m.n_events) AS BIGINT) AS fano_e6
    FROM m CROSS JOIN spine s
    ORDER BY 1
    """,
)
def events_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (dispersion index) per event type over 1-minute
    windows, EMPTY WINDOWS INCLUDED: F = Var(N)/E[N] — F≈1 is
    Poisson-like arrivals, F>1 bursty, F<1 regular. The
    capacity-planning twin of events_interarrival_stats (that one
    measures gaps between events; this one measures clumping of counts),
    and the standard burstiness screen before sizing streaming state.

    Exactness: empty windows are counted WITHOUT being generated —
    Var·n² = n·ΣC² − S1² needs only nonempty window counts plus the
    calendar-bounded spine size; fano_e6 is one exact scaled integer
    division on positive longs.

    Scale shape: one combinable (type × minute) count (bounded by
    |types| × calendar minutes), one per-type rollup, a 1-row spine
    broadcast. One corpus scan.
    """
    base = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            f"unix_micros(CAST(ts AS TIMESTAMP)) div {_FANO_WIN_US}"
        ).alias("w"),
    )
    spine = base.agg(
        (F.max("w") - F.min("w") + 1).alias("n_windows")
    )
    wc = base.groupBy("event_type", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    m = wc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nonempty_windows"),
        F.sum("c").cast("long").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    return (
        m.crossJoin(F.broadcast(spine))
        .selectExpr(
            "event_type",
            "CAST(n_windows AS BIGINT) AS n_windows",
            "n_events",
            "nonempty_windows",
            f"CAST((n_windows * s2 - n_events * n_events) * {_FANO_SCALE}"
            " div (n_windows * n_events) AS BIGINT) AS fano_e6",
        )
        .orderBy("event_type")
    )
