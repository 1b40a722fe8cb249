"""Relational surface, part 2: grouping sets, ALL-variant set ops, unpivot,
batch sessionization — rounding out SURVEY.md §2's aggregation/set-op rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.money import sum_fixed
from ..io import load_table, register_views
from ..registry import query


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS orderstatus,
           coalesce(o_orderpriority, 'ALL') AS orderpriority,
           count(*)                         AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube) via Spark SQL —
    the SQL entry point is first-class: same Catalyst plan as DataFrame."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL')   AS orderstatus,
               coalesce(o_orderpriority, 'ALL') AS orderpriority,
               count(*)                         AS n_orders,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "setops_all_variants",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def setops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset semantics: intersectAll / exceptAll preserve duplicates."""
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    open_ = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return big.intersectAll(open_).exceptAll(urgent)


@query(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, round(val, 2) AS val
    FROM (
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
        FROM lineitem WHERE l_orderkey % 50 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
        FROM lineitem WHERE l_orderkey % 50 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount
        FROM lineitem WHERE l_orderkey % 50 = 0
    )
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via stack(): one generator pass, no union re-scan.

    The oracle spells out the UNION ALL expansion; Spark's stack reads the
    source once — the difference that matters when the fact table is 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'price', l_extendedprice,"
            " 'discount', l_discount) AS (measure, raw_val)"
        ),
    ).select(
        "l_orderkey",
        "l_linenumber",
        "measure",
        F.round("raw_val", 2).alias("val"),
    )


@query(
    "sessionize_events_batch",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                             PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                         > 1800000000
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, value,
               CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM marked
    )
    SELECT user_id, session_id,
           count(*)                                  AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS session_value,
           CAST(epoch(CAST(date_trunc('second', min(ts)) AS TIMESTAMP)) AS BIGINT) AS session_start_s
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def sessionize_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap flag + running sum = session ids.

    The classic two-window formulation — one shuffle on user_id, both
    windows reuse the same partitioning (no second exchange). The streaming
    twin is stream_session_windows.
    """
    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w_order = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w_order)
    marked = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    w_run = W.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    numbered = marked.withColumn("session_id", F.sum("new_session").over(w_run))
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        sum_fixed(F.col("value")).alias("session_value"),
        F.unix_timestamp(F.min("ts")).alias("session_start_s"),
    )


@query(
    "range_join_banded",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    numbered AS (
        SELECT user_id, ts, event_id,
               CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM marked
    ),
    sessions AS (
        SELECT user_id, session_id,
               min(ts) AS s_start, max(ts) AS s_end
        FROM numbered GROUP BY user_id, session_id
    )
    SELECT e.event_id, e.user_id, s.session_id,
           count(*) OVER (PARTITION BY e.user_id, s.session_id) AS session_size
    FROM events e
    JOIN sessions s
      ON e.user_id = s.user_id
     AND e.ts BETWEEN s.s_start AND s.s_end
    """,
)
def range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join at scale: events → their covering session
    interval, WITHOUT a broadcast-nested-loop.

    The naive point-in-interval join is a BNLJ (per-user cross product).
    The banded form turns it into an EQUI join: each interval explodes to
    the hour buckets it covers (`sequence(floor(start), floor(end))`), a
    point joins its own bucket, and the residual BETWEEN filter runs on
    the tiny equi-matched set. Join key (user_id, hour) has cardinality
    proportional to the data — parallelism scales, no quadratic blow-up;
    the same banding trick as dedup_ngram_jaccard's length buckets.

    Intervals are the gaps-and-islands sessions of the same events table,
    so every event matches exactly one interval — the oracle (a direct
    BETWEEN join) certifies the banded plan loses and duplicates nothing.
    """
    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w_order = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w_order)
    numbered = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w_order.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    sessions = numbered.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("s_start"), F.max("ts_us").alias("s_end")
    )
    hour_us = 3600 * 1_000_000
    bands = sessions.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("s_start") / hour_us), F.floor(F.col("s_end") / hour_us)
            )
        ),
    )
    pts = e.select(
        "event_id", "user_id", "ts_us", F.floor(F.col("ts_us") / hour_us).alias("bucket")
    )
    joined = pts.join(bands, ["user_id", "bucket"]).filter(
        (F.col("ts_us") >= F.col("s_start")) & (F.col("ts_us") <= F.col("s_end"))
    )
    w_size = W.partitionBy("user_id", "session_id")
    return joined.select(
        "event_id",
        "user_id",
        "session_id",
        F.count(F.lit(1)).over(w_size).alias("session_size"),
    )


@query(
    "events_resample_gapfill",
    oracle="""
    WITH obs AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               count(*) AS n_events,
               round(CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS DOUBLE), 2)
                   AS hour_value
        FROM events GROUP BY user_id, date_trunc('hour', ts)
    ),
    span AS (
        SELECT user_id, min(h) AS h_lo, max(h) AS h_hi FROM obs GROUP BY user_id
    ),
    grid AS (
        SELECT s.user_id, g.h
        FROM span s, LATERAL (
            SELECT unnest(generate_series(s.h_lo, s.h_hi, INTERVAL 1 HOUR)) AS h
        ) g
    ),
    filled AS (
        SELECT g.user_id, g.h, o.hour_value,
               last_value(o.hour_value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS ffill_value
        FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.h = o.h
    )
    SELECT user_id,
           count(*) AS n_hours,
           CAST(count(hour_value) AS BIGINT) AS n_observed,
           CAST(count(*) - count(hour_value) AS BIGINT) AS n_filled,
           round(CAST(sum(CAST(round(ffill_value, 2) AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS ffill_total
    FROM filled GROUP BY user_id
    """,
)
def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward-fill: per user, hourly buckets over
    the user's own active span, gap hours materialized from a
    sequence-explode grid, missing values forward-filled with
    last(ignorenulls) — the resample→ffill primitive of feature pipelines.

    Shape: one agg shuffle (user, hour) with map-side combine; the grid is
    a generator off the per-user span (no driver loop, no range table);
    the ffill is one window pass reusing the user partitioning. At 100 TB
    the grid is bounded by users × span-hours, independent of event count
    — and the exact-DECIMAL discipline keeps the fill sums hash-stable."""
    e = load_table(spark, sf_dir, "events")
    obs = (
        e.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("hour_value"),
        )
    )
    span = obs.groupBy("user_id").agg(
        F.min("h").alias("h_lo"), F.max("h").alias("h_hi")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h_lo"), F.col("h_hi"), F.expr("interval 1 hour"))
        ).alias("h"),
    )
    joined = grid.join(obs, ["user_id", "h"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = joined.withColumn(
        "ffill_value", F.last("hour_value", ignorenulls=True).over(w)
    )
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.count("hour_value").alias("n_observed"),
        (F.count(F.lit(1)) - F.count("hour_value")).alias("n_filled"),
        F.round(
            F.sum(F.round(F.col("ffill_value"), 2).cast("decimal(18,2)")).cast(
                "double"
            ),
            2,
        ).alias("ffill_total"),
    )


@query(
    "events_anomaly_iqr",
    oracle="""
    WITH bounds AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) AS n_events,
           round(b.q1, 4) AS q1,
           round(b.q3, 4) AS q3,
           CAST(sum(CASE WHEN e.value < b.q1 - 1.5 * (b.q3 - b.q1)
                           OR e.value > b.q3 + 1.5 * (b.q3 - b.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN bounds b USING (event_type)
    GROUP BY e.event_type, b.q1, b.q3
    """,
)
def events_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR anomaly flagging: per event type, exact interpolated quartiles
    → Tukey fences (1.5×IQR) → outlier counts. Two passes by nature
    (bounds must exist before rows are classified): an exact-percentile
    aggregate over a low-cardinality key, broadcast back onto the scan —
    the standard data-quality gate in front of a metrics pipeline.

    Spark's percentile() and DuckDB's quantile_cont compute the same
    linear interpolation, so the bounds — and therefore the counts —
    match exactly."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("value") < F.col("q1") - 1.5 * iqr) | (
        F.col("value") > F.col("q3") + 1.5 * iqr
    )
    return (
        e.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(is_out.cast("int")).cast("long").alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_events",
            F.round("q1", 4).alias("q1"),
            F.round("q3", 4).alias("q3"),
            "n_outliers",
        )
    )


@query(
    "events_retention_cohort",
    oracle="""
    WITH firsts AS (
        SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset
        FROM events e JOIN firsts f USING (user_id)
    )
    SELECT CAST(epoch(CAST(cohort_day AS TIMESTAMP)) AS BIGINT) AS cohort_day,
           CAST(day_offset AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT)   AS n_active_users
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted as
    active at each day offset (first week) — the product-analytics matrix
    every event pipeline serves. Shape: one min-aggregate on user_id, one
    re-join (broadcast when the user dimension is small, shuffle
    otherwise), one distinct + count — no window, no self-join of the
    event table against itself."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    firsts = e.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(day, F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy(
            F.unix_timestamp(F.col("cohort_day")).alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@query(
    "sessionize_capped_sessions",
    # The duration cap makes sessionization a genuinely SEQUENTIAL scan:
    # whether event i starts a new session depends on the current
    # session's START, which depends on every prior break — a
    # non-associative recursion no window frame expresses. The oracle IS
    # that recursion (recursive CTE stepping one event per iteration).
    oracle="""
    WITH RECURSIVE ordered AS (
        SELECT user_id, epoch_us(ts) AS t,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    walk AS (
        SELECT user_id, rn, t, t AS sess_start, 1 AS sess_id
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.rn, o.t,
               CASE WHEN o.t - w.t >= 43200000000
                         OR o.t - w.sess_start >= 172800000000
                    THEN o.t ELSE w.sess_start END,
               CASE WHEN o.t - w.t >= 43200000000
                         OR o.t - w.sess_start >= 172800000000
                    THEN w.sess_id + 1 ELSE w.sess_id END
        FROM walk w JOIN ordered o
          ON o.user_id = w.user_id AND o.rn = w.rn + 1
    )
    SELECT user_id,
           CAST(max(sess_id) AS BIGINT) AS n_sessions,
           count(*) AS n_events,
           CAST(max(t - sess_start) AS BIGINT) AS longest_span_us
    FROM walk
    GROUP BY user_id
    """,
)
def sessionize_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with BOTH an inactivity gap (12 h) and a maximum
    session duration (48 h) — the variant analytics vendors call
    "session timeout + session cap".

    The cap breaks the window trick: plain gap-sessionization is a
    prefix sum of gap flags, but "split when the session exceeds 48 h
    from its start" references the session start — itself a function
    of every previous split — a non-associative recursion that no
    window frame or prefix identity expresses. The honest distributed
    shape: applyInPandas per user (groups are bounded; the scan is
    sequential WITHIN a user but all users run in parallel — the same
    legitimacy class as stateful streaming). The oracle is the literal
    recursion as a recursive CTE stepping one event per iteration, so
    the hash match proves the Python scan implements exactly that
    recurrence.
    """
    import pandas as pd

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        "event_id",
    )
    GAP_US = 43_200_000_000
    CAP_US = 172_800_000_000

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "event_id"], kind="mergesort")
        n_sessions = 0
        sess_start = None
        prev_t = None
        longest = 0
        for t in pdf["t"]:
            if (
                prev_t is None
                or t - prev_t >= GAP_US
                or t - sess_start >= CAP_US
            ):
                n_sessions += 1
                sess_start = t
            longest = max(longest, t - sess_start)
            prev_t = t
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_sessions": [n_sessions],
                "n_events": [len(pdf)],
                "longest_span_us": [longest],
            }
        )

    return e.groupBy("user_id").applyInPandas(
        scan,
        "user_id long, n_sessions long, n_events long, longest_span_us long",
    )


# Allen's 13 interval relations (1983), classified with closed integer
# intervals. The CASE chain is order-exhaustive: every pair lands in
# exactly one bucket. Shared verbatim by Spark and the oracle.
_ALLEN_CASE = """
    CASE
      WHEN ea < sb THEN 'precedes'
      WHEN eb < sa THEN 'preceded_by'
      WHEN ea = sb THEN 'meets'
      WHEN eb = sa THEN 'met_by'
      WHEN sa = sb AND ea = eb THEN 'equals'
      WHEN sa = sb AND ea < eb THEN 'starts'
      WHEN sa = sb AND ea > eb THEN 'started_by'
      WHEN ea = eb AND sa > sb THEN 'finishes'
      WHEN ea = eb AND sa < sb THEN 'finished_by'
      WHEN sa > sb AND ea < eb THEN 'during'
      WHEN sa < sb AND ea > eb THEN 'contains'
      WHEN sa < sb AND ea > sb AND ea < eb THEN 'overlaps'
      ELSE 'overlapped_by'
    END
"""

_ALLEN_HORIZON = 16  # only pairs with |sa - sb| <= horizon are classified


@query(
    "interval_allen_relations",
    oracle=f"""
    WITH a AS (
        SELECT o_orderkey AS ida,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS sa,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                    + o_orderkey % 7 + 1 AS BIGINT) AS ea
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    b AS (
        SELECT o_orderkey AS idb,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS sb,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                    + o_orderkey % 11 + 1 AS BIGINT) AS eb
        FROM orders WHERE o_orderkey % 3 = 1
    )
    SELECT {_ALLEN_CASE} AS relation,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM a JOIN b ON abs(sa - sb) <= {_ALLEN_HORIZON}
    GROUP BY 1
    """,
)
def interval_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval algebra (1983): classify every near-in-time pair
    of order validity intervals into the 13 mutually-exclusive temporal
    relations (precedes/meets/overlaps/starts/during/finishes, their
    inverses, equals) — the vocabulary under every temporal-join
    predicate the engine offers (as-of = latest 'precedes', SCD2 =
    'during', backlog sweep = 'overlaps' counting).

    Intervals derive deterministically from orders (start = order day,
    duration = key-modular, two disjoint sets by key residue); the CASE
    chain is order-exhaustive over closed integer intervals, so bucket
    assignment is pure integer comparison. Pairing is declared
    horizon-bounded (|start gap| <= 16 days) — the classification,
    like every real temporal join, is only asked near the diagonal.

    Shape at 100 TB: the horizon IS the band — Spark buckets set A's
    starts into 16-day cells with 3 neighbor probes and equi-joins set
    B's cell (the range_join_banded discipline; shuffle is 3x|A| + |B|,
    never the cross product the oracle's quadratic ON clause implies).
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    day = "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)"
    a = o.filter(F.col("o_orderkey") % 3 == 0).selectExpr(
        "o_orderkey AS ida",
        f"{day} AS sa",
        f"{day} + o_orderkey % 7 + 1 AS ea",
    )
    b = o.filter(F.col("o_orderkey") % 3 == 1).selectExpr(
        "o_orderkey AS idb",
        f"{day} AS sb",
        f"{day} + o_orderkey % 11 + 1 AS eb",
    )
    h = _ALLEN_HORIZON
    a_probed = a.withColumn("off", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))).select(
        "sa", "ea", (F.expr(f"sa DIV {h}") + F.col("off")).alias("cell")
    )
    b_cell = b.select("sb", "eb", F.expr(f"sb DIV {h}").alias("cell"))
    pairs = a_probed.join(b_cell, "cell").filter(
        F.abs(F.col("sa") - F.col("sb")) <= h
    )
    return pairs.groupBy(F.expr(_ALLEN_CASE).alias("relation")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
