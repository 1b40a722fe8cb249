"""Operational analytics + reconciliation operators [EXT beyond task.ts —
the data-management surface a production lakehouse pipeline needs]:
hierarchical time rollup, equi-width histogram, key-skew diagnostics,
snapshot diff audit, full CDC merge (insert/update/delete), declarative
data-quality constraint report.

All are oracle-checked. The two reconciliation queries derive BOTH of
their input snapshots/changelogs deterministically from the orders fixture
with pure key arithmetic, identically in Spark and the DuckDB oracle — no
synthetic data is written anywhere.

Scale notes (100 TB):
- the rollup aggregates day totals FROM hour partials (sum/count carry,
  avg derived at the end) — the hypertable pattern: at production scale
  the hour level is a materialized incremental table and the day level
  reads partials, never raw events;
- the histogram is one map-side-combined shuffle over <=nbins keys;
- skew diagnostics are the pre-flight tool for choosing salting factors:
  one count-per-key shuffle, then a single-row reduce;
- the diff and the merge shuffle on the primary key only, carrying a
  fixed-width digest/payload — at 100 TB both would run per partition of
  a date-partitioned table, not globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.money import sql_sum_fixed, sum_fixed
from ..functions.xxh64_sql import XXH64_MACROS, chain_seed
from ..io import load_table
from ..registry import query


@query(
    "events_rollup_two_level",
    oracle=f"""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS n_events,
           {sql_sum_fixed('value', 2)} AS sum_value,
           CAST((CAST(sum(CAST(CAST(round(value, 2) AS DECIMAL(18,2)) * 100
                               AS BIGINT)) AS BIGINT)
                 * 100) // count(*) AS BIGINT) AS avg_value_e4
    FROM events
    GROUP BY event_type, date_trunc('day', ts)
    """,
)
def events_rollup_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (hypertable-style) rollup: hour-level partial
    aggregates first, then the day level computed FROM the partials —
    counts and DECIMAL sums re-aggregate losslessly; avg is derived from
    the carried sum/count at the end, never averaged-of-averages. The avg
    is emitted as exact integer 1e-4 units (cents*100 DIV count): a
    rounded-double avg can land on a .xxxx5 tie that Spark and DuckDB
    break differently, while integer floor division is bit-identical
    (value > 0 in this table, so floor == truncate).

    The oracle groups the raw events by day directly, so the hash match
    *is* the proof that the two-level rollup is exact. At 100 TB the hour
    table is the incrementally-maintained materialization (see
    stream_foreach_batch_upsert) and day/week/month levels all fold the
    same partials.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = (F.round(F.col("value"), 2).cast("decimal(18,2)") * 100).cast("long")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents).alias("sum_cents"),
    )
    return (
        hourly.groupBy(
            "event_type", F.date_trunc("day", "hour").alias("day")
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_cents").alias("sum_cents"),
        )
        .select(
            "event_type",
            "day",
            "n_events",
            F.round(F.col("sum_cents").cast("double") / 100.0, 2).alias(
                "sum_value"
            ),
            F.expr("sum_cents * 100 DIV n_events").alias("avg_value_e4"),
        )
    )


@query(
    "agg_histogram_orders",
    oracle="""
    SELECT least(CAST(floor(o_totalprice / 50000.0) AS BIGINT), 9) AS bucket,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def agg_histogram_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (10 x 50k buckets over o_totalprice, top
    bucket open). Both engines compute the identical IEEE floor(x/width),
    so bucket assignment is bit-deterministic — no width_bucket builtin
    needed. One map-side-combined shuffle with <=10 keys; the profiling
    primitive behind range-partition boundary choices.
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 50000.0).cast("bigint"), F.lit(9)
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "diag_key_skew",
    oracle="""
    WITH per_key AS (
        SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
    )
    SELECT count(*) AS n_keys,
           CAST(sum(n) AS BIGINT) AS n_rows,
           max(n) AS max_per_key,
           round(quantile_cont(n, 0.5), 4) AS p50_per_key,
           round(quantile_cont(n, 0.99), 4) AS p99_per_key,
           round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top1_share
    FROM per_key
    """,
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew profile for orders.o_custkey: per-key counts,
    their exact p50/p99, the hottest key's row share. This is the
    pre-flight diagnostic that decides whether a key needs salting
    (functions/skew.py) or AQE skew-join handling — measured, not guessed.
    Shape: one count-per-key shuffle (map-side combined), then a
    single-row reduce over |keys| counts.
    """
    o = load_table(spark, sf_dir, "orders")
    per_key = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_per_key"),
        F.round(F.percentile("n", F.lit(0.5)), 4).alias("p50_per_key"),
        F.round(F.percentile("n", F.lit(0.99)), 4).alias("p99_per_key"),
        F.round(F.max("n").cast("double") / F.sum("n"), 6).alias("top1_share"),
    )


# Deterministic snapshot derivations shared by the Spark and oracle sides
# of table_diff_audit (documented once here):
#   snapshot A = orders with o_orderkey % 10 <> 9
#   snapshot B = orders with o_orderkey % 10 <> 0, where rows with
#                o_orderkey % 7 = 0 carry an "updated" price.
# The update is ADDITION of a small key-derived constant, never a rounded
# multiplication: round(x * 1.05, 2) lands on .xx5 ties that Spark
# (HALF_UP on the shortest decimal repr) and DuckDB (exact binary) break
# differently, while x + (k + 0.25) is one exact-order IEEE add in both.
_DIFF_B_PRICE_SQL = (
    "CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + (o_orderkey % 100 + 0.25) "
    "ELSE o_totalprice END"
)


@query(
    "table_diff_audit",
    oracle=f"""
    WITH a AS (
        SELECT o_orderkey AS k, o_totalprice AS va FROM orders
        WHERE o_orderkey % 10 <> 9
    ),
    b AS (
        SELECT o_orderkey AS k, {_DIFF_B_PRICE_SQL} AS vb FROM orders
        WHERE o_orderkey % 10 <> 0
    )
    SELECT CASE WHEN a.k IS NULL THEN 'added'
                WHEN b.k IS NULL THEN 'removed'
                WHEN va <> vb THEN 'changed'
                ELSE 'unchanged' END AS status,
           count(*) AS n,
           {sql_sum_fixed('coalesce(vb, 0) - coalesce(va, 0)', 2)} AS value_delta
    FROM a FULL OUTER JOIN b ON a.k = b.k
    GROUP BY 1
    """,
)
def table_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: FULL OUTER join two table versions on the
    primary key and classify every row added / removed / changed /
    unchanged, with the exact net value drift per class. The audit every
    migration and every backfill needs before a swap.

    Shape: both sides shuffle once on the key carrying only (key, value);
    at 100 TB with date-partitioned snapshots the join runs
    partition-by-partition, and storing a per-row digest column instead of
    raw values makes 'changed' detection one comparison wide regardless of
    schema width.
    """
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 10 != 9).select(
        F.col("o_orderkey").alias("ka"), F.col("o_totalprice").alias("va")
    )
    b = o.filter(F.col("o_orderkey") % 10 != 0).select(
        F.col("o_orderkey").alias("kb"),
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.col("o_totalprice") + (F.col("o_orderkey") % 100 + 0.25),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("vb"),
    )
    joined = a.join(b, a.ka == b.kb, "full_outer")
    status = (
        F.when(F.col("ka").isNull(), F.lit("added"))
        .when(F.col("kb").isNull(), F.lit("removed"))
        .when(F.col("va") != F.col("vb"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    delta = F.coalesce(F.col("vb"), F.lit(0.0)) - F.coalesce(F.col("va"), F.lit(0.0))
    return joined.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        sum_fixed(delta, scale=2).alias("value_delta"),
    )


@query(
    "cdc_merge_full",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderkey % 10 <> 9
    ),
    changelog AS (
        SELECT CASE o_orderkey % 5 WHEN 0 THEN 'D' WHEN 1 THEN 'U'
                                   ELSE 'I' END AS op,
               CASE WHEN o_orderkey % 5 IN (0, 1) THEN o_orderkey
                    ELSE o_orderkey + 10000000 END AS k,
               o_orderstatus,
               o_totalprice + (o_orderkey % 500 + 0.75) AS new_price
        FROM orders
        WHERE o_orderkey % 5 IN (0, 1, 2)
    ),
    survivors AS (
        SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
        FROM base b
        WHERE NOT EXISTS (
            SELECT 1 FROM changelog c
            WHERE c.k = b.o_orderkey AND c.op IN ('D', 'U')
        )
    ),
    merged AS (
        SELECT * FROM survivors
        UNION ALL
        SELECT c.k, c.o_orderstatus, c.new_price
        FROM changelog c
        WHERE c.op = 'U' AND c.k IN (SELECT o_orderkey FROM base)
        UNION ALL
        SELECT c.k, c.o_orderstatus, c.new_price
        FROM changelog c WHERE c.op = 'I'
    )
    SELECT o_orderstatus, count(*) AS n,
           {sql_sum_fixed('o_totalprice', 2)} AS total_value
    FROM merged GROUP BY o_orderstatus
    """,
)
def cdc_merge_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CDC MERGE with all three op types: deletes remove base rows,
    updates replace them (only if the key exists — ANSI MERGE WHEN MATCHED
    semantics), inserts append new keys. The changelog is derived
    deterministically from orders (op = key % 5; inserts get key+10M so
    they genuinely don't exist in base); the final state is aggregated per
    status so the output stays driver-flat.

    Shape: one ANTI join (base vs D∪U keys), one SEMI-gated update join,
    one union — all shuffling on the primary key only. This is the exact
    plan a foreachBatch MERGE executes per micro-batch
    (streaming/queries.py), expressed as its batch equivalent.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 10 != 9).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    ch = (
        o.filter((F.col("o_orderkey") % 5).isin([0, 1, 2]))
        .select(
            F.when(F.col("o_orderkey") % 5 == 0, F.lit("D"))
            .when(F.col("o_orderkey") % 5 == 1, F.lit("U"))
            .otherwise(F.lit("I"))
            .alias("op"),
            F.when(
                (F.col("o_orderkey") % 5).isin([0, 1]), F.col("o_orderkey")
            )
            .otherwise(F.col("o_orderkey") + 10_000_000)
            .alias("k"),
            "o_orderstatus",
            # exact addition, not rounded multiplication — see
            # _DIFF_B_PRICE_SQL's tie-rounding note
            (F.col("o_totalprice") + (F.col("o_orderkey") % 500 + 0.75)).alias(
                "new_price"
            ),
        )
    )
    du_keys = ch.filter(F.col("op").isin(["D", "U"])).select("k")
    survivors = base.join(
        du_keys, base.o_orderkey == du_keys.k, "left_anti"
    )
    updates = (
        ch.filter(F.col("op") == "U")
        .join(base.select("o_orderkey"), ch.k == base.o_orderkey, "left_semi")
        .select(
            F.col("k").alias("o_orderkey"),
            "o_orderstatus",
            F.col("new_price").alias("o_totalprice"),
        )
    )
    inserts = ch.filter(F.col("op") == "I").select(
        F.col("k").alias("o_orderkey"),
        "o_orderstatus",
        F.col("new_price").alias("o_totalprice"),
    )
    merged = survivors.unionByName(updates).unionByName(inserts)
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        sum_fixed(F.col("o_totalprice"), scale=2).alias("total_value"),
    )


@query(
    "dq_constraint_report",
    oracle="""
    SELECT 'orders_fk_customer' AS constraint_name,
           (SELECT count(*) FROM orders) AS n_checked,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_violations
    UNION ALL
    SELECT 'orders_totalprice_positive',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders
            WHERE o_totalprice IS NULL OR o_totalprice <= 0)
    UNION ALL
    SELECT 'customer_pk_unique',
           (SELECT count(*) FROM customer),
           (SELECT count(*) - count(DISTINCT c_custkey) FROM customer)
    UNION ALL
    SELECT 'lineitem_pk_unique',
           (SELECT count(*) FROM lineitem),
           (SELECT CAST(count(*) AS BIGINT)
                   - count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem)
    UNION ALL
    SELECT 'lineitem_discount_range',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem
            WHERE l_discount IS NULL OR l_discount < 0 OR l_discount > 1)
    UNION ALL
    SELECT 'orders_orderdate_not_null',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders WHERE o_orderdate IS NULL)
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate: one row per constraint with checked
    and violation counts — referential integrity (FK anti join),
    primary-key uniqueness (count vs count-distinct, composite keys via
    struct), range and not-null checks. The report every ingest job runs
    before promoting a partition; 0 violations on the fixture is itself
    the assertion.

    Scale shape: each constraint is one scan-side aggregate or one
    key-only anti join; constraints over the same table share its scan in
    practice (at 100 TB you'd fuse them into a single pass — here they
    stay separate rows for readability, and Catalyst still prunes to the
    referenced columns).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def report(name: str, checked, violations) -> DataFrame:
        return checked.crossJoin(violations).select(
            F.lit(name).alias("constraint_name"),
            F.col("n_checked"),
            F.col("n_violations"),
        )

    n_orders = o.agg(F.count(F.lit(1)).alias("n_checked"))
    n_cust = c.agg(F.count(F.lit(1)).alias("n_checked"))
    n_li = li.agg(F.count(F.lit(1)).alias("n_checked"))

    fk_viol = (
        o.join(F.broadcast(c.select("c_custkey")),
               o.o_custkey == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    price_viol = o.agg(
        F.sum(
            (F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0))
            .cast("long")
        ).alias("n_violations")
    )
    cust_pk_viol = c.agg(
        (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias("n_violations")
    )
    li_pk_viol = li.agg(
        (
            F.count(F.lit(1))
            - F.countDistinct(F.struct("l_orderkey", "l_linenumber"))
        ).alias("n_violations")
    )
    disc_viol = li.agg(
        F.sum(
            (
                F.col("l_discount").isNull()
                | (F.col("l_discount") < 0)
                | (F.col("l_discount") > 1)
            ).cast("long")
        ).alias("n_violations")
    )
    date_viol = o.agg(
        F.sum(F.col("o_orderdate").isNull().cast("long")).alias("n_violations")
    )
    return (
        report("orders_fk_customer", n_orders, fk_viol)
        .unionByName(report("orders_totalprice_positive", n_orders, price_viol))
        .unionByName(report("customer_pk_unique", n_cust, cust_pk_viol))
        .unionByName(report("lineitem_pk_unique", n_li, li_pk_viol))
        .unionByName(report("lineitem_discount_range", n_li, disc_viol))
        .unionByName(report("orders_orderdate_not_null", n_orders, date_viol))
    )


@query(
    "ivm_join_delta",
    # The oracle simply recomputes the FULL join of (A0 ∪ dA) ⋈ (B0 ∪ dB):
    # the hash match proves the delta-maintenance algebra
    #   V1 = V0 ∪ (dA ⋈ B0) ∪ (A0 ⋈ dB) ∪ (dA ⋈ dB)
    # produces exactly the recomputed state.
    oracle=f"""
    WITH a1 AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ),
    b1 AS (
        SELECT c_custkey, c_mktsegment FROM customer
    )
    SELECT c_mktsegment, count(*) AS n_rows,
           {sql_sum_fixed('o_totalprice', 2)} AS revenue
    FROM a1 JOIN b1 ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of a JOIN under insert deltas: the
    materialized view V = A ⋈ B is brought from (A0, B0) to
    (A0 ∪ dA, B0 ∪ dB) by computing only the delta joins
    dA⋈B0 ∪ A0⋈dB ∪ dA⋈dB — never re-joining the full bases. Splits are
    key-arithmetic (orders %10==8 and customers %10==8 are the deltas), so
    both engines derive identical inputs; the oracle recomputes the full
    join, making the hash match a proof of the maintenance identity.

    Why this is a 100 TB operator: a nightly 0.1% delta against a full
    recompute is the difference between joining 100 GB and joining
    100 TB. The delta joins shuffle only O(|dA| + |dB|) rows against the
    (bucketed, at production scale) base tables; V0 itself is read, not
    recomputed — here V0 is built once inline to keep the query
    self-contained, and the maintenance arithmetic is what the oracle
    checks.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    a0 = o.filter(F.col("o_orderkey") % 10 != 8)
    da = o.filter(F.col("o_orderkey") % 10 == 8)
    b0 = c.filter(F.col("c_custkey") % 10 != 8)
    db = c.filter(F.col("c_custkey") % 10 == 8)

    v0 = a0.join(b0, a0.o_custkey == b0.c_custkey)
    delta = (
        da.join(b0, da.o_custkey == b0.c_custkey)
        .unionByName(a0.join(db, a0.o_custkey == db.c_custkey))
        .unionByName(da.join(db, da.o_custkey == db.c_custkey))
    )
    v1 = v0.unionByName(delta)
    return v1.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        sum_fixed(F.col("o_totalprice"), scale=2).alias("revenue"),
    )


@query(
    "diag_join_size_estimate",
    oracle="""
    WITH fa AS (
        SELECT o_custkey AS k, count(*) AS ca FROM orders GROUP BY 1
    ),
    fb AS (
        SELECT c_custkey AS k, count(*) AS cb FROM customer GROUP BY 1
    ),
    est AS (
        SELECT CAST(sum(ca * cb) AS BIGINT) AS est_rows
        FROM fa JOIN fb USING (k)
    ),
    act AS (
        SELECT count(*) AS actual_rows
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT 'orders_x_customer' AS join_name, est_rows, actual_rows
    FROM est, act
    """,
)
def diag_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality pre-flight: |A ⋈ B| = Σ_k f_A(k)·f_B(k).

    The planner-side estimator behind shuffle sizing, broadcast
    decisions and skew pre-flights (diag_key_skew's companion): build
    both key-frequency vectors (map-side-combinable counts — at 100 TB
    these are the sketchable part; CMS rows serve when exact vectors
    are too wide), join the VECTORS (|keys| rows, not |rows|), and sum
    the products. The actual join runs beside it so the output shows
    estimate == actual — exact on full frequency vectors by the
    identity, which is precisely why frequency sketches are the right
    compression of it.
    """
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    fa = o.groupBy("k").agg(F.count(F.lit(1)).alias("ca"))
    fb = c.groupBy("k").agg(F.count(F.lit(1)).alias("cb"))
    est = fa.join(fb, "k").agg(
        F.sum(F.col("ca") * F.col("cb")).alias("est_rows")
    )
    act = o.join(c, "k").agg(F.count(F.lit(1)).alias("actual_rows"))
    return est.crossJoin(act).select(
        F.lit("orders_x_customer").alias("join_name"),
        "est_rows",
        "actual_rows",
    )


@query(
    "events_anomaly_mad",
    oracle="""
    WITH v AS (
        SELECT event_type, event_id,
               CAST(floor(value * 100) AS BIGINT) AS v_cents
        FROM events
    ),
    med AS (
        SELECT event_type,
               CAST(quantile_disc(v_cents, 0.5) AS BIGINT) AS median_cents
        FROM v GROUP BY event_type
    ),
    dev AS (
        SELECT v.event_type, v.v_cents, m.median_cents,
               abs(v.v_cents - m.median_cents) AS d
        FROM v JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type,
               CAST(quantile_disc(d, 0.5) AS BIGINT) AS mad_cents
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           max(d.median_cents) AS median_cents,
           max(a.mad_cents) AS mad_cents,
           count(*) AS n,
           CAST(count(CASE WHEN d.d > 3 * a.mad_cents THEN 1 END) AS BIGINT)
               AS n_outliers
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY d.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: median absolute deviation (MAD).

    The IQR detector's (events_anomaly_iqr) heavier-tailed sibling —
    MAD has a 50% breakdown point, so even a half-poisoned series
    can't move the threshold. Spark has no exact grouped median
    builtin with discrete semantics, so the LOWER median comes from
    the row_number identity (rn == (n+1) div 2 in value order) — two
    window passes (value median, then deviation median) + a broadcast
    join of the group-sized medians back to the rows. The DuckDB
    oracle uses native quantile_disc at both levels: independent
    formulations, exact integers everywhere (abs of int, 3*MAD in
    int), no interpolation anywhere.
    """
    v = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
    )

    from .robust_stats import grouped_discrete_quantiles

    def lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
        # ceil(0.5*n) == (n+1) div 2 — the shared helper's rank formula
        # at q=0.5 (one definition for all discrete quantiles, review
        # finding: this identity previously lived in two drifting copies)
        return grouped_discrete_quantiles(
            df, "event_type", col, ["event_id"], {out: 0.5}
        )

    med = lower_median(v, "v_cents", "median_cents")
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "median_cents",
        F.abs(F.col("v_cents") - F.col("median_cents")).alias("d"),
    )
    mad = lower_median(dev, "d", "mad_cents")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("median_cents").alias("median_cents"),
            F.max("mad_cents").alias("mad_cents"),
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("d") > 3 * F.col("mad_cents"), 1)).alias(
                "n_outliers"
            ),
        )
    )


@query(
    "table_merkle_summary",
    oracle="""
    WITH rows_h AS (
        SELECT md5(
                   CAST(o_orderkey AS VARCHAR) || '|' ||
                   CAST(o_custkey AS VARCHAR) || '|' ||
                   o_orderstatus || '|' ||
                   CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR)
                   || '|' ||
                   CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || '|' ||
                   o_orderpriority
               ) AS row_hash
        FROM orders
    ),
    leaves AS (
        SELECT CAST(('0x' || substr(row_hash, 1, 8)) AS BIGINT) % 64 AS leaf,
               count(*) AS n_rows,
               md5(string_agg(row_hash, '' ORDER BY row_hash)) AS leaf_hash
        FROM rows_h
        GROUP BY 1
    )
    SELECT leaf, n_rows, leaf_hash,
           (SELECT md5(string_agg(leaf_hash, '' ORDER BY leaf)) FROM leaves)
               AS root_hash
    FROM leaves
    """,
)
def table_merkle_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle summary of a table: 64 leaf hashes + one root — the
    anti-entropy primitive behind cross-replica reconciliation.

    table_diff_audit's scale path: two 100 TB replicas compare by
    exchanging 64 leaf hashes (or just the root); only leaves that
    DIFFER descend to row-level diffing — O(changed buckets) transfer
    instead of a full-table FULL OUTER join. Construction is pure plan
    algebra: a canonical per-row serialization (integer cents, ISO
    dates — no float formatting) → md5 row hash → md5-bucketed leaves
    → leaf hash = md5 of the CONCATENATED SORTED row hashes (sorting
    makes the leaf hash partition-layout-independent) → root over the
    ordered leaf hashes. Deeper trees (64-ary per level) extend the
    same two aggregates per level. collect_list here is leaf-sized
    (n/64 rows); at 100 TB you add levels, never widen a leaf beyond
    memory.
    """
    o = load_table(spark, sf_dir, "orders")
    row_hash = F.md5(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.floor(F.col("o_totalprice") * 100).cast("long").cast("string"),
            F.col("o_orderdate").cast("date").cast("string"),
            F.col("o_orderpriority"),
        ).cast("binary")
    )
    rows_h = o.select(row_hash.alias("row_hash"))
    leaves = rows_h.groupBy(
        (
            F.conv(F.substring("row_hash", 1, 8), 16, 10).cast("long") % 64
        ).alias("leaf")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.md5(
            F.concat_ws("", F.sort_array(F.collect_list("row_hash"))).cast(
                "binary"
            )
        ).alias("leaf_hash"),
    )
    w_all = Window.orderBy("leaf").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return leaves.select(
        "leaf",
        "n_rows",
        "leaf_hash",
        F.md5(
            F.concat_ws("", F.collect_list("leaf_hash").over(w_all)).cast(
                "binary"
            )
        ).alias("root_hash"),
    )


# Broadcast decision threshold for the advisor (bytes, mirrors the
# spark.sql.autoBroadcastJoinThreshold default of 10 MB).
ADVISOR_BROADCAST_BYTES = 10 * 1024 * 1024
ADVISOR_ROW_BYTES = 32  # modeled bytes/row for the fixture's narrow keys


@query(
    "diag_join_strategy_advice",
    oracle=f"""
    WITH sides AS (
        SELECT 'customer' AS small_side, 'orders' AS big_side,
               (SELECT count(*) FROM customer) AS small_rows,
               (SELECT count(*) FROM orders) AS big_rows,
               (SELECT CAST(sum(ca * cb) AS BIGINT) FROM
                   (SELECT o_custkey AS k, count(*) AS ca
                    FROM orders GROUP BY 1) fa
                   JOIN
                   (SELECT c_custkey AS k, count(*) AS cb
                    FROM customer GROUP BY 1) fb
                   USING (k)) AS est_out_rows
        UNION ALL
        SELECT 'orders', 'lineitem',
               (SELECT count(*) FROM orders),
               (SELECT count(*) FROM lineitem),
               (SELECT CAST(sum(ca * cb) AS BIGINT) FROM
                   (SELECT l_orderkey AS k, count(*) AS ca
                    FROM lineitem GROUP BY 1) fa
                   JOIN
                   (SELECT o_orderkey AS k, count(*) AS cb
                    FROM orders GROUP BY 1) fb
                   USING (k)) AS est_out_rows
    )
    SELECT small_side, big_side, small_rows, big_rows, est_out_rows,
           CASE WHEN small_rows * {ADVISOR_ROW_BYTES}
                     <= {ADVISOR_BROADCAST_BYTES}
                THEN 'broadcast' ELSE 'shuffle' END AS advised_strategy
    FROM sides
    """,
)
def diag_join_strategy_advice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planner-advisor readout: for each candidate join, the measured
    inputs a CBO weighs (side sizes, estimated output cardinality from
    the frequency-vector identity) and the strategy the broadcast
    threshold implies.

    This is the pre-flight a pipeline author runs BEFORE submitting a
    100 TB join: the stats come from map-side-combinable counts (the
    sketchable part), the decision is pure arithmetic against the
    modeled row width and the 10 MB broadcast budget — the same
    decision AQE makes at runtime, surfaced ahead of time. The oracle
    recomputes every stat and the rule independently.
    """
    def est_out(small: DataFrame, big: DataFrame, sk: str, bk: str):
        fa = big.groupBy(F.col(bk).alias("k")).agg(F.count(F.lit(1)).alias("ca"))
        fb = small.groupBy(F.col(sk).alias("k")).agg(
            F.count(F.lit(1)).alias("cb")
        )
        return fa.join(fb, "k").agg(
            F.sum(F.col("ca") * F.col("cb")).alias("est")
        ).first()["est"]

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # one count job per TABLE, not per (pair, side) — orders is both a
    # big side and a small side and would otherwise count twice (review
    # finding)
    n_rows = {"customer": c.count(), "orders": o.count(), "lineitem": li.count()}
    rows = []
    for name_s, name_b, s_df, b_df, sk, bk in [
        ("customer", "orders", c, o, "c_custkey", "o_custkey"),
        ("orders", "lineitem", o, li, "o_orderkey", "l_orderkey"),
    ]:
        s_rows, b_rows = n_rows[name_s], n_rows[name_b]
        est = est_out(s_df, b_df, sk, bk)
        strategy = (
            "broadcast"
            if s_rows * ADVISOR_ROW_BYTES <= ADVISOR_BROADCAST_BYTES
            else "shuffle"
        )
        rows.append((name_s, name_b, s_rows, b_rows, est, strategy))
    return spark.createDataFrame(
        rows,
        "small_side string, big_side string, small_rows long, big_rows long,"
        " est_out_rows long, advised_strategy string",
    )


@query(
    "privacy_k_anonymity",
    # Data-governance gate for training exports: k-anonymity (every
    # quasi-identifier combination must describe >= k individuals) and
    # l-diversity (each combination must contain >= l distinct values of
    # the sensitive attribute) over customer, quasi-ids (nation, segment),
    # sensitive = account-balance sign band. One hash aggregate; the k/l
    # thresholds are integer comparisons — at 100 TB the audit costs one
    # combinable groupBy over the quasi-id key, same shape as any rollup.
    oracle="""
    WITH cells AS (
        SELECT c_nationkey, c_mktsegment,
               count(*) AS n_rows,
               count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                                   WHEN c_acctbal < 5000 THEN 'mid'
                                   ELSE 'high' END) AS n_sensitive
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    )
    SELECT count(*) AS n_cells,
           CAST(sum(CASE WHEN n_rows < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS cells_under_k5,
           CAST(sum(CASE WHEN n_rows < 5 THEN n_rows ELSE 0 END) AS BIGINT)
               AS rows_under_k5,
           CAST(sum(CASE WHEN n_sensitive < 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS cells_under_l2,
           CAST(min(n_rows) AS BIGINT) AS min_cell_rows
    FROM cells
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of a would-be training export:
    quasi-identifiers (c_nationkey, c_mktsegment), sensitive attribute =
    balance band. Reports the cells (quasi-id combinations) violating
    k=5 and l=2, the row count exposed by the k violations, and the
    smallest cell — the numbers a release gate thresholds on."""
    c = load_table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, F.lit("neg"))
        .when(F.col("c_acctbal") < 5000, F.lit("mid"))
        .otherwise(F.lit("high"))
    )
    cells = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(band).alias("n_sensitive"),
    )
    return cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.when(F.col("n_rows") < 5, 1).otherwise(0))
        .cast("long")
        .alias("cells_under_k5"),
        F.sum(F.when(F.col("n_rows") < 5, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_under_k5"),
        F.sum(F.when(F.col("n_sensitive") < 2, 1).otherwise(0))
        .cast("long")
        .alias("cells_under_l2"),
        F.min("n_rows").cast("long").alias("min_cell_rows"),
    )


# Benford ppm expectations for first digits 1..9: round(1e6 * log10(1+1/d)).
# Hardcoded identically in the Spark plan and the oracle SQL so the check is
# pure integer arithmetic — the nine constants sum to exactly 1,000,000.
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items())
    + " END"
)


@query(
    "dq_benford_digits",
    # First-significant-digit audit against Benford's law — the classic
    # fabricated-amounts / data-quality screen. Exact integer end to end:
    # digit from the cents string, observed share in floor-ppm, the nine
    # Benford expectations as shared literals, and the per-digit chi-square
    # contribution computed in ppm PROPORTION space so every intermediate
    # fits BIGINT at any scale factor.
    oracle=f"""
    WITH amounts AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders
    ),
    n_t AS (SELECT count(*) AS n FROM amounts),
    obs AS (SELECT digit, count(*) AS n_obs FROM amounts GROUP BY digit),
    spine AS (SELECT unnest(range(1, 10)) AS digit)
    SELECT s.digit,
           CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs,
           CAST(1000000 * coalesce(o.n_obs, 0) // n_t.n AS BIGINT) AS obs_ppm,
           CAST({_BENFORD_CASE.replace('digit', 's.digit')} AS BIGINT)
               AS benford_ppm,
           CAST(1000000 * coalesce(o.n_obs, 0) // n_t.n
                - {_BENFORD_CASE.replace('digit', 's.digit')} AS BIGINT)
               AS dev_ppm,
           CAST((1000000 * coalesce(o.n_obs, 0) // n_t.n
                 - {_BENFORD_CASE.replace('digit', 's.digit')})
                * (1000000 * coalesce(o.n_obs, 0) // n_t.n
                   - {_BENFORD_CASE.replace('digit', 's.digit')})
                // {_BENFORD_CASE.replace('digit', 's.digit')} AS BIGINT)
               AS chi2_ppm
    FROM spine s LEFT JOIN obs o ON s.digit = o.digit, n_t
    """,
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order amounts: per digit 1..9, the
    observed count, floor-ppm share, Benford expectation, deviation, and
    the chi-square contribution in ppm proportion space. A digit spine
    guarantees all nine rows even for digits the data never hits.

    Scale shape: one 9-key map-side-combinable count (the first-digit
    extraction is codegen'd string arithmetic on the scan), a broadcast
    of the single total row, and constant-space literals — the audit costs
    one scan regardless of table size."""
    amounts = load_table(spark, sf_dir, "orders").select(
        F.substring(
            F.floor(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    obs = amounts.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    n_t = amounts.agg(F.count(F.lit(1)).alias("n"))
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    joined = (
        spine.join(F.broadcast(obs), "digit", "left")
        .crossJoin(F.broadcast(n_t))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            F.expr("CAST(1000000 * coalesce(n_obs, 0) div n AS BIGINT)").alias(
                "obs_ppm"
            ),
            F.expr(f"CAST({_BENFORD_CASE} AS BIGINT)").alias("benford_ppm"),
        )
    )
    return joined.select(
        "digit",
        "n_obs",
        "obs_ppm",
        "benford_ppm",
        (F.col("obs_ppm") - F.col("benford_ppm")).alias("dev_ppm"),
        F.expr(
            "CAST((obs_ppm - benford_ppm) * (obs_ppm - benford_ppm) "
            "div benford_ppm AS BIGINT)"
        ).alias("chi2_ppm"),
    )


@query(
    "privacy_t_closeness",
    # t-closeness (Li/Li/Venkatasubramanian 2007): each quasi-identifier
    # cell's sensitive-attribute distribution must sit within EMD <= t of
    # the GLOBAL distribution. Over the m=3 ORDERED balance bands the EMD
    # is sum(|cum_cell - cum_global|)/(m-1) at the m-1 interior cut
    # points; the last cut always cancels (cum = 1 on both sides), so two
    # cross-multiplied integer terms |c_j*N - C_j*n| remain. Products are
    # DECIMAL(38,0) Spark-side / HUGEINT oracle-side per the r5
    # overflow-review rule (BIGINT wraps near rowcount^2 at large SF; and
    # DuckDB's // on DECIMAL rounds where HUGEINT // truncates — probed
    # here: 66667 vs the correct 66666); Spark DECIMAL div = HUGEINT //.
    oracle="""
    WITH base AS (
        SELECT c_nationkey, c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN 0
                    WHEN c_acctbal < 5000 THEN 1 ELSE 2 END AS band
        FROM customer
    ),
    cells AS (
        SELECT c_nationkey, c_mktsegment, count(*) AS n,
               sum(CASE WHEN band <= 0 THEN 1 ELSE 0 END) AS c0,
               sum(CASE WHEN band <= 1 THEN 1 ELSE 0 END) AS c1
        FROM base GROUP BY c_nationkey, c_mktsegment
    ),
    gtot AS (
        SELECT count(*) AS nn,
               sum(CASE WHEN band <= 0 THEN 1 ELSE 0 END) AS g0,
               sum(CASE WHEN band <= 1 THEN 1 ELSE 0 END) AS g1
        FROM base
    )
    SELECT c.c_nationkey, c.c_mktsegment, CAST(c.n AS BIGINT) AS n_rows,
           CAST(1000000::HUGEINT
                * (abs(CAST(c.c0 AS HUGEINT) * g.nn
                       - CAST(g.g0 AS HUGEINT) * c.n)
                   + abs(CAST(c.c1 AS HUGEINT) * g.nn
                         - CAST(g.g1 AS HUGEINT) * c.n))
                // (2::HUGEINT * c.n * g.nn) AS BIGINT) AS emd_ppm,
           CAST(CASE WHEN 1000000::HUGEINT
                * (abs(CAST(c.c0 AS HUGEINT) * g.nn
                       - CAST(g.g0 AS HUGEINT) * c.n)
                   + abs(CAST(c.c1 AS HUGEINT) * g.nn
                         - CAST(g.g1 AS HUGEINT) * c.n))
                // (2::HUGEINT * c.n * g.nn) > 200000
                THEN 1 ELSE 0 END AS INT) AS violates_t20
    FROM cells c, gtot g
    """,
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness release gate — the third rung of the privacy ladder
    (k-anonymity bounds cell SIZE, l-diversity bounds sensitive VARIETY,
    t-closeness bounds the sensitive DISTRIBUTION's drift from global, so
    a cell can't leak through skew alone). Sensitive attribute = the
    ordered neg/mid/high balance bands; distance = exact Earth Mover's
    Distance over the ordered bands via the cross-multiplied cumulative
    identity (the drift_tvd_events integer discipline applied to EMD).
    Emits per-cell EMD in ppm and the t=0.2 verdict.

    Scale: one combinable groupBy for the cells + a broadcast 1-row
    global — the audit costs the same as any rollup; no per-row work
    follows the aggregate."""
    base = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, F.lit(0))
        .when(F.col("c_acctbal") < 5000, F.lit(1))
        .otherwise(F.lit(2))
        .alias("band"),
    )
    cum = [
        F.sum(F.when(F.col("band") <= j, 1).otherwise(0)).alias(f"c{j}")
        for j in range(2)
    ]
    cells = base.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), *cum
    )
    glob = base.agg(
        F.count(F.lit(1)).alias("nn"),
        *[
            F.sum(F.when(F.col("band") <= j, 1).otherwise(0)).alias(f"g{j}")
            for j in range(2)
        ],
    )
    d38 = "decimal(38,0)"
    joined = cells.crossJoin(F.broadcast(glob))
    num = F.abs(
        F.col("c0").cast(d38) * F.col("nn") - F.col("g0").cast(d38) * F.col("n")
    ) + F.abs(
        F.col("c1").cast(d38) * F.col("nn") - F.col("g1").cast(d38) * F.col("n")
    )
    emd_ppm = F.expr(
        "CAST(1000000 AS DECIMAL(38,0)) * num div "
        "(CAST(2 AS DECIMAL(38,0)) * n * nn)"
    )
    return (
        joined.withColumn("num", num)
        .withColumn("emd_ppm", emd_ppm.cast("long"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("n").cast("long").alias("n_rows"),
            "emd_ppm",
            F.when(F.col("emd_ppm") > 200000, F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("violates_t20"),
        )
    )


_FD_CANDIDATES = (
    # (name, table, lhs, rhs) — one holding FD (the TPC-H customer name
    # string encodes its key), one violated dimension FD, one violated
    # fact FD.
    ("c_name->c_custkey", "customer", "c_name", "c_custkey"),
    ("c_nationkey->c_mktsegment", "customer", "c_nationkey", "c_mktsegment"),
    ("l_orderkey->l_returnflag", "lineitem", "l_orderkey", "l_returnflag"),
)


def _fd_branch_sql(name: str, table: str, lhs: str, rhs: str) -> str:
    return f"""
    SELECT '{name}' AS fd,
           CAST(count(*) AS BIGINT) AS n_lhs,
           CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_lhs,
           CAST(max(k) AS BIGINT) AS max_rhs_per_lhs
    FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS k
          FROM {table} GROUP BY {lhs})
    """


@query(
    "dq_functional_dependency",
    oracle=" UNION ALL ".join(_fd_branch_sql(*c) for c in _FD_CANDIDATES),
)
def dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: does X -> Y hold, and how badly is it
    violated when it doesn't — the schema-discovery half of profiling
    that dq_constraint_report's declared rules can't see.

    Three candidates are checked in one result: c_name -> c_custkey
    HOLDS by TPC-H construction (the name string encodes the key —
    n_violating_lhs = 0 is the assertion that survives any sf), while
    nation -> mktsegment and order -> returnflag are honest violations
    whose max_rhs_per_lhs quantifies the spread. A real
    deployment feeds candidate pairs from the catalog; the per-FD audit
    is the same one aggregate.

    Shape at 100 TB: per FD, one count-distinct aggregate keyed on the
    LHS (map-side combinable into (lhs, rhs) pairs first — Spark plans
    the distinct-aggregate expansion itself), then a three-number
    reduction. FD branches are independent — they parallelize as
    separate stages of one job, and a violated-early FD can be sampled
    first at scale before paying the full pass.
    """
    parts = []
    for name, table, lhs, rhs in _FD_CANDIDATES:
        per_lhs = (
            load_table(spark, sf_dir, table)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("k"))
        )
        parts.append(
            per_lhs.agg(
                F.lit(name).alias("fd"),
                F.count(F.lit(1)).cast("long").alias("n_lhs"),
                F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating_lhs"),
                F.max("k").cast("long").alias("max_rhs_per_lhs"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@query(
    "clean_impute_median",
    oracle="""
    WITH base AS (
        SELECT l_returnflag,
               CASE WHEN (l_orderkey + l_linenumber) % 13 = 0 THEN NULL
                    ELSE CAST(l_quantity AS BIGINT) END AS q
        FROM lineitem
    ),
    cnt AS (
        SELECT l_returnflag, q, count(*) AS c
        FROM base WHERE q IS NOT NULL GROUP BY l_returnflag, q
    ),
    med AS (
        SELECT l_returnflag, min(q) AS median_used
        FROM (
            SELECT l_returnflag, q,
                   sum(c) OVER (PARTITION BY l_returnflag ORDER BY q
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                   sum(c) OVER (PARTITION BY l_returnflag) AS tot
            FROM cnt
        )
        WHERE 2 * cum >= tot
        GROUP BY l_returnflag
    )
    SELECT b.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN b.q IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_imputed,
           m.median_used,
           CAST(sum(coalesce(b.q, m.median_used)) AS BIGINT)
               AS sum_quantity_after
    FROM base b JOIN med m USING (l_returnflag)
    GROUP BY b.l_returnflag, m.median_used
    """,
)
def clean_impute_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped median imputation with an audit trail — the data-cleaning
    primitive (fill missing measures with the group's median) that every
    feature pipeline runs before training.

    Missingness is synthesized deterministically ((l_orderkey +
    l_linenumber) % 13 — the derive-don't-write fixture rule), the
    imputation value is the EXACT lower median (smallest q with
    2*cum >= total over the per-distinct-value count table — computed
    explicitly in both engines rather than trusting builtin
    percentile-interpolation semantics to agree), and the output is the
    audit a reviewer wants: how many cells were imputed, with what, and
    the resulting column checksum.

    Shape at 100 TB: the median comes from the per-(group, distinct
    value) count table — domain-bounded, not row-bounded; the imputation
    itself is a broadcast join of the 3-row median dimension onto the
    facts with a coalesce — map-side, no second shuffle.
    """
    base = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.when(
            (F.col("l_orderkey") + F.col("l_linenumber")) % 13 == 0, None
        )
        .otherwise(F.col("l_quantity").cast("long"))
        .alias("q"),
    )
    base = base.localCheckpoint(eager=True)  # median build + impute pass
    cnt = (
        base.filter(F.col("q").isNotNull())
        .groupBy("l_returnflag", "q")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("l_returnflag")
    med = (
        cnt.withColumn("cum", F.sum("c").over(wcum))
        .withColumn("tot", F.sum("c").over(wtot))
        .filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(F.min("q").alias("median_used"))
    )
    return (
        base.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag", "median_used")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col("q").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_imputed"),
            F.sum(F.coalesce(F.col("q"), F.col("median_used")))
            .cast("long")
            .alias("sum_quantity_after"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            "n_imputed",
            "median_used",
            "sum_quantity_after",
        )
    )


_DP_SEED = chain_seed("dplap")
_DP_EPS_INV = 2.0  # b = sensitivity/epsilon = 1 / 0.5
# Laplace noise via inverse CDF of a hash-uniform: u01 = (uh + 0.5)/2^64 in
# (0,1); noise = -b * sign(u01 - 0.5) * ln(1 - 2|u01 - 0.5|). ONE shared
# expression; ln feeds an OUTPUT value only (rounded to 4 decimals, far
# above any libm ULP), never an ordering.
_DP_NOISE = (
    "(-{b}) * sign(u01 - 0.5) * ln(1 - 2 * abs(u01 - 0.5))"
).format(b=_DP_EPS_INV)


@query(
    "privacy_dp_laplace_counts",
    oracle=XXH64_MACROS
    + f"""
    WITH per AS (
        SELECT o_orderpriority, count(*) AS n_exact FROM orders
        GROUP BY o_orderpriority
    ),
    u AS (
        SELECT o_orderpriority, n_exact,
               ((xxh64_u(encode(o_orderpriority), {_DP_SEED}::UBIGINT)
                 % 4503599627370496)::DOUBLE + 0.5) / 4503599627370496 AS u01
        FROM per
    )
    SELECT o_orderpriority,
           CAST(n_exact AS BIGINT) AS n_exact,
           round({_DP_NOISE}, 4) AS noise,
           round(n_exact + {_DP_NOISE}, 4) AS noisy_count,
           0.5 AS epsilon
    FROM u
    """,
)
def privacy_dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private counts per order priority: exact count plus
    Laplace(Δ/ε) noise with Δ=1 (a count query's sensitivity), ε=0.5 —
    the Dwork et al. 2006 mechanism, completing the privacy-gate family
    (k-anonymity / l-diversity / t-closeness audit the DATA; DP perturbs
    the RELEASE). The "randomness" is the repo's determinism rule applied
    once more: u ~ U(0,1) comes from xxhash64 of the group key, so the
    released values are reproducible AND cross-engine hash-checkable —
    in production the seed would be drawn per release, and the noise
    column dropped (it is an honesty column here, as is n_exact: this
    query demonstrates the mechanism, not a privacy boundary).

    Scale shape: one combinable count aggregate over facts; the noise is
    per-OUTPUT-row scalar arithmetic (k rows). Nothing else moves.
    """
    per = load_table(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    # low 52 hash bits only: a 52-bit integer converts to double EXACTLY
    # in both engines (no double-rounding at the 2^63 boundary), so u01 is
    # bit-identical before the one exactly-rounded division
    u = per.withColumn(
        "u01",
        (
            F.expr(
                "CAST(xxhash64('dplap', o_orderpriority)"
                " & 4503599627370495 AS DOUBLE)"
            )
            + 0.5
        )
        / float(1 << 52),
    )
    return u.select(
        "o_orderpriority",
        F.col("n_exact").cast("long").alias("n_exact"),
        F.round(F.expr(_DP_NOISE), 4).alias("noise"),
        F.round(F.col("n_exact") + F.expr(_DP_NOISE), 4).alias("noisy_count"),
        F.lit(0.5).alias("epsilon"),
    )


# --- wave 43 (round 8) ---


@query(
    "dq_outlier_iqr_fences",
    # Quartiles as SINGLE order statistics at ceil(n/4) / ceil(3n/4)
    # (documented rule — no interpolation, so everything stays integer);
    # Tukey fences doubled (x2) so the 1.5*IQR arithmetic never leaves
    # BIGINT: low2 = 2*q1 - 3*(q3 - q1), high2 = 2*q3 + 3*(q3 - q1),
    # outlier iff 2x outside [low2, high2].
    oracle="""
    WITH vals AS (
        SELECT event_type AS t, CAST(floor(value * 1000) AS BIGINT) AS x
        FROM events
    ),
    cnt AS (SELECT t, x, count(*) AS c FROM vals GROUP BY t, x),
    cum AS (
        SELECT t, x,
               sum(c) OVER (PARTITION BY t ORDER BY x) AS cm,
               sum(c) OVER (PARTITION BY t) AS tot
        FROM cnt
    ),
    q AS (
        SELECT t,
               min(CASE WHEN cm >= (tot + 3) // 4 THEN x END) AS q1,
               min(CASE WHEN cm >= (3 * tot + 3) // 4 THEN x END) AS q3,
               max(tot) AS n
        FROM cum GROUP BY t
    )
    SELECT v.t AS event_type,
           CAST(max(q.n) AS BIGINT) AS n,
           CAST(max(q.q1) AS BIGINT) AS q1_milli,
           CAST(max(q.q3) AS BIGINT) AS q3_milli,
           CAST(sum(CASE WHEN 2 * v.x < 2 * q.q1 - 3 * (q.q3 - q.q1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(sum(CASE WHEN 2 * v.x > 2 * q.q3 + 3 * (q.q3 - q.q1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM vals v JOIN q ON q.t = v.t
    GROUP BY v.t
    """,
)
def dq_outlier_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR outlier fences per event type (Tukey 1977's box-plot
    rule) — the quartile-based companion to events_anomaly_mad: MAD
    flags by robust z-score around the median; IQR fences flag by
    distance beyond the quartiles, the rule every DQ dashboard draws.
    Quartiles are single exact order statistics at ceil(n/4) and
    ceil(3n/4) from the per-(type, value) count table (no
    interpolation), and the 1.5xIQR fences run DOUBLED so the whole
    decision stays in BIGINT — the count per side hash-matches, not just
    approximately agrees.

    Scale shape: the count table is one combinable aggregate; quartile
    extraction is a prefix window over the value-domain-bounded count
    table; the fence pass is the same aggregate shape again with a
    broadcast 5-row quartile join.
    """
    e = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"),
        F.floor(F.col("value") * 1000).cast("long").alias("x"),
    )
    cnt = e.groupBy("t", "x").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.partitionBy("t").orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy("t")
    cum = cnt.select(
        "t",
        "x",
        F.sum("c").over(w_cum).alias("cm"),
        F.sum("c").over(w_all).alias("tot"),
    )
    q = cum.groupBy("t").agg(
        F.min(
            F.when(F.col("cm") >= F.expr("(tot + 3) DIV 4"), F.col("x"))
        ).alias("q1"),
        F.min(
            F.when(F.col("cm") >= F.expr("(3 * tot + 3) DIV 4"), F.col("x"))
        ).alias("q3"),
        F.max("tot").alias("n"),
    )
    return (
        e.join(F.broadcast(q), "t")
        .groupBy("t")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("q1").cast("long").alias("q1_milli"),
            F.max("q3").cast("long").alias("q3_milli"),
            F.sum(
                (
                    2 * F.col("x")
                    < 2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1"))
                ).cast("int")
            )
            .cast("long")
            .alias("n_low"),
            F.sum(
                (
                    2 * F.col("x")
                    > 2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1"))
                ).cast("int")
            )
            .cast("long")
            .alias("n_high"),
        )
        .select(
            F.col("t").alias("event_type"),
            "n",
            "q1_milli",
            "q3_milli",
            "n_low",
            "n_high",
        )
    )


# --- wave 44 (round 8) ---

_DPX_SEED = chain_seed("dpexp")
# Gumbel-max exponential mechanism: score = eps*utility/(2*sensitivity)
# + Gumbel(0,1), with g = -ln(-ln(u01)) from the 52-bit hash uniform.
# eps = 0.5, sensitivity(count) = 1 -> utility coefficient 0.25.
_DPX_SCORE = "0.25 * CAST(n_exact AS DOUBLE) + (-ln(-ln(u01)))"


@query(
    "privacy_dp_exponential",
    oracle=XXH64_MACROS
    + f"""
    WITH per AS (
        SELECT o_orderpriority, count(*) AS n_exact FROM orders
        GROUP BY o_orderpriority
    ),
    u AS (
        SELECT o_orderpriority, n_exact,
               ((xxh64_u(encode(o_orderpriority), {_DPX_SEED}::UBIGINT)
                 % 4503599627370496)::DOUBLE + 0.5) / 4503599627370496 AS u01
        FROM per
    ),
    scored AS (
        SELECT o_orderpriority, n_exact,
               round({_DPX_SCORE}, 6) AS score
        FROM u
    )
    SELECT o_orderpriority,
           CAST(n_exact AS BIGINT) AS n_exact,
           score,
           CAST(CASE WHEN row_number() OVER (
                    ORDER BY score DESC, o_orderpriority) = 1
                THEN 1 ELSE 0 END AS INT) AS selected,
           0.5 AS epsilon
    FROM scored
    """,
)
def privacy_dp_exponential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private SELECTION via the exponential mechanism
    (McSherry & Talwar 2007), realized with the Gumbel-max trick: each
    candidate's score is eps*utility/(2*sensitivity) + Gumbel(0,1) noise,
    and the argmax is distributed exactly as the exponential mechanism
    prescribes — the standard way to release "which category is most
    common" without releasing the counts. Completes the DP pair:
    privacy_dp_laplace_counts perturbs NUMBERS, this perturbs a CHOICE.

    Determinism rule as in the Laplace release: u ~ U(0,1) from the low
    52 bits of xxhash64 of the candidate key (52-bit ints convert to
    double exactly), so the Gumbel draw, the scores, and the SELECTION
    itself are reproducible and cross-engine hash-checked. The argmax
    ranks on the ROUNDED score with a key tiebreak, so the decision
    column cannot flip on a ulp. n_exact rides as an honesty column (the
    query demonstrates the mechanism, not a privacy boundary).

    Scale shape: one combinable count aggregate; scoring and the argmax
    run on k candidate rows of metadata.
    """
    per = load_table(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    u = per.withColumn(
        "u01",
        (
            F.expr(
                "CAST(xxhash64('dpexp', o_orderpriority)"
                " & 4503599627370495 AS DOUBLE)"
            )
            + 0.5
        )
        / float(1 << 52),
    )
    scored = u.select(
        "o_orderpriority",
        F.col("n_exact").cast("long").alias("n_exact"),
        F.round(F.expr(_DPX_SCORE), 6).alias("score"),
    )
    return scored.select(
        "o_orderpriority",
        "n_exact",
        "score",
        (
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), "o_orderpriority")
            )
            == 1
        )
        .cast("int")
        .alias("selected"),
        F.lit(0.5).alias("epsilon"),
    )


# --- wave 46 (round 9) ---

_RR_SEED = chain_seed("rr")
# Warner 1965 randomized response with p = 3/4: each respondent answers
# truthfully iff their coin (2 hash bits) lands in 3 of 4 states. The
# unbiased estimator (share + p - 1) / (2p - 1) is ONE shared double
# expression over exact integers.
_RR_EST = (
    "(CAST(n_reported_yes AS DOUBLE) / CAST(n_users AS DOUBLE)"
    " + 0.75 - 1.0) / (2.0 * 0.75 - 1.0)"
)


@query(
    "privacy_randomized_response",
    oracle=XXH64_MACROS
    + f"""
    WITH truth AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS t
        FROM events GROUP BY user_id
    ),
    coined AS (
        SELECT t,
               CASE WHEN ((xxh64_long(user_id, {_RR_SEED}::UBIGINT) % 4)
                          + 4) % 4 < 3
                    THEN t ELSE 1 - t END AS r
        FROM truth
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(t) AS BIGINT) AS n_true_yes,
               CAST(sum(r) AS BIGINT) AS n_reported_yes
        FROM coined
    )
    SELECT n_users, n_true_yes, n_reported_yes,
           round({_RR_EST}, 6) AS est_share_yes,
           0.75 AS p_truth
    FROM m
    """,
)
def privacy_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner's randomized response (1965) — the local-DP primitive under
    federated telemetry: each user reports their sensitive bit ("ever
    purchased") truthfully with probability p = 3/4 and inverted
    otherwise, giving per-user plausible deniability (ε = ln(p/(1-p)) =
    ln 3 local DP); the collector recovers the population share with the
    unbiased estimator (observed + p − 1)/(2p − 1).

    The coin is the repo's determinism rule: 2 bits of xxhash64('rr',
    user_id), replayed bit-for-bit by the DuckDB macros, so the noisy
    RELEASE itself is hash-checked (n_true_yes is the honesty column a
    production release would drop, as in privacy_dp_laplace_counts).

    Scale shape: one per-user combinable max, one map-side coin flip, one
    global aggregate — a single shuffle on user_id that the per-user
    reduction already pays. Output is 1 row.
    """
    truth = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("t")
        )
    )
    coined = truth.select(
        "t",
        F.when(
            F.pmod(F.xxhash64(F.lit("rr"), F.col("user_id")), F.lit(4)) < 3,
            F.col("t"),
        )
        .otherwise(1 - F.col("t"))
        .alias("r"),
    )
    m = coined.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("t").cast("long").alias("n_true_yes"),
        F.sum("r").cast("long").alias("n_reported_yes"),
    )
    return m.selectExpr(
        "n_users",
        "n_true_yes",
        "n_reported_yes",
        f"round({_RR_EST}, 6) AS est_share_yes",
        "0.75 AS p_truth",
    )
