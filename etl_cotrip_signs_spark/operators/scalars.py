"""Scalar-function surface: string / date / JSON / conditional / array families.

The reference's only scalar work is string startsWith + regexp-ish
'Multi'-stripping and id-suffix concat (``/root/reference/task.ts:86-97``);
this module exercises the full builtin families those generalize to.
All expressions are JVM-side builtins → whole-stage codegen, no Python.

Oracle-dialect discipline: patterns are kept to constructs with identical
semantics in Java regex (Spark) and RE2 (DuckDB) — plain character classes
and literals; DuckDB regexp_replace gets the 'g' flag because Spark's is
global by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.money import sum_fixed
from ..io import load_table
from ..registry import query


@query(
    "string_funcs_part",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                                   AS brand_u,
           substr(p_name, 1, 8)                             AS name_prefix,
           length(p_name)                                   AS name_len,
           regexp_extract(p_brand, '[0-9]+')                AS brand_num,
           len(string_split(p_type, ' '))                   AS type_words,
           CASE WHEN starts_with(p_type, 'STANDARD') THEN 1 ELSE 0 END AS is_standard,
           concat(p_brand, '/', p_type)                     AS brand_type,
           lpad(CAST(p_size AS VARCHAR), 4, '0')            AS size_padded,
           trim(lower(p_name))                              AS name_norm
    FROM part
    """,
)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, substring, length, regexp, split, concat, pad."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.size(F.split("p_type", " ")).cast("long").alias("type_words"),
        F.when(F.col("p_type").startswith("STANDARD"), 1).otherwise(0).alias(
            "is_standard"
        ),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.lower("p_name")).alias("name_norm"),
    )


@query(
    "date_funcs_orders",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE)  AS order_month,
           EXTRACT(year FROM o_orderdate)                  AS order_year,
           EXTRACT(quarter FROM o_orderdate)               AS order_quarter,
           count(*)                                        AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family: trunc-to-month rollup + year/quarter extraction."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("order_month"),
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sum_fixed(F.col("o_totalprice")).alias("sum_price"),
        )
    )


@query(
    "date_arithmetic_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_shipdate AS DATE)                             AS shipdate,
           CAST(l_shipdate + INTERVAL 30 DAY AS DATE)           AS due_date,
           date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS days_since_epoch_start,
           CAST(epoch(CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP)) AS BIGINT) AS ship_epoch
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey % 10 = 0
    """,
)
def date_arithmetic_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: interval add, datediff, epoch conversion."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 10 == 0)
    )
    start = F.lit("1995-01-01").cast("timestamp_ntz")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.to_date("l_shipdate").alias("shipdate"),
        F.to_date(F.col("l_shipdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.to_date("l_shipdate"), F.to_date(start))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.unix_timestamp(
            F.col("l_shipdate").cast("date").cast("timestamp")
        ).alias("ship_epoch"),
    )


@query(
    "json_events_extract",
    oracle="""
    SELECT event_type,
           count(*)                                               AS n_events,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_events_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction (`events.props`) + aggregate by type."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "json_schema_roundtrip",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_object('id', event_id, 'type', event_type)::VARCHAR AS as_json
    FROM events
    WHERE event_id % 25 = 0
    """,
)
def json_schema_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json (typed parse) + to_json (re-serialize) round-trip."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 25 == 0)
    parsed = F.from_json("props", "k bigint")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k"),
        F.to_json(F.struct(F.col("event_id").alias("id"),
                           F.col("event_type").alias("type"))).alias("as_json"),
    )


@query(
    "date_tz_convert",
    # DuckDB's bundled ICU extension speaks the same IANA tz database as the
    # JVM: naive-UTC → AT TIME ZONE 'UTC' → AT TIME ZONE 'America/Denver'
    # is exactly from_utc_timestamp. floor(epoch(ts)) matches Spark's
    # truncating unix_timestamp on fractional-second timestamps (a bare
    # CAST would round-to-nearest and drift by 1s).
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S')                        AS utc_str,
           strftime((ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/Denver',
                    '%Y-%m-%d %H:%M:%S')                            AS denver_str,
           CAST(floor(epoch(ts)) AS BIGINT)                         AS roundtrip_epoch,
           dayname(ts)                                              AS weekday
    FROM events WHERE event_id % 100 = 0
    """,
)
def date_tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion surface: from_utc_timestamp / to_utc_timestamp /
    date_format — the moment-timezone-class work the reference ships a
    library for (package.json:27) but never calls; here it is first-class.
    Oracle-checked via DuckDB's ICU AT TIME ZONE (same IANA tz rules)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 100 == 0)
    ts = F.col("ts").cast("timestamp")
    return e.select(
        "event_id",
        F.date_format(ts, "yyyy-MM-dd HH:mm:ss").alias("utc_str"),
        F.date_format(
            F.from_utc_timestamp(ts, "America/Denver"), "yyyy-MM-dd HH:mm:ss"
        ).alias("denver_str"),
        F.unix_timestamp(F.to_utc_timestamp(F.from_utc_timestamp(ts, "America/Denver"),
                                            "America/Denver")).alias("roundtrip_epoch"),
        F.date_format(ts, "EEEE").alias("weekday"),
    )


@query(
    "case_bucket_orders",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END             AS price_bucket,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           count(*)                          AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def case_bucket_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE WHEN chains, nullif, coalesce."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
    )
    return o.groupBy(
        bucket.alias("price_bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
    ).agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "array_funcs_embeddings",
    oracle="""
    SELECT vec_id,
           len(embedding)                                        AS dim,
           round(CAST(embedding[1] AS DOUBLE), 5)                AS first_val,
           round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 5) AS sq_norm,
           round(list_max(CAST(embedding AS DOUBLE[])), 5)       AS max_val,
           len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS n_positive
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size, element_at, transform+aggregate, array_max, filter.

    `aggregate` accumulates left-to-right in both engines → bit-stable sums.
    """
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 5).alias("first_val"),
        F.round(
            F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x * x), 5
        ).alias("sq_norm"),
        F.round(F.array_max(emb_d), 5).alias("max_val"),
        F.size(F.filter(emb_d, lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@query(
    "math_funcs_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 4)            AS disc_dev,
           round(sqrt(l_extendedprice), 4)             AS price_sqrt,
           round(pow(1 + l_tax, 2), 6)                 AS tax_sq,
           round(ln(l_extendedprice + 1), 6)           AS price_ln,
           CAST(floor(l_quantity / 10) AS BIGINT)      AS qty_decile,
           CAST(floor(l_extendedprice) AS BIGINT) % 7  AS price_mod
    FROM lineitem
    WHERE l_orderkey % 20 = 0
    """,
)
def math_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/sqrt/pow/ln/floor/mod on fact columns."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_decile"),
        (F.floor("l_extendedprice").cast("long") % 7).alias("price_mod"),
    )


@query(
    "map_funcs_events",
    oracle="""
    SELECT event_type,
           count(*)  AS n,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    GROUP BY event_type
    """,
)
def map_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: JSON → MapType, map_keys/values access, filter on value.

    The map manipulation happens Spark-side (create_map / element_at); the
    oracle checks the observable result.
    """
    e = load_table(spark, sf_dir, "events")
    as_map = F.from_json("props", "map<string,bigint>")
    with_map = e.withColumn("props_map", as_map).withColumn(
        "k", F.element_at(F.col("props_map"), F.lit("k"))
    )
    return (
        with_map.filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.min("k").alias("min_k"))
    )


@query(
    "scalars_try_arithmetic",
    # Spark 4 runs ANSI mode ON by default: bare division by zero or a
    # LONG overflow now RAISES instead of returning NULL/wrapping. The
    # try_* family is the sanctioned per-expression escape hatch — errors
    # become NULL without disabling ANSI globally. DuckDB raises on /0 and
    # overflow too, so the oracle builds the same NULL semantics from
    # guards (NULLIF, magnitude check), proving the try_* results equal
    # the guarded definitions.
    oracle="""
    SELECT l_linenumber,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN CAST(floor(l_extendedprice * 100) AS BIGINT)
                              / NULLIF(l_quantity - 25, 0) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
           CAST(sum(CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)
                         // NULLIF(CAST(l_quantity - 25 AS BIGINT), 0)
                    IS NULL AS INT)) AS BIGINT) AS n_div_null_int,
           CAST(sum(CASE WHEN abs(CAST(l_partkey AS BIGINT))
                              > 3037000499 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mul_null
    FROM lineitem
    GROUP BY l_linenumber
    """,
)
def scalars_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe arithmetic: Spark 4 defaults to
    spark.sql.ansi.enabled=true, so x/0 raises DIVIDE_BY_ZERO and a LONG
    multiply overflow raises ARITHMETIC_OVERFLOW mid-query — fatal for a
    100 TB job 3 hours in. try_divide / try_multiply turn exactly those
    rows into NULL. This query counts the NULLs try_* produces per
    lineitem group (a denominator that hits zero at l_quantity = 25, and
    a squared partkey that would overflow iff |partkey| > floor(sqrt(2^63
    - 1)) = 3037000499 — never on this fixture, pinning the count at 0);
    the oracle reproduces the same counts from guarded expressions, so a
    semantic drift in either engine's error paths flips the hash."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_linenumber",
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        (F.col("l_quantity") - 25).alias("den"),
        F.col("l_partkey").cast("long").alias("pk"),
    )
    return li.groupBy("l_linenumber").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.expr("try_divide(cents, den)").isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_div_null"),
        F.sum(
            F.expr("CAST(try_divide(cents, CAST(den AS BIGINT)) IS NULL AS INT)")
        )
        .cast("long")
        .alias("n_div_null_int"),
        # pk*pk overflows LONG iff |pk| > floor(sqrt(2^63 - 1)) — the
        # oracle counts that same inequality, so the two sides agree at
        # ANY scale factor (a pk^3 variant would diverge once partkeys
        # pass 2_097_151).
        F.sum(
            F.when(F.expr("try_multiply(pk, pk)").isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_mul_null"),
    )
