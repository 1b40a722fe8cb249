"""Arrow-native + polymorphic Python UDF surface [EXT — engine surface
breadth]:
``mapInArrow``, the fourth vectorized-Python flavor (after pandas_udf,
mapInPandas, applyInPandas — all exercised elsewhere), and
``applyInArrow`` (Spark 4's grouped-Arrow kernels), the fifth. mapInArrow
hands the raw Arrow RecordBatch to Python with NO pandas conversion — for
nested/list columns that matters: pandas materializes each list cell as
a Python object (one allocation per row), while the Arrow ListArray is
two flat buffers (values + offsets) that numpy can process zero-copy.
Plus the UDTF polymorphism ladder: fixed schema (signs_udtf_pipeline),
TABLE argument (udtf_table_arg_stats), and analyze()-derived dynamic
schema (udtf_analyze_dynamic_schema).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import query


@query(
    "arrow_vector_norms",
    oracle="""
    SELECT vec_id,
           CAST(list_sum(list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                    * CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
               AS BIGINT) AS ssq_e6,
           CAST(len(embedding) AS INT) AS n_dims
    FROM embeddings
    """,
)
def arrow_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector squared norm via mapInArrow — zero-copy list math.

    The batch's ``embedding`` ListArray is consumed as its two flat
    buffers: ``values`` (all floats of the batch, contiguous) and
    ``offsets`` (row boundaries). The whole computation is three numpy
    vector ops over the flat buffer plus one ``add.reduceat`` on the
    offsets — no per-row Python objects, no pandas boxing; exactly the
    access pattern a 100 TB embedding scan needs from Python when the
    JVM expression path can't express the kernel. (Here it could —
    ``F.aggregate`` over the array — and similarity.py does that
    elsewhere; this operator exists to pin the mapInArrow plumbing
    with an exact oracle.)

    Determinism: float32→float64 widening is exact, one double multiply,
    floor to int64, integer squares/sums — the DuckDB list_transform
    oracle runs the identical arithmetic.
    """
    import numpy as np
    import pyarrow as pa

    def norms(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            emb = batch.column(batch.schema.get_field_index("embedding"))
            vec_id = batch.column(batch.schema.get_field_index("vec_id"))
            # Fast path preconditions for raw-buffer math: a zero-offset,
            # null-free ListArray whose every row is non-empty. Sliced
            # batches (offsets not rebased vs flatten()'d values), null
            # entries (flatten drops their values, offsets keep them) and
            # empty lists (reduceat leaks the next segment) all corrupt
            # the segment arithmetic — route them to the boxed path
            # (review finding; the fixture always takes the fast path).
            offsets = emb.offsets.to_numpy(zero_copy_only=False)
            starts, ends = offsets[:-1], offsets[1:]
            fast = (
                emb.offset == 0
                and emb.null_count == 0
                and emb.values.null_count == 0
                and (ends > starts).all()
            )
            if fast:
                flat = emb.flatten().to_numpy(zero_copy_only=False)
                q = np.floor(flat.astype(np.float64) * 1000.0).astype(np.int64)
                sq = q * q
                ssq = (
                    np.add.reduceat(sq, starts)
                    if len(sq)
                    else np.array([], np.int64)
                )
                n_dims = (ends - starts).astype(np.int32)
            else:
                rows = emb.to_pylist()
                # Element-level nulls: values.null_count catches them above
                # (the list-level null_count does NOT — review finding:
                # floor(NaN).astype(int64) is silent garbage on the fast
                # path). Boxed semantics mirror DuckDB: list_sum skips
                # NULLs, len() counts them.
                ssq = np.array(
                    [
                        sum(
                            int(np.floor(float(x) * 1000.0)) ** 2
                            for x in (r or [])
                            if x is not None
                        )
                        for r in rows
                    ],
                    np.int64,
                )
                n_dims = np.array([len(r or []) for r in rows], np.int32)
            yield pa.RecordBatch.from_arrays(
                [vec_id, pa.array(ssq, pa.int64()), pa.array(n_dims, pa.int32())],
                ["vec_id", "ssq_e6", "n_dims"],
            )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.mapInArrow(norms, "vec_id long, ssq_e6 long, n_dims int")


@query(
    "udtf_table_arg_stats",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS sum_acctbal_cents
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def udtf_table_arg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF with a TABLE argument (Spark 4): the relation
    itself is the function input — `f(TABLE(...) PARTITION BY k)` — and
    the UDTF instance sees exactly one partition's rows between
    construction and terminate(), i.e. user-defined per-group
    processing addressed from SQL.

    The probe that shaped this: a TABLE-arg call WITHOUT an explicit
    `PARTITION BY` / `WITH SINGLE PARTITION` clause NPEs in the
    executor on this Spark build — the partitioning clause is
    effectively mandatory, documented here so the next caller doesn't
    rediscover it. Per-partition state is (count, exact cents sum);
    the oracle is the plain GROUP BY the UDTF re-implements — the hash
    match proves the partition-isolation contract (no state bleed
    across PARTITION BY groups).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="c_mktsegment string, n_customers bigint, sum_acctbal_cents bigint")
    class SegmentStats:
        def __init__(self):
            self.seg = None
            self.n = 0
            self.s = 0

        def eval(self, row):
            self.seg = row["c_mktsegment"]
            self.n += 1
            self.s += int(math.floor(row["c_acctbal"] * 100))

        def terminate(self):
            if self.seg is not None:
                yield self.seg, self.n, self.s

    spark.udtf.register("segment_stats_udtf", SegmentStats)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_for_udtf"
    )
    return spark.sql(
        """
        SELECT * FROM segment_stats_udtf(
            TABLE(SELECT c_mktsegment, c_acctbal FROM customer_for_udtf)
            PARTITION BY c_mktsegment
        )
        """
    )


@query(
    "arrow_grouped_norm_ppm",
    # applyInArrow — the FIFTH vectorized-Python flavor (Spark 4 adds
    # grouped Arrow kernels beside pandas_udf / mapInPandas /
    # applyInPandas / mapInArrow): each language's document lengths
    # min-max normalized to ppm, all integer arithmetic inside pyarrow
    # compute (truncating int64 division on non-negative operands ==
    # DuckDB's // == Spark's div). The oracle is the window formulation —
    # a DIFFERENT algorithm shape (two window passes vs one grouped
    # kernel), same hash.
    oracle="""
    SELECT lang, doc_id,
           CAST(CASE WHEN mx = mn THEN 0
                     ELSE 1000000 * (n_chars - mn) // (mx - mn)
                END AS BIGINT) AS norm_ppm
    FROM (
        SELECT lang, doc_id, n_chars,
               min(n_chars) OVER (PARTITION BY lang) AS mn,
               max(n_chars) OVER (PARTITION BY lang) AS mx
        FROM documents
    )
    """,
)
def arrow_grouped_norm_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language min-max normalization of document length in exact ppm
    via ``groupBy().applyInArrow`` — the grouped-Arrow surface exercised
    end to end. The kernel sees the whole group as ONE pa.Table (no
    pandas object materialization) and runs three pyarrow-compute vector
    ops; the degenerate one-length group maps to 0 by contract.

    Scale note: applyInArrow shuffles each group to one task like
    applyInPandas — right when groups are bounded (languages), wrong for
    unbounded keys; the window-formulated oracle shape is what the
    planner would pick there."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(table: "pa.Table") -> "pa.Table":
        n = table.column("n_chars")
        mn = pc.min(n).as_py()
        mx = pc.max(n).as_py()
        if mx == mn:
            norm = pa.array([0] * len(table), pa.int64())
        else:
            scaled = pc.multiply(
                pc.subtract(n, pa.scalar(mn, pa.int64())),
                pa.scalar(1_000_000, pa.int64()),
            )
            norm = pc.divide(scaled, pa.scalar(mx - mn, pa.int64()))
        return pa.table(
            {
                "lang": table.column("lang"),
                "doc_id": table.column("doc_id"),
                "norm_ppm": norm,
            }
        )

    d = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    return d.groupBy("lang").applyInArrow(
        kernel, schema="lang string, doc_id bigint, norm_ppm bigint"
    )


@query(
    "udtf_analyze_dynamic_schema",
    # UDTF with a static analyze() deciding the OUTPUT SCHEMA from a
    # literal argument at plan time (Spark 4 polymorphic UDTFs): a
    # mini CSV parser whose column names/types are an argument string.
    # The round trip nation -> csv line -> typed UDTF parse is verified
    # against the original parquet table.
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation
    """,
)
def udtf_analyze_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-polymorphic UDTF: ``analyze()`` receives the literal
    schema-string argument at PLAN time and returns the output StructType
    derived from it — one parser UDTF serves any column layout without
    code changes (the Spark 4 analyze contract; the fixed-schema and
    TABLE-argument UDTF forms are exercised by signs_udtf_pipeline and
    udtf_table_arg_stats). The non-literal line argument arrives in
    analyze() with value=None, which is exactly the split the contract
    specifies: schema from literals, data per row into eval()."""
    from pyspark.sql.functions import udtf

    # analyze() runs in a schema-inference worker with NO SparkContext, so
    # StructType.fromDDL (which round-trips through the JVM parser) is
    # unavailable there — the mini DDL grammar is parsed by hand.
    def _ddl_fields(ddl: str) -> list[tuple[str, str]]:
        return [
            (n.strip(), t.strip().lower())
            for n, t in (f.strip().split(None, 1) for f in ddl.split(","))
        ]

    @udtf
    class ParseDelim:
        @staticmethod
        def analyze(line, schema_str):
            from pyspark.sql.types import (
                IntegerType,
                LongType,
                StringType,
                StructType,
            )
            from pyspark.sql.udtf import AnalyzeResult

            types = {"int": IntegerType(), "bigint": LongType(),
                     "string": StringType()}
            st = StructType()
            for name, typ in _ddl_fields(schema_str.value):
                st = st.add(name, types[typ])
            return AnalyzeResult(schema=st)

        def eval(self, line, schema_str):
            # eval() receives the PLAIN literal value — the
            # AnalyzeArgument wrapper exists only at analyze() time.
            fields = _ddl_fields(schema_str)
            parts = line.split("\x1f")
            yield tuple(
                int(raw) if typ in ("int", "bigint") else raw
                for raw, (_n, typ) in zip(parts, fields)
            )

    spark.udtf.register("parse_delim", ParseDelim)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "nation_for_udtf"
    )
    return spark.sql(
        """
        SELECT p.n_nationkey, p.n_name, p.n_regionkey
        FROM (SELECT concat_ws('\x1f', n_nationkey, n_name, n_regionkey)
                  AS line
              FROM nation_for_udtf) src,
        LATERAL parse_delim(
            src.line,
            'n_nationkey int, n_name string, n_regionkey int') p
        """
    )


@query(
    "cogroup_asof_interp",
    # Oracle: the correlated greatest-lower-bound subquery — the
    # declarative definition of a backward as-of match (DuckDB plans it
    # as its native ASOF machinery). Micros bridge: Spark unix_micros ↔
    # DuckDB epoch_us (the events_interarrival_stats idiom).
    oracle="""
    WITH p AS (
        SELECT user_id, epoch_us(ts) AS tp
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, epoch_us(ts) AS tc
        FROM events WHERE event_type = 'click'
    ),
    m AS (
        SELECT p.user_id, p.tp,
               (SELECT max(c.tc) FROM c
                WHERE c.user_id = p.user_id AND c.tc <= p.tp) AS tc
        FROM p
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(tc) AS BIGINT) AS n_matched,
           CAST(coalesce(sum(tp - tc), 0) AS BIGINT) AS sum_gap_us,
           CAST(coalesce(max(tp - tc), 0) AS BIGINT) AS max_gap_us
    FROM m GROUP BY user_id
    """,
)
def cogroup_asof_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped as-of alignment: per user, match every purchase to the
    most recent click at-or-before it — THROUGH THE COGROUP SURFACE
    (``df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas``), the one
    vectorized-Python flavor the module ladder was missing (sixth after
    pandas_udf / mapInPandas / applyInPandas / mapInArrow / applyInArrow).

    Cogroup is Spark's primitive for ALIGNING two tables group-by-group
    in one shuffle each, handing the pair of per-key pandas frames to
    arbitrary kernel code — here ``pd.merge_asof`` (backward, exact
    matches allowed), the idiomatic pandas as-of. This is the escape
    hatch for per-key logic that needs BOTH sides materialized (state
    machine replays, per-entity model scoring against feature history,
    custom interpolation): the composition-based as-of joins
    (join_asof_latest_order and kin) stay the declarative fast path, and
    this pin proves the kernel path agrees with the declarative
    definition (the correlated max-subquery oracle).

    Shape at 100 TB: one shuffle per side on the group key, then kernels
    run per key with NO cross-key state; skewed users are the hazard (a
    whale user's two frames must fit one task) — the same boundedness
    argument applyInPandas always carries, stated here rather than
    hidden.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    # Cogroup key = a 16-way user bucket, NOT the raw user id: per-group
    # kernel invocation costs dominate when groups are tiny (measured
    # 7.3 s at sf0.1 keyed by user vs ~1 s bucketed), and merge_asof's
    # `by=` argument keeps per-user semantics inside each bucket kernel.
    # At 100 TB the bucket count scales with cores, bounding both the
    # kernel count and the largest frame a task must hold.
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.pmod(F.col("user_id"), F.lit(16)).alias("bucket"),
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.pmod(F.col("user_id"), F.lit(16)).alias("bucket"),
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )

    def asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        cols = [
            "user_id",
            "n_purchases",
            "n_matched",
            "sum_gap_us",
            "max_gap_us",
        ]
        if left.empty:
            return pd.DataFrame(columns=cols)
        lp = left.sort_values("t")
        rc = right.sort_values("t")
        # carry the click time as a VALUE column (merge_asof keeps only
        # the `on` key of the left side)
        rc2 = rc.rename(columns={"t": "tc"}).assign(t=rc.t)
        merged = pd.merge_asof(
            lp,
            rc2[["user_id", "t", "tc"]],
            on="t",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        # difference in nullable Int64, NOT NaN-promoted float64 (ADVICE
        # r6): a float sum of gap-µs is exact only below 2^53; a whale
        # user at scale would silently diverge from the oracle's exact
        # BIGINT sum(tp - tc)
        tc_int = merged.tc.astype("Int64")
        gaps = merged.t.astype("Int64") - tc_int
        merged = merged.assign(gap=gaps, matched=tc_int.notna())
        out = (
            merged.groupby("user_id", as_index=False)
            .agg(
                n_purchases=("t", "size"),
                n_matched=("matched", "sum"),
                sum_gap_us=("gap", lambda s: int(s.dropna().sum())),
                max_gap_us=("gap", lambda s: int(s.dropna().max()) if s.notna().any() else 0),
            )
        )
        out["n_matched"] = out.n_matched.astype("int64")
        return out[cols]

    return (
        p.groupBy("bucket")
        .cogroup(c.groupBy("bucket"))
        .applyInPandas(
            asof,
            "user_id long, n_purchases long, n_matched long,"
            " sum_gap_us long, max_gap_us long",
        )
    )
