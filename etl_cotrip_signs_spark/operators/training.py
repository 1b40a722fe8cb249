"""Training-data pipeline operators [EXT]: splits, sampling, shuffling,
sequence packing over the `documents` table.

Everything here is *deterministic by construction* — hash-based rather than
RNG-state-based — because training pipelines need splits and shuffles that
are reproducible across runs, engines, and cluster sizes. md5 is the hash
wherever an oracle checks the result (DuckDB computes the identical
digest); xxhash64 where it's Spark-internal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..io import load_table
from ..registry import query


def _md5_bucket(col: F.Column, buckets: int = 100) -> F.Column:
    """Deterministic [0, buckets) assignment from a value's md5 digest.

    conv(hex, 16, 10) on the first 8 hex chars — stable across engines; the
    oracle mirrors it with DuckDB's from_hex-free arithmetic.
    """
    return (
        F.conv(F.substring(F.md5(col.cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


@query(
    "split_train_test",
    oracle="""
    SELECT split, count(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM (
        SELECT doc_id,
               CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80
                    THEN 'train'
                    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    GROUP BY split
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split keyed on md5(doc_id).

    Hash-based (not rand()): the same document lands in the same split on
    any run, any cluster size, any engine — a hard requirement for
    reproducible training data. Output is the per-split summary (the
    assignment itself is checked through min/max/count)."""
    d = load_table(spark, sf_dir, "documents")
    bucket = _md5_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "shuffle_deterministic",
    oracle="""
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
    ORDER BY shuffle_key, doc_id
    LIMIT 50
    """,
)
def shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle: order by a hash of the key.

    The training-data shuffle that survives reruns and re-partitioning —
    `ORDER BY md5(id)` is a reproducible permutation, unlike rand()-based
    orderings whose value depends on partition layout. (First 50 rows
    verified; at scale the sort is a range-partitioned total order.)"""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.md5(F.col("doc_id").cast("string").cast("binary")).alias("shuffle_key"),
        )
        .orderBy("shuffle_key", "doc_id")
        .limit(50)
    )


@query(
    "pack_sequences",
    oracle="""
    WITH sized AS (
        SELECT doc_id, lang,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, lang, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS tokens_before
        FROM sized
    )
    SELECT lang, CAST(floor(tokens_before / 512) AS BIGINT) AS bin_id,
           count(*)                        AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)   AS bin_tokens
    FROM cum
    GROUP BY lang, bin_id
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: group documents into ~512-token training bins.

    Contiguous packing by running token count (exclusive prefix sum /
    budget) — deterministic, one window pass per lang partition, no
    driver-side loop. The greedy-first-fit variant trades determinism for
    tighter packing; contiguous is the reproducible default."""
    d = load_table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = sized.withColumn(
        "tokens_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        cum.withColumn(
            "bin_id", F.floor(F.col("tokens_before") / 512).cast("long")
        )
        .groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
    )


@query(
    "cdc_merge_upsert",
    oracle="""
    WITH delta AS (
        SELECT c_custkey, c_name, c_nationkey,
               round(c_acctbal + 1000.0, 2) AS c_acctbal, 'UPGRADED' AS c_mktsegment
        FROM customer WHERE c_custkey % 100 = 0
    ),
    merged AS (
        SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM delta)
        UNION ALL
        SELECT * FROM delta
    )
    SELECT c_mktsegment, count(*) AS n,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_bal
    FROM merged GROUP BY c_mktsegment
    """,
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert without Delta: anti-join out matched rows, union the
    delta — the CDC pattern on plain parquet tables. At scale the anti-join
    shuffles on the merge key once; with bucketed base tables it is
    co-located. (Real deployments with Delta/Iceberg jars use MERGE INTO;
    the jars are absent here, so the engine ships the composition.)"""
    c = load_table(spark, sf_dir, "customer")
    delta = c.filter(F.col("c_custkey") % 100 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 1000.0, 2).alias("c_acctbal"),
        F.lit("UPGRADED").alias("c_mktsegment"),
    )
    base = c.select(
        "c_custkey", "c_name", "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"), "c_mktsegment",
    )
    merged = base.join(delta, "c_custkey", "left_anti").unionByName(delta)
    return merged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total_bal"),
    )


@query(
    "pipeline_training_corpus",
    oracle="""
    WITH quality AS (
        SELECT doc_id, text, lang,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents
        WHERE n_chars >= 100 AND len(string_split_regex(trim(text), '\\s+')) >= 20
    ),
    deduped AS (
        SELECT doc_id, lang, n_tokens
        FROM (
            SELECT doc_id, lang, n_tokens,
                   row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM quality
        ) WHERE rn = 1
    ),
    split AS (
        SELECT lang, n_tokens,
               CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90
                    THEN 'train' ELSE 'eval' END AS split
        FROM deduped
    )
    SELECT split, lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM split GROUP BY split, lang
    """,
)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus preparation: quality filter → exact dedup (keep
    first) → deterministic train/eval split → per-split token accounting.

    The composition every stage of this module exists for, as one lazy
    plan: Catalyst pipelines the filter into the scan, the dedup is one
    digest-shuffle, the split is stateless hashing — three logical stages,
    two shuffles total."""
    d = load_table(spark, sf_dir, "documents")
    quality = d.filter(F.col("n_chars") >= 100).withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    ).filter(F.col("n_tokens") >= 20)
    w = W.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    deduped = (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    split = F.when(_md5_bucket(F.col("doc_id")) < 90, "train").otherwise("eval")
    return (
        deduped.select(split.alias("split"), "lang", "n_tokens")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


@query(
    "sample_stratified",
    oracle="""
    SELECT lang,
           count(*) AS n_total,
           count(*) FILTER (
               lang != 'en'
               OR CAST(('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 100 < 25
           ) AS n_sampled
    FROM documents
    GROUP BY lang
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum downsampling: keep 25% of the dominant
    'en' class, 100% of the rest, selected by md5('smp:' || doc_id) bucket.

    Hash-based rather than sampleBy(seed): the same document survives on
    any run, any partitioning, any cluster size, and any engine — which is
    what makes 100 TB re-runs and incremental rebuilds reproducible (an
    RNG-sequence sample changes with partition layout). The 'smp:' salt
    decorrelates this selection from the split_train_test buckets."""
    d = load_table(spark, sf_dir, "documents")
    bucket = _md5_bucket(F.concat(F.lit("smp:"), F.col("doc_id").cast("string")))
    keep = (F.col("lang") != "en") | (bucket < 25)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(keep, 1)).alias("n_sampled"),
    )


@query(
    "cdc_scd2_history",
    oracle="""
    WITH versions AS (
        SELECT c_custkey, 0 AS version, round(c_acctbal, 2) AS acctbal
        FROM customer
        UNION ALL
        SELECT c_custkey, 1, round(c_acctbal + 100.0, 2)
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey, 2, round(c_acctbal + 300.0, 2)
        FROM customer WHERE c_custkey % 20 = 0
    )
    SELECT c_custkey, version, acctbal,
           lead(version) OVER (PARTITION BY c_custkey ORDER BY version) - 1
               AS valid_to_version,
           CASE WHEN lead(version) OVER (PARTITION BY c_custkey ORDER BY version)
                     IS NULL THEN 1 ELSE 0 END AS is_current
    FROM versions
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 dimension history: two change batches applied over the
    customer base, every version kept as a validity-interval row. The
    closing of intervals is ONE window (lead(version) per key) over the
    union of snapshots — no self-join, no per-key driver logic; at 100 TB
    the union shuffles once on the dimension key and both the lead() and
    is-current derivation reuse that partitioning."""
    c = load_table(spark, sf_dir, "customer")
    v0 = c.select(
        "c_custkey", F.lit(0).alias("version"), F.round("c_acctbal", 2).alias("acctbal")
    )
    v1 = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit(1).alias("version"),
        F.round(F.col("c_acctbal") + 100.0, 2).alias("acctbal"),
    )
    v2 = c.filter(F.col("c_custkey") % 20 == 0).select(
        "c_custkey",
        F.lit(2).alias("version"),
        F.round(F.col("c_acctbal") + 300.0, 2).alias("acctbal"),
    )
    versions = v0.unionByName(v1).unionByName(v2)
    w = W.partitionBy("c_custkey").orderBy("version")
    nxt = F.lead("version").over(w)
    return versions.select(
        "c_custkey",
        "version",
        "acctbal",
        (nxt - 1).alias("valid_to_version"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "contamination_check",
    oracle="""
    WITH assigned AS (
        SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS w,
               CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80
                    THEN 'train'
                    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    sh AS (
        SELECT doc_id, lang, split,
               list_distinct(list_transform(
                   range(1, greatest(len(w) - 3, 1)),
                   i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                            || w[i+3] || ' ' || w[i+4])
               )) AS hs
        FROM assigned
    ),
    train_sh AS (
        SELECT DISTINCT unnest(hs) AS h FROM sh WHERE split = 'train'
    ),
    test_sh AS (
        SELECT doc_id, lang, unnest(hs) AS h FROM sh WHERE split = 'test'
    ),
    contaminated AS (
        SELECT DISTINCT t.doc_id, t.lang
        FROM test_sh t JOIN train_sh s ON t.h = s.h
    )
    SELECT a.lang,
           count(*) AS n_test_docs,
           count(c.doc_id) AS n_contaminated,
           round(CAST(count(c.doc_id) AS DOUBLE) / count(*), 4) AS contamination_rate
    FROM (SELECT doc_id, lang FROM assigned WHERE split = 'test') a
    LEFT JOIN contaminated c ON a.doc_id = c.doc_id
    GROUP BY a.lang
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination scan: a test document sharing any 5-gram
    with any training document is flagged. The join key is md5(5-gram) —
    fixed-width, so the train side dedupes to a compact fingerprint set
    and the probe is a plain equi-join (semi) on the hash; nothing
    pairwise, nothing quadratic. Splits reuse the md5-bucket assignment of
    split_train_test, so the check composes with the real split."""
    from ..functions.shingles import shingles_from_tokens, tokens

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    bucket = _md5_bucket(F.col("doc_id"))
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    sh = (
        d.select("doc_id", "lang", split.alias("split"), tokens(F.col("text")).alias("__w"))
        .select(
            "doc_id",
            "lang",
            "split",
            F.array_distinct(
                F.transform(
                    shingles_from_tokens(F.col("__w"), k=5), lambda s: F.md5(s.cast("binary"))
                )
            ).alias("hs"),
        )
    )
    train_sh = (
        sh.filter(F.col("split") == "train")
        .select(F.explode("hs").alias("h"))
        .distinct()
    )
    test_sh = sh.filter(F.col("split") == "test").select(
        "doc_id", "lang", F.explode("hs").alias("h")
    )
    contaminated = (
        test_sh.join(train_sh, "h", "left_semi").select("doc_id").distinct()
    )
    test_docs = sh.filter(F.col("split") == "test").select("doc_id", "lang")
    flagged = test_docs.join(
        contaminated.withColumn("__hit", F.lit(1)), "doc_id", "left"
    )
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_test_docs"),
        F.count("__hit").alias("n_contaminated"),
        F.round(
            F.count("__hit").cast("double") / F.count(F.lit(1)), 4
        ).alias("contamination_rate"),
    )


@query(
    "pack_sequences_greedy",
    # r5 graduation from rows-only: the loop-carried open-bin state DOES
    # have a SQL form — a recursive CTE whose working row per lang carries
    # the bin-load VECTOR as a LIST column; each iteration consumes the
    # next doc (row_number order) and either tops up the first fitting bin
    # (list_transform) or appends a new one (list_append). First-fit index
    # = list_filter(range, j -> loads[j] + t <= budget)[1]. Fitting uses
    # the capped token count, the bin_tokens sum the ORIGINAL counts —
    # mirroring the applyInPandas loop exactly. Same non-associative-
    # recursion precedent as sessionize_capped_sessions' oracle.
    oracle=r"""
    WITH RECURSIVE d AS (
        SELECT lang, doc_id,
               len(string_split_regex(trim(text), '\s+'))::BIGINT AS t_orig,
               least(len(string_split_regex(trim(text), '\s+')), 512)::BIGINT
                   AS t_fit,
               row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rk
        FROM documents
    ),
    fit(lang, rk, loads, bin_id, t_orig) AS (
        SELECT lang, CAST(0 AS BIGINT), CAST([] AS BIGINT[]),
               CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        FROM (SELECT DISTINCT lang FROM d)
        UNION ALL
        SELECT f.lang, f.rk + 1,
               CASE WHEN list_filter(range(1, len(f.loads)+1),
                                     j -> f.loads[j::INT] + nd.t_fit <= 512)[1]
                         IS NULL
                    THEN list_append(f.loads, nd.t_fit)
                    ELSE list_transform(range(1, len(f.loads)+1), j ->
                         CASE WHEN j = list_filter(range(1, len(f.loads)+1),
                                      k -> f.loads[k::INT] + nd.t_fit <= 512)[1]
                              THEN f.loads[j::INT] + nd.t_fit
                              ELSE f.loads[j::INT] END) END,
               CASE WHEN list_filter(range(1, len(f.loads)+1),
                                     j -> f.loads[j::INT] + nd.t_fit <= 512)[1]
                         IS NULL
                    THEN len(f.loads)
                    ELSE list_filter(range(1, len(f.loads)+1),
                                     j -> f.loads[j::INT] + nd.t_fit <= 512)[1]
                         - 1 END,
               nd.t_orig
        FROM fit f JOIN d nd ON nd.lang = f.lang AND nd.rk = f.rk + 1
    )
    SELECT lang, bin_id, count(*) AS n_docs,
           CAST(sum(t_orig) AS BIGINT) AS bin_tokens
    FROM fit WHERE rk >= 1 GROUP BY lang, bin_id
    """,
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit bin packing via applyInPandas (grouped-map): per lang,
    documents in doc_id order drop into the FIRST bin with room — tighter
    than the contiguous prefix-sum packing (`pack_sequences`) because a
    large doc no longer strands the remainder of its bin.

    This is the one training-pipeline op with genuinely loop-carried
    per-group state (open-bin loads), i.e. the honest use case for the
    grouped-map API: the group arrives as one Arrow batch, numpy/python
    runs the sequential fit, Spark parallelizes across groups.
    Deterministic (fixed doc order, fixed budget); invariants pinned in
    tests/test_llm_ops.py."""
    import pandas as pd

    budget = 512

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        loads: list[int] = []
        bins: list[int] = []
        for t in pdf["n_tokens"]:
            t = min(int(t), budget)  # oversized docs own a full bin
            for i, ld in enumerate(loads):
                if ld + t <= budget:
                    loads[i] = ld + t
                    bins.append(i)
                    break
            else:
                loads.append(t)
                bins.append(len(loads) - 1)
        out = pdf.assign(bin_id=bins)
        return out.groupby("bin_id", as_index=False).agg(
            lang=("lang", "first"),
            n_docs=("doc_id", "size"),
            bin_tokens=("n_tokens", "sum"),
        )[["lang", "bin_id", "n_docs", "bin_tokens"]]

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )
    return d.groupBy("lang").applyInPandas(
        pack, "lang string, bin_id long, n_docs long, bin_tokens long"
    )


@query(
    "scd2_temporal_join",
    oracle="""
    WITH versions AS (
        SELECT c_custkey, 0 AS version, 1992 AS from_year FROM customer
        UNION ALL
        SELECT c_custkey, 1, 1997 FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey, 2, 1998 FROM customer WHERE c_custkey % 20 = 0
    ),
    intervals AS (
        SELECT c_custkey, version, from_year,
               coalesce(lead(from_year) OVER (
                   PARTITION BY c_custkey ORDER BY version
               ) - 1, 9999) AS to_year
        FROM versions
    )
    SELECT i.version,
           count(*) AS n_orders,
           round(CAST(sum(CAST(round(o.o_totalprice, 2) AS DECIMAL(18,2)))
                 AS DOUBLE), 2) AS total_price
    FROM orders o
    JOIN intervals i
      ON o.o_custkey = i.c_custkey
     AND EXTRACT(year FROM o.o_orderdate) BETWEEN i.from_year AND i.to_year
    GROUP BY i.version
    """,
)
def scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic warehouse temporal join: facts matched to the
    slowly-changing dimension version VALID AT EVENT TIME — each order
    joins the customer version whose [from_year, to_year] interval covers
    the order date (versions: base from 1992, %10 keys revised 1997,
    %20 keys revised 1998; intervals closed by one lead() window, the
    cdc_scd2_history shape with time validity).

    Scale shape: the join key is the EQUI dimension key (custkey) with
    the interval predicate as a post-join filter — never a range-only
    join; a customer has ≤3 versions, so the equi join fans out by a
    bounded constant before the filter keeps exactly one version per
    fact row. One fact-sized shuffle, dimension-history broadcast when
    small."""
    c = load_table(spark, sf_dir, "customer")
    versions = (
        c.select("c_custkey", F.lit(0).alias("version"), F.lit(1992).alias("from_year"))
        .unionByName(
            c.filter(F.col("c_custkey") % 10 == 0).select(
                "c_custkey", F.lit(1).alias("version"), F.lit(1997).alias("from_year")
            )
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 20 == 0).select(
                "c_custkey", F.lit(2).alias("version"), F.lit(1998).alias("from_year")
            )
        )
    )
    w = W.partitionBy("c_custkey").orderBy("version")
    intervals = versions.select(
        "c_custkey",
        "version",
        "from_year",
        F.coalesce(F.lead("from_year").over(w) - 1, F.lit(9999)).alias("to_year"),
    )
    o = load_table(spark, sf_dir, "orders")
    joined = o.join(intervals, o.o_custkey == intervals.c_custkey).filter(
        F.year("o_orderdate").between(F.col("from_year"), F.col("to_year"))
    )
    return joined.groupBy("version").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)")).cast(
                "double"
            ),
            2,
        ).alias("total_price"),
    )


@query(
    "pipeline_corpus_fate",
    # Per-document provenance for the corpus pipeline: WHICH rule decided
    # each document's fate — the lineage table a data-governance review
    # asks for when pipeline_training_corpus's aggregate says "62% kept".
    # Gates apply in pipeline order (length -> token count -> exact dup ->
    # split), so each doc reports its FIRST failing gate; the dedup rank
    # is computed only among quality survivors, exactly as the pipeline
    # dedups (a doc that fails quality never occupies a dup slot).
    oracle="""
    WITH base AS (
        SELECT doc_id, text, lang, n_chars,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents
    ),
    dup_rank AS (
        SELECT doc_id,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM base WHERE n_chars >= 100 AND n_tokens >= 20
    )
    SELECT b.doc_id, b.lang, CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CASE WHEN b.n_chars < 100 THEN 'drop_len'
                WHEN b.n_tokens < 20 THEN 'drop_tokens'
                WHEN d.rn > 1 THEN 'drop_dup'
                WHEN CAST(('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) % 100 < 90 THEN 'train'
                ELSE 'eval' END AS fate
    FROM base b LEFT JOIN dup_rank d USING (doc_id)
    """,
)
def pipeline_corpus_fate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-level lineage for the training-corpus pipeline: every
    document tagged with its fate — the first gate that dropped it
    (drop_len / drop_tokens / drop_dup) or its final split (train /
    eval). The per-doc twin of pipeline_training_corpus's aggregate:
    group this table by fate and the waterfall falls out; join it back
    to documents and any audit question ("why is doc 4711 missing?")
    answers itself.

    Scale shape: identical to the pipeline it audits — the gates are
    scan-side predicates, the dup rank is the same one digest-shuffle,
    the split is stateless hashing; one extra broadcast-sized LEFT JOIN
    carries the rank back onto the full document set."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        "lang",
        "n_chars",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias(
            "n_tokens"
        ),
    )
    w = W.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    dup_rank = (
        d.filter((F.col("n_chars") >= 100) & (F.col("n_tokens") >= 20))
        .select("doc_id", F.row_number().over(w).alias("rn"))
    )
    fate = (
        F.when(F.col("n_chars") < 100, "drop_len")
        .when(F.col("n_tokens") < 20, "drop_tokens")
        .when(F.col("rn") > 1, "drop_dup")
        .when(_md5_bucket(F.col("doc_id")) < 90, "train")
        .otherwise("eval")
    )
    return d.join(dup_rank, "doc_id", "left").select(
        "doc_id", "lang", "n_tokens", fate.alias("fate")
    )
