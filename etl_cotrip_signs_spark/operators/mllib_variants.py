"""MLlib-backed variants of the near-dup / ANN operators [EXT].

The engine's primary implementations (operators/dedup.py,
operators/similarity.py) are native DataFrame expressions — deterministic
hashing, no model fitting, fully oracle-testable. These MLlib variants
exist for API parity with the standard Spark ML pipeline shapes
(Tokenizer → HashingTF → MinHashLSH; BucketedRandomProjectionLSH kNN) and
are rows-only checked: LSH models are seeded but their hash families are
implementation-defined, so outputs are compared by recall in tests, not
equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..registry import query

try:  # pragma: no cover - import guard
    from pyspark.ml.feature import (
        BucketedRandomProjectionLSH,
        CountVectorizer,
        MinHashLSH,
        NGram,
        RegexTokenizer,
    )
    from pyspark.ml.functions import array_to_vector

    HAS_MLLIB = True
except ImportError:  # pragma: no cover
    HAS_MLLIB = False


@query("dedup_minhash_mllib")  # rows-only: LSH hash family is impl-defined
def dedup_minhash_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via the MLlib pipeline: RegexTokenizer → NGram(3) →
    CountVectorizer(binary) → MinHashLSH.approxSimilarityJoin.

    Shingled (3-gram) features, like the native operator — unigram
    token-sets are near-degenerate on a shared-vocabulary corpus (every
    doc resembles every doc → approxSimilarityJoin goes quadratic;
    measured 15 min at sf0.1 vs seconds with shingles).
    """
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").repartition(
        n_part, "doc_id"
    )
    toks = RegexTokenizer(
        inputCol="text", outputCol="toks", pattern=r"\s+"
    ).transform(d)
    grams = NGram(n=3, inputCol="toks", outputCol="grams").transform(toks)
    cv_model = CountVectorizer(
        inputCol="grams", outputCol="features", binary=True, minDF=1.0
    ).fit(grams)
    feats = cv_model.transform(grams).filter(
        # MinHashLSH requires at least one non-zero entry
        F.size("grams") > 0
    )
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(feats)
    pairs = mh.approxSimilarityJoin(feats, feats, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
    )


@query("knn_brp_lsh_mllib")  # rows-only: LSH hash family is impl-defined
def knn_brp_lsh_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via BucketedRandomProjectionLSH.approxSimilarityJoin on the
    embedding vectors (euclidean buckets as the coarse filter), re-ranked
    to top-5 per query by exact distance."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding")).alias("features")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=0.5, numHashTables=4, seed=42,
    ).fit(e)
    q = e.filter(F.col("vec_id") < 20)
    pairs = brp.approxSimilarityJoin(q, e, 2.0, distCol="dist")
    w = W.partitionBy("query_id").orderBy("dist", "neighbor_id")
    return (
        pairs.select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            F.round("dist", 5).alias("dist"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
    )
