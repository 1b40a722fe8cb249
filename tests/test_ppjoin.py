"""Pins the PPJoin prefix filter's two claims: the candidate set PRUNES
(strictly fewer candidate pairs than the full posting join) and stays
COMPLETE (every brute-force pair ≥ 0.8 survives — also enforced by the
oracle parity sweep; asserted here at the candidate level so a broken
prefix rule fails with a pointed message, not a hash diff)."""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from etl_cotrip_signs_spark.functions.shingles import with_shingles
from etl_cotrip_signs_spark.io import load_table
from etl_cotrip_signs_spark.operators.dedup import dedup_ppjoin_prefix

from .conftest import SF_ORACLE


def _postings(spark):
    d = with_shingles(
        load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    ).select("doc_id", "shingles")
    return d.select("doc_id", F.explode("shingles").alias("s"))


def _pairs(postings):
    a = postings.select(F.col("doc_id").alias("doc_a"), "s")
    b = postings.select(F.col("doc_id").alias("doc_b"), "s")
    return (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def test_prefix_candidates_prune_and_stay_complete(spark):
    sh = _postings(spark).localCheckpoint(eager=True)
    full_cand = _pairs(sh).count()

    nt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nt"))
    freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    w = W.partitionBy("doc_id").orderBy("df", "s")
    prefix = (
        sh.join(freq, "s")
        .withColumn("r", F.row_number().over(w))
        .join(nt, "doc_id")
        .filter(F.col("r") <= F.col("nt") - F.expr("(8 * nt + 9) div 10") + 1)
        .select("doc_id", "s")
    )
    prefix_cand = _pairs(prefix)
    n_prefix = prefix_cand.count()
    assert n_prefix < full_cand, (n_prefix, full_cand)

    # completeness: every verified >= 0.8 pair is among the prefix candidates
    result = dedup_ppjoin_prefix(spark, SF_ORACLE).select("doc_a", "doc_b")
    missing = result.join(prefix_cand, ["doc_a", "doc_b"], "left_anti").count()
    assert missing == 0


def test_oracle_rejects_empty_shingle_pairs():
    """Review-finding regression (r5): two sub-3-token docs both have
    EMPTY shingle sets; 5*0 >= 4*0 is true, but an empty-vs-empty pair is
    not a duplicate and the Spark side structurally drops shingle-less
    docs at the explode. The oracle's len(a.shingles) > 0 guard must keep
    the contract aligned even on corpora the fixture never produces."""
    import duckdb

    from etl_cotrip_signs_spark import registry

    registry.load_all()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'one two'), (2, 'three four'), "
        "(3, 'a b c d e f g'), (4, 'a b c d e f g')"
        ") AS t(doc_id, text)"
    )
    rows = con.sql(registry.ORACLES["dedup_ppjoin_prefix"]).fetchall()
    # only the real duplicate pair (3,4) — never the empty-empty (1,2)
    assert [(r[0], r[1]) for r in rows] == [(3, 4)], rows
