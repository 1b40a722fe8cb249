"""Property-based tests (hypothesis) — SURVEY.md §5.4.

Each example builds one small DataFrame, so examples are capped to keep
Spark-job overhead sane.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from etl_cotrip_signs_spark.operators.signs import explode_multi, filter_geometry

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

coord = st.tuples(
    st.floats(-180, 180, allow_nan=False), st.floats(-90, 90, allow_nan=False)
)
single_geom = st.sampled_from(["Point", "LineString", "Polygon"])
multi_geom = st.sampled_from(["MultiPoint", "MultiLineString", "MultiPolygon"])


@st.composite
def features(draw):
    rows = []
    n = draw(st.integers(1, 6))
    for i in range(n):
        if draw(st.booleans()):
            gt = draw(single_geom)
            coords = json.dumps(list(draw(coord)))
            members = None
        else:
            gt = draw(multi_geom)
            k = draw(st.integers(0, 4))
            members = [list(draw(coord)) for _ in range(k)]
            coords = json.dumps(members)
        rows.append((f"f{i}", gt, coords, len(members) if members is not None else None))
    return rows


@given(features())
@settings(**SETTINGS)
def test_explode_count_equals_member_sum(spark, rows):
    df = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in rows],
        "id string, geom_type string, coordinates string",
    )
    out_count = explode_multi(df).count()
    expected = sum(1 if r[3] is None else r[3] for r in rows)
    assert out_count == expected


@given(features(), st.sets(single_geom))
@settings(**SETTINGS)
def test_filter_output_is_subset(spark, rows, allowed):
    df = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in rows],
        "id string, geom_type string, coordinates string",
    )
    out = filter_geometry(df, sorted(allowed)).collect()
    assert all(r["geom_type"] in allowed for r in out)
    assert len(out) <= len(rows)


@given(st.lists(st.text(alphabet="ab ", min_size=1, max_size=30), min_size=1, max_size=12))
@settings(**SETTINGS)
def test_exact_dedup_idempotent(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def dedup(d):
        from pyspark.sql import Window as W

        w = W.partitionBy("text").orderBy("doc_id")
        return (
            d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    once = dedup(df)
    twice = dedup(once)
    assert sorted(once.collect()) == sorted(twice.collect())
    assert once.select("text").distinct().count() == once.count()


@given(
    weights=st.lists(
        st.floats(min_value=0.0, max_value=4.0, allow_nan=False), min_size=1, max_size=6
    ),
    n_docs=st.integers(min_value=1, max_value=40),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_upsample_conservation_property(spark, weights, n_docs):
    """Fractional upsampling conservation: emitted rows == sum of per-doc
    n_copies, every n_copies ∈ {floor(w), ceil(w)}, and the expansion is
    deterministic — for any weight assignment."""
    from pyspark.sql import functions as F

    from etl_cotrip_signs_spark.operators.pipeline_ops import (
        upsample_copies_array,
        upsample_n_copies_expr,
    )

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id"), len(weights))).cast("int").alias("wi"),
    )
    w = F.lit(None).cast("double")
    for i, wv in enumerate(weights):
        w = F.when(F.col("wi") == i, F.lit(wv)).otherwise(w)
    # the PRODUCTION expressions, not an inline copy — a regression in the
    # operator's threshold/sequence logic must fail this property
    base = docs.select(
        "doc_id", upsample_n_copies_expr(w, F.col("doc_id")).alias("n_copies")
    )
    expanded = base.withColumn(
        "ci", F.explode(upsample_copies_array(F.col("n_copies")))
    )
    total_copies = base.agg(F.sum("n_copies")).first()[0]
    assert expanded.count() == total_copies
    rows = base.collect()
    import math
    for r in rows:
        wv = weights[r["doc_id"] % len(weights)]
        assert r["n_copies"] in (math.floor(wv), math.ceil(wv))


@given(budget=st.integers(min_value=1, max_value=5000))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_token_budget_never_exceeded_property(spark, budget):
    """select_token_budget invariant: for any budget, the selected prefix's
    cumulative tokens per lang never exceeds the budget, and selection is a
    prefix of the quality ordering (no doc skipped then a worse one taken)."""
    from pyspark.sql import Window as W, functions as F

    d = spark.range(60).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id"), 3)).cast("string").alias("lang"),
        (F.pmod(F.col("id") * 37 + 11, 97) + 1).alias("n_tokens"),
        (F.pmod(F.col("id") * 53 + 7, 199)).alias("quality"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy(F.col("quality").desc(), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = d.withColumn("cum", F.sum("n_tokens").over(w))
    sel = ranked.filter(F.col("cum") <= budget)
    assert sel.filter(F.col("cum") > budget).count() == 0
    # prefix property: within a lang, every selected row's predecessors in
    # the quality order are also selected
    w2 = W.partitionBy("lang").orderBy(F.col("quality").desc(), "doc_id")
    flagged = ranked.withColumn("sel", (F.col("cum") <= budget).cast("int")) \
        .withColumn("prev_sel", F.lag("sel", 1, 1).over(w2))
    assert flagged.filter((F.col("sel") == 1) & (F.col("prev_sel") == 0)).count() == 0
