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
