"""Registered queries exercising the reference-parity signs pipeline.

`signs_pipeline_inline` is oracle-checked: both engines start from the same
inline VALUES feature set, so the A2→A3→A5 dataflow (project, Multi-explode
with positional id suffixes, allow-list filter — /root/reference/task.ts:76-112)
is verified row-for-row against DuckDB's JSON/list machinery.

`signs_rest_pipeline` runs the full source→transform chain (A1→A2→A3→A5)
over the packaged page fixtures, and `signs_rest_stream_pipeline` runs the
same chain as a structured stream (one page per micro-batch). Both are
oracle-checked: DuckDB's JSON reader replays the page files directly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..sources.rest import file_fetcher, read_signs
from .signs import explode_multi, filter_geometry, signs_pipeline

_PAGES_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data", "signs_pages")

# Inline feature set: all six geometry types + a multi-member MultiPolygon
# (positional suffix check) + an empty-coordinates Multi (explodes to zero).
_INLINE_FEATURES = [
    ("p1", "Point", "[-105.1,39.7]"),
    ("l1", "LineString", "[[-105.1,39.7],[-105.2,39.8]]"),
    ("pg1", "Polygon", "[[[-105.5,39.5],[-105.25,39.5],[-105.5,39.25],[-105.5,39.5]]]"),
    ("mp1", "MultiPoint", "[[-104.9,38.8],[-104.8,38.9],[-104.7,39.1]]"),
    ("ml1", "MultiLineString", "[[[-105.1,39.7],[-105.2,39.8]],[[-106.5,40.5],[-106.25,40.25]]]"),
    (
        "mpg1",
        "MultiPolygon",
        "[[[[-105.5,39.5],[-105.25,39.5],[-105.5,39.25],[-105.5,39.5]]],"
        "[[[-104.5,38.5],[-104.25,38.5],[-104.5,38.25],[-104.5,38.5]]]]",
    ),
    ("me1", "MultiPoint", "[]"),
]

_INLINE_VALUES_SQL = ",\n               ".join(
    f"('{i}', '{t}', '{c}')" for i, t, c in _INLINE_FEATURES
)


@query(
    "signs_pipeline_inline",
    oracle=f"""
    WITH features(id, geom_type, coordinates) AS (
        VALUES {_INLINE_VALUES_SQL}
    ),
    multi AS (
        SELECT f.id || '-' || CAST(r.i AS VARCHAR)                  AS id,
               substr(f.geom_type, 6)                               AS geom_type,
               CAST(json_extract(f.coordinates, '$[' || r.i || ']') AS VARCHAR) AS coordinates
        FROM features f,
             LATERAL (
                 SELECT unnest(range(CAST(json_array_length(f.coordinates) AS BIGINT))) AS i
             ) r
        WHERE starts_with(f.geom_type, 'Multi')
    ),
    single AS (
        SELECT id, geom_type, coordinates FROM features
        WHERE NOT starts_with(geom_type, 'Multi')
    ),
    exploded AS (SELECT * FROM single UNION ALL SELECT * FROM multi)
    SELECT id, geom_type, coordinates FROM exploded
    WHERE geom_type IN ('Point', 'LineString', 'Polygon')
    """,
)
def signs_pipeline_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2→A3→A5 over an inline feature set, DuckDB-verified."""
    df = spark.createDataFrame(
        _INLINE_FEATURES, "id string, geom_type string, coordinates string"
    ).withColumn("properties", F.create_map(F.lit("id"), F.col("id")))
    out = signs_pipeline(df, ["Point", "LineString", "Polygon"])
    return out.select("id", "geom_type", "coordinates")


# DuckDB's JSON reader replays the same page fixtures the REST source
# paginates through (the 0→4→7→'None' chain covers every page file, so
# a glob over the directory sees the identical feature set), then
# replicates A2→A3→A5 in SQL. Coordinate strings match because both
# sides emit compact JSON (json.dumps(separators=(",",":")) vs DuckDB's
# minified json_extract). Shared by the batch and streaming REST queries —
# the stream drains the same chain, one page per micro-batch.
_REST_PIPELINE_ORACLE = f"""
    WITH pages AS (
        SELECT unnest(features) AS feat
        FROM read_json('{_PAGES_DIR}/*.json',
                       columns={{'features': 'JSON[]', 'next_offset': 'VARCHAR'}})
    ),
    features AS (
        SELECT coalesce(json_extract_string(feat, '$.properties.id'),
                        json_extract_string(feat, '$.id'))            AS id,
               json_extract_string(feat, '$.geometry.type')           AS geom_type,
               CAST(json_extract(feat, '$.geometry.coordinates') AS VARCHAR)
                                                                      AS coordinates
        FROM pages
    ),
    multi AS (
        SELECT f.id || '-' || CAST(r.i AS VARCHAR)                    AS id,
               substr(f.geom_type, 6)                                 AS geom_type,
               CAST(json_extract(f.coordinates, '$[' || r.i || ']') AS VARCHAR)
                                                                      AS coordinates
        FROM features f,
             LATERAL (
                 SELECT unnest(range(CAST(json_array_length(f.coordinates) AS BIGINT))) AS i
             ) r
        WHERE starts_with(f.geom_type, 'Multi')
    ),
    single AS (
        SELECT id, geom_type, coordinates FROM features
        WHERE NOT starts_with(geom_type, 'Multi')
    ),
    exploded AS (SELECT * FROM single UNION ALL SELECT * FROM multi)
    SELECT id, geom_type, coordinates FROM exploded
    WHERE geom_type IN ('Point', 'LineString', 'Polygon')
"""


@query("signs_rest_pipeline", oracle=_REST_PIPELINE_ORACLE)
def signs_rest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference dataflow A1→A2→A3→A5 over the packaged page fixtures."""
    df = read_signs(spark, file_fetcher(_PAGES_DIR))
    out = signs_pipeline(df, ["Point", "LineString", "Polygon"])
    return out.select("id", "geom_type", "coordinates")


@query("signs_rest_stream_pipeline", oracle=_REST_PIPELINE_ORACLE)
def signs_rest_stream_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 as a STREAM: `readStream.format("rest_signs")` pages through the
    chain with the page offset as checkpointed stream progress
    (sources/rest.py::RestSignsStreamReader), then the same A2→A3→A5
    transform runs per micro-batch. Falls back to the batch path if the
    Python DataSource API is unavailable."""
    from ..sources.rest import register_rest_source
    from ..streaming.queries import run_to_completion

    if not register_rest_source(spark):  # pragma: no cover - old Spark
        return signs_rest_pipeline(spark, sf_dir)
    stream = (
        spark.readStream.format("rest_signs")
        .option("transport", "file")
        .option("path", _PAGES_DIR)
        .load()
    )
    out = signs_pipeline(stream, ["Point", "LineString", "Polygon"]).select(
        "id", "geom_type", "coordinates"
    )
    return run_to_completion(
        out, "mem_signs_rest_stream", "append", available_now=False
    )


@query(
    "signs_explode_only",
    # Same inline CTE as signs_pipeline_inline without the final allow-list
    # filter: A3 in isolation, so Multi→member rows (MultiPoint s4 → 3
    # Points) and the empty-coordinates zero-row case are hash-checked too.
    oracle=f"""
    WITH features(id, geom_type, coordinates) AS (
        VALUES {_INLINE_VALUES_SQL}
    ),
    multi AS (
        SELECT f.id || '-' || CAST(r.i AS VARCHAR)                  AS id,
               substr(f.geom_type, 6)                               AS geom_type,
               CAST(json_extract(f.coordinates, '$[' || r.i || ']') AS VARCHAR) AS coordinates
        FROM features f,
             LATERAL (
                 SELECT unnest(range(CAST(json_array_length(f.coordinates) AS BIGINT))) AS i
             ) r
        WHERE starts_with(f.geom_type, 'Multi')
    ),
    single AS (
        SELECT id, geom_type, coordinates FROM features
        WHERE NOT starts_with(geom_type, 'Multi')
    )
    SELECT * FROM single UNION ALL SELECT * FROM multi
    """,
)
def signs_explode_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 explode in isolation (incl. pass-through of non-Multi rows)."""
    df = spark.createDataFrame(
        _INLINE_FEATURES, "id string, geom_type string, coordinates string"
    )
    return explode_multi(df)
