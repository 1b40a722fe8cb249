"""Tests: capabilities schema (A7), salted aggregation, UDTF REST variant."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from etl_cotrip_signs_spark.functions.skew import salted_agg
from etl_cotrip_signs_spark.io import load_table
from etl_cotrip_signs_spark.sources.geojson import capabilities_schema
from etl_cotrip_signs_spark.sources.rest import fetch_all_features, file_fetcher, read_signs_udtf

from .conftest import SF_SMALL
from .test_sources_sinks import PAGES_DIR


def test_capabilities_schema_incoming_declares_16_props():
    # /root/reference/task.ts:26-43 declares 16 properties, 14 string + 2 number
    schema = capabilities_schema("incoming")
    assert len(schema.fields) == 16
    strings = [f.name for f in schema.fields if isinstance(f.dataType, T.StringType)]
    numbers = [f.name for f in schema.fields if isinstance(f.dataType, T.DoubleType)]
    assert len(strings) == 14 and sorted(numbers) == ["marker", "speed"]
    assert "messageText" in strings and "nativeId" in strings


def test_capabilities_schema_outgoing_empty():
    # task.ts:45-47: outgoing schema is an empty object
    assert capabilities_schema("outgoing").fields == []


def test_salted_agg_matches_plain_groupby(spark):
    o = load_table(spark, SF_SMALL, "orders")
    plain = {
        (r["o_orderpriority"],): (r["n"], round(r["s"], 2))
        for r in o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s"))
        .collect()
    }
    salted = {
        (r["o_orderpriority"],): (r["n"], round(r["s"], 2))
        for r in salted_agg(
            o,
            ["o_orderpriority"],
            {"n": ("count", "o_orderkey"), "s": ("sum", "o_totalprice")},
        ).collect()
    }
    assert plain == salted


def test_udtf_rest_matches_serial(spark):
    df = read_signs_udtf(spark, PAGES_DIR, [None, "4", "7"])
    serial_ids = sorted(f["id"] for f in fetch_all_features(file_fetcher(PAGES_DIR)))
    assert sorted(r["id"] for r in df.collect()) == serial_ids


def test_file_manifest_covers_table_exactly(spark):
    """Every physical file appears once; counts sum to the table count and
    per-partition min/max equal the table-level aggregate (the invariant a
    planner relies on when skipping files by [min,max])."""
    from etl_cotrip_signs_spark import registry
    from etl_cotrip_signs_spark.io import load_table
    from .conftest import SF_SMALL

    registry.load_all()
    m = registry.QUERIES["file_manifest_stats"](spark, SF_SMALL).toPandas()
    li = load_table(spark, SF_SMALL, "lineitem").toPandas()
    assert m["n_rows"].sum() == len(li)
    assert m["file_name"].is_unique
    for flag, grp in m.groupby("l_returnflag"):
        part = li[li["l_returnflag"] == flag]
        assert grp["min_shipdate"].min() == part["l_shipdate"].min()
        assert grp["max_shipdate"].max() == part["l_shipdate"].max()
        assert grp["n_rows"].sum() == len(part)
