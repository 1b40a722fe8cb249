"""WKT conversion + bounding box over the canonical geometry encoding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cotrip_signs_spark.functions.geo import bounding_box, with_wkt

from .conftest import SF_SMALL


def features(spark):
    rows = [
        ("p", "Point", "[-105.5,39.25]"),
        ("l", "LineString", "[[0.0,0.0],[1.5,2.5]]"),
        ("pg", "Polygon", "[[[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,0.0]]]"),
        ("mp", "MultiPoint", "[[1.0,2.0],[3.0,4.0]]"),
        ("ml", "MultiLineString", "[[[0.0,0.0],[1.0,1.0]],[[2.0,2.0],[3.0,3.0]]]"),
        (
            "mpg",
            "MultiPolygon",
            "[[[[0.0,0.0],[1.0,0.0],[0.0,1.0],[0.0,0.0]]],[[[5.0,5.0],[6.0,5.0],[5.0,6.0],[5.0,5.0]]]]",
        ),
    ]
    return spark.createDataFrame(rows, "id string, geom_type string, coordinates string")


def test_wkt_all_geometry_types(spark):
    out = {r["id"]: r["wkt"] for r in with_wkt(features(spark)).collect()}
    assert out["p"] == "POINT (-105.5 39.25)"
    assert out["l"] == "LINESTRING (0.0 0.0, 1.5 2.5)"
    assert out["pg"] == "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 0.0))"
    assert out["mp"] == "MULTIPOINT (1.0 2.0, 3.0 4.0)"
    assert out["ml"] == "MULTILINESTRING ((0.0 0.0, 1.0 1.0), (2.0 2.0, 3.0 3.0))"
    assert (
        out["mpg"]
        == "MULTIPOLYGON (((0.0 0.0, 1.0 0.0, 0.0 1.0, 0.0 0.0)), ((5.0 5.0, 6.0 5.0, 5.0 6.0, 5.0 5.0)))"
    )


def test_bounding_box_scientific_notation(spark):
    # json.dumps(1e-05) emits '1e-05'; the extractor must keep it one token
    # or the even/odd x/y pairing silently corrupts.
    df = spark.createDataFrame(
        [("s", "Point", "[1e-05,-2.5E+2]"), ("t", "LineString", "[[1e2,3],[2,4]]")],
        "id string, geom_type string, coordinates string",
    ).withColumn("bbox", bounding_box(F.col("coordinates")))
    out = {r["id"]: r["bbox"] for r in df.collect()}
    assert out["s"]["min_x"] == pytest.approx(1e-05)
    assert out["s"]["min_y"] == pytest.approx(-250.0)
    assert out["t"]["max_x"] == pytest.approx(100.0)
    assert out["t"]["max_y"] == pytest.approx(4.0)


def test_bounding_box_builtin(spark):
    df = features(spark).withColumn("bbox", bounding_box(F.col("coordinates")))
    boxes = {r["id"]: r["bbox"] for r in df.collect()}
    assert boxes["p"].asDict() == {
        "min_x": -105.5, "min_y": 39.25, "max_x": -105.5, "max_y": 39.25
    }
    assert boxes["mpg"].asDict() == {
        "min_x": 0.0, "min_y": 0.0, "max_x": 6.0, "max_y": 6.0
    }
    assert boxes["l"].asDict() == {
        "min_x": 0.0, "min_y": 0.0, "max_x": 1.5, "max_y": 2.5
    }

def test_point_in_polygon_matches_python_raycast(spark):
    """Third implementation: an independent python even-odd ray cast over
    the same md5-derived points (float division allowed here — exactness
    of the SQL form is what's under test, the python replay uses the
    textbook formulation)."""
    import hashlib

    from etl_cotrip_signs_spark.operators.geo_ops import (
        _POLYGONS,
        geo_point_in_polygon,
    )

    out = {
        int(r.polygon_id): (int(r.n_inside), int(r.id_checksum))
        for r in geo_point_in_polygon(spark, SF_SMALL).collect()
    }
    import pandas as pd

    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")

    def inside(px, py, ring):
        k = 0
        for i in range(len(ring)):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % len(ring)]
            if (y1 > py) != (y2 > py):
                xi = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                if px < xi:
                    k += 1
        return k % 2 == 1

    expect: dict[int, list[int]] = {pid: [] for pid in _POLYGONS}
    for okey in orders.o_orderkey:
        d = hashlib.md5(str(int(okey)).encode()).hexdigest()
        xm = int(d[0:8], 16) % 100000
        ym = int(d[8:16], 16) % 100000
        for pid, ring in _POLYGONS.items():
            if inside(xm, ym, ring):
                expect[pid].append(int(okey))
    for pid, ids in expect.items():
        if ids:
            assert out[pid] == (len(ids), sum(ids))
        else:
            assert pid not in out
