"""Distributed spatial join primitives [EXT beyond task.ts — but
domain-adjacent: the reference's data IS point/multi-geometry GeoJSON
(task.ts:90-97); these are the joins a grown-up version of that pipeline
needs].

The fixture has no coordinate table, so point positions are DERIVED from
order keys by pure integer arithmetic (the partsupp discipline —
identically derivable in the DuckDB oracle, no synthetic data written).
Positions live in integer MILLI-units on a 100×100 grid: every distance
comparison is exact int64 arithmetic, so the cell-join algorithm can be
hash-compared against the naive quadratic definition with zero
floating-point risk.

Scale design: the distance self-join never forms the n² space — points
are bucketed into r-sized grid cells, each point probes its 3×3 cell
neighborhood (a 9× map-side explode), candidates meet in an ordinary
shuffled equi join on the cell key, and the exact distance check prunes
the corner candidates. Output is Θ(true pairs); shuffle is Θ(9n). This is
the standard distributed spatial join (same family as the LSH bucket
joins in operators/dedup.py — locality key + exact verify).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..registry import query

# radius in milli-units (500 = 0.5 grid units); cells are r×r so the 3×3
# neighborhood is sufficient: any pair within r spans at most one cell
# boundary per axis.
_R_MILLI = 500

# md5-derived positions, NOT a linear congruence: (k*a % m, k*b % m) puts
# consecutive keys on a sparse lattice whose minimum pair distance exceeds
# any sane radius (measured: zero pairs at every sf) — hash positions are
# uniform, so pair density matches the area ratio. Same md5-bucket idiom
# as training.py's split, with disjoint digest substrings per axis.
_POINTS_SQL = """
points AS (
    SELECT o_orderkey AS id,
           CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                AS BIGINT) % 100000 AS xm,
           CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 9, 8))
                AS BIGINT) % 100000 AS ym
    FROM orders
)
"""


def derived_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic point cloud from order keys (milli-unit coords)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    digest = F.md5(F.col("o_orderkey").cast("string").cast("binary"))
    return o.select(
        F.col("o_orderkey").alias("id"),
        (F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % 100000).alias("xm"),
        (F.conv(F.substring(digest, 9, 8), 16, 10).cast("long") % 100000).alias("ym"),
    )


@query(
    "geo_distance_join",
    # The oracle is the DEFINITION: the naive quadratic all-pairs filter.
    # The Spark side is the cell-bucketed algorithm; the hash match proves
    # the bucketing loses no pair and invents none.
    oracle=f"""
    WITH {_POINTS_SQL}
    SELECT a.id AS id_a, b.id AS id_b,
           (a.xm - b.xm) * (a.xm - b.xm)
             + (a.ym - b.ym) * (a.ym - b.ym) AS d2_milli
    FROM points a JOIN points b ON a.id < b.id
    WHERE (a.xm - b.xm) * (a.xm - b.xm)
            + (a.ym - b.ym) * (a.ym - b.ym) <= {_R_MILLI * _R_MILLI}
    """,
)
def geo_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within radius r: grid-cell bucketed spatial
    self-join. One side is indexed by its OWN cell; the other explodes
    its 3×3 neighbor cells as probes, so each true pair meets in exactly
    one (cell, probe) combination — no post-join dedup needed. The
    distance verify is exact integer arithmetic (milli-unit coords).

    100 TB notes: shuffle volume is 9×|points| id+coord tuples — never
    pairs; output is Θ(result). Skewed hotspots (dense cells) are the
    spatial analog of hot join keys: at production scale you'd sub-split
    cells whose population exceeds a bound (quadtree refinement), exactly
    like salting. The oracle is the quadratic definition, feasible only
    at fixture scale.
    """
    pts = derived_points(spark, sf_dir)
    # integer floor division — never a double divide + cast
    cx = F.expr(f"xm DIV {_R_MILLI}")
    cy = F.expr(f"ym DIV {_R_MILLI}")
    indexed = pts.select(
        F.col("id").alias("id_a"),
        F.col("xm").alias("xa"),
        F.col("ym").alias("ya"),
        (cx * 100000 + cy).alias("cell"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(i).alias("di"), F.lit(j).alias("dj"))
            for i in (-1, 0, 1)
            for j in (-1, 0, 1)
        ]
    )
    probes = (
        pts.select(
            F.col("id").alias("id_b"),
            F.col("xm").alias("xb"),
            F.col("ym").alias("yb"),
            cx.alias("cxb"),
            cy.alias("cyb"),
        )
        .withColumn("o", F.explode(offsets))
        .select(
            "id_b",
            "xb",
            "yb",
            ((F.col("cxb") + F.col("o.di")) * 100000 + F.col("cyb") + F.col("o.dj")).alias(
                "cell"
            ),
        )
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        indexed.join(probes, ["cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(d2 <= _R_MILLI * _R_MILLI)
        .select("id_a", "id_b", d2.alias("d2_milli"))
    )


@query(
    "geo_cell_density",
    oracle=f"""
    WITH {_POINTS_SQL}
    SELECT xm // 10000 AS tile_x, ym // 10000 AS tile_y,
           count(*) AS n_points,
           min(xm) AS min_xm, max(ym) AS max_ym
    FROM points
    GROUP BY 1, 2
    """,
)
def geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial binning (heatmap tiles): point counts per 10×10-unit tile.
    The aggregation form of the same grid-cell key the distance join
    buckets with — one map-side-combined shuffle over ≤100 tile keys.
    This is also the hotspot pre-flight for the join: tiles with outsized
    counts are where quadtree sub-splitting (the spatial salting) pays.
    """
    pts = derived_points(spark, sf_dir)
    return pts.groupBy(
        F.expr("xm DIV 10000").alias("tile_x"),
        F.expr("ym DIV 10000").alias("tile_y"),
    ).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("xm").alias("min_xm"),
        F.max("ym").alias("max_ym"),
    )


# Literal polygon set (milli-units): a triangle, an axis-aligned square,
# and a NON-convex L-shape (the case a bbox test alone gets wrong).
# Vertices are closed rings; edges are consecutive pairs. The same
# literals appear in the Spark build and the DuckDB oracle.
_POLYGONS: dict[int, list[tuple[int, int]]] = {
    1: [(10000, 10000), (30000, 10000), (20000, 30000)],
    2: [(50000, 50000), (80000, 50000), (80000, 80000), (50000, 80000)],
    3: [
        (10000, 60000),
        (40000, 60000),
        (40000, 70000),
        (20000, 70000),
        (20000, 90000),
        (10000, 90000),
    ],
}


def _polygon_edges() -> list[tuple[int, int, int, int, int, int, int, int, int]]:
    """(pid, x1, y1, x2, y2, bbox...) rows, ring-closed."""
    rows = []
    for pid, ring in _POLYGONS.items():
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        bb = (min(xs), min(ys), max(xs), max(ys))
        for k in range(len(ring)):
            x1, y1 = ring[k]
            x2, y2 = ring[(k + 1) % len(ring)]
            rows.append((pid, x1, y1, x2, y2, *bb))
    return rows


def _edges_values_sql() -> str:
    return ", ".join(
        f"({pid}, {x1}, {y1}, {x2}, {y2}, {bx0}, {by0}, {bx1}, {by1})"
        for pid, x1, y1, x2, y2, bx0, by0, bx1, by1 in _polygon_edges()
    )


# Even-odd ray cast to +x, all-integer: the edge straddles the scanline
# ((y1 > ym) != (y2 > ym), a half-open rule so shared vertices count
# once), and the point lies strictly left of the edge/scanline
# intersection — px < x1 + (py-y1)(x2-x1)/(y2-y1), cross-multiplied so
# the division never happens; the inequality flips with sign(y2-y1).
_CROSSING = (
    "((y1 > ym) <> (y2 > ym)) AND "
    "(CASE WHEN y2 > y1 "
    " THEN (ym - y1) * (x2 - x1) - (xm - x1) * (y2 - y1) > 0 "
    " ELSE (ym - y1) * (x2 - x1) - (xm - x1) * (y2 - y1) < 0 END)"
)


@query(
    "geo_point_in_polygon",
    oracle=f"""
    WITH {_POINTS_SQL},
    edges(pid, x1, y1, x2, y2, bx0, by0, bx1, by1) AS (
        VALUES {_edges_values_sql()}
    ),
    cand AS (
        SELECT p.id, p.xm, p.ym, e.*
        FROM points p JOIN edges e
          ON p.xm >= e.bx0 AND p.xm <= e.bx1
         AND p.ym >= e.by0 AND p.ym <= e.by1
    ),
    crossings AS (
        SELECT id, pid,
               sum(CASE WHEN {_CROSSING} THEN 1 ELSE 0 END) AS k
        FROM cand GROUP BY id, pid
    )
    SELECT CAST(pid AS BIGINT) AS polygon_id,
           CAST(count(*) AS BIGINT) AS n_inside,
           CAST(sum(id) AS BIGINT) AS id_checksum
    FROM crossings WHERE k % 2 = 1
    GROUP BY pid
    """,
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment join — the third spatial primitive
    beside geo_distance_join (proximity) and geo_cell_density (binning),
    and the one task.ts's polygon features would need downstream.

    The even-odd ray cast is EXACT integer arithmetic end to end: the
    strictly-left test is cross-multiplied so the edge/scanline division
    never happens, and the half-open straddle rule (y1 > ym) != (y2 > ym)
    counts a vertex-touching scanline exactly once. Polygon 3 is
    deliberately non-convex — the case where the bbox PREFILTER (stage 1)
    says maybe and only the crossing parity (stage 2) decides.

    Scale shape (100 TB): polygons are a broadcast dimension; the bbox
    join prunes points map-side before any edge math (for polygon sets
    too large to broadcast, the bbox becomes a grid-cell key and this
    stays an equi join — the geo_distance_join cell discipline); crossing
    parity is one combinable count per (point, polygon). Output is
    polygon-sized, never point-sized.
    """
    points = derived_points(spark, sf_dir)
    edges = spark.createDataFrame(
        _polygon_edges(),
        "pid INT, x1 INT, y1 INT, x2 INT, y2 INT, "
        "bx0 INT, by0 INT, bx1 INT, by1 INT",
    )
    cand = points.join(
        F.broadcast(edges),
        (F.col("xm") >= F.col("bx0"))
        & (F.col("xm") <= F.col("bx1"))
        & (F.col("ym") >= F.col("by0"))
        & (F.col("ym") <= F.col("by1")),
    )
    crossings = cand.groupBy("id", "pid").agg(
        F.sum(F.expr(f"CASE WHEN {_CROSSING} THEN 1 ELSE 0 END")).alias("k")
    )
    return (
        crossings.filter(F.col("k") % 2 == 1)
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_inside"),
            F.sum("id").cast("long").alias("id_checksum"),
        )
        .select(
            F.col("pid").cast("long").alias("polygon_id"),
            "n_inside",
            "id_checksum",
        )
    )
