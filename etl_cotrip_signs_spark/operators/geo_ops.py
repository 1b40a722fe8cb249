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
