"""Pins for layout_hilbert_codes: the pure-python xy2d reference is a true
Hilbert curve (bijection + unit-step adjacency, exhaustive at order 4),
and the unrolled DuckDB SQL stages reproduce it bit-for-bit at order 10."""

from __future__ import annotations

import random

import duckdb

from etl_cotrip_signs_spark.operators.io_queries import (
    hilbert_d_exprs,
    hilbert_xy2d_py,
)


def test_reference_is_hilbert_order4_exhaustive():
    pts = {}
    for x in range(16):
        for y in range(16):
            pts[hilbert_xy2d_py(4, x, y)] = (x, y)
    assert sorted(pts) == list(range(256))  # bijection onto [0, 256)
    seq = [pts[d] for d in range(256)]
    assert all(
        abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1 for a, b in zip(seq, seq[1:])
    )  # consecutive codes are grid-adjacent — the defining property


def test_sql_unroll_matches_reference_order10():
    random.seed(1)
    sample = [(random.randrange(1024), random.randrange(1024)) for _ in range(2000)]
    sample += [(0, 0), (1023, 1023), (0, 1023), (1023, 0), (1, 0), (0, 1)]
    con = duckdb.connect()
    stages, prev = [], "keyed"
    for n, e in enumerate(hilbert_d_exprs(lambda a, b: f"xor({a}, {b})")):
        stages.append(
            f"h{n} AS (SELECT pid, {e['x']} AS x, {e['y']} AS y, "
            f"{e['d']} AS d FROM {prev})"
        )
        prev = f"h{n}"
    q = f"""
    WITH keyed AS (
        SELECT row_number() OVER () AS pid, u.x, u.y, CAST(0 AS BIGINT) AS d
        FROM (SELECT unnest(?::INT[]) AS x, unnest(?::INT[]) AS y) u),
    {','.join(stages)}
    SELECT pid, d FROM {prev} ORDER BY pid
    """
    rows = con.sql(
        q, params=[[p[0] for p in sample], [p[1] for p in sample]]
    ).fetchall()
    assert all(
        d == hilbert_xy2d_py(10, x, y) for (_, d), (x, y) in zip(rows, sample)
    )
