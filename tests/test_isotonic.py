"""Pin isotonic_regression_daily's minimax construction against a classic
pool-adjacent-violators implementation in exact Fraction arithmetic:
floor-quantization commutes with min/max, so the SQL's quantized minimax
must equal floor(1000 * exact PAVA) on every day."""

from __future__ import annotations

import os
from fractions import Fraction

import duckdb

from etl_cotrip_signs_spark.registry import load_all, oracle_for

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def pava(ys: list[int]) -> list[Fraction]:
    """Textbook PAVA, unit weights, exact rational pool means."""
    pools: list[tuple[Fraction, int]] = []  # (mean, size)
    for y in ys:
        pools.append((Fraction(y), 1))
        while len(pools) > 1 and pools[-2][0] >= pools[-1][0]:
            (m2, n2), (m1, n1) = pools.pop(), pools.pop()
            pools.append(((m1 * n1 + m2 * n2) / (n1 + n2), n1 + n2))
    out: list[Fraction] = []
    for m, n in pools:
        out.extend([m] * n)
    return out


def test_minimax_equals_pava_on_fixture():
    load_all()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF_DIR, 'orders.parquet')}')"
    )
    got = con.sql(
        oracle_for("isotonic_regression_daily", SF_DIR) + " ORDER BY day"
    ).fetchall()
    ys = [r[1] for r in got]
    expect = pava(ys)
    assert len(got) > 100
    for (day, y, fit_mc), ref in zip(got, expect):
        assert fit_mc == (1000 * ref.numerator) // ref.denominator, day
    # and the fit is monotone nondecreasing (the regression's contract)
    fits = [r[2] for r in got]
    assert all(a <= b for a, b in zip(fits, fits[1:]))


def test_minimax_equals_pava_random():
    import random

    random.seed(7)
    con = duckdb.connect()
    for _ in range(25):
        ys = [random.randint(0, 1000) for _ in range(random.randint(1, 60))]
        rows = con.sql(
            """
            WITH idx AS (
                SELECT i + 1 AS i, v AS cents,
                       sum(v) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS s
                FROM (SELECT unnest(range(len(?::BIGINT[]))) AS i,
                             unnest(?::BIGINT[]) AS v)
            ),
            a AS (
                SELECT j.i AS j, k.i AS k,
                       1000 * (k.s - j.s + j.cents) // (k.i - j.i + 1) AS v
                FROM idx j JOIN idx k ON j.i <= k.i
            ),
            m AS (
                SELECT j, k AS i,
                       min(v) OVER (PARTITION BY j ORDER BY k DESC
                                    ROWS UNBOUNDED PRECEDING) AS mn
                FROM a
            )
            SELECT i, max(mn) FROM m GROUP BY i ORDER BY i
            """,
            params=[ys, ys],
        ).fetchall()
        expect = pava(ys)
        assert [r[1] for r in rows] == [
            (1000 * f.numerator) // f.denominator for f in expect
        ]
