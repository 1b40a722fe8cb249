"""Rehearsal-tool hardening: local green must imply driver green.

Round 2's one driver FAIL was an oracle dtype bug the local rehearsal
normalized away: DuckDB ``sum(BIGINT)`` yields HUGEINT, pandas materializes
it as float64, and ``"%.6g"`` rendered ``441.0`` and ``441`` identically —
so local passed while the driver's hash diverged. These tests pin that the
rehearsal now *rejects* the dtype-skew class instead of papering over it.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pandas as pd

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
_spec = importlib.util.spec_from_file_location(
    "driver_rehearsal", os.path.join(_TOOLS, "driver_rehearsal.py")
)
driver_rehearsal = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(driver_rehearsal)

from .conftest import SF_ORACLE  # noqa: E402


def _oracle(sql: str):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_ORACLE}/documents.parquet'"
    )
    rel = con.sql(sql)
    types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    return rel.df(), types


def test_uncast_sum_bigint_is_flagged():
    """A deliberately un-cast sum(BIGINT) fixture must be caught: DuckDB
    types it HUGEINT and the rehearsal flags it even though every value
    renders identically under %.6g."""
    opdf, otypes = _oracle("SELECT lang, sum(n_chars) AS s FROM documents GROUP BY lang")
    assert "HUGEINT" in otypes["s"].upper()
    # a Spark result for the same query would carry int64
    spdf = opdf.copy()
    spdf["s"] = spdf["s"].astype("int64")
    skew = driver_rehearsal.dtype_skew(spdf, opdf, otypes)
    assert skew and "s" in skew[0], skew


def test_cast_sum_bigint_is_clean():
    opdf, otypes = _oracle(
        "SELECT lang, CAST(sum(n_chars) AS BIGINT) AS s FROM documents GROUP BY lang"
    )
    assert "HUGEINT" not in otypes["s"].upper()
    spdf = opdf.copy()
    assert driver_rehearsal.dtype_skew(spdf, opdf, otypes) == []


def test_int_float_kind_skew_flagged_without_hugeint():
    """Even when DuckDB's declared type is clean, an int64-vs-float64 kind
    difference between the two frames is flagged."""
    spdf = pd.DataFrame({"v": pd.array([1, 2], dtype="int64")})
    opdf = pd.DataFrame({"v": pd.array([1.0, 2.0], dtype="float64")})
    skew = driver_rehearsal.dtype_skew(spdf, opdf, {"v": "DOUBLE"})
    assert skew and "v" in skew[0], skew


def test_registered_oracles_emit_no_hugeint():
    """Sweep every registered oracle through DuckDB's type checker: zero
    HUGEINT output columns allowed (the round-2 class had exactly two)."""
    from etl_cotrip_signs_spark import registry
    from etl_cotrip_signs_spark.io import TABLES

    registry.load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")
    offenders = []
    for name, sql in registry.ORACLES.items():
        try:
            rel = con.sql(sql)
        except Exception:
            continue  # oracle may need session-specific setup; sweep covers it
        for c, t in zip(rel.columns, rel.types):
            if "HUGEINT" in str(t).upper():
                offenders.append((name, c))
    assert offenders == [], offenders
