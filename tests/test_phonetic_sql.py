"""The DuckDB soundex macro must match Spark's soundex() builtin — the
property the phonetic-blocking oracle stands on — plus a pin on the
DuckDB 1.0 list_reduce identity-branch bug the macro works around."""

from __future__ import annotations

import duckdb
import pytest

from etl_cotrip_signs_spark.functions.phonetic_sql import SOUNDEX_MACROS

EDGES = [
    "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak", "Pfister",
    "Honeyman", "cc", "c1c", "chc", "cac", "cwc", "chhc", "c c", "ab-cd",
    "a1b2c3", "Xx2x", "bfpv", "HHHH", "aeiou", "Y", "yb", "BY", "Bhb",
    "B2b", "Robert2", "McDonald", "Hw", "WWW", "hello", "Lloyd", "ghosh",
    "123abc", "étude", "o'brien", "Hm", "a", "ab", "Z", "q9", "9q", "-",
    "Czarkowska", "Schmidt", "customer", "stream", "",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(SOUNDEX_MACROS)
    return c


def test_soundex_matches_spark(spark, con):
    """Every edge case + the document vocabulary: macro == Spark builtin."""
    from pyspark.sql import functions as F

    from etl_cotrip_signs_spark.io import load_table
    from .conftest import SF_SMALL

    vocab = [
        r["t"]
        for r in load_table(spark, SF_SMALL, "documents")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
        .distinct()
        .collect()
    ]
    words = sorted(set(EDGES + vocab))
    truth = {
        r["w"]: r["s"]
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", F.soundex("w").alias("s"))
        .collect()
    }
    # batch evaluation (not per-row params): the historical failure mode was
    # vectorized evaluation corrupting SUBSEQUENT rows in a chunk
    got = {
        r[0]: r[1]
        for r in con.sql(
            "SELECT w, soundex_sql(w) FROM (SELECT unnest(?) AS w)",
            params=[words + words],  # duplicates ride in the same chunk
        ).fetchall()
    }
    bad = {w: (got[w], truth[w]) for w in words if got[w] != truth[w]}
    assert not bad, bad


def test_duckdb_list_reduce_identity_branch(con):
    """Pin the DuckDB 1.0 bug the macro works around: a list_reduce lambda
    branch returning the accumulator UNCHANGED corrupts later rows in the
    chunk; forcing a copy (acc || '') is correct. If the buggy form starts
    passing here, the engine fixed it and the workaround can be dropped."""
    rows = con.sql(
        "SELECT list_reduce(string_split(tok, ''), "
        "(a, c) -> CASE WHEN len(a) >= 3 THEN a || '' ELSE a || c END) "
        "FROM (SELECT unnest(['customer', 'stream', 'row', 'customer']) AS tok)"
    ).fetchall()
    assert [r[0] for r in rows] == ["cus", "str", "row", "cus"]
    buggy = con.sql(
        "SELECT list_reduce(string_split(tok, ''), "
        "(a, c) -> CASE WHEN len(a) >= 3 THEN a ELSE a || c END) "
        "FROM (SELECT unnest(['customer', 'stream', 'row', 'customer']) AS tok)"
    ).fetchall()
    assert [r[0] for r in buggy] != ["cus", "str", "row", "cus"], (
        "DuckDB fixed the identity-branch aliasing bug — the acc || '' "
        "workaround in phonetic_sql.sx_step can be removed"
    )
