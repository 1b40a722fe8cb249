"""The DuckDB XXH64 macros must match (a) the pure-Python reference on
every tail-combination class and (b) Spark's xxhash64 itself — the property
the fingerprint/simhash/frame oracles stand on."""

from __future__ import annotations

import random

import duckdb
import pytest

from etl_cotrip_signs_spark.functions.xxh64_sql import XXH64_MACROS, chain_seed
from etl_cotrip_signs_spark.functions.xxh64_ref import xxh64, xxh64_signed


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(XXH64_MACROS)
    return c


def test_spec_vector(con):
    # published reference vector: XXH64("", seed=0) = 0xEF46DB3751D8E999
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert con.sql("SELECT xxh64_u(''::BLOB, 0::UBIGINT)").fetchone()[0] == (
        0xEF46DB3751D8E999
    )


def test_macros_match_reference_all_tail_classes(con):
    """Lengths 0-40 + stripe boundaries cover every combination of
    (has 32-byte stripes, 8-byte tail words, 4-byte word, 1-3 bytes)."""
    random.seed(7)
    cases = [b""] + [
        bytes(random.randrange(256) for _ in range(n))
        for n in list(range(1, 41)) + [63, 64, 65, 100, 200]
    ]
    cases.append("héllo wörld ünïcode".encode("utf-8"))
    for seed in (0, 42, 123456789, (1 << 64) - 1):
        for b in cases:
            got = con.sql(
                "SELECT xxh64_u(?::BLOB, ?::UBIGINT)", params=[b, seed]
            ).fetchone()[0]
            assert got == xxh64(b, seed), (len(b), seed)


def test_macros_match_spark_xxhash64(spark, con):
    """End-to-end: Spark's builtin vs the SQL macros on real strings,
    including the chained-literal-seed form the operators use."""
    from pyspark.sql import functions as F

    words = ["", "a", "hello world", "x" * 31, "y" * 32, "z" * 100, "héllo wörld"]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    spark_rows = {
        r["s"]: (r["h"], r["hc"])
        for r in df.select(
            "s",
            F.xxhash64("s").alias("h"),
            F.xxhash64(F.lit("fp"), F.col("s")).alias("hc"),
        ).collect()
    }
    fp_seed = chain_seed("fp")
    assert fp_seed == 755669946628913235  # constant baked into the oracles
    for w in words:
        h = con.sql(
            "SELECT xxh64_signed(encode(?), 42::UBIGINT)", params=[w]
        ).fetchone()[0]
        hc = con.sql(
            "SELECT xxh64_signed(encode(?), ?::UBIGINT)", params=[w, fp_seed]
        ).fetchone()[0]
        assert (h, hc) == spark_rows[w], w


def test_long_hash_matches_reference_and_spark(spark, con):
    """xxh64_long must equal XXH64 of the 8 little-endian bytes (the
    reference) AND Spark's xxhash64 over a LongType column."""
    import struct

    from pyspark.sql import functions as F

    random.seed(3)
    vals = [0, 1, -1, 42, -(2**63), 2**63 - 1] + [
        random.randrange(-(2**63), 2**63) for _ in range(20)
    ]
    for seed in (42, 11311678090148365197):
        for v in vals:
            got = con.sql(
                "SELECT xxh64_long(?::BIGINT, ?::UBIGINT)", params=[v, seed]
            ).fetchone()[0]
            assert got == xxh64_signed(struct.pack("<q", v), seed), (v, seed)
    spark_rows = {
        r["x"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], "x long")
        .select("x", F.xxhash64("x").alias("h"))
        .collect()
    }
    for v in vals:
        got = con.sql(
            "SELECT xxh64_long(?::BIGINT, 42::UBIGINT)", params=[v]
        ).fetchone()[0]
        assert got == spark_rows[v], v


def test_signed_conversion(con):
    for b in (b"abc", b"\xff" * 40):
        assert con.sql(
            "SELECT xxh64_signed(?::BLOB, 42::UBIGINT)", params=[b]
        ).fetchone()[0] == xxh64_signed(b, 42)


def test_macros_match_reference_property(con):
    """Property test: arbitrary byte strings (0-96 bytes, arbitrary
    content) hash identically to the reference — beyond the fixed
    tail-class cases above."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=96),
           st.integers(min_value=0, max_value=(1 << 64) - 1))
    def check(b, seed):
        got = con.sql(
            "SELECT xxh64_u(?::BLOB, ?::UBIGINT)", params=[b, seed]
        ).fetchone()[0]
        assert got == xxh64(b, seed)

    check()
