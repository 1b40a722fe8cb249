"""XXH64 re-implemented as DuckDB SQL macros, for cross-engine oracles.

Spark's ``xxhash64`` is spec-conformant XXH64 with seed 42 over each
argument's bytes, chaining the running hash as the next argument's seed.
DuckDB has no xxhash64 builtin, which is why the fingerprint/simhash/frame
queries were rows-only through round 4. These macros compute the identical
64-bit value in pure SQL — unsigned 64-bit arithmetic is emulated with
HUGEINT intermediates reduced mod 2**64 (DuckDB integer ops are
overflow-checked, so the wrap every hash step relies on must be explicit).

The oracle strings that need the macros prepend ``XXH64_MACROS`` (DuckDB's
python ``con.sql`` executes multi-statement scripts and returns the last
relation — verified against the driver-rehearsal runner in round 5).
Validated byte-for-byte against functions/xxh64_ref.py (lengths 0-200, every
tail-combination class) and against Spark's xxhash64 in
tests/test_xxh64_sql.py.

Algorithm reference: xxHash (Yann Collet, BSD-2) — public spec; this is an
independent SQL expression of it, not a port of any engine's source.
"""

from __future__ import annotations

# Derived constants (mod 2**64): P1+P2, 2**64-P1, and the Spark chain seeds
# XXH64(utf8(lit), 42) for the literal first arguments used by operators.
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261
M64 = 1 << 64

XXH64_MACROS = f"""
CREATE OR REPLACE MACRO xx_addm(a, b) AS
  ((a::HUGEINT + b::HUGEINT) % {M64})::UBIGINT;
CREATE OR REPLACE MACRO xx_mulm(a, b) AS
  (((((a::HUGEINT >> 32) * b::HUGEINT) % 4294967296) * 4294967296
    + (a::HUGEINT % 4294967296) * b::HUGEINT) % {M64})::UBIGINT;
CREATE OR REPLACE MACRO xx_rotl(x, r) AS
  (((x::HUGEINT << r) % {M64})::UBIGINT + (x::UBIGINT >> (64 - r)));
CREATE OR REPLACE MACRO xx_bytes(b) AS
  list_transform(range(0, octet_length(b::BLOB)::INT), i ->
    CAST(strpos('123456789ABCDEF', substring(hex(b::BLOB), (2*i+1)::INT, 1)) * 16
       + strpos('123456789ABCDEF', substring(hex(b::BLOB), (2*i+2)::INT, 1))
       AS UBIGINT));
CREATE OR REPLACE MACRO xx_w8(bs, o) AS
  ((bs[o]::HUGEINT) + (bs[o+1]::HUGEINT << 8) + (bs[o+2]::HUGEINT << 16)
   + (bs[o+3]::HUGEINT << 24) + (bs[o+4]::HUGEINT << 32)
   + (bs[o+5]::HUGEINT << 40) + (bs[o+6]::HUGEINT << 48)
   + (bs[o+7]::HUGEINT << 56))::UBIGINT;
CREATE OR REPLACE MACRO xx_w4(bs, o) AS
  ((bs[o]::HUGEINT) + (bs[o+1]::HUGEINT << 8) + (bs[o+2]::HUGEINT << 16)
   + (bs[o+3]::HUGEINT << 24))::UBIGINT;
CREATE OR REPLACE MACRO xx_round(acc, w) AS
  xx_mulm(xx_rotl(xx_addm(acc, xx_mulm(w, {P2}::UBIGINT)), 31), {P1}::UBIGINT);
CREATE OR REPLACE MACRO xx_merge(h, v) AS
  xx_addm(xx_mulm(xor(h::UBIGINT, xx_round(0::UBIGINT, v)), {P1}::UBIGINT),
          {P4}::UBIGINT);
CREATE OR REPLACE MACRO xx_lane(bs, ns, lane, init) AS
  list_reduce(
    list_prepend(init,
      list_transform(range(0, ns), s -> xx_w8(bs, (32*s + 8*lane + 1)::INT))),
    (acc, w) -> xx_round(acc, w));
CREATE OR REPLACE MACRO xx_big(bs, n, seed) AS (
  -- subquery ladder, not nested calls: macro inlining is textual and the
  -- binder has a 128-deep expression limit; each SELECT binds shallow
  SELECT xx_merge(m3, v4) FROM (
    SELECT xx_merge(m2, v3) AS m3, v4 FROM (
      SELECT xx_merge(m1, v2) AS m2, v3, v4 FROM (
        SELECT xx_merge(h0, v1) AS m1, v2, v3, v4 FROM (
          SELECT xx_addm(xx_addm(xx_rotl(v1, 1), xx_rotl(v2, 7)),
                         xx_addm(xx_rotl(v3, 12), xx_rotl(v4, 18))) AS h0,
                 v1, v2, v3, v4
          FROM (SELECT
            xx_lane(bs, (n // 32)::INT, 0,
                    xx_addm(seed, {(P1 + P2) % M64}::UBIGINT)) AS v1,
            xx_lane(bs, (n // 32)::INT, 1, xx_addm(seed, {P2}::UBIGINT)) AS v2,
            xx_lane(bs, (n // 32)::INT, 2, seed::UBIGINT) AS v3,
            xx_lane(bs, (n // 32)::INT, 3,
                    xx_addm(seed, {M64 - P1}::UBIGINT)) AS v4)))))
);
CREATE OR REPLACE MACRO xx_t8(bs, n, h) AS
  list_reduce(
    list_prepend(h,
      list_transform(range(0, ((n % 32) // 8)::INT),
                     i -> xx_w8(bs, ((n // 32) * 32 + 8 * i + 1)::INT))),
    (acc, w) -> xx_addm(
        xx_mulm(xx_rotl(xor(acc, xx_round(0::UBIGINT, w)), 27), {P1}::UBIGINT),
        {P4}::UBIGINT));
CREATE OR REPLACE MACRO xx_t4(bs, n, h) AS
  CASE WHEN (n % 32) % 8 >= 4
       THEN xx_addm(
              xx_mulm(
                xx_rotl(
                  xor(h, xx_mulm(
                        xx_w4(bs, ((n // 32) * 32 + ((n % 32) // 8) * 8 + 1)::INT),
                        {P1}::UBIGINT)),
                  23),
                {P2}::UBIGINT),
              {P3}::UBIGINT)
       ELSE h END;
CREATE OR REPLACE MACRO xx_tb(bs, n, h) AS
  list_reduce(
    list_prepend(h,
      list_transform(range(0, ((n % 32) % 4)::INT), j ->
        bs[((n // 32) * 32 + ((n % 32) // 8) * 8
            + (CASE WHEN (n % 32) % 8 >= 4 THEN 4 ELSE 0 END) + j + 1)::INT])),
    (acc, by) -> xx_mulm(xx_rotl(xor(acc, xx_mulm(by, {P5}::UBIGINT)), 11),
                         {P1}::UBIGINT));
CREATE OR REPLACE MACRO xx_aval(h0) AS (
  SELECT xor(h2, h2 >> 32)
  FROM (SELECT xx_mulm(xor(h1, h1 >> 29), {P3}::UBIGINT) AS h2
        FROM (SELECT xx_mulm(xor(h0, h0 >> 33), {P2}::UBIGINT) AS h1))
);
CREATE OR REPLACE MACRO xxh64_u(b, seed) AS (
  SELECT xx_aval(h4) FROM (
    SELECT xx_tb(bs, n, h3) AS h4 FROM (
      SELECT bs, n, xx_t4(bs, n, h2) AS h3 FROM (
        SELECT bs, n, xx_t8(bs, n, h1) AS h2 FROM (
          SELECT bs, n,
                 xx_addm(CASE WHEN n >= 32 THEN xx_big(bs, n, seed::UBIGINT)
                              ELSE xx_addm(seed::UBIGINT, {P5}::UBIGINT) END,
                         n) AS h1
          FROM (SELECT xx_bytes(b) AS bs,
                       octet_length(b::BLOB)::UBIGINT AS n)))))
);
CREATE OR REPLACE MACRO xxh64_signed(b, seed) AS (
  SELECT CASE WHEN u >= {1 << 63}::UBIGINT
              THEN (u::HUGEINT - {M64})::BIGINT
              ELSE u::BIGINT END
  FROM (SELECT xxh64_u(b, seed) AS u)
);
CREATE OR REPLACE MACRO xxh64_long_u(x, seed) AS (
  -- Unsigned twin of xxh64_long: returns the raw UBIGINT hash so it can
  -- feed the next xxh64_* call's seed — Spark's multi-argument xxhash64
  -- chains the running hash as the next argument's seed, and replicating
  -- a 2-long chain (e.g. the random-walk (walker, cur) key) needs the
  -- intermediate hash unsigned.
  SELECT xx_aval(xx_addm(xx_mulm(xx_rotl(
           xor(h1, xx_round(0::UBIGINT, u)), 27), {P1}::UBIGINT),
           {P4}::UBIGINT))
  FROM (SELECT ((x::HUGEINT + {M64}) % {M64})::UBIGINT AS u,
               xx_addm(seed::UBIGINT, {(P5 + 8) % M64}::UBIGINT) AS h1)
);
CREATE OR REPLACE MACRO xxh64_long(x, seed) AS (
  -- Spark xxhash64 over a LongType arg: XXH64 of the 8 little-endian bytes,
  -- which reduces to one 8-byte-word tail step + avalanche (hash = seed +
  -- P5 + 8; h ^= round(0, word); h = rotl(h,27)*P1 + P4; avalanche). The
  -- word IS the long's unsigned reinterpretation (two's complement).
  SELECT CASE WHEN hv >= {1 << 63}::UBIGINT
              THEN (hv::HUGEINT - {M64})::BIGINT
              ELSE hv::BIGINT END
  FROM (
    SELECT xx_aval(xx_addm(xx_mulm(xx_rotl(
             xor(h1, xx_round(0::UBIGINT, u)), 27), {P1}::UBIGINT),
             {P4}::UBIGINT)) AS hv
    FROM (SELECT ((x::HUGEINT + {M64}) % {M64})::UBIGINT AS u,
                 xx_addm(seed::UBIGINT, {(P5 + 8) % M64}::UBIGINT) AS h1)
  )
);
"""


def chain_seed(*literals: str, seed: int = 42) -> int:
    """Seed after Spark hashes the given literal string args first:
    xxhash64(lit(a), col) == XXH64(bytes(col), chain_seed(a))."""
    from .xxh64_ref import xxh64

    h = seed
    for lit in literals:
        h = xxh64(lit.encode("utf-8"), h)
    return h
