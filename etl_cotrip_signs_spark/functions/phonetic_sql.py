"""American Soundex as DuckDB SQL macros, for cross-engine oracles.

Spark ships a ``soundex()`` builtin; DuckDB has none, so phonetic-blocking
operators would be rows-only without this. The macro replays Spark's exact
semantics, pinned empirically in round 5 (tests/test_phonetic_sql.py):

- first character not an ASCII letter -> the input returned unchanged
  (including non-ASCII like 'etude with accent');
- H/W do NOT reset the previous code (same-code consonants separated by
  H/W collapse: 'Ashcraft' -> A261, 'chc' -> C000);
- vowels AND embedded non-letters DO reset it ('cac'/'c1c' -> C200);
- the first letter's own code seeds the collapse ('Pfister' -> P236);
- three digits max, zero-padded, first letter uppercased.

State machine via list_reduce over the character list with a VARCHAR
accumulator 'digits|prev' — the loop-carried (emitted digits, previous
code) pair, same trick as the greedy-packing oracle's bin vector.
"""

SOUNDEX_MACROS = """
CREATE OR REPLACE MACRO sx_code(ch) AS
  CASE WHEN ch IN ('B','F','P','V') THEN '1'
       WHEN ch IN ('C','G','J','K','Q','S','X','Z') THEN '2'
       WHEN ch IN ('D','T') THEN '3'
       WHEN ch = 'L' THEN '4'
       WHEN ch IN ('M','N') THEN '5'
       WHEN ch = 'R' THEN '6'
       WHEN ch IN ('H','W') THEN 'h'
       ELSE '0' END;
CREATE OR REPLACE MACRO sx_step(acc, ch) AS
  -- the no-op branches return acc || '' (a COPY), never acc itself:
  -- DuckDB 1.0's list_reduce corrupts subsequent rows in the chunk when a
  -- lambda branch aliases the accumulator unchanged (minimal repro in
  -- tests/test_phonetic_sql.py::test_duckdb_list_reduce_identity_branch)
  CASE WHEN len(split_part(acc, '|', 1)) >= 3 THEN acc || ''
       WHEN sx_code(ch) = 'h' THEN acc || ''
       WHEN sx_code(ch) = '0' THEN split_part(acc, '|', 1) || '|0'
       WHEN sx_code(ch) = split_part(acc, '|', 2)
            THEN split_part(acc, '|', 1) || '|' || sx_code(ch)
       ELSE split_part(acc, '|', 1) || sx_code(ch) || '|' || sx_code(ch) END;
CREATE OR REPLACE MACRO soundex_sql(w) AS
  -- FLAT macro with NO lambda capturing w, deliberately: both a scalar-
  -- subquery form and a list_transform(range(len(w)), i -> substring(w,..))
  -- form mis-bound w across rows when projected over an aggregate in
  -- DuckDB 1.0 (one token received another token's digits — caught twice
  -- by the r5 parity sweep, at different SFs). string_split(upper(w), '')
  -- chars the string without a correlated lambda; the reduce lambda then
  -- touches only its own arguments.
  CASE WHEN w IS NULL THEN NULL
       WHEN w = '' THEN ''
       WHEN NOT (substring(w, 1, 1) BETWEEN 'A' AND 'Z'
                 OR substring(w, 1, 1) BETWEEN 'a' AND 'z') THEN w
       ELSE upper(substring(w, 1, 1))
            || rpad(split_part(list_reduce(
                 list_prepend('|' || sx_code(upper(substring(w, 1, 1))),
                   (string_split(upper(w), ''))[2:]),
                 (a, c) -> sx_step(a, c)), '|', 1), 3, '0') END;
"""
