"""Pins for the BPE-apply DuckDB oracle (functions/bpe_sql.py): the
merge-pass fold, the rank-order-unroll ⇔ best-rank-first-loop equivalence,
the end-to-end per-doc counts at sf0.001, and the DuckDB 1.0 list_reduce
STRUCT-accumulator engine bug the VARCHAR encoding works around."""

from __future__ import annotations

import os
import random

import duckdb
import pytest

from etl_cotrip_signs_spark.functions.bpe_sql import BPE_MACROS, bpe_apply_oracle
from etl_cotrip_signs_spark.operators.text import bpe_apply_word

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(BPE_MACROS)
    return c


def _sql_pass(con, toks: list[str], pair: str | None) -> list[str]:
    return con.sql(
        "SELECT bpe_merge_pass(?::VARCHAR[], ?)", params=[toks, pair]
    ).fetchone()[0]


def test_merge_pass_hand_cases(con):
    cases = [
        (["a", "b", "c"], "bc", ["a", "bc"]),
        (["a", "b", "c"], "ab", ["ab", "c"]),
        # equal-char runs: left-to-right NON-OVERLAPPING, merged token inert
        (["a", "a", "a"], "aa", ["aa", "a"]),
        (["a", "a", "a", "a"], "aa", ["aa", "aa"]),
        (["a", "a", "a", "a", "a"], "aa", ["aa", "aa", "a"]),
        (["a", "b", "a", "b"], "ab", ["ab", "ab"]),
        # a previously merged token must not re-merge
        (["ab", "c"], "bc", ["ab", "c"]),
        (["x"], "aa", ["x"]),
        (["a", "b"], None, ["a", "b"]),
    ]
    for toks, pair, want in cases:
        assert _sql_pass(con, toks, pair) == want, (toks, pair)


def test_rank_unroll_equals_python_loop_fuzz(con):
    """The load-bearing claim: applying the merges once each in rank order
    equals bpe_apply_word's repeat-best-rank loop (merged tokens are inert
    because rank keys are 2 chars). 300 random (vocab, rank-table) trials
    x 20 words, alphabet small enough to force dense merge interactions."""
    random.seed(42)
    bad = []
    for _ in range(300):
        alpha = "abcd"
        words = [
            "".join(random.choice(alpha) for _ in range(random.randint(1, 12)))
            for _ in range(20)
        ]
        pairs = sorted({a + b for a in alpha for b in alpha})
        random.shuffle(pairs)
        ms = pairs[: random.randint(0, 8)]
        ranks = {p: i for i, p in enumerate(ms)}
        expr = "string_split(w, '')"
        for p in ms:
            expr = f"bpe_merge_pass({expr}, '{p}')"
        rows = con.sql(
            f"SELECT w, {expr} FROM (SELECT unnest(?::VARCHAR[]) AS w)",
            params=[words],
        ).fetchall()
        for w, toks in rows:
            if toks != bpe_apply_word(w, ranks):
                bad.append((w, ms, toks, bpe_apply_word(w, ranks)))
    assert not bad, bad[:5]


def test_oracle_end_to_end_sf0001(con):
    """Full oracle SQL at sf0.001 vs a pure-python replay: same merges,
    same per-doc (n_bpe_tokens, n_words)."""
    docs_pq = os.path.join(SF_DIR, "documents.parquet")
    con.sql(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{docs_pq}')"
    )
    got = {
        r[0]: (r[1], r[2])
        for r in con.sql(bpe_apply_oracle()).fetchall()
    }
    merge_rows = con.sql(
        r"""
        WITH words0 AS (
            SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents)
        SELECT substr(w, i, 2) AS pair, count(*) AS n
        FROM words0, unnest(range(1, len(w))) AS t(i)
        WHERE len(w) >= 2 GROUP BY pair ORDER BY n DESC, pair LIMIT 32
        """
    ).fetchall()
    ranks = {r[0]: i for i, r in enumerate(merge_rows)}
    memo: dict[str, int] = {}
    want = {}
    for doc_id, text in con.sql("SELECT doc_id, text FROM documents").fetchall():
        n_bpe = 0
        words = text.split()
        for w in words:
            if w not in memo:
                memo[w] = len(bpe_apply_word(w, ranks))
            n_bpe += memo[w]
        want[doc_id] = (n_bpe, len(words))
    assert got == want


def test_duckdb_list_reduce_struct_accumulator(con):
    """Pin the DuckDB 1.0 engine bug that forced the VARCHAR accumulator:
    a STRUCT accumulator's LIST field does not propagate across list_reduce
    iterations (each step reads the stale field from the original element).
    If this starts returning ['f','a'], the engine is fixed and
    bpe_merge_pass could use the cleaner {out, pend} encoding."""
    out = con.sql(
        """
        SELECT list_reduce(
          list_transform(['f','a','s'],
                         t -> {out: CAST([] AS VARCHAR[]), pend: t}),
          (acc, x) -> {out: acc.out || [acc.pend], pend: x.pend}).out
        """
    ).fetchone()[0]
    assert out != ["f", "a"], (
        "DuckDB fixed the struct-accumulator propagation bug — "
        "bpe_merge_pass can switch to the struct encoding"
    )
    assert out == ["a"]  # the observed stale-field behavior


def test_fixture_vocab_is_pipe_free(con):
    """The '|' separator is collision-free: fixture words are pure [a-z]
    (checked at every SF by construction scripts; re-pinned here at the
    test SF so a fixture change fails loudly)."""
    docs_pq = os.path.join(SF_DIR, "documents.parquet")
    n = con.sql(
        rf"""
        SELECT count(*) FROM (
            SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM read_parquet('{docs_pq}'))
        WHERE NOT regexp_full_match(w, '[a-z]+')
        """
    ).fetchone()[0]
    assert n == 0
