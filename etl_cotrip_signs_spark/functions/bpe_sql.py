"""BPE tokenizer inference as DuckDB SQL, for the text_bpe_apply oracle.

Round 2's adjudication ("the iterative merge loop is not SQL-expressible")
was wrong, for the same reason pack_sequences_greedy's was: the loop state
has a flat encoding. Two observations make the replay exact:

1. **Only single-char tokens can ever merge.** The learned rank table
   (top-32 adjacent-char pairs) contains only 2-character strings, and the
   rank lookup keys on the *concatenation* of two adjacent tokens — so a
   pair can match only when both tokens are single characters. Merged
   tokens are inert. Hence the best-rank-first loop in
   ``text.bpe_apply_word`` is *exactly equivalent* to iterating the 32
   merges once each, in rank order, applying each to all occurrences
   (a lower-ranked pair can never reappear after a higher-ranked pass,
   because merging removes single chars and never creates them). Pinned
   by a 6,000-case randomized cross-check in tests/test_bpe_sql.py.

2. **One merge pass is a left-to-right fold**, the soundex-macro trick:
   a single VARCHAR accumulator holding the emitted tokens joined by
   ``'|'``, where a trailing ``'|'`` marks "last token closed by a merge"
   (merged tokens must not chain: 'aaa' + merge 'aa' -> ['aa','a']).
   The fixture vocabulary is pure ``[a-z]`` at every SF (checked), so
   ``'|'`` is collision-free.

Why a VARCHAR and not a STRUCT accumulator: DuckDB 1.0's ``list_reduce``
does not propagate STRUCT accumulator *fields* across iterations — a
``{out: acc.out || [x], pend: ...}`` fold reads a stale ``acc.out`` from
the original list element, silently yielding only the final append. This
is the same engine-bug family as the identity-branch aliasing pinned in
tests/test_phonetic_sql.py; minimal repro pinned in
tests/test_bpe_sql.py::test_duckdb_list_reduce_struct_accumulator.

Reference parity: dfpc-coe/etl-cotrip-signs has no tokenizer (task.ts is a
123-line sign ETL); this is part of the LLM-pipeline extension surface.
"""

from __future__ import annotations

_N_MERGES = 32

BPE_MACROS = r"""
CREATE OR REPLACE MACRO bpe_merge_pass(toks0, p) AS
CASE WHEN p IS NULL OR len(CAST(toks0 AS VARCHAR[])) < 2
     THEN CAST(toks0 AS VARCHAR[]) ELSE
  string_split(rtrim(list_reduce(CAST(toks0 AS VARCHAR[]),
    -- acc = tokens emitted so far, '|'-joined; trailing '|' = last token
    -- was just merged (closed). Every branch CONCATENATES (never returns
    -- acc unchanged) so the DuckDB 1.0 identity-aliasing bug can't bite.
    (acc, x) -> CASE
      WHEN ends_with(acc, '|') THEN acc || x
      WHEN (acc = substr(p, 1, 1) OR ends_with(acc, '|' || substr(p, 1, 1)))
           AND x = substr(p, 2, 1) THEN acc || x || '|'
      ELSE acc || '|' || x
    END), '|'), '|')
END;
"""


def bpe_apply_oracle(n_merges: int = _N_MERGES) -> str:
    """The full text_bpe_apply oracle: learn top-``n_merges`` merges
    (identical ORDER BY n DESC, pair tie-break as the Spark side), replay
    the merge loop over the DISTINCT vocabulary via ``n_merges`` chained
    fold stages, then join token counts back onto the per-doc word list.

    The unroll is the kmeans_lloyd_exact / graph_pagerank_exact pattern:
    a fixed iteration count makes an iterative algorithm a straight-line
    query. Stage r applies merge r (NULL-guarded when fewer than
    ``n_merges`` pairs exist in the corpus)."""
    stages = [
        "s0 AS (SELECT w, string_split(w, '') AS toks, ms FROM vocab, merges)"
    ]
    for r in range(1, n_merges + 1):
        stages.append(
            f"s{r} AS (SELECT w, bpe_merge_pass(toks, CASE WHEN len(ms) >= {r} "
            f"THEN ms[{r}] ELSE NULL END) AS toks, ms FROM s{r - 1})"
        )
    chain = ",\n".join(stages)
    return (
        BPE_MACROS
        + rf"""
    WITH words0 AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents
    ),
    merges AS (
        SELECT list(pair ORDER BY n DESC, pair) AS ms FROM (
            SELECT substr(w, i, 2) AS pair, count(*) AS n
            FROM words0, unnest(range(1, len(w))) AS t(i)
            WHERE len(w) >= 2
            GROUP BY pair ORDER BY n DESC, pair LIMIT {n_merges})
    ),
    vocab AS (SELECT DISTINCT w FROM words0),
    {chain},
    bpelen AS (SELECT w, len(toks) AS n_bpe FROM s{n_merges}),
    docw AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents
    )
    SELECT doc_id,
           CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(count(*) AS BIGINT) AS n_words
    FROM docw JOIN bpelen USING (w)
    GROUP BY doc_id
    """
    )
