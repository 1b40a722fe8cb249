"""Tokenization and shingling expressions shared by dedup/text operators.

Builtin-only: split / transform / sequence / concat compile into codegen.

PERFORMANCE CONTRACT: build shingles from a *materialized token column*
(`tokens(...)` projected in a prior select), not inline from text. Catalyst
inlines a shared subexpression into every use site, so an inline
`shingles(tokens(text))` re-runs the regex split once per element_at — a
~100× blowup measured at sf0.1. The two-step form computes the split once
per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the `documents.text` fixture is space-joined)."""
    return F.split(F.trim(text), r"\s+")


def shingles_from_tokens(w: Column, k: int = 3) -> Column:
    """k-word shingles from a (materialized) token-array column."""
    n = F.size(w)
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )


def with_shingles(
    df: DataFrame, text_col: str = "text", out_col: str = "shingles", k: int = 3
) -> DataFrame:
    """df + a distinct-shingle array column, tokens materialized once per row."""
    keep = [c for c in df.columns]
    return (
        df.withColumn("__tokens", tokens(F.col(text_col)))
        .select(*keep, F.array_distinct(shingles_from_tokens(F.col("__tokens"), k)).alias(out_col))
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Inline shingles straight from text. Convenient for tests/small data;
    use `with_shingles` in operator hot paths (see module docstring)."""
    return shingles_from_tokens(tokens(text), k)


def distinct_shingles(text: Column, k: int = 3) -> Column:
    """Inline distinct shingles; same caveat as `word_shingles`."""
    return F.array_distinct(word_shingles(text, k))
