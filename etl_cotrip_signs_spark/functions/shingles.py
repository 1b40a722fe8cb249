"""Tokenization and shingling expressions shared by dedup/text operators.

Builtin-only: split / transform / sequence / concat compile into codegen.
A k-word shingle array for a doc with n tokens has n-k+1 members, built by
indexing a `sequence(0, n-k)` — no Python, no explode until needed.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the `documents.text` fixture is space-joined)."""
    return F.split(F.trim(text), r"\s+")


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingle strings, in document order; [] when fewer than k tokens."""
    w = tokens(text)
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


def distinct_shingles(text: Column, k: int = 3) -> Column:
    return F.array_distinct(word_shingles(text, k))
