"""File sinks: partitioned parquet / JSON-lines writes.

Partitioning columns are the engine's pruning contract: downstream reads
that filter on a partition column never touch the other directories
(dynamic partition pruning at join time). Low-cardinality columns only —
a high-cardinality partitionBy creates a small-file storm at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
