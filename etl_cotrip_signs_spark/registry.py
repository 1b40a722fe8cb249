"""Query + oracle registry.

Every implemented operator registers a named query callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, the equivalent
ANSI SQL a DuckDB oracle can run on the same parquet tables. The driver
contract (``__spark_entry__.py``) is a thin re-export of these dicts.

Column-name discipline: the driver's compare sorts columns by name before
hashing, so the Spark DataFrame and the oracle SQL must produce identical
column names — every computed column is aliased on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        assert name not in QUERIES, f"duplicate query name {name!r}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module for side-effect registration."""
    from .operators import (  # noqa: F401
        relational,
        relational2,
        relational3,
        scalars,
        signs_queries,
        dedup,
        similarity,
        text,
        multimodal,
        mllib_variants,
        training,
    )
    from .streaming import queries as streaming_queries  # noqa: F401
