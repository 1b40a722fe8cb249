"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting handles joins; for *aggregations* with a hot
group key the classic fix is salting: partial-aggregate on (key, salt) so
the hot key spreads over N reducers, then merge partials on key alone.
Merge-able aggregates only (count/sum/min/max) — exactly the ones whose
partials compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MERGE = {
    "count": F.sum,  # counts merge by summing
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs maps output column -> (fn, input column), fn in count/sum/min/max.
    Equivalent to ``df.groupBy(keys).agg(...)`` but immune to a single hot
    key saturating one reducer.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGE[fn](out).alias(out) for out, (fn, col) in aggs.items()]
    )
