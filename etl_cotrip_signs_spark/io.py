"""Table loading and view registration.

The engine's catalog mirrors the driver's DuckDB view names
(``__spark_entry__.py``): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under an
``sf`` directory (TESTDATA.md).

Scale note: these are plain ``spark.read.parquet`` scans, so at cluster
scale each table is split by ``spark.sql.files.maxPartitionBytes`` and gets
predicate pushdown + column pruning from Catalyst for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import ensure_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; normalizes the `events.ts` nanos column to NTZ micros.

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark cannot read
    natively; we read it as raw nanos (legacy.parquet.nanosAsLong) and
    floor-convert to microseconds — the same instant DuckDB sees, truncated
    to Spark's timestamp precision.
    """
    ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def describe_table(spark: SparkSession, sf_dir: str, name: str):
    """Capabilities introspection (A7 analogue for the engine catalog):
    the StructType a source will produce, from metadata only — no data read
    beyond the parquet footer."""
    return load_table(spark, sf_dir, name).schema


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL entry points)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
