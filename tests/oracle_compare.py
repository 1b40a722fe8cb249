"""Local replica of the driver's Spark-vs-DuckDB comparison.

Row-count + column-name + order-insensitive value comparison (floats to a
tolerance) so oracle drift is caught in `pytest` before the driver runs.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from etl_cotrip_signs_spark.io import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.sql(sql).df()


def _norm_cell(v):
    import datetime

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        return f"{v:.9g}" if abs(v) < 1e15 else f"{v:.0f}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return pd.Timestamp(v).isoformat()
    return str(v)


def canonical(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spdf) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spdf)} oracle={len(oracle_pdf)}")
    a, b = canonical(spdf), canonical(oracle_pdf)
    if a != b:
        only_spark = [r for r in a if r not in set(b)][:3]
        only_oracle = [r for r in b if r not in set(a)][:3]
        problems.append(
            f"values differ; spark-only sample={only_spark} oracle-only sample={only_oracle}"
        )
    return problems
