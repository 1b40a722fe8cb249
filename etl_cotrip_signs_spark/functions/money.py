"""Exact fixed-point aggregation helpers for monetary columns.

Parallel double summation is order-nondeterministic in the low bits, so a
`round(sum(double), 2)` can land on a rounding boundary differently per
run/engine. The fix is the classic one: sum in DECIMAL. Per-row values are
(deterministically) rounded to a fixed scale in double, cast to
DECIMAL(18,s), summed exactly (order-independent), and only the final
exact sum is cast back to double for output. The DuckDB oracles mirror the
same construction, so both engines round the same rational number.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def fixed(expr: Column, scale: int = 2) -> Column:
    """Per-row fixed-point value: round (deterministic per value) + decimal."""
    if scale > 0:
        expr = F.round(expr, scale)
    return expr.cast(f"decimal(18,{scale})")


def sum_fixed(expr: Column, scale: int = 2, out_scale: int = 2) -> Column:
    """Exact decimal sum → double, rounded for output."""
    return F.round(F.sum(fixed(expr, scale)).cast("double"), out_scale)


def avg_fixed(expr: Column, scale: int = 2, out_scale: int = 4) -> Column:
    """Exact decimal sum / count → double, rounded for output."""
    return F.round(
        F.sum(fixed(expr, scale)).cast("double") / F.count(F.lit(1)), out_scale
    )


def sql_sum_fixed(sql_expr: str, scale: int = 2, out_scale: int = 2) -> str:
    """DuckDB mirror of sum_fixed."""
    inner = f"round({sql_expr}, {scale})" if scale > 0 else sql_expr
    return (
        f"round(CAST(sum(CAST({inner} AS DECIMAL(18,{scale}))) AS DOUBLE), {out_scale})"
    )


def sql_avg_fixed(sql_expr: str, scale: int = 2, out_scale: int = 4) -> str:
    """DuckDB mirror of avg_fixed."""
    inner = f"round({sql_expr}, {scale})" if scale > 0 else sql_expr
    return (
        f"round(CAST(sum(CAST({inner} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / count(*), {out_scale})"
    )
