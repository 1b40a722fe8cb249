"""Physical-plan introspection helpers.

The engine's scale story rests on Catalyst choosing the right physical
strategy; these helpers make those choices *testable* (broadcast joins
stay broadcast, filters reach the parquet scan, codegen spans exist)
instead of hoped-for. Used by tests/test_plans.py and ad-hoc tuning.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The physical plan as `explain("formatted")` prints it."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_has(df: DataFrame, needle: str) -> bool:
    return needle in formatted_plan(df)


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        "expected a broadcast join in:\n" + plan
    )


def assert_pushed_filters(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert re.search(r"PushedFilters: \[[^\]]", plan), (
        "expected non-empty PushedFilters in:\n" + plan
    )


def assert_wholestage_codegen(df: DataFrame) -> None:
    # AQE's pre-execution plans omit codegen annotations in formatted mode;
    # the "codegen" explain mode prints the actual WholeStageCodegen subtrees.
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    plan = buf.getvalue()
    assert "WholeStageCodegen" in plan, "expected WholeStageCodegen spans in:\n" + plan


def node_count(df: DataFrame, op: str) -> int:
    """Number of physical-plan NODES of a given operator name.

    `formatted_plan(...).count(op)` over-counts: each node appears both in
    the tree sketch ("+- Window (9)") and as a detail header ("(9) Window").
    Count the detail headers only — exactly one per node.
    """
    return len(re.findall(rf"\(\d+\) {re.escape(op)}\b", formatted_plan(df)))
