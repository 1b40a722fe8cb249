"""Pins for the round-6 wave-29 operators: the packing plan against a
python replay, the encoding audit's layout claim, the pivot round trip
against pandas, and keyset pagination's page algebra."""

from __future__ import annotations

import pandas as pd
import pytest

from etl_cotrip_signs_spark.operators.io_queries import (
    layout_encoding_audit,
    layout_packing_plan,
)
from etl_cotrip_signs_spark.operators.relational4 import keyset_pagination
from etl_cotrip_signs_spark.operators.spark4_surface import (
    reshape_pivot_unpivot,
)

from .conftest import SF_SMALL


def test_packing_plan_python_replay(spark):
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    groups = (
        docs.groupby(["source", "lang"]).size().reset_index(name="n")
    )
    groups = groups.sort_values(
        ["n", "source", "lang"], ascending=[False, True, True]
    ).reset_index(drop=True)
    cum_before = groups.n.cumsum().shift(fill_value=0)
    groups["bin_id"] = (cum_before // 120).astype(int)
    expect = (
        groups.groupby("bin_id")
        .agg(n_groups=("n", "size"), rows_packed=("n", "sum"))
        .reset_index()
    )
    out = (
        layout_packing_plan(spark, SF_SMALL)
        .toPandas()
        .sort_values("bin_id")
        .reset_index(drop=True)
    )
    assert list(out.bin_id) == list(expect.bin_id)
    assert list(out.n_groups) == list(expect.n_groups)
    assert list(out.rows_packed) == list(expect.rows_packed)
    # every group landed exactly once
    assert out.rows_packed.sum() == len(docs)


def test_encoding_audit_layout_claim(spark):
    out = (
        layout_encoding_audit(spark, SF_SMALL)
        .toPandas()
        .set_index("layout")
    )
    assert out.loc["sorted", "n_rows"] == out.loc["unsorted", "n_rows"]
    # sorted-within-partitions: at most n_distinct runs per file
    n_files = int(out.loc["sorted", "n_files"])
    assert out.loc["sorted", "n_runs_status"] <= 3 * n_files
    # the unsorted layout is materially worse — that's the operator's point
    assert (
        out.loc["unsorted", "n_runs_status"]
        > 5 * out.loc["sorted", "n_runs_status"]
    )


def test_pivot_unpivot_equals_direct(spark):
    out = (
        reshape_pivot_unpivot(spark, SF_SMALL)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
    ev["week"] = (
        pd.to_datetime(ev.ts).dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days // 7
    weekly = ev.groupby(["week", "event_type"]).size().reset_index(name="n")
    direct = weekly.groupby("event_type").agg(
        n_weeks_active=("n", "size"),
        total_events=("n", "sum"),
        peak_week_events=("n", "max"),
    )
    for et, row in direct.iterrows():
        assert out.loc[et, "n_weeks_active"] == row.n_weeks_active
        assert out.loc[et, "total_events"] == row.total_events
        assert out.loc[et, "peak_week_events"] == row.peak_week_events
    assert out.total_events.sum() == len(ev)


def test_keyset_pages_partition_cleanly(spark):
    out = (
        keyset_pagination(spark, SF_SMALL)
        .toPandas()
        .sort_values("page")
        .reset_index(drop=True)
    )
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    urgent = orders[orders.o_orderpriority == "1-URGENT"].sort_values(
        ["o_orderdate", "o_orderkey"]
    )
    pages = min(3, -(-len(urgent) // 100))
    assert len(out) == pages
    taken = urgent.head(300).reset_index(drop=True)
    for i, row in out.iterrows():
        chunk = taken.iloc[i * 100 : (i + 1) * 100]
        assert row["n_rows"] == len(chunk)
        assert row["first_key"] == chunk.o_orderkey.min()
        assert row["last_key"] == chunk.o_orderkey.max()
    # pages are disjoint and ordered: each page's tail precedes the next
    # page's head in the (date, key) total order
    for i in range(len(out) - 1):
        a = taken.iloc[(i + 1) * 100 - 1]
        b = taken.iloc[(i + 1) * 100]
        assert (a.o_orderdate, a.o_orderkey) < (b.o_orderdate, b.o_orderkey)
