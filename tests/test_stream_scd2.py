"""Slice-independence + replay-idempotence pins for the streaming SCD2
CDC-log merge (the properties the versioned-state + max-struct design
exists to guarantee; the DuckDB oracle covers the availableNow slicing,
these cover adversarial ones)."""

from __future__ import annotations

import shutil

import pandas as pd
from pyspark.sql import functions as F

from etl_cotrip_signs_spark.session import scratch_dir
from etl_cotrip_signs_spark.streaming.queries import (
    make_scd2_merge_fn,
    scd2_from_update_log,
)

from .conftest import SF_SMALL


def _events(spark):
    from etl_cotrip_signs_spark.io import load_table

    return (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
    )


def _run_slicing(spark, tag, slices):
    base = scratch_dir(tag, SF_SMALL)
    shutil.rmtree(base, ignore_errors=True)
    merge, read_ptr = make_scd2_merge_fn(base)
    for bid, df in enumerate(slices):
        merge(df, bid)
    final = read_ptr()
    hist = scd2_from_update_log(spark.read.parquet(final["dir"])).toPandas()
    return hist.sort_values(
        ["user_id", "valid_from_day"]
    ).reset_index(drop=True), merge, read_ptr, base


def test_history_is_slice_independent(spark):
    ev = _events(spark)
    one, _, _, _ = _run_slicing(spark, "scd2_test_one", [ev])
    # adversarial slicing: by event-id parity (interleaves days across
    # batches, so batch 1 contains updates EARLIER than some in batch 0)
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    two, _, _, _ = _run_slicing(spark, "scd2_test_two", [a, b])
    pd.testing.assert_frame_equal(one, two)
    # three slices by day modulus — different again
    s = [ev.filter(F.dayofmonth("ts") % 3 == k) for k in range(3)]
    three, _, _, _ = _run_slicing(spark, "scd2_test_three", s)
    pd.testing.assert_frame_equal(one, three)


def test_replayed_batch_is_noop(spark):
    ev = _events(spark)
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    hist, merge, read_ptr, base = _run_slicing(
        spark, "scd2_test_replay", [a, b]
    )
    before = read_ptr()
    merge(a, 0)  # replay of an already-committed batch
    assert read_ptr() == before
    # and even a FORCED re-merge of the same data converges (idempotent
    # algebra): merging batch b again under a new id changes nothing
    merge(b, 2)
    again = scd2_from_update_log(
        spark.read.parquet(read_ptr()["dir"])
    ).toPandas().sort_values(["user_id", "valid_from_day"]).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(hist, again)
