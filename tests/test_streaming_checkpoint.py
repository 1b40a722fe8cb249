"""Streaming durability: checkpointed parquet sink + restart recovery.

The exactly-once story at scale: the file sink commits atomically through
the checkpoint's write-ahead log, and a restarted query resumes from the
checkpoint without reprocessing (no duplicate output)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_cotrip_signs_spark.io import load_table
from etl_cotrip_signs_spark.streaming.queries import read_events_stream

from .conftest import SF_SMALL


def _run(stream_df, out, ckpt):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()


def test_checkpointed_parquet_sink_exactly_once(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events = read_events_stream(spark, SF_SMALL).select(
        "event_id", "user_id", "event_type"
    )

    _run(events, out, ckpt)
    n_total = load_table(spark, SF_SMALL, "events").count()
    assert spark.read.parquet(out).count() == n_total
    assert os.path.isdir(os.path.join(ckpt, "commits"))

    # restart against the same checkpoint: no new input -> no duplicates
    events2 = read_events_stream(spark, SF_SMALL).select(
        "event_id", "user_id", "event_type"
    )
    _run(events2, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == n_total
    assert got.select("event_id").distinct().count() == n_total
