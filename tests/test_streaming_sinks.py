"""foreachBatch sink + misc DataFrame-ops unit tests (unionByName,
sortWithinPartitions, LSH/IVF sanity)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from etl_cotrip_signs_spark.io import load_table
from etl_cotrip_signs_spark.streaming.queries import read_events_stream

from .conftest import SF_SMALL


def test_foreach_batch_sink_writes_parquet(spark, tmp_path):
    out = str(tmp_path / "batches")
    os.makedirs(out)

    def sink(batch_df, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(os.path.join(out, f"epoch={epoch_id}"))

    agg = (
        read_events_stream(spark, SF_SMALL)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    written = spark.read.parquet(*glob.glob(os.path.join(out, "epoch=*")))
    batch_truth = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r["event_type"]: r["n"] for r in written.collect()}
    assert got == batch_truth


def test_union_by_name_reorders_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id long, name string")
    b = spark.createDataFrame([("y", 2)], "name string, id long")
    out = a.unionByName(b).collect()
    assert {(r["id"], r["name"]) for r in out} == {(1, "x"), (2, "y")}


def test_union_by_name_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id long, name string")
    b = spark.createDataFrame([(2,)], "id long")
    out = a.unionByName(b, allowMissingColumns=True).collect()
    assert {(r["id"], r["name"]) for r in out} == {(1, "x"), (2, None)}


def test_sort_within_partitions_is_local(spark):
    df = (
        load_table(spark, SF_SMALL, "orders")
        .repartition(4, "o_custkey")
        .sortWithinPartitions("o_totalprice")
    )
    # each partition individually sorted; global order not implied
    def check(it):
        prev = None
        for row in it:
            if prev is not None:
                assert row["o_totalprice"] >= prev
            prev = row["o_totalprice"]
        return iter([])

    df.rdd.mapPartitions(lambda it: check(it)).count()


def test_transform_with_state_always_registered(spark):
    """The TWS query name must exist regardless of runtime support: either
    the real stateful query or the capability-waiver stub (which names the
    missing dependency)."""
    from etl_cotrip_signs_spark import registry
    from etl_cotrip_signs_spark.streaming.queries import HAS_TWS

    registry.load_all()
    assert "stream_transform_with_state" in registry.QUERIES
    df = registry.QUERIES["stream_transform_with_state"](
        spark, "/root/testdata/sf0.001"
    )
    rows = df.collect()
    if HAS_TWS:
        assert len(rows) > 1  # real per-user aggregates
    else:
        assert len(rows) == 1
        assert rows[0]["available"] is False
        assert "protobuf" in rows[0]["reason"]


def test_foreach_batch_upsert_multi_batch_merge(spark, tmp_path):
    """Force MULTIPLE micro-batches (one file each) so the upsert's merge
    branch runs: later batches must add counts and replace last_value only
    when their (ts, event_id) key is later. Final state == batch argmax."""
    from pyspark.sql import functions as F

    from etl_cotrip_signs_spark.streaming.queries import run_foreach_batch_upsert

    rows = [
        # (event_id, ts_str, user_id, value)  — user 1 spans all 3 files
        (1, "2024-01-01 00:00:00", 1, 10.0),
        (2, "2024-01-01 00:01:00", 2, 20.0),
        (3, "2024-01-01 00:02:00", 1, 30.0),
        (4, "2024-01-01 00:00:30", 3, 40.0),
        (5, "2024-01-01 00:03:00", 1, 50.0),
        # same ts as event 5: event_id tiebreak picks 6
        (6, "2024-01-01 00:03:00", 1, 60.0),
    ]
    src = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    data_dir = tmp_path / "events_files"
    for i, chunk in enumerate(([rows[0], rows[1]], [rows[2], rows[3]], [rows[4], rows[5]])):
        spark.createDataFrame(
            chunk, "event_id long, ts string, user_id long, value double"
        ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(data_dir / f"part{i}"))
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(data_dir))
    )
    out = run_foreach_batch_upsert(stream, str(tmp_path / "fb")).toPandas()
    got = {int(r.user_id): (int(r.n_events), float(r.last_value)) for r in out.itertuples()}
    assert got == {1: (4, 60.0), 2: (1, 20.0), 3: (1, 40.0)}


def test_foreach_batch_upsert_replay_idempotent(spark, tmp_path):
    """A replayed batch_id must be a no-op: invoke the upsert directly with
    the same (df, batch_id) twice — counts must not double — and a replay
    of an OLD batch after newer ones must not regress the pointer."""
    from pyspark.sql import functions as F

    from etl_cotrip_signs_spark.streaming.queries import make_upsert_fn

    def batch(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, value double"
        ).withColumn("ts", F.to_timestamp("ts"))

    b0 = batch([(1, "2024-01-01 00:00:00", 1, 10.0), (2, "2024-01-01 00:01:00", 2, 20.0)])
    b1 = batch([(3, "2024-01-01 00:02:00", 1, 30.0)])
    upsert, read_ptr = make_upsert_fn(str(tmp_path / "fb"))
    upsert(b0, 0)
    upsert(b0, 0)  # crash-recovery replay of the same batch
    upsert(b1, 1)
    upsert(b0, 0)  # stale replay arriving after newer state
    assert read_ptr()["batch"] == 1
    state = spark.read.parquet(read_ptr()["dir"]).toPandas()
    got = {int(r.user_id): (int(r.n_events), float(r.last_value)) for r in state.itertuples()}
    assert got == {1: (2, 30.0), 2: (1, 20.0)}


def test_incremental_dedup_first_arrival_wins(spark, tmp_path):
    """Online dedup gate semantics: the FIRST-ARRIVED copy of a text
    survives, even when a later batch carries a lower doc_id duplicate;
    within a batch the lowest doc_id wins."""
    from etl_cotrip_signs_spark.streaming.queries import run_incremental_dedup

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    batches = [
        # batch 0: doc 10 ("aaa") and doc 11 ("bbb"); doc 12 duplicates
        # "aaa" within the batch (higher id -> dropped)
        [(10, "aaa", "en", "s", 3), (11, "bbb", "en", "s", 3), (12, "aaa", "en", "s", 3)],
        # batch 1: doc 5 duplicates "aaa" with a LOWER id -> still dropped
        # (first arrival won); doc 6 is new
        [(5, "aaa", "en", "s", 3), (6, "ccc", "de", "s", 3)],
    ]
    data_dir = tmp_path / "docs"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(data_dir / f"part{i}"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(data_dir))
    )
    out = run_incremental_dedup(stream, str(tmp_path / "state")).toPandas()
    got = {r.lang: (int(r.n_kept), int(r.first_doc_id)) for r in out.itertuples()}
    # kept: doc 10 ("aaa", first arrival), doc 11 ("bbb"), doc 6 ("ccc")
    assert got == {"en": (2, 10), "de": (1, 6)}


def test_versioned_state_gc_keeps_current_plus_predecessor(spark, tmp_path):
    """commit_version must garbage-collect superseded state_b* directories
    (unbounded growth on a long-running stream otherwise): after batch N
    commits, only versions N and N-1 remain on disk."""
    import os

    from pyspark.sql import functions as F

    from etl_cotrip_signs_spark.streaming.queries import make_upsert_fn

    def batch(eid, uid):
        return spark.createDataFrame(
            [(eid, "2024-01-01 00:00:00", uid, 1.0)],
            "event_id long, ts string, user_id long, value double",
        ).withColumn("ts", F.to_timestamp("ts"))

    base = str(tmp_path / "fb")
    upsert, read_ptr = make_upsert_fn(base)
    for i in range(5):
        upsert(batch(i, i), i)
    dirs = sorted(d for d in os.listdir(base) if d.startswith("state_b"))
    assert dirs == ["state_b3", "state_b4"], dirs
    assert read_ptr() == {"batch": 4, "dir": f"{base}/state_b4"}
    # the referenced (current) version must still be fully readable
    assert spark.read.parquet(read_ptr()["dir"]).count() == 5


def test_stream_left_join_supersets_inner(spark):
    """The LEFT OUTER stream-stream join must (a) contain exactly the
    inner join's rows as its matched subset and (b) only emit a
    null-signup row when the watermark proved no match could arrive —
    i.e. the purchase is older than (max ts - watermark delay - join
    interval)."""
    from etl_cotrip_signs_spark import registry
    from etl_cotrip_signs_spark.io import load_table

    from .conftest import SF_SMALL

    registry.load_all()
    left = registry.QUERIES["stream_stream_left_join"](spark, SF_SMALL).toPandas()
    inner = registry.QUERIES["stream_stream_join"](spark, SF_SMALL).toPandas()

    key = ["purchase_id", "signup_id", "user_id", "purchase_s", "purchase_value"]
    matched = left[left["signup_id"].notna()].copy()
    matched["signup_id"] = matched["signup_id"].astype("int64")
    assert (
        sorted(map(tuple, matched[key].itertuples(index=False, name=None)))
        == sorted(map(tuple, inner[key].itertuples(index=False, name=None)))
    )

    import pandas as pd

    ev = load_table(spark, SF_SMALL, "events")
    max_s = ev.agg(F.unix_timestamp(F.max("ts"))).first()[0]
    unmatched = left[left["signup_id"].isna()]
    # eviction boundary: watermark (max ts - 30 min) minus the 1 h interval
    assert (unmatched["purchase_s"] <= max_s - 1800 - 3600 + 1).all()
    # and no purchase may appear both matched and unmatched
    assert not set(matched["purchase_id"]) & set(unmatched["purchase_id"])


def test_stream_datasource_writer_manifest_gates_reads(spark):
    """Exactly-once falls out of the manifest protocol: staged files not
    listed in a per-batch manifest (a crashed/replayed task's leftovers)
    are invisible to the committed read-back."""
    from etl_cotrip_signs_spark import registry
    from etl_cotrip_signs_spark.session import scratch_dir
    from etl_cotrip_signs_spark.sinks.stream_jsonl import committed_files

    registry.load_all()
    before = registry.QUERIES["stream_datasource_writer_sink"](
        spark, SF_SMALL
    ).toPandas()
    out_dir = f"{scratch_dir('stream_ds_sink', SF_SMALL)}/data"
    committed = set(committed_files(out_dir))
    staged = set(glob.glob(f"{out_dir}/staged_*.jsonl"))
    assert committed and committed <= staged
    # Plant an orphan staging file (what an aborted task leaves behind).
    orphan = os.path.join(out_dir, "staged_deadbeefdead.jsonl")
    with open(orphan, "w") as fh:
        fh.write('{"event_id": "x", "event_type": "view", "cents": 1}\n')
    assert orphan not in set(committed_files(out_dir))
    # Re-reading through the manifests reproduces the same aggregate.
    back = (
        spark.read.schema("event_id string, event_type string, cents long")
        .json(committed_files(out_dir))
        .groupBy("event_type")
        .count()
    ).toPandas()
    assert int(back["count"].sum()) == int(before.n_events.sum())


def test_bitmap_merge_multi_batch_and_replay(spark, tmp_path):
    """Bitmap merge across batches: users split across micro-batches and
    weeks must union exactly; a replayed batch_id is a no-op (and would
    be harmless anyway — bit_or is idempotent)."""
    from pyspark.sql import functions as F

    from etl_cotrip_signs_spark.streaming.queries import make_bitmap_merge_fn

    def batch(rows):
        return spark.createDataFrame(rows, "ts string, user_id long").withColumn(
            "ts", F.to_timestamp("ts")
        )

    # epoch week of 2024-01-01 (19723 days // 7 = 2817); 2024-01-08 is next
    b0 = batch([("2024-01-01 00:00:00", 1), ("2024-01-01 01:00:00", 64)])
    b1 = batch([("2024-01-01 02:00:00", 1), ("2024-01-08 00:00:00", 2)])
    merge, read_ptr = make_bitmap_merge_fn(str(tmp_path / "bm"))
    merge(b0, 0)
    merge(b0, 0)  # replay
    merge(b1, 1)
    merge(b0, 0)  # stale replay
    assert read_ptr()["batch"] == 1
    state = spark.read.parquet(read_ptr()["dir"])
    out = (
        state.groupBy("week")
        .agg(F.expr("CAST(sum(bit_count(word)) AS BIGINT)").alias("n"))
        .toPandas()
        .set_index("week")["n"]
        .to_dict()
    )
    # week of Jan 1: users {1, 64} (user 1 seen twice, counted once);
    # week of Jan 8: user {2}
    weeks = sorted(out)
    assert len(weeks) == 2
    assert out[weeks[0]] == 2 and out[weeks[1]] == 1
    # user 64 lands in bucket 1 (64 DIV 63), user 1 in bucket 0
    buckets = {
        (int(r.week), int(r.bucket)) for r in state.collect()
    }
    assert (weeks[0], 0) in buckets and (weeks[0], 1) in buckets
