"""Streaming CDC pipeline: availableNow replay, checkpoint resume,
crash-between-merge-and-checkpoint idempotence (FIXTURES.md §2)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from encode_ingest_spark.cdc import repo_file_events
from encode_ingest_spark.lake import LakeTable, merge_into
from encode_ingest_spark.streaming import CdcStreamPipeline
from encode_ingest_spark.streaming.pipeline import write_event_files

from tests.test_cdc_merge import SCHEMA, KEYS, assert_state_matches, table_state


@pytest.fixture()
def env(spark, tmp_path):
    table = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=8)
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    ev = repo_file_events(spark, n_keys=300, events_per_key=3, seed=42)
    return table, events_dir, ckpt, ev


def test_stream_available_now_matches_oracle(spark, env):
    table, events_dir, ckpt, ev = env
    write_event_files(ev, events_dir, n_files=5)
    pipe = CdcStreamPipeline(table, events_dir, ckpt, max_files_per_trigger=1)
    n = pipe.run_available_now(spark)
    assert n >= 2  # really processed multiple micro-batches
    assert_state_matches(table, ev.toPandas())
    # lineage: one row per merged epoch, no duplicates
    lin = table.lineage_df().toPandas()
    assert lin.batch_id.is_unique


def test_stream_restart_is_noop_then_processes_new_files(spark, env):
    table, events_dir, ckpt, ev = env
    pdf = ev.toPandas()
    half = len(pdf) // 2
    first = spark.createDataFrame(pdf.iloc[:half], ev.schema)
    second = spark.createDataFrame(pdf.iloc[half:], ev.schema)

    write_event_files(first, events_dir, n_files=3)
    pipe = CdcStreamPipeline(table, events_dir, ckpt, max_files_per_trigger=1)
    pipe.run_available_now(spark)
    state1 = table_state(table)
    v1 = table.current_version()

    # restart with no new data: checkpoint says all files consumed
    n = pipe.run_available_now(spark)
    assert n == 0
    assert table.current_version() == v1
    pd.testing.assert_frame_equal(table_state(table), state1)

    # append new files; only they are processed
    write_event_files(second, events_dir, n_files=3)
    n = pipe.run_available_now(spark)
    assert n >= 1
    assert_state_matches(table, pdf)


def test_crash_between_merge_and_checkpoint(spark, env):
    """The double-fence scenario: a merge commits but Spark dies before
    the checkpoint commit → on restart the same epoch replays with the
    same epoch_id → table fence skips it → state identical, lineage has
    no duplicate batch rows."""
    table, events_dir, ckpt, ev = env
    write_event_files(ev, events_dir, n_files=4)
    pipe = CdcStreamPipeline(table, events_dir, ckpt, max_files_per_trigger=1)

    crashed = {}

    orig_apply = pipe._apply_batch

    def crashing_apply(batch, epoch_id):
        orig_apply(batch, epoch_id)  # merge COMMITS to the table...
        if epoch_id == 1 and not crashed.get(1):
            crashed[1] = True
            raise RuntimeError("simulated crash after merge, before checkpoint")

    pipe._apply_batch = crashing_apply
    with pytest.raises(Exception):
        pipe.run_available_now(spark)

    # restart clean
    pipe._apply_batch = orig_apply
    pipe.run_available_now(spark)
    assert_state_matches(table, ev.toPandas())
    lin = table.lineage_df().toPandas()
    assert lin.batch_id.is_unique  # the replayed epoch didn't double-commit
    # and at least one merge was fenced off as a replay
    assert any(r.skipped for r in pipe.batch_results)


def test_stream_schema_evolution_between_runs(spark, env):
    """New column arrives in later files: stream restarted with the wider
    schema ALTERs then MERGEs; old rows null-filled."""
    table, events_dir, ckpt, ev = env
    pdf = ev.toPandas()
    first = spark.createDataFrame(pdf.iloc[:300], ev.schema)
    write_event_files(first, events_dir, n_files=2)
    pipe = CdcStreamPipeline(table, events_dir, ckpt, max_files_per_trigger=1)
    pipe.run_available_now(spark)

    # second wave with size_bytes, in a NEW directory/stream (schema of a
    # file stream is fixed at start — the restart picks up the new shape)
    wide_schema = T.StructType(
        list(ev.schema.fields) + [T.StructField("size_bytes", T.LongType(), True)]
    )
    wide = spark.createDataFrame(
        [
            (
                "insert",
                10_000_000,
                None,
                "org0/repo0",
                "src/0/brand-new.py",
                "f" * 40,
                "python",
                "print('hi')",
                4096,
            )
        ],
        wide_schema,
    )
    events_dir2 = events_dir + "_v2"
    ckpt2 = ckpt + "_v2"
    write_event_files(wide, events_dir2, n_files=1)
    pipe2 = CdcStreamPipeline(
        table, events_dir2, ckpt2, source_id="stream_v2", schema=wide_schema
    )
    pipe2.run_available_now(spark)

    dt = dict(table.read().dtypes)
    assert dt["size_bytes"] == "bigint"
    got = {r.path: r for r in table.read().filter(F.col("repo") == "org0/repo0").collect()}
    assert got["src/0/brand-new.py"].size_bytes == 4096


def test_rate_source_adapter_end_to_end(spark, tmp_path):
    """The Kafka-shaped unbounded-source adapter: rate-micro-batch
    offsets → shared CDC event exprs → same fence/merge machinery. Final
    table state must equal the batch generator's replay oracle."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from encode_ingest_spark.cdc import dedupe_latest, repo_file_events
    from encode_ingest_spark.lake import LakeTable
    from encode_ingest_spark.streaming.pipeline import CdcStreamPipeline

    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t"), schema, ["repo", "path", "commit"], num_buckets=4
    )
    n_keys, epk = 300, 3
    pipe = CdcStreamPipeline(
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        source="rate",
        rate_opts={"n_keys": n_keys, "events_per_key": epk, "rows_per_batch": 300},
    )
    query = (
        pipe._stream_df(spark)
        .writeStream.foreachBatch(pipe._apply_batch)
        .option("checkpointLocation", pipe.checkpoint_dir)
        .start()
    )
    import time

    n_batches_needed = (n_keys * epk) // 300  # dense offsets, 300/batch
    try:
        deadline = time.time() + 120
        while time.time() < deadline and len(pipe.batch_results) < n_batches_needed:
            time.sleep(0.5)
    finally:
        query.stop()
        query.awaitTermination(30)

    # oracle: batch replay of the same deterministic stream
    events = repo_file_events(spark, n_keys=n_keys, events_per_key=epk, seed=42)
    latest = dedupe_latest(events, ["repo", "path", "commit"], "event_seq")
    want = {
        tuple(r)
        for r in latest.filter(F.col("op") != "delete")
        .select("repo", "path", "commit", "content")
        .collect()
    }
    got = {
        tuple(r)
        for r in table.read().select("repo", "path", "commit", "content").collect()
    }
    assert got == want


def test_streaming_mor_mode_with_auto_compaction(spark, tmp_path):
    """The pipeline's merge-on-read flag end-to-end: availableNow drain
    with mode='mor' + auto-compaction; final state equals a COW replay."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from encode_ingest_spark.cdc import repo_file_events
    from encode_ingest_spark.lake import LakeTable, merge_into
    from encode_ingest_spark.streaming.pipeline import (
        CdcStreamPipeline,
        write_event_files,
    )

    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t"), schema, ["repo", "path", "commit"], num_buckets=4
    )
    events = repo_file_events(spark, n_keys=400, events_per_key=3, seed=29)
    write_event_files(events, str(tmp_path / "ev"), n_files=4)
    pipe = CdcStreamPipeline(
        table, str(tmp_path / "ev"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1, merge_mode="mor", mor_compact_threshold=2,
    )
    merged = pipe.run_available_now(spark)
    assert merged >= 2
    # auto-compaction kept every bucket's delta count bounded (the
    # threshold is per bucket)
    per_bucket: dict[int, int] = {}
    for f in table.current_manifest().files:
        if f.is_delta:
            per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + 1
    assert max(per_bucket.values(), default=0) <= 2

    cow = LakeTable.create(
        spark, str(tmp_path / "cow"), schema, ["repo", "path", "commit"], num_buckets=4
    )
    merge_into(cow, events, batch_id=1)
    key = ["repo", "path", "commit", "content"]
    assert ({tuple(r) for r in table.read().select(*key).collect()}
            == {tuple(r) for r in cow.read().select(*key).collect()})


def test_streaming_progress_listener_metrics(spark, tmp_path):
    """SURVEY §2.9 observability: run_available_now(collect_metrics=True)
    captures per-epoch engine metrics (input rows, durations) alongside
    the lineage the merges commit."""
    from pyspark.sql import types as T

    from encode_ingest_spark.cdc import repo_file_events
    from encode_ingest_spark.lake import LakeTable
    from encode_ingest_spark.streaming.pipeline import (
        CdcStreamPipeline,
        write_event_files,
    )

    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t"), schema, ["repo", "path", "commit"],
        num_buckets=4,
    )
    ev = repo_file_events(spark, n_keys=100, events_per_key=2, seed=67)
    write_event_files(ev, str(tmp_path / "ev"), n_files=2)
    pipe = CdcStreamPipeline(
        table, str(tmp_path / "ev"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    merged = pipe.run_available_now(spark, collect_metrics=True)
    assert merged >= 1
    rows_seen = sum(p["num_input_rows"] for p in pipe.progress)
    assert rows_seen == 200  # every event observed by the engine
    assert all("triggerExecution" in p["duration_ms"] for p in pipe.progress
               if p["num_input_rows"] > 0)


def test_stream_local_commit_trickle_matches_oracle(spark, env):
    """local_commit_cap: micro-batches land as driver-local MOR deltas
    (merge_small_batch) — same final state, exactly-once across a
    checkpoint-preserving restart, lineage intact."""
    table, events_dir, ckpt, ev = env
    write_event_files(ev, events_dir, n_files=5)
    pipe = CdcStreamPipeline(
        table, events_dir, ckpt, max_files_per_trigger=1,
        local_commit_cap=2000,
    )
    n = pipe.run_available_now(spark)
    assert n >= 2
    # the trickle batches (300 keys / 5 files) are under the cap: every
    # committed batch must be a LOCAL delta commit, not a COW rewrite
    assert any(f.is_delta for f in table.current_manifest().files)
    assert_state_matches(table, ev.toPandas())
    lin = table.lineage_df().toPandas()
    assert lin.batch_id.is_unique
    # restart on the same checkpoint: nothing new → no movement
    v = table.current_version()
    pipe2 = CdcStreamPipeline(
        table, events_dir, ckpt, max_files_per_trigger=1,
        local_commit_cap=2000,
    )
    pipe2.run_available_now(spark)
    assert table.current_version() == v
    assert_state_matches(table, ev.toPandas())


def test_stream_local_commit_over_cap_falls_back(spark, env):
    """Batches above the cap take the distributed MOR merge; state is
    identical either way."""
    table, events_dir, ckpt, ev = env
    write_event_files(ev, events_dir, n_files=2)
    pipe = CdcStreamPipeline(
        table, events_dir, ckpt, max_files_per_trigger=1,
        local_commit_cap=10,
    )
    pipe.run_available_now(spark)
    assert_state_matches(table, ev.toPandas())
