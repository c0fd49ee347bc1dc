"""applyInPandasWithState change-log compaction: cross-batch stale-event
suppression with state in the Spark checkpoint."""

import pandas as pd
from pyspark.sql import functions as F

from encode_ingest_spark.streaming.stateful import compact_changelog
from encode_ingest_spark.streaming import EVENT_SCHEMA
from encode_ingest_spark.streaming.pipeline import write_event_files
from encode_ingest_spark.cdc import repo_file_events


def _run_compaction(spark, events_dir, ckpt, out_dir):
    """foreachBatch sink (checkpoint-recoverable, unlike memory sink);
    returns the emissions of THIS run as a DataFrame."""
    import os

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    compacted = compact_changelog(stream, ["repo", "path", "commit"], "event_seq")

    def sink(batch, epoch_id):
        batch.withColumn("_epoch", F.lit(int(epoch_id))).write.mode("append").parquet(
            out_dir
        )

    q = (
        compacted.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if not os.path.exists(out_dir):
        from pyspark.sql import types as T

        sch = T.StructType(list(EVENT_SCHEMA.fields) + [T.StructField("_epoch", T.LongType())])
        return spark.createDataFrame([], sch)
    return spark.read.parquet(out_dir)


def test_compaction_emits_only_new_winners(spark, tmp_path):
    ev = repo_file_events(spark, n_keys=100, events_per_key=3, seed=42)
    events_dir, ckpt = str(tmp_path / "ev"), str(tmp_path / "ck")
    write_event_files(ev, events_dir, n_files=4)

    out = _run_compaction(spark, events_dir, ckpt, str(tmp_path / "out1")).toPandas()
    # per key: emissions strictly increase across epochs (no stale emission)
    bad = 0
    for _, grp in out.groupby(["repo", "path", "commit"]):
        seqs = grp.sort_values("_epoch")["event_seq"].tolist()
        if sorted(seqs) != seqs or len(set(seqs)) != len(seqs):
            bad += 1
    assert bad == 0
    # final winner per key matches the raw stream's max seq
    raw = ev.toPandas()
    want = raw.groupby(["repo", "path", "commit"])["event_seq"].max()
    got = out.groupby(["repo", "path", "commit"])["event_seq"].max()
    pd.testing.assert_series_equal(got.sort_index(), want.sort_index())
    # and compaction actually dropped stale events (3 per key delivered)
    assert len(out) < len(raw)


def test_compaction_state_survives_restart(spark, tmp_path):
    """Second run over NEW files only passes events newer than the
    checkpointed per-key watermark."""
    ev = repo_file_events(spark, n_keys=50, events_per_key=3, seed=42)
    pdf = ev.toPandas().sort_values("event_seq").reset_index(drop=True)
    hi = pdf[pdf.event_seq >= pdf.event_seq.median()]
    lo = pdf[pdf.event_seq < pdf.event_seq.median()]

    events_dir, ckpt = str(tmp_path / "ev"), str(tmp_path / "ck")
    # wave 1: the HIGH half arrives first
    write_event_files(spark.createDataFrame(hi, ev.schema), events_dir, n_files=2)
    out1 = _run_compaction(spark, events_dir, ckpt, str(tmp_path / "outA")).count()
    assert out1 > 0

    # wave 2: the LOW (stale) half arrives late → all suppressed by state
    write_event_files(spark.createDataFrame(lo, ev.schema), events_dir, n_files=2)
    out_all = _run_compaction(spark, events_dir, ckpt, str(tmp_path / "outB"))
    # memory sink of the SECOND run contains only second-run emissions
    stale_emitted = out_all.join(
        spark.createDataFrame(lo, ev.schema).select("repo", "path", "commit", "event_seq"),
        ["repo", "path", "commit", "event_seq"],
        "inner",
    ).count()
    assert stale_emitted == 0


def test_pipeline_with_compaction_matches_oracle(spark, tmp_path):
    """CdcStreamPipeline(compact=True): stateful pre-filter + MERGE ends
    at the same state as the uncompacted pipeline, and replay after a
    simulated crash does not hang on the no-job fence-skip path."""
    from pyspark.sql import types as T

    from encode_ingest_spark.lake import LakeTable
    from encode_ingest_spark.streaming import CdcStreamPipeline
    from tests.test_cdc_merge import SCHEMA, KEYS, assert_state_matches

    table = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=8)
    ev = repo_file_events(spark, n_keys=150, events_per_key=3, seed=42)
    write_event_files(ev, str(tmp_path / "ev"), n_files=4)
    pipe = CdcStreamPipeline(
        table, str(tmp_path / "ev"), str(tmp_path / "ck"),
        max_files_per_trigger=1, compact=True,
    )
    pipe.run_available_now(spark)
    assert_state_matches(table, ev.toPandas())

    # lost checkpoint → full replay: every epoch fence-skips (no merge
    # job) — the materialization guard must keep the query advancing
    import shutil

    shutil.rmtree(str(tmp_path / "ck"))
    pipe2 = CdcStreamPipeline(
        table, str(tmp_path / "ev"), str(tmp_path / "ck"),
        max_files_per_trigger=1, compact=True,
    )
    n = pipe2.run_available_now(spark, timeout_sec=240)
    assert n == 0 and any(r.skipped for r in pipe2.batch_results)
    assert_state_matches(table, ev.toPandas())
