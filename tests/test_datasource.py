"""Spark-native DataSource adapters (lake / lake_changes formats).

Pins the PySpark-4 Python DataSource surface: batch snapshot reads
(time-travel, tags, branches) through ``spark.read.format("lake")`` and
the native Structured Streaming changelog tail through
``spark.readStream.format("lake_changes")`` — offset semantics (table
versions), exactly-once across checkpoint restart, per-commit span
parity with ``read_changes``, pinned-schema behavior under evolution,
and the explicit rebucket-boundary refusal.
"""

import tempfile
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from encode_ingest_spark.lake import LakeTable, merge_into
from encode_ingest_spark.lake.datasource import (
    CHANGE_COL,
    register_lake_sources,
)

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)
KEYS = ["repo", "path"]


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_lake_sources(spark)


def _mk(spark, tmp_path, buckets=4, schema=SCHEMA):
    return LakeTable.create(
        spark, str(tmp_path / "t"), schema, KEYS, num_buckets=buckets
    )


def _b(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, lang string, content string, "
        "op string, event_seq long",
    )


def _seed(spark, t):
    merge_into(
        t,
        _b(spark, [
            ("r1", "a.py", "py", "x1", "upsert", 1),
            ("r1", "b.py", "py", "y1", "upsert", 1),
            ("r2", "c.go", "go", "z1", "upsert", 1),
        ]),
        batch_id=1, mode="mor",
    )
    merge_into(
        t,
        _b(spark, [
            ("r1", "a.py", "py", "x2", "upsert", 2),
            ("r2", "d.go", "go", "w1", "upsert", 2),
        ]),
        batch_id=2, mode="mor",
    )
    merge_into(
        t,
        _b(spark, [
            ("r1", "b.py", "py", None, "delete", 3),
            ("r2", "c.go", "go", "z2", "upsert", 3),
        ]),
        batch_id=3, mode="mor",
    )


def _run_stream(spark, root, name, ckpt, **opts):
    """One drain pass. Python streaming sources fall back to
    single-batch execution under availableNow, so this processes ONE
    micro-batch covering the whole pending span."""
    reader = spark.readStream.format("lake_changes")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(root)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name)


def _drain_stream(spark, root, name, ckpt, **opts):
    """Continuous-trigger drain: real multi-micro-batch execution; stops
    once offsets reach the table's current version with no new input."""
    import ast
    import time

    target = LakeTable(None, root).current_version()
    reader = spark.readStream.format("lake_changes")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(root)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 180
        quiet = 0
        while time.time() < deadline and quiet < 2:
            time.sleep(0.3)
            lp = q.lastProgress
            if not lp or not lp.get("sources"):
                continue
            src = lp["sources"][0]
            end = src.get("endOffset")
            if isinstance(end, str):
                # Spark stringifies python-source offsets via repr
                end = ast.literal_eval(end)
            if (
                end is not None
                and int(end["version"]) >= target
                and src.get("numInputRows", 0) == 0
            ):
                quiet += 1
            else:
                quiet = 0
        assert quiet >= 2, f"stream never caught up to v{target}: {q.lastProgress}"
    finally:
        q.stop()
    return spark.table(name)


def _rows(df):
    return {tuple(r) for r in df.collect()}


# ------------------------------------------------------------ batch


def test_batch_reader_matches_table_read(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    got = spark.read.format("lake").load(t.root)
    exp = t.read()
    assert got.schema == exp.schema
    assert _rows(got) == _rows(exp)


def test_batch_reader_time_travel_and_tag(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    v1 = t.snapshots()[1].version
    got = spark.read.format("lake").option("version", v1).load(t.root)
    assert _rows(got) == _rows(t.read(version=v1))
    t.tag("audited", v1)
    got_tag = spark.read.format("lake").option("tag", "audited").load(t.root)
    assert _rows(got_tag) == _rows(t.read(version=v1))


def test_batch_reader_branch_ref(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    t.create_branch("wap")
    br = t.branch("wap")
    merge_into(
        br, _b(spark, [("r9", "n.rs", "rs", "v1", "upsert", 9)]),
        batch_id=9, mode="mor",
    )
    got = spark.read.format("lake").option("branch", "wap").load(t.root)
    assert _rows(got) == _rows(br.read())
    # main unaffected
    got_main = spark.read.format("lake").load(t.root)
    assert _rows(got_main) == _rows(t.read())


# ------------------------------------------------------------ stream


def test_stream_bootstrap_matches_read_changes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    ckpt = str(tmp_path / "ck1")
    got = _run_stream(spark, t.root, "chg_boot", ckpt, startingVersion=0)
    exp = t.read_changes(0)
    assert [f.name for f in got.schema.fields] == [
        f.name for f in exp.schema.fields
    ]
    assert _rows(got) == _rows(exp)


def test_stream_per_commit_spans_match(spark, tmp_path):
    """maxVersionsPerBatch=1 → one micro-batch per commit; the union of
    per-span diffs equals the concatenation of read_changes(v-1, v)."""
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    ckpt = str(tmp_path / "ck2")
    got = _drain_stream(
        spark, t.root, "chg_spans", ckpt,
        startingVersion=0, maxVersionsPerBatch=1,
    )
    exp = set()
    for v in range(1, t.current_version() + 1):
        exp |= _rows(t.read_changes(v - 1, v))
    assert _rows(got) == exp


def test_stream_restart_is_exactly_once(spark, tmp_path):
    """Checkpointed restart resumes at the committed version — a
    recoverable FILE sink (memory sink forbids checkpoint recovery),
    stop, new commits, restart: each span lands exactly once."""
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    ckpt = str(tmp_path / "ck3")
    out = str(tmp_path / "sink3")

    def run_once():
        q = (
            spark.readStream.format("lake_changes")
            .option("startingVersion", 0)
            .load(t.root)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    first = _rows(spark.read.parquet(out))
    assert first == _rows(t.read_changes(0))
    v_mid = t.current_version()
    merge_into(
        t, _b(spark, [("r3", "e.md", "md", "m1", "upsert", 4)]),
        batch_id=4, mode="mor",
    )
    run_once()
    total = _rows(spark.read.parquet(out))
    # exactly the old rows plus ONLY the post-restart span — no replay
    assert total == first | _rows(t.read_changes(v_mid))
    assert len(total) == len(first) + t.read_changes(v_mid).count()


def test_stream_default_latest_sees_only_new_commits(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    v0 = t.current_version()
    ckpt = str(tmp_path / "ck4")
    out = str(tmp_path / "sink4")

    def run_once():
        q = (
            spark.readStream.format("lake_changes")
            .load(t.root)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    # parquet dir may hold only metadata (zero rows emitted)
    merge_into(
        t, _b(spark, [("r1", "a.py", "py", "x3", "upsert", 5)]),
        batch_id=5, mode="mor",
    )
    run_once()
    got = _rows(spark.read.schema(
        t.read_changes(v0).schema).parquet(out))
    assert got == _rows(t.read_changes(v0))


def test_stream_snapshot_bootstrap_emits_full_table(spark, tmp_path):
    """startingVersion=snapshot: first batch is the whole live table as
    inserts even when early manifests are expired."""
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    t.compact_deltas()
    t.expire_snapshots(keep_last=1)
    ckpt = str(tmp_path / "ck5")
    got = _run_stream(
        spark, t.root, "chg_snap", ckpt, startingVersion="snapshot"
    )
    live = t.read(include_internal=True)
    assert {r[CHANGE_COL] for r in got.collect()} == {"insert"}
    assert {(r.repo, r.path, r.lang, r.content) for r in got.collect()} == {
        (r.repo, r.path, r.lang, r.content) for r in live.collect()
    }


def test_stream_cow_and_compaction_spans(spark, tmp_path):
    """COW rewrites and delta compaction are plain commits: the diff
    over a span containing a compaction (no logical change) is empty."""
    t = _mk(spark, tmp_path)
    merge_into(
        t, _b(spark, [("r1", "a.py", "py", "x1", "upsert", 1)]),
        batch_id=1, mode="cow",
    )
    merge_into(
        t, _b(spark, [("r1", "a.py", "py", "x2", "upsert", 2)]),
        batch_id=2, mode="mor",
    )
    v_pre = t.current_version()
    t.compact_deltas()
    assert t.current_version() > v_pre
    assert _rows(t.read_changes(v_pre)) == set()
    ckpt = str(tmp_path / "ck6")
    got = _run_stream(spark, t.root, "chg_cow", ckpt, startingVersion=0)
    assert _rows(got) == _rows(t.read_changes(0))
    assert {r[CHANGE_COL] for r in got.collect()} == {"insert"}


def test_stream_pins_schema_across_evolution(spark, tmp_path):
    """Columns added after the stream starts stay invisible (Delta's
    pinned-schema contract); the stream keeps running and later rows
    project onto the pinned columns."""
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    ckpt = str(tmp_path / "ck7")
    out = str(tmp_path / "sink7")
    pinned = t.read_changes(0).schema

    def run_once():
        q = (
            spark.readStream.format("lake_changes")
            .option("startingVersion", 0)
            .load(t.root)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    assert "stars" not in pinned.fieldNames()
    evolved = spark.createDataFrame(
        [("r1", "a.py", "py", "x9", 42, "upsert", 9)],
        "repo string, path string, lang string, content string, "
        "stars long, op string, event_seq long",
    )
    merge_into(t, evolved, batch_id=9, mode="mor")
    assert "stars" in t.current_manifest().schema.fieldNames()
    run_once()  # post-evolution span projects onto the pinned schema
    rows = _rows(spark.read.schema(pinned).parquet(out))
    assert ("r1", "a.py", "update", "py", "x9", 9) in rows


def test_stream_refuses_rebucket_span(spark, tmp_path):
    t = _mk(spark, tmp_path, buckets=2)
    _seed(spark, t)
    t.rebucket(4)
    merge_into(
        t, _b(spark, [("r4", "f.c", "c", "c1", "upsert", 5)]),
        batch_id=5, mode="mor",
    )
    ckpt = str(tmp_path / "ck8")
    from pyspark.errors.exceptions.captured import StreamingQueryException

    # startingVersion=0 would take the empty-base bootstrap path (no
    # bucket comparison needed); a NON-empty base crossing the
    # rebucket must refuse
    with pytest.raises(StreamingQueryException, match="REBUCKET"):
        _run_stream(spark, t.root, "chg_rb", ckpt, startingVersion=1)
    # a span entirely after the rebucket works
    ckpt2 = str(tmp_path / "ck9")
    rb_v = next(
        m.version for m in t.snapshots() if m.num_buckets == 4
    )
    got = _run_stream(
        spark, t.root, "chg_rb2", ckpt2, startingVersion=rb_v
    )
    assert _rows(got) == _rows(t.read_changes(rb_v))


def test_stream_capped_restart_ratchets_past_checkpoint(spark, tmp_path):
    """A rate-capped stream (maxVersionsPerBatch) restarted from a
    checkpoint cannot see the committed offset (the Python API passes
    none), so latestOffset ratchets forward planning nothing until it
    passes the checkpoint — idle triggers, then exactly-once resumes
    with per-commit spans."""
    import time

    t = _mk(spark, tmp_path, buckets=2)
    for i in range(1, 4):
        merge_into(
            t, _b(spark, [("r1", f"f{i}", "py", str(i), "upsert", i)]),
            batch_id=i, mode="mor",
        )
    ckpt = str(tmp_path / "ckcr")
    out = str(tmp_path / "sinkcr")
    schema = t.read_changes(0).schema

    def drain(expected):
        q = (
            spark.readStream.format("lake_changes")
            .option("startingVersion", 0)
            .option("maxVersionsPerBatch", 1)
            .load(t.root)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                try:
                    if spark.read.schema(schema).parquet(out).count() >= expected:
                        return
                except Exception:
                    pass
                time.sleep(0.5)
            raise AssertionError(f"sink never reached {expected} rows")
        finally:
            q.stop()

    drain(3)
    for i in range(4, 6):
        merge_into(
            t, _b(spark, [("r1", f"f{i}", "py", str(i), "upsert", i)]),
            batch_id=i, mode="mor",
        )
    drain(5)
    got = _rows(spark.read.schema(schema).parquet(out))
    exp = set()
    for v in range(1, 6):
        exp |= _rows(t.read_changes(v - 1, v))
    assert got == exp  # per-commit spans, no replay, nothing lost


# ------------------------------------------------------------ lookup


def test_point_lookup_zero_spark(spark, tmp_path):
    """LakeTable.lookup: python-hash bucket targeting + arrow-kernel
    resolution — hit, miss, tombstone, and time-travel, all matching
    the Spark scan."""
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    v_before_delete = t.snapshots()[-2].version

    got = t.lookup({"repo": "r1", "path": "a.py"})
    assert got is not None and got["content"] == "x2" and got["lang"] == "py"
    spark_row = t.read().filter(
        (F.col("repo") == "r1") & (F.col("path") == "a.py")
    ).collect()[0]
    assert (got["repo"], got["path"], got["lang"], got["content"]) == tuple(
        spark_row
    )
    # miss
    assert t.lookup({"repo": "zz", "path": "nope"}) is None
    # deleted key: None live, tombstone row on request
    assert t.lookup({"repo": "r1", "path": "b.py"}) is None
    tomb = t.lookup({"repo": "r1", "path": "b.py"}, include_tombstone=True)
    assert tomb is not None and bool(tomb["_deleted"])
    # time travel: before the delete the row was live
    old = t.lookup(
        {"repo": "r1", "path": "b.py"}, version=v_before_delete
    )
    assert old is not None and old["content"] == "y1"
    # missing key column fails loudly
    with pytest.raises(ValueError, match="missing"):
        t.lookup({"repo": "r1"})


# ------------------------------------------------------------ sink


def _sink_drain(spark, reader_df, root, ckpt, **opts):
    writer = reader_df.writeStream.format("lake").option("path", root)
    for k, v in opts.items():
        writer = writer.option(k, v)
    q = (
        writer.option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_sink_matches_merge_into(spark, tmp_path):
    """The native streaming sink lands the same final state as
    merge_into on the same envelope batches — upserts, deletes, python
    bucket assignment (verified file-by-file against bucket_expr), and
    the exactly-once fence on an idempotent re-drain."""
    from encode_ingest_spark.lake.table import bucket_expr

    rows1 = [
        ("r%d" % (i % 5), "f%d.py" % i, "py", "v1-%d" % i, "upsert", 1)
        for i in range(30)
    ]
    rows2 = [
        ("r%d" % (i % 5), "f%d.py" % i, "py", "v2-%d" % i, "upsert", 2)
        for i in range(18)
    ] + [
        ("r%d" % (i % 5), "f%d.py" % i, None, None, "delete", 2)
        for i in range(18, 24)
    ]
    ref = LakeTable.create(
        spark, str(tmp_path / "ref"), SCHEMA, KEYS, num_buckets=4
    )
    merge_into(ref, _b(spark, rows1), batch_id=1, mode="mor")
    merge_into(ref, _b(spark, rows2), batch_id=2, mode="mor")

    t = LakeTable.create(
        spark, str(tmp_path / "sink"), SCHEMA, KEYS, num_buckets=4
    )
    evdir = str(tmp_path / "events")
    ckpt = str(tmp_path / "cks")
    ev_schema = (
        "repo string, path string, lang string, content string, "
        "op string, event_seq long"
    )
    _b(spark, rows1).repartition(3).write.mode("append").parquet(evdir)
    stream = lambda: spark.readStream.schema(ev_schema).parquet(evdir)  # noqa: E731
    _sink_drain(spark, stream(), t.root, ckpt)
    assert t.current_version() == 1
    _b(spark, rows2).repartition(3).write.mode("append").parquet(evdir)
    _sink_drain(spark, stream(), t.root, ckpt)
    assert _rows(t.read()) == _rows(ref.read())
    # multiple tasks wrote the same buckets: delta files per bucket >= 1,
    # and every file's rows hash to ITS bucket under the Spark expression
    for f in t.current_manifest().files:
        assert f.is_delta
        n_bad = (
            spark.read.parquet(t.root + "/" + f.path)
            .withColumn("_b", bucket_expr(KEYS, 4))
            .filter(F.col("_b") != f.bucket)
            .count()
        )
        assert n_bad == 0, f"file {f.path} holds foreign-bucket rows"
    # re-drain with nothing new: the fence holds, no phantom commit
    v = t.current_version()
    _sink_drain(spark, stream(), t.root, ckpt)
    assert t.current_version() == v


def test_sink_mirror_pipeline_changes_to_lake(spark, tmp_path):
    """readStream.format('lake_changes') → writeStream.format('lake')
    with ZERO transform code mirrors a table, deletes included — the
    two formats' envelopes are designed to chain."""
    src = LakeTable.create(
        spark, str(tmp_path / "src"), SCHEMA, KEYS, num_buckets=4
    )
    _seed(spark, src)
    mir = LakeTable.create(
        spark, str(tmp_path / "mir"), SCHEMA, KEYS, num_buckets=2
    )
    ckpt = str(tmp_path / "ckm")
    q = (
        spark.readStream.format("lake_changes")
        .option("startingVersion", 0)
        .load(src.root)
        .writeStream.format("lake")
        .option("path", mir.root)
        .option("sourceId", "mirror")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert _rows(mir.read()) == _rows(src.read())
    # tail incremental: another commit on src, drain again
    merge_into(
        src, _b(spark, [("r1", "a.py", "py", "x9", "upsert", 9),
                        ("r2", "d.go", None, None, "delete", 9)]),
        batch_id=9, mode="mor",
    )
    q = (
        spark.readStream.format("lake_changes")
        .option("startingVersion", 0)
        .load(src.root)
        .writeStream.format("lake")
        .option("path", mir.root)
        .option("sourceId", "mirror")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert _rows(mir.read()) == _rows(src.read())


def test_sink_rejects_unknown_columns_at_start(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=2
    )
    evdir = str(tmp_path / "ev")
    spark.createDataFrame(
        [("r1", "a.py", 5, "upsert", 1)],
        "repo string, path string, stars long, op string, event_seq long",
    ).write.parquet(evdir)
    with pytest.raises(Exception, match="not in table schema"):
        q = (
            spark.readStream.schema(
                "repo string, path string, stars long, op string, "
                "event_seq long"
            )
            .parquet(evdir)
            .writeStream.format("lake")
            .option("path", t.root)
            .option("checkpointLocation", str(tmp_path / "ckx"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)


def test_stream_nested_payload_diff(spark, tmp_path):
    """Array-typed payload columns flow through the Arrow diff kernel
    (canonicalized comparison) with read_changes parity."""
    schema = T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("lang", T.StringType(), True),
            T.StructField("content", T.StringType(), True),
            T.StructField("imports", T.ArrayType(T.StringType()), True),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "tn"), schema, KEYS, num_buckets=2
    )

    def nb(rows):
        return spark.createDataFrame(
            rows,
            "repo string, path string, lang string, content string, "
            "imports array<string>, op string, event_seq long",
        )

    merge_into(
        t,
        nb([
            ("r1", "a.py", "py", "x1", ["os", "sys"], "upsert", 1),
            ("r1", "b.py", "py", "y1", [], "upsert", 1),
        ]),
        batch_id=1, mode="mor",
    )
    merge_into(
        t,
        nb([
            ("r1", "a.py", "py", "x1", ["os", "json"], "upsert", 2),
            ("r1", "b.py", "py", None, None, "delete", 2),
        ]),
        batch_id=2, mode="mor",
    )
    ckpt = str(tmp_path / "ckn")
    got = _run_stream(spark, t.root, "chg_nested", ckpt, startingVersion=0)

    def norm(rows):
        return {
            (r.repo, r.path, r[CHANGE_COL], r.lang, r.content,
             tuple(r.imports) if r.imports is not None else None, r._seq)
            for r in rows.collect()
        }

    assert norm(got) == norm(t.read_changes(0))
    # span diff across the two commits: update keeps the NEW array
    per_span = norm(_run_stream(
        spark, t.root, "chg_nested2", str(tmp_path / "ckn2"),
        startingVersion=1,
    ))
    assert per_span == norm(t.read_changes(1))


# --------------------------------------------------------------------
# sink commit guards: stale batch ids and layout changes fail LOUDLY
# --------------------------------------------------------------------

ENVELOPE_ST = T.StructType(
    SCHEMA.fields
    + [
        T.StructField("op", T.StringType(), True),
        T.StructField("event_seq", T.LongType(), True),
    ]
)


def test_sink_commit_refuses_stale_batch_id(spark, tmp_path):
    """A commit whose Spark batchId is strictly BEHIND the table's sink
    watermark means a reset checkpoint (ids restart at 0) or a second
    sink sharing the sourceId — silently fence-skipping would discard
    every epoch while the stream reports progress. Equal ids stay the
    normal exactly-once replay fence."""
    from encode_ingest_spark.lake.datasource import (
        LakeSinkCommitMessage,
        LakeStreamWriter,
    )
    from encode_ingest_spark.lake.merge import _commit

    t = _mk(spark, tmp_path)
    _seed(spark, t)
    # advance the sink lineage's watermark to batch 5
    m = t.current_manifest()
    _commit(t, m, m.files, [], 5, "lake_sink", None, {"appended": 0})

    w = LakeStreamWriter(ENVELOPE_ST, {"path": t.root})
    # equal id: the replay fence — silent skip
    w.commit([LakeSinkCommitMessage(files=[], rows=0)], batchId=5)
    # strictly older id: loud refusal naming the remedy
    with pytest.raises(ValueError, match="behind the committed watermark"):
        w.commit([LakeSinkCommitMessage(files=[], rows=0)], batchId=3)


def test_sink_commit_refuses_layout_change(spark, tmp_path):
    """The epoch's files were bucketed under the layout pinned at
    stream start; a rebucket between epochs would scatter keys across
    buckets if committed — the sink must refuse, not corrupt."""
    from encode_ingest_spark.lake.datasource import (
        LakeSinkCommitMessage,
        LakeStreamWriter,
    )

    t = _mk(spark, tmp_path)
    _seed(spark, t)
    w = LakeStreamWriter(ENVELOPE_ST, {"path": t.root})
    t.rebucket(8)
    with pytest.raises(ValueError, match="layout changed mid-stream"):
        w.commit([LakeSinkCommitMessage(files=[], rows=0)], batchId=99)


def test_point_lookup_timestamp_key_non_utc_driver(spark, tmp_path):
    """lookup() on a timestamp key finds rows when handed the NAIVE
    datetimes Spark's collect() returns — which are DRIVER-LOCAL wall
    time (``TimestampType.fromInternal`` uses the process timezone), an
    off-by-UTC-offset bucket miss on non-UTC drivers before the
    ``_utc_key_value`` normalization."""
    import datetime as dt
    import os
    import time
    from contextlib import contextmanager

    @contextmanager
    def _driver_tz(name):
        old_tz = os.environ.get("TZ")
        os.environ["TZ"] = name
        time.tzset()
        try:
            yield
        finally:
            if old_tz is None:
                os.environ.pop("TZ", None)
            else:
                os.environ["TZ"] = old_tz
            time.tzset()

    st = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "ts_t"), st, ["id", "ts"], num_buckets=4
    )
    instants = {
        "a": dt.datetime(2024, 6, 1, 12, 30, tzinfo=dt.timezone.utc),
        "b": dt.datetime(2024, 6, 2, 3, 45, tzinfo=dt.timezone.utc),
    }
    batch = spark.createDataFrame(
        [(k, v, f"v-{k}", "upsert", 1) for k, v in instants.items()],
        "id string, ts timestamp, v string, op string, event_seq long",
    )
    merge_into(t, batch, batch_id=1, mode="mor")
    with _driver_tz("America/New_York"):
        rows = {r.id: r for r in t.read().collect()}
        # collect hands back naive DRIVER-LOCAL values (12:30Z -> 08:30)
        assert rows["a"].ts.tzinfo is None
        assert rows["a"].ts.hour == 8
        for rid in ("a", "b"):
            got = t.lookup({"id": rid, "ts": rows[rid].ts})
            assert got is not None and got["v"] == f"v-{rid}"
        # aware values keep working unchanged
        got = t.lookup({"id": "a", "ts": instants["a"]})
        assert got is not None and got["v"] == "v-a"


# --------------------------------------------------- timestamp options


def test_batch_changes_timestamp_span(spark, tmp_path):
    """startingTimestamp delivers changes committed AT or after ts
    (Delta CDF's rule — a commit landing at exactly ts is included,
    via version_before); endingTimestamp resolves via version_as_of."""
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    snaps = t.snapshots()
    v0, v1 = snaps[0].version, snaps[1].version
    ts1 = snaps[1].committed_at
    cur = t.current_version()
    ts_now = time.time() + 60

    # starting at v1's own commit time INCLUDES v1's changes
    by_ver = spark.read.format("lake_changes").option(
        "startingVersion", v0
    ).load(t.root)
    by_ts = (
        spark.read.format("lake_changes")
        .option("startingTimestamp", repr(ts1))
        .option("endingTimestamp", repr(ts_now))
        .load(t.root)
    )
    assert _rows(by_ts) == _rows(by_ver)
    # [ts1, ts1] bounds the span to exactly v1's commit
    exact = (
        spark.read.format("lake_changes")
        .option("startingTimestamp", repr(ts1))
        .option("endingTimestamp", repr(ts1))
        .load(t.root)
    )
    want_v1 = spark.read.format("lake_changes").option(
        "startingVersion", v0
    ).option("endingVersion", v1).load(t.root)
    assert _rows(exact) == _rows(want_v1)
    # mutual exclusivity + pre-history refusal
    with pytest.raises(Exception, match="at most one"):
        spark.read.format("lake_changes").option(
            "startingVersion", v1
        ).option("startingTimestamp", repr(ts1)).load(t.root).collect()
    with pytest.raises(Exception, match="no snapshot"):
        spark.read.format("lake_changes").option(
            "startingTimestamp", repr(ts1 - 1e6)
        ).load(t.root).collect()
    assert cur == t.current_version()  # reads moved nothing


def test_stream_changes_starting_timestamp(spark, tmp_path):
    """A startingTimestamp stream tails changes committed at or after
    ts — matching the version-addressed drain from the version BEFORE
    the commit at ts."""
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    snaps = t.snapshots()
    v0, ts1 = snaps[0].version, snaps[1].committed_at
    got = _drain_stream(
        spark, t.root, "ts_tail", str(tmp_path / "ck_ts"),
        startingTimestamp=repr(ts1),
    )
    want = spark.read.format("lake_changes").option(
        "startingVersion", v0
    ).load(t.root)
    assert _rows(got) == _rows(want)


def test_batch_changes_between_tags(spark, tmp_path):
    """startingTag/endingTag: 'what changed between release X and Y' —
    tag-addressed incremental scan, parity with the version span."""
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    snaps = t.snapshots()
    v1, v2 = snaps[1].version, snaps[2].version
    t.tag("rel1", v1)
    t.tag("rel2", v2)
    by_tag = (
        spark.read.format("lake_changes")
        .option("startingTag", "rel1")
        .option("endingTag", "rel2")
        .load(t.root)
    )
    by_ver = (
        spark.read.format("lake_changes")
        .option("startingVersion", v1)
        .option("endingVersion", v2)
        .load(t.root)
    )
    assert _rows(by_tag) == _rows(by_ver)
    with pytest.raises(Exception, match="at most one"):
        spark.read.format("lake_changes").option(
            "startingTag", "rel1"
        ).option("startingVersion", v1).load(t.root).collect()
    # inverted tag span is a loud error, not an empty result
    with pytest.raises(Exception, match="inverted"):
        spark.read.format("lake_changes").option(
            "startingTag", "rel2"
        ).option("endingTag", "rel1").load(t.root).collect()


def test_stream_changes_starting_tag(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    v1 = t.snapshots()[1].version
    t.tag("rel1", v1)
    got = _drain_stream(
        spark, t.root, "tag_tail", str(tmp_path / "ck_tag"),
        startingTag="rel1",
    )
    want = spark.read.format("lake_changes").option(
        "startingVersion", v1
    ).load(t.root)
    assert _rows(got) == _rows(want)
