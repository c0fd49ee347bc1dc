"""Optimistic concurrency on the manifest swap: pure-append commits
(MOR deltas, driver-local deltas) that lose the version race REBASE onto
the winner's manifest and retry — the Iceberg fast-append pattern — while
rewrite-shaped commits (COW) re-raise CommitConflictError, because the
winner may have touched the same buckets.

The race is made deterministic by interposing on _write_manifest: the
competing writer lands its commit between the loser's manifest read and
the loser's swap, exactly the window a real multi-writer deployment
races over.
"""

import os

import pytest
from pyspark.sql import types as T

from encode_ingest_spark.lake import CommitConflictError, LakeTable, merge_into

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _mk(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["id"], num_buckets=4
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id string, v string, op string, event_seq long")


def _race_once(monkeypatch, table, competing):
    """Arrange for ``competing()`` to commit first, inside the window
    between the caller's snapshot read and its manifest swap."""
    orig = LakeTable._write_manifest
    state = {"fired": False}

    def interposed(self, manifest):
        if not state["fired"]:
            state["fired"] = True
            competing()
        return orig(self, manifest)

    monkeypatch.setattr(LakeTable, "_write_manifest", interposed)
    return state


def test_append_commit_rebases_over_concurrent_winner(
    spark, tmp_path, monkeypatch
):
    t = _mk(spark, tmp_path)
    merge_into(t, _batch(spark, [("a", "1", "upsert", 1)]), batch_id=1)

    t2 = LakeTable(spark, t.root)

    def competing():
        merge_into(
            t2, _batch(spark, [("b", "2", "upsert", 1)]),
            batch_id=1, source_id="other", mode="mor",
        )

    _race_once(monkeypatch, t, competing)
    res = merge_into(
        t, _batch(spark, [("c", "3", "upsert", 1)]),
        batch_id=2, mode="mor",
    )
    assert not res.skipped
    # BOTH writers' rows survive: the loser replayed its delta files on
    # top of the winner's manifest instead of clobbering or crashing
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {("a", "1"), ("b", "2"), ("c", "3")}
    m = t.current_manifest()
    assert m.watermarks["other"]["batch_id"] == 1
    assert m.watermarks["default"]["batch_id"] == 2
    # seed v1, winner v2, rebased loser v3
    assert m.version == 3


def test_append_commit_race_honors_exactly_once_fence(
    spark, tmp_path, monkeypatch
):
    """Two replicas of ONE stream replaying the same micro-batch: the
    loser must skip (fence), not double-apply, and must GC its staged
    delta files since no manifest references them."""
    t = _mk(spark, tmp_path)
    merge_into(t, _batch(spark, [("a", "1", "upsert", 1)]), batch_id=1)

    t2 = LakeTable(spark, t.root)

    def competing():
        merge_into(
            t2, _batch(spark, [("b", "2", "upsert", 1)]),
            batch_id=2, mode="mor",
        )

    _race_once(monkeypatch, t, competing)
    res = merge_into(
        t, _batch(spark, [("b", "2-dup", "upsert", 1)]),
        batch_id=2, mode="mor",
    )
    assert res.skipped
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {("a", "1"), ("b", "2")}
    # the loser's unreferenced delta files are gone from disk: every
    # surviving data file is referenced by some committed manifest
    referenced = set()
    for v in range(t.current_version() + 1):
        referenced |= {
            os.path.normpath(f.path) for f in t.manifest_at(v).files
        }
    data_dir = os.path.join(t.root, "data")
    for dirpath, _dirs, files in os.walk(data_dir):
        for fname in files:
            rel = os.path.normpath(
                os.path.relpath(os.path.join(dirpath, fname), t.root)
            )
            assert rel in referenced, rel


def test_cow_commit_conflict_reraises(spark, tmp_path, monkeypatch):
    """A COW merge rewrites base files, so its work is stale after losing
    the race — it must surface CommitConflictError, never silently rebase."""
    t = _mk(spark, tmp_path)
    merge_into(t, _batch(spark, [("a", "1", "upsert", 1)]), batch_id=1)

    t2 = LakeTable(spark, t.root)

    def competing():
        merge_into(
            t2, _batch(spark, [("b", "2", "upsert", 1)]),
            batch_id=1, source_id="other",
        )

    _race_once(monkeypatch, t, competing)
    with pytest.raises(CommitConflictError):
        merge_into(
            t, _batch(spark, [("a", "1-v2", "upsert", 2)]), batch_id=2
        )


def test_threaded_multi_writer_append_storm(spark, tmp_path):
    """Real (nondeterministic) races: N writer threads land driver-local
    append commits into ONE table concurrently. Every commit must
    survive — no lost updates, no crashed writers — and the version
    chain must hold exactly one commit per batch."""
    from concurrent.futures import ThreadPoolExecutor

    from encode_ingest_spark.lake.merge import merge_local_delta, normalize_batch
    from encode_ingest_spark.lake.table import BUCKET_COL, bucket_expr

    t = _mk(spark, tmp_path)
    m = t.current_manifest()
    writers, batches = 3, 4

    # pre-compute every batch's table-shaped rows (Spark work done
    # up front) so the threads race on pure driver-side commits
    staged = {}
    for w in range(writers):
        for b in range(1, batches + 1):
            df = _batch(
                spark,
                [(f"w{w}-k{b}-{i}", f"v{b}", "upsert", b) for i in range(3)],
            )
            prepared = normalize_batch(df, m.schema, m.key_cols).withColumn(
                BUCKET_COL, bucket_expr(m.key_cols, m.num_buckets)
            )
            staged[(w, b)] = [r.asDict(recursive=True) for r in prepared.collect()]

    def run_writer(w):
        handle = LakeTable(spark, t.root)
        for b in range(1, batches + 1):
            res = merge_local_delta(
                handle, staged[(w, b)], source_id=f"w{w}", batch_id=b
            )
            assert not res.skipped

    with ThreadPoolExecutor(max_workers=writers) as pool:
        list(pool.map(run_writer, range(writers)))

    # one commit per (writer, batch): create=v0, then 12 appends
    assert t.current_version() == writers * batches
    m2 = t.current_manifest()
    for w in range(writers):
        assert m2.watermarks[f"w{w}"]["batch_id"] == batches
    got = {r.id for r in t.read().collect()}
    want = {
        f"w{w}-k{b}-{i}"
        for w in range(writers)
        for b in range(1, batches + 1)
        for i in range(3)
    }
    assert got == want


def test_append_rebase_refuses_winner_that_rewound_watermarks(
    spark, tmp_path, monkeypatch
):
    """A rollback that WINS the race against an in-flight append must
    fail that append, not get silently rebased over: replaying our
    files on top of the rolled-back snapshot would re-assert the higher
    watermark and permanently fence out the replay of the rolled-back
    span (data loss). Watermark monotonicity vs the append's base
    snapshot is the discriminator."""
    t = _mk(spark, tmp_path)
    merge_into(t, _batch(spark, [("a", "1", "upsert", 1)]), batch_id=1, mode="mor")
    v_good = t.current_version()
    merge_into(t, _batch(spark, [("a", "2", "upsert", 2)]), batch_id=2, mode="mor")

    t2 = LakeTable(spark, t.root)

    def competing():
        t2.rollback_to(v_good)

    _race_once(monkeypatch, t, competing)
    with pytest.raises(CommitConflictError, match="rewound"):
        merge_into(
            t, _batch(spark, [("c", "3", "upsert", 3)]), batch_id=3, mode="mor"
        )
    # the rollback stands: fence back at batch 1, so batches 2..3 replay
    m = t.current_manifest()
    assert m.watermarks["default"]["batch_id"] == 1
    res = merge_into(
        t, _batch(spark, [("a", "2", "upsert", 2)]), batch_id=2, mode="mor"
    )
    assert not res.skipped
    assert {(r.id, r.v) for r in t.read().collect()} == {("a", "2")}


def test_merge_expected_watermark_cas(spark, tmp_path, monkeypatch):
    """expected_watermark is a compare-and-swap on the source's current
    watermark: a mismatch skips with stale=True (checkpointed-consumer
    span continuity), both when visible at merge start and when it
    appears mid-commit via the append-rebase retry."""
    t = _mk(spark, tmp_path)
    merge_into(t, _batch(spark, [("a", "1", "upsert", 1)]), batch_id=1, mode="mor")

    # visible at merge start
    res = merge_into(
        t, _batch(spark, [("b", "2", "upsert", 2)]),
        batch_id=2, mode="mor", expected_watermark=0,
    )
    assert res.skipped and res.stale
    assert t.current_manifest().watermarks["default"]["batch_id"] == 1

    # appears mid-commit: a competing writer advances the watermark in
    # the race window — the rebase retry must re-check the CAS and skip
    t2 = LakeTable(spark, t.root)

    def competing():
        merge_into(
            t2, _batch(spark, [("x", "9", "upsert", 9)]),
            batch_id=2, mode="mor",
        )

    _race_once(monkeypatch, t, competing)
    # loser's batch_id (3) outranks the winner's (2), so the fence alone
    # would let it through — only the CAS re-check catches the moved
    # checkpoint (the overlapping-polls shape: wider span, stale base)
    res = merge_into(
        t, _batch(spark, [("c", "3", "upsert", 3)]),
        batch_id=3, mode="mor", expected_watermark=1,
    )
    assert res.skipped and res.stale
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {("a", "1"), ("x", "9")}  # the stale batch never landed
    assert t.current_manifest().watermarks["default"]["batch_id"] == 2
    # a correct CAS passes
    res = merge_into(
        t, _batch(spark, [("d", "4", "upsert", 10)]),
        batch_id=4, mode="mor", expected_watermark=2,
    )
    assert not res.skipped and not res.stale
