"""Crash-resilience of snapshot expiry (ADVICE r3, medium).

expire_snapshots must (a) delete expired manifests NEWEST-first so a
delta-form child is never survived by a hole where its parent was —
every manifest a mid-loop crash leaves behind stays resolvable; (b) on
re-run over a legacy oldest-first crash state (unresolvable children),
heal instead of raising — and so must orphan_files()/maintain();
(c) archive each expired snapshot's lineage exactly once across
crash/re-run cycles.
"""

import json
import os

import pytest
from pyspark.sql import types as T

import encode_ingest_spark.lake.table as table_mod
from encode_ingest_spark.cdc import repo_file_events
from encode_ingest_spark.lake import LakeTable, merge_into

SCHEMA = T.StructType(
    [T.StructField(c, T.StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]


def _one_key_batch(spark, n):
    return spark.createDataFrame(
        [("org0/repoX", "src/only.py", "c" * 40, "python", f"b{n}",
          "update", 10_000 + n)],
        "repo string, path string, commit string, lang string, "
        "content string, op string, event_seq long",
    )


def _delta_chain(spark, tmp_path, n_narrow=4):
    """v0 create, v1 bootstrap merge (full), v2.. narrow delta-form."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=8)
    merge_into(
        t, repo_file_events(spark, n_keys=200, events_per_key=1, seed=1),
        batch_id=1,
    )
    for i in range(n_narrow):
        merge_into(t, _one_key_batch(spark, i), batch_id=2 + i,
                   stage_batch=True)
    # sanity: the narrow commits really are delta-form (the scenario
    # under test only exists for delta manifests)
    with open(t._manifest_path(t.current_version())) as fh:
        assert "delta" in json.load(fh)
    return t


def test_expire_deletes_newest_first_and_rerun_heals(spark, tmp_path, monkeypatch):
    t = _delta_chain(spark, tmp_path)
    expected = sorted((r.path, r.content) for r in t.read().collect())
    versions_before = t._all_versions()

    # crash after the FIRST expired-manifest deletion
    real_remove = os.remove
    state = {"manifest_removes": 0}

    def exploding_remove(path, *a, **k):
        if str(path).endswith(".manifest.json"):
            state["manifest_removes"] += 1
            if state["manifest_removes"] > 1:
                raise RuntimeError("injected crash mid-expire")
        return real_remove(path, *a, **k)

    monkeypatch.setattr(table_mod.os, "remove", exploding_remove)
    with pytest.raises(RuntimeError, match="injected"):
        t.expire_snapshots(keep_last=1)
    monkeypatch.undo()

    # newest-first: the one deleted manifest is the NEWEST expired
    # version, so everything surviving resolves from a fresh process
    t2 = LakeTable(spark, t.root)  # empty manifest cache
    survivors = t2._all_versions()
    deleted = set(versions_before) - set(survivors)
    assert deleted == {versions_before[-2]}
    for v in survivors:
        t2.manifest_at(v)  # must not raise

    # the idempotent re-run finishes the job
    removed = t2.expire_snapshots(keep_last=1)
    assert removed >= 0
    assert t2._all_versions() == [versions_before[-1]]
    t3 = LakeTable.load(spark, t.root)
    assert sorted((r.path, r.content) for r in t3.read().collect()) == expected

    # lineage archived exactly once per snapshot across the crash/re-run
    with open(t3._lineage_archive_path) as fh:
        keys = [
            (json.loads(line)["snapshot_id"], json.loads(line)["batch_id"])
            for line in fh if line.strip()
        ]
    assert len(keys) == len(set(keys))
    # every merge's lineage is still reachable (live chain + archive)
    assert t3.lineage_df().count() >= 5


def test_legacy_oldest_first_crash_state_heals(spark, tmp_path):
    """A crash state produced by the OLD oldest-first order (parents
    deleted, delta children orphaned) must not wedge the table: reads,
    orphan_files(), maintain() and a fresh expire all succeed."""
    t = _delta_chain(spark, tmp_path)
    expected = sorted((r.path, r.content) for r in t.read().collect())
    versions = t._all_versions()
    cur = versions[-1]

    # simulate the old code's crash: CURRENT re-rooted to full, then the
    # two OLDEST expired manifests deleted, crash before their children
    m = t.manifest_at(cur)
    m.parent_version = None
    with open(t._manifest_path(cur) + ".tmp", "w") as fh:
        json.dump(m.to_json(), fh)
    os.replace(t._manifest_path(cur) + ".tmp", t._manifest_path(cur))
    for v in versions[:2]:
        os.remove(t._manifest_path(v))

    t2 = LakeTable(spark, t.root)
    # the orphaned children are unresolvable — exactly the wedge ADVICE
    # described; every public surface must now tolerate it
    with pytest.raises(OSError):
        t2.manifest_at(versions[2])
    assert isinstance(t2.orphan_files(), list)  # no raise
    t2.expire_snapshots(keep_last=1)
    assert t2._all_versions() == [cur]
    report = t2.maintain(keep_snapshots=1)
    assert isinstance(report, dict)
    t3 = LakeTable.load(spark, t.root)
    assert sorted((r.path, r.content) for r in t3.read().collect()) == expected

    # healed table keeps committing normally
    merge_into(t3, _one_key_batch(spark, 99), batch_id=99, stage_batch=True)
    assert t3.read().filter("content = 'b99'").count() == 1
