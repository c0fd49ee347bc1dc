"""Delta-form manifests: commit metadata must be O(changed buckets),
not O(table buckets) — the metadata leg of 'everything proportional to
the change set' (data: pruned COW; changelog: manifest-diff; metadata:
this). Full checkpoints every MANIFEST_CHECKPOINT_EVERY versions bound
delta-chain resolution."""

import json

from pyspark.sql import types as T

import encode_ingest_spark.lake.table as table_mod
from encode_ingest_spark.cdc import repo_file_events
from encode_ingest_spark.lake import LakeTable, merge_into
from encode_ingest_spark.lake.table import bucket_expr

SCHEMA = T.StructType(
    [T.StructField(c, T.StringType()) for c in
     ["repo", "path", "commit", "lang", "content"]]
)
KEYS = ["repo", "path", "commit"]


def _raw(t, v):
    with open(t._manifest_path(v)) as fh:
        return json.load(fh)


def _one_key_batch(spark, n):
    return spark.createDataFrame(
        [("org0/repoX", "src/only.py", "c" * 40, "python", f"b{n}",
          "update", 10_000 + n)],
        "repo string, path string, commit string, lang string, "
        "content string, op string, event_seq long",
    )


def test_narrow_commits_serialize_as_deltas(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=8)
    merge_into(t, repo_file_events(spark, n_keys=400, events_per_key=1, seed=1),
               batch_id=1)
    full_raw = _raw(t, t.current_version())
    assert "files" in full_raw and "delta" not in full_raw  # bootstrap: full

    for i in range(3):
        merge_into(t, _one_key_batch(spark, i), batch_id=2 + i, stage_batch=True)
    v = t.current_version()
    raw = _raw(t, v)
    # a 1-bucket change stores ~1 removed path + 1 added file, not the
    # whole 8-bucket list
    assert "delta" in raw and "files" not in raw
    assert len(raw["delta"]["removed_paths"]) == 1
    assert len(raw["delta"]["added_files"]) == 1
    # smaller than ITS OWN full form (at 8 buckets the fixed header
    # dominates; the files section shrinks 8 entries → 2 paths, and at
    # 10^4 buckets that section IS the manifest)
    assert len(json.dumps(raw)) < len(json.dumps(t.manifest_at(v).to_json()))

    # a FRESH instance (empty cache) resolves the chain identically
    t2 = LakeTable.load(spark, t.root)
    assert {f.path for f in t2.manifest_at(v).files} == {
        f.path for f in t.manifest_at(v).files
    }
    assert t2.read().count() == t.read().count()
    # time travel into the middle of the delta chain
    assert t2.read(version=v - 1).count() == t.read(version=v - 1).count()


def test_checkpoint_versions_are_full(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(table_mod, "MANIFEST_CHECKPOINT_EVERY", 3)
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=4)
    merge_into(t, repo_file_events(spark, n_keys=100, events_per_key=1, seed=3),
               batch_id=1)
    for i in range(5):
        merge_into(t, _one_key_batch(spark, i), batch_id=2 + i, stage_batch=True)
    forms = {v: ("delta" in _raw(t, v)) for v in range(1, t.current_version() + 1)}
    assert forms[3] is False and forms[6] is False  # checkpoints: full
    assert forms[2] and forms[4] and forms[5]  # in-between: deltas


def test_expire_snapshots_rewrites_delta_root_as_full(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=8)
    merge_into(t, repo_file_events(spark, n_keys=200, events_per_key=1, seed=5),
               batch_id=1)
    for i in range(4):
        merge_into(t, _one_key_batch(spark, i), batch_id=2 + i, stage_batch=True)
    before = {tuple(r) for r in t.read().collect()}
    assert "delta" in _raw(t, t.current_version() - 1)  # chain is delta-form

    t.expire_snapshots(keep_last=2)
    # the oldest kept manifest was re-rooted AND materialized full — a
    # fresh process (no cache, parents deleted) must still load it
    t3 = LakeTable.load(spark, t.root)
    oldest = t3._all_versions()[0]
    raw = _raw(t3, oldest)
    assert "delta" not in raw and raw.get("parent_version") is None
    assert {tuple(r) for r in t3.read().collect()} == before
    assert t3.read(version=oldest).count() > 0


def test_rebucket_commit_stays_full_form(spark, tmp_path):
    """A rebucket replaces every file — the delta would be larger than
    the full list, so the serializer keeps the full form."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=2)
    merge_into(t, repo_file_events(spark, n_keys=100, events_per_key=1, seed=9),
               batch_id=1)
    t.rebucket(4)
    raw = _raw(t, t.current_version())
    assert "files" in raw and "delta" not in raw
    assert t.read().withColumn("b", bucket_expr(KEYS, 4)).count() == t.read().count()


def test_bounded_manifest_cache_keeps_resolution_correct(spark, tmp_path, monkeypatch):
    """Cache eviction (long-running stream protection) must not break
    delta resolution or the expire walk — resolution falls back to disk
    and is depth-bounded by the checkpoint interval."""
    monkeypatch.setattr(LakeTable, "_MANIFEST_CACHE_MAX", 4)
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=4)
    merge_into(t, repo_file_events(spark, n_keys=100, events_per_key=1, seed=31),
               batch_id=1)
    for i in range(8):
        merge_into(t, _one_key_batch(spark, i), batch_id=2 + i, stage_batch=True)
    assert len(t._manifest_cache) <= 4
    want = {tuple(r) for r in t.read().collect()}
    t2 = LakeTable.load(spark, t.root)
    assert {tuple(r) for r in t2.read().collect()} == want
    # time travel across evicted middles
    assert t2.read(version=3).count() > 0
    t2.expire_snapshots(keep_last=3)
    t3 = LakeTable.load(spark, t.root)
    assert {tuple(r) for r in t3.read().collect()} == want


def test_lineage_survives_snapshot_expiry(spark, tmp_path):
    """Ingest history (north rule: per-partition lineage) must outlive
    snapshot retention: expire folds expired manifests' lineage into the
    archive; a double expire does not duplicate rows."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=4)
    for i in range(4):
        merge_into(t, repo_file_events(spark, n_keys=50, events_per_key=1,
                                       seed=60 + i),
                   batch_id=i + 1, offset_range=(i * 50, (i + 1) * 50 - 1))
    before = {(r.source_id, r.batch_id) for r in t.lineage_df().collect()}
    assert {b for (_, b) in before} == {1, 2, 3, 4}

    t.expire_snapshots(keep_last=1)
    after = {(r.source_id, r.batch_id) for r in t.lineage_df().collect()}
    assert after == before
    # offsets preserved through the archive
    offs = {r.batch_id: (r.source_offset_start, r.source_offset_end)
            for r in t.lineage_df().collect()}
    assert offs[2] == (50, 99)
    # idempotent under repeat
    t.expire_snapshots(keep_last=1)
    assert len(t.lineage_df().collect()) == 4


def test_expire_crash_before_deletions_leaves_table_loadable(
    spark, tmp_path, monkeypatch
):
    """The re-root of the oldest kept (delta-form) manifest happens
    BEFORE any expired manifest is deleted — a crash anywhere in the
    deletion phase must leave CURRENT loadable from a fresh process."""
    import os as _os

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=8)
    merge_into(t, repo_file_events(spark, n_keys=200, events_per_key=1, seed=5),
               batch_id=1)
    for i in range(4):
        merge_into(t, _one_key_batch(spark, i), batch_id=2 + i, stage_batch=True)
    assert "delta" in _raw(t, t.current_version())
    before = {tuple(r) for r in t.read().collect()}

    real_remove = _os.remove

    def crash_on_manifest(path, *a, **kw):
        if str(path).endswith(".manifest.json"):
            raise OSError("injected crash during expire deletions")
        return real_remove(path, *a, **kw)

    monkeypatch.setattr(_os, "remove", crash_on_manifest)
    import pytest as _pytest

    with _pytest.raises(OSError, match="injected crash"):
        t.expire_snapshots(keep_last=2)
    monkeypatch.setattr(_os, "remove", real_remove)

    # fresh process view: all manifests CURRENT depends on must resolve
    t2 = LakeTable.load(spark, t.root)
    assert {tuple(r) for r in t2.read().collect()} == before
    # and a re-run of expire completes idempotently
    t2.expire_snapshots(keep_last=2)
    t3 = LakeTable.load(spark, t.root)
    assert {tuple(r) for r in t3.read().collect()} == before


def test_schemas_watermarks_serialize_as_deltas(spark, tmp_path):
    """VERDICT r3 directive 6: at 200 sources, a narrow commit's raw
    manifest must carry only the CHANGED watermark entry (and only new
    schema versions), not the full maps — commit metadata O(changed) in
    every dimension — while resolution (fresh process, and across an
    expire re-root) still yields the complete maps."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=8)
    merge_into(t, repo_file_events(spark, n_keys=300, events_per_key=1, seed=9),
               batch_id=1)
    # 200 synthetic source watermarks land in one commit (the shape a
    # 200-stream deployment reaches after its first full cycle)
    import copy

    m = copy.deepcopy(t.current_manifest())
    m.watermarks.update(
        {f"src{i:03d}": {"batch_id": 1, "offset_end": 10 + i}
         for i in range(200)}
    )
    m.version += 1
    m.parent_version = m.version - 1
    m.snapshot_id += 1
    t._write_manifest(m)

    # narrow single-source commit on top
    merge_into(t, _one_key_batch(spark, 0), batch_id=2, stage_batch=True)
    v = t.current_version()
    raw = _raw(t, v)
    assert "delta" in raw and "watermarks" not in raw and "schemas" not in raw
    d = raw["delta"]
    # only THE one changed watermark is stored; no schema churn at all
    assert list(d["watermarks"]) == ["default"]
    assert d["schemas"] == {}
    assert len(json.dumps(raw)) < len(json.dumps(t.manifest_at(v).to_json())) / 5

    # fresh process resolves the full maps through the delta chain
    t2 = LakeTable(spark, t.root)
    m2 = t2.manifest_at(v)
    assert len(m2.watermarks) == 201  # 200 synthetic + the updated default
    assert m2.watermarks["src199"] == {"batch_id": 1, "offset_end": 209}
    assert m2.watermarks["default"]["batch_id"] == 2

    # expire re-roots the kept manifest FULL; a fresh process still sees
    # every watermark afterwards
    merge_into(t, _one_key_batch(spark, 1), batch_id=3, stage_batch=True)
    t.expire_snapshots(keep_last=1)
    t3 = LakeTable.load(spark, t.root)
    m3 = t3.current_manifest()
    assert len(m3.watermarks) == 201
    assert m3.watermarks["default"]["batch_id"] == 3
    assert t3.read().count() > 0
