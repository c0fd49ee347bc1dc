"""Metadata inspection DataFrames (Iceberg metadata-tables shape) and
the age guard on snapshot expiry.

``files_df`` / ``snapshots_df`` / ``refs_df`` expose the manifest state
the planner actually uses (file stats incl. bloom columns, watermarks,
refs) as DataFrames without opening any data file;
``expire_snapshots(older_than_sec=...)`` pins recent history against an
aggressive ``keep_last`` (Iceberg's expire-older-than + retain-last).
"""

import json
import os

from pyspark.sql import types as T

from encode_ingest_spark.lake import LakeTable, merge_into

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
    ]
)
KEYS = ["repo", "path"]


def _b(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, content string, op string, "
        "event_seq long"
    )


def _mk(spark, tmp_path, n_batches=3, **kw):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS,
                         num_buckets=2, **kw)
    for i in range(n_batches):
        merge_into(
            t,
            _b(spark, [(f"r{j % 2}", f"f{i}_{j}.py", f"c{i}{j}", "upsert",
                        i + 1) for j in range(6)]),
            batch_id=i + 1, mode="mor",
        )
    return t


def test_files_df_matches_manifest(spark, tmp_path):
    t = _mk(spark, tmp_path,
            properties={"write.bloom_filter_columns": "content"})
    m = t.current_manifest()
    rows = {r.path: r for r in t.files_df().collect()}
    assert set(rows) == {f.path for f in m.files}
    f0 = m.files[0]
    r0 = rows[f0.path]
    assert (r0.bucket, r0.rows, r0.bytes, r0.is_delta) == (
        f0.bucket, f0.rows, f0.bytes, f0.is_delta
    )
    assert r0.bloom_columns == ["content"]
    # time travel: version 1 sees only the first batch's files
    assert t.files_df(version=1).count() == len(t.manifest_at(1).files)


def test_snapshots_df_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    df = t.snapshots_df().orderBy("version")
    rows = df.collect()
    assert [r.version for r in rows] == [0, 1, 2, 3]
    assert rows[-1].watermarks.get("default") == 3
    assert rows[-1].n_files == len(t.current_manifest().files)
    assert rows[-1].key_cols == KEYS
    assert rows[1].parent_version == 0


def test_refs_df(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.tag("release-1", 2)
    t.create_branch("wap")
    refs = {r.name: r for r in t.refs_df().collect()}
    assert refs["main"].type == "branch"
    assert refs["main"].version == t.current_version()
    assert refs["release-1"].type == "tag" and refs["release-1"].version == 2
    assert refs["wap"].type == "branch"
    assert refs["wap"].fork_version == t.current_version()


def test_expire_age_guard_keeps_recent_versions(spark, tmp_path):
    """keep_last=1 alone would drop versions 0-2; the age guard keeps
    everything committed inside the window regardless."""
    t = _mk(spark, tmp_path)
    before = t._all_versions()
    t.expire_snapshots(keep_last=1, older_than_sec=3600)
    assert t._all_versions() == before  # every version inside the window
    # age every manifest far into the past -> keep_last wins again
    for v in before:
        p = t._manifest_path(v)
        with open(p) as fh:
            raw = json.load(fh)
        raw["committed_at"] = 1.0
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(raw, fh)
        os.replace(tmp, p)
    t._manifest_cache.clear()
    t.expire_snapshots(keep_last=1, older_than_sec=3600)
    assert t._all_versions() == [before[-1]]
    # the survivor still reads fine (re-rooted to full form)
    assert t.read().count() == 18
