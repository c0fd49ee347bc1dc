"""CREATE TABLE ... CLONE (LakeTable.clone_to).

Pins the two halves of the shallow-clone safety story (the Delta
VACUUM-on-either-side hazard, closed by construction):

* source side — the clone records a retention pin at the cloned
  version, so aggressive source expiry keeps the shared files;
* clone side — expiry/maintain never deletes a path outside the
  clone's own root, so rewriting/compacting the clone only reclaims
  clone-local files.

Plus: zero-copy (no data files under the clone root), full read
parity at the cloned version, independent evolution both ways,
exactly-once watermark carry (re-driving the source's ingest against
the clone fence-skips), deep-clone copies, version/tag addressing,
and existing-destination refusal.
"""

import os

import pytest
from pyspark.sql import types as T

from encode_ingest_spark.lake import LakeTable, merge_into

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("x", T.StringType(), True),
    ]
)
DDL = "id string, x string, op string, event_seq long"


def _mk(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "src"), SCHEMA, ["id"], num_buckets=2
    )
    merge_into(
        t,
        spark.createDataFrame(
            [("a", "a1", "insert", 1), ("b", "b1", "insert", 1)], DDL
        ),
        batch_id=1, source_id="s1",
    )
    return t


def _data_files_under(root):
    out = []
    for dirpath, _, names in os.walk(root):
        if "_meta" in dirpath or "_staging" in dirpath:
            continue
        out.extend(n for n in names if n.endswith(".parquet"))
    return out


def test_shallow_clone_zero_copy_read_parity(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.current_version()
    c = t.clone_to(str(tmp_path / "fork"))
    assert _data_files_under(c.root) == []  # metadata-only
    assert {tuple(r) for r in c.read().collect()} == {
        tuple(r) for r in t.read(version=v).collect()
    }
    # the source holds a retention pin at the cloned version; the
    # clone records which pin protects it (release is mechanical)
    pin = c.current_manifest().properties["clone.pin"]
    assert pin.startswith("clone.fork.")
    assert t.pinned_versions().get(pin) == v
    # refuses an existing destination
    with pytest.raises(FileExistsError):
        t.clone_to(str(tmp_path / "fork"))


def test_clone_evolves_independently_both_ways(spark, tmp_path):
    t = _mk(spark, tmp_path)
    c = t.clone_to(str(tmp_path / "fork"))
    merge_into(
        c,
        spark.createDataFrame([("a", "fork!", "upsert", 2)], DDL),
        batch_id=1, source_id="fork_writes", mode="mor",
    )
    merge_into(
        t,
        spark.createDataFrame([("b", "src!", "upsert", 2)], DDL),
        batch_id=2, source_id="s1",
    )
    got_c = {r["id"]: r["x"] for r in c.read().collect()}
    got_t = {r["id"]: r["x"] for r in t.read().collect()}
    assert got_c == {"a": "fork!", "b": "b1"}
    assert got_t == {"a": "a1", "b": "src!"}


def test_clone_carries_exactly_once_watermarks(spark, tmp_path):
    t = _mk(spark, tmp_path)
    c = t.clone_to(str(tmp_path / "fork"))
    # replaying the source's already-cloned batch fence-skips on the
    # clone; the NEXT batch lands
    res = merge_into(
        c,
        spark.createDataFrame([("a", "dup", "upsert", 1)], DDL),
        batch_id=1, source_id="s1",
    )
    assert res.skipped
    res = merge_into(
        c,
        spark.createDataFrame([("c", "c1", "insert", 2)], DDL),
        batch_id=2, source_id="s1",
    )
    assert not res.skipped
    assert {r["id"] for r in c.read().collect()} == {"a", "b", "c"}


def test_clone_side_gc_never_touches_source_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.current_version()
    c = t.clone_to(str(tmp_path / "fork"))
    # rewrite every bucket on the clone (drops the ../ references from
    # CURRENT), then expire aggressively — the shared source files must
    # survive
    c.compact_buckets([f.bucket for f in c.current_manifest().files])
    c.expire_snapshots(keep_last=1)
    assert {tuple(r) for r in t.read(version=v).collect()} == {
        ("a", "a1"), ("b", "b1")
    }
    # and the clone still reads its own (now-local) state
    assert c.read().count() == 2
    assert c.orphan_files() == []


def test_source_expiry_keeps_pinned_clone_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.current_version()
    c = t.clone_to(str(tmp_path / "fork"))
    # source moves on and expires aggressively; the pin holds v's files
    merge_into(
        t,
        spark.createDataFrame([("a", "a2", "upsert", 2)], DDL),
        batch_id=2, source_id="s1",
    )
    t.expire_snapshots(keep_last=1)
    assert {r["x"] for r in c.read().collect()} == {"a1", "b1"}
    # releasing the pin opens the files to future source retention
    pin = c.current_manifest().properties["clone.pin"]
    t.unpin_version(pin)
    assert pin not in t.pinned_versions()


def test_deep_clone_copies_files_no_pin(spark, tmp_path):
    t = _mk(spark, tmp_path)
    c = t.clone_to(str(tmp_path / "deep"), shallow=False)
    assert len(_data_files_under(c.root)) == len(
        _data_files_under(t.root)
    )
    assert t.pinned_versions() == {}
    # fully independent: delete the SOURCE outright, clone still reads
    import shutil

    shutil.rmtree(t.root)
    assert c.read().count() == 2


def test_clone_at_version_and_tag(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = t.current_version()
    merge_into(
        t,
        spark.createDataFrame([("a", "a2", "upsert", 2)], DDL),
        batch_id=2, source_id="s1",
    )
    c1 = t.clone_to(str(tmp_path / "at_v"), version=v1)
    assert {r["x"] for r in c1.read().collect()} == {"a1", "b1"}
    t.tag("rel", v1)
    c2 = t.clone_to(str(tmp_path / "at_tag"), tag="rel")
    assert {r["x"] for r in c2.read().collect()} == {"a1", "b1"}
    with pytest.raises(ValueError, match="not both"):
        t.clone_to(str(tmp_path / "bad"), version=v1, tag="rel")


def test_clone_refuses_nested_destination(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="nest"):
        t.clone_to(os.path.join(t.root, "fork"))


def test_same_basename_clones_get_distinct_pins(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = t.current_version()
    (tmp_path / "dev").mkdir()
    (tmp_path / "qa").mkdir()
    c1 = t.clone_to(str(tmp_path / "dev" / "fork"))
    merge_into(
        t,
        spark.createDataFrame([("a", "a2", "upsert", 2)], DDL),
        batch_id=2, source_id="s1",
    )
    c2 = t.clone_to(str(tmp_path / "qa" / "fork"))
    p1 = c1.current_manifest().properties["clone.pin"]
    p2 = c2.current_manifest().properties["clone.pin"]
    assert p1 != p2
    pins = t.pinned_versions()
    assert pins[p1] == v1 and pins[p2] == v1 + 1
    # aggressive expiry keeps BOTH clones readable
    t.expire_snapshots(keep_last=1)
    assert {r["x"] for r in c1.read().collect()} == {"a1", "b1"}
    assert {r["x"] for r in c2.read().collect()} == {"a2", "b1"}


def test_shallow_of_shallow_refused_until_local(spark, tmp_path):
    t = _mk(spark, tmp_path)
    c = t.clone_to(str(tmp_path / "fork"))
    with pytest.raises(ValueError, match="shallow clone of a shallow"):
        c.clone_to(str(tmp_path / "fork2"))
    # once the intermediate compacts to local files, re-cloning works
    c.compact_buckets([f.bucket for f in c.current_manifest().files])
    c2 = c.clone_to(str(tmp_path / "fork2"))
    assert {r["x"] for r in c2.read().collect()} == {"a1", "b1"}


def test_deep_clone_of_shallow_clone_is_self_contained(spark, tmp_path):
    t = _mk(spark, tmp_path)
    c = t.clone_to(str(tmp_path / "fork"))
    d = c.clone_to(str(tmp_path / "deepfork"), shallow=False)
    # every referenced file lives under the deep clone root
    for f in d.current_manifest().files:
        p = os.path.abspath(os.path.join(d.root, f.path))
        assert p.startswith(os.path.abspath(d.root) + os.sep), f.path
    # fully independent of BOTH ancestors
    import shutil

    shutil.rmtree(t.root)
    shutil.rmtree(c.root)
    assert {r["x"] for r in d.read().collect()} == {"a1", "b1"}


def test_clone_from_branch_ref_refused(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create_branch("wap")
    br = LakeTable(spark, t.root, ref="wap")
    with pytest.raises(ValueError, match="main"):
        br.clone_to(str(tmp_path / "bad"))
