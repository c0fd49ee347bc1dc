"""Per-file Bloom-filter pruning (``write.bloom_filter_columns``).

Pins the bloom core (no false negatives ever, usable false-positive
rate, int/float fold, unsupported types degrade to no-bloom), that all
three write paths (Spark stage write, driver-local delta commit, the
native streaming sink's footer-stats helper) record blooms in manifest
stats, and the three read paths that prune with them: ``LakeTable.read``
``file_value_ranges`` point probes where overlapping min/max ranges
prune nothing, ``LakeTable.lookup`` on unclustered keys, and the
DataSource ``pushFilters`` planner — including the merge-on-read
resurrection guard (mutable-column bloom pruning stays bucket-granular
in delta-holding buckets).
"""

import random

import pytest
from pyspark.sql import types as T
from pyspark.sql.datasource import EqualTo

from encode_ingest_spark.lake import LakeTable, merge_into
from encode_ingest_spark.lake.bloom import (
    bloom_may_contain,
    build_bloom,
)
from encode_ingest_spark.lake.merge import merge_local_delta

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content_id", T.StringType(), True),
    ]
)
KEYS = ["repo", "path"]


# --------------------------------------------------------------------
# core
# --------------------------------------------------------------------

def test_bloom_no_false_negatives_and_low_fp():
    rng = random.Random(13)
    present = [f"h{rng.randrange(10**12):012x}" for _ in range(1000)]
    bl = build_bloom(present)
    assert bl is not None
    assert all(bloom_may_contain(bl, v) for v in present)
    absent = [f"x{rng.randrange(10**12):012x}" for _ in range(5000)]
    fp = sum(bloom_may_contain(bl, v) for v in absent) / len(absent)
    assert fp < 0.05  # ~1% design point; 5% is the loud-failure bar


def test_bloom_type_handling():
    # int/float fold: an int probe finds a float-written value
    bl = build_bloom([1.0, 2.0, 3.5])
    assert bloom_may_contain(bl, 1) and bloom_may_contain(bl, 3.5)
    bl = build_bloom([1, 2, 3])
    assert bloom_may_contain(bl, 2.0)
    # unsupported types build NO bloom; probes on missing blooms keep
    import datetime as dt

    assert build_bloom([dt.datetime(2024, 1, 1)]) is None
    assert build_bloom([None, None]) is None
    assert bloom_may_contain(None, "anything")
    # null probe is conservative
    bl = build_bloom(["a"])
    assert bloom_may_contain(bl, None)
    # density cap: more distinct values than bits/4 -> no bloom
    assert build_bloom(range(100), max_bits=128) is None


# --------------------------------------------------------------------
# table fixtures: unclustered high-cardinality content_id, several
# files per bucket with OVERLAPPING min/max ranges (range-pruning dead)
# --------------------------------------------------------------------

def _b(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, lang string, content_id string, "
        "op string, event_seq long",
    )


def _cid(i):
    # interleave so every file's [min, max] spans the whole id space
    return f"c{(i * 7919) % 100000:05d}"


def _mk_bloomed(spark, tmp_path, n_batches=3, rows_per=40):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=2,
        properties={"write.bloom_filter_columns": "content_id,path"},
    )
    for bi in range(n_batches):
        rows = [
            (f"r{i % 3}", f"f{bi}_{i}.py", "py", _cid(bi * rows_per + i),
             "upsert", bi + 1)
            for i in range(rows_per)
        ]
        merge_into(t, _b(spark, rows), batch_id=bi + 1, mode="mor")
    return t


def test_stage_write_records_blooms(spark, tmp_path):
    t = _mk_bloomed(spark, tmp_path)
    m = t.current_manifest()
    with_bloom = [
        f for f in m.files
        if isinstance(f.stats, dict) and "content_id" in (f.stats.get("blooms") or {})
    ]
    assert with_bloom and len(with_bloom) == len(m.files)
    # key column 'path' blooms too (requested); non-requested cols don't
    assert all("path" in f.stats["blooms"] for f in with_bloom)
    assert all("lang" not in (f.stats.get("blooms") or {}) for f in m.files)


def test_read_point_probe_prunes_files_ranges_cannot(spark, tmp_path):
    t = _mk_bloomed(spark, tmp_path)
    probe = _cid(5)  # lives in batch 0's files only
    full = t.read()
    pruned = t.read(file_value_ranges={"content_id": [probe]})
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
    # pruning-only contract: the row is still there, caller filters
    got = pruned.where(pruned.content_id == probe).collect()
    assert len(got) == 1
    # a value NO file holds prunes everything (fp permitting)
    nothing = t.read(file_value_ranges={"content_id": ["zzz-not-present"]})
    assert len(nothing.inputFiles()) < len(full.inputFiles())


def test_read_bloom_respects_mor_resurrection_guard(spark, tmp_path):
    """content_id is MUTABLE: after an update A->B lands as a delta,
    probing the OLD value A must not drop only the delta file (which
    would resurrect the stale base row). Bucket-granular: the bucket
    stays whole, MOR resolution runs, the caller's filter sees no row."""
    t = LakeTable.create(
        spark, str(tmp_path / "t2"), SCHEMA, KEYS, num_buckets=1,
        properties={"write.bloom_filter_columns": "content_id"},
    )
    merge_into(
        t, _b(spark, [("r1", "a.py", "py", "AAA", "upsert", 1),
                      ("r1", "b.py", "py", "KEEP", "upsert", 1)]),
        batch_id=1, mode="mor",
    )
    merge_into(
        t, _b(spark, [("r1", "a.py", "py", "BBB", "upsert", 2)]),
        batch_id=2, mode="mor",
    )
    probed = t.read(file_value_ranges={"content_id": ["AAA"]})
    # the bucket held a file whose bloom has AAA -> whole bucket kept
    rows = {(r.path, r.content_id) for r in probed.collect()}
    assert ("a.py", "BBB") in rows  # newest version, never the stale AAA
    assert ("a.py", "AAA") not in rows
    # probing a value NO file ever held skips the bucket entirely
    assert t.read(file_value_ranges={"content_id": ["NOPE"]}).count() == 0


def test_lookup_uses_key_bloom(spark, tmp_path, monkeypatch):
    t = _mk_bloomed(spark, tmp_path)
    # correctness first
    got = t.lookup({"repo": "r1", "path": "f2_4.py"})
    assert got is not None and got["content_id"] == _cid(2 * 40 + 4)
    # pruning: count files handed to the arrow resolver
    from encode_ingest_spark.lake import datasource as ds

    seen = []
    orig = ds._resolve_bucket

    def spy(root, files, *a, **kw):
        seen.append(len(files))
        return orig(root, files, *a, **kw)

    monkeypatch.setattr(ds, "_resolve_bucket", spy)
    t.lookup({"repo": "r1", "path": "f2_4.py"})
    m = t.current_manifest()
    per_bucket = max(
        sum(1 for f in m.files if f.bucket == b)
        for b in {f.bucket for f in m.files}
    )
    assert seen and seen[0] < per_bucket  # bloom dropped sibling files


def test_pushdown_planner_prunes_with_blooms(spark, tmp_path):
    from encode_ingest_spark.lake.datasource import LakeSnapshotReader

    t = _mk_bloomed(spark, tmp_path)
    m = t.current_manifest()
    out_schema = T.StructType(
        [f for f in m.schema.fields if f.name not in ("_seq", "_deleted")]
    )

    def plan(filters):
        r = LakeSnapshotReader(out_schema, {"path": t.root})
        r.pushFilters(filters)
        return r._files

    base = plan([])
    probe = _cid(5)
    kept = plan([EqualTo(attribute=("content_id",), value=probe)])
    assert 0 < len(kept) < len(base)
    # result parity through the real reader
    from encode_ingest_spark.lake.datasource import register_lake_sources

    register_lake_sources(spark)
    df = spark.read.format("lake").load(t.root)
    got = df.where(df.content_id == probe).collect()
    assert len(got) == 1 and got[0].content_id == probe


def test_local_delta_commit_records_blooms(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t3"), SCHEMA, KEYS, num_buckets=2,
        properties={"write.bloom_filter_columns": "content_id"},
    )
    from encode_ingest_spark.lake.table import bucket_expr
    from encode_ingest_spark.lake.hashing import bucket_of

    rows = [
        {
            "repo": "r1", "path": f"p{i}.py", "lang": "py",
            "content_id": _cid(i), "_seq": 1, "_deleted": False,
            "_pb": bucket_of([f"r1", f"p{i}.py"],
                             [T.StringType(), T.StringType()], 2),
        }
        for i in range(10)
    ]
    merge_local_delta(t, rows, batch_id=1)
    m = t.current_manifest()
    blooms = [
        (f.stats or {}).get("blooms", {}).get("content_id") for f in m.files
    ]
    assert blooms and all(b is not None for b in blooms)
    # probe parity: the recorded bloom answers membership correctly
    assert bloom_may_contain(blooms[0], _cid(0)) or bloom_may_contain(
        blooms[-1], _cid(0)
    )
    got = t.lookup({"repo": "r1", "path": "p3.py"})
    assert got is not None and got["content_id"] == _cid(3)
