"""Filter pushdown on the native ``lake`` reader and the batch
``lake_changes`` read.

Pins: key equality/IN conjuncts route the scan to their hash bucket(s)
through the Murmur3 twin; manifest col_stats prune files under the same
key-vs-mutable safety rules as ``LakeTable.read`` (mutable conditions
are bucket-granular in delta-holding buckets — the merge-on-read
resurrection guard); pruning never changes results because every filter
is re-evaluated by Spark; and the batch ``lake_changes`` reader is
row-for-row ``read_changes`` (Delta ``table_changes`` shape) with
changed-bucket partition planning.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import EqualTo, GreaterThan, In

from encode_ingest_spark.lake import LakeTable, merge_into
from encode_ingest_spark.lake.datasource import (
    CHANGE_COL,
    LakeChangesBatchReader,
    LakeSnapshotReader,
    changelog_schema,
    register_lake_sources,
)
from encode_ingest_spark.lake.hashing import bucket_of

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)
KEYS = ["repo", "path"]
KEY_DTYPES = [T.StringType(), T.StringType()]


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_lake_sources(spark)


def _b(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, lang string, content string, "
        "op string, event_seq long",
    )


def _mk(spark, tmp_path, buckets=4, properties=None):
    return LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, KEYS,
        num_buckets=buckets, properties=properties,
    )


def _seed(spark, t):
    merge_into(
        t,
        _b(spark, [
            ("r1", "a.py", "py", "x1", "upsert", 1),
            ("r1", "b.py", "py", "y1", "upsert", 1),
            ("r2", "c.go", "go", "z1", "upsert", 1),
            ("r3", "d.rs", "rs", "w1", "upsert", 1),
        ]),
        batch_id=1, mode="mor",
    )
    merge_into(
        t,
        _b(spark, [
            ("r1", "a.py", "py", "x2", "upsert", 2),
            ("r2", "c.go", "go", None, "delete", 2),
        ]),
        batch_id=2, mode="mor",
    )


def _snap_schema():
    return T.StructType(
        [f for f in SCHEMA.fields] )


def _reader(t, **opts):
    o = {"path": t.root}
    o.update(opts)
    return LakeSnapshotReader(_snap_schema(), o)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _buckets(parts):
    return {g["bucket"] for p in parts for g in p.groups}


def _n_files(parts):
    return sum(
        len(g.get("files", [])) + len(g.get("old_files", []))
        + len(g.get("new_files", []))
        for p in parts for g in p.groups
    )


# ------------------------------------------------- bucket routing


def test_key_equality_routes_to_one_bucket(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    r = _reader(t)
    assert len(r.partitions()) > 1  # multiple buckets before pruning
    r = _reader(t)
    r.pushFilters([EqualTo(("repo",), "r1"), EqualTo(("path",), "a.py")])
    parts = r.partitions()
    assert len(parts) == 1
    assert _buckets(parts) == {bucket_of(("r1", "a.py"), KEY_DTYPES, 4)}
    got = (
        spark.read.format("lake").load(t.root)
        .where("repo = 'r1' and path = 'a.py'")
    )
    exp = t.read().where("repo = 'r1' and path = 'a.py'")
    assert _rows(got) == _rows(exp) and got.count() == 1


def test_in_filter_routes_to_candidate_buckets(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    r = _reader(t)
    r.pushFilters([EqualTo(("repo",), "r1"), In(("path",), ["a.py", "b.py"])])
    want = {
        bucket_of(("r1", "a.py"), KEY_DTYPES, 4),
        bucket_of(("r1", "b.py"), KEY_DTYPES, 4),
    }
    assert _buckets(r.partitions()) <= want
    got = (
        spark.read.format("lake").load(t.root)
        .where("repo = 'r1' and path in ('a.py', 'b.py')")
    )
    exp = t.read().where("repo = 'r1' and path in ('a.py', 'b.py')")
    assert _rows(got) == _rows(exp)


def test_partial_key_filters_do_not_route(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    base = len(_reader(t).partitions())
    r = _reader(t)
    r.pushFilters([EqualTo(("repo",), "r1")])  # path unpinned, no stats
    assert len(r.partitions()) == base
    got = spark.read.format("lake").load(t.root).where("repo = 'r1'")
    assert _rows(got) == _rows(t.read().where("repo = 'r1'"))


def test_contradictory_key_conjuncts_scan_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    r = _reader(t)
    r.pushFilters([
        EqualTo(("repo",), "r1"), EqualTo(("repo",), "r2"),
        EqualTo(("path",), "a.py"),
    ])
    assert r.partitions() == []
    got = (
        spark.read.format("lake").load(t.root)
        .where("repo = 'r1' and repo = 'r2' and path = 'a.py'")
    )
    assert got.count() == 0


def test_pushdown_option_false_disables_pruning(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    r = _reader(t, pushdown="false")
    r.pushFilters([EqualTo(("repo",), "r1"), EqualTo(("path",), "a.py")])
    assert len(r.partitions()) == len(_reader(t).partitions())
    got = (
        spark.read.format("lake").option("pushdown", "false").load(t.root)
        .where("repo = 'r1' and path = 'a.py'")
    )
    assert got.count() == 1


# ------------------------------------------------- col_stats pruning


def test_mutable_stats_prune_is_bucket_granular_and_safe(spark, tmp_path):
    """MOR resurrection guard: base row content='aaa' superseded by a
    delta with content='zzz'. Per-FILE pruning on the mutable column
    would drop the delta for a content='aaa' probe and resurrect the
    stale base row; bucket-granular pruning keeps both files (some file
    may match) and Spark's residual filter sees only the RESOLVED row."""
    t = _mk(
        spark, tmp_path, buckets=1,
        properties={"write.sort_within_buckets": "content"},
    )
    merge_into(
        t, _b(spark, [("r1", "a.py", "py", "aaa", "upsert", 1)]),
        batch_id=1, mode="mor",
    )
    merge_into(
        t, _b(spark, [("r1", "a.py", "py", "zzz", "upsert", 2)]),
        batch_id=2, mode="mor",
    )
    # the probe value sits inside the BASE file's stats range only:
    # the bucket survives (bucket-granular), both files are read
    r = _reader(t)
    r.pushFilters([EqualTo(("content",), "aaa")])
    parts = r.partitions()
    assert len(parts) == 1 and _n_files(parts) == 2
    got = spark.read.format("lake").load(t.root).where("content = 'aaa'")
    assert got.count() == 0  # resolved state is 'zzz'; no resurrection
    # a value outside EVERY file's range drops the whole bucket
    r = _reader(t)
    r.pushFilters([EqualTo(("content",), "mmm")])
    assert r.partitions() == []
    assert (
        spark.read.format("lake").load(t.root).where("content = 'mmm'")
    ).count() == 0


def test_mutable_stats_prune_per_file_without_deltas(spark, tmp_path):
    """COW buckets hold fully-resolved files, so mutable-column stats
    prune per file."""
    t = _mk(
        spark, tmp_path, buckets=4,
        properties={"write.sort_within_buckets": "content"},
    )
    merge_into(
        t,
        _b(spark, [
            ("r1", "a.py", "py", "aaa", "upsert", 1),
            ("r2", "c.go", "go", "zzz", "upsert", 1),
            ("r3", "d.rs", "rs", "mmm", "upsert", 1),
        ]),
        batch_id=1, mode="cow",
    )
    r = _reader(t)
    r.pushFilters([EqualTo(("content",), "zzz")])
    kept = r.partitions()
    assert _n_files(kept) < 3
    got = spark.read.format("lake").load(t.root).where("content = 'zzz'")
    assert _rows(got) == _rows(t.read().where("content = 'zzz'"))
    assert got.count() == 1


def test_range_filter_prunes_key_files_in_delta_bucket(spark, tmp_path):
    """Key-column stats prune per FILE even in a delta-holding bucket —
    a key's value never changes across its versions, so a dropped file
    only hides keys the residual filter excludes anyway."""
    t = _mk(
        spark, tmp_path, buckets=1,
        properties={"write.sort_within_buckets": "repo"},
    )
    merge_into(
        t, _b(spark, [("aaa", "a.py", "py", "x", "upsert", 1)]),
        batch_id=1, mode="mor",
    )
    merge_into(
        t, _b(spark, [("zzz", "z.py", "py", "y", "upsert", 2)]),
        batch_id=2, mode="mor",
    )
    r = _reader(t)
    r.pushFilters([GreaterThan(("repo",), "mmm")])
    parts = r.partitions()
    assert len(parts) == 1 and _n_files(parts) == 1
    got = spark.read.format("lake").load(t.root).where("repo > 'mmm'")
    assert _rows(got) == _rows(t.read().where("repo > 'mmm'"))
    assert got.count() == 1


# ------------------------------------------------- batch lake_changes


def test_batch_changes_matches_read_changes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    cur = t.current_version()
    for a, b in [(0, 1), (1, cur), (0, cur)]:
        got = (
            spark.read.format("lake_changes")
            .option("startingVersion", a).option("endingVersion", b)
            .load(t.root)
        )
        exp = t.read_changes(a, b)
        # same columns and types; nullability may loosen through the
        # Spark-side diff's joins
        assert [(f.name, f.dataType) for f in got.schema.fields] == [
            (f.name, f.dataType) for f in exp.schema.fields
        ]
        assert _rows(got) == _rows(exp)


def test_batch_changes_pins_ending_version_schema(spark, tmp_path):
    """A span ending BEFORE a schema evolution reads with the
    end-version schema — exact ``read_changes`` parity, no phantom
    null-filled late columns."""
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    pre = t.current_version()
    evolved = _b(spark, [("r9", "e.py", "py", "q1", "upsert", 9)]).withColumn(
        "stars", F.lit(5).cast("long")
    )
    merge_into(t, evolved, batch_id=3, mode="mor")
    got = (
        spark.read.format("lake_changes")
        .option("startingVersion", 0).option("endingVersion", pre)
        .load(t.root)
    )
    assert "stars" not in got.columns
    assert _rows(got) == _rows(t.read_changes(0, pre))
    # and a span past the evolution carries the new column
    got2 = spark.read.format("lake_changes").load(t.root)
    assert "stars" in got2.columns
    assert _rows(got2) == _rows(t.read_changes(0))


def test_batch_changes_defaults_to_earliest_and_current(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    got = spark.read.format("lake_changes").load(t.root)
    exp = t.read_changes(0)
    assert _rows(got) == _rows(exp)


def test_batch_changes_snapshot_bootstrap(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    got = (
        spark.read.format("lake_changes")
        .option("startingVersion", "snapshot").load(t.root)
    )
    rows = got.collect()
    assert all(r[CHANGE_COL] == "insert" for r in rows)
    assert {(r["repo"], r["path"]) for r in rows} == {
        (r["repo"], r["path"]) for r in t.read().collect()
    }


def test_batch_changes_empty_span(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    cur = t.current_version()
    got = (
        spark.read.format("lake_changes")
        .option("startingVersion", cur).load(t.root)
    )
    assert got.count() == 0


def test_batch_changes_rejects_latest(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    with pytest.raises(Exception, match="STREAMING tail"):
        (
            spark.read.format("lake_changes")
            .option("startingVersion", "latest").load(t.root).collect()
        )


def test_batch_changes_refuses_rebucket_span(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    t.rebucket(8)
    merge_into(
        t, _b(spark, [("r9", "e.py", "py", "q1", "upsert", 9)]),
        batch_id=3, mode="mor",
    )
    with pytest.raises(Exception, match="REBUCKET"):
        (
            spark.read.format("lake_changes")
            .option("startingVersion", 1).load(t.root).collect()
        )


def test_batch_changes_plans_only_changed_buckets(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    v1 = 1
    cur = t.current_version()
    m = t.current_manifest()
    schema = changelog_schema(m.schema, m.key_cols)
    out = T.StructType(
        [f for f in schema.fields if f.name not in ()]  # full changelog
    )
    r = LakeChangesBatchReader(
        out, {"path": t.root, "startingversion": str(v1)}
    )
    want = set(t.changed_buckets(v1, cur))
    assert _buckets(r.partitions()) == want
    assert len(want) < 4  # actually pruned vs the 4-bucket layout


# ------------------------------------------------- task packing


def test_scan_packing_option_groups_small_units(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    loose = _reader(t).partitions()
    r = _reader(t, maxpartitionbytes=str(1 << 30))
    packed = r.partitions()
    assert len(packed) == 1 and len(packed[0].groups) == len(loose)
    got = (
        spark.read.format("lake")
        .option("maxPartitionBytes", 1 << 30).load(t.root)
    )
    assert _rows(got) == _rows(t.read())


def test_delta_bucket_stays_atomic_under_packing(spark, tmp_path):
    t = _mk(spark, tmp_path, buckets=1)
    merge_into(
        t, _b(spark, [("r1", "a.py", "py", "aaa", "upsert", 1)]),
        batch_id=1, mode="mor",
    )
    merge_into(
        t, _b(spark, [("r1", "a.py", "py", "zzz", "upsert", 2)]),
        batch_id=2, mode="mor",
    )
    parts = _reader(t).partitions()
    assert len(parts) == 1 and len(parts[0].groups) == 1
    assert len(parts[0].groups[0]["files"]) == 2  # base + delta together


def test_cow_multifile_bucket_splits_per_file(spark, tmp_path):
    """A bucket with NO deltas splits per file (its live files are
    key-disjoint: one COW commit's output), bounding scan parallelism
    by files rather than buckets."""
    t = _mk(spark, tmp_path, buckets=1)
    merge_into(
        t, _b(spark, [("r1", "a.py", "py", "aaa", "upsert", 1)]),
        batch_id=1, mode="cow",
    )
    r = _reader(t)
    # synthesize a second resolved file in the same bucket (planning-
    # level check; COW/compaction normally fold to one file per bucket)
    clone = dict(r._files[0])
    assert not clone["is_delta"]
    r._files.append(clone)
    parts = r.partitions()
    assert len(parts) == 2
    assert all(len(p.groups) == 1 and len(p.groups[0]["files"]) == 1
               for p in parts)


def test_changes_packing_matches_unpacked(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    base = spark.read.format("lake_changes").load(t.root)
    packed = (
        spark.read.format("lake_changes")
        .option("maxPartitionBytes", 1 << 30).load(t.root)
    )
    assert _rows(packed) == _rows(base)
    m = t.current_manifest()
    r = LakeChangesBatchReader(
        changelog_schema(m.schema, m.key_cols),
        {"path": t.root, "maxpartitionbytes": str(1 << 30)},
    )
    parts = r.partitions()
    assert len(parts) == 1 and len(parts[0].groups) >= 2


def test_stream_packing_option_parity(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    q = (
        spark.readStream.format("lake_changes")
        .option("startingVersion", 0)
        .option("maxPartitionBytes", 1 << 30)
        .load(t.root)
        .writeStream.format("memory").queryName("packed_drain")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert _rows(spark.table("packed_drain")) == _rows(t.read_changes(0))


# --------------------------------------------------------------------
# constraint-extraction safety and batch-span validation
# --------------------------------------------------------------------

def test_extract_constraints_skips_unhashable_literals():
    """Array-typed (list) literals from variant-decoded filters must
    not crash planning — the filter is simply not used for pruning
    (it stays Spark-side like every other filter)."""
    from encode_ingest_spark.lake.datasource import _extract_constraints

    cols = {"repo", "path", "tags"}
    out = _extract_constraints(
        [
            EqualTo(attribute=("tags",), value=["a", "b"]),
            In(attribute=("tags",), value=[["a"], ["b"]]),
            EqualTo(attribute=("repo",), value="r1"),
        ],
        cols,
    )
    assert "tags" not in out
    assert out["repo"]["cands"] == {"r1"}


def test_route_buckets_refuses_naive_datetime_candidates():
    """A naive datetime literal's instant depends on a timezone the
    reader cannot see — routing must decline (scan every bucket)
    rather than risk hashing the wrong instant and pruning a match."""
    import datetime as dt

    from encode_ingest_spark.lake.datasource import (
        _extract_constraints,
        _route_buckets,
    )

    keys = ["id", "ts"]
    dtypes = [T.StringType(), T.TimestampType()]
    naive = dt.datetime(2024, 6, 1, 12, 30)
    cons = _extract_constraints(
        [EqualTo(attribute=("id",), value="a"),
         EqualTo(attribute=("ts",), value=naive)],
        set(keys),
    )
    assert _route_buckets(cons, keys, dtypes, 8) is None
    # the same instant tz-aware routes fine
    aware = naive.replace(tzinfo=dt.timezone.utc)
    cons = _extract_constraints(
        [EqualTo(attribute=("id",), value="a"),
         EqualTo(attribute=("ts",), value=aware)],
        set(keys),
    )
    got = _route_buckets(cons, keys, dtypes, 8)
    assert got is not None and len(got) == 1


def test_batch_changes_invalid_span_raises(spark, tmp_path):
    """A span beyond the table's history (typo'd version / wrong table)
    fails loudly instead of reading as 'no changes' (current version
    here is 3 after seeding)."""
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    cur = t.current_version()
    with pytest.raises(Exception, match="inverted"):
        (spark.read.format("lake_changes")
         .option("startingVersion", cur + 40).load(t.root).collect())
    with pytest.raises(Exception, match="outside the table's history"):
        (spark.read.format("lake_changes")
         .option("endingVersion", cur + 40).load(t.root).collect())
    # start == end stays the legitimate empty span ("no changes since")
    empty = (spark.read.format("lake_changes")
             .option("startingVersion", cur).load(t.root))
    assert empty.count() == 0


def test_changes_schema_pins_default_ending_version(spark, tmp_path):
    """schema() resolves the default endingVersion ONCE and pins it
    into the reader's options, so a commit landing between schema() and
    reader() cannot smear the batch span past the pinned schema."""
    from encode_ingest_spark.lake.datasource import LakeChangesDataSource

    t = _mk(spark, tmp_path)
    _seed(spark, t)
    pinned = t.current_version()
    ds = LakeChangesDataSource(options={"path": t.root})
    st = ds.schema()
    assert ds.options["endingversion"] == str(pinned)
    # a commit after schema(): the reader still stops at the pin
    merge_into(
        t, _b(spark, [("r9", "z.py", "py", "late", "upsert", 9)]),
        batch_id=9, mode="mor",
    )
    r = LakeChangesBatchReader(st, dict(ds.options))
    assert r._end == pinned
