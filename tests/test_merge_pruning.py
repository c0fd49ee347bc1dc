"""Pruned copy-on-write coverage (ADVICE r1): the partial-rewrite branch
must carry untouched buckets by reference, match an unpruned merge, and
the pre-partitioned write must route rows to the bucket dirs that
bucket_expr assigns (HashPartitioning(keys, B) == pmod(hash(keys), B))."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from encode_ingest_spark.cdc import repo_file_events
from encode_ingest_spark.lake import LakeTable, merge_into
from encode_ingest_spark.lake.table import bucket_expr

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)
KEYS = ["repo", "path", "commit"]


def _table(spark, tmp_path, name, buckets=8):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, KEYS, num_buckets=buckets
    )


def _state(table):
    return {
        tuple(r)
        for r in table.read(include_internal=True)
        .select("repo", "path", "commit", "content", "_seq")
        .collect()
    }


def test_pruned_merge_carries_untouched_buckets_by_reference(spark, tmp_path):
    t = _table(spark, tmp_path, "t")
    base = repo_file_events(spark, n_keys=400, events_per_key=1, seed=1)
    merge_into(t, base, batch_id=1)
    m1 = t.current_manifest()
    files_before = {f.bucket: f.path for f in m1.files}
    assert len(files_before) == 8  # every bucket populated

    # a batch whose keys all hash into ONE bucket
    one = spark.createDataFrame(
        [("org0/repoX", "src/only.py", "c" * 40, "python", "body", "insert", 10_000)],
        "repo string, path string, commit string, lang string, content string,"
        " op string, event_seq long",
    )
    target_bucket = one.select(bucket_expr(KEYS, 8).alias("b")).first().b
    res = merge_into(t, one, batch_id=2, stage_batch=True)
    assert res.counts == {"inserted": 1, "updated": 0, "deleted": 0}
    m2 = t.current_manifest()
    after = {f.bucket: f.path for f in m2.files}
    # untouched buckets: identical DataFile paths (carried by reference)
    for b, path in files_before.items():
        if b != target_bucket:
            assert after[b] == path, f"bucket {b} was rewritten needlessly"
    assert after[target_bucket] != files_before[target_bucket]


def test_pruned_equals_unpruned_final_state(spark, tmp_path):
    ev1 = repo_file_events(spark, n_keys=300, events_per_key=2, seed=3,
                           slot_range=(0, 300))
    ev2 = repo_file_events(spark, n_keys=300, events_per_key=2, seed=3,
                           slot_range=(300, 600))
    tp = _table(spark, tmp_path, "pruned")
    tu = _table(spark, tmp_path, "unpruned")
    for i, ev in enumerate((ev1, ev2)):
        merge_into(tp, ev, batch_id=i + 1, prune_buckets=True)
        merge_into(tu, ev, batch_id=i + 1, prune_buckets=False)
    assert _state(tp) == _state(tu)


def test_empty_batch_is_metadata_only_commit(spark, tmp_path):
    t = _table(spark, tmp_path, "t")
    merge_into(t, repo_file_events(spark, n_keys=50, events_per_key=1, seed=5),
               batch_id=1)
    m1 = t.current_manifest()
    empty = spark.createDataFrame(
        [],
        "repo string, path string, commit string, lang string, content string,"
        " op string, event_seq long",
    )
    res = merge_into(t, empty, batch_id=2, stage_batch=True)
    assert res.counts == {"inserted": 0, "updated": 0, "deleted": 0}
    m2 = t.current_manifest()
    assert m2.version == m1.version + 1
    assert [f.path for f in m2.files] == [f.path for f in m1.files]


def test_prepartitioned_write_routes_rows_to_bucket_dirs(spark, tmp_path):
    """The merge write path skips the token repartition because the
    union-agg shuffle already partitions by pmod(hash(keys), B). Verify
    the on-disk invariant directly: every row in every data file hashes
    to the file's bucket directory."""
    t = _table(spark, tmp_path, "t")
    merge_into(t, repo_file_events(spark, n_keys=500, events_per_key=2, seed=7,
                                   slot_range=(0, 500)), batch_id=1)
    # second merge exercises the union (non-bootstrap, pre-partitioned) path
    merge_into(t, repo_file_events(spark, n_keys=500, events_per_key=2, seed=7,
                                   slot_range=(500, 1000)), batch_id=2)
    m = t.current_manifest()
    total = 0
    for f in m.files:
        df = spark.read.parquet(os.path.join(t.root, f.path))
        bad = df.filter(bucket_expr(KEYS, m.num_buckets) != f.bucket).count()
        assert bad == 0, f"{f.path}: {bad} rows misrouted (dir bucket {f.bucket})"
        total += f.rows
    assert total == t.read(include_tombstones=True).count() + 0  # files complete


def test_mor_read_never_blends_tied_columns(spark, tmp_path):
    """ADVICE r1: on an event_seq tie between base and delta, the
    resolved row must be ONE of the physical rows (delta preferred),
    never a column-interleave of both."""
    t = _table(spark, tmp_path, "t")
    row = "repo string, path string, commit string, lang string, content string," \
          " op string, event_seq long"
    base = spark.createDataFrame(
        [("r", "p", "c" * 40, "base_lang", "base_content", "insert", 5)], row
    )
    merge_into(t, base, batch_id=1, mode="cow")
    tied = spark.createDataFrame(
        [("r", "p", "c" * 40, "delta_lang", "delta_content", "update", 5)], row
    )
    merge_into(t, tied, batch_id=2, mode="mor")
    got = t.read().select("lang", "content").first()
    # delta wins the tie atomically — both columns from the same row
    assert (got.lang, got.content) == ("delta_lang", "delta_content")


def test_mor_auto_compaction_policy(spark, tmp_path):
    """merge_into(mode='mor') folds a bucket's delta files automatically
    once THAT bucket exceeds the (per-bucket) threshold, with identical
    state."""
    t = _table(spark, tmp_path, "t", buckets=4)
    fired = False
    for i in range(4):
        ev = repo_file_events(spark, n_keys=100, events_per_key=2, seed=11,
                              slot_range=(i * 50, (i + 1) * 50))
        res = merge_into(t, ev, batch_id=i + 1, mode="mor",
                         mor_compact_threshold=2)
        fired = fired or "compacted_delta_files" in res.counts
        # post-commit invariant: no bucket holds more than `threshold`
        # delta files after a merge
        per_bucket: dict[int, int] = {}
        for f in res.manifest.files:
            if f.is_delta:
                per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + 1
        assert max(per_bucket.values(), default=0) <= 2
    assert fired, "auto-compaction never triggered at this shape"
    # reference state: same events, plain COW table
    tc = _table(spark, tmp_path, "tc", buckets=4)
    merge_into(tc, repo_file_events(spark, n_keys=100, events_per_key=2, seed=11),
               batch_id=1)
    assert _state(t) == _state(tc)


def test_concurrent_multi_table_ingest(spark, tmp_path):
    """Two tables ingest concurrently in threads — manifests are
    independent, optimistic concurrency protects each table's chain, and
    both final states match their serial equivalents."""
    import threading

    tables = [_table(spark, tmp_path, f"t{i}", buckets=4) for i in range(2)]
    seeds = [21, 22]
    errors = []

    def ingest(idx):
        try:
            for b in range(3):
                ev = repo_file_events(spark, n_keys=200, events_per_key=2,
                                      seed=seeds[idx],
                                      slot_range=(b * 133, 400 if b == 2 else (b + 1) * 133))
                merge_into(tables[idx], ev, batch_id=b + 1)
        except Exception as e:  # pragma: no cover
            errors.append((idx, e))

    threads = [threading.Thread(target=ingest, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors

    for idx in range(2):
        serial = _table(spark, tmp_path, f"s{idx}", buckets=4)
        merge_into(serial, repo_file_events(spark, n_keys=200, events_per_key=2,
                                            seed=seeds[idx]), batch_id=1)
        assert _state(tables[idx]) == _state(serial), f"table {idx} diverged"
        assert tables[idx].current_manifest().version == 3


def test_broadcast_merge_equals_agg_merge(spark, tmp_path):
    """The staged BROADCAST sub-strategy (map-only target side) must
    produce byte-identical state and identical lineage counts to the
    union-aggregate path on the same batches (incl. deletes, replays,
    out-of-order and equal-seq ties)."""
    tb = _table(spark, tmp_path, "bcast")
    ta = _table(spark, tmp_path, "agg")
    for i in range(3):
        ev = repo_file_events(spark, n_keys=400, events_per_key=3, seed=13,
                              slot_range=(i * 400, (i + 1) * 400))
        rb = merge_into(tb, ev, batch_id=i + 1, stage_batch=True,
                        merge_strategy="broadcast" if i else None)
        ra = merge_into(ta, ev, batch_id=i + 1, stage_batch=True,
                        merge_strategy="agg")
        assert rb.counts == ra.counts, f"batch {i}: {rb.counts} vs {ra.counts}"
    assert _state(tb) == _state(ta)
    # equal-seq tie: incoming row must win on the broadcast path too
    row = "repo string, path string, commit string, lang string, content string," \
          " op string, event_seq long"
    sample = tb.read(include_internal=True).select("repo", "path", "commit", "_seq").first()
    tie = spark.createDataFrame(
        [(sample.repo, sample.path, sample.commit, "tie_lang", "tie_content",
          "update", sample._seq)], row)
    merge_into(tb, tie, batch_id=99, stage_batch=True, merge_strategy="broadcast")
    got = (tb.read().filter((F.col("repo") == sample.repo)
                            & (F.col("path") == sample.path)
                            & (F.col("commit") == sample.commit))
           .select("lang", "content").first())
    assert (got.lang, got.content) == ("tie_lang", "tie_content")


def test_broadcast_merge_file_growth_bounded(spark, tmp_path):
    """VERDICT r2 item 8: the broadcast path writes survivors+winners =
    2 files per touched bucket per merge; long broadcast-mode ingest must
    fold overgrown buckets so files/bucket stays ≤ the threshold."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=2,
        properties={"compact.max_files_per_bucket": "3"},
    )
    merge_into(t, repo_file_events(spark, n_keys=100, events_per_key=1, seed=3),
               batch_id=1)
    folded = False
    for i in range(6):
        ev = repo_file_events(spark, n_keys=50, events_per_key=1, seed=200 + i)
        res = merge_into(t, ev, batch_id=i + 2, stage_batch=True,
                         merge_strategy="broadcast")
        folded = folded or "compacted_buckets" in res.counts
        per_bucket: dict[int, int] = {}
        for f in res.manifest.files:
            per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + 1
        assert max(per_bucket.values()) <= 3, f"merge {i}: {per_bucket}"
    assert folded, "file-growth fold never triggered at this shape"
    # state is intact after the folds: all live keys still present
    assert t.read().count() == t.read().select(*KEYS).distinct().count()


def test_overwrite_dedups_duplicate_keys(spark, tmp_path):
    """ADVICE r2: a bootstrap with duplicate keys must not poison the
    broadcast merge's one-row-per-key invariant — overwrite() collapses
    duplicates (highest _seq wins) at the door."""
    t = _table(spark, tmp_path, "t", buckets=2)
    dup = spark.createDataFrame(
        [
            ("r1", "a.py", "c" * 40, "python", "old_body"),
            ("r1", "a.py", "c" * 40, "python", "dup_body"),
            ("r2", "b.py", "d" * 40, "python", "unique"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    t.overwrite(dup)
    assert t.read().count() == 2  # duplicates collapsed

    upd = spark.createDataFrame(
        [("r1", "a.py", "c" * 40, "python", "new_body", "update", 10)],
        "repo string, path string, commit string, lang string, content string,"
        " op string, event_seq long",
    )
    res = merge_into(t, upd, batch_id=1, stage_batch=True,
                     merge_strategy="broadcast")
    assert res.counts["updated"] == 1 and res.counts["inserted"] == 0
    rows = t.read().filter(F.col("repo") == "r1").collect()
    assert len(rows) == 1 and rows[0]["content"] == "new_body"
