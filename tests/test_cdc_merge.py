"""CDC merge correctness vs a brute-force pandas replay oracle.

The oracle replays the full event stream in pandas (groupby-max-seq,
tombstone-aware) and compares final table state by per-row
sha256(content) — the invariant mandated by BASELINE.json input_hint.
Covers the four required scenarios (FIXTURES.md §2): dedup ordering,
delete tombstones, schema evolution, crash-resume idempotence.
"""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from encode_ingest_spark.cdc import dedupe_latest, repo_file_events
from encode_ingest_spark.lake import LakeTable, merge_into

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)
KEYS = ["repo", "path", "commit"]


def replay_oracle(events_pdf: pd.DataFrame) -> pd.DataFrame:
    """Brute-force replay: per key keep max event_seq; drop if delete."""
    idx = events_pdf.groupby(KEYS)["event_seq"].idxmax()
    latest = events_pdf.loc[idx]
    live = latest[latest["op"] != "delete"]
    out = live[["repo", "path", "commit", "lang", "content"]].copy()
    out["content_sha"] = out["content"].map(
        lambda c: hashlib.sha256(c.encode()).hexdigest() if c is not None else None
    )
    return out.sort_values(KEYS).reset_index(drop=True)


def table_state(table: LakeTable) -> pd.DataFrame:
    df = table.read().withColumn("content_sha", F.sha2(F.col("content"), 256))
    out = df.select("repo", "path", "commit", "lang", "content", "content_sha").toPandas()
    return out.sort_values(KEYS).reset_index(drop=True)


def assert_state_matches(table: LakeTable, events_pdf: pd.DataFrame):
    got = table_state(table)
    want = replay_oracle(events_pdf)
    pd.testing.assert_frame_equal(got, want, check_like=True)


@pytest.fixture()
def events(spark):
    return repo_file_events(spark, n_keys=200, events_per_key=3, seed=42)


def _mk_table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=8)


def test_single_batch_merge(spark, tmp_path, events):
    t = _mk_table(spark, tmp_path)
    res = merge_into(t, events, batch_id=1, offset_range=(0, 599))
    assert not res.skipped
    assert_state_matches(t, events.toPandas())
    # lineage recorded
    lin = t.lineage_df().toPandas()
    assert list(lin.batch_id) == [1]
    assert lin.iloc[0].source_offset_end == 599


def test_multi_batch_out_of_order(spark, tmp_path, events):
    """Events split by delivery order into 3 batches — versions of the same
    key arrive across batch boundaries, out of order."""
    t = _mk_table(spark, tmp_path)
    pdf = events.toPandas()
    n = len(pdf)
    cut1, cut2 = n // 3, 2 * n // 3
    for i, (lo, hi) in enumerate([(0, cut1), (cut1, cut2), (cut2, n)], start=1):
        chunk = spark.createDataFrame(pdf.iloc[lo:hi], events.schema)
        merge_into(t, chunk, batch_id=i, offset_range=(lo, hi - 1))
    assert_state_matches(t, pdf)


def test_dedup_ordering_within_batch(spark):
    """≥3 events per key with shuffled event_seq: max seq must win."""
    rows = [
        ("update", 5, "o/r", "p", "c", "py", "v5"),
        ("insert", 1, "o/r", "p", "c", "py", "v1"),
        ("update", 9, "o/r", "p", "c", "py", "v9"),
        ("update", 3, "o/r", "p", "c", "py", "v3"),
    ]
    df = spark.createDataFrame(
        rows, "op string, event_seq long, repo string, path string, commit string, lang string, content string"
    )
    out = dedupe_latest(df, KEYS).collect()
    assert len(out) == 1 and out[0].content == "v9"


def test_delete_tombstone_blocks_late_update(spark, tmp_path):
    """delete(seq=10) applied, then late update(seq=5) arrives in a LATER
    batch: tombstone wins (higher seq) — key must stay deleted."""
    t = _mk_table(spark, tmp_path)
    sch = "op string, event_seq long, repo string, path string, commit string, lang string, content string"
    b1 = spark.createDataFrame(
        [("insert", 1, "o/r", "p", "c", "py", "v1"), ("delete", 10, "o/r", "p", "c", None, None)],
        sch,
    )
    merge_into(t, b1, batch_id=1)
    assert t.read().count() == 0
    b2 = spark.createDataFrame([("update", 5, "o/r", "p", "c", "py", "v5-late")], sch)
    merge_into(t, b2, batch_id=2)
    assert t.read().count() == 0  # late lower-seq update must NOT resurrect
    # but a genuinely newer update re-creates the row
    b3 = spark.createDataFrame([("update", 11, "o/r", "p", "c", "py", "v11")], sch)
    merge_into(t, b3, batch_id=3)
    got = t.read().collect()
    assert len(got) == 1 and got[0].content == "v11"


def test_replay_is_idempotent_fence(spark, tmp_path, events):
    """Re-merging an already-committed batch id is a no-op (exactly-once)."""
    t = _mk_table(spark, tmp_path)
    merge_into(t, events, batch_id=1)
    v = t.current_version()
    state_before = table_state(t)
    res = merge_into(t, events, batch_id=1)  # replay
    assert res.skipped
    assert t.current_version() == v
    pd.testing.assert_frame_equal(table_state(t), state_before)


def test_replay_without_fence_converges(spark, tmp_path, events):
    """Even ignoring the fence, merging the same batch twice converges to
    the same state (merge itself is idempotent: equal seq → source wins
    with identical content)."""
    t = _mk_table(spark, tmp_path)
    merge_into(t, events, batch_id=None)
    s1 = table_state(t)
    merge_into(t, events, batch_id=None)
    pd.testing.assert_frame_equal(table_state(t), s1)


def test_crash_between_write_and_commit(spark, tmp_path, events):
    """Simulate a crash after data files are written but before the
    manifest commit: CURRENT is unchanged, orphans exist, replay of the
    same batch reconverges to the oracle state."""
    t = _mk_table(spark, tmp_path)
    pdf = events.toPandas()
    half = len(pdf) // 2
    b1 = spark.createDataFrame(pdf.iloc[:half], events.schema)
    b2 = spark.createDataFrame(pdf.iloc[half:], events.schema)
    merge_into(t, b1, batch_id=1, offset_range=(0, half - 1))
    v_after_b1 = t.current_version()

    # crash: write b2's files via the staging path but never commit
    import encode_ingest_spark.lake.merge as merge_mod

    orig = LakeTable._write_manifest
    calls = {"n": 0}

    def failing_write(self, manifest):
        calls["n"] += 1
        raise RuntimeError("simulated crash before manifest commit")

    LakeTable._write_manifest = failing_write
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            merge_into(t, b2, batch_id=2, offset_range=(half, len(pdf) - 1))
    finally:
        LakeTable._write_manifest = orig

    assert t.current_version() == v_after_b1  # pointer untouched
    assert len(t.orphan_files()) > 0  # dead files left behind
    t.remove_orphans()

    # restart: replay batch 2
    merge_into(t, b2, batch_id=2, offset_range=(half, len(pdf) - 1))
    assert_state_matches(t, pdf)
    # lineage has exactly one row per committed batch — no duplicates
    lin = t.lineage_df().toPandas()
    assert sorted(lin.batch_id.tolist()) == [1, 2]


def test_schema_evolution_mid_stream(spark, tmp_path):
    """Second batch adds size_bytes:int (later widened to long) and
    stars:float→double; engine must ALTER-then-MERGE (FIXTURES.md §2)."""
    t = _mk_table(spark, tmp_path)
    sch1 = "op string, event_seq long, repo string, path string, commit string, lang string, content string"
    merge_into(
        t,
        spark.createDataFrame([("insert", 1, "o/r", "p1", "c", "py", "v1")], sch1),
        batch_id=1,
    )
    sch2 = sch1 + ", size_bytes int, stars float"
    merge_into(
        t,
        spark.createDataFrame(
            [("insert", 2, "o/r", "p2", "c", "py", "v2", 123, 4.5)], sch2
        ),
        batch_id=2,
    )
    dt = dict(t.read().dtypes)
    assert dt["size_bytes"] == "int" and dt["stars"] == "float"
    rows = {r.path: r for r in t.read().collect()}
    assert rows["p1"].size_bytes is None  # old row null-filled
    assert rows["p2"].size_bytes == 123
    # widen: int→long, float→double
    sch3 = sch1 + ", size_bytes bigint, stars double"
    merge_into(
        t,
        spark.createDataFrame(
            [("insert", 3, "o/r", "p3", "c", "py", "v3", 2**40, 0.125)], sch3
        ),
        batch_id=3,
    )
    dt = dict(t.read().dtypes)
    assert dt["size_bytes"] == "bigint" and dt["stars"] == "double"
    rows = {r.path: r for r in t.read().collect()}
    assert rows["p2"].size_bytes == 123 and rows["p3"].size_bytes == 2**40
    assert rows["p2"].stars == 4.5


def test_lineage_counts(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    sch = "op string, event_seq long, repo string, path string, commit string, lang string, content string"
    res1 = merge_into(
        t,
        spark.createDataFrame(
            [("insert", 1, "o/r", "p1", "c", "py", "a"), ("insert", 2, "o/r", "p2", "c", "py", "b")],
            sch,
        ),
        batch_id=1,
    )
    assert res1.counts == {"inserted": 2, "updated": 0, "deleted": 0}
    res2 = merge_into(
        t,
        spark.createDataFrame(
            [("update", 3, "o/r", "p1", "c", "py", "a2"), ("delete", 4, "o/r", "p2", "c", None, None)],
            sch,
        ),
        batch_id=2,
    )
    assert res2.counts == {"inserted": 0, "updated": 1, "deleted": 1}


def test_mor_mode_matches_cow(spark, tmp_path, events):
    """merge-on-read batches end at the same state as copy-on-write, and
    compact_deltas folds without changing state."""
    pdf = events.toPandas()
    n = len(pdf)
    cuts = [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]

    cow = _mk_table(spark, tmp_path / "cow")
    mor = LakeTable.create(spark, str(tmp_path / "mor" / "t"), SCHEMA, KEYS, num_buckets=8)
    for i, (lo, hi) in enumerate(cuts, start=1):
        chunk = spark.createDataFrame(pdf.iloc[lo:hi], events.schema)
        merge_into(cow, chunk, batch_id=i)
        res = merge_into(mor, chunk, batch_id=i, mode="mor")
        assert "appended" in res.counts
    assert_state_matches(mor, pdf)
    pd.testing.assert_frame_equal(table_state(mor), table_state(cow))

    # deltas exist, then compaction folds them away
    m = mor.current_manifest()
    assert any(f.is_delta for f in m.files)
    mor.compact_deltas()
    m2 = mor.current_manifest()
    assert not any(f.is_delta for f in m2.files)
    assert_state_matches(mor, pdf)

    # fence still applies in mor mode
    res = merge_into(mor, spark.createDataFrame(pdf.iloc[:10], events.schema),
                     batch_id=3, mode="mor")
    assert res.skipped


def test_mor_tombstone_semantics(spark, tmp_path):
    """delete then late lower-seq update across MOR batches: tombstone
    wins at read time."""
    t = _mk_table(spark, tmp_path)
    sch = "op string, event_seq long, repo string, path string, commit string, lang string, content string"
    merge_into(t, spark.createDataFrame(
        [("insert", 1, "o/r", "p", "c", "py", "v1"), ("delete", 10, "o/r", "p", "c", None, None)],
        sch), batch_id=1, mode="mor")
    assert t.read().count() == 0
    merge_into(t, spark.createDataFrame(
        [("update", 5, "o/r", "p", "c", "py", "late")], sch), batch_id=2, mode="mor")
    assert t.read().count() == 0  # tombstone (seq 10) still wins
    merge_into(t, spark.createDataFrame(
        [("update", 11, "o/r", "p", "c", "py", "new")], sch), batch_id=3, mode="mor")
    got = t.read().collect()
    assert len(got) == 1 and got[0].content == "new"


def test_single_key_flood_is_bounded_and_correct(spark, tmp_path):
    """NOTES r1 #6: a pathological flood of ONE (repo,path,commit) key
    (50% of all events) must merge correctly — the in-batch partial
    aggregate collapses the hot key map-side, so no reducer sees the
    full flood — and the flood's last write must win its key."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from encode_ingest_spark.cdc import repo_file_events
    from encode_ingest_spark.lake import LakeTable, merge_into

    schema = T.StructType([T.StructField(c, T.StringType()) for c in
                           ["repo", "path", "commit", "lang", "content"]])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema,
                         ["repo", "path", "commit"], num_buckets=4)
    ev = repo_file_events(spark, n_keys=2000, events_per_key=3, seed=17,
                          flood_key_pct=50)
    # sanity: the flood actually concentrates on one key
    top = (ev.groupBy("repo", "path", "commit").count()
           .orderBy(F.desc("count")).first())
    assert top["count"] > 2000  # ~50% of 6000 events on one key
    merge_into(t, ev, batch_id=1)

    # oracle: per-key max-seq replay over the same stream
    latest = (ev.groupBy("repo", "path", "commit")
              .agg(F.max_by(F.struct("op", "content", "event_seq"), "event_seq")
                   .alias("w"))
              .select("repo", "path", "commit", "w.*"))
    want = {tuple(r) for r in latest.filter(F.col("op") != "delete")
            .select("repo", "path", "commit", "content").collect()}
    got = {tuple(r) for r in t.read()
           .select("repo", "path", "commit", "content").collect()}
    assert got == want
    # flooded key's winner carries the flood's max seq
    hot = t.read(include_internal=True).filter(
        (F.col("repo") == top.repo) & (F.col("path") == top.path)
        & (F.col("commit") == top.commit)).first()
    assert hot is not None and hot._seq >= 6000  # flood seqs sit past base


def test_independent_source_fences_interleave(spark, tmp_path):
    """Two upstream sources ingest into ONE table with independent
    batch-id fences (the manifest watermarks are per source_id): a
    replay from either source fences off without blocking the other,
    and the final state equals the combined replay oracle."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=4)
    ev_a = repo_file_events(spark, n_keys=150, events_per_key=2, seed=91)
    ev_b = repo_file_events(spark, n_keys=150, events_per_key=2, seed=92)

    # interleaved ingest, separate fence namespaces
    merge_into(t, ev_a.filter(F.col("event_seq") < 150), source_id="a", batch_id=1)
    merge_into(t, ev_b.filter(F.col("event_seq") < 150), source_id="b", batch_id=1)
    merge_into(t, ev_a.filter(F.col("event_seq") >= 150), source_id="a", batch_id=2)

    # replaying source a's batch 1 is a no-op; source b's batch 2 is NOT
    # fenced by a's progress
    assert merge_into(t, ev_a.filter(F.col("event_seq") < 150),
                      source_id="a", batch_id=1).skipped
    res_b2 = merge_into(t, ev_b.filter(F.col("event_seq") >= 150),
                        source_id="b", batch_id=2)
    assert not res_b2.skipped

    wm = t.current_manifest().watermarks
    assert wm["a"]["batch_id"] == 2 and wm["b"]["batch_id"] == 2

    both = pd.concat([ev_a.toPandas(), ev_b.toPandas()], ignore_index=True)
    assert_state_matches(t, both)
