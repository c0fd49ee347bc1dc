"""Snapshot rollback (table + group) and the checkpointed change-feed
follower.

Rollback is COMMIT-FORWARD (Iceberg rollback_to_snapshot semantics): a
new version whose content — files, schema set, bucketing, and the
exactly-once WATERMARKS — equals the target's, so incident recovery is
literally rollback + replay. The follower turns a lake table into a CDC
source for a derived table, with the checkpoint stored IN the target's
merge watermark (no external checkpoint → no data/checkpoint split-
brain window).
"""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from encode_ingest_spark.lake import (
    ChangeFeedFollower,
    LakeTable,
    TableGroup,
    merge_into,
)

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


def _mk(spark, root, buckets=4):
    return LakeTable.create(spark, root, SCHEMA, KEYS, num_buckets=buckets)


def _batch(spark, rows):
    """rows: (repo, path, commit, lang, content, op, event_seq)"""
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string, op string, event_seq long",
    )


def _state(table, version=None):
    return {
        (r.repo, r.path): (r.commit, r.lang, r.content)
        for r in table.read(version=version).collect()
    }


# ---------------------------------------------------------------- table


def test_rollback_restores_content_watermarks_and_replays(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    b1 = _batch(
        spark,
        [("o/r", f"p{i}", "c1", "py", f"v1-{i}", "upsert", i) for i in range(8)],
    )
    merge_into(t, b1, source_id="s", batch_id=1)
    v_good = t.current_version()
    good = _state(t)

    # the bad batch: clobbers half the keys and deletes two
    b2 = _batch(
        spark,
        [("o/r", f"p{i}", "c2", "py", "BAD", "upsert", 100 + i) for i in range(4)]
        + [("o/r", f"p{i}", "c1", None, None, "delete", 200 + i) for i in (6, 7)],
    )
    merge_into(t, b2, source_id="s", batch_id=2)
    assert _state(t) != good

    nm = t.rollback_to(v_good)
    # commit-forward: a NEW version, monotone history
    assert nm.version == t.current_version() > v_good + 0
    assert nm.parent_version is not None
    assert _state(t) == good
    # the bad snapshot stays inspectable (time travel) until expiry
    assert _state(t, version=v_good + 1) != good
    # watermarks reverted with the data → the fence ADMITS a replay
    assert t.current_manifest().watermarks["s"]["batch_id"] == 1
    fixed = _batch(
        spark,
        [("o/r", f"p{i}", "c2", "py", f"v2-{i}", "upsert", 100 + i) for i in range(4)],
    )
    res = merge_into(t, fixed, source_id="s", batch_id=2)
    assert not res.skipped
    assert _state(t)[("o/r", "p0")] == ("c2", "py", "v2-0")
    # the intervention is visible in lineage
    lin = {(r.source_id, r.batch_id) for r in t.lineage_df().collect()}
    assert ("rollback", v_good) in lin


def test_rollback_noop_and_roll_forward_error(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v = t.current_version()
    assert t.rollback_to(v).version == v  # no new commit
    with pytest.raises(ValueError, match="roll forward"):
        t.rollback_to(v + 5)


def test_rollback_to_expired_snapshot_errors(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    for i in range(4):
        merge_into(
            t,
            _batch(spark, [("o/r", "p", f"c{i}", "py", f"v{i}", "upsert", i)]),
            batch_id=i,
        )
    t.expire_snapshots(keep_last=2)
    with pytest.raises(ValueError):
        t.rollback_to(1)


def test_rollback_undoes_schema_evolution_even_reloaded(spark, tmp_path):
    """The delta-manifest serializer merges schema maps append-only; a
    rollback SHRINKS the schema set, so its manifest must serialize
    full — pin cache-vs-disk parity by reloading cold."""
    t = _mk(spark, str(tmp_path / "t"))
    merge_into(
        t, _batch(spark, [("o/r", "p", "c", "py", "v1", "upsert", 1)]), batch_id=1
    )
    v_good = t.current_version()
    evolved = spark.createDataFrame(
        [("o/r", "p", "c", "py", "v2", 9001, "upsert", 2)],
        "repo string, path string, commit string, lang string, "
        "content string, stars long, op string, event_seq long",
    )
    merge_into(t, evolved, batch_id=2, evolve=True)
    assert "stars" in t.read().columns
    nm = t.rollback_to(v_good)
    assert "stars" not in t.read().columns
    # cold reload: manifest resolved from DISK must match the in-memory one
    t2 = LakeTable.load(spark, t.root)
    m2 = t2.current_manifest()
    assert set(m2.schemas) == set(nm.schemas)
    assert m2.current_schema_version == nm.current_schema_version
    assert "stars" not in t2.read().columns
    assert _state(t2)[("o/r", "p")] == ("c", "py", "v1")


def test_rollback_undoes_rebucket(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), buckets=4)
    merge_into(
        t,
        _batch(
            spark,
            [("o/r", f"p{i}", "c", "py", f"v{i}", "upsert", i) for i in range(16)],
        ),
        batch_id=1,
    )
    v_good = t.current_version()
    t.rebucket(8)
    assert t.current_manifest().num_buckets == 8
    t.rollback_to(v_good)
    assert t.current_manifest().num_buckets == 4
    assert len(_state(t)) == 16


def test_read_changes_across_rollback_is_the_reverting_diff(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    merge_into(
        t,
        _batch(spark, [("o/r", "p", "c", "py", "good", "upsert", 1)]),
        batch_id=1,
    )
    v_good = t.current_version()
    merge_into(
        t,
        _batch(
            spark,
            [
                ("o/r", "p", "c", "py", "BAD", "upsert", 2),
                ("o/r", "q", "c", "py", "junk", "upsert", 3),
            ],
        ),
        batch_id=2,
    )
    v_bad = t.current_version()
    nm = t.rollback_to(v_good)
    # good → rolled-back: no net change
    assert t.read_changes(v_good, nm.version).count() == 0
    # bad → rolled-back: the reverting diff (downstream followers heal)
    rows = {
        r.path: r._change_type
        for r in t.read_changes(v_bad, nm.version).collect()
    }
    assert rows == {"p": "update", "q": "delete"}


# ---------------------------------------------------------------- group


def test_group_rollback_consistent_vector_and_replay(spark, tmp_path):
    a = _mk(spark, str(tmp_path / "a"))
    b = _mk(spark, str(tmp_path / "b"))
    g = TableGroup.create(spark, str(tmp_path / "g"), {"a": a, "b": b})

    def epoch(n, content):
        merge_into(
            a,
            _batch(spark, [("o/r", "p", "c", "py", content, "upsert", n)]),
            source_id="epoch",
            batch_id=n,
        )
        merge_into(
            b,
            _batch(spark, [("o/r", "q", "c", "py", content, "upsert", n)]),
            source_id="epoch",
            batch_id=n,
        )
        g.commit(
            {"a": a.current_version(), "b": b.current_version()},
            source_id="epoch",
            batch_id=n,
        )

    epoch(1, "good")
    gv_good = g.current_version()
    epoch(2, "BAD")
    assert _state(a)[("o/r", "p")][2] == "BAD"

    nm = g.rollback_to(gv_good)
    assert nm["version"] == g.current_version()
    assert nm["rollback_of"] == gv_good
    # both members consistently back to the good epoch
    assert _state(a)[("o/r", "p")][2] == "good"
    assert _state(b)[("o/r", "q")][2] == "good"
    # group reads at the new version see the reverted vector
    assert g.read("a").filter(F.col("content") == "BAD").count() == 0
    # group fence reverted → epoch 2 replays and lands
    assert g.last_batch("epoch") == 1
    epoch(2, "fixed")
    assert _state(a)[("o/r", "p")][2] == "fixed"
    assert _state(b)[("o/r", "q")][2] == "fixed"
    assert g.last_batch("epoch") == 2


def test_group_rollback_errors(spark, tmp_path):
    a = _mk(spark, str(tmp_path / "a"))
    g = TableGroup.create(spark, str(tmp_path / "g"), {"a": a})
    with pytest.raises(ValueError, match="roll forward"):
        g.rollback_to(99)
    assert g.rollback_to(g.current_version())["version"] == g.current_version()


# ------------------------------------------------------------- follower


def _src_with_batches(spark, tmp_path, n=3):
    src = _mk(spark, str(tmp_path / "src"))
    # batch 1: 10 inserts; batch 2: update half + delete 2; batch 3: reinsert
    merge_into(
        src,
        _batch(
            spark,
            [("o/r", f"p{i}", "c", "py", f"v1-{i}", "upsert", i) for i in range(10)],
        ),
        source_id="gen",
        batch_id=1,
    )
    if n >= 2:
        merge_into(
            src,
            _batch(
                spark,
                [
                    ("o/r", f"p{i}", "c", "py", f"v2-{i}", "upsert", 100 + i)
                    for i in range(5)
                ]
                + [
                    ("o/r", f"p{i}", "c", None, None, "delete", 200 + i)
                    for i in (8, 9)
                ],
            ),
            source_id="gen",
            batch_id=2,
        )
    if n >= 3:
        merge_into(
            src,
            _batch(spark, [("o/r", "p8", "c", "go", "reborn", "upsert", 300)]),
            source_id="gen",
            batch_id=3,
        )
    return src


def test_follower_mirrors_source_exactly(spark, tmp_path):
    src = _src_with_batches(spark, tmp_path)
    tgt = ChangeFeedFollower.mirror_target(src, str(tmp_path / "tgt"))
    f = ChangeFeedFollower(src, tgt)
    res = f.poll()
    assert not res.caught_up and res.to_version == src.current_version()
    assert _state(tgt) == _state(src)
    # caught up: next poll is a no-op commit-wise
    v = tgt.current_version()
    assert f.poll().caught_up and tgt.current_version() == v
    assert f.lag() == 0


def test_follower_incremental_polls_prune_to_the_span(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"))
    tgt = ChangeFeedFollower.mirror_target(src, str(tmp_path / "tgt"))
    f = ChangeFeedFollower(src, tgt)
    merge_into(
        src,
        _batch(
            spark,
            [("o/r", f"p{i}", "c", "py", f"v1-{i}", "upsert", i) for i in range(10)],
        ),
        batch_id=1,
    )
    f.poll()
    merge_into(
        src,
        _batch(spark, [("o/r", "p3", "c", "py", "v2", "upsert", 50)]),
        batch_id=2,
    )
    res = f.poll()
    # span batch = the one changed key, not a re-scan of the table
    # (MOR append: counts report the appended change-set size)
    assert sum(res.merge.counts.values()) == 1
    assert _state(tgt) == _state(src)


def test_follower_checkpoint_survives_restart_and_replay(spark, tmp_path):
    src = _src_with_batches(spark, tmp_path, n=2)
    tgt = ChangeFeedFollower.mirror_target(src, str(tmp_path / "tgt"))
    ChangeFeedFollower(src, tgt).poll()
    ckpt = tgt.current_version()
    # "restart": a NEW follower over reloaded tables resumes caught-up —
    # the checkpoint lives in the target's watermark, nowhere else
    f2 = ChangeFeedFollower(
        LakeTable.load(spark, src.root), LakeTable.load(spark, tgt.root)
    )
    assert f2.checkpoint() == src.current_version()
    assert f2.poll().caught_up
    assert tgt.current_version() == ckpt
    # new source data resumes from the exact span
    merge_into(
        src,
        _batch(spark, [("o/r", "p0", "c", "py", "post-restart", "upsert", 999)]),
        batch_id=3,
    )
    res = f2.poll()
    assert res.to_version == src.current_version() == f2.checkpoint()
    assert _state(tgt) == _state(src)


def test_follower_delete_mirror_outranks_tied_row(spark, tmp_path):
    """Mirrored rows ride at event_seq = span end version (commit-
    version ordering): a delete carrying the dead row's own _seq would
    TIE the copy the target already holds (MOR ties are arbitrary-
    winner). With span seqs the tombstone deterministically wins, and
    the later reinsert (a later span) still outranks the tombstone."""
    src = _mk(spark, str(tmp_path / "src"))
    tgt = ChangeFeedFollower.mirror_target(src, str(tmp_path / "tgt"))
    f = ChangeFeedFollower(src, tgt)
    merge_into(
        src,
        _batch(spark, [("o/r", "p", "c", "py", "live", "upsert", 7)]),
        batch_id=1,
    )
    f.poll()  # target now holds the row at _seq=7
    merge_into(
        src,
        _batch(spark, [("o/r", "p", "c", None, None, "delete", 8)]),
        batch_id=2,
    )
    f.poll()
    assert _state(tgt) == {}  # deterministically gone, not a coin flip
    # reinsert flows through
    merge_into(
        src,
        _batch(spark, [("o/r", "p", "c", "py", "reborn", "upsert", 9)]),
        batch_id=3,
    )
    f.poll()
    assert _state(tgt) == {("o/r", "p"): ("c", "py", "reborn")}


def test_follower_transform_and_fanout_flag(spark, tmp_path):
    src = _src_with_batches(spark, tmp_path, n=1)

    def upper_lang(batch):
        return batch.withColumn("lang", F.upper(F.col("lang")))

    tgt = ChangeFeedFollower.mirror_target(src, str(tmp_path / "tgt"))
    f = ChangeFeedFollower(src, tgt, transform=upper_lang)
    f.poll()
    langs = {r.lang for r in tgt.read().collect()}
    assert langs == {"PY"}


def test_follower_schema_evolution_flows_through(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"))
    tgt = ChangeFeedFollower.mirror_target(src, str(tmp_path / "tgt"))
    f = ChangeFeedFollower(src, tgt)
    merge_into(
        src,
        _batch(spark, [("o/r", "p", "c", "py", "v1", "upsert", 1)]),
        batch_id=1,
    )
    f.poll()
    evolved = spark.createDataFrame(
        [("o/r", "p", "c", "py", "v2", 42, "upsert", 2)],
        "repo string, path string, commit string, lang string, "
        "content string, stars long, op string, event_seq long",
    )
    merge_into(src, evolved, batch_id=2, evolve=True)
    f.poll()
    assert "stars" in tgt.read().columns
    assert tgt.read().collect()[0].stars == 42


def test_follower_heals_after_source_rollback(spark, tmp_path):
    """rollback is commit-forward, so a follower needs NO special case:
    the rolled-back source's new version is just another span whose
    diff is the reverting change set."""
    src = _mk(spark, str(tmp_path / "src"))
    tgt = ChangeFeedFollower.mirror_target(src, str(tmp_path / "tgt"))
    f = ChangeFeedFollower(src, tgt)
    merge_into(
        src,
        _batch(spark, [("o/r", "p", "c", "py", "good", "upsert", 1)]),
        batch_id=1,
    )
    v_good = src.current_version()
    f.poll()
    merge_into(
        src,
        _batch(
            spark,
            [
                ("o/r", "p", "c", "py", "BAD", "upsert", 2),
                ("o/r", "junk", "c", "py", "junk", "upsert", 3),
            ],
        ),
        batch_id=2,
    )
    f.poll()
    assert _state(tgt)[("o/r", "p")][2] == "BAD"
    src.rollback_to(v_good)
    f.poll()
    assert _state(tgt) == _state(src)
    assert _state(tgt)[("o/r", "p")][2] == "good"
    assert ("o/r", "junk") not in _state(tgt)


# ------------------------------------------------------------------ cli


def test_cli_rollback_and_follow(spark, tmp_path, capsys):
    from encode_ingest_spark.__main__ import main

    def run(*argv):
        assert main(list(argv), spark=spark) == 0
        lines = [
            l
            for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")
        ]
        return json.loads(lines[-1])

    src = _mk(spark, str(tmp_path / "src"))
    merge_into(
        src,
        _batch(spark, [("o/r", "p", "c", "py", "good", "upsert", 1)]),
        batch_id=1,
    )
    v_good = src.current_version()
    merge_into(
        src,
        _batch(spark, [("o/r", "p", "c", "py", "BAD", "upsert", 2)]),
        batch_id=2,
    )

    tgt_root = str(tmp_path / "tgt")
    out = run(
        "follow", "--source", src.root, "--target", tgt_root, "--create-target"
    )
    assert not out["caught_up"] and out["checkpoint"] == src.current_version()
    tgt = LakeTable.load(spark, tgt_root)
    assert _state(tgt)[("o/r", "p")][2] == "BAD"

    out = run("rollback", "--root", src.root, "--version", str(v_good))
    assert out["version"] == src.current_version() == v_good + 2
    assert _state(LakeTable.load(spark, src.root))[("o/r", "p")][2] == "good"

    out = run("follow", "--source", src.root, "--target", tgt_root)
    assert not out["caught_up"]
    assert _state(LakeTable.load(spark, tgt_root))[("o/r", "p")][2] == "good"
