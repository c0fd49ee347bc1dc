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


def test_follower_expired_checkpoint_diagnosed_and_resynced(spark, tmp_path):
    """A follower that lags past the source's snapshot retention gets a
    DIAGNOSED failure (not a raw FileNotFoundError) and a working
    recovery path: resync() re-mirrors the full current snapshot —
    including deletes for keys that vanished while lagging — exactly
    once, and normal polling resumes."""
    src = _mk(spark, str(tmp_path / "src"))
    merge_into(
        src,
        _batch(
            spark,
            [
                ("o/r", "p", "c1", "py", "one", "upsert", 1),
                ("o/r", "q", "c1", "py", "two", "upsert", 1),
            ],
        ),
        batch_id=1,
    )
    tgt = ChangeFeedFollower.mirror_target(src, str(tmp_path / "tgt"))
    f = ChangeFeedFollower(src, tgt)
    assert not f.poll().caught_up

    # source advances (update, delete, insert) and expires history
    merge_into(
        src,
        _batch(
            spark,
            [
                ("o/r", "q", "c1", None, None, "delete", 2),
                ("o/r", "r", "c2", "go", "three", "upsert", 2),
            ],
        ),
        batch_id=2,
    )
    merge_into(
        src,
        _batch(spark, [("o/r", "p", "c1", "py", "one-v2", "upsert", 3)]),
        batch_id=3,
    )
    src.expire_snapshots(keep_last=1)

    with pytest.raises(ValueError, match="resync"):
        f.poll()
    res = f.resync()
    assert res.merge is not None and not res.merge.skipped
    assert _state(tgt) == _state(src)  # q's delete mirrored too
    assert ("o/r", "q") not in _state(tgt)
    assert f.checkpoint() == src.current_version()
    assert f.poll().caught_up
    # resync is fenced like any batch: a replay is a no-op
    assert f.resync().caught_up


def test_follower_overlapping_polls_never_skip_a_span(spark, tmp_path):
    """Two overlapping polls sharing a stale checkpoint (cron overlap):
    poll A computed the NARROWER span (1,2] and stalled; poll B computed
    the wider span (1,3]; A's merge lands first. B's commit must be
    refused by the checkpoint CAS and recomputed from the fresh
    checkpoint — landing exactly (2,3], never a batch derived from the
    superseded checkpoint (which, after a source rollback, could be
    empty and skip A's span forever)."""
    src = _mk(spark, str(tmp_path / "src"))
    merge_into(
        src,
        _batch(spark, [("o/r", "p", "c1", "py", "one", "upsert", 1)]),
        batch_id=1,
    )
    tgt = ChangeFeedFollower.mirror_target(src, str(tmp_path / "tgt"))
    fa = ChangeFeedFollower(src, tgt)
    assert not fa.poll().caught_up  # checkpoint = 1

    merge_into(
        src,
        _batch(spark, [("o/r", "q", "c2", "go", "two", "upsert", 2)]),
        batch_id=2,
    )  # source v2 — A's stalled poll saw this
    merge_into(
        src,
        _batch(spark, [("o/r", "r", "c3", "rs", "three", "upsert", 3)]),
        batch_id=3,
    )  # source v3 — B's poll sees this too

    # B's transform hook runs between B's span computation (1,3] and
    # B's merge — exactly the overlap window; A's narrower (1,2]
    # stalled merge lands inside it
    fired = {"n": 0}

    def interpose(df):
        if fired["n"] == 0:
            fired["n"] += 1
            a_batch = fa._span_batch(1, 2)
            res_a = merge_into(
                tgt,
                a_batch,
                source_id=fa.source_id,
                batch_id=2,
                offset_range=(1, 2),
                mode="mor",
                batch_unique=True,
                expected_watermark=1,
            )
            assert not res_a.skipped
        return df

    fb = ChangeFeedFollower(src, tgt, transform=interpose)
    res = fb.poll()
    # B's wide first attempt went stale; the retry landed exactly (2,3]
    assert (res.from_version, res.to_version) == (2, 3)
    assert res.merge is not None and not res.merge.skipped
    assert _state(tgt) == _state(src)
    assert fb.checkpoint() == src.current_version()


def test_group_rollback_swap_race_self_heals(spark, tmp_path, monkeypatch):
    """A vector-neutral group commit landing between the member
    rollbacks and the group swap (fence replay, pin race) must not
    leave the rollback half-applied: the swap retries on a fresh group
    version and the rollback completes atomically."""
    a = _mk(spark, str(tmp_path / "a"))
    g = TableGroup.create(spark, str(tmp_path / "g"), {"a": a})

    def epoch(n, content):
        merge_into(
            a,
            _batch(spark, [("o/r", "p", "c", "py", content, "upsert", n)]),
            source_id="epoch",
            batch_id=n,
        )
        g.commit({"a": a.current_version()}, source_id="epoch", batch_id=n)

    epoch(1, "good")
    gv_good = g.current_version()
    epoch(2, "BAD")

    orig = TableGroup._write_manifest
    fired = {"n": 0}

    def interposed(self, manifest):
        if fired["n"] == 0 and manifest.get("rollback_of") is not None:
            fired["n"] += 1
            # a concurrent vector-neutral commit (e.g. a fence replay)
            # steals this group version number first
            cur = self.current_manifest()
            orig(
                self,
                {
                    "version": manifest["version"],
                    "tables": {k: dict(v) for k, v in manifest["tables"].items()},
                    "watermarks": cur.get("watermarks", {}),
                    "parent_version": cur["version"],
                    "properties": cur.get("properties", {}),
                },
            )
        return orig(self, manifest)

    monkeypatch.setattr(TableGroup, "_write_manifest", interposed)
    nm = g.rollback_to(gv_good)
    assert nm["rollback_of"] == gv_good
    assert g.current_version() == nm["version"]
    assert _state(a)[("o/r", "p")][2] == "good"
    # the group fence reverted with the swap — epoch 2 replays
    assert g.last_batch("epoch") == 1
    epoch(2, "fixed")
    assert _state(a)[("o/r", "p")][2] == "fixed"


def test_group_rollback_swap_race_against_live_committer_raises(
    spark, tmp_path, monkeypatch
):
    """If the racing commit moved a member PAST the rollback (a live
    writer), retrying would clobber it — the rollback must raise with
    the members-may-hold-rolled-back-state warning instead."""
    a = _mk(spark, str(tmp_path / "a"))
    g = TableGroup.create(spark, str(tmp_path / "g"), {"a": a})

    def epoch(n, content):
        merge_into(
            a,
            _batch(spark, [("o/r", "p", "c", "py", content, "upsert", n)]),
            source_id="epoch",
            batch_id=n,
        )
        g.commit({"a": a.current_version()}, source_id="epoch", batch_id=n)

    epoch(1, "good")
    gv_good = g.current_version()
    epoch(2, "BAD")

    orig = TableGroup._write_manifest
    fired = {"n": 0}

    def interposed(self, manifest):
        if fired["n"] == 0 and manifest.get("rollback_of") is not None:
            fired["n"] += 1
            # a live committer advances the member AND the group first
            merge_into(
                a,
                _batch(
                    spark, [("o/r", "z", "c", "py", "live", "upsert", 7)]
                ),
                source_id="other",
                batch_id=1,
            )
            cur = self.current_manifest()
            tables = {k: dict(v) for k, v in cur["tables"].items()}
            tables["a"]["version"] = a.current_version()
            orig(
                self,
                {
                    "version": manifest["version"],
                    "tables": tables,
                    "watermarks": cur.get("watermarks", {}),
                    "parent_version": cur["version"],
                    "properties": cur.get("properties", {}),
                },
            )
        return orig(self, manifest)

    monkeypatch.setattr(TableGroup, "_write_manifest", interposed)
    from encode_ingest_spark.lake import CommitConflictError

    with pytest.raises(CommitConflictError, match="rolled-back"):
        g.rollback_to(gv_good)
    # convergence path: re-running with writers stopped completes
    nm = g.rollback_to(gv_good)
    assert nm["rollback_of"] == gv_good
    assert _state(a)[("o/r", "p")][2] == "good"


def test_cli_follow_heals_wedged_create(spark, tmp_path, capsys):
    """A first `follow --create-target` run that crashed between the
    _meta makedirs and the v0 manifest write must self-heal on the next
    run (existence keys on _meta/CURRENT, and create tolerates the bare
    directory)."""
    import os

    from encode_ingest_spark.__main__ import main

    src = _mk(spark, str(tmp_path / "src"))
    merge_into(
        src,
        _batch(spark, [("o/r", "p", "c", "py", "v", "upsert", 1)]),
        batch_id=1,
    )
    tgt_root = str(tmp_path / "tgt")
    os.makedirs(os.path.join(tgt_root, "_meta"))  # the crashed create
    assert (
        main(
            [
                "follow",
                "--source", src.root,
                "--target", tgt_root,
                "--create-target",
            ],
            spark=spark,
        )
        == 0
    )
    out = json.loads(
        [
            l
            for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")
        ][-1]
    )
    assert not out["caught_up"]
    assert _state(LakeTable.load(spark, tgt_root))[("o/r", "p")][2] == "v"
