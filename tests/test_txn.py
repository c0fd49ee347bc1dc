"""Multi-table transactional commits (VERDICT r2 item 5): derived entity
tables must expose a mutually-consistent cross-table snapshot — one
atomic group-pointer swap covers N member tables; a crash between member
commits leaves group readers on the previous consistent vector; replay
converges; FK integrity (the J15 anti-join QC) holds at every visible
group snapshot."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from encode_ingest_spark.cdc import repo_file_events
from encode_ingest_spark.entities.incremental import (
    incremental_split_refresh,
    referential_integrity_report,
    transactional_split_refresh,
)
from encode_ingest_spark.lake import LakeTable, TableGroup, merge_into

SRC_SCHEMA = T.StructType([T.StructField(c, T.StringType()) for c in
                           ["repo", "path", "commit", "lang", "content"]])
FILE_SCHEMA = (
    "file_id string, label string, file_format string, xref array<string>, "
    "size_bytes long, content_sha256 string, repo_id string, "
    "commit_activity_id string, part_of_dataset_id string"
)
REPO_SCHEMA = (
    "repo_id string, n_files long, languages array<string>, n_commits long, "
    "part_of_dataset_id string"
)
ACT_SCHEMA = (
    "activity_id string, repo_id string, commit_sha string, "
    "generated_file_id array<string>, used_language array<string>, "
    "n_files long, activity_type string"
)


def _setup(spark, tmp_path, keep_pinned=3):
    source = LakeTable.create(spark, str(tmp_path / "src"), SRC_SCHEMA,
                              ["repo", "path", "commit"], num_buckets=4)

    def mk(name, ddl, keys):
        return LakeTable.create(
            spark, str(tmp_path / name), T._parse_datatype_string(ddl), keys,
            num_buckets=4,
        )

    targets = {
        "file": mk("file", FILE_SCHEMA, ["file_id"]),
        "repo": mk("repo", REPO_SCHEMA, ["repo_id"]),
        "commit_activity": mk("act", ACT_SCHEMA, ["activity_id"]),
    }
    group = TableGroup.create(spark, str(tmp_path / "grp"), targets,
                              keep_pinned=keep_pinned)
    return source, targets, group


def _fk_clean(group, version=None):
    rep = referential_integrity_report(
        group.read("file", version=version),
        group.read("repo", version=version),
        group.read("commit_activity", version=version),
    ).first()
    return (rep.orphan_repo_refs, rep.orphan_activity_refs) == (0, 0)


def test_group_commit_is_atomic_and_replay_converges(spark, tmp_path):
    source, targets, group = _setup(spark, tmp_path)
    ev = repo_file_events(spark, n_keys=200, events_per_key=2, seed=51)

    merge_into(source, ev, batch_id=1)
    v1 = source.current_version()
    transactional_split_refresh(source, group, from_version=0,
                                to_version=v1, batch_id=1)
    g1 = group.current_version()
    assert group.read("file").count() > 0
    assert _fk_clean(group)

    # replay the same refresh: members fence-skip, group fence-skips,
    # version unchanged
    transactional_split_refresh(source, group, from_version=0,
                                to_version=v1, batch_id=1)
    assert group.current_version() == g1
    assert _fk_clean(group)


def test_crash_between_member_commits_keeps_consistent_vector(spark, tmp_path):
    """The crash-between-swaps scenario: one member (file) committed its
    batch, the others and the group commit never ran. Direct table reads
    see dangling FKs; GROUP reads stay on the old consistent vector.
    Replaying the transactional refresh converges everything."""
    source, targets, group = _setup(spark, tmp_path)
    ev = repo_file_events(spark, n_keys=150, events_per_key=2, seed=53)
    merge_into(source, ev, batch_id=1)
    v1 = source.current_version()
    transactional_split_refresh(source, group, from_version=0,
                                to_version=v1, batch_id=1)
    g1 = group.current_version()

    # batch 2 introduces a brand-new repo, then "crashes" after only the
    # FILE member committed (partial refresh = the mid-transaction state)
    newrow = spark.createDataFrame(
        [("orgX/brandnew", "src/new.py", "e" * 40, "python", "body",
          "insert", 10_000)],
        "repo string, path string, commit string, lang string, "
        "content string, op string, event_seq long",
    )
    merge_into(source, newrow, batch_id=2)
    v2 = source.current_version()
    incremental_split_refresh(source, {"file": targets["file"]},
                              from_version=v1, to_version=v2, batch_id=2)

    # direct read: the file table references a repo that does not exist
    direct = referential_integrity_report(
        targets["file"].read(), targets["repo"].read(),
        targets["commit_activity"].read(),
    ).first()
    assert direct.orphan_repo_refs > 0

    # group read: still the old vector — consistent, FK-clean
    assert group.current_version() == g1
    assert _fk_clean(group)

    # replay the full transactional refresh for batch 2: the file member
    # fence-skips, repo/activity catch up, ONE group commit lands
    transactional_split_refresh(source, group, from_version=v1,
                                to_version=v2, batch_id=2)
    assert group.current_version() == g1 + 1
    assert _fk_clean(group)
    assert group.read("repo").filter(
        F.col("repo_id") == "orgX/brandnew").count() == 1
    # and the historical group snapshot is still readable + clean
    assert _fk_clean(group, version=g1)


def test_streaming_pipeline_with_derived_group(spark, tmp_path):
    """The full DAG under group consistency: tail → MERGE → transactional
    derived refresh per epoch. The group version advances once per
    merged epoch, every group snapshot is FK-clean, and the final group
    read equals a full recompute."""
    from encode_ingest_spark.entities import split_all
    from encode_ingest_spark.streaming.pipeline import (
        CdcStreamPipeline,
        write_event_files,
    )

    source, targets, group = _setup(spark, tmp_path)
    ev = repo_file_events(spark, n_keys=200, events_per_key=2, seed=57)
    write_event_files(ev, str(tmp_path / "ev"), n_files=3)
    pipe = CdcStreamPipeline(
        source, str(tmp_path / "ev"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1, derived_group=group,
    )
    merged = pipe.run_available_now(spark)
    assert merged >= 2
    assert group.current_version() == merged
    for gv in range(1, group.current_version() + 1):
        assert _fk_clean(group, version=gv), f"group v{gv} FK-dirty"

    want = split_all(source.read())
    got = {tuple(str(v) for v in r)
           for r in group.read("file").select("file_id", "content_sha256").collect()}
    exp = {tuple(str(v) for v in r)
           for r in want["file"].select("file_id", "content_sha256").collect()}
    assert got == exp

    # re-drain with nothing new: no group movement
    assert pipe.run_available_now(spark) == 0
    assert group.current_version() == merged


def test_group_commit_fences_and_rejects_unknown_members(spark, tmp_path):
    source, targets, group = _setup(spark, tmp_path)
    with pytest.raises(ValueError, match="not group members"):
        group.commit({"nope": 1}, batch_id=1)
    m = group.commit({"file": 0}, source_id="s", batch_id=5)
    assert m["version"] == 1
    # lower/equal batch ids fence off
    m2 = group.commit({"file": 0}, source_id="s", batch_id=5)
    assert m2["version"] == 1
    assert group.last_batch("s") == 5


def test_member_expiry_cannot_break_group_reads(spark, tmp_path):
    """Group-pinned member versions are retention roots: a member's
    aggressive expire_snapshots keeps the pinned snapshot (and its
    files) alive and loadable, so group readers never dangle."""
    source, targets, group = _setup(spark, tmp_path)
    ev = repo_file_events(spark, n_keys=120, events_per_key=2, seed=59)
    merge_into(source, ev, batch_id=1)
    transactional_split_refresh(source, group, from_version=0,
                                to_version=source.current_version(), batch_id=1)
    pinned_v = group.pinned_versions()["file"]
    want = {tuple(r) for r in group.read("file")
            .select("file_id", "content_sha256").collect()}

    # the file member advances well past the group pin, then expires
    # down to 1 snapshot
    ft = targets["file"]
    for i in range(3):
        extra = spark.createDataFrame(
            [(f"xf{i}", "l", "py", ["x"], 1, "s" * 64, "o/r", "a", "d",
              "upsert", 100 + i)],
            FILE_SCHEMA + ", op string, event_seq long",
        )
        merge_into(ft, extra, batch_id=10 + i)
    ft.expire_snapshots(keep_last=1)

    # the pinned version survived member expiry — fresh instance, fresh
    # group: reads still resolve
    fresh = TableGroup.load(spark, group.root)
    got = {tuple(r) for r in fresh.read("file")
           .select("file_id", "content_sha256").collect()}
    assert got == want
    assert LakeTable.load(spark, ft.root).read(version=pinned_v).count() > 0
    # unpinned versions between the pin and CURRENT are gone
    assert len(LakeTable.load(spark, ft.root)._all_versions()) <= 3


def test_replayed_group_commit_heals_missing_pins(spark, tmp_path):
    """Crash between group swap and pin write: the pins are absent for
    the committed vector. A replayed (fence-skipped) commit must re-pin
    — the healer for the crash window."""
    source, targets, group = _setup(spark, tmp_path)
    ev = repo_file_events(spark, n_keys=80, events_per_key=2, seed=61)
    merge_into(source, ev, batch_id=1)
    transactional_split_refresh(source, group, from_version=0,
                                to_version=source.current_version(), batch_id=1)
    # simulate the crash window: wipe the pins the commit wrote
    import os
    import shutil

    for t in targets.values():
        shutil.rmtree(os.path.join(t._meta_dir, "pins"), ignore_errors=True)
    assert targets["file"].pinned_versions() == {}
    # fence-skipped replay re-pins the committed vector
    gv = group.current_version()
    transactional_split_refresh(source, group, from_version=0,
                                to_version=source.current_version(), batch_id=1)
    assert group.current_version() == gv
    for name, t in targets.items():
        pins = t.pinned_versions()
        assert pins and list(pins.values())[0] == group.pinned_versions()[name]


def test_pinned_version_lineage_survives_chain_disconnect(spark, tmp_path):
    """A pin below the retention window is re-rooted off the current
    chain by expiry — its lineage must stay reachable (lineage_df and
    the replay resolver), or a group replay could resolve the wrong
    member version."""
    source, targets, group = _setup(spark, tmp_path)
    ev = repo_file_events(spark, n_keys=80, events_per_key=2, seed=63)
    merge_into(source, ev, batch_id=1)
    transactional_split_refresh(source, group, from_version=0,
                                to_version=source.current_version(), batch_id=1)
    ft = targets["file"]
    pinned_v = group.pinned_versions()["file"]

    for i in range(3):
        extra = spark.createDataFrame(
            [(f"gf{i}", "l", "py", ["x"], 1, "s" * 64, "o/r", "a", "d",
              "upsert", 500 + i)],
            FILE_SCHEMA + ", op string, event_seq long",
        )
        merge_into(ft, extra, source_id="other", batch_id=50 + i)
    ft.expire_snapshots(keep_last=1)

    fresh = LakeTable.load(spark, ft.root)
    # the pinned version is disconnected from CURRENT's chain, yet its
    # batch resolves (diff base severed by re-root → parent None) and
    # its lineage rows are present
    span = fresh.lineage_span_for("entity_refresh", 1)
    assert span is not None and span[1] == pinned_v
    assert group.version_for_batch(fresh, "entity_refresh", 1) == pinned_v
    batches = {(r.source_id, r.batch_id) for r in fresh.lineage_df().collect()}
    assert ("entity_refresh", 1) in batches


def test_group_time_travel_retention_window(spark, tmp_path):
    """VERDICT r3 directive 4: the last ``keep_pinned`` group versions
    are retention roots in members — a 3-versions-old group snapshot
    stays readable (and FK-clean) after aggressive member
    expire_snapshots + maintain(); group expire_snapshots prunes group
    manifests together with their member pins."""
    source, targets, group = _setup(spark, tmp_path, keep_pinned=4)
    sv = source.current_version()
    for i in range(1, 5):
        merge_into(
            source,
            repo_file_events(spark, n_keys=40, events_per_key=1, seed=70 + i),
            batch_id=i,
        )
        transactional_split_refresh(
            source, group, from_version=sv,
            to_version=source.current_version(), batch_id=i,
        )
        sv = source.current_version()
    assert group.current_version() == 4

    old_v = 1  # 3 versions old
    want = {tuple(r) for r in group.read("file", version=old_v)
            .select("file_id", "content_sha256").collect()}
    assert want

    for t in targets.values():
        t.expire_snapshots(keep_last=1)
        t.maintain(keep_snapshots=1)

    fresh = TableGroup.load(spark, group.root)
    got = {tuple(r) for r in fresh.read("file", version=old_v)
           .select("file_id", "content_sha256").collect()}
    assert got == want
    assert _fk_clean(fresh, version=old_v)
    assert _fk_clean(fresh)  # current vector too

    # per-version pins cover exactly the protected window (g1..g4 after
    # the g0 pin was GC'd at commit time), namespaced by group version
    names = sorted(targets["file"].pinned_versions())
    assert 1 <= len(names) <= 4
    assert all(".g" in n for n in names)

    # group-level expiry: manifests g0..g2 go, their member pins too
    removed = fresh.expire_snapshots(keep_last=2)
    assert removed == 3
    with pytest.raises(OSError):
        fresh.read("file", version=old_v)
    kept = sorted(targets["file"].pinned_versions())
    assert all(int(n.rsplit(".g", 1)[1]) >= 3 for n in kept)
    # the surviving window still reads clean
    assert _fk_clean(fresh, version=3)


def test_group_commit_conflict_heals_winner_pins(spark, tmp_path):
    """ADVICE r3: a losing concurrent group commit overwrites the
    winner's pins for the contended version with its own uncommitted
    vector BEFORE hitting the O_EXCL conflict — on conflict it must
    re-pin the winner's committed vector before re-raising."""
    import pytest as _pytest

    from encode_ingest_spark.lake import CommitConflictError

    source, targets, group = _setup(spark, tmp_path)
    ev = repo_file_events(spark, n_keys=60, events_per_key=1, seed=77)
    merge_into(source, ev, batch_id=1)
    transactional_split_refresh(source, group, from_version=0,
                                to_version=source.current_version(),
                                batch_id=1)
    committed = group.pinned_versions()

    # a second committer racing the SAME next version: simulate by
    # pre-creating the manifest the loser will try to write (the winner
    # is the transactional refresh above only for version 1; here we
    # stage the conflict at version 2)
    winner = TableGroup.load(spark, group.root)
    winner.commit({"file": committed["file"]}, source_id="w", batch_id=7)
    winner_pins = {n: t.pinned_versions() for n, t in targets.items()}

    loser = TableGroup.load(spark, group.root)
    # force the loser to race version 2 as well: rewind its view by
    # reading the v1 manifest as current via a monkeypatched
    # current_version
    loser.current_version = lambda: 1  # type: ignore[method-assign]
    stale = targets["file"].current_version()
    with _pytest.raises(CommitConflictError):
        loser.commit({"file": 0}, source_id="l", batch_id=9)
    # the loser's healing re-pin restored the winner's vector
    for n, t in targets.items():
        assert t.pinned_versions() == winner_pins[n], n
    assert stale == targets["file"].current_version()


def test_group_history_survives_expiry(spark, tmp_path):
    """Group commit history (vector + watermarks per version) outlives
    group snapshot retention via the append-only history archive —
    double expiry does not duplicate records."""
    source, targets, group = _setup(spark, tmp_path)
    for i in range(1, 4):
        merge_into(
            source,
            repo_file_events(spark, n_keys=30, events_per_key=1, seed=80 + i),
            batch_id=i,
        )
        group.commit({"file": targets["file"].current_version()},
                     source_id="h", batch_id=i)
    removed = group.expire_snapshots(keep_last=1)
    assert removed == 3  # g0..g2 expired
    hist = group.history()
    assert [h["version"] for h in hist] == [0, 1, 2, 3]
    assert hist[2]["watermarks"]["h"]["batch_id"] == 2
    # idempotent: re-expiry adds nothing
    group.expire_snapshots(keep_last=1)
    assert len(group.history()) == 4
