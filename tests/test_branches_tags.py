"""Tags (named immutable snapshots) and branches (write-audit-publish).

Iceberg ref semantics re-expressed over the manifest-chain format:
a tag is a retention-rooted named snapshot; a branch is an isolated
manifest chain sharing the data directory, staged-on, audited via
read/read_changes, then atomically published to main (adopting files,
schema set, and exactly-once watermarks) or dropped (branch-only files
GC'd). Reference analogue: the staged-vs-live diff + atomic promote
flow (ingest-processed-data.yaml:86-116) — here generalized to any
table, the WAP pattern the reference runs as a one-off dataset swap.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from encode_ingest_spark.lake import CommitConflictError, LakeTable, merge_into

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

BATCH_SCHEMA = T.StructType(
    list(SCHEMA.fields)
    + [
        T.StructField("op", T.StringType(), False),
        T.StructField("event_seq", T.LongType(), False),
    ]
)


def _mk(spark, tmp_path, n=6):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=4)
    rows = [("o/r", f"p{i}", "c" * 40, "python", f"v1-{i}") for i in range(n)]
    t.overwrite(spark.createDataFrame(rows, SCHEMA))
    return t


def _batch(spark, rows):
    return spark.createDataFrame(rows, BATCH_SCHEMA)


# ---------------------------------------------------------------- tags


def test_tag_read_and_expire_protection(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v_tagged = t.tag("release-1")
    assert t.tags() == {"release-1": v_tagged}
    # move main twice, then expire everything but the last snapshot
    for gen in ("v2", "v3"):
        t.overwrite(
            spark.createDataFrame(
                [("o/r", "p0", "c" * 40, "python", gen)], SCHEMA
            )
        )
    t.expire_snapshots(keep_last=1)
    # tagged snapshot (and its data files) survived
    got = {r.content for r in t.read(tag="release-1").collect()}
    assert got == {f"v1-{i}" for i in range(6)}
    # untag releases the retention root: next expiry reclaims it
    t.untag("release-1")
    t.expire_snapshots(keep_last=1)
    with pytest.raises((ValueError, OSError)):
        t.read(version=v_tagged).collect()


def test_tag_errors(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.tag("ok")
    with pytest.raises(ValueError):
        t.read(tag="ok", version=0)  # mutually exclusive
    with pytest.raises(ValueError):
        t.read(tag="missing")
    with pytest.raises(ValueError):
        t.tag("bad name")  # whitespace not allowed


# ------------------------------------------------------------ branches


def test_branch_isolation_and_publish(spark, tmp_path):
    t = _mk(spark, tmp_path)
    main_v = t.current_version()
    br = t.create_branch("audit")
    # stage an upsert + a delete on the branch
    merge_into(
        br,
        _batch(
            spark,
            [
                ("o/r", "p0", "c" * 40, "python", "staged", "upsert", 100),
                ("o/r", "p1", "c" * 40, None, None, "delete", 101),
            ],
        ),
        source_id="stage",
        batch_id=7,
    )
    # invisible to main readers; visible on the branch
    assert {r.content for r in t.read().collect()} == {
        f"v1-{i}" for i in range(6)
    }
    staged = {r.path: r.content for r in br.read().collect()}
    assert staged["p0"] == "staged" and "p1" not in staged
    # audit: changelog from the fork point is exactly the staged delta
    fork_v = t.branch_fork_version("audit")
    changes = {
        (r.path, r._change_type)
        for r in br.read_changes(fork_v).collect()
    }
    assert changes == {("p0", "update"), ("p1", "delete")}
    # publish: ONE atomic main commit
    nm = t.publish_branch("audit")
    assert nm.version == main_v + 1
    live = {r.path: r.content for r in t.read().collect()}
    assert live["p0"] == "staged" and "p1" not in live and len(live) == 5
    # exactly-once fence traveled with the publish: replaying the staged
    # batch against MAIN fence-skips
    res = merge_into(
        t,
        _batch(
            spark,
            [("o/r", "p0", "c" * 40, "python", "dup", "upsert", 100)],
        ),
        source_id="stage",
        batch_id=7,
    )
    assert res.skipped
    # drop after publish: branch metadata gone, published data intact
    t.drop_branch("audit")
    assert t.branches() == {}
    assert {r.content for r in t.read().collect()} == {
        "staged", "v1-2", "v1-3", "v1-4", "v1-5",
    }


def test_publish_conflict_when_main_moves(spark, tmp_path):
    t = _mk(spark, tmp_path)
    br = t.create_branch("wap")
    merge_into(
        br,
        _batch(spark, [("o/r", "pX", "c" * 40, "go", "new", "upsert", 50)]),
        source_id="s",
        batch_id=1,
    )
    # main moves independently → the WAP contract is violated
    t.overwrite(
        spark.createDataFrame([("o/r", "p0", "c" * 40, "go", "main2")], SCHEMA)
    )
    with pytest.raises(CommitConflictError):
        t.publish_branch("wap")
    # recovery path: drop and re-branch from CURRENT
    t.drop_branch("wap")
    br2 = t.create_branch("wap")
    merge_into(
        br2,
        _batch(spark, [("o/r", "pX", "c" * 40, "go", "new", "upsert", 50)]),
        source_id="s",
        batch_id=1,
    )
    t.publish_branch("wap")
    assert {r.path for r in t.read().collect()} == {"p0", "pX"}


def test_drop_unpublished_branch_gcs_only_branch_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    br = t.create_branch("scrap")
    merge_into(
        br,
        _batch(
            spark,
            [("o/r", f"q{i}", "c" * 40, "rust", f"b{i}", "upsert", 10 + i)
             for i in range(8)],
        ),
        source_id="s",
        batch_id=1,
    )
    # the branch-only files are NOT orphans while the branch lives
    assert t.orphan_files() == []
    removed = t.drop_branch("scrap")
    assert removed > 0
    # main unharmed, nothing dangling
    assert {r.content for r in t.read().collect()} == {
        f"v1-{i}" for i in range(6)
    }
    assert t.orphan_files() == []


def test_fork_pin_blocks_expiry_under_live_branch(spark, tmp_path):
    t = _mk(spark, tmp_path)
    br = t.create_branch("longlived")
    # main advances and expires aggressively
    for gen in ("m2", "m3", "m4"):
        t.overwrite(
            spark.createDataFrame(
                [("o/r", "p0", "c" * 40, "python", gen)], SCHEMA
            )
        )
    t.expire_snapshots(keep_last=1)
    # the branch still reads its fork snapshot's shared files
    assert {r.content for r in br.read().collect()} == {
        f"v1-{i}" for i in range(6)
    }
    # dropping the branch releases the fork pin; expiry then reclaims
    t.drop_branch("longlived")
    t.expire_snapshots(keep_last=1)
    assert [r.content for r in t.read().collect()] == ["m4"]


def test_branch_guardrails(spark, tmp_path):
    t = _mk(spark, tmp_path)
    br = t.create_branch("b1")
    with pytest.raises(FileExistsError):
        t.create_branch("b1")
    with pytest.raises(ValueError):
        t.branch("nope")
    for op in ("expire_snapshots", "orphan_files", "maintain"):
        with pytest.raises(ValueError):
            getattr(br, op)()
    with pytest.raises(ValueError):
        br.create_branch("nested")
    # publish with nothing staged is a no-op returning CURRENT
    cur = t.current_manifest()
    assert t.publish_branch("b1").version == cur.version


def test_follower_consumes_published_branch(spark, tmp_path):
    """WAP composes with the change feed: a downstream follower polling
    MAIN sees a branch publish as one ordinary commit — the staged
    changes land in the mirror exactly once, and nothing leaks while
    the branch is unpublished (read_changes is a snapshot diff, so the
    rewrite-shaped publish needs no lineage row counts to be consumed)."""
    from encode_ingest_spark.lake import ChangeFeedFollower

    t = _mk(spark, tmp_path)
    mirror = ChangeFeedFollower.mirror_target(t, str(tmp_path / "m"))
    f = ChangeFeedFollower(t, mirror)
    f.poll()
    assert mirror.read().count() == 6

    br = t.create_branch("wap")
    merge_into(
        br,
        _batch(
            spark,
            [
                ("o/r", "p0", "c" * 40, "python", "staged", "upsert", 200),
                ("o/r", "p5", "c" * 40, None, None, "delete", 201),
            ],
        ),
        source_id="stage",
        batch_id=9,
    )
    # unpublished staging is invisible to the feed
    assert f.poll().caught_up and mirror.read().count() == 6

    t.publish_branch("wap")
    res = f.poll()
    assert res.to_version == t.current_version()
    mirrored = {r.path: r.content for r in mirror.read().collect()}
    assert mirrored["p0"] == "staged" and "p5" not in mirrored
    assert len(mirrored) == 5
    # re-poll is a fenced no-op
    assert f.poll().caught_up
