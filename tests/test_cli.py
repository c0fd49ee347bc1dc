"""The spark-submit-able CLI (`python -m encode_ingest_spark`).

The north rule's deployment shape is `spark-submit --py-files` driving a
job script; `encode_ingest_spark/__main__.py` is that script. These tests
drive every verb in-process against the shared session, plus ONE real
subprocess (`python -m`, fresh interpreter, PYTHONPATH import — the same
import path --py-files produces) as the packaging smoke.
"""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from encode_ingest_spark.__main__ import main
from encode_ingest_spark.lake import LakeTable

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(spark, capsys, *argv) -> dict:
    assert main(list(argv), spark=spark) == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


@pytest.fixture()
def roots(tmp_path):
    return str(tmp_path / "lake"), str(tmp_path / "events"), str(tmp_path / "ckpt")


def test_cli_end_to_end(spark, capsys, roots):
    lake, events, ckpt = roots
    out = run_cli(spark, capsys, "create", "--root", lake, "--buckets", "4")
    assert out["version"] == 0 and out["keys"] == ["repo", "path", "commit"]

    out = run_cli(
        spark, capsys, "generate", "--out", events,
        "--n-keys", "60", "--events-per-key", "3", "--files", "3",
    )
    assert out["events"] == 180

    out = run_cli(
        spark, capsys, "ingest", "--root", lake, "--events-dir", events,
        "--checkpoint", ckpt, "--source-id", "s1", "--max-files-per-trigger", "1",
    )
    # hash-split can leave an empty part file (its batch merges no rows),
    # so pin a floor, not the exact micro-batch count
    assert out["batches_merged"] >= 2 and out["batches_fenced"] == 0

    # drained checkpoint: a second run merges nothing
    out = run_cli(
        spark, capsys, "ingest", "--root", lake, "--events-dir", events,
        "--checkpoint", ckpt, "--source-id", "s1",
    )
    assert out["batches_merged"] == 0

    # final state == replay oracle (last op per key, deletes dropped)
    from encode_ingest_spark.cdc.generator import repo_file_events

    ev = repo_file_events(spark, n_keys=60, events_per_key=3, seed=42)
    expected = (
        ev.groupBy("repo", "path", "commit")
        .agg(F.max_by("op", "event_seq").alias("op"))
        .filter(F.col("op") != "delete")
        .count()
    )
    table = LakeTable.load(spark, lake)
    assert table.read().count() == expected

    # maintenance pass between ingest windows: near-no-op on a healthy
    # table, but must run and report
    out = run_cli(
        spark, capsys, "maintain", "--root", lake, "--keep-snapshots", "10",
    )
    assert out["cmd"] == "maintain" and "orphans_removed" in out

    out = run_cli(spark, capsys, "status", "--root", lake, "--lineage-tail", "2")
    assert out["version"] == table.current_version()
    assert out["watermarks"]["s1"]["batch_id"] >= 1
    assert out["rows_upper_bound"] >= expected
    assert len(out["lineage_tail"]) >= 1


def test_cli_merge_fence(spark, capsys, roots, tmp_path):
    lake, _, _ = roots
    run_cli(spark, capsys, "create", "--root", lake, "--buckets", "4")

    from encode_ingest_spark.cdc.generator import repo_file_events

    batch_path = str(tmp_path / "batch")
    repo_file_events(spark, n_keys=40, events_per_key=2, seed=7).write.parquet(
        batch_path
    )
    out = run_cli(
        spark, capsys, "merge", "--root", lake, "--batch", batch_path,
        "--source-id", "cli", "--batch-id", "1",
    )
    assert not out["skipped"] and out["version"] >= 1
    v = out["version"]

    # replaying the same batch id is a fenced no-op
    out = run_cli(
        spark, capsys, "merge", "--root", lake, "--batch", batch_path,
        "--source-id", "cli", "--batch-id", "1",
    )
    assert out["skipped"] and out["version"] == v


def test_cli_dml_delete_update_sync(spark, capsys, roots, tmp_path):
    """The three DML verbs as an orchestrator would chain them: seed via
    merge, predicate delete + update, then `sync` (MERGE a staged parquet
    dataset, pruning live rows missing from staging — the reference's
    ingest-processed-data staged-sync shape)."""
    lake, _, _ = roots
    run_cli(spark, capsys, "create", "--root", lake, "--buckets", "4")

    from encode_ingest_spark.cdc.generator import repo_file_events

    batch_path = str(tmp_path / "seed")
    repo_file_events(
        spark, n_keys=30, events_per_key=1, seed=3, delete_pct=0
    ).write.parquet(batch_path)
    run_cli(
        spark, capsys, "merge", "--root", lake, "--batch", batch_path,
        "--batch-id", "1",
    )
    table = LakeTable.load(spark, lake)
    n0 = table.read().count()
    assert n0 == 30

    langs = [
        r["lang"]
        for r in table.read().groupBy("lang").count()
        .orderBy(F.desc("count"), "lang").limit(2).collect()
    ]
    out = run_cli(
        spark, capsys, "delete", "--root", lake,
        "--where", f"lang = '{langs[0]}'",
    )
    gone = out["rows_matched"]
    assert gone >= 1 and table.read().count() == n0 - gone

    out = run_cli(
        spark, capsys, "update", "--root", lake,
        "--where", f"lang = '{langs[1]}'", "--set", "content=upper(content)",
    )
    assert out["rows_matched"] >= 1
    assert (
        table.read()
        .filter(f"lang = '{langs[1]}' AND content != upper(content)")
        .count() == 0
    )

    # staged sync: keep 5 live keys (content rewritten), add 2 new keys,
    # prune everything else
    staged = (
        table.read()
        .limit(5)
        .select("repo", "path", "commit", "lang")
        .withColumn("content", F.lit("staged"))
    )
    staged = staged.unionByName(
        spark.createDataFrame(
            [("rnew", f"p{i}", "c0", "py", "fresh") for i in range(2)],
            staged.schema,
        )
    )
    staged_path = str(tmp_path / "staged")
    staged.write.parquet(staged_path)
    out = run_cli(
        spark, capsys, "sync", "--root", lake, "--source", staged_path,
        "--prune-missing", "--batch-id", "1",
    )
    assert out["counts"]["updated"] == 5 and out["counts"]["inserted"] == 2
    assert out["counts"]["deleted"] == n0 - gone - 5
    live = table.read()
    assert live.count() == 7
    assert live.filter("content IN ('staged', 'fresh')").count() == 7

    # retried sync under the same fence is a no-op reporting zero counts
    v = out["version"]
    out = run_cli(
        spark, capsys, "sync", "--root", lake, "--source", staged_path,
        "--prune-missing", "--batch-id", "1",
    )
    assert out["skipped"] and out["version"] == v
    assert out["counts"] == {"inserted": 0, "updated": 0, "deleted": 0}

    # an EMPTY staged source + --prune-missing is a refused full wipe
    empty_path = str(tmp_path / "staged_empty")
    staged.limit(0).write.parquet(empty_path)
    with pytest.raises(SystemExit, match="force-empty-source"):
        main(["sync", "--root", lake, "--source", empty_path,
              "--prune-missing"], spark=spark)
    capsys.readouterr()
    assert table.read().count() == 7  # untouched


def test_cli_universe_roundtrip(spark, capsys, tmp_path):
    """The universe verbs drive the reference's whole extract->transform
    DAG as a job: create the layout, drain a multiplexed changelog, and
    the derived state equals the full recompute."""
    import json as _json

    from encode_ingest_spark.entities import transform_all
    from tests.test_entity_universe import SEED_EPOCH_1, _rows

    root = str(tmp_path / "uni")
    out = run_cli(spark, capsys, "universe-create", "--root", root,
                  "--buckets", "2")
    assert out["raw_tables"] >= 18 and out["output_tables"] >= 15

    rows = []
    for i, (name, rws) in enumerate(SEED_EPOCH_1.items()):
        for j, r in enumerate(rws):
            rows.append((name, "upsert", 1000 + i * 100 + j, _json.dumps(r)))
    ev_dir = str(tmp_path / "events")
    spark.createDataFrame(
        rows, "entity string, op string, event_seq long, payload string"
    ).coalesce(1).write.parquet(ev_dir)

    out = run_cli(
        spark, capsys, "universe-ingest", "--root", root,
        "--events-dir", ev_dir, "--checkpoint", str(tmp_path / "ck"),
    )
    assert out["epochs_merged"] == 1 and out["group_version"] >= 1

    # re-drain is a fenced no-op
    out = run_cli(
        spark, capsys, "universe-ingest", "--root", root,
        "--events-dir", ev_dir, "--checkpoint", str(tmp_path / "ck"),
    )
    assert out["epochs_merged"] == 0

    from encode_ingest_spark.__main__ import _load_universe

    universe, _, group = _load_universe(spark, root)
    want = transform_all(
        spark, {n: t.read() for n, t in universe.items()}
    )
    for name in ("donor", "biosample", "file"):
        assert _rows(group.read(name)) == _rows(want[name]), name

    out = run_cli(spark, capsys, "universe-status", "--root", root)
    assert out["group_version"] >= 1
    assert out["tables"]["donor"]["rows_upper_bound"] >= 3

    # housekeeping across the whole layout is one verb; derived state
    # (read through the group's pinned vector) is untouched by it
    out = run_cli(
        spark, capsys, "universe-maintain", "--root", root,
        "--keep-snapshots", "2",
    )
    assert out["tables_maintained"] >= 33
    assert out["expired_group_versions"] >= 0
    assert "orphans_removed" in out
    for name in ("donor", "biosample", "file"):
        assert _rows(group.read(name)) == _rows(want[name]), name


def test_cli_subprocess_packaging(tmp_path):
    """`python -m encode_ingest_spark` from a fresh interpreter outside the
    repo cwd — the import path a spark-submit --py-files deployment uses."""
    env = dict(os.environ, PYTHONPATH=REPO_ROOT, SPARK_DRIVER_MEM="2g")
    proc = subprocess.run(
        [
            sys.executable, "-m", "encode_ingest_spark", "--cores", "2",
            "create", "--root", str(tmp_path / "lake"), "--buckets", "2",
        ],
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["cmd"] == "create" and out["version"] == 0


_SUBMIT_JOB = """\
import json
import sys

from encode_ingest_spark.__main__ import main
from encode_ingest_spark.session import get_spark

# get_spark must detect the spark-submit-owned gateway (PYSPARK_GATEWAY_PORT)
# and leave spark.master alone: cores=4 would force local[4] in a bare run,
# but the submit line said local[2] and that must win.
spark = get_spark("submit-e2e", cores=4)
assert spark.sparkContext.master == "local[2]", spark.sparkContext.master

lake, events, ckpt = sys.argv[1:4]
rc = 0
rc |= main(["create", "--root", lake, "--buckets", "2"], spark=spark)
rc |= main(
    ["generate", "--out", events, "--n-keys", "40", "--events-per-key", "3",
     "--files", "2"],
    spark=spark,
)
rc |= main(
    ["ingest", "--root", lake, "--events-dir", events, "--checkpoint", ckpt,
     "--source-id", "s1"],
    spark=spark,
)
rc |= main(["status", "--root", lake], spark=spark)
spark.stop()
sys.exit(rc)
"""


def test_cli_spark_submit_py_files(tmp_path):
    """The north rule's deployment shape, literally: ``spark-submit
    --py-files encode_ingest_spark.zip job.py`` in a fresh JVM, with the
    repo NOT on any import path — the package must resolve from the zip,
    the master must come from the submit line (not get_spark's local[N]
    fallback), and one job must chain create -> generate -> ingest ->
    status through a single session."""
    import shutil as _shutil
    import zipfile

    spark_submit = _shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not installed")

    pkg_zip = tmp_path / "encode_ingest_spark.zip"
    pkg_root = os.path.join(REPO_ROOT, "encode_ingest_spark")
    with zipfile.ZipFile(pkg_zip, "w") as zf:
        for dirpath, _dirs, files in os.walk(pkg_root):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO_ROOT))

    job = tmp_path / "job.py"
    job.write_text(_SUBMIT_JOB)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY import source
    env.setdefault("SPARK_DRIVER_MEM", "2g")
    lake, events, ckpt = (
        str(tmp_path / "lake"), str(tmp_path / "events"), str(tmp_path / "ckpt")
    )
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[2]", "--driver-memory", "2g",
            "--py-files", str(pkg_zip), str(job), lake, events, ckpt,
        ],
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    outs = [
        json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")
    ]
    by_cmd = {o["cmd"]: o for o in outs}
    assert by_cmd["create"]["version"] == 0
    assert by_cmd["generate"]["events"] == 120
    assert by_cmd["ingest"]["batches_merged"] >= 1
    status = by_cmd["status"]
    assert status["watermarks"]["s1"]["batch_id"] >= 0
    assert status["rows_upper_bound"] >= 1 and status["version"] >= 1


def test_cli_tag_and_branch_wap(spark, capsys, roots, tmp_path):
    """The write-audit-publish flow driven verb-by-verb, the way an
    orchestrator would: tag a release, stage a batch on a branch with
    `merge --ref`, audit with `status --ref` (main unmoved), publish,
    drop — plus tag time-travel protection surviving maintain()'s
    expiry."""
    lake, _, _ = roots
    run_cli(spark, capsys, "create", "--root", lake, "--buckets", "4")

    from encode_ingest_spark.cdc.generator import repo_file_events

    batch = str(tmp_path / "batch")
    repo_file_events(
        spark, n_keys=40, events_per_key=1, seed=7, delete_pct=0
    ).write.parquet(batch)
    run_cli(
        spark, capsys, "merge", "--root", lake, "--batch", batch,
        "--batch-id", "1",
    )
    out = run_cli(spark, capsys, "tag", "set", "--root", lake, "--name", "rel")
    assert out["version"] == 1
    assert run_cli(spark, capsys, "tag", "list", "--root", lake)["tags"] == {
        "rel": 1
    }

    # fork, stage the same logical batch under a new id on the branch
    out = run_cli(
        spark, capsys, "branch", "create", "--root", lake, "--name", "wap"
    )
    assert out["fork_version"] == 1
    run_cli(
        spark, capsys, "merge", "--root", lake, "--batch", batch,
        "--batch-id", "2", "--source-id", "stage", "--ref", "wap",
    )
    main_status = run_cli(spark, capsys, "status", "--root", lake)
    br_status = run_cli(
        spark, capsys, "status", "--root", lake, "--ref", "wap"
    )
    assert main_status["version"] == 1  # isolation: main unmoved
    assert br_status["version"] == 2
    assert br_status["watermarks"]["stage"]["batch_id"] == 2

    out = run_cli(
        spark, capsys, "branch", "publish", "--root", lake, "--name", "wap"
    )
    assert out["version"] == 2
    published = run_cli(spark, capsys, "status", "--root", lake)
    assert published["watermarks"]["stage"]["batch_id"] == 2  # fence traveled
    run_cli(spark, capsys, "branch", "drop", "--root", lake, "--name", "wap")
    assert run_cli(spark, capsys, "branch", "list", "--root", lake)[
        "branches"
    ] == {}

    # maintain() expires aggressively; the tagged snapshot must survive
    run_cli(spark, capsys, "maintain", "--root", lake, "--keep-snapshots", "1")
    t = LakeTable.load(spark, lake)
    assert t.read(tag="rel").count() == 40
    run_cli(spark, capsys, "tag", "delete", "--root", lake, "--name", "rel")
    assert run_cli(spark, capsys, "tag", "list", "--root", lake)["tags"] == {}


def test_cli_maintain_zorder_recluster(spark, capsys, tmp_path):
    """maintain --zorder re-clusters through the CLI: properties set,
    rows identical, report carries the recluster fields."""
    lake = str(tmp_path / "zlake")
    events = str(tmp_path / "zevents")
    run_cli(spark, capsys, "create", "--root", lake, "--buckets", "2")
    run_cli(
        spark, capsys, "generate", "--out", events,
        "--n-keys", "50", "--events-per-key", "2", "--files", "1",
    )
    run_cli(
        spark, capsys, "merge", "--root", lake, "--batch", events,
        "--batch-id", "1",
    )
    t = LakeTable.load(spark, lake)
    before = t.read().count()
    out = run_cli(
        spark, capsys, "maintain", "--root", lake,
        "--zorder", "repo,lang",
    )
    assert out["reclustered"] == ["repo", "lang"]
    assert out["strategy"] == "zorder"
    t = LakeTable.load(spark, lake)
    assert t.read().count() == before
    from encode_ingest_spark.lake import parse_cluster_spec

    cols, is_z = parse_cluster_spec(t.current_manifest().properties)
    assert (cols, is_z) == (["repo", "lang"], True)


def test_cli_properties_set_unset(spark, capsys, tmp_path):
    """properties --set/--unset: metadata-only ALTER, and the newly-set
    constraint enforces on the next CLI merge."""
    lake = str(tmp_path / "plake")
    events = str(tmp_path / "pevents")
    run_cli(spark, capsys, "create", "--root", lake, "--buckets", "2")
    out = run_cli(
        spark, capsys, "properties", "--root", lake,
        "--set", "constraints.not_null=content", "--set", "owner=ops",
    )
    assert out["properties"]["constraints.not_null"] == "content"
    st = run_cli(spark, capsys, "status", "--root", lake)
    assert st["properties"]["owner"] == "ops"
    out = run_cli(
        spark, capsys, "properties", "--root", lake, "--unset", "owner",
    )
    assert "owner" not in out["properties"]
    # the constraint now gates the merge verb
    run_cli(
        spark, capsys, "generate", "--out", events,
        "--n-keys", "10", "--events-per-key", "1", "--files", "1",
    )
    import pyspark.sql.functions as F

    bad_dir = str(tmp_path / "bad_events")
    spark.read.parquet(events).withColumn(
        "content", F.lit(None).cast("string")
    ).write.parquet(bad_dir)
    from encode_ingest_spark.lake import ConstraintViolationError

    with pytest.raises(ConstraintViolationError):
        main(
            ["merge", "--root", lake, "--batch", bad_dir, "--batch-id", "1"],
            spark=spark,
        )
    assert run_cli(spark, capsys, "status", "--root", lake)["version"] == 2


def test_cli_clone_shallow(spark, capsys, tmp_path):
    lake = str(tmp_path / "clake")
    events = str(tmp_path / "cevents")
    run_cli(spark, capsys, "create", "--root", lake, "--buckets", "2")
    run_cli(
        spark, capsys, "generate", "--out", events,
        "--n-keys", "20", "--events-per-key", "1", "--files", "1",
    )
    run_cli(
        spark, capsys, "merge", "--root", lake, "--batch", events,
        "--batch-id", "1",
    )
    dest = str(tmp_path / "clake_fork")
    out = run_cli(spark, capsys, "clone", "--root", lake, "--dest", dest)
    assert out["mode"] == "shallow" and out["files"] > 0
    src_rows = LakeTable.load(spark, lake).read().count()
    assert LakeTable.load(spark, dest).read().count() == src_rows
