"""Table constraints + timestamp time travel + ALTER TBLPROPERTIES.

Pins:
* ``constraints.not_null`` / ``constraints.check.<name>`` refuse a
  violating batch BEFORE anything lands (table state untouched), on
  both the distributed merge and the driver-local delta path; delete
  tombstones are exempt (nulled payloads are content, not corruption);
  a violating row superseded in-batch by a clean one passes (winners
  are validated, not raw events); NULL check results pass (SQL rule).
* ``set_properties`` is a metadata-only commit (ALTER TABLE SET/UNSET
  TBLPROPERTIES): old snapshots keep old properties, files untouched.
* ``version_as_of`` / ``read(as_of=...)`` — Delta ``timestampAsOf``
  resolution: latest snapshot committed at or before ts; refuses a ts
  older than retained history; accepts epoch / datetime / ISO string;
  DataSource option ``timestampAsOf`` matches.
"""

import datetime as dt
import time

import pytest
from pyspark.sql import types as T

from encode_ingest_spark.lake import (
    ConstraintViolationError,
    LakeTable,
    merge_into,
    merge_local_delta,
)
from encode_ingest_spark.lake.table import BUCKET_COL, bucket_expr

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("x", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)

BATCH_DDL = "id string, x string, n long, op string, event_seq long"


def _table(spark, tmp_path, name, props=None):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, ["id"], num_buckets=4,
        properties=props or {},
    )


def _merge(spark, t, rows, batch_id, **kw):
    batch = spark.createDataFrame(rows, BATCH_DDL)
    return merge_into(t, batch, batch_id=batch_id, **kw)


CONSTRAINED = {
    "constraints.not_null": "x",
    "constraints.check.n_pos": "n > 0",
}


# ---------------------------------------------------------------- merge

@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_violating_batch_refused_state_untouched(spark, tmp_path, mode):
    t = _table(spark, tmp_path, f"c_{mode}", CONSTRAINED)
    _merge(spark, t, [("a", "ax", 1, "insert", 1)], 1, mode=mode)
    v = t.current_version()
    with pytest.raises(ConstraintViolationError, match="check:n_pos"):
        _merge(spark, t, [("b", "bx", -5, "insert", 2)], 2, mode=mode)
    with pytest.raises(ConstraintViolationError, match="not_null:x"):
        _merge(spark, t, [("c", None, 3, "insert", 3)], 3, mode=mode)
    assert t.current_version() == v
    assert {r["id"] for r in t.read().collect()} == {"a"}


def test_delete_tombstones_exempt(spark, tmp_path):
    t = _table(spark, tmp_path, "c_del", CONSTRAINED)
    _merge(spark, t, [("a", "ax", 1, "insert", 1)], 1)
    # a delete's payload is nulled by normalize_batch — must not trip
    # not_null:x or check:n_pos
    _merge(spark, t, [("a", None, None, "delete", 2)], 2)
    assert t.read().count() == 0


def test_superseded_violation_passes(spark, tmp_path):
    t = _table(spark, tmp_path, "c_super", CONSTRAINED)
    # same key twice in one batch: the bad row loses the in-batch
    # max_by dedup, so the batch is clean as-landed
    _merge(
        spark, t,
        [("a", None, -1, "insert", 1), ("a", "ax", 5, "insert", 2)],
        1,
    )
    row = t.read().collect()[0]
    assert (row["x"], row["n"]) == ("ax", 5)


def test_null_check_result_passes(spark, tmp_path):
    t = _table(spark, tmp_path, "c_null", CONSTRAINED)
    # n is NULL → check expr NULL → passes (SQL CHECK rule); x non-null
    _merge(spark, t, [("a", "ax", None, "insert", 1)], 1)
    assert t.read().count() == 1


def test_unconstrained_table_unaffected(spark, tmp_path):
    t = _table(spark, tmp_path, "c_none")
    _merge(spark, t, [("a", None, -1, "insert", 1)], 1)
    assert t.read().count() == 1


# ---------------------------------------------------- driver-local path

def _local_rows(spark, t, rows):
    """Build table-shaped local rows with the table's own bucket expr
    (the merge_local_delta contract)."""
    df = spark.createDataFrame(
        [(i, x, n, s, d) for (i, x, n, s, d) in rows],
        "id string, x string, n long, _seq long, _deleted boolean",
    ).withColumn(BUCKET_COL, bucket_expr(["id"], 4))
    return [r.asDict() for r in df.collect()]


def test_local_delta_enforces_not_null_and_check(spark, tmp_path):
    t = _table(spark, tmp_path, "c_local", CONSTRAINED)
    v = t.current_version()
    with pytest.raises(ConstraintViolationError, match="not_null:x"):
        merge_local_delta(
            t, _local_rows(spark, t, [("a", None, 1, 1, False)]), batch_id=1
        )
    with pytest.raises(ConstraintViolationError, match="check:n_pos"):
        merge_local_delta(
            t, _local_rows(spark, t, [("a", "ax", -2, 1, False)]), batch_id=1
        )
    assert t.current_version() == v
    assert t.orphan_files() == []  # refusal stages nothing
    # clean batch + exempt tombstone land fine
    merge_local_delta(
        t,
        _local_rows(
            spark, t, [("a", "ax", 2, 1, False), ("b", None, None, 1, True)]
        ),
        batch_id=1,
    )
    assert {r["id"] for r in t.read().collect()} == {"a"}


# ------------------------------------------------------- set_properties

def test_set_properties_metadata_only_commit(spark, tmp_path):
    t = _table(spark, tmp_path, "props")
    _merge(spark, t, [("a", "ax", 1, "insert", 1)], 1)
    v = t.current_version()
    files_before = [f.path for f in t.current_manifest().files]
    t.set_properties({"constraints.check.n_pos": "n > 0", "owner": "me"})
    assert t.current_version() == v + 1
    m = t.current_manifest()
    assert m.properties["owner"] == "me"
    assert [f.path for f in m.files] == files_before
    # old snapshot keeps old properties
    assert "owner" not in t.manifest_at(v).properties
    # UNSET via None; no-op set commits nothing
    t.set_properties({"owner": None})
    assert "owner" not in t.current_manifest().properties
    v2 = t.current_version()
    t.set_properties({})
    assert t.current_version() == v2
    # the newly-added constraint now enforces
    with pytest.raises(ConstraintViolationError):
        _merge(spark, t, [("b", "bx", -1, "insert", 2)], 2)


# ---------------------------------------------------------- time travel

def test_read_as_of_resolves_commit_times(spark, tmp_path):
    t = _table(spark, tmp_path, "tt")
    _merge(spark, t, [("a", "a1", 1, "insert", 1)], 1)
    ts1 = t.current_manifest().committed_at
    time.sleep(0.05)
    _merge(spark, t, [("a", "a2", 2, "insert", 2)], 2)
    ts2 = t.current_manifest().committed_at
    assert t.version_as_of(ts1) < t.version_as_of(ts2)
    # exactly-at, between, and future timestamps
    assert t.read(as_of=ts1).collect()[0]["x"] == "a1"
    assert t.read(as_of=(ts1 + ts2) / 2).collect()[0]["x"] == "a1"
    assert t.read(as_of=time.time() + 3600).collect()[0]["x"] == "a2"
    # datetime + ISO-string forms resolve identically (midpoint ts so
    # fromtimestamp's microsecond truncation can't flip the answer)
    mid = (ts1 + ts2) / 2
    as_dt = dt.datetime.fromtimestamp(mid, dt.timezone.utc)
    assert t.version_as_of(as_dt) == t.version_as_of(mid)
    assert t.version_as_of(as_dt.isoformat()) == t.version_as_of(mid)
    # predating all retained history refuses (silent newer-state answer
    # would be wrong)
    with pytest.raises(ValueError, match="no snapshot"):
        t.read(as_of=ts1 - 1000)
    # mutually exclusive with version/tag
    with pytest.raises(ValueError, match="at most one"):
        t.read(version=1, as_of=ts1)


def test_datasource_timestamp_as_of(spark, tmp_path):
    from encode_ingest_spark.lake.datasource import register_lake_sources

    register_lake_sources(spark)
    t = _table(spark, tmp_path, "tt_ds")
    _merge(spark, t, [("a", "a1", 1, "insert", 1)], 1)
    ts1 = t.current_manifest().committed_at
    time.sleep(0.05)
    _merge(spark, t, [("a", "a2", 2, "insert", 2)], 2)
    got = (
        spark.read.format("lake")
        .option("timestampAsOf", repr(ts1))
        .load(t.root)
        .collect()
    )
    assert [r["x"] for r in got] == ["a1"]
    with pytest.raises(Exception, match="at most one"):
        spark.read.format("lake").option("timestampAsOf", repr(ts1)).option(
            "version", 1
        ).load(t.root).collect()


def test_small_batch_falls_back_on_spark_only_check(spark, tmp_path):
    """A CHECK expr only Spark can evaluate must not fail the trickle
    path: merge_small_batch re-routes to the distributed merge, which
    enforces the same constraint Spark-side."""
    from encode_ingest_spark.lake import merge_small_batch

    t = _table(
        spark, tmp_path, "c_fb",
        {"constraints.check.hashed": "xxhash64(x) IS NOT NULL OR x IS NULL"},
    )
    rows = [("a", "ax", 1, "insert", 1)]
    res = merge_small_batch(
        t, spark.createDataFrame(rows, BATCH_DDL), batch_id=1
    )
    assert not res.skipped
    assert {r["id"] for r in t.read().collect()} == {"a"}
    # direct merge_local_delta callers still get the actionable error
    from encode_ingest_spark.lake.merge import LocalPathUnsupportedError

    lr = _local_rows(spark, t, [("b", "bx", 2, 2, False)])
    with pytest.raises(LocalPathUnsupportedError, match="use merge_into"):
        merge_local_delta(t, lr, batch_id=2)


def test_native_sink_enforces_constraints(spark, tmp_path):
    """df.writeStream.format('lake') refuses a violating epoch — same
    contract as the merge paths; a clean epoch lands."""
    from encode_ingest_spark.lake import register_lake_sources

    register_lake_sources(spark)
    t = _table(spark, tmp_path, "c_sink", CONSTRAINED)
    src_dir = str(tmp_path / "sink_src")
    ck = str(tmp_path / "sink_ck")

    def run_epoch(rows):
        spark.createDataFrame(rows, BATCH_DDL).write.mode(
            "overwrite"
        ).parquet(src_dir)
        q = (
            spark.readStream.schema(BATCH_DDL.replace(", ", ",")).parquet(src_dir)
            .writeStream.format("lake")
            .option("path", t.root)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_epoch([("a", "ax", 1, "insert", 1)])
    assert {r["id"] for r in t.read().collect()} == {"a"}
    with pytest.raises(Exception, match="violates"):
        run_epoch([("b", None, 2, "insert", 2)])
    assert {r["id"] for r in t.read().collect()} == {"a"}
    assert t.orphan_files() == []  # refusal staged nothing


def test_version_before_boundary(spark, tmp_path):
    """version_before: strictly-before resolution (the change-feed
    start bound) vs version_as_of's at-or-before."""
    t = _table(spark, tmp_path, "vb")
    _merge(spark, t, [("a", "a1", 1, "insert", 1)], 1)
    ts1 = t.current_manifest().committed_at
    v1 = t.current_version()
    assert t.version_as_of(ts1) == v1
    assert t.version_before(ts1) == v1 - 1
    with pytest.raises(ValueError, match="committed before"):
        t.version_before(0.0)


def test_lookup_as_of(spark, tmp_path):
    t = _table(spark, tmp_path, "lk")
    _merge(spark, t, [("a", "old", 1, "insert", 1)], 1)
    ts1 = t.current_manifest().committed_at
    time.sleep(0.05)
    _merge(spark, t, [("a", "new", 2, "upsert", 2)], 2)
    assert t.lookup({"id": "a"})["x"] == "new"
    assert t.lookup({"id": "a"}, as_of=ts1)["x"] == "old"
    with pytest.raises(ValueError, match="not both"):
        t.lookup({"id": "a"}, version=1, as_of=ts1)
