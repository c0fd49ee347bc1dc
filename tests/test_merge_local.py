"""Driver-local MOR delta commits (merge_local_delta): equivalence with
the distributed merge, fence semantics, and the per-commit compaction
bucket cap.

merge_local_delta is the small-commit fast path of the incremental
entity-universe refresh (entities/universe.py): a change-set-sized batch
is collected once and lands as pyarrow-written delta files with zero
further Spark work, under the SAME exactly-once fence, lineage, stats,
and auto-compaction contracts as merge_into(mode="mor").
"""

import os
import time
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from encode_ingest_spark.lake import LakeTable, merge_into
from encode_ingest_spark.lake.merge import (
    merge_local_delta,
    normalize_batch,
)
from encode_ingest_spark.lake.table import BUCKET_COL, bucket_expr

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("xs", T.ArrayType(T.StringType()), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def _mk_table(spark, tmp_path, name):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, ["id"], num_buckets=4
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "id string, label string, xs array<string>, n long, "
        "op string, event_seq long"
    )


@contextmanager
def _driver_tz(name):
    """Run the body with the process timezone set to ``name``, restoring
    (and re-tzset-ing) the original on exit — the restore must be exact
    or a mutated TZ leaks into every later test in the process."""
    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = name
    time.tzset()
    try:
        yield
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()


def _local_rows(table, batch):
    """Collect a batch the way entities/universe.py's fused wave does:
    normalized to table shape with the table's own bucket_expr."""
    m = table.current_manifest()
    prepared = normalize_batch(batch, m.schema, m.key_cols).withColumn(
        BUCKET_COL, bucket_expr(m.key_cols, m.num_buckets)
    )
    return [r.asDict(recursive=True) for r in prepared.collect()]


B1 = [
    ("a", "one", ["x", "y"], 1, "upsert", 10),
    ("b", "two", None, 2, "upsert", 10),
    ("c", "three", ["z"], 3, "upsert", 10),
    ("d", "four", [], 4, "upsert", 10),
]
B2 = [
    ("a", "one-v2", ["x"], 11, "upsert", 20),
    ("b", None, None, None, "delete", 20),
    ("e", "five", ["w"], 5, "upsert", 20),
]


def test_local_delta_matches_distributed_merge(spark, tmp_path):
    t_dist = _mk_table(spark, tmp_path, "dist")
    t_loc = _mk_table(spark, tmp_path, "loc")
    for t in (t_dist, t_loc):
        merge_into(t, _batch(spark, B1), batch_id=1)

    b2 = _batch(spark, B2)
    merge_into(t_dist, b2, batch_id=2, mode="mor", batch_unique=True)
    res = merge_local_delta(t_loc, _local_rows(t_loc, b2), batch_id=2)
    assert not res.skipped
    assert res.counts["appended"] == 3
    assert any(f.is_delta for f in t_loc.current_manifest().files)

    cols = ["id", "label", "xs", "n"]
    got = sorted(
        tuple(str(v) for v in r)
        for r in t_loc.read().select(*cols).collect()
    )
    want = sorted(
        tuple(str(v) for v in r)
        for r in t_dist.read().select(*cols).collect()
    )
    assert got == want
    # tombstone applied: b gone, a superseded, e inserted
    ids = {r.id for r in t_loc.read().select("id").collect()}
    assert ids == {"a", "c", "d", "e"}


def test_local_delta_exactly_once_fence(spark, tmp_path):
    t = _mk_table(spark, tmp_path, "fence")
    merge_into(t, _batch(spark, B1), batch_id=1)
    rows = _local_rows(t, _batch(spark, B2))
    r1 = merge_local_delta(t, rows, batch_id=2)
    assert not r1.skipped
    v = t.current_version()
    r2 = merge_local_delta(t, rows, batch_id=2)
    assert r2.skipped
    assert t.current_version() == v


def test_local_delta_manifest_stats_prune(spark, tmp_path):
    """Local delta files carry the same footer-derived manifest stats as
    Spark-written ones: seq bounds + tombstone flag."""
    t = _mk_table(spark, tmp_path, "stats")
    merge_into(t, _batch(spark, B1), batch_id=1)
    merge_local_delta(t, _local_rows(t, _batch(spark, B2)), batch_id=2)
    deltas = [f for f in t.current_manifest().files if f.is_delta]
    assert deltas
    for f in deltas:
        assert f.stats is not None
        assert f.stats["min_seq"] == 20
        assert f.stats["max_seq"] == 20
    assert any(f.stats["has_tombstones"] for f in deltas)


def test_mor_compact_max_buckets_caps_per_commit(spark, tmp_path):
    """The per-commit compaction cap folds only the worst buckets;
    remaining over-threshold buckets compact on later commits — the
    anti-storm amortization for fleets appending on one cadence."""
    t = LakeTable.create(
        spark, str(tmp_path / "cap"), SCHEMA, ["id"], num_buckets=4,
        properties={
            "mor.compact.threshold": "2",
            "mor.compact.max_buckets": "1",
        },
    )
    ids = [f"k{i}" for i in range(16)]  # spread across all 4 buckets
    merge_into(
        t,
        _batch(spark, [(i, "v0", None, 0, "upsert", 1) for i in ids]),
        batch_id=1,
    )

    def deltas_per_bucket():
        per = {}
        for f in t.current_manifest().files:
            if f.is_delta:
                per[f.bucket] = per.get(f.bucket, 0) + 1
        return per

    compacted = []
    for e in range(2, 7):
        res = merge_into(
            t,
            _batch(
                spark,
                [(i, f"v{e}", None, e, "upsert", e * 10) for i in ids],
            ),
            batch_id=e,
            mode="mor",
            batch_unique=True,
        )
        if "compacted_buckets" in res.counts:
            # the cap holds per commit
            assert res.counts["compacted_buckets"] <= 1
            compacted.append(res.counts["compacted_buckets"])
        # and read cost stays bounded: a deferred bucket grows one
        # delta per commit while waiting, so the worst chain is
        # threshold + num_buckets/cap appends
        assert max(deltas_per_bucket().values(), default=0) <= 6
    assert compacted, "compaction never triggered"
    # correctness is never traded: final state is the last upsert set
    rows = {r.id: r.label for r in t.read().collect()}
    assert rows == {i: "v6" for i in ids}


# ---------------------------------------------------------------------------
# merge_small_batch: the plan-side small-commit wrapper (trickle streams)
# ---------------------------------------------------------------------------
def _read_sorted(t):
    return [
        tuple(r)
        for r in t.read().orderBy("id").select("id", "label", "xs", "n").collect()
    ]


def test_small_batch_matches_distributed_merge(spark, tmp_path):
    """In-batch duplicate keys, deletes, and upserts land identically to
    merge_into — the winners plan is shared, only the commit differs."""
    from encode_ingest_spark.lake.merge import merge_small_batch

    t_dist = _mk_table(spark, tmp_path, "sb_dist")
    t_loc = _mk_table(spark, tmp_path, "sb_loc")
    for t in (t_dist, t_loc):
        merge_into(t, _batch(spark, B1), batch_id=1)
    dup = B2 + [
        ("a", "one-stale", ["stale"], 99, "upsert", 15),  # loses to seq 20
        ("f", "six", None, 6, "upsert", 21),
    ]
    merge_into(t_dist, _batch(spark, dup), batch_id=2, mode="mor")
    res = merge_small_batch(t_loc, _batch(spark, dup), batch_id=2)
    assert not res.skipped
    assert any(f.is_delta for f in t_loc.current_manifest().files)
    assert _read_sorted(t_loc) == _read_sorted(t_dist)
    # fence: a replay is a manifest-only no-op
    res2 = merge_small_batch(t_loc, _batch(spark, dup), batch_id=2)
    assert res2.skipped


def test_small_batch_over_cap_falls_back_to_distributed(spark, tmp_path):
    from encode_ingest_spark.lake.merge import merge_small_batch

    t = _mk_table(spark, tmp_path, "sb_cap")
    merge_into(t, _batch(spark, B1), batch_id=1)
    res = merge_small_batch(t, _batch(spark, B2), batch_id=2, local_cap=2)
    assert not res.skipped
    t_ref = _mk_table(spark, tmp_path, "sb_cap_ref")
    merge_into(t_ref, _batch(spark, B1), batch_id=1)
    merge_into(t_ref, _batch(spark, B2), batch_id=2, mode="mor")
    assert _read_sorted(t) == _read_sorted(t_ref)


def test_small_batch_evolves_schema(spark, tmp_path):
    """A batch carrying a new column triggers the same ALTER-then-MERGE
    evolution as merge_into before the local commit."""
    from encode_ingest_spark.lake.merge import merge_small_batch

    t = _mk_table(spark, tmp_path, "sb_evo")
    merge_into(t, _batch(spark, B1), batch_id=1)
    wide = spark.createDataFrame(
        [("a", "one-v2", None, 11, "fresh", "upsert", 20)],
        "id string, label string, xs array<string>, n long, extra string, "
        "op string, event_seq long",
    )
    res = merge_small_batch(t, wide, batch_id=2)
    assert not res.skipped
    got = t.read().filter(F.col("id") == "a").select("extra").collect()
    assert got[0][0] == "fresh"


def test_local_delta_timestamps_survive_non_utc_driver(spark, tmp_path):
    """Spark's collect() yields naive datetimes in the DRIVER's OS
    timezone; the pyarrow write must attach that zone before landing
    them under timestamp[us, tz=UTC], or every local commit on a
    non-UTC driver shifts the instant by the UTC offset vs the
    distributed path."""
    import datetime as dt

    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "tz"), schema, ["id"], num_buckets=2
    )
    m = t.current_manifest()

    with _driver_tz("America/New_York"):
        # the instant 2020-07-01T12:00:00Z collected on an EDT driver
        # arrives as naive 08:00 local — exactly what collect() hands
        # the batch-plan path. No Spark work happens while TZ is off.
        naive_local = dt.datetime(2020, 7, 1, 8, 0, 0)
        rows = [
            {
                "id": "a",
                "ts": naive_local,
                "_seq": 1,
                "_deleted": False,
                BUCKET_COL: 0,
            }
        ]
        merge_local_delta(t, rows, batch_id=1)

    got = (
        t.read()
        .select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("s"))
        .collect()[0]["s"]
    )
    assert got == "2020-07-01 12:00:00", got
    assert m is not None


def test_local_delta_nested_timestamps_survive_non_utc_driver(spark, tmp_path):
    """The UTC re-expression must recurse: timestamps inside arrays and
    structs take the same wall-clock path through pa.array."""
    import datetime as dt

    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("tss", T.ArrayType(T.TimestampType()), True),
            T.StructField(
                "meta",
                T.StructType([T.StructField("at", T.TimestampType(), True)]),
                True,
            ),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "tznest"), schema, ["id"], num_buckets=2
    )

    with _driver_tz("America/New_York"):
        naive_local = dt.datetime(2020, 7, 1, 8, 0, 0)  # 12:00Z in EDT
        rows = [
            {
                "id": "a",
                "tss": [naive_local],
                "meta": {"at": naive_local},
                "_seq": 1,
                "_deleted": False,
                BUCKET_COL: 0,
            }
        ]
        merge_local_delta(t, rows, batch_id=1)

    r = (
        t.read()
        .select(
            F.date_format(F.element_at("tss", 1), "yyyy-MM-dd HH:mm:ss").alias("a"),
            F.date_format("meta.at", "yyyy-MM-dd HH:mm:ss").alias("b"),
        )
        .collect()[0]
    )
    assert r["a"] == "2020-07-01 12:00:00", r
    assert r["b"] == "2020-07-01 12:00:00", r


def test_local_delta_map_timestamps_survive_non_utc_driver(spark, tmp_path):
    """Timestamps inside MAP values — top-level and nested in a struct —
    take the same wall-clock path through pa.array (verified: pyarrow
    stores the naive wall clock under timestamp[us, tz=UTC] for nested
    maps too), so the UTC re-expression must cover MapType at any depth."""
    import datetime as dt

    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField(
                "m", T.MapType(T.StringType(), T.TimestampType()), True
            ),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField(
                            "mm",
                            T.MapType(T.StringType(), T.TimestampType()),
                            True,
                        )
                    ]
                ),
                True,
            ),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "tzmap"), schema, ["id"], num_buckets=2
    )

    with _driver_tz("America/New_York"):
        naive_local = dt.datetime(2020, 7, 1, 8, 0, 0)  # 12:00Z in EDT
        rows = [
            {
                "id": "a",
                "m": {"k": naive_local},
                "meta": {"mm": {"k": naive_local}},
                "_seq": 1,
                "_deleted": False,
                BUCKET_COL: 0,
            }
        ]
        merge_local_delta(t, rows, batch_id=1)

    r = (
        t.read()
        .select(
            F.date_format(
                F.element_at("m", F.lit("k")), "yyyy-MM-dd HH:mm:ss"
            ).alias("a"),
            F.date_format(
                F.element_at("meta.mm", F.lit("k")), "yyyy-MM-dd HH:mm:ss"
            ).alias("b"),
        )
        .collect()[0]
    )
    assert r["a"] == "2020-07-01 12:00:00", r
    assert r["b"] == "2020-07-01 12:00:00", r


def test_local_delta_rejects_unknown_row_keys(spark, tmp_path):
    """A row key outside the table schema must raise, not silently drop:
    the pyarrow column loop reads r.get(name), and this path never
    auto-evolves, so a typo'd or not-yet-evolved column would vanish."""
    t = _mk_table(spark, tmp_path, "unknownkeys")
    with pytest.raises(ValueError, match="not in table schema"):
        merge_local_delta(
            t,
            [
                {
                    "id": "a",
                    "label": "x",
                    "labell": "typo",
                    "_seq": 1,
                    "_deleted": False,
                    BUCKET_COL: 0,
                }
            ],
            batch_id=1,
        )


def test_local_delta_accepts_positional_struct_values(spark, tmp_path):
    """pa.array accepts tuples for struct columns, so the UTC
    re-expression must too — a tuple-shaped struct value from an
    external caller must not crash on a missing .asDict and must get
    the same wall-clock correction as the dict form."""
    import datetime as dt

    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField(
                "meta",
                T.StructType([T.StructField("at", T.TimestampType(), True)]),
                True,
            ),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "tztuple"), schema, ["id"], num_buckets=2
    )

    with _driver_tz("America/New_York"):
        naive_local = dt.datetime(2020, 7, 1, 8, 0, 0)  # 12:00Z in EDT
        rows = [
            {
                "id": "a",
                "meta": (naive_local,),
                "_seq": 1,
                "_deleted": False,
                BUCKET_COL: 0,
            }
        ]
        merge_local_delta(t, rows, batch_id=1)

    got = (
        t.read()
        .select(F.date_format("meta.at", "yyyy-MM-dd HH:mm:ss").alias("s"))
        .collect()[0]["s"]
    )
    assert got == "2020-07-01 12:00:00", got
