"""Predicate DML (lake/dml.py): DELETE WHERE / UPDATE WHERE SET.

Pins: tombstone semantics + resurrection safety under late events, ANSI
old-row UPDATE semantics (swap test), validation, the empty-match
no-commit guard, the exactly-once statement fence, COW/MOR parity, and
the physical-erasure contract (delete → compact → expire leaves no live
file containing the deleted content).
"""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from encode_ingest_spark.lake import LakeTable, delete_where, merge_into, update_where

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("x", T.StringType(), True),
        T.StructField("y", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def _mk(spark, tmp_path, name, rows):
    t = LakeTable.create(spark, str(tmp_path / name), SCHEMA, ["id"], num_buckets=4)
    batch = spark.createDataFrame(
        [(*r, "insert", 1) for r in rows],
        "id string, x string, y string, n long, op string, event_seq long",
    )
    merge_into(t, batch, batch_id=1)
    return t


ROWS = [
    ("a", "ax", "ay", 1),
    ("b", "bx", "by", 2),
    ("c", "cx", "cy", 3),
    ("d", "dx", "dy", 4),
    ("e", "ex", "ey", 5),
]


def test_delete_where_tombstones_matching_rows(spark, tmp_path):
    t = _mk(spark, tmp_path, "del", ROWS)
    v0 = t.current_version()
    res = delete_where(t, "n >= 4")
    assert res.rows_matched == 2
    assert res.merge is not None and not res.merge.skipped
    assert t.current_version() > v0
    live = {r["id"] for r in t.read().collect()}
    assert live == {"a", "b", "c"}
    dead = {
        r["id"]
        for r in t.read(include_tombstones=True, include_internal=True)
        .filter("_deleted")
        .collect()
    }
    assert dead == {"d", "e"}


def test_delete_where_no_match_is_no_commit(spark, tmp_path):
    t = _mk(spark, tmp_path, "nomatch", ROWS)
    v0 = t.current_version()
    res = delete_where(t, F.col("n") > 100)
    assert res.rows_matched == 0
    assert res.merge is None and res.version is None
    assert t.current_version() == v0


def test_late_lower_seq_event_cannot_resurrect_dml_delete(spark, tmp_path):
    t = _mk(spark, tmp_path, "resurrect", ROWS)
    delete_where(t, "id = 'a'")
    # replay of the original insert (seq 1 < tombstone's seq 2) loses
    late = spark.createDataFrame(
        [("a", "ax", "ay", 1, "update", 1)],
        "id string, x string, y string, n long, op string, event_seq long",
    )
    merge_into(t, late, batch_id=None)
    assert t.read().filter("id = 'a'").count() == 0
    # a genuinely newer event (higher seq) supersedes the tombstone
    fresh = spark.createDataFrame(
        [("a", "ax2", "ay2", 10, "update", 99)],
        "id string, x string, y string, n long, op string, event_seq long",
    )
    merge_into(t, fresh, batch_id=None)
    row = t.read().filter("id = 'a'").collect()
    assert len(row) == 1 and row[0]["x"] == "ax2"


def test_update_where_old_row_semantics_and_carryover(spark, tmp_path):
    t = _mk(spark, tmp_path, "swap", ROWS)
    res = update_where(t, "n <= 2", {"x": "y", "y": "x", "n": F.col("n") + 100})
    assert res.rows_matched == 2
    got = {r["id"]: (r["x"], r["y"], r["n"]) for r in t.read().collect()}
    # RHS evaluated against the OLD row: x/y swap cleanly
    assert got["a"] == ("ay", "ax", 101)
    assert got["b"] == ("by", "bx", 102)
    # unmatched rows untouched; unassigned columns carried
    assert got["c"] == ("cx", "cy", 3)


def test_update_where_validations(spark, tmp_path):
    t = _mk(spark, tmp_path, "valid", ROWS)
    with pytest.raises(ValueError, match="key column"):
        update_where(t, "n = 1", {"id": "'z'"})
    with pytest.raises(ValueError, match="unknown column"):
        update_where(t, "n = 1", {"nope": "'z'"})
    with pytest.raises(ValueError, match="at least one"):
        update_where(t, "n = 1", {})


def test_dml_statement_fence_is_exactly_once(spark, tmp_path):
    t = _mk(spark, tmp_path, "fence", ROWS)
    r1 = update_where(t, "id = 'a'", {"n": "n + 1"}, source_id="job7", batch_id=7)
    assert not r1.merge.skipped
    # an orchestrator retry of the same statement id matches rows (the
    # predicate still holds) but the merge fence refuses the re-land
    r2 = update_where(t, "id = 'a'", {"n": "n + 1"}, source_id="job7", batch_id=7)
    assert r2.merge is not None and r2.merge.skipped
    assert t.read().filter("id = 'a'").collect()[0]["n"] == 2


def test_update_where_cow_matches_mor(spark, tmp_path):
    t_mor = _mk(spark, tmp_path, "mor", ROWS)
    t_cow = _mk(spark, tmp_path, "cow", ROWS)
    update_where(t_mor, "n % 2 = 1", {"x": "upper(x)"}, mode="mor")
    update_where(t_cow, "n % 2 = 1", {"x": "upper(x)"}, mode="cow")
    a = sorted(tuple(r) for r in t_mor.read().collect())
    b = sorted(tuple(r) for r in t_cow.read().collect())
    assert a == b


def test_cli_delete_and_update_verbs(spark, tmp_path, capsys):
    import json

    from encode_ingest_spark.__main__ import main

    t = _mk(spark, tmp_path, "cli", ROWS)

    def run(*argv):
        assert main(list(argv), spark=spark) == 0
        lines = [
            l for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")
        ]
        return json.loads(lines[-1])

    out = run(
        "update", "--root", t.root, "--where", "n <= 2",
        "--set", "x=upper(x)", "--set", "n=n + 10",
    )
    assert out["rows_matched"] == 2 and not out["skipped"]
    got = {r["id"]: (r["x"], r["n"]) for r in t.read().collect()}
    assert got["a"] == ("AX", 11) and got["b"] == ("BX", 12)

    out = run("delete", "--root", t.root, "--where", "n > 10")
    assert out["rows_matched"] == 2
    assert {r["id"] for r in t.read().collect()} == {"c", "d", "e"}

    # fenced retry of the same statement id
    out = run(
        "delete", "--root", t.root, "--where", "id = 'c'",
        "--source-id", "job1", "--batch-id", "3",
    )
    assert out["rows_matched"] == 1 and not out["skipped"]
    out = run(
        "delete", "--root", t.root, "--where", "id = 'd'",
        "--source-id", "job1", "--batch-id", "3",
    )
    assert out["skipped"] and t.read().filter("id = 'd'").count() == 1


def test_delete_then_maintain_erases_content(spark, tmp_path):
    secret = "SECRET-PAYLOAD-c1b2a3"
    t = _mk(
        spark,
        tmp_path,
        "gdpr",
        ROWS + [("z", secret, secret, 999)],
    )
    res = delete_where(t, F.col("x") == secret)
    assert res.rows_matched == 1
    # tombstone lands immediately with NULL payload...
    ts = (
        t.read(include_tombstones=True, include_internal=True)
        .filter("id = 'z'")
        .collect()
    )
    assert len(ts) == 1 and ts[0]["_deleted"] and ts[0]["x"] is None
    # ...and the compact-then-expire cycle physically removes the bytes
    t.compact_deltas()
    t.expire_snapshots(keep_last=1)
    for dirpath, _dirs, files in os.walk(t.root):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            tbl = pq.read_table(os.path.join(dirpath, fn))
            blob = str(tbl.to_pydict())
            assert secret not in blob, f"deleted content survives in {fn}"
    # the tombstone itself is retained (resurrection guard)
    assert t.read().filter("id = 'z'").count() == 0
    assert (
        t.read(include_tombstones=True).filter("id = 'z'").count() == 1
    )


# ---------------------------------------------------------------------------
# merge_apply — SQL MERGE INTO semantics
# ---------------------------------------------------------------------------

def _src(spark, rows):
    return spark.createDataFrame(rows, "id string, x string, y string, n long")


def test_merge_apply_upsert_and_insert(spark, tmp_path):
    from encode_ingest_spark.lake import merge_apply

    t = _mk(spark, tmp_path, "ma_upsert", ROWS)
    res = merge_apply(
        t,
        _src(spark, [("a", "AX", "AY", 100), ("f", "fx", "fy", 6)]),
        when_matched="update",
        when_not_matched="insert",
    )
    assert res.counts == {"inserted": 1, "updated": 1, "deleted": 0}
    got = {r["id"]: (r["x"], r["n"]) for r in t.read().collect()}
    assert got["a"] == ("AX", 100)       # matched: source overwrote
    assert got["f"] == ("fx", 6)         # not matched: inserted
    assert got["b"] == ("bx", 2)         # untouched


def test_merge_apply_clause_order_and_conditions(spark, tmp_path):
    from encode_ingest_spark.lake import merge_apply

    t = _mk(spark, tmp_path, "ma_clauses", ROWS)
    # first holding clause wins: n<=2 rows delete, the rest update one col
    res = merge_apply(
        t,
        _src(spark, [("a", "_", "_", 0), ("c", "CX", "_", 0), ("zz", "z", "z", 9)]),
        when_matched=[
            ("target.n <= 2", "delete"),
            (None, {"x": "source.x"}),
        ],
        when_not_matched=("source.n > 5", "insert"),
    )
    assert res.counts == {"inserted": 1, "updated": 1, "deleted": 1}
    got = {r["id"]: (r["x"], r["y"], r["n"]) for r in t.read().collect()}
    assert "a" not in got                     # clause 1: deleted
    assert got["c"] == ("CX", "cy", 3)        # clause 2: x assigned, y/n carry
    assert got["zz"] == ("z", "z", 9)         # conditional insert held
    # an unmatched-source row whose insert condition fails is a no-op
    res2 = merge_apply(
        t,
        _src(spark, [("yy", "y", "y", 1)]),
        when_matched="update",
        when_not_matched=("source.n > 5", "insert"),
    )
    assert res2.merge is None and res2.counts["inserted"] == 0


def test_merge_apply_insert_resurrects_tombstoned_key(spark, tmp_path):
    from encode_ingest_spark.lake import merge_apply

    t = _mk(spark, tmp_path, "ma_resurrect", ROWS)
    delete_where(t, "id = 'b'")
    assert t.read().filter("id = 'b'").count() == 0
    # SQL sees no row for b -> NOT matched -> insert, and the minted seq
    # must supersede the tombstone
    res = merge_apply(
        t,
        _src(spark, [("b", "b2", "b2", 22)]),
        when_matched="update",
        when_not_matched="insert",
    )
    assert res.counts["inserted"] == 1
    row = t.read().filter("id = 'b'").collect()
    assert len(row) == 1 and row[0]["x"] == "b2" and row[0]["n"] == 22


def test_merge_apply_not_matched_by_source_sync(spark, tmp_path):
    from encode_ingest_spark.lake import merge_apply

    # the reference's staged-dataset sync: upsert staged rows, soft-delete
    # live rows missing from staging
    t = _mk(spark, tmp_path, "ma_sync", ROWS)
    staged = _src(spark, [("a", "a2", "ay", 1), ("b", "bx", "by", 2)])
    res = merge_apply(
        t,
        staged,
        when_matched="update",
        when_not_matched="insert",
        when_not_matched_by_source="delete",
    )
    assert res.counts == {"inserted": 0, "updated": 2, "deleted": 3}
    assert {r["id"] for r in t.read().collect()} == {"a", "b"}
    dead = {
        r["id"]
        for r in t.read(include_tombstones=True, include_internal=True)
        .filter("_deleted").collect()
    }
    assert dead == {"c", "d", "e"}
    # conditional by-source UPDATE variant (flag instead of delete)
    t2 = _mk(spark, tmp_path, "ma_sync2", ROWS)
    res2 = merge_apply(
        t2,
        _src(spark, [("a", "ax", "ay", 1)]),
        when_not_matched_by_source=[("n >= 4", {"y": "'stale'"})],
    )
    assert res2.counts == {"inserted": 0, "updated": 2, "deleted": 0}
    got = {r["id"]: r["y"] for r in t2.read().collect()}
    assert got["d"] == "stale" and got["e"] == "stale" and got["b"] == "by"


def test_merge_apply_cardinality_violation(spark, tmp_path):
    from encode_ingest_spark.lake import merge_apply

    t = _mk(spark, tmp_path, "ma_card", ROWS)
    dup = _src(spark, [("a", "1", "1", 1), ("a", "2", "2", 2)])
    with pytest.raises(ValueError, match="multiple rows"):
        merge_apply(t, dup, when_matched="update")
    # opt-out lands an arbitrary-but-atomic winner (CDC replay-tie rule)
    res = merge_apply(t, dup, when_matched="update", check_cardinality=False)
    assert res.counts["updated"] == 2  # both rows routed; LWW resolves at read
    assert t.read().filter("id = 'a'").count() == 1


def test_merge_apply_validations_and_fence(spark, tmp_path):
    from encode_ingest_spark.lake import merge_apply

    t = _mk(spark, tmp_path, "ma_valid", ROWS)
    with pytest.raises(ValueError, match="at least one WHEN"):
        merge_apply(t, _src(spark, []))
    with pytest.raises(ValueError, match="key column"):
        merge_apply(t, _src(spark, []), when_matched={"id": "'z'"})
    with pytest.raises(ValueError, match="unknown column"):
        merge_apply(t, _src(spark, []), when_matched={"nope": "1"})
    with pytest.raises(ValueError, match="lacks key"):
        merge_apply(
            t, spark.createDataFrame([("q",)], "q string"), when_matched="update"
        )
    with pytest.raises(ValueError, match="not in"):
        merge_apply(t, _src(spark, []), when_not_matched="delete")
    # exactly-once statement fence
    s = _src(spark, [("a", "A1", "A1", 11)])
    r1 = merge_apply(t, s, when_matched="update", source_id="j", batch_id=5)
    assert not r1.merge.skipped
    r2 = merge_apply(
        t, _src(spark, [("a", "A2", "A2", 12)]),
        when_matched="update", source_id="j", batch_id=5,
    )
    assert r2.merge is not None and r2.merge.skipped
    assert t.read().filter("id = 'a'").collect()[0]["x"] == "A1"


def test_merge_apply_delete_only_statements(spark, tmp_path):
    """All-delete statements compile every payload column to NULL — the
    CASE seeds must stay typed or schema evolution sees void columns."""
    from encode_ingest_spark.lake import merge_apply

    t = _mk(spark, tmp_path, "ma_delonly", ROWS)
    res = merge_apply(
        t, _src(spark, [("a", "_", "_", 0), ("zz", "_", "_", 0)]),
        when_matched="delete",
    )
    assert res.counts == {"inserted": 0, "updated": 0, "deleted": 1}
    assert t.read().filter("id = 'a'").count() == 0
    # prune-only statement: by-source delete with no other clause
    t2 = _mk(spark, tmp_path, "ma_prune", ROWS)
    res = merge_apply(
        t2, _src(spark, [("a", "ax", "ay", 1)]),
        when_not_matched_by_source="delete",
    )
    assert res.counts["deleted"] == 4
    assert {r["id"] for r in t2.read().collect()} == {"a"}


def test_merge_apply_fence_precheck_and_zero_counts(spark, tmp_path):
    """A retried statement skips BEFORE the merge compute and reports
    zero counts (nothing landed)."""
    from encode_ingest_spark.lake import merge_apply

    t = _mk(spark, tmp_path, "ma_fence0", ROWS)
    r1 = merge_apply(
        t, _src(spark, [("a", "A", "A", 1)]),
        when_matched="update", source_id="s", batch_id=3,
    )
    assert r1.counts["updated"] == 1 and not r1.merge.skipped
    calls = {"n": 0}
    orig = t.read
    t.read = lambda *a, **k: calls.__setitem__("n", calls["n"] + 1) or orig(*a, **k)
    try:
        r2 = merge_apply(
            t, _src(spark, [("b", "B", "B", 2)]),
            when_matched="update", source_id="s", batch_id=3,
        )
    finally:
        del t.read
    assert r2.merge.skipped and r2.counts == {
        "inserted": 0, "updated": 0, "deleted": 0,
    }
    assert calls["n"] == 0  # no target scan, no join, no compute
    # stale CAS skip is also free and zero-counted
    r3 = merge_apply(
        t, _src(spark, [("b", "B", "B", 2)]),
        when_matched="update", source_id="s", expected_watermark=999,
    )
    assert r3.merge.skipped and r3.merge.stale
    assert r3.counts == {"inserted": 0, "updated": 0, "deleted": 0}


def test_merge_apply_clause_shape_errors(spark, tmp_path):
    from encode_ingest_spark.lake import merge_apply

    t = _mk(spark, tmp_path, "ma_shape", ROWS)
    # a list holding one bare action is a natural call — normalize it
    res = merge_apply(
        t, _src(spark, [("a", "A9", "A9", 9)]), when_matched=["update"],
    )
    assert res.counts["updated"] == 1
    # a two-key dict is one ASSIGNMENT clause, not a (cond, action) pair
    res = merge_apply(
        t, _src(spark, [("b", "_", "_", 0)]),
        when_matched=[{"x": "'X1'", "y": "'Y1'"}],
    )
    assert res.counts["updated"] == 1
    row = t.read().filter("id = 'b'").collect()[0]
    assert (row["x"], row["y"]) == ("X1", "Y1")
    with pytest.raises(ValueError, match="condition, action"):
        merge_apply(t, _src(spark, []), when_matched=[("a", "update", "x")])


def test_merge_apply_schema_evolution(spark, tmp_path):
    from encode_ingest_spark.lake import merge_apply

    t = _mk(spark, tmp_path, "ma_evolve", ROWS)
    src = spark.createDataFrame(
        [("a", "A2", 7), ("f", "F1", 8)], "id string, x string, stars long"
    )
    # off by default: extra source columns are ignored, assigning raises
    with pytest.raises(ValueError, match="evolve_schema"):
        merge_apply(t, src, when_matched={"stars": "source.stars"})
    res = merge_apply(t, src, when_matched="update", when_not_matched="insert")
    assert "stars" not in t.read().columns
    assert res.counts == {"inserted": 1, "updated": 1, "deleted": 0}

    # on: update/insert write the new column, untouched rows read null
    t2 = _mk(spark, tmp_path, "ma_evolve2", ROWS)
    res = merge_apply(
        t2, src, when_matched="update", when_not_matched="insert",
        evolve_schema=True,
    )
    assert res.counts == {"inserted": 1, "updated": 1, "deleted": 0}
    got = {r["id"]: (r["x"], r["stars"]) for r in t2.read().collect()}
    assert got["a"] == ("A2", 7) and got["f"] == ("F1", 8)
    assert got["b"][1] is None  # untouched row reads null
    # assignment dicts may target the evolving column; unassigned
    # branches (incl. by-source) leave it null
    src2 = spark.createDataFrame(
        [("b", "B", 1)], "id string, x string, stars long"
    )
    res = merge_apply(
        t2, src2,
        when_matched={"stars": "source.stars * 10"},
        when_not_matched_by_source=[("id = 'c'", {"y": "'flagged'"})],
        evolve_schema=True,
    )
    assert res.counts["updated"] == 2
    got = {r["id"]: (r["y"], r["stars"]) for r in t2.read().collect()}
    assert got["b"][1] == 10
    assert got["c"] == ("flagged", None)
    assert got["a"][1] == 7  # prior epoch's value untouched


def test_merge_apply_cow_matches_mor_and_pushdown_cap(spark, tmp_path):
    from encode_ingest_spark.lake import dml
    from encode_ingest_spark.lake import merge_apply

    t_mor = _mk(spark, tmp_path, "ma_mor", ROWS)
    t_cow = _mk(spark, tmp_path, "ma_cow", ROWS)
    s = [("a", "Z", "Z", 0), ("q", "Q", "Q", 9)]
    merge_apply(t_mor, _src(spark, s), when_matched="update",
                when_not_matched="insert", mode="mor")
    merge_apply(t_cow, _src(spark, s), when_matched="update",
                when_not_matched="insert", mode="cow")
    a = sorted(tuple(r) for r in t_mor.read().collect())
    b = sorted(tuple(r) for r in t_cow.read().collect())
    assert a == b
    # over-cap source takes the un-pruned join path, same result
    t2 = _mk(spark, tmp_path, "ma_cap", ROWS)
    old = dml.MERGE_PUSHDOWN_CAP
    dml.MERGE_PUSHDOWN_CAP = 1
    try:
        res = merge_apply(t2, _src(spark, s), when_matched="update",
                          when_not_matched="insert")
    finally:
        dml.MERGE_PUSHDOWN_CAP = old
    assert res.counts == {"inserted": 1, "updated": 1, "deleted": 0}
    got = {r["id"]: r["x"] for r in t2.read().collect()}
    assert got["a"] == "Z" and got["q"] == "Q"


def test_dml_loses_seq_tie_to_real_cdc_event(spark, tmp_path):
    """ADVICE r5: DML mints event_seq = current+1; with a DENSE upstream
    sequence the next real event for that key carries the same seq. In
    MOR mode both are delta rows — the DML row must deterministically
    LOSE that tie (manifest origin flag), so the legitimate update is
    never shadowed."""
    t = _mk(spark, tmp_path, "tie", ROWS)  # every row at seq 1
    # DML delete mints seq = 2 for 'a' as a MOR delta
    res = delete_where(t, "id = 'a'", mode="mor", batch_id=10)
    assert res.rows_matched == 1
    # the real CDC stream's next event for 'a' also carries seq 2
    late = spark.createDataFrame(
        [("a", "ax2", "ay2", 11, "update", 2)],
        "id string, x string, y string, n long, op string, event_seq long",
    )
    merge_into(t, late, batch_id=11, mode="mor")
    live = {r["id"]: r["x"] for r in t.read().collect()}
    assert live.get("a") == "ax2"  # real update wins the tie, not the delete
    # and the flag round-trips through the manifest
    assert any(f.dml for f in t.current_manifest().files)
    # native reader agrees with LakeTable.read
    from encode_ingest_spark.lake.datasource import register_lake_sources

    register_lake_sources(spark)
    nat = (
        spark.read.format("lake").load(t.root)
        .filter(F.col("id") == "a").collect()
    )
    assert len(nat) == 1 and nat[0]["x"] == "ax2"
