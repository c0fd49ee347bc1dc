"""Z-order clustering rewrite (lake/cluster.py).

Pins:
* ``rewrite_clustered(strategy="zorder")`` is correctness-neutral
  (exact same rows before/after, tombstones preserved) while making
  files prunable on EVERY constituent dimension — a point predicate on
  either z-column prunes most files via ``file_value_ranges``, where
  the lexicographic sort only prunes on its leading column.
* The clustering properties persist: a merge AFTER the rewrite writes
  z-sorted files with per-constituent col_stats (no re-sampling job).
* ``strategy="sort"`` round-trips to the plain property form.
* The driver-local delta path sorts by the Python z-value twin.
* Bucket-subset rewrite only touches the named buckets.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from encode_ingest_spark.lake import (
    LakeTable,
    merge_into,
    rewrite_clustered,
)
from encode_ingest_spark.lake.cluster import (
    load_boundaries,
    parse_cluster_spec,
    zorder_value,
    zorder_value_py,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("x", T.LongType(), True),
        T.StructField("y", T.LongType(), True),
    ]
)

N = 4000


def _mk(spark, tmp_path, name):
    """One bucket (isolate file-level pruning from bucket routing),
    x and y independent (x row-ordered, y anti-correlated) so a
    lexicographic sort on x leaves y spread across every file."""
    t = LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, ["id"], num_buckets=1
    )
    df = (
        spark.range(N)
        .select(
            F.col("id"),
            (F.col("id") / 40).cast("long").alias("x"),
            ((N - 1 - F.col("id")) / 40).cast("long").alias("y"),
            F.lit("insert").alias("op"),
            F.lit(1).alias("event_seq"),
        )
    )
    merge_into(t, df, batch_id=1)
    return t


def _files_scanned(t, col, val):
    kept = t.read(file_value_ranges={col: [val]})
    return len(kept.inputFiles())


def test_zorder_rewrite_identity_and_two_dim_pruning(spark, tmp_path):
    t = _mk(spark, tmp_path, "z1")
    before = sorted(
        (r["id"], r["x"], r["y"]) for r in t.read().collect()
    )
    # split the single bucket into many files so file pruning has grain:
    # land 8 more single-key MOR batches then compact? Simpler: rewrite
    # with a small maxRecordsPerFile so the sorted write splits.
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "500")
    try:
        m = rewrite_clustered(t, ["x", "y"], strategy="zorder", bits=4)
    finally:
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    assert len(m.files) >= 6  # the split actually happened
    after = sorted((r["id"], r["x"], r["y"]) for r in t.read().collect())
    assert after == before  # layout-only
    cols, is_z = parse_cluster_spec(m.properties)
    assert (cols, is_z) == (["x", "y"], True)
    bnd, bits = load_boundaries(m.properties)
    assert set(bnd) == {"x", "y"} and bits == 4

    n_files = len(m.files)
    sx = _files_scanned(t, "x", 3)
    sy = _files_scanned(t, "y", 3)
    # both dimensions prune most files — the z-order property
    assert sx < n_files / 2, (sx, n_files)
    assert sy < n_files / 2, (sy, n_files)


def test_lexicographic_sort_only_prunes_leading_column(spark, tmp_path):
    t = _mk(spark, tmp_path, "lex")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "500")
    try:
        m = rewrite_clustered(t, ["x", "y"], strategy="sort")
    finally:
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    cols, is_z = parse_cluster_spec(m.properties)
    assert (cols, is_z) == (["x", "y"], False)
    n_files = len(m.files)
    assert n_files >= 6
    assert _files_scanned(t, "x", 3) < n_files / 2
    # y is anti-correlated with x: within-x-run y is constant-ish,
    # but across files every y range repeats → little pruning
    assert _files_scanned(t, "y", 3) >= _files_scanned(t, "x", 3)


def test_merge_after_rewrite_stays_clustered(spark, tmp_path):
    t = _mk(spark, tmp_path, "z2")
    rewrite_clustered(t, ["x", "y"], strategy="zorder", bits=4)
    v = t.current_version()
    upd = spark.createDataFrame(
        [(9_000 + i, i % 5, i % 7, "insert", 2) for i in range(200)],
        "id long, x long, y long, op string, event_seq long",
    )
    merge_into(t, upd, batch_id=2)
    m = t.current_manifest()
    assert m.version > v
    # new files carry col_stats on BOTH constituent columns (the stage
    # write parsed the zorder spec without a boundary re-sampling job)
    new_files = [f for f in m.files if f.stats and f.stats.get("col_stats")]
    assert new_files
    for f in new_files:
        assert set(f.stats["col_stats"]) >= {"x", "y"}


def test_zorder_value_py_matches_spark_expr(spark, tmp_path):
    bnd = {"x": [10, 20, 30], "y": [5, 15, 25]}
    rows = [(1, 0, 0), (2, 10, 5), (3, 25, 30), (4, 99, 99), (5, None, 12)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r["id"]: r["z"]
        for r in df.select(
            "id", zorder_value(["x", "y"], bnd, 2).alias("z")
        ).collect()
    }
    for (i, x, y) in rows:
        want = zorder_value_py({"x": x, "y": y}.get, ["x", "y"], bnd, 2)
        assert got[i] == want, (i, got[i], want)


def test_bucket_subset_rewrite_touches_only_named_buckets(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "sub"), SCHEMA, ["id"], num_buckets=4
    )
    df = spark.range(400).select(
        "id",
        (F.col("id") % 10).alias("x"),
        (F.col("id") % 7).alias("y"),
        F.lit("insert").alias("op"),
        F.lit(1).alias("event_seq"),
    )
    merge_into(t, df, batch_id=1)
    m0 = t.current_manifest()
    keep = {f.path for f in m0.files if f.bucket != 0}
    m1 = rewrite_clustered(t, ["x"], strategy="zorder", buckets=[0])
    assert {f.path for f in m1.files if f.bucket != 0} == keep
    assert {f.path for f in m1.files if f.bucket == 0} != {
        f.path for f in m0.files if f.bucket == 0
    }
    # bad column refuses
    with pytest.raises(ValueError, match="not in table schema"):
        rewrite_clustered(t, ["nope"])


def test_zorder_date_boundaries_roundtrip_typed(spark, tmp_path):
    """ADVICE r5: boundaries froze via json default=str, so date/ts/
    decimal boundaries reloaded as STRINGS — zorder_value_py hit
    TypeError comparing str to date and degraded every row to rank 0.
    Typed freeze must round-trip real types and rank correctly."""
    import datetime as dt

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("d", T.DateType(), True),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "dt"), schema, ["id"], num_buckets=1
    )
    df = spark.range(400).select(
        F.col("id"),
        F.date_add(F.lit("2020-01-01").cast("date"), F.col("id").cast("int")).alias("d"),
        F.lit("insert").alias("op"),
        F.lit(1).alias("event_seq"),
    )
    merge_into(t, df, batch_id=1)
    rewrite_clustered(t, ["d"], strategy="zorder", bits=2)
    bnd, bits = load_boundaries(t.current_manifest().properties)
    assert bnd["d"] and all(isinstance(b, dt.date) for b in bnd["d"])
    # the Python twin must produce nonzero ranks for late dates
    z_hi = zorder_value_py(
        lambda c: dt.date(2020, 12, 31), ["d"], bnd, bits
    )
    z_lo = zorder_value_py(lambda c: dt.date(2020, 1, 1), ["d"], bnd, bits)
    assert z_hi > z_lo >= 0
