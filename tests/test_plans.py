"""Plan-shape invariants: pushdown, pruning, broadcast, shuffle counts.

These tests pin the *physical* properties the 100 TB story depends on —
if a refactor silently turns a broadcast join into a shuffle join or
stops a filter reaching the parquet scan, they fail.
"""

import pytest
from pyspark.sql import functions as F

from encode_ingest_spark.cdc import dedupe_latest
from encode_ingest_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    count_shuffles,
)
from encode_ingest_spark.plans.explain import pushed_filters, read_schema_columns

SF = "/root/testdata/sf0.01"


def test_filter_pushdown_to_parquet(spark):
    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    assert_pushed_filters(df, ["o_orderstatus"])


def test_column_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .filter(F.col("l_quantity") > 10)
    )
    cols = read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}, cols


def test_small_dim_join_is_broadcast(spark):
    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
    assert_broadcast_join(j)
    assert_no_cartesian(j)


def test_overlap_join_is_broadcast_not_cartesian(spark):
    from encode_ingest_spark.operators import broadcast_overlap_join

    left = spark.createDataFrame([(1, ["a", "b"])], "id int, xs array<string>")
    right = spark.createDataFrame([("g", ["b"])], "g string, ys array<string>")
    j = broadcast_overlap_join(left, right, "xs", "ys")
    assert_broadcast_join(j)
    assert_no_cartesian(j)


def test_dedupe_latest_is_single_shuffle_map_side_collapse(spark):
    """A7 must be ONE Exchange with a MAP-SIDE collapse (each task
    reduces its local events per key before the shuffle) in both
    physical forms: primitive payloads hash-aggregate via max_by
    (partial agg); string payloads take the rank-limit window, whose
    Spark-4 WindowGroupLimit performs the same pre-shuffle top-1 per key
    (Partial mode below the exchange) without SortAggregate's second
    full sort."""
    from encode_ingest_spark.plans import plan_string

    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = dedupe_latest(ev, ["user_id", "event_type"], "event_id")
    assert count_shuffles(out) == 1
    plan = plan_string(out, "simple")
    # string payload (props) routes to the rank-limit window form with
    # the map-side group-limit present
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert "SortAggregate" not in plan
    # primitive-only payload keeps the partial-agg max_by HashAggregate
    slim = dedupe_latest(
        ev.select("user_id", "event_type", "event_id", "value"),
        ["user_id", "event_type"],
        "event_id",
    )
    slim_plan = plan_string(slim, "simple")
    assert count_shuffles(slim) == 1
    assert "HashAggregate" in slim_plan and "partial_max_by" in slim_plan
    assert "Window" not in slim_plan


def test_merge_batch_pruning_reads_only_touched_buckets(spark, tmp_path):
    """The MERGE read path must scan only files of touched buckets."""
    from pyspark.sql import types as T

    from encode_ingest_spark.lake import LakeTable

    schema = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("commit", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("content", T.StringType()),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, ["repo", "path", "commit"], num_buckets=8)
    rows = [("o/r", f"p{i}", "c" * 40, "py", f"v{i}") for i in range(64)]
    t.overwrite(spark.createDataFrame(rows, schema))
    m = t.current_manifest()
    all_buckets = {f.bucket for f in m.files}
    some = sorted(all_buckets)[:2]
    pruned = t.read(buckets=some)
    full = t.read()
    np, nf = len(pruned.inputFiles()), len(full.inputFiles())
    assert 0 < np < nf, (np, nf)
    assert np == sum(1 for f in m.files if f.bucket in set(some))


def test_q6_filters_all_pushed(spark):
    """TPC-H Q6 shape: every conjunct must reach the parquet scan."""
    from encode_ingest_spark.suite import QUERIES

    df = QUERIES["q6_forecast_revenue"](spark, SF)
    assert_pushed_filters(df, ["l_shipdate", "l_discount", "l_quantity"])


def test_dirty_group_isin_filter_is_pushed_to_scan(spark, tmp_path):
    """The incremental refresh's dirty-repo predicate must reach the
    parquet reader (row-group / dictionary pruning) — the plan property
    the `write.sort_within_buckets` clustering pays off through."""
    from pyspark.sql import types as T

    from encode_ingest_spark.cdc import repo_file_events
    from encode_ingest_spark.lake import LakeTable, merge_into

    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in
         ["repo", "path", "commit", "lang", "content"]]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema,
                         ["repo", "path", "commit"], num_buckets=4)
    merge_into(t, repo_file_events(spark, n_keys=100, events_per_key=1, seed=3),
               batch_id=1)
    df = t.read().filter(F.col("repo").isin(["org0/repo0", "org1/repo1"]))
    assert_pushed_filters(df, ["repo"])


def test_universe_restrict_scan_pushes_ids_and_prunes_files(spark, tmp_path):
    """The entity-universe restriction path's plan properties: the
    dirty-id isin predicate reaches the parquet reader (PushedFilters),
    and the @id key-column file pruning shrinks the scanned file set
    (universe tables cluster on @id)."""
    from encode_ingest_spark.entities.universe import (
        _pruned_read,
        create_universe,
    )
    from encode_ingest_spark.lake import merge_into

    universe = create_universe(spark, str(tmp_path / "u"), num_buckets=2)
    t = universe["donors"]
    # two batches with disjoint, sorted id ranges -> per-file tight
    # @id col_stats (batch 2 appends winner files beside survivors)
    rows_a = [{"@id": f"/human-donors/A{i:03d}/",
               "organism": "/organisms/human/"} for i in range(40)]
    rows_z = [{"@id": f"/human-donors/Z{i:03d}/",
               "organism": "/organisms/human/"} for i in range(40)]
    from pyspark.sql import types as T

    from encode_ingest_spark.entities.universe import UNIVERSE_SCHEMAS

    sch = T._parse_datatype_string(UNIVERSE_SCHEMAS["donors"])

    def batch(rows, seq0):
        return (spark.createDataFrame(rows, sch)
                .withColumn("op", F.lit("insert"))
                .withColumn("event_seq", F.lit(seq0)))

    merge_into(t, batch(rows_a, 1), batch_id=1)
    merge_into(t, batch(rows_z, 2), batch_id=2, stage_batch=True,
               merge_strategy="broadcast")

    dirty = spark.createDataFrame(
        [("/human-donors/Z001/",), ("/human-donors/Z002/",)],
        "_raw string",
    )
    df = _pruned_read(t, None, "@id", dirty, lambda: t.read())
    # isin reached the parquet reader
    assert_pushed_filters(df, ["@id"])
    # @id file pruning: only the Z-range files are opened
    assert 0 < len(df.inputFiles()) < len(t.read().inputFiles())
    assert {r["@id"] for r in df.collect()} == {
        "/human-donors/Z001/", "/human-donors/Z002/"
    }


def test_universe_build_dims_stay_broadcast(spark):
    """The universe builds keep tiny ontology dims on the broadcast
    side (no shuffle for the J1/J5 dim joins) — the plan property the
    restrict design relies on (restricted driving side streams, dims
    broadcast in full)."""
    from pyspark.sql import types as T

    from encode_ingest_spark.entities.universe import (
        TREE_SPECS,
        UNIVERSE_SCHEMAS,
    )

    empty = {
        name: spark.createDataFrame([], T._parse_datatype_string(ddl))
        for name, ddl in UNIVERSE_SCHEMAS.items()
    }
    from encode_ingest_spark.plans import plan_string

    df = TREE_SPECS["referencefileset"].build(spark, empty)
    plan = plan_string(df, "formatted")
    assert "BroadcastExchange" in plan  # the organisms dim
    assert "CartesianProduct" not in plan
