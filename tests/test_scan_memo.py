"""The suite's memoized parquet scan (_scan) is metadata caching only:
same on-disk state → same resolved plan; ANY rewrite of the path (new
file set or new bytes) must invalidate, and executions always read the
current files for the resolved plan."""
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from encode_ingest_spark.suite import _SCAN_MEMO, _path_sig, _scan  # noqa: E402


def _write(spark, path, rows, schema="k int, v string"):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_scan_memo_hit_and_rewrite_invalidation(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    _write(spark, p, [(1, "a"), (2, "b")])
    df1 = _scan(spark, p)
    df2 = _scan(spark, p)
    assert df1 is df2, "unchanged path must hit the memo"
    assert sorted(r.k for r in df1.collect()) == [1, 2]

    # rewrite with different rows AND a different schema: the stat
    # signature changes, so the next _scan must resolve fresh
    time.sleep(0.01)  # ensure mtime_ns differs even on coarse clocks
    _write(spark, p, [(7, "z", 1.5)], "k int, v string, w double")
    df3 = _scan(spark, p)
    assert df3 is not df1
    assert [f.name for f in df3.schema.fields] == ["k", "v", "w"]
    assert [r.k for r in df3.collect()] == [7]


def test_scan_memo_distinct_paths_distinct_plans(spark, tmp_path):
    pa, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    _write(spark, pa, [(1, "a")])
    _write(spark, pb, [(2, "b")])
    da, db = _scan(spark, pa), _scan(spark, pb)
    assert da is not db
    # the two memoized scans must join cleanly (distinct plan ids)
    assert da.join(db, da.k < db.k).count() == 1


def test_path_sig_missing_path_skips_memo(spark, tmp_path):
    missing = str(tmp_path / "nope.parquet")
    assert _path_sig(missing) is None
    with pytest.raises(Exception):
        _scan(spark, missing).collect()
    assert all(k[1] != missing for k in _SCAN_MEMO)
