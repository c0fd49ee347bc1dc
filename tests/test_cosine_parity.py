"""r6 optimization pin: the Arrow cosine_topk scorer (mapInPandas,
dimension-sequential numpy fold) must be bit-identical to the JVM
expression twin it replaced — including null/ragged/zero-norm vectors
and the over-cap fallback."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from encode_ingest_spark.operators.similarity import (  # noqa: E402
    _COSINE_QUERY_CAP,
    cosine_topk,
    cosine_topk_jvm,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in df.collect()
    )


import pytest  # noqa: E402


@pytest.fixture()
def arrow_impl(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_COSINE_IMPL", "arrow")


def test_cosine_topk_arrow_matches_jvm_corpus(spark, arrow_impl):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 8)
    assert _rows(cosine_topk(e, q, k=5)) == _rows(cosine_topk_jvm(e, q, k=5))


def test_cosine_topk_arrow_edge_vectors(spark, arrow_impl):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (4, None),             # null vector
        (5, [1.0, 0.0]),       # ragged
        (6, [-1.0, 0.5, 0.25]),
        (7, [0.5, 0.5, 0.5]),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = e.filter(F.col("vec_id").isin(1, 4))
    a = _rows(cosine_topk(e, q, k=3))
    j = _rows(cosine_topk_jvm(e, q, k=3))
    assert a == j


def test_cosine_topk_arrow_zero_norm(spark, arrow_impl):
    """Zero-norm vectors: the ANSI-mode JVM twin raises DIVIDE_BY_ZERO;
    the Arrow kernel maps the 0/0 pair to a NULL cosine — the same
    contract as a null vector — so it ranks after every finite cosine."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.5, 0.5]),
        (3, [0.0, 0.0]),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = e.filter(F.col("vec_id") == 1)
    out = {r["neighbor_id"]: (r["rank"], r["cos"]) for r in
           cosine_topk(e, q, k=2).collect()}
    assert out[2][0] == 1 and out[3] == (2, None)


def test_cosine_topk_overcap_falls_back(spark, monkeypatch, arrow_impl):
    import encode_ingest_spark.operators.similarity as sim

    monkeypatch.setattr(sim, "_COSINE_QUERY_CAP", 2)
    e = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    out = cosine_topk(e, e, k=2)
    plan = out._jdf.queryExecution().toString()
    assert "MapInPandas" not in plan  # fell back to the JVM join
    assert _rows(out) == _rows(cosine_topk_jvm(e, e, k=2))
    assert _COSINE_QUERY_CAP > 2  # module default untouched
