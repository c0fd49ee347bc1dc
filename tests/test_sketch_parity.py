"""r6 optimization pin: the Arrow sketch kernels (mapInPandas; native md5
+ vectorized permutations) must be bit-identical to the pure-JVM
expression twins they replaced on the hot path — including the
empty/short/null-text edges the kernels special-case."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from encode_ingest_spark.operators import (  # noqa: E402
    minhash_signatures,
    minhash_signatures_jvm,
    simhash_signatures,
    simhash_signatures_jvm,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")

EDGE_DOCS = [
    (1, "three word shingle plus some more words for a normal doc"),
    (2, "two words"),
    (3, "one"),
    (4, ""),
    (5, "   "),
    (6, None),
    (7, "punct!!! only??? ###"),
    (8, "!!!"),
    (9, "MiXeD Case And   multiple\t\twhitespace\n\nkinds"),
    (10, "dup dup dup dup dup"),
]


def _sig_map(df):
    return {r["doc_id"]: r["sig"] for r in df.collect()}


def test_minhash_arrow_matches_jvm_corpus(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert _sig_map(minhash_signatures(d, "doc_id", "text")) == _sig_map(
        minhash_signatures_jvm(d, "doc_id", "text")
    )


def test_simhash_arrow_matches_jvm_corpus(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert _sig_map(simhash_signatures(d, "doc_id", "text")) == _sig_map(
        simhash_signatures_jvm(d, "doc_id", "text")
    )


def test_sketch_parity_edge_docs(spark):
    d = spark.createDataFrame(EDGE_DOCS, "doc_id long, text string")
    assert _sig_map(minhash_signatures(d, "doc_id", "text")) == _sig_map(
        minhash_signatures_jvm(d, "doc_id", "text")
    )
    assert _sig_map(simhash_signatures(d, "doc_id", "text")) == _sig_map(
        simhash_signatures_jvm(d, "doc_id", "text")
    )


def test_sketch_parity_string_ids(spark):
    """Ids keep their input type (regression: the kernels once declared
    ``doc_id long`` and string-keyed corpora crashed in Arrow casts)."""
    d = spark.createDataFrame(
        [(f"doc-{i}", t) for i, t in EDGE_DOCS], "doc_id string, text string"
    )
    mh = minhash_signatures(d, "doc_id", "text")
    assert dict(mh.dtypes)["doc_id"] == "string"
    assert _sig_map(mh) == _sig_map(minhash_signatures_jvm(d, "doc_id", "text"))
    assert _sig_map(simhash_signatures(d, "doc_id", "text")) == _sig_map(
        simhash_signatures_jvm(d, "doc_id", "text")
    )


def test_jvm_impl_selectable(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SKETCH_IMPL", "jvm")
    d = spark.createDataFrame(EDGE_DOCS[:3], "doc_id long, text string")
    # env-selected JVM path must not route through mapInPandas
    plan = minhash_signatures(d, "doc_id", "text")._jdf.queryExecution().toString()
    assert "mapInPandas" not in plan and "MapInPandas" not in plan
