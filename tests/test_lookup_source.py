"""S2 — batched async keyed lookup: batching cap, missing-key nulls,
error propagation, per-task client (ExtractionPipelineBuilder.scala:
44-45,360-367; EncodeClient.scala:32-90 semantics). Client factories are
defined INSIDE the tests so cloudpickle ships them by value (a
module-level def pickles by reference and the Python workers cannot
import the tests package)."""

import pytest

from encode_ingest_spark.sources import async_lookup


def test_async_lookup_batches_and_missing_keys(spark):
    def stub_factory():
        def lookup(keys):
            n = len(keys)
            return {
                k: (None if k.endswith("7") else f"resp:{k}:batch={n}")
                for k in keys
            }
        return lookup

    df = spark.createDataFrame(
        [(f"key{i}",) for i in range(200)], "k string"
    ).repartition(2)
    out = async_lookup(df, "k", stub_factory, batch_size=64).collect()
    by_key = {r.k: r.response for r in out}
    assert len(by_key) == 200
    # 404 semantics: missing keys are null, present keys resolved
    assert by_key["key7"] is None and by_key["key17"] is None
    assert by_key["key3"].startswith("resp:key3")
    # batching cap honored: no lookup saw more than batch_size keys
    sizes = {int(v.rsplit("=", 1)[1]) for v in by_key.values() if v}
    assert max(sizes) <= 64
    assert len(sizes) > 1  # really chunked, not one giant call


def test_async_lookup_error_propagates(spark):
    def failing_factory():
        def lookup(keys):
            raise RuntimeError("HTTP 500 from upstream")
        return lookup

    df = spark.createDataFrame([("a",), ("b",)], "k string")
    with pytest.raises(Exception, match="HTTP 500"):
        async_lookup(df, "k", failing_factory).collect()
