"""S2 — batched async keyed lookup against a remote API.

The reference crawls the ENCODE REST API with a ScalaAsyncLookupDoFn:
keys are batched 64 per query (ExtractionPipelineBuilder.scala:44-45,
399-406), at most 8 requests in flight per worker (:360-367), 404 → an
empty result, non-2xx → pipeline failure (EncodeClient.scala:32-90).

Spark-first shape: ``mapInPandas`` — each task receives Arrow batches,
chunks the keys into ``batch_size`` groups, and drives them through a
bounded thread pool of ``max_concurrency`` in-flight lookups (the same
per-worker cap as the reference; across the cluster total concurrency =
tasks × cap, throttled by limiting tasks, exactly like Dataflow
workers). The client is constructed ONCE PER TASK via a zero-arg
factory — the per-worker client lifecycle of the reference — and must be
pickle-self-contained (no live sockets captured).

No HTTP service exists in this sandbox, so tests drive the operator with
a deterministic stub client; the Spark-side plumbing — batching, bounded
concurrency, per-task client, missing-key (404) nulls, error
propagation — is real and pinned.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose)

#: lookup(batch_of_keys) -> {key: response_string_or_None}
LookupFn = Callable[[list], dict]


def async_lookup(
    df: DataFrame,
    key_col: str,
    client_factory: Callable[[], LookupFn],
    out_col: str = "response",
    batch_size: int = 64,
    max_concurrency: int = 8,
) -> DataFrame:
    """Append ``out_col`` (string, null when the key is missing — the
    404→empty rule) by looking keys up through the client in bounded
    concurrent batches. Client exceptions propagate and fail the task
    (the non-2xx→fail rule)."""
    from pyspark.sql import types as T

    # NB: DataFrame.schema is CACHED and StructType.add mutates in place —
    # build a fresh StructType or df.columns itself grows the new column
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.StringType(), True)]
    )

    def kernel(batches):
        from concurrent.futures import ThreadPoolExecutor

        client = client_factory()  # one client per task (per-worker)
        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            for pdf in batches:
                keys = pdf[key_col].tolist()
                chunks = [
                    keys[i : i + batch_size] for i in range(0, len(keys), batch_size)
                ]
                merged: dict = {}
                for result in pool.map(client, chunks):
                    merged.update(result)
                pdf = pdf.copy()
                pdf[out_col] = [merged.get(k) for k in keys]
                yield pdf

    return df.mapInPandas(kernel, out_schema)
