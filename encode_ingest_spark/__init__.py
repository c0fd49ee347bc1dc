"""encode_ingest_spark — a PySpark-native CDC / incremental-ingest engine.

Built from scratch (not a port) with the query and data-processing
capabilities of DataBiosphere/encode-ingest (reference, read-only, at
/root/reference). The reference is a Scio/Beam batch ETL whose third stage
diffs staged rows against live table state and applies soft-delete + append
with an idempotency contract (reference:
orchestration/templates/ingest-processed-data.yaml:10-11,86-172). This
engine generalizes that into a streaming CDC pipeline: change-event tail →
per-key dedup → MERGE into a snapshot-versioned lake table with
exactly-once, checkpoint-fenced commits, schema evolution, and lineage.

Subpackages
-----------
lake        snapshot-versioned parquet table format (manifest, atomic commit,
            partition-pruned copy-on-write MERGE, tombstones, time travel)
cdc         change-event generator, per-key dedup, batch/streaming pipeline
operators   join/aggregate/dedup/similarity/text operator library
functions   scalar column-expression library (reference §2.8 parity)
entities    per-entity mapping transforms (reference §2.10 parity)
streaming   structured-streaming tail + foreachBatch apply
plans       plan-inspection helpers (pushdown / broadcast assertions)
"""

__version__ = "0.1.0"
