"""Custom stateful streaming operator: cross-batch change-log compaction.

``applyInPandasWithState`` (SURVEY.md §2.9) maintaining, per CDC key, the
highest ``event_seq`` ever seen across micro-batches. Events at or below
the stored watermark are dropped *before* they reach the MERGE — a
streaming pre-filter that shrinks MERGE input under replay/duplication
(at 10^10 events, re-deliveries and out-of-order tails stop costing
bucket rewrites).

Correctness note: this is an OPTIMIZATION stage, not the correctness
mechanism — the MERGE's per-key max_by and the manifest fence stay
authoritative (a cold-started state store simply passes more events
through). That layering keeps the state store crash-disposable: it lives
in the Spark checkpoint and needs no coordination with the table.

The state kernel is closure-self-contained (no module globals) so
cloudpickle ships it by value to Python workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def compact_changelog(
    events: DataFrame,
    keys: list[str],
    seq_col: str = "event_seq",
) -> DataFrame:
    """Stateful filter: keep only events strictly newer than everything
    previously seen for their key (plus the in-batch winners).

    Works on a streaming DataFrame grouped by the CDC key. Output schema
    == input schema. State: one long per key.
    """
    out_schema = events.schema
    state_schema = "max_seq long"
    field_names = [f.name for f in events.schema.fields]
    key_count = len(keys)
    seq_name = seq_col

    def kernel(key, pdfs, state):
        import pandas as _pd

        prev = state.get[0] if state.exists else None
        best = None
        best_seq = prev if prev is not None else -(2**62)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            idx = pdf[seq_name].idxmax()
            if pdf[seq_name].loc[idx] > best_seq:
                best_seq = int(pdf[seq_name].loc[idx])
                best = pdf.loc[[idx]]
        if best is not None:
            state.update((best_seq,))
            yield best
        else:
            yield _pd.DataFrame(columns=field_names)

    return (
        events.groupBy(*keys)
        .applyInPandasWithState(
            kernel,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
