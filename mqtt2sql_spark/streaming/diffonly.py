"""Cross-batch diff-only CDC as a stateful streaming operator
(SURVEY.md §7.3 #1 — the one genuinely stateful operator).

`applyInPandasWithState` keyed by topic holds the last-seen payload per
topic, so consecutive-duplicate suppression (mysql.sql:87 trigger
semantics) works across micro-batch boundaries.  This is the
state-store-backed alternative to the foreachBatch seed-join in
sinks/upsert.py: use this form when history must be emitted *from the
stream* (append-mode sink into Kafka/files) rather than derived inside a
batch merge; state lives in the Spark state store (RocksDB on a real
cluster) and scales with topic cardinality, not message volume.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "topic string, ts timestamp, value_str string, event_id long"
STATE_SCHEMA = "last_value string"


def _suppress_consecutive(
    key: tuple[str], pdfs: Iterator[Any], state: GroupState
) -> Iterator[Any]:
    import pandas as pd

    (topic,) = key
    last = state.get[0] if state.exists else None
    out_rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for _, row in pdf.iterrows():
            v = row["value_str"]
            if last is None or v != last:
                out_rows.append(
                    (topic, row["ts"], v, row["event_id"])
                )
            last = v
    state.update((last,))
    if out_rows:
        yield pd.DataFrame(
            out_rows, columns=["topic", "ts", "value_str", "event_id"]
        )


def diffonly_stream(messages: DataFrame) -> DataFrame:
    """messages (streaming, with value_str) → rows surviving diff-only.

    Emits in append mode; each topic's first-ever message always passes
    (MySQL trigger cadence, SURVEY.md §4.3).
    """
    return messages.groupBy("topic").applyInPandasWithState(
        _suppress_consecutive,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
