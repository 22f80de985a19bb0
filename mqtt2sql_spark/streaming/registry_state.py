"""Live topic registry on the Spark 4 `transformWithStateInPandas` API.

The reference's core object is the `mqtt` latest-value table: one row
per topic holding the newest payload plus bookkeeping
(mysql.sql:42-53, upsert at mqtt2sql.py:579-629).  The engine's batch
form is operators/upsert.py and the foreachBatch MERGE sink; this
module maintains the same table INSIDE the stream on the modern
stateful API (SPARK-42931 `transformWithState`, successor of
applyInPandasWithState used by streaming/diffonly.py):

  * `ValueState` per topic: (n_messages, last_value, last_ts,
    last_event_id) — the upsert row, constant-size;
  * optional state TTL in the API itself (`ttlDurationMs`) replaces
    the hand-rolled ProcessingTimeTimeout bookkeeping diffonly needs;
  * update-mode emission: each micro-batch yields the topics it
    touched with their NEW registry row — exactly the rows a MERGE
    sink would write, so downstream is a plain idempotent upsert.

Requires the RocksDB state-store provider
(`streaming.diffonly.enable_rocksdb_state_store`).

Packaging note: the StatefulProcessor class is defined INSIDE the
factory function so cloudpickle serializes it BY VALUE — the
transformWithState driver worker is a fresh Python process that does
not import this package (witnessed: by-reference pickling fails with
ModuleNotFoundError there even when executors resolve the module).

Tie-breaking matches the batch upsert (max by (ts, event_id)); counts
accumulate across batches, which the batch twin reproduces as
count(*) + max_by per topic.  Parity is asserted in
tests/test_streaming.py::test_registry_state_matches_batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "topic string, n_messages long, last_value string, last_ts timestamp, "
    "last_event_id long"
)
STATE_SCHEMA = (
    "n_messages long, last_value string, last_ts timestamp, "
    "last_event_id long"
)


def make_topic_registry_processor(ttl_ms: int | None = None):
    """Build the StatefulProcessor holding the registry state logic.

    Factory-scoped class (cloudpickle by-value — see packaging note in
    the module docstring).  Exposed separately from the stream wiring so
    the state-transition contract is testable OFFLINE with a fake
    ValueState handle: the transformWithState RUNTIME needs
    google.protobuf, but this logic does not
    (tests/test_streaming.py::test_registry_processor_contract_offline).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    state_schema = STATE_SCHEMA

    class TopicRegistryProcessor(StatefulProcessor):
        """Per-topic latest-value + count registry (ValueState)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "registry", state_schema, ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            (topic,) = key
            if self._state.exists():
                n, last_value, last_ts, last_eid = self._state.get()
            else:
                n, last_value, last_ts, last_eid = 0, None, None, -1
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
                n += len(pdf)
                tail = pdf.iloc[-1]
                # batches arrive in stream order; within the batch the
                # sort gives (ts, event_id) order → the tail wins
                if last_ts is None or (
                    (tail["ts"], int(tail["event_id"])) > (last_ts, last_eid)
                ):
                    last_value = str(tail["value_str"])
                    last_ts = tail["ts"]
                    last_eid = int(tail["event_id"])
            self._state.update((n, last_value, last_ts, last_eid))
            yield pd.DataFrame(
                [(topic, n, last_value, last_ts, last_eid)],
                columns=[
                    "topic",
                    "n_messages",
                    "last_value",
                    "last_ts",
                    "last_event_id",
                ],
            )

        def close(self) -> None:
            pass

    return TopicRegistryProcessor()


def topic_registry_stream(
    messages: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """messages (streaming, with value_str) → per-batch registry updates."""
    return messages.groupBy("topic").transformWithStateInPandas(
        make_topic_registry_processor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
