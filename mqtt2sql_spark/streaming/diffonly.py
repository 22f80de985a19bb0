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

State TTL (``state_ttl_ms``): with unbounded topic churn (clients with
per-session topic names), "scales with topic cardinality" still grows
forever.  An idle-topic TTL bounds the store: topics silent for the TTL
have their state dropped, at a documented semantic cost — the next
message on an expired topic is always emitted, even if it equals the
pre-expiry value (one potential duplicate per expiry, the standard
trade-off; the reference never expires because its state lives in the
`mqtt` table itself, mysql.sql:42-53).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "topic string, ts timestamp, value_str string, event_id long"
STATE_SCHEMA = "last_value string"

# Spark's bundled RocksDB state-store provider: off-heap state with
# incremental (changelog) checkpointing — the right store once per-topic
# state exceeds executor heap (100 TB deployments with 10^8+ topics).
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def enable_rocksdb_state_store(
    spark, changelog_checkpointing: bool = True
) -> None:
    """Route stateful operators started AFTER this call to the RocksDB
    state store.  Changelog checkpointing uploads per-batch deltas instead
    of full SST snapshots — the scale default (bounded per-batch upload
    regardless of total state size)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    if changelog_checkpointing:
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )


def _make_suppress(
    state_ttl_ms: int | None,
) -> Callable[[tuple[str], Iterator[Any], GroupState], Iterator[Any]]:
    def suppress(
        key: tuple[str], pdfs: Iterator[Any], state: GroupState
    ) -> Iterator[Any]:
        import pandas as pd

        if state.hasTimedOut:
            # idle past TTL: drop the last-value memory for this topic
            state.remove()
            return
        (topic,) = key
        last = state.get[0] if state.exists else None
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            for _, row in pdf.iterrows():
                v = row["value_str"]
                if last is None or v != last:
                    out_rows.append((topic, row["ts"], v, row["event_id"]))
                last = v
        state.update((last,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["topic", "ts", "value_str", "event_id"]
            )

    return suppress


def diffonly_stream(
    messages: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """messages (streaming, with value_str) → rows surviving diff-only.

    Emits in append mode; each topic's first-ever message always passes
    (MySQL trigger cadence, SURVEY.md §4.3).  ``state_ttl_ms`` bounds the
    state store by expiring idle topics (see module docstring for the
    re-emit trade-off).
    """
    return messages.groupBy("topic").applyInPandasWithState(
        _make_suppress(state_ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if state_ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
