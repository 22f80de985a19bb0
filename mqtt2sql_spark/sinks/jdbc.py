"""Database upsert sink (SURVEY.md §2 A15) — the reference's write path
re-expressed for micro-batches.

The reference writes row-at-a-time with a 50-permit semaphore, per-message
threads, and hand-rolled retry ladders (/root/reference/mqtt2sql.py:461,
528-651).  Under Spark the equivalents are:

    bounded concurrency   → partition-level writers (numPartitions knob)
    connection retry      → per-partition connect with additive backoff
                            (matching the reference's +1 s/attempt policy,
                            mqtt2sql.py:562 — the code, not the help text)
    transaction retry     → per-batch retry on lock/contention errors with
                            a bounded random delay (mqtt2sql.py:498-499)
    at-most-once QoS 0    → upgraded to at-least-once: the upsert is
                            idempotent (keyed MERGE), so replays converge

Two backends:
  * `write_jdbc_upsert` — generic JDBC via Spark's writer for engines
    whose dialect supports upsert through `ON DUPLICATE KEY`/`ON
    CONFLICT` (requires the JDBC driver jar on the classpath; the local
    test container has none, so this path is exercised in degraded
    append mode only);
  * `SqliteUpsertSink` — a real, testable backend over stdlib sqlite3:
    executemany upserts per partition collected to the driver (SQLite is
    single-writer anyway, so funneling through the driver is not a scale
    loss for THIS backend; a server DB uses foreachPartition instead).

Schema matches mysql.sql:42-53 / sqlite.sql:35-46 semantics: latest row
per topic, sticky id and history flags.
"""

from __future__ import annotations

import random
import sqlite3
import time

from pyspark.sql import DataFrame

DDL = """
CREATE TABLE IF NOT EXISTS mqtt (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    ts TIMESTAMP NOT NULL,
    topic TEXT NOT NULL UNIQUE,
    value BLOB,
    qos INTEGER,
    retain INTEGER,
    history_enable INTEGER DEFAULT 1,
    history_diffonly INTEGER DEFAULT 1
)
"""

UPSERT = """
INSERT INTO mqtt (ts, topic, value, qos, retain)
VALUES (?, ?, ?, ?, ?)
ON CONFLICT(topic) DO UPDATE SET
    ts = excluded.ts,
    value = excluded.value,
    qos = excluded.qos,
    retain = excluded.retain
"""


class SqliteUpsertSink:
    """foreachBatch target upserting latest-per-topic into SQLite.

    The ON CONFLICT clause rewrites only ts/value/qos/retain — id and the
    history flags stay sticky per topic (mqtt2sql.py:581 semantics).
    """

    def __init__(
        self,
        db_path: str,
        txn_retries: int = 10,
        max_retry_delay_s: float = 2.0,
    ) -> None:
        self.db_path = db_path
        self.txn_retries = txn_retries
        self.max_retry_delay_s = max_retry_delay_s
        with sqlite3.connect(db_path) as con:
            con.execute(DDL)

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        from mqtt2sql_spark.operators.upsert import latest_per_key

        rows = [
            (r.ts.isoformat(sep=" ", timespec="seconds"), r.topic,
             bytes(r.value) if r.value is not None else None, r.qos, r.retain)
            for r in latest_per_key(batch, "topic", ("ts", "event_id"))
            .select("ts", "topic", "value", "qos", "retain")
            .collect()
        ]
        if not rows:
            return
        attempt = 0
        while True:
            try:
                with sqlite3.connect(self.db_path, timeout=5.0) as con:
                    con.executemany(UPSERT, rows)
                return
            except sqlite3.OperationalError as e:
                # "database is locked" → bounded random-delay retry
                # (mqtt2sql.py:498-499,643 policy)
                attempt += 1
                if "locked" not in str(e) or attempt > self.txn_retries:
                    raise
                time.sleep(random.uniform(0, self.max_retry_delay_s))


def write_jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    num_partitions: int = 8,
    batchsize: int = 1000,
    mode: str = "append",
) -> None:
    """Generic JDBC write: bounded parallelism via numPartitions (the
    semaphore-50 analogue), batchsize per round trip.  True MERGE needs a
    dialect-specific statement executed by the target engine — pair this
    with a staging table + server-side MERGE where supported."""
    (
        df.repartition(num_partitions)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("numPartitions", str(num_partitions))
        .mode(mode)
        .save()
    )
