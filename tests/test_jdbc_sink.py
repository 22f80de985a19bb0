"""SQLite upsert sink (A15 parity backend)."""

import datetime as dt
import sqlite3

from mqtt2sql_spark.sinks.jdbc import SqliteUpsertSink
from mqtt2sql_spark.streaming.pipeline import MESSAGE_SCHEMA

_BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _batch(spark, rows):
    return spark.createDataFrame(
        [
            (_BASE + dt.timedelta(seconds=o), t, v.encode(), 0, 0, e)
            for t, o, v, e in rows
        ],
        MESSAGE_SCHEMA,
    )


def test_sqlite_upsert_keeps_latest_and_sticky_ids(spark, tmp_path):
    db = str(tmp_path / "mqtt.db")
    sink = SqliteUpsertSink(db)

    sink.process_batch(_batch(spark, [("a", 0, "v1", 1), ("b", 1, "w1", 2)]), 0)
    sink.process_batch(_batch(spark, [("a", 10, "v2", 3), ("c", 11, "x1", 4)]), 1)
    # replay of batch 1 (at-least-once delivery) must be idempotent
    sink.process_batch(_batch(spark, [("a", 10, "v2", 3), ("c", 11, "x1", 4)]), 2)

    with sqlite3.connect(db) as con:
        rows = {
            topic: (vid, value.decode(), ts)
            for vid, ts, topic, value in con.execute(
                "SELECT id, ts, topic, value FROM mqtt"
            )
        }
    assert rows["a"][1] == "v2"            # upserted to latest
    assert rows["b"][1] == "w1"
    assert rows["c"][1] == "x1"
    assert rows["a"][0] == 1               # id sticky across upserts
    assert rows["a"][2] == "2024-01-01 12:00:10"
    assert len(rows) == 3


def test_sqlite_upsert_intra_batch_collapse(spark, tmp_path):
    db = str(tmp_path / "mqtt2.db")
    sink = SqliteUpsertSink(db)
    # two messages for one topic in a single batch: only the newest lands
    sink.process_batch(
        _batch(spark, [("t", 0, "old", 1), ("t", 5, "new", 2)]), 0
    )
    with sqlite3.connect(db) as con:
        (value,) = con.execute("SELECT value FROM mqtt WHERE topic='t'").fetchone()
    assert value == b"new"
