"""End-to-end: MQTT source (file-spool transport) → filters → upsert sink.

The complete reference pipeline shape (SURVEY.md §3.1) in one streaming
query: subscribe → exclude → project → keyed upsert + diff-only history.
"""

import sqlite3


def test_mqtt_to_tables_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from mqtt2sql_spark.sinks.upsert import MqttUpsertSink
    from mqtt2sql_spark.sources.mqtt import MqttDataSource

    spark.dataSource.register(MqttDataSource)
    spool = tmp_path / "spool"
    spool.mkdir()
    lines = [
        f"sensors/kitchen/temp\t{b'21.5'.hex()}\t0\t0",
        f"sensors/attic/temp\t{b'18.0'.hex()}\t0\t0",
        f"sensors/kitchen/temp\t{b'21.5'.hex()}\t0\t0",   # dup → diffonly drop
        f"sensors/kitchen/temp\t{b'22.0'.hex()}\t0\t0",   # change → history
        f"noise/ignore\t{b'zz'.hex()}\t0\t0",             # excluded
    ]
    (spool / "000.msg").write_text("\n".join(lines) + "\n")

    stream = (
        spark.readStream.format("mqtt")
        .option("transport", "file")
        .option("spoolDir", str(spool))
        .option("excludeTopics", "noise/ignore")
        .load()  # the source emits event_id = WAL arrival sequence
    )
    sink = MqttUpsertSink(spark, str(tmp_path / "tables"))
    q = (
        stream.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    mqtt = {r.topic: bytes(r.value) for r in sink.current_mqtt().collect()}
    assert mqtt == {
        "sensors/kitchen/temp": b"22.0",
        "sensors/attic/temp": b"18.0",
    }
    hist = [
        (r.topicid, bytes(r.value))
        for r in sink.history().orderBy("ts", "topicid").collect()
    ]
    # kitchen: 21.5 then 22.0 (dup suppressed); attic: 18.0
    assert sorted(hist) == sorted(
        [(1, b"21.5"), (1, b"22.0"), (2, b"18.0")]
    ) or sorted(hist) == sorted([(2, b"21.5"), (2, b"22.0"), (1, b"18.0")])
    assert len(hist) == 3


def test_sqlite_sink_from_stream(spark, tmp_path):
    from pyspark.sql import functions as F

    from mqtt2sql_spark.sinks.jdbc import SqliteUpsertSink
    from mqtt2sql_spark.sources.mqtt import MqttDataSource

    spark.dataSource.register(MqttDataSource)
    spool = tmp_path / "spool"
    spool.mkdir()
    (spool / "000.msg").write_text(
        f"home/t\t{b'1'.hex()}\t0\t0\nhome/t\t{b'2'.hex()}\t0\t0\n"
    )
    stream = (
        spark.readStream.format("mqtt")
        .option("transport", "file")
        .option("spoolDir", str(spool))
        .load()
    )
    db = str(tmp_path / "mqtt.db")
    sink = SqliteUpsertSink(db)
    q = (
        stream.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    with sqlite3.connect(db) as con:
        rows = con.execute("SELECT topic, value FROM mqtt").fetchall()
    assert rows == [("home/t", b"2")]
