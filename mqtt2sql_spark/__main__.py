"""Runnable daemon: ``python -m mqtt2sql_spark`` — the Spark-native
equivalent of the reference's CLI entry point (mqtt2sql.py:965-978).

Argument surface mirrors the reference's (mqtt2sql.py:132-366) where the
concept survives the re-architecture:

    --mqtt URL            broker/topic subscription (B1 grammar,
                          mqtt2sql.conf:30-33); repeatable
    --exclude-topic T     exact-match exclusion (A2, mqtt2sql.py:193-199);
                          repeatable
    --storage-dir DIR     parquet table root (replaces --sql DSN: the
                          mqtt/mqtt_history tables live here)
    --checkpoint-dir DIR  Structured Streaming checkpoint (replaces the
                          reference's nothing — its at-most-once model
                          had no recovery state)
    --timezone TZ         session timezone (A12, default UTC,
                          mqtt2sql.py:125)
    --max-per-trigger N   micro-batch admission bound (B4 backpressure,
                          the semaphore-50 analogue of mqtt2sql.py:461)
    --transport KIND      paho (real broker) | file (spool dir) | memory
    --spool-dir DIR       file-transport input directory
    --once                drain what is available, then exit (smoke /
                          batch-catchup mode; the daemon default runs
                          until SIGTERM like the reference's
                          loop_forever, mqtt2sql.py:899-924)
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m mqtt2sql_spark",
        description="MQTT → Spark latest-value + history tables",
    )
    p.add_argument("--mqtt", action="append", default=[],
                   help="mqtt[s]://user:pass@host:port/topic (repeatable)")
    p.add_argument("--exclude-topic", action="append", default=[],
                   help="exact topic to drop (repeatable)")
    p.add_argument("--storage-dir", required=True)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--timezone", default="UTC")
    p.add_argument("--max-per-trigger", type=int, default=10_000)
    p.add_argument("--transport", default="paho",
                   choices=("paho", "file", "memory"))
    p.add_argument("--spool-dir", default=None)
    p.add_argument("--memory-key", default="default")
    p.add_argument("--once", action="store_true")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from mqtt2sql_spark.config import parse_mqtt_url
    from mqtt2sql_spark.session import get_spark
    from mqtt2sql_spark.sinks.upsert import MqttUpsertSink
    from mqtt2sql_spark.sources.mqtt import MqttDataSource
    from mqtt2sql_spark.streaming.ops import install_graceful_shutdown
    from mqtt2sql_spark.streaming.pipeline import apply_filters
    from pyspark.sql import functions as F  # noqa: F401 (session warm-up)

    spark = get_spark(
        "mqtt2sql_spark-daemon",
        extra_conf={"spark.sql.session.timeZone": args.timezone},
    )
    spark.dataSource.register(MqttDataSource)

    subscribe_patterns: list[str] = []
    reader = (
        spark.readStream.format("mqtt")
        .option("transport", args.transport)
        .option("maxPerTrigger", str(args.max_per_trigger))
    )
    if args.mqtt:
        # validate the URL grammar up front (fail fast like the
        # reference's parseargs) and collect subscription patterns
        for url in args.mqtt:
            ep = parse_mqtt_url(url)
            subscribe_patterns.extend(ep.topics)
        reader = reader.option("url", args.mqtt[0])
    if args.exclude_topic:
        reader = reader.option("excludeTopics", ",".join(args.exclude_topic))
    if args.spool_dir:
        reader = reader.option("spoolDir", args.spool_dir)
    if args.transport == "memory":
        reader = reader.option("memoryKey", args.memory_key)

    stream = apply_filters(
        reader.load(),
        subscribe_patterns=subscribe_patterns or None,
        exclude_topics=args.exclude_topic or None,
    )
    sink = MqttUpsertSink(spark, args.storage_dir)
    writer = (
        stream.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", args.checkpoint_dir)
        .outputMode("update")
    )
    if args.once:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    install_graceful_shutdown(spark)
    query.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
