"""Upsert sink: maintains the `mqtt` latest-value table + CDC history from
a stream of message micro-batches (SURVEY.md §2 A5/A8-A10, §4.2 #2-3).

The reference upserts row-by-row with ON DUPLICATE KEY UPDATE and lets DB
triggers derive history (/root/reference/mqtt2sql.py:579-629,
mysql.sql:66-91).  The Spark-first equivalent is a `foreachBatch` MERGE:

  per micro-batch
    1. collapse the batch to latest-per-topic (map-side window);
    2. merge with the current `mqtt` table — ts/value/qos/retain from the
       newer row, id and history flags sticky (mqtt2sql.py:581 semantics:
       ON DUPLICATE KEY UPDATE rewrites only the payload columns);
    3. new topics get ids = max(id) + dense rank (mysql.sql:70 trigger);
    4. history rows = enabled messages, minus consecutive-duplicate
       values when diffonly — the *previous batch's* latest value per
       topic (step-2 input) provides the cross-batch lag seed, so
       diff-only semantics hold across micro-batch boundaries without a
       separate state store.

Storage is versioned parquet directories with an atomic _CURRENT pointer
(a poor man's table format; swap for Delta/Iceberg MERGE INTO when the
runtime has the jars — the call sites keep the same shape).  History is
parquet partitioned by (epoch, date(ts)) — date for 100 TB partition
pruning on time-range queries (SURVEY.md §7.1 M6), epoch so a replayed
micro-batch dynamically OVERWRITES its own partitions instead of
re-appending.  Combined with seeding each batch from the pre-batch mqtt
version (current_mqtt(before_epoch=...)), every foreachBatch replay is a
deterministic function of (pre-batch state, batch): at-least-once
delivery converges for BOTH tables.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mqtt2sql_spark.operators.upsert import latest_per_key

MQTT_SCHEMA = (
    "id long, ts timestamp, topic string, value binary, qos int, "
    "retain int, history_enable int, history_diffonly int"
)


class MqttUpsertSink:
    """foreachBatch target maintaining mqtt + mqtt_history under base_dir."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        default_enable: int = 1,
        default_diffonly: int = 1,
    ) -> None:
        self.spark = spark
        self.base_dir = base_dir
        self.default_enable = default_enable
        self.default_diffonly = default_diffonly
        os.makedirs(os.path.join(base_dir, "mqtt"), exist_ok=True)
        os.makedirs(os.path.join(base_dir, "mqtt_history"), exist_ok=True)

    # -- table plumbing ----------------------------------------------------

    def _pointer(self) -> str:
        return os.path.join(self.base_dir, "mqtt", "_CURRENT")

    def current_mqtt(self, before_epoch: int | None = None) -> DataFrame | None:
        """Latest published `mqtt` version; with ``before_epoch``, the
        latest version written by an epoch STRICTLY BELOW it.  foreachBatch
        is at-least-once — on replay of epoch e the pointer may already
        name v{e} (the post-batch state), and seeding the merge/diff from
        it would double-apply the batch.  Reading the pre-batch version
        makes the whole batch (merge + history) a deterministic function
        of (pre-batch state, batch), i.e. idempotent under replay."""
        ptr = self._pointer()
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            version = f.read().strip()
        if before_epoch is not None:
            prior = [
                d
                for d in os.listdir(os.path.join(self.base_dir, "mqtt"))
                if d.startswith("v") and int(d[1:]) < before_epoch
            ]
            if not prior:
                return None
            version = max(prior)
        return self.spark.read.parquet(
            os.path.join(self.base_dir, "mqtt", version)
        )

    def history(self) -> DataFrame:
        path = os.path.join(self.base_dir, "mqtt_history")
        try:
            return self.spark.read.parquet(path)
        except Exception:
            return self.spark.createDataFrame(
                [], "ts timestamp, topicid long, value binary, dt date, epoch long"
            )

    def _publish_mqtt(self, df: DataFrame, epoch_id: int) -> None:
        version = f"v{epoch_id:020d}"
        out = os.path.join(self.base_dir, "mqtt", version)
        df.write.mode("overwrite").parquet(out)
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, self._pointer())  # atomic pointer swap
        # retire older versions (keep previous for readers in flight)
        versions = sorted(
            d
            for d in os.listdir(os.path.join(self.base_dir, "mqtt"))
            if d.startswith("v")
        )
        for old in versions[:-2]:
            shutil.rmtree(
                os.path.join(self.base_dir, "mqtt", old), ignore_errors=True
            )

    # -- the merge ---------------------------------------------------------

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        """batch: (ts, topic, value, qos, retain, event_id)."""
        if not batch.take(1):
            return
        # pre-batch state, even under replay (see current_mqtt docstring)
        prev = self.current_mqtt(before_epoch=epoch_id)
        latest_b = latest_per_key(batch, "topic", ("ts", "event_id")).select(
            "ts", "topic", "value", "qos", "retain"
        )

        if prev is None:
            prev = self.spark.createDataFrame([], MQTT_SCHEMA)

        # -- merge: payload columns from the newer side, id+flags sticky --
        p = prev.alias("p")
        b = latest_b.alias("b")
        joined = p.join(b, "topic", "full_outer")
        merged = joined.select(
            F.col("topic"),
            F.col("p.id").alias("old_id"),
            F.coalesce("p.history_enable", F.lit(self.default_enable)).alias(
                "history_enable"
            ),
            F.coalesce("p.history_diffonly", F.lit(self.default_diffonly)).alias(
                "history_diffonly"
            ),
            # newer payload wins; ts updates even when value unchanged
            # (mqtt2sql.py:581 — keeps ts_last meaningful under diffonly)
            F.coalesce("b.ts", "p.ts").alias("ts"),
            F.coalesce("b.value", "p.value").alias("value"),
            F.coalesce("b.qos", "p.qos").alias("qos"),
            F.coalesce("b.retain", "p.retain").alias("retain"),
        )
        # fresh dense ids for unseen topics: max(id)+rank (mysql.sql:70);
        # the rank window only runs over the new-topic slice (tiny)
        max_id = (prev.agg(F.max("id")).collect()[0][0]) or 0
        new_ids = (
            merged.filter(F.col("old_id").isNull())
            .select("topic")
            .withColumn(
                "fresh_id",
                (F.lit(max_id) + F.row_number().over(W.orderBy("topic"))).cast(
                    "long"
                ),
            )
        )
        merged = (
            merged.join(F.broadcast(new_ids), "topic", "left")
            .withColumn("id", F.coalesce("old_id", "fresh_id"))
            .select(
                "id",
                "ts",
                "topic",
                "value",
                "qos",
                "retain",
                "history_enable",
                "history_diffonly",
            )
        )

        # -- history rows for this batch (cross-batch diff-only) ----------
        dim = merged.select("topic", "id", "history_enable", "history_diffonly")
        seed = prev.select(
            "topic", F.col("value").cast("string").alias("_seed_value")
        )
        w_topic = W.partitionBy("topic").orderBy("ts", "event_id")
        hb = (
            batch.withColumn("value_str", F.col("value").cast("string"))
            .join(F.broadcast(dim), "topic")
            .join(F.broadcast(seed), "topic", "left")
            .withColumn(
                "_prev",
                F.coalesce(
                    F.lag("value_str").over(w_topic), F.col("_seed_value")
                ),
            )
        )
        kept = hb.filter(
            (F.col("history_enable") == 1)
            & (
                (F.col("history_diffonly") == 0)
                | F.col("_prev").isNull()
                | (F.col("_prev") != F.col("value_str"))
            )
        )
        hist = kept.select(
            "ts",
            F.col("id").alias("topicid"),
            "value",
            F.to_date("ts").alias("dt"),
            F.lit(epoch_id).cast("long").alias("epoch"),
        )
        # epoch-idempotent history: partition by (epoch, dt) and overwrite
        # only the partitions this batch touches — a replayed epoch
        # replaces its own earlier rows instead of re-appending them, so
        # at-least-once foreachBatch converges for history too
        hist.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("epoch", "dt").parquet(
            os.path.join(self.base_dir, "mqtt_history")
        )

        # publish last so history readers never see rows for unpublished ids
        self._publish_mqtt(merged, epoch_id)
