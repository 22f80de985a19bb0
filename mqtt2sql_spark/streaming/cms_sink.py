"""Incremental Count-Min sketch maintenance under foreachBatch.

The CMS (plans/sketches.count_min_topic_freq grammar: depth×width md5
cells) is mergeable by CELL ADDITION — unlike the HLL's max-merge
(streaming/hll_sink.py) addition is NOT idempotent, so foreachBatch's
at-least-once replay would double-count a re-delivered micro-batch.
This sink therefore carries the standard additive-state fix: an epoch
ledger.  A batch whose epoch id is already recorded is skipped before
any state mutation, making the merge exactly-once in effect — the same
ledger discipline sinks/upsert.py applies to its MERGE and the spool
sink applies to file commits.

State is DEPTH×WIDTH integer cells (+ the ledger) regardless of stream
volume — the bounded-memory frequency table for 100 TB key streams.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mqtt2sql_spark.plans.sketches import CM_DEPTH, CM_WIDTH


def cms_cells(df: DataFrame, key_col: str = "topic") -> DataFrame:
    """(i, bkt, c) cell increments for one batch — the count_min grammar."""
    i_col = F.explode(F.array(*[F.lit(i) for i in range(CM_DEPTH)])).alias("i")
    return (
        df.select(F.col(key_col).alias("k"))
        .select("k", i_col)
        .select(
            "i",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col("i").cast("string"), "k")),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % CM_WIDTH
            ).alias("bkt"),
        )
        .groupBy("i", "bkt")
        .agg(F.count(F.lit(1)).alias("c"))
    )


class CountMinSink:
    """foreachBatch target adding each (unseen) micro-batch's cell counts
    into the sketch state at ``state_dir``."""

    def __init__(self, state_dir: str, key_col: str = "topic") -> None:
        self.state_dir = state_dir
        self.key_col = key_col

    @property
    def _ledger_path(self) -> str:
        return self.state_dir + ".epochs.json"

    def _seen(self) -> set[int]:
        try:
            with open(self._ledger_path) as f:
                return set(json.load(f))
        except (OSError, ValueError):
            return set()

    def _read_state(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.isdir(self.state_dir):
            return None
        try:
            return spark.read.parquet(self.state_dir)
        except Exception:
            return None

    def process_batch(self, df: DataFrame, epoch_id: int) -> None:
        seen = self._seen()
        if int(epoch_id) in seen:
            return  # replayed delivery: addition is not idempotent — skip
        spark = df.sparkSession
        inc = cms_cells(df, self.key_col)
        prev = self._read_state(spark)
        merged = (
            inc
            if prev is None
            else prev.unionByName(inc)
            .groupBy("i", "bkt")
            .agg(F.sum("c").alias("c"))
        )
        tmp = tempfile.mkdtemp(
            prefix="_cms_state_", dir=os.path.dirname(self.state_dir) or "."
        )
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = self.state_dir + ".old"
        if os.path.isdir(self.state_dir):
            os.rename(self.state_dir, old)
        os.rename(tmp, self.state_dir)
        if os.path.isdir(old):
            shutil.rmtree(old)
        # record the epoch only after the state swap: a crash in between
        # replays the batch against the OLD state (rename is atomic), so
        # the merge still lands exactly once
        seen.add(int(epoch_id))
        with open(self._ledger_path, "w") as f:
            json.dump(sorted(seen), f)

    def estimate(self, spark: SparkSession, keys: DataFrame) -> DataFrame:
        """Point-query the sketch: min over rows of the hashed cells for
        each key in ``keys`` (a one-column DataFrame named `k`)."""
        state = self._read_state(spark)
        if state is None:
            raise FileNotFoundError(self.state_dir)
        i_col = F.explode(
            F.array(*[F.lit(i) for i in range(CM_DEPTH)])
        ).alias("i")
        probes = keys.select("k", i_col).select(
            "k",
            "i",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col("i").cast("string"), "k")),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % CM_WIDTH
            ).alias("bkt"),
        )
        return (
            probes.join(F.broadcast(state), ["i", "bkt"], "left")
            .groupBy("k")
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_n"))
        )
