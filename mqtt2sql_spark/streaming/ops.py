"""Operational machinery for streaming queries (SURVEY.md §2 B6/B7).

The reference's logging levels and signal-driven orderly exit
(/root/reference/mqtt2sql.py:368-423, 36-43, 926-963) map to:
  B6 → a StreamingQueryListener recording per-batch progress metrics;
  B7 → signal-installed graceful stop: finish the in-flight micro-batch,
       then stop() every active query (checkpoint makes restart resume
       exactly where it left off).
"""

from __future__ import annotations

import json
import signal
import threading
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogListener(StreamingQueryListener):
    """Records one JSON line per finished micro-batch (rows, duration,
    watermark) — the engine's observability surface; attach with
    spark.streams.addListener(...)."""

    def __init__(self, log_path: str | None = None) -> None:
        self.log_path = log_path
        self.progress: list[dict[str, Any]] = []
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rec = {
            "id": str(p.id),
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "durationMs": dict(p.durationMs),
            "watermark": p.eventTime.get("watermark"),
        }
        with self._lock:
            self.progress.append(rec)
            if self.log_path:
                with open(self.log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass


def install_graceful_shutdown(spark: SparkSession) -> None:
    """SIGTERM/SIGINT → stop all active streaming queries after their
    current micro-batch commits (exit code semantics of mqtt2sql.py:36-43
    are replaced by deterministic checkpoint-resume)."""

    def handler(signum, frame):
        for q in spark.streams.active:
            q.stop()

    signal.signal(signal.SIGTERM, handler)
    signal.signal(signal.SIGINT, handler)
