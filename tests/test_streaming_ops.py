"""B6 observability: per-batch progress listener."""

import datetime as dt
import time

from mqtt2sql_spark.streaming.ops import ProgressLogListener
from mqtt2sql_spark.streaming.pipeline import MESSAGE_SCHEMA, message_file_stream


def test_progress_listener_records_batches(spark, tmp_path):
    listener = ProgressLogListener(log_path=str(tmp_path / "progress.jsonl"))
    spark.streams.addListener(listener)
    try:
        input_dir = tmp_path / "in"
        input_dir.mkdir()
        spark.createDataFrame(
            [(dt.datetime(2024, 1, 1), "t", b"x", 0, 0, 1)], MESSAGE_SCHEMA
        ).coalesce(1).write.parquet(str(input_dir / "000.parquet"))

        stream = message_file_stream(spark, str(input_dir) + "/*")
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        # listener events are delivered asynchronously; poll while the query
        # is still ALIVE — stopping first can drop (not merely delay) the
        # delivery under full-suite load
        deadline = time.time() + 60
        while time.time() < deadline and not any(
            p["numInputRows"] == 1 for p in listener.progress
        ):
            time.sleep(0.2)
        q.stop()
    finally:
        spark.streams.removeListener(listener)
    assert any(p["numInputRows"] == 1 for p in listener.progress)
    assert (tmp_path / "progress.jsonl").exists()
