"""Spool-directory streaming sink — a Python DataSource stream writer
with a two-phase commit protocol (exactly-once file output).

The write-side twin of ``sources/mqtt.FileSpoolTransport``: where the
source drains JSONL spool files an external bridge produced, this sink
PRODUCES a JSONL spool directory downstream consumers (including that
transport) can tail.  The reference's write path is a SQL sink with
hand-rolled retry (/root/reference/mqtt2sql.py:528-651); this is the
Spark-native file equivalent with the semantics the reference cannot
offer: per-microbatch atomicity.

Commit protocol (the standard temp-then-manifest design every
exactly-once file sink uses):

  * each task writes ``.inprogress/<epoch>-<uuid>.jsonl`` — invisible
    to readers, safe under task retry (duplicates differ by uuid and
    only one wins at commit);
  * its ``WriterCommitMessage`` carries the temp name + row count;
  * on driver ``commit(epoch)``: rename every temp file to
    ``part-<epoch>-<i>.jsonl`` and append one line to ``_manifest``
    (epoch, files, rows).  Readers trust ONLY manifest entries;
  * on ``abort(epoch)``: unlink temp files.

A replayed epoch (restart between sink commit and checkpoint write)
re-runs ``commit`` with the same epoch id: the manifest append is
skipped if the epoch is already recorded, so downstream consumers see
each micro-batch exactly once even though Structured Streaming's
contract to the sink is at-least-once.

At cluster scale: tasks write to executor-local or object storage
independently (no coordination until the tiny commit RPC), the driver
renames O(partitions) files per batch, and the manifest is an
append-only log the next stage can incrementally tail.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)


def _entry_epochs_compat(entry: dict) -> list[int]:
    if "epochs" in entry:
        return list(entry["epochs"])
    return [entry["epoch"]]


@dataclass
class SpoolCommitMessage(WriterCommitMessage):
    temp_name: str = ""
    rows: int = 0


class SpoolStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("spool sink requires a 'path' option")
        self.path = path
        # 'jsonl' (generic rows) or 'mqtt-spool' (the TAB line format
        # sources/mqtt.FileSpoolTransport drains: topic, hex payload,
        # qos, retain — writer/reader symmetry for pipeline loopback)
        self.fmt = options.get("format", "jsonl")
        if self.fmt not in ("jsonl", "mqtt-spool"):
            raise ValueError(f"unknown spool format {self.fmt!r}")
        os.makedirs(os.path.join(path, ".inprogress"), exist_ok=True)

    def _encode(self, row) -> str:
        if self.fmt == "jsonl":
            return json.dumps(row.asDict(), default=str)
        v = row["value"]
        payload = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
        return "\t".join(
            (
                row["topic"],
                bytes(payload).hex(),
                str(int(row["qos"] or 0)),
                str(int(row["retain"] or 0)),
            )
        )

    def write(self, iterator):
        """Executor-side: stream the partition to one temp spool file."""
        from pyspark import TaskContext

        epoch = TaskContext.get().getLocalProperty("streaming.sql.batchId")
        name = f"{epoch}-{uuid.uuid4().hex}.jsonl"
        tmp = os.path.join(self.path, ".inprogress", name)
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(self._encode(row) + "\n")
                n += 1
        return SpoolCommitMessage(temp_name=name, rows=n)

    # -- driver side --------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.path, "_manifest")

    def _committed_epochs(self) -> set[int]:
        # entries are {"epoch": int, ...} as written by commit(), or
        # {"epochs": [ints], ...} after sinks/compact.py bin-packs files
        # — both shapes must keep replay detection working
        out: set[int] = set()
        try:
            with open(self._manifest_path()) as f:
                for line in f:
                    if not line.strip():
                        continue
                    e = json.loads(line)
                    out.update(_entry_epochs_compat(e))
        except FileNotFoundError:
            pass
        return out

    def commit(self, messages, batchId: int) -> None:
        if batchId in self._committed_epochs():
            # replayed epoch after restart: output is already visible —
            # drop the duplicate attempt's temp files and keep the
            # manifest unchanged (exactly-once to readers)
            for m in messages:
                try:
                    os.unlink(os.path.join(self.path, ".inprogress", m.temp_name))
                except FileNotFoundError:
                    pass
            return
        files, rows = [], 0
        for i, m in enumerate(messages):
            final = f"part-{batchId:05d}-{i:04d}.jsonl"
            os.replace(
                os.path.join(self.path, ".inprogress", m.temp_name),
                os.path.join(self.path, final),
            )
            files.append(final)
            rows += m.rows
        entry = {"epoch": batchId, "files": files, "rows": rows}
        # single-writer append (the driver); readers tail complete lines
        with open(self._manifest_path(), "a") as f:
            f.write(json.dumps(entry) + "\n")

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.unlink(os.path.join(self.path, ".inprogress", m.temp_name))
            except FileNotFoundError:
                pass


class SpoolSink(DataSource):
    """``df.writeStream.format("spool").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "spool"

    def streamWriter(self, schema, overwrite: bool) -> SpoolStreamWriter:
        return SpoolStreamWriter(self.options)


def register_spool_sink(spark) -> None:
    spark.dataSource.register(SpoolSink)
