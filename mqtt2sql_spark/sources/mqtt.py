"""MQTT streaming source — PySpark 4 Python Data Source API
(SURVEY.md §7.1 M4, §2 A1/B2-B4).

MQTT has no replayable log, so the source buffers received messages in a
WAL and serves Structured Streaming's offset contract from it
(SURVEY.md §7.3 #6 — the one real impedance mismatch between the
reference's at-most-once model and Spark's recovery model):

    initialOffset → {"index": 0}
    read(start)   → drain the transport, stamp arrival time (the
                    reference's processing-time semantics,
                    mqtt2sql.py:522), append to WAL, return (rows, end)
    readBetweenOffsets(start, end) → WAL slice (failure replay)
    commit(end)   → trim WAL below end

The in-memory WAL makes the source at-least-once within a driver's
lifetime; production deployments point `walDir` at persistent storage
(files) so replay survives driver restarts — same contract, bigger WAL.

Transports are pluggable: `paho` (real broker; import-gated — the lib is
not in this container) and `memory` (deterministic in-process queue for
tests).  Options:
    url            mqtt[s]://user:pass@host:port/topic  (config.py grammar)
    excludeTopics  comma-separated exact-match exclusion (A2 pushdown)
    transport      "paho" (default) | "memory"
    memoryKey      queue name for the memory transport
    maxPerTrigger  max messages drained per micro-batch (B4 backpressure,
                   the semaphore-50 analogue of mqtt2sql.py:461)
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MESSAGE_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("topic", StringType()),
        StructField("value", BinaryType()),
        StructField("qos", IntegerType()),
        StructField("retain", IntegerType()),
        # arrival sequence number (WAL index): the deterministic per-key
        # tie-breaker the engine orders on (SURVEY.md §7.3 #2) — the
        # reference has no ordering at all under same-second timestamps
        StructField("event_id", LongType()),
    ]
)

# test transport queues, keyed by memoryKey (driver-side only)
_MEMORY_QUEUES: dict[str, list[tuple[str, bytes, int, int]]] = {}


def memory_queue(key: str) -> list[tuple[str, bytes, int, int]]:
    """Get/create the in-process message queue for a memory transport."""
    return _MEMORY_QUEUES.setdefault(key, [])


class MemoryTransport:
    def __init__(self, key: str) -> None:
        self.key = key

    def connect(self) -> None:
        pass

    def poll(self, max_n: int) -> list[tuple[str, bytes, int, int]]:
        q = memory_queue(self.key)
        out, q[:] = q[:max_n], q[max_n:]
        return out

    def close(self) -> None:
        pass


class FileSpoolTransport:
    """Polls a spool directory of message files — the durable-WAL bridge
    deployment shape (a tiny paho daemon appends spool files; Spark
    consumes them).  Each file holds lines
    ``topic<TAB>hex(payload)<TAB>qos<TAB>retain``; files are consumed in
    sorted-name order exactly once (per reader lifetime)."""

    def __init__(self, spool_dir: str) -> None:
        self.spool_dir = spool_dir
        self._done: set[str] = set()

    def connect(self) -> None:
        pass

    def poll(self, max_n: int) -> list[tuple[str, bytes, int, int]]:
        import os

        out: list[tuple[str, bytes, int, int]] = []
        try:
            names = sorted(os.listdir(self.spool_dir))
        except FileNotFoundError:
            return out
        for name in names:
            if name in self._done or name.startswith("."):
                continue
            path = os.path.join(self.spool_dir, name)
            with open(path) as f:
                for line in f:
                    line = line.rstrip("\n")
                    if not line:
                        continue
                    topic, hexpayload, qos, retain = line.split("\t")
                    out.append(
                        (topic, bytes.fromhex(hexpayload), int(qos), int(retain))
                    )
            self._done.add(name)
            if len(out) >= max_n:
                break
        return out[:max_n]

    def close(self) -> None:
        pass


class PahoTransport:
    """Real broker transport (requires the public `paho-mqtt` package)."""

    def __init__(self, url: str, keepalive: int = 60) -> None:
        try:
            import paho.mqtt.client as mqtt  # noqa: F401
        except ImportError as e:  # pragma: no cover - lib absent in container
            raise ImportError(
                "paho-mqtt is not installed; use transport=memory for "
                "local tests or install paho-mqtt for a real broker"
            ) from e
        from mqtt2sql_spark.config import parse_mqtt_url

        self.endpoint = parse_mqtt_url(url)
        self.keepalive = keepalive
        self._buffer: list[tuple[str, bytes, int, int]] = []
        self._client = None

    def connect(self) -> None:  # pragma: no cover - needs a broker
        import paho.mqtt.client as mqtt

        ep = self.endpoint
        client = mqtt.Client()
        if ep.username:
            client.username_pw_set(ep.username, ep.password)
        if ep.use_tls:
            client.tls_set()

        def on_connect(cl, userdata, flags, rc):
            for t in ep.topics:
                cl.subscribe(t, qos=0)

        def on_message(cl, userdata, msg):
            self._buffer.append(
                (msg.topic, bytes(msg.payload), int(msg.qos), int(msg.retain))
            )

        client.on_connect = on_connect
        client.on_message = on_message
        client.connect(ep.host, ep.port, self.keepalive)
        client.loop_start()
        self._client = client

    def poll(self, max_n: int) -> list[tuple[str, bytes, int, int]]:
        out, self._buffer = self._buffer[:max_n], self._buffer[max_n:]
        return out

    def close(self) -> None:  # pragma: no cover
        if self._client is not None:
            self._client.loop_stop()
            self._client.disconnect()


def _make_transport(options: dict):
    kind = options.get("transport", "paho")
    if kind == "memory":
        return MemoryTransport(options.get("memorykey", "default"))
    if kind == "file":
        return FileSpoolTransport(options["spooldir"])
    if kind == "paho":
        return PahoTransport(
            options.get("url", "mqtt://localhost"),
            int(options.get("keepalive", "60")),
        )
    raise ValueError(f"unknown transport {kind!r}")


class MqttStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.options = options
        self.transport = _make_transport(options)
        self.transport.connect()
        self.max_per_trigger = int(options.get("maxpertrigger", "10000"))
        excl = options.get("excludetopics", "")
        self.exclude = {t for t in excl.split(",") if t}
        self.wal: list[tuple] = []
        self.base = 0  # stream offset of wal[0]

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _stamp(self, msgs) -> list[tuple]:
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        next_id = self.base + len(self.wal)
        out = []
        for topic, payload, qos, retain in msgs:
            if topic in self.exclude:  # A2 pushdown (exact match)
                continue
            out.append((now, topic, payload, qos, retain, next_id))
            next_id += 1
        return out

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        fresh = self._stamp(self.transport.poll(self.max_per_trigger))
        self.wal.extend(fresh)
        end_index = self.base + len(self.wal)
        lo = start["index"] - self.base
        rows = self.wal[max(lo, 0) :]
        return iter(rows), {"index": end_index}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        lo = start["index"] - self.base
        hi = end["index"] - self.base
        return iter(self.wal[max(lo, 0) : max(hi, 0)])

    def commit(self, end: dict) -> None:
        cut = end["index"] - self.base
        if cut > 0:
            self.wal = self.wal[cut:]
            self.base = end["index"]


class MqttDataSource(DataSource):
    """spark.readStream.format("mqtt") after
    spark.dataSource.register(MqttDataSource)."""

    @classmethod
    def name(cls) -> str:
        return "mqtt"

    def schema(self) -> StructType:
        return MESSAGE_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> MqttStreamReader:
        return MqttStreamReader(
            {k.lower(): v for k, v in self.options.items()}
        )
