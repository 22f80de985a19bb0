"""Engine configuration + MQTT URL grammar (SURVEY.md §2 B1).

The reference accepts broker URLs of the form
    mqtt[s]://[username[:password]@]host[:port][/topic[/...]]
(documented in /root/reference/mqtt2sql.conf:30-33 and decomposed at
mqtt2sql.py:679-726).  Re-implemented here from the documented grammar
with stdlib urllib parsing — defaults: port 1883 (mqtt) / 8883 (mqtts),
topic '#' (everything).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import unquote, urlparse


@dataclass(frozen=True)
class MqttEndpoint:
    scheme: str
    host: str
    port: int
    username: str | None
    password: str | None
    topics: tuple[str, ...]

    @property
    def use_tls(self) -> bool:
        return self.scheme == "mqtts"


@dataclass(frozen=True)
class EngineConfig:
    """Operational knobs mirroring the reference's envelope
    (BASELINE.md): bounded in-flight writes → maxOffsetsPerTrigger;
    retry budgets → Spark task/connector retries."""

    endpoints: tuple[MqttEndpoint, ...] = ()
    exclude_topics: tuple[str, ...] = ()
    timezone: str = "UTC"  # mqtt2sql.py:125 default
    max_messages_per_trigger: int = 10_000
    connect_retries: int = 10  # --sql-connection-retry default
    connect_retry_start_delay_s: float = 1.0  # additive backoff (code wins
    # over the "doubled" help text — mqtt2sql.py:562 vs :335)
    keepalive_s: int = 60
    ca_file: str | None = None
    cert_file: str | None = None
    key_file: str | None = None
    tls_insecure: bool = False


def parse_mqtt_url(url: str) -> MqttEndpoint:
    # '#' is the MQTT multi-level wildcard, not a URL fragment — keep it
    # in the topic path (mqtt2sql.conf:33 grammar)
    had_hash = "#" in url
    frag = ""
    if had_hash:
        url, _, frag = url.partition("#")
    u = urlparse(url)
    if u.scheme not in ("mqtt", "mqtts"):
        raise ValueError(f"unsupported scheme {u.scheme!r} in {url!r}")
    if not u.hostname:
        raise ValueError(f"missing host in {url!r}")
    port = u.port or (8883 if u.scheme == "mqtts" else 1883)
    topic = u.path.lstrip("/")
    if had_hash:
        topic = topic + "#" + frag
    topics = (topic,) if topic else ("#",)
    return MqttEndpoint(
        scheme=u.scheme,
        host=u.hostname,
        port=port,
        username=unquote(u.username) if u.username else None,
        password=unquote(u.password) if u.password else None,
        topics=topics,
    )
