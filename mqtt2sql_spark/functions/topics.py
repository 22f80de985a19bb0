"""MQTT topic-filter helpers (SURVEY.md §2 A2/A3).

The reference delegates wildcard matching to the broker at subscribe time
(/root/reference/mqtt2sql.py:754-760) and does client-side *exact-match*
exclusion (mqtt2sql.py:782-783).  In the Spark engine the subscription
filter becomes a regex predicate on the topic column, so Catalyst can push
it into the scan; the exclusion stays an exact `isin` to preserve the
reference's wildcard/exact asymmetry (SURVEY.md §4.3).

MQTT filter grammar (OASIS MQTT 3.1.1 §4.7, public spec):
  `+` matches exactly one topic level; `#` (only last level) matches the
  remaining levels *including the parent itself* (`sport/#` matches
  `sport`).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_LEVEL_RE = re.compile(r"[.^$*?{}\[\]\\|()]")


def mqtt_pattern_to_regex(pattern: str) -> str:
    """Translate an MQTT topic filter into an anchored regex."""
    parts = pattern.split("/")
    out: list[str] = []
    for i, part in enumerate(parts):
        if part == "#":
            if i != len(parts) - 1:
                raise ValueError(f"'#' must be the final level: {pattern!r}")
            if i == 0:
                return "^.*$"
            # strip the separator before '#': parent itself must match
            prefix = "/".join(out)
            return f"^{prefix}(/.*)?$"
        if part == "+":
            out.append("[^/]+")
        else:
            out.append(_LEVEL_RE.sub(lambda m: "\\" + m.group(0), part))
    return "^" + "/".join(out) + "$"


def topic_matches(col: Column | str, pattern: str) -> Column:
    """Predicate: topic matches the MQTT wildcard filter."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(mqtt_pattern_to_regex(pattern))


def topic_excluded(col: Column | str, exclude: list[str]) -> Column:
    """Predicate: topic is in the exact-match exclusion list."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isin(exclude)
