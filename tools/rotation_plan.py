"""Compute the next round's _PRIORITY window from driver evidence.

The driver's correctness gate records a bounded window (historically
exactly the FIRST 50 queries in registration order), so the registry's
`_PRIORITY` tuple decides which queries earn driver-green CORRECTNESS
rows each round.  Policy (CLAUDE.md):

  1. SURVEY §2 core pipeline — inside EVERY window;
  2. queries whose LATEST witness is red (hash/rows/schema mismatch or
     error) — these carry a pending fix that must be re-witnessed;
  3. queries never witnessed by ANY recorded round, oldest-registered
     first (these are the evidence gaps);
  4. backfill with the queries whose last witness is OLDEST, so
     long-green rows get refreshed eventually.

Usage:  python tools/rotation_plan.py [window_size]
Prints the recommended tuple body, ready to paste into
mqtt2sql_spark/registry.py, plus coverage stats.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CORE = (
    "scan_events", "filter_exclude_topic", "filter_topic_wildcard",
    "project_message", "upsert_latest_per_topic", "assign_topic_ids",
    "history_enable_routing", "history_append_all", "history_diffonly",
    "history_view_join", "tz_render", "hex_roundtrip", "flip_history_flag",
)


def main() -> int:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from mqtt2sql_spark.plans.base import REGISTRY
    from mqtt2sql_spark.registry import all_specs  # noqa: F401  (loads plans)

    registration_order = list(REGISTRY.specs())

    witnessed: dict[str, int] = {}  # name -> last round witnessed
    latest: dict[str, dict] = {}  # name -> record from the latest witness
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(path.read_text())
        except json.JSONDecodeError:
            continue
        for name, rec in rows.items():
            if rnd >= witnessed.get(name, 0):
                witnessed[name] = rnd
                latest[name] = rec if isinstance(rec, dict) else {}

    def _is_red(rec: dict) -> bool:
        return bool(rec.get("err")) or not (
            rec.get("rows_match", True)
            and rec.get("schema_match", True)
            and rec.get("hash_match", True)
        )

    reds = [
        n for n in registration_order
        if n in latest and _is_red(latest[n]) and n not in CORE
    ]
    never = [
        n for n in registration_order
        if n not in witnessed and n not in CORE
    ]
    backfill = sorted(
        (n for n in witnessed if n not in CORE and n not in reds),
        key=lambda n: (witnessed[n], registration_order.index(n)),
    )

    plan = list(CORE) + reds[: window - len(CORE)]
    plan += never[: window - len(plan)]
    plan += backfill[: window - len(plan)]

    print(f"# registry: {len(registration_order)} queries; "
          f"witnessed: {len(witnessed)}; red-at-latest: {len(reds)}; "
          f"never-witnessed: {len(never)}")
    overflow = [n for n in never if n not in plan]
    if overflow:
        print(f"# WARNING: {len(overflow)} never-witnessed queries do not "
              f"fit the {window}-slot window; they queue for the round "
              "after:")
        for n in overflow:
            print(f"#   {n}")
    print("_PRIORITY: tuple[str, ...] = (")
    for n in plan:
        print(f'    "{n}",')
    print(")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
