#!/usr/bin/env python
"""Run any registered query by name against a fixture directory.

    python tools/run_query.py --list
    python tools/run_query.py agg_pricing_summary
    python tools/run_query.py market_share_by_nation --explain --limit 5
    python tools/run_query.py dedup_exact --sf-dir /root/testdata/sf0.1

The operational front door for the analytics surface (the daemon in
``python -m mqtt2sql_spark`` is the ingest front door): a reference
user's `SELECT ... FROM mqtt_history_view` workflow maps to
`run_query.py history_view_join`, and every SURVEY §2 / extension
operator is reachable the same way.  `--explain` prints the formatted
physical plan instead of rows — the first thing to check before running
anything at real scale.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("name", nargs="?", help="query key (see --list)")
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    p.add_argument("--limit", type=int, default=20, help="rows to show")
    p.add_argument("--explain", action="store_true", help="print the plan")
    p.add_argument("--list", action="store_true", help="list query keys")
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)

    from mqtt2sql_spark.registry import all_specs

    specs = all_specs()
    if args.list or not args.name:
        for name, spec in specs.items():
            first = (spec.doc or "").split(".")[0][:90]
            print(f"{name:36s} {first}")
        return 0
    if args.name not in specs:
        print(f"unknown query {args.name!r}; try --list", file=sys.stderr)
        return 2

    from mqtt2sql_spark.session import get_spark

    spark = get_spark("run_query", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = specs[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    t0 = time.time()
    rows = df.limit(args.limit).collect()
    n = df.count()
    print(f"-- {args.name}: {n} rows in {time.time() - t0:.2f}s "
          f"(showing {min(args.limit, n)})")
    header = df.columns
    print(" | ".join(header))
    for r in rows:
        print(" | ".join(str(v) for v in r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
