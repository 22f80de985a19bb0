"""Time every registered query once (noop sink) and rank by cost.

The bench set covers the headline queries; this audit sweeps the WHOLE
registry so a regression in a non-headline plan can't hide.  Single
timed run per query (after one shared session warmup) — coarse, but
enough to rank hotspots for a deeper best-of-N look.

Usage:  python tools/time_queries.py [sf_dir] [top_n]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from mqtt2sql_spark.registry import all_specs
    from mqtt2sql_spark.session import get_spark

    spark = get_spark("time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # JVM warmup

    timings: dict[str, float] = {}
    for name, spec in all_specs().items():
        t0 = time.perf_counter()
        try:
            spec.fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            timings[name] = time.perf_counter() - t0
        except Exception as e:  # pragma: no cover
            print(f"ERROR {name}: {str(e).splitlines()[0][:100]}")
    total = sum(timings.values())
    print(f"# {len(timings)} queries, {total:.1f}s total at {sf_dir}")
    for name, t in sorted(timings.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{t:8.3f}  {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
