"""100x stress sweep (VERDICT r07 item 7): run a query set against the
/tmp/scale100 replica (tools/build_scale100.py) with a per-query
job-group cancel, hunting two at-scale failure classes that local-SF
benches cannot see:

- static-broadcast deaths: a statically planned BroadcastHashJoin whose
  build side is corpus-grain collects the query's largest relation to
  the driver ("serialized results bigger than spark.driver.maxResultSize",
  the r07 dedup_ngram_jaccard failure) — AQE cannot demote it;
- super-linear operators: a query that takes > timeout at 100x while
  its sf0.1 time is sub-second is quadratic-or-worse in the corpus
  (unless it is a documented exact baseline).

Usage:
    python tools/stress_sweep.py [--dir /tmp/scale100] [--timeout 120]
        [--names FILE] [--tags t1,t2] [--out FILE]

--names: file with one query name per line (comments with #).
--tags:  include every registered query carrying any of these tags.
Selections union; with neither, the bench headline set runs.
Each row records seconds, CANCELLED (hit the timeout), or the first
line of the error.  The timeout is enforced with setJobGroup +
cancelJobGroup from a watchdog thread; plan build (driver-side) is
not cancellable, so a row can exceed the timeout by its planning time.
"""

from __future__ import annotations

import argparse
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/scale100")
    ap.add_argument("--timeout", type=float, default=120.0)
    ap.add_argument("--names", default=None)
    ap.add_argument("--tags", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from mqtt2sql_spark.registry import all_specs
    from mqtt2sql_spark.session import get_spark

    specs = all_specs()
    selected: list[str] = []
    if args.names:
        for line in Path(args.names).read_text().splitlines():
            name = line.split("#")[0].strip()
            if name:
                if name not in specs:
                    print(f"WARNING: unknown query {name!r}", file=sys.stderr)
                else:
                    selected.append(name)
    if args.tags:
        want = set(args.tags.split(","))
        selected.extend(
            n for n, s in specs.items() if want & set(s.tags)
        )
    if not selected:
        selected = [n for n, s in specs.items() if s.bench]
    # de-dup preserving order
    seen: set[str] = set()
    names = [n for n in selected if not (n in seen or seen.add(n))]

    spark = get_spark("stress_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.dir}/region.parquet").count()  # JVM warmup

    rows: list[tuple[str, str, float]] = []
    for i, name in enumerate(names):
        spec = specs[name]
        result: dict[str, str] = {}

        def run() -> None:
            spark.sparkContext.setJobGroup(name, f"stress {name}")
            try:
                df = spec.fn(spark, args.dir)
                df.write.mode("overwrite").format("noop").save()
                result["status"] = "ok"
            except Exception as e:  # noqa: BLE001
                msg = str(e).splitlines()[0][:160] if str(e) else repr(e)
                result["status"] = (
                    "CANCELLED" if "cancelled" in msg.lower() else f"ERROR {msg}"
                )

        t0 = time.perf_counter()
        th = threading.Thread(target=run, daemon=True)
        th.start()
        th.join(args.timeout)
        if th.is_alive():
            spark.sparkContext.cancelJobGroup(name)
            th.join(60)
            status = "CANCELLED" if not th.is_alive() else "STUCK"
            if result.get("status") == "ok":  # finished during the grace join
                status = "ok"
        else:
            status = result.get("status", "ERROR no status")
        dt = time.perf_counter() - t0
        rows.append((name, status, dt))
        print(f"[{i + 1}/{len(names)}] {dt:8.1f}s  {status:<9.40s}  {name}",
              flush=True)

    lines = ["| query | status | sec |", "|---|---|---|"]
    for name, status, dt in sorted(rows, key=lambda r: -r[2]):
        lines.append(f"| {name} | {status} | {dt:.1f} |")
    report = "\n".join(lines)
    n_bad = sum(1 for _, s, _ in rows if s != "ok")
    report += f"\n\n{len(rows)} queries, {n_bad} not-ok\n"
    if args.out:
        Path(args.out).write_text(report)
    print(report)
    return 0


if __name__ == "__main__":
    sys.exit(main())
