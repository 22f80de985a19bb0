"""Noise-free plan A/B: hash-compare normalized physical plans between
two checkouts of the repo.

This box suffers minutes-long cgroup-invisible co-tenant load bursts
(OPTIMIZATION_r07.md "Measurement environment"), so sub-second wall-clock
A/Bs routinely lie in both directions.  The decisive regression signal is
the STATIC PLAN: if a query's normalized `explain("formatted")` output is
byte-identical across two trees, no local plan regression is possible and
any wall-clock delta is box noise; if it differs, the diff names the
operator change to adjudicate against the round's change log.

Usage:
    python tools/plan_ab.py [--all] [--sf-dir DIR] [--out FILE]
        one tree: dump {query: md5(normalized plan)} as JSON (default
        headline/bench queries only; --all covers the full registry)
    python tools/plan_ab.py --diff A.json B.json
        compare two dumps, list differing queries

Typical round flow (r07 witnessed this catching a phantom regression:
revenue_by_region timed 0.83 s vs 2.10 s across trees in back-to-back
windows — plans byte-identical, pure burst noise):
    git worktree add /tmp/oldtree <baseline-commit>
    (cd /tmp/oldtree && python tools/plan_ab.py --out /tmp/old.json)
    python tools/plan_ab.py --out /tmp/new.json
    python tools/plan_ab.py --diff /tmp/old.json /tmp/new.json

Normalization strips per-process identifiers only (expression ids
`#123`, `plan_id=N`); everything semantic (operator list, join
strategies, PushedFilters, ReadSchema, partitioning) is compared.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _normalize(plan: str) -> str:
    plan = re.sub(r"#\d+", "#x", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=x", plan)
    # snapshot/localCheckpoint scans embed the process-global RDD id
    # (`MapPartitionsRDD[78] at localCheckpoint ...`): it counts every
    # RDD created earlier in the process, so ONE real plan change
    # early in a full-registry dump would cascade false diffs onto
    # every later snapshot-bearing query
    plan = re.sub(r"RDD\[\d+\]", "RDD[x]", plan)
    return plan


def dump(sf_dir: str, bench_only: bool) -> dict[str, str]:
    from mqtt2sql_spark.registry import all_specs
    from mqtt2sql_spark.session import get_spark

    spark = get_spark("plan_ab")
    spark.sparkContext.setLogLevel("ERROR")
    explain_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    out: dict[str, str] = {}
    for name, spec in sorted(all_specs().items()):
        if bench_only and not spec.bench:
            continue
        df = spec.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            explain_mode.fromString("formatted")
        )
        out[name] = hashlib.md5(_normalize(plan).encode()).hexdigest()
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--all", action="store_true", help="full registry, not just bench=True")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None, help="write JSON here (default stdout)")
    ap.add_argument("--diff", nargs=2, metavar=("A", "B"), help="compare two dumps")
    args = ap.parse_args()

    if args.diff:
        a = json.loads(Path(args.diff[0]).read_text())
        b = json.loads(Path(args.diff[1]).read_text())
        shared = sorted(set(a) & set(b))
        differing = [q for q in shared if a[q] != b[q]]
        only_a = sorted(set(a) - set(b))
        only_b = sorted(set(b) - set(a))
        print(f"shared: {len(shared)}  identical: {len(shared) - len(differing)}")
        for q in differing:
            print(f"differs: {q}")
        for q in only_a:
            print(f"only in {args.diff[0]}: {q}")
        for q in only_b:
            print(f"only in {args.diff[1]}: {q}")
        return 1 if differing else 0

    result = dump(args.sf_dir, bench_only=not args.all)
    text = json.dumps(result, indent=1, sort_keys=True)
    if args.out:
        Path(args.out).write_text(text)
        print(f"wrote {len(result)} plan hashes to {args.out}")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
