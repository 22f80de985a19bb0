"""Physical-plan audit over every registered query.

Emits one markdown row per query: scans, exchanges (shuffles),
broadcasts, window nodes, Python (Arrow) nodes, generators, and the
red-flag columns a scale review looks for first — cartesian products,
row-at-a-time Python UDFs, and unpartitioned windows over non-aggregate
inputs.  Plans are ANALYZED, not executed (except where noted AQE
re-planning would change the picture, which the per-query tests cover).

Caveat: ~20 plan functions call localCheckpoint(eager=True) for a
deterministic single materialization across branches, so fn() itself
HAS execution side effects — "plan-only" audit still runs those
upstream jobs (at the tiny default sf0.001 this is seconds, not
minutes; see operators/stats.py module docstring for the tradeoff).

Usage:  python tools/audit_plans.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from mqtt2sql_spark.registry import all_specs
    from mqtt2sql_spark.session import get_spark

    spark = get_spark("audit_plans", cpus=4, shuffle_partitions=4)
    jvm = spark.sparkContext._jvm

    print(f"# Physical-plan audit ({sf_dir})")
    print()
    print(
        "| query | scans | shuffles | broadcasts | windows | arrow-py |"
        " generates | red flags |"
    )
    print("|---|---|---|---|---|---|---|---|")
    n_flagged = 0
    for name, spec in all_specs().items():
        try:
            df = spec.fn(spark, sf_dir)
            plan = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "simple"
            )
        except Exception as e:  # pragma: no cover - surfaced in the report
            print(f"| {name} | ERROR: {str(e).splitlines()[0][:80]} |")
            n_flagged += 1
            continue
        scans = len(re.findall(r"FileScan parquet|Scan parquet", plan))
        shuffles = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )
        bcasts = plan.count("BroadcastExchange")
        windows = plan.count("Window ") + plan.count("WindowGroupLimit")
        arrow = (
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        )
        gens = plan.count("Generate ")
        flags = []
        if "CartesianProduct" in plan:
            flags.append("cartesian")
        if "BatchEvalPython" in plan or "PythonUDTF" in plan:
            # specs tagged slow-path-demo deliberately exercise a
            # row-based Python API (e.g. the UDTF surface demo over a
            # dimension-sized input) — annotate, don't red-flag
            if "slow-path-demo" in spec.tags:
                flags.append("row-py(documented-demo)")
            else:
                flags.append("row-at-a-time-py")
        if any(f == "cartesian" or f == "row-at-a-time-py" for f in flags):
            n_flagged += 1
        print(
            f"| {name} | {scans} | {shuffles} | {bcasts} | {windows} |"
            f" {arrow} | {gens} | {', '.join(flags) or '—'} |"
        )
    print()
    print(f"red-flagged queries: {n_flagged}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
