"""Benchmark harness — runs the headline queries (QuerySpec.bench=True)
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Materialization is via the noop sink (full plan execution, no driver
collect), matching how a cluster job would be bounded by compute+shuffle
rather than result transfer.

Noise calibration (r03 vs r04, byte-identical code): per-query best-of-2
ratios spanned 0.66x-1.36x on this box, i.e. a single-query delta under
~1.4x is measurement noise, not signal.  The headline 35-query set is
FROZEN — only the aggregate total is comparable round-over-round, and
even it moves ~2% on identical code.  Do not chase sub-1.4x per-query
regressions; do not add/remove bench=True flags without noting it here.

r06-vs-r07 drift verdict: the r06 artifact's 31.15 s (vs r05's 27.80 s,
29/35 queries uniformly slower, both >1.4x movers in files untouched by
the r06 diff) was box-level measurement drift, NOT a plan regression —
the r07 idle-box re-measure on a functionally identical tree returned
26.56 s, with upsert_latest_per_topic back at 0.51 s (r06 artifact:
0.87 s; r05: 0.49 s) and count_min_topic_freq back at 0.98 s (r06:
1.41 s; r05: 0.93 s).  The per-run spread is now recorded under "runs"
so future artifacts carry their own noise evidence.

r08 (additions-only, methodology unchanged): queries whose in-window
spread ratio exceeds 1.5x are re-run in a later pass (burst windows are
minutes long; temporal separation de-contaminates the min) and entries
still spread-suspect after the re-run are flagged under
"suspect_queries"; /proc/loadavg is sampled before and after
("load_before"/"load_after").  Extra runs can only lower minima, so
round-over-round totals remain comparable.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from mqtt2sql_spark.registry import all_specs
    from mqtt2sql_spark.session import get_spark

    spark = get_spark("bench")
    # the tiny-aggregate ranking windows intentionally run unpartitioned
    # (documented in the plans); their WARN spam would otherwise bury the
    # JSON result line in the recorded output
    spark.sparkContext.setLogLevel("ERROR")
    # Intermittent DAGScheduler ERROR stack ("accessNonExistentAccumulator"):
    # a benign race between ContextCleaner GC'ing a finished query's SQL
    # metric accumulators and a straggler task's completion event (rc stays
    # 0, all results unaffected — witnessed once in the r05 artifact, not
    # reproducible on demand).  Real job failures still surface as Python
    # exceptions from the save() call.  Suppress ONLY that message class
    # (DAGScheduler logs it as "Failed to update accumulator ...") via a
    # DENY RegexFilter on the logger, so genuine stage/job failure
    # diagnostics stay visible in the recorded artifact (r06 ADVICE: the
    # previous blanket FATAL demotion hid all scheduler errors).
    try:
        jvm = spark.sparkContext._jvm
        ctx = jvm.org.apache.logging.log4j.core.LoggerContext.getContext(
            False
        )
        config = ctx.getConfiguration()
        deny = jvm.org.apache.logging.log4j.core.Filter.Result.DENY
        neutral = jvm.org.apache.logging.log4j.core.Filter.Result.NEUTRAL
        flt = jvm.org.apache.logging.log4j.core.filter.RegexFilter \
            .createFilter(
                ".*Failed to update accumulator.*", None, False,
                deny, neutral,
            )
        lc = config.getLoggerConfig(
            "org.apache.spark.scheduler.DAGScheduler"
        )
        lc.addFilter(flt)
        ctx.updateLoggers()
    except Exception:
        pass  # log4j2 API unavailable — cosmetic only, never fail bench

    specs = {n: s for n, s in all_specs().items() if s.bench}
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}

    def loadavg() -> list[float]:
        try:
            with open("/proc/loadavg") as f:
                return [float(x) for x in f.read().split()[:3]]
        except Exception:
            return []

    load_before = loadavg()

    # one warmup action so JVM/codegen startup isn't billed to the first query
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def timed_run(spec) -> float:
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 3)

    for name, spec in sorted(specs.items()):
        # one untimed warmup run per query excludes whole-stage-codegen /
        # JIT compilation of the plan (a per-process, not per-query, cost
        # on a long-lived cluster), then best-of-3 timed runs (this box
        # shows minute-scale external load spikes; the min is the only
        # robust statistic).  All three raw runs are recorded under
        # "runs" so round-over-round movement can be judged against the
        # same-process spread (r06's 1.12x headline drift was
        # indistinguishable from box noise without it).
        spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        runs: list[float] = []
        for _ in range(3):
            runs.append(timed_run(spec))
        timings[name] = min(runs)
        spreads[name] = runs

    # Contamination self-adjudication (r07 verdict item: the box's
    # co-tenant bursts span whole best-of-3 windows; r07's 50.9 s
    # artifact needed manual adjudication against an 8-core run).
    # A spread ratio (max/min) > 1.5 inside one query's window is the
    # burst signature — re-run those queries in a LATER, temporally
    # separated pass (bursts last minutes; by the end of the bench the
    # window has usually moved on) and keep the min over all runs.
    # Additions-only: queries/runs keep their meaning, extra runs can
    # only lower minima, and any query whose spread STILL exceeds 1.5x
    # after the re-run is flagged under "suspect_queries" so the
    # round-over-round comparison can discount it mechanically.
    reruns: dict[str, list[float]] = {}
    for name, spec in sorted(specs.items()):
        runs = spreads[name]
        if max(runs) / max(min(runs), 1e-9) > 1.5:
            extra = [timed_run(specs[name]) for _ in range(2)]
            reruns[name] = extra
            spreads[name] = runs + extra
            timings[name] = min(spreads[name])
    suspect = sorted(
        n for n, rs in spreads.items()
        if max(rs) / max(min(rs), 1e-9) > 1.5
    )
    load_after = loadavg()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": spreads,
                "reruns": reruns,
                "suspect_queries": suspect,
                "load_before": load_before,
                "load_after": load_after,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
