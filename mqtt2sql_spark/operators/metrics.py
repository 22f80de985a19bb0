"""Single-pass pipeline metrics via the Observation API.

A 100 TB pipeline cannot afford a separate ``count()`` job per
dashboard number: every extra action is another full scan.  Spark's
``DataFrame.observe`` piggybacks aggregate metrics onto the job that is
already running — the metrics are computed by the same tasks that
produce the output rows, cost ~zero, and arrive on the driver when the
action finishes.

``observe_funnel`` instruments a DataFrame with named predicate
counters (rows seen, rows matching each condition) and returns the
instrumented frame plus the ``Observation`` handle; after ANY action on
the frame, ``observation.get`` yields the counts — the corpus-funnel
numbers (kept/dropped per filter stage) without a second scan.

The reference logs per-message write outcomes (mqtt2sql.py:368-423);
this is the batch-native generalization: per-JOB counters instead of
per-row log lines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_funnel(
    df: DataFrame, name: str, **conditions: Column
) -> tuple[DataFrame, Observation]:
    """Attach ``n_rows`` plus one ``n_<key>`` counter per condition.

    The counters are ordinary aggregate expressions evaluated inside
    the existing job (map-side, merged on the driver) — no extra scan,
    no shuffle, works under AQE and whole-stage codegen.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for key, cond in conditions.items():
        metrics.append(
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"n_{key}")
        )
    return df.observe(obs, *metrics), obs
