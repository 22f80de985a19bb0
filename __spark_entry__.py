"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — the oracle-checked operator inventory
from SURVEY.md §2 plus extension operators; implemented in
``mqtt2sql_spark.plans.*`` and aggregated by ``mqtt2sql_spark.registry``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from mqtt2sql_spark.registry import all_specs  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's full dataflow — messages → keyed
    upsert (latest per topic) → diff-only CDC history → history view join
    (SURVEY.md §2 A5+A10+A11)."""
    from mqtt2sql_spark.plans.core import history_view_join

    return history_view_join(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, spec in all_specs().items():
        sql = spec.oracle_sql()
        if sql is not None:
            out[name] = sql
    return out
