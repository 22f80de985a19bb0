"""Query registry plumbing.

Every operator from SURVEY.md §2 (and every extension operator) is a
``QuerySpec``: a PySpark builder plus the equivalent DuckDB oracle SQL.
The driver's t2 gate runs both at sf0.01 and hash-compares; keys here are
exactly the oracle keys named in SURVEY.md §2.

Column-name / type parity rules (enforced by tools/check_oracle.py):
  * alias every computed column identically in Spark and SQL;
  * cast row_number to BIGINT on both sides;
  * round double aggregates with the same round(x, n) on both sides;
  * never return raw binary — expose decoded strings or upper-hex.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from mqtt2sql_spark.fixtures import ORACLE_CTES

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL (without fixture CTEs) or None → rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)
    recursive: bool = False  # oracle uses a recursive CTE

    def oracle_sql(self) -> str | None:
        """Full oracle SQL with the shared fixture CTEs prepended."""
        if self.oracle is None:
            return None
        sql = self.oracle.strip()
        prefix = ORACLE_CTES.rstrip()
        if self.recursive:
            prefix = prefix.replace("WITH ", "WITH RECURSIVE ", 1)
        return prefix + "\n" + sql


class Registry:
    def __init__(self) -> None:
        self._specs: dict[str, QuerySpec] = {}

    def add(self, spec: QuerySpec) -> QuerySpec:
        if spec.name in self._specs:
            raise ValueError(f"duplicate query key: {spec.name}")
        self._specs[spec.name] = spec
        return spec

    def register(
        self,
        name: str,
        oracle: str | None,
        doc: str = "",
        bench: bool = False,
        tags: tuple[str, ...] = (),
        recursive: bool = False,
    ) -> Callable[[QueryFn], QueryFn]:
        def deco(fn: QueryFn) -> QueryFn:
            self.add(QuerySpec(name, fn, oracle, doc, bench, tags, recursive))
            return fn

        return deco

    def specs(self) -> dict[str, QuerySpec]:
        return dict(self._specs)


REGISTRY = Registry()
register = REGISTRY.register
