"""Aggregate query registry — importing this module registers all plans."""

from __future__ import annotations

import importlib

from mqtt2sql_spark.plans.base import REGISTRY, QuerySpec

_PLAN_MODULES = (
    "mqtt2sql_spark.plans.core",
    "mqtt2sql_spark.plans.analytics",
    "mqtt2sql_spark.plans.dedup",
    "mqtt2sql_spark.plans.similarity",
    "mqtt2sql_spark.plans.text",
    "mqtt2sql_spark.plans.timeseries",
    "mqtt2sql_spark.plans.sketches",
    "mqtt2sql_spark.plans.multimodal",
)


def _load() -> None:
    for mod in _PLAN_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # plan modules land incrementally during the build
            if e.name and e.name.startswith("mqtt2sql_spark"):
                continue
            raise


_load()


def all_specs() -> dict[str, QuerySpec]:
    return REGISTRY.specs()
