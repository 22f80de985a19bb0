"""Connected components by iterative min-label propagation.

Near-dup candidate pairs form a graph; the dedup *decision* needs its
transitive closure (A~B, B~C ⇒ {A,B,C} share one canonical doc).  This is
the one genuinely iterative operator in the engine: a driver-side loop of
DataFrame steps (Pregel-style), converging when no label changes — the
pattern GraphX/GraphFrames use, expressed with joins + aggregates so it
runs on any Spark.

Scale: each iteration is one shuffle by vertex; iterations ≈ graph
diameter (near-dup clusters are shallow — a handful).  localCheckpoint
per iteration truncates the growing lineage, which would otherwise
re-execute the whole history every iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mqtt2sql_spark.operators.materialize import snapshot


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    vertex: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """(vertex, component) with component = min vertex id reachable.

    `vertices` fixes the universe (isolated vertices become singleton
    components).  Deterministic: min-label propagation has a unique
    fixpoint.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = vertices.select(
        F.col(vertex).alias("u"), F.col(vertex).cast("long").alias("label")
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("u", "v2"), sym["v"] == F.col("v2"))
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
            .transform(snapshot)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("u").alias(vertex), F.col("label").alias("component"))
