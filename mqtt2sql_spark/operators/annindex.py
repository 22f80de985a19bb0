"""Persisted IVF index lifecycle: build once, store as tables, serve
queries with partition pruning.

ann_ivf_topk (plans/similarity.py) recomputes cell assignment per query
— right for the oracle gate, wrong for serving: at 100 TB the index IS
the asset.  This module materializes the two IVF relations the way a
vector store lays them out:

  <index_dir>/centroids/   (cent_id, ce)            — K rows, broadcastable
  <index_dir>/postings/    cell=<id>/ (vec_id, e)   — corpus partitioned
                                                      BY CELL on disk

and serves top-k by (1) ranking the nprobe nearest cells per query
against the broadcast centroids, (2) collecting the probe-cell ID SET
(bounded by n_queries x nprobe — tiny, and the only driver
materialization) into a literal IN-filter so the postings scan does
STATIC PARTITION PRUNING (`PartitionFilters: cell IN (...)` — asserted
in tests), (3) exact cosine re-rank inside the surviving cells.

A probe touches nprobe/K of the corpus files; everything else is never
opened.  That file-skipping is the disk analogue of the in-plan cell
join the fresh-path query uses, and is how IVF actually pays off at
scale: the 100 TB corpus sits still, queries read a few cells.

Same determinism rules as the fresh path (rounded-cosine rank with
vec_id tie-break, data-derived centroid seeds), so a persisted index
returns bit-identical results to ann_ivf_topk — proven in
tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def _dot(u, v):
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _cos(u, v):
    return _dot(u, v) / (F.sqrt(_dot(u, u)) * F.sqrt(_dot(v, v)))


def build_ivf_index(
    emb: DataFrame, index_dir: str, cell_mod: int = 37
) -> None:
    """emb: (vec_id long, e array<double>).  Writes centroids + postings."""
    cent = emb.filter(F.col("vec_id") % cell_mod == 1).select(
        F.col("vec_id").alias("cent_id"), F.col("e").alias("ce")
    )
    w_assign = W.partitionBy("vec_id").orderBy(
        F.desc(F.round(F.col("ccos"), 6)), F.asc("cent_id")
    )
    assigned = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "e", "cent_id", _cos(F.col("e"), F.col("ce")).alias("ccos")
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "e", F.col("cent_id").alias("cell"))
    )
    cent.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{index_dir}/postings"
    )


def query_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    n_probe: int = 3,
    top_k: int = 5,
) -> DataFrame:
    """queries: (query_id long, qe array<double>) → (query_id, vec_id,
    cos, rank) — bit-identical to the fresh-path ann_ivf_topk ranking."""
    cent = spark.read.parquet(f"{index_dir}/centroids")
    w_probe = W.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("qcos"), 6)), F.asc("cent_id")
    )
    probes = (
        queries.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qe",
            "cent_id",
            _cos(F.col("qe"), F.col("ce")).alias("qcos"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qe", F.col("cent_id").alias("cell"))
    )
    # the probe-cell set is <= n_queries * n_probe ids — the one driver
    # materialization, and the price of static partition pruning below
    cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    post = spark.read.parquet(f"{index_dir}/postings").filter(
        F.col("cell").isin(cells)
    )
    w_rank = W.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cos6"), 6)), F.asc("vec_id")
    )
    return (
        post.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", _cos(F.col("e"), F.col("qe")).alias("cos6")
        )
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id", "vec_id", F.round("cos6", 4).alias("cos"), "rank"
        )
    )
