"""Similarity search over the `embeddings` table (array<float> len=64).

Two paths, mirroring a production ANN design:
  * brute-force cosine top-k — the exact baseline; JVM-side
    zip_with/aggregate fold (no Python UDF), broadcast of the small query
    set, window top-k per query;
  * sign-LSH (random-hyperplane) bucketed top-k — the 100 TB path: a
    64-bit-derived ±1 projection matrix (deterministic from md5, so both
    engines and any two cluster runs agree), 6-bit bucket keys, candidate
    generation by bucket equi-join instead of O(n·m) compare.

Ranking determinism across engines: rank on round(cos, 6) with vec_id
tie-break; output cosine rounded to 4.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mqtt2sql_spark.fixtures import load_table
from mqtt2sql_spark.plans.base import register

DIM = 64
N_PLANES = 6  # 2^6 = 64 LSH buckets
TOP_K = 5
QUERY_MOD = 50  # query set = vec_id % 50 == 0


def _plane_coef(plane: int, dim: int) -> int:
    """Deterministic ±1 projection coefficient from md5 (public SRP
    construction with Rademacher entries).  Must equal the SQL
    expression instr(hex, substring(md5(p||'|'||d),1,1)) % 2 mapping."""
    nibble = int(hashlib.md5(f"{plane}|{dim}".encode()).hexdigest()[0], 16)
    return 1 if nibble % 2 == 1 else -1


_COEFS = [[_plane_coef(p, d) for d in range(DIM)] for p in range(N_PLANES)]


def _dot(u, v):
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )


def _duck_coef_list(p: int) -> str:
    return "[" + ", ".join(f"{c}.0" for c in _COEFS[p]) + "]"


_DUCK_COS = (
    "list_inner_product(q.e, c.e) / "
    "(sqrt(list_inner_product(q.e, q.e)) * sqrt(list_inner_product(c.e, c.e)))"
)


# --- brute-force cosine top-k ---------------------------------------------


@register(
    "ann_cosine_topk",
    oracle=f"""
    , emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT query_id, vec_id, cos, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               round({_DUCK_COS}, 4) AS cos,
               CAST(row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round({_DUCK_COS}, 6) DESC, c.vec_id
               ) AS BIGINT) AS rank
        FROM emb q JOIN emb c ON q.vec_id <> c.vec_id
        WHERE q.vec_id % {QUERY_MOD} = 0
    ) WHERE rank <= {TOP_K}
    """,
    doc="Brute-force cosine top-k: broadcast the query set against the "
    "corpus, fold the dot product JVM-side, window top-k per query — the "
    "exact-ANN correctness baseline.",
    bench=True,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    joined = emb.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("qe"), F.col("e")) / (
        F.sqrt(_dot(F.col("qe"), F.col("qe")))
        * F.sqrt(_dot(F.col("e"), F.col("e")))
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cos6"), 6)), F.asc("vec_id")
    )
    return (
        joined.select(
            "query_id", "vec_id", cos.alias("cos6")
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "vec_id",
            F.round("cos6", 4).alias("cos"),
            "rank",
        )
    )


# --- sign-LSH bucketed top-k ----------------------------------------------


def lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id + 6-bit random-hyperplane bucket id (deterministic)."""
    emb = _emb(spark, sf_dir)
    bucket = None
    for p in range(N_PLANES):
        coef = F.array(*[F.lit(float(c)) for c in _COEFS[p]])
        bit = F.when(_dot(coef, F.col("e")) > 0, 1).otherwise(0)
        term = bit * (1 << p)
        bucket = term if bucket is None else bucket + term
    return emb.select("vec_id", "e", bucket.cast("int").alias("bucket"))


_DUCK_BUCKET = " + ".join(
    f"(CASE WHEN list_inner_product({_duck_coef_list(p)}, e) > 0 "
    f"THEN 1 ELSE 0 END) * {1 << p}"
    for p in range(N_PLANES)
)


@register(
    "ann_lsh_topk",
    oracle=f"""
    , emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    bkt AS (SELECT vec_id, e, CAST({_DUCK_BUCKET} AS INTEGER) AS bucket
            FROM emb)
    SELECT query_id, vec_id, cos, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               round({_DUCK_COS}, 4) AS cos,
               CAST(row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round({_DUCK_COS}, 6) DESC, c.vec_id
               ) AS BIGINT) AS rank
        FROM bkt q JOIN bkt c
          ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id % {QUERY_MOD} = 0
    ) WHERE rank <= {TOP_K}
    """,
    doc="Sign-LSH bucketed ANN: deterministic ±1 hyperplane projections "
    f"({N_PLANES} planes → {1 << N_PLANES} buckets), equi-join on bucket "
    "instead of a full cross product, exact cosine re-rank inside the "
    "bucket — the scale path; recall measured against ann_cosine_topk "
    "in tests.",
    bench=True,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    bkt = lsh_buckets(spark, sf_dir)
    q = bkt.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    joined = bkt.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    cos = _dot(F.col("qe"), F.col("e")) / (
        F.sqrt(_dot(F.col("qe"), F.col("qe")))
        * F.sqrt(_dot(F.col("e"), F.col("e")))
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cos6"), 6)), F.asc("vec_id")
    )
    return (
        joined.select("query_id", "vec_id", cos.alias("cos6"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "vec_id", F.round("cos6", 4).alias("cos"), "rank"
        )
    )


# --- vector scalar ops -----------------------------------------------------


@register(
    "vector_norms",
    oracle="""
    SELECT vec_id, label,
           round(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))), 4)
               AS l2_norm,
           round(list_max(CAST(embedding AS DOUBLE[])), 4) AS max_val,
           round(list_min(CAST(embedding AS DOUBLE[])), 4) AS min_val,
           CAST(len(embedding) AS INTEGER) AS dim
    FROM embeddings
    """,
    doc="Vector scalar ops over array<float>: L2 norm (fold), min/max "
    "(array_min/array_max) — per-row, no shuffle, codegen'd.",
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return emb.select(
        "vec_id",
        "label",
        F.round(F.sqrt(_dot(F.col("e"), F.col("e"))), 4).alias("l2_norm"),
        F.round(F.array_max("e"), 4).alias("max_val"),
        F.round(F.array_min("e"), 4).alias("min_val"),
        F.size("e").alias("dim"),
    )
