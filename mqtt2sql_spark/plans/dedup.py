"""Deduplication operators over `documents` / `embeddings` — the dedup
stages of a 100 TB training-data pipeline (exact, MinHash+LSH banding,
SimHash, n-gram Jaccard, embedding-cosine near-dup).

All algorithms follow the public literature (Broder '97 minhash/shingling,
Charikar '02 simhash, standard LSH banding) and are expressed as pure
DataFrame ops — hashes via md5 so both engines compute identical values.

Scale design:
  * shingling/minhash is a per-doc map + one groupBy(doc_id) — partial
    aggregation applies, shuffle carries 16 hashes per doc, not shingles;
  * LSH candidate pairs come from an equi-join on (band_idx, band_key) —
    a hash-shuffle join on a key that buckets ~uniformly;
  * frequent-shingle pruning (df > 50 docs) bounds the worst-case join
    fan-out on skewed shingles — the standard stop-shingle treatment;
  * the brute-force O(n²) embedding pass exists as the correctness
    baseline; the LSH-bucketed path (plans/similarity.py) is the scale
    path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mqtt2sql_spark.operators.materialize import snapshot

from mqtt2sql_spark.fixtures import load_table
from mqtt2sql_spark.functions.text import (
    STOPWORDS,
    count_in_list,
    duck_normalized,
    duck_tokens,
    normalized_text,
    tokens,
)

__all__ = ["shingles", "minhash_bands"]
from mqtt2sql_spark.operators.partitioning import fan_out
from mqtt2sql_spark.plans.base import REGISTRY, register

N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS
MAX_SHINGLE_DF = 50  # stop-shingle pruning threshold (docs per shingle)

# Universal-hash family for minhash: ONE md5 per shingle supplies a
# 32-bit base value; the 16 independent hashes are affine mixes
# h_i = (a_i·hv + b_i) mod P (Carter-Wegman).  This replaces the
# 16-md5s-per-shingle formulation (16× the digest cost on the hottest
# scan of the dedup suite) with integer multiply-adds that stay inside
# whole-stage codegen.  Bounds: a_i < 2^31, hv < 2^32 ⇒ a_i·hv + b_i
# < 2^63 — no BIGINT overflow in either engine (DuckDB raises on
# overflow; Spark would wrap silently — both stay exact here).
_MH_P = 4294967311  # smallest prime > 2^32
import random as _random

_rng = _random.Random(20240813)  # fixed seed: constants are part of the spec
_MH_A = [_rng.randrange(1, 1 << 31) | 1 for _ in range(N_MINHASH)]
_MH_B = [_rng.randrange(0, 1 << 31) for _ in range(N_MINHASH)]

# DuckDB: hv = first 8 md5 nibbles as a 32-bit int (instr-based nibble
# math, the sketches.py pattern — DuckDB has no hex→int conv())
_MH_HEX = "0123456789abcdef"
_DUCK_HV = " + ".join(
    f"CAST(instr('{_MH_HEX}', substr(hh, {i + 1}, 1)) - 1 AS BIGINT)"
    f" * {16 ** (7 - i)}"
    for i in range(8)
)
JACCARD_MIN = 0.02
COSINE_MIN = 0.35
# corpus tile size for the exact-cosine block matmul: bounds per-pass
# driver/broadcast memory at O(EMB_TILE_ROWS·dim).  1024 keeps the sf0.1
# fixture on the multi-tile path (2000 rows → 2 tiles) so the oracle gate
# exercises the tile loop; a cluster deployment raises it to its broadcast
# budget (e.g. 1M rows × 64 dims × 8 B ≈ 512 MB per pass).
EMB_TILE_ROWS = 1024

# --- shared shingle derivation (Spark) ------------------------------------


def shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, shingle), 3-word shingles built array-natively:
    transform over the token array → array_distinct → one explode.

    No window, no per-doc sort, no pos-explode — the whole derivation is
    a per-row codegen'd expression followed by a single generator, which
    is ~2× faster than the lead()-window formulation and shuffles
    nothing.
    """
    # the fixture is one small parquet file → one input split; fan out
    # before the explode so shingling parallelizes (at corpus scale the
    # scan has thousands of splits and this repartition is a no-op cost)
    docs = load_table(spark, sf_dir, "documents").transform(fan_out, spark, "doc_id")
    # posexplode evaluates the regex tokenizer ONCE per doc; building the
    # shingle array with transform+get(t, i) instead would re-evaluate the
    # tokenizer per element (observed 7× slowdown) — generator + lead
    # window keeps the expensive expression single-evaluation
    pos = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "tok")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    return (
        pos.select(
            "doc_id",
            "tok",
            F.lead("tok", 1).over(w).alias("l1"),
            F.lead("tok", 2).over(w).alias("l2"),
        )
        .filter(F.col("l2").isNotNull())
        .select("doc_id", F.concat_ws(" ", "tok", "l1", "l2").alias("shingle"))
        .distinct()
    )


# Shared oracle CTE text for shingles (single source for all dedup oracles).
# DuckDB lists are 1-indexed (Spark arrays 0-indexed) — ranges shifted.
_DUCK_SHINGLES = f"""
, toks AS (
    SELECT doc_id, {duck_tokens()} AS t FROM documents
),
tokpos AS (
    SELECT doc_id, unnest(t) AS tok FROM toks
),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, greatest(len(t) - 1, 1)),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
           ))) AS shingle
    FROM toks
)
"""

_DUCK_MINHASH = (
    _DUCK_SHINGLES
    + ", shv AS (SELECT doc_id, "
    + _DUCK_HV
    + " AS hv FROM (SELECT doc_id, md5(shingle) AS hh FROM sh))"
    + ", mh AS (SELECT doc_id, "
    + ", ".join(
        f"min(({_MH_A[i]} * hv + {_MH_B[i]}) % {_MH_P}) AS h{i}"
        for i in range(N_MINHASH)
    )
    + " FROM shv GROUP BY doc_id), bands AS (SELECT doc_id, "
    + ", ".join(
        "md5("
        + " || '|' || ".join(
            f"CAST(h{b * ROWS_PER_BAND + r} AS VARCHAR)"
            for r in range(ROWS_PER_BAND)
        )
        + f") AS b{b}"
        for b in range(N_BANDS)
    )
    + " FROM mh)"
)


def minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc raw minhash signature (doc_id, h0..h15).

    One md5 per shingle → 32-bit base → 16 Carter-Wegman affine mixes
    (see _MH_A/_MH_B/_MH_P above); min() per doc is partial-agg'd, so the
    shuffle carries 16 BIGINTs per doc, never shingles."""
    sh = shingles(spark, sf_dir)
    hv = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    shv = sh.select("doc_id", hv.alias("hv"))
    aggs = [
        F.min(
            (F.lit(_MH_A[i]) * F.col("hv") + F.lit(_MH_B[i])) % F.lit(_MH_P)
        ).alias(f"h{i}")
        for i in range(N_MINHASH)
    ]
    return shv.groupBy("doc_id").agg(*aggs)


def minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc minhash signature folded into N_BANDS band keys."""
    mh = minhash_sigs(spark, sf_dir)
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.col(f"h{b * ROWS_PER_BAND + r}").cast("string")
                    for r in range(ROWS_PER_BAND)
                ],
            )
        ).alias(f"b{b}")
        for b in range(N_BANDS)
    ]
    return mh.select("doc_id", *band_cols)


# --- exact dedup -----------------------------------------------------------


@register(
    "dedup_exact",
    oracle=f"""
    SELECT doc_id, norm_hash,
           CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY norm_hash)
                THEN 1 ELSE 0 END AS keep,
           CAST(count(*) OVER (PARTITION BY norm_hash) AS BIGINT)
               AS dup_group_size
    FROM (SELECT doc_id, md5({duck_normalized()}) AS norm_hash
          FROM documents)
    """,
    doc="Exact dedup: md5 over normalized text, keep min(doc_id) per "
    "group — hash-shuffle on the digest key, so identical 100 GB of "
    "near-identical docs still distribute across the cluster.",
    bench=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id", F.md5(normalized_text("text")).alias("norm_hash")
    )
    w = W.partitionBy("norm_hash")
    return hashed.select(
        "doc_id",
        "norm_hash",
        F.when(F.col("doc_id") == F.min("doc_id").over(w), 1)
        .otherwise(0)
        .alias("keep"),
        F.count(F.lit(1)).over(w).cast("long").alias("dup_group_size"),
    )


# --- minhash signatures ----------------------------------------------------


@register(
    "minhash_signatures",
    oracle=_DUCK_MINHASH
    + " SELECT doc_id, "
    + ", ".join(f"b{b}" for b in range(N_BANDS))
    + " FROM bands",
    doc=f"MinHash signatures: {N_MINHASH} md5-seeded min-hashes over "
    "3-word shingles, folded into "
    f"{N_BANDS} LSH band keys (Broder '97 / banding per MMDS ch.3).",
    bench=True,
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_bands(spark, sf_dir)


# --- minhash LSH candidate pairs ------------------------------------------


@register(
    "dedup_minhash_pairs",
    oracle=_DUCK_MINHASH
    + f"""
    , long_bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_idx, b{b} AS band_key FROM bands" for b in range(N_BANDS))}
    )
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM long_bands x JOIN long_bands y
      ON x.band_idx = y.band_idx AND x.band_key = y.band_key
     AND x.doc_id < y.doc_id
    """,
    doc="MinHash-LSH candidate pairs: docs sharing any band key.  Long "
    "(band_idx, band_key) layout → one equi-join, no O(n²) compare; the "
    "fixture has no true near-dups, so surviving pairs are the expected "
    "low-rate band collisions — synthetic-dup detection is covered in "
    "tests/test_dedup.py.",
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = minhash_bands(spark, sf_dir)
    stack_expr = ", ".join(f"{b}, b{b}" for b in range(N_BANDS))
    long_bands = bands.select(
        "doc_id",
        F.expr(f"stack({N_BANDS}, {stack_expr}) AS (band_idx, band_key)"),
    )
    x = long_bands.alias("x")
    y = long_bands.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )


# --- simhash ---------------------------------------------------------------

_SIMHASH_BITS = 32
_HEXMAP = "0123456789abcdef"


@register(
    "dedup_simhash",
    oracle=_DUCK_SHINGLES.replace("sh AS (", "sh_unused AS (")
    + f"""
    , tok_hash AS (
        SELECT doc_id, md5(tok) AS th FROM tokpos
    ),
    bits AS (
        SELECT doc_id, r.b AS b,
               CASE WHEN ((instr('{_HEXMAP}',
                               substring(th, CAST(r.b // 4 AS INTEGER) + 1, 1))
                           - 1)
                          // CAST(pow(2, r.b % 4) AS INTEGER)) % 2 = 1
                    THEN 1 ELSE -1 END AS sgn
        FROM tok_hash, range({_SIMHASH_BITS}) r(b)
    ),
    sb AS (
        SELECT doc_id, b, CASE WHEN sum(sgn) > 0 THEN 1 ELSE 0 END AS bit
        FROM bits GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(sum(bit * CAST(pow(2, b) AS BIGINT)) AS BIGINT) AS simhash
    FROM sb GROUP BY doc_id
    """,
    doc=f"SimHash (Charikar '02): {_SIMHASH_BITS}-bit signature — token "
    "occurrences vote ±1 per bit position (bits read from the token's md5 "
    "nibbles), majority sign becomes the bit.  Near-dup docs differ in "
    "few bits (Hamming).  Pure expression pipeline: explode → groupBy.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").transform(fan_out, spark, "doc_id")
    tok_hash = docs.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    ).select("doc_id", F.md5("tok").alias("th"))
    bits = tok_hash.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_SIMHASH_BITS - 1))).alias("b"),
        "th",
    ).select(
        "doc_id",
        "b",
        F.expr(
            f"CASE WHEN ((instr('{_HEXMAP}', "
            "substring(th, CAST(b DIV 4 AS INT) + 1, 1)) - 1) "
            "DIV CAST(pow(2, b % 4) AS INT)) % 2 = 1 "
            "THEN 1 ELSE -1 END"
        ).alias("sgn"),
    )
    sb = bits.groupBy("doc_id", "b").agg(
        F.when(F.sum("sgn") > 0, 1).otherwise(0).alias("bit")
    )
    return sb.groupBy("doc_id").agg(
        F.sum(F.col("bit") * F.pow(F.lit(2.0), F.col("b")).cast("long"))
        .cast("long")
        .alias("simhash")
    )


# --- n-gram Jaccard --------------------------------------------------------


@register(
    "dedup_ngram_jaccard",
    oracle=_DUCK_SHINGLES
    + f"""
    , rare AS (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING count(*) <= {MAX_SHINGLE_DF}
    ),
    dsh AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
    inter AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS c
        FROM dsh x JOIN dsh y USING (shingle)
        WHERE x.doc_id < y.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, jaccard FROM (
        SELECT doc_a, doc_b,
               round(CAST(c AS DOUBLE) / (na.n + nb.n - c), 4) AS jaccard
        FROM inter
        JOIN sizes na ON na.doc_id = doc_a
        JOIN sizes nb ON nb.doc_id = doc_b
    ) WHERE jaccard >= {JACCARD_MIN}
    """,
    doc="n-gram Jaccard near-dup pairs via shingle inverted index: "
    "frequent-shingle pruning (postings list > "
    f"{MAX_SHINGLE_DF} docs dropped) bounds pair fan-out on skewed "
    "shingles, then |A∩B| from per-shingle pair expansion and "
    "|A∪B| = |A|+|B|-|A∩B|.  One shuffle builds the postings lists "
    "(groupBy shingle + collect_list); candidate pairs and per-doc sizes "
    "are both derived map-side from that grouped output, so the "
    "expensive shingling scan feeds a single exchange instead of the "
    "three a self-join formulation needs (~2× at sf0.1).",
    bench=True,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingles(spark, sf_dir)
    # inverted index: shingle → postings list, stop-shingles pruned by
    # list size (equivalent to a df<=N window filter, without the window).
    # Measured (sf0.1): letting the sizes branch recompute this chain is
    # FASTER than localCheckpoint-materializing it (2.7 s vs 5.6 s) —
    # the checkpoint is a hard barrier over the full postings relation,
    # while the recomputed branch prunes to (shingle, ds) and overlaps
    # with the pair generator.  Keep the recompute.
    g = sh.groupBy("shingle").agg(F.collect_list("doc_id").alias("ds")).filter(
        F.size("ds") <= MAX_SHINGLE_DF
    )
    # per-doc surviving-shingle counts, from the postings lists (map-side
    # explode + hash agg; pair order inside ds is irrelevant to both)
    sizes = (
        g.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # candidate pairs: |ds|² expansion bounded by the pruning threshold,
    # generated in-partition (two generators, no second shuffle of the
    # shingle data), then hash-agg to intersection counts
    inter = (
        g.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .groupBy(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Catalyst's static row estimate for the pair aggregate collapses,
    # so without a hint it BROADCASTS inter (the largest relation here)
    # and the driver-side broadcast collect dies at scale (witnessed at
    # the 100x replica: >1 GB over spark.driver.maxResultSize; AQE
    # cannot demote a statically planned broadcast).  Pin the size
    # joins to shuffle-hash: fully distributed, and the doc-grain sizes
    # relation scales too, so it must not be broadcast-pinned either.
    na = sizes.alias("na").hint("shuffle_hash")
    nb = sizes.alias("nb").hint("shuffle_hash")
    return (
        inter.join(na, F.col("doc_a") == F.col("na.doc_id"))
        .join(nb, F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("c").cast("double")
                / (F.col("na.n") + F.col("nb.n") - F.col("c")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_MIN)
    )


# --- embedding-cosine near-dup --------------------------------------------


@register(
    "dedup_embedding_pairs",
    oracle=f"""
    SELECT doc_a, doc_b, cos FROM (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
               round(list_inner_product(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[]))
                     / (sqrt(list_inner_product(CAST(a.embedding AS DOUBLE[]),
                                                CAST(a.embedding AS DOUBLE[])))
                        * sqrt(list_inner_product(CAST(b.embedding AS DOUBLE[]),
                                                  CAST(b.embedding AS DOUBLE[])))),
                     4) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ) WHERE cos >= {COSINE_MIN}
    """,
    doc="Embedding-cosine near-dup pairs: distributed block-nested-loop "
    "matrix multiply — vectors hash into bounded-size blocks (TILE_ROWS "
    "each, crc32 on vec_id); every row replicates into each unordered "
    "block pair it belongs to (one explode), and each (bi, bj) group "
    "computes its cross-block (or within-block for bi=bj) cosines as "
    "ONE numpy matmul inside applyInPandas.  No driver collect, no "
    "broadcast, no serial pass loop: all O(B²/2) block pairs execute "
    "concurrently, each task bounded at O(2·TILE_ROWS·dim) memory, so "
    "at 100 TB the job is wider, never deeper.  Each ordered pair (a<b) "
    "surfaces exactly once — cross pairs only in their (bi<bj) group, "
    "within pairs only in the diagonal group.  Total shuffle is "
    "O(n·B) rows INCLUDING the embedding vectors, i.e. O(n²·dim/"
    "TILE_ROWS) bytes through one shuffle stage — quadratic in corpus "
    "size, so TILE_ROWS should scale UP with the corpus (shuffle bytes "
    "fall linearly in it while per-task memory rises) — the inherent "
    "cost of exact all-pairs; the "
    "LSH-bucketed path (plans/similarity.py) avoids the O(n²) work "
    "entirely and is the canonical scale path; this is the exact "
    "baseline.",
)
def dedup_embedding_pairs(
    spark: SparkSession, sf_dir: str, tile_rows: int = EMB_TILE_ROWS
) -> DataFrame:
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # bounded block assignment: crc32 hash-bucket on vec_id so block sizes
    # stay ~uniform whatever the id pattern; n_blocks from an aggregate
    # (count), never a data collect
    n = emb.count()
    n_blocks = max(1, -(-n // tile_rows))

    blk = F.pmod(F.crc32(F.col("vec_id").cast("string")), F.lit(n_blocks))
    # replicate each row into every unordered block pair it belongs to:
    # a row in block i joins groups (min(i,j), max(i,j)) for all j —
    # exactly once per group, including the diagonal (i, i)
    tagged = emb.withColumn("blk", blk.cast("int")).select(
        "vec_id",
        "embedding",
        "blk",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_blocks - 1))
        ).alias("other"),
    ).select(
        "vec_id",
        "embedding",
        "blk",
        F.least("blk", "other").alias("bi"),
        F.greatest("blk", "other").alias("bj"),
    )

    def block_cosine(key, pdf):
        bi, bj = key
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        if bi == bj:
            a_ids, a_mat = ids, mat
            c_ids, c_mat = ids, mat
        else:
            in_a = (pdf["blk"] == bi).to_numpy()
            a_ids, a_mat = ids[in_a], mat[in_a]
            c_ids, c_mat = ids[~in_a], mat[~in_a]
        if not len(a_ids) or not len(c_ids):
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"),
                 "doc_b": pd.Series(dtype="int64"),
                 "cos": pd.Series(dtype="float64")}
            )
        sims = np.round(a_mat @ c_mat.T, 4)  # BLAS: block × block
        # threshold on the ROUNDED value — the contract filters the
        # rounded output column, so 0.34996 → 0.35 must be kept
        ai, ci = np.where(sims >= COSINE_MIN)
        # orient every pair doc_a < doc_b; the a<c keep also removes the
        # diagonal and the (x,y)/(y,x) double-count in the bi==bj case
        keep = a_ids[ai] < c_ids[ci]
        out = pd.DataFrame(
            {
                "doc_a": a_ids[ai][keep],
                "doc_b": c_ids[ci][keep],
                "cos": sims[ai, ci][keep],
            }
        )
        if bi != bj:
            # cross group: pairs oriented the other way are found by
            # scanning the transpose — emit them too (c side < a side)
            keep_t = c_ids[ci] < a_ids[ai]
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {
                            "doc_a": c_ids[ci][keep_t],
                            "doc_b": a_ids[ai][keep_t],
                            "cos": sims[ai, ci][keep_t],
                        }
                    ),
                ],
                ignore_index=True,
            )
        return out

    return tagged.groupBy("bi", "bj").applyInPandas(
        block_cosine, "doc_a long, doc_b long, cos double"
    )


# --- transitive dup clusters (connected components) -------------------------


@register(
    "dedup_components",
    oracle=_DUCK_MINHASH
    + f"""
    , long_bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_idx, b{b} AS band_key FROM bands" for b in range(N_BANDS))}
    ),
    pairs AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM long_bands x JOIN long_bands y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
        SELECT doc_id AS src, doc_id AS dst FROM documents
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    )
    SELECT src AS doc_id, min(dst) AS component,
           CAST(count(*) AS BIGINT) AS reach_size
    FROM reach GROUP BY src
    """,
    doc="Transitive dup clusters: connected components over the "
    "MinHash-LSH candidate graph via iterative min-label propagation "
    "(operators/components.py, Pregel-style driver loop, localCheckpoint "
    "lineage truncation) — oracle is a recursive-CTE transitive closure. "
    "The canonical-doc choice per cluster (min doc_id) is what a dedup "
    "pipeline persists.",
    recursive=True,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2sql_spark.operators.components import connected_components

    pairs = dedup_minhash_pairs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    comp = connected_components(pairs, docs)
    # reach_size = size of the component, matching the closure oracle
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("reach_size")
    )
    return comp.join(sizes, "component").select(
        "doc_id", "component", "reach_size"
    )


# --- canonical representative per dup cluster ------------------------------


@register(
    "dedup_canonical_docs",
    oracle=_DUCK_MINHASH
    + f"""
    , long_bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_idx, b{b} AS band_key FROM bands" for b in range(N_BANDS))}
    ),
    pairs AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM long_bands x JOIN long_bands y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
        SELECT doc_id AS src, doc_id AS dst FROM documents
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    comp AS (
        SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
    )
    SELECT c.doc_id, c.component,
           first_value(c.doc_id) OVER (
               PARTITION BY c.component
               ORDER BY d.n_chars DESC, c.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS canonical_id,
           first_value(c.doc_id) OVER (
               PARTITION BY c.component
               ORDER BY d.n_chars DESC, c.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) = c.doc_id AS is_canonical
    FROM comp c JOIN documents d USING (doc_id)
    """,
    doc="Canonical-representative selection — the step a dedup pipeline "
    "actually persists: per transitive dup cluster (dedup_components), "
    "keep the longest document (n_chars, doc_id tie-break), mark the "
    "rest as drops.  One window over the component key; the cluster "
    "assignment comes from the Pregel-style min-label propagation in "
    "operators/components.py.",
    recursive=True,
)
def dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = dedup_components(spark, sf_dir).select("doc_id", "component")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = (
        W.partitionBy("component")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    joined = comp.join(docs, "doc_id")
    canonical = F.first("doc_id").over(w)
    return joined.select(
        "doc_id",
        "component",
        canonical.alias("canonical_id"),
        (canonical == F.col("doc_id")).alias("is_canonical"),
    )


# --- eval-set decontamination ----------------------------------------------

EVAL_SOURCE = "src0"  # the held-out/eval slice of the corpus
OVERLAP_MIN = 2  # shared 3-gram shingles required to flag a pair


@register(
    "decontaminate_overlap",
    oracle=_DUCK_SHINGLES
    + f"""
    , shsrc AS (
        SELECT s.doc_id, s.shingle, d.source
        FROM sh s JOIN documents d USING (doc_id)
    ),
    good AS (
        SELECT shingle FROM shsrc GROUP BY shingle
        HAVING count(*) <= {MAX_SHINGLE_DF}
           AND sum(CASE WHEN source = '{EVAL_SOURCE}' THEN 1 ELSE 0 END) >= 1
           AND sum(CASE WHEN source <> '{EVAL_SOURCE}' THEN 1 ELSE 0 END) >= 1
    )
    SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc,
           CAST(count(*) AS BIGINT) AS n_overlap
    FROM shsrc t
    JOIN shsrc e USING (shingle)
    JOIN good USING (shingle)
    WHERE t.source <> '{EVAL_SOURCE}' AND e.source = '{EVAL_SOURCE}'
    GROUP BY train_doc, eval_doc
    HAVING count(*) >= {OVERLAP_MIN}
    """,
    doc="Benchmark decontamination: flag training documents sharing "
    f"≥{OVERLAP_MIN} 3-gram shingles with any eval-set document "
    f"(source='{EVAL_SOURCE}') — the n-gram-overlap contamination check "
    "every LLM training pipeline runs against its eval suites "
    "(GPT-3/PaLM style N-gram collision).  Spark: ONE shuffle builds "
    "split eval/train postings lists per shingle (collect_list skips "
    "nulls); candidate pairs explode in-partition from lists already "
    f"pruned to df≤{MAX_SHINGLE_DF} and to shingles present on BOTH "
    "sides, so the pair fan-out is bounded and the corpus is never "
    "self-joined.",
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingles(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    tagged = sh.join(src, "doc_id").withColumn(
        "is_eval", (F.col("source") == EVAL_SOURCE)
    )
    g = (
        tagged.groupBy("shingle")
        .agg(
            F.collect_list(
                F.when(F.col("is_eval"), F.col("doc_id"))
            ).alias("ev"),
            F.collect_list(
                F.when(~F.col("is_eval"), F.col("doc_id"))
            ).alias("tr"),
        )
        .filter(
            (F.size("ev") >= 1)
            & (F.size("tr") >= 1)
            & (F.size("ev") + F.size("tr") <= MAX_SHINGLE_DF)
        )
    )
    pairs = g.select(
        F.explode("tr").alias("train_doc"), "ev"
    ).select("train_doc", F.explode("ev").alias("eval_doc"))
    return (
        pairs.groupBy("train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= OVERLAP_MIN)
    )


# --- dedup observability ----------------------------------------------------


@register(
    "dedup_rate_by_source",
    oracle=f"""
    , marked AS (
        SELECT doc_id,
               CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY norm_hash)
                    THEN 1 ELSE 0 END AS keep
        FROM (SELECT doc_id, md5({duck_normalized()}) AS norm_hash
              FROM documents)
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(1 - keep) AS BIGINT) AS n_dropped,
           round(sum(1 - keep) * 1000 / count(*), 4) AS drop_per_mille
    FROM marked JOIN documents USING (doc_id)
    GROUP BY source
    """,
    doc="Dedup observability: per-source drop rate of the exact-dedup "
    "stage — the dashboard aggregate a 100 TB pipeline reads before "
    "trusting a crawl source.  Composes the dedup marking with the "
    "source dimension: the marking shuffles on the digest, the re-join "
    "to source is on doc_id, and the final rollup is |sources| rows "
    "from one partial-agg'd shuffle.  The rate is an exact integer "
    "expression (*1000 then round) so no float summation is involved.",
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    marked = dedup_exact(spark, sf_dir).select("doc_id", "keep")
    return (
        marked.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(1 - F.col("keep")).cast("long").alias("n_dropped"),
            F.round(
                F.sum(1 - F.col("keep")) * 1000 / F.count(F.lit(1)), 4
            ).alias("drop_per_mille"),
        )
    )


# --- sketch accuracy: minhash estimate vs true Jaccard ----------------------

PAIR_MOD = 10  # evaluation pairs: (doc_id, doc_id+1) for doc_id % 10 == 0


@register(
    "minhash_jaccard_estimate",
    oracle=_DUCK_MINHASH
    + f"""
    , pairs AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
               round(({" + ".join(f"CAST(x.h{i} = y.h{i} AS INTEGER)" for i in range(N_MINHASH))})
                     * 1.0 / {N_MINHASH}, 4) AS est_jaccard
        FROM mh x JOIN mh y ON y.doc_id = x.doc_id + 1
        WHERE x.doc_id % {PAIR_MOD} = 0
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_int
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND b.doc_id = a.doc_id + 1
        WHERE a.doc_id % {PAIR_MOD} = 0
        GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b, p.est_jaccard,
           round(COALESCE(n_int, 0) * 1.0
                 / (sa.n_sh + sb.n_sh - COALESCE(n_int, 0)), 4)
               AS true_jaccard
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
    """,
    doc="Sketch-accuracy evaluation: minhash-estimated Jaccard "
    f"(matching hashes / {N_MINHASH}) vs the true shingle-set Jaccard, "
    "for a deterministic sample of consecutive-doc pairs — the "
    "calibration readout that justifies trusting the sketch before the "
    "banded LSH join replaces exact comparison at 100 TB.  The estimate "
    "side joins 16-integer signatures (tiny); the truth side counts "
    "shingle intersections with an equi-join keyed on the shingle "
    "(postings-style, no pairwise text compare); both ratios divide "
    "exact integers so the engines round identically.",
)
def minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    mh = minhash_sigs(spark, sf_dir)
    x = mh.alias("x")
    y = mh.alias("y")
    matches = sum(
        F.when(F.col(f"x.h{i}") == F.col(f"y.h{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    pairs = (
        x.join(
            y,
            (F.col("y.doc_id") == F.col("x.doc_id") + 1)
            & (F.col("x.doc_id") % PAIR_MOD == 0),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.round(matches * F.lit(1.0) / N_MINHASH, 4).alias("est_jaccard"),
        )
    )
    sh = shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("b.doc_id") == F.col("a.doc_id") + 1)
            & (F.col("a.doc_id") % PAIR_MOD == 0),
        )
        .groupBy(
            F.col("a.doc_id").alias("i_doc_a"),
            F.col("b.doc_id").alias("i_doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_int"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("sa_id"), F.col("n_sh").alias("n_sh_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("sb_id"), F.col("n_sh").alias("n_sh_b")
    )
    return (
        # sizes is DOC-GRAIN (scales with the corpus) — no broadcast
        # hint; AQE still broadcasts it under the threshold locally and
        # degrades to a shuffle join at cluster scale instead of OOMing
        # the driver
        pairs.join(sa, F.col("doc_a") == F.col("sa_id"))
        .join(sb, F.col("doc_b") == F.col("sb_id"))
        .join(
            inter,
            (F.col("doc_a") == F.col("i_doc_a"))
            & (F.col("doc_b") == F.col("i_doc_b")),
            "left",
        )
        .select(
            "doc_a",
            "doc_b",
            "est_jaccard",
            F.round(
                F.coalesce(F.col("n_int"), F.lit(0))
                * F.lit(1.0)
                / (F.col("n_sh_a") + F.col("n_sh_b") - F.coalesce(F.col("n_int"), F.lit(0))),
                4,
            ).alias("true_jaccard"),
        )
    )


@register(
    "contamination_rate_by_source",
    oracle=_DUCK_SHINGLES
    + f"""
    , shsrc AS (
        SELECT s.doc_id, s.shingle, d.source
        FROM sh s JOIN documents d USING (doc_id)
    ),
    good AS (
        SELECT shingle FROM shsrc GROUP BY shingle
        HAVING count(*) <= {MAX_SHINGLE_DF}
           AND sum(CASE WHEN source = '{EVAL_SOURCE}' THEN 1 ELSE 0 END) >= 1
           AND sum(CASE WHEN source <> '{EVAL_SOURCE}' THEN 1 ELSE 0 END) >= 1
    ),
    flagged AS (
        SELECT DISTINCT train_doc FROM (
            SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc
            FROM shsrc t
            JOIN shsrc e USING (shingle)
            JOIN good USING (shingle)
            WHERE t.source <> '{EVAL_SOURCE}' AND e.source = '{EVAL_SOURCE}'
            GROUP BY 1, 2
            HAVING count(*) >= {OVERLAP_MIN}
        )
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(count(f.train_doc) AS BIGINT) AS n_contaminated,
           round(count(f.train_doc) * 10000 / count(*), 4)
               AS contam_per_10k
    FROM documents d
    LEFT JOIN flagged f ON f.train_doc = d.doc_id
    WHERE d.source <> '{EVAL_SOURCE}'
    GROUP BY source
    """,
    doc="Contamination observability: per-source rate of training docs "
    "flagged by the n-gram eval-overlap check — the per-crawl readout "
    "that decides whether a source is quarantined before training.  "
    "Composes decontaminate_overlap's flagged set (distinct train side) "
    "with the source dimension; the rate is exact integer arithmetic "
    "(*10000 then round).",
)
def contamination_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    flagged = (
        decontaminate_overlap(spark, sf_dir)
        .select(F.col("train_doc"))
        .distinct()
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    joined = docs.filter(F.col("source") != EVAL_SOURCE).join(
        flagged, docs["doc_id"] == flagged["train_doc"], "left"
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("train_doc").cast("long").alias("n_contaminated"),
        F.round(
            F.count("train_doc") * 10000 / F.count(F.lit(1)), 4
        ).alias("contam_per_10k"),
    )


# --- incremental dedup: new crawl batch vs existing corpus -----------------

_INCR_MOD = 5  # doc_id % 5 == 0 → "new batch" (~20%), else existing corpus


@register(
    "incremental_dedup_new_batch",
    oracle=_DUCK_MINHASH
    + f"""
    , long_bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_idx, b{b} AS band_key FROM bands" for b in range(N_BANDS))}
    ),
    hits AS (
        SELECT n.doc_id,
               CAST(count(DISTINCT o.doc_id) AS BIGINT) AS n_old_collisions,
               min(o.doc_id) AS first_old_match
        FROM long_bands n JOIN long_bands o
          ON n.band_idx = o.band_idx AND n.band_key = o.band_key
        WHERE n.doc_id % {_INCR_MOD} = 0 AND o.doc_id % {_INCR_MOD} <> 0
        GROUP BY n.doc_id
    )
    SELECT b.doc_id,
           CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END AS is_dup,
           coalesce(h.n_old_collisions, 0) AS n_old_collisions,
           h.first_old_match
    FROM (SELECT DISTINCT doc_id FROM bands
          WHERE doc_id % {_INCR_MOD} = 0) b
    LEFT JOIN hits h ON h.doc_id = b.doc_id
    """,
    doc="Incremental near-dup screening — the production crawl-update "
    "shape: a NEW batch of documents (doc_id % 5 = 0 stands in for "
    "'this week's crawl') is checked against the EXISTING corpus's LSH "
    "index without re-pairing the old corpus against itself.  The old "
    "side reuses the same (band_idx, band_key) long layout as "
    "dedup_minhash_pairs — at scale that index is precomputed and "
    "stored bucketed by band_key, so each incremental batch costs "
    "one signature pass over the NEW docs plus a co-located probe "
    "join, never O(corpus) shuffle (the new side is the small one: "
    "Spark broadcasts it under AQE when it fits).  Output per new doc: "
    "dup flag, how many distinct old docs collide in any band, and the "
    "smallest colliding old doc id as a deterministic witness.",
)
def incremental_dedup_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = minhash_bands(spark, sf_dir)
    stack_expr = ", ".join(f"{b}, b{b}" for b in range(N_BANDS))
    long_bands = bands.select(
        "doc_id",
        F.expr(f"stack({N_BANDS}, {stack_expr}) AS (band_idx, band_key)"),
    )
    new_b = long_bands.filter(F.col("doc_id") % _INCR_MOD == 0)
    old_b = long_bands.filter(F.col("doc_id") % _INCR_MOD != 0).select(
        F.col("doc_id").alias("old_doc"), "band_idx", "band_key"
    )
    hits = (
        new_b.join(old_b, ["band_idx", "band_key"])
        .groupBy("doc_id")
        .agg(
            F.countDistinct("old_doc").alias("n_old_collisions"),
            F.min("old_doc").alias("first_old_match"),
        )
    )
    base = bands.filter(F.col("doc_id") % _INCR_MOD == 0).select("doc_id").distinct()
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("n_old_collisions").isNotNull(), 1)
        .otherwise(0)
        .alias("is_dup"),
        F.coalesce("n_old_collisions", F.lit(0)).alias("n_old_collisions"),
        "first_old_match",
    )


# --- candidate verification: edit-distance stage after LSH -----------------

_VERIFY_MAX_DIST = 40  # accept pairs within this edit distance


@register(
    "dedup_verified_pairs",
    oracle=_DUCK_MINHASH
    + f"""
    , long_bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_idx, b{b} AS band_key FROM bands" for b in range(N_BANDS))}
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM long_bands x JOIN long_bands y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
           CASE WHEN levenshtein(da.text, db.text) <= {_VERIFY_MAX_DIST}
                THEN 1 ELSE 0 END AS verified
    FROM cand
    JOIN documents da ON da.doc_id = doc_a
    JOIN documents db ON db.doc_id = doc_b
    """,
    doc="LSH-candidate verification — the exact second stage every "
    "near-dup pipeline runs: band-collision pairs (dedup_minhash_pairs) "
    "are re-checked with true edit distance and accepted only within "
    f"{_VERIFY_MAX_DIST}.  The expensive O(len²) Levenshtein DP runs "
    "ONLY on candidate pairs — the whole point of the LSH stage: at "
    "100 TB the verify cost is |candidates|, not |corpus|², and the "
    "candidate texts arrive via two joins against the documents table "
    "(hash joins on doc id, each candidate row carries its two texts "
    "through one shuffle).  Emitting the distance rather than just the "
    "verdict gives the downstream threshold choice observability.",
)
def dedup_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_minhash_pairs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    da = docs.select(
        F.col("doc_id").alias("_ida"), F.col("text").alias("_ta")
    )
    db = docs.select(
        F.col("doc_id").alias("_idb"), F.col("text").alias("_tb")
    )
    dist = F.levenshtein(F.col("_ta"), F.col("_tb"))
    return (
        pairs.join(da, F.col("doc_a") == F.col("_ida"))
        .join(db, F.col("doc_b") == F.col("_idb"))
        .select(
            "doc_a",
            "doc_b",
            dist.cast("long").alias("edit_dist"),
            F.when(dist <= _VERIFY_MAX_DIST, 1).otherwise(0).alias("verified"),
        )
    )


# --- cluster-size distribution (dedup observability) ------------------------


@register(
    "dup_cluster_size_histogram",
    oracle=_DUCK_MINHASH
    + f"""
    , long_bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_idx, b{b} AS band_key FROM bands" for b in range(N_BANDS))}
    ),
    pairs AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM long_bands x JOIN long_bands y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
        SELECT doc_id AS src, doc_id AS dst FROM documents
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    comp AS (
        SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
    ),
    sizes AS (
        SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
        FROM comp GROUP BY component
    )
    SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    """,
    doc="Dup-cluster size distribution — the dedup health readout a "
    "pipeline dashboards before deciding thresholds: count-of-counts "
    "over the connected components of the LSH candidate graph "
    "(singletons = unique docs; a giant component signals "
    "over-aggressive banding).  Rides the dedup_components machinery "
    "and adds two tiny aggregations on top of the component labels; "
    "the oracle extends the same recursive-closure CTE.  n_docs per "
    "bucket cross-checks the partition property: Σ n_docs = corpus "
    "size.",
    recursive=True,
)
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2sql_spark.operators.components import connected_components

    pairs = dedup_minhash_pairs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    comp = connected_components(pairs, docs)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1)))
        .cast("long")
        .alias("n_docs"),
    )


# --- duplication rate by document-length decile -----------------------------


@register(
    "dup_rate_by_length_decile",
    oracle=f"""
    , flags AS (
        SELECT doc_id,
               CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY norm_hash)
                    THEN 0 ELSE 1 END AS is_dup
        FROM (SELECT doc_id, md5({duck_normalized()}) AS norm_hash
              FROM documents)
    ),
    ranked AS (
        SELECT d.doc_id, d.lang, f.is_dup,
               row_number() OVER (PARTITION BY d.lang
                                  ORDER BY d.n_chars, d.doc_id) AS rk,
               count(*) OVER (PARTITION BY d.lang) AS n
        FROM documents d JOIN flags f USING (doc_id)
    )
    SELECT lang,
           CAST((rk - 1) * 10 // n AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(is_dup), 0) AS BIGINT) AS n_dups,
           CAST(coalesce(sum(is_dup), 0) * 10000 // count(*) AS BIGINT)
               AS dup_bp
    FROM ranked GROUP BY lang, (rk - 1) * 10 // n
    """,
    doc="Duplication rate by document-length decile per language — the "
    "pipeline-analytics readout that answers 'is duplication "
    "concentrated in short boilerplate?' and calibrates length floors "
    "before dedup.  Reuses the exact-dedup keep flags (md5 over "
    "normalized text, min-doc_id keeper) joined to a per-language "
    "length decile (rank window partitioned by lang — bounded by the "
    "per-language share; at corpus scale swap the rank for the "
    "two-phase prefix-sum decile, revenue_pareto_deciles' shape).  "
    "All-integer fixed-point surface.",
)
def dup_rate_by_length_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    flags = dedup_exact(spark, sf_dir).select(
        "doc_id", (1 - F.col("keep")).alias("is_dup")
    )
    joined = docs.select("doc_id", "lang", "n_chars").join(flags, "doc_id")
    w_rk = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    w_n = W.partitionBy("lang")
    ranked = joined.select(
        "lang",
        "is_dup",
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    return (
        ranked.withColumn(
            "decile", F.expr("CAST((rk - 1) * 10 DIV n AS BIGINT)")
        )
        .groupBy("lang", "decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("is_dup"), F.lit(0))
            .cast("long")
            .alias("n_dups"),
            F.expr(
                "CAST(coalesce(sum(is_dup), 0) * 10000 DIV count(1) "
                "AS BIGINT)"
            ).alias("dup_bp"),
        )
    )


# --- duplicate n-gram coverage ---------------------------------------------


@register(
    "dup_ngram_coverage",
    oracle=_DUCK_SHINGLES
    + """
    , per_shingle AS (
        SELECT shingle, count(*) AS df, min(doc_id) AS only_doc
        FROM sh GROUP BY shingle
    ),
    uniq AS (
        SELECT only_doc AS doc_id, count(*) AS n_unique
        FROM per_shingle WHERE df = 1 GROUP BY only_doc
    ),
    tot AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(t.n_sh), 0) AS BIGINT) AS sum_shingles,
           CAST(coalesce(sum(t.n_sh), 0) - coalesce(sum(u.n_unique), 0)
                AS BIGINT) AS sum_dup,
           CAST((coalesce(sum(t.n_sh), 0) - coalesce(sum(u.n_unique), 0))
                * 1000000
                // greatest(coalesce(sum(t.n_sh), 0), 1) AS BIGINT)
               AS dup_ppm
    FROM documents d
    LEFT JOIN tot t USING (doc_id)
    LEFT JOIN uniq u USING (doc_id)
    GROUP BY d.lang
    """,
    doc="Duplicate n-gram coverage per language — the RefinedWeb/Gopher "
    "corpus-health metric: what fraction of a document's distinct "
    "3-word shingles also appear in at least one OTHER document.  "
    "Computed without per-shingle postings lists (hot shingles would "
    "skew a collect_list) via the complement: dup = total − "
    "unique-to-doc, where unique shingles fall out of the shingle "
    "aggregate as df=1 rows that retain their single owner through "
    "min(doc_id).  The distinct (doc,shingle) set feeds two "
    "aggregates, so it is materialized once via localCheckpoint "
    "(eager=False) instead of re-running the tokenizer+window per "
    "branch (Catalyst cannot ReusedExchange here — the distinct rides "
    "the doc_id partitioning and never exchanges; measured 2.7x at "
    "sf0.1); short documents "
    "(<3 tokens) produce no shingles and are kept at zero coverage "
    "through the LEFT joins on both engines.  All-integer ppm "
    "surface (exact DIV, no float sums).",
    bench=True,
)
def dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lazy local checkpoint: the shingle stream is computed and shuffled
    # once, then served to both aggregates from executor-local blocks
    pairs = shingles(spark, sf_dir).transform(snapshot, eager=False)
    tot = pairs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    uniq = (
        pairs.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("doc_id"))
        .filter(F.col("df") == 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # tot/uniq are doc-grain and scale with the corpus — pin the joins
    # to shuffle-hash so Catalyst's static misestimate cannot broadcast
    # a corpus-grain build side (AQE cannot demote a static broadcast)
    per_doc = (
        docs.join(tot.hint("shuffle_hash"), "doc_id", "left")
        .join(uniq.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "lang",
            F.coalesce("n_sh", F.lit(0)).alias("n_sh"),
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
        )
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_sh").cast("long").alias("sum_shingles"),
        (F.sum("n_sh") - F.sum("n_unique")).cast("long").alias("sum_dup"),
        F.expr(
            "CAST((sum(n_sh) - sum(n_unique)) * 1000000 "
            "DIV greatest(sum(n_sh), 1) AS BIGINT)"
        ).alias("dup_ppm"),
    )


# --- containment duplicates (truncation / subset detection) -----------------


@register(
    "containment_dup_pairs",
    oracle=_DUCK_SHINGLES
    + f"""
    , rare AS (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING count(*) <= {MAX_SHINGLE_DF}
    ),
    dsh AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
    sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
    inter AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS c
        FROM dsh x JOIN dsh y USING (shingle)
        WHERE x.doc_id < y.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
           CAST(c AS BIGINT) AS n_shared,
           CASE WHEN c = na.n AND c = nb.n THEN 'equal'
                WHEN c = na.n THEN 'a_in_b'
                ELSE 'b_in_a' END AS relation
    FROM inter
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE (c = na.n OR c = nb.n) AND least(na.n, nb.n) >= 5
    """,
    doc="Containment duplicates: pairs where one document's "
    "discriminative shingle set is a SUBSET of the other's — the "
    "truncated-copy / quoted-in-full case Jaccard misses (a short doc "
    "fully inside a long one scores low Jaccard but 100% containment, "
    "the RefinedWeb motivation for containment-aware dedup).  Rides "
    "the same rare-shingle inverted index as dedup_ngram_jaccard "
    "(stop-shingle pruning keeps the pair fan-out bounded; "
    "'discriminative' = shingles with df<={MAX_SHINGLE_DF}, applied "
    "identically on both engines), requires >=5 surviving shingles on "
    "the smaller side to suppress trivial matches, and classifies the "
    "direction.  All-integer + categorical surface.",
)
def containment_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingles(spark, sf_dir)
    g = sh.groupBy("shingle").agg(
        F.collect_list("doc_id").alias("ds")
    ).filter(F.size("ds") <= MAX_SHINGLE_DF)
    sizes = (
        g.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    inter = (
        g.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .groupBy(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Catalyst's static row estimate for the pair aggregate collapses,
    # so without a hint it BROADCASTS inter (the largest relation here)
    # and the driver-side broadcast collect dies at scale (witnessed at
    # the 100x replica: >1 GB over spark.driver.maxResultSize; AQE
    # cannot demote a statically planned broadcast).  Pin the size
    # joins to shuffle-hash: fully distributed, and the doc-grain sizes
    # relation scales too, so it must not be broadcast-pinned either.
    na = sizes.alias("na").hint("shuffle_hash")
    nb = sizes.alias("nb").hint("shuffle_hash")
    return (
        inter.join(na, F.col("doc_a") == F.col("na.doc_id"))
        .join(nb, F.col("doc_b") == F.col("nb.doc_id"))
        .filter(
            (
                (F.col("c") == F.col("na.n"))
                | (F.col("c") == F.col("nb.n"))
            )
            & (F.least(F.col("na.n"), F.col("nb.n")) >= 5)
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("na.n").cast("long").alias("n_a"),
            F.col("nb.n").cast("long").alias("n_b"),
            F.col("c").cast("long").alias("n_shared"),
            F.when(
                (F.col("c") == F.col("na.n")) & (F.col("c") == F.col("nb.n")),
                F.lit("equal"),
            )
            .when(F.col("c") == F.col("na.n"), F.lit("a_in_b"))
            .otherwise(F.lit("b_in_a"))
            .alias("relation"),
        )
    )


# --- semi-supervised label propagation over the similarity graph -----------

_LP_SEED_MOD = 5  # docs with doc_id % 5 == 0 are the labeled seed set


@register(
    "label_propagation_langid",
    oracle=_DUCK_MINHASH
    + f"""
    , long_bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_idx, b{b} AS band_key FROM bands" for b in range(N_BANDS))}
    ),
    prs AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM long_bands x JOIN long_bands y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
    ),
    lp_edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
                 UNION ALL SELECT doc_b, doc_a FROM prs),
    seeds AS (SELECT doc_id, lang FROM documents
              WHERE doc_id % {_LP_SEED_MOD} = 0),
    v1 AS (
        SELECT e.dst AS doc_id, s.lang, count(*) AS c
        FROM lp_edges e JOIN seeds s ON s.doc_id = e.src
        GROUP BY 1, 2
    ),
    w1 AS (
        SELECT doc_id, lang FROM (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY c DESC, lang) AS rn
            FROM v1
        ) WHERE rn = 1
    ),
    l1 AS (
        SELECT d.doc_id, coalesce(s.lang, w.lang) AS lang
        FROM documents d
        LEFT JOIN seeds s ON s.doc_id = d.doc_id
        LEFT JOIN w1 w ON w.doc_id = d.doc_id
    ),
    v2 AS (
        SELECT e.dst AS doc_id, l.lang, count(*) AS c
        FROM lp_edges e JOIN l1 l ON l.doc_id = e.src
        WHERE l.lang IS NOT NULL
        GROUP BY 1, 2
    ),
    w2 AS (
        SELECT doc_id, lang FROM (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY c DESC, lang) AS rn
            FROM v2
        ) WHERE rn = 1
    ),
    l2 AS (
        SELECT d.doc_id,
               coalesce(s.lang, w.lang, p.lang) AS lang
        FROM documents d
        LEFT JOIN seeds s ON s.doc_id = d.doc_id
        LEFT JOIN w2 w ON w.doc_id = d.doc_id
        LEFT JOIN l1 p ON p.doc_id = d.doc_id
    )
    SELECT d.doc_id, d.lang AS true_lang,
           coalesce(l.lang, 'unknown') AS pred_lang,
           CAST(CASE WHEN d.doc_id % {_LP_SEED_MOD} = 0
                THEN 1 ELSE 0 END AS INTEGER) AS is_seed,
           CAST(CASE WHEN l.lang = d.lang THEN 1 ELSE 0 END
                AS INTEGER) AS correct
    FROM documents d JOIN l2 l ON l.doc_id = d.doc_id
    """,
    doc="Semi-supervised label propagation: 20% of documents keep their "
    "language label (the clamped seed set), and labels spread over the "
    "MinHash-LSH similarity graph for two unrolled rounds of "
    "majority vote (ties broken lexicographically, integer vote "
    "counts, winners via a per-node ranking window) — the classic "
    "label-spreading recipe for annotating an unlabeled corpus from "
    "a small labeled slice, with per-doc correctness against the "
    "held-out truth as the built-in eval.  Each round is one edge "
    "join + hash agg + per-node window, all keyed on doc_id "
    "(distributes); the candidate graph is reused from a lazy "
    "checkpoint, never re-derived per round.",
)
def label_propagation_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    prs = dedup_minhash_pairs(spark, sf_dir)
    edges = (
        prs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(prs.select(F.col("doc_b"), F.col("doc_a")))
        .transform(snapshot, eager=False)
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    seeds = docs.filter(F.col("doc_id") % _LP_SEED_MOD == 0).select(
        "doc_id", F.col("lang").alias("s_lang")
    )

    def one_round(labels: DataFrame) -> DataFrame:
        # labels: (doc_id, lang nullable).  Returns per-node winner.
        votes = (
            edges.join(
                labels.filter(F.col("lang").isNotNull()).select(
                    F.col("doc_id").alias("src"), "lang"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("doc_id"), "lang")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = W.partitionBy("doc_id").orderBy(F.desc("c"), "lang")
        return (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", F.col("lang").alias("w_lang"))
        )

    l0 = docs.join(seeds, "doc_id", "left").select(
        "doc_id", F.col("s_lang").alias("lang")
    )
    w1 = one_round(l0)
    l1 = (
        docs.join(seeds, "doc_id", "left")
        .join(w1, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("s_lang", "w_lang").alias("lang")
        )
        .transform(snapshot, eager=False)
    )
    w2 = one_round(l1)
    l2 = (
        docs.join(seeds, "doc_id", "left")
        .join(w2, "doc_id", "left")
        .join(l1.select("doc_id", F.col("lang").alias("p_lang")), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("s_lang", "w_lang", "p_lang").alias("lang"),
        )
    )
    return (
        docs.join(l2.select("doc_id", F.col("lang").alias("pred")), "doc_id")
        .select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            F.coalesce("pred", F.lit("unknown")).alias("pred_lang"),
            F.when(F.col("doc_id") % _LP_SEED_MOD == 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("is_seed"),
            F.when(F.col("pred") == F.col("lang"), 1)
            .otherwise(0)
            .cast("int")
            .alias("correct"),
        )
    )


# --- prefix-filtered set-similarity join (AllPairs/PPJoin) -----------------

# Jaccard threshold 0.6 as the exact rational 3/5: the verify test is
# 5*|A∩B| >= 3*|A∪B| — pure integers, no doubles anywhere.
_PP_T_NUM, _PP_T_DEN = 3, 5


@register(
    "ppjoin_prefix_pairs",
    oracle=_DUCK_SHINGLES
    + f"""
    , tok AS (SELECT doc_id, shingle AS w FROM sh),
    df AS (SELECT w, count(*) AS df FROM tok GROUP BY w),
    ordered AS (
        SELECT t.doc_id, t.w,
               row_number() OVER (PARTITION BY t.doc_id
                                  ORDER BY d.df, t.w) AS pos,
               count(*) OVER (PARTITION BY t.doc_id) AS n
        FROM tok t JOIN df d USING (w)
    ),
    prefix AS (
        SELECT doc_id, w FROM ordered
        WHERE pos <= n - ((6 * n + 9) // 10) + 1
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM prefix a JOIN prefix b
          ON a.w = b.w AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS c
        FROM cand c
        JOIN tok x ON x.doc_id = c.doc_a
        JOIN tok y ON y.doc_id = c.doc_b AND y.w = x.w
        GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.c AS BIGINT) AS inter_n,
           CAST(na.n + nb.n - i.c AS BIGINT) AS union_n,
           CAST(i.c * 10000 // (na.n + nb.n - i.c) AS BIGINT)
               AS jaccard_x10000
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE {_PP_T_DEN} * i.c >= {_PP_T_NUM} * (na.n + nb.n - i.c)
    """,
    doc="Set-similarity join with prefix filtering (AllPairs/PPJoin, "
    "Bayardo et al. WWW'07): tokens per doc are ordered by global "
    "rarity (df asc, shingle asc — a total order; 3-word shingles, "
    "the selective set unit in a small-vocab corpus where single "
    "tokens are shared by everyone), and only the first "
    "n - ceil(t*n) + 1 rarest tokens of each doc generate candidates "
    "— any pair with Jaccard >= 0.6 MUST share a prefix token, so "
    "the candidate join touches the rare end of the vocabulary "
    "instead of every posting (the pruning that makes all-pairs "
    "similarity feasible at corpus scale; complements the LSH and "
    "df-capped inverted-index dedup paths with an EXACT no-recall-"
    "loss filter).  Verification is all-integer: 5*|A∩B| >= 3*|A∪B|, "
    "jaccard surfaced as floor fixed-point x10000.",
    tags=("dedup", "join"),
)
def ppjoin_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tok feeds both the document-frequency agg and the ordered arrays;
    # ordered feeds the prefix explode AND both verify-join sides —
    # materialize each once instead of re-tokenizing per branch
    tok = shingles(spark, sf_dir).select(
        "doc_id", F.col("shingle").alias("w")
    ).transform(snapshot, eager=True)
    df = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        tok.join(df, "w")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "w"))),
                lambda x: x["w"],
            ).alias("ws")
        )
        .select(
            "doc_id",
            "ws",
            F.size("ws").alias("n"),
        )
        .transform(snapshot, eager=True)
    )
    prefix = ordered.select(
        "doc_id",
        "n",
        F.posexplode(
            F.slice(
                "ws",
                1,
                F.expr("n - ((6 * n + 9) div 10) + 1").cast("int"),
            )
        ).alias("p", "w"),
    )
    # r08 (guide §2.3, PPJoin proper): prune candidates with the length
    # and positional filters BEFORE the pair-grain shuffle and the
    # array-carrying verify joins — both are recall-free, so the
    # verified result set is unchanged (measured at sf0.1: 312k
    # prefix matches -> 204k after length -> 69k pairs after
    # positional, 4.3x fewer pairs shipped to the verify join):
    # - length: J >= 3/5 needs 5*|A∩B| >= 3*|A∪B|, and inter <= min(n),
    #   union >= max(n), so 5*min(n) >= 3*max(n) is necessary;
    # - positional: the first common token of any candidate pair is
    #   inside BOTH prefixes (a common token ordered before a
    #   prefix-prefix match would itself be a prefix-prefix match), so
    #   it is exactly the match minimizing (pa, pb); every common token
    #   sits at position >= pa in a and >= pb in b (0-based), giving
    #   inter <= min(na - pa, nb - pb), and J >= 3/5 <=> 8*inter >=
    #   3*(na + nb).
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(F.expr("5 * least(a.n, b.n) >= 3 * greatest(a.n, b.n)"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
            F.col("a.p").alias("pa"),
            F.col("b.p").alias("pb"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
            F.min(F.struct("pa", "pb")).alias("fm"),
        )
        .filter(
            F.expr("8 * least(na - fm.pa, nb - fm.pb) >= 3 * (na + nb)")
        )
        .select("doc_a", "doc_b")
    )
    arrs = ordered.select("doc_id", "ws", "n")
    verified = (
        cand.join(
            arrs.select(
                F.col("doc_id").alias("doc_a"),
                F.col("ws").alias("ws_a"),
                F.col("n").alias("n_a"),
            ),
            "doc_a",
        )
        .join(
            arrs.select(
                F.col("doc_id").alias("doc_b"),
                F.col("ws").alias("ws_b"),
                F.col("n").alias("n_b"),
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ws_a", "ws_b")).cast("long").alias(
                "inter_n"
            ),
            (F.col("n_a") + F.col("n_b")).alias("nsum"),
        )
        .select(
            "doc_a",
            "doc_b",
            "inter_n",
            (F.col("nsum") - F.col("inter_n")).cast("long").alias("union_n"),
        )
        .where(
            F.lit(_PP_T_DEN) * F.col("inter_n")
            >= F.lit(_PP_T_NUM) * F.col("union_n")
        )
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "inter_n",
        "union_n",
        F.expr("CAST(inter_n * 10000 div union_n AS BIGINT)").alias(
            "jaccard_x10000"
        ),
    )


@register(
    "blocking_quality_eval",
    oracle=_DUCK_MINHASH
    + f"""
    , lsh_long AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_idx, b{b} AS band_key FROM bands" for b in range(N_BANDS))}
    ),
    lsh_cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM lsh_long x JOIN lsh_long y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
    ),
    tok AS (SELECT doc_id, shingle AS w FROM sh),
    df AS (SELECT w, count(*) AS df FROM tok GROUP BY w),
    ordered AS (
        SELECT t.doc_id, t.w,
               row_number() OVER (PARTITION BY t.doc_id
                                  ORDER BY d.df, t.w) AS pos,
               count(*) OVER (PARTITION BY t.doc_id) AS n
        FROM tok t JOIN df d USING (w)
    ),
    prefix AS (
        SELECT doc_id, w FROM ordered
        WHERE pos <= n - ((6 * n + 9) // 10) + 1
    ),
    pp_cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM prefix a JOIN prefix b
          ON a.w = b.w AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS c
        FROM pp_cand c
        JOIN tok x ON x.doc_id = c.doc_a
        JOIN tok y ON y.doc_id = c.doc_b AND y.w = x.w
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT i.doc_a, i.doc_b
        FROM inter i
        JOIN sizes na ON na.doc_id = i.doc_a
        JOIN sizes nb ON nb.doc_id = i.doc_b
        WHERE {_PP_T_DEN} * i.c >= {_PP_T_NUM} * (na.n + nb.n - i.c)
    ),
    counts AS (
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               (SELECT count(*) FROM lsh_cand) AS n_candidates,
               (SELECT count(*) FROM truth) AS n_truth,
               (SELECT count(*) FROM truth t
                JOIN lsh_cand c ON c.doc_a = t.doc_a
                              AND c.doc_b = t.doc_b) AS n_found
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_docs * (n_docs - 1) // 2 AS BIGINT) AS n_all_pairs,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_found AS BIGINT) AS n_found,
           CAST(n_found * 1000000 // greatest(n_truth, 1) AS BIGINT)
               AS pairs_completeness_ppm,
           CAST((n_docs * (n_docs - 1) // 2 - n_candidates) * 1000000
                // (n_docs * (n_docs - 1) // 2) AS BIGINT)
               AS reduction_ratio_ppm
    FROM counts
    """,
    doc="Entity-resolution blocking evaluation (Christen 2012's pairs "
    "completeness / reduction ratio): the MinHash-LSH band blocker "
    "scored against EXACT Jaccard>=0.6 ground truth from the "
    "prefix-filtered ppjoin — recall of true pairs (completeness) "
    "vs the fraction of the O(n²) comparison space pruned "
    "(reduction), the two numbers every blocking scheme trades "
    "off.  Pure composition of two registered pipelines plus "
    "dimension-sized set arithmetic; both metrics in integer ppm.",
    tags=("dedup", "eval"),
)
def blocking_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # each pipeline feeds TWO actions (the recall join and its own
    # count) — materialize both once, or the full minhash/ppjoin chains
    # re-execute per action (measured 12.2 s -> materialized run below)
    cand = dedup_minhash_pairs(spark, sf_dir).transform(snapshot, eager=False)
    truth = (
        ppjoin_prefix_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .transform(snapshot, eager=False)
    )
    n_docs = load_table(spark, sf_dir, "documents").count()
    found = truth.join(cand, ["doc_a", "doc_b"]).count()
    n_truth = truth.count()
    n_cand = cand.count()
    all_pairs = n_docs * (n_docs - 1) // 2
    row = [
        (
            n_docs,
            all_pairs,
            n_cand,
            n_truth,
            found,
            found * 1_000_000 // max(n_truth, 1),
            (all_pairs - n_cand) * 1_000_000 // all_pairs,
        )
    ]
    return spark.createDataFrame(
        row,
        "n_docs BIGINT, n_all_pairs BIGINT, n_candidates BIGINT,"
        " n_truth BIGINT, n_found BIGINT, pairs_completeness_ppm BIGINT,"
        " reduction_ratio_ppm BIGINT",
    )


# --- b-bit minwise hashing accuracy audit ----------------------------------

_EQ16_A_B = " + ".join(
    f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(N_MINHASH)
)
_BIT16_A_B = " + ".join(
    f"CASE WHEN a.h{i} % 2 = b.h{i} % 2 THEN 1 ELSE 0 END"
    for i in range(N_MINHASH)
)


@register(
    "bbit_minhash_accuracy",
    oracle=_DUCK_MINHASH
    + f"""
    , long_bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_idx, b{b} AS band_key FROM bands" for b in range(N_BANDS))}
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM long_bands x JOIN long_bands y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
    ),
    est AS (
        SELECT c.doc_a, c.doc_b,
               CAST({_EQ16_A_B} AS BIGINT) AS eq16,
               CAST({_BIT16_A_B} AS BIGINT) AS bit16
        FROM cand c
        JOIN mh a ON a.doc_id = c.doc_a
        JOIN mh b ON b.doc_id = c.doc_b
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS i
        FROM cand c
        JOIN sh x ON x.doc_id = c.doc_a
        JOIN sh y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
        GROUP BY 1, 2
    )
    SELECT e.doc_a, e.doc_b, e.eq16, e.bit16,
           CAST(e.eq16 * 1000000 // {N_MINHASH} AS BIGINT)
               AS est_full_ppm,
           CAST(greatest(2 * e.bit16 - {N_MINHASH}, 0) * 1000000
                // {N_MINHASH} AS BIGINT) AS est_1bit_ppm,
           CAST(coalesce(i.i, 0) * 1000000
                // (na.n + nb.n - coalesce(i.i, 0)) AS BIGINT)
               AS exact_ppm
    FROM est e
    LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
    JOIN sizes na ON na.doc_id = e.doc_a
    JOIN sizes nb ON nb.doc_id = e.doc_b
    """,
    doc="b-bit minwise hashing audit (Li & Koenig 2010): for every "
    "LSH candidate pair, the Jaccard estimate from the full 16x"
    "64-bit signature (match fraction) vs the 1-bit variant (lowest "
    "bit only: J = 2*agreement - 1, clamped at 0), with the exact "
    "shingle Jaccard alongside — the storage/accuracy trade every "
    "petabyte dedup index makes (1-bit stores 64x less at ~2x the "
    "variance).  Signatures join per pair (16 ints, never "
    "shingles); the exact column restricts the shingle join to the "
    "candidate pairs.  All-integer ppm surface.",
    tags=("dedup", "sketch"),
)
def bbit_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cand/mh/sh are each referenced 2-3× below — materialize once
    # instead of replaying the tokenize→shingle→sign pipeline per branch
    cand = dedup_minhash_pairs(spark, sf_dir).transform(snapshot, eager=True)
    mh = minhash_sigs(spark, sf_dir).transform(snapshot, eager=True)
    a = mh.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(N_MINHASH)],
    )
    b = mh.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(N_MINHASH)],
    )
    eq16 = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    bit16 = sum(
        F.when(F.col(f"a{i}") % 2 == F.col(f"b{i}") % 2, 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    est = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            eq16.cast("long").alias("eq16"),
            bit16.cast("long").alias("bit16"),
        )
    )
    sh = shingles(spark, sf_dir).transform(snapshot, eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    x = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    y = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(x, "doc_a")
        .join(y, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        est.join(inter, ["doc_a", "doc_b"], "left")
        .join(
            sizes.select(F.col("doc_id").alias("doc_a"),
                         F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"),
                         F.col("n").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "eq16",
            "bit16",
            F.expr(
                f"CAST(eq16 * 1000000 div {N_MINHASH} AS BIGINT)"
            ).alias("est_full_ppm"),
            F.expr(
                f"CAST(greatest(2 * bit16 - {N_MINHASH}, 0) * 1000000"
                f" div {N_MINHASH} AS BIGINT)"
            ).alias("est_1bit_ppm"),
            F.expr(
                "CAST(coalesce(i, 0) * 1000000"
                " div (na + nb - coalesce(i, 0)) AS BIGINT)"
            ).alias("exact_ppm"),
        )
    )


# --- train/eval n-gram contamination audit ----------------------------------

# benchmark-decontamination screen: eval split = doc_id % 10 == 9, train =
# the rest; an eval doc is contaminated when >= 30% of its distinct 3-word
# shingles already appear anywhere in the train split.
_CONTAM_PPM = 300_000


@register(
    "eval_contamination_ngram",
    oracle=_DUCK_SHINGLES
    + f"""
    , tr AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 < 9),
    ev AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 = 9),
    per AS (
        SELECT e.doc_id,
               CAST(count(*) AS BIGINT) AS total,
               CAST(sum(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS matched
        FROM ev e LEFT JOIN tr t ON t.shingle = e.shingle
        GROUP BY e.doc_id
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_eval_docs,
           CAST(sum(CASE WHEN matched * 1000000 // total >= {_CONTAM_PPM}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           CAST(sum(matched) AS BIGINT) AS matched_shingles,
           CAST(sum(total) AS BIGINT) AS total_shingles,
           CAST(sum(matched * 1000000 // total) // count(*) AS BIGINT)
               AS mean_containment_ppm
    FROM per JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
    doc="Benchmark-decontamination audit (GPT-3 appendix C / Dodge et al. "
    "C4 study): split the corpus into train (doc_id%10<9) and held-out "
    "eval (doc_id%10=9), and measure per eval document what fraction "
    "of its distinct 3-word shingles already occur anywhere in train — "
    "docs over 30% containment are flagged contaminated, rolled up by "
    "source.  Scale shape: the train side collapses to DISTINCT "
    "shingles (map-side partial dedup before the shuffle), the probe "
    "is one hash equi-join on the shingle string, per-doc ratios are "
    "exact integer ppm, and the rollup re-joins only doc_id->source "
    "(dimension-sized).  At 100 TB this is the standard "
    "shingle-inverted-index contamination pass, one shuffle each side.",
    tags=("dedup", "llm-pipeline"),
)
def eval_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingles(spark, sf_dir)
    tr = sh.filter(F.col("doc_id") % 10 < 9).select("shingle").distinct()
    ev = sh.filter(F.col("doc_id") % 10 == 9)
    per = (
        ev.alias("e")
        .join(tr.alias("t"), F.col("t.shingle") == F.col("e.shingle"), "left")
        .groupBy("e.doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total"),
            F.sum(
                F.when(F.col("t.shingle").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("matched"),
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        per.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_docs"),
            F.sum(
                F.when(
                    F.expr(f"matched * 1000000 DIV total >= {_CONTAM_PPM}"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_contaminated"),
            F.sum("matched").cast("long").alias("matched_shingles"),
            F.sum("total").cast("long").alias("total_shingles"),
            F.expr(
                "CAST(sum(matched * 1000000 DIV total) DIV count(*)"
                " AS BIGINT)"
            ).alias("mean_containment_ppm"),
        )
    )


# --- LSH banding-geometry sensitivity sweep ---------------------------------

# all (bands, rows) factorizations of the 16-hash signature; one shared
# signature build serves every configuration (the ivf_nprobe_sensitivity
# shape, applied to the dedup side).
_LSH_CONFIGS = [(16, 1), (8, 2), (4, 4), (2, 8)]


def _duck_lsh_bands(b: int, r: int) -> str:
    sels = []
    for i in range(b):
        key = " || '|' || ".join(
            f"CAST(h{i * r + j} AS VARCHAR)" for j in range(r)
        )
        sels.append(
            f"SELECT doc_id, {i} AS band_idx, md5({key}) AS band_key FROM mh"
        )
    return " UNION ALL ".join(sels)


_LSH_SENS_ORACLE = (
    _DUCK_SHINGLES.replace("sh AS (", "sh AS MATERIALIZED (")
    + ", shv AS MATERIALIZED (SELECT doc_id, "
    + _DUCK_HV
    + " AS hv FROM (SELECT doc_id, md5(shingle) AS hh FROM sh))"
    + ", mh AS MATERIALIZED (SELECT doc_id, "
    + ", ".join(
        f"min(({_MH_A[i]} * hv + {_MH_B[i]}) % {_MH_P}) AS h{i}"
        for i in range(N_MINHASH)
    )
    + " FROM shv GROUP BY doc_id)"
    + "".join(
        f"""
    , cand{b}x{r} AS MATERIALIZED (
        SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
        FROM ({_duck_lsh_bands(b, r)}) x
        JOIN ({_duck_lsh_bands(b, r)}) y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
    )"""
        for b, r in _LSH_CONFIGS
    )
    + f"""
    , allc AS MATERIALIZED (
        SELECT DISTINCT d1, d2 FROM (
            {" UNION ALL ".join(f"SELECT d1, d2 FROM cand{b}x{r}" for b, r in _LSH_CONFIGS)}
        )
    ),
    sz AS MATERIALIZED (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
    ),
    pj AS MATERIALIZED (
        SELECT c.d1, c.d2, CAST(count(*) AS BIGINT) AS inter
        FROM allc c
        JOIN sh a ON a.doc_id = c.d1
        JOIN sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
        GROUP BY c.d1, c.d2
    ),
    v AS MATERIALIZED (
        SELECT ac.d1, ac.d2,
               CASE WHEN 3 * coalesce(p.inter, 0) >= za.n + zb.n
                    THEN 1 ELSE 0 END AS is_true
        FROM allc ac
        LEFT JOIN pj p ON p.d1 = ac.d1 AND p.d2 = ac.d2
        JOIN sz za ON za.doc_id = ac.d1
        JOIN sz zb ON zb.doc_id = ac.d2
    )
    {" UNION ALL ".join(
        f'''SELECT 'b{b}r{r}' AS config,
               CAST({b} AS BIGINT) AS bands,
               CAST({r} AS BIGINT) AS rows_per_band,
               CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(sum(is_true) AS BIGINT) AS n_true,
               CAST(sum(is_true) * 1000000 // greatest(count(*), 1)
                   AS BIGINT) AS precision_ppm
        FROM cand{b}x{r} c JOIN v ON v.d1 = c.d1 AND v.d2 = c.d2'''
        for b, r in _LSH_CONFIGS
    )}
    """
)


@register(
    "lsh_band_sensitivity",
    oracle=_LSH_SENS_ORACLE,
    doc="Banding-geometry tuning sweep for MinHash-LSH: every (bands x "
    "rows) factorization of the 16-hash signature — (16,1), (8,2), "
    "(4,4), (2,8) — evaluated from ONE shared signature build, "
    "reporting candidate volume and exact-Jaccard precision "
    "(tau = 1/2, tested as the exact integer 3*inter >= |A|+|B|) per "
    "configuration.  This is the S-curve trade every dedup deployment "
    "tunes: more rows per band = higher precision, fewer candidates.  "
    "Scale shape: the signature aggregate runs once (shuffle carries "
    "16 BIGINTs per doc), each config is a band-bucket equi-join in "
    "long layout, the union of candidates is verified once against "
    "the shingle sets (two hash joins) and every config reuses those "
    "verdicts — candidates are never re-scored per config.",
    tags=("dedup", "llm-pipeline"),
)
def lsh_band_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = shingles(spark, sf_dir).transform(snapshot, eager=False)
    hv = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    shv = sh.select("doc_id", hv.alias("hv"))
    mh = shv.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(_MH_A[i]) * F.col("hv") + F.lit(_MH_B[i]))
                % F.lit(_MH_P)
            ).alias(f"h{i}")
            for i in range(N_MINHASH)
        ]
    )
    # ONE pass for the whole sweep (the value_drift_ks_by_type pattern):
    # stack every config's bands into one long (config, band_idx,
    # band_key) relation and self-join ONCE on the 3-part key, instead
    # of a Python loop of 4 band tables x 4 self-joins x 4 snapshots.
    # Per config the join output is identical (config is a join key),
    # so the distinct candidate set per config is unchanged.
    entries = ", ".join(
        f"'b{b}r{r}', {i}, md5(concat_ws('|', "
        + ", ".join(f"CAST(h{i * r + j} AS STRING)" for j in range(r))
        + "))"
        for b, r in _LSH_CONFIGS
        for i in range(b)
    )
    n_entries = sum(b for b, _ in _LSH_CONFIGS)
    lb = mh.select(
        "doc_id",
        F.expr(
            f"stack({n_entries}, {entries}) AS (config, band_idx, band_key)"
        ),
    )
    cand = (
        lb.alias("x")
        .join(
            lb.alias("y"),
            F.expr(
                "x.config = y.config AND x.band_idx = y.band_idx"
                " AND x.band_key = y.band_key AND x.doc_id < y.doc_id"
            ),
        )
        .select(
            F.col("x.config").alias("config"),
            F.col("x.doc_id").alias("d1"),
            F.col("y.doc_id").alias("d2"),
        )
        .distinct()
        .transform(snapshot, eager=False)
    )
    allc = cand.select("d1", "d2").distinct().transform(
        snapshot, eager=False
    )
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    inter = (
        allc.alias("c")
        .join(sh.alias("a"), F.expr("a.doc_id = c.d1"))
        .join(sh.alias("b"), F.expr("b.doc_id = c.d2 AND b.shingle = a.shingle"))
        .groupBy("c.d1", "c.d2")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    v = (
        allc.alias("ac")
        .join(
            inter.alias("p"),
            F.expr("p.d1 = ac.d1 AND p.d2 = ac.d2"),
            "left",
        )
        # sz is DOC-GRAIN (scales with the corpus) — no broadcast hint;
        # AQE broadcasts under the threshold locally, shuffle-joins at
        # cluster scale instead of OOMing the driver
        .join(sz.alias("za"), F.expr("za.doc_id = ac.d1"))
        .join(sz.alias("zb"), F.expr("zb.doc_id = ac.d2"))
        .select(
            F.col("ac.d1").alias("d1"),
            F.col("ac.d2").alias("d2"),
            F.when(
                3 * F.coalesce(F.col("p.inter"), F.lit(0))
                >= F.col("za.n") + F.col("zb.n"),
                1,
            )
            .otherwise(0)
            .alias("is_true"),
        )
    )
    # one grouped rollup over all configs replaces the 4 per-config
    # join+agg pipelines; the verdicts in v are shared exactly as
    # before.  A config with ZERO candidates emits no group, but the
    # oracle's per-config scalar aggregates emit one row per config
    # unconditionally (count=0, sums NULL) — preserve the row set by
    # left-joining from the 4-row config literal (bounded at any
    # scale) and coalescing only the count.
    res = (
        cand.join(v, ["d1", "d2"])
        .groupBy("config")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_nc"),
            F.sum("is_true").cast("long").alias("n_true"),
            F.expr(
                "CAST(sum(is_true) * 1000000"
                " DIV greatest(count(*), 1) AS BIGINT)"
            ).alias("precision_ppm"),
        )
    )
    cfg = spark.createDataFrame(
        [(f"b{b}r{r}", b, r) for b, r in _LSH_CONFIGS],
        "config string, bands long, rows_per_band long",
    )
    return cfg.join(res, "config", "left").select(
        "config",
        "bands",
        "rows_per_band",
        F.coalesce("_nc", F.lit(0).cast("long")).alias("n_candidates"),
        "n_true",
        "precision_ppm",
    )


# --- token savings from exact dedup, by source ------------------------------


@register(
    "dedup_token_savings",
    oracle=f"""
    , h AS (
        SELECT doc_id, source,
               md5({duck_normalized()}) AS nh,
               CAST(len({duck_tokens()}) AS BIGINT) AS ntok
        FROM documents
    ),
    keep AS (
        SELECT doc_id, source, ntok,
               CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY nh)
                    THEN 1 ELSE 0 END AS kept
        FROM h
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST(sum(ntok) AS BIGINT) AS tokens_raw,
           CAST(sum(kept * ntok) AS BIGINT) AS tokens_kept,
           CAST((sum(ntok) - sum(kept * ntok)) * 1000000
                // greatest(sum(ntok), 1) AS BIGINT) AS savings_ppm
    FROM keep GROUP BY source
    """,
    doc="Effective-dataset-size readout: token counts per source "
    "before vs after exact dedup (md5 over normalized text, keep "
    "min(doc_id) per group — the dedup_exact contract), with the "
    "token savings in exact ppm — the number a training-data card "
    "reports as 'dedup removed X% of tokens' and the input to "
    "epoch/token-budget planning (tokens, not doc counts, are what "
    "the budget spends).  One codegen'd hash+tokenize projection, "
    "one digest-keyed window for survivor flags, one source "
    "rollup.",
    tags=("dedup", "llm-pipeline"),
)
def dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "source",
        F.md5(normalized_text("text")).alias("nh"),
        F.size(tokens("text")).cast("long").alias("ntok"),
    )
    w = W.partitionBy("nh")
    keep = h.select(
        "source",
        "ntok",
        F.when(F.col("doc_id") == F.min("doc_id").over(w), 1)
        .otherwise(0)
        .alias("kept"),
    )
    return keep.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("kept").cast("long").alias("n_kept"),
        F.sum("ntok").cast("long").alias("tokens_raw"),
        F.sum(F.col("kept") * F.col("ntok")).cast("long").alias(
            "tokens_kept"
        ),
        F.expr(
            "CAST((sum(ntok) - sum(kept * ntok)) * 1000000"
            " DIV greatest(sum(ntok), 1) AS BIGINT)"
        ).alias("savings_ppm"),
    )


# --- cross-source duplication affinity --------------------------------------


@register(
    "source_dedup_affinity",
    oracle=f"""
    , h AS (
        SELECT doc_id, source,
               md5(array_to_string(
                   list_slice({duck_tokens()}, 1, 20), ' ')) AS nh
        FROM documents
    ),
    g AS (
        SELECT nh FROM h GROUP BY nh HAVING count(*) >= 2
    ),
    dup AS (SELECT h.nh, h.source FROM h JOIN g ON g.nh = h.nh),
    pairs AS (
        SELECT a.nh,
               least(a.source, b.source) AS source_a,
               greatest(a.source, b.source) AS source_b
        FROM dup a JOIN dup b
          ON b.nh = a.nh
         AND (a.source < b.source
              OR (a.source = b.source AND TRUE))
    )
    SELECT source_a, source_b,
           CAST(count(DISTINCT nh) AS BIGINT) AS n_dup_groups
    FROM (
        SELECT DISTINCT nh, source_a, source_b FROM pairs
    ) GROUP BY source_a, source_b
    """,
    doc="Provenance affinity of prefix duplicates: for every duplicate "
    "group (20-token prefix fingerprint shared by >= 2 docs — the "
    "URL/boilerplate-prefix dedup key, which also catches "
    "truncation variants exact hashing misses), which "
    "source pairs co-occur in it — the who-copies-whom matrix that "
    "tells a corpus curator whether dedup is removing intra-source "
    "boilerplate (diagonal) or cross-source syndication "
    "(off-diagonal), which changes the keep-policy (keep per source "
    "vs keep globally).  Group membership joins on the digest key; "
    "pairs are counted once per (group, source pair) via DISTINCT "
    "before the rollup.",
    tags=("dedup", "llm-pipeline"),
)
def source_dedup_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "source",
        F.md5(F.concat_ws(" ", F.slice(tokens("text"), 1, 20))).alias("nh"),
    )
    g = h.groupBy("nh").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") >= 2
    )
    dup = h.join(g.select("nh"), "nh")
    pairs = (
        dup.alias("a")
        .join(
            dup.alias("b"),
            F.expr(
                "b.nh = a.nh AND (a.source < b.source"
                " OR (a.source = b.source AND TRUE))"
            ),
        )
        .select(
            "a.nh",
            F.least("a.source", "b.source").alias("source_a"),
            F.greatest("a.source", "b.source").alias("source_b"),
        )
        .distinct()
    )
    return pairs.groupBy("source_a", "source_b").agg(
        F.countDistinct("nh").cast("long").alias("n_dup_groups")
    )


# --- quality-aware canonical selection vs min-id keep -----------------------


@register(
    "dedup_canonical_quality_delta",
    oracle=f"""
    , h AS (
        SELECT doc_id,
               md5({duck_normalized()}) AS nh,
               CAST(len(list_filter({duck_tokens()},
                    x -> x IN ({", ".join(repr(w) for w in STOPWORDS)})))
                   AS BIGINT) * 1000
                   // greatest(len({duck_tokens()}), 1) AS q_ppk
        FROM documents
    ),
    g AS (SELECT nh FROM h GROUP BY nh HAVING count(*) >= 2),
    dup AS (SELECT h.* FROM h JOIN g ON g.nh = h.nh),
    pick AS (
        SELECT nh,
               min(doc_id) AS keep_minid,
               max(CASE WHEN rn = 1 THEN doc_id END) AS keep_quality
        FROM (
            SELECT nh, doc_id,
                   row_number() OVER (PARTITION BY nh
                                      ORDER BY q_ppk DESC, doc_id) AS rn
            FROM dup
        ) GROUP BY nh
    )
    SELECT CAST(count(*) AS BIGINT) AS n_dup_groups,
           CAST(sum(CASE WHEN keep_minid <> keep_quality
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_differs,
           CAST(sum(CASE WHEN keep_minid <> keep_quality
                         THEN 1 ELSE 0 END) * 1000000
                // greatest(count(*), 1) AS BIGINT) AS differs_ppm
    FROM pick
    """,
    doc="Canonical-selection policy audit: within each exact-duplicate "
    "group, does keeping the HIGHEST-QUALITY member (stopword "
    "density as the cheap quality proxy, doc_id tie-break) pick a "
    "different survivor than the min-doc-id rule the dedup_exact "
    "contract uses?  differs_ppm quantifies how much curation "
    "quality the arbitrary-keep policy leaves on the table — the "
    "argument for quality-aware dedup in a training-data pipeline.  "
    "One hash+score projection, group membership by digest join, a "
    "per-group argmax window (WindowGroupLimit) vs min aggregate.",
    tags=("dedup", "llm-pipeline"),
)
def dedup_canonical_quality_delta(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    h = docs.select(
        "doc_id",
        F.md5(normalized_text("text")).alias("nh"),
        (
            count_in_list(toks, STOPWORDS).cast("long") * 1000
        ).alias("_num"),
        F.greatest(F.size(toks), F.lit(1)).alias("_den"),
    ).select(
        "doc_id", "nh", F.expr("_num DIV _den").alias("q_ppk")
    )
    g = h.groupBy("nh").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") >= 2
    )
    dup = h.join(g.select("nh"), "nh")
    w = W.partitionBy("nh").orderBy(F.desc("q_ppk"), F.asc("doc_id"))
    pick = (
        dup.withColumn("rn", F.row_number().over(w))
        .groupBy("nh")
        .agg(
            F.min("doc_id").alias("keep_minid"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias(
                "keep_quality"
            ),
        )
    )
    return pick.agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_groups"),
        F.sum(
            F.when(F.col("keep_minid") != F.col("keep_quality"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_differs"),
        F.expr(
            "CAST(sum(CASE WHEN keep_minid <> keep_quality THEN 1 ELSE 0"
            " END) * 1000000 DIV greatest(count(*), 1) AS BIGINT)"
        ).alias("differs_ppm"),
    )


# --- prefix-fingerprint length sweep ----------------------------------------

_PREFIX_LENS = [10, 20, 40]


@register(
    "prefix_length_dedup_sweep",
    oracle=f"""
    , toks2 AS (SELECT doc_id, {duck_tokens()} AS t FROM documents),
    keys AS (
        {" UNION ALL ".join(
            f"SELECT {k} AS plen, doc_id,"
            f" md5(array_to_string(list_slice(t, 1, {k}), ' ')) AS nh"
            " FROM toks2"
            for k in _PREFIX_LENS
        )}
    ),
    g AS (
        SELECT plen, nh, CAST(count(*) AS BIGINT) AS sz
        FROM keys GROUP BY plen, nh
    )
    SELECT CAST(plen AS BIGINT) AS prefix_tokens,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_groups,
           CAST(sum(CASE WHEN sz >= 2 THEN sz ELSE 0 END) AS BIGINT)
               AS n_docs_in_dups,
           CAST(sum(CASE WHEN sz >= 2 THEN sz - 1 ELSE 0 END) * 1000000
                // sum(sz) AS BIGINT) AS removal_ppm
    FROM g GROUP BY plen
    """,
    doc="Dedup-key tuning sweep: prefix fingerprints of 10/20/40 "
    "tokens evaluated side by side — shorter prefixes collapse more "
    "docs (higher removal rate, more false merges), longer ones "
    "converge to exact dedup; the sweep picks the operating point "
    "for the source_dedup_affinity key the same way "
    "lsh_band_sensitivity tunes the shingle pipeline.  One tokenize "
    "pass fans out to three hash keys map-side; group sizes are one "
    "hash aggregate per length; removal_ppm = docs that would be "
    "dropped keeping one survivor per group.",
    tags=("dedup", "llm-pipeline"),
)
def prefix_length_dedup_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").transform(fan_out, spark, "doc_id")
    t = tokens("text")
    keys = None
    for k in _PREFIX_LENS:
        part = docs.select(
            F.lit(k).alias("plen"),
            F.md5(F.concat_ws(" ", F.slice(t, 1, k))).alias("nh"),
        )
        keys = part if keys is None else keys.unionAll(part)
    g = keys.groupBy("plen", "nh").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return g.groupBy(F.col("plen").cast("long").alias("prefix_tokens")).agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("sz") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_groups"),
        F.sum(F.when(F.col("sz") >= 2, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("n_docs_in_dups"),
        F.expr(
            "CAST(sum(CASE WHEN sz >= 2 THEN sz - 1 ELSE 0 END) * 1000000"
            " DIV sum(sz) AS BIGINT)"
        ).alias("removal_ppm"),
    )


# --- does the quality gate catch duplicates?  (MCC per language) -------------


@register(
    "quality_dup_mcc",
    oracle=f"""
    , lab AS (
        SELECT lang,
               CASE WHEN n_toks >= 20 AND cpt BETWEEN 3 AND 12
                         AND sw_ratio >= 0.01
                    THEN 0 ELSE 1 END AS fail_q,
               CASE WHEN count(*) OVER (PARTITION BY norm_hash) > 1
                    THEN 1 ELSE 0 END AS is_dup
        FROM (
            SELECT doc_id, lang,
                   md5({duck_normalized()}) AS norm_hash,
                   len(toks) AS n_toks,
                   CAST(len(list_filter(toks, x -> x IN
                        ({", ".join(repr(w) for w in STOPWORDS)})))
                        AS DOUBLE) / greatest(len(toks), 1) AS sw_ratio,
                   CAST(length(text) AS DOUBLE)
                       / greatest(len(toks), 1) AS cpt
            FROM (SELECT doc_id, lang, text, {duck_tokens()} AS toks
                  FROM documents)
        )
    ),
    cm AS (
        SELECT lang,
               sum(fail_q * is_dup) AS tp,
               sum(fail_q * (1 - is_dup)) AS fp,
               sum((1 - fail_q) * is_dup) AS fn,
               sum((1 - fail_q) * (1 - is_dup)) AS tn
        FROM lab GROUP BY lang
    )
    SELECT lang,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CAST(floor(
               CAST(tp * tn - fp * fn AS DOUBLE)
               / sqrt(greatest(CAST(tp + fp AS DOUBLE)
                               * CAST(tp + fn AS DOUBLE)
                               * CAST(tn + fp AS DOUBLE)
                               * CAST(tn + fn AS DOUBLE), 1.0))
               * 1000000) AS BIGINT) AS mcc_e6
    FROM cm
    """,
    doc="Are low-quality documents and duplicated documents the same "
    "population?  Matthews correlation per language between 'fails the "
    "C4/Gopher quality gate' and 'belongs to an exact-dup group' — "
    "near-zero MCC means dedup and quality filtering prune different "
    "docs and the pipeline needs both stages; high MCC means one stage "
    "is mostly redundant.  Confusion counts are exact integers; the "
    "MCC ratio follows the CAST-AS-DOUBLE formula rule (products up to "
    "n^4 overflow BIGINT, so each factor casts to double before "
    "multiplying — identical text both engines, correctly-rounded IEEE "
    "ops only).  One scan, one dup-key window, one hash agg.",
    tags=("dedup", "text", "stats"),
)
def quality_dup_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_toks = F.size(toks)
    sw_ratio = count_in_list(toks, STOPWORDS).cast("double") / F.greatest(
        n_toks, F.lit(1)
    )
    cpt = F.length("text").cast("double") / F.greatest(n_toks, F.lit(1))
    base = docs.select(
        "lang",
        F.md5(normalized_text("text")).alias("norm_hash"),
        F.when(
            (n_toks >= 20)
            & (cpt >= 3)
            & (cpt <= 12)
            & (sw_ratio >= 0.01),
            0,
        )
        .otherwise(1)
        .alias("fail_q"),
    )
    lab = base.select(
        "lang",
        "fail_q",
        F.when(
            F.count(F.lit(1)).over(W.partitionBy("norm_hash")) > 1, 1
        )
        .otherwise(0)
        .alias("is_dup"),
    )
    cm = lab.groupBy("lang").agg(
        F.sum(F.col("fail_q") * F.col("is_dup")).alias("tp"),
        F.sum(F.col("fail_q") * (1 - F.col("is_dup"))).alias("fp"),
        F.sum((1 - F.col("fail_q")) * F.col("is_dup")).alias("fn"),
        F.sum((1 - F.col("fail_q")) * (1 - F.col("is_dup"))).alias("tn"),
    )
    return cm.select(
        "lang",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        F.expr(
            "CAST(floor("
            "CAST(tp * tn - fp * fn AS DOUBLE)"
            " / sqrt(greatest(CAST(tp + fp AS DOUBLE)"
            "                 * CAST(tp + fn AS DOUBLE)"
            "                 * CAST(tn + fp AS DOUBLE)"
            "                 * CAST(tn + fn AS DOUBLE), 1.0))"
            " * 1000000) AS BIGINT)"
        ).alias("mcc_e6"),
    )


# --- transitivity of the MinHash candidate-pair graph ------------------------


@register(
    "dup_pair_transitivity",
    oracle=_DUCK_MINHASH
    + f"""
    , long_bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band_idx, b{b} AS band_key FROM bands" for b in range(N_BANDS))}
    ),
    pairs AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM long_bands x JOIN long_bands y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
    ),
    und AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION ALL
        SELECT doc_b AS s, doc_a AS d FROM pairs
    ),
    wedge AS (
        SELECT e1.s AS a, e1.d AS b, e2.d AS c
        FROM und e1 JOIN und e2
          ON e1.d = e2.s AND e1.s < e2.d
    ),
    closed AS (
        SELECT count(*) AS n_closed
        FROM wedge w JOIN pairs p
          ON p.doc_a = w.a AND p.doc_b = w.c
    )
    SELECT CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_pairs,
           CAST((SELECT count(*) FROM wedge) AS BIGINT) AS n_wedges,
           CAST((SELECT n_closed FROM closed) AS BIGINT) AS n_closed,
           CAST((1000000 * (SELECT n_closed FROM closed))
                // greatest((SELECT count(*) FROM wedge), 1) AS BIGINT)
               AS closure_ppm
    """,
    doc="Is near-duplication transitive in practice?  Closure rate of "
    "the MinHash-LSH candidate graph: of all wedges a–b–c, how many "
    "have the closing a–c candidate edge.  High closure justifies "
    "connected-component canonicalization (dedup_components treats "
    "candidate clusters as equivalence classes); low closure means "
    "chains of borderline matches are being glued into false "
    "super-clusters and pairwise verification (dedup_verified_pairs) "
    "must gate the union step.  The wedge join runs on the LSH "
    "candidate set — already bucket-bounded — never on the corpus; "
    "all counts exact integers.",
    tags=("dedup", "graph"),
)
def dup_pair_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the LSH pipeline is referenced 5× below (both union sides, the
    # closure join, the count) — materialize the small pair list once
    # instead of recomputing shingles→signatures→bands per reference
    pairs = (
        REGISTRY.specs()["dedup_minhash_pairs"]
        .fn(spark, sf_dir)
        .transform(snapshot, eager=True)
    )
    und = pairs.select(
        F.col("doc_a").alias("s"), F.col("doc_b").alias("d")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
    )
    e1 = und.alias("e1")
    e2 = und.alias("e2")
    wedge = e1.join(
        e2,
        (F.col("e1.d") == F.col("e2.s")) & (F.col("e1.s") < F.col("e2.d")),
    ).select(F.col("e1.s").alias("a"), F.col("e2.d").alias("c"))
    closed = wedge.join(
        pairs,
        (F.col("doc_a") == F.col("a")) & (F.col("doc_b") == F.col("c")),
    )
    n_pairs = pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
    n_wedges = wedge.agg(F.count(F.lit(1)).alias("n_wedges"))
    n_closed = closed.agg(F.count(F.lit(1)).alias("n_closed"))
    return (
        n_pairs.crossJoin(n_wedges)
        .crossJoin(n_closed)
        .select(
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("n_wedges").cast("long").alias("n_wedges"),
            F.col("n_closed").cast("long").alias("n_closed"),
            F.expr(
                "CAST((1000000 * n_closed)"
                " DIV greatest(n_wedges, 1) AS BIGINT)"
            ).alias("closure_ppm"),
        )
    )


# --- MinHash signature-length accuracy sweep ----------------------------------

_M4_DUCK = "(" + " + ".join(
    f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(4)
) + ")"
_M8_DUCK = "(" + " + ".join(
    f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(8)
) + ")"
_M16_DUCK = "(" + " + ".join(
    f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(16)
) + ")"
_M4_SPARK = "(" + " + ".join(
    f"CASE WHEN a{i} = b{i} THEN 1 ELSE 0 END" for i in range(4)
) + ")"
_M8_SPARK = "(" + " + ".join(
    f"CASE WHEN a{i} = b{i} THEN 1 ELSE 0 END" for i in range(8)
) + ")"
_M16_SPARK = "(" + " + ".join(
    f"CASE WHEN a{i} = b{i} THEN 1 ELSE 0 END" for i in range(16)
) + ")"

_LONG_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, b{b} AS band_key FROM bands"
    for b in range(N_BANDS)
)


@register(
    "minhash_k_accuracy_sweep",
    oracle=_DUCK_MINHASH
    + f"""
    , long_bands AS ({_LONG_BANDS_SQL}),
    pairs AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM long_bands x JOIN long_bands y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
    ),
    shc AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
        SELECT p.doc_a, p.doc_b, count(*) AS i
        FROM pairs p
        JOIN sh sa ON sa.doc_id = p.doc_a
        JOIN sh sb ON sb.doc_id = p.doc_b
                  AND sb.shingle = sa.shingle
        GROUP BY p.doc_a, p.doc_b
    ),
    pm AS (
        SELECT p.doc_a, p.doc_b,
               {_M4_DUCK} AS m4,
               {_M8_DUCK} AS m8,
               {_M16_DUCK} AS m16,
               ca.c AS ca, cb.c AS cb,
               coalesce(i.i, 0) AS inter
        FROM pairs p
        JOIN mh a ON a.doc_id = p.doc_a
        JOIN mh b ON b.doc_id = p.doc_b
        JOIN shc ca ON ca.doc_id = p.doc_a
        JOIN shc cb ON cb.doc_id = p.doc_b
        LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
    ),
    lvl AS (
        SELECT k,
               (10000 * m) // k AS est_e4,
               (10000 * inter) // (ca + cb - inter) AS true_e4
        FROM (
            SELECT ca, cb, inter,
                   unnest([4, 8, 16]) AS k,
                   unnest([m4, m8, m16]) AS m
            FROM pm
        )
    )
    SELECT k,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(abs(est_e4 - true_e4)) // count(*) AS BIGINT)
               AS mean_abs_err_e4,
           CAST(max(abs(est_e4 - true_e4)) AS BIGINT) AS max_abs_err_e4,
           CAST(sum(true_e4) // count(*) AS BIGINT) AS mean_true_e4
    FROM lvl GROUP BY k
    """,
    doc="How many MinHash permutations does the dedup pipeline need?  "
    "On the LSH candidate pairs, compare the Jaccard estimate from "
    "the first 4 / 8 / 16 hash functions against the TRUE shingle "
    "Jaccard (exact set intersection, computed only for candidates — "
    "never all pairs), reporting mean/max absolute error per "
    "signature length.  The estimator's std err is sqrt(J(1-J)/k); "
    "this measures it empirically so the 16-hash default "
    "(minhash_signatures) is justified cost, not a guess.  All "
    "integer fixed-point; every join fans out only over the "
    "candidate set.",
    tags=("dedup", "sketch"),
)
def minhash_k_accuracy_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # each of these is referenced 2-3× below; materialize once so the
    # tokenize→shingle→sign pipeline doesn't replay per plan branch
    pairs = (
        REGISTRY.specs()["dedup_minhash_pairs"]
        .fn(spark, sf_dir)
        .transform(snapshot, eager=True)
    )
    mh = minhash_sigs(spark, sf_dir).transform(snapshot, eager=True)
    sh = shingles(spark, sf_dir).transform(snapshot, eager=True)
    shc = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    sa = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("shingle").alias("sha")
    )
    sb = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("shingle").alias("shb")
    )
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("sha") == F.col("shb"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    a = mh.select(
        [F.col("doc_id").alias("doc_a")]
        + [F.col(f"h{i}").alias(f"a{i}") for i in range(N_MINHASH)]
    )
    b = mh.select(
        [F.col("doc_id").alias("doc_b")]
        + [F.col(f"h{i}").alias(f"b{i}") for i in range(N_MINHASH)]
    )
    ca = shc.select(
        F.col("doc_id").alias("doc_a"), F.col("c").alias("ca")
    )
    cb = shc.select(
        F.col("doc_id").alias("doc_b"), F.col("c").alias("cb")
    )
    pm = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .join(ca, "doc_a")
        .join(cb, "doc_b")
        .join(inter, ["doc_a", "doc_b"], "left")
        .select(
            "ca",
            "cb",
            F.coalesce(F.col("i"), F.lit(0)).alias("inter"),
            F.expr(_M4_SPARK).alias("m4"),
            F.expr(_M8_SPARK).alias("m8"),
            F.expr(_M16_SPARK).alias("m16"),
        )
    )
    lvl = pm.select(
        "ca",
        "cb",
        "inter",
        F.explode(
            F.map_from_arrays(
                F.array(F.lit(4), F.lit(8), F.lit(16)),
                F.array("m4", "m8", "m16"),
            )
        ).alias("k", "m"),
    ).select(
        "k",
        F.expr("(10000 * m) DIV k").alias("est_e4"),
        F.expr("(10000 * inter) DIV (ca + cb - inter)").alias("true_e4"),
    )
    return lvl.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr(
            "CAST(sum(abs(est_e4 - true_e4)) DIV count(*) AS BIGINT)"
        ).alias("mean_abs_err_e4"),
        F.max(F.abs(F.col("est_e4") - F.col("true_e4")))
        .cast("long")
        .alias("max_abs_err_e4"),
        F.expr("CAST(sum(true_e4) DIV count(*) AS BIGINT)").alias(
            "mean_true_e4"
        ),
    )


# --- do exact-dup groups respect dataloader shard boundaries? ------------------

_HEX16_SHARD = "0123456789abcdef"
_DUCK_DOC_SHARD = "(" + " + ".join(
    f"CAST(instr('{_HEX16_SHARD}', substr(md5('shard:' || CAST(doc_id AS "
    f"VARCHAR)), {i + 1}, 1)) - 1 AS BIGINT) * {16 ** (7 - i)}"
    for i in range(8)
) + ") % 64"


@register(
    "dedup_shard_locality",
    oracle=f"""
    , h AS (
        SELECT doc_id,
               md5(substring({duck_normalized()}, 1, 40)) AS norm_hash,
               {_DUCK_DOC_SHARD} AS shard
        FROM documents
    ),
    grp AS (
        SELECT norm_hash,
               count(*) AS gsize,
               count(DISTINCT shard) AS n_shards
        FROM h GROUP BY norm_hash
        HAVING count(*) > 1
    ),
    tot AS (SELECT count(*) AS tg, sum(gsize) AS td FROM grp)
    SELECT g.n_shards,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(g.gsize) AS BIGINT) AS n_docs,
           CAST((1000000 * count(*)) // max(t.tg) AS BIGINT)
               AS group_share_ppm,
           CAST((1000000 * sum(g.gsize)) // max(t.td) AS BIGINT)
               AS doc_share_ppm
    FROM grp g CROSS JOIN tot t
    GROUP BY g.n_shards
    """,
    doc="Can dedup run shard-locally?  Hash every document into the 64 "
    "dataloader shards (the shard_token_balance split) and, for each "
    "duplicate-family group (40-char normalized-prefix key — the "
    "template_prefix_clusters family notion; full-hash exact dups "
    "are empty on this corpus below sf0.1, which would make the "
    "check vacuous), count how many shards the group straddles — "
    "the histogram of n_shards answers whether per-shard dedup "
    "catches duplicates (n_shards=1) or a global shuffle on the "
    "content hash is mandatory (n_shards>1, the common case, since "
    "content-independent sharding scatters copies by construction).  "
    "This is the measurement behind dedup_exact's design note that "
    "the shuffle key must be the digest, not the storage partition.  "
    "Exact integers; one scan, one group agg.",
    tags=("dedup", "mixing"),
)
def dedup_shard_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        F.md5(F.substring(normalized_text("text"), 1, 40)).alias(
            "norm_hash"
        ),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("shard:"),
                                   F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 64
        ).alias("shard"),
    )
    grp = (
        h.groupBy("norm_hash")
        .agg(
            F.count(F.lit(1)).alias("gsize"),
            F.countDistinct("shard").alias("n_shards"),
        )
        .filter(F.col("gsize") > 1)
    )
    tot = grp.agg(
        F.count(F.lit(1)).alias("tg"), F.sum("gsize").alias("td")
    )
    return (
        grp.crossJoin(F.broadcast(tot))
        .groupBy("n_shards")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("gsize").cast("long").alias("n_docs"),
            F.expr(
                "CAST((1000000 * count(*)) DIV max(tg) AS BIGINT)"
            ).alias("group_share_ppm"),
            F.expr(
                "CAST((1000000 * sum(gsize)) DIV max(td) AS BIGINT)"
            ).alias("doc_share_ppm"),
        )
        .select(
            F.col("n_shards").cast("long").alias("n_shards"),
            "n_groups",
            "n_docs",
            "group_share_ppm",
            "doc_share_ppm",
        )
    )


# --- template detection via shared token prefix ----------------------------------


@register(
    "template_prefix_clusters",
    oracle=f"""
    , pfx AS (
        SELECT doc_id,
               md5(array_to_string(list_slice(toks, 1, 16), ' '))
                   AS pkey
        FROM (SELECT doc_id, {duck_tokens()} AS toks FROM documents)
        WHERE len(toks) >= 16
    ),
    grp AS (
        SELECT pkey, count(*) AS gsize
        FROM pfx GROUP BY pkey
        HAVING count(*) > 1
    ),
    tot AS (SELECT count(*) AS n_docs FROM pfx)
    SELECT g.gsize,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(g.gsize * count(*) AS BIGINT) AS n_docs,
           CAST((1000000 * g.gsize * count(*)) // max(t.n_docs)
               AS BIGINT) AS doc_share_ppm
    FROM grp g CROSS JOIN tot t
    GROUP BY g.gsize
    """,
    doc="Template detection the exact-dedup stage misses: documents "
    "sharing an identical 16-token PREFIX (boilerplate headers, "
    "generated-page skeletons) clustered by the md5 of the joined "
    "prefix, histogrammed by cluster size with the share of the "
    "eligible corpus trapped in templates.  Exact dedup needs the "
    "whole text equal; near-dup (minhash) needs global similarity — "
    "prefix templates with long varying tails evade both, and this "
    "is the standard cheap screen for them.  One hash-shuffle on the "
    "prefix digest (distributes like dedup_exact); short docs are "
    "excluded identically on both engines.",
    tags=("dedup", "text"),
)
def template_prefix_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    pfx = docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.slice(toks, 1, 16))
        ).alias("pkey"),
        F.size(toks).alias("nt"),
    ).filter(F.col("nt") >= 16)
    grp = (
        pfx.groupBy("pkey")
        .agg(F.count(F.lit(1)).alias("gsize"))
        .filter(F.col("gsize") > 1)
    )
    tot = pfx.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        grp.crossJoin(F.broadcast(tot))
        .groupBy("gsize")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            (F.col("gsize") * F.count(F.lit(1)))
            .cast("long")
            .alias("n_docs"),
            F.expr(
                "CAST((1000000 * gsize * count(*)) DIV max(n_docs)"
                " AS BIGINT)"
            ).alias("doc_share_ppm"),
        )
        .select(
            F.col("gsize").cast("long").alias("gsize"),
            "n_clusters",
            "n_docs",
            "doc_share_ppm",
        )
    )


# --- survivor bias of keep-min dedup across sources --------------------------------


@register(
    "dedup_survivor_source_bias",
    oracle=f"""
    , h AS (
        SELECT doc_id, source,
               md5({duck_normalized()}) AS norm_hash
        FROM documents
    ),
    lab AS (
        SELECT source,
               CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY norm_hash)
                    THEN 1 ELSE 0 END AS keep
        FROM h
    ),
    per AS (
        SELECT source, count(*) AS n_docs, sum(keep) AS n_kept
        FROM lab GROUP BY source
    ),
    tot AS (SELECT sum(n_docs) AS td, sum(n_kept) AS tk FROM per)
    SELECT p.source,
           CAST(p.n_docs AS BIGINT) AS n_docs,
           CAST(p.n_kept AS BIGINT) AS n_kept,
           CAST((1000000 * p.n_kept) // p.n_docs AS BIGINT)
               AS survival_ppm,
           CAST((1000000 * p.n_kept) // p.n_docs
                - (1000000 * t.tk) // t.td AS BIGINT)
               AS bias_vs_corpus_ppm
    FROM per p CROSS JOIN tot t
    """,
    doc="Does keep-min(doc_id) dedup silently re-weight the source "
    "mix?  Canonical selection keeps the lowest doc_id per exact-dup "
    "group — if ingestion order correlates with source, sources "
    "ingested early survive dedup disproportionately and the "
    "post-dedup corpus drifts from the mixture the pipeline was told "
    "to build (importance_resample_mix's weights silently shift).  "
    "Per-source survival rate vs the corpus-wide rate, signed "
    "deviation in ppm.  One dup-key window over the hash shuffle, "
    "one agg — same scale shape as dedup_exact.",
    tags=("dedup", "mixing"),
)
def dedup_survivor_source_bias(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "source",
        F.md5(normalized_text("text")).alias("norm_hash"),
    )
    lab = h.select(
        "source",
        F.when(
            F.col("doc_id")
            == F.min("doc_id").over(W.partitionBy("norm_hash")),
            1,
        )
        .otherwise(0)
        .alias("keep"),
    )
    per = lab.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("keep").alias("n_kept"),
    )
    tot = per.agg(
        F.sum("n_docs").alias("td"), F.sum("n_kept").alias("tk")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.expr(
            "CAST((1000000 * n_kept) DIV n_docs AS BIGINT)"
        ).alias("survival_ppm"),
        F.expr(
            "CAST((1000000 * n_kept) DIV n_docs"
            " - (1000000 * tk) DIV td AS BIGINT)"
        ).alias("bias_vs_corpus_ppm"),
    )


# --- arrival distance between successive duplicates ---------------------------------


@register(
    "dup_arrival_distance_histogram",
    oracle=f"""
    , h AS (
        SELECT doc_id,
               md5(substring({duck_normalized()}, 1, 40)) AS norm_hash
        FROM documents
    ),
    gaps AS (
        SELECT doc_id - lag(doc_id) OVER (PARTITION BY norm_hash
                                          ORDER BY doc_id) AS gap
        FROM h
    ),
    g AS (
        SELECT length(bin(gap)) - 1 AS log2_gap
        FROM gaps WHERE gap IS NOT NULL
    ),
    tot AS (SELECT count(*) AS n FROM g)
    SELECT g.log2_gap,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST((1000000 * count(*)) // max(t.n) AS BIGINT)
               AS share_ppm,
           CAST(sum(1000000 * count(*)) OVER (ORDER BY g.log2_gap)
                // max(max(t.n)) OVER () AS BIGINT) AS cum_share_ppm
    FROM g CROSS JOIN tot t
    GROUP BY g.log2_gap
    """,
    doc="How big must a streaming dedup buffer be?  For every "
    "successive pair of duplicate-family members (same 40-char "
    "normalized-prefix md5 — the template-family key; full-hash "
    "exact dups are empty on this corpus below sf0.1), "
    "the arrival distance in doc_id order, histogrammed by "
    "power-of-two buckets with the cumulative share — cum_share at "
    "bucket b is exactly the recall a bounded window of 2^(b+1) "
    "recent documents achieves (the sizing curve for "
    "incremental_dedup_new_batch's batch window vs a full-history "
    "state store).  Exact integers; one hash-key window over the "
    "digest shuffle.",
    tags=("dedup", "streaming"),
)
def dup_arrival_distance_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        F.md5(F.substring(normalized_text("text"), 1, 40)).alias(
            "norm_hash"
        ),
    )
    w = W.partitionBy("norm_hash").orderBy("doc_id")
    gaps = h.select(
        (F.col("doc_id") - F.lag("doc_id").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    g = gaps.select(
        (F.length(F.bin("gap")) - 1).alias("log2_gap")
    )
    per = g.groupBy("log2_gap").agg(F.count(F.lit(1)).alias("c"))
    tot = per.agg(F.sum("c").alias("n"))
    wc = W.orderBy("log2_gap").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("log2_gap").cast("long").alias("log2_gap"),
        F.col("c").cast("long").alias("n_pairs"),
        F.expr("CAST((1000000 * c) DIV n AS BIGINT)").alias(
            "share_ppm"
        ),
        F.expr(
            "CAST(sum(1000000 * c) OVER (ORDER BY log2_gap"
            " ROWS UNBOUNDED PRECEDING) DIV n AS BIGINT)"
        ).alias("cum_share_ppm"),
    )


# --- LSH bucket fan-out audit -----------------------------------------------------


@register(
    "lsh_bucket_fanout_histogram",
    oracle=_DUCK_MINHASH
    + f"""
    , long_bands AS ({_LONG_BANDS_SQL}),
    bsz AS (
        SELECT band_idx, band_key, count(*) AS sz
        FROM long_bands GROUP BY band_idx, band_key
    ),
    h AS (
        SELECT length(bin(sz)) - 1 AS log2_size,
               sz, sz * (sz - 1) // 2 AS pairs
        FROM bsz
    )
    SELECT h.log2_size,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(h.sz) AS BIGINT) AS n_entries,
           CAST(sum(h.pairs) AS BIGINT) AS candidate_pairs,
           CAST(max(h.sz) AS BIGINT) AS max_bucket
    FROM h GROUP BY h.log2_size
    """,
    doc="The join-explosion audit behind every LSH claim: the size "
    "distribution of MinHash band buckets (power-of-two histogram) "
    "with the candidate-pair count sz·(sz−1)/2 each size class "
    "generates — the LSH equi-join's actual fan-out is Σpairs, and "
    "one mega-bucket (a boilerplate band value) can dominate the "
    "whole dedup cost; this is the skew check that says whether the "
    "bucketed join needs salting at corpus scale.  One agg over the "
    "band layout, exact integers.",
    tags=("dedup", "ops"),
)
def lsh_bucket_fanout_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    bands = minhash_bands(spark, sf_dir)
    stack_expr = ", ".join(f"{b}, b{b}" for b in range(N_BANDS))
    long_bands = bands.select(
        F.expr(
            f"stack({N_BANDS}, {stack_expr}) AS (band_idx, band_key)"
        )
    )
    bsz = long_bands.groupBy("band_idx", "band_key").agg(
        F.count(F.lit(1)).alias("sz")
    )
    h = bsz.select(
        (F.length(F.bin("sz")) - 1).alias("log2_size"),
        "sz",
        F.expr("sz * (sz - 1) DIV 2").alias("pairs"),
    )
    return h.groupBy("log2_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("sz").cast("long").alias("n_entries"),
        F.sum("pairs").cast("long").alias("candidate_pairs"),
        F.max("sz").cast("long").alias("max_bucket"),
    )


# --- do MinHash-LSH and SimHash agree on candidates? --------------------------------


@register(
    "lsh_simhash_agreement",
    oracle=_DUCK_MINHASH
    + f"""
    , long_bands AS ({_LONG_BANDS_SQL}),
    pairs AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM long_bands x JOIN long_bands y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
    ),
    tok_hash AS (SELECT doc_id, md5(tok) AS th FROM tokpos),
    bits AS (
        SELECT doc_id, r.b AS b,
               CASE WHEN ((instr('{_HEXMAP}',
                               substring(th, CAST(r.b // 4 AS INTEGER) + 1,
                                         1)) - 1)
                          // CAST(pow(2, r.b % 4) AS INTEGER)) % 2 = 1
                    THEN 1 ELSE -1 END AS sgn
        FROM tok_hash, range({_SIMHASH_BITS}) r(b)
    ),
    sb AS (
        SELECT doc_id, b,
               CASE WHEN sum(sgn) > 0 THEN 1 ELSE 0 END AS bit
        FROM bits GROUP BY doc_id, b
    ),
    sig AS (
        SELECT doc_id,
               CAST(sum(bit * CAST(pow(2, b) AS BIGINT)) AS BIGINT)
                   AS simhash
        FROM sb GROUP BY doc_id
    ),
    ham AS (
        SELECT bit_count(CAST(xor(sa.simhash, sb2.simhash) AS BIGINT))
                   AS dist
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.doc_a
        JOIN sig sb2 ON sb2.doc_id = p.doc_b
    ),
    tot AS (SELECT count(*) AS n FROM ham)
    SELECT h.dist // 4 AS dist_band,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(h.dist) AS BIGINT) AS min_dist,
           CAST(max(h.dist) AS BIGINT) AS max_dist,
           CAST((1000000 * count(*)) // max(t.n) AS BIGINT)
               AS share_ppm
    FROM ham h CROSS JOIN tot t
    GROUP BY h.dist // 4
    """,
    doc="Cross-family near-dup agreement: for every MinHash-LSH "
    "candidate pair, the SimHash Hamming distance (32-bit signatures, "
    "banded by 4) — if LSH candidates concentrate at low Hamming "
    "distance the two sketch families corroborate and either can "
    "gate the other cheaply; a flat distribution means the LSH pairs "
    "are band-collision noise (the fixture's expected shape, since "
    "it has no true near-dups — the test data's own documentation).  "
    "Bounded by the candidate set; signatures join in, never "
    "all-pairs.  Exact integers, xor+bit_count on both engines.",
    tags=("dedup", "sketch"),
)
def lsh_simhash_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sig joins in on both pair sides and ham feeds both the total and
    # the final rollup — materialize each once instead of replaying the
    # LSH and simhash pipelines per reference
    pairs = REGISTRY.specs()["dedup_minhash_pairs"].fn(spark, sf_dir)
    sig = (
        REGISTRY.specs()["dedup_simhash"]
        .fn(spark, sf_dir)
        .transform(snapshot, eager=True)
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha")
    )
    sb2 = sig.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb")
    )
    ham = (
        pairs.join(sa, "doc_a")
        .join(sb2, "doc_b")
        .select(
            F.bit_count(
                F.col("ha").bitwiseXOR(F.col("hb"))
            ).alias("dist")
        )
        .transform(snapshot, eager=True)
    )
    tot = ham.agg(F.count(F.lit(1)).alias("n"))
    return (
        ham.crossJoin(F.broadcast(tot))
        .groupBy(F.expr("dist DIV 4").alias("dist_band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min("dist").cast("long").alias("min_dist"),
            F.max("dist").cast("long").alias("max_dist"),
            F.expr(
                "CAST((1000000 * count(*)) DIV max(n) AS BIGINT)"
            ).alias("share_ppm"),
        )
        .select(
            F.col("dist_band").cast("long").alias("dist_band"),
            "n_pairs",
            "min_dist",
            "max_dist",
            "share_ppm",
        )
    )


# --- duplicate leakage across the train/eval split -----------------------------------


@register(
    "split_dup_leakage",
    oracle=f"""
    , h AS (
        SELECT doc_id,
               md5({duck_normalized()}) AS norm_hash,
               CASE WHEN instr('0123456789abcdef',
                        substring(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                         - 1 < 13
                    THEN 1 ELSE 0 END AS is_train
        FROM documents
    ),
    grp AS (
        SELECT norm_hash,
               count(*) AS gsize,
               sum(is_train) AS n_train
        FROM h GROUP BY norm_hash
        HAVING count(*) > 1
    ),
    ev AS (
        SELECT count(*) AS n_eval FROM h WHERE is_train = 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_dup_groups,
           CAST(sum(CASE WHEN n_train > 0 AND n_train < gsize
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_leaking_groups,
           CAST(sum(CASE WHEN n_train > 0 THEN gsize - n_train
                         ELSE 0 END) AS BIGINT)
               AS n_contaminated_eval_docs,
           CAST((1000000 * sum(CASE WHEN n_train > 0
                                    THEN gsize - n_train ELSE 0 END))
                // greatest((SELECT n_eval FROM ev), 1) AS BIGINT)
               AS eval_contamination_ppm
    FROM grp
    """,
    doc="The dedup-split interaction that silently inflates eval "
    "scores: exact-dup groups with members on BOTH sides of the "
    "train/eval hash split (train_test_split's 13/16 nibble rule) — "
    "every eval doc whose duplicate sits in train is memorization "
    "credit, not generalization.  Reports leaking groups and the "
    "contaminated share of the eval split; the remedy (dedup BEFORE "
    "splitting, or split by canonical group key) is exactly why "
    "dedup_canonical_docs exists upstream.  One digest-shuffle agg; "
    "exact integers.",
    tags=("dedup", "training"),
)
def split_dup_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nibble = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
        )
        - 1
    )
    h = docs.select(
        F.md5(normalized_text("text")).alias("norm_hash"),
        F.when(nibble < 13, 1).otherwise(0).alias("is_train"),
    )
    grp = (
        h.groupBy("norm_hash")
        .agg(
            F.count(F.lit(1)).alias("gsize"),
            F.sum("is_train").alias("n_train"),
        )
        .filter(F.col("gsize") > 1)
    )
    ev = h.filter(F.col("is_train") == 0).agg(
        F.count(F.lit(1)).alias("n_eval")
    )
    agg = grp.agg(
        F.count(F.lit(1)).alias("n_dup_groups"),
        F.sum(
            F.when(
                (F.col("n_train") > 0)
                & (F.col("n_train") < F.col("gsize")),
                1,
            ).otherwise(0)
        ).alias("n_leaking_groups"),
        F.sum(
            F.when(
                F.col("n_train") > 0, F.col("gsize") - F.col("n_train")
            ).otherwise(0)
        ).alias("n_contaminated"),
    )
    return agg.crossJoin(F.broadcast(ev)).select(
        F.col("n_dup_groups").cast("long").alias("n_dup_groups"),
        F.col("n_leaking_groups").cast("long").alias(
            "n_leaking_groups"
        ),
        F.col("n_contaminated").cast("long").alias(
            "n_contaminated_eval_docs"
        ),
        F.expr(
            "CAST((1000000 * n_contaminated)"
            " DIV greatest(n_eval, 1) AS BIGINT)"
        ).alias("eval_contamination_ppm"),
    )
