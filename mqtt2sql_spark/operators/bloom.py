"""Deterministic Bloom-filter semi-join pruning.

The scale problem: a selective dimension predicate (e.g. urgent orders)
should prune the FACT side of a join before the shuffle, but the key set
is too large to broadcast as an IN-list.  A Bloom filter compresses any
key set into a fixed-size bitmap (here 64 Kbit = 8 KB) that broadcasts
for free and filters fact rows map-side with zero false negatives —
exactly Spark's own runtime-filter optimization
(`spark.sql.optimizer.runtime.bloomFilter.enabled`), built here from
first principles so the mechanics are explicit, deterministic, and
testable: the pruned pipeline must produce BIT-IDENTICAL results to the
unpruned join, because Bloom false positives are removed by the real
join that follows and false negatives cannot occur by construction.

Layout: the bitmap is a map<word_index -> 64-bit word> carried in ONE
row — absent words mean zero, so a sparse key set costs even less than
8 KB.  K=3 probe positions come from independent 32-bit slices of the
md5 both engines share (the repo-standard hash).

Cost model at 100 TB: build = one pass over the (small) key side plus a
<=1024-row aggregate; probe = map-side bitmask tests fused into the fact
scan's codegen stage; the subsequent shuffle/join sees only surviving
rows.  With a 1% selective dimension this turns a full-fact shuffle into
a ~1% shuffle for 8 KB of broadcast traffic.

Reference context: the reference joins only its two own tables
(mysql.sql:94-103) and has no optimizer; runtime filters are extension
surface (SURVEY.md §2 C / §4.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS = 1 << 16  # bitmap size (bits); 1024 64-bit words
K = 3  # probe positions per key


def _positions(key: Column) -> list[Column]:
    """K independent bit positions from md5 slices of the key string."""
    h = F.md5(key.cast("string"))
    return [
        (F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long") % M_BITS)
        for i in range(K)
    ]


def build_bloom(keys_df: DataFrame, key_col: str) -> DataFrame:
    """One-row DataFrame with column `bloom`: map<long, long> bitmap."""
    pos = keys_df.select(
        F.explode(F.array(*_positions(F.col(key_col)))).alias("p")
    )
    words = pos.groupBy((F.col("p") / 64).cast("long").alias("w")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))")
        ).alias("mask")
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "mask"))).alias(
            "bloom"
        )
    )


def bloom_prune(df: DataFrame, bloom_row: DataFrame, key_col: str) -> DataFrame:
    """Rows of `df` whose key MIGHT be in the bloom (no false negatives).

    Broadcasts the one-row bitmap; the membership test runs inside the
    scan's projection.  Must be followed by the real join for exactness.
    """
    out = df.crossJoin(F.broadcast(bloom_row))
    tmp_cols = []
    for i, p in enumerate(_positions(F.col(key_col))):
        out = out.withColumn(f"_bp{i}", p)
        tmp_cols.append(f"_bp{i}")
    cond = F.lit(True)
    for c in tmp_cols:
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({c} % 64 AS INT))")
        word = F.coalesce(
            F.element_at(F.col("bloom"), (F.col(c) / 64).cast("long")),
            F.lit(0),
        )
        cond = cond & (word.bitwiseAND(mask) == mask)
    return out.filter(cond).drop("bloom", *tmp_cols)
