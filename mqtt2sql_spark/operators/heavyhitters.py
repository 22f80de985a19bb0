"""Two-phase distributed heavy hitters (frequent items above a support
threshold) — exact output, candidate-pruned shuffle.

The naive plan for "keys with count >= T" shuffles EVERY key to its
reducer (a full `groupBy(key).count()`), which at 100 TB moves the whole
fact table through the exchange even though almost no key qualifies.
This operator uses the classic two-pass candidate/verify scheme
(Savasere/Omiecinski/Navathe partition algorithm, VLDB'95):

  phase 1 (map-only, zero shuffle): each input partition counts its own
    rows in a Pandas batch accumulator and emits only keys whose LOCAL
    count reaches ceil(T / P).  Pigeonhole guarantee: a key with global
    count >= T must reach T/P in at least one of the P partitions, so
    every true heavy hitter is a candidate — under ANY row placement.
    False candidates are possible (a key locally dense in one partition)
    but bounded: each partition emits at most (partition rows)/(T/P)
    keys.

  phase 2 (exact verify): the tiny candidate set broadcasts back as a
    semi-join filter, and only candidate rows are shuffled into an exact
    `groupBy(key).count()`, then filtered to count >= T.

The output is therefore EXACT and independent of partitioning — the
candidate set varies with row placement, the verified answer does not —
which is what makes the operator oracle-checkable against a plain
GROUP BY ... HAVING in DuckDB.

Cost at scale: two scans of the fact (both map-local and
columnar-pruned to the key column) but a shuffle of only
candidate-matching rows, versus one scan + full-table shuffle for the
naive plan.  For skewed key spaces (the regime where heavy hitters are
interesting) the candidate shuffle is orders of magnitude smaller; if
every key is frequent, use the plain groupBy instead.

Reference context: the reference has no aggregation surface at all
(SURVEY.md §2 C — no GROUP BY anywhere in mqtt2sql.py); this is
extension surface for the hot-topic / heavy-user observability a real
MQTT fleet needs.
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, key_col: str, threshold: int) -> DataFrame:
    """Exact (key, n) pairs with n = count(*) >= threshold.

    Output columns: ``key_col`` (original type coerced to string upstream
    by callers that need it), ``n`` LongType.
    """
    if threshold < 1:
        raise ValueError("threshold must be >= 1")
    keyed = df.select(F.col(key_col).alias("k"))
    # Partition count of the exact plan phase 1 runs over.  mapInPandas
    # executes one iterator per partition of THIS plan, so the
    # pigeonhole bound uses its true P.
    n_parts = max(1, keyed.rdd.getNumPartitions())
    local_min = max(1, math.ceil(threshold / n_parts))

    def mine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Accumulate across ALL Arrow batches of the partition before
        # applying the local threshold — a per-batch threshold would
        # break the pigeonhole guarantee.
        counts: Counter = Counter()
        for pdf in batches:
            counts.update(pdf["k"].dropna())
        hits = [k for k, c in counts.items() if c >= local_min]
        yield pd.DataFrame({"k": pd.Series(hits, dtype=object)})

    candidates = keyed.mapInPandas(mine, schema="k string").distinct()
    verified = (
        df.join(
            F.broadcast(candidates),
            F.col(key_col) == F.col("k"),
            "left_semi",
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
    )
    return verified
