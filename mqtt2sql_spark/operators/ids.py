"""Dense surrogate-id assignment (SURVEY.md §2 A7).

The reference enforces dense ids with a BEFORE INSERT trigger computing
``max(id)+1`` (/root/reference/mysql.sql:66-75).  Spark has no
auto-increment; ``monotonically_increasing_id`` is non-dense and a global
``row_number`` window funnels all rows through one task — fine for a
dimension, wrong for a 100 TB fact stream.

``dense_row_ids`` implements a deterministic two-phase pattern:

  1. bucket every row by a *data-derived, order-aligned* bucket column
     (default: ``to_date(order_cols[0])`` for timestamp-ordered streams —
     the same column the history table is partitioned by at scale);
  2. per-bucket ``row_number`` (parallel across buckets);
  3. bucket offsets = cumulative counts over the tiny bucket list,
     broadcast back.

Unlike ``repartitionByRange``-based numbering, the bucket is a pure
function of the data, so the offset branch and the numbering branch can
never disagree (range-partition boundary *sampling* is seeded per-RDD and
is not reproducible across plan branches — observed at sf0.01).

Bucket-width sizing at scale: the offsets list has one row per bucket
and is broadcast, so the bucket WIDTH (the divisor in ``x div W``, or
the calendar grain) must grow with the data — size it so the bucket
COUNT stays in the 10³-10⁶ range (broadcastable list, per-bucket sorts
that fit an executor).  The fixed widths used by the registered queries
(4096 ids, a calendar day, etc.) are calibrated for the fixture scales;
a 100 TB deployment passes a wider ``bucket`` expression — the
correctness contract (monotonic pure function of the order) is
unchanged by the width.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from mqtt2sql_spark.operators.materialize import snapshot


def dense_row_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    id_col: str = "id",
    bucket: Column | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Assign 1-based dense BIGINT ids in total ``order_cols`` order.

    ``order_cols`` must be a total order (include a unique tie-breaker).
    ``bucket`` must be monotonic w.r.t. the order: rows in a "smaller"
    bucket must sort before every row of a "larger" bucket.  The default
    buckets by calendar day of the leading timestamp column, giving
    ~uniform parallelism for event streams; pass ``F.lit(0)`` to force a
    single-bucket (global window) fallback for non-temporal orders.

    ``materialize`` (default) lazily localCheckpoints the windowed
    relation, so BOTH consumers (the id join and the offsets branch)
    read the same materialized blocks instead of recomputing the
    upstream chain — column pruning gives the two branches different
    subplans, so ReusedExchange can never fire on its own.  At fixture
    scale the recompute is noise (~5%, measured both ways at sf0.1);
    the real reasons to materialize are (a) id stability under task
    retry — both branches are guaranteed to see the same rows even if
    an upstream source is nondeterministic — and (b) upstreams where
    the pruned chain is itself expensive (joins, explodes).  Pass
    False for plans whose upstream is a bare scan if block-manager
    storage is at a premium.
    """
    if bucket is None:
        bucket = F.to_date(F.col(order_cols[0]))
    cols = [F.col(c) for c in order_cols]
    with_b = df.withColumn("_bkt", bucket)
    local = with_b.withColumn(
        "_rn", F.row_number().over(W.partitionBy("_bkt").orderBy(*cols))
    )
    if materialize:
        local = local.transform(snapshot, eager=False)
    # bucket sizes = max(_rn) on the window output: the groupBy consumes
    # the window's hash(_bkt) partitioning, so the offsets branch adds no
    # extra shuffle of the big side.
    counts = local.groupBy("_bkt").agg(F.max("_rn").alias("_cnt"))
    w_off = W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "_bkt", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(id_col, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_bkt", "_rn", "_off")
    )


def running_totals(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    bucket: Column | None = None,
    out_col: str = "running_total",
    materialize: bool = True,
) -> DataFrame:
    """Exact global running total of ``value_col`` in ``order_cols``
    order — the distributed prefix sum, same two-phase shape as
    ``dense_row_ids``: per-bucket cumulative window (parallel across
    buckets) plus broadcast bucket offsets (cumulative bucket sums over
    the tiny bucket list).  Never a single-partition window over the
    fact.

    Same contracts as dense_row_ids: ``order_cols`` total order,
    ``bucket`` monotonic w.r.t. it and a pure function of the data.
    The output includes the current row (inclusive prefix sum).
    """
    if bucket is None:
        bucket = F.to_date(F.col(order_cols[0]))
    cols = [F.col(c) for c in order_cols]
    with_b = df.withColumn("_bkt", bucket)
    w_in = (
        W.partitionBy("_bkt")
        .orderBy(*cols)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = with_b.withColumn("_cum_in", F.sum(value_col).over(w_in))
    if materialize:
        local = local.transform(snapshot, eager=False)
    # bucket totals must be sum(value), NOT max(cumulative): the two
    # agree only for non-negative values (monotone prefix), and signed
    # inputs (e.g. +1/-1 interval-boundary deltas) break the max form
    totals = local.groupBy("_bkt").agg(F.sum(value_col).alias("_tot"))
    w_off = W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "_bkt", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(out_col, (F.col("_off") + F.col("_cum_in")).cast("long"))
        .drop("_bkt", "_cum_in", "_off")
    )


def running_max(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    bucket: Column | None = None,
    out_col: str = "running_max",
    materialize: bool = True,
) -> DataFrame:
    """Exact global running (inclusive prefix) MAX of ``value_col`` in
    ``order_cols`` order — the two-phase ``running_totals`` shape with
    max in place of sum: per-bucket cumulative max (parallel across
    buckets), then each row takes the greater of its in-bucket prefix
    max and the broadcast max of all PRECEDING buckets.  Never a
    single-partition window over the fact.

    Same contracts as running_totals: ``order_cols`` total order,
    ``bucket`` monotonic w.r.t. it and a pure function of the data.
    """
    if bucket is None:
        bucket = F.to_date(F.col(order_cols[0]))
    cols = [F.col(c) for c in order_cols]
    with_b = df.withColumn("_bkt", bucket)
    w_in = (
        W.partitionBy("_bkt")
        .orderBy(*cols)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = with_b.withColumn("_cum_in", F.max(value_col).over(w_in))
    if materialize:
        local = local.transform(snapshot, eager=False)
    totals = local.groupBy("_bkt").agg(F.max("_cum_in").alias("_tot"))
    w_off = W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    # _off is NULL for the first bucket; greatest() skips nulls
    offsets = totals.select(
        "_bkt", F.max("_tot").over(w_off).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(out_col, F.greatest(F.col("_cum_in"), F.col("_off")))
        .drop("_bkt", "_cum_in", "_off")
    )
