"""Bucketed-table sink: pre-shuffled storage for co-located joins.

The reference persists into indexed SQL tables (mysql.sql:30-51) and
relies on the database engine for join locality; the Spark-native
equivalent is *bucketing*: write each table hash-clustered on the join
key into a fixed number of buckets, and every later equi-join or
aggregation on that key runs with **zero shuffle** — Spark proves both
sides share the partitioning from catalog metadata and plans a
SortMergeJoin directly over the bucket files.

At 100 TB this is the difference between re-shuffling the fact table on
every query and shuffling it exactly once at ingest:

  * bucket count is fixed at write time — choose ~(total size /
    target partition size); both join sides must use the SAME count
    (a mismatch falls back to shuffling the smaller side);
  * ``sortBy`` within buckets lets the join skip its sort stage too;
  * bucket pruning applies to equality predicates on the bucket key.

Local caveat encoded in the helper: bucketed tables must go through
``saveAsTable`` (bucket metadata lives in the catalog, not in parquet
footers), with an explicit ``path`` so data lands where the caller
chose rather than in the default warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, cols[0], *cols[1:])
    )
    if sort:
        writer = writer.sortBy(cols[0], *cols[1:])
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog — reading the parquet path directly would silently drop the
    co-location guarantee)."""
    return spark.table(table)
