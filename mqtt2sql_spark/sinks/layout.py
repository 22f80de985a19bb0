"""Range-clustered parquet layout — write-side data skipping.

Parquet readers (Spark's vectorized scan, DuckDB, Trino, …) prune row
groups whose column min/max statistics cannot satisfy a pushed-down
predicate.  That pruning is only effective if the writer CLUSTERED the
data: a randomly-laid-out table has every row group spanning the whole
value domain, so nothing prunes and a selective query still scans 100 TB.

``write_range_clustered`` is the batch layout job a pipeline runs on its
hot filter columns (the Spark-native equivalent of a clustered index /
ZORDER on one axis):

  * ``repartitionByRange(n, cols)`` range-shuffles so each output FILE
    owns a disjoint slice of the key domain (global clustering — file
    skipping via footer stats);
  * ``sortWithinPartitions(cols)`` orders rows inside each file so ROW
    GROUPS within a file are also tight (row-group skipping);
  * a selective predicate then touches ~(selectivity × files) instead of
    all of them; at 1000 executors that is the difference between a
    full-table scan and reading a handful of splits.

The sampling in ``repartitionByRange`` affects only file boundaries,
never query results — layout is physical, results are declarative.

Reference context: the reference's SQL tables get this from B-tree
indexes (mysql.sql:30-51); object-store parquet has no index, so write
layout IS the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

import pyarrow.parquet as pq


def write_range_clustered(
    df: DataFrame, path: str, cols: list[str] | str, n_files: int
) -> None:
    """Write ``df`` to parquet range-clustered on ``cols``.

    ``n_files`` sizes the range shuffle: choose ~(table bytes / target
    file size); each output file then holds one contiguous key range.
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def row_group_ranges(path: str, col: str) -> list[tuple[object, object]]:
    """(min, max) statistics of ``col`` for every row group under
    ``path`` — the exact metadata a reader consults before touching row
    data.  Used by tests to prove the clustering actually skips."""
    out: list[tuple[object, object]] = []
    ds = pq.ParquetDataset(path)
    for frag in ds.fragments:
        md = frag.metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            out.append((stats.min, stats.max))
    return out


def skipped_fraction(
    ranges: list[tuple[object, object]], lo: object, hi: object
) -> float:
    """Fraction of row groups a [lo, hi] predicate can prune from the
    given (min, max) stats — the data-skipping payoff metric."""
    if not ranges:
        return 0.0
    hit = sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))
    return 1.0 - hit / len(ranges)
