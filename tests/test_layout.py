"""Range-clustered layout sink: row-group statistics actually skip.

Writes the same rows twice — shuffled layout vs range-clustered — and
asserts from the parquet footers that a selective range predicate can
prune most row groups only under the clustered layout, and that the
data itself is unchanged (layout is physical, results declarative).
"""

from pyspark.sql import functions as F

from mqtt2sql_spark.fixtures import load_table
from mqtt2sql_spark.sinks.layout import (
    row_group_ranges,
    skipped_fraction,
    write_range_clustered,
)
from tests.conftest import SF_DIR


def test_range_clustering_enables_row_group_skipping(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    lo, hi = 100, 199  # ~1% of the event_id domain at sf0.001

    messy = str(tmp_path / "messy")
    # shuffle on user_id → event_id is scattered across every file
    ev.repartition(8, "user_id").write.mode("overwrite").parquet(messy)
    clustered = str(tmp_path / "clustered")
    write_range_clustered(ev, clustered, "event_id", n_files=8)

    messy_skip = skipped_fraction(row_group_ranges(messy, "event_id"), lo, hi)
    clus_skip = skipped_fraction(
        row_group_ranges(clustered, "event_id"), lo, hi
    )
    assert messy_skip == 0.0  # every row group spans the whole domain
    assert clus_skip >= 0.75  # at most 2 of 8+ ranges intersect [lo, hi]

    # results are layout-independent
    got = (
        spark.read.parquet(clustered)
        .filter(F.col("event_id").between(lo, hi))
        .count()
    )
    want = ev.filter(F.col("event_id").between(lo, hi)).count()
    assert got == want

    # and the predicate actually reaches the scan (footer pruning is
    # only consulted for pushed filters)
    df = spark.read.parquet(clustered).filter(
        F.col("event_id").between(lo, hi)
    )
    jvm = spark.sparkContext._jvm
    plan = jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "GreaterThanOrEqual(event_id,100)" in plan
