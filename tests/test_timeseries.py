"""Time-series operators: LOCF gap fill semantics, bucketed range join
equivalence against the naive inequality formulation."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_gap_fill_locf_semantics(spark):
    from mqtt2sql_spark.plans.timeseries import gap_fill_locf

    out = gap_fill_locf(spark, SF_DIR)
    rows = out.collect()
    assert rows
    # value_locf is never null: each topic's grid starts at its first
    # observed day
    assert all(r.value_locf is not None for r in rows)
    by_topic = {}
    for r in rows:
        by_topic.setdefault(r.topic, []).append(r)
    for topic, rs in by_topic.items():
        rs.sort(key=lambda r: r.h)
        # grid is dense daily: consecutive steps are exactly 1 day
        for a, b in zip(rs, rs[1:]):
            assert (b.h - a.h).total_seconds() == 86400.0
        # first and last grid points are observed (span is min..max)
        assert rs[0].observed and rs[-1].observed
        # carried-forward rows repeat the previous value
        for a, b in zip(rs, rs[1:]):
            if not b.observed:
                assert b.value_locf == a.value_locf


def test_range_join_bucketed_matches_naive(spark):
    from mqtt2sql_spark.fixtures import load_table
    from mqtt2sql_spark.plans.timeseries import BAND_US, range_join_bucketed

    got = {
        (r.user_id, r.src_event, r.dst_event, r.gap_us)
        for r in range_join_bucketed(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    x = ev.select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("a"),
        F.col("us").alias("aus"),
    )
    y = ev.select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("b"),
        F.col("us").alias("bus"),
    )
    gap = F.col("bus") - F.col("aus")
    naive = {
        (r.u, r.a, r.b, r.gap_us)
        for r in x.join(y, "u")
        .filter(
            ((gap > 0) | ((gap == 0) & (F.col("b") > F.col("a"))))
            & (gap <= BAND_US)
        )
        .select("u", "a", "b", gap.alias("gap_us"))
        .collect()
    }
    assert got == naive
    assert got, "no pairs found in band"
