"""Sketch aggregates: HLL estimate quality and determinism."""

from tests.conftest import SF_DIR


def test_hll_estimate_within_error_bound(spark):
    from mqtt2sql_spark.plans.sketches import M, hll_distinct_users

    rows = hll_distinct_users(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.registers_hit <= M
        # raw HLL at m=64: sigma ~13%; allow 25%
        rel_err = abs(r.est_hll - r.n_exact) / r.n_exact
        assert rel_err < 0.25, (r.event_type, r.est_hll, r.n_exact)


def test_hll_deterministic(spark):
    from mqtt2sql_spark.plans.sketches import hll_distinct_users

    a = sorted(map(tuple, hll_distinct_users(spark, SF_DIR).collect()))
    b = sorted(map(tuple, hll_distinct_users(spark, SF_DIR).collect()))
    assert a == b


def test_daily_merged_hll_equals_direct(spark):
    """Register max is associative: per-day sketches merged across days
    must estimate bit-identically to the single-pass sketch."""
    from mqtt2sql_spark.plans.sketches import hll_daily_merge, hll_distinct_users
    from tests.conftest import SF_DIR

    direct = {r.event_type: r.est_hll for r in hll_distinct_users(spark, SF_DIR).collect()}
    merged = {r.event_type: r.est_merged for r in hll_daily_merge(spark, SF_DIR).collect()}
    assert merged == direct


# --- heavy hitters ---------------------------------------------------------


def test_heavy_hitters_matches_exact_under_any_partitioning(spark):
    """The verified output must equal the plain groupBy answer no matter
    how rows are placed (the candidate set may vary; the answer may not).
    Skewed data: key 'hot' dominates, several mid keys straddle T."""
    from mqtt2sql_spark.operators.heavyhitters import heavy_hitters

    rows = (
        [("hot",)] * 100
        + [("warm%d" % i,) for i in range(5) for _ in range(10)]
        + [("cold%d" % i,) for i in range(200)]
    )
    for n_parts in (1, 3, 16):
        df = spark.createDataFrame(rows, "topic string").repartition(n_parts)
        got = {
            (r["topic"], r["n"])
            for r in heavy_hitters(df, "topic", 10).collect()
        }
        exact = {
            (r["topic"], r["n"])
            for r in df.groupBy("topic")
            .count()
            .withColumnRenamed("count", "n")
            .filter("n >= 10")
            .collect()
        }
        assert got == exact, f"mismatch at {n_parts} partitions"
    assert ("hot", 100) in got and len(got) == 6


def test_heavy_hitters_no_qualifying_keys(spark):
    from mqtt2sql_spark.operators.heavyhitters import heavy_hitters

    df = spark.createDataFrame([("a",), ("b",)], "topic string")
    assert heavy_hitters(df, "topic", 5).count() == 0


def test_heavy_hitters_shuffle_is_candidate_pruned(spark):
    """Plan contract: the exact recount aggregates AFTER a broadcast
    semi join (only candidate rows reach the exchange) — no full-table
    shuffle on the raw key."""
    from mqtt2sql_spark.operators.heavyhitters import heavy_hitters

    df = spark.createDataFrame(
        [("k%d" % (i % 7),) for i in range(100)], "topic string"
    ).repartition(4)
    plan = heavy_hitters(df, "topic", 10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
