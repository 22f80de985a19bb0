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
