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


def test_linreg_trend_stats_matches_numpy(spark):
    import numpy as np

    from mqtt2sql_spark.fixtures import load_table
    from mqtt2sql_spark.plans.timeseries import TREND_ORIGIN, linreg_trend_stats

    out = {r.event_type: r for r in linreg_trend_stats(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events").select(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit(TREND_ORIGIN).cast("date"))
        .cast("long")
        .alias("x"),
        F.round(F.col("value") * 100, 0).cast("long").alias("y"),
    )
    for et, rows in [
        (k, [(r.x, r.y) for r in ev.filter(F.col("event_type") == k).collect()])
        for k in out
    ]:
        x = np.array([a for a, _ in rows], dtype=np.int64)
        y = np.array([b for _, b in rows], dtype=np.int64)
        r = out[et]
        assert r.n == len(rows)
        assert r.slope_den == len(rows) * int((x * x).sum()) - int(x.sum()) ** 2
        assert r.slope_num == len(rows) * int((x * y).sum()) - int(
            x.sum()
        ) * int(y.sum())
        if r.slope_den:
            np_slope = np.polyfit(x.astype(float), y.astype(float), 1)[0]
            assert abs(r.slope_num / r.slope_den - np_slope) < 1e-6


def test_rolling_median_warmup_and_frame(spark):
    from mqtt2sql_spark.plans.timeseries import rolling_median_value

    rows = rolling_median_value(spark, SF_DIR).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        for i, r in enumerate(rs):
            assert r.n_frame == min(i + 1, 7)
            frame = [q.cents for q in rs[max(0, i - 6) : i + 1]]
            frame.sort()
            k = len(frame)
            med_x2 = (
                2 * frame[k // 2]
                if k % 2
                else frame[k // 2 - 1] + frame[k // 2]
            )
            assert r.med_cents_x2 == med_x2


def test_activity_bitmask_consistent(spark):
    from mqtt2sql_spark.plans.timeseries import activity_bitmask_daily

    rows = activity_bitmask_daily(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.hour_mask < (1 << 24)
        assert bin(r.hour_mask).count("1") == r.active_hours
        assert r.active_hours <= min(r.n_events, 24)


def test_seasonal_naive_identities(spark):
    """mae7_ppm must equal the integer ratio of the exact totals it is
    derived from, and the seasonal error can never exceed total actuals
    plus total forecasts (triangle bound on |n - n_prev7|)."""
    from mqtt2sql_spark.plans.timeseries import seasonal_naive_forecast

    rows = seasonal_naive_forecast(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.days_scored > 0
        assert r.mae7_ppm == r.total_abs_err7 * 1_000_000 // r.days_scored
        assert (
            r.mase_ppm
            == r.total_abs_err7 * 1_000_000 // max(r.total_abs_err1, 1)
        )


def test_markov_predictor_beats_or_meets_majority_rate(spark):
    """Sanity: accuracy per state is a valid ppm and the predicted
    label is the train-fold argmax for that state."""
    from pyspark.sql import functions as F

    from mqtt2sql_spark.fixtures import load_table
    from mqtt2sql_spark.plans.timeseries import markov_next_event_accuracy

    rows = markov_next_event_accuracy(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.accuracy_ppm <= 1_000_000
        assert r.accuracy_ppm == r.n_correct * 1_000_000 // r.n_test_pairs
    # recompute the train argmax for one state in Python
    ev = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("user_id") % 5 < 4)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs = {}
    for e in sorted(ev, key=lambda x: (x.user_id, x.ts, x.event_id)):
        seqs.setdefault(e.user_id, []).append(e.event_type)
    probe = rows[0].event_type
    counts = {}
    for s in seqs.values():
        for a, b in zip(s, s[1:]):
            if a == probe:
                counts[b] = counts.get(b, 0) + 1
    argmax = min(
        (t for t in counts), key=lambda t: (-counts[t], t)
    )
    assert rows[0].predicted == argmax


def test_peak_load_is_daily_max(spark):
    from pyspark.sql import functions as F

    from mqtt2sql_spark.fixtures import load_table
    from mqtt2sql_spark.plans.timeseries import peak_load_5min

    out = {r.day: r for r in peak_load_5min(spark, SF_DIR).collect()}
    assert out
    b = (
        load_table(spark, SF_DIR, "events")
        .groupBy(
            F.to_date("ts").alias("day"),
            F.expr("unix_micros(ts) div 300000000").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    best = {}
    for r in b:
        cur = best.get(r.day)
        if cur is None or (r.n, -r.bucket) > (cur[0], -cur[1]):
            best[r.day] = (r.n, r.bucket)
    for day, row in out.items():
        assert (row.peak_events, row.peak_bucket) == best[day]


def test_window_funnel_level_for_probe_user(spark):
    """Recompute one user's deepest funnel level with a plain scan."""
    from pyspark.sql import functions as F

    from mqtt2sql_spark.fixtures import load_table
    from mqtt2sql_spark.plans.timeseries import (
        FUNNEL_WINDOW_US,
        window_funnel_levels,
    )

    hist = {r.level: r.n_users for r in window_funnel_levels(spark, SF_DIR).collect()}
    assert hist and sum(hist.values()) > 0
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", F.unix_micros("ts").alias("us"), "event_type")
        .collect()
    )
    by_user = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append((e.us, e.event_type))
    # recompute the full histogram
    want = {}
    for u, evs in by_user.items():
        views = [t for t, k in evs if k == "view"]
        clicks = sorted(t for t, k in evs if k == "click")
        purchases = sorted(t for t, k in evs if k == "purchase")
        if not views:
            continue
        best = 1
        for v in views:
            c = next(
                (t for t in clicks if v < t <= v + FUNNEL_WINDOW_US), None
            )
            if c is None:
                continue
            best = max(best, 2)
            pp = next(
                (t for t in purchases if c < t <= v + FUNNEL_WINDOW_US), None
            )
            if pp is not None:
                best = 3
                break
        want[best] = want.get(best, 0) + 1
    assert hist == want


def test_time_decay_credits_sum_within_purchase_totals(spark):
    """Total credited cents never exceeds total purchase value in the
    attributable population (integer-division remainders are dropped)."""
    from pyspark.sql import functions as F

    from mqtt2sql_spark.fixtures import load_table
    from mqtt2sql_spark.plans.analytics import time_decay_attribution

    rows = time_decay_attribution(spark, SF_DIR).collect()
    assert rows
    credited = sum(r.attributed_cents for r in rows)
    total = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("event_type") == "purchase")
        .select(F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("c"))
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    assert 0 < credited <= total


def test_lerp_values_lie_between_endpoints(spark):
    """Interpolated values must lie in [min(prev,next), max(prev,next)]
    and exact grid hits must equal the observation itself."""
    from pyspark.sql import functions as F

    from mqtt2sql_spark.fixtures import load_table
    from mqtt2sql_spark.plans.timeseries import lerp_hourly_by_type

    rows = lerp_hourly_by_type(spark, SF_DIR).collect()
    assert rows
    obs = {}
    for r in (
        load_table(spark, SF_DIR, "events")
        .select(
            F.col("event_type").alias("et"),
            F.unix_micros("ts").alias("us"),
            F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("c"),
            "event_id",
        )
        .collect()
    ):
        key = (r.et, r.us)
        if key not in obs or r.event_id > obs[key][1]:
            obs[key] = (r.c, r.event_id)
    for r in rows:
        assert r.prev_us <= r.grid_us <= r.next_us
        pc = obs[(r.event_type, r.prev_us)][0] * 1000
        nc = obs[(r.event_type, r.next_us)][0] * 1000
        lo, hi = min(pc, nc), max(pc, nc)
        assert lo - 1000 <= r.lerp_cents_x1000 <= hi + 1000
        if r.prev_us == r.grid_us:
            assert r.lerp_cents_x1000 == pc


def test_session_counts_decrease_with_larger_gaps(spark):
    """Monotonicity: a larger idle gap can only merge sessions, and the
    30-minute variant must agree with events_sessionize's count."""
    from mqtt2sql_spark.plans.timeseries import session_gap_sensitivity

    rows = sorted(
        session_gap_sensitivity(spark, SF_DIR).collect(),
        key=lambda r: r.gap_min,
    )
    assert [r.gap_min for r in rows] == [5, 15, 30, 60]
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r.events_per_session_x1000 >= 1000


def test_late_arrival_thresholds_are_nested(spark):
    from mqtt2sql_spark.plans.timeseries import late_arrival_depth

    rows = late_arrival_depth(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_late_1h <= r.n_late_5m <= r.n_late_1m <= r.n_late
        assert r.n_late <= r.n_events
        if r.n_late_1h:
            assert r.max_late_us > 3_600_000_000


def test_freshness_audit_consistency(spark):
    from mqtt2sql_spark.plans.timeseries import freshness_audit

    rows = freshness_audit(spark, SF_DIR).collect()
    assert rows
    assert min(r.staleness_us for r in rows) == 0  # some stream holds the max
    for r in rows:
        assert r.staleness_us >= 0
        assert r.n_last_24h >= 0 and r.n_prior_24h >= 0


def test_interval_coverage_is_high_and_consistent(spark):
    from mqtt2sql_spark.plans.timeseries import forecast_interval_coverage

    rows = forecast_interval_coverage(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_covered <= r.n_test
        assert r.coverage_ppm == r.n_covered * 1_000_000 // r.n_test
        # q90 calibration should cover well over half the test days
        assert r.coverage_ppm > 500_000


def test_trigram_novelty_histogram_covers_all_users(spark):
    from pyspark.sql import functions as F

    from mqtt2sql_spark.fixtures import load_table
    from mqtt2sql_spark.plans.timeseries import behavior_trigram_novelty

    rows = behavior_trigram_novelty(spark, SF_DIR).collect()
    assert rows
    # users with >= 3 events each contribute to exactly one decile
    n_eligible = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .count()
        .where(F.col("count") >= 3)
        .count()
    )
    assert sum(r.n_users for r in rows) == n_eligible
    for r in rows:
        assert 0 <= r.novelty_decile <= 10
        assert r.min_distinct <= r.max_distinct


def test_stickiness_bounds_and_dau_le_wau(spark):
    from mqtt2sql_spark.plans.timeseries import dau_wau_stickiness

    rows = dau_wau_stickiness(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.dau <= r.wau
        assert 0 < r.stickiness_ppm <= 1_000_000
        assert r.stickiness_ppm == r.dau * 1_000_000 // r.wau


def test_hour_concentration_partitions_users(spark):
    from pyspark.sql import functions as F

    from mqtt2sql_spark.fixtures import load_table
    from mqtt2sql_spark.plans.timeseries import user_hour_concentration

    rows = user_hour_concentration(spark, SF_DIR).collect()
    assert rows
    n_users = (
        load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        assert 0 <= r.share_decile <= 9
        assert r.min_share_ppm <= r.max_share_ppm <= 1_000_000


def test_growth_accounting_sums_to_wau(spark):
    from mqtt2sql_spark.plans.timeseries import growth_accounting_weekly

    rows = sorted(
        growth_accounting_weekly(spark, SF_DIR).collect(),
        key=lambda r: r.week,
    )
    assert rows
    for r in rows:
        assert r.n_new + r.n_retained + r.n_resurrected == r.wau
    # the first week is all-new by definition
    assert rows[0].n_new == rows[0].wau
    # retained in week i+1 <= wau of week i
    for a, b in zip(rows, rows[1:]):
        if (b.week - a.week).days == 7:
            assert b.n_retained <= a.wau
            # churners after week a = wau_a - retained_b (when contiguous)
            assert a.n_churning_after == a.wau - b.n_retained


def test_transition_drift_is_nonnegative_and_cellwise(spark):
    from mqtt2sql_spark.plans.timeseries import transition_drift_chi2

    rows = transition_drift_chi2(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.chi2_ppm >= 0
        assert r.n_cells >= 2  # at least one nxt state in both halves


def test_cusum_peak_matches_python_scan(spark):
    from pyspark.sql import functions as F

    from mqtt2sql_spark.fixtures import load_table
    from mqtt2sql_spark.plans.timeseries import cusum_changepoint

    out = {r.event_type: r for r in cusum_changepoint(spark, SF_DIR).collect()}
    assert out
    probe = sorted(out)[0]
    ev = sorted(
        load_table(spark, SF_DIR, "events")
        .where(F.col("event_type") == probe)
        .select("ts", "event_id", F.expr(
            "CAST(round(value * 100, 0) AS BIGINT)").alias("c"))
        .collect(),
        key=lambda r: (r.ts, r.event_id),
    )
    s = sum(r.c for r in ev)
    n = len(ev)
    run, best, best_ts = 0, -1, None
    for r in ev:
        run += n * r.c - s
        if abs(run) > best:
            best, best_ts = abs(run), r.ts
    assert out[probe].peak_ts == best_ts
    assert out[probe].peak_cusum_cents == best // n


def test_daily_kpi_identities(spark):
    from mqtt2sql_spark.plans.timeseries import daily_kpi_snapshot

    rows = daily_kpi_snapshot(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_buyers <= min(r.n_users, r.n_purchases)
        assert (
            r.buyer_conversion_ppm
            == r.n_buyers * 1_000_000 // r.n_users
        )
        assert 0 <= r.error_rate_ppm <= 1_000_000
        assert (r.revenue_cents > 0) == (r.n_purchases > 0)


def test_session_depth_octaves_cover_all_sessions(spark):
    from pyspark.sql import functions as F

    from mqtt2sql_spark.fixtures import load_table
    from mqtt2sql_spark.plans.timeseries import session_depth_conversion

    rows = session_depth_conversion(spark, SF_DIR).collect()
    assert rows
    # session count must match an independent sessionization count:
    # sessions = users + gaps > 30min
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", F.unix_micros("ts").alias("us"), "event_id")
        .collect()
    )
    by_user = {}
    for e in sorted(ev, key=lambda x: (x.user_id, x.us, x.event_id)):
        by_user.setdefault(e.user_id, []).append(e.us)
    n_sessions = sum(
        1 + sum(1 for a, b in zip(us, us[1:]) if b - a > 1_800_000_000)
        for us in by_user.values()
    )
    assert sum(r.n_sessions for r in rows) == n_sessions
    for r in rows:
        assert r.conversion_ppm == r.n_converted * 1_000_000 // r.n_sessions
