"""Corpus-assembly operators: mixture resampling, training order, packing."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    jvm = df.sparkSession.sparkContext._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def test_resample_keep_rate_tracks_weight(spark):
    """Per-source keep rate must approximate the target weight (hash is
    uniform), and be exactly reproducible run-to-run."""
    from mqtt2sql_spark.plans.mixing import MIX_WEIGHTS_PCT, importance_resample_mix

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total = {
        r.source: r.n for r in docs.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    kept = {
        r.source: r.n for r in importance_resample_mix(spark, SF_DIR)
        .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for s, w in MIX_WEIGHTS_PCT.items():
        if total.get(s, 0) == 0:
            continue
        rate = kept.get(s, 0) / total[s]
        # sf0.001 strata are tiny (~5 docs); just bound loosely
        assert rate <= 1.0 and abs(rate - w / 100) < 0.5, (s, rate, w)
    # unlisted sources keep everything
    for s in total:
        if s not in MIX_WEIGHTS_PCT:
            assert kept.get(s, 0) == total[s], s


def test_resample_is_shuffle_free(spark):
    from mqtt2sql_spark.plans.mixing import importance_resample_mix

    plan = _plan(importance_resample_mix(spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_training_order_is_dense_deterministic_permutation(spark):
    from mqtt2sql_spark.plans.mixing import N_SHARDS, training_order_assignment

    out = training_order_assignment(spark, SF_DIR)
    rows = out.collect()
    n = len(rows)
    positions = sorted(r.position for r in rows)
    assert positions == list(range(1, n + 1))  # dense 1..N, no gaps/dupes
    for r in rows:
        assert r.shard == (r.position - 1) % N_SHARDS
    # order follows the hash, not doc_id: the permutation must differ
    # from the identity (overwhelmingly likely for n >= 10)
    by_pos = [r.doc_id for r in sorted(rows, key=lambda r: r.position)]
    assert by_pos != sorted(by_pos)
    # deterministic across plan re-executions
    again = [r.doc_id for r in sorted(
        training_order_assignment(spark, SF_DIR).collect(),
        key=lambda r: r.position)]
    assert by_pos == again


def test_pack_offsets_are_contiguous_per_source(spark):
    """start_off must equal the sum of previous docs' n_tok within the
    source (concatenation semantics) and sequence spans must be
    consistent with the offsets."""
    from mqtt2sql_spark.plans.mixing import PACK_MAX_LEN, pack_sequences_greedy

    rows = pack_sequences_greedy(spark, SF_DIR).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for s, rs in by_source.items():
        rs.sort(key=lambda r: r.doc_id)
        acc = 0
        for r in rs:
            assert r.start_off == acc, (s, r.doc_id)
            acc += r.n_tok
            assert r.seq_first == r.start_off // PACK_MAX_LEN
            end = max(r.start_off + r.n_tok - 1, r.start_off)
            assert r.seq_last == end // PACK_MAX_LEN
            assert r.crosses_boundary == int(r.seq_first != r.seq_last)


def test_pack_window_partitions_by_source(spark):
    """The running sum must partition by source — a global (unpartitioned)
    window would serialize the corpus through one task."""
    from mqtt2sql_spark.plans.mixing import pack_sequences_greedy

    plan = _plan(pack_sequences_greedy(spark, SF_DIR))
    assert "partitionBy" not in plan  # simple mode spells it differently
    assert "Window" in plan
    assert "hashpartitioning(source" in plan


def test_funnel_is_monotone_and_single_digest_shuffle(spark):
    from mqtt2sql_spark.plans.mixing import corpus_pipeline_funnel

    df = corpus_pipeline_funnel(spark, SF_DIR)
    rows = sorted(df.collect(), key=lambda r: r.stage_idx)
    names = [r.stage for r in rows]
    assert names == ["ingested", "min_length", "quality", "exact_dedup",
                     "decontam", "mixture"]
    counts = [r.n_docs for r in rows]
    assert counts == sorted(counts, reverse=True)  # cumulative stages shrink
    assert counts[0] > 0
    plan = _plan(df)
    # the digest aggregate+join is the only wide shuffle of corpus data
    assert "hashpartitioning(digest" in plan


def test_pit_features_never_leak(spark):
    """Every label row's feature_day is strictly before the label day,
    and the features equal a brute-force window recount for a probe."""
    from pyspark.sql import functions as F

    from mqtt2sql_spark.fixtures import load_table
    from mqtt2sql_spark.plans.mixing import pit_training_features
    from tests.conftest import SF_DIR

    rows = pit_training_features(spark, SF_DIR).collect()
    assert rows
    assert all(r.leak_free == 1 for r in rows)
    probe = next(r for r in rows if r.feature_day is not None)
    ev = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("user_id") == probe.user_id)
        .select(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1990-01-01").cast("date")
            ).alias("d"),
            "event_type",
        )
        .collect()
    )
    fd = probe.feature_day
    clicks = sum(
        1 for e in ev if e.event_type == "click" and fd - 6 <= e.d <= fd
    )
    views = sum(
        1 for e in ev if e.event_type == "view" and fd - 6 <= e.d <= fd
    )
    assert (clicks, views) == (probe.clicks7, probe.views7)
    # the chosen feature day is the latest activity day <= label_day - 1
    latest = max((e.d for e in ev if e.d <= probe.label_day - 1), default=None)
    assert fd == latest


def test_temperature_weights_flatten_the_distribution(spark):
    from mqtt2sql_spark.plans.mixing import temperature_sampling_weights
    from tests.conftest import SF_DIR

    rows = temperature_sampling_weights(spark, SF_DIR).collect()
    assert rows
    assert sum(r.sampled_share_ppm for r in rows) <= 1_000_000
    for r in rows:
        # alpha<1 moves every share toward uniform: below-average
        # sources upsample (>=1e6), above-average ones downsample
        uniform = 1_000_000 // len(rows)
        if r.natural_share_ppm < uniform:
            assert r.upsample_x1e6 >= 1_000_000
        elif r.natural_share_ppm > uniform + 1:
            assert r.upsample_x1e6 <= 1_000_000
