"""Vocabulary statistics: frequency spectrum and Good-Turing coverage."""

from tests.conftest import SF_DIR


def test_spectrum_octaves_partition_the_vocab(spark):
    """Every (lang, octave) bucket holds types whose frequency lies in
    [2^octave, 2^(octave+1)), and spectrum totals must equal the
    Good-Turing per-lang totals computed independently."""
    from mqtt2sql_spark.plans.text import (
        good_turing_coverage,
        token_freq_spectrum,
    )

    spec = token_freq_spectrum(spark, SF_DIR).collect()
    cov = {r.lang: r for r in good_turing_coverage(spark, SF_DIR).collect()}
    assert spec and cov
    types_by_lang, tokens_by_lang = {}, {}
    for r in spec:
        assert r.octave >= 0
        # bucket bounds: n_tokens of the bucket is between n_types*2^o
        # and n_types*(2^(o+1)-1)
        lo, hi = 1 << r.octave, (1 << (r.octave + 1)) - 1
        assert r.n_types * lo <= r.n_tokens <= r.n_types * hi
        types_by_lang[r.lang] = types_by_lang.get(r.lang, 0) + r.n_types
        tokens_by_lang[r.lang] = tokens_by_lang.get(r.lang, 0) + r.n_tokens
    for lang, c in cov.items():
        assert types_by_lang[lang] == c.n_types
        assert tokens_by_lang[lang] == c.n_tokens
        assert c.n_singletons <= c.n_types
        assert c.unseen_mass_ppm == c.n_singletons * 1_000_000 // c.n_tokens


def test_twap_equals_python_locf_integral(spark):
    """TWAP for one (type, day) recomputed with a plain Python LOCF
    integral over the raw rows."""
    from pyspark.sql import functions as F

    from mqtt2sql_spark.fixtures import load_table
    from mqtt2sql_spark.plans.timeseries import twap_daily_by_type

    out = twap_daily_by_type(spark, SF_DIR)
    probe = out.orderBy("event_type", "day").first()
    ev = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("event_type") == probe.event_type)
        .select("ts", "event_id", "value")
        .orderBy("ts", "event_id")
        .collect()
    )
    num = den = n_obs = 0
    for cur, nxt in zip(ev, ev[1:]):
        if cur.ts.date() != probe.day:
            continue
        dur = int((nxt.ts - cur.ts).total_seconds() * 1_000_000)
        cents = round(cur.value * 100)
        num += cents * dur
        den += dur
        n_obs += 1
    assert n_obs == probe.n_obs
    assert den == probe.dur_us_total
    assert probe.twap_cents == num // den


def test_token_dropout_is_reproducible_and_bounded(spark):
    from mqtt2sql_spark.plans.text import _DROP_MOD, token_dropout_augment

    a = sorted(map(tuple, token_dropout_augment(spark, SF_DIR).collect()))
    b = sorted(map(tuple, token_dropout_augment(spark, SF_DIR).collect()))
    assert a == b  # hash-seeded: identical across runs
    total = kept = 0
    for _, n_tokens, n_kept, _h in a:
        assert 0 <= n_kept <= n_tokens
        total += n_tokens
        kept += n_kept
    drop_rate = 1 - kept / total
    assert abs(drop_rate - 1 / _DROP_MOD) < 0.02


def test_bpe_pairs_recount_against_python(spark):
    from pyspark.sql import functions as F

    from mqtt2sql_spark.fixtures import load_table
    from mqtt2sql_spark.plans.text import bpe_first_merges

    rows = bpe_first_merges(spark, SF_DIR).collect()
    assert len(rows) == 20
    import re

    texts = [
        r.text
        for r in load_table(spark, SF_DIR, "documents").select("text").collect()
    ]
    counts = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            for i in range(len(w) - 1):
                counts[w[i : i + 2]] = counts.get(w[i : i + 2], 0) + 1
    for r in rows[:5]:
        assert counts.get(r.pair) == r.n_weighted, r.pair


def test_oov_rate_consistency(spark):
    from mqtt2sql_spark.plans.text import oov_rate_fixed_vocab

    rows = oov_rate_fixed_vocab(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert r.oov_ppm == r.n_oov * 1_000_000 // r.n_tokens
        assert r.n_oov_types <= r.n_oov or r.n_oov == 0


def test_kwic_contains_phrase_and_context_bounds(spark):
    from mqtt2sql_spark.plans.text import PHRASE, phrase_kwic_context

    rows = phrase_kwic_context(spark, SF_DIR).collect()
    assert rows
    phrase = " ".join(PHRASE)
    for r in rows:
        assert phrase in r.kwic
        assert len(r.kwic.split()) <= 6  # ±2 context + 2 phrase tokens


def test_chunk_sweep_waste_decreases_with_smaller_chunks(spark):
    from mqtt2sql_spark.plans.text import chunk_size_sweep

    rows = sorted(
        chunk_size_sweep(spark, SF_DIR).collect(),
        key=lambda r: r.chunk_size,
    )
    assert [r.chunk_size for r in rows] == [128, 256, 512]
    # identical doc population at every sweep point
    assert len({(r.n_docs, r.total_tokens) for r in rows}) == 1
    wastes = [r.padding_waste_ppm for r in rows]
    assert wastes == sorted(wastes)  # smaller chunks waste less padding
    for r in rows:
        assert r.n_chunks * r.chunk_size >= r.total_tokens
