"""Property-based invariants (SURVEY.md §5 item 4) via hypothesis.

Random message sequences per topic ⇒
  (a) latest-per-key holds exactly the max-(ts,event_id) message per topic;
  (b) diff-only history equals the run-length encoding of each topic's
      value sequence;
  (c) history view row count == history row count (FK integrity).
"""

import datetime as dt
from itertools import groupby

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mqtt2sql_spark.operators.history import history_rows
from mqtt2sql_spark.operators.upsert import latest_per_key

_BASE = dt.datetime(2024, 1, 1)

messages_strategy = st.lists(
    st.tuples(
        st.sampled_from(["t0", "t1", "t2"]),         # topic
        st.integers(min_value=0, max_value=500),     # minutes offset
        st.sampled_from(["A", "B", "C"]),            # value
    ),
    min_size=1,
    max_size=40,
)


def _df(spark, seq):
    rows = [
        (t, _BASE + dt.timedelta(minutes=m), v, i)
        for i, (t, m, v) in enumerate(seq)
    ]
    return spark.createDataFrame(
        rows, "topic string, ts timestamp, value_str string, event_id long"
    )


def _ctl(spark, topics, diffonly=1):
    return spark.createDataFrame(
        [(t, i + 1, 1, diffonly) for i, t in enumerate(sorted(topics))],
        "topic string, id long, history_enable int, history_diffonly int",
    )


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seq=messages_strategy)
def test_latest_is_max_ts_event_id(spark, seq):
    df = _df(spark, seq)
    got = {
        r.topic: (r.ts, r.event_id)
        for r in latest_per_key(df, "topic", ("ts", "event_id")).collect()
    }
    expected = {}
    for i, (t, m, _v) in enumerate(seq):
        key = (_BASE + dt.timedelta(minutes=m), i)
        if t not in expected or key > expected[t]:
            expected[t] = key
    assert got == expected


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seq=messages_strategy)
def test_diffonly_equals_run_length_encoding(spark, seq):
    df = _df(spark, seq)
    topics = {t for t, _, _ in seq}
    kept = history_rows(df, _ctl(spark, topics)).collect()
    got = sorted((r.topic, r.event_id) for r in kept)

    expected = []
    ordered = sorted(
        ((t, _BASE + dt.timedelta(minutes=m), v, i)
         for i, (t, m, v) in enumerate(seq)),
        key=lambda r: (r[0], r[1], r[3]),
    )
    for topic, grp in groupby(ordered, key=lambda r: r[0]):
        for value, run in groupby(grp, key=lambda r: r[2]):
            first = next(run)
            expected.append((topic, first[3]))
    assert got == sorted(expected)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seq=messages_strategy)
def test_view_rowcount_equals_history_rowcount(spark, seq):
    from pyspark.sql import functions as F

    df = _df(spark, seq)
    topics = {t for t, _, _ in seq}
    ctl = _ctl(spark, topics)
    hist = history_rows(df, ctl)
    dim = ctl.select("id", "topic")
    view = hist.join(F.broadcast(dim), hist["topicid"] == dim["id"], "inner")
    assert view.count() == hist.count()


# --- chunking / redaction properties ---------------------------------------

from mqtt2sql_spark.plans.text import (  # noqa: E402
    CHUNK_CHARS,
    CHUNK_STRIDE,
    EMAIL_RE,
    PHONE_RE,
)

texts_strategy = st.lists(
    st.text(
        alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
        min_size=1,
        max_size=300,
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=texts_strategy)
def test_chunks_reconstruct_document(spark, texts, tmp_path_factory):
    """Concatenating each chunk's first CHUNK_STRIDE chars (plus the last
    chunk's tail) must reproduce the document exactly — no byte lost or
    duplicated by the overlap arithmetic."""
    import pyspark.sql.functions as F
    from pyspark.sql import Row

    sf_dir = str(tmp_path_factory.mktemp("chunks"))
    spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
         for i, t in enumerate(texts)]
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    from mqtt2sql_spark.plans.text import text_chunk_overlap

    rows = text_chunk_overlap(spark, sf_dir).collect()
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_id)):
        prev = by_doc.get(r.doc_id, "")
        # chunks overlap by CHUNK_CHARS - CHUNK_STRIDE: strip the overlap
        by_doc[r.doc_id] = prev + (
            r.chunk_text if not prev else r.chunk_text[CHUNK_CHARS - CHUNK_STRIDE:]
        )
    for i, t in enumerate(texts):
        assert by_doc[i] == t, f"doc {i} reconstruction mismatch"


def test_redaction_is_idempotent_and_complete(spark):
    """After one redaction pass no email/phone pattern remains, so a
    second pass is a no-op."""
    import pyspark.sql.functions as F

    from mqtt2sql_spark.plans.text import pii_redact
    from tests.conftest import SF_DIR

    red = pii_redact(spark, SF_DIR)
    leftover = red.filter(
        (F.regexp_count("redacted", F.lit(EMAIL_RE)) > 0)
        | (F.regexp_count("redacted", F.lit(PHONE_RE)) > 0)
    ).count()
    assert leftover == 0
    assert red.filter((F.col("n_emails") < 1) | (F.col("n_phones") < 1)).count() == 0
