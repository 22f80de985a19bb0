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
