"""Observation-based funnel metrics: same numbers as dedicated count
jobs, from a single pass."""

from pyspark.sql import functions as F

from mqtt2sql_spark.fixtures import load_table
from mqtt2sql_spark.operators.metrics import observe_funnel
from tests.conftest import SF_DIR


def test_observe_funnel_matches_dedicated_counts(spark):
    docs = load_table(spark, SF_DIR, "documents")
    short = F.length("text") < 200
    en = F.col("lang") == "en"
    instrumented, obs = observe_funnel(docs, "corpus", short=short, en=en)

    # one action drives both the result and the metrics
    total = instrumented.count()
    got = obs.get
    assert got["n_rows"] == total
    assert got["n_short"] == docs.filter(short).count()
    assert got["n_en"] == docs.filter(en).count()


def test_observe_survives_downstream_transformations(spark):
    ev = load_table(spark, SF_DIR, "events")
    instrumented, obs = observe_funnel(
        ev, "events_in", errors=F.col("event_type") == "error"
    )
    # metrics reflect the observe point, not the post-filter output
    out = instrumented.filter(F.col("event_type") != "error").count()
    got = obs.get
    assert got["n_rows"] == ev.count()
    assert got["n_errors"] == got["n_rows"] - out
