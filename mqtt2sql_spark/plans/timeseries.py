"""Time-series operators over the mqtt-shaped `messages` stream — the
hypertable-style surface the reference's history table implies but never
queries: regular-grid downsampling with gap fill, and banded range
self-joins.

The reference stores an irregular append log keyed by topic
(/root/reference/mysql.sql:55-64) and its README's example queries slice
it by topic + time range (/root/reference/README.md:228-235); these
operators are the natural analytical extension of that log (continuous
aggregate / LOCF gap fill, TimescaleDB-style) expressed Spark-first.

Scale design:
  * the observation grid is built per topic from that topic's own
    [min, max] span via `sequence` + explode — no driver-side loop, no
    global calendar table, and the explode fan-out is bounded by
    span/bucket, not by row count;
  * LOCF is one `last(ignorenulls)` running window per topic — a single
    shuffle by topic, which at 100 TB is the history table's natural
    partitioning key anyway;
  * the range self-join shuffles on (user, time-bucket) — an equi-join
    on a bounded-fanout composite key (each left row probes exactly two
    buckets) instead of the O(n²)-per-user inequality join a naive
    formulation (and the DuckDB oracle, via IEJoin) performs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mqtt2sql_spark.fixtures import load_table, messages
from mqtt2sql_spark.plans.base import register

BAND_US = 6 * 3600 * 1_000_000  # range-join band: 6 hours, in microseconds


# --- daily downsample + LOCF gap fill --------------------------------------


@register(
    "gap_fill_locf",
    bench=True,
    oracle="""
    , obs AS (
        SELECT topic, h, close FROM (
            SELECT topic, date_trunc('day', ts) AS h, value_str AS close,
                   row_number() OVER (
                       PARTITION BY topic, date_trunc('day', ts)
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM messages
        ) WHERE rn = 1
    ),
    grid AS (
        SELECT topic, unnest(generate_series(min(h), max(h),
                                             INTERVAL 1 DAY)) AS h
        FROM obs GROUP BY topic
    )
    SELECT g.topic, g.h,
           last_value(o.close IGNORE NULLS) OVER (
               PARTITION BY g.topic ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_locf,
           o.close IS NOT NULL AS observed
    FROM grid g LEFT JOIN obs o ON o.topic = g.topic AND o.h = g.h
    """,
    doc="Hypertable-style downsample + gap fill: per (topic, day) keep "
    "the last observation (total order ts, event_id), build each "
    "topic's dense daily grid with sequence+explode, and forward-fill "
    "missing days with last(ignorenulls) — last-observation-carried-"
    "forward.  One shuffle by topic end to end; the grid never "
    "materializes a global calendar.",
)
def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    msg = messages(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts"))
    w_last = W.partitionBy("topic", "h").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    obs = (
        msg.select(
            "topic",
            day.alias("h"),
            "ts",
            "event_id",
            F.col("value").cast("string").alias("value_str"),
        )
        .withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select("topic", "h", F.col("value_str").alias("close"))
    )
    grid = (
        obs.groupBy("topic")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "topic",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 day"))
            ).alias("h"),
        )
    )
    w_fill = W.partitionBy("topic").orderBy("h").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return grid.join(obs, ["topic", "h"], "left").select(
        "topic",
        "h",
        F.last("close", ignorenulls=True).over(w_fill).alias("value_locf"),
        F.col("close").isNotNull().alias("observed"),
    )


# --- banded range self-join via time buckets --------------------------------


@register(
    "range_join_bucketed",
    oracle=f"""
    SELECT x.user_id, x.event_id AS src_event, y.event_id AS dst_event,
           epoch_us(y.ts) - epoch_us(x.ts) AS gap_us
    FROM events x JOIN events y ON x.user_id = y.user_id
    WHERE (epoch_us(y.ts) - epoch_us(x.ts) > 0
           OR (epoch_us(y.ts) = epoch_us(x.ts)
               AND y.event_id > x.event_id))
      AND epoch_us(y.ts) - epoch_us(x.ts) <= {BAND_US}
    """,
    doc="Banded range self-join (event pairs per user within 6 h, "
    "ordered by the total order ts,event_id): the scale path buckets "
    "time into band-width cells and equi-joins on (user_id, bucket) "
    "with each left row probing its own and the next bucket — shuffle "
    "fan-out is 2× rows, and per-key compare cost is bounded by bucket "
    "occupancy instead of the per-user O(n²) a raw inequality join "
    "(which the DuckDB oracle runs, via IEJoin) pays.",
)
def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    bkt = (F.col("us") / F.lit(BAND_US)).cast("long")  # us ≥ 0 ⇒ floor
    y = ev.select(
        F.col("user_id").alias("y_user"),
        F.col("event_id").alias("dst_event"),
        F.col("us").alias("y_us"),
        bkt.alias("y_bkt"),
    )
    x = ev.select(
        "user_id",
        F.col("event_id").alias("src_event"),
        F.col("us").alias("x_us"),
        F.explode(F.array(bkt, bkt + 1)).alias("probe_bkt"),
    )
    gap = F.col("y_us") - F.col("x_us")
    return (
        x.join(
            y,
            (F.col("user_id") == F.col("y_user"))
            & (F.col("probe_bkt") == F.col("y_bkt")),
        )
        .filter(
            (
                (gap > 0)
                | ((gap == 0) & (F.col("dst_event") > F.col("src_event")))
            )
            & (gap <= BAND_US)
        )
        .select(
            "user_id", "src_event", "dst_event", gap.alias("gap_us")
        )
    )


# --- OHLC-style hourly downsampling ----------------------------------------


@register(
    "events_ohlc_hourly",
    oracle="""
    , o AS (
        SELECT event_type,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
               value,
               row_number() OVER (PARTITION BY event_type,
                                               date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type,
                                               date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT event_type, hour,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           count(*) AS n_events
    FROM o GROUP BY event_type, hour
    """,
    doc="OHLC downsampling (the metrics-rollup a time-series store runs "
    "continuously): per (series, hour) the first, max, min and last "
    "value plus the sample count.  Open/close come from total-order "
    "ranking windows — (ts, event_id) ties broken deterministically — "
    "and high/low/count are plain aggregates; the windows and the "
    "rollup share one (event_type, hour) shuffle.  No float arithmetic "
    "at all: every output is a SELECTED input value, so cross-engine "
    "parity is exact by construction.",
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", "ts")
    wa = W.partitionBy("event_type", hour).orderBy("ts", "event_id")
    wd = W.partitionBy("event_type", hour).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    o = ev.select(
        "event_type",
        hour.alias("hour"),
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return o.groupBy("event_type", "hour").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- min-max downsampling ---------------------------------------------------


@register(
    "events_minmax_downsample",
    oracle="""
    , ranked AS (
        SELECT event_type, event_id, ts, value,
               epoch_us(ts) // 21600000000 AS bkt,
               row_number() OVER (
                   PARTITION BY event_type, epoch_us(ts) // 21600000000
                   ORDER BY value, event_id) AS rn_min,
               row_number() OVER (
                   PARTITION BY event_type, epoch_us(ts) // 21600000000
                   ORDER BY value DESC, event_id) AS rn_max
        FROM events
    )
    SELECT event_type, CAST(bkt AS BIGINT) AS bkt, event_id, ts,
           round(value, 4) AS value,
           CASE WHEN rn_min = 1 AND rn_max = 1 THEN 'both'
                WHEN rn_min = 1 THEN 'min' ELSE 'max' END AS extreme
    FROM ranked WHERE rn_min = 1 OR rn_max = 1
    """,
    doc="Min-max downsampling — the monitoring-system render path "
    "(Grafana-style): per (series, 6 h bucket) keep only the extreme "
    "points, preserving the envelope a chart draws while shrinking a "
    "100 TB series by orders of magnitude.  min_by/max_by with a "
    "composite (value, ±event_id) argument gives total-order "
    "tie-breaks (the smallest event id witnesses both extremes) "
    "so both engines pick the same witness row.  One partial-agg "
    "shuffle on (series, bucket) finds the extreme ids; the self-join "
    "back rides the same key.  The value column renders rounded on "
    "both sides; selection itself uses the raw double identically.",
)
def events_minmax_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucketed = ev.select(
        "event_type",
        "event_id",
        "ts",
        "value",
        F.expr("unix_micros(ts) DIV 21600000000").alias("bkt"),
    )
    extremes = bucketed.groupBy("event_type", "bkt").agg(
        F.expr("min_by(event_id, struct(value, event_id))").alias("min_eid"),
        F.expr("max_by(event_id, struct(value, -event_id))").alias("max_eid"),
    )
    b = bucketed.alias("b")
    e = extremes.alias("e")
    return (
        b.join(
            e,
            (F.col("b.event_type") == F.col("e.event_type"))
            & (F.col("b.bkt") == F.col("e.bkt"))
            & (
                (F.col("b.event_id") == F.col("e.min_eid"))
                | (F.col("b.event_id") == F.col("e.max_eid"))
            ),
        )
        .select(
            F.col("b.event_type").alias("event_type"),
            F.col("b.bkt").cast("long").alias("bkt"),
            F.col("b.event_id").alias("event_id"),
            F.col("b.ts").alias("ts"),
            F.round("b.value", 4).alias("value"),
            F.when(
                (F.col("b.event_id") == F.col("e.min_eid"))
                & (F.col("b.event_id") == F.col("e.max_eid")),
                "both",
            )
            .when(F.col("b.event_id") == F.col("e.min_eid"), "min")
            .otherwise("max")
            .alias("extreme"),
        )
    )
