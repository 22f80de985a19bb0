"""General analytics operators — the event-time / OLAP generalization the
reference lacks (SURVEY.md §2 C explicitly lists these as absent; they are
extensions per SURVEY.md §7.1 M5, graded as first-class components).

Design-for-scale notes (local[32] tests, 1000-executor target):
  * aggregations are expressed declaratively → Catalyst plans partial
    (map-side) aggregation before the shuffle;
  * dimension joins (nation/region/customer at TPC-H shape) broadcast;
  * window functions partition by high-cardinality keys (user_id, topic),
    never a global window on fact data;
  * double aggregates are rounded identically on both engines so the
    oracle hash is stable under float-summation-order differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from mqtt2sql_spark.operators.materialize import snapshot
from mqtt2sql_spark.fixtures import load_table, messages
from mqtt2sql_spark.plans.base import register

# --- TPC-H Q1-style pricing summary (headline bench query) ----------------


@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan → filter (pushed down) → partial+final "
    "hash aggregate on two low-cardinality keys.",
    bench=True,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- top-k with deterministic tie-break -----------------------------------


@register(
    "topk_topics",
    oracle="""
    SELECT topic, n FROM (
        SELECT topic, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, topic) AS rk
        FROM messages GROUP BY topic
    ) WHERE rk <= 10
    """,
    doc="Top-K per global count with total-order tie-break (count desc, "
    "topic asc) — aggregate, then TakeOrderedAndProject (orderBy+limit: "
    "per-partition 10-row heap, driver merge) so the key-count aggregate "
    "is never windowed through one partition; never sort the fact table.",
)
def topk_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = messages(spark, sf_dir).groupBy("topic").agg(F.count(F.lit(1)).alias("n"))
    return agg.orderBy(F.desc("n"), F.asc("topic")).limit(10).select("topic", "n")


# --- multi-way dimension join (star schema) -------------------------------


@register(
    "revenue_by_region",
    oracle="""
    SELECT r_name, n_name,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY r_name, n_name
    """,
    doc="Star-schema rollup: fact ⋈ three broadcast dimensions → "
    "aggregate.  All dim joins are broadcast hash joins (no fact shuffle "
    "until the final 25-group aggregate).",
    bench=True,
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(
            (customer), orders["o_custkey"] == customer["c_custkey"]
        )
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --- event-time tumbling window -------------------------------------------


@register(
    "events_tumbling_window",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_day,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Event-time tumbling window (1 day) — the windowed-aggregation "
    "generalization absent from the reference (SURVEY.md §2 C); streaming "
    "form uses F.window + watermark in streaming/.",
    bench=True,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("window_day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


# --- sessionization --------------------------------------------------------

_SESSION_GAP_MIN = 30


@register(
    "events_sessionize",
    oracle=f"""
    , flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL {_SESSION_GAP_MIN} MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           round(sum(value), 4) AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Sessionization (30 min inactivity gap): lag + cumulative-sum "
    "session ids, partitioned by user — the batch twin of streaming "
    "session_window.",
    bench=True,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap <= _SESSION_GAP_MIN * 60, F.lit(0)).otherwise(F.lit(1)),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


# --- as-of join (window encoding) -----------------------------------------


@register(
    "asof_last_click_before_purchase",
    oracle="""
    SELECT event_id, user_id, ts, last_click_ts FROM (
        SELECT event_id, user_id, ts, event_type,
               max(CASE WHEN event_type = 'click' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_click_ts
        FROM events
    ) WHERE event_type = 'purchase'
    """,
    doc="As-of join, window encoding: for each purchase, the most recent "
    "strictly-earlier click by the same user — one shuffle by user_id, no "
    "join.  The applyInPandas merge_asof form is operators/asof.py "
    "(query key asof_join_purchase_click).",
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        ev.withColumn(
            "last_click_ts",
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


# --- pivot -----------------------------------------------------------------

_EVENT_TYPES = ("signup", "click", "purchase", "error", "view")


@register(
    "pivot_event_counts",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS n_{t}" for t in _EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
    doc="Pivot: per-user event-type count matrix over a fixed value list "
    "(explicit pivot values keep the plan single-pass, no distinct scan).",
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return out.select(
        "user_id", *[F.col(t).alias(f"n_{t}") for t in _EVENT_TYPES]
    )


# --- rollup (grouping sets) ------------------------------------------------


@register(
    "rollup_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets (subtotals + grand total) — grouping-set "
    "aggregation absent from the reference (SURVEY.md §2 C).",
)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# --- window frames / running totals ---------------------------------------


@register(
    "window_running_total",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 4)
               AS running_value,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS BIGINT) AS rn,
           lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_event_id
    FROM events
    """,
    doc="Window frames: running sum, row_number, lag per user — explicit "
    "ROWS frame (Spark's default RANGE frame differs under ties).",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(
            F.sum("value").over(w.rowsBetween(W.unboundedPreceding, 0)), 4
        ).alias("running_value"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.lag("event_id").over(w).alias("prev_event_id"),
    )


# --- exact distinct --------------------------------------------------------


@register(
    "distinct_users_per_type",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="Exact distinct aggregation (two-phase distinct under the hood); "
    "the approximate twin (HLL approx_count_distinct) is exercised in "
    "tests, not oracle-checked (sketch internals differ across engines).",
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n"),
    )


# --- set operations --------------------------------------------------------


@register(
    "set_except_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-03 00:00:00'
    """,
    doc="Set ops: purchasers minus early-error users (EXCEPT = distinct "
    "set semantics → DataFrame.subtract, planned as a left-anti hash join; "
    "exceptAll would be bag semantics and is wrong here).",
)
def set_except_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    errs = ev.filter(
        (F.col("event_type") == "error")
        & (F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp"))
    ).select("user_id")
    return buyers.subtract(errs)


# --- semi / anti joins -----------------------------------------------------


@register(
    "anti_join_customers_no_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    """,
    doc="Anti join (NOT EXISTS): customers with no order since 2000 — "
    "left_anti join with the date filter pushed to the probe-side "
    "scan.  The recency predicate keeps the result non-degenerate on "
    "this data (every customer has SOME order, so the unrestricted "
    "variant verified an empty set).",
)
def anti_join_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "semi_join_parts_ordered",
    oracle="""
    SELECT p_partkey, p_name FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
    doc="Semi join (EXISTS): parts that appear in any lineitem — "
    "left_semi join, fact side never materialized into the output.",
)
def semi_join_parts_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return p.join(
        li, p["p_partkey"] == li["l_partkey"], "left_semi"
    ).select("p_partkey", "p_name")


# --- outer join ------------------------------------------------------------


@register(
    "outer_join_customer_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           count(o_orderkey) AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
    doc="Left outer join + aggregate: order stats per customer including "
    "order-less customers (count(col) skips the null-extended rows).",
)
def outer_join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


# --- top-k per group -------------------------------------------------------


@register(
    "topk_lineitems_per_flag",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice DESC,
                                           l_orderkey, l_linenumber) AS rk
        FROM lineitem
    ) WHERE rk <= 3
    """,
    doc="Top-K per group: rank window partitioned by group key with a "
    "total-order tie-break; AQE handles group skew.",
)
def topk_lineitems_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


# --- scalar function library ----------------------------------------------


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    """,
    doc="JSON scalar extraction from the payload (the decoded-view "
    "surface SURVEY.md §1.3 reserves for downstream): get_json_object → "
    "typed column.",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


@register(
    "string_funcs",
    oracle="""
    SELECT event_id,
           upper(event_type) AS type_upper,
           length(props) AS props_len,
           substring(event_type, 1, 3) AS type_prefix,
           replace(event_type, 'e', '_') AS type_repl,
           lpad(CAST(user_id AS VARCHAR), 6, '0') AS user_padded,
           concat(event_type, '#', CAST(user_id AS VARCHAR)) AS tagged
    FROM events
    """,
    doc="String scalar library: upper/length/substring/replace/lpad/"
    "concat — all JVM-side, codegen'd (no UDFs).",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.length("props").cast("long").alias("props_len"),
        F.substring("event_type", 1, 3).alias("type_prefix"),
        F.replace(F.col("event_type"), F.lit("e"), F.lit("_")).alias("type_repl"),
        F.lpad(F.col("user_id").cast("string"), 6, "0").alias("user_padded"),
        F.concat_ws("#", "event_type", F.col("user_id").cast("string")).alias(
            "tagged"
        ),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT event_id,
           round(abs(value), 4) AS abs_v,
           round(sqrt(value), 4) AS sqrt_v,
           round(ln(1 + value), 4) AS log1p_v,
           round(pow(value, 2), 4) AS sq_v,
           CAST(floor(value) AS BIGINT) AS floor_v,
           CAST(ceil(value) AS BIGINT) AS ceil_v,
           CAST(CAST(floor(value) AS BIGINT) % 7 AS INTEGER) AS mod_v
    FROM events
    """,
    doc="Math scalar library: abs/sqrt/ln/pow/floor/ceil/mod, rounded for "
    "cross-engine float stability.",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.round(F.abs(v), 4).alias("abs_v"),
        F.round(F.sqrt(v), 4).alias("sqrt_v"),
        F.round(F.log1p(v), 4).alias("log1p_v"),
        F.round(F.pow(v, 2), 4).alias("sq_v"),
        F.floor(v).cast("long").alias("floor_v"),
        F.ceil(v).cast("long").alias("ceil_v"),
        # floor, not int-cast: DuckDB's double→int cast rounds half-even
        # while Spark's truncates — floor agrees on both engines
        (F.floor(v) % 7).cast("int").alias("mod_v"),
    )


# --- percentiles / quantiles ----------------------------------------------


@register(
    "orders_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
           round(min(o_totalprice), 4) AS lo,
           round(max(o_totalprice), 4) AS hi
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact interpolated quantiles per group (Spark percentile == "
    "DuckDB quantile_cont, verified); the approximate twin "
    "(percentile_approx / t-digest) is the 100 TB path and is exercised "
    "in tests (sketches are engine-specific, not oracle-hashable).",
)
def orders_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
        F.round(F.min("o_totalprice"), 4).alias("lo"),
        F.round(F.max("o_totalprice"), 4).alias("hi"),
    )


# --- cube -------------------------------------------------------------------


@register(
    "cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets: all 2^2 subtotal combinations in one pass "
    "(expand + single shuffle, not four scans).",
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# --- sliding window ---------------------------------------------------------


@register(
    "events_sliding_window",
    oracle="""
    SELECT window_start, event_type, count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM (
        SELECT CAST(date_trunc('day', ts) - to_days(CAST(d.x AS INTEGER))
                    AS TIMESTAMP) AS window_start,
               event_type, value
        FROM events, range(2) d(x)
    )
    GROUP BY window_start, event_type
    """,
    doc="Sliding event-time window (2 days, sliding 1): each event lands "
    "in two windows — the batch twin of streaming F.window(ts, '2 days', "
    "'1 day'); expansion before aggregation, one shuffle.",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 days", "1 day").getField("start").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


# --- unpivot ----------------------------------------------------------------


@register(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT measure, round(avg(val), 4) AS avg_val, count(*) AS n FROM (
        SELECT 'qty' AS measure, l_quantity AS val FROM lineitem
        UNION ALL
        SELECT 'price', l_extendedprice FROM lineitem
        UNION ALL
        SELECT 'disc', l_discount FROM lineitem
    ) GROUP BY measure
    """,
    doc="Unpivot (wide → long) via stack + aggregate per measure — "
    "a generator expression, no join.",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = li.select(
        F.expr(
            "stack(3, 'qty', l_quantity, 'price', l_extendedprice, "
            "'disc', l_discount) AS (measure, val)"
        )
    )
    return long.groupBy("measure").agg(
        F.round(F.avg("val"), 4).alias("avg_val"),
        F.count(F.lit(1)).alias("n"),
    )


# --- intersect --------------------------------------------------------------


@register(
    "set_intersect_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
    doc="Set intersection (INTERSECT distinct) — planned as a left-semi "
    "join over distinct sets.",
)
def set_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.intersect(b)


# --- HAVING -----------------------------------------------------------------


@register(
    "having_hot_topics",
    oracle="""
    SELECT topic, count(*) AS n FROM messages
    GROUP BY topic HAVING count(*) >= 20
    """,
    doc="Aggregate + HAVING (post-aggregation filter) — hot-key detection, "
    "the skew diagnostic used before salting decisions.",
)
def having_hot_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        messages(spark, sf_dir)
        .groupBy("topic")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 20)
    )


# --- argmax (max_by) --------------------------------------------------------


@register(
    "argmax_latest_value",
    oracle="""
    SELECT topic,
           max_by(value_str, event_id) AS last_value,
           max(event_id) AS last_event_id
    FROM messages GROUP BY topic
    """,
    doc="Aggregation form of last-value-per-key: max_by keyed on the "
    "unique event_id — the single-pass alternative to the row_number "
    "window for A5 (one partial-aggregated shuffle, no sort).",
)
def argmax_latest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    msg = messages(spark, sf_dir).withColumn(
        "value_str", F.col("value").cast("string")
    )
    return msg.groupBy("topic").agg(
        F.max_by("value_str", "event_id").alias("last_value"),
        F.max("event_id").alias("last_event_id"),
    )


# --- correlated-subquery shape ---------------------------------------------


@register(
    "orders_above_customer_avg",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS price
    FROM orders o
    WHERE o.o_totalprice > (
        SELECT 1.5 * avg(i.o_totalprice) FROM orders i
        WHERE i.o_custkey = o.o_custkey
    )
    """,
    doc="Correlated scalar subquery (orders 1.5x above their customer's "
    "average) — decorrelated into an aggregate + equi-join, the rewrite "
    "Catalyst and every modern optimizer performs.",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    avgs = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.avg("o_totalprice").alias("cavg")
    )
    return (
        o.join(avgs, o["o_custkey"] == avgs["ck"])
        .filter(F.col("o_totalprice") > 1.5 * F.col("cavg"))
        .select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price")
        )
    )


# --- skew-aware aggregation (salting) --------------------------------------


@register(
    "salted_topic_counts",
    oracle="""
    SELECT topic, n, round(sum_value, 4) AS sum_value FROM (
        SELECT topic, count(*) AS n, sum(qos) AS sum_value
        FROM messages GROUP BY topic
    )
    """,
    doc="Skew-resistant aggregation: two-phase salted count/sum "
    "(operators/skew.py) — bit-identical to the plain GROUP BY (the "
    "oracle) for decomposable aggregates, but the hot key fans out over "
    "16 sub-keys in phase 1.",
)
def salted_topic_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2sql_spark.operators.skew import salted_count_sum

    msg = messages(spark, sf_dir)
    out = salted_count_sum(msg, "topic", sum_cols=("qos",), salt_buckets=16)
    return out.select(
        "topic", "n", F.round(F.col("sum_qos").cast("double"), 4).alias("sum_value")
    )


# --- statistical aggregates -------------------------------------------------


@register(
    "lineitem_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_extendedprice), 2) AS var_price,
           round(corr(l_extendedprice, l_discount), 6) + 0 AS corr_price_disc,
           round(covar_samp(l_quantity, l_discount), 6) + 0 AS covar_qty_disc,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Statistical aggregates: sample stddev/variance, correlation, "
    "covariance per group — single-pass co-moment accumulation, "
    "map-side combinable (verified bit-parity with DuckDB).",
)
def lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        (F.round(F.corr("l_extendedprice", "l_discount"), 6) + F.lit(0.0)).alias(
            "corr_price_disc"
        ),
        (F.round(F.covar_samp("l_quantity", "l_discount"), 6) + F.lit(0.0)).alias(
            "covar_qty_disc"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# --- fuzzy string matching --------------------------------------------------


@register(
    "fuzzy_topic_match",
    oracle="""
    , topics AS (SELECT DISTINCT topic FROM messages)
    SELECT a.topic AS topic_a, b.topic AS topic_b,
           CAST(levenshtein(a.topic, b.topic) AS INTEGER) AS dist
    FROM topics a JOIN topics b ON a.topic < b.topic
    WHERE levenshtein(a.topic, b.topic) <= 2
    """,
    doc="Fuzzy key matching: Levenshtein distance ≤2 over the topic "
    "dimension self-join — typo/alias detection on keys; the dimension "
    "is small so the quadratic compare broadcasts (for corpus-scale "
    "string fuzzy-dedup the n-gram Jaccard path is the scalable route).",
)
def fuzzy_topic_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    topics = messages(spark, sf_dir).select("topic").distinct()
    # the quadratic compare runs as a nested-loop join: fan the probe side
    # out over all cores (the distinct's AQE-coalesced output is 1 task)
    a = topics.repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = topics.alias("b")
    # cheap length-band guard short-circuits before the O(len²) edit
    # distance; it cannot change results (levenshtein >= length delta)
    len_guard = (
        F.abs(F.length(F.col("a.topic")) - F.length(F.col("b.topic"))) <= 2
    )
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.topic") < F.col("b.topic")) & len_guard,
        )
        .select(
            F.col("a.topic").alias("topic_a"),
            F.col("b.topic").alias("topic_b"),
            F.levenshtein(F.col("a.topic"), F.col("b.topic")).alias("dist"),
        )
        .filter(F.col("dist") <= 2)
    )


# --- date/time scalar library -----------------------------------------------


@register(
    "date_funcs",
    oracle="""
    SELECT event_id,
           year(ts) AS y, month(ts) AS m, day(ts) AS d, hour(ts) AS h,
           CAST(isodow(ts) AS INTEGER) AS iso_dow,
           CAST(weekofyear(ts) AS INTEGER) AS woy,
           CAST(quarter(ts) AS INTEGER) AS q,
           CAST(ts AS DATE) + 7 AS plus_week,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                AS INTEGER) AS days_since_start,
           last_day(CAST(ts AS DATE)) AS month_end
    FROM events
    """,
    doc="Date/time scalar library: extraction (year..hour, ISO weekday, "
    "week-of-year, quarter), date arithmetic, month-end — all codegen'd; "
    "day-of-week normalized to ISO (Spark's dayofweek is 1=Sunday, "
    "DuckDB's 0=Sunday — weekday+1 == isodow on both).",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        (F.weekday("ts") + 1).cast("int").alias("iso_dow"),
        F.weekofyear("ts").alias("woy"),
        F.quarter("ts").alias("q"),
        F.date_add(d, 7).alias("plus_week"),
        F.datediff(d, F.lit("2024-01-01").cast("date")).alias(
            "days_since_start"
        ),
        F.last_day(d).alias("month_end"),
    )


# --- array scalar library ---------------------------------------------------


@register(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS n,
           round(CAST(embedding[1] AS DOUBLE), 4) + 0 AS first_val,
           round(CAST(embedding[8] AS DOUBLE), 4) + 0 AS eighth_val,
           round(list_sort(list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> round(x, 4)))[1], 4) + 0 AS min_r,
           round(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                         x -> abs(x))), 4) AS l1_norm,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0))
                AS INTEGER) AS n_positive
    FROM embeddings
    """,
    doc="Array scalar library over array<float>: indexing, element-wise "
    "transform, filter, sort, fold — the higher-order-function surface "
    "(1-indexed in DuckDB, 0-indexed in Spark; shifted accordingly).",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("n"),
        (F.round(F.get(e, 0), 4) + F.lit(0.0)).alias("first_val"),
        (F.round(F.get(e, 7), 4) + F.lit(0.0)).alias("eighth_val"),
        (F.round(
            F.get(F.sort_array(F.transform(e, lambda x: F.round(x, 4))), 0), 4
        ) + F.lit(0.0)).alias("min_r"),
        F.round(
            F.aggregate(
                F.transform(e, lambda x: F.abs(x)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("l1_norm"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
    )


# --- null-handling scalars ---------------------------------------------------


@register(
    "null_handling",
    oracle="""
    SELECT c_custkey,
           coalesce(o_orderkey, -1) AS order_or_default,
           CAST(o_orderkey IS NULL AS INTEGER) AS is_orderless,
           nullif(c_mktsegment, 'BUILDING') AS seg_nullified,
           greatest(coalesce(o_totalprice, 0), c_acctbal) AS max_money,
           round(least(coalesce(o_totalprice, 1e18), c_acctbal), 2)
               AS min_money
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    """,
    doc="Null-handling scalar library over null-extending join output: "
    "coalesce/nullif/greatest/least + null predicates (three-valued "
    "logic edge cases).",
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = c.join(o, c["c_custkey"] == o["o_custkey"], "left")
    return j.select(
        "c_custkey",
        F.coalesce("o_orderkey", F.lit(-1)).alias("order_or_default"),
        F.col("o_orderkey").isNull().cast("int").alias("is_orderless"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias(
            "seg_nullified"
        ),
        F.greatest(
            F.coalesce("o_totalprice", F.lit(0.0)), F.col("c_acctbal")
        ).alias("max_money"),
        F.round(
            F.least(
                F.coalesce("o_totalprice", F.lit(1e18)), F.col("c_acctbal")
            ),
            2,
        ).alias("min_money"),
    )


# --- map-typed payload ops -------------------------------------------------


@register(
    "map_funcs",
    oracle="""
    , je AS (
        SELECT event_type, k,
               CAST(json_extract_string(props, '$.' || k) AS INTEGER) AS v
        FROM (
            SELECT event_type, props, unnest(json_keys(props)) AS k
            FROM events
        )
    )
    SELECT event_type, k, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v,
           CAST(floor(CAST(sum(v) AS DOUBLE) * 10000.0 / count(*) + 0.5) AS BIGINT) AS avg_v_fp
    FROM je GROUP BY event_type, k
    """,
    doc="Map-typed payload surface: from_json to map<string,int>, "
    "explode entries to long format, aggregate per (event_type, key) — "
    "the dynamic-schema escape hatch for semi-structured payloads "
    "(SURVEY.md §1.3 keeps the stored payload opaque; this is the "
    "decoded view).  Long format shuffles (type, key) pairs with "
    "map-side partial aggregation, never whole maps.  The average is "
    "exposed as exact integer fixed-point (1e-4 units, round-half-up "
    "from the exact sum/count integers) so the compared surface has no "
    "float: r01's driver gate flagged a hash mismatch on the rounded "
    "DOUBLE that local emulation could not reproduce — a float-rendering "
    "canonicalization divergence, engineered away per the "
    "embedding_quantize_int8 pattern (plans/similarity.py).",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    entries = ev.select(
        "event_type", F.explode(m).alias("k", "v")
    )
    agg = entries.groupBy("event_type", "k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("long").alias("sum_v"),
    )
    # exact-integer fixed-point average (1e-4 units): identical IEEE op
    # order on both sides — (double)sum * 10000.0 / n + 0.5, floor.
    avg_fp = F.floor(
        F.col("sum_v").cast("double") * F.lit(10000.0) / F.col("n") + F.lit(0.5)
    ).cast("long")
    return agg.withColumn("avg_v_fp", avg_fp)


# --- GROUPING SETS ---------------------------------------------------------


@register(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
           CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (two independent one-column rollups plus "
    "the grand total in ONE pass — what separate GROUP BYs would need "
    "three scans for), with grouping() flags disambiguating the NULL "
    "markers.  Complements rollup_lineitem / cube_orders; Spark plans "
    "a single Expand + hash aggregate, so the scan and shuffle are "
    "shared across all three sets.",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --- time-range window frame -----------------------------------------------


@register(
    "window_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_hour,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ), 4) + 0 AS sum_last_hour
    FROM events
    """,
    doc="Time-range window frame: per user, events and value-sum in the "
    "trailing hour (RANGE BETWEEN INTERVAL, keyed on exact integer "
    "microseconds so both engines frame identically).  The sliding-"
    "aggregate form the history table's monitoring queries need; one "
    "shuffle by user, frame evaluation is a sorted in-partition scan.",
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_last_hour"),
        (F.round(F.sum("value").over(w), 4) + F.lit(0.0)).alias(
            "sum_last_hour"
        ),
    )


# --- cohort retention ------------------------------------------------------


@register(
    "cohort_retention",
    oracle="""
    , first AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d0
        FROM events GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT d0 AS cohort_day,
           CAST(date_diff('day', d0, d) // 7 AS INTEGER) AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM act a JOIN first USING (user_id)
    GROUP BY cohort_day, week_offset
    """,
    doc="Cohort retention: users grouped by first-seen day, activity "
    "counted per week offset — the engagement matrix behind every "
    "retention curve.  Two aggregations on the same user_id key (AQE "
    "reuses the shuffle layout); the cohort dimension joins broadcast.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0")
    )
    act = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        act.join(first, "user_id")
        .select(
            F.col("d0").alias("cohort_day"),
            F.floor(F.datediff("d", "d0") / 7).cast("int").alias(
                "week_offset"
            ),
            "user_id",
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --- funnel conversion -----------------------------------------------------


@register(
    "funnel_conversion",
    oracle="""
    , v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t_view
          AND e.ts <= v.t_view + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          AND e.ts <= c.t_click + INTERVAL 24 HOUR
        GROUP BY e.user_id
    )
    SELECT CASE WHEN p.user_id IS NOT NULL THEN 3
                WHEN c.user_id IS NOT NULL THEN 2
                ELSE 1 END AS stage,
           count(*) AS n_users
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    GROUP BY stage
    """,
    doc="Ordered funnel (view → click → purchase, each step strictly "
    "after the previous and within a 24 h conversion window): per-step earliest-qualifying-time via "
    "conditional aggregation + semi-style joins, then stage counts.  "
    "All three aggregations hash on user_id — one shuffle layout "
    "reused; step dimensions broadcast back to the fact.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 24 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 24 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .otherwise(1)
    )
    return (
        v.join(c.select("user_id", "t_click"), "user_id", "left")
        .join(p.select("user_id", "t_purchase"), "user_id", "left")
        .select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# --- NTILE deciles ---------------------------------------------------------


@register(
    "ntile_deciles",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(10) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
           ) AS INTEGER) AS decile
    FROM orders
    """,
    doc="NTILE decile assignment per order priority (total order with "
    "o_orderkey tie-break).  Partitioned by priority so the sort is "
    "per-key, not global — the scale-safe NTILE; a global decile at "
    "100 TB would use percent_rank over range-partitioned sort or "
    "approx quantile boundaries instead.",
)
def ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(10).over(w).cast("int").alias("decile"),
    )


# --- shipping-priority top-k (TPC-H Q3 shape) ------------------------------


@register(
    "shipping_priority_topk",
    bench=True,
    oracle="""
    SELECT l_orderkey, revenue_cents, o_orderdate, rank FROM (
        SELECT l.l_orderkey,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                   * 100, 0) AS BIGINT)) AS BIGINT)
                   AS revenue_cents,
               o.o_orderdate,
               CAST(row_number() OVER (
                   ORDER BY sum(CAST(round(l.l_extendedprice
                                           * (1 - l.l_discount) * 100, 0)
                                     AS BIGINT)) DESC,
                            l.l_orderkey
               ) AS BIGINT) AS rank
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01'
          AND l.l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l.l_orderkey, o.o_orderdate
    ) WHERE rank <= 10
    """,
    doc="Shipping-priority top-k (TPC-H Q3 shape): selective dimension "
    "filter (mktsegment) broadcast through orders into lineitem, "
    "aggregate revenue per order, global top-10 with total-order "
    "tie-break.  The filters reach both parquet scans (pushdown) and "
    "the customer side broadcasts; lineitem ⋈ orders is AQE's choice "
    "(broadcast at test scale, shuffle at 100 TB); the global top-10 is "
    "orderBy+limit — Spark's TakeOrderedAndProject keeps a 10-row heap "
    "per partition and merges heaps, so no single task ever holds the "
    "full per-order aggregate; the rank window runs on the 10 survivors.",
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01"
    )
    # customer (post-filter, dim-sized) broadcasts explicitly; the
    # lineitem ⋈ orders join is left to AQE — at 100 TB the date-filtered
    # orders side is far past broadcast size and must shuffle, while at
    # test scale AQE demotes it to a broadcast on its own
    rev = (
        li.join(
            orders.join(
                (cust.select("c_custkey")),
                orders["o_custkey"] == F.col("c_custkey"),
            ).select("o_orderkey", "o_orderdate"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100,
                    0,
                ).cast("long")
            ).alias("revenue_cents")
        )
    )
    # distributed top-k: TakeOrderedAndProject (per-partition 10-row heap,
    # driver heap-merge) instead of a single-partition ranking window over
    # the full per-order aggregate — the total-order sort key makes the
    # limit deterministic, and row_number then ranks only the 10 survivors
    order = [F.desc("revenue_cents"), F.asc("l_orderkey")]
    top = rev.orderBy(*order).limit(10)
    w = W.orderBy(*order)
    return top.select(
        "l_orderkey",
        "revenue_cents",
        "o_orderdate",
        F.row_number().over(w).cast("long").alias("rank"),
    )


# --- per-group z-score anomaly flagging ------------------------------------

Z_MIN_ABS = 2.5  # |z| threshold for flagging


@register(
    "anomaly_zscore",
    oracle=f"""
    , stats AS (
        SELECT event_type, round(avg(value), 6) AS mu,
               round(stddev_samp(value), 6) AS sd
        FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type,
           round(e.value, 4) + 0 AS value,
           round((e.value - s.mu) / s.sd, 4) + 0 AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE s.sd > 0 AND abs(round((e.value - s.mu) / s.sd, 4)) >= {Z_MIN_ABS}
    """,
    doc="Anomaly flagging: per-event-type mean/stddev (single-pass "
    "co-moment agg, bit-parity verified like lineitem_stats), broadcast "
    "back onto the fact stream, flag |z| ≥ 2.5.  Parity recipe: mu/sd are "
    "ROUNDED before the z arithmetic so both engines divide identical "
    "doubles; z gets the round+0 negative-zero guard (CLAUDE.md rules). "
    "Scale: the stats side is |event_types| rows — a broadcast join, no "
    "fact shuffle; the filter evaluates in the scan stage.",
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_samp("value"), 6).alias("sd"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter((F.col("sd") > 0) & (F.abs(z) >= Z_MIN_ABS))
        .select(
            "event_id",
            "event_type",
            (F.round("value", 4) + F.lit(0.0)).alias("value"),
            (z + F.lit(0.0)).alias("z"),
        )
    )


# --- equi-width histogram --------------------------------------------------

PRICE_BUCKET_WIDTH = 50000.0


@register(
    "orders_price_histogram",
    oracle=f"""
    SELECT CAST(floor(o_totalprice / {PRICE_BUCKET_WIDTH}) AS BIGINT)
               AS bucket,
           CAST(floor(o_totalprice / {PRICE_BUCKET_WIDTH}) AS BIGINT)
                 * {int(PRICE_BUCKET_WIDTH)} AS bucket_lo,
           count(*) AS n,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders GROUP BY 1
    """,
    doc="Equi-width histogram of order value: floor-division bucketing "
    "(floor, never int-cast — DuckDB rounds half-even on cast) + one "
    "partial-agg'd shuffle keyed on the bucket.  Bucket count is "
    "data-independent, so the aggregate state is bounded no matter the "
    "scale; the distribution profile every pipeline reads before "
    "choosing range-partition bounds.",
)
def orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / PRICE_BUCKET_WIDTH).cast("long")
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            (F.col("bucket") * int(PRICE_BUCKET_WIDTH))
            .alias("bucket_lo"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


# --- TPC-H Q18 shape: semi-join on an aggregate ----------------------------

BIG_ORDER_QTY = 200.0


@register(
    "large_orders_topk",
    bench=True,
    oracle=f"""
    , big AS (
        SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > {BIG_ORDER_QTY}
    )
    SELECT c_name, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice, sum_qty,
           CAST(row_number() OVER (
               ORDER BY round(o_totalprice, 2) DESC, o_orderkey
           ) AS BIGINT) AS rank
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY rank LIMIT 100
    """,
    doc="TPC-H Q18 shape (large-volume orders): HAVING over a per-order "
    "aggregate acts as a semi-filter on orders — the aggregate runs "
    "first (partial+final on l_orderkey), its small survivor set joins "
    "orders on the same key, customer broadcasts for the name, and the "
    "global top-100 is TakeOrderedAndProject.  The pattern where a "
    "1000-executor plan hinges on aggregating BEFORE joining: the join "
    "input shrinks from |lineitem| to |qualifying orders|.",
)
def large_orders_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_raw_qty"))
        .filter(F.col("_raw_qty") > BIG_ORDER_QTY)
        .select("l_orderkey", F.round("_raw_qty", 2).alias("sum_qty"))
    )
    joined = (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )
    order = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    top = joined.orderBy(*order).limit(100)
    return top.withColumn(
        "rank", F.row_number().over(W.orderBy(*order)).cast("long")
    )


# --- TPC-H Q14 shape: conditional-aggregation ratio ------------------------


@register(
    "promo_revenue_share",
    oracle="""
    , rev AS (
        SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
               sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(round(l_extendedprice * (1 - l_discount)
                                        * 100, 0) AS BIGINT)
                        ELSE 0 END) AS promo_cents,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                        AS BIGINT)) AS total_cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY 1
    )
    SELECT month,
           CAST(promo_cents AS BIGINT) AS promo_cents,
           CAST(total_cents AS BIGINT) AS total_cents,
           CAST((1000000 * promo_cents) // greatest(total_cents, 1)
                AS BIGINT) AS promo_share_ppm
    FROM rev
    """,
    doc="TPC-H Q14 shape (promotion revenue share): conditional "
    "aggregation — one pass computes both the filtered and the total "
    "sum (no second scan, no self-join), part broadcasts into the "
    "lineitem scan stage.  Revenue is summed as exact integer cents "
    "(per-row quantization, BIGINT sum — the nation_trade_volume "
    "pattern): float summation order across partitions is "
    "nondeterministic, and monthly groups grow with scale until "
    "round(sum(double), 2) lands on a rounding boundary.  The share is "
    "exact integer ppm (positive `div`), so the compared surface has "
    "no cross-engine float arithmetic at all.",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cents = F.round(disc * 100, 0).cast("long")
    rev = (
        li.join(part, li["l_partkey"] == F.col("p_partkey"))
        .groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0))
            ).alias("promo_cents"),
            F.sum(cents).alias("total_cents"),
        )
    )
    return rev.selectExpr(
        "month",
        "promo_cents",
        "total_cents",
        "CAST((1000000 * promo_cents) div greatest(total_cents, 1) "
        "AS BIGINT) AS promo_share_ppm",
    )


# --- TPC-H Q16 shape: distinct aggregation ---------------------------------


@register(
    "supplier_variety",
    bench=True,
    oracle="""
    SELECT p_brand, p_type,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt,
           count(*) AS n_lineitems
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
    GROUP BY p_brand, p_type
    """,
    doc="TPC-H Q16 shape (supplier variety): COUNT(DISTINCT) per group "
    "with a dimension anti-filter.  Spark plans distinct-agg as a "
    "two-level aggregate (partial distinct on (group, suppkey), then "
    "final count) — the distinct set shuffles once, pre-deduplicated "
    "map-side, instead of shipping every lineitem row to the reducers.",
)
def supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type"
    )
    return (
        li.join(part, li["l_partkey"] == F.col("p_partkey"))
        .filter(F.col("p_brand") != "Brand#1")
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# --- TPC-H Q7 shape: nation-pair trade volume ------------------------------


@register(
    "nation_trade_volume",
    bench=True,
    oracle="""
    SELECT cust_nation, supp_nation,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                          AS BIGINT)) AS BIGINT) AS volume_cents,
           count(*) AS n_items
    FROM lineitem
    JOIN orders    ON o_orderkey = l_orderkey
    JOIN customer  ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN supplier  ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey,
    LATERAL (SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation) x
    WHERE cn.n_name < sn.n_name
    GROUP BY cust_nation, supp_nation, ship_year
    """,
    doc="TPC-H Q7 shape (trade volume between nation pairs): the fact "
    "table resolves BOTH trading partners — customer nation through "
    "orders, supplier nation directly — with every dimension hop a "
    "broadcast hash join, so the only fact shuffle is the lineitem ⋈ "
    "orders key join and the final rollup.  The asymmetric pair filter "
    "(cust < supp) halves the output without a second pass.  Revenue is "
    "summed as exact integer cents (per-row quantization, BIGINT sum) — "
    "float summation order across partitions is nondeterministic, and a "
    "group with enough terms WILL land on a round() boundary (witnessed "
    "at sf0.01); integer sums are order-independent on both engines.",
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(cn), cust["c_nationkey"] == F.col("cn_key"))
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(sn), supp["s_nationkey"] == F.col("sn_key"))
        .filter(F.col("cust_nation") < F.col("supp_nation"))
    )
    return joined.groupBy(
        "cust_nation",
        "supp_nation",
        F.year("l_shipdate").cast("int").alias("ship_year"),
    ).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                0,
            ).cast("long")
        ).alias("volume_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- relative-rank window functions ----------------------------------------


@register(
    "orders_percentile_rank",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Relative-rank window functions (percent_rank / cume_dist / "
    "ntile) per order priority: one shuffle keyed on the partition "
    "column, one sort per partition serves all three functions.  Both "
    "engines compute percent_rank as (rank-1)/(rows-1) on exact "
    "integers, so rounding is bit-stable; the total-order sort key "
    "(price, orderkey) removes tie ambiguity.",
)
def orders_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


# --- per-column data-quality profile ---------------------------------------


@register(
    "events_profile",
    oracle="""
    SELECT 'event_id' AS col, count(*) AS n_rows,
           CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct
    FROM events
    UNION ALL
    SELECT 'user_id', count(*),
           CAST(count(*) - count(user_id) AS BIGINT),
           CAST(count(DISTINCT user_id) AS BIGINT) FROM events
    UNION ALL
    SELECT 'event_type', count(*),
           CAST(count(*) - count(event_type) AS BIGINT),
           CAST(count(DISTINCT event_type) AS BIGINT) FROM events
    UNION ALL
    SELECT 'value', count(*),
           CAST(count(*) - count(value) AS BIGINT),
           CAST(count(DISTINCT value) AS BIGINT) FROM events
    """,
    doc="Schema-drift / data-quality profile: per-column row, null and "
    "exact-distinct counts in ONE pass — Spark plans the multi-distinct "
    "aggregate with a single expand + two-level aggregation rather than "
    "four scans (the oracle's UNION ALL is the semantic spec, not the "
    "plan).  The report every ingest pipeline snapshots per drop before "
    "accepting it; constant output width regardless of scale.",
)
def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n = F.count(F.lit(1))
    profiled = ev.agg(
        n.alias("n_rows"),
        *[
            e
            for c in ("event_id", "user_id", "event_type", "value")
            for e in (
                (n - F.count(c)).cast("long").alias(f"null_{c}"),
                F.countDistinct(c).cast("long").alias(f"dist_{c}"),
            )
        ],
    )
    stack = ", ".join(
        f"'{c}', null_{c}, dist_{c}"
        for c in ("event_id", "user_id", "event_type", "value")
    )
    return profiled.select(
        F.expr(f"stack(4, {stack}) AS (col, n_null, n_distinct)"),
        "n_rows",
    ).select("col", "n_rows", "n_null", "n_distinct")


# --- MQTT topic-hierarchy rollup -------------------------------------------


@register(
    "topic_hierarchy_rollup",
    oracle="""
    , levels AS (
        SELECT topic,
               CAST(unnest(generate_series(1, len(string_split(topic, '/'))))
                    AS INTEGER) AS depth
        FROM messages
    )
    SELECT array_to_string(string_split(topic, '/')[1:depth], '/') AS prefix,
           depth, count(*) AS n_messages
    FROM levels
    GROUP BY 1, 2
    """,
    doc="MQTT topic-tree rollup: every message counts toward each "
    "ancestor prefix of its topic (the subscription-tree view a broker "
    "dashboard shows).  Prefix enumeration is a per-row generate "
    "(explode of 1..depth) — fan-out bounded by topic depth — followed "
    "by one partial-agg'd shuffle on the prefix; no self-join, no "
    "recursion.  The wildcard-match twin of A3: a '#' subscription at "
    "any node covers exactly the rolled-up count.",
)
def topic_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    msg = messages(spark, sf_dir)
    parts = F.split(F.col("topic"), "/")
    lv = msg.select(
        "topic",
        F.explode(F.sequence(F.lit(1), F.size(parts))).alias("depth"),
    )
    prefix = F.concat_ws(
        "/", F.slice(F.split(F.col("topic"), "/"), 1, F.col("depth"))
    )
    return (
        lv.select(prefix.alias("prefix"), "depth")
        .groupBy("prefix", "depth")
        .agg(F.count(F.lit(1)).alias("n_messages"))
    )


# --- positional window values (first/last/nth) ------------------------------


@register(
    "orders_positional_window",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(first_value(o_totalprice) OVER w, 2) AS cheapest,
           round(last_value(o_totalprice) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ), 2) AS priciest,
           round(nth_value(o_totalprice, 3) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ), 2) AS third_cheapest
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Positional window values (first_value / last_value / "
    "nth_value): per-priority cheapest, priciest and third-cheapest "
    "order attached to every row.  last/nth need the explicit "
    "unbounded-following frame (the default frame stops at CURRENT ROW "
    "— identically on both engines); one shuffle + one sort serves all "
    "three.  Total-order sort key removes tie ambiguity.",
)
def orders_positional_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.first("o_totalprice").over(w), 2).alias("cheapest"),
        F.round(F.last("o_totalprice").over(wfull), 2).alias("priciest"),
        F.round(F.nth_value("o_totalprice", 3).over(wfull), 2).alias(
            "third_cheapest"
        ),
    )


# --- TPC-H Q11 shape: share-of-global HAVING -------------------------------

PART_SHARE_MIN_MULT_E1 = 12  # keep parts above 1.2x the uniform 1/n share


@register(
    "part_value_share",
    oracle=f"""
    , pv AS (
        SELECT l_partkey,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                        AS BIGINT)) AS part_cents
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT sum(part_cents) AS total_cents,
                   count(*) AS n_parts FROM pv)
    SELECT l_partkey,
           CAST(part_cents AS BIGINT) AS part_cents,
           CAST((1000000 * part_cents) // total_cents AS BIGINT) AS share_ppm
    FROM pv CROSS JOIN tot
    WHERE CAST(part_cents AS HUGEINT) * n_parts * 10
          >= CAST(total_cents AS HUGEINT) * {PART_SHARE_MIN_MULT_E1}
    """,
    doc="TPC-H Q11 shape (parts holding a significant share of global "
    "value): per-part revenue filtered against a multiple of the "
    "UNIFORM 1/n share of the global total, so the predicate stays "
    "meaningful at every corpus size (an absolute ppm cutoff empties "
    "as the catalog grows — witnessed at sf0.1).  The threshold "
    "compares cross-multiplied exact integers (part_cents * n_parts * "
    "10 >= total_cents * 12, widened to DECIMAL(38,0)/HUGEINT): the "
    "pre-divided ppm form floored to 0 past ~1.2M parts, inverting the "
    "predicate at scale.  The global total is an aggregate of the already-aggregated "
    "per-part relation — tiny — and joins back as a broadcast single "
    "row, so the fact table is scanned and shuffled exactly once "
    "(partial+final agg on l_partkey).  Revenue in exact integer cents, "
    "share in exact integer ppm (nation_trade_volume parity pattern); "
    "the HAVING-over-global predicate uses the ppm integer on both "
    "engines.  Reference has no aggregation at all — extension per "
    "SURVEY.md §2 C.",
)
def part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    pv = li.groupBy("l_partkey").agg(F.sum(cents).alias("part_cents"))
    tot = pv.agg(
        F.sum("part_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .withColumn(
            "share_ppm",
            F.expr("CAST((1000000 * part_cents) div total_cents AS BIGINT)"),
        )
        .filter(
            # Cross-multiplied exact integers: the pre-divided ppm form
            # ((12 * 100000) // n_parts) floors to 0 once n_parts exceeds
            # 1.2M, silently keeping every part at large scale.  Widen to
            # DECIMAL(38,0) (HUGEINT on the oracle side): BIGINT products
            # overflow silently in non-ANSI Spark at 100 TB magnitudes.
            F.col("part_cents").cast("decimal(38,0)")
            * F.col("n_parts")
            * F.lit(10)
            >= F.col("total_cents").cast("decimal(38,0)")
            * F.lit(PART_SHARE_MIN_MULT_E1)
        )
        .selectExpr(
            "l_partkey",
            "part_cents",
            "share_ppm",
        )
    )


# --- TPC-H Q2 shape: correlated minimum ------------------------------------


@register(
    "min_cost_supplier_per_part",
    oracle="""
    , uc AS (
        SELECT l_partkey, l_suppkey,
               l_extendedprice / greatest(l_quantity, 1) AS cost
        FROM lineitem
    ),
    m AS (SELECT l_partkey, min(cost) AS mincost FROM uc GROUP BY l_partkey)
    SELECT DISTINCT uc.l_partkey, uc.l_suppkey,
           CAST(floor(uc.cost * 10000) AS BIGINT) AS unit_cost_fp
    FROM uc JOIN m ON uc.l_partkey = m.l_partkey AND uc.cost = m.mincost
    """,
    doc="TPC-H Q2 shape (cheapest supplier per part — the correlated "
    "scalar-subquery pattern `cost = (SELECT min(cost) ... WHERE "
    "partkey = outer.partkey)`).  Spark expresses the correlation as a "
    "min window over the part key: ONE shuffle on l_partkey serves both "
    "the minimum and the filter, where the naive subquery form would "
    "scan+shuffle the fact table twice and join it to itself.  Ties "
    "(several suppliers at the minimum) are all kept, as in Q2.  The "
    "unit cost compares exactly: both engines evaluate the identical "
    "IEEE division on identical operands, and min() is "
    "order-independent.  Output cost is floor fixed-point (1e-4 units): "
    "round(double, 4) disagrees across engines exactly at a rounding "
    "boundary (witnessed at sf0.01), floor never does.",
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    uc = li.select(
        "l_partkey",
        "l_suppkey",
        (
            F.col("l_extendedprice") / F.greatest(F.col("l_quantity"), F.lit(1.0))
        ).alias("cost"),
    )
    w = W.partitionBy("l_partkey")
    return (
        uc.withColumn("mincost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("mincost"))
        .select(
            "l_partkey",
            "l_suppkey",
            F.floor(F.col("cost") * 10000).cast("long").alias("unit_cost_fp"),
        )
        .distinct()
    )


# --- TPC-H Q4 shape: EXISTS semi-join --------------------------------------

LATE_SHIP_DAYS = 60


@register(
    "order_priority_exists_count",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order priority checking): EXISTS decorrelates "
    "to a LEFT SEMI join — each qualifying order is emitted once no "
    "matter how many late lineitems witness it, with no dedup pass.  "
    "The date range prunes the probe side before the join (predicate "
    "pushed to the orders scan), the semi join shuffles on the order "
    "key, and the per-priority count is a partial+final agg on a "
    "5-value key.  'Late' is shipdate > orderdate + 60 days (this "
    "schema carries no commit/receipt dates).",
)
def order_priority_exists_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    filtered = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    witnessed = filtered.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_SHIP_DAYS} DAYS")
        ),
        "left_semi",
    )
    return witnessed.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# --- TPC-H Q21 shape: the unique straggler ---------------------------------


@register(
    "straggler_supplier_per_order",
    bench=True,
    oracle="""
    , ls AS (
        SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_last
        FROM lineitem GROUP BY l_orderkey, l_suppkey
    ),
    r AS (
        SELECT l_orderkey, l_suppkey, supp_last,
               max(supp_last) OVER (PARTITION BY l_orderkey) AS order_last,
               count(*) OVER (PARTITION BY l_orderkey) AS n_supp
        FROM ls
    ),
    r2 AS (
        SELECT *,
               sum(CASE WHEN supp_last = order_last THEN 1 ELSE 0 END)
                   OVER (PARTITION BY l_orderkey) AS n_at_max
        FROM r
    )
    SELECT l_orderkey, l_suppkey, order_last AS last_ship,
           CAST(n_supp AS BIGINT) AS n_suppliers
    FROM r2
    WHERE n_supp >= 2 AND n_at_max = 1 AND supp_last = order_last
    """,
    doc="TPC-H Q21 shape (the supplier who kept the order waiting): in "
    "multi-supplier orders, the UNIQUE supplier whose last shipment is "
    "strictly after every other supplier's — Q21's "
    "EXISTS(other supplier)/NOT EXISTS(other late supplier) pair.  "
    "Spark re-expresses both correlated quantifiers as windows over the "
    "pre-aggregated (order, supplier) relation: the groupBy and both "
    "window layers share one l_orderkey shuffle (two Window nodes, same "
    "partitioning → single exchange), versus the literal form's two "
    "extra self-joins of the fact table.  Uniqueness of the max "
    "(n_at_max = 1) is exactly NOT EXISTS(another supplier shipping as "
    "late).",
)
def straggler_supplier_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ls = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_last")
    )
    w = W.partitionBy("l_orderkey")
    r = ls.select(
        "l_orderkey",
        "l_suppkey",
        "supp_last",
        F.max("supp_last").over(w).alias("order_last"),
        F.count(F.lit(1)).over(w).alias("n_supp"),
    )
    r2 = r.withColumn(
        "n_at_max",
        F.sum(
            F.when(F.col("supp_last") == F.col("order_last"), 1).otherwise(0)
        ).over(w),
    )
    return (
        r2.filter(
            (F.col("n_supp") >= 2)
            & (F.col("n_at_max") == 1)
            & (F.col("supp_last") == F.col("order_last"))
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.col("order_last").alias("last_ship"),
            F.col("n_supp").cast("long").alias("n_suppliers"),
        )
    )


# --- partition-key skew diagnostics ----------------------------------------


@register(
    "topic_key_skew_stats",
    oracle="""
    , c AS (SELECT topic, count(*) AS n FROM messages GROUP BY topic)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n) AS BIGINT) AS total_msgs,
           CAST(max(n) AS BIGINT) AS max_per_key,
           round(quantile_cont(n, 0.5), 4) AS p50,
           round(quantile_cont(n, 0.99), 4) AS p99,
           CAST((1000000 * max(n) * count(*)) // sum(n) AS BIGINT)
               AS skew_ppm
    FROM c
    """,
    doc="Shuffle-key skew diagnostics for the stream's partition key "
    "(topic): key count, per-key max, interpolated p50/p99 of the "
    "per-key distribution, and the max/mean ratio in exact integer ppm "
    "(1 000 000 = perfectly uniform) — the number that decides whether "
    "a topic-keyed shuffle needs salting (operators/skew.py) or AQE "
    "skew-join splitting before it becomes the straggler task at "
    "100 TB.  Two aggregates: a topic-keyed partial+final count, then a "
    "single-row reduction over the (small) key-count relation.",
)
def topic_key_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    msg = messages(spark, sf_dir)
    c = msg.groupBy("topic").agg(F.count(F.lit(1)).alias("n"))
    return c.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("total_msgs"),
        F.max("n").cast("long").alias("max_per_key"),
        F.round(F.expr("percentile(n, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(n, 0.99)"), 4).alias("p99"),
        F.expr(
            "CAST((1000000 * max(n) * count(*)) div sum(n) AS BIGINT)"
        ).alias("skew_ppm"),
    )


# --- TPC-H Q19 shape: disjunctive predicate pushdown -----------------------


@register(
    "disjunctive_filter_revenue",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                          AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_type = 'PROMO'    AND l_quantity BETWEEN 1  AND 15)
       OR (p_type = 'ECONOMY'  AND l_quantity BETWEEN 10 AND 25)
       OR (p_type = 'STANDARD' AND l_quantity BETWEEN 20 AND 35)
    """,
    doc="TPC-H Q19 shape (disjunctive join predicates): an OR of "
    "(dimension-attribute AND fact-range) conjuncts.  Catalyst factors "
    "the common structure: the fact-side ranges union into one pushable "
    "scan filter (l_quantity BETWEEN 1 AND 35 reaches the parquet "
    "reader as min/max pushdown), the dimension side prunes to three "
    "p_type values before broadcasting, and the residual OR evaluates "
    "post-join — the pattern where a naive engine falls back to a "
    "cartesian filter.  Revenue in exact integer cents.",
    bench=True,
)
def disjunctive_filter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(part, li["l_partkey"] == F.col("p_partkey"))
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_type") == "PROMO") & q.between(1, 15))
        | ((F.col("p_type") == "ECONOMY") & q.between(10, 25))
        | ((F.col("p_type") == "STANDARD") & q.between(20, 35))
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return j.filter(cond).agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        F.sum(cents).alias("revenue_cents"),
    )


# --- TPC-H Q22 shape: anti join + global-scalar filter ---------------------


@register(
    "idle_big_customers",
    oracle="""
    , spend AS (
        SELECT o_custkey,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents,
               max(o_orderdate) AS last_order
        FROM orders GROUP BY o_custkey
    ),
    avg_cents AS (
        SELECT CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS a
        FROM spend
    )
    SELECT c_custkey, c_name,
           CAST(cents AS BIGINT) AS spend_cents, last_order
    FROM spend
    JOIN customer ON c_custkey = o_custkey
    CROSS JOIN avg_cents
    WHERE CAST(cents AS DOUBLE) > a
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
      )
    """,
    doc="TPC-H Q22 shape (valuable-but-idle customers): above-average "
    "lifetime spend (scalar subquery → single-row broadcast of an exact "
    "integer-cents average) AND no order in the recent window (NOT "
    "EXISTS → LEFT ANTI join with the date filter pushed to the probe "
    "scan).  Both correlated constructs decorrelate to joins, the spend "
    "aggregate is reused for the threshold and the output, and the only "
    "wide shuffle is the per-customer rollup.",
)
def idle_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(cents).alias("cents"), F.max("o_orderdate").alias("last_order")
    )
    avg_cents = spend.agg(
        (
            F.sum("cents").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("a")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        spend.crossJoin(F.broadcast(avg_cents))
        .filter(F.col("cents").cast("double") > F.col("a"))
        .join(recent, "o_custkey", "left_anti")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .selectExpr(
            "c_custkey",
            "c_name",
            "cents AS spend_cents",
            "last_order",
        )
    )


# --- TPC-H Q13 shape: count-of-counts distribution -------------------------


@register(
    "customer_order_distribution",
    oracle="""
    , per_cust AS (
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    )
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           count(*) AS n_customers
    FROM per_cust GROUP BY n_orders
    """,
    doc="TPC-H Q13 shape (customer distribution): the count-of-counts "
    "double aggregation — orders per customer INCLUDING zero-order "
    "customers (LEFT join, count(key) skips the null-extended rows), "
    "then customers per order-count.  First aggregate shuffles on the "
    "customer key; the second one's input is already tiny (distinct "
    "order counts).  The zero bucket is exactly what an inner join "
    "would silently lose.",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy(
        F.col("n_orders").cast("long").alias("n_orders")
    ).agg(F.count(F.lit(1)).alias("n_customers"))


# --- TPC-H Q17 shape: correlated-average filter ----------------------------


@register(
    "small_quantity_revenue",
    oracle="""
    , stats AS (
        SELECT l_partkey,
               sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS qty_cents,
               count(*) AS n
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                 AS BIGINT) AS revenue_cents
    FROM lineitem JOIN stats USING (l_partkey)
    WHERE CAST(round(l_quantity * 100, 0) AS BIGINT) * n * 5
          < qty_cents
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): rows below 20% "
    "of their part's average quantity.  The correlated scalar average "
    "decorrelates to a per-part aggregate joined back on the part key — "
    "in Spark the aggregate and the filter share one shuffle (AQE "
    "reuses the exchange, the part_value_share pattern).  The 20% "
    "threshold comparison is exact integers, cross-multiplied to avoid "
    "division entirely: qty·n·5 < Σqty (both sides in centiquantities), "
    "so no float enters the predicate or the compared surface except "
    "the final cents→currency render.",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty_cents = F.round(F.col("l_quantity") * 100, 0).cast("long")
    stats = li.groupBy("l_partkey").agg(
        F.sum(qty_cents).alias("qty_cents"), F.count(F.lit(1)).alias("n")
    )
    price_cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return (
        li.join(stats, "l_partkey")
        .filter(qty_cents * F.col("n") * 5 < F.col("qty_cents"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum(price_cents).alias("revenue_cents"),
        )
    )


# --- TPC-H Q15 shape: max over an aggregate view ---------------------------


@register(
    "top_supplier_by_revenue",
    oracle="""
    , rev AS (
        SELECT l_suppkey,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                        AS BIGINT)) AS cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
        GROUP BY l_suppkey
    ),
    m AS (SELECT max(cents) AS mc FROM rev)
    SELECT s_suppkey, s_name, CAST(cents AS BIGINT) AS revenue_cents
    FROM rev
    JOIN supplier ON s_suppkey = l_suppkey
    CROSS JOIN m
    WHERE cents = mc
    """,
    doc="TPC-H Q15 shape (top supplier): the maximum over an aggregate "
    "view, keeping ties — `revenue = (SELECT max(revenue) FROM view)`.  "
    "The view aggregates once (date range pushed to the scan), its "
    "single-row max broadcasts back, and the supplier dimension "
    "broadcasts for the name — the fact table is scanned and shuffled "
    "exactly once, with AQE reusing the aggregate exchange between the "
    "view and its max (same runtime pattern as part_value_share).  "
    "Exact integer cents make 'equal to the max' unambiguous; a float "
    "revenue would make tie detection engine-dependent.",
)
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(cents).alias("cents"))
    )
    m = rev.agg(F.max("cents").alias("mc"))
    return (
        rev.crossJoin(F.broadcast(m))
        .filter(F.col("cents") == F.col("mc"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .selectExpr(
            "s_suppkey", "s_name", "cents AS revenue_cents"
        )
    )


# --- TPC-H Q8 shape: market share over a multi-dimension star join ---------


@register(
    "market_share_by_nation",
    oracle="""
    , scoped AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                    AS BIGINT) AS cents,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = cn.n_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END)
               AS BIGINT) AS nation_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END)
                * 10000 // sum(cents) AS BIGINT) AS share_bp
    FROM scoped GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): the widest star join in "
    "the inventory — fact lineitem ⋈ orders (the one big-big shuffle "
    "join, on the order key) with FIVE broadcast dimensions hanging off "
    "it (part, supplier, customer, nation×2 self-aliased, region).  "
    "Catalyst prunes part/region before broadcasting, so only "
    "promo-part lineitems from Asian customers survive into the "
    "aggregate.  Share = NATION_3's revenue fraction per order-year, in "
    "exact basis points: integer cents cross-divided (a*10000 DIV b) so "
    "no float enters the compared surface; both engines truncate the "
    "nonnegative quotient identically.  At 100 TB the lineitem⋈orders "
    "join is the cost center: co-partition (bucket) both on the order "
    "key to make it shuffle-free.  Ref context: the reference has no "
    "joins beyond A11 (SURVEY §2 C); this is extension surface.",
    bench=True,
)
def market_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    asia_cust = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    nation["n_regionkey"] == region["r_regionkey"],
                ).select("n_nationkey")
            ),
            cust["c_nationkey"] == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supp["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    nation_cents = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", cents).otherwise(F.lit(0))
    )
    scoped = (
        li.join(part, li["l_partkey"] == F.col("p_partkey"))
        .join(supp_nation, li["l_suppkey"] == F.col("s_suppkey"))
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(asia_cust, orders["o_custkey"] == F.col("c_custkey"))
    )
    return (
        scoped.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            nation_cents.alias("nation_cents"),
            F.sum(cents).alias("total_cents"),
        )
        .withColumn(
            "share_bp", F.expr("nation_cents * 10000 DIV total_cents")
        )
    )


# --- TPC-H Q9 shape: profit by supplier nation and year --------------------


@register(
    "profit_by_nation_year",
    oracle="""
    SELECT n_name AS supp_nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                    AS BIGINT) * 1000
               - CAST(round(p_retailprice * 100, 0) AS BIGINT)
                 * CAST(round(l_quantity * 100, 0) AS BIGINT) * 2)
               :: BIGINT AS profit_e5
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE 'small %'
    GROUP BY n_name, year(o_orderdate)
    """,
    doc="TPC-H Q9 shape (product-line profit by nation and year), adapted "
    "to the fixture star schema: there is no partsupp table, so supply "
    "cost is modeled as 20% of p_retailprice per unit (documented "
    "adaptation, not a fidelity bug).  Shape preserved: a LIKE-filtered "
    "part dimension prunes the fact before the big lineitem⋈orders "
    "shuffle join; supplier→nation broadcast chain provides the group "
    "key.  Profit is summed in exact 1e-5 currency units "
    "(cents·1000 − retail_cents·qty_centi·2, all BIGINT) because "
    "rev−cost can be negative and tiny: a rounded float surface would "
    "hit both the ±0.0 and the summation-order boundary failure modes "
    "(CLAUDE.md invariants); exact integers cannot.",
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small %"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    supp_nation = supp.join(
        F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"]
    ).select("s_suppkey", "n_name")
    rev_e5 = (
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
        ).cast("long")
        * 1000
    )
    cost_e5 = (
        F.round(F.col("p_retailprice") * 100, 0).cast("long")
        * F.round(F.col("l_quantity") * 100, 0).cast("long")
        * 2
    )
    return (
        li.join(part, li["l_partkey"] == F.col("p_partkey"))
        .join(supp_nation, li["l_suppkey"] == F.col("s_suppkey"))
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(rev_e5 - cost_e5).alias("profit_e5"))
    )


# --- TPC-H Q10 shape: returned-item top customers --------------------------


@register(
    "returned_items_topk",
    oracle="""
    , rev AS (
        SELECT o_custkey,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                        AS BIGINT)) AS cents
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, n_name,
           CAST(cents AS BIGINT) AS revenue_cents
    FROM rev
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    ORDER BY cents DESC, c_custkey LIMIT 20
    """,
    doc="TPC-H Q10 shape (top returned-item customers): date-filtered "
    "orders ⋈ return-flagged lineitems (both filters pushed to their "
    "scans), per-customer revenue rollup, global top-20, then customer "
    "and nation names joined ON THE 20 SURVIVORS ONLY — joining "
    "dimensions after the limit keeps the broadcast probe side 20 rows "
    "instead of the whole customer rollup.  Spark plans the top-20 as "
    "TakeOrderedAndProject (per-partition heaps + driver merge of 20-row "
    "finalists — no global sort, the test_scale_patterns contract).  "
    "Exact integer cents rank with c_custkey as total-order tie-break.",
)
def returned_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    top = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum(cents).alias("cents"))
        .orderBy(F.desc("cents"), F.asc("o_custkey"))
        .limit(20)
    )
    return (
        top.join(cust, top["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .selectExpr(
            "c_custkey", "c_name", "n_name",
            "cents AS revenue_cents",
        )
    )


# --- TPC-H Q12 shape: priority mix by line status ---------------------------


@register(
    "priority_mix_by_status",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape (shipping-mode priority mix), adapted: the "
    "fixture lineitem has no l_shipmode column, so l_linestatus stands "
    "in as the 2-value grouping attribute (documented adaptation).  "
    "Shape preserved: big-big lineitem⋈orders equi-join where only a "
    "date-sliced fraction of the fact survives (the range predicate "
    "reaches the parquet scan as min/max pushdown, so whole row-groups "
    "skip), then conditional CASE counting — the pivot-in-aggregate "
    "pattern.  All-integer output: no float parity surface at all.",
)
def priority_mix_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- TPC-H Q20 shape: nested semi-join supplier qualification ---------------


@register(
    "excess_share_suppliers",
    oracle="""
    , shipped AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS qty_centi
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'red %')
        GROUP BY l_partkey, l_suppkey
    ),
    qualified AS (
        SELECT l_suppkey, count(*) AS n_dominant_parts
        FROM (
            SELECT l_suppkey,
                   qty_centi * 5 > sum(qty_centi) OVER (PARTITION BY l_partkey)
                       AS dominant
            FROM shipped
        )
        WHERE dominant GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, n_dominant_parts
    FROM qualified JOIN supplier ON s_suppkey = l_suppkey
    """,
    doc="TPC-H Q20 shape (suppliers with an outsized share of a part "
    "family), adapted: the fixture schema has no partsupp/availqty, so "
    "the qualification is 'shipped more than 20% of the part's 1997 "
    "volume' over the lineitem fact itself (documented adaptation).  "
    "Shape preserved: a name-LIKE-filtered part dimension drives a "
    "semi-join that prunes the fact scan (broadcast IN-filter), one "
    "(part,supplier) rollup shuffle, then the per-part total via a "
    "window OVER the same partition key — no second shuffle, the rollup "
    "is already hash-partitioned by l_partkey prefix... (Catalyst "
    "reuses the exchange because the window partition key is a prefix "
    "of the groupBy key only when keys align; here the window runs on "
    "the rollup output, tiny relative to the fact).  The 20% threshold "
    "is cross-multiplied exact integers (qty·5 > Σqty in "
    "centiquantities) — no division, no float.",
)
def excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red %"))
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    qty_centi = F.round(F.col("l_quantity") * 100, 0).cast("long")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(part, li["l_partkey"] == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(qty_centi).alias("qty_centi"))
    )
    part_total = F.sum("qty_centi").over(W.partitionBy("l_partkey"))
    qualified = (
        shipped.withColumn("dominant", F.col("qty_centi") * 5 > part_total)
        .filter(F.col("dominant"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_dominant_parts"))
    )
    return qualified.join(
        (supp), qualified["l_suppkey"] == supp["s_suppkey"]
    ).select("s_suppkey", "s_name", "n_dominant_parts")


# --- last-touch attribution -------------------------------------------------


@register(
    "last_touch_attribution",
    oracle="""
    , tagged AS (
        SELECT user_id, ts, event_id, event_type, value,
               last_value(CASE WHEN event_type IN ('view','click','signup')
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS lt_channel,
               last_value(CASE WHEN event_type IN ('view','click','signup')
                               THEN epoch_us(ts) END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS lt_us
        FROM events
    )
    SELECT CASE WHEN lt_us IS NOT NULL
                 AND epoch_us(ts) - lt_us <= 604800000000
                THEN lt_channel ELSE 'direct' END AS channel,
           count(*) AS n_purchases,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS attributed_cents
    FROM tagged WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    doc="Last-touch marketing attribution: each purchase is credited to "
    "the user's most recent prior touch (view/click/signup) within a "
    "7-day lookback, else to 'direct'.  The as-of lookup is the window "
    "encoding (last_value IGNORE NULLS over ROWS UNBOUNDED PRECEDING "
    "TO 1 PRECEDING) — one shuffle by user_id serves both the channel "
    "and its timestamp, no self-join, and the second aggregation input "
    "is already tiny (4 channels).  The lookback compares exact "
    "epoch-microsecond integers; attributed revenue sums exact cents "
    "(FLOAT-SUM-ORDER invariant).  Strictly-prior frame + (ts, "
    "event_id) total order make same-timestamp touch/purchase pairs "
    "deterministic on both engines.",
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("view", "click", "signup")
    tagged = ev.select(
        "event_type",
        "value",
        F.unix_micros("ts").alias("ts_us"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("lt_channel"),
        F.last(F.when(is_touch, F.unix_micros("ts")), ignorenulls=True)
        .over(w)
        .alias("lt_us"),
    )
    channel = F.when(
        F.col("lt_us").isNotNull()
        & (F.col("ts_us") - F.col("lt_us") <= 604800000000),
        F.col("lt_channel"),
    ).otherwise(F.lit("direct"))
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .groupBy(channel.alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(cents).alias("attributed_cents"),
        )
    )


# --- Bloom-filter runtime pruning -------------------------------------------


@register(
    "bloom_pruned_revenue",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                          AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_orderpriority = '1-URGENT')
    GROUP BY l_returnflag
    """,
    doc="Runtime Bloom pruning (operators/bloom.py): urgent-order keys "
    "compress into an 8 KB deterministic bitmap that broadcasts and "
    "filters lineitem MAP-SIDE before the real semi join — the "
    "runtime-filter pattern (Spark's bloomFilter rewrite) built "
    "explicitly.  The bitmap admits false positives, so the exact semi "
    "join still runs, but its shuffle input is already pruned to "
    "~selectivity of the dimension predicate; false negatives are "
    "impossible, so the result is bit-identical to the plain semi join "
    "— which is exactly what the DuckDB oracle computes.  At 100 TB: "
    "8 KB broadcast versus shuffling the full fact table into the "
    "join.",
)
def bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2sql_spark.operators.bloom import bloom_prune, build_bloom

    li = load_table(spark, sf_dir, "lineitem")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    bloom = build_bloom(urgent, "o_orderkey")
    candidates = bloom_prune(li, bloom, "l_orderkey")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        candidates.join(
            urgent, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum(cents).alias("revenue_cents"),
        )
    )


# --- closed-form regression as aggregation ----------------------------------


@register(
    "event_value_trend",
    oracle="""
    , obs AS (
        SELECT event_type,
               (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
                   // 60000000 AS x_min,
               CAST(round(value * 100, 0) AS BIGINT) AS y_cents
        FROM events
    ),
    s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x_min) AS BIGINT) AS sx,
               CAST(sum(y_cents) AS BIGINT) AS sy,
               CAST(sum(x_min * y_cents) AS BIGINT) AS sxy,
               CAST(sum(x_min * x_min) AS BIGINT) AS sxx
        FROM obs GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(floor(CAST(CAST(n AS HUGEINT) * sxy
                           - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                      / CAST(CAST(n AS HUGEINT) * sxx
                             - CAST(sx AS HUGEINT) * sx AS DOUBLE) * 10000)
                AS BIGINT) AS slope_e4
    FROM s
    """,
    doc="Per-group least-squares trend as a PURE AGGREGATION: the "
    "closed-form OLS slope (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) needs only "
    "five sums, so Catalyst partial-aggregates them map-side and the "
    "shuffle carries five numbers per group — the distributed way to "
    "fit millions of per-key models (per-topic drift, per-sensor "
    "degradation) with no ML library, no iteration, and no Python.  "
    "Sums are exact BIGINTs (fit through ~1e9 rows/group); the final "
    "cross-multiplications run in 128-bit (DECIMAL(38,0)/HUGEINT — the "
    "r07 100x sweep caught the former BIGINT form overflowing at 10M "
    "events), and the rendered slope is a floor of one shared double "
    "division of the exact wide integers (engine-identical inputs → "
    "identical result).  Slope unit: 1e-4 cents/minute.",
)
def event_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        "event_type",
        F.expr(
            "(unix_micros(ts) - unix_micros(TIMESTAMP '2024-01-01 00:00:00'))"
            " DIV 60000000"
        ).alias("x_min"),
        F.round(F.col("value") * 100, 0).cast("long").alias("y_cents"),
    )
    s = obs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x_min").cast("long").alias("sx"),
        F.sum("y_cents").cast("long").alias("sy"),
        F.sum(F.col("x_min") * F.col("y_cents")).cast("long").alias("sxy"),
        F.sum(F.col("x_min") * F.col("x_min")).cast("long").alias("sxx"),
    )
    d38 = "decimal(38,0)"
    num = (
        F.col("n").cast(d38) * F.col("sxy")
        - F.col("sx").cast(d38) * F.col("sy")
    )
    den = (
        F.col("n").cast(d38) * F.col("sxx")
        - F.col("sx").cast(d38) * F.col("sx")
    )
    return s.select(
        "event_type",
        "n",
        F.floor(num.cast("double") / den.cast("double") * 10000)
        .cast("long")
        .alias("slope_e4"),
    )


# --- data-quality rule engine ----------------------------------------------


@register(
    "dq_rule_violations",
    oracle="""
    , li AS (
        SELECT l.*, o.o_orderdate
        FROM lineitem l JOIN orders o ON o_orderkey = l_orderkey
    )
    SELECT 'qty_nonpositive' AS rule,
           CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations, CAST(count(*) AS BIGINT) AS n_checked
    FROM li
    UNION ALL
    SELECT 'discount_out_of_range',
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM li
    UNION ALL
    SELECT 'ship_before_order',
           CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM li
    UNION ALL
    SELECT 'price_mismatch',
           CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM li
    """,
    doc="Data-quality rule engine — the validation pass a pipeline runs "
    "before accepting a 100 TB drop: each rule is a conditional count "
    "evaluated in ONE scan of the joined fact (Spark computes all four "
    "sums in a single aggregate over the lineitem⋈orders join and "
    "unpivots to the rule/violations layout; the UNION ALL in the "
    "oracle is DuckDB re-reading a CTE, same semantics).  Adding a "
    "rule = adding a column expression, not a pass.  All-integer "
    "output; cross-table consistency (ship-before-order) rides the "
    "same join the revenue queries use.",
)
def dq_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    j = li.join(orders, li["l_orderkey"] == F.col("o_orderkey"))

    def viol(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    agg = j.agg(
        viol(F.col("l_quantity") <= 0).alias("qty_nonpositive"),
        viol(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)
        ).alias("discount_out_of_range"),
        viol(F.col("l_shipdate") < F.col("o_orderdate")).alias(
            "ship_before_order"
        ),
        viol(F.col("l_extendedprice") <= 0).alias("price_mismatch"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
    )
    return agg.selectExpr(
        "stack(4, "
        "'qty_nonpositive', qty_nonpositive, "
        "'discount_out_of_range', discount_out_of_range, "
        "'ship_before_order', ship_before_order, "
        "'price_mismatch', price_mismatch"
        ") AS (rule, n_violations)",
        "n_checked",
    )


# --- vectorized UDAF (pandas grouped-agg): trimmed mean ---------------------


@register(
    "trimmed_mean_price",
    oracle="""
    , ranked AS (
        SELECT o_orderpriority,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
               row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY CAST(round(o_totalprice * 100, 0) AS BIGINT),
                            o_orderkey) AS rn,
               count(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(cents) // count(*) AS BIGINT) AS trimmed_mean_cents
    FROM ranked
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY o_orderpriority
    """,
    doc="10%-trimmed mean via a VECTORIZED PYTHON UDAF (pandas_udf "
    "GROUPED_AGG): each group's order values arrive as one Arrow batch, "
    "numpy sorts by (cents, orderkey) total order, and the robust mean "
    "excludes n//10 rows per tail — the outlier-resistant location "
    "estimate plain AVG can't give and Catalyst has no builtin for.  "
    "Arithmetic is exact-integer end-to-end (cents in, integer "
    "division out) so pandas and DuckDB agree bit-for-bit despite "
    "different summation orders.  This completes the UDx surface "
    "demonstration: scalar pandas_udf (LSH einsum), UDAF here, UDTF "
    "(topic_ancestors_udtf) — all Arrow-vectorized, the reference has "
    "none (SURVEY §2 C).  Note the distributed caveat honestly: a "
    "grouped-agg UDAF materializes each group on one executor, fine "
    "for bounded groups (5 priorities), wrong for unbounded keys — "
    "exact trimming at that scale needs the window form the oracle "
    "uses.",
)
def trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2sql_spark.functions.udafs import (
        trimmed_count,
        trimmed_mean_cents,
    )

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    base = o.select(
        "o_orderpriority", cents.alias("cents"), "o_orderkey"
    )
    return base.groupBy("o_orderpriority").agg(
        trimmed_count(F.col("cents")).alias("n_kept"),
        trimmed_mean_cents(F.col("cents"), F.col("o_orderkey")).alias(
            "trimmed_mean_cents"
        ),
    )


# --- Python UDTF surface ----------------------------------------------------


@register(
    "topic_ancestors_udtf",
    oracle="""
    , topics AS (SELECT DISTINCT topic FROM messages),
    levels AS (
        SELECT topic,
               CAST(unnest(generate_series(1, len(string_split(topic, '/'))))
                    AS INTEGER) AS depth
        FROM topics
    )
    SELECT array_to_string(string_split(topic, '/')[1:depth], '/')
               AS ancestor,
           CAST(count(DISTINCT topic) AS BIGINT) AS n_topics
    FROM levels GROUP BY 1
    """,
    doc="Python UDTF demonstration (Spark 4 `udtf` API, the table-"
    "function leg of the UDx triad alongside the scalar pandas_udf in "
    "the LSH einsum and the GROUPED_AGG UDAF in trimmed_mean_price): "
    "each DISTINCT topic lateral-joins to its ancestor chain via a "
    "generator class, then distinct-topic counts roll up per subtree "
    "node — how many concrete topics a '#' subscription at each node "
    "covers.  Input is the distinct-topic dimension (small), so the "
    "row-based Python generator touches |topics| rows, not |messages| "
    "— the honest way to use a slow-path UDTF; the message-volume "
    "rollup keeps its pure-expression form (topic_hierarchy_rollup).",
    tags=("slow-path-demo",),
)
def topic_ancestors_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2sql_spark.functions.udtfs import TopicAncestors

    spark.udtf.register("topic_ancestors", TopicAncestors)
    messages(spark, sf_dir).select("topic").distinct().createOrReplaceTempView(
        "_udtf_topics"
    )
    return spark.sql(
        """
        SELECT a.ancestor,
               CAST(count(DISTINCT t.topic) AS BIGINT) AS n_topics
        FROM _udtf_topics t,
        LATERAL topic_ancestors(t.topic) a
        GROUP BY a.ancestor
        """
    )


# --- join cardinality estimation by correlated key sampling -----------------

_JCE_MOD = 64  # keep keys with md5-derived value % 64 == 0 (~1.6% of keys)


@register(
    "join_cardinality_estimate",
    oracle=f"""
    , sl AS (
        SELECT l_orderkey AS k FROM lineitem
        WHERE ((instr('0123456789abcdef',
                      substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 1)) - 1) * 16
               + (instr('0123456789abcdef',
                        substr(md5(CAST(l_orderkey AS VARCHAR)), 2, 1)) - 1))
              % {_JCE_MOD} = 0
    ),
    so AS (
        SELECT o_orderkey AS k FROM orders
        WHERE ((instr('0123456789abcdef',
                      substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1) * 16
               + (instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) - 1))
              % {_JCE_MOD} = 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sample_pairs,
           CAST(count(*) * {_JCE_MOD} AS BIGINT) AS est_join_rows,
           (SELECT CAST(count(*) AS BIGINT)
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey)
               AS true_join_rows
    FROM sl JOIN so USING (k)
    """,
    doc="Join-size estimation by CORRELATED key sampling — the "
    "optimizer-statistics question ('how big is lineitem⋈orders?') "
    "answered without running the full join: both sides keep only keys "
    "whose md5-derived byte ≡ 0 (mod 64), the SAME ~1.6% key universe "
    "on each side, so every surviving key contributes its full "
    "fan-out product and count·64 is an unbiased estimate of the join "
    "cardinality (independent per-side sampling would square the rate "
    "and miss the key correlation entirely — the classic estimator "
    "bug).  Deterministic: the sample is a hash predicate, not RNG.  "
    "The true count is joined alongside for error observability "
    "(fixture-affordable; at 100 TB you'd ship only the estimate).",
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )

    def keep(df):
        byte0 = (
            F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 2), 16, 10)
            .cast("long")
        )
        return df.filter(byte0 % _JCE_MOD == 0)

    pairs = keep(li).join(keep(orders), "k")
    true_rows = li.join(orders, "k").agg(
        F.count(F.lit(1)).cast("long").alias("true_join_rows")
    )
    return (
        pairs.agg(F.count(F.lit(1)).cast("long").alias("n_sample_pairs"))
        .withColumn(
            "est_join_rows", (F.col("n_sample_pairs") * _JCE_MOD).cast("long")
        )
        .crossJoin(F.broadcast(true_rows))
    )


# --- event-sequence transition matrix ---------------------------------------


@register(
    "event_transition_matrix",
    oracle="""
    , seq AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    counts AS (
        SELECT from_type, to_type, count(*) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    ),
    outdeg AS (
        SELECT from_type, CAST(sum(n) AS BIGINT) AS total
        FROM counts GROUP BY from_type
    )
    SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
           CAST(c.n * 1000000 // o.total AS BIGINT) AS p_ppm
    FROM counts c JOIN outdeg o ON o.from_type = c.from_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences — the behavioral model behind next-action prediction "
    "and anomalous-session scoring: lead() pairs each event with its "
    "successor inside one user_id-keyed window shuffle, transition "
    "counts hash-aggregate (25 cells for 5 event types), and row "
    "probabilities render as exact parts-per-million (n·1e6 DIV "
    "row-total) so no float enters the compared surface.  The "
    "out-degree rollup reuses the already-tiny counts relation — the "
    "fact table is scanned and shuffled exactly once.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    outdeg = counts.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("total")
    )
    return (
        counts.join(F.broadcast(outdeg), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n"),
            F.expr("n * 1000000 DIV total").alias("p_ppm"),
        )
    )


# --- conversion latency percentiles -----------------------------------------


@register(
    "conversion_latency_percentiles",
    oracle="""
    , firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'click'
                        THEN epoch_us(ts) END) AS first_click_us,
               min(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS first_purchase_us
        FROM events GROUP BY user_id
    ),
    conv AS (
        SELECT (first_purchase_us - first_click_us) // 1000000 AS lat_s
        FROM firsts
        WHERE first_click_us IS NOT NULL
          AND first_purchase_us IS NOT NULL
          AND first_purchase_us >= first_click_us
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(lat_s, 0.5), 4) AS p50_s,
           round(quantile_cont(lat_s, 0.9), 4) AS p90_s,
           round(quantile_cont(lat_s, 0.99), 4) AS p99_s,
           CAST(max(lat_s) AS BIGINT) AS max_s
    FROM conv
    """,
    doc="Conversion latency distribution — how long from a user's first "
    "click to their first purchase: conditional-min aggregation per "
    "user (one shuffle, both firsts from the same pass — no self-join "
    "of the event stream), then exact interpolated percentiles over "
    "the integer second latencies (Spark percentile == DuckDB "
    "quantile_cont, the orders_percentiles-proven parity).  The "
    "funnel_conversion query counts WHO converts; this measures HOW "
    "FAST, the pairing every growth dashboard shows.",
)
def conversion_latency_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "click", F.unix_micros("ts"))
        ).alias("first_click_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("first_purchase_us"),
    )
    conv = firsts.filter(
        F.col("first_click_us").isNotNull()
        & F.col("first_purchase_us").isNotNull()
        & (F.col("first_purchase_us") >= F.col("first_click_us"))
    ).select(
        F.expr(
            "(first_purchase_us - first_click_us) DIV 1000000"
        ).alias("lat_s")
    )
    return conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.expr("percentile(lat_s, 0.5)"), 4).alias("p50_s"),
        F.round(F.expr("percentile(lat_s, 0.9)"), 4).alias("p90_s"),
        F.round(F.expr("percentile(lat_s, 0.99)"), 4).alias("p99_s"),
        F.max("lat_s").cast("long").alias("max_s"),
    )


# --- CEP-style strict-sequence pattern detection ----------------------------


@register(
    "cep_triple_pattern",
    oracle="""
    , seq AS (
        SELECT user_id, ts, event_id, event_type,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2,
               lead(epoch_us(ts), 2) OVER w AS ts2_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    hits AS (
        SELECT user_id, event_id,
               (ts2_us - epoch_us(ts)) // 1000000 AS span_s
        FROM seq
        WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
          AND ts2_us - epoch_us(ts) <= 3600000000
    )
    SELECT CAST(count(*) AS BIGINT) AS n_matches,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(min(span_s) AS BIGINT) AS min_span_s,
           CAST(max(span_s) AS BIGINT) AS max_span_s
    FROM hits
    """,
    doc="Complex-event-processing pattern match — the MATCH_RECOGNIZE "
    "shape (view IMMEDIATELY FOLLOWED BY click IMMEDIATELY FOLLOWED BY "
    "purchase, all within one hour) compiled to lead() windows: two "
    "lookaheads materialize the candidate triple per anchor row inside "
    "ONE user-keyed window shuffle, the pattern predicate and the time "
    "bound filter locally, and only match counts aggregate.  Strict "
    "contiguity (no events between stages) is what lead(k) gives for "
    "free and what a join-based encoding gets wrong; relaxed "
    "('eventually follows') is the funnel_conversion twin.  All-"
    "integer output (epoch-us spans).",
)
def cep_triple_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead(F.unix_micros("ts"), 2).over(w).alias("ts2_us"),
    )
    hits = seq.filter(
        (F.col("event_type") == "view")
        & (F.col("t1") == "click")
        & (F.col("t2") == "purchase")
        & (F.col("ts2_us") - F.col("ts_us") <= 3600000000)
    ).select(
        "user_id",
        F.expr("(ts2_us - ts_us) DIV 1000000").alias("span_s"),
    )
    return hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.min("span_s").cast("long").alias("min_span_s"),
        F.max("span_s").cast("long").alias("max_span_s"),
    )


# --- session path mining ----------------------------------------------------


@register(
    "top_session_paths",
    oracle=f"""
    , flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL {_SESSION_GAP_MIN} MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    paths AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT path, n_sessions FROM (
        SELECT path, count(*) AS n_sessions,
               row_number() OVER (ORDER BY count(*) DESC, path) AS rk
        FROM paths GROUP BY path
    ) WHERE rk <= 10
    """,
    doc="Session path mining — the product-analytics 'what do users "
    "actually do' view: sessionize (30 min gap, the events_sessionize "
    "machinery), concatenate each session's ordered event types into a "
    "path string, rank the 10 most common paths.  The path rebuild is "
    "the order-preserving collect pattern (array_sort of (ts, "
    "event_id, type) structs — deterministic total order inside the "
    "aggregate, the DuckDB twin is string_agg ORDER BY), and the "
    "final top-10 is TakeOrderedAndProject over the path-count "
    "aggregate with a lexicographic tie-break.  Three shuffles, all "
    "keyed: (user), (user, session), (path).",
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap <= _SESSION_GAP_MIN * 60, F.lit(0)).otherwise(F.lit(1)),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("long"),
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(10)
    )


# --- week-over-week revenue change ------------------------------------------


@register(
    "weekly_revenue_wow",
    oracle="""
    , weekly AS (
        SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT week,
           CAST(cents AS BIGINT) AS revenue_cents,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(CASE WHEN lag(cents) OVER (ORDER BY week) IS NULL THEN NULL
                ELSE (cents - lag(cents) OVER (ORDER BY week)) * 10000
                     // lag(cents) OVER (ORDER BY week) END AS BIGINT)
               AS wow_change_bp
    FROM weekly
    """,
    doc="Week-over-week revenue change — the standard BI trend readout: "
    "exact-cents weekly rollup (one partial-agg shuffle on the week "
    "key), then a lag over the ~300-row weekly series computes the "
    "change in exact basis points (Δ·10000 DIV previous; both engines "
    "truncate integer division toward zero, verified for the negative "
    "case).  The unpartitioned window runs over the tiny aggregate, "
    "not the fact — the deliberate tiny-global-window pattern the plan "
    "audit whitelists.  First week's change is NULL, not zero.",
)
def weekly_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    weekly = o.groupBy(
        F.date_trunc("week", "o_orderdate").cast("date").alias("week")
    ).agg(
        F.sum(cents).alias("cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = W.orderBy("week")
    prev = F.lag("cents").over(w)
    return weekly.select(
        "week",
        F.col("cents").alias("revenue_cents"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.when(prev.isNull(), F.lit(None).cast("long"))
        .otherwise(F.expr(
            "(cents - lag(cents) OVER (ORDER BY week)) * 10000"
            " DIV lag(cents) OVER (ORDER BY week)"
        ))
        .alias("wow_change_bp"),
    )


# --- distribution drift between time windows --------------------------------

_DRIFT_BINS = 20
_DRIFT_BIN_W = 25  # value spans ~[0, 500): 20 bins x 25


@register(
    "value_drift_stats",
    oracle=f"""
    , halves AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN 0 ELSE 1 END AS half,
               least(CAST(floor(value / {_DRIFT_BIN_W}) AS BIGINT),
                     {_DRIFT_BINS - 1}) AS bin
        FROM events
    ),
    counts AS (
        SELECT event_type, bin,
               CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c1,
               CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c2
        FROM halves GROUP BY event_type, bin
    ),
    tot AS (
        SELECT event_type, CAST(sum(c1) AS BIGINT) AS t1,
               CAST(sum(c2) AS BIGINT) AS t2
        FROM counts GROUP BY event_type
    )
    SELECT c.event_type,
           CAST(sum(abs(c1 * 1000000 // t1 - c2 * 1000000 // t2))
                AS BIGINT) AS l1_drift_ppm,
           CAST(count(*) AS BIGINT) AS n_bins_hit
    FROM counts c JOIN tot USING (event_type)
    GROUP BY c.event_type
    """,
    doc="Distribution drift between the first and second half of the "
    "month — the ML-monitoring check (PSI-flavored, but L1 distance "
    "over fixed bins so no logarithm enters the compared surface): "
    "per event_type, bin the value into 20 fixed-width buckets, "
    "normalize each half's bin mass to exact truncated ppm, and sum "
    "absolute differences.  Drift of 0 = identical histograms; "
    "2,000,000 = disjoint support.  Bin counts for both halves come "
    "from ONE scan (conditional sums), the normalization totals from "
    "the already-tiny counts relation — at 100 TB this is one "
    "partial-agg shuffle on (type, bin), and the histograms are "
    "mergeable across days exactly like quantile_bins_estimate.",
)
def value_drift_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    half = F.when(
        F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), 0
    ).otherwise(1)
    bin_ = F.least(
        F.floor(F.col("value") / _DRIFT_BIN_W).cast("long"),
        F.lit(_DRIFT_BINS - 1),
    )
    counts = (
        ev.select("event_type", half.alias("half"), bin_.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
            .cast("long")
            .alias("c1"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
            .cast("long")
            .alias("c2"),
        )
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("c1").cast("long").alias("t1"),
        F.sum("c2").cast("long").alias("t2"),
    )
    return (
        counts.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.abs(
                    F.expr("c1 * 1000000 DIV t1")
                    - F.expr("c2 * 1000000 DIV t2")
                )
            )
            .cast("long")
            .alias("l1_drift_ppm"),
            F.count(F.lit(1)).cast("long").alias("n_bins_hit"),
        )
    )


# --- cumulative distinct users (growth-accounting curve) --------------------


@register(
    "cumulative_new_users",
    oracle="""
    , firsts AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events
        GROUP BY user_id
    ),
    daily AS (
        SELECT first_day AS day, count(*) AS n_new FROM firsts GROUP BY first_day
    )
    SELECT day,
           CAST(n_new AS BIGINT) AS n_new,
           CAST(sum(n_new) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_users
    FROM daily
    """,
    doc="Cumulative-distinct-users-by-day (the growth curve): running "
    "count distinct is not distributive, so rewrite as first-seen-day "
    "per user (one hash agg on user_id — full fact parallelism), a "
    "per-day count, and a running sum over the tiny per-day series.  "
    "The only window runs over ≤ one row per calendar day — a "
    "deliberately driver-scale series (documented single-partition "
    "window; at 100 TB the day count, not the row count, bounds it).  "
    "All-integer surface.",
)
def cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    daily = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        "day",
        F.col("n_new").cast("long").alias("n_new"),
        F.sum("n_new").over(w).cast("long").alias("cum_users"),
    )


# --- Benford first-digit audit (fraud/data-quality screen) ------------------

# floor(log10(1 + 1/d) * 10000) for d = 1..9, precomputed in Python so both
# engines compare against the identical integer literals (cross-engine log10
# differs by 1 ulp on some inputs — the LIBM lesson from plans/sketches.py).
_BENFORD_FP = (3010, 1760, 1249, 969, 791, 669, 579, 511, 457)
_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {fp}" for d, fp in enumerate(_BENFORD_FP, start=1)
) + " END"


@register(
    "benford_first_digit",
    oracle=f"""
    , d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders
    ),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit)
    SELECT digit, CAST(n AS BIGINT) AS n,
           CAST(n * 10000 // sum(n) OVER () AS BIGINT) AS freq_fp,
           CAST({_BENFORD_CASE} AS BIGINT) AS benford_fp
    FROM c
    """,
    doc="Benford's-law first-digit audit over order totals — the "
    "data-quality / fraud screen a finance pipeline runs on money "
    "columns.  The first digit comes from the decimal rendering of "
    "floor(x) as a BIGINT (never the double's repr — engines format "
    "doubles differently), the observed frequency is non-negative "
    "integer fixed-point, and the Benford expectation is a precomputed "
    "Python literal table embedded identically in both plans (log10 is "
    "transcendental — never evaluate it in-engine on the compared "
    "surface).  One hash agg to 9 rows; the OVER () total runs on "
    "those 9 rows only.",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    return c.select(
        "digit",
        F.col("n").cast("long").alias("n"),
        F.expr("CAST(n * 10000 DIV sum(n) OVER () AS BIGINT)").alias(
            "freq_fp"
        ),
        F.expr(f"CAST({_BENFORD_CASE} AS BIGINT)").alias("benford_fp"),
    )


# --- debounce / throttle (rate-limiting dedup) ------------------------------

THROTTLE_BUCKET_US = 300 * 1_000_000  # 5 minutes


@register(
    "throttle_events_5min",
    oracle=f"""
    SELECT user_id, event_type, event_id, ts,
           CAST(n_in_bucket AS BIGINT) AS n_in_bucket
    FROM (
        SELECT user_id, event_type, event_id, ts,
               row_number() OVER (
                   PARTITION BY user_id, event_type,
                                epoch_us(ts) // {THROTTLE_BUCKET_US}
                   ORDER BY ts, event_id) AS rn,
               count(*) OVER (
                   PARTITION BY user_id, event_type,
                                epoch_us(ts) // {THROTTLE_BUCKET_US})
                   AS n_in_bucket
        FROM events
    ) WHERE rn = 1
    """,
    doc="Throttle/debounce: keep the first event per (user, type, "
    "5-minute bucket) and report how many the bucket swallowed — the "
    "notification-rate-limit / alert-dedup primitive.  Tumbling-bucket "
    "formulation (first-in-bucket) rather than the sequential "
    "suppress-within-300s-of-last-kept semantics, because the bucket "
    "form is stateless-parallel on (user, type, bucket) — one shuffle, "
    "no cross-row recursion — and is what a streaming rate limiter "
    "implements per window anyway.  Total-order (ts, event_id) pick; "
    "all-integer bucket arithmetic on non-negative epochs.",
)
def throttle_events_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bkt = F.expr(f"unix_micros(ts) DIV {THROTTLE_BUCKET_US}")
    w = W.partitionBy("user_id", "event_type", bkt).orderBy("ts", "event_id")
    wc = W.partitionBy("user_id", "event_type", bkt)
    return (
        ev.select(
            "user_id",
            "event_type",
            "event_id",
            "ts",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).cast("long").alias("n_in_bucket"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --- per-user behavioral concentration (Gini impurity) ----------------------


@register(
    "user_event_gini",
    oracle="""
    , c AS (
        SELECT user_id, event_type, count(*) AS cnt FROM events
        GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(sum(cnt) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST((sum(cnt) * sum(cnt) - sum(cnt * cnt)) * 10000
                // (sum(cnt) * sum(cnt)) AS BIGINT) AS gini_fp
    FROM c GROUP BY user_id
    """,
    doc="Per-user behavioral diversity via Gini impurity "
    "1 − Σpᵢ² = (n² − Σcᵢ²)/n², kept in exact integer arithmetic "
    "(counts and squares of counts — no probabilities, no entropy: "
    "ln() is transcendental and cross-engine-unstable, Gini is "
    "rational).  gini_fp ∈ [0, 10000); 0 = single-minded user, high = "
    "uniform spread over event types.  Two mergeable hash aggregates "
    "keyed on (user, type) then user — full fact parallelism, no "
    "windows.  Non-negative integer division only.",
)
def user_event_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return c.groupBy("user_id").agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.expr(
            "CAST((sum(cnt) * sum(cnt) - sum(cnt * cnt)) * 10000 "
            "DIV (sum(cnt) * sum(cnt)) AS BIGINT)"
        ).alias("gini_fp"),
    )


# --- market-basket lift between event types ---------------------------------


@register(
    "event_type_lift",
    oracle="""
    , baskets AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
        FROM events
    ),
    totals AS (SELECT count(DISTINCT (user_id, day)) AS nb FROM baskets),
    singles AS (
        SELECT event_type, count(*) AS n FROM baskets GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_both
        FROM baskets a
        JOIN baskets b ON a.user_id = b.user_id AND a.day = b.day
                       AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b,
           CAST(n_both AS BIGINT) AS n_both,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           CAST(nb AS BIGINT) AS n_baskets,
           CAST(n_both * nb * 10000 // (sa.n * sb.n) AS BIGINT) AS lift_fp
    FROM pairs
    JOIN singles sa ON sa.event_type = type_a
    JOIN singles sb ON sb.event_type = type_b
    CROSS JOIN totals
    """,
    doc="Market-basket lift between event types over (user, day) baskets "
    "— co-occurrence mining: lift = P(a∧b)/(P(a)·P(b)) kept rational as "
    "n_both·N·10⁴ ÷ (n_a·n_b), exact integers end to end.  The basket "
    "distinct and the pair self-join both shuffle on (user, day) — "
    "per-basket fan-out is bounded by the event-type alphabet (k·(k−1)/2 "
    "pairs), never by event count, so a 100 TB firehose reduces to "
    "|types|² rows the moment the distinct lands.  Singles/totals are "
    "broadcast-size joins.",
)
def event_type_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # One fact scan: the deduplicated basket set feeds four branches
    # (totals, singles, both join sides); lazily localCheckpoint it so
    # the branches share one materialization instead of re-scanning the
    # fact table per branch (the operators/ids.py pattern) — baskets is
    # |users × days × types|, orders of magnitude below the fact.
    baskets = (
        ev.select(
            "user_id", F.col("ts").cast("date").alias("day"), "event_type"
        )
        .distinct()
        .transform(snapshot, eager=False)
    )
    totals = baskets.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("nb")
    )
    singles = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = baskets.select(
        "user_id", "day", F.col("event_type").alias("type_a")
    )
    b = baskets.select(
        "user_id", "day", F.col("event_type").alias("type_b")
    )
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "type_a",
            "type_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("nb").cast("long").alias("n_baskets"),
            F.expr(
                "CAST(n_both * nb * 10000 DIV (n_a * n_b) AS BIGINT)"
            ).alias("lift_fp"),
        )
    )


# --- session bounce rate by entry type --------------------------------------


@register(
    "session_bounce_rate",
    oracle=f"""
    , flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL {_SESSION_GAP_MIN} MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    per_session AS (
        SELECT user_id, session_id, count(*) AS n_events
        FROM sessions GROUP BY user_id, session_id
    ),
    entries AS (
        SELECT user_id, session_id, event_type AS entry_type FROM (
            SELECT user_id, session_id, event_type,
                   row_number() OVER (PARTITION BY user_id, session_id
                                      ORDER BY ts, event_id) AS rn
            FROM sessions
        ) WHERE rn = 1
    ),
    joined AS (
        SELECT p.n_events, e.entry_type
        FROM per_session p
        JOIN entries e ON e.user_id = p.user_id
                      AND e.session_id = p.session_id
    )
    SELECT entry_type,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(coalesce(sum(CASE WHEN n_events = 1 THEN 1 END), 0) AS BIGINT)
               AS n_bounce,
           CAST(coalesce(sum(CASE WHEN n_events = 1 THEN 1 END), 0) * 10000
                // count(*) AS BIGINT) AS bounce_fp
    FROM joined GROUP BY entry_type
    """,
    doc="Bounce rate by session entry type: sessionize (30-min gap, the "
    "events_sessionize construction), pick each session's first event "
    "type with min_by over the total order (ts, event_id), and fold "
    "single-event sessions into a fixed-point rate.  One shuffle on "
    "user for the session windows, one on (user, session) for the "
    "rollup, then a |types|-row aggregate.  All-integer compared "
    "surface.",
)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = ev.withColumn(
        "new_session",
        F.when(gap <= _SESSION_GAP_MIN * 60, F.lit(0)).otherwise(F.lit(1)),
    ).withColumn(
        "session_id",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("long"),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("min_by(event_type, struct(ts, event_id))").alias(
            "entry_type"
        ),
    )
    return per_session.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.coalesce(F.sum(F.when(F.col("n_events") == 1, 1)), F.lit(0))
        .cast("long")
        .alias("n_bounce"),
        F.expr(
            "CAST(coalesce(sum(CASE WHEN n_events = 1 THEN 1 END), 0) "
            "* 10000 DIV count(1) AS BIGINT)"
        ).alias("bounce_fp"),
    )


# --- supplier concentration per part (HHI) ----------------------------------


@register(
    "part_supplier_hhi",
    oracle="""
    , rev AS (
        SELECT l_partkey, l_suppkey,
               sum(CAST(round(l_extendedprice, 0) AS BIGINT)) AS dollars
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT l_partkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(dollars) AS BIGINT) AS total_dollars,
           CAST(sum(dollars * dollars) * 10000
                // (sum(dollars) * sum(dollars)) AS BIGINT) AS hhi_fp
    FROM rev GROUP BY l_partkey
    HAVING sum(dollars) > 0
    """,
    doc="Herfindahl–Hirschman supply-concentration index per part: "
    "HHI = Σ shareᵢ² over each supplier's revenue share, kept rational "
    "as Σcᵢ²·10⁴ ÷ (Σcᵢ)² with per-row whole-dollar quantization before "
    "any sum (the FLOAT-SUM-ORDER rule) — exact integers both engines; "
    "dollar (not cent) units keep Σc²·10⁴ inside BIGINT (at larger "
    "fan-in upgrade the products to DECIMAL(38,0)).  "
    "hhi_fp = 10000 ⇔ single-supplier part (supply-chain risk flag).  "
    "Two mergeable hash aggregates keyed (part, supplier) then part — "
    "the natural 100 TB shape; no windows, no broadcast needed.",
)
def part_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.round(F.col("l_extendedprice"), 0).cast("long")).alias(
            "dollars"
        )
    )
    return (
        rev.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("dollars").cast("long").alias("total_dollars"),
            F.expr(
                "CAST(sum(dollars * dollars) * 10000 "
                "DIV (sum(dollars) * sum(dollars)) AS BIGINT)"
            ).alias("hhi_fp"),
        )
        .filter(F.col("total_dollars") > 0)
    )


# --- rolling weekly active users (DAU/WAU stickiness) -----------------------


@register(
    "rolling_wau",
    bench=True,
    oracle="""
    , ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    span AS (SELECT max(day) AS max_day FROM ud),
    dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
    contrib AS (
        SELECT DISTINCT user_id,
               CAST(unnest(generate_series(day, day + 6, INTERVAL 1 DAY))
                    AS DATE) AS t_day
        FROM ud
    ),
    wau AS (SELECT t_day AS day, count(*) AS wau FROM contrib GROUP BY t_day)
    SELECT w.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
           CAST(d.dau * 10000 // w.wau AS BIGINT) AS stickiness_fp
    FROM wau w JOIN dau d ON d.day = w.day
    JOIN span s ON w.day <= s.max_day
    """,
    doc="Trailing-7-day weekly active users per day plus the DAU/WAU "
    "stickiness ratio — the engagement readout every growth dashboard "
    "ships.  Running distinct is not distributive, so each (user, day) "
    "activity row is exploded to the ≤7 future days it keeps the user "
    "'weekly-active' for, then a distinct + count per target day — "
    "bounded 7× fan-out on an already-deduplicated (user, day) set, "
    "never on raw events, and every step is a hash shuffle on small "
    "keys.  The inner join to observed DAU days drops warm-up days "
    "before the data starts; days past max(day) are trimmed.  "
    "All-integer, non-negative fixed-point.",
)
def rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # span/dau/contrib all branch off the deduplicated (user, day) set —
    # materialize it once (lazy localCheckpoint, the operators/ids.py
    # pattern) instead of three fact scans.
    ud = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .transform(snapshot, eager=False)
    )
    span = ud.agg(F.max("day").alias("max_day"))
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = (
        ud.select(
            "user_id",
            F.explode(
                F.expr("sequence(day, date_add(day, 6), interval 1 day)")
            ).alias("t_day"),
        )
        .distinct()
    )
    wau = contrib.groupBy(F.col("t_day").alias("day")).agg(
        F.count(F.lit(1)).alias("wau")
    )
    return (
        wau.join(dau, "day")
        .crossJoin(F.broadcast(span))
        .filter(F.col("day") <= F.col("max_day"))
        .select(
            "day",
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.expr("CAST(dau * 10000 DIV wau AS BIGINT)").alias(
                "stickiness_fp"
            ),
        )
    )


# --- weekly topic rank movement (trending detector) -------------------------


@register(
    "topic_rank_shift",
    oracle="""
    , weekly AS (
        SELECT CAST(date_trunc('week', ts) AS DATE) AS week, topic,
               count(*) AS n
        FROM messages GROUP BY 1, 2
    ),
    ranked AS (
        SELECT week, topic, n,
               CAST(row_number() OVER (PARTITION BY week
                                       ORDER BY n DESC, topic) AS BIGINT)
                   AS rk
        FROM weekly
    )
    SELECT b.week, b.topic, b.n, b.rk,
           a.rk AS prev_rk,
           CAST(a.rk - b.rk AS BIGINT) AS rank_gain
    FROM ranked b
    JOIN ranked a ON a.topic = b.topic AND a.week = b.week - 7
    """,
    doc="Week-over-week topic rank movement — the trending-topics "
    "detector: per-week message counts, a total-order rank within each "
    "week (count desc, topic asc — deterministic under ties), and a "
    "self-join of consecutive weeks on the topic key.  rank_gain > 0 "
    "means the topic climbed.  The ranking window partitions by week "
    "(bounded rows per partition = topic cardinality); the week-shift "
    "join is an equi-join on (topic, week−7) — no inequality join, no "
    "global window over facts.  All-integer surface.",
)
def topic_rank_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    msg = messages(spark, sf_dir)
    weekly = msg.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week"), "topic"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("week").orderBy(F.desc("n"), F.asc("topic"))
    # both join sides read the ranked weekly table — materialize it once
    # (lazy localCheckpoint) instead of recomputing scan+agg+window twice
    ranked = weekly.withColumn(
        "rk", F.row_number().over(w).cast("long")
    ).transform(snapshot, eager=False)
    b = ranked.alias("b")
    a = ranked.select(
        F.col("topic").alias("a_topic"),
        F.col("week").alias("a_week"),
        F.col("rk").alias("prev_rk"),
    )
    return (
        b.join(
            a,
            (F.col("a_topic") == F.col("b.topic"))
            & (F.col("a_week") == F.date_sub(F.col("b.week"), 7)),
        )
        .select(
            F.col("b.week").alias("week"),
            F.col("b.topic").alias("topic"),
            F.col("b.n").alias("n"),
            F.col("b.rk").alias("rk"),
            "prev_rk",
            (F.col("prev_rk") - F.col("b.rk")).cast("long").alias(
                "rank_gain"
            ),
        )
    )


# --- per-user dwell time from sessions --------------------------------------


@register(
    "user_dwell_time",
    oracle=f"""
    , flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL {_SESSION_GAP_MIN} MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    per_session AS (
        SELECT user_id, session_id,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS dwell_us
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(dwell_us) AS BIGINT) AS total_dwell_us,
           CAST(sum(dwell_us) // count(*) AS BIGINT) AS mean_dwell_us
    FROM per_session GROUP BY user_id
    """,
    doc="Total and mean time-on-product per user: sessionize (30-min "
    "gap), dwell = last-minus-first event time per session in exact "
    "microseconds, folded per user.  Engagement-duration metric; "
    "single-event sessions contribute zero (no synthetic padding).  "
    "Same two-shuffle shape as the other sessionized readouts; "
    "all-integer, non-negative division.",
)
def user_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = ev.withColumn(
        "new_session",
        F.when(gap <= _SESSION_GAP_MIN * 60, F.lit(0)).otherwise(F.lit(1)),
    ).withColumn(
        "session_id",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("long"),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "dwell_us"
        )
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("dwell_us").cast("long").alias("total_dwell_us"),
        F.expr("CAST(sum(dwell_us) DIV count(1) AS BIGINT)").alias(
            "mean_dwell_us"
        ),
    )


# --- referential-integrity audit (DQ gate) ----------------------------------


@register(
    "referential_integrity_audit",
    oracle="""
    SELECT
        CAST((SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                WHERE l.l_orderkey = o.o_orderkey))
             AS BIGINT) AS orders_without_items,
        CAST((SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
             AS BIGINT) AS orphan_lineitems,
        CAST((SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
             AS BIGINT) AS orders_unknown_customer,
        CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
             AS BIGINT) AS nonpositive_qty,
        CAST((SELECT count(*) FROM lineitem
              WHERE l_discount < 0 OR l_discount > 1)
             AS BIGINT) AS discount_out_of_range,
        CAST((SELECT count(*) FROM lineitem l JOIN orders o
              ON o.o_orderkey = l.l_orderkey
              WHERE l.l_shipdate < o.o_orderdate)
             AS BIGINT) AS ship_before_order
    """,
    doc="Referential-integrity / invariant audit across the warehouse — "
    "the DQ gate a pipeline runs before publishing a snapshot: orphan "
    "checks in both directions (orders↔lineitem, orders→customer, each "
    "a left-anti join — hash-shuffled on the key, no windows) plus "
    "range invariants (quantity > 0, discount ∈ [0,1]) and the "
    "cross-table temporal invariant ship ≥ order date.  Six independent single-row counts unioned into one audit "
    "row; each anti-join side scans once.  At 100 TB every check is an "
    "embarrassingly parallel scan or a key-partitioned anti-join — "
    "nothing global.  All-integer surface.",
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one declarative plan: six single-row aggregates cross-joined (each
    # 1×1), so the whole audit is a single action — never driver-side
    # .count() loops
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")

    def one(df, alias):
        return df.agg(F.count(F.lit(1)).cast("long").alias(alias))

    owi = one(
        orders.join(
            li.select("l_orderkey").distinct(),
            orders["o_orderkey"] == F.col("l_orderkey"),
            "left_anti",
        ),
        "orders_without_items",
    )
    orphans = one(
        li.join(
            orders.select("o_orderkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
            "left_anti",
        ),
        "orphan_lineitems",
    )
    ouc = one(
        orders.join(
            cust.select("c_custkey"),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        ),
        "orders_unknown_customer",
    )
    npq = one(li.filter(F.col("l_quantity") <= 0), "nonpositive_qty")
    dor = one(
        li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
        "discount_out_of_range",
    )
    rbs = one(
        li.select("l_orderkey", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") < F.col("o_orderdate")),
        "ship_before_order",
    )
    out = owi
    for part in (orphans, ouc, npq, dor, rbs):
        out = out.crossJoin(part)
    return out


# --- exact Pearson components between event-type daily series ---------------


@register(
    "event_type_daily_corr",
    oracle="""
    , daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.cents AS x, b.cents AS y
        FROM daily a JOIN daily b
          ON a.day = b.day AND a.event_type < b.event_type
    )
    SELECT type_a, type_b, n_days,
           CASE WHEN r_den_x = 0 OR r_den_y = 0 THEN NULL
                ELSE CAST(floor(CAST(r_num AS DOUBLE)
                                / (sqrt(CAST(r_den_x AS DOUBLE))
                                   * sqrt(CAST(r_den_y AS DOUBLE)))
                                * 1000000) AS BIGINT) END AS corr_fp
    FROM (
        SELECT type_a, type_b,
               CAST(count(*) AS BIGINT) AS n_days,
               count(*) * sum(CAST(x AS HUGEINT) * y)
                   - sum(CAST(x AS HUGEINT)) * sum(y) AS r_num,
               count(*) * sum(CAST(x AS HUGEINT) * x)
                   - sum(CAST(x AS HUGEINT)) * sum(x) AS r_den_x,
               count(*) * sum(CAST(y AS HUGEINT) * y)
                   - sum(CAST(y AS HUGEINT)) * sum(y) AS r_den_y
        FROM pairs GROUP BY type_a, type_b
    )
    """,
    doc="Pearson correlation between every pair of event-type daily "
    "revenue series: the five sums and the three cross-multiplied "
    "terms r_num, r_den_x, r_den_y are exact 128-bit integers "
    "(DECIMAL(38,0)/HUGEINT — the r07 100x sweep caught the former "
    "BIGINT products overflowing at 10M events; summation order stays "
    "irrelevant because the integers are exact), rendered as one "
    "floor-fixed-point r in ppm from a shared double expression "
    "(exact-int → double is correctly rounded on both engines, and "
    "/, *, sqrt on identical doubles are bit-identical).  Shape: one "
    "(day, type) partial-agg shuffle collapses the fact table to "
    "|days|·|types| rows, the self-join rides the day key, and the "
    "final aggregate is |types|² rows — the cross-metric co-movement "
    "matrix a metrics store derives continuously.",
)
def event_type_daily_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents")
    ).transform(snapshot, eager=False)
    a = daily.select(
        "day", F.col("event_type").alias("type_a"), F.col("cents").alias("x")
    )
    b = daily.select(
        "day", F.col("event_type").alias("type_b"), F.col("cents").alias("y")
    )
    pairs = a.join(b, "day").filter(F.col("type_a") < F.col("type_b"))
    d38 = "decimal(38,0)"
    xd = F.col("x").cast(d38)
    yd = F.col("y").cast(d38)
    comp = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (
            F.count(F.lit(1)) * F.sum(xd * F.col("y"))
            - F.sum(xd) * F.sum("y")
        ).alias("r_num"),
        (
            F.count(F.lit(1)) * F.sum(xd * F.col("x"))
            - F.sum(xd) * F.sum("x")
        ).alias("r_den_x"),
        (
            F.count(F.lit(1)) * F.sum(yd * F.col("y"))
            - F.sum(yd) * F.sum("y")
        ).alias("r_den_y"),
    )
    return comp.select(
        "type_a",
        "type_b",
        "n_days",
        F.when(
            (F.col("r_den_x") == 0) | (F.col("r_den_y") == 0), F.lit(None)
        )
        .otherwise(
            F.floor(
                F.col("r_num").cast("double")
                / (
                    F.sqrt(F.col("r_den_x").cast("double"))
                    * F.sqrt(F.col("r_den_y").cast("double"))
                )
                * 1000000
            )
        )
        .cast("long")
        .alias("corr_fp"),
    )


# --- weighted median via distributed cumulative weight ----------------------


@register(
    "weighted_median_price_by_flag",
    oracle="""
    , t AS (
        SELECT l_returnflag AS flag,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents,
               CAST(l_quantity AS BIGINT) AS qty,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    cum AS (
        SELECT flag, price_cents, qty,
               sum(qty) OVER (PARTITION BY flag
                              ORDER BY price_cents, l_orderkey, l_linenumber
                              ROWS UNBOUNDED PRECEDING) AS cum_qty,
               sum(qty) OVER (PARTITION BY flag) AS total_qty
        FROM t
    )
    SELECT flag,
           CAST(min(price_cents) AS BIGINT) AS weighted_median_cents,
           CAST(min(total_qty) AS BIGINT) AS total_qty
    FROM cum
    WHERE cum_qty * 2 >= total_qty
    GROUP BY flag
    """,
    doc="Quantity-weighted median price per return flag: sort each "
    "group by (price, total-order tie-break), run a cumulative weight, "
    "and take the first row whose cumulative quantity reaches half the "
    "group total — the weighted-percentile primitive (unweighted "
    "percentiles: orders_percentiles; this is the volume-weighted "
    "variant a pricing desk actually wants).  Exact integer cents and "
    "quantities; the 'first row ≥ half' pick is min() over the "
    "qualifying set, identical cross-engine under the total order.  "
    "Shape: one shuffle on the group key; the running window streams "
    "per partition in sort order — no global sort, no collect.  At "
    "100 TB the flag key is low-cardinality: pre-aggregate qty by "
    "(flag, price_cents) first if per-key row counts make the window "
    "partition too tall (same plan, one extra mergeable agg).",
)
def weighted_median_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("price_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
        "l_orderkey",
        "l_linenumber",
    )
    w_cum = (
        W.partitionBy("flag")
        .orderBy("price_cents", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_tot = W.partitionBy("flag")
    cum = t.select(
        "flag",
        "price_cents",
        F.sum("qty").over(w_cum).alias("cum_qty"),
        F.sum("qty").over(w_tot).alias("total_qty"),
    )
    return (
        cum.filter(F.col("cum_qty") * 2 >= F.col("total_qty"))
        .groupBy("flag")
        .agg(
            F.min("price_cents").cast("long").alias("weighted_median_cents"),
            F.min("total_qty").cast("long").alias("total_qty"),
        )
    )


# --- revenue concentration (Lorenz / Pareto deciles) ------------------------

# prefix-sum bucket width: customer revenue bands of 10^7 cents; the band
# index is a pure function of the sort key (monotonic), so the two-phase
# prefix sum stays deterministic (operators/ids.py contract)
_PARETO_BAND = 10_000_000


@register(
    "revenue_pareto_deciles",
    oracle="""
    , cr AS (
        SELECT o_custkey,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS rev
        FROM orders GROUP BY o_custkey
    ),
    r AS (
        SELECT o_custkey, rev,
               row_number() OVER (ORDER BY rev DESC, o_custkey) AS rk,
               sum(rev) OVER (ORDER BY rev DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum_rev
        FROM cr
    ),
    g AS (SELECT count(*) AS g_n, sum(rev) AS g_rev FROM cr)
    SELECT CAST(least(9, (rk - 1) * 10 // g_n) AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(rev) AS BIGINT) AS rev_cents,
           CAST(max(cum_rev) * 10000 // g_rev AS BIGINT) AS cum_share_bp
    FROM r CROSS JOIN g
    GROUP BY least(9, (rk - 1) * 10 // g_n), g_n, g_rev
    """,
    doc="Lorenz curve / Pareto readout of revenue concentration: rank "
    "customers by exact-cents revenue (total order: rev desc, custkey) "
    "and report, per customer decile, the revenue held and the "
    "cumulative share in basis points — the 'top 10% of customers hold "
    "X% of revenue' answer.  The global rank and running revenue are a "
    "TWO-measure distributed prefix sum in one pass (the operators/"
    "ids.py two-phase shape: per-band cumulative window, parallel "
    "across revenue bands, plus broadcast band offsets — the oracle's "
    "single-partition OVER () is exactly what this plan avoids at "
    "scale).  Bands are a pure function of the revenue value, so the "
    "result is partitioning-invariant.  All-integer surface.",
)
def revenue_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cr = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "rev"
        )
    )
    base = cr.select(
        "o_custkey",
        "rev",
        (-F.col("rev")).alias("sk"),
    ).withColumn("_bkt", F.expr(f"-(rev DIV {_PARETO_BAND})"))
    w_in = (
        W.partitionBy("_bkt")
        .orderBy("sk", "o_custkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = (
        base.withColumn("_cum_rev_in", F.sum("rev").over(w_in))
        .withColumn("_cum_n_in", F.count(F.lit(1)).over(w_in))
        .transform(snapshot, eager=False)
    )
    totals = local.groupBy("_bkt").agg(
        F.max("_cum_rev_in").alias("_tot_rev"),
        F.max("_cum_n_in").alias("_tot_n"),
    )
    w_off = W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "_bkt",
        F.coalesce(F.sum("_tot_rev").over(w_off), F.lit(0)).alias("_off_rev"),
        F.coalesce(F.sum("_tot_n").over(w_off), F.lit(0)).alias("_off_n"),
    )
    grand = totals.agg(
        F.sum("_tot_rev").alias("g_rev"), F.sum("_tot_n").alias("g_n")
    )
    ranked = (
        local.join(F.broadcast(offsets), "_bkt")
        .select(
            "rev",
            (F.col("_off_rev") + F.col("_cum_rev_in")).alias("cum_rev"),
            (F.col("_off_n") + F.col("_cum_n_in")).alias("rk"),
        )
        .crossJoin(F.broadcast(grand))
    )
    return (
        ranked.withColumn(
            "decile",
            F.expr("CAST(least(9, (rk - 1) * 10 DIV g_n) AS BIGINT)"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("rev").cast("long").alias("rev_cents"),
            F.expr(
                "CAST(max(cum_rev) * 10000 DIV max(g_rev) AS BIGINT)"
            ).alias("cum_share_bp"),
        )
    )


# --- robust outliers via median absolute deviation --------------------------

_MAD_K = 3  # flag |x - median| > K * MAD


@register(
    "robust_outliers_mad",
    oracle=f"""
    , t AS (
        SELECT event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS cents, event_id
        FROM events
    ),
    med AS (
        SELECT event_type, cents AS med_cents FROM (
            SELECT event_type, cents,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY cents, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM t
        ) WHERE rn = (n + 1) // 2
    ),
    dev AS (
        SELECT t.event_type, t.cents, t.event_id,
               abs(t.cents - m.med_cents) AS d, m.med_cents
        FROM t JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, d AS mad_cents FROM (
            SELECT event_type, d,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY d, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM dev
        ) WHERE rn = (n + 1) // 2
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(d.med_cents) AS BIGINT) AS median_cents,
           CAST(min(a.mad_cents) AS BIGINT) AS mad_cents,
           CAST(coalesce(sum(CASE WHEN d.d > {_MAD_K} * a.mad_cents
                                  THEN 1 END), 0) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY d.event_type
    """,
    doc="Robust outlier detection per series: lower-median (discrete "
    "pick at rank ⌈n/2⌉ under the total order (cents, event_id) — an "
    "exact SELECTED value, never an interpolated float) and the median "
    "absolute deviation, then count |x − med| > 3·MAD.  The robust "
    "twin of anomaly_zscore: one extreme event moves mean/std but not "
    "med/MAD.  Two ranking windows partitioned by series plus one "
    "broadcast-size median join; at 100 TB with few tall series, swap "
    "the exact rank pick for the mergeable binned quantile "
    "(quantile_bins_estimate) — the surrounding plan is unchanged.  "
    "All-integer surface.",
)
def robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        "event_id",
    )
    w_rank = W.partitionBy("event_type").orderBy("cents", "event_id")
    w_cnt = W.partitionBy("event_type")
    med = (
        t.select(
            "event_type",
            "cents",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w_cnt).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select("event_type", F.col("cents").alias("med_cents"))
    )
    dev = t.join(F.broadcast(med), "event_type").select(
        "event_type",
        "cents",
        "event_id",
        F.abs(F.col("cents") - F.col("med_cents")).alias("d"),
        "med_cents",
    )
    w_drank = W.partitionBy("event_type").orderBy("d", "event_id")
    mad = (
        dev.select(
            "event_type",
            "d",
            F.row_number().over(w_drank).alias("rn"),
            F.count(F.lit(1)).over(w_cnt).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select("event_type", F.col("d").alias("mad_cents"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("med_cents").cast("long").alias("median_cents"),
            F.min("mad_cents").cast("long").alias("mad_cents"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("d") > _MAD_K * F.col("mad_cents"), 1
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# --- multi-touch (linear) attribution ---------------------------------------

_ATTR_WINDOW_US = 7 * 86400 * 1_000_000  # 7-day lookback


@register(
    "linear_attribution",
    oracle=f"""
    , conv AS (
        SELECT user_id, event_id AS conv_id, epoch_us(ts) AS c_us
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT user_id, event_id AS touch_id, event_type, epoch_us(ts) AS t_us
        FROM events WHERE event_type <> 'purchase'
    ),
    pairs AS (
        SELECT c.conv_id, t.event_type
        FROM conv c JOIN touch t ON t.user_id = c.user_id
        WHERE t.t_us < c.c_us AND c.c_us - t.t_us <= {_ATTR_WINDOW_US}
    ),
    sized AS (
        SELECT conv_id, event_type,
               count(*) AS n_type,
               sum(count(*)) OVER (PARTITION BY conv_id) AS k
        FROM pairs GROUP BY conv_id, event_type
    )
    SELECT event_type,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions_touched,
           CAST(sum(n_type * (10000 // k)) AS BIGINT) AS credit_bp
    FROM sized GROUP BY event_type
    """,
    doc="Multi-touch linear attribution (the equal-credit counterpart of "
    "last_touch_attribution): every non-purchase event within the "
    "7-day lookback of a purchase by the same user shares the "
    "conversion's 10000 bp equally — each touch earns 10000 DIV k "
    "(integer, truncated identically on both engines; the dropped "
    "remainder is the standard fixed-point convention).  Credit is "
    "folded per touch type.  Shape: conversions ⋈ touches is an "
    "equi-join on user_id with a time-band predicate — per-user "
    "fan-out is bounded by activity in the window; at 100 TB swap in "
    "the bucketed band join (range_join_bucketed pattern: probe "
    "⌈window/band⌉ buckets) to bound reduce-task width.  The per-"
    "conversion k runs over the already-aggregated (conv, type) rows, "
    "never raw pairs.  All-integer surface.",
)
def linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.unix_micros("ts").alias("c_us"),
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        "event_type",
        F.unix_micros("ts").alias("t_us"),
    )
    pairs = conv.join(
        touch,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_us") < F.col("c_us"))
        & (F.col("c_us") - F.col("t_us") <= _ATTR_WINDOW_US),
    ).select("conv_id", "event_type")
    sized = (
        pairs.groupBy("conv_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_type"))
        .withColumn(
            "k", F.sum("n_type").over(W.partitionBy("conv_id"))
        )
    )
    return sized.groupBy("event_type").agg(
        F.countDistinct("conv_id").cast("long").alias(
            "n_conversions_touched"
        ),
        F.expr("CAST(sum(n_type * (10000 DIV k)) AS BIGINT)").alias(
            "credit_bp"
        ),
    )


# --- fulfillment latency distribution ---------------------------------------


@register(
    "ship_latency_histogram",
    oracle="""
    SELECT o_orderpriority,
           CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT)
               AS latency_days,
           count(*) AS n_lineitems
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority, datediff('day', o_orderdate, l_shipdate)
    """,
    doc="Order-to-ship latency distribution per order priority — the "
    "fulfillment-SLA histogram: exact day counts, grouped.  The "
    "orders join rides the order key (co-partitioned at 100 TB via "
    "the bucketed-table sink); the histogram aggregate is mergeable "
    "and bounded by |priorities|·|latency range|.  All-integer "
    "surface; day arithmetic on DATE values is identical cross-engine "
    "(no timezone math — both operands are civil dates).",
)
def ship_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.select("l_orderkey", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        j.groupBy(
            "o_orderpriority",
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            .cast("long")
            .alias("latency_days"),
        )
        .agg(F.count(F.lit(1)).alias("n_lineitems"))
    )


# --- repeat-purchase interval distribution ----------------------------------

REORDER_BUCKET_DAYS = 30


@register(
    "reorder_interval_histogram",
    oracle=f"""
    , gaps AS (
        SELECT o_custkey,
               datediff('day',
                        lag(o_orderdate) OVER (PARTITION BY o_custkey
                                               ORDER BY o_orderdate,
                                                        o_orderkey),
                        o_orderdate) AS gap_days
        FROM orders
    )
    SELECT CAST(gap_days // {REORDER_BUCKET_DAYS} AS BIGINT) AS gap_bucket,
           count(*) AS n_reorders,
           CAST(min(gap_days) AS BIGINT) AS min_days,
           CAST(max(gap_days) AS BIGINT) AS max_days
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY gap_days // {REORDER_BUCKET_DAYS}
    """,
    doc="Repeat-purchase interval distribution: per customer, the gap in "
    "days between consecutive orders (lag over the total order "
    "(o_orderdate, o_orderkey) within customer), bucketed to 30-day "
    "bands — the replenishment-cycle readout behind churn models.  "
    "One window shuffle on the customer key (high-cardinality — "
    "distributes), then a mergeable histogram aggregate over a few "
    "dozen buckets.  gap_days ≥ 0 ⇒ integer division is floor on both "
    "engines.  All-integer surface.",
)
def reorder_interval_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy(
            F.expr(f"CAST(gap_days DIV {REORDER_BUCKET_DAYS} AS BIGINT)")
            .alias("gap_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_reorders"),
            F.min("gap_days").cast("long").alias("min_days"),
            F.max("gap_days").cast("long").alias("max_days"),
        )
    )


# --- co-purchase part pairs (basket analysis) ------------------------------


@register(
    "copurchase_part_pairs",
    oracle="""
    , basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pc AS (
        SELECT x.l_partkey AS pk1, y.l_partkey AS pk2,
               count(*) AS n_orders
        FROM basket x
        JOIN basket y ON x.l_orderkey = y.l_orderkey
                     AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2
    )
    SELECT CAST(pk1 AS BIGINT) AS pk1, CAST(pk2 AS BIGINT) AS pk2,
           CAST(n_orders AS BIGINT) AS n_orders
    FROM pc ORDER BY n_orders DESC, pk1, pk2 LIMIT 20
    """,
    doc="Basket analysis: top co-purchased part pairs.  The scale shape "
    "matters: instead of a self-join on l_orderkey (two exchanges of "
    "the fact table), the basket is grouped ONCE into a sorted "
    "part array (orders hold ≤7 parts, so the array and its ≤21 "
    "pair expansions are bounded) and pairs explode map-side from "
    "the grouped row; one fact shuffle total, then a distributive "
    "pair count and a distributed TakeOrdered(20) with a total-order "
    "tie-break (n_orders DESC, pk1, pk2) — no global sort "
    "materialization, no window.",
    bench=True,
)
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    e1 = baskets.select("parts", F.posexplode("parts").alias("i", "pk1"))
    pairs = e1.select(
        "i", "pk1", F.posexplode("parts").alias("j", "pk2")
    ).filter(F.col("j") > F.col("i"))
    counts = pairs.groupBy("pk1", "pk2").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    return (
        counts.select(
            F.col("pk1").cast("long").alias("pk1"),
            F.col("pk2").cast("long").alias("pk2"),
            "n_orders",
        )
        .orderBy(F.desc("n_orders"), "pk1", "pk2")
        .limit(20)
    )


# --- skyline (Pareto frontier) of parts ------------------------------------


@register(
    "skyline_parts",
    oracle="""
    , pts AS (
        SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
               CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_cents,
               CAST(p_size AS BIGINT) AS p_size
        FROM part
    )
    SELECT p_partkey, price_cents, p_size FROM pts a
    WHERE NOT EXISTS (
        SELECT 1 FROM pts b
        WHERE b.price_cents <= a.price_cents AND b.p_size <= a.p_size
          AND (b.price_cents < a.price_cents OR b.p_size < a.p_size)
    )
    """,
    doc="Skyline (Pareto frontier) of parts minimizing (retail price, "
    "size): the multi-criteria shortlist operator relational algebra "
    "lacks.  Two-phase distributed skyline (Börzsönyi et al., ICDE "
    "2001): an Arrow-batched partition-local sort-filter-skyline "
    "prunes every partition to its own frontier with NO shuffle, and "
    "only the tiny union of local frontiers is coalesced for the "
    "global sweep — the exact-domination oracle is a quadratic "
    "NOT EXISTS anti-join, which is the semantics but not the plan.  "
    "Prices are quantized to exact cents BEFORE the sweep so every "
    "comparison is integer on both engines; equal (price, size) "
    "duplicates are mutually non-dominating and all survive.",
    tags=("operator", "pandas"),
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2sql_spark.operators.skyline import skyline_min_min

    pts = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.expr("CAST(round(p_retailprice * 100, 0) AS BIGINT)").alias(
            "price_cents"
        ),
        F.col("p_size").cast("long").alias("p_size"),
    )
    return skyline_min_min(pts, "price_cents", "p_size")


# --- scalable fuzzy matching: deletion-neighborhood filter-verify ----------


@register(
    "fuzzy_join_deletion_index",
    oracle="""
    , topics AS (SELECT DISTINCT topic FROM messages),
    variants AS (
        SELECT topic, topic AS v FROM topics
        UNION
        SELECT topic, substr(topic, 1, i - 1) || substr(topic, i + 1) AS v
        FROM (SELECT topic, unnest(range(1, len(topic) + 1)) AS i
              FROM topics)
    )
    SELECT DISTINCT a.topic AS topic_a, b.topic AS topic_b,
           CAST(levenshtein(a.topic, b.topic) AS INTEGER) AS dist
    FROM variants a JOIN variants b ON a.v = b.v AND a.topic < b.topic
    WHERE levenshtein(a.topic, b.topic) <= 1
    """,
    doc="Edit-distance-1 key matching at scale: the deletion-neighborhood "
    "filter-verify join.  fuzzy_topic_match broadcasts a quadratic "
    "compare (right for a small dimension); this is the linear path a "
    "100 TB key set needs — every key expands to its ≤len+1 single-"
    "deletion variants (a per-row generator, no shuffle), candidates "
    "come from an EQUI-join on the variant (hash shuffle, no n² "
    "compare: ed(a,b)≤1 ⇒ the pair shares a variant, so the index is "
    "a complete candidate filter), and the cheap exact levenshtein "
    "verify runs only on candidates.  Exact same result set as the "
    "quadratic formulation, integer surface.",
)
def fuzzy_join_deletion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    topics = messages(spark, sf_dir).select("topic").distinct()
    # fan the variant generation out (the distinct's AQE-coalesced
    # output can be a single task at fixture scale)
    topics = topics.repartition(spark.sparkContext.defaultParallelism)
    # guard the empty string: Spark's sequence(1, 0) DESCENDS ([1, 0])
    # instead of being empty like DuckDB's range(1, 1) — an empty key
    # must contribute only its identity variant on both engines
    deletions = F.expr(
        "CASE WHEN length(topic) = 0 THEN array() "
        "ELSE transform(sequence(1, length(topic)), "
        "i -> concat(substring(topic, 1, i - 1), substring(topic, i + 1))) "
        "END"
    )
    variants = topics.select(
        "topic",
        F.explode(
            F.array_union(F.array(F.col("topic")), deletions)
        ).alias("v"),
    ).distinct()
    a = variants.alias("a")
    b = variants.alias("b")
    cand = (
        a.join(b, (F.col("a.v") == F.col("b.v")) & (F.col("a.topic") < F.col("b.topic")))
        .select(
            F.col("a.topic").alias("topic_a"),
            F.col("b.topic").alias("topic_b"),
        )
        .distinct()
    )
    return cand.select(
        "topic_a",
        "topic_b",
        F.levenshtein("topic_a", "topic_b").alias("dist"),
    ).filter(F.col("dist") <= 1)


# --- TPC-H Q6: discount-band revenue ---------------------------------------


@register(
    "discount_band_revenue",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * l_discount * 100, 0)
                          AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecasting revenue change): pure "
    "scan-filter-aggregate with NO grouping key — every predicate "
    "(date band, discount band, quantity cap) pushes down to the "
    "parquet scan, rows collapse map-side into one partial sum per "
    "partition, and the final merge touches one row per task.  The "
    "simplest query in the book and the purest pushdown/codegen "
    "benchmark: any plan regression here shows up as a full-width "
    "scan.  Money quantized to exact cents per row before summing "
    "(float-sum order rule).",
)
def discount_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.expr(
                "sum(CAST(round(l_extendedprice * l_discount * 100, 0)"
                " AS BIGINT))"
            ).alias("revenue_cents"),
        )
    )


# --- PageRank over the co-purchase graph -----------------------------------

_PR_ITER = 8
_PR_Q = 10**12


def _pr_oracle() -> str:
    # unrolled iteration CTEs: standard SQL forbids aggregation in a
    # recursive term, so the fixed iteration count is generated as a
    # chain p0..pN — same spec text both engines would run
    parts = [
        """
    , basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    prpairs AS (
        SELECT x.l_partkey AS a, y.l_partkey AS b
        FROM basket x JOIN basket y ON x.l_orderkey = y.l_orderkey
                                   AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2
    ),
    edges AS (SELECT a AS src, b AS dst FROM prpairs
              UNION ALL SELECT b, a FROM prpairs),
    deg AS (SELECT src AS v, count(*) AS deg FROM edges GROUP BY src),
    base AS (
        SELECT v, deg,
               CAST(%(Q)d // (SELECT count(*) FROM deg) AS BIGINT) AS s0
        FROM deg
    ),
    p0 AS (SELECT v, deg, s0 AS s FROM base)"""
        % {"Q": _PR_Q}
    ]
    for k in range(1, _PR_ITER + 1):
        parts.append(
            f""",
    p{k} AS (
        SELECT b.v, b.deg,
               CAST((15 * b.s0 + 85 * coalesce(i.t, 0)) // 100
                    AS BIGINT) AS s
        FROM base b LEFT JOIN (
            SELECT e.dst AS iv, sum(p.s // p.deg) AS t
            FROM p{k - 1} p JOIN edges e ON e.src = p.v
            GROUP BY e.dst
        ) i ON i.iv = b.v
    )"""
        )
    parts.append(
        f"""
    SELECT CAST(v AS BIGINT) AS part, CAST(deg AS BIGINT) AS deg,
           s AS rank_q12
    FROM p{_PR_ITER}"""
    )
    return "".join(parts)


@register(
    "pagerank_copurchase",
    oracle=_pr_oracle(),
    doc=f"PageRank over the part co-purchase graph ({_PR_ITER} fixed "
    "iterations, damping 0.85) — the graph-centrality capability beyond "
    "connected components: which parts anchor the basket network.  The "
    "float formulation can never hash-match across engines, so the "
    "rank vector is EXACT INTEGER mass (Q=1e12 split by floor "
    "division; every per-edge share and damping step floors on "
    "non-negative BIGINTs), making a fixed iteration count a bit-exact "
    "spec on any engine — the oracle unrolls the loop as chained CTEs "
    "since standard SQL bars aggregation inside a recursive term.  "
    "Scale shape: the edge list pre-partitions on src once "
    "(localCheckpoint), every iteration is one co-located join + hash "
    "agg over |E|, the rank relation is |V| rows, and lineage is "
    "truncated every 3 iterations — the dedup_components treatment.",
    tags=("operator", "iterative"),
)
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2sql_spark.operators.pagerank import pagerank_int

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    e1 = baskets.select("parts", F.posexplode("parts").alias("i", "pk1"))
    pairs = (
        e1.select("i", "pk1", F.posexplode("parts").alias("j", "pk2"))
        .filter(F.col("j") > F.col("i"))
        .select("pk1", "pk2")
        .distinct()
    )
    edges = pairs.select(
        F.col("pk1").alias("src"), F.col("pk2").alias("dst")
    ).union(pairs.select(F.col("pk2"), F.col("pk1")))
    pr = pagerank_int(edges, n_iter=_PR_ITER)
    return pr.select(
        F.col("v").cast("long").alias("part"),
        F.col("deg"),
        F.col("s").alias("rank_q12"),
    )


# --- triangle counting / clustering coefficient ----------------------------


@register(
    "triangle_count_copurchase",
    oracle="""
    , basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    tri_e AS (
        SELECT x.l_partkey AS a, y.l_partkey AS b
        FROM basket x JOIN basket y ON x.l_orderkey = y.l_orderkey
                                   AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2
    ),
    deg AS (
        SELECT v, count(*) AS d FROM (
            SELECT a AS v FROM tri_e UNION ALL SELECT b FROM tri_e
        ) GROUP BY v
    ),
    tri AS (
        SELECT count(*) AS n_tri
        FROM tri_e ab
        JOIN tri_e bc ON bc.a = ab.b
        JOIN tri_e ac ON ac.a = ab.a AND ac.b = bc.b
    ),
    wedge AS (SELECT sum(d * (d - 1) // 2) AS n_wedges FROM deg)
    SELECT CAST((SELECT count(*) FROM tri_e) AS BIGINT) AS n_edges,
           CAST(n_wedges AS BIGINT) AS n_wedges,
           CAST(n_tri AS BIGINT) AS n_triangles,
           CAST(3 * n_tri * 1000000 // greatest(n_wedges, 1) AS BIGINT)
               AS global_cc_ppm
    FROM tri, wedge
    """,
    doc="Triangle count + global clustering coefficient of the part "
    "co-purchase graph — the graph-density readout (how cliquish are "
    "baskets) and the third graph capability next to connected "
    "components and PageRank.  The compact-forward algorithm: edges "
    "oriented by key order (a<b<c), so each triangle is found exactly "
    "once by a wedge join on the middle vertex + a closing equi-join — "
    "the orientation bounds wedge fan-out by forward-degree, the "
    "standard skew treatment for hub nodes.  Wedges come from the "
    "degree aggregate (d·(d−1)/2, exact integers).  Output is four "
    "integers regardless of scale; cc = 3·triangles/wedges in ppm.",
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    e1 = baskets.select("parts", F.posexplode("parts").alias("i", "pk1"))
    edges = (
        e1.select("i", "pk1", F.posexplode("parts").alias("j", "pk2"))
        .filter(F.col("j") > F.col("i"))
        .select(F.col("pk1").alias("a"), F.col("pk2").alias("b"))
        .distinct()
        # the wedge join probes this relation twice; materialize the
        # dedup'd edge list once instead of re-running the basket explode
        .transform(snapshot, eager=False)
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .union(edges.select("b"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    ).transform(snapshot, eager=False)
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) DIV 2")).alias("n_wedges")
    )
    # Degree-oriented exact count (compact-forward, Latapy 2008 —
    # measured at sf0.1: 148M id-order wedges → never-materialized
    # adjacency intersections, 12.4 s → ~2 s).  Extracted to
    # operators/triangles.py and shared with
    # global_clustering_coefficient; identical result to the oracle's
    # id-order formulation.
    from mqtt2sql_spark.operators.triangles import oriented_triangle_count

    tri = oriented_triangle_count(edges, deg)
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tri.crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(n_edges))
        .select(
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_wedges").cast("long").alias("n_wedges"),
            F.col("n_tri").cast("long").alias("n_triangles"),
            F.expr(
                "CAST(3 * n_tri * 1000000 DIV greatest(n_wedges, 1) "
                "AS BIGINT)"
            ).alias("global_cc_ppm"),
        )
    )


# --- two-sample Kolmogorov-Smirnov statistic -------------------------------


@register(
    "ks_statistic_click_purchase",
    oracle="""
    , ks_base AS (
        SELECT value,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY value
    ),
    cum AS (
        SELECT value,
               sum(ca) OVER (ORDER BY value
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cca,
               sum(cb) OVER (ORDER BY value
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS ccb
        FROM ks_base
    ),
    tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM ks_base),
    diffs AS (
        SELECT value,
               abs(cca * (SELECT nb FROM tot)
                   - ccb * (SELECT na FROM tot)) AS dnum
        FROM cum
    )
    SELECT CAST((SELECT na FROM tot) AS BIGINT) AS n_a,
           CAST((SELECT nb FROM tot) AS BIGINT) AS n_b,
           CAST(max(dnum) AS BIGINT) AS d_num,
           CAST((SELECT na FROM tot) * (SELECT nb FROM tot) AS BIGINT)
               AS d_den,
           CAST((SELECT min(CAST(floor(value * 10000) AS BIGINT))
                 FROM diffs WHERE dnum = (SELECT max(dnum) FROM diffs))
                AS BIGINT) AS argmax_v_fp
    FROM diffs
    """,
    doc="Two-sample Kolmogorov-Smirnov statistic between the click and "
    "purchase value distributions — the drift/test-of-distribution "
    "capability (data-drift monitors, A/B sanity checks).  D = "
    "max|F_a(v) − F_b(v)| evaluated at every distinct value with ties "
    "folded (both ECDFs step together), emitted as the exact rational "
    "d_num/d_den via cross-multiplication — the division and the "
    "critical-value compare stay consumer-side, so nothing floats.  "
    "The ECDFs are distributed prefix sums in the dense_row_ids/"
    "running_totals two-phase shape: per-bucket cumulative windows "
    "(bucket = floor(value), monotonic in the sort key) plus broadcast "
    "bucket offsets — never a single-partition window over the "
    "distinct-value relation.  argmax location reported as the "
    "smallest value attaining D (floor fixed-point, the "
    "ROUND-OF-RAW-DOUBLE rule).",
    bench=True,
)
def ks_statistic_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mqtt2sql_spark.operators.stats import ks_statistic

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    base = ev.groupBy("value").agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("ca"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("cb"),
    )
    return ks_statistic(base, F.floor("value").cast("long"))


# --- Mann-Whitney U (rank-sum) test ----------------------------------------


@register(
    "mannwhitney_u_click_purchase",
    oracle="""
    , mw_base AS (
        SELECT value,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY value
    ),
    cum AS (
        SELECT value, ca, cb, ca + cb AS c,
               sum(ca + cb) OVER (ORDER BY value
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - (ca + cb) AS cprev
        FROM mw_base
    ),
    tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM mw_base),
    r AS (SELECT sum(ca * (2 * cprev + c + 1)) AS r2a FROM cum)
    SELECT CAST((SELECT na FROM tot) AS BIGINT) AS n_a,
           CAST((SELECT nb FROM tot) AS BIGINT) AS n_b,
           CAST(r2a - (SELECT na * (na + 1) FROM tot) AS BIGINT) AS u2_a,
           CAST(2 * (SELECT na * nb FROM tot)
                - (r2a - (SELECT na * (na + 1) FROM tot)) AS BIGINT)
               AS u2_b
    FROM r
    """,
    doc="Mann-Whitney U (Wilcoxon rank-sum) between the click and "
    "purchase value samples — the nonparametric location test next to "
    "the KS distribution test.  Tied values take midranks; doubling "
    "every rank keeps midranks integral (2·avg_rank = 2·C_prev + c + "
    "1), so U is emitted as the exact integer 2U with the "
    "complementary u2_b = 2·n_a·n_b − u2_a as a built-in cross-check "
    "— the z-score normalization stays consumer-side.  Rank "
    "positions come from the same two-phase distributed prefix sum as "
    "the KS ECDFs (per-bucket window + broadcast offsets), then one "
    "distributive weighted sum — no global sort, no global window.",
)
def mannwhitney_u_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mqtt2sql_spark.operators.stats import mannwhitney_u

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    base = ev.groupBy("value").agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("ca"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("cb"),
    )
    return mannwhitney_u(base, F.floor("value").cast("long"))


# --- exact distributed median via two-phase bin refinement -----------------


@register(
    "exact_median_price",
    oracle="""
    , mc AS (
        SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
        FROM lineitem
    ),
    med_tot AS (SELECT count(*) AS n FROM mc),
    ranked AS (
        SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM mc
    )
    SELECT CAST((SELECT n FROM med_tot) AS BIGINT) AS n,
           CAST((SELECT (n + 1) // 2 FROM med_tot) AS BIGINT) AS k,
           CAST((SELECT cents FROM ranked
                 WHERE rn = (SELECT (n + 1) // 2 FROM med_tot))
                AS BIGINT) AS median_cents
    """,
    doc="Exact global median (lower median, k = ceil(n/2)) of line-item "
    "price WITHOUT a global sort — the two-phase selection pattern: "
    "phase 1 is a distributive $1000-bin histogram (tiny), whose "
    "cumulative counts locate the median bin and the in-bin offset; "
    "phase 2 ranks ONLY the rows of that one bin (~1/1000 of the "
    "data; a skewed bin can recurse the same trick).  The oracle's "
    "full row_number ranking is the semantics, not the plan — Spark "
    "never shuffles the fact table by value, only the selected bin.  "
    "Prices quantized to exact cents first, so the k-th value is "
    "well-defined under ties regardless of tie-break.",
    bench=True,
)
def exact_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    BIN = 100000  # $1000 bins in cents
    mc = load_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").alias(
            "cents"
        )
    )
    tot = mc.agg(F.count(F.lit(1)).alias("n")).select(
        "n", F.expr("CAST((n + 1) DIV 2 AS BIGINT)").alias("k")
    )
    bins = mc.groupBy(
        F.expr(f"CAST(cents DIV {BIN} AS BIGINT)").alias("bkt")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # cumulative over the tiny bin list (documented tiny-window pattern)
    w = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, 0)
    cum = bins.withColumn("cum", F.sum("cnt").over(w))
    med_bin = (
        cum.crossJoin(F.broadcast(tot))
        .filter(
            (F.col("cum") >= F.col("k"))
            & (F.col("cum") - F.col("cnt") < F.col("k"))
        )
        .select(
            "bkt", (F.col("k") - (F.col("cum") - F.col("cnt"))).alias("off")
        )
    )
    in_bin = mc.join(
        F.broadcast(med_bin),
        F.expr(f"CAST(cents DIV {BIN} AS BIGINT)") == F.col("bkt"),
    )
    # rank VALUES, not rows: the bin's row count scales with data, but
    # its distinct cents values are bounded by the bin width (<= BIN),
    # so aggregate to value-grain counts first and pick the value whose
    # cumulative range [cum-cnt, cum) contains the in-bin offset —
    # the ordered window then runs over a bounded (<= BIN rows) input
    vals = in_bin.groupBy(
        F.col("cents").alias("bin_cents"), F.col("off")
    ).agg(F.count(F.lit(1)).alias("vc"))
    w_rank = W.orderBy("bin_cents").rowsBetween(W.unboundedPreceding, 0)
    kth = (
        vals.withColumn("vcum", F.sum("vc").over(w_rank))
        .filter(
            (F.col("vcum") >= F.col("off"))
            & (F.col("vcum") - F.col("vc") < F.col("off"))
        )
        .select(F.col("bin_cents").alias("median_cents"))
    )
    return tot.crossJoin(F.broadcast(kth)).select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.col("median_cents").cast("long").alias("median_cents"),
    )


# --- privacy governance: k-anonymity / l-diversity audit -------------------


@register(
    "k_anonymity_audit",
    oracle="""
    , qg AS (
        SELECT c_nationkey, c_mktsegment,
               count(*) AS grp_n,
               count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
                   AS l_div
        FROM customer GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN grp_n < 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_small_groups,
           CAST(sum(CASE WHEN grp_n < 10 THEN grp_n ELSE 0 END) AS BIGINT)
               AS rows_at_risk,
           CAST(min(grp_n) AS BIGINT) AS k_anonymity,
           CAST(min(l_div) AS BIGINT) AS l_diversity
    FROM qg
    """,
    doc="Privacy-governance audit before a data release: group the "
    "table by its quasi-identifiers (nation x market segment), report "
    "the achieved k-anonymity (smallest group), the number of "
    "re-identifiable groups below k=10 with their row exposure, and "
    "the achieved l-diversity (fewest distinct sensitive-attribute "
    "buckets — $1000 balance bands — in any group).  One "
    "partial-aggregated groupBy plus a constant-width rollup; the "
    "sensitive-bucket floor is integer on both engines (balances can "
    "be negative: floor, never int-cast).",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    qg = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("grp_n"),
        F.countDistinct(
            F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)")
        ).alias("l_div"),
    )
    return qg.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("grp_n") < 10, 1).otherwise(0))
        .cast("long")
        .alias("n_small_groups"),
        F.sum(F.when(F.col("grp_n") < 10, F.col("grp_n")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("grp_n").cast("long").alias("k_anonymity"),
        F.min("l_div").cast("long").alias("l_diversity"),
    )


# --- association rules (confidence / lift) ---------------------------------


@register(
    "association_rules_parts",
    oracle="""
    , basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    items AS (
        SELECT l_partkey AS item, count(*) AS supp FROM basket GROUP BY 1
    ),
    prc AS (
        SELECT x.l_partkey AS a, y.l_partkey AS b, count(*) AS supp_ab
        FROM basket x JOIN basket y ON x.l_orderkey = y.l_orderkey
                                   AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2
    ),
    nb AS (SELECT count(DISTINCT l_orderkey) AS n FROM basket),
    rules AS (
        SELECT a AS antecedent, b AS consequent, supp_ab FROM prc
        UNION ALL
        SELECT b, a, supp_ab FROM prc
    )
    SELECT CAST(antecedent AS BIGINT) AS antecedent,
           CAST(consequent AS BIGINT) AS consequent,
           CAST(supp_ab AS BIGINT) AS supp_ab,
           CAST(1000000 * supp_ab // ia.supp AS BIGINT) AS conf_ppm,
           CAST(1000000 * supp_ab * (SELECT n FROM nb)
                // (ia.supp * ic.supp) AS BIGINT) AS lift_ppm
    FROM rules
    JOIN items ia ON ia.item = antecedent
    JOIN items ic ON ic.item = consequent
    WHERE supp_ab >= 3
    ORDER BY conf_ppm DESC, antecedent, consequent LIMIT 50
    """,
    doc="Association-rule mining over order baskets: for every part "
    "pair co-purchased in >=3 orders, both directed rules with "
    "confidence = supp(ab)/supp(a) and lift = supp(ab)·N/"
    "(supp(a)·supp(b)) in exact integer ppm — the market-basket "
    "recommender readout (frequent-itemset stage of Apriori at "
    "k=2).  Rides the single-grouped-explode pair derivation "
    "(no fact self-join), joins the item-support dim twice, and "
    "finishes with a distributed TakeOrdered(50) under a total-order "
    "tie-break.  The support floor bounds rule fan-out at any scale.",
)
def association_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    basket = li.distinct().transform(snapshot, eager=False)
    items = basket.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count(F.lit(1)).alias("supp")
    )
    baskets = (
        basket.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    e1 = baskets.select("parts", F.posexplode("parts").alias("i", "pk1"))
    prc = (
        e1.select("i", "pk1", F.posexplode("parts").alias("j", "pk2"))
        .filter(F.col("j") > F.col("i"))
        .groupBy(F.col("pk1").alias("a"), F.col("pk2").alias("b"))
        .agg(F.count(F.lit(1)).alias("supp_ab"))
        .filter(F.col("supp_ab") >= 3)
    )
    nb = basket.agg(
        F.countDistinct("l_orderkey").alias("n")
    )
    rules = prc.select(
        F.col("a").alias("antecedent"),
        F.col("b").alias("consequent"),
        "supp_ab",
    ).union(
        prc.select(F.col("b"), F.col("a"), "supp_ab")
    )
    ia = items.select(
        F.col("item").alias("ia_item"), F.col("supp").alias("ia_supp")
    )
    ic = items.select(
        F.col("item").alias("ic_item"), F.col("supp").alias("ic_supp")
    )
    return (
        rules.join(ia, F.col("antecedent") == F.col("ia_item"))
        .join(ic, F.col("consequent") == F.col("ic_item"))
        .crossJoin(F.broadcast(nb))
        .select(
            F.col("antecedent").cast("long").alias("antecedent"),
            F.col("consequent").cast("long").alias("consequent"),
            F.col("supp_ab").cast("long").alias("supp_ab"),
            F.expr("CAST(1000000 * supp_ab DIV ia_supp AS BIGINT)").alias(
                "conf_ppm"
            ),
            F.expr(
                "CAST(1000000 * supp_ab * n DIV (ia_supp * ic_supp) "
                "AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("conf_ppm"), "antecedent", "consequent")
        .limit(50)
    )


# --- BFS hop distribution from the hub part --------------------------------

_BFS_ROUNDS = 4


def _bfs_oracle() -> str:
    parts = [
        """
    , basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    bprs AS (
        SELECT x.l_partkey AS a, y.l_partkey AS b
        FROM basket x JOIN basket y ON x.l_orderkey = y.l_orderkey
                                   AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2
    ),
    edges AS (SELECT a AS src, b AS dst FROM bprs
              UNION ALL SELECT b, a FROM bprs),
    deg AS (SELECT src AS v, count(*) AS d FROM edges GROUP BY src),
    hub AS (
        SELECT v FROM deg
        ORDER BY d DESC, v LIMIT 1
    ),
    d0 AS (
        SELECT v, CASE WHEN v = (SELECT v FROM hub) THEN 0 END AS dist
        FROM deg
    )"""
    ]
    for k in range(1, _BFS_ROUNDS + 1):
        parts.append(
            f""",
    d{k} AS (
        SELECT p.v,
               least(p.dist,
                     (SELECT min(q.dist) + 1
                      FROM edges e JOIN d{k - 1} q ON q.v = e.src
                      WHERE e.dst = p.v AND q.dist IS NOT NULL)) AS dist
        FROM d{k - 1} p
    )"""
        )
    parts.append(
        f"""
    SELECT CAST(coalesce(dist, -1) AS BIGINT) AS hop,
           CAST(count(*) AS BIGINT) AS n_parts
    FROM d{_BFS_ROUNDS} GROUP BY 1"""
    )
    return "".join(parts)


@register(
    "bfs_hops_from_hub",
    oracle=_bfs_oracle(),
    doc=f"BFS hop-distance distribution from the hub part (highest "
    "co-purchase degree, id tie-break) — the reachability/diameter "
    f"probe of the graph family, {_BFS_ROUNDS} unrolled frontier "
    "rounds: dist_k+1(v) = min(dist_k(v), 1 + min over in-edges), "
    "exactly the iterative-join shape of PageRank but with a MIN "
    "semiring instead of sum — integer hops, bit-exact on any "
    "engine.  Unreached parts report hop −1.  Each round is one "
    "edge join + min-aggregate; the output is a ≤6-row histogram "
    "regardless of scale.",
    tags=("operator", "iterative"),
)
def bfs_hops_from_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    e1 = baskets.select("parts", F.posexplode("parts").alias("i", "pk1"))
    und = (
        e1.select("i", "pk1", F.posexplode("parts").alias("j", "pk2"))
        .filter(F.col("j") > F.col("i"))
        .select(F.col("pk1").alias("a"), F.col("pk2").alias("b"))
        .distinct()
    )
    edges = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(und.select(F.col("b"), F.col("a")))
        .repartition(spark.sparkContext.defaultParallelism, "src")
        .transform(snapshot, eager=False)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    hub = deg.orderBy(F.desc("d"), "src").limit(1).select(
        F.col("src").alias("hub_v")
    )
    dist = deg.crossJoin(F.broadcast(hub)).select(
        F.col("src").alias("v"),
        F.when(F.col("src") == F.col("hub_v"), F.lit(0))
        .cast("long")
        .alias("dist"),
    )
    for k in range(_BFS_ROUNDS):
        inc = (
            dist.filter(F.col("dist").isNotNull())
            .join(edges, dist["v"] == edges["src"])
            .groupBy(F.col("dst").alias("iv"))
            .agg((F.min("dist") + 1).alias("reach"))
        )
        dist = (
            dist.join(inc, dist["v"] == inc["iv"], "left")
            .select("v", F.least("dist", "reach").alias("dist"))
        )
        if k % 2 == 1:
            dist = dist.transform(snapshot, eager=False)
    return dist.groupBy(
        F.coalesce("dist", F.lit(-1)).cast("long").alias("hop")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_parts"))


# --- RFM customer segmentation (banded) ------------------------------------


@register(
    "rfm_banded_segments",
    oracle="""
    , rfm_anchor AS (SELECT CAST(max(o_orderdate) AS DATE) AS d1 FROM orders),
    per_cust AS (
        SELECT o_custkey,
               datediff('day', CAST(max(o_orderdate) AS DATE),
                        (SELECT d1 FROM rfm_anchor)) AS rec_days,
               count(*) AS freq,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT CASE WHEN rec_days < 90 THEN 5 WHEN rec_days < 365 THEN 4
                    WHEN rec_days < 730 THEN 3 WHEN rec_days < 1460 THEN 2
                    ELSE 1 END AS r_score,
               CASE WHEN freq >= 30 THEN 5 WHEN freq >= 20 THEN 4
                    WHEN freq >= 10 THEN 3 WHEN freq >= 5 THEN 2
                    ELSE 1 END AS f_score,
               CASE WHEN cents >= 40000000 THEN 5
                    WHEN cents >= 20000000 THEN 4
                    WHEN cents >= 10000000 THEN 3
                    WHEN cents >= 2000000 THEN 2 ELSE 1 END AS m_score,
               cents
        FROM per_cust
    )
    SELECT CAST(r_score AS INTEGER) AS r_score,
           CAST(f_score AS INTEGER) AS f_score,
           CAST(m_score AS INTEGER) AS m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS segment_cents
    FROM scored GROUP BY 1, 2, 3
    """,
    doc="RFM customer segmentation: per customer, recency (days since "
    "last order, anchored to the data's own max date), frequency "
    "(order count) and monetary value (exact cents), scored into "
    "fixed bands and rolled up to the <=125-cell segment grid with "
    "customer counts and segment value — the CRM targeting matrix.  "
    "Banded (not quantile) scoring keeps the whole pipeline exact "
    "integers and distributive: one per-customer aggregate, one "
    "constant-width rollup, no ranking window anywhere.",
)
def rfm_banded_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("d1")
    )
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(
                F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
            ).alias("cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn("rec_days", F.datediff("d1", "last_d"))
    )
    r_score = (
        F.when(F.col("rec_days") < 90, 5)
        .when(F.col("rec_days") < 365, 4)
        .when(F.col("rec_days") < 730, 3)
        .when(F.col("rec_days") < 1460, 2)
        .otherwise(1)
    )
    f_score = (
        F.when(F.col("freq") >= 30, 5)
        .when(F.col("freq") >= 20, 4)
        .when(F.col("freq") >= 10, 3)
        .when(F.col("freq") >= 5, 2)
        .otherwise(1)
    )
    m_score = (
        F.when(F.col("cents") >= 40000000, 5)
        .when(F.col("cents") >= 20000000, 4)
        .when(F.col("cents") >= 10000000, 3)
        .when(F.col("cents") >= 2000000, 2)
        .otherwise(1)
    )
    return (
        per_cust.select(
            r_score.cast("int").alias("r_score"),
            f_score.cast("int").alias("f_score"),
            m_score.cast("int").alias("m_score"),
            "cents",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("segment_cents"),
        )
    )


@register(
    "item_item_cosine_topk",
    bench=True,
    oracle="""
    , basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    supp AS (
        SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS n
        FROM basket GROUP BY 1
    ),
    pc AS (
        SELECT x.l_partkey AS pk1, y.l_partkey AS pk2,
               CAST(count(*) AS BIGINT) AS co
        FROM basket x
        JOIN basket y ON x.l_orderkey = y.l_orderkey
                     AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 2
    ),
    sym AS (
        SELECT pk1 AS part, pk2 AS nbr, co FROM pc
        UNION ALL
        SELECT pk2 AS part, pk1 AS nbr, co FROM pc
    ),
    sc AS (
        SELECT s.part, s.nbr, s.co, a.n AS n_part, b.n AS n_nbr,
               CAST(floor(s.co / sqrt(CAST(a.n * b.n AS DOUBLE)) * 10000)
                    AS BIGINT) AS cosine_x10000
        FROM sym s
        JOIN supp a ON a.pk = s.part
        JOIN supp b ON b.pk = s.nbr
    )
    SELECT CAST(part AS BIGINT) AS part, CAST(nbr AS BIGINT) AS nbr,
           n_part, n_nbr, co AS co_orders, cosine_x10000, rk
    FROM (
        SELECT *, CAST(row_number() OVER (
                   PARTITION BY part
                   ORDER BY cosine_x10000 DESC, nbr) AS BIGINT) AS rk
        FROM sc
    ) WHERE rk <= 3
    """,
    doc="Item-item collaborative-filtering neighborhood: cosine "
    "similarity between parts over their co-purchase order sets "
    "(cos = co / sqrt(n_a*n_b)), top-3 neighbors per part with "
    "support >= 2.  Pair generation reuses the bounded-basket "
    "array-explode shape (orders hold <=7 parts => <=21 pairs "
    "map-side, ONE fact shuffle); supports join as a part-dim "
    "broadcast.  sqrt is IEEE-correctly-rounded so the double is "
    "bit-identical cross-engine, and the surface is floor "
    "fixed-point x10000 per the round-of-raw-double invariant; "
    "per-part ranking is total-ordered (cosine DESC, nbr).",
    tags=("recommender", "join"),
)
def item_item_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    basket = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    supp = (
        basket.select(F.explode("parts").alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    e1 = basket.filter(F.size("parts") >= 2).select(
        "parts", F.posexplode("parts").alias("i", "pk1")
    )
    pc = (
        e1.select("i", "pk1", F.posexplode("parts").alias("j", "pk2"))
        .filter(F.col("j") > F.col("i"))
        .groupBy("pk1", "pk2")
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
        .filter(F.col("co") >= 2)
    )
    sym = pc.select(
        F.col("pk1").alias("part"), F.col("pk2").alias("nbr"), "co"
    ).unionAll(
        pc.select(
            F.col("pk2").alias("part"), F.col("pk1").alias("nbr"), "co"
        )
    )
    sc = (
        sym.join(
            (supp.select(F.col("pk").alias("part"),
                                    F.col("n").alias("n_part"))),
            "part",
        )
        .join(
            (supp.select(F.col("pk").alias("nbr"),
                                    F.col("n").alias("n_nbr"))),
            "nbr",
        )
        .select(
            "part", "nbr", "co", "n_part", "n_nbr",
            F.expr(
                "CAST(floor(co / sqrt(CAST(n_part * n_nbr AS DOUBLE))"
                " * 10000) AS BIGINT)"
            ).alias("cosine_x10000"),
        )
    )
    w = W.partitionBy("part").orderBy(F.desc("cosine_x10000"), F.asc("nbr"))
    return (
        sc.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("part").cast("long").alias("part"),
            F.col("nbr").cast("long").alias("nbr"),
            "n_part", "n_nbr",
            F.col("co").alias("co_orders"),
            "cosine_x10000", "rk",
        )
    )


@register(
    "chi_square_type_dow",
    oracle="""
    , cells AS (
        SELECT event_type, CAST(isodow(ts) AS INTEGER) AS iso_dow,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    rowsums AS (
        SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1
    ),
    colsums AS (
        SELECT iso_dow, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
    contrib AS (
        SELECT ce.event_type,
               CAST((CAST(ce.o AS HUGEINT) * t.n - CAST(rs.r AS HUGEINT)
                     * cs.c) * (CAST(ce.o AS HUGEINT) * t.n
                     - CAST(rs.r AS HUGEINT) * cs.c) * 1000000
                    // (CAST(rs.r AS HUGEINT) * cs.c * t.n) AS BIGINT)
                   AS chi2_cell_ppm
        FROM cells ce
        JOIN rowsums rs USING (event_type)
        JOIN colsums cs USING (iso_dow)
        CROSS JOIN tot t
    )
    SELECT c.event_type, r.r AS n_events,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(chi2_cell_ppm) AS BIGINT) AS chi2_ppm
    FROM contrib c JOIN rowsums r USING (event_type)
    GROUP BY 1, 2
    """,
    doc="Chi-square test of independence between event_type and ISO "
    "day-of-week, per-type contributions: cell statistic "
    "(O*N - R*C)^2 / (R*C*N) kept as exact HUGEINT/DECIMAL(38,0) "
    "integers with one floor fixed-point (ppm) per cell — both "
    "engines quantize identically, no float accumulation.  High "
    "chi2_ppm for a type means its traffic has a weekly rhythm "
    "(seasonality screen before modeling).  The contingency table is "
    "one partial-agg'd shuffle; margins and the statistic run on the "
    "|types|x7 cell relation.",
    tags=("stats",),
)
def chi_square_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        (F.weekday("ts") + 1).cast("int").alias("iso_dow"),
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    rowsums = cells.groupBy("event_type").agg(
        F.sum("o").cast("long").alias("r")
    )
    colsums = cells.groupBy("iso_dow").agg(
        F.sum("o").cast("long").alias("c")
    )
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    contrib = (
        cells.join(F.broadcast(rowsums), "event_type")
        .join(F.broadcast(colsums), "iso_dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            F.expr(
                "CAST((CAST(o AS DECIMAL(38,0)) * n - CAST(r AS"
                " DECIMAL(38,0)) * c) * (CAST(o AS DECIMAL(38,0)) * n"
                " - CAST(r AS DECIMAL(38,0)) * c) * 1000000"
                " div (CAST(r AS DECIMAL(38,0)) * c * n) AS BIGINT)"
            ).alias("chi2_cell_ppm"),
        )
    )
    return (
        contrib.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("chi2_cell_ppm").cast("long").alias("chi2_ppm"),
        )
        .join(F.broadcast(rowsums), "event_type")
        .select(
            "event_type",
            F.col("r").alias("n_events"),
            "n_cells",
            "chi2_ppm",
        )
    )


@register(
    "seasonal_index_monthly",
    oracle="""
    , monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders GROUP BY 1
    ),
    ma AS (
        SELECT m, rev_cents,
               CASE WHEN count(*) OVER w = 12
                    THEN sum(rev_cents) OVER w // 12
               END AS trend_cents
        FROM monthly
        WINDOW w AS (ORDER BY m ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)
    ),
    ratio AS (
        SELECT CAST(month(m) AS INTEGER) AS month_of_year,
               rev_cents * 1000000 // trend_cents AS idx_ppm
        FROM ma WHERE trend_cents IS NOT NULL
    )
    SELECT month_of_year,
           CAST(count(*) AS BIGINT) AS n_years,
           CAST(sum(idx_ppm) // count(*) AS BIGINT) AS seasonal_index_ppm,
           CAST(min(idx_ppm) AS BIGINT) AS min_idx_ppm,
           CAST(max(idx_ppm) AS BIGINT) AS max_idx_ppm
    FROM ratio GROUP BY month_of_year
    """,
    doc="Classical ratio-to-moving-average seasonal decomposition of "
    "monthly order revenue: trend = centered 12-month moving average "
    "(full windows only), seasonal ratio = month/trend in integer "
    "ppm, then the per-calendar-month index averaged across years — "
    "the pre-model seasonality screen.  Revenue quantizes to exact "
    "cents at the row level (FLOAT-SUM ORDER rule) and every "
    "division is integral, so both engines agree exactly.  The "
    "monthly rollup is the only fact-table shuffle; the window runs "
    "over |months| rows.",
    tags=("timeseries", "stats"),
)
def seasonal_index_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m")
    ).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .cast("long")
        .alias("rev_cents")
    )
    w = W.orderBy("m").rowsBetween(-6, 5)
    ma = monthly.select(
        "m",
        "rev_cents",
        F.count(F.lit(1)).over(w).alias("cnt_w"),
        F.sum("rev_cents").over(w).alias("sum_w"),
    ).select(
        "m",
        "rev_cents",
        F.when(
            F.col("cnt_w") == 12, F.expr("sum_w div 12")
        ).alias("trend_cents"),
    )
    ratio = ma.where(F.col("trend_cents").isNotNull()).select(
        F.month("m").cast("int").alias("month_of_year"),
        F.expr("rev_cents * 1000000 div trend_cents").alias("idx_ppm"),
    )
    return ratio.groupBy("month_of_year").agg(
        F.count(F.lit(1)).cast("long").alias("n_years"),
        F.expr("CAST(sum(idx_ppm) div count(*) AS BIGINT)").alias(
            "seasonal_index_ppm"
        ),
        F.min("idx_ppm").cast("long").alias("min_idx_ppm"),
        F.max("idx_ppm").cast("long").alias("max_idx_ppm"),
    )


_FD_CANDIDATES = (
    ("l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
    ("l_orderkey->l_returnflag", "lineitem", "l_orderkey", "l_returnflag"),
    ("o_custkey->o_orderstatus", "orders", "o_custkey", "o_orderstatus"),
    ("c_custkey->c_nationkey", "customer", "c_custkey", "c_nationkey"),
)


@register(
    "fd_discovery_audit",
    oracle="\n    UNION ALL\n".join(
        f"""
    SELECT '{name}' AS candidate,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
           CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS violation_ppm,
           CAST(max(ndv) AS BIGINT) AS max_rhs_ndv
    FROM (
        SELECT {lhs}, count(DISTINCT {rhs}) AS ndv
        FROM {tbl} GROUP BY {lhs}
    )"""
        for name, tbl, lhs, rhs in _FD_CANDIDATES
    ),
    doc="Functional-dependency discovery audit (the data-profiling "
    "primitive behind schema inference and normalization advice): for "
    "each candidate lhs->rhs, the share of lhs keys mapping to more "
    "than one rhs value.  c_custkey->c_nationkey is a true FD "
    "(violation_ppm = 0, the detector's negative control); the "
    "others measure real violation mass in integer ppm.  Each "
    "candidate is one partial-agg'd groupBy on its lhs; candidates "
    "union at the summary level (4 rows), never the fact level.",
    tags=("dq", "profiling"),
)
def fd_discovery_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for name, tbl, lhs, rhs in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, tbl)
        g = t.groupBy(lhs).agg(F.countDistinct(rhs).alias("ndv"))
        outs.append(
            g.agg(
                F.lit(name).alias("candidate"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum(F.when(F.col("ndv") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating"),
                F.expr(
                    "CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END)"
                    " * 1000000 div count(*) AS BIGINT)"
                ).alias("violation_ppm"),
                F.max("ndv").cast("long").alias("max_rhs_ndv"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


# Business-day arithmetic: weekdays-since-origin prefix function
# f(d) = 5*(n div 7) + LUT[n % 7], n = days since Monday 1990-01-01.
# The LUT is the cumulative weekday count inside a week starting Monday;
# business days in (d0, d1] = f(d1) - f(d0).  Pure integer date math —
# identical on both engines, no calendar UDF.
_BD_ORIGIN = "1990-01-01"  # a Monday, safely before every fixture date
_BD_LUT = (0, 1, 2, 3, 4, 5, 5)  # cum weekdays after n%7 days from Monday
_BD_LUT_SQL = "[" + ", ".join(str(x) for x in _BD_LUT) + "]"


@register(
    "business_day_ship_latency",
    oracle=f"""
    , f AS (
        SELECT o_orderpriority,
               (5 * (datediff('day', DATE '{_BD_ORIGIN}',
                              CAST(l_shipdate AS DATE)) // 7)
                + ({_BD_LUT_SQL})[datediff('day', DATE '{_BD_ORIGIN}',
                                  CAST(l_shipdate AS DATE)) % 7 + 1])
             - (5 * (datediff('day', DATE '{_BD_ORIGIN}',
                              CAST(o_orderdate AS DATE)) // 7)
                + ({_BD_LUT_SQL})[datediff('day', DATE '{_BD_ORIGIN}',
                                  CAST(o_orderdate AS DATE)) % 7 + 1])
               AS bd
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(sum(bd) AS BIGINT) AS total_bd,
           CAST(sum(bd) * 1000000 // count(*) AS BIGINT) AS mean_bd_ppm,
           CAST(min(bd) AS BIGINT) AS min_bd,
           CAST(max(bd) AS BIGINT) AS max_bd
    FROM f GROUP BY o_orderpriority
    """,
    doc="Shipping latency in BUSINESS days per order priority: weekday "
    "count between order and ship date via the prefix function "
    "f(d) = 5*(days_since_Monday_origin div 7) + LUT[rem] — integer "
    "date arithmetic with a 7-entry literal table instead of a "
    "calendar UDF, so both engines agree exactly and the expression "
    "stays inside codegen.  Rows shipping before their order date "
    "(an artifact of independently drawn fixture dates) are excluded.  "
    "The orders join shuffles on the order "
    "key (fact-fact equi-join, AQE-skew-safe); everything after is a "
    "partial-agg'd rollup.  SLA dashboards count weekends out — "
    "calendar-day latency (ship_latency_histogram) overstates misses.",
    tags=("analytics", "calendar"),
)
def business_day_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lut = F.array(*[F.lit(x) for x in _BD_LUT])

    def f_of(col: str):
        n = F.datediff(F.col(col).cast("date"), F.lit(_BD_ORIGIN).cast("date"))
        return F.expr(
            f"5 * (datediff(CAST({col} AS DATE), DATE '{_BD_ORIGIN}') div 7)"
        ) + F.element_at(lut, (n % 7 + 1).cast("int"))

    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # the synthetic fixture draws ship and order dates independently,
        # so ~half the pairs ship "before" ordering; latency is defined
        # on the physically sensible population only
        .where(
            F.col("l_shipdate").cast("date")
            >= F.col("o_orderdate").cast("date")
        )
        .select(
            "o_orderpriority",
            (f_of("l_shipdate") - f_of("o_orderdate")).alias("bd"),
        )
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        F.sum("bd").cast("long").alias("total_bd"),
        F.expr("CAST(sum(bd) * 1000000 div count(*) AS BIGINT)").alias(
            "mean_bd_ppm"
        ),
        F.min("bd").cast("long").alias("min_bd"),
        F.max("bd").cast("long").alias("max_bd"),
    )


@register(
    "open_orders_backlog_monthly",
    oracle="""
    , spans AS (
        SELECT o.o_orderkey, o.o_orderpriority,
               CAST(o.o_orderdate AS DATE) AS placed,
               CAST(max(l.l_shipdate) AS DATE) AS last_ship
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2, 3
    ),
    months AS (
        SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS m
        FROM orders
    )
    SELECT m.m AS month,
           CAST(count(*) AS BIGINT) AS n_open,
           CAST(sum(CASE WHEN s.o_orderpriority LIKE '1%'
                           OR s.o_orderpriority LIKE '2%'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_open_urgent
    FROM months m
    JOIN spans s ON s.placed <= m.m AND s.last_ship > m.m
    GROUP BY m.m
    """,
    doc="Open-order backlog sampled at each month start: orders placed "
    "on or before the sample date whose last lineitem ships strictly "
    "after it — the interval-overlap COUNT pattern (how many "
    "in-flight intervals cover each instant).  The span relation is "
    "one fact-fact shuffle (max ship date per order); the sample "
    "grid is the tiny distinct-months dim, so the inequality join is "
    "a broadcast nested loop whose output is bounded by "
    "|open spans| x |covering months| — the right plan when one side "
    "is a handful of timestamps, vs. the O(n^2) self-join a naive "
    "approach runs.  Urgent backlog (priority 1-2) rides along.",
    tags=("analytics", "interval"),
)
def open_orders_backlog_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    spans = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_orderdate").cast("date").alias("placed"),
        )
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("last_ship"))
    )
    months = orders.select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m")
    ).distinct()
    urgent = F.col("o_orderpriority").startswith("1") | F.col(
        "o_orderpriority"
    ).startswith("2")
    j = spans.join(
        F.broadcast(months),
        (F.col("placed") <= F.col("m")) & (F.col("last_ship") > F.col("m")),
    )
    return j.groupBy(F.col("m").alias("month")).agg(
        F.count(F.lit(1)).cast("long").alias("n_open"),
        F.sum(F.when(urgent, 1).otherwise(0))
        .cast("long")
        .alias("n_open_urgent"),
    )


@register(
    "supplier_latency_consistency",
    oracle="""
    , lat AS (
        SELECT l.l_suppkey AS suppkey,
               datediff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS d
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
    ),
    st AS (
        SELECT suppkey,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(d) * 1000000 // count(*) AS BIGINT) AS mean_ppm,
               CAST((count(*) * sum(CAST(d AS HUGEINT) * d)
                     - CAST(sum(d) AS HUGEINT) * sum(d))
                    // (CAST(count(*) AS HUGEINT) * count(*)) AS BIGINT)
                   AS var_days2
        FROM lat GROUP BY suppkey HAVING count(*) >= 20
    )
    SELECT CAST(suppkey AS BIGINT) AS suppkey, n, mean_ppm, var_days2
    FROM st ORDER BY var_days2, suppkey LIMIT 10
    """,
    doc="Supplier lead-time consistency ranking: per-supplier shipping "
    "latency variance from the exact integer identity "
    "(n*sum(d^2)-(sum d)^2)/n^2 in HUGEINT/DECIMAL(38,0) — the 10 "
    "most predictable suppliers (min support 20) with mean latency "
    "in ppm days.  Procurement wants low variance, not low mean: a "
    "consistently-slow supplier is plannable, an erratic one is "
    "not.  One fact-fact shuffle for the order-date join, "
    "partial-agg'd supplier rollup, distributed TakeOrdered(10).  "
    "Excludes fixture rows shipping before their order date.",
    tags=("analytics", "stats"),
)
def supplier_latency_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lat = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            F.col("l_shipdate").cast("date")
            >= F.col("o_orderdate").cast("date")
        )
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("d"),
        )
    )
    st = (
        lat.groupBy("suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("CAST(sum(d) * 1000000 div count(*) AS BIGINT)").alias(
                "mean_ppm"
            ),
            F.expr(
                "CAST((count(*) * sum(CAST(d AS DECIMAL(38,0)) * d)"
                " - CAST(sum(d) AS DECIMAL(38,0)) * sum(d))"
                " div (CAST(count(*) AS DECIMAL(38,0)) * count(*))"
                " AS BIGINT)"
            ).alias("var_days2"),
        )
        .where(F.col("n") >= 20)
    )
    return (
        st.select(
            F.col("suppkey").cast("long").alias("suppkey"),
            "n",
            "mean_ppm",
            "var_days2",
        )
        .orderBy("var_days2", "suppkey")
        .limit(10)
    )


_CVM_SPLIT = "1998-07-01"  # fixture midpoint: orders span 1995..2001


@register(
    "customer_value_migration",
    oracle=f"""
    , halves AS (
        SELECT o_custkey,
               CASE WHEN CAST(o_orderdate AS DATE) < DATE '{_CVM_SPLIT}'
                    THEN 1 ELSE 2 END AS half,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
    ),
    per_cust AS (
        SELECT o_custkey,
               sum(CASE WHEN half = 1 THEN cents ELSE 0 END) AS c1,
               sum(CASE WHEN half = 2 THEN cents ELSE 0 END) AS c2
        FROM halves GROUP BY o_custkey
    ),
    tiers AS (
        SELECT CASE WHEN c1 = 0 THEN 0
                    WHEN c1 >= 20000000 THEN 3
                    WHEN c1 >= 5000000 THEN 2 ELSE 1 END AS tier_h1,
               CASE WHEN c2 = 0 THEN 0
                    WHEN c2 >= 20000000 THEN 3
                    WHEN c2 >= 5000000 THEN 2 ELSE 1 END AS tier_h2,
               c2
        FROM per_cust
    )
    SELECT CAST(tier_h1 AS INTEGER) AS tier_h1,
           CAST(tier_h2 AS INTEGER) AS tier_h2,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(c2) AS BIGINT) AS h2_cents
    FROM tiers GROUP BY 1, 2
    """,
    doc="Customer value-tier migration matrix: spend tiers (absent/low/"
    "mid/high, fixed exact-cents bands) computed independently for "
    "the two halves of the order history and cross-tabulated — the "
    "lifecycle view behind churn/upsell planning (who moved up, who "
    "lapsed).  One per-customer aggregate with conditional sums "
    "(single fact shuffle), then a 16-cell rollup; all-integer "
    "surface, split date is a fixed literal at the fixture midpoint.",
    tags=("analytics", "crm"),
)
def customer_value_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
    h1 = F.col("o_orderdate").cast("date") < F.lit(_CVM_SPLIT).cast("date")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.when(h1, cents).otherwise(0)).alias("c1"),
        F.sum(F.when(~h1, cents).otherwise(0)).alias("c2"),
    )

    def tier(c):
        return (
            F.when(F.col(c) == 0, 0)
            .when(F.col(c) >= 20000000, 3)
            .when(F.col(c) >= 5000000, 2)
            .otherwise(1)
        )

    return (
        per_cust.select(
            tier("c1").cast("int").alias("tier_h1"),
            tier("c2").cast("int").alias("tier_h2"),
            "c2",
        )
        .groupBy("tier_h1", "tier_h2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("c2").cast("long").alias("h2_cents"),
        )
    )


# Time-decay attribution weights: 2^(-age_days/7) in integer micros,
# precomputed in Python (LIBM/CONSTANTS rule) for ages 0..29.
_TDA_W = [int(1_000_000 * 2 ** (-d / 7)) for d in range(30)]
_TDA_W_SQL = "[" + ", ".join(str(w) for w in _TDA_W) + "]"
_TDA_CH = ("view", "click", "signup")


@register(
    "time_decay_attribution",
    oracle=f"""
    , purch AS (
        SELECT event_id, user_id, epoch_us(ts) AS p_us,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT user_id, event_type AS channel, epoch_us(ts) AS t_us
        FROM events WHERE event_type IN {_TDA_CH!r}
    ),
    cred AS (
        SELECT p.event_id, p.cents, t.channel,
               ({_TDA_W_SQL})[CAST((p.p_us - t.t_us) // 86400000000
                                   AS INTEGER) + 1] AS w
        FROM purch p
        JOIN touch t ON t.user_id = p.user_id
                    AND t.t_us < p.p_us
                    AND p.p_us - t.t_us < 2592000000000
    ),
    shared AS (
        SELECT channel, cents * w // sum(w) OVER (PARTITION BY event_id)
                   AS credit_cents
        FROM cred
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_credits,
           CAST(sum(credit_cents) AS BIGINT) AS attributed_cents
    FROM shared GROUP BY channel
    """,
    doc="Time-decay multi-touch attribution: every touch (view/click/"
    "signup) in a 30-day lookback shares each purchase's value, "
    "weighted 2^(-age_days/7) from a Python-precomputed integer "
    "micro-weight table (LIBM rule — no pow() at query time), "
    "normalized per purchase by integer division so credits are "
    "exact and deterministic.  The purchase-touch join shuffles on "
    "user_id with the age predicate applied in-join (per-user "
    "fan-out bounded by a user's 30-day touch count); the per-"
    "purchase normalizing sum is a window over that join output.  "
    "Complements last-touch (winner-take-all) and linear (equal "
    "split) attribution already in the registry.",
    tags=("analytics", "attribution"),
)
def time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purch = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("p_us"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
    )
    touch = ev.where(F.col("event_type").isin(list(_TDA_CH))).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("channel"),
        F.unix_micros("ts").alias("t_us"),
    )
    w_arr = F.array(*[F.lit(w) for w in _TDA_W])
    cred = (
        purch.join(
            touch,
            (F.col("t_user") == F.col("user_id"))
            & (F.col("t_us") < F.col("p_us"))
            & (F.col("p_us") - F.col("t_us") < 2592000000000),
        )
        .select(
            "event_id",
            "cents",
            "channel",
            F.element_at(
                w_arr,
                F.expr(
                    "CAST((p_us - t_us) div 86400000000 AS INT) + 1"
                ),
            ).alias("w"),
        )
    )
    wp = W.partitionBy("event_id")
    shared = cred.select(
        "channel",
        F.expr("cents * w").alias("num"),
        F.sum("w").over(wp).alias("sum_w"),
    ).select("channel", F.expr("num div sum_w").alias("credit_cents"))
    return shared.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_credits"),
        F.sum("credit_cents").cast("long").alias("attributed_cents"),
    )


@register(
    "exposure_conversion_lift",
    oracle="""
    , per_user AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS exposed,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    g AS (
        SELECT exposed,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(converted) AS BIGINT) AS n_converted,
               CAST(sum(converted) * 1000000 // count(*) AS BIGINT)
                   AS conv_ppm
        FROM per_user GROUP BY exposed
    )
    SELECT CAST(e.exposed AS INTEGER) AS exposed,
           e.n_users, e.n_converted, e.conv_ppm,
           CAST(e.conv_ppm * 1000000
                // greatest(b.base_ppm, 1) AS BIGINT) AS lift_vs_unexposed_ppm
    FROM g e CROSS JOIN (
        SELECT coalesce(min(CASE WHEN exposed = 0 THEN conv_ppm END), 0)
                   AS base_ppm
        FROM g) b
    """,
    doc="Exposure-conversion readout at user-day granularity: same-day "
    "purchase rate on days the user clicked vs days they did not "
    "(per-user lifetime exposure is degenerate in this fixture - "
    "every user eventually clicks), with the exposed/unexposed "
    "lift ratio in ppm — the observational cut product teams read "
    "before any experiment (NOT causal: exposure is self-selected; "
    "the lift quantifies association only, which the column name "
    "makes explicit).  One per-user aggregate (two conditional "
    "maxes over user-days), a 2-row rollup, and a broadcast of the "
    "always-present baseline row (0 when no unexposed stratum).  "
    "All-integer surface.",
    tags=("analytics", "product"),
)
def exposure_conversion_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("exposed"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    g = per_user.groupBy("exposed").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.expr(
            "CAST(sum(converted) * 1000000 div count(*) AS BIGINT)"
        ).alias("conv_ppm"),
    )
    base = g.agg(
        F.coalesce(
            F.min(F.when(F.col("exposed") == 0, F.col("conv_ppm"))),
            F.lit(0),
        ).alias("base_ppm")
    )
    return g.crossJoin(F.broadcast(base)).select(
        F.col("exposed").cast("int").alias("exposed"),
        "n_users",
        "n_converted",
        "conv_ppm",
        F.expr(
            "CAST(conv_ppm * 1000000 div greatest(base_ppm, 1) AS BIGINT)"
        ).alias("lift_vs_unexposed_ppm"),
    )


@register(
    "cohort_ltv_curves",
    oracle="""
    , firsts AS (
        SELECT o_custkey,
               CAST(date_trunc('month', min(o_orderdate)) AS DATE)
                   AS cohort
        FROM orders GROUP BY o_custkey
    ),
    rev AS (
        SELECT f.cohort,
               (year(o.o_orderdate) - year(f.cohort)) * 12
               + month(o.o_orderdate) - month(f.cohort) AS age_m,
               CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    ),
    sizes AS (
        SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers
        FROM firsts GROUP BY cohort
    ),
    monthly AS (
        SELECT cohort, CAST(age_m AS INTEGER) AS age_m,
               CAST(sum(cents) AS BIGINT) AS rev_cents
        FROM rev GROUP BY cohort, age_m
    )
    SELECT m.cohort, m.age_m, s.n_customers, m.rev_cents,
           CAST(sum(m.rev_cents) OVER (PARTITION BY m.cohort
                                       ORDER BY m.age_m) AS BIGINT)
               AS cum_cents,
           CAST(sum(m.rev_cents) OVER (PARTITION BY m.cohort
                                       ORDER BY m.age_m)
                // s.n_customers AS BIGINT) AS ltv_per_cust_cents
    FROM monthly m JOIN sizes s USING (cohort)
    WHERE m.age_m <= 24
    """,
    doc="Cohort lifetime-value curves: customers cohorted by first-"
    "order month, cumulative revenue by month-age (0..24) and LTV "
    "per cohort member — the payback-period table subscription and "
    "retail finance teams live in.  Month-age is pure integer "
    "calendar arithmetic, revenue is exact cents, the cumulative is "
    "a per-cohort ordered window over the small (cohort, age) "
    "rollup.  Two fact shuffles total (first-order derivation, "
    "cohort-age rollup); the cohort-sizes dim broadcasts.",
    tags=("analytics", "crm"),
)
def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias(
            "cohort"
        )
    )
    rev = orders.join(firsts, "o_custkey").select(
        "cohort",
        (
            (F.year("o_orderdate") - F.year("cohort")) * 12
            + F.month("o_orderdate")
            - F.month("cohort")
        ).alias("age_m"),
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias(
            "cents"
        ),
    )
    sizes = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    monthly = rev.groupBy(
        "cohort", F.col("age_m").cast("int").alias("age_m")
    ).agg(F.sum("cents").cast("long").alias("rev_cents"))
    w = W.partitionBy("cohort").orderBy("age_m")
    return (
        monthly.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age_m",
            "n_customers",
            "rev_cents",
            F.sum("rev_cents").over(w).cast("long").alias("cum_cents"),
        )
        .withColumn(
            "ltv_per_cust_cents",
            F.expr("CAST(cum_cents div n_customers AS BIGINT)"),
        )
        .where(F.col("age_m") <= 24)
    )


@register(
    "next_order_backtest",
    oracle="""
    , seq AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn,
               count(*) OVER (PARTITION BY o_custkey) AS n
        FROM orders
    ),
    gaps AS (
        SELECT o_custkey, n, rn,
               datediff('day',
                        lag(d) OVER (PARTITION BY o_custkey
                                     ORDER BY rn), d) AS gap
        FROM seq
    ),
    train AS (  -- gaps between consecutive TRAIN orders (exclude final gap)
        SELECT o_custkey, gap FROM gaps
        WHERE gap IS NOT NULL AND rn < n AND n >= 3
    ),
    ranked AS (
        SELECT o_custkey, gap,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY gap, gap) AS gr,
               count(*) OVER (PARTITION BY o_custkey) AS gn
        FROM train
    ),
    med AS (
        SELECT o_custkey,
               CAST(sum(CASE WHEN gn % 2 = 1 THEN 2 * gap ELSE gap END)
                    AS BIGINT) AS med2
        FROM ranked
        WHERE (gn % 2 = 1 AND gr = (gn + 1) // 2)
           OR (gn % 2 = 0 AND gr IN (gn // 2, gn // 2 + 1))
        GROUP BY o_custkey
    ),
    final_gap AS (
        SELECT o_custkey, CAST(gap AS BIGINT) AS fgap
        FROM gaps WHERE rn = n AND n >= 3
    ),
    scored AS (
        SELECT c.c_mktsegment, abs(2 * f.fgap - m.med2) AS err2
        FROM final_gap f
        JOIN med m USING (o_custkey)
        JOIN customer c ON c.c_custkey = f.o_custkey
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(err2) AS BIGINT) AS total_err_x2_days,
           CAST(sum(err2) * 1000000 // (2 * count(*)) AS BIGINT)
               AS mae_days_ppm
    FROM scored GROUP BY c_mktsegment
    """,
    doc="Next-order-date backtest: predict each customer's final "
    "reorder interval with the median of their earlier intervals "
    "(leave-last-out), scored as MAE days per market segment.  The "
    "per-customer median is exact integer median-times-two (sum of "
    "the one or two middle ranked gaps), so no floats exist "
    "anywhere; customers need >= 3 orders.  Everything runs in two "
    "customer-keyed window passes over the orders fact plus a "
    "broadcast customer-dim join — the simplest defensible reorder "
    "model and the baseline any fancier one must beat.",
    tags=("analytics", "forecast"),
)
def next_order_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    wseq = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.row_number().over(wseq).alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("o_custkey"))
        .alias("n"),
    )
    wg = W.partitionBy("o_custkey").orderBy("rn")
    gaps = seq.select(
        "o_custkey",
        "n",
        "rn",
        F.datediff("d", F.lag("d").over(wg)).alias("gap"),
    )
    train = gaps.where(
        F.col("gap").isNotNull() & (F.col("rn") < F.col("n")) & (F.col("n") >= 3)
    ).select("o_custkey", "gap")
    wr = W.partitionBy("o_custkey").orderBy("gap", "gap")
    ranked = train.select(
        "o_custkey",
        "gap",
        F.row_number().over(wr).alias("gr"),
        F.count(F.lit(1)).over(W.partitionBy("o_custkey")).alias("gn"),
    )
    is_mid_odd = (F.col("gn") % 2 == 1) & (
        F.col("gr") == F.expr("(gn + 1) div 2")
    )
    is_mid_even = (F.col("gn") % 2 == 0) & (
        (F.col("gr") == F.expr("gn div 2"))
        | (F.col("gr") == F.expr("gn div 2 + 1"))
    )
    med = (
        ranked.where(is_mid_odd | is_mid_even)
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(F.col("gn") % 2 == 1, 2 * F.col("gap")).otherwise(
                    F.col("gap")
                )
            )
            .cast("long")
            .alias("med2")
        )
    )
    final_gap = gaps.where(
        (F.col("rn") == F.col("n")) & (F.col("n") >= 3)
    ).select("o_custkey", F.col("gap").cast("long").alias("fgap"))
    scored = (
        final_gap.join(med, "o_custkey")
        .join(
            (cust),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_mktsegment",
            F.abs(2 * F.col("fgap") - F.col("med2")).alias("err2"),
        )
    )
    return scored.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("err2").cast("long").alias("total_err_x2_days"),
        F.expr(
            "CAST(sum(err2) * 1000000 div (2 * count(*)) AS BIGINT)"
        ).alias("mae_days_ppm"),
    )


@register(
    "single_source_risk",
    oracle="""
    , ps AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY 1, 2
    ),
    per_part AS (
        SELECT pk, CAST(sum(cents) AS BIGINT) AS cents,
               CAST(max(cents) * 1000000 // sum(cents) AS BIGINT)
                   AS top_share_ppm
        FROM ps GROUP BY pk
    ),
    banded AS (
        SELECT CASE WHEN top_share_ppm > 150000 THEN 'concentrated'
                    WHEN top_share_ppm > 100000 THEN 'leaning'
                    ELSE 'diversified' END AS sourcing,
               cents
        FROM per_part
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM banded)
    SELECT sourcing,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(sum(cents) * 1000000 // (SELECT t FROM tot) AS BIGINT)
               AS revenue_share_ppm
    FROM banded GROUP BY sourcing
    """,
    doc="Supply-chain concentration audit: each part's revenue share "
    "through its TOP supplier (max/sum in exact integer ppm over the "
    "(part, supplier) rollup), banded into diversified / leaning / "
    "concentrated (10%/15% cuts - the fixture spreads every part "
    "over 8+ suppliers, so bands are set against its measured 4-24% "
    "top-share range) with the revenue flowing through "
    "each band — the concentrated band is the revenue at risk from "
    "one supplier failing, the first chart in a procurement risk "
    "review.  (A naive distinct-supplier count is degenerate in this "
    "fixture — every part has 8+ suppliers — so the meaningful axis "
    "is value concentration, same reasoning as part_supplier_hhi but "
    "surfaced as an actionable banding.)  Two partial-agg'd rollups, "
    "a 3-row banding, a broadcast scalar total.  All-integer.",
    tags=("analytics", "risk"),
)
def single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(
        F.sum(
            F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")
        )
        .cast("long")
        .alias("cents")
    )
    per_part = ps.groupBy("pk").agg(
        F.sum("cents").cast("long").alias("cents"),
        F.expr(
            "CAST(max(cents) * 1000000 div sum(cents) AS BIGINT)"
        ).alias("top_share_ppm"),
    )
    banded = per_part.select(
        F.when(F.col("top_share_ppm") > 150000, "concentrated")
        .when(F.col("top_share_ppm") > 100000, "leaning")
        .otherwise("diversified")
        .alias("sourcing"),
        "cents",
    )
    tot = banded.agg(F.sum("cents").cast("long").alias("t"))
    return (
        banded.groupBy("sourcing")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "sourcing",
            "n_parts",
            "revenue_cents",
            F.expr(
                "CAST(revenue_cents * 1000000 div t AS BIGINT)"
            ).alias("revenue_share_ppm"),
        )
    )


@register(
    "repeat_revenue_share",
    oracle="""
    , seq AS (
        SELECT o_custkey,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ),
    cust AS (SELECT c_custkey, c_mktsegment FROM customer)
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN s.rn = 1 THEN s.cents ELSE 0 END)
                AS BIGINT) AS first_order_cents,
           CAST(sum(CASE WHEN s.rn > 1 THEN s.cents ELSE 0 END)
                AS BIGINT) AS repeat_cents,
           CAST(sum(CASE WHEN s.rn > 1 THEN s.cents ELSE 0 END) * 1000000
                // sum(s.cents) AS BIGINT) AS repeat_share_ppm
    FROM seq s JOIN cust c ON c.c_custkey = s.o_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Repeat-revenue split per market segment: each customer's "
    "first order (total order ts, orderkey) vs everything after — "
    "the acquisition-vs-retention revenue mix.  One customer-keyed "
    "ranking window over the orders fact, a broadcast dim join, "
    "exact cents, repeat share in integer ppm.",
    tags=("analytics", "crm"),
)
def repeat_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias(
            "cents"
        ),
        F.row_number().over(w).alias("rn"),
    )
    return (
        seq.join(cust, seq.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.when(F.col("rn") == 1, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("first_order_cents"),
            F.sum(F.when(F.col("rn") > 1, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("repeat_cents"),
            # r08: the segment cents sum * 1e6 overflows int64 at the
            # 100x replica (stress-sweep witness) — DECIMAL(38,0) like
            # the oracle's HUGEINT sum; surface stays BIGINT
            F.expr(
                "CAST(sum(CASE WHEN rn > 1 THEN"
                " CAST(cents AS DECIMAL(38,0)) ELSE 0 END)"
                " * 1000000 div sum(CAST(cents AS DECIMAL(38,0)))"
                " AS BIGINT)"
            ).alias("repeat_share_ppm"),
        )
    )


_RB_Y0, _RB_Y1 = 1996, 1997


@register(
    "revenue_bridge_yoy",
    oracle=f"""
    , yr AS (
        SELECT p.p_brand,
               year(o.o_orderdate) AS y,
               CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents,
               CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE year(o.o_orderdate) IN ({_RB_Y0}, {_RB_Y1})
        GROUP BY 1, 2
    ),
    wide AS (
        SELECT p_brand,
               CAST(sum(CASE WHEN y = {_RB_Y0} THEN cents END) AS BIGINT)
                   AS rev0,
               CAST(sum(CASE WHEN y = {_RB_Y0} THEN qty END) AS BIGINT)
                   AS qty0,
               CAST(sum(CASE WHEN y = {_RB_Y1} THEN cents END) AS BIGINT)
                   AS rev1,
               CAST(sum(CASE WHEN y = {_RB_Y1} THEN qty END) AS BIGINT)
                   AS qty1
        FROM yr GROUP BY p_brand
        HAVING sum(CASE WHEN y = {_RB_Y0} THEN qty END) > 0
           AND sum(CASE WHEN y = {_RB_Y1} THEN qty END) > 0
    )
    SELECT p_brand, rev0, rev1,
           CAST(rev1 - rev0 AS BIGINT) AS delta_cents,
           CAST(CASE WHEN qty1 >= qty0
                     THEN (qty1 - qty0) * rev0 // qty0
                     ELSE -((qty0 - qty1) * rev0 // qty0)
                END AS BIGINT) AS volume_effect_cents,
           CAST((rev1 - rev0)
                - CASE WHEN qty1 >= qty0
                       THEN (qty1 - qty0) * rev0 // qty0
                       ELSE -((qty0 - qty1) * rev0 // qty0)
                  END AS BIGINT) AS price_mix_effect_cents
    FROM wide
    """,
    doc=f"Year-over-year revenue bridge per brand ({_RB_Y0}->{_RB_Y1}): "
    "the delta decomposed into a volume effect (quantity change at "
    "the base year's unit value, symmetric-truncated integer "
    "division per the signed-div invariant) and a price/mix "
    "residual defined as the exact remainder — so the two effects "
    "sum to the delta to the cent BY CONSTRUCTION, the property "
    "finance bridge charts require and floating-point decompositions "
    "lose.  One three-way join (two broadcast dims), a brand-year "
    "rollup, then pure integer arithmetic on the wide form.",
    tags=("analytics", "finance"),
)
def revenue_bridge_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("y")
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    yr = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("y").isin(_RB_Y0, _RB_Y1))
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "y")
        .agg(
            F.sum(
                F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")
            )
            .cast("long")
            .alias("cents"),
            F.sum(F.col("l_quantity").cast("long"))
            .cast("long")
            .alias("qty"),
        )
    )
    wide = (
        yr.groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("y") == _RB_Y0, F.col("cents")))
            .cast("long")
            .alias("rev0"),
            F.sum(F.when(F.col("y") == _RB_Y0, F.col("qty")))
            .cast("long")
            .alias("qty0"),
            F.sum(F.when(F.col("y") == _RB_Y1, F.col("cents")))
            .cast("long")
            .alias("rev1"),
            F.sum(F.when(F.col("y") == _RB_Y1, F.col("qty")))
            .cast("long")
            .alias("qty1"),
        )
        .where((F.col("qty0") > 0) & (F.col("qty1") > 0))
    )
    vol = (
        "CASE WHEN qty1 >= qty0 THEN (qty1 - qty0) * rev0 div qty0"
        " ELSE -((qty0 - qty1) * rev0 div qty0) END"
    )
    return wide.select(
        "p_brand",
        "rev0",
        "rev1",
        (F.col("rev1") - F.col("rev0")).cast("long").alias("delta_cents"),
        F.expr(f"CAST({vol} AS BIGINT)").alias("volume_effect_cents"),
        F.expr(f"CAST((rev1 - rev0) - ({vol}) AS BIGINT)").alias(
            "price_mix_effect_cents"
        ),
    )


@register(
    "hockey_stick_ratio",
    oracle="""
    , m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
               CAST(o_orderdate AS DATE) AS d
        FROM orders
    ),
    agg AS (
        SELECT mo,
               CAST(sum(cents) AS BIGINT) AS month_cents,
               CAST(sum(CASE WHEN d >= (mo + INTERVAL 1 MONTH
                                        - INTERVAL 7 DAY)
                             THEN cents ELSE 0 END) AS BIGINT)
                   AS last7_cents
        FROM m GROUP BY mo
    )
    SELECT mo AS month, month_cents, last7_cents,
           CAST(last7_cents * 1000000 // month_cents AS BIGINT)
               AS last7_share_ppm,
           CAST(CASE WHEN last7_cents * 1000000 // month_cents > 400000
                     THEN 1 ELSE 0 END AS INTEGER) AS hockey_stick
    FROM agg
    """,
    doc="Month-end loading ('hockey stick') detector: the share of "
    "each month's order value booked in its final 7 days — a share "
    "persistently above ~23% (7/30) means quota-driven pull-ins; "
    "months above 40% are flagged.  Month-end arithmetic is pure "
    "calendar integer math (month start + 1 month - 7 days), value "
    "is exact cents, share in integer ppm.  One partial-agg'd "
    "monthly rollup; the flag threshold is a literal.",
    tags=("analytics", "finance"),
)
def hockey_stick_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("mo"),
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias(
            "cents"
        ),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    last7 = F.col("d") >= F.date_sub(F.add_months(F.col("mo"), 1), 7)
    agg = m.groupBy("mo").agg(
        F.sum("cents").cast("long").alias("month_cents"),
        F.sum(F.when(last7, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("last7_cents"),
    )
    return agg.select(
        F.col("mo").alias("month"),
        "month_cents",
        "last7_cents",
        F.expr(
            "CAST(last7_cents * 1000000 div month_cents AS BIGINT)"
        ).alias("last7_share_ppm"),
        F.expr(
            "CAST(CASE WHEN last7_cents * 1000000 div month_cents"
            " > 400000 THEN 1 ELSE 0 END AS INT)"
        ).alias("hockey_stick"),
    )


@register(
    "degree_assortativity_copurchase",
    oracle="""
    , basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pc AS (
        SELECT x.l_partkey AS pk1, y.l_partkey AS pk2
        FROM basket x
        JOIN basket y ON x.l_orderkey = y.l_orderkey
                     AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    deg AS (
        SELECT pk, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT pk1 AS pk FROM pc UNION ALL SELECT pk2 FROM pc
        ) GROUP BY pk
    ),
    ends AS (  -- both orientations of every edge
        SELECT da.d AS x, db.d AS y
        FROM pc JOIN deg da ON da.pk = pc.pk1
                JOIN deg db ON db.pk = pc.pk2
        UNION ALL
        SELECT db.d, da.d
        FROM pc JOIN deg da ON da.pk = pc.pk1
                JOIN deg db ON db.pk = pc.pk2
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS BIGINT) AS sxy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS BIGINT) AS sxx,
               CAST(sum(CAST(y AS HUGEINT) * y) AS BIGINT) AS syy
        FROM ends
    )
    SELECT n AS n_edge_ends, sx AS sum_deg,
           CAST(floor(
               CAST(CAST(n AS DECIMAL(38,0)) * sxy
                    - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
               / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx
                           - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
                      * CAST(CAST(n AS DECIMAL(38,0)) * syy
                             - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))
               * 1000000) AS BIGINT) AS assortativity_x1e6
    FROM s
    """,
    doc="Degree assortativity of the co-purchase graph (Newman 2002): "
    "Pearson correlation of endpoint degrees over both edge "
    "orientations — positive means popular parts co-sell with other "
    "popular parts (hub-hub structure), negative means hub-spoke.  "
    "All sums are exact integers; the final statistic is one "
    "IEEE-exact sqrt and division surfaced as floor fixed-point "
    "x1e6 with the identical expression on both engines.  Edges "
    "come from the bounded-basket pair shape (support >= 2); "
    "degrees join back as a broadcast dim.",
    tags=("analytics", "graph"),
)
def degree_assortativity_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    basket = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    e1 = basket.select("parts", F.posexplode("parts").alias("i", "pk1"))
    pc = (
        e1.select("i", "pk1", F.posexplode("parts").alias("j", "pk2"))
        .filter(F.col("j") > F.col("i"))
        .groupBy("pk1", "pk2")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 2)
        .select("pk1", "pk2")
        # referenced by deg (2x) and the edge join — materialize once
        # instead of replaying the basket double-explode per branch
        .transform(snapshot, eager=True)
    )
    deg = (
        pc.select(F.col("pk1").alias("pk"))
        .unionAll(pc.select(F.col("pk2").alias("pk")))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    da = deg.select(F.col("pk").alias("pk1"), F.col("d").alias("dx"))
    db = deg.select(F.col("pk").alias("pk2"), F.col("d").alias("dy"))
    joined = pc.join(da, "pk1").join(db, "pk2")
    ends = joined.select(
        F.explode(
            F.array(
                F.struct(F.col("dx").alias("x"), F.col("dy").alias("y")),
                F.struct(F.col("dy").alias("x"), F.col("dx").alias("y")),
            )
        ).alias("p")
    ).select("p.x", "p.y")
    s = ends.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y"))
        .cast("long")
        .alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x"))
        .cast("long")
        .alias("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y"))
        .cast("long")
        .alias("syy"),
    )
    return s.select(
        F.col("n").alias("n_edge_ends"),
        F.col("sx").alias("sum_deg"),
        F.expr(
            "CAST(floor("
            "CAST(CAST(n AS DECIMAL(38,0)) * sxy"
            "     - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"
            " / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx"
            "             - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"
            "        * CAST(CAST(n AS DECIMAL(38,0)) * syy"
            "               - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))"
            " * 1000000) AS BIGINT)"
        ).alias("assortativity_x1e6"),
    )


_BA_SNAP = "1998-07-01"  # backlog snapshot instant (fixture midpoint)


@register(
    "backlog_age_histogram",
    oracle=f"""
    , spans AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS placed,
               CAST(max(l.l_shipdate) AS DATE) AS last_ship
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    open_o AS (
        SELECT datediff('day', placed, DATE '{_BA_SNAP}') AS age_days
        FROM spans
        WHERE placed <= DATE '{_BA_SNAP}' AND last_ship > DATE '{_BA_SNAP}'
    )
    SELECT CAST(length(bin(age_days + 1)) - 1 AS INTEGER) AS age_octave,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(min(age_days) AS BIGINT) AS min_age_days,
           CAST(max(age_days) AS BIGINT) AS max_age_days
    FROM open_o GROUP BY 1
    """,
    doc=f"Backlog aging at the {_BA_SNAP} snapshot: open orders (placed "
    "on or before, last lineitem ships strictly after) bucketed by "
    "age octave (integer bit-length of age+1 — the no-libm log2 "
    "bucketing token_freq_spectrum uses), the WIP-aging view that "
    "complements open_orders_backlog_monthly's time series: that "
    "query says how many are open, this one says how LONG they've "
    "been open.  One fact-fact shuffle for spans, then a "
    "dimension-sized histogram.  All-integer.",
    tags=("analytics", "interval"),
)
def backlog_age_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    snap = F.lit(_BA_SNAP).cast("date")
    spans = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("placed"),
        )
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("last_ship"))
    )
    open_o = spans.where(
        (F.col("placed") <= snap) & (F.col("last_ship") > snap)
    ).select(F.datediff(snap, F.col("placed")).alias("age_days"))
    return open_o.groupBy(
        (F.length(F.bin(F.col("age_days") + 1)) - 1)
        .cast("int")
        .alias("age_octave")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.min("age_days").cast("long").alias("min_age_days"),
        F.max("age_days").cast("long").alias("max_age_days"),
    )


@register(
    "suspected_duplicate_orders",
    oracle="""
    , o AS (
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
               CAST(o_orderdate AS DATE) AS d
        FROM orders
    )
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
           a.cents AS cents_a, b.cents AS cents_b,
           CAST(abs(datediff('day', a.d, b.d)) AS BIGINT) AS day_gap
 
    FROM o a
    JOIN o b ON b.o_custkey = a.o_custkey
            AND a.o_orderkey < b.o_orderkey
            AND abs(datediff('day', a.d, b.d)) <= 7
            AND abs(a.cents - b.cents) * 100 <= least(a.cents, b.cents)
    """,
    doc="Duplicate-submission screen: order pairs from the same "
    "customer within 7 days whose totals agree to 1% (integer "
    "cross-multiplied: |a-b|*100 <= min(a,b), exact cents - the "
    "fixture has zero exact-amount collisions, so the realistic "
    "retry signature is near-identical value) — the double-click/"
    "retry pathology every order pipeline audits for.  The "
    "customer equi-join carries the band predicates in-join; "
    "per-customer fan-out is bounded by a customer's 7-day order "
    "count.  All-integer, deterministic orientation (a < b).",
    tags=("analytics", "dq"),
)
def suspected_duplicate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias(
            "cents"
        ),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    a, b = o.alias("a"), o.alias("b")
    return (
        a.join(
            b,
            (F.col("b.o_custkey") == F.col("a.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.abs(F.datediff(F.col("a.d"), F.col("b.d"))) <= 7)
            & (
                F.abs(F.col("a.cents") - F.col("b.cents")) * 100
                <= F.least(F.col("a.cents"), F.col("b.cents"))
            ),
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("orderkey_a"),
            F.col("b.o_orderkey").alias("orderkey_b"),
            F.col("a.cents").alias("cents_a"),
            F.col("b.cents").alias("cents_b"),
            F.abs(F.datediff(F.col("a.d"), F.col("b.d")))
            .cast("long")
            .alias("day_gap"),
        )
    )


@register(
    "order_count_dispersion",
    oracle="""
    , pc AS (
        SELECT c.c_mktsegment, o.o_custkey,
               CAST(count(*) AS BIGINT) AS n
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(n) AS BIGINT) AS n_orders,
           CAST(sum(n) * 1000000 // count(*) AS BIGINT) AS mean_ppm,
           CAST((count(*) * sum(CAST(n AS HUGEINT) * n)
                 - CAST(sum(n) AS HUGEINT) * sum(n)) * 1000000
                // (CAST(count(*) AS HUGEINT) * sum(n)) AS BIGINT)
               AS dispersion_ppm
    FROM pc GROUP BY c_mktsegment
    """,
    doc="Overdispersion index (variance/mean, Fisher) of per-customer "
    "order counts by market segment: 1e6 ppm = Poisson-like "
    "ordering, far above = bursty/heterogeneous demand (negative-"
    "binomial territory), the first distributional check before "
    "demand modeling.  Variance from the exact integer identity "
    "(n*sum(x^2)-(sum x)^2)/n^2 folded against the mean into ONE "
    "integral division (var/mean = (n*Sxx - Sx^2)/(n*Sx)), all in "
    "HUGEINT/DECIMAL(38,0).  One join + two partial-agg'd rollups.",
    tags=("analytics", "stats"),
)
def order_count_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    pc = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return pc.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("n").cast("long").alias("n_orders"),
        F.expr("CAST(sum(n) * 1000000 div count(*) AS BIGINT)").alias(
            "mean_ppm"
        ),
        F.expr(
            "CAST((count(*) * sum(CAST(n AS DECIMAL(38,0)) * n)"
            " - CAST(sum(n) AS DECIMAL(38,0)) * sum(n)) * 1000000"
            " div (CAST(count(*) AS DECIMAL(38,0)) * sum(n)) AS BIGINT)"
        ).alias("dispersion_ppm"),
    )


@register(
    "trade_flow_matrix",
    oracle="""
    , flows AS (
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns ON ns.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    ),
    agg AS (
        SELECT supp_nation, cust_nation,
               CAST(count(*) AS BIGINT) AS n_lineitems,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM flows GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM agg)
    SELECT supp_nation, cust_nation, n_lineitems, cents,
           CAST(cents * 1000000 // (SELECT t FROM tot) AS BIGINT)
               AS share_ppm,
           CAST(CASE WHEN supp_nation = cust_nation THEN 1 ELSE 0 END
                AS INTEGER) AS domestic
    FROM agg
    """,
    doc="Trade-flow origin-destination matrix: revenue by (supplier "
    "nation, customer nation) with global share and a domestic flag "
    "— the full OD table behind TPC-H Q7's two-nation slice, the "
    "gravity-model input for network trade analysis.  Plan shape: "
    "the two fact-fact joins (lineitem-orders) shuffle once on the "
    "order key; supplier, customer and both nation hops broadcast "
    "(dims); one partial-agg'd rollup to the <=|nations|^2 matrix.  "
    "Exact cents, integer ppm.",
    tags=("analytics", "join"),
)
def trade_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").alias(
            "cents"
        ),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    flows = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("cn_key"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .select("supp_nation", "cust_nation", "cents")
    )
    agg = flows.groupBy("supp_nation", "cust_nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        F.sum("cents").cast("long").alias("cents"),
        # <=25x25 matrix read by the grand total and the share select —
        # materialize once so the 5-join fact pipeline runs once, not 2x
    ).transform(snapshot, eager=True)
    tot = agg.agg(F.sum("cents").cast("long").alias("t"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "supp_nation",
        "cust_nation",
        "n_lineitems",
        "cents",
        F.expr("CAST(cents * 1000000 div t AS BIGINT)").alias("share_ppm"),
        F.when(F.col("supp_nation") == F.col("cust_nation"), 1)
        .otherwise(0)
        .cast("int")
        .alias("domestic"),
    )


# 4-4-5 fiscal calendar anchored at Monday 1993-01-04: periods repeat
# 4+4+5 weeks per quarter; week index is pure integer day arithmetic.
_F445_EPOCH = "1993-01-04"  # a Monday before every fixture order date


@register(
    "fiscal_445_revenue",
    oracle=f"""
    , wk AS (
        SELECT datediff('day', DATE '{_F445_EPOCH}',
                        CAST(o_orderdate AS DATE)) // 7 AS w,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '{_F445_EPOCH}'
    ),
    mapped AS (
        SELECT w // 52 AS fy,
               (w % 52) // 13 AS fq,
               CASE WHEN (w % 52) % 13 < 4 THEN 1
                    WHEN (w % 52) % 13 < 8 THEN 2
                    ELSE 3 END AS fp,
               cents
        FROM wk
    )
    SELECT CAST(fy AS INTEGER) AS fiscal_year,
           CAST(fq + 1 AS INTEGER) AS fiscal_quarter,
           CAST(fp AS INTEGER) AS fiscal_period,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS rev_cents
    FROM mapped GROUP BY 1, 2, 3
    """,
    doc="Revenue on a 4-4-5 fiscal calendar (the retail-standard "
    "calendar where every period has a whole number of weeks so "
    "period-over-period comparisons aren't distorted by weekday "
    "mix): week index = days-since-Monday-epoch div 7, then pure "
    "integer div/mod maps weeks into 52-week fiscal years, 13-week "
    "quarters and 4/4/5-week periods — no calendar UDF, the whole "
    "mapping stays inside codegen and is identical cross-engine.  "
    "One partial-agg'd rollup.",
    tags=("analytics", "calendar"),
)
def fiscal_445_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wk = orders.where(
        F.col("o_orderdate").cast("date") >= F.lit(_F445_EPOCH).cast("date")
    ).select(
        F.expr(
            f"datediff(CAST(o_orderdate AS DATE), DATE '{_F445_EPOCH}')"
            " div 7"
        ).alias("w"),
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias(
            "cents"
        ),
    )
    mapped = wk.select(
        F.expr("w div 52").alias("fy"),
        F.expr("(w % 52) div 13").alias("fq"),
        F.expr(
            "CASE WHEN (w % 52) % 13 < 4 THEN 1"
            " WHEN (w % 52) % 13 < 8 THEN 2 ELSE 3 END"
        ).alias("fp"),
        "cents",
    )
    return mapped.groupBy(
        F.col("fy").cast("int").alias("fiscal_year"),
        (F.col("fq") + 1).cast("int").alias("fiscal_quarter"),
        F.col("fp").cast("int").alias("fiscal_period"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("rev_cents"),
    )


# Wilson score interval constants, precomputed in Python and embedded
# as identical repr() literals on both engines (LIBM/CONSTANTS rule).
_WILSON_Z = 1.96
_WILSON_Z2 = _WILSON_Z * _WILSON_Z


@register(
    "return_rate_wilson_rank",
    oracle=f"""
    , br AS (
        SELECT p.p_brand,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS r
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    ),
    scored AS (
        SELECT p_brand, n, r,
               CAST(r * 1000000 // n AS BIGINT) AS raw_rate_ppm,
               CAST(floor(
                   ((CAST(r AS DOUBLE) / n) + {_WILSON_Z2!r} / (2 * n)
                    - {_WILSON_Z!r} * sqrt(
                        (CAST(r AS DOUBLE) / n)
                        * (1 - CAST(r AS DOUBLE) / n) / n
                        + {_WILSON_Z2!r} / (4 * CAST(n AS DOUBLE) * n)))
                   / (1 + {_WILSON_Z2!r} / n) * 1000000) AS BIGINT)
                   AS wilson_lb_ppm
        FROM br
    )
    SELECT p_brand, n, r, raw_rate_ppm, wilson_lb_ppm
    FROM scored ORDER BY wilson_lb_ppm DESC, p_brand LIMIT 10
    """,
    doc="Return-rate ranking by Wilson score lower bound (z=1.96): "
    "the statistically honest way to rank proportions — a brand "
    "with 3/4 returns must not outrank one with 300/1000, which raw "
    "rates get wrong.  The bound's arithmetic is a fixed sequence "
    "of IEEE-exact ops (divisions, one sqrt) over exact integer "
    "(r, n) with z and z² embedded as identical Python-repr "
    "literals, surfaced as floor fixed-point ppm — bit-identical "
    "cross-engine, per the LIBM/CONSTANTS and ROUND-OF-RAW-DOUBLE "
    "invariants.  One broadcast dim join + brand rollup, "
    "distributed TakeOrdered(10).",
    tags=("analytics", "stats"),
)
def return_rate_wilson_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    br = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            )
            .cast("long")
            .alias("r"),
        )
    )
    scored = br.select(
        "p_brand",
        "n",
        "r",
        F.expr("CAST(r * 1000000 div n AS BIGINT)").alias("raw_rate_ppm"),
        F.expr(
            f"CAST(floor("
            f"((CAST(r AS DOUBLE) / n) + {_WILSON_Z2!r} / (2 * n)"
            f" - {_WILSON_Z!r} * sqrt("
            f"(CAST(r AS DOUBLE) / n)"
            f" * (1 - CAST(r AS DOUBLE) / n) / n"
            f" + {_WILSON_Z2!r} / (4 * CAST(n AS DOUBLE) * n)))"
            f" / (1 + {_WILSON_Z2!r} / n) * 1000000) AS BIGINT)"
        ).alias("wilson_lb_ppm"),
    )
    return scored.orderBy(F.desc("wilson_lb_ppm"), "p_brand").limit(10)


@register(
    "frequent_triples_topk",
    oracle="""
    , basket AS (
        SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS parts
        FROM lineitem GROUP BY l_orderkey HAVING count(DISTINCT l_partkey) >= 3
    ),
    triples AS (
        SELECT parts[i] AS a, parts[j] AS b, parts[k] AS c
        FROM basket,
             unnest(generate_series(1, len(parts))) AS ti(i),
             unnest(generate_series(1, len(parts))) AS tj(j),
             unnest(generate_series(1, len(parts))) AS tk(k)
        WHERE i < j AND j < k
    )
    SELECT CAST(a AS BIGINT) AS pk1, CAST(b AS BIGINT) AS pk2,
           CAST(c AS BIGINT) AS pk3,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM triples GROUP BY 1, 2, 3
    ORDER BY n_orders DESC, pk1, pk2, pk3 LIMIT 15
    """,
    doc="Frequent 3-itemsets from order baskets — one level past the "
    "pair analysis (copurchase/association rules), the bundle "
    "question pairs cannot answer.  Same bounded-basket array shape: "
    "orders hold <= 7 distinct parts, so the C(|basket|,3) <= 35 "
    "triple expansion happens map-side from the grouped row (ONE "
    "fact shuffle), then a distributive count and TakeOrdered(15) "
    "with a 4-column total order.  At 100 TB the a-priori pruning "
    "path (filter triples through frequent pairs) bolts onto the "
    "same relation; the fixture's baskets are small enough that "
    "direct expansion is the faster plan.",
    tags=("analytics", "basket"),
)
def frequent_triples_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    basket = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 3)
    )
    t = (
        basket.select("parts", F.posexplode("parts").alias("i", "pk1"))
        .select("parts", "i", "pk1", F.posexplode("parts").alias("j", "pk2"))
        .filter(F.col("j") > F.col("i"))
        .select(
            "parts", "i", "j", "pk1", "pk2",
            F.posexplode("parts").alias("k", "pk3"),
        )
        .filter(F.col("k") > F.col("j"))
    )
    return (
        t.groupBy("pk1", "pk2", "pk3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .select(
            F.col("pk1").cast("long").alias("pk1"),
            F.col("pk2").cast("long").alias("pk2"),
            F.col("pk3").cast("long").alias("pk3"),
            "n_orders",
        )
        .orderBy(F.desc("n_orders"), "pk1", "pk2", "pk3")
        .limit(15)
    )


_TC_BUCKET = 25  # quasi-identifier: user_id div 25 cohorts


@register(
    "t_closeness_audit",
    oracle=f"""
    , g AS (
        SELECT user_id // {_TC_BUCKET} AS qi, event_type,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    gdist AS (
        SELECT event_type, CAST(sum(c) AS BIGINT) AS gc FROM g GROUP BY 1
    ),
    gn AS (SELECT qi, CAST(sum(c) AS BIGINT) AS n FROM g GROUP BY qi),
    tot AS (SELECT CAST(sum(gc) AS BIGINT) AS big_n FROM gdist),
    cells AS (  -- cross-multiplied share diff: c*N - gc*n (exact)
        SELECT gn.qi, gl.event_type, gn.n, t.big_n,
               CAST(coalesce(g.c, 0) AS HUGEINT) * t.big_n
                   - CAST(gl.gc AS HUGEINT) * gn.n AS diff
        FROM gn
        CROSS JOIN gdist gl
        CROSS JOIN tot t
        LEFT JOIN g ON g.qi = gn.qi AND g.event_type = gl.event_type
    ),
    emd AS (
        SELECT qi, n,
               CAST(sum(abs(cum)) * 1000000
                    // (CAST(max(big_n) AS HUGEINT) * max(n)) AS BIGINT)
                   AS emd_ppm
        FROM (
            SELECT qi, n, big_n,
                   sum(diff) OVER (PARTITION BY qi
                                   ORDER BY event_type
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum
            FROM cells
        ) GROUP BY qi, n
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(n) AS BIGINT) AS min_group_size,
           CAST(max(emd_ppm) AS BIGINT) AS max_emd_ppm,
           CAST(sum(CASE WHEN emd_ppm > 150000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violating
    FROM emd
    """,
    doc="t-closeness audit (Li et al., ICDE 2007) for a user-cohort "
    "quasi-identifier: the earth-mover's distance between each "
    "cohort's event_type distribution and the global one, computed "
    "EXACTLY by cross-multiplying shares to integers (c*N - g*n) "
    "and summing |cumulative| over the ordered categories in "
    "HUGEINT/DECIMAL — cohorts whose activity profile deviates "
    "beyond t=0.15 would let an attacker infer behavior from cohort "
    "membership alone, the distributional leak k-anonymity and "
    "l-diversity (already registered) cannot see.  One rollup plus "
    "dimension-sized cells; the category order is fixed so the EMD "
    "prefix sum is deterministic.",
    tags=("analytics", "privacy"),
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        F.expr(f"user_id div {_TC_BUCKET}").alias("qi"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    glob = g.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("gc")
    )
    gn = g.groupBy("qi").agg(F.sum("c").cast("long").alias("n"))
    tot = glob.agg(F.sum("gc").cast("long").alias("big_n"))
    cells = (
        gn.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(g, ["qi", "event_type"], "left")
        .select(
            "qi",
            "event_type",
            "n",
            "big_n",
            F.expr(
                "CAST(coalesce(c, 0) AS DECIMAL(38,0)) * big_n"
                " - CAST(gc AS DECIMAL(38,0)) * n"
            ).alias("diff"),
        )
    )
    wc = (
        W.partitionBy("qi")
        .orderBy("event_type")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    emd = (
        cells.select(
            "qi", "n", "big_n", F.sum("diff").over(wc).alias("cum")
        )
        .groupBy("qi", "n")
        .agg(
            F.expr(
                "CAST(sum(abs(cum)) * 1000000"
                " div (CAST(max(big_n) AS DECIMAL(38,0)) * max(n))"
                " AS BIGINT)"
            ).alias("emd_ppm")
        )
    )
    return emd.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("n").cast("long").alias("min_group_size"),
        F.max("emd_ppm").cast("long").alias("max_emd_ppm"),
        F.sum(F.when(F.col("emd_ppm") > 150000, 1).otherwise(0))
        .cast("long")
        .alias("n_violating"),
    )


@register(
    "part_price_spread",
    oracle="""
    , pp AS (
        SELECT l_partkey AS pk,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(CAST(floor(l_extendedprice / l_quantity * 100)
                             AS BIGINT)) AS BIGINT) AS min_unit_cents,
               CAST(max(CAST(floor(l_extendedprice / l_quantity * 100)
                             AS BIGINT)) AS BIGINT) AS max_unit_cents
        FROM lineitem WHERE l_quantity > 0
        GROUP BY l_partkey HAVING count(*) >= 5
    )
    SELECT CAST(pk AS BIGINT) AS pk, n, min_unit_cents, max_unit_cents,
           CAST((max_unit_cents - min_unit_cents) * 1000000
                // greatest(min_unit_cents, 1) AS BIGINT) AS spread_ppm
    FROM pp ORDER BY spread_ppm DESC, pk LIMIT 15
    """,
    doc="Pricing-governance screen: the 15 parts with the widest "
    "realized unit-price spread ((max-min)/min over their lineitems, "
    "min support 5) — wide spread means discount policy is leaking "
    "or the same part sells at wildly different effective prices.  "
    "Unit price quantizes to floor fixed-point cents at the row "
    "level (the ratio is NOT a 2-decimal money value, so round() "
    "would hit half-even-vs-half-up boundaries — the ROUND-OF-RAW-"
    "DOUBLE invariant applies), so min/max/spread are "
    "pure integer.  One partial-agg'd rollup + TakeOrdered(15).",
    tags=("analytics", "dq"),
)
def part_price_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    unit = F.expr(
        "CAST(floor(l_extendedprice / l_quantity * 100) AS BIGINT)"
    )
    pp = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(unit).cast("long").alias("min_unit_cents"),
            F.max(unit).cast("long").alias("max_unit_cents"),
        )
        .where(F.col("n") >= 5)
    )
    return (
        pp.select(
            F.col("pk").cast("long").alias("pk"),
            "n",
            "min_unit_cents",
            "max_unit_cents",
            F.expr(
                "CAST((max_unit_cents - min_unit_cents) * 1000000"
                " div greatest(min_unit_cents, 1) AS BIGINT)"
            ).alias("spread_ppm"),
        )
        .orderBy(F.desc("spread_ppm"), "pk")
        .limit(15)
    )


@register(
    "revenue_reconciliation_sources",
    oracle="""
    , ev_rev AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS ev_cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    ord_rev AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS ord_cents
        FROM orders GROUP BY 1
    ),
    rec AS (
        SELECT coalesce(e.day, o.day) AS day,
               coalesce(e.ev_cents, 0) AS ev_cents,
               coalesce(o.ord_cents, 0) AS ord_cents
        FROM ev_rev e FULL OUTER JOIN ord_rev o ON o.day = e.day
    )
    SELECT CAST(sum(CASE WHEN ev_cents > 0 AND ord_cents = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS days_events_only,
           CAST(sum(CASE WHEN ord_cents > 0 AND ev_cents = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS days_orders_only,
           CAST(sum(CASE WHEN ev_cents > 0 AND ord_cents > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS days_both,
           CAST(sum(ev_cents) AS BIGINT) AS total_ev_cents,
           CAST(sum(ord_cents) AS BIGINT) AS total_ord_cents
    FROM rec
    """,
    doc="Cross-source revenue reconciliation: the event stream's "
    "purchase value vs the order system's totals, full-outer-joined "
    "by day so days present in only one source surface instead of "
    "silently dropping (the inner-join trap reconciliation reports "
    "fall into) — in this fixture the two sources cover DISJOINT "
    "eras (events 2024, orders 1995-2001), which is exactly the "
    "pathology the days_*_only columns are built to expose.  Two "
    "partial-agg'd rollups, a dimension-sized full-outer join, "
    "exact cents.",
    tags=("analytics", "dq"),
)
def revenue_reconciliation_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    ev_rev = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)"))
            .cast("long")
            .alias("ev_cents")
        )
    )
    ord_rev = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .cast("long")
        .alias("ord_cents")
    )
    rec = (
        ev_rev.join(ord_rev, "day", "full_outer")
        .select(
            F.coalesce("ev_cents", F.lit(0)).alias("ev_cents"),
            F.coalesce("ord_cents", F.lit(0)).alias("ord_cents"),
        )
    )
    return rec.agg(
        F.sum(
            F.when((F.col("ev_cents") > 0) & (F.col("ord_cents") == 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("days_events_only"),
        F.sum(
            F.when((F.col("ord_cents") > 0) & (F.col("ev_cents") == 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("days_orders_only"),
        F.sum(
            F.when((F.col("ev_cents") > 0) & (F.col("ord_cents") > 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("days_both"),
        F.sum("ev_cents").cast("long").alias("total_ev_cents"),
        F.sum("ord_cents").cast("long").alias("total_ord_cents"),
    )


@register(
    "dom_order_profile",
    oracle="""
    , d AS (
        SELECT day(o_orderdate) AS dom,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS c FROM d)
    SELECT CAST(dom AS INTEGER) AS day_of_month,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS rev_cents,
           CAST(count(*) * 1000000 // (SELECT n FROM tot) AS BIGINT)
               AS order_share_ppm,
           CAST(sum(cents) * 1000000 // (SELECT c FROM tot) AS BIGINT)
               AS rev_share_ppm
    FROM d GROUP BY dom
    """,
    doc="Day-of-month ordering profile: order count and revenue share "
    "per calendar day 1..31 — the payday/billing-cycle fingerprint "
    "(spikes at 1/15/month-end) that capacity planning and fraud "
    "baselines both read.  Note days 29-31 exist in fewer months, "
    "so raw shares dip there by construction — the honest reading "
    "compares against days-available, which the n_orders column "
    "supports.  One partial-agg'd rollup plus a broadcast scalar.",
    tags=("analytics", "calendar"),
)
def dom_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        F.dayofmonth("o_orderdate").alias("dom"),
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias(
            "cents"
        ),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("c"),
    )
    return (
        d.groupBy(F.col("dom").cast("int").alias("day_of_month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "day_of_month",
            "n_orders",
            "rev_cents",
            F.expr("CAST(n_orders * 1000000 div n AS BIGINT)").alias(
                "order_share_ppm"
            ),
            F.expr("CAST(rev_cents * 1000000 div c AS BIGINT)").alias(
                "rev_share_ppm"
            ),
        )
    )


@register(
    "priority_inversion_audit",
    oracle="""
    , ord AS (
        SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS placed,
               CAST(substr(o.o_orderpriority, 1, 1) AS INTEGER) AS prio,
               datediff('day', CAST(o.o_orderdate AS DATE),
                        CAST(min(l.l_shipdate) AS DATE)) AS lat
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
        GROUP BY 1, 2, 3
    ),
    pairs AS (
        SELECT a.prio AS prio_urgent, b.prio AS prio_casual,
               CASE WHEN a.lat > b.lat THEN 1 ELSE 0 END AS inverted
        FROM ord a JOIN ord b ON b.placed = a.placed
                            AND a.prio < b.prio
    )
    SELECT CAST(prio_urgent AS INTEGER) AS prio_urgent,
           CAST(prio_casual AS INTEGER) AS prio_casual,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(inverted) AS BIGINT) AS n_inversions,
           CAST(sum(inverted) * 1000000 // count(*) AS BIGINT)
               AS inversion_ppm
    FROM pairs GROUP BY 1, 2
    """,
    doc="Priority-inversion audit: among order pairs placed the SAME "
    "day, how often does the more urgent priority ship its first "
    "lineitem slower than the less urgent one — near 500000 ppm "
    "means the priority field is decorative (the fixture's "
    "independently drawn dates make exactly that null result, which "
    "is the point of auditing), well below means fulfillment honors "
    "it.  Same-day pairing keys the self-join on the date (fan-out "
    "bounded by daily order volume, never a global cross join).  "
    "First-ship latency from one fact-fact rollup; ship-before-"
    "order fixture artifacts excluded.",
    tags=("analytics", "ops"),
)
def priority_inversion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    ord_ = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .where(
            F.col("l_shipdate").cast("date")
            >= F.col("o_orderdate").cast("date")
        )
        .groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("placed"),
            F.substring("o_orderpriority", 1, 1)
            .cast("int")
            .alias("prio"),
        )
        .agg(
            F.min(F.col("l_shipdate").cast("date")).alias("first_ship")
        )
        .select(
            "o_orderkey",
            "placed",
            "prio",
            F.datediff("first_ship", "placed").alias("lat"),
        )
    )
    a = ord_.select(
        F.col("placed").alias("pa"),
        F.col("prio").alias("prio_urgent"),
        F.col("lat").alias("lat_a"),
    )
    b = ord_.select(
        F.col("placed").alias("pb"),
        F.col("prio").alias("prio_casual"),
        F.col("lat").alias("lat_b"),
    )
    pairs = a.join(
        b,
        (F.col("pb") == F.col("pa"))
        & (F.col("prio_urgent") < F.col("prio_casual")),
    ).select(
        "prio_urgent",
        "prio_casual",
        F.when(F.col("lat_a") > F.col("lat_b"), 1).otherwise(0).alias(
            "inverted"
        ),
    )
    return pairs.groupBy(
        F.col("prio_urgent").cast("int").alias("prio_urgent"),
        F.col("prio_casual").cast("int").alias("prio_casual"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("inverted").cast("long").alias("n_inversions"),
        F.expr(
            "CAST(sum(inverted) * 1000000 div count(*) AS BIGINT)"
        ).alias("inversion_ppm"),
    )


# fixture event types are stable; each gets its own KS block in the sweep
_KS_TYPES = ("click", "error", "purchase", "signup", "view")
_KS_SPLIT = "2024-01-15 00:00:00"


def _ks_drift_sql(t: str) -> str:
    return f"""
    SELECT '{t}' AS event_type,
           CAST((SELECT na FROM tot_{t}) AS BIGINT) AS n_a,
           CAST((SELECT nb FROM tot_{t}) AS BIGINT) AS n_b,
           CAST(max(dnum) AS BIGINT) AS d_num,
           CAST((SELECT na FROM tot_{t}) * (SELECT nb FROM tot_{t})
                AS BIGINT) AS d_den,
           CAST(max(dnum) * 1000000
                // ((SELECT na FROM tot_{t}) * (SELECT nb FROM tot_{t}))
                AS BIGINT) AS d_ppm
    FROM diffs_{t}"""


def _ks_drift_ctes(t: str) -> str:
    return f"""
    base_{t} AS (
        SELECT value,
               sum(CASE WHEN ts < TIMESTAMP '{_KS_SPLIT}'
                        THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN ts >= TIMESTAMP '{_KS_SPLIT}'
                        THEN 1 ELSE 0 END) AS cb
        FROM events WHERE event_type = '{t}'
        GROUP BY value
    ),
    cum_{t} AS (
        SELECT value,
               sum(ca) OVER (ORDER BY value
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cca,
               sum(cb) OVER (ORDER BY value
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS ccb
        FROM base_{t}
    ),
    tot_{t} AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM base_{t}),
    diffs_{t} AS (
        SELECT abs(cca * (SELECT nb FROM tot_{t})
                   - ccb * (SELECT na FROM tot_{t})) AS dnum
        FROM cum_{t}
    )"""


@register(
    "value_drift_ks_by_type",
    oracle=", "
    + ",".join(_ks_drift_ctes(t) for t in _KS_TYPES)
    + "\n    UNION ALL".join(_ks_drift_sql(t) for t in _KS_TYPES),
    doc="Per-stream temporal drift: the exact two-sample KS statistic "
    "between each event type's value distribution before and after "
    "the stream midpoint — the numeric-column complement to "
    "transition_drift_chi2's categorical check, together covering "
    "the two ways a model's inputs go stale.  Reuses the "
    "operators/stats.ks_statistic two-phase prefix-sum skeleton per "
    "type (bucketed cumulative windows + broadcast offsets, exact "
    "cross-multiplied rationals); D surfaces as both the exact "
    "d_num/d_den pair and integer ppm.",
    tags=("analytics", "drift"),
)
def value_drift_ks_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r07 (guide §1.2/§2.4): one GROUPED pass instead of a Python loop of
    # five ks_statistic calls — the loop scanned events once per type and
    # paid ks_statistic's two eager snapshots (and its argmax subchain,
    # whose output this query discards) five times over.  Identical
    # arithmetic, computed with event_type carried through the same
    # two-phase prefix-sum skeleton: in-bucket cumulative windows
    # partitioned by (type, bucket), bucket offsets per type (bounded:
    # |types| x |buckets| rows, broadcast back), exact cross-multiplied
    # rationals.  The oracle keeps its per-type CTE form — results are
    # row-identical.
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_KS_SPLIT).cast("timestamp")
    base = (
        ev.where(F.col("event_type").isin(*_KS_TYPES))
        .groupBy("event_type", "value")
        .agg(
            F.sum(F.when(F.col("ts") < split, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("ts") >= split, 1).otherwise(0)).alias("cb"),
        )
        .withColumn("_bkt", F.expr("CAST(floor(value) AS BIGINT) div 50"))
        # feeds the prefix windows AND the per-type totals — one
        # materialization, one upstream scan (ks_statistic contract)
        .transform(snapshot, eager=True)
    )
    w_in = W.partitionBy("event_type", "_bkt").orderBy("value").rowsBetween(
        W.unboundedPreceding, 0
    )
    loc = base.withColumn("cca_in", F.sum("ca").over(w_in)).withColumn(
        "ccb_in", F.sum("cb").over(w_in)
    )
    bkt_tot = base.groupBy("event_type", "_bkt").agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb")
    )
    w_off = (
        W.partitionBy("event_type")
        .orderBy("_bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offs = bkt_tot.select(
        "event_type",
        "_bkt",
        F.coalesce(F.sum("ta").over(w_off), F.lit(0)).alias("oa"),
        F.coalesce(F.sum("tb").over(w_off), F.lit(0)).alias("ob"),
    )
    cum = loc.join(F.broadcast(offs), ["event_type", "_bkt"]).select(
        "event_type",
        (F.col("cca_in") + F.col("oa")).alias("cca"),
        (F.col("ccb_in") + F.col("ob")).alias("ccb"),
    )
    tot = base.groupBy("event_type").agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    # cross-multiplied rationals in DECIMAL(38,0) (the ks_statistic
    # widening): cca*nb and d_num*1e6 overflow int64 past ~3e9 / ~3e6
    # rows per side; DuckDB's window sums are already HUGEINT.
    dec = "decimal(38,0)"
    mx = (
        cum.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            F.abs(
                F.col("cca").cast(dec) * F.col("nb").cast(dec)
                - F.col("ccb").cast(dec) * F.col("na").cast(dec)
            ).alias("dnum"),
        )
        .groupBy("event_type")
        .agg(F.max("dnum").alias("d_num"))
    )
    res = tot.join(F.broadcast(mx), "event_type").select(
        "event_type",
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.col("d_num").cast("long").alias("d_num"),
        (F.col("na") * F.col("nb")).cast("long").alias("d_den"),
        F.expr(
            "CAST(d_num * 1000000"
            " div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"
        ).alias("d_ppm"),
    )
    # the oracle emits one row per type UNCONDITIONALLY (scalar
    # aggregates over a possibly-empty diffs_<t> give NULL stats); the
    # grouped pipeline emits no group for a type with zero events —
    # preserve the row set from the bounded type literal (ADVICE r07).
    types_df = spark.createDataFrame(
        [(t,) for t in _KS_TYPES], "event_type string"
    )
    return types_df.join(res, "event_type", "left")


@register(
    "price_ending_profile",
    oracle="""
    , e AS (
        SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) % 100
                   AS ending
        FROM orders
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e)
    SELECT CASE WHEN ending = 0 THEN 'round_00'
                WHEN ending = 99 THEN 'charm_99'
                WHEN ending % 10 = 0 THEN 'round_x0'
                ELSE 'other' END AS ending_class,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) * 1000000 // (SELECT n FROM tot) AS BIGINT)
               AS share_ppm
    FROM e GROUP BY 1
    """,
    doc="Price-ending profile: the cents endings of order totals "
    "bucketed into round-dollar (.00), charm (.99), tens (.x0) and "
    "other — forensic accounting reads excess .00 mass as manual "
    "price entry or fabrication (round-number bias), merchandisers "
    "read .99 mass as charm-pricing penetration; a uniform fixture "
    "should spread ~1%/ending.  Pure integer modulo on exact "
    "cents; one partial-agg'd rollup plus a broadcast scalar.",
    tags=("analytics", "dq"),
)
def price_ending_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    e = orders.select(
        (
            F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)") % 100
        ).alias("ending")
    )
    tot = e.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        e.groupBy(
            F.when(F.col("ending") == 0, "round_00")
            .when(F.col("ending") == 99, "charm_99")
            .when(F.col("ending") % 10 == 0, "round_x0")
            .otherwise("other")
            .alias("ending_class")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .select(
            "ending_class",
            "n_orders",
            F.expr("CAST(n_orders * 1000000 div n AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )


_TABLE_PKS = (
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
)


@register(
    "tables_row_audit",
    oracle="\n    UNION ALL\n".join(
        f"""
    SELECT '{tbl}' AS table_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({pk}) AS BIGINT) AS n_null_pk,
           CAST(count({pk}) - count(DISTINCT {pk}) AS BIGINT)
               AS n_dup_pk
    FROM {tbl}"""
        for tbl, pk in _TABLE_PKS
    ),
    doc="Warehouse-wide primary-key health dashboard: row count, null "
    "keys and duplicate keys for every keyed table in one result — "
    "the first page of any data-contract report, asserting the "
    "uniqueness assumption every broadcast dim join in this registry "
    "silently relies on (a dup in a broadcast dim silently FANS OUT "
    "fact rows — this query is the guard).  Nine independent "
    "partial-agg'd scans unioned at the summary level; lineitem is "
    "excluded because its key is composite (covered by "
    "referential_integrity_audit).",
    tags=("analytics", "dq"),
)
def tables_row_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for tbl, pk in _TABLE_PKS:
        t = load_table(spark, sf_dir, tbl)
        outs.append(
            t.agg(
                F.lit(tbl).alias("table_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                (F.count(F.lit(1)) - F.count(pk))
                .cast("long")
                .alias("n_null_pk"),
                (F.count(pk) - F.countDistinct(pk))
                .cast("long")
                .alias("n_dup_pk"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


@register(
    "z_chart_weekly_revenue",
    oracle="""
    , wk AS (
        SELECT datediff('day', DATE '1993-01-04',
                        CAST(o_orderdate AS DATE)) // 7 AS w,
               year(o_orderdate) AS yr,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1993-01-04'
    ),
    weekly AS (
        SELECT w, min(yr) AS yr, CAST(sum(cents) AS BIGINT) AS rev
        FROM wk GROUP BY w
    )
    SELECT CAST(w AS BIGINT) AS week_idx, CAST(yr AS INTEGER) AS yr, rev,
           CAST(sum(rev) OVER (PARTITION BY yr ORDER BY w) AS BIGINT)
               AS cum_ytd,
           CAST(sum(rev) OVER (ORDER BY w
                               RANGE BETWEEN 51 PRECEDING
                               AND CURRENT ROW) AS BIGINT)
               AS moving_annual_total
    FROM weekly
    """,
    doc="Z-chart feed: weekly revenue, year-to-date cumulative, and "
    "the 52-week moving annual total — the three lines of the "
    "classic Z-chart that separates seasonality (weekly line) from "
    "trend (MAT line).  The MAT uses a RANGE frame over the integer "
    "week index so week gaps cannot silently shrink the window (a "
    "ROWS frame would — the gap-correctness lesson from "
    "pit_training_features), and the YTD window partitions by "
    "calendar year.  Exact cents; the weekly rollup is the only "
    "fact shuffle and the windows run over |weeks| rows.  A week "
    "straddling New Year counts toward the year of its first "
    "order (min(yr)) — documented tie-break.",
    tags=("analytics", "finance"),
)
def z_chart_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wk = orders.where(
        F.col("o_orderdate").cast("date") >= F.lit("1993-01-04").cast("date")
    ).select(
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1993-01-04') div 7"
        ).alias("w"),
        F.year("o_orderdate").alias("yr"),
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias(
            "cents"
        ),
    )
    weekly = wk.groupBy("w").agg(
        F.min("yr").alias("yr"), F.sum("cents").cast("long").alias("rev")
    )
    w_ytd = W.partitionBy("yr").orderBy("w")
    w_mat = W.orderBy("w").rangeBetween(-51, 0)
    return weekly.select(
        F.col("w").cast("long").alias("week_idx"),
        F.col("yr").cast("int").alias("yr"),
        "rev",
        F.sum("rev").over(w_ytd).cast("long").alias("cum_ytd"),
        F.sum("rev").over(w_mat).cast("long").alias("moving_annual_total"),
    )


@register(
    "discount_cost_by_year",
    oracle="""
    , li AS (
        SELECT year(l_shipdate) AS yr,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
               CAST(round(l_discount * 10000, 0) AS BIGINT) AS disc_bp
        FROM lineitem
    )
    SELECT CAST(yr AS INTEGER) AS yr,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(sum(cents) AS BIGINT) AS gross_cents,
           CAST(sum(cents * disc_bp // 10000) AS BIGINT)
               AS forgone_cents,
           CAST(sum(cents * disc_bp // 10000) * 1000000
                // sum(cents) AS BIGINT) AS discount_load_ppm
    FROM li GROUP BY yr
    """,
    doc="Discount cost by ship year: revenue forgone to discounting "
    "and its share of gross.  The money product is computed as exact "
    "integers — price to cents, discount to basis points (both are "
    "2-decimal fixture values so the round() is exact), then "
    "cents*bp//10000 floored identically per row BEFORE summation — "
    "because the naive round(price*discount*100) sits on rounding "
    "boundaries (a 4-decimal product) and the FLOAT-SUM-ORDER rule "
    "forbids summing raw doubles.  One partial-agg'd rollup.",
    tags=("analytics", "finance"),
)
def discount_cost_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").alias("yr"),
        F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").alias(
            "cents"
        ),
        F.expr("CAST(round(l_discount * 10000, 0) AS BIGINT)").alias(
            "disc_bp"
        ),
    )
    return li.groupBy(F.col("yr").cast("int").alias("yr")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        F.sum("cents").cast("long").alias("gross_cents"),
        F.sum(F.expr("cents * disc_bp div 10000"))
        .cast("long")
        .alias("forgone_cents"),
        F.expr(
            "CAST(sum(cents * disc_bp div 10000) * 1000000"
            " div sum(cents) AS BIGINT)"
        ).alias("discount_load_ppm"),
    )


@register(
    "negative_balance_by_nation",
    oracle="""
    , c AS (
        SELECT n.n_name AS nation,
               CASE WHEN c.c_acctbal < 0 THEN 1 ELSE 0 END AS neg,
               CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS cents
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    )
    SELECT nation,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(neg) AS BIGINT) AS n_negative,
           CAST(sum(neg) * 1000000 // count(*) AS BIGINT)
               AS negative_share_ppm,
           CAST(sum(CASE WHEN neg = 1 THEN cents ELSE 0 END) AS BIGINT)
               AS negative_exposure_cents
    FROM c GROUP BY nation
    """,
    doc="Credit-risk screen by nation: share of customers in negative "
    "account balance and the total negative exposure in exact cents "
    "— the receivables-risk geography cut.  One broadcast dim join "
    "+ partial-agg'd rollup; all-integer surface (balances are "
    "2-decimal money, so cents quantization is exact).",
    tags=("analytics", "risk"),
)
def negative_balance_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    c = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select(
        "nation",
        F.when(F.col("c_acctbal") < 0, 1).otherwise(0).alias("neg"),
        F.expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").alias("cents"),
    )
    return c.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("neg").cast("long").alias("n_negative"),
        F.expr(
            "CAST(sum(neg) * 1000000 div count(*) AS BIGINT)"
        ).alias("negative_share_ppm"),
        F.sum(F.when(F.col("neg") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("negative_exposure_cents"),
    )


# --- ABC inventory classification of parts by revenue -----------------------

# band width for the two-phase distributed cumulative sum over per-part
# revenue (e6 units = cents x discount-basis-points); parts cluster around
# ~30 lineitems x ~1e11 e6-units, so DIV 1e12 yields a few hundred
# deterministic, data-derived bands at any scale factor.
_ABC_BAND = 10**12


@register(
    "abc_parts_classification",
    oracle="""
    , pr AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    * (10000 - CAST(round(l_discount * 10000, 0) AS BIGINT)))
                    AS BIGINT) AS rev
        FROM lineitem GROUP BY l_partkey
    ),
    r AS (
        SELECT l_partkey, rev,
               sum(rev) OVER (ORDER BY rev DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM pr
    ),
    g AS (SELECT sum(rev) AS tot FROM pr)
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev) // 10000 AS BIGINT) AS revenue_cents,
           CAST((sum(rev) // 10000) * 1000000 // max(tot // 10000) AS BIGINT)
               AS share_ppm
    FROM (
        SELECT rev, tot,
               CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                    WHEN cum * 20 <= tot * 19 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM r CROSS JOIN g
    ) GROUP BY abc_class
    """,
    doc="ABC (80/15/5) inventory classification: rank parts by exact "
    "discounted revenue and bucket them A (first 80% of cumulative "
    "revenue), B (next 15%), C (tail) — the stock-policy segmentation "
    "cut.  Revenue is the exact integer product cents x (10000 - "
    "discount-bp), so no float ever enters the ranking; the global "
    "cumulative sum is the two-phase banded prefix sum (per-band "
    "window in parallel + broadcast band offsets, revenue_pareto_"
    "deciles model) — the oracle's single-partition OVER () is "
    "exactly what this plan avoids at 100 TB, where the per-part "
    "rollup still has ~2e7 rows.",
    tags=("analytics", "inventory"),
)
def abc_parts_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    e6 = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * (10000 - F.round(F.col("l_discount") * 10000, 0).cast("long"))
    )
    pr = li.groupBy("l_partkey").agg(F.sum(e6).cast("long").alias("rev"))
    base = pr.select(
        "l_partkey",
        "rev",
        (-F.col("rev")).alias("sk"),
    ).withColumn("_bkt", F.expr(f"-(rev DIV {_ABC_BAND})"))
    w_in = (
        W.partitionBy("_bkt")
        .orderBy("sk", "l_partkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = base.withColumn(
        "_cum_in", F.sum("rev").over(w_in)
    ).transform(snapshot, eager=False)
    totals = local.groupBy("_bkt").agg(F.max("_cum_in").alias("_tot"))
    w_off = W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "_bkt",
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off"),
    )
    grand = totals.agg(F.sum("_tot").alias("tot"))
    ranked = (
        local.join(F.broadcast(offsets), "_bkt")
        .select("rev", (F.col("_off") + F.col("_cum_in")).alias("cum"))
        .crossJoin(F.broadcast(grand))
    )
    classed = ranked.withColumn(
        "abc_class",
        F.expr(
            "CASE WHEN cum * 5 <= tot * 4 THEN 'A' "
            "WHEN cum * 20 <= tot * 19 THEN 'B' ELSE 'C' END"
        ),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.expr("CAST(sum(rev) DIV 10000 AS BIGINT)").alias("revenue_cents"),
        F.expr(
            "CAST((sum(rev) DIV 10000) * 1000000"
            " DIV max(tot DIV 10000) AS BIGINT)"
        ).alias("share_ppm"),
    )


# --- l-diversity privacy audit ---------------------------------------------

_LDIV_MIN = 3  # groups with fewer distinct sensitive values are flagged


@register(
    "l_diversity_audit",
    oracle=f"""
    , qi AS (
        SELECT n.n_name AS nation, c.c_mktsegment AS segment,
               c.c_custkey, o.o_orderpriority
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
    )
    SELECT nation, segment,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS k_customers,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS l_distinct,
           CASE WHEN count(DISTINCT o_orderpriority) < {_LDIV_MIN}
                THEN 1 ELSE 0 END AS violates_l{_LDIV_MIN}
    FROM qi GROUP BY nation, segment
    """,
    doc="Distinct l-diversity audit (Machanavajjhala et al.): for each "
    "quasi-identifier group (nation x market segment) count the "
    "distinct sensitive values (order priority) observed — a group an "
    "attacker can isolate learns the sensitive attribute whenever "
    "l < {_LDIV_MIN}, even if k-anonymity holds.  Companion to the "
    "k_anonymity_audit / t_closeness_audit pair.  One broadcast dim "
    "join + a two-distinct-measure hash aggregate (Spark plans "
    "count(DISTINCT) via expand + partial aggregation, no extra "
    "shuffle beyond the group keys); all-integer surface.",
    tags=("analytics", "privacy"),
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    orders = load_table(spark, sf_dir, "orders")
    qi = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .select("nation", F.col("c_mktsegment").alias("segment"),
                "c_custkey", "o_orderpriority")
    )
    return qi.groupBy("nation", "segment").agg(
        F.countDistinct("c_custkey").cast("long").alias("k_customers"),
        F.countDistinct("o_orderpriority").cast("long").alias("l_distinct"),
        F.when(
            F.countDistinct("o_orderpriority") < _LDIV_MIN, 1
        ).otherwise(0).alias(f"violates_l{_LDIV_MIN}"),
    )


# --- Simpson's-paradox screen: discount vs quantity, per nation vs pooled ---

# cross-multiplications in DECIMAL(38,0) — valid on BOTH engines; the
# BIGINT form overflows once per-group row counts pass ~1e6 (r07 100x
# survivability sweep lesson, see _SPEARMAN_CORR)
_SIMPSON_CORR = (
    "CAST(floor("
    "CAST(CAST(n AS DECIMAL(38,0)) * sxy"
    "     - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"
    " / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx"
    "             - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"
    "        * CAST(CAST(n AS DECIMAL(38,0)) * syy"
    "               - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))"
    " * 1000000) AS BIGINT)"
)


@register(
    "simpson_reversal_screen",
    oracle=f"""
    , pts AS (
        SELECT n.n_name AS nation,
               CAST(round(l.l_discount * 10000, 0) AS BIGINT) AS x,
               CAST(round(l.l_quantity, 0) AS BIGINT) AS y
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    per AS (
        SELECT nation,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS BIGINT) AS sxy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS BIGINT) AS sxx,
               CAST(sum(CAST(y AS HUGEINT) * y) AS BIGINT) AS syy
        FROM pts GROUP BY nation
    ),
    pool AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS BIGINT) AS sxy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS BIGINT) AS sxx,
               CAST(sum(CAST(y AS HUGEINT) * y) AS BIGINT) AS syy
        FROM pts
    ),
    pc AS (SELECT {_SIMPSON_CORR} AS pooled_corr_x1e6 FROM pool)
    SELECT nation, n AS n_lineitems,
           {_SIMPSON_CORR} AS nation_corr_x1e6,
           pooled_corr_x1e6,
           CASE WHEN ({_SIMPSON_CORR}) * pooled_corr_x1e6 < 0
                THEN 1 ELSE 0 END AS reversed
    FROM per CROSS JOIN pc
    """,
    doc="Simpson's-paradox screen: Pearson correlation of discount "
    "(basis points) vs quantity computed per customer nation AND "
    "pooled, flagging nations whose within-group sign contradicts the "
    "pooled sign — the aggregation-bias trap every analytics review "
    "checks before trusting a pooled trend.  Correlations use the "
    "exact-integer moment sums (int128 products folded back to "
    "BIGINT) with one textually-shared float expression, the "
    "error_load_correlation model.  Dataflow: one fact-fact shuffle "
    "join (lineitem x orders on orderkey), customer->nation broadcast "
    "dims, then a single map-side-partial moment aggregate serving "
    "both the 25 per-nation rows and the pooled row.",
    tags=("analytics", "statistics"),
)
def simpson_reversal_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_discount") * 10000, 0).cast("long").alias("x"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("y"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    pts = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("nation", "x", "y")
    )
    moments = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).cast("long").alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).cast("long").alias("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).cast("long").alias("syy"),
    ]
    per = pts.groupBy("nation").agg(*moments).transform(snapshot, eager=True)
    # the pooled moments are the SUMS of the per-nation moments (all six
    # are additive), so the pooled correlation derives from the 25-row
    # rollup — the fact join runs once, not twice
    pool = per.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sx").cast("long").alias("sx"),
        F.sum("sy").cast("long").alias("sy"),
        F.sum("sxy").cast("long").alias("sxy"),
        F.sum("sxx").cast("long").alias("sxx"),
        F.sum("syy").cast("long").alias("syy"),
    ).select(F.expr(_SIMPSON_CORR).alias("pooled_corr_x1e6"))
    return per.crossJoin(F.broadcast(pool)).select(
        "nation",
        F.col("n").alias("n_lineitems"),
        F.expr(_SIMPSON_CORR).alias("nation_corr_x1e6"),
        "pooled_corr_x1e6",
        F.expr(
            f"CASE WHEN ({_SIMPSON_CORR}) * pooled_corr_x1e6 < 0"
            " THEN 1 ELSE 0 END"
        ).alias("reversed"),
    )


# --- edit-distance near-duplicate part names (blocked Levenshtein) ----------

_LEV_MAX = 2
_LEV_TOPK = 20


@register(
    "fuzzy_part_name_pairs_lev",
    oracle=f"""
    , pr AS (
        SELECT p_partkey, p_brand, p_size, p_name FROM part
    ),
    cand AS (
        SELECT a.p_partkey AS pk1, b.p_partkey AS pk2,
               a.p_name AS name1, b.p_name AS name2,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        FROM pr a
        JOIN pr b ON a.p_brand = b.p_brand AND a.p_size = b.p_size
                 AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= {_LEV_MAX}
    )
    SELECT CAST(pk1 AS BIGINT) AS pk1, CAST(pk2 AS BIGINT) AS pk2,
           name1, name2, dist
    FROM cand ORDER BY dist, pk1, pk2 LIMIT {_LEV_TOPK}
    """,
    doc="Entity-resolution screen with true edit distance: part pairs "
    "whose names are within Levenshtein distance {_LEV_MAX}, blocked "
    "on (brand, size) so the quadratic comparison never leaves a "
    "block — the classic blocking+verify shape (complements "
    "fuzzy_join_deletion_index, which approximates distance-1 with "
    "deletion keys and no pairwise verify).  The block self-join is "
    "an equi-join on the blocking key, so at 100 TB the pair fan-out "
    "is sum-of-squares over block sizes — the blocking_quality_eval "
    "query measures exactly that budget; ranking ties break on the "
    "total order (dist, pk1, pk2).",
    tags=("analytics", "entity-resolution"),
)
def fuzzy_part_name_pairs_lev(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_name"
    )
    cand = (
        part.alias("a")
        .join(
            part.alias("b"),
            F.expr(
                "a.p_brand = b.p_brand AND a.p_size = b.p_size"
                " AND a.p_partkey < b.p_partkey"
            ),
        )
        .select(
            F.col("a.p_partkey").cast("long").alias("pk1"),
            F.col("b.p_partkey").cast("long").alias("pk2"),
            F.col("a.p_name").alias("name1"),
            F.col("b.p_name").alias("name2"),
            F.levenshtein("a.p_name", "b.p_name").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= _LEV_MAX)
    )
    return cand.orderBy("dist", "pk1", "pk2").limit(_LEV_TOPK)


# --- XYZ demand-variability classification (companion to ABC) ---------------

# coefficient-of-variation thresholds in ppm: X < 0.25, Y < 0.5, else Z
_XYZ_X_PPM = 250_000
_XYZ_Y_PPM = 500_000

# cv_ppm = floor(sqrt(n*s2 - s^2) * 1e6 / s): population-sd/mean over the
# exact integer quantity sums, one textually-shared float expression.
_XYZ_CV = (
    "CAST(floor(sqrt(CAST(n * s2 - s * s AS DOUBLE))"
    " * 1000000.0 / CAST(s AS DOUBLE)) AS BIGINT)"
)


@register(
    "demand_variability_xyz",
    oracle=f"""
    , pq AS (
        SELECT l_partkey,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS s,
               CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)
                        * CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
                   AS s2
        FROM lineitem GROUP BY l_partkey
    ),
    cv AS (
        SELECT l_partkey, n, s, {_XYZ_CV} AS cv_ppm FROM pq
    )
    SELECT CASE WHEN cv_ppm < {_XYZ_X_PPM} THEN 'X'
                WHEN cv_ppm < {_XYZ_Y_PPM} THEN 'Y'
                ELSE 'Z' END AS xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(n) AS BIGINT) AS n_lineitems,
           CAST(sum(s) AS BIGINT) AS total_qty,
           CAST(sum(cv_ppm) // count(*) AS BIGINT) AS mean_cv_ppm
    FROM cv
    GROUP BY CASE WHEN cv_ppm < {_XYZ_X_PPM} THEN 'X'
                  WHEN cv_ppm < {_XYZ_Y_PPM} THEN 'Y'
                  ELSE 'Z' END
    """,
    doc="XYZ demand-variability classification — the companion axis to "
    "abc_parts_classification in inventory policy (ABC = value, XYZ = "
    "predictability): parts bucket by the coefficient of variation of "
    "their ordered quantities (X steady < 0.25, Y < 0.5, Z erratic).  "
    "cv collapses to sqrt(n*sum(q^2)-sum(q)^2)/sum(q) over exact "
    "integer quantities, so the only float is one correctly-rounded "
    "sqrt/divide shared textually by both engines.  One map-side "
    "partial aggregate per part, then a 3-group rollup — a single "
    "fact pass at any scale.",
    tags=("analytics", "inventory"),
)
def demand_variability_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity"), 0).cast("long")
    pq = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(q).cast("long").alias("s"),
        F.sum(q * q).cast("long").alias("s2"),
    )
    cv = pq.select("n", "s", F.expr(_XYZ_CV).alias("cv_ppm"))
    cls = F.expr(
        f"CASE WHEN cv_ppm < {_XYZ_X_PPM} THEN 'X'"
        f" WHEN cv_ppm < {_XYZ_Y_PPM} THEN 'Y' ELSE 'Z' END"
    )
    return cv.groupBy(cls.alias("xyz_class")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("n").cast("long").alias("n_lineitems"),
        F.sum("s").cast("long").alias("total_qty"),
        F.expr("CAST(sum(cv_ppm) DIV count(*) AS BIGINT)").alias(
            "mean_cv_ppm"
        ),
    )


# --- leave-one-out hit-rate@K of the co-purchase recommender ----------------

_HITRATE_K = 10


@register(
    "copurchase_hitrate_at_k",
    oracle=f"""
    , basket AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pr AS MATERIALIZED (
        SELECT x.l_orderkey, x.l_partkey AS xp, y.l_partkey AS yp
        FROM basket x
        JOIN basket y ON x.l_orderkey = y.l_orderkey
                     AND x.l_partkey <> y.l_partkey
    ),
    cnt AS MATERIALIZED (
        SELECT xp, yp, count(*) AS c FROM pr GROUP BY xp, yp
    ),
    rec AS MATERIALIZED (
        SELECT xp AS src, yp AS rec FROM (
            SELECT xp, yp, row_number() OVER (PARTITION BY xp
                                              ORDER BY c DESC, yp) AS rn
            FROM cnt
        ) WHERE rn <= {_HITRATE_K}
    ),
    bs AS MATERIALIZED (
        SELECT l_orderkey, count(*) AS bsize FROM basket
        GROUP BY l_orderkey HAVING count(*) >= 2
    ),
    hit AS MATERIALIZED (
        SELECT DISTINCT p.l_orderkey, p.yp
        FROM pr p JOIN rec r ON r.src = p.xp AND r.rec = p.yp
    ),
    cases AS (
        SELECT b.l_orderkey, b.l_partkey AS yp, s.bsize,
               CASE WHEN h.yp IS NOT NULL THEN 1 ELSE 0 END AS is_hit
        FROM basket b
        JOIN bs s ON s.l_orderkey = b.l_orderkey
        LEFT JOIN hit h ON h.l_orderkey = b.l_orderkey
                       AND h.yp = b.l_partkey
    )
    SELECT CAST(bsize AS BIGINT) AS basket_size,
           CAST(count(*) AS BIGINT) AS n_cases,
           CAST(sum(is_hit) AS BIGINT) AS n_hits,
           CAST(sum(is_hit) * 1000000 // count(*) AS BIGINT)
               AS hitrate_ppm
    FROM cases GROUP BY bsize
    """,
    doc="Offline leave-one-out evaluation of the item-item co-purchase "
    "recommender: for every order and every held-out part, count a "
    "hit when the part appears in the top-{_HITRATE_K} co-occurrence "
    "neighbor list of ANY other part in the same order — "
    "hit-rate@K by basket size, the standard recsys offline metric "
    "(and the eval loop item_item_cosine_topk feeds in production).  "
    "Determinism: neighbor lists tie-break on (count DESC, part id); "
    "everything else is counting.  Scale shape: pair counts are one "
    "fact-derived rollup, top-K per item is a WindowGroupLimit over "
    "the item-keyed neighbor table, the eval probe joins in-order "
    "pairs against the (src, rec) list — all equi-joins keyed on "
    "part ids, fan-out bounded by basket size x K.",
    tags=("analytics", "recsys"),
)
def copurchase_hitrate_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    basket = li.distinct().transform(snapshot, eager=False)
    baskets = basket.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    e1 = baskets.select(
        "l_orderkey", "parts", F.posexplode("parts").alias("i", "xp")
    )
    pr = (
        e1.select(
            "l_orderkey", "i", "xp", F.posexplode("parts").alias("j", "yp")
        )
        .filter(F.col("j") != F.col("i"))
        .select("l_orderkey", "xp", "yp")
        .transform(snapshot, eager=False)
    )
    cnt = pr.groupBy("xp", "yp").agg(F.count(F.lit(1)).alias("c"))
    wr = W.partitionBy("xp").orderBy(F.desc("c"), F.asc("yp"))
    rec = (
        cnt.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= _HITRATE_K)
        .select(F.col("xp").alias("src"), F.col("yp").alias("rec"))
    )
    bs = (
        basket.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("bsize"))
        .filter(F.col("bsize") >= 2)
    )
    hit = (
        pr.alias("p")
        .join(rec.alias("r"), F.expr("r.src = p.xp AND r.rec = p.yp"))
        .select("p.l_orderkey", "p.yp")
        .distinct()
    )
    cases = (
        basket.alias("b")
        .join(bs.alias("s"), "l_orderkey")
        .join(
            hit.alias("h"),
            F.expr("h.l_orderkey = b.l_orderkey AND h.yp = b.l_partkey"),
            "left",
        )
        .select(
            F.col("s.bsize").alias("bsize"),
            F.when(F.col("h.yp").isNotNull(), 1).otherwise(0).alias("is_hit"),
        )
    )
    return cases.groupBy(
        F.col("bsize").cast("long").alias("basket_size")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_cases"),
        F.sum("is_hit").cast("long").alias("n_hits"),
        F.expr(
            "CAST(sum(is_hit) * 1000000 DIV count(*) AS BIGINT)"
        ).alias("hitrate_ppm"),
    )


# --- time-to-Nth-order adoption latency per part ----------------------------

_ADOPT_N = 5  # the "adopted" threshold: 5th lineitem
_ADOPT_BUCKET_DAYS = 30
_ADOPT_MAX_BUCKET = 12


@register(
    "part_adoption_latency_histogram",
    oracle=f"""
    , r AS (
        SELECT l_partkey,
               epoch_us(l_shipdate) // 86400000000 AS d,
               row_number() OVER (PARTITION BY l_partkey
                                  ORDER BY l_shipdate, l_orderkey,
                                           l_linenumber) AS rn
        FROM lineitem
    ),
    lat AS (
        SELECT l_partkey,
               max(CASE WHEN rn = 1 THEN d END) AS d1,
               max(CASE WHEN rn = {_ADOPT_N} THEN d END) AS dn
        FROM r WHERE rn = 1 OR rn = {_ADOPT_N}
        GROUP BY l_partkey
    )
    SELECT CAST(CASE WHEN dn IS NULL THEN -1
                ELSE least({_ADOPT_MAX_BUCKET},
                           (dn - d1) // {_ADOPT_BUCKET_DAYS}) END
               AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(min(CASE WHEN dn IS NOT NULL THEN dn - d1 END) AS BIGINT)
               AS min_days,
           CAST(max(CASE WHEN dn IS NOT NULL THEN dn - d1 END) AS BIGINT)
               AS max_days
    FROM lat
    GROUP BY CASE WHEN dn IS NULL THEN -1
             ELSE least({_ADOPT_MAX_BUCKET},
                        (dn - d1) // {_ADOPT_BUCKET_DAYS}) END
    """,
    doc="Adoption-latency histogram: for every part, days from its "
    "first shipment to its {_ADOPT_N}th (the time-to-Nth-event metric "
    "product analytics uses for feature adoption and supply planning "
    "uses for ramp-up), bucketed in {_ADOPT_BUCKET_DAYS}-day bands "
    "with parts that never reach {_ADOPT_N} shipments reported as "
    "the censored bucket -1.  The rank pass is one window partitioned "
    "by part (high-cardinality key — no global sort) with a total "
    "order (shipdate, orderkey, linenumber); first/Nth dates collapse "
    "via conditional max, the histogram is a final small rollup.",
    tags=("analytics", "adoption"),
)
def part_adoption_latency_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    r = li.select(
        "l_partkey",
        F.expr("unix_micros(l_shipdate) DIV 86400000000").alias("d"),
        F.row_number().over(w).alias("rn"),
    ).filter((F.col("rn") == 1) | (F.col("rn") == _ADOPT_N))
    lat = r.groupBy("l_partkey").agg(
        F.max(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
        F.max(F.when(F.col("rn") == _ADOPT_N, F.col("d"))).alias("dn"),
    )
    bucket = F.expr(
        f"CAST(CASE WHEN dn IS NULL THEN -1"
        f" ELSE least({_ADOPT_MAX_BUCKET},"
        f" (dn - d1) DIV {_ADOPT_BUCKET_DAYS}) END AS BIGINT)"
    )
    return lat.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.min(F.when(F.col("dn").isNotNull(), F.col("dn") - F.col("d1")))
        .cast("long")
        .alias("min_days"),
        F.max(F.when(F.col("dn").isNotNull(), F.col("dn") - F.col("d1")))
        .cast("long")
        .alias("max_days"),
    )


# --- difference-in-differences conversion estimator -------------------------


@register(
    "diff_in_diff_conversion",
    oracle="""
    , ev AS (
        SELECT user_id, event_type,
               epoch_us(ts) // 86400000000 AS d
        FROM events
    ),
    sp AS (SELECT (min(d) + max(d) + 1) // 2 AS mid FROM ev),
    cohort AS (
        SELECT DISTINCT user_id FROM ev CROSS JOIN sp WHERE d < mid
    ),
    treated AS (
        SELECT DISTINCT user_id FROM ev CROSS JOIN sp
        WHERE d < mid AND event_type = 'error'
    ),
    conv AS (
        SELECT c.user_id,
               CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END AS treat,
               max(CASE WHEN e.d < e.mid AND e.event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS pre_conv,
               max(CASE WHEN e.d >= e.mid AND e.event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS post_conv
        FROM cohort c
        LEFT JOIN treated t ON t.user_id = c.user_id
        LEFT JOIN (SELECT user_id, event_type, d, mid
                   FROM ev CROSS JOIN sp) e ON e.user_id = c.user_id
        GROUP BY c.user_id, CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END
    ),
    cell AS (
        SELECT CAST(sum(treat) AS BIGINT) AS n_treated,
               CAST(sum(1 - treat) AS BIGINT) AS n_control,
               CAST(sum(pre_conv * treat) * 1000000
                    // greatest(sum(treat), 1) AS BIGINT)
                   AS pre_treated_ppm,
               CAST(sum(post_conv * treat) * 1000000
                    // greatest(sum(treat), 1) AS BIGINT)
                   AS post_treated_ppm,
               CAST(sum(pre_conv * (1 - treat)) * 1000000
                    // greatest(sum(1 - treat), 1) AS BIGINT)
                   AS pre_control_ppm,
               CAST(sum(post_conv * (1 - treat)) * 1000000
                    // greatest(sum(1 - treat), 1) AS BIGINT)
                   AS post_control_ppm
        FROM conv
    )
    SELECT n_treated, n_control,
           pre_treated_ppm, post_treated_ppm,
           pre_control_ppm, post_control_ppm,
           CAST((post_treated_ppm - pre_treated_ppm)
                - (post_control_ppm - pre_control_ppm) AS BIGINT)
               AS did_ppm
    FROM cell
    """,
    doc="Difference-in-differences estimator on the event stream: "
    "cohort = users active in the first calendar half, treatment = "
    "experienced an error event in that half, outcome = converted "
    "(any purchase) per half; DiD = (post-pre) gap of treated minus "
    "the same gap for controls, the standard quasi-experimental "
    "correction for secular trends when no randomized flag exists.  "
    "All rates are exact integer ppm over user counts, so the "
    "estimate is bit-stable.  Dataflow: one pass builds per-user "
    "pre/post conversion flags (user-keyed aggregate), cohort and "
    "treatment sets are semi-join-shaped, the 2x2 cell table is "
    "4 rows.",
    tags=("analytics", "causal"),
)
def diff_in_diff_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts) DIV 86400000000").alias("d"),
    )
    sp = ev.agg(F.expr("(min(d) + max(d) + 1) DIV 2").alias("mid"))
    evm = ev.crossJoin(F.broadcast(sp))
    cohort = evm.filter(F.col("d") < F.col("mid")).select("user_id").distinct()
    treated = (
        evm.filter(
            (F.col("d") < F.col("mid")) & (F.col("event_type") == "error")
        )
        .select("user_id")
        .distinct()
        .withColumn("treat", F.lit(1))
    )
    conv = (
        cohort.join(treated, "user_id", "left")
        .na.fill({"treat": 0})
        .join(evm, "user_id", "left")
        .groupBy("user_id", "treat")
        .agg(
            F.max(
                F.when(
                    (F.col("d") < F.col("mid"))
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            ).alias("pre_conv"),
            F.max(
                F.when(
                    (F.col("d") >= F.col("mid"))
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            ).alias("post_conv"),
        )
    )
    cell = conv.agg(
        F.sum("treat").cast("long").alias("n_treated"),
        F.sum(1 - F.col("treat")).cast("long").alias("n_control"),
        F.expr(
            "CAST(sum(pre_conv * treat) * 1000000"
            " DIV greatest(sum(treat), 1) AS BIGINT)"
        ).alias("pre_treated_ppm"),
        F.expr(
            "CAST(sum(post_conv * treat) * 1000000"
            " DIV greatest(sum(treat), 1) AS BIGINT)"
        ).alias("post_treated_ppm"),
        F.expr(
            "CAST(sum(pre_conv * (1 - treat)) * 1000000"
            " DIV greatest(sum(1 - treat), 1) AS BIGINT)"
        ).alias("pre_control_ppm"),
        F.expr(
            "CAST(sum(post_conv * (1 - treat)) * 1000000"
            " DIV greatest(sum(1 - treat), 1) AS BIGINT)"
        ).alias("post_control_ppm"),
    )
    return cell.select(
        "n_treated",
        "n_control",
        "pre_treated_ppm",
        "post_treated_ppm",
        "pre_control_ppm",
        "post_control_ppm",
        F.expr(
            "CAST((post_treated_ppm - pre_treated_ppm)"
            " - (post_control_ppm - pre_control_ppm) AS BIGINT)"
        ).alias("did_ppm"),
    )


# --- safety stock by brand (z * sigma_demand * sqrt(lead time)) -------------

# z = 1.65 (~95% service level) carried as the exact rational 165/100 so
# both engines fold the same literals; all inputs to the float expression
# are exact integer sums.
_SS_Z_NUM = 165
_SS_Z_DEN = 100

_SS_EXPR = (
    "CAST(floor({z_num} * sqrt(CAST(nd * s2 - s * s AS DOUBLE))"
    " * sqrt(CAST(lt_sum AS DOUBLE) / CAST(lt_n AS DOUBLE))"
    " / ({z_den} * CAST(nd AS DOUBLE))) AS BIGINT)"
).format(z_num=_SS_Z_NUM, z_den=_SS_Z_DEN)


@register(
    "safety_stock_by_brand",
    oracle=f"""
    , dd AS (
        SELECT p.p_brand,
               epoch_us(l.l_shipdate) // 86400000000 AS d,
               CAST(sum(CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
                   AS q
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    ds AS (
        SELECT p_brand,
               CAST(count(*) AS BIGINT) AS nd,
               CAST(sum(q) AS BIGINT) AS s,
               CAST(sum(q * q) AS BIGINT) AS s2
        FROM dd GROUP BY p_brand
    ),
    lt AS (
        SELECT p.p_brand,
               CAST(count(*) AS BIGINT) AS lt_n,
               CAST(sum(greatest(epoch_us(l.l_shipdate) // 86400000000
                        - epoch_us(o.o_orderdate) // 86400000000, 0))
                   AS BIGINT) AS lt_sum
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    )
    SELECT ds.p_brand,
           nd AS n_days,
           CAST(s // nd AS BIGINT) AS mean_daily_qty,
           CAST(lt_sum * 100 // lt_n AS BIGINT) AS mean_lead_days_x100,
           {_SS_EXPR} AS safety_stock_units
    FROM ds JOIN lt ON lt.p_brand = ds.p_brand
    """,
    doc="Classic safety-stock sizing per brand: z * sigma(daily demand) "
    "* sqrt(mean lead time), z = 1.65 (~95% service) carried as the "
    "exact rational 165/100 — the reorder-point buffer formula from "
    "inventory theory, fed entirely by exact integer sums (daily "
    "demand variance via n*S2-S^2, lead time as summed whole days clamped at zero — the synthetic fixture ships before ordering on some lines) "
    "so the one float expression is textually identical on both "
    "engines.  Dataflow: a (brand, day) demand rollup then a "
    "25-brand moment aggregate, plus one fact-fact join "
    "(lineitem x orders) for lead times partial-aggregated straight "
    "to brand level — two fact passes, dimension-sized outputs.",
    tags=("analytics", "inventory"),
)
def safety_stock_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    q = F.round(F.col("l_quantity"), 0).cast("long")
    dd = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            "p_brand",
            F.expr("unix_micros(l_shipdate) DIV 86400000000").alias("d"),
        )
        .agg(F.sum(q).cast("long").alias("q"))
    )
    ds = dd.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("q").cast("long").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("s2"),
    )
    lt = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("lt_n"),
            F.sum(
                F.expr(
                    "greatest(unix_micros(l_shipdate) DIV 86400000000"
                    " - unix_micros(o_orderdate) DIV 86400000000, 0)"
                )
            )
            .cast("long")
            .alias("lt_sum"),
        )
    )
    return (
        ds.join(lt, "p_brand")
        .select(
            "p_brand",
            F.col("nd").alias("n_days"),
            F.expr("CAST(s DIV nd AS BIGINT)").alias("mean_daily_qty"),
            F.expr("CAST(lt_sum * 100 DIV lt_n AS BIGINT)").alias(
                "mean_lead_days_x100"
            ),
            F.expr(_SS_EXPR).alias("safety_stock_units"),
        )
    )


# --- k-anonymity across a generalization ladder -----------------------------

_KANON_K = 5


@register(
    "generalization_ladder_kanon",
    oracle=f"""
    , qi AS (
        SELECT r.r_name AS region, n.n_name AS nation, c.c_mktsegment AS seg
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
    ),
    lv AS (
        SELECT 0 AS lvl, nation || '/' || seg AS grp FROM qi
        UNION ALL SELECT 1, region || '/' || seg FROM qi
        UNION ALL SELECT 2, region FROM qi
    ),
    gs AS (
        SELECT lvl, grp, CAST(count(*) AS BIGINT) AS k
        FROM lv GROUP BY lvl, grp
    )
    SELECT CAST(lvl AS BIGINT) AS level,
           CASE lvl WHEN 0 THEN 'nation+segment'
                    WHEN 1 THEN 'region+segment'
                    ELSE 'region' END AS quasi_identifier,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(sum(CASE WHEN k < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_groups_below_k,
           CAST(sum(CASE WHEN k < {_KANON_K} THEN k ELSE 0 END) * 1000000
                // sum(k) AS BIGINT) AS exposed_customers_ppm
    FROM gs GROUP BY lvl
    """,
    doc="k-anonymity across a generalization ladder: the same customer "
    "table evaluated at three quasi-identifier granularities "
    "(nation+segment -> region+segment -> region), reporting group "
    "counts, the smallest group, and the exact ppm of customers "
    "sitting in groups below k={_KANON_K} — the ladder view shows "
    "how much generalization buys re-identification safety, the "
    "decision k_anonymity_audit (single level) cannot express.  One "
    "pass: broadcast dim joins, a 3-way level fan-out (map-side "
    "literal union), one (level, group) rollup and a 3-row summary.",
    tags=("analytics", "privacy"),
)
def generalization_ladder_kanon(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", F.col("n_name").alias("nation")
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    qi = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("region", "nation", F.col("c_mktsegment").alias("seg"))
    )
    lv = qi.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("lvl"),
                    F.concat_ws("/", "nation", "seg").alias("grp"),
                ),
                F.struct(
                    F.lit(1).alias("lvl"),
                    F.concat_ws("/", "region", "seg").alias("grp"),
                ),
                F.struct(F.lit(2).alias("lvl"), F.col("region").alias("grp")),
            )
        ).alias("x")
    ).select("x.lvl", "x.grp")
    gs = lv.groupBy("lvl", "grp").agg(F.count(F.lit(1)).cast("long").alias("k"))
    return gs.groupBy(F.col("lvl").cast("long").alias("level")).agg(
        F.expr(
            "CASE min(lvl) WHEN 0 THEN 'nation+segment'"
            " WHEN 1 THEN 'region+segment' ELSE 'region' END"
        ).alias("quasi_identifier"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("k").cast("long").alias("min_k"),
        F.sum(F.when(F.col("k") < _KANON_K, 1).otherwise(0))
        .cast("long")
        .alias("n_groups_below_k"),
        F.expr(
            f"CAST(sum(CASE WHEN k < {_KANON_K} THEN k ELSE 0 END)"
            " * 1000000 DIV sum(k) AS BIGINT)"
        ).alias("exposed_customers_ppm"),
    )


# --- median-of-medians approximation error audit ----------------------------

_MOM_BUCKETS = 8


@register(
    "median_of_medians_error",
    oracle=f"""
    , t AS (
        SELECT event_type, user_id % {_MOM_BUCKETS} AS bkt,
               CAST(round(value * 100, 0) AS BIGINT) AS cents, event_id
        FROM events
    ),
    bm AS (
        SELECT event_type, bkt, cents AS med FROM (
            SELECT event_type, bkt, cents,
                   row_number() OVER (PARTITION BY event_type, bkt
                                      ORDER BY cents, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type, bkt) AS n
            FROM t
        ) WHERE rn = (n + 1) // 2
    ),
    mom AS (
        SELECT event_type, med AS mom_cents FROM (
            SELECT event_type, med,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY med, bkt) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM bm
        ) WHERE rn = (n + 1) // 2
    ),
    ex AS (
        SELECT event_type, cents AS exact_cents FROM (
            SELECT event_type, cents,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY cents, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM t
        ) WHERE rn = (n + 1) // 2
    )
    SELECT e.event_type, e.exact_cents, m.mom_cents,
           CAST(abs(m.mom_cents - e.exact_cents) * 1000000
                // greatest(abs(e.exact_cents), 1) AS BIGINT) AS err_ppm
    FROM ex e JOIN mom m ON m.event_type = e.event_type
    """,
    doc="Median-of-medians accuracy audit: the exact per-type value "
    "median vs the two-level estimate (nearest-rank median within "
    "{_MOM_BUCKETS} deterministic user-hash buckets, then the median "
    "of those bucket medians) — quantifying on real data the error "
    "of the classic distributed-median shortcut, which at 100 TB "
    "avoids the full sort the exact median needs (each bucket median "
    "is an independent partition-local pass; only {_MOM_BUCKETS} "
    "values cross the wire per group).  All medians use the "
    "nearest-rank rule with total-order tie-breaks, so both engines "
    "select the identical element; error is exact integer ppm.",
    tags=("analytics", "statistics"),
)
def median_of_medians_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        (F.col("user_id") % _MOM_BUCKETS).alias("bkt"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        "event_id",
    )
    wb = W.partitionBy("event_type", "bkt").orderBy("cents", "event_id")
    wbn = W.partitionBy("event_type", "bkt")
    bm = (
        t.withColumn("rn", F.row_number().over(wb))
        .withColumn("n", F.count(F.lit(1)).over(wbn))
        .filter(F.expr("rn = (n + 1) DIV 2"))
        .select("event_type", "bkt", F.col("cents").alias("med"))
    )
    wm = W.partitionBy("event_type").orderBy("med", "bkt")
    wmn = W.partitionBy("event_type")
    mom = (
        bm.withColumn("rn", F.row_number().over(wm))
        .withColumn("n", F.count(F.lit(1)).over(wmn))
        .filter(F.expr("rn = (n + 1) DIV 2"))
        .select("event_type", F.col("med").alias("mom_cents"))
    )
    we = W.partitionBy("event_type").orderBy("cents", "event_id")
    ex = (
        t.withColumn("rn", F.row_number().over(we))
        .withColumn("n", F.count(F.lit(1)).over(wmn))
        .filter(F.expr("rn = (n + 1) DIV 2"))
        .select("event_type", F.col("cents").alias("exact_cents"))
    )
    return (
        ex.join(mom, "event_type")
        .select(
            "event_type",
            "exact_cents",
            "mom_cents",
            F.expr(
                "CAST(abs(mom_cents - exact_cents) * 1000000"
                " DIV greatest(abs(exact_cents), 1) AS BIGINT)"
            ).alias("err_ppm"),
        )
    )


# --- diversified top-N parts (at most 2 per brand) ---------------------------

_DIV_TOPN = 10
_DIV_PER_BRAND = 2


@register(
    "diversified_top_parts",
    oracle=f"""
    , pr AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS rev
        FROM lineitem GROUP BY l_partkey
    ),
    pb AS (
        SELECT p.p_brand, pr.l_partkey, pr.rev,
               row_number() OVER (PARTITION BY p.p_brand
                                  ORDER BY pr.rev DESC, pr.l_partkey)
                   AS brand_rank
        FROM pr JOIN part p ON p.p_partkey = pr.l_partkey
    )
    SELECT p_brand, CAST(l_partkey AS BIGINT) AS l_partkey, rev,
           CAST(brand_rank AS BIGINT) AS brand_rank
    FROM pb WHERE brand_rank <= {_DIV_PER_BRAND}
    ORDER BY rev DESC, l_partkey LIMIT {_DIV_TOPN}
    """,
    doc="Result-diversified top-{_DIV_TOPN}: highest-revenue parts with "
    "at most {_DIV_PER_BRAND} per brand — the constrained ranking "
    "every recommendation/merchandising surface applies so one brand "
    "cannot monopolize the shelf (top-k + per-group quota is not "
    "expressible as a single window; it is the compose of a "
    "per-brand WindowGroupLimit and a global TakeOrdered, which is "
    "exactly the plan here).  Revenue is exact integer cents; both "
    "ranks break ties on the (rev DESC, partkey) total order.  At "
    "100 TB: one per-part rollup, brand dim join, a brand-keyed "
    "window (high-cardinality partitioning), and a distributed "
    "top-{_DIV_TOPN} — no global sort materialization.",
    tags=("analytics", "ranking"),
)
def diversified_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("rev")
    )
    wb = W.partitionBy("p_brand").orderBy(F.desc("rev"), F.asc("l_partkey"))
    pb = (
        pr.join(part, pr.l_partkey == part.p_partkey)
        .select("p_brand", "l_partkey", "rev")
        .withColumn("brand_rank", F.row_number().over(wb))
        .filter(F.col("brand_rank") <= _DIV_PER_BRAND)
    )
    return (
        pb.select(
            "p_brand",
            F.col("l_partkey").cast("long").alias("l_partkey"),
            "rev",
            F.col("brand_rank").cast("long").alias("brand_rank"),
        )
        .orderBy(F.desc("rev"), "l_partkey")
        .limit(_DIV_TOPN)
    )


# --- substitution candidates: same type+size, cheaper brand ------------------

_SUBST_TOPK = 20


@register(
    "part_substitution_candidates",
    oracle=f"""
    , pc AS (
        SELECT p_partkey, p_brand, p_type, p_size,
               CAST(round(p_retailprice * 100, 0) AS BIGINT) AS cents
        FROM part
    )
    SELECT CAST(a.p_partkey AS BIGINT) AS expensive_pk,
           CAST(b.p_partkey AS BIGINT) AS substitute_pk,
           a.p_type, CAST(a.p_size AS BIGINT) AS p_size,
           a.p_brand AS expensive_brand, b.p_brand AS substitute_brand,
           a.cents - b.cents AS saving_cents
    FROM pc a
    JOIN pc b ON b.p_type = a.p_type AND b.p_size = a.p_size
             AND b.p_brand <> a.p_brand
             AND b.cents < a.cents
             AND (a.cents - b.cents) * 20 <= a.cents
    ORDER BY saving_cents DESC, expensive_pk, substitute_pk
    LIMIT {_SUBST_TOPK}
    """,
    doc="Procurement substitution screen: for parts of the same type "
    "and size, cheaper same-spec alternatives from a different brand "
    "within a 5% price corridor (the corridor keeps candidates "
    "commercially comparable; tested as the exact integer "
    "20*saving <= price, no percent float).  Blocked self-join on "
    "the (type, size) spec key — the entity-resolution blocking "
    "shape again, so pair fan-out is sum of squared block sizes, "
    "never |part|^2 — and a distributed top-{_SUBST_TOPK} on the "
    "(saving, keys) total order.",
    tags=("analytics", "procurement"),
)
def part_substitution_candidates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_type",
        "p_size",
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("cents"),
    )
    cand = (
        part.alias("a")
        .join(
            part.alias("b"),
            F.expr(
                "b.p_type = a.p_type AND b.p_size = a.p_size"
                " AND b.p_brand <> a.p_brand AND b.cents < a.cents"
                " AND (a.cents - b.cents) * 20 <= a.cents"
            ),
        )
        .select(
            F.col("a.p_partkey").cast("long").alias("expensive_pk"),
            F.col("b.p_partkey").cast("long").alias("substitute_pk"),
            F.col("a.p_type").alias("p_type"),
            F.col("a.p_size").cast("long").alias("p_size"),
            F.col("a.p_brand").alias("expensive_brand"),
            F.col("b.p_brand").alias("substitute_brand"),
            (F.col("a.cents") - F.col("b.cents")).alias("saving_cents"),
        )
    )
    return cand.orderBy(
        F.desc("saving_cents"), "expensive_pk", "substitute_pk"
    ).limit(_SUBST_TOPK)


# --- monthly order-value percentile trend -----------------------------------


@register(
    "order_value_percentile_trend",
    oracle="""
    , t AS (
        SELECT (EXTRACT(year FROM o_orderdate) * 100
                + EXTRACT(month FROM o_orderdate)) AS ym,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
               o_orderkey
        FROM orders
    ),
    r AS (
        SELECT ym, cents,
               row_number() OVER (PARTITION BY ym
                                  ORDER BY cents, o_orderkey) AS rn,
               count(*) OVER (PARTITION BY ym) AS n
        FROM t
    )
    SELECT CAST(ym AS BIGINT) AS ym,
           CAST(max(n) AS BIGINT) AS n_orders,
           CAST(max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS BIGINT)
               AS p50_cents,
           CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN cents END)
               AS BIGINT) AS p90_cents,
           CAST(max(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END)
               AS BIGINT) AS p99_cents
    FROM r GROUP BY ym
    """,
    doc="Monthly P50/P90/P99 of order value in exact cents — the "
    "tail-vs-typical revenue trend a pricing dashboard tracks "
    "(median drifting while P99 explodes = whale concentration).  "
    "Percentiles use the nearest-rank rule ceil(q*n) with a "
    "(cents, orderkey) total order, so both engines pick the "
    "identical element; one month-partitioned window pass (bounded "
    "partitions), one conditional-max rollup.",
    tags=("analytics", "pricing"),
)
def order_value_percentile_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    t = orders.select(
        F.expr(
            "year(o_orderdate) * 100 + month(o_orderdate)"
        ).alias("ym"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        "o_orderkey",
    )
    wr = W.partitionBy("ym").orderBy("cents", "o_orderkey")
    wn = W.partitionBy("ym")
    r = t.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    return r.groupBy(F.col("ym").cast("long").alias("ym")).agg(
        F.max("n").cast("long").alias("n_orders"),
        F.max(
            F.when(F.expr("rn = (n + 1) DIV 2"), F.col("cents"))
        ).cast("long").alias("p50_cents"),
        F.max(
            F.when(F.expr("rn = (9 * n + 9) DIV 10"), F.col("cents"))
        ).cast("long").alias("p90_cents"),
        F.max(
            F.when(F.expr("rn = (99 * n + 99) DIV 100"), F.col("cents"))
        ).cast("long").alias("p99_cents"),
    )


# --- p-chart of brand return rates ------------------------------------------


@register(
    "brand_return_pchart",
    oracle="""
    , br AS (
        SELECT p.p_brand,
               CAST(count(*) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS BIGINT) AS x_b
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    ),
    g AS (SELECT sum(n_b) AS n_all, sum(x_b) AS x_all FROM br)
    SELECT p_brand, n_b, x_b,
           CAST(x_b * 1000000 // n_b AS BIGINT) AS rate_ppm,
           CAST(x_all * 1000000 // n_all AS BIGINT) AS pooled_ppm,
           CASE WHEN CAST(x_b AS HUGEINT) * n_all - CAST(x_all AS HUGEINT) * n_b > 0
                 AND (CAST(x_b AS HUGEINT) * n_all - CAST(x_all AS HUGEINT) * n_b)
                     * (CAST(x_b AS HUGEINT) * n_all - CAST(x_all AS HUGEINT) * n_b)
                     > 9 * CAST(x_all AS HUGEINT) * (n_all - x_all) * n_b
                THEN 1 ELSE 0 END AS out_of_control_high,
           CASE WHEN CAST(x_b AS HUGEINT) * n_all - CAST(x_all AS HUGEINT) * n_b < 0
                 AND (CAST(x_b AS HUGEINT) * n_all - CAST(x_all AS HUGEINT) * n_b)
                     * (CAST(x_b AS HUGEINT) * n_all - CAST(x_all AS HUGEINT) * n_b)
                     > 9 * CAST(x_all AS HUGEINT) * (n_all - x_all) * n_b
                THEN 1 ELSE 0 END AS out_of_control_low
    FROM br CROSS JOIN g
    """,
    doc="Shewhart p-chart over brand return rates: flag brands whose "
    "return proportion leaves the pooled-rate 3-sigma binomial band "
    "— the attribute-control-chart complement to "
    "return_rate_wilson_rank (which ranks; this one draws control "
    "limits).  The +/-3-sigma test is cross-multiplied into the "
    "exact integer inequality (x_b*N - X*n_b)^2 > 9*X*(N-X)*n_b "
    "(int128/decimal — the products overflow BIGINT at sf0.1), so "
    "no sqrt and no float anywhere.  One fact rollup with a "
    "broadcast part dim, a single-row pooled total, 25 output rows.",
    tags=("analytics", "quality-control"),
)
def brand_return_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    br = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_b"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("x_b"),
        )
    )
    g = br.agg(
        F.sum("n_b").cast("long").alias("n_all"),
        F.sum("x_b").cast("long").alias("x_all"),
    )
    dev = (
        "CAST(x_b AS DECIMAL(38,0)) * n_all"
        " - CAST(x_all AS DECIMAL(38,0)) * n_b"
    )
    bound = "9 * CAST(x_all AS DECIMAL(38,0)) * (n_all - x_all) * n_b"
    return br.crossJoin(F.broadcast(g)).select(
        "p_brand",
        "n_b",
        "x_b",
        F.expr("CAST(x_b * 1000000 DIV n_b AS BIGINT)").alias("rate_ppm"),
        F.expr("CAST(x_all * 1000000 DIV n_all AS BIGINT)").alias(
            "pooled_ppm"
        ),
        F.expr(
            f"CASE WHEN {dev} > 0 AND ({dev}) * ({dev}) > {bound}"
            " THEN 1 ELSE 0 END"
        ).alias("out_of_control_high"),
        F.expr(
            f"CASE WHEN {dev} < 0 AND ({dev}) * ({dev}) > {bound}"
            " THEN 1 ELSE 0 END"
        ).alias("out_of_control_low"),
    )


# --- Spearman rank correlation: user activity vs spend ----------------------

# cross-multiplications in DECIMAL(38,0): n ~ 1e6 users puts n*sxy near
# 1e24, past BIGINT — the 128-bit decimal form is valid on BOTH engines
# (caught by the r07 100x survivability sweep)
_SPEARMAN_CORR = (
    "CAST(floor("
    "CAST(CAST(n AS DECIMAL(38,0)) * sxy"
    "     - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"
    " / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx"
    "             - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"
    "        * CAST(CAST(n AS DECIMAL(38,0)) * syy"
    "               - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE))"
    " * 1000000) AS BIGINT)"
)


@register(
    "spearman_activity_value",
    oracle=f"""
    , u AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS activity,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 100, 0) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS spend_cents
        FROM events GROUP BY user_id
    ),
    rk AS (
        SELECT row_number() OVER (ORDER BY activity, user_id) AS x,
               row_number() OVER (ORDER BY spend_cents, user_id) AS y
        FROM u
    ),
    mo AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS BIGINT) AS sxy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS BIGINT) AS sxx,
               CAST(sum(CAST(y AS HUGEINT) * y) AS BIGINT) AS syy
        FROM rk
    )
    SELECT n AS n_users, {_SPEARMAN_CORR} AS spearman_x1e6
    FROM mo
    """,
    doc="Spearman rank correlation between a user's total activity "
    "(event count) and their purchase spend — the monotone- "
    "association answer to 'do heavier users spend more', robust to "
    "the heavy-tailed spend distribution that wrecks Pearson.  "
    "Ranks are exact integers from a (metric, user_id) total order, "
    "so Spearman reduces to the integer-moment Pearson formula the "
    "repo already pins cross-engine (error_load_correlation model); "
    "ties cannot occur (user_id breaks them), so no tie-correction "
    "term.  The ranked table is user-dimension-sized, so BOTH rank "
    "columns run through the two-phase banded prefix rank "
    "(operators/ids.dense_row_ids, monotonic value buckets) — no "
    "single-partition window; the moment fold after it is one row.",
    tags=("analytics", "statistics"),
)
def spearman_activity_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("activity"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100, 0).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("spend_cents"),
    )
    # both rank columns via the two-phase banded prefix rank
    # (operators/ids.dense_row_ids, monotonic value-derived buckets) —
    # users are a SCALING dimension, so no single-partition row_number
    from mqtt2sql_spark.operators.ids import dense_row_ids

    rkx = dense_row_ids(
        u,
        ["activity", "user_id"],
        id_col="x",
        bucket=F.expr("activity div 16"),
    )
    rk = dense_row_ids(
        rkx,
        ["spend_cents", "user_id"],
        id_col="y",
        bucket=F.expr("spend_cents div 100000"),
    ).select("x", "y")
    mo = rk.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).cast("long").alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).cast("long").alias("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).cast("long").alias("syy"),
    )
    return mo.select(
        F.col("n").alias("n_users"),
        F.expr(_SPEARMAN_CORR).alias("spearman_x1e6"),
    )


# --- Kendall tau between two nation rankings --------------------------------


@register(
    "kendall_tau_nation_ranks",
    oracle="""
    , nm AS (
        SELECT n.n_name AS nation,
               CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS rev_cents,
               CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
    ),
    pairs AS (
        SELECT CASE WHEN (a.rev_cents - b.rev_cents)
                         * (a.n_customers - b.n_customers) > 0
                    THEN 1 ELSE 0 END AS conc,
               CASE WHEN (a.rev_cents - b.rev_cents)
                         * (a.n_customers - b.n_customers) < 0
                    THEN 1 ELSE 0 END AS disc
        FROM nm a JOIN nm b ON a.nation < b.nation
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(conc) AS BIGINT) AS concordant,
               CAST(sum(disc) AS BIGINT) AS discordant
        FROM pairs
    )
    SELECT n_pairs, concordant, discordant,
           CAST((concordant - discordant) * 1000000 // n_pairs AS BIGINT)
               AS tau_ppm
    FROM agg
    """,
    doc="Kendall tau-a between two rankings of nations — by total order "
    "revenue vs by customer count: do the two league tables agree?  "
    "Tau counts concordant minus discordant pairs over all C(25,2) "
    "pairs, computed directly on the exact integer metrics (no rank "
    "materialization needed — tau is invariant under monotone maps), "
    "so the whole statistic is integer sign tests.  The pair "
    "self-join runs on the 25-row aggregated dimension — the O(n^2) "
    "lives at nation scale, never fact scale; the fact pass is one "
    "join-rollup with broadcast dims.",
    tags=("analytics", "statistics"),
)
def kendall_tau_nation_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    nm = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("nation")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("rev_cents"),
            F.countDistinct("c_custkey").cast("long").alias("n_customers"),
        )
    )
    pairs = (
        nm.alias("a")
        .join(F.broadcast(nm.alias("b")), F.expr("a.nation < b.nation"))
        .select(
            F.expr(
                "CASE WHEN (a.rev_cents - b.rev_cents)"
                " * (a.n_customers - b.n_customers) > 0 THEN 1 ELSE 0 END"
            ).alias("conc"),
            F.expr(
                "CASE WHEN (a.rev_cents - b.rev_cents)"
                " * (a.n_customers - b.n_customers) < 0 THEN 1 ELSE 0 END"
            ).alias("disc"),
        )
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("conc").cast("long").alias("concordant"),
        F.sum("disc").cast("long").alias("discordant"),
    )
    return agg.select(
        "n_pairs",
        "concordant",
        "discordant",
        F.expr(
            "CAST((concordant - discordant) * 1000000 DIV n_pairs"
            " AS BIGINT)"
        ).alias("tau_ppm"),
    )


# --- order-total vs lineitem-sum reconciliation ------------------------------

_RECON_BUCKETS = [0, 100, 10_000, 1_000_000]  # cents: exact, <$1, <$100, more


@register(
    "order_total_reconciliation",
    oracle="""
    , ls AS (
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    * (10000 - CAST(round(l_discount * 10000, 0) AS BIGINT))
                    * (10000 + CAST(round(l_tax * 10000, 0) AS BIGINT)))
                   AS HUGEINT) AS line_e8
        FROM lineitem GROUP BY l_orderkey
    ),
    d AS (
        SELECT o.o_orderkey,
               abs(CAST(round(o.o_totalprice * 100, 0) AS HUGEINT)
                   - coalesce(ls.line_e8, 0) // 100000000) AS diff_cents
        FROM orders o LEFT JOIN ls ON ls.l_orderkey = o.o_orderkey
    )
    SELECT CAST(CASE WHEN diff_cents = 0 THEN 0
                WHEN diff_cents < 100 THEN 1
                WHEN diff_cents < 10000 THEN 2
                ELSE 3 END AS BIGINT) AS diff_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(max(diff_cents) AS BIGINT) AS max_diff_cents
    FROM d
    GROUP BY CASE WHEN diff_cents = 0 THEN 0
                  WHEN diff_cents < 100 THEN 1
                  WHEN diff_cents < 10000 THEN 2
                  ELSE 3 END
    """,
    doc="Fact-to-fact reconciliation: does o_totalprice equal the sum "
    "of its lineitems' extendedprice*(1-discount)*(1+tax)?  The "
    "line-side sum is the exact integer product cents x (10000-bp) x "
    "(10000+bp) (e8 fixed point, int128 accumulation), floored back "
    "to cents, so every order's discrepancy is an exact integer — "
    "bucketed 0 / <$1 / <$100 / more, the standard invoice-audit "
    "histogram (the synthetic fixture generates order totals "
    "independently of lines, so expect mass in the top bucket; on "
    "real TPC-H bucket 0 holds everything).  One per-order rollup, "
    "one orderkey equi-join (orders lacking lines reconcile against "
    "0), a 4-row summary.",
    tags=("analytics", "data-quality"),
)
def order_total_reconciliation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    e8 = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("decimal(38,0)")
        * (10000 - F.round(F.col("l_discount") * 10000, 0).cast("long"))
        * (10000 + F.round(F.col("l_tax") * 10000, 0).cast("long"))
    )
    ls = li.groupBy("l_orderkey").agg(F.sum(e8).alias("line_e8"))
    d = (
        orders.join(ls, orders.o_orderkey == ls.l_orderkey, "left")
        .select(
            F.abs(
                F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)")
                - F.expr(
                    "coalesce(line_e8, CAST(0 AS DECIMAL(38,0)))"
                    " div 100000000"
                )
            ).alias("diff_cents")
        )
    )
    bucket = F.expr(
        "CAST(CASE WHEN diff_cents = 0 THEN 0"
        " WHEN diff_cents < 100 THEN 1"
        " WHEN diff_cents < 10000 THEN 2"
        " ELSE 3 END AS BIGINT)"
    )
    return d.groupBy(bucket.alias("diff_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.max("diff_cents").cast("long").alias("max_diff_cents"),
    )


# --- exact Shapley attribution over channel-exposure sets -------------------

# 4 channels -> 16 exposure sets; Shapley weights |S|!(k-1-|S|)!/k! are
# carried times k! = 24, so phi is an exact integer in x24-ppm units.
_SHAP_CHANNELS = [("click", 1), ("view", 2), ("signup", 4), ("error", 8)]
_SHAP_W24 = {0: 6, 1: 2, 2: 2, 3: 6}  # s! * (3-s)!


@register(
    "shapley_channel_attribution",
    oracle=f"""
    , uj AS (
        SELECT user_id,
               CAST(sum(DISTINCT CASE event_type
                    WHEN 'click' THEN 1 WHEN 'view' THEN 2
                    WHEN 'signup' THEN 4 WHEN 'error' THEN 8
                    ELSE 0 END) AS BIGINT) AS mask,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id
    ),
    v AS MATERIALIZED (
        SELECT mask, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(conv) * 1000000 // count(*) AS BIGINT) AS v_ppm
        FROM uj GROUP BY mask
    ),
    ch AS (SELECT * FROM (VALUES
        {", ".join(f"('{n}', {b})" for n, b in _SHAP_CHANNELS)}) AS t(channel, bit)),
    sub AS (
        SELECT ch.channel, ch.bit, m.mask AS s
        FROM ch CROSS JOIN (SELECT unnest(range(0, 16)) AS mask) m
        WHERE (m.mask & ch.bit) = 0
    ),
    contrib AS (
        SELECT s.channel,
               (CASE bit_count(CAST(s.s AS BIGINT) & 15)
                     WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
                     ELSE 6 END)
               * (coalesce(va.v_ppm, 0) - coalesce(vb.v_ppm, 0)) AS c
        FROM sub s
        LEFT JOIN v va ON va.mask = s.s + s.bit
        LEFT JOIN v vb ON vb.mask = s.s
    ),
    expo AS (
        SELECT ch.channel,
               CAST(sum(CASE WHEN (uj.mask & ch.bit) <> 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS exposed_users
        FROM ch CROSS JOIN uj GROUP BY ch.channel
    )
    SELECT c.channel,
           e.exposed_users,
           CAST(sum(c.c) AS BIGINT) AS phi_x24_ppm
    FROM contrib c JOIN expo e ON e.channel = c.channel
    GROUP BY c.channel, e.exposed_users
    """,
    doc="Exact Shapley-value attribution of purchase conversion across "
    "the four non-purchase channels (click/view/signup/error "
    "exposure sets): with k=4 the 2^k lattice is enumerable, so the "
    "game-theoretic credit — the only attribution satisfying "
    "efficiency/symmetry/dummy axioms, unlike the positional "
    "last-touch/linear/time-decay trio already in the suite — is "
    "computed EXACTLY, no permutation sampling.  Weights are "
    "carried x k!=24 and v(S) as integer ppm conversion rates, so "
    "phi is a pure integer; empty exposure sets contribute v=0 via "
    "coalesce on both engines.  Dataflow: one user rollup to a "
    "16-row characteristic function, then a 64-row lattice join — "
    "the fact pass is everything, the game is dimension-sized.",
    tags=("analytics", "attribution"),
)
def shapley_channel_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "error", 8)
        .otherwise(0)
    )
    uj = ev.groupBy("user_id").agg(
        F.sum_distinct(bit).cast("long").alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    v = uj.groupBy("mask").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(sum(conv) * 1000000 DIV count(*) AS BIGINT)").alias(
            "v_ppm"
        ),
    ).transform(snapshot, eager=False)
    ch = spark.createDataFrame(_SHAP_CHANNELS, "channel STRING, bit INT")
    masks = spark.range(0, 16).select(F.col("id").cast("int").alias("s"))
    sub = (
        ch.crossJoin(masks)
        .filter(F.expr("(s & bit) = 0"))
    )
    contrib = (
        sub.alias("s")
        .join(
            F.broadcast(v.select(F.col("mask").alias("ma"), F.col("v_ppm").alias("va"))),
            F.expr("ma = s.s + s.bit"),
            "left",
        )
        .join(
            F.broadcast(v.select(F.col("mask").alias("mb"), F.col("v_ppm").alias("vb"))),
            F.expr("mb = s.s"),
            "left",
        )
        .select(
            "channel",
            F.expr(
                "(CASE bit_count(CAST(s AS BIGINT) & 15)"
                " WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2"
                " ELSE 6 END)"
                " * (coalesce(va, 0) - coalesce(vb, 0))"
            ).alias("c"),
        )
    )
    expo = (
        uj.crossJoin(F.broadcast(ch))
        .groupBy("channel")
        .agg(
            F.sum(
                F.when(F.expr("(mask & bit) <> 0"), 1).otherwise(0)
            )
            .cast("long")
            .alias("exposed_users")
        )
    )
    return (
        contrib.groupBy("channel")
        .agg(F.sum("c").cast("long").alias("phi_x24_ppm"))
        .join(expo, "channel")
        .select("channel", "exposed_users", "phi_x24_ppm")
    )


# --- catalog coverage of the co-purchase recommender ------------------------


@register(
    "recsys_catalog_coverage",
    oracle=f"""
    , basket AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pr AS (
        SELECT x.l_partkey AS xp, y.l_partkey AS yp, count(*) AS c
        FROM basket x
        JOIN basket y ON x.l_orderkey = y.l_orderkey
                     AND x.l_partkey <> y.l_partkey
        GROUP BY 1, 2
    ),
    rec AS MATERIALIZED (
        SELECT xp AS src, yp AS rec FROM (
            SELECT xp, yp, row_number() OVER (PARTITION BY xp
                                              ORDER BY c DESC, yp) AS rn
            FROM pr
        ) WHERE rn <= {_HITRATE_K}
    ),
    recset AS (SELECT DISTINCT rec FROM rec),
    pb AS (
        SELECT p.p_brand,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(CASE WHEN r.rec IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_recommended
        FROM part p LEFT JOIN recset r ON r.rec = p.p_partkey
        GROUP BY p.p_brand
    )
    SELECT p_brand, n_parts, n_recommended,
           CAST(n_recommended * 1000000 // n_parts AS BIGINT)
               AS coverage_ppm
    FROM pb
    """,
    doc="Catalog coverage of the top-{_HITRATE_K} co-purchase "
    "recommender, by brand: what fraction of the catalog ever "
    "appears in ANY recommendation list — the diversity counterpart "
    "to copurchase_hitrate_at_k (accuracy): high hit-rate with low "
    "coverage is the popularity-bias trap that starves the long "
    "tail.  Same pair-count + WindowGroupLimit recommender build, "
    "then one DISTINCT over recommended items and a left join "
    "against the part dimension — the coverage readout costs one "
    "dimension pass beyond the model build.",
    tags=("analytics", "recsys"),
)
def recsys_catalog_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    basket = li.distinct()
    baskets = basket.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    e1 = baskets.select("parts", F.posexplode("parts").alias("i", "xp"))
    pr = (
        e1.select("i", "xp", F.posexplode("parts").alias("j", "yp"))
        .filter(F.col("j") != F.col("i"))
        .groupBy("xp", "yp")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wr = W.partitionBy("xp").orderBy(F.desc("c"), F.asc("yp"))
    recset = (
        pr.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= _HITRATE_K)
        .select(F.col("yp").alias("rec"))
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pb = (
        part.join(recset, part.p_partkey == recset.rec, "left")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum(F.when(F.col("rec").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_recommended"),
        )
    )
    return pb.select(
        "p_brand",
        "n_parts",
        "n_recommended",
        F.expr(
            "CAST(n_recommended * 1000000 DIV n_parts AS BIGINT)"
        ).alias("coverage_ppm"),
    )


# --- economic order quantity by brand ---------------------------------------

_EOQ_ORDER_COST_CENTS = 500_000  # S: fixed cost per replenishment order


@register(
    "eoq_by_brand",
    oracle=f"""
    , d AS (
        SELECT p.p_brand,
               CAST(sum(CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
                   AS demand_qty,
               CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                    // sum(CAST(round(l.l_quantity, 0) AS BIGINT))
                   AS BIGINT) AS unit_cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    )
    SELECT p_brand, demand_qty, unit_cents,
           CAST(unit_cents // 5 AS BIGINT) AS holding_cents,
           CAST(floor(sqrt(
               CAST(2 * demand_qty * {_EOQ_ORDER_COST_CENTS} AS DOUBLE)
               / CAST(greatest(unit_cents // 5, 1) AS DOUBLE)
           )) AS BIGINT) AS eoq_units
    FROM d
    """,
    doc="Economic order quantity per brand — EOQ = sqrt(2DS/H) with "
    "observed demand D (exact integer quantities), fixed order cost "
    "S = $5000, and holding cost H = 20% of the observed unit price "
    "(exact integer cents via integer division) — closing the "
    "inventory-policy suite alongside abc_parts_classification "
    "(value), demand_variability_xyz (predictability) and "
    "safety_stock_by_brand (buffer).  The only float is one "
    "correctly-rounded sqrt over a ratio of exact integers, "
    "textually shared; one fact rollup with a broadcast part dim, "
    "25 rows out.",
    tags=("analytics", "inventory"),
)
def eoq_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    q = F.round(F.col("l_quantity"), 0).cast("long")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    d = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(q).cast("long").alias("demand_qty"),
            F.expr(
                "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))"
                " DIV sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)"
            ).alias("unit_cents"),
        )
    )
    return d.select(
        "p_brand",
        "demand_qty",
        "unit_cents",
        F.expr("CAST(unit_cents DIV 5 AS BIGINT)").alias("holding_cents"),
        F.expr(
            f"CAST(floor(sqrt("
            f"CAST(2 * demand_qty * {_EOQ_ORDER_COST_CENTS} AS DOUBLE)"
            " / CAST(greatest(unit_cents DIV 5, 1) AS DOUBLE)"
            ")) AS BIGINT)"
        ).alias("eoq_units"),
    )


# --- ABC x XYZ policy matrix -------------------------------------------------


@register(
    "abc_xyz_policy_matrix",
    oracle=f"""
    , pm AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    * (10000 - CAST(round(l_discount * 10000, 0) AS BIGINT)))
                    AS BIGINT) AS rev,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
                   AS s,
               CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)
                        * CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
                   AS s2
        FROM lineitem GROUP BY l_partkey
    ),
    r AS (
        SELECT l_partkey, rev, n, s, s2,
               sum(rev) OVER (ORDER BY rev DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM pm
    ),
    g AS (SELECT sum(rev) AS tot FROM pm),
    classed AS (
        SELECT rev,
               CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                    WHEN cum * 20 <= tot * 19 THEN 'B'
                    ELSE 'C' END AS abc_class,
               CASE WHEN ({_XYZ_CV}) < {_XYZ_X_PPM} THEN 'X'
                    WHEN ({_XYZ_CV}) < {_XYZ_Y_PPM} THEN 'Y'
                    ELSE 'Z' END AS xyz_class
        FROM r CROSS JOIN g
    )
    SELECT abc_class, xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev) // 10000 AS BIGINT) AS revenue_cents
    FROM classed GROUP BY abc_class, xyz_class
    """,
    doc="The ABC x XYZ policy matrix — the deliverable inventory "
    "planners actually act on: each part classified on BOTH axes "
    "(value via cumulative-revenue bands, predictability via "
    "demand-cv bands) and rolled into the 9-cell grid with part "
    "counts and exact revenue (AX = automate replenishment, CZ = "
    "make-to-order, etc).  Reuses the abc_parts_classification "
    "banded prefix sum and the demand_variability_xyz integer cv "
    "verbatim, so the cells reconcile exactly with both single-axis "
    "views; one per-part rollup computes every moment in a single "
    "fact pass.",
    tags=("analytics", "inventory"),
)
def abc_xyz_policy_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    e6 = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * (10000 - F.round(F.col("l_discount") * 10000, 0).cast("long"))
    )
    q = F.round(F.col("l_quantity"), 0).cast("long")
    pm = li.groupBy("l_partkey").agg(
        F.sum(e6).cast("long").alias("rev"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(q).cast("long").alias("s"),
        F.sum(q * q).cast("long").alias("s2"),
    )
    base = pm.select(
        "l_partkey",
        "rev",
        "n",
        "s",
        "s2",
        (-F.col("rev")).alias("sk"),
    ).withColumn("_bkt", F.expr(f"-(rev DIV {_ABC_BAND})"))
    w_in = (
        W.partitionBy("_bkt")
        .orderBy("sk", "l_partkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = base.withColumn(
        "_cum_in", F.sum("rev").over(w_in)
    ).transform(snapshot, eager=False)
    totals = local.groupBy("_bkt").agg(F.max("_cum_in").alias("_tot"))
    w_off = W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "_bkt",
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off"),
    )
    grand = totals.agg(F.sum("_tot").alias("tot"))
    classed = (
        local.join(F.broadcast(offsets), "_bkt")
        .select(
            "rev",
            "n",
            "s",
            "s2",
            (F.col("_off") + F.col("_cum_in")).alias("cum"),
        )
        .crossJoin(F.broadcast(grand))
        .select(
            "rev",
            F.expr(
                "CASE WHEN cum * 5 <= tot * 4 THEN 'A' "
                "WHEN cum * 20 <= tot * 19 THEN 'B' ELSE 'C' END"
            ).alias("abc_class"),
            F.expr(
                f"CASE WHEN ({_XYZ_CV}) < {_XYZ_X_PPM} THEN 'X'"
                f" WHEN ({_XYZ_CV}) < {_XYZ_Y_PPM} THEN 'Y'"
                " ELSE 'Z' END"
            ).alias("xyz_class"),
        )
    )
    return classed.groupBy("abc_class", "xyz_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.expr("CAST(sum(rev) DIV 10000 AS BIGINT)").alias("revenue_cents"),
    )


# --- one-way ANOVA: order value across day-of-week ---------------------------


@register(
    "order_value_anova_dow",
    oracle="""
    , q AS (
        SELECT epoch_us(o_orderdate) // 86400000000 % 7 AS dow,
               CAST(round(o_totalprice, 0) AS BIGINT) AS v
        FROM orders
    ),
    per AS (
        SELECT dow, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS s,
               CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS ss
        FROM q GROUP BY dow
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS big_n,
               CAST(sum(s) AS BIGINT) AS big_s,
               CAST(sum(ss) AS HUGEINT) AS big_ss,
               CAST(sum(CAST(s AS HUGEINT) * s // n) AS HUGEINT) AS sq
        FROM per
    )
    SELECT CAST(k AS BIGINT) AS n_groups,
           CAST(big_n AS BIGINT) AS n_orders,
           CAST(sq - CAST(big_s AS HUGEINT) * big_s // big_n AS BIGINT)
               AS ssb_fp,
           CAST(big_ss - sq AS BIGINT) AS ssw_fp,
           CAST((sq - CAST(big_s AS HUGEINT) * big_s // big_n) * (big_n - k)
                * 100 // greatest((big_ss - sq) * (k - 1), 1) AS BIGINT)
               AS f_stat_x100
    FROM tot
    """,
    doc="One-way ANOVA of order value across day-of-week (epoch-day "
    "mod 7): between/within sums of squares and the F statistic in "
    "exact integer arithmetic over whole-dollar values (cents would push the per-group s^2 div n beyond BIGINT at sf>=0.1; dollars keep headroom to SF100) — the norm_anova_by_label formulation "
    "applied to order values; int128 carries the squared "
    "sums) — F near 1 means weekday does not move basket size, so "
    "a dow dimension can be dropped from pricing models; large F "
    "says calendars matter.  One map-side-partial group rollup to "
    "7 rows, one single-row fold — a single fact pass.",
    tags=("analytics", "statistics"),
)
def order_value_anova_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    q = orders.select(
        F.expr(
            "unix_micros(o_orderdate) DIV 86400000000 % 7"
        ).alias("dow"),
        F.round(F.col("o_totalprice"), 0).cast("long").alias("v"),
    )
    per = q.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).alias("ss"),
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("big_n"),
        F.sum("s").cast("long").alias("big_s"),
        F.sum("ss").alias("big_ss"),
        F.sum(F.expr("CAST(s AS DECIMAL(38,0)) * s div n")).alias("sq"),
    )
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("big_n").alias("n_orders"),
        F.expr(
            "CAST(sq - CAST(big_s AS DECIMAL(38,0)) * big_s div big_n"
            " AS BIGINT)"
        ).alias("ssb_fp"),
        F.expr("CAST(big_ss - sq AS BIGINT)").alias("ssw_fp"),
        F.expr(
            "CAST(CAST(sq - CAST(big_s AS DECIMAL(38,0)) * big_s div big_n"
            " AS DECIMAL(38,0)) * (big_n - k) * 100"
            " div greatest(CAST(big_ss - sq AS DECIMAL(38,0)) * (k - 1), 1)"
            " AS BIGINT)"
        ).alias("f_stat_x100"),
    )


# --- supplier market-share shift (total variation, month over month) --------


@register(
    "supplier_share_shift",
    oracle="""
    , sm AS (
        SELECT l_suppkey,
               (EXTRACT(year FROM l_shipdate) * 12
                + EXTRACT(month FROM l_shipdate)) AS ym,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS rev
        FROM lineitem GROUP BY 1, 2
    ),
    mt AS (
        SELECT ym, CAST(sum(rev) AS BIGINT) AS tot FROM sm GROUP BY ym
    ),
    pairs AS (
        SELECT coalesce(a.l_suppkey, b.l_suppkey) AS sk,
               coalesce(a.ym, b.ym - 1) + 1 AS ym_to,
               coalesce(a.rev, 0) AS rev_p,
               coalesce(b.rev, 0) AS rev_q
        FROM sm a FULL JOIN sm b
          ON b.l_suppkey = a.l_suppkey AND b.ym = a.ym + 1
        WHERE (a.ym IS NULL OR a.ym + 1 IN (SELECT ym FROM mt))
          AND (b.ym IS NULL OR b.ym - 1 IN (SELECT ym FROM mt))
    ),
    tv AS (
        SELECT p.ym_to,
               CAST(sum(abs(CAST(p.rev_q AS HUGEINT) * tp.tot
                            - CAST(p.rev_p AS HUGEINT) * tq.tot))
                   AS HUGEINT) AS num,
               CAST(max(CAST(tp.tot AS HUGEINT) * tq.tot) AS HUGEINT)
                   AS den
        FROM pairs p
        JOIN mt tp ON tp.ym = p.ym_to - 1
        JOIN mt tq ON tq.ym = p.ym_to
        GROUP BY p.ym_to
    )
    SELECT CAST(ym_to AS BIGINT) AS ym,
           CAST(num * 500000 // den AS BIGINT) AS tv_shift_ppm
    FROM tv
    """,
    doc="Supplier market-dynamics monitor: the total-variation "
    "distance between consecutive months' supplier revenue-share "
    "distributions, TV = 1/2 * sum_s |p_s - q_s| in exact ppm — "
    "near 0 means share is sticky, spikes mark churn events "
    "(supplier entry/exit contributes its full share via the "
    "full-outer join's zero fill).  Shares never materialize as "
    "floats: |p-q| cross-multiplies to |rev_s*T' - rev'_s*T| over "
    "T*T' in int128.  One fact rollup to (supplier, month), a "
    "month-offset full-outer self-join, month totals broadcast.",
    tags=("analytics", "market"),
)
def supplier_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sm = li.groupBy(
        "l_suppkey",
        F.expr(
            "year(l_shipdate) * 12 + month(l_shipdate)"
        ).alias("ym"),
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("rev")
    ).transform(snapshot, eager=False)
    mt = sm.groupBy("ym").agg(F.sum("rev").cast("long").alias("tot"))
    months = mt.select("ym")
    pairs = (
        sm.alias("a")
        .join(
            sm.alias("b"),
            F.expr("b.l_suppkey = a.l_suppkey AND b.ym = a.ym + 1"),
            "full",
        )
        .join(
            F.broadcast(months.select(F.col("ym").alias("_mnext"))),
            F.expr("a.ym IS NULL OR a.ym + 1 = _mnext"),
            "left_semi",
        )
        .join(
            F.broadcast(months.select(F.col("ym").alias("_mprev"))),
            F.expr("b.ym IS NULL OR b.ym - 1 = _mprev"),
            "left_semi",
        )
        .select(
            F.expr("coalesce(a.ym, b.ym - 1) + 1").alias("ym_to"),
            F.expr("coalesce(a.rev, 0)").alias("rev_p"),
            F.expr("coalesce(b.rev, 0)").alias("rev_q"),
        )
    )
    tv = (
        pairs.alias("p")
        .join(
            F.broadcast(mt.select(F.col("ym").alias("_yp"), F.col("tot").alias("tot_p"))),
            F.expr("_yp = p.ym_to - 1"),
        )
        .join(
            F.broadcast(mt.select(F.col("ym").alias("_yq"), F.col("tot").alias("tot_q"))),
            F.expr("_yq = p.ym_to"),
        )
        .groupBy("ym_to")
        .agg(
            F.sum(
                F.abs(
                    F.expr(
                        "CAST(rev_q AS DECIMAL(38,0)) * tot_p"
                        " - CAST(rev_p AS DECIMAL(38,0)) * tot_q"
                    )
                )
            ).alias("num"),
            F.max(
                F.expr("CAST(tot_p AS DECIMAL(38,0)) * tot_q")
            ).alias("den"),
        )
    )
    return tv.select(
        F.col("ym_to").cast("long").alias("ym"),
        F.expr("CAST(num * 500000 div den AS BIGINT)").alias(
            "tv_shift_ppm"
        ),
    )


# --- value-at-risk / expected shortfall of daily revenue --------------------

_CVAR_PCT = 5  # tail percent


@register(
    "revenue_cvar_daily",
    oracle=f"""
    , dr AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS d,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ),
    r AS (
        SELECT d, rev,
               row_number() OVER (ORDER BY rev, d) AS rn,
               count(*) OVER () AS n
        FROM dr
    ),
    k AS (SELECT greatest(({_CVAR_PCT} * max(n) + 99) // 100, 1) AS k,
                 max(n) AS n
          FROM r)
    SELECT (SELECT CAST(n AS BIGINT) FROM k) AS n_days,
           (SELECT CAST(k AS BIGINT) FROM k) AS n_tail_days,
           CAST(max(CASE WHEN rn = (SELECT k FROM k) THEN rev END)
               AS BIGINT) AS var{_CVAR_PCT}_cents,
           CAST(sum(CASE WHEN rn <= (SELECT k FROM k) THEN rev ELSE 0 END)
                // (SELECT k FROM k) AS BIGINT) AS cvar{_CVAR_PCT}_cents
    FROM r
    """,
    doc="Tail-risk readout of daily revenue: the {_CVAR_PCT}% "
    "value-at-risk (the nearest-rank worst-decile-boundary day, "
    "ceil(p*n) with a (rev, day) total order) and the expected "
    "shortfall / CVaR (exact integer mean of the k worst days) — "
    "the coherent-risk-measure pair finance reporting uses, applied "
    "to revenue operations ('how bad is a bad day, and how bad is "
    "the average bad day').  One daily rollup, one rank window over "
    "the day-dimension table, a conditional fold — all exact "
    "cents.",
    tags=("analytics", "risk"),
)
def revenue_cvar_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    dr = orders.groupBy(
        F.expr("unix_micros(o_orderdate) DIV 86400000000").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("rev")
    )
    wr = W.orderBy("rev", "d")
    wn = W.partitionBy()
    r = dr.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    kdf = r.agg(
        F.expr(
            f"greatest(({_CVAR_PCT} * max(n) + 99) DIV 100, 1)"
        ).alias("k"),
        F.max("n").cast("long").alias("n_all"),
    )
    return (
        r.crossJoin(F.broadcast(kdf))
        .agg(
            F.max("n_all").cast("long").alias("n_days"),
            F.max("k").cast("long").alias("n_tail_days"),
            F.max(
                F.when(F.col("rn") == F.col("k"), F.col("rev"))
            ).cast("long").alias(f"var{_CVAR_PCT}_cents"),
            F.expr(
                "CAST(sum(CASE WHEN rn <= k THEN rev ELSE 0 END)"
                " DIV max(k) AS BIGINT)"
            ).alias(f"cvar{_CVAR_PCT}_cents"),
        )
    )


# --- lines-per-order fanout histogram ---------------------------------------


@register(
    "lines_per_order_histogram",
    oracle="""
    , lo AS (
        SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lo)
    SELECT n_lines,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) * 1000000 // (SELECT n FROM tot) AS BIGINT)
               AS share_ppm
    FROM lo GROUP BY n_lines
    """,
    doc="Order-to-lineitem fanout distribution: how many orders carry "
    "1, 2, ... line items, with exact ppm shares — the join-fanout "
    "profile that sizes the orders-lineitem shuffle (skewed fanout "
    "= skewed join partitions) and the basket-depth fact behind the "
    "copurchase suite's pair-explosion bounds.  One per-order "
    "rollup and a tiny histogram fold.",
    tags=("analytics", "profiling"),
)
def lines_per_order_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    lo = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    tot = lo.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        lo.groupBy("n_lines")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .select(
            "n_lines",
            "n_orders",
            F.expr("CAST(n_orders * 1000000 DIV n AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )


# --- supplier latency-trend census ------------------------------------------

_TREND_MIN_LINES = 20


@register(
    "supplier_latency_trend_census",
    oracle=f"""
    , lt AS (
        SELECT l_suppkey,
               epoch_us(l_shipdate) // 86400000000 AS x,
               greatest(epoch_us(l_shipdate) // 86400000000
                        - epoch_us(o.o_orderdate) // 86400000000, 0) AS y
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    mo AS (
        SELECT l_suppkey,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        FROM lt GROUP BY l_suppkey
        HAVING count(*) >= {_TREND_MIN_LINES}
    ),
    sgn AS (
        SELECT l_suppkey,
               CASE WHEN n * sxy - CAST(sx AS HUGEINT) * sy > 0 THEN 1
                    WHEN n * sxy - CAST(sx AS HUGEINT) * sy < 0 THEN -1
                    ELSE 0 END AS slope_sign
        FROM mo
    )
    SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(CASE WHEN slope_sign > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_worsening,
           CAST(sum(CASE WHEN slope_sign < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_improving,
           CAST(sum(CASE WHEN slope_sign = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flat,
           CAST(sum(CASE WHEN slope_sign > 0 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS worsening_ppm
    FROM sgn
    """,
    doc="Mass-regression census: for every supplier with >= "
    "{_TREND_MIN_LINES} shipments, the SIGN of the OLS slope of "
    "ship latency over calendar time — worsening vs improving vs "
    "flat — without ever computing the slope as a float: "
    "sign(beta) = sign(n*Sxy - Sx*Sy), an exact int128 expression, "
    "so thousands of per-entity regressions reduce to one "
    "map-side-partial moment aggregate and a sign test (the "
    "fleet-health complement to supplier_latency_consistency's "
    "level view; negative lead-time artifacts clamp at 0 as in "
    "safety_stock_by_brand).",
    tags=("analytics", "trend"),
)
def supplier_latency_trend_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lt = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_suppkey",
        F.expr("unix_micros(l_shipdate) DIV 86400000000").alias("x"),
        F.expr(
            "greatest(unix_micros(l_shipdate) DIV 86400000000"
            " - unix_micros(o_orderdate) DIV 86400000000, 0)"
        ).alias("y"),
    )
    mo = (
        lt.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        )
        .filter(F.col("n") >= _TREND_MIN_LINES)
    )
    sgn = mo.select(
        F.expr(
            "CASE WHEN n * sxy - CAST(sx AS DECIMAL(38,0)) * sy > 0 THEN 1"
            " WHEN n * sxy - CAST(sx AS DECIMAL(38,0)) * sy < 0 THEN -1"
            " ELSE 0 END"
        ).alias("slope_sign")
    )
    return sgn.agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum(F.when(F.col("slope_sign") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_worsening"),
        F.sum(F.when(F.col("slope_sign") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_improving"),
        F.sum(F.when(F.col("slope_sign") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_flat"),
        F.expr(
            "CAST(sum(CASE WHEN slope_sign > 0 THEN 1 ELSE 0 END)"
            " * 1000000 DIV count(*) AS BIGINT)"
        ).alias("worsening_ppm"),
    )


# --- negative lead-time (ship-before-order) data-quality audit --------------


@register(
    "negative_leadtime_audit",
    oracle="""
    , lt AS (
        SELECT EXTRACT(year FROM l.l_shipdate) AS yr,
               epoch_us(l.l_shipdate) // 86400000000
               - epoch_us(o.o_orderdate) // 86400000000 AS lead_days
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT CAST(yr AS BIGINT) AS yr,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN lead_days < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_negative,
           CAST(sum(CASE WHEN lead_days < 0 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS negative_ppm,
           CAST(min(lead_days) AS BIGINT) AS worst_days,
           CAST(CASE WHEN sum(CASE WHEN lead_days < 0 THEN 1 ELSE 0 END) > 0
                THEN sum(CASE WHEN lead_days < 0 THEN -lead_days ELSE 0 END)
                     // sum(CASE WHEN lead_days < 0 THEN 1 ELSE 0 END)
                ELSE 0 END AS BIGINT) AS mean_negative_magnitude_days
    FROM lt GROUP BY yr
    """,
    doc="Temporal-integrity audit: line items shipped BEFORE their "
    "order date, per year — the impossible-timeline defect class "
    "(clock skew, backdated orders, ETL joins across snapshot "
    "boundaries) that this synthetic fixture exhibits heavily and "
    "that safety_stock_by_brand / supplier_latency_trend_census "
    "must clamp around; quantifying it per year tells a pipeline "
    "whether the defect is historic or ongoing.  One fact-fact "
    "equi-join and a per-year conditional rollup, all integer "
    "day arithmetic.",
    tags=("analytics", "data-quality"),
)
def negative_leadtime_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lt = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.expr("year(l_shipdate)").alias("yr"),
        F.expr(
            "unix_micros(l_shipdate) DIV 86400000000"
            " - unix_micros(o_orderdate) DIV 86400000000"
        ).alias("lead_days"),
    )
    neg = F.when(F.col("lead_days") < 0, 1).otherwise(0)
    return lt.groupBy(F.col("yr").cast("long").alias("yr")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(neg).cast("long").alias("n_negative"),
        F.expr(
            "CAST(sum(CASE WHEN lead_days < 0 THEN 1 ELSE 0 END) * 1000000"
            " DIV count(*) AS BIGINT)"
        ).alias("negative_ppm"),
        F.min("lead_days").cast("long").alias("worst_days"),
        F.expr(
            "CAST(CASE WHEN sum(CASE WHEN lead_days < 0 THEN 1 ELSE 0 END)"
            " > 0 THEN sum(CASE WHEN lead_days < 0 THEN -lead_days ELSE 0"
            " END) DIV sum(CASE WHEN lead_days < 0 THEN 1 ELSE 0 END)"
            " ELSE 0 END AS BIGINT)"
        ).alias("mean_negative_magnitude_days"),
    )


# --- which part-name words sell: token revenue attribution ------------------

_NAME_TOKEN_TOPK = 15


@register(
    "part_name_token_revenue",
    oracle=f"""
    , pr AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS rev
        FROM lineitem GROUP BY l_partkey
    ),
    nt AS (
        SELECT unnest(string_split(p.p_name, ' ')) AS tok, pr.rev
        FROM pr JOIN part p ON p.p_partkey = pr.l_partkey
    )
    SELECT tok,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev) AS BIGINT) AS revenue_cents,
           CAST(sum(rev) // count(*) AS BIGINT) AS revenue_per_part_cents
    FROM nt GROUP BY tok
    ORDER BY sum(rev) DESC, tok
    LIMIT {_NAME_TOKEN_TOPK}
    """,
    doc="Merchandising signal: revenue attributed to each word of the "
    "part name (every part's exact-cents revenue credited to each "
    "of its name tokens), top-{_NAME_TOKEN_TOPK} — the 'which "
    "product attributes sell' cut a catalog team reads before "
    "naming/assortment decisions, and the structured-attribute "
    "analog of the document-side keyness queries.  One per-part "
    "rollup, a broadcast part-dim join, a whitespace split exploded "
    "map-side, a token rollup with a (revenue, token) total-order "
    "top-k.",
    tags=("analytics", "merchandising"),
)
def part_name_token_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("rev")
    )
    nt = (
        pr.join(part, pr.l_partkey == part.p_partkey)
        .select(F.explode(F.split("p_name", " ")).alias("tok"), "rev")
    )
    return (
        nt.groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev").cast("long").alias("revenue_cents"),
            F.expr("CAST(sum(rev) DIV count(*) AS BIGINT)").alias(
                "revenue_per_part_cents"
            ),
        )
        .orderBy(F.desc("revenue_cents"), "tok")
        .limit(_NAME_TOKEN_TOPK)
    )


# --- temporal revenue concentration within months ---------------------------


@register(
    "monthly_revenue_day_concentration",
    oracle="""
    , dr AS (
        SELECT (EXTRACT(year FROM o_orderdate) * 100
                + EXTRACT(month FROM o_orderdate)) AS ym,
               epoch_us(o_orderdate) // 86400000000 AS d,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS rev
        FROM orders GROUP BY 1, 2
    )
    SELECT CAST(ym AS BIGINT) AS ym,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(rev) AS BIGINT) AS month_rev_cents,
           CAST(max(rev) AS BIGINT) AS top_day_rev_cents,
           CAST(max(rev) * 1000000 // sum(rev) AS BIGINT)
               AS top_day_share_ppm
    FROM dr GROUP BY ym
    """,
    doc="Temporal concentration of revenue inside each month: the top "
    "single day's share in exact ppm — flat ~1/30 shares mean "
    "steady flow, spikes flag promo days or batch-posted ledgers "
    "(the time-axis analog of the customer-concentration Pareto "
    "queries, and the fact pattern behind the month-end "
    "hockey_stick_ratio).  One (month, day) rollup then a per-month "
    "fold; all exact cents.",
    tags=("analytics", "concentration"),
)
def monthly_revenue_day_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    dr = orders.groupBy(
        F.expr("year(o_orderdate) * 100 + month(o_orderdate)").alias("ym"),
        F.expr("unix_micros(o_orderdate) DIV 86400000000").alias("d"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("rev")
    )
    return dr.groupBy(F.col("ym").cast("long").alias("ym")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("rev").cast("long").alias("month_rev_cents"),
        F.max("rev").cast("long").alias("top_day_rev_cents"),
        F.expr(
            "CAST(max(rev) * 1000000 DIV sum(rev) AS BIGINT)"
        ).alias("top_day_share_ppm"),
    )


# --- CUBE over region x market segment --------------------------------------


@register(
    "cube_region_segment",
    oracle="""
    SELECT coalesce(r.r_name, '(all)') AS region,
           coalesce(c.c_mktsegment, '(all)') AS segment,
           CAST(grouping(r.r_name) * 2 + grouping(c.c_mktsegment)
               AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
               AS BIGINT) AS revenue_cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY CUBE (r.r_name, c.c_mktsegment)
    """,
    doc="Full CUBE over (region, market segment): every subtotal "
    "combination plus the grand total in one pass, with "
    "grouping_id disambiguating NULL-valued dimension cells from "
    "real values (rendered '(all)') — the grouping-sets surface "
    "completing rollup_lineitem's hierarchy-only ROLLUP; Catalyst "
    "plans CUBE as a single Expand + hash aggregate, so the fact "
    "is scanned once for all 2^2 groupings.  Dims broadcast; "
    "revenue exact cents.",
    tags=("analytics", "olap"),
)
def cube_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    j = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "r_name",
            "c_mktsegment",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias(
                "cents"
            ),
        )
    )
    return (
        j.cube("r_name", "c_mktsegment")
        .agg(
            F.expr(
                "CAST(grouping(r_name) * 2 + grouping(c_mktsegment)"
                " AS BIGINT)"
            ).alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .select(
            F.coalesce("r_name", F.lit("(all)")).alias("region"),
            F.coalesce("c_mktsegment", F.lit("(all)")).alias("segment"),
            "gid",
            "n_orders",
            "revenue_cents",
        )
    )


# --- brand continuity across consecutive orders -----------------------------


@register(
    "brand_continuity_rate",
    oracle="""
    , ob AS (
        SELECT o.o_custkey, o.o_orderkey, o.o_orderdate,
               c.c_mktsegment AS segment,
               list_sort(list(DISTINCT p.p_brand)) AS brands
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY o.o_custkey, o.o_orderkey, o.o_orderdate, c.c_mktsegment
    ),
    seq AS (
        SELECT segment, brands,
               lag(brands) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey)
                   AS prev_brands
        FROM ob
    ),
    pairs AS (
        SELECT segment,
               CASE WHEN len(list_intersect(brands, prev_brands)) > 0
                    THEN 1 ELSE 0 END AS continued
        FROM seq WHERE prev_brands IS NOT NULL
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_order_pairs,
           CAST(sum(continued) AS BIGINT) AS n_continued,
           CAST(sum(continued) * 1000000 // count(*) AS BIGINT)
               AS continuity_ppm
    FROM pairs GROUP BY segment
    """,
    doc="Brand loyalty as a behavioral rate: for every customer's "
    "consecutive order pair, did the next order share at least one "
    "brand with the previous one?  continuity_ppm by market segment "
    "is the switching-vs-loyalty readout that basket counts alone "
    "cannot give (complements repeat_revenue_share, which measures "
    "repeat CUSTOMERS, not repeated brand choice).  Per-order brand "
    "sets are sorted distinct arrays built in one grouped "
    "aggregate, sequence adjacency is a customer-keyed lag window, "
    "the set-overlap test is array_intersect — all engine-native "
    "array ops, no explode of the pair stream.",
    tags=("analytics", "behavior"),
)
def brand_continuity_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.sort_array(F.collect_set("p_brand")).alias("brands"))
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = ob.select(
        "segment",
        "brands",
        F.lag("brands", 1).over(w).alias("prev_brands"),
    ).filter(F.col("prev_brands").isNotNull())
    pairs = seq.select(
        "segment",
        F.when(
            F.size(F.array_intersect("brands", "prev_brands")) > 0, 1
        )
        .otherwise(0)
        .alias("continued"),
    )
    return pairs.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_order_pairs"),
        F.sum("continued").cast("long").alias("n_continued"),
        F.expr(
            "CAST(sum(continued) * 1000000 DIV count(*) AS BIGINT)"
        ).alias("continuity_ppm"),
    )


# --- purchase-cadence acceleration census -----------------------------------

_CADENCE_MIN_ORDERS = 6  # >= 5 gaps per customer


@register(
    "cadence_acceleration_census",
    oracle=f"""
    , seq AS (
        SELECT o_custkey,
               epoch_us(o_orderdate) // 86400000000 AS d,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS k
        FROM orders
    ),
    gaps AS (
        SELECT a.o_custkey, a.k - 1 AS x, b.d - a.d AS y
        FROM seq a JOIN seq b
          ON b.o_custkey = a.o_custkey AND b.k = a.k + 1
    ),
    mo AS (
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        FROM gaps GROUP BY o_custkey
        HAVING count(*) >= {_CADENCE_MIN_ORDERS - 1}
    ),
    sgn AS (
        SELECT CASE WHEN n * sxy - CAST(sx AS HUGEINT) * sy < 0 THEN 1
                    WHEN n * sxy - CAST(sx AS HUGEINT) * sy > 0 THEN -1
                    ELSE 0 END AS s
        FROM mo
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_accelerating,
           CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_decelerating,
           CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat,
           CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS accelerating_ppm
    FROM sgn
    """,
    doc="Cadence-acceleration census: for every customer with >= "
    "{_CADENCE_MIN_ORDERS} orders, the SIGN of the OLS slope of "
    "their inter-order gaps over order index — shrinking gaps "
    "(accelerating purchase rhythm) vs stretching ones (early churn "
    "signal, ahead of absolute recency cutoffs like RFM).  The "
    "supplier_latency_trend_census exact-sign trick applied to "
    "behavior: sign(n*Sxy - Sx*Sy), int128, no float slope; gaps "
    "come from one rank window + an index-offset self-equi-join, "
    "both keyed per customer.",
    tags=("analytics", "behavior"),
)
def cadence_acceleration_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey",
        F.expr("unix_micros(o_orderdate) DIV 86400000000").alias("d"),
        F.row_number().over(w).alias("k"),
    )
    gaps = (
        seq.alias("a")
        .join(
            seq.alias("b"),
            F.expr("b.o_custkey = a.o_custkey AND b.k = a.k + 1"),
        )
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            (F.col("a.k") - 1).alias("x"),
            (F.col("b.d") - F.col("a.d")).alias("y"),
        )
    )
    mo = (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        )
        .filter(F.col("n") >= _CADENCE_MIN_ORDERS - 1)
    )
    sgn = mo.select(
        F.expr(
            "CASE WHEN n * sxy - CAST(sx AS DECIMAL(38,0)) * sy < 0 THEN 1"
            " WHEN n * sxy - CAST(sx AS DECIMAL(38,0)) * sy > 0 THEN -1"
            " ELSE 0 END"
        ).alias("s")
    )
    return sgn.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_accelerating"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_decelerating"),
        F.sum(F.when(F.col("s") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_flat"),
        F.expr(
            "CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) * 1000000"
            " DIV count(*) AS BIGINT)"
        ).alias("accelerating_ppm"),
    )


# --- jackknife spread of the median (deterministic resampling) --------------

_JK_BUCKETS = 8


@register(
    "median_jackknife_spread",
    oracle=f"""
    , t AS (
        SELECT event_type, user_id % {_JK_BUCKETS} AS bkt,
               CAST(round(value * 100, 0) AS BIGINT) AS cents, event_id
        FROM events
    ),
    loo AS (
        SELECT t.event_type, d.drop_bkt, t.cents, t.event_id
        FROM t CROSS JOIN (
            SELECT unnest(range(0, {_JK_BUCKETS})) AS drop_bkt
        ) d
        WHERE t.bkt <> d.drop_bkt
    ),
    med AS (
        SELECT event_type, drop_bkt, cents AS m FROM (
            SELECT event_type, drop_bkt, cents,
                   row_number() OVER (PARTITION BY event_type, drop_bkt
                                      ORDER BY cents, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type, drop_bkt) AS n
            FROM loo
        ) WHERE rn = (n + 1) // 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_replicates,
           CAST(min(m) AS BIGINT) AS min_median_cents,
           CAST(max(m) AS BIGINT) AS max_median_cents,
           CAST(max(m) - min(m) AS BIGINT) AS spread_cents,
           CAST(sum(m) // count(*) AS BIGINT) AS mean_median_cents
    FROM med GROUP BY event_type
    """,
    doc="Uncertainty for the median WITHOUT randomness: "
    "leave-one-bucket-out jackknife over {_JK_BUCKETS} deterministic "
    "user-hash buckets — each replicate recomputes the exact "
    "nearest-rank median on 7/8 of the data, and the replicate "
    "spread is the stability interval (wide spread = the reported "
    "median is an artifact of a few heavy users).  Every pipeline "
    "that publishes a median should publish this next to it; "
    "bootstrap needs RNG, jackknife over hash buckets is bit-"
    "reproducible.  The {_JK_BUCKETS}-way fan-out multiplies the "
    "rank window, but each replicate partition is (type, drop) "
    "keyed — bounded and parallel; complements "
    "median_of_medians_error (approximation error vs sampling "
    "uncertainty).",
    tags=("analytics", "statistics"),
)
def median_jackknife_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        (F.col("user_id") % _JK_BUCKETS).alias("bkt"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        "event_id",
    )
    drops = spark.range(0, _JK_BUCKETS).select(
        F.col("id").cast("int").alias("drop_bkt")
    )
    loo = t.crossJoin(F.broadcast(drops)).filter(
        F.col("bkt") != F.col("drop_bkt")
    )
    wr = W.partitionBy("event_type", "drop_bkt").orderBy("cents", "event_id")
    wn = W.partitionBy("event_type", "drop_bkt")
    med = (
        loo.withColumn("rn", F.row_number().over(wr))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(F.expr("rn = (n + 1) DIV 2"))
        .select("event_type", F.col("cents").alias("m"))
    )
    return med.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
        F.min("m").cast("long").alias("min_median_cents"),
        F.max("m").cast("long").alias("max_median_cents"),
        (F.max("m") - F.min("m")).cast("long").alias("spread_cents"),
        F.expr("CAST(sum(m) DIV count(*) AS BIGINT)").alias(
            "mean_median_cents"
        ),
    )


# --- supplier redundancy per part -------------------------------------------


@register(
    "part_supplier_redundancy",
    oracle="""
    , ps AS (
        SELECT l_partkey,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ps)
    SELECT CAST(n_suppliers // 5 AS BIGINT) AS supplier_bucket,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(min(n_suppliers) AS BIGINT) AS min_suppliers,
           CAST(count(*) * 1000000 // (SELECT n FROM tot) AS BIGINT)
               AS share_ppm
    FROM ps GROUP BY n_suppliers // 5
    """,
    doc="Sourcing-redundancy histogram: how many distinct suppliers "
    "have actually shipped each part (5-wide buckets — scale-robust "
    "on any density) — the low bucket is the supply-chain fragility inventory "
    "(complementing single_source_risk's revenue-weighted view "
    "with a structural count), and the denominator for dual-"
    "sourcing policy targets.  One distinct-count rollup per part "
    "and a tiny histogram fold.",
    tags=("analytics", "supply-chain"),
)
def part_supplier_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_suppliers")
    )
    tot = ps.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        ps.groupBy(
            F.expr("CAST(n_suppliers DIV 5 AS BIGINT)").alias(
                "supplier_bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.min("n_suppliers").cast("long").alias("min_suppliers"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "supplier_bucket",
            "n_parts",
            "min_suppliers",
            F.expr("CAST(n_parts * 1000000 DIV n AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )


# --- geographic reach per part ----------------------------------------------

_REACH_TOPK = 10


@register(
    "part_geographic_reach",
    oracle=f"""
    , pr AS (
        SELECT l.l_partkey,
               CAST(count(DISTINCT c.c_nationkey) AS BIGINT) AS n_nations,
               CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS rev
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY l.l_partkey
    )
    SELECT CAST(l_partkey AS BIGINT) AS l_partkey, n_nations, rev
    FROM pr
    ORDER BY n_nations DESC, rev DESC, l_partkey
    LIMIT {_REACH_TOPK}
    """,
    doc="Geographic reach ranking: parts bought by customers from the "
    "most distinct nations (tie-broken by exact revenue then key) — "
    "the 'global SKU' shortlist that localization, stocking-"
    "footprint and pricing decisions start from, complementing "
    "trade_flow_matrix's aggregate origin-destination view with a "
    "per-product readout.  One fact-fact join (lineitem x orders), "
    "a broadcast customer dim, a distinct-nation measure folded in "
    "the same per-part rollup as revenue, distributed "
    "top-{_REACH_TOPK}.",
    tags=("analytics", "market"),
)
def part_geographic_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    pr = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_partkey")
        .agg(
            F.countDistinct("c_nationkey").cast("long").alias("n_nations"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("rev"),
        )
    )
    return (
        pr.select(
            F.col("l_partkey").cast("long").alias("l_partkey"),
            "n_nations",
            "rev",
        )
        .orderBy(F.desc("n_nations"), F.desc("rev"), "l_partkey")
        .limit(_REACH_TOPK)
    )


# --- return rate by part age (bathtub curve) --------------------------------


@register(
    "return_rate_by_part_age",
    oracle="""
    , lx AS (
        SELECT l_partkey, l_returnflag,
               epoch_us(l_shipdate) // 86400000000 AS d,
               min(epoch_us(l_shipdate) // 86400000000)
                   OVER (PARTITION BY l_partkey) AS first_d
        FROM lineitem
    )
    SELECT CAST(least((d - first_d) // 90, 7) AS BIGINT) AS age_quarter,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_returns,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS return_ppm
    FROM lx
    GROUP BY least((d - first_d) // 90, 7)
    """,
    doc="Reliability bathtub curve: return rate as a function of the "
    "part's market age (quarters since its first shipment, capped "
    "at 2 years) — elevated early-life returns signal launch "
    "defects, a late rise signals wear-out or catalog staleness; "
    "the time axis brand-level return queries "
    "(return_rate_wilson_rank, brand_return_pchart) collapse away.  "
    "Part birth dates come from one min window keyed by part; the "
    "curve is a conditional rollup in exact ppm.",
    tags=("analytics", "reliability"),
)
def return_rate_by_part_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    lx = li.select(
        "l_partkey",
        "l_returnflag",
        F.expr("unix_micros(l_shipdate) DIV 86400000000").alias("d"),
    ).withColumn("first_d", F.min("d").over(W.partitionBy("l_partkey")))
    return lx.groupBy(
        F.expr("CAST(least((d - first_d) DIV 90, 7) AS BIGINT)").alias(
            "age_quarter"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("n_returns"),
        F.expr(
            "CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)"
            " * 1000000 DIV count(*) AS BIGINT)"
        ).alias("return_ppm"),
    )


# --- dose-response: conversion vs click exposure ----------------------------


@register(
    "dose_response_conversion",
    oracle="""
    , u AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS BIGINT) AS clicks,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    )
    SELECT CAST(least(clicks // 5, 6) AS BIGINT) AS click_dose_bucket,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           CAST(sum(converted) * 1000000 // count(*) AS BIGINT)
               AS conversion_ppm
    FROM u GROUP BY least(clicks // 5, 6)
    """,
    doc="Dose-response curve: conversion rate as a function of click "
    "exposure (5-wide dose buckets, capped) — a monotone-rising "
    "curve supports engagement-driven conversion, a plateau or dip "
    "marks saturation/fatigue, and the shape is what the binary "
    "exposure_conversion_lift cannot show.  The classic "
    "epidemiological cut applied to product analytics; one user "
    "rollup and a 7-bucket fold in exact ppm.",
    tags=("analytics", "causal"),
)
def dose_response_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("clicks"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    return u.groupBy(
        F.expr("CAST(least(clicks DIV 5, 6) AS BIGINT)").alias(
            "click_dose_bucket"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.expr(
            "CAST(sum(converted) * 1000000 DIV count(*) AS BIGINT)"
        ).alias("conversion_ppm"),
    )


# --- Laspeyres / Paasche / Fisher price indices ------------------------------

# per (part, year) unit price quantized once to exact tenth-cents
# (rev_cents * 10 // qty) — the documented fixed-point that makes all
# three indices pure integer ratios (Fisher adds one shared sqrt).
_FISHER = (
    "CAST(floor(sqrt(CAST(lnum AS DOUBLE) / CAST(lden AS DOUBLE)"
    " * (CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE))) * 100.0)"
    " AS BIGINT)"
)


@register(
    "laspeyres_paasche_index",
    oracle=f"""
    , py AS (
        SELECT l_partkey,
               EXTRACT(year FROM l_shipdate) AS yr,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                    * 10
                    // sum(CAST(round(l_quantity, 0) AS BIGINT))
                   AS BIGINT) AS price_tc,
               CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
                   AS qty
        FROM lineitem GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.yr + 1 AS yr_to,
               CAST(sum(CAST(b.price_tc AS HUGEINT) * a.qty) AS BIGINT)
                   AS lnum,
               CAST(sum(CAST(a.price_tc AS HUGEINT) * a.qty) AS BIGINT)
                   AS lden,
               CAST(sum(CAST(b.price_tc AS HUGEINT) * b.qty) AS BIGINT)
                   AS pnum,
               CAST(sum(CAST(a.price_tc AS HUGEINT) * b.qty) AS BIGINT)
                   AS pden,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM py a
        JOIN py b ON b.l_partkey = a.l_partkey AND b.yr = a.yr + 1
        GROUP BY a.yr + 1
    )
    SELECT CAST(yr_to AS BIGINT) AS yr, n_parts,
           CAST(lnum * 100 // lden AS BIGINT) AS laspeyres_x100,
           CAST(pnum * 100 // pden AS BIGINT) AS paasche_x100,
           {_FISHER} AS fisher_x100
    FROM pairs
    """,
    doc="Mix-adjusted price indices per year transition: Laspeyres "
    "(base-year quantity weights), Paasche (current-year weights) "
    "and their Fisher geometric mean — the economics-grade answer "
    "to 'did prices move or did the mix move', which raw "
    "revenue-per-unit trends conflate.  Unit prices quantize ONCE "
    "to exact tenth-cents per (part, year); all four weighted sums "
    "are int128 dot products over parts present in both years "
    "(matched-model method), the two index ratios are integer x100, "
    "and Fisher adds a single shared sqrt.  One (part, year) "
    "rollup, one year-offset self-equi-join on part id.",
    tags=("analytics", "economics"),
)
def laspeyres_paasche_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    py = li.groupBy(
        "l_partkey", F.expr("year(l_shipdate)").alias("yr")
    ).agg(
        F.expr(
            "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))"
            " * 10 DIV sum(CAST(round(l_quantity, 0) AS BIGINT))"
            " AS BIGINT)"
        ).alias("price_tc"),
        F.sum(F.round(F.col("l_quantity"), 0).cast("long"))
        .cast("long")
        .alias("qty"),
    ).transform(snapshot, eager=False)
    pairs = (
        py.alias("a")
        .join(
            py.alias("b"),
            F.expr("b.l_partkey = a.l_partkey AND b.yr = a.yr + 1"),
        )
        .groupBy(F.expr("a.yr + 1").alias("yr_to"))
        .agg(
            F.sum(F.expr("CAST(b.price_tc AS DECIMAL(38,0)) * a.qty"))
            .cast("long")
            .alias("lnum"),
            F.sum(F.expr("CAST(a.price_tc AS DECIMAL(38,0)) * a.qty"))
            .cast("long")
            .alias("lden"),
            F.sum(F.expr("CAST(b.price_tc AS DECIMAL(38,0)) * b.qty"))
            .cast("long")
            .alias("pnum"),
            F.sum(F.expr("CAST(a.price_tc AS DECIMAL(38,0)) * b.qty"))
            .cast("long")
            .alias("pden"),
            F.count(F.lit(1)).cast("long").alias("n_parts"),
        )
    )
    return pairs.select(
        F.col("yr_to").cast("long").alias("yr"),
        "n_parts",
        F.expr("CAST(lnum * 100 DIV lden AS BIGINT)").alias(
            "laspeyres_x100"
        ),
        F.expr("CAST(pnum * 100 DIV pden AS BIGINT)").alias(
            "paasche_x100"
        ),
        F.expr(_FISHER).alias("fisher_x100"),
    )


# --- first-touch cohorting: retention by acquisition event ------------------


@register(
    "first_touch_retention",
    oracle="""
    , sp AS (
        SELECT (min(epoch_us(ts) // 86400000000)
                + max(epoch_us(ts) // 86400000000) + 1) // 2 AS mid
        FROM events
    ),
    u AS (
        SELECT user_id,
               max(CASE WHEN rn = 1 THEN event_type END) AS first_touch,
               max(CASE WHEN d >= mid THEN 1 ELSE 0 END) AS active_late,
               min(d) AS first_d
        FROM (
            SELECT user_id, event_type,
                   epoch_us(ts) // 86400000000 AS d, mid,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events CROSS JOIN sp
        ) GROUP BY user_id
    )
    SELECT first_touch,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(active_late) AS BIGINT) AS n_retained,
           CAST(sum(active_late) * 1000000 // count(*) AS BIGINT)
               AS retention_ppm
    FROM u WHERE first_d < (SELECT mid FROM sp)
    GROUP BY first_touch
    """,
    doc="Acquisition-quality cohorting: users grouped by their very "
    "first event type (first-touch channel proxy, total-order "
    "tie-break on (ts, event_id)) and scored on whether they were "
    "still active in the second calendar half — 'which front door "
    "brings users who stay', the cohort cut none of the "
    "time-bucketed retention queries (rolling_wau, "
    "growth_accounting_weekly) expose.  Cohort entry restricted to "
    "first-half arrivals so every cohort has the same retention "
    "window.  One user-keyed rank window + one user rollup.",
    tags=("analytics", "retention"),
)
def first_touch_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = F.expr("unix_micros(ts) DIV 86400000000")
    sp = ev.agg(
        F.expr(
            "(min(unix_micros(ts) DIV 86400000000)"
            " + max(unix_micros(ts) DIV 86400000000) + 1) DIV 2"
        ).alias("mid")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    base = (
        ev.select("user_id", "event_type", "ts", "event_id", d.alias("d"))
        .crossJoin(F.broadcast(sp))
        .withColumn("rn", F.row_number().over(w))
    )
    u = base.groupBy("user_id").agg(
        F.max(
            F.when(F.col("rn") == 1, F.col("event_type"))
        ).alias("first_touch"),
        F.max(
            F.when(F.col("d") >= F.col("mid"), 1).otherwise(0)
        ).alias("active_late"),
        F.min("d").alias("first_d"),
        F.max("mid").alias("mid"),
    )
    return (
        u.filter(F.col("first_d") < F.col("mid"))
        .groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("active_late").cast("long").alias("n_retained"),
            F.expr(
                "CAST(sum(active_late) * 1000000 DIV count(*) AS BIGINT)"
            ).alias("retention_ppm"),
        )
    )


# --- price stickiness census -------------------------------------------------


@register(
    "price_stickiness_census",
    oracle="""
    , py AS (
        SELECT l_partkey,
               EXTRACT(year FROM l_shipdate) AS yr,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                    * 10
                    // sum(CAST(round(l_quantity, 0) AS BIGINT))
                   AS BIGINT) AS price_tc
        FROM lineitem GROUP BY 1, 2
    ),
    ch AS (
        SELECT a.yr + 1 AS yr_to,
               CASE WHEN abs(b.price_tc - a.price_tc) * 100
                         <= a.price_tc THEN 1 ELSE 0 END AS sticky
        FROM py a
        JOIN py b ON b.l_partkey = a.l_partkey AND b.yr = a.yr + 1
    )
    SELECT CAST(yr_to AS BIGINT) AS yr,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(sticky) AS BIGINT) AS n_sticky,
           CAST(sum(sticky) * 1000000 // count(*) AS BIGINT)
               AS sticky_ppm
    FROM ch GROUP BY yr_to
    """,
    doc="Menu-cost census: share of parts whose realized unit price "
    "moved less than 1% year over year (the exact integer test "
    "|dp|*100 <= p on tenth-cent prices) — price stickiness is the "
    "micro-foundation the laspeyres_paasche_index aggregates over, "
    "and a high sticky share tells pricing ops their repricing "
    "machinery is idle.  Same (part, year) fixed-point price rollup "
    "and year-offset self-join as the index query; the census is a "
    "conditional fold.",
    tags=("analytics", "economics"),
)
def price_stickiness_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    py = li.groupBy(
        "l_partkey", F.expr("year(l_shipdate)").alias("yr")
    ).agg(
        F.expr(
            "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))"
            " * 10 DIV sum(CAST(round(l_quantity, 0) AS BIGINT))"
            " AS BIGINT)"
        ).alias("price_tc")
    ).transform(snapshot, eager=False)
    ch = (
        py.alias("a")
        .join(
            py.alias("b"),
            F.expr("b.l_partkey = a.l_partkey AND b.yr = a.yr + 1"),
        )
        .select(
            F.expr("a.yr + 1").alias("yr_to"),
            F.expr(
                "CASE WHEN abs(b.price_tc - a.price_tc) * 100"
                " <= a.price_tc THEN 1 ELSE 0 END"
            ).alias("sticky"),
        )
    )
    return ch.groupBy(F.col("yr_to").cast("long").alias("yr")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("sticky").cast("long").alias("n_sticky"),
        F.expr(
            "CAST(sum(sticky) * 1000000 DIV count(*) AS BIGINT)"
        ).alias("sticky_ppm"),
    )


# --- does discounting attract returns? (odds ratio) -------------------------

_DISC_HI_BP = 500  # >= 5% discount counts as deep


@register(
    "discount_return_association",
    oracle=f"""
    , t AS (
        SELECT CASE WHEN CAST(round(l_discount * 10000, 0) AS BIGINT)
                         >= {_DISC_HI_BP} THEN 1 ELSE 0 END AS deep,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
        FROM lineitem
    ),
    c AS (
        SELECT CAST(sum(deep * ret) AS BIGINT) AS a,
               CAST(sum(deep * (1 - ret)) AS BIGINT) AS b,
               CAST(sum((1 - deep) * ret) AS BIGINT) AS c,
               CAST(sum((1 - deep) * (1 - ret)) AS BIGINT) AS d
        FROM t
    )
    SELECT a AS deep_returned, b AS deep_kept,
           c AS shallow_returned, d AS shallow_kept,
           CAST(a * 1000000 // greatest(a + b, 1) AS BIGINT)
               AS deep_return_ppm,
           CAST(c * 1000000 // greatest(c + d, 1) AS BIGINT)
               AS shallow_return_ppm,
           CAST(CAST(a AS HUGEINT) * d * 100
                // greatest(CAST(b AS HUGEINT) * c, 1) AS BIGINT)
               AS odds_ratio_x100
    FROM c
    """,
    doc="Promotion-quality screen: the 2x2 association between deep "
    "discounting (>= 5%, exact basis-point test) and returns — an "
    "odds ratio well above 100 means discounted lines come back "
    "disproportionately (deal-hunting or quality-clearing "
    "inventory), the margin leak a promo P&L must price in.  The "
    "odds ratio (a*d)/(b*c) stays an exact int128 ratio x100; one "
    "conditional fold over the fact table, one row out.",
    tags=("analytics", "association"),
)
def discount_return_association(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.expr(
            f"CASE WHEN CAST(round(l_discount * 10000, 0) AS BIGINT)"
            f" >= {_DISC_HI_BP} THEN 1 ELSE 0 END"
        ).alias("deep"),
        F.expr(
            "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END"
        ).alias("ret"),
    )
    c = t.agg(
        F.sum(F.expr("deep * ret")).cast("long").alias("a"),
        F.sum(F.expr("deep * (1 - ret)")).cast("long").alias("b"),
        F.sum(F.expr("(1 - deep) * ret")).cast("long").alias("c"),
        F.sum(F.expr("(1 - deep) * (1 - ret)")).cast("long").alias("d"),
    )
    return c.select(
        F.col("a").alias("deep_returned"),
        F.col("b").alias("deep_kept"),
        F.col("c").alias("shallow_returned"),
        F.col("d").alias("shallow_kept"),
        F.expr("CAST(a * 1000000 DIV greatest(a + b, 1) AS BIGINT)").alias(
            "deep_return_ppm"
        ),
        F.expr("CAST(c * 1000000 DIV greatest(c + d, 1) AS BIGINT)").alias(
            "shallow_return_ppm"
        ),
        F.expr(
            "CAST(CAST(a AS DECIMAL(38,0)) * d * 100"
            " DIV greatest(CAST(b AS DECIMAL(38,0)) * c,"
            " CAST(1 AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("odds_ratio_x100"),
    )


# --- are busy suppliers slower? (Spearman load vs latency) ------------------


@register(
    "supplier_load_latency_corr",
    oracle=f"""
    , st AS (
        SELECT l_suppkey,
               CAST(count(*) AS BIGINT) AS load,
               CAST(sum(greatest(epoch_us(l.l_shipdate) // 86400000000
                    - epoch_us(o.o_orderdate) // 86400000000, 0))
                    // count(*) AS BIGINT) AS mean_lat
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY l_suppkey
    ),
    rk AS (
        SELECT row_number() OVER (ORDER BY load, l_suppkey) AS x,
               row_number() OVER (ORDER BY mean_lat, l_suppkey) AS y
        FROM st
    ),
    mo AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS BIGINT) AS sxy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS BIGINT) AS sxx,
               CAST(sum(CAST(y AS HUGEINT) * y) AS BIGINT) AS syy
        FROM rk
    )
    SELECT n AS n_suppliers, {_SPEARMAN_CORR} AS spearman_x1e6
    FROM mo
    """,
    doc="Capacity-stress diagnostic: Spearman rank correlation between "
    "a supplier's shipment volume and its mean (clamped) order-to-"
    "ship latency — a strong positive value is the congestion "
    "signature that argues for load rebalancing before SLA tuning; "
    "near zero says latency differences are intrinsic, not "
    "load-driven.  Reuses the exact integer-rank Spearman pipeline "
    "(spearman_activity_value model, supplier-keyed tie-breaks); "
    "the ranked table is supplier-dimension-sized.",
    tags=("analytics", "supply-chain"),
)
def supplier_load_latency_corr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    st = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("load"),
            F.expr(
                "CAST(sum(greatest(unix_micros(l_shipdate)"
                " DIV 86400000000 - unix_micros(o_orderdate)"
                " DIV 86400000000, 0)) DIV count(*) AS BIGINT)"
            ).alias("mean_lat"),
        )
    )
    # two-phase banded prefix ranks (dense_row_ids) for BOTH rank
    # columns — suppliers are a scaling dimension, never rank them
    # through a single-partition window
    from mqtt2sql_spark.operators.ids import dense_row_ids

    rkx = dense_row_ids(
        st,
        ["load", "l_suppkey"],
        id_col="x",
        bucket=F.expr("load div 64"),
    )
    rk = dense_row_ids(
        rkx,
        ["mean_lat", "l_suppkey"],
        id_col="y",
        bucket=F.expr("mean_lat div 16"),
    ).select("x", "y")
    mo = rk.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).cast("long").alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).cast("long").alias("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).cast("long").alias("syy"),
    )
    return mo.select(
        F.col("n").alias("n_suppliers"),
        F.expr(_SPEARMAN_CORR).alias("spearman_x1e6"),
    )


# --- composite bot-likeness census ------------------------------------------

# three exact integer sub-tests per user:
#   volume:     event count >= 3x the median user's count
#   regularity: inter-event-gap dispersion n*S2 - S^2 < n * (S/n)^2
#               (variance below mean^2 => CV < 1, sub-Poisson regularity)
#   monotony:   fewer than 3 distinct event types
_BOT_VOL_X = 3


@register(
    "bot_score_census",
    oracle=f"""
    , ug AS (
        SELECT user_id,
               epoch_us(ts) // 1000000
               - lag(epoch_us(ts) // 1000000)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
        FROM events
    ),
    u AS (
        SELECT e.user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types
        FROM events e GROUP BY e.user_id
    ),
    gv AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS ng,
               CAST(sum(g) AS BIGINT) AS sg,
               CAST(sum(CAST(g AS HUGEINT) * g) AS BIGINT) AS sg2
        FROM ug WHERE g IS NOT NULL GROUP BY user_id
    ),
    med AS (
        SELECT n_events AS m FROM (
            SELECT n_events,
                   row_number() OVER (ORDER BY n_events, user_id) AS rn,
                   count(*) OVER () AS n
            FROM u
        ) WHERE rn = (n + 1) // 2
    ),
    sc AS (
        SELECT u.user_id,
               (CASE WHEN u.n_events >= {_BOT_VOL_X} * (SELECT m FROM med)
                     THEN 1 ELSE 0 END)
               + (CASE WHEN gv.ng >= 2
                        AND gv.ng * (gv.ng * gv.sg2
                                     - CAST(gv.sg AS HUGEINT) * gv.sg)
                            < CAST(gv.sg AS HUGEINT) * gv.sg
                     THEN 1 ELSE 0 END)
               + (CASE WHEN u.n_types < 3 THEN 1 ELSE 0 END) AS score
        FROM u LEFT JOIN gv ON gv.user_id = u.user_id
    )
    SELECT CAST(score AS BIGINT) AS bot_score,
           CAST(count(*) AS BIGINT) AS n_users
    FROM sc GROUP BY score
    """,
    doc="Composite bot-likeness census: three exact integer sub-tests "
    "per user — abnormal volume (>= 3x the median user), "
    "sub-Poisson regularity (inter-event-gap variance below the "
    "squared mean gap — CV < 1, tested as the pure integer "
    "cross-multiplication n*(n*S2-S^2) < S^2: schedulers are too "
    "regular to be human), and behavioral monotony (< 3 event types) — summed "
    "to a 0-3 score histogram, the triage funnel an abuse team "
    "works top-down.  Each sub-score reuses an exact-arithmetic "
    "pattern already pinned in the suite (nearest-rank median, "
    "int128 moment dispersion, distinct counts); all three fold in "
    "user-keyed aggregates.",
    tags=("analytics", "abuse"),
)
def bot_score_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ug = ev.select(
        "user_id",
        (
            F.expr("unix_micros(ts) DIV 1000000")
            - F.lag(F.expr("unix_micros(ts) DIV 1000000"), 1).over(w)
        ).alias("g"),
    ).filter(F.col("g").isNotNull())
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )
    gv = ug.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("g").cast("long").alias("sg"),
        F.sum(F.expr("CAST(g AS DECIMAL(38,0)) * g")).cast("long").alias(
            "sg2"
        ),
    )
    # median user event count WITHOUT a global row_number over the
    # scaling user dimension: value-grain counts + two-phase prefix sum
    # (running_totals), median = value whose cumulative range contains
    # rank (n+1) DIV 2 — tie-insensitive, identical to the oracle's
    # row_number selection
    from mqtt2sql_spark.operators.ids import running_totals

    vc = u.groupBy("n_events").agg(F.count(F.lit(1)).alias("c"))
    cum = running_totals(
        vc,
        ["n_events"],
        "c",
        bucket=F.expr("n_events div 64"),
        out_col="cr",
    )
    tot = cum.agg(F.max("cr").alias("nn"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .filter(
            F.expr(
                "cr - c < (nn + 1) DIV 2 AND cr >= (nn + 1) DIV 2"
            )
        )
        .select(F.col("n_events").alias("m"))
    )
    sc = (
        u.join(gv, "user_id", "left")
        .crossJoin(F.broadcast(med))
        .select(
            (
                F.when(
                    F.col("n_events") >= _BOT_VOL_X * F.col("m"), 1
                ).otherwise(0)
                + F.when(
                    (F.col("ng") >= 2)
                    & (
                        F.expr(
                            "ng * (ng * sg2"
                            " - CAST(sg AS DECIMAL(38,0)) * sg)"
                        )
                        < F.expr("CAST(sg AS DECIMAL(38,0)) * sg")
                    ),
                    1,
                ).otherwise(0)
                + F.when(F.col("n_types") < 3, 1).otherwise(0)
            ).alias("score")
        )
    )
    return sc.groupBy(F.col("score").cast("long").alias("bot_score")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


# --- mix-adjusted brand price premium ---------------------------------------


@register(
    "brand_price_premium",
    oracle="""
    , pt AS (
        SELECT p_brand, p_type,
               CAST(round(p_retailprice * 100, 0) AS BIGINT) AS cents
        FROM part
    ),
    ty AS (
        SELECT p_type,
               CAST(sum(cents) AS BIGINT) AS tsum,
               CAST(count(*) AS BIGINT) AS tn
        FROM pt GROUP BY p_type
    ),
    dev AS (
        SELECT pt.p_brand,
               CAST(pt.cents AS HUGEINT) * ty.tn - ty.tsum AS dev_n,
               ty.tn
        FROM pt JOIN ty ON ty.p_type = pt.p_type
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(dev_n * 10000 // tn) // count(*) AS BIGINT)
               AS premium_bp_x100
    FROM dev GROUP BY p_brand
    """,
    doc="Hedonic-lite brand premium: each part's retail price compared "
    "to the mean of ITS OWN type (the mix adjustment — comparing "
    "brands on raw averages just measures their type mix), "
    "averaged per brand in exact basis-point fixed point "
    "(deviation cross-multiplied as cents*tn - tsum before any "
    "division).  Positive premium = the brand prices above "
    "type-matched peers.  One type rollup joined back (type "
    "dimension broadcast-sized), one brand fold.",
    tags=("analytics", "pricing"),
)
def brand_price_premium(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    pt = part.select(
        "p_brand",
        "p_type",
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("cents"),
    )
    ty = pt.groupBy("p_type").agg(
        F.sum("cents").cast("long").alias("tsum"),
        F.count(F.lit(1)).cast("long").alias("tn"),
    )
    dev = pt.join(F.broadcast(ty), "p_type").select(
        "p_brand",
        F.expr("CAST(cents AS DECIMAL(38,0)) * tn - tsum").alias("dev_n"),
        "tn",
    )
    return dev.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.expr(
            "CAST(sum(dev_n * 10000 div tn) DIV count(*) AS BIGINT)"
        ).alias("premium_bp_x100"),
    )


# --- does the first order predict lifetime value? ---------------------------


@register(
    "first_order_predictiveness",
    oracle="""
    , co AS (
        SELECT o_custkey,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ),
    cu AS (
        SELECT o_custkey,
               max(CASE WHEN rn = 1 THEN cents END) AS first_cents,
               CAST(sum(cents) AS BIGINT) AS ltv_cents,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM co GROUP BY o_custkey HAVING count(*) >= 2
    ),
    rk AS (
        SELECT least(3, (row_number() OVER (ORDER BY first_cents,
                                            o_custkey) - 1) * 4
                        // (count(*) OVER ())) AS fq,
               least(3, (row_number() OVER (ORDER BY ltv_cents,
                                            o_custkey) - 1) * 4
                        // (count(*) OVER ())) AS lq
        FROM cu
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rk)
    SELECT CAST(fq AS BIGINT) AS first_quartile,
           CAST(lq AS BIGINT) AS ltv_quartile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(count(*) * 1000000 // (SELECT n FROM tot) AS BIGINT)
               AS share_ppm
    FROM rk GROUP BY fq, lq
    """,
    doc="Early-signal audit: the 4x4 mobility matrix between a repeat "
    "customer's FIRST-order-value quartile and their LIFETIME-value "
    "quartile — heavy diagonal mass means the first transaction "
    "already predicts worth (license early VIP treatment), a flat "
    "matrix means first orders are noise.  Quartiles are exact "
    "rank-based cuts with (value, custkey) total order over the "
    "customer dimension, both computed via the two-phase banded "
    "prefix rank (operators/ids.dense_row_ids) — no single-partition "
    "window; one materialized customer rollup feeds both rankings.",
    tags=("analytics", "predictive"),
)
def first_order_predictiveness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    co = orders.select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        F.row_number().over(w).alias("rn"),
    )
    cu = (
        co.groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("cents"))).alias(
                "first_cents"
            ),
            F.sum("cents").cast("long").alias("ltv_cents"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .filter(F.col("n_orders") >= 2)
    )
    # quartile cuts over the SCALING customer dimension: both ranks via
    # the two-phase banded prefix rank (dense_row_ids, monotonic value
    # buckets); materialize the customer rollup once — it feeds both
    # rankings and the scalar count
    from mqtt2sql_spark.operators.ids import dense_row_ids

    cu = cu.transform(snapshot, eager=False)
    nn = cu.agg(F.count(F.lit(1)).alias("n"))
    ranked = dense_row_ids(
        cu,
        ["first_cents", "o_custkey"],
        id_col="rf",
        bucket=F.expr("first_cents div 100000"),
    )
    ranked = dense_row_ids(
        ranked,
        ["ltv_cents", "o_custkey"],
        id_col="rl",
        bucket=F.expr("ltv_cents div 100000"),
    )
    rk = ranked.crossJoin(F.broadcast(nn)).select(
        F.expr("least(3, (rf - 1) * 4 DIV n)").alias("fq"),
        F.expr("least(3, (rl - 1) * 4 DIV n)").alias("lq"),
    )
    tot = rk.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        rk.groupBy(
            F.col("fq").cast("long").alias("first_quartile"),
            F.col("lq").cast("long").alias("ltv_quartile"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .crossJoin(F.broadcast(tot))
        .select(
            "first_quartile",
            "ltv_quartile",
            "n_customers",
            F.expr("CAST(n_customers * 1000000 DIV n AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )


# --- split-shipment span per order ------------------------------------------


@register(
    "order_ship_span_histogram",
    oracle="""
    , sp AS (
        SELECT l_orderkey,
               CAST(count(*) AS BIGINT) AS n_lines,
               max(epoch_us(l_shipdate) // 86400000000)
               - min(epoch_us(l_shipdate) // 86400000000) AS span_days
        FROM lineitem GROUP BY l_orderkey HAVING count(*) >= 2
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sp)
    SELECT CAST(least(span_days // 7, 8) AS BIGINT) AS span_weeks_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) * 1000000 // (SELECT n FROM tot) AS BIGINT)
               AS share_ppm,
           CAST(max(span_days) AS BIGINT) AS max_span_days
    FROM sp GROUP BY least(span_days // 7, 8)
    """,
    doc="Fulfillment-fragmentation histogram: for multi-line orders, "
    "the span in days between the first and last line shipment "
    "(week buckets, 8+ capped) — bucket 0 is single-shipment "
    "consolidation, the tail is the split-shipment cost center "
    "(each extra week of spread is another box, another delivery).  "
    "One per-order min/max rollup and a tiny histogram fold.",
    tags=("analytics", "fulfillment"),
)
def order_ship_span_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sp = (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            (
                F.max(F.expr("unix_micros(l_shipdate) DIV 86400000000"))
                - F.min(F.expr("unix_micros(l_shipdate) DIV 86400000000"))
            ).alias("span_days"),
        )
        .filter(F.col("n_lines") >= 2)
    )
    tot = sp.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        sp.groupBy(
            F.expr("CAST(least(span_days DIV 7, 8) AS BIGINT)").alias(
                "span_weeks_bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.max("span_days").cast("long").alias("max_span_days"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "span_weeks_bucket",
            "n_orders",
            F.expr("CAST(n_orders * 1000000 DIV n AS BIGINT)").alias(
                "share_ppm"
            ),
            "max_span_days",
        )
    )


# --- modal-preference stability across halves -------------------------------


@register(
    "preference_stability_rate",
    oracle="""
    , sp AS (
        SELECT (min(epoch_us(ts) // 86400000000)
                + max(epoch_us(ts) // 86400000000) + 1) // 2 AS mid
        FROM events
    ),
    cnt AS (
        SELECT user_id,
               CASE WHEN epoch_us(ts) // 86400000000
                         < (SELECT mid FROM sp) THEN 0 ELSE 1 END AS half,
               event_type, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2, 3
    ),
    modal AS (
        SELECT user_id, half, event_type FROM (
            SELECT user_id, half, event_type,
                   row_number() OVER (PARTITION BY user_id, half
                                      ORDER BY c DESC, event_type) AS rn
            FROM cnt
        ) WHERE rn = 1
    ),
    pairs AS (
        SELECT a.user_id,
               CASE WHEN a.event_type = b.event_type THEN 1 ELSE 0 END
                   AS stable
        FROM modal a JOIN modal b
          ON b.user_id = a.user_id AND a.half = 0 AND b.half = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users_both_halves,
           CAST(sum(stable) AS BIGINT) AS n_stable,
           CAST(sum(stable) * 1000000 // count(*) AS BIGINT)
               AS stability_ppm
    FROM pairs
    """,
    doc="Behavioral-identity stability: for users active in both "
    "calendar halves, does their MODAL event type persist?  The "
    "one-number answer to whether segment assignments built on "
    "dominant behavior (browsers vs buyers) can be cached or must "
    "be recomputed continuously; modal types tie-break "
    "lexicographically so both engines pick the identical mode.  "
    "A (user, half, type) rollup, a per-(user, half) "
    "WindowGroupLimit argmax, one self-join across halves.",
    tags=("analytics", "behavior"),
)
def preference_stability_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sp = ev.agg(
        F.expr(
            "(min(unix_micros(ts) DIV 86400000000)"
            " + max(unix_micros(ts) DIV 86400000000) + 1) DIV 2"
        ).alias("mid")
    )
    cnt = (
        ev.crossJoin(F.broadcast(sp))
        .groupBy(
            "user_id",
            F.when(
                F.expr("unix_micros(ts) DIV 86400000000") < F.col("mid"), 0
            )
            .otherwise(1)
            .alias("half"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wm = W.partitionBy("user_id", "half").orderBy(
        F.desc("c"), F.asc("event_type")
    )
    modal = (
        cnt.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select("user_id", "half", "event_type")
    )
    pairs = (
        modal.alias("a")
        .join(
            modal.alias("b"),
            F.expr("b.user_id = a.user_id AND a.half = 0 AND b.half = 1"),
        )
        .select(
            F.when(
                F.col("a.event_type") == F.col("b.event_type"), 1
            )
            .otherwise(0)
            .alias("stable")
        )
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_users_both_halves"),
        F.sum("stable").cast("long").alias("n_stable"),
        F.expr(
            "CAST(sum(stable) * 1000000 DIV count(*) AS BIGINT)"
        ).alias("stability_ppm"),
    )


# --- payload k-value uniformity test ----------------------------------------


@register(
    "props_uniformity_chi2",
    oracle="""
    , kv AS (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS INTEGER) // 10
                   AS bucket
        FROM events
    ),
    oc AS (
        SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS o
        FROM kv WHERE bucket IS NOT NULL AND bucket BETWEEN 0 AND 9
        GROUP BY event_type, bucket
    ),
    tn AS (
        SELECT event_type, CAST(sum(o) AS BIGINT) AS n FROM oc
        GROUP BY event_type
    )
    SELECT oc.event_type,
           CAST(max(tn.n) AS BIGINT) AS n_events,
           CAST(sum((10 * o - tn.n) * (10 * o - tn.n)) // (10 * max(tn.n))
               AS BIGINT) AS chi2_x1
    FROM oc JOIN tn ON tn.event_type = oc.event_type
    GROUP BY oc.event_type
    """,
    doc="Payload-generator drift test: chi-square of the JSON props.k "
    "distribution against uniformity over 10 value deciles, per "
    "event type — k is spec'd uniform 0..99, so chi2 far above the "
    "~9 d.o.f. expectation flags an upstream generator change "
    "before it skews every k-weighted metric.  Exact integers "
    "throughout: with uniform expectation n/10, chi2 = "
    "sum((10*O - n)^2) / (10*n) needs no per-cell rational; JSON "
    "extraction is the engine-native path (get_json_object / "
    "json_extract_string).",
    tags=("analytics", "data-quality"),
)
def props_uniformity_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(
        "event_type",
        (
            F.get_json_object("props", "$.k").cast("int") / F.lit(10)
        ).cast("int").alias("bucket"),
    )
    oc = (
        kv.filter(
            F.col("bucket").isNotNull() & F.col("bucket").between(0, 9)
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    tn = oc.groupBy("event_type").agg(F.sum("o").cast("long").alias("n"))
    return (
        oc.join(F.broadcast(tn), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.expr(
                "CAST(sum((10 * o - n) * (10 * o - n))"
                " DIV (10 * max(n)) AS BIGINT)"
            ).alias("chi2_x1"),
        )
    )


# --- ship-latency percentiles by order priority ------------------------------


@register(
    "latency_by_priority_percentiles",
    oracle="""
    , lt AS (
        SELECT o.o_orderpriority,
               greatest(epoch_us(l.l_shipdate) // 86400000000
                        - epoch_us(o.o_orderdate) // 86400000000, 0)
                   AS days,
               l.l_orderkey, l.l_linenumber
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    r AS (
        SELECT o_orderpriority, days,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY days, l_orderkey, l_linenumber)
                   AS rn,
               count(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM lt
    )
    SELECT o_orderpriority,
           CAST(max(n) AS BIGINT) AS n_lines,
           CAST(max(CASE WHEN rn = (n + 1) // 2 THEN days END) AS BIGINT)
               AS p50_days,
           CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN days END)
               AS BIGINT) AS p90_days,
           CAST(max(CASE WHEN rn = (99 * n + 99) // 100 THEN days END)
               AS BIGINT) AS p99_days
    FROM r GROUP BY o_orderpriority
    """,
    doc="Does priority actually buy speed?  Exact nearest-rank "
    "P50/P90/P99 of (clamped) order-to-ship latency per order "
    "priority — if 1-URGENT's percentiles match 5-LOW's, the "
    "priority field is theater and SLA pricing is mispriced; the "
    "percentile-by-class cut that mean-latency views "
    "(supplier_latency_consistency) wash out.  One fact-fact join, "
    "one priority-partitioned rank window with a "
    "(days, orderkey, linenumber) total order, a conditional fold.",
    tags=("analytics", "sla"),
)
def latency_by_priority_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lt = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.expr(
            "greatest(unix_micros(l_shipdate) DIV 86400000000"
            " - unix_micros(o_orderdate) DIV 86400000000, 0)"
        ).alias("days"),
        "l_orderkey",
        "l_linenumber",
    )
    wr = W.partitionBy("o_orderpriority").orderBy(
        "days", "l_orderkey", "l_linenumber"
    )
    wn = W.partitionBy("o_orderpriority")
    r = lt.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    return r.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n_lines"),
        F.max(
            F.when(F.expr("rn = (n + 1) DIV 2"), F.col("days"))
        ).cast("long").alias("p50_days"),
        F.max(
            F.when(F.expr("rn = (9 * n + 9) DIV 10"), F.col("days"))
        ).cast("long").alias("p90_days"),
        F.max(
            F.when(F.expr("rn = (99 * n + 99) DIV 100"), F.col("days"))
        ).cast("long").alias("p99_days"),
    )


# --- maximum drawdown of cumulative daily revenue ----------------------------


@register(
    "max_drawdown_daily_revenue",
    oracle="""
    , daily AS (
        SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS day,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                        AS BIGINT)) AS rev_cents
        FROM lineitem GROUP BY 1
    ),
    c AS (
        SELECT day, rev_cents,
               sum(rev_cents) OVER (ORDER BY day) AS cum
        FROM daily
    ),
    d AS (
        SELECT day, cum, max(cum) OVER (ORDER BY day) AS peak,
               count(*) OVER () AS n_days
        FROM c
    )
    SELECT day AS trough_day,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(peak AS BIGINT) AS peak_cents,
           CAST(cum AS BIGINT) AS cum_cents,
           CAST(peak - cum AS BIGINT) AS max_drawdown_cents
    FROM d
    ORDER BY peak - cum DESC, day ASC
    LIMIT 1
    """,
    doc="Worst peak-to-trough slump of the cumulative revenue curve — "
    "the classic max-drawdown risk statistic, applied to the business "
    "series instead of a price series: how deep did the book sink below "
    "its best-ever cumulative position, and on what day.  Per-row cent "
    "quantization keeps every sum exact (FLOAT-SUM-ORDER rule); the "
    "day-level series is tiny after the first aggregation, so the "
    "unpartitioned running-sum window is benign (≈2.5k rows at any "
    "scale factor — days, not facts).",
    tags=("analytics", "timeseries", "risk"),
)
def max_drawdown_daily_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    daily = li.groupBy(
        F.date_trunc("day", "l_shipdate").alias("day")
    ).agg(F.sum(cents).alias("rev_cents"))
    wc = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = daily.select(
        "day", F.sum("rev_cents").over(wc).alias("cum")
    )
    d = c.select(
        "day",
        "cum",
        F.max("cum").over(wc).alias("peak"),
        F.count(F.lit(1)).over(
            W.partitionBy().rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n_days"),
    )
    return (
        d.orderBy(
            (F.col("peak") - F.col("cum")).desc(), F.col("day").asc()
        )
        .limit(1)
        .select(
            F.col("day").alias("trough_day"),
            F.col("n_days").cast("long").alias("n_days"),
            F.col("peak").alias("peak_cents"),
            F.col("cum").alias("cum_cents"),
            (F.col("peak") - F.col("cum")).alias("max_drawdown_cents"),
        )
    )


# --- discount elasticity of quantity, per brand ------------------------------


@register(
    "discount_elasticity_by_brand",
    oracle="""
    , pts AS (
        SELECT p.p_brand,
               CAST(round(l.l_discount * 100, 0) AS BIGINT) AS x,
               CAST(round(l.l_quantity, 0) AS BIGINT) AS y
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    s AS (
        SELECT p_brand,
               count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM pts GROUP BY p_brand
    )
    SELECT p_brand,
           CAST(n AS BIGINT) AS n_lines,
           CAST((10000 * (CAST(n AS HUGEINT) * sxy
                          - CAST(sx AS HUGEINT) * sy))
                // greatest(CAST(n AS HUGEINT) * sxx
                            - CAST(sx AS HUGEINT) * sx, 1)
                AS BIGINT) AS slope_e4,
           CAST((10000 * sy) // n AS BIGINT) AS mean_qty_e4,
           CAST((10000 * sx) // n AS BIGINT) AS mean_disc_pct_e4
    FROM s
    """,
    doc="Does discounting actually move volume?  Per-brand OLS slope of "
    "line quantity against discount percentage, computed entirely in "
    "exact integer sufficient statistics (discount is a 0-10 integer "
    "percent after x100 quantization, quantity is integral), so the "
    "cross-engine hash cannot drift: slope = (n*Sxy - Sx*Sy) / "
    "(n*Sxx - Sx^2) emitted as integer-division fixed-point.  Pure "
    "integer `div`/`//` truncates toward zero identically on both "
    "engines (CLAUDE.md SIGNED INTEGRAL DIVISION), which matters here "
    "because slopes are legitimately negative.  One broadcast dim join, "
    "one hash aggregate — partial-agg'd map-side, no window.",
    tags=("analytics", "pricing"),
)
def discount_elasticity_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pts = li.join(
        (part), li["l_partkey"] == F.col("p_partkey")
    ).select(
        "p_brand",
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("x"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("y"),
    )
    s = pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        "p_brand",
        F.col("n").cast("long").alias("n_lines"),
        F.expr(
            # 128-bit cross-multiplication (r07 sweep lesson): n ~ 1e9
            # lines/brand at warehouse scale puts n*sxy past BIGINT;
            # integer DIV on the wide exact values truncates toward
            # zero identically on both engines
            "CAST((10000 * (CAST(n AS DECIMAL(38,0)) * sxy"
            "               - CAST(sx AS DECIMAL(38,0)) * sy))"
            " DIV greatest(CAST(n AS DECIMAL(38,0)) * sxx"
            "              - CAST(sx AS DECIMAL(38,0)) * sx, 1)"
            " AS BIGINT)"
        ).alias("slope_e4"),
        F.expr("CAST((10000 * sy) DIV n AS BIGINT)").alias("mean_qty_e4"),
        F.expr("CAST((10000 * sx) DIV n AS BIGINT)").alias(
            "mean_disc_pct_e4"
        ),
    )


# --- point-biserial correlation: return flag vs line price -------------------


@register(
    "point_biserial_return_price",
    oracle="""
    , pts AS (
        SELECT CAST(extract(year FROM l_shipdate) AS BIGINT) AS ship_year,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
        FROM lineitem
    ),
    s AS (
        SELECT ship_year,
               count(*) AS n,
               sum(r) AS n1,
               sum(c) AS sc,
               sum(c * r) AS s1,
               sum(CAST(c AS HUGEINT) * c) AS ss
        FROM pts GROUP BY ship_year
    )
    SELECT ship_year,
           CAST(n AS BIGINT) AS n_lines,
           CAST(n1 AS BIGINT) AS n_returned,
           CAST((100 * s1) // greatest(n1, 1)
                - (100 * (sc - s1)) // greatest(n - n1, 1) AS BIGINT)
               AS mean_diff_e2_cents,
           CAST(floor(
               ((CAST(s1 AS DOUBLE) / CAST(greatest(n1, 1) AS DOUBLE)
                 - CAST(sc - s1 AS DOUBLE)
                   / CAST(greatest(n - n1, 1) AS DOUBLE))
                / sqrt((CAST(ss AS DOUBLE)
                        - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                          / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                * sqrt(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
               * 1000000) AS BIGINT) AS r_pb_e6
    FROM s
    """,
    doc="Point-biserial correlation between the binary return flag and "
    "line price, per ship year — 'are expensive items returned more?' "
    "as one number per year.  Sufficient statistics are exact integers "
    "(cents; sum-of-squares kept exact in HUGEINT/DECIMAL(38)), and the "
    "final r is a textually identical +,-,*,/,sqrt expression on both "
    "engines — every one of those IEEE ops is correctly rounded, so the "
    "doubles match bit-for-bit (no libm ln/exp anywhere), then floor "
    "fixed-point e6.  One scan, one hash aggregate.",
    tags=("analytics", "stats"),
)
def point_biserial_return_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.year("l_shipdate").cast("long").alias("ship_year"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("c"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("r"),
    )
    s = pts.groupBy("ship_year").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").alias("n1"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("r")).alias("s1"),
        F.sum(
            (F.col("c") * F.col("c")).cast("decimal(38,0)")
        ).alias("ss"),
    )
    return s.select(
        "ship_year",
        F.col("n").cast("long").alias("n_lines"),
        F.col("n1").cast("long").alias("n_returned"),
        F.expr(
            "CAST((100 * s1) DIV greatest(n1, 1)"
            " - (100 * (sc - s1)) DIV greatest(n - n1, 1) AS BIGINT)"
        ).alias("mean_diff_e2_cents"),
        F.expr(
            "CAST(floor("
            "((CAST(s1 AS DOUBLE) / CAST(greatest(n1, 1) AS DOUBLE)"
            "  - CAST(sc - s1 AS DOUBLE)"
            "    / CAST(greatest(n - n1, 1) AS DOUBLE))"
            " / sqrt((CAST(ss AS DOUBLE)"
            "         - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)"
            "           / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))"
            " * sqrt(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)"
            "        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))"
            " * 1000000) AS BIGINT)"
        ).alias("r_pb_e6"),
    )


# --- Kruskal-Wallis rank statistics by market segment ------------------------


@register(
    "kruskal_wallis_rank_stats",
    oracle="""
    , pts AS (
        SELECT c.c_mktsegment,
               CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (
        SELECT cents, count(*) AS cnt FROM pts GROUP BY cents
    ),
    rk AS (
        SELECT cents,
               2 * sum(cnt) OVER (ORDER BY cents) - cnt + 1 AS avg2
        FROM g
    ),
    per_seg AS (
        SELECT p.c_mktsegment,
               count(*) AS n_i,
               sum(r.avg2) AS s2
        FROM pts p JOIN rk r USING (cents)
        GROUP BY p.c_mktsegment
    ),
    tot AS (SELECT sum(n_i) AS n FROM per_seg)
    SELECT s.c_mktsegment,
           CAST(s.n_i AS BIGINT) AS n_orders,
           CAST(s.s2 AS BIGINT) AS sum_rank2,
           CAST((10000 * s.s2) // s.n_i AS BIGINT) AS mean_rank2_e4,
           CAST(s.s2 - s.n_i * (t.n + 1) AS BIGINT) AS dev2
    FROM per_seg s CROSS JOIN tot t
    """,
    doc="Kruskal-Wallis sufficient statistics for order value across "
    "market segments: midrank sums with exact tie handling (average "
    "rank of a tie group derived from the cumulative count — avg2 = "
    "2*cum - cnt + 1 is twice the midrank, kept integral), per-segment "
    "deviation dev2 = 2*(R_i - n_i*(N+1)/2) from the null expectation; "
    "H = 3/(N(N+1)) * sum(dev2^2/n_i) follows directly.  dev2 = 0 for "
    "every segment means price is rank-independent of segment.  All "
    "exact integers — no doubles anywhere.  The rank window runs over "
    "the deduplicated value domain (one row per distinct price), not "
    "the fact stream; at cluster scale swap in a range-partitioned "
    "two-phase rank.",
    tags=("analytics", "stats"),
)
def kruskal_wallis_rank_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    pts = orders.join(
        (cust), orders["o_custkey"] == F.col("c_custkey")
    ).select(
        "c_mktsegment",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias(
            "cents"
        ),
    )
    g = pts.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt"))
    # the distinct-cents histogram grows with the price domain at
    # scale: cumulative counts via the two-phase prefix sum
    # (running_totals, monotonic cents buckets), not a global window
    from mqtt2sql_spark.operators.ids import running_totals

    rk = running_totals(
        g,
        ["cents"],
        "cnt",
        bucket=F.expr("cents div 1000000"),
        out_col="cum",
    ).select(
        "cents",
        (2 * F.col("cum") - F.col("cnt") + 1).alias("avg2"),
    )
    per_seg = (
        pts.join(rk, "cents")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_i"), F.sum("avg2").alias("s2"))
        # 5-row rollup read by the total and the final select —
        # materialize once so the rank join runs once, not 2x
        .transform(snapshot, eager=True)
    )
    tot = per_seg.agg(F.sum("n_i").alias("n"))
    return per_seg.crossJoin(F.broadcast(tot)).select(
        "c_mktsegment",
        F.col("n_i").cast("long").alias("n_orders"),
        F.col("s2").cast("long").alias("sum_rank2"),
        F.expr("CAST((10000 * s2) DIV n_i AS BIGINT)").alias(
            "mean_rank2_e4"
        ),
        F.expr("CAST(s2 - n_i * (n + 1) AS BIGINT)").alias("dev2"),
    )


# --- copurchase-graph robustness under hub removal ---------------------------


@register(
    "hub_removal_edge_survival",
    oracle="""
    , basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT DISTINCT x.l_partkey AS pk1, y.l_partkey AS pk2
        FROM basket x JOIN basket y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
    ),
    deg AS (
        SELECT pk, count(*) AS d FROM (
            SELECT pk1 AS pk FROM edges
            UNION ALL SELECT pk2 AS pk FROM edges
        ) GROUP BY pk
    ),
    rk AS (
        SELECT pk, row_number() OVER (ORDER BY d DESC, pk) AS r
        FROM deg
    ),
    er AS (
        SELECT r1.r AS ra, r2.r AS rb
        FROM edges e JOIN rk r1 ON r1.pk = e.pk1
                     JOIN rk r2 ON r2.pk = e.pk2
    ),
    sweep AS (SELECT unnest([5, 10, 20]) AS k)
    SELECT s.k,
           CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
           CAST(sum(CASE WHEN er.ra > s.k AND er.rb > s.k
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_surviving,
           CAST((1000000 * sum(CASE WHEN er.ra > s.k AND er.rb > s.k
                                    THEN 1 ELSE 0 END))
                // greatest((SELECT count(*) FROM edges), 1) AS BIGINT)
               AS survival_ppm
    FROM er CROSS JOIN sweep s
    GROUP BY s.k
    """,
    doc="Attack-tolerance of the copurchase graph: remove the top-k "
    "highest-degree parts (k = 5/10/20) and count surviving edges — "
    "a steep drop means recommendation/substitution signals ride on a "
    "few hub SKUs and degrade badly when a hub goes out of stock; a "
    "flat curve means the co-purchase structure is distributed.  "
    "Complements degree_assortativity_copurchase (correlation) and "
    "rich_club_coefficient (hub-hub density) with the operational "
    "what-if.  Degree ranking is total-ordered (d DESC, pk); only the "
    "top-20 hubs can matter, so the plan takes a distributed top-k "
    "and left-joins the tiny hub list (absent = rank +inf) — the part "
    "dimension is never globally ranked or broadcast; all integers.",
    tags=("analytics", "graph"),
)
def hub_removal_edge_survival(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    e1 = baskets.select("parts", F.posexplode("parts").alias("i", "pk1"))
    edges = (
        e1.select("i", "pk1", F.posexplode("parts").alias("j", "pk2"))
        .filter(F.col("j") > F.col("i"))
        .select("pk1", "pk2")
        .distinct()
        # referenced by degrees (2x), the rank join and the edge count —
        # materialize once instead of replaying the basket double-explode
        .transform(snapshot, eager=True)
    )
    deg = (
        edges.select(F.col("pk1").alias("pk"))
        .unionAll(edges.select(F.col("pk2").alias("pk")))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # only ranks <= max(k)=20 can change the survival predicate, so
    # never rank (or broadcast) the whole SCALING part dimension:
    # distributed top-k (TakeOrderedAndProject on the total order
    # (d DESC, pk)), rank the 20 survivors, left-join edges against the
    # tiny hub list — absent endpoints rank as +inf (they survive)
    top = deg.orderBy(F.desc("d"), "pk").limit(20)
    rk = top.select(
        "pk",
        F.row_number().over(W.orderBy(F.desc("d"), "pk")).alias("r"),
    )
    big = F.lit(1 << 30)
    er = (
        edges.join(
            F.broadcast(rk.select(F.col("pk").alias("pk1"),
                                  F.col("r").alias("_ra"))),
            "pk1",
            "left",
        )
        .join(
            F.broadcast(rk.select(F.col("pk").alias("pk2"),
                                  F.col("r").alias("_rb"))),
            "pk2",
            "left",
        )
        .select(
            F.coalesce("_ra", big).alias("ra"),
            F.coalesce("_rb", big).alias("rb"),
        )
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    sweep = spark.range(1).select(
        F.explode(F.array(F.lit(5), F.lit(10), F.lit(20))).alias("k")
    )
    return (
        er.crossJoin(F.broadcast(sweep))
        .groupBy("k")
        .agg(
            F.sum(
                F.when(
                    (F.col("ra") > F.col("k")) & (F.col("rb") > F.col("k")),
                    1,
                ).otherwise(0)
            ).alias("surv")
        )
        .crossJoin(F.broadcast(n_edges))
        .select(
            "k",
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("surv").cast("long").alias("n_surviving"),
            F.expr(
                "CAST((1000000 * surv)"
                " DIV greatest(n_edges, 1) AS BIGINT)"
            ).alias("survival_ppm"),
        )
    )


# --- repeat-order hazard curve ------------------------------------------------


@register(
    "repeat_order_hazard_curve",
    oracle="""
    , oc AS (
        SELECT o_custkey, count(*) AS n_orders
        FROM orders GROUP BY o_custkey
    ),
    curve AS (
        SELECT n.k,
               sum(CASE WHEN oc.n_orders >= n.k THEN 1 ELSE 0 END)
                   AS at_least_k,
               sum(CASE WHEN oc.n_orders >= n.k + 1 THEN 1 ELSE 0 END)
                   AS at_least_k1
        FROM oc CROSS JOIN (SELECT unnest(range(1, 11)) AS k) n
        GROUP BY n.k
    )
    SELECT k,
           CAST(at_least_k AS BIGINT) AS customers_with_k,
           CAST(at_least_k1 AS BIGINT) AS customers_with_k_plus_1,
           CAST((1000000 * at_least_k1)
                // greatest(at_least_k, 1) AS BIGINT) AS repeat_ppm
    FROM curve
    """,
    doc="Repeat-purchase hazard: for each order count k (1..10), the "
    "probability a customer who reached k orders places a (k+1)th — "
    "the retention curve over ORDER RANK rather than calendar time "
    "(survival_table_user_lifetime's complement on the orders table). "
    "The classic shape: the first repeat is the hardest, the curve "
    "flattens as habitual buyers self-select; where it dips identifies "
    "the loyalty cliff.  One customer-grain agg, a 10x literal "
    "fan-out, exact integers.",
    tags=("analytics", "retention"),
)
def repeat_order_hazard_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    oc = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    ks = spark.range(1, 11).select(F.col("id").alias("k"))
    curve = (
        oc.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(
                F.when(F.col("n_orders") >= F.col("k"), 1).otherwise(0)
            ).alias("at_least_k"),
            F.sum(
                F.when(F.col("n_orders") >= F.col("k") + 1, 1).otherwise(0)
            ).alias("at_least_k1"),
        )
    )
    return curve.select(
        "k",
        F.col("at_least_k").cast("long").alias("customers_with_k"),
        F.col("at_least_k1").cast("long").alias(
            "customers_with_k_plus_1"
        ),
        F.expr(
            "CAST((1000000 * at_least_k1)"
            " DIV greatest(at_least_k, 1) AS BIGINT)"
        ).alias("repeat_ppm"),
    )


# --- sweep-line max concurrent sessions per day -------------------------------


@register(
    "max_concurrent_sessions_daily",
    oracle=f"""
    , flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w
                         <= INTERVAL {_SESSION_GAP_MIN} MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid,
               ts
        FROM flagged
    ),
    spans AS (
        SELECT min(ts) AS t0, max(ts) AS t1
        FROM sess GROUP BY user_id, sid
    ),
    deltas AS (
        SELECT t, sum(d) AS net FROM (
            SELECT t0 AS t, 1 AS d FROM spans
            UNION ALL
            SELECT t1 + INTERVAL 1 MICROSECOND AS t, -1 AS d FROM spans
        ) GROUP BY t
    ),
    curve AS (
        SELECT t, sum(net) OVER (ORDER BY t
                                 ROWS UNBOUNDED PRECEDING) AS conc
        FROM deltas
    )
    SELECT CAST(date_trunc('day', t) AS TIMESTAMP) AS day,
           CAST(count(*) AS BIGINT) AS n_changes,
           CAST(max(conc) AS BIGINT) AS max_concurrent,
           CAST(min(conc) AS BIGINT) AS min_concurrent
    FROM curve GROUP BY 1
    """,
    doc="Capacity planning's first number: the daily peak of "
    "simultaneously-active sessions (30-min-gap sessions, the "
    "events_sessionize convention), computed as a sweep line — +1 at "
    "session start, −1 just after session end, net per distinct "
    "timestamp, running sum.  Netting deltas per timestamp BEFORE the "
    "running sum makes the curve independent of tie order, so both "
    "engines agree without a tie-break convention.  Max/min are over "
    "the day's change points (exact for the step function at every "
    "change).  The boundary stream is two rows per session — orders "
    "of magnitude smaller than events; the one global window runs "
    "over that reduced stream, and at cluster scale becomes a "
    "partial-sum + prefix-offset two-phase scan.",
    tags=("analytics", "sessions", "capacity"),
)
def max_concurrent_sessions_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            <= _SESSION_GAP_MIN * 60 * 1000000,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("sid"),
    )
    spans = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    )
    deltas = (
        spans.select(F.col("t0").alias("t"), F.lit(1).alias("d"))
        .unionAll(
            spans.select(
                F.timestamp_micros(
                    F.unix_micros("t1") + 1
                ).alias("t"),
                F.lit(-1).alias("d"),
            )
        )
        .groupBy("t")
        .agg(F.sum("d").alias("net"))
    )
    # the boundary-event stream scales with sessions: global running
    # sum via the two-phase prefix sum (running_totals, calendar-day
    # buckets — its default — monotonic in t), never a single-partition
    # window
    from mqtt2sql_spark.operators.ids import running_totals

    curve = running_totals(deltas, ["t"], "net", out_col="conc").select(
        "t", "conc"
    )
    return curve.groupBy(
        F.date_trunc("day", "t").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_changes"),
        F.max("conc").cast("long").alias("max_concurrent"),
        F.min("conc").cast("long").alias("min_concurrent"),
    )


# --- box-plot statistics of order value per nation ----------------------------


@register(
    "order_value_boxplot_by_nation",
    oracle="""
    , ov AS (
        SELECT n.n_name,
               CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
               o.o_orderkey
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    r AS (
        SELECT n_name, cents,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY cents, o_orderkey) AS rn,
               count(*) OVER (PARTITION BY n_name) AS n
        FROM ov
    ),
    q AS (
        SELECT n_name,
               max(n) AS n,
               max(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS q1,
               max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS q2,
               max(CASE WHEN rn = (3 * n + 1) // 4 THEN cents END) AS q3
        FROM r GROUP BY n_name
    )
    SELECT q.n_name,
           CAST(q.n AS BIGINT) AS n_orders,
           CAST(q.q1 AS BIGINT) AS q1_cents,
           CAST(q.q2 AS BIGINT) AS median_cents,
           CAST(q.q3 AS BIGINT) AS q3_cents,
           CAST(sum(CASE WHEN o.cents
                              < q.q1 - 3 * (q.q3 - q.q1) // 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
           CAST(sum(CASE WHEN o.cents
                              > q.q3 + 3 * (q.q3 - q.q1) // 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
    FROM q JOIN ov o USING (n_name)
    GROUP BY q.n_name, q.n, q.q1, q.q2, q.q3
    """,
    doc="The box plot, as data: exact nearest-rank quartiles of order "
    "value per customer nation plus Tukey 1.5×IQR outlier counts on "
    "each side — the distributional per-nation view that mean-based "
    "cuts (nation_trade_volume) flatten, and the outlier counts that "
    "robust_outliers_mad gives globally, here segmented.  The fence "
    "is computed in integer cents (3·IQR DIV 2 — exact, no 1.5 "
    "double); ranking windows partition by nation with a total-order "
    "tie-break; the re-join for outlier counting broadcasts the "
    "25-row quartile table.",
    tags=("analytics", "stats"),
)
def order_value_boxplot_by_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    ov = (
        orders.join(
            (cust), orders["o_custkey"] == F.col("c_custkey")
        )
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .alias("cents"),
            "o_orderkey",
        )
    )
    wr = W.partitionBy("n_name").orderBy("cents", "o_orderkey")
    wn = W.partitionBy("n_name")
    r = ov.select(
        "n_name",
        "cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    q = r.groupBy("n_name").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(F.expr("rn = (n + 3) DIV 4"), F.col("cents"))
        ).alias("q1"),
        F.max(
            F.when(F.expr("rn = (n + 1) DIV 2"), F.col("cents"))
        ).alias("q2"),
        F.max(
            F.when(F.expr("rn = (3 * n + 1) DIV 4"), F.col("cents"))
        ).alias("q3"),
    )
    j = ov.join(F.broadcast(q), "n_name")
    return j.groupBy("n_name", "n", "q1", "q2", "q3").agg(
        F.sum(
            F.when(
                F.expr("cents < q1 - 3 * (q3 - q1) DIV 2"), 1
            ).otherwise(0)
        ).cast("long").alias("n_low_outliers"),
        F.sum(
            F.when(
                F.expr("cents > q3 + 3 * (q3 - q1) DIV 2"), 1
            ).otherwise(0)
        ).cast("long").alias("n_high_outliers"),
    ).select(
        "n_name",
        F.col("n").cast("long").alias("n_orders"),
        F.col("q1").alias("q1_cents"),
        F.col("q2").alias("median_cents"),
        F.col("q3").alias("q3_cents"),
        "n_low_outliers",
        "n_high_outliers",
    )


# --- storage tiering advisor over event age -----------------------------------


@register(
    "storage_tier_advisor",
    oracle="""
    , mx AS (SELECT max(ts) AS t1 FROM events),
    aged AS (
        SELECT (epoch_us(mx.t1) - epoch_us(e.ts)) // 86400000000
                   AS age_days,
               CAST(length(e.props) + length(e.event_type) + 28
                   AS BIGINT) AS row_bytes
        FROM events e CROSS JOIN mx
    ),
    t AS (
        SELECT CASE WHEN age_days < 30 THEN 'hot'
                    WHEN age_days < 90 THEN 'warm'
                    WHEN age_days < 365 THEN 'cold'
                    ELSE 'frozen' END AS tier,
               row_bytes
        FROM aged
    ),
    per AS (
        SELECT tier, count(*) AS n, sum(row_bytes) AS bytes
        FROM t GROUP BY tier
    ),
    tot AS (SELECT sum(n) AS tn, sum(bytes) AS tb FROM per)
    SELECT p.tier,
           CAST(p.n AS BIGINT) AS n_events,
           CAST(p.bytes AS BIGINT) AS est_bytes,
           CAST((1000000 * p.n) // t.tn AS BIGINT) AS row_share_ppm,
           CAST((1000000 * p.bytes) // t.tb AS BIGINT) AS byte_share_ppm
    FROM per p CROSS JOIN tot t
    """,
    doc="Storage tiering economics for the history log: bucket events "
    "into hot (<30 d from the table's high-water mark), warm (<90 d), "
    "cold (<365 d) and frozen tiers, with row counts and an estimated "
    "byte mass (payload + type + fixed per-row overhead — the "
    "mysql.sql row shape, mqtt2sql stores ts/topic/value per message). "
    " The hot-tier share is what sizes the expensive storage class; "
    "the frozen byte share is the compaction/archive win "
    "(complements history_retention_prune, which deletes — this "
    "prices keeping).  Age is measured from max(ts), not wall clock, "
    "so the result is reproducible; exact integer day buckets.",
    tags=("analytics", "ops"),
)
def storage_tier_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("t1"))
    aged = ev.crossJoin(F.broadcast(mx)).select(
        F.expr(
            "(unix_micros(t1) - unix_micros(ts)) DIV 86400000000"
        ).alias("age_days"),
        (
            F.length("props") + F.length("event_type") + F.lit(28)
        )
        .cast("long")
        .alias("row_bytes"),
    )
    t = aged.select(
        F.when(F.col("age_days") < 30, "hot")
        .when(F.col("age_days") < 90, "warm")
        .when(F.col("age_days") < 365, "cold")
        .otherwise("frozen")
        .alias("tier"),
        "row_bytes",
    )
    per = t.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n"), F.sum("row_bytes").alias("bytes")
    )
    tot = per.agg(
        F.sum("n").alias("tn"), F.sum("bytes").alias("tb")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "tier",
        F.col("n").cast("long").alias("n_events"),
        F.col("bytes").cast("long").alias("est_bytes"),
        F.expr("CAST((1000000 * n) DIV tn AS BIGINT)").alias(
            "row_share_ppm"
        ),
        F.expr("CAST((1000000 * bytes) DIV tb AS BIGINT)").alias(
            "byte_share_ppm"
        ),
    )


# --- Theil-Sen robust trend of monthly revenue ---------------------------------


@register(
    "theil_sen_revenue_trend",
    oracle="""
    , m AS (
        SELECT epoch_us(date_trunc('month', l_shipdate))
                   // 2592000000000 AS mi,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100,
                              0) AS BIGINT)) AS rev
        FROM lineitem GROUP BY 1
    ),
    slopes AS (
        SELECT a.mi AS x1, b.mi AS x2,
               ((b.rev - a.rev) * 100) // (b.mi - a.mi) AS slope_e2
        FROM m a JOIN m b ON b.mi > a.mi
    ),
    r AS (
        SELECT slope_e2,
               row_number() OVER (ORDER BY slope_e2, x1, x2) AS rn,
               count(*) OVER () AS n
        FROM slopes
    )
    SELECT CAST((SELECT count(*) FROM m) AS BIGINT) AS n_months,
           CAST(max(n) AS BIGINT) AS n_pairs,
           CAST(max(CASE WHEN rn = (n + 1) // 2 THEN slope_e2 END)
               AS BIGINT) AS median_slope_e2,
           CAST(max(CASE WHEN rn = (n + 3) // 4 THEN slope_e2 END)
               AS BIGINT) AS q1_slope_e2,
           CAST(max(CASE WHEN rn = (3 * n + 1) // 4 THEN slope_e2 END)
               AS BIGINT) AS q3_slope_e2
    FROM r
    """,
    doc="Robust revenue trend: the Theil-Sen estimator — median of all "
    "pairwise slopes between monthly revenue points — which a single "
    "promotional-spike month cannot drag the way OLS "
    "(linreg_trend_stats) gets dragged.  Months index by epoch "
    "DIV 30d so the x-axis is integral; each pairwise slope is the "
    "exact integer (Δrev·100) DIV Δmonths in cents-per-month "
    "fixed-point, and the median is a nearest-rank pick with "
    "(slope, x1, x2) total order — no doubles anywhere.  The O(k²) "
    "pair join is over ~80 month aggregates (bounded by calendar "
    "span, not data volume), after one map-combinable fact agg.",
    tags=("analytics", "stats", "timeseries"),
)
def theil_sen_revenue_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    m = li.groupBy(
        F.expr(
            "unix_micros(date_trunc('month', l_shipdate))"
            " DIV 2592000000000"
        ).alias("mi")
    ).agg(F.sum(cents).alias("rev"))
    a = m.select(F.col("mi").alias("x1"), F.col("rev").alias("r1"))
    b = m.select(F.col("mi").alias("x2"), F.col("rev").alias("r2"))
    slopes = a.join(b, F.col("x2") > F.col("x1")).select(
        "x1",
        "x2",
        F.expr("((r2 - r1) * 100) DIV (x2 - x1)").alias("slope_e2"),
    )
    r = slopes.select(
        "slope_e2",
        F.row_number()
        .over(W.orderBy("slope_e2", "x1", "x2"))
        .alias("rn"),
        F.count(F.lit(1))
        .over(
            W.partitionBy().rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        )
        .alias("n"),
    )
    n_months = m.agg(F.count(F.lit(1)).alias("n_months"))
    agg = r.agg(
        F.max("n").alias("n_pairs"),
        F.max(
            F.when(F.expr("rn = (n + 1) DIV 2"), F.col("slope_e2"))
        ).alias("median_slope_e2"),
        F.max(
            F.when(F.expr("rn = (n + 3) DIV 4"), F.col("slope_e2"))
        ).alias("q1_slope_e2"),
        F.max(
            F.when(F.expr("rn = (3 * n + 1) DIV 4"), F.col("slope_e2"))
        ).alias("q3_slope_e2"),
    )
    return n_months.crossJoin(agg).select(
        F.col("n_months").cast("long").alias("n_months"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("median_slope_e2").cast("long").alias("median_slope_e2"),
        F.col("q1_slope_e2").cast("long").alias("q1_slope_e2"),
        F.col("q3_slope_e2").cast("long").alias("q3_slope_e2"),
    )


# --- lag-1 autocorrelation of a customer's order values ------------------------


@register(
    "order_value_lag1_autocorr",
    oracle="""
    , seq AS (
        SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS y,
               lag(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS x
        FROM orders
    ),
    p AS (SELECT x, y FROM seq WHERE x IS NOT NULL),
    s AS (
        SELECT count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy
        FROM p
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(floor(
               (CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                  / CAST(n AS DOUBLE))
               / sqrt((CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                         / CAST(n AS DOUBLE))
                      * (CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                           / CAST(n AS DOUBLE)))
               * 1000000) AS BIGINT) AS r_lag1_e6,
           CAST((100 * sy) // n - (100 * sx) // n AS BIGINT)
               AS mean_shift_e2_cents
    FROM s
    """,
    doc="Do customers spend-streak?  Pearson correlation between a "
    "customer's consecutive order values (lag-1 within customer, "
    "orderdate order) — positive r means big orders follow big "
    "orders (habitual basket size), ~0 means order values are drawn "
    "fresh each time and per-customer value prediction can't beat "
    "the customer mean.  Sufficient statistics in exact "
    "HUGEINT/DECIMAL integers off one customer-keyed lag window; the "
    "final r follows the CAST-AS-DOUBLE correctly-rounded-IEEE "
    "formula rule, emitted floor-e6.",
    tags=("analytics", "stats"),
)
def order_value_lag1_autocorr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        cents.alias("y"), F.lag(cents).over(w).alias("x")
    ).filter(F.col("x").isNotNull())
    s = seq.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(
            (F.col("x").cast("decimal(38,0)") * F.col("y"))
        ).alias("sxy"),
        F.sum(
            (F.col("x").cast("decimal(38,0)") * F.col("x"))
        ).alias("sxx"),
        F.sum(
            (F.col("y").cast("decimal(38,0)") * F.col("y"))
        ).alias("syy"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.expr(
            "CAST(floor("
            "(CAST(sxy AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
            "   / CAST(n AS DOUBLE))"
            " / sqrt((CAST(sxx AS DOUBLE)"
            "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
            "           / CAST(n AS DOUBLE))"
            "        * (CAST(syy AS DOUBLE)"
            "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
            "             / CAST(n AS DOUBLE)))"
            " * 1000000) AS BIGINT)"
        ).alias("r_lag1_e6"),
        F.expr(
            "CAST((100 * sy) DIV n - (100 * sx) DIV n AS BIGINT)"
        ).alias("mean_shift_e2_cents"),
    )


# --- U-shaped (position-based) attribution --------------------------------------


@register(
    "position_based_attribution",
    oracle=f"""
    , conv AS (
        SELECT user_id, event_id AS conv_id, epoch_us(ts) AS c_us
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT user_id, event_id AS touch_id, event_type,
               epoch_us(ts) AS t_us
        FROM events WHERE event_type <> 'purchase'
    ),
    pairs AS (
        SELECT c.conv_id, t.event_type, t.touch_id, t.t_us
        FROM conv c JOIN touch t ON t.user_id = c.user_id
        WHERE t.t_us < c.c_us AND c.c_us - t.t_us <= {_ATTR_WINDOW_US}
    ),
    ranked AS (
        SELECT conv_id, event_type,
               row_number() OVER (PARTITION BY conv_id
                                  ORDER BY t_us, touch_id) AS rn,
               count(*) OVER (PARTITION BY conv_id) AS k
        FROM pairs
    ),
    credited AS (
        SELECT conv_id, event_type,
               CASE WHEN k = 1 THEN 10000
                    WHEN k = 2 THEN 5000
                    WHEN rn = 1 OR rn = k THEN 4000
                    ELSE 2000 // (k - 2) END AS bp
        FROM ranked
    )
    SELECT event_type,
           CAST(count(DISTINCT conv_id) AS BIGINT)
               AS n_conversions_touched,
           CAST(sum(bp) AS BIGINT) AS credit_bp
    FROM credited GROUP BY event_type
    """,
    doc="U-shaped (40/20/40 position-based) attribution, completing "
    "the attribution family (first/last/linear/time-decay/Shapley): "
    "within the 7-day lookback the first touch earns 4000 bp, the "
    "last 4000 bp, middles split 2000 bp by integer division — the "
    "model that values introduction AND closing over mid-funnel "
    "noise.  Degenerate paths follow the standard convention (solo "
    "touch 10000, two touches 5000/5000).  Position needs per-"
    "conversion order: one (conv)-partitioned rank window over the "
    "banded user join, total-ordered on (t_us, touch_id); credit "
    "arithmetic is all integer bp.",
    tags=("analytics", "attribution"),
)
def position_based_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.unix_micros("ts").alias("c_us"),
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        "event_type",
        F.unix_micros("ts").alias("t_us"),
    )
    pairs = conv.join(touch, "user_id").filter(
        (F.col("t_us") < F.col("c_us"))
        & (F.col("c_us") - F.col("t_us") <= _ATTR_WINDOW_US)
    )
    wr = W.partitionBy("conv_id").orderBy("t_us", "touch_id")
    wk = W.partitionBy("conv_id")
    ranked = pairs.select(
        "conv_id",
        "event_type",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wk).alias("k"),
    )
    credited = ranked.select(
        "conv_id",
        "event_type",
        F.expr(
            "CASE WHEN k = 1 THEN 10000"
            " WHEN k = 2 THEN 5000"
            " WHEN rn = 1 OR rn = k THEN 4000"
            " ELSE 2000 DIV (k - 2) END"
        ).alias("bp"),
    )
    return credited.groupBy("event_type").agg(
        F.countDistinct("conv_id")
        .cast("long")
        .alias("n_conversions_touched"),
        F.sum("bp").cast("long").alias("credit_bp"),
    )


# --- standardized chi-square cell residuals: type x day-of-week -----------------


@register(
    "chi2_cell_residuals_type_dow",
    oracle="""
    , o AS (
        SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
               count(*) AS o
        FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, sum(o) AS rt FROM o GROUP BY event_type),
    c AS (SELECT dow, sum(o) AS ct FROM o GROUP BY dow),
    n AS (SELECT sum(o) AS n FROM o)
    SELECT o.event_type,
           CAST(o.dow AS BIGINT) AS dow,
           CAST(o.o AS BIGINT) AS observed,
           CAST((10000 * r.rt * c.ct) // n.n AS BIGINT)
               AS expected_e4,
           CAST(floor(
               (CAST(o.o AS DOUBLE) * CAST(n.n AS DOUBLE)
                - CAST(r.rt AS DOUBLE) * CAST(c.ct AS DOUBLE))
               / sqrt(CAST(n.n AS DOUBLE) * CAST(r.rt AS DOUBLE)
                      * CAST(c.ct AS DOUBLE))
               * 10000) AS BIGINT) AS residual_e4
    FROM o JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN n
    """,
    doc="The drill-down behind chi_square_type_dow's single statistic: "
    "per (event type, day-of-week) cell, the standardized residual "
    "(o − e)/√e = (o·n − r·c)/√(n·r·c) — which cells actually drive "
    "the dependence, e.g. errors spiking on Mondays vs purchases "
    "sagging on weekends.  |residual| ≳ 2 flags a cell.  Marginals "
    "are exact integers; the residual is the CAST-AS-DOUBLE "
    "correctly-rounded formula, floor-e4; expected counts ship as "
    "exact e4 fixed-point.  Three tiny aggregates off one "
    "contingency agg — no window at all.",
    tags=("analytics", "stats"),
)
def chi2_cell_residuals_type_dow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    o = ev.groupBy(
        "event_type", F.expr("weekday(ts) + 1").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    r = o.groupBy("event_type").agg(F.sum("o").alias("rt"))
    c = o.groupBy("dow").agg(F.sum("o").alias("ct"))
    n = o.agg(F.sum("o").alias("n"))
    return (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            F.col("dow").cast("long").alias("dow"),
            F.col("o").cast("long").alias("observed"),
            F.expr(
                "CAST((10000 * rt * ct) DIV n AS BIGINT)"
            ).alias("expected_e4"),
            F.expr(
                "CAST(floor("
                "(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)"
                " - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))"
                " / sqrt(CAST(n AS DOUBLE) * CAST(rt AS DOUBLE)"
                "        * CAST(ct AS DOUBLE))"
                " * 10000) AS BIGINT)"
            ).alias("residual_e4"),
        )
    )


# --- week-over-week supplier turnover -------------------------------------------


@register(
    "supplier_weekly_turnover",
    oracle="""
    , ws AS (
        SELECT DISTINCT
               epoch_us(date_trunc('week', l_shipdate))
                   // 604800000000 AS wk,
               l_suppkey
        FROM lineitem
    ),
    sz AS (SELECT wk, count(*) AS n FROM ws GROUP BY wk),
    inter AS (
        SELECT a.wk AS wk, count(*) AS both
        FROM ws a JOIN ws b
          ON b.l_suppkey = a.l_suppkey AND b.wk = a.wk - 1
        GROUP BY a.wk
    )
    SELECT s.wk,
           CAST(s.n AS BIGINT) AS n_suppliers,
           CAST(coalesce(i.both, 0) AS BIGINT) AS n_retained,
           CAST(s.n - coalesce(i.both, 0) AS BIGINT) AS n_new,
           CAST(p.n - coalesce(i.both, 0) AS BIGINT) AS n_lost,
           CAST((1000000 * coalesce(i.both, 0))
                // (s.n + p.n - coalesce(i.both, 0)) AS BIGINT)
               AS jaccard_ppm
    FROM sz s
    JOIN sz p ON p.wk = s.wk - 1
    LEFT JOIN inter i ON i.wk = s.wk
    """,
    doc="Supply-base stability: week-over-week turnover of the active "
    "supplier set (suppliers with ≥1 shipment that week) — retained / "
    "new / lost counts and the Jaccard overlap of consecutive weekly "
    "sets.  A falling Jaccard means the shipping load is rotating "
    "across the supplier pool (good for resilience, bad for "
    "relationship pricing); near-1e6 means a fixed core does all the "
    "work (single_source_risk's temporal cousin).  Week indexed by "
    "epoch DIV 7d; the self-join is an equi-join on "
    "(supplier, adjacent week) over the deduplicated week-supplier "
    "pairs, never raw lineitems.",
    tags=("analytics", "ops"),
)
def supplier_weekly_turnover(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ws = li.select(
        F.expr(
            "unix_micros(date_trunc('week', l_shipdate))"
            " DIV 604800000000"
        ).alias("wk"),
        "l_suppkey",
    ).distinct()
    sz = ws.groupBy("wk").agg(F.count(F.lit(1)).alias("n"))
    a = ws
    b = ws.select(
        (F.col("wk") + 1).alias("wk"),
        F.col("l_suppkey").alias("sk_prev"),
    )
    inter = (
        a.join(
            b,
            (a["wk"] == b["wk"]) & (a["l_suppkey"] == F.col("sk_prev")),
        )
        .groupBy(a["wk"].alias("wk"))
        .agg(F.count(F.lit(1)).alias("both"))
    )
    p = sz.select((F.col("wk") + 1).alias("wk"), F.col("n").alias("pn"))
    return (
        sz.join(p, "wk")
        .join(inter, "wk", "left")
        .select(
            "wk",
            F.col("n").cast("long").alias("n_suppliers"),
            F.coalesce(F.col("both"), F.lit(0))
            .cast("long")
            .alias("n_retained"),
            (F.col("n") - F.coalesce(F.col("both"), F.lit(0)))
            .cast("long")
            .alias("n_new"),
            (F.col("pn") - F.coalesce(F.col("both"), F.lit(0)))
            .cast("long")
            .alias("n_lost"),
            F.expr(
                "CAST((1000000 * coalesce(both, 0))"
                " DIV (n + pn - coalesce(both, 0)) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


# --- retail price vs size slope per part type ------------------------------------


@register(
    "size_price_slope_by_type",
    oracle="""
    , pts AS (
        SELECT p_type,
               CAST(p_size AS BIGINT) AS x,
               CAST(round(p_retailprice * 100, 0) AS BIGINT) AS y
        FROM part
    ),
    s AS (
        SELECT p_type,
               count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM pts GROUP BY p_type
    )
    SELECT p_type,
           CAST(n AS BIGINT) AS n_parts,
           CAST((10000 * (CAST(n AS HUGEINT) * sxy
                          - CAST(sx AS HUGEINT) * sy))
                // greatest(CAST(n AS HUGEINT) * sxx
                            - CAST(sx AS HUGEINT) * sx, 1)
                AS BIGINT) AS slope_cents_per_size_e4,
           CAST((100 * sy) // n AS BIGINT) AS mean_price_e2_cents
    FROM s
    """,
    doc="Does physical size price in?  Per part type, the exact-"
    "integer OLS slope of retail price (cents) on p_size — the "
    "pricing-model sanity check: types whose slope is ~0 price by "
    "brand/material instead of size, negative slopes flag catalog "
    "errors.  Same integer sufficient-statistics pattern as "
    "discount_elasticity_by_brand (pure-integer DIV, negative-safe); "
    "one dimension-table scan, one hash agg — no fact table at all.",
    tags=("analytics", "pricing"),
)
def size_price_slope_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    pts = part.select(
        "p_type",
        F.col("p_size").cast("long").alias("x"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("y"),
    )
    s = pts.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        "p_type",
        F.col("n").cast("long").alias("n_parts"),
        F.expr(
            "CAST((10000 * (CAST(n AS DECIMAL(38,0)) * sxy"
            "               - CAST(sx AS DECIMAL(38,0)) * sy))"
            " DIV greatest(CAST(n AS DECIMAL(38,0)) * sxx"
            "              - CAST(sx AS DECIMAL(38,0)) * sx, 1)"
            " AS BIGINT)"
        ).alias("slope_cents_per_size_e4"),
        F.expr("CAST((100 * sy) DIV n AS BIGINT)").alias(
            "mean_price_e2_cents"
        ),
    )


# --- Little's law check on order WIP ---------------------------------------------


@register(
    "littles_law_check",
    oracle="""
    , per_order AS (
        SELECT o.o_orderkey,
               epoch_us(o.o_orderdate) // 86400000000 AS d0,
               max(epoch_us(l.l_shipdate)) // 86400000000 AS d1
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    ),
    s AS (
        SELECT count(*) AS n,
               sum(greatest(d1 - d0, 0) + 1) AS resident_days,
               max(d1) - min(d0) + 1 AS span_days
        FROM per_order
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           CAST(span_days AS BIGINT) AS span_days,
           CAST((10000 * n) // span_days AS BIGINT)
               AS lambda_per_day_e4,
           CAST((10000 * resident_days) // n AS BIGINT) AS w_days_e4,
           CAST((10000 * resident_days) // span_days AS BIGINT)
               AS l_wip_e4
    FROM s
    """,
    doc="Little's law on the order book: arrival rate λ (orders/day "
    "over the observed span), mean time-in-system W (orderdate to "
    "last line shipment, inclusive-day residency), and average "
    "work-in-progress L = total resident-days / span — the queueing "
    "identity L = λW holds exactly under this time-integral "
    "definition, so the three numbers cross-validate the pipeline's "
    "latency metrics (a drift between l_wip_e4 and "
    "λ·W/10⁴ would flag censoring: orders whose shipments fall "
    "outside the observation window).  Day-integral arithmetic is "
    "exact integers; one fact join grouped at order grain, one "
    "global agg.",
    tags=("analytics", "ops"),
)
def littles_law_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    per_order = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.expr(
                "unix_micros(o_orderdate) DIV 86400000000"
            ).alias("d0"),
            F.expr(
                "unix_micros(last_ship) DIV 86400000000"
            ).alias("d1"),
        )
    )
    s = per_order.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.greatest(F.col("d1") - F.col("d0"), F.lit(0)) + 1
        ).alias("resident_days"),
        (F.max("d1") - F.min("d0") + 1).alias("span_days"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_orders"),
        F.col("span_days").cast("long").alias("span_days"),
        F.expr("CAST((10000 * n) DIV span_days AS BIGINT)").alias(
            "lambda_per_day_e4"
        ),
        F.expr("CAST((10000 * resident_days) DIV n AS BIGINT)").alias(
            "w_days_e4"
        ),
        F.expr(
            "CAST((10000 * resident_days) DIV span_days AS BIGINT)"
        ).alias("l_wip_e4"),
    )


# --- customer revenue concentration per nation ------------------------------------


@register(
    "customer_concentration_by_nation",
    oracle="""
    , cr AS (
        SELECT n.n_name, o.o_custkey,
               sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                   AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name, o.o_custkey
    ),
    rk AS (
        SELECT n_name, cents,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY cents DESC, o_custkey) AS r
        FROM cr
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST((1000000 * sum(CASE WHEN r = 1 THEN cents ELSE 0 END))
                // sum(cents) AS BIGINT) AS top1_share_ppm,
           CAST((1000000 * sum(CASE WHEN r <= 5 THEN cents ELSE 0 END))
                // sum(cents) AS BIGINT) AS top5_share_ppm
    FROM rk GROUP BY n_name
    """,
    doc="Key-account dependency per market: the share of a nation's "
    "order revenue held by its single largest and top-5 customers — "
    "the demand-side mirror of single_source_risk, and the number a "
    "regional P&L owner quotes when one whale account renegotiates.  "
    "Customer-grain cents aggregate first (exact), nation-partitioned "
    "rank with total-order tie-break, conditional fold — the rank "
    "window runs over customers (dimension grain), never orders.",
    tags=("analytics", "risk"),
)
def customer_concentration_by_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cr = (
        orders.join(
            (cust), orders["o_custkey"] == F.col("c_custkey")
        )
        .join(
            F.broadcast(nat),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", "o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("cents")
        )
    )
    rk = cr.select(
        "n_name",
        "cents",
        F.row_number()
        .over(
            W.partitionBy("n_name").orderBy(
                F.desc("cents"), "o_custkey"
            )
        )
        .alias("r"),
    )
    return rk.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.expr(
            "CAST((1000000 * sum(CASE WHEN r = 1 THEN cents ELSE 0 END))"
            " DIV sum(cents) AS BIGINT)"
        ).alias("top1_share_ppm"),
        F.expr(
            "CAST((1000000 * sum(CASE WHEN r <= 5 THEN cents ELSE 0 END))"
            " DIV sum(cents) AS BIGINT)"
        ).alias("top5_share_ppm"),
    )


# --- effective number of brands in the revenue mix, per year ------------------------


@register(
    "brand_mix_effective_n_by_year",
    oracle="""
    , br AS (
        SELECT CAST(extract(year FROM l.l_shipdate) AS BIGINT) AS y,
               p.p_brand,
               sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                              * 100, 0) AS BIGINT)) AS rev
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    s AS (
        SELECT y,
               count(*) AS n_brands,
               sum(rev) AS tot,
               sum(CAST(rev AS HUGEINT) * rev) AS ss
        FROM br GROUP BY y
    )
    SELECT y AS ship_year,
           CAST(n_brands AS BIGINT) AS n_brands,
           CAST(tot AS BIGINT) AS total_cents,
           CAST((10000 * CAST(tot AS HUGEINT) * tot) // ss AS BIGINT)
               AS effective_brands_e4
    FROM s
    """,
    doc="Is the revenue mix consolidating?  Inverse-Simpson 'effective "
    "number of brands' per ship year — (Σrev)²/Σrev² — the "
    "diversity-over-time trend that brand counts hide (25 brands with "
    "one at 90 % share is effectively ~1.2 brands).  A falling curve "
    "is concentration risk building up; pairs with part_supplier_hhi "
    "(static, supply side) on the demand side over time.  Revenue in "
    "exact cents, squares in HUGEINT/DECIMAL(38), one broadcast dim "
    "join + two hash aggs.",
    tags=("analytics", "risk"),
)
def brand_mix_effective_n_by_year(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    br = (
        li.join(part, li["l_partkey"] == F.col("p_partkey"))
        .groupBy(
            F.year("l_shipdate").cast("long").alias("y"), "p_brand"
        )
        .agg(F.sum(cents).alias("rev"))
    )
    s = br.groupBy("y").agg(
        F.count(F.lit(1)).alias("n_brands"),
        F.sum("rev").alias("tot"),
        F.sum(F.col("rev").cast("decimal(38,0)") * F.col("rev")).alias(
            "ss"
        ),
    )
    return s.select(
        F.col("y").alias("ship_year"),
        F.col("n_brands").cast("long").alias("n_brands"),
        F.col("tot").alias("total_cents"),
        F.expr(
            "CAST((10000 * CAST(tot AS DECIMAL(38,0)) * tot) DIV ss"
            " AS BIGINT)"
        ).alias("effective_brands_e4"),
    )


# --- linenumber contiguity audit -----------------------------------------------------


@register(
    "linenumber_contiguity_audit",
    oracle="""
    , per AS (
        SELECT l_orderkey,
               count(*) AS n_lines,
               max(l_linenumber) AS max_ln,
               min(l_linenumber) AS min_ln,
               count(DISTINCT l_linenumber) AS n_distinct
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN min_ln = 1 AND max_ln = n_lines
                              AND n_distinct = n_lines
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contiguous,
           CAST(sum(CASE WHEN n_distinct < n_lines
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lineno,
           CAST(sum(CASE WHEN min_ln <> 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_bad_start,
           CAST(sum(CASE WHEN max_ln <> n_lines THEN 1 ELSE 0 END)
               AS BIGINT) AS n_gapped
    FROM per
    """,
    doc="Line-number integrity: per order, l_linenumber should be the "
    "contiguous sequence 1..n with no duplicates — deletions, "
    "double-writes and partial loads all break one of the three "
    "invariants (min=1, max=count, distinct=count), each counted "
    "separately so the failure MODE is visible, not just a bad-row "
    "count (the CDC-replay sanity check referential_integrity_audit "
    "doesn't cover, being cross-table).  One order-grain agg, one "
    "global fold; pure integers.",
    tags=("analytics", "dq"),
)
def linenumber_contiguity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.max("l_linenumber").alias("max_ln"),
        F.min("l_linenumber").alias("min_ln"),
        F.countDistinct("l_linenumber").alias("n_distinct"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(
            F.when(
                (F.col("min_ln") == 1)
                & (F.col("max_ln") == F.col("n_lines"))
                & (F.col("n_distinct") == F.col("n_lines")),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_contiguous"),
        F.sum(
            F.when(F.col("n_distinct") < F.col("n_lines"), 1).otherwise(0)
        ).cast("long").alias("n_dup_lineno"),
        F.sum(
            F.when(F.col("min_ln") != 1, 1).otherwise(0)
        ).cast("long").alias("n_bad_start"),
        F.sum(
            F.when(F.col("max_ln") != F.col("n_lines"), 1).otherwise(0)
        ).cast("long").alias("n_gapped"),
    )


# --- retention cutoff sweep over the event history ----------------------------------


@register(
    "retention_cutoff_sweep",
    oracle="""
    , mx AS (SELECT max(ts) AS t1 FROM events),
    aged AS (
        SELECT (epoch_us(mx.t1) - epoch_us(e.ts)) // 86400000000
                   AS age_days,
               CAST(length(e.props) + length(e.event_type) + 28
                   AS BIGINT) AS row_bytes
        FROM events e CROSS JOIN mx
    ),
    sweep AS (SELECT unnest([7, 30, 90, 365]) AS keep_days),
    tot AS (SELECT count(*) AS n, sum(row_bytes) AS b FROM aged)
    SELECT s.keep_days,
           CAST(sum(CASE WHEN a.age_days < s.keep_days
                         THEN 1 ELSE 0 END) AS BIGINT) AS rows_kept,
           CAST(sum(CASE WHEN a.age_days < s.keep_days
                         THEN a.row_bytes ELSE 0 END) AS BIGINT)
               AS bytes_kept,
           CAST((1000000 * sum(CASE WHEN a.age_days < s.keep_days
                                    THEN 1 ELSE 0 END))
                // max(t.n) AS BIGINT) AS row_share_ppm,
           CAST((1000000 * sum(CASE WHEN a.age_days < s.keep_days
                                    THEN a.row_bytes ELSE 0 END))
                // max(t.b) AS BIGINT) AS byte_share_ppm
    FROM aged a CROSS JOIN sweep s CROSS JOIN tot t
    GROUP BY s.keep_days
    """,
    doc="Retention policy economics: for keep-last-{7,30,90,365}-days "
    "cutoffs, the rows and estimated bytes the history table retains "
    "— the sweep that turns history_retention_prune's single policy "
    "into a cost curve (how much storage each extra month of "
    "lookback buys, measured from the table's own high-water mark so "
    "the answer is reproducible).  Exact integer day ages, one scan, "
    "a 4x literal fan-out folded map-side.",
    tags=("analytics", "ops"),
)
def retention_cutoff_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("t1"))
    aged = ev.crossJoin(F.broadcast(mx)).select(
        F.expr(
            "(unix_micros(t1) - unix_micros(ts)) DIV 86400000000"
        ).alias("age_days"),
        (F.length("props") + F.length("event_type") + F.lit(28))
        .cast("long")
        .alias("row_bytes"),
    )
    sweep = spark.createDataFrame(
        [(7,), (30,), (90,), (365,)], "keep_days INT"
    )
    tot = aged.agg(
        F.count(F.lit(1)).alias("n"), F.sum("row_bytes").alias("b")
    )
    return (
        aged.crossJoin(F.broadcast(sweep))
        .crossJoin(F.broadcast(tot))
        .groupBy("keep_days")
        .agg(
            F.sum(
                F.when(F.col("age_days") < F.col("keep_days"), 1)
                .otherwise(0)
            ).cast("long").alias("rows_kept"),
            F.sum(
                F.when(
                    F.col("age_days") < F.col("keep_days"),
                    F.col("row_bytes"),
                ).otherwise(0)
            ).cast("long").alias("bytes_kept"),
            F.expr(
                "CAST((1000000 * sum(CASE WHEN age_days < keep_days"
                " THEN 1 ELSE 0 END)) DIV max(n) AS BIGINT)"
            ).alias("row_share_ppm"),
            F.expr(
                "CAST((1000000 * sum(CASE WHEN age_days < keep_days"
                " THEN row_bytes ELSE 0 END)) DIV max(b) AS BIGINT)"
            ).alias("byte_share_ppm"),
        )
    )


# --- hash-sample bias sweep -----------------------------------------------------------


@register(
    "hash_sample_bias_sweep",
    oracle="""
    , base AS (
        SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
               CAST(instr('0123456789abcdef',
                    substr(md5('s:' || CAST(o_orderkey AS VARCHAR)),
                           1, 1)) - 1 AS BIGINT) * 16
               + CAST(instr('0123456789abcdef',
                    substr(md5('s:' || CAST(o_orderkey AS VARCHAR)),
                           2, 1)) - 1 AS BIGINT) AS hv
        FROM orders
    ),
    sweep AS (SELECT unnest([2, 12, 25]) AS thresh,
                     unnest([1, 5, 10]) AS rate_pct),
    pop AS (SELECT count(*) AS n, sum(cents) AS s FROM base)
    SELECT w.rate_pct,
           CAST(sum(CASE WHEN b.hv < w.thresh THEN 1 ELSE 0 END)
               AS BIGINT) AS n_sampled,
           CAST((100 * sum(CASE WHEN b.hv < w.thresh
                                THEN b.cents ELSE 0 END))
                // greatest(sum(CASE WHEN b.hv < w.thresh
                                     THEN 1 ELSE 0 END), 1)
               AS BIGINT) AS sample_mean_e2,
           CAST((100 * max(p.s)) // max(p.n) AS BIGINT) AS pop_mean_e2,
           CAST((100 * sum(CASE WHEN b.hv < w.thresh
                                THEN b.cents ELSE 0 END))
                // greatest(sum(CASE WHEN b.hv < w.thresh
                                     THEN 1 ELSE 0 END), 1)
                - (100 * max(p.s)) // max(p.n) AS BIGINT)
               AS bias_e2_cents
    FROM base b CROSS JOIN sweep w CROSS JOIN pop p
    GROUP BY w.rate_pct
    """,
    doc="Is the cheap hash sample trustworthy?  Deterministic md5-"
    "bucket samples of orders at ≈1/5/10 % (first two hex nibbles "
    "< 2/12/25 of 256) compared against the full-population mean "
    "order value — the audit that certifies hash sampling (the "
    "pattern behind sample_weighted / systematic_weighted_sample) "
    "as unbiased on this data before dashboards switch to it.  "
    "bias_e2_cents is the signed sample-minus-population gap in "
    "exact fixed-point; everything integral, one scan, literal "
    "3-way fan-out.",
    tags=("analytics", "sampling"),
)
def hash_sample_bias_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias(
            "cents"
        ),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("s:"), F.col("o_orderkey").cast("string")
                    )
                ),
                1,
                2,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("hv"),
    )
    sweep = spark.createDataFrame(
        [(2, 1), (12, 5), (25, 10)], "thresh INT, rate_pct INT"
    )
    pop = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    return (
        base.crossJoin(F.broadcast(sweep))
        .crossJoin(F.broadcast(pop))
        .groupBy("rate_pct")
        .agg(
            F.sum(
                F.when(F.col("hv") < F.col("thresh"), 1).otherwise(0)
            ).cast("long").alias("n_sampled"),
            F.expr(
                "CAST((100 * sum(CASE WHEN hv < thresh THEN cents"
                " ELSE 0 END)) DIV greatest(sum(CASE WHEN hv < thresh"
                " THEN 1 ELSE 0 END), 1) AS BIGINT)"
            ).alias("sample_mean_e2"),
            F.expr(
                "CAST((100 * max(s)) DIV max(n) AS BIGINT)"
            ).alias("pop_mean_e2"),
            F.expr(
                "CAST((100 * sum(CASE WHEN hv < thresh THEN cents"
                " ELSE 0 END)) DIV greatest(sum(CASE WHEN hv < thresh"
                " THEN 1 ELSE 0 END), 1)"
                " - (100 * max(s)) DIV max(n) AS BIGINT)"
            ).alias("bias_e2_cents"),
        )
    )


# --- chi-square independence of discount and tax ------------------------------------


@register(
    "discount_tax_independence_chi2",
    oracle="""
    , o AS (
        SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS disc,
               CAST(round(l_tax * 100, 0) AS BIGINT) AS tax,
               count(*) AS o
        FROM lineitem GROUP BY 1, 2
    ),
    r AS (SELECT disc, sum(o) AS rt FROM o GROUP BY disc),
    c AS (SELECT tax, sum(o) AS ct FROM o GROUP BY tax),
    n AS (SELECT sum(o) AS n FROM o),
    terms AS (
        SELECT (CAST(o.o * n.n - r.rt * c.ct AS HUGEINT)
                * (o.o * n.n - r.rt * c.ct) * 10000)
               // (r.rt * c.ct) AS term_e4
        FROM o JOIN r USING (disc) JOIN c USING (tax) CROSS JOIN n
    )
    SELECT CAST((SELECT count(*) FROM r) AS BIGINT) AS n_disc_levels,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_tax_levels,
           CAST((SELECT max(n) FROM n) AS BIGINT) AS n_lines,
           CAST(sum(term_e4) // (SELECT max(n) FROM n) AS BIGINT)
               AS chi2_e4,
           CAST(((SELECT count(*) FROM r) - 1)
                * ((SELECT count(*) FROM c) - 1) AS BIGINT) AS dof
    FROM terms
    """,
    doc="Are discount and tax assigned independently?  Pearson "
    "chi-square over the (discount %, tax %) contingency table — "
    "dependence would mean pricing rules couple the two and any "
    "margin model multiplying their expectations is wrong.  The "
    "statistic is computed as EXACT integers end-to-end: each cell "
    "contributes ((o·n − r·c)²·10⁴) DIV (r·c) in HUGEINT/DECIMAL — "
    "integer term-wise fixed point, then an integer sum, then one "
    "division by n — so no float summation order exists at all "
    "(stricter than the residuals query, which floors per cell).  "
    "~100 cells after one fact agg.",
    tags=("analytics", "stats"),
)
def discount_tax_independence_chi2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = li.groupBy(
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("disc"),
        F.round(F.col("l_tax") * 100, 0).cast("long").alias("tax"),
    ).agg(F.count(F.lit(1)).alias("o"))
    r = o.groupBy("disc").agg(F.sum("o").alias("rt"))
    c = o.groupBy("tax").agg(F.sum("o").alias("ct"))
    n = o.agg(F.sum("o").alias("n"))
    terms = (
        o.join(F.broadcast(r), "disc")
        .join(F.broadcast(c), "tax")
        .crossJoin(F.broadcast(n))
        .select(
            F.expr(
                "(CAST(o * n - rt * ct AS DECIMAL(38,0))"
                " * (o * n - rt * ct) * 10000) DIV (rt * ct)"
            ).alias("term_e4"),
            "n",
        )
    )
    nr = r.agg(F.count(F.lit(1)).alias("n_disc_levels"))
    nc = c.agg(F.count(F.lit(1)).alias("n_tax_levels"))
    agg = terms.agg(
        F.max("n").alias("n_lines"),
        F.expr("CAST(sum(term_e4) DIV max(n) AS BIGINT)").alias(
            "chi2_e4"
        ),
    )
    return (
        nr.crossJoin(nc)
        .crossJoin(agg)
        .select(
            F.col("n_disc_levels").cast("long").alias("n_disc_levels"),
            F.col("n_tax_levels").cast("long").alias("n_tax_levels"),
            F.col("n_lines").cast("long").alias("n_lines"),
            "chi2_e4",
            F.expr(
                "CAST((n_disc_levels - 1) * (n_tax_levels - 1)"
                " AS BIGINT)"
            ).alias("dof"),
        )
    )


# --- market-segment x brand affinity lift ---------------------------------------------


@register(
    "segment_brand_affinity_lift",
    oracle="""
    , o AS (
        SELECT c.c_mktsegment AS seg, p.p_brand AS brand,
               count(*) AS o
        FROM lineitem l
        JOIN orders od ON od.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = od.o_custkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    r AS (SELECT seg, sum(o) AS rt FROM o GROUP BY seg),
    c AS (SELECT brand, sum(o) AS ct FROM o GROUP BY brand),
    n AS (SELECT sum(o) AS n FROM o),
    lift AS (
        SELECT o.seg, o.brand, o.o,
               (1000000 * CAST(o.o AS HUGEINT) * n.n)
                   // (r.rt * c.ct) AS lift_ppm
        FROM o JOIN r USING (seg) JOIN c USING (brand) CROSS JOIN n
    )
    SELECT seg, brand, CAST(o AS BIGINT) AS n_lines,
           CAST(lift_ppm AS BIGINT) AS lift_ppm,
           CAST(row_number() OVER (
               ORDER BY abs(lift_ppm - 1000000) DESC, seg, brand
           ) AS BIGINT) AS rank
    FROM lift
    QUALIFY rank <= 25
    """,
    doc="Which customer segments over-index on which brands?  Lift = "
    "P(seg, brand) / (P(seg)·P(brand)) in exact ppm over the line-"
    "item contingency table, top-25 cells by distance from "
    "independence (|lift − 1e6|) with a total-order tie-break — the "
    "merchandising cut behind association_rules_parts, at segment "
    "grain.  Two broadcast dim joins + one fact-fact join on "
    "orderkey, one agg; the ranking runs over ~125 cells.",
    tags=("analytics", "recsys"),
)
def segment_brand_affinity_lift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    o = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(part, li["l_partkey"] == F.col("p_partkey"))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("p_brand").alias("brand"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
        # seg x brand contingency (~125 rows) feeds the row/col/grand
        # totals AND the lift join — materialize once so the 4-table
        # fact join runs once, not 4x
        .transform(snapshot, eager=True)
    )
    r = o.groupBy("seg").agg(F.sum("o").alias("rt"))
    c = o.groupBy("brand").agg(F.sum("o").alias("ct"))
    n = o.agg(F.sum("o").alias("n"))
    lift = (
        o.join(F.broadcast(r), "seg")
        .join(F.broadcast(c), "brand")
        .crossJoin(F.broadcast(n))
        .select(
            "seg",
            "brand",
            "o",
            # r08: 1e6 * o * n overflows int64 at the 100x replica
            # (stress-sweep witness) — DECIMAL(38,0), mirrored by a
            # HUGEINT cast in the oracle; surface stays BIGINT
            F.expr(
                "(1000000 * CAST(o AS DECIMAL(38,0)) * n)"
                " DIV (CAST(rt AS DECIMAL(38,0)) * ct)"
            ).alias("lift_ppm"),
        )
    )
    ranked = lift.select(
        "seg",
        "brand",
        F.col("o").cast("long").alias("n_lines"),
        F.col("lift_ppm").cast("long").alias("lift_ppm"),
        F.row_number()
        .over(
            W.orderBy(
                F.abs(F.col("lift_ppm") - 1000000).desc(), "seg", "brand"
            )
        )
        .cast("long")
        .alias("rank"),
    )
    return ranked.filter(F.col("rank") <= 25)


# --- unit-price MAD outliers per brand -------------------------------------------------


@register(
    "unit_price_mad_outliers_by_brand",
    oracle="""
    , up AS (
        SELECT p.p_brand,
               CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                   // CAST(round(l.l_quantity, 0) AS BIGINT) AS unit_c,
               l.l_orderkey, l.l_linenumber
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity >= 1
    ),
    med AS (
        SELECT p_brand,
               max(CASE WHEN rn = (n + 1) // 2 THEN unit_c END) AS m
        FROM (
            SELECT p_brand, unit_c,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY unit_c, l_orderkey,
                                               l_linenumber) AS rn,
                   count(*) OVER (PARTITION BY p_brand) AS n
            FROM up
        ) GROUP BY p_brand
    ),
    dev AS (
        SELECT u.p_brand, abs(u.unit_c - m.m) AS ad,
               u.l_orderkey, u.l_linenumber, m.m
        FROM up u JOIN med m USING (p_brand)
    ),
    mad AS (
        SELECT p_brand,
               max(m) AS med_c,
               max(CASE WHEN rn = (n + 1) // 2 THEN ad END) AS mad_c
        FROM (
            SELECT p_brand, ad, m,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY ad, l_orderkey,
                                               l_linenumber) AS rn,
                   count(*) OVER (PARTITION BY p_brand) AS n
            FROM dev
        ) GROUP BY p_brand
    )
    SELECT u.p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(max(d.med_c) AS BIGINT) AS median_unit_cents,
           CAST(max(d.mad_c) AS BIGINT) AS mad_unit_cents,
           CAST(sum(CASE WHEN abs(u.unit_c - d.med_c)
                              > 5 * greatest(d.mad_c, 1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM up u JOIN mad d USING (p_brand)
    GROUP BY u.p_brand
    """,
    doc="Catalog price-integrity screen: per brand, the median unit "
    "price (extended cents DIV integral quantity — exact), the "
    "median absolute deviation, and the count of lines beyond "
    "5×MAD — the robust fence that one fat-finger price can't move "
    "(robust_outliers_mad per-brand, at unit-price grain where "
    "catalog errors actually live).  Two nearest-rank medians via "
    "brand-partitioned rank windows with total-order tie-breaks; "
    "the outlier re-join broadcasts the 25-row MAD table.",
    tags=("analytics", "dq"),
)
def unit_price_mad_outliers_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 1
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    up = li.join(
        (part), li["l_partkey"] == F.col("p_partkey")
    ).select(
        "p_brand",
        F.expr(
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
            " DIV CAST(round(l_quantity, 0) AS BIGINT)"
        ).alias("unit_c"),
        "l_orderkey",
        "l_linenumber",
    )
    wr = W.partitionBy("p_brand").orderBy(
        "unit_c", "l_orderkey", "l_linenumber"
    )
    wn = W.partitionBy("p_brand")
    med = (
        up.select(
            "p_brand",
            "unit_c",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .groupBy("p_brand")
        .agg(
            F.max(
                F.when(F.expr("rn = (n + 1) DIV 2"), F.col("unit_c"))
            ).alias("m")
        )
    )
    dev = up.join(F.broadcast(med), "p_brand").select(
        "p_brand",
        F.abs(F.col("unit_c") - F.col("m")).alias("ad"),
        "l_orderkey",
        "l_linenumber",
        "m",
    )
    wrd = W.partitionBy("p_brand").orderBy(
        "ad", "l_orderkey", "l_linenumber"
    )
    mad = (
        dev.select(
            "p_brand",
            "ad",
            "m",
            F.row_number().over(wrd).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .groupBy("p_brand")
        .agg(
            F.max("m").alias("med_c"),
            F.max(
                F.when(F.expr("rn = (n + 1) DIV 2"), F.col("ad"))
            ).alias("mad_c"),
        )
    )
    return (
        up.join(F.broadcast(mad), "p_brand")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.max("med_c").alias("median_unit_cents"),
            F.max("mad_c").alias("mad_unit_cents"),
            F.sum(
                F.when(
                    F.abs(F.col("unit_c") - F.col("med_c"))
                    > 5 * F.greatest(F.col("mad_c"), F.lit(1)),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


# --- peak revenue month per nation -----------------------------------------------------


@register(
    "peak_month_by_nation",
    oracle="""
    , nm AS (
        SELECT n.n_name,
               CAST(extract(month FROM l.l_shipdate) AS BIGINT) AS m,
               sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                              * 100, 0) AS BIGINT)) AS rev
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
    ),
    t AS (SELECT n_name, sum(rev) AS tot FROM nm GROUP BY n_name),
    rk AS (
        SELECT n_name, m, rev,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY rev DESC, m) AS r
        FROM nm
    )
    SELECT rk.n_name,
           CAST(rk.m AS BIGINT) AS peak_month,
           CAST(rk.rev AS BIGINT) AS peak_month_cents,
           CAST((1000000 * rk.rev) // t.tot AS BIGINT)
               AS peak_share_ppm,
           CAST((1000000 * rk.rev * 12) // t.tot - 1000000 AS BIGINT)
               AS amplitude_vs_uniform_ppm
    FROM rk JOIN t USING (n_name)
    WHERE rk.r = 1
    """,
    doc="Seasonality alignment across markets: each nation's peak "
    "calendar month of shipped revenue, its share of the nation's "
    "annual total, and the signed amplitude vs the uniform 1/12 "
    "baseline — if all 25 nations peak in the same month, capacity "
    "planning is global; staggered peaks argue for regional "
    "inventory pools (the per-market drill-down of "
    "seasonal_index_monthly).  Exact cents, nation-partitioned "
    "argmax with month tie-break.",
    tags=("analytics", "seasonality"),
)
def peak_month_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    nm = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nat),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "n_name", F.month("l_shipdate").cast("long").alias("m")
        )
        .agg(F.sum(cents).alias("rev"))
        # 25x12 rollup read by the totals and the argmax rank —
        # materialize once so the 4-table fact join runs once, not 2x
        .transform(snapshot, eager=True)
    )
    t = nm.groupBy("n_name").agg(F.sum("rev").alias("tot"))
    rk = nm.select(
        "n_name",
        "m",
        "rev",
        F.row_number()
        .over(W.partitionBy("n_name").orderBy(F.desc("rev"), "m"))
        .alias("r"),
    ).filter(F.col("r") == 1)
    return rk.join(F.broadcast(t), "n_name").select(
        "n_name",
        F.col("m").alias("peak_month"),
        F.col("rev").alias("peak_month_cents"),
        # r08: 1e6 * rev * 12 overflows int64 at the 100x replica
        # (stress-sweep witness) — DECIMAL(38,0) like the oracle's
        # HUGEINT sums; surfaces stay BIGINT
        F.expr(
            "CAST((1000000 * CAST(rev AS DECIMAL(38,0))) DIV tot"
            " AS BIGINT)"
        ).alias("peak_share_ppm"),
        F.expr(
            "CAST((1000000 * CAST(rev AS DECIMAL(38,0)) * 12) DIV tot"
            " - 1000000 AS BIGINT)"
        ).alias("amplitude_vs_uniform_ppm"),
    )


# --- win-back rate after dormancy --------------------------------------------------


@register(
    "winback_rate",
    oracle="""
    , seq AS (
        SELECT o_custkey,
               (epoch_us(o_orderdate)
                - epoch_us(lag(o_orderdate)
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey)))
               // 86400000000 AS gap_days
        FROM orders
    ),
    cust AS (
        SELECT o_custkey,
               count(*) + 1 AS n_orders,
               sum(CASE WHEN gap_days > 180 THEN 1 ELSE 0 END)
                   AS n_dormancies
        FROM seq WHERE gap_days IS NOT NULL
        GROUP BY o_custkey
    ),
    d AS (
        SELECT gap_days, o_custkey,
               row_number() OVER (ORDER BY gap_days, o_custkey) AS rn,
               count(*) OVER () AS n
        FROM seq WHERE gap_days > 180
    )
    SELECT CAST((SELECT count(*) FROM cust) AS BIGINT)
               AS n_repeat_customers,
           CAST((SELECT count(*) FROM cust WHERE n_dormancies > 0)
               AS BIGINT) AS n_winback_customers,
           CAST((1000000 * (SELECT count(*) FROM cust
                            WHERE n_dormancies > 0))
                // (SELECT count(*) FROM cust) AS BIGINT)
               AS winback_ppm,
           CAST((SELECT count(*) FROM d) AS BIGINT) AS n_dormancies,
           CAST((SELECT max(CASE WHEN rn = (n + 1) // 2
                                 THEN gap_days END) FROM d)
               AS BIGINT) AS median_dormancy_days
    """,
    doc="Win-back measurement: among repeat customers, how many came "
    "back after a dormancy of more than 180 days between consecutive "
    "orders — every such gap IS a successful win-back by definition "
    "(the next order ends it), so the rate bounds what a reactivation "
    "campaign can claim credit for, and the median dormancy length "
    "prices how long 'lost' actually lasts.  One customer-keyed lag "
    "window, exact day integers, nearest-rank median with total "
    "order.",
    tags=("analytics", "retention"),
)
def winback_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey",
        F.expr(
            "(unix_micros(o_orderdate) - unix_micros(lag(o_orderdate)"
            " OVER (PARTITION BY o_custkey ORDER BY o_orderdate,"
            " o_orderkey))) DIV 86400000000"
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    cust = seq.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.col("gap_days") > 180, 1).otherwise(0)
        ).alias("n_dormancies")
    )
    n_repeat = cust.agg(F.count(F.lit(1)).alias("nr"))
    n_winback = cust.filter(F.col("n_dormancies") > 0).agg(
        F.count(F.lit(1)).alias("nw")
    )
    # median dormancy gap WITHOUT a global row_number over the SCALING
    # dormancy-event relation: value-grain counts + two-phase prefix
    # sum (running_totals), median = value whose cumulative range
    # contains rank (n+1) DIV 2 — tie-insensitive by value
    from mqtt2sql_spark.operators.ids import running_totals

    vc = (
        seq.filter(F.col("gap_days") > 180)
        .groupBy("gap_days")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum = running_totals(
        vc,
        ["gap_days"],
        "c",
        bucket=F.expr("gap_days div 64"),
        out_col="cr",
    )
    tot = cum.agg(F.max("cr").alias("n"))
    dd = cum.crossJoin(F.broadcast(tot)).agg(
        # empty cum (no gap > 180d) must yield 0 like the oracle's
        # scalar `(SELECT count(*) FROM d)`, not max-over-empty NULL
        F.coalesce(F.max("n"), F.lit(0)).alias("nd"),
        F.max(
            F.when(
                F.expr("cr - c < (n + 1) DIV 2 AND cr >= (n + 1) DIV 2"),
                F.col("gap_days"),
            )
        ).alias("med"),
    )
    return (
        n_repeat.crossJoin(n_winback)
        .crossJoin(dd)
        .select(
            F.col("nr").cast("long").alias("n_repeat_customers"),
            F.col("nw").cast("long").alias("n_winback_customers"),
            F.expr("CAST((1000000 * nw) DIV nr AS BIGINT)").alias(
                "winback_ppm"
            ),
            F.col("nd").cast("long").alias("n_dormancies"),
            F.col("med").cast("long").alias("median_dormancy_days"),
        )
    )


# --- account balance vs realized revenue correlation ---------------------------------


@register(
    "acctbal_revenue_corr",
    oracle="""
    , cr AS (
        SELECT c.c_mktsegment,
               CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS x,
               coalesce(o.rev, 0) AS y
        FROM customer c
        LEFT JOIN (
            SELECT o_custkey,
                   sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                       AS rev
            FROM orders GROUP BY o_custkey
        ) o ON o.o_custkey = c.c_custkey
    ),
    s AS (
        SELECT c_mktsegment,
               count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy
        FROM cr GROUP BY c_mktsegment
    )
    SELECT c_mktsegment,
           CAST(n AS BIGINT) AS n_customers,
           CAST(floor(
               (CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                  / CAST(n AS DOUBLE))
               / sqrt((CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                         / CAST(n AS DOUBLE))
                      * (CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                           / CAST(n AS DOUBLE)))
               * 1000000) AS BIGINT) AS r_e6
    FROM s
    """,
    doc="Does account balance predict realized revenue?  Pearson "
    "correlation per market segment between a customer's c_acctbal "
    "and their lifetime order total (zero for never-ordered "
    "customers, via LEFT JOIN — excluding them would bias r upward). "
    " Near-zero r means balance is NOT a spend proxy and any "
    "credit-based targeting model needs real features.  Exact "
    "HUGEINT/DECIMAL sufficient statistics, CAST-AS-DOUBLE "
    "correctly-rounded final formula, floor-e6.",
    tags=("analytics", "stats"),
)
def acctbal_revenue_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("long")
        ).alias("rev")
    )
    cr = cust.join(
        rev, cust["c_custkey"] == rev["o_custkey"], "left"
    ).select(
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("x"),
        F.coalesce(F.col("rev"), F.lit(0)).alias("y"),
    )
    s = cr.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias(
            "sxy"
        ),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias(
            "sxx"
        ),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias(
            "syy"
        ),
    )
    return s.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n_customers"),
        F.expr(
            "CAST(floor("
            "(CAST(sxy AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
            "   / CAST(n AS DOUBLE))"
            " / sqrt((CAST(sxx AS DOUBLE)"
            "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
            "           / CAST(n AS DOUBLE))"
            "        * (CAST(syy AS DOUBLE)"
            "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
            "             / CAST(n AS DOUBLE)))"
            " * 1000000) AS BIGINT)"
        ).alias("r_e6"),
    )


# --- supply-nation spread per order ------------------------------------------------------


@register(
    "order_supply_nation_spread",
    oracle="""
    , os AS (
        SELECT l.l_orderkey,
               count(DISTINCT s.s_nationkey) AS n_nations,
               count(*) AS n_lines
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY l.l_orderkey
    ),
    tot AS (SELECT count(*) AS n FROM os)
    SELECT o.n_nations,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(o.n_lines) AS BIGINT) AS n_lines,
           CAST((1000000 * count(*)) // max(t.n) AS BIGINT)
               AS order_share_ppm
    FROM os o CROSS JOIN tot t
    GROUP BY o.n_nations
    """,
    doc="Fulfillment coordination cost: how many distinct supplier "
    "NATIONS an order draws from, histogrammed — multi-nation orders "
    "mean split customs/consolidation and are where "
    "order_ship_span_histogram's long spans come from; the share of "
    "single-nation orders is the ceiling for a 'regional "
    "fulfillment' fast path.  One broadcast dim join, one "
    "order-grain distinct-count agg; exact integers.",
    tags=("analytics", "ops"),
)
def order_supply_nation_spread(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    os_ = (
        li.join(sup, li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("s_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    tot = os_.agg(F.count(F.lit(1)).alias("n"))
    return (
        os_.crossJoin(F.broadcast(tot))
        .groupBy("n_nations")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.expr(
                "CAST((1000000 * count(*)) DIV max(n) AS BIGINT)"
            ).alias("order_share_ppm"),
        )
        .select(
            F.col("n_nations").cast("long").alias("n_nations"),
            "n_orders",
            "n_lines",
            "order_share_ppm",
        )
    )


# --- price-size monotonicity inversions per brand ------------------------------------------


@register(
    "price_size_inversions_by_brand",
    oracle="""
    , p AS (
        SELECT p_brand, p_partkey,
               CAST(p_size AS BIGINT) AS sz,
               CAST(round(p_retailprice * 100, 0) AS BIGINT) AS pc
        FROM part
    ),
    pairs AS (
        SELECT a.p_brand,
               count(*) AS n_pairs,
               sum(CASE WHEN a.pc > b.pc THEN 1 ELSE 0 END)
                   AS n_inversions,
               sum(CASE WHEN a.pc = b.pc THEN 1 ELSE 0 END) AS n_ties
        FROM p a JOIN p b
          ON a.p_brand = b.p_brand AND a.sz < b.sz
        GROUP BY a.p_brand
    )
    SELECT p_brand,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(n_inversions AS BIGINT) AS n_inversions,
           CAST(n_ties AS BIGINT) AS n_ties,
           CAST((1000000 * n_inversions) // greatest(n_pairs, 1)
               AS BIGINT) AS inversion_ppm
    FROM pairs
    """,
    doc="Price-ladder sanity per brand: among all part pairs where "
    "size strictly increases, how often does retail price DECREASE — "
    "the Kendall-style inversion count that says whether 'bigger "
    "costs more' holds, catalog-wide, without assuming linearity "
    "(the rank-order complement of size_price_slope_by_type's OLS). "
    " High inversion_ppm on one brand is a mispriced ladder.  The "
    "pairwise join is within-brand over the part DIMENSION "
    "(25 brands × ~k² bounded pairs), never facts; exact integers.",
    tags=("analytics", "dq", "pricing"),
)
def price_size_inversions_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_brand",
        F.col("p_size").cast("long").alias("sz"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias(
            "pc"
        ),
    )
    a = p.select(
        F.col("p_brand").alias("brand"),
        F.col("sz").alias("sza"),
        F.col("pc").alias("pca"),
    )
    b = p.select(
        F.col("p_brand").alias("brand_b"),
        F.col("sz").alias("szb"),
        F.col("pc").alias("pcb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("brand") == F.col("brand_b"))
            & (F.col("sza") < F.col("szb")),
        )
        .groupBy(F.col("brand").alias("p_brand"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.when(F.col("pca") > F.col("pcb"), 1).otherwise(0)
            ).alias("n_inversions"),
            F.sum(
                F.when(F.col("pca") == F.col("pcb"), 1).otherwise(0)
            ).alias("n_ties"),
        )
    )
    return pairs.select(
        "p_brand",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_inversions").cast("long").alias("n_inversions"),
        F.col("n_ties").cast("long").alias("n_ties"),
        F.expr(
            "CAST((1000000 * n_inversions) DIV greatest(n_pairs, 1)"
            " AS BIGINT)"
        ).alias("inversion_ppm"),
    )


# --- per-order rounding loss audit -----------------------------------------------------


@register(
    "rounding_loss_audit",
    oracle="""
    , per_line AS (
        SELECT l_orderkey,
               CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                   AS BIGINT) AS line_cents,
               CAST(round(l_extendedprice * (1 - l_discount) * 1000000,
                          0) AS BIGINT) AS line_microcents
        FROM lineitem
    ),
    per_order AS (
        SELECT l_orderkey,
               sum(line_cents) AS sum_rounded,
               (sum(line_microcents) + 5000) // 10000 AS rounded_sum
        FROM per_line GROUP BY l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN sum_rounded <> rounded_sum
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_orders_differ,
           CAST(sum(abs(sum_rounded - rounded_sum)) AS BIGINT)
               AS total_abs_diff_cents,
           CAST(max(abs(sum_rounded - rounded_sum)) AS BIGINT)
               AS max_abs_diff_cents
    FROM per_order
    """,
    doc="Invoice rounding policy audit: per order, the difference "
    "between summing line amounts rounded to cents (how line items "
    "print) and rounding the exact order total once (how the ledger "
    "books it) — the classic penny-drift that reconciliation jobs "
    "chase.  n_orders_differ bounds how many invoices can disagree "
    "with the ledger by construction, before any data error "
    "(order_total_reconciliation then finds the REAL errors on "
    "top).  The 'round once' side sums exact MICROCENT integers "
    "per line and rounds half-up via (s+5000) DIV 10000 — even a "
    "7-term float sum hits boundary divergence across engines "
    "(witnessed at sf0.1), so no float sum exists anywhere here.",
    tags=("analytics", "dq", "finance"),
)
def rounding_loss_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    raw = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.round(raw * 100, 0).cast("long")).alias("sum_rounded"),
        F.expr(
            "(sum(CAST(round(l_extendedprice * (1 - l_discount)"
            " * 1000000, 0) AS BIGINT)) + 5000) DIV 10000"
        ).alias("rounded_sum"),
    )
    return per_order.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(
            F.when(
                F.col("sum_rounded") != F.col("rounded_sum"), 1
            ).otherwise(0)
        ).cast("long").alias("n_orders_differ"),
        F.sum(
            F.abs(F.col("sum_rounded") - F.col("rounded_sum"))
        ).cast("long").alias("total_abs_diff_cents"),
        F.max(
            F.abs(F.col("sum_rounded") - F.col("rounded_sum"))
        ).cast("long").alias("max_abs_diff_cents"),
    )


# --- priority mix by customer order rank ----------------------------------------------------


@register(
    "priority_by_order_rank",
    oracle="""
    , rk AS (
        SELECT o_orderpriority,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey)
                   AS order_rank
        FROM orders
    )
    SELECT order_rank,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
           CAST((1000000 * sum(CASE WHEN o_orderpriority IN
                                    ('1-URGENT', '2-HIGH')
                                    THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS urgent_share_ppm
    FROM rk WHERE order_rank <= 10
    GROUP BY order_rank
    """,
    doc="Do customers escalate?  The share of urgent/high-priority "
    "orders at each position in a customer's order sequence (1st, "
    "2nd, … 10th) — a rising curve means tenure breeds urgency "
    "(expedite-dependence worth pricing), a flat one means priority "
    "is order-intrinsic and lifecycle targeting won't move it.  One "
    "customer-keyed rank window, one 10-group fold; exact integers.",
    tags=("analytics", "behavior"),
)
def priority_by_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rk = orders.select(
        "o_orderpriority",
        F.row_number()
        .over(
            W.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            )
        )
        .alias("order_rank"),
    ).filter(F.col("order_rank") <= 10)
    return rk.groupBy("order_rank").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            ).otherwise(0)
        ).cast("long").alias("n_urgent"),
        F.expr(
            "CAST((1000000 * sum(CASE WHEN o_orderpriority IN"
            " ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END))"
            " DIV count(*) AS BIGINT)"
        ).alias("urgent_share_ppm"),
    ).select(
        F.col("order_rank").cast("long").alias("order_rank"),
        "n_orders",
        "n_urgent",
        "urgent_share_ppm",
    )


# --- shipment span vs order size ---------------------------------------------------------------


@register(
    "ship_span_by_line_count",
    oracle="""
    , per AS (
        SELECT l_orderkey,
               count(*) AS n_lines,
               (max(epoch_us(l_shipdate)) - min(epoch_us(l_shipdate)))
                   // 86400000000 AS span_days
        FROM lineitem GROUP BY l_orderkey
    ),
    r AS (
        SELECT n_lines, span_days,
               row_number() OVER (PARTITION BY n_lines
                                  ORDER BY span_days, l_orderkey) AS rn,
               count(*) OVER (PARTITION BY n_lines) AS n
        FROM per
    )
    SELECT n_lines,
           CAST(max(n) AS BIGINT) AS n_orders,
           CAST(max(CASE WHEN rn = (n + 1) // 2 THEN span_days END)
               AS BIGINT) AS median_span_days,
           CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN span_days END)
               AS BIGINT) AS p90_span_days,
           CAST((10000 * sum(span_days)) // max(n) AS BIGINT)
               AS mean_span_days_e4
    FROM r GROUP BY n_lines
    """,
    doc="Does order size drive fulfillment spread?  Median/P90/mean "
    "first-to-last-shipment span per line count — quantifies how "
    "much each extra line item costs in consolidated-delivery time "
    "(the curve behind order_ship_span_histogram, conditioned on "
    "size), which prices 'split big orders' as an ops lever.  "
    "Order-grain agg, then a line-count-partitioned rank for exact "
    "medians with total-order tie-break.",
    tags=("analytics", "ops"),
)
def ship_span_by_line_count(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.expr(
            "(max(unix_micros(l_shipdate))"
            " - min(unix_micros(l_shipdate))) DIV 86400000000"
        ).alias("span_days"),
    )
    wr = W.partitionBy("n_lines").orderBy("span_days", "l_orderkey")
    wn = W.partitionBy("n_lines")
    r = per.select(
        "n_lines",
        "span_days",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.groupBy("n_lines").agg(
        F.max("n").cast("long").alias("n_orders"),
        F.max(
            F.when(F.expr("rn = (n + 1) DIV 2"), F.col("span_days"))
        ).cast("long").alias("median_span_days"),
        F.max(
            F.when(F.expr("rn = (9 * n + 9) DIV 10"), F.col("span_days"))
        ).cast("long").alias("p90_span_days"),
        F.expr(
            "CAST((10000 * sum(span_days)) DIV max(n) AS BIGINT)"
        ).alias("mean_span_days_e4"),
    ).select(
        F.col("n_lines").cast("long").alias("n_lines"),
        "n_orders",
        "median_span_days",
        "p90_span_days",
        "mean_span_days_e4",
    )


# --- session depth vs duration correlation ---------------------------------------------------


@register(
    "session_depth_duration_corr",
    oracle=f"""
    , flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w
                         <= INTERVAL {_SESSION_GAP_MIN} MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid,
               ts
        FROM flagged
    ),
    per AS (
        SELECT count(*) AS x,
               (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS y
        FROM sess GROUP BY user_id, sid
    ),
    s AS (
        SELECT count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy
        FROM per
    )
    SELECT CAST(n AS BIGINT) AS n_sessions,
           CAST((10000 * sx) // n AS BIGINT) AS mean_depth_e4,
           CAST((10000 * sy) // n AS BIGINT) AS mean_duration_s_e4,
           CAST(floor(
               (CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                  / CAST(n AS DOUBLE))
               / sqrt((CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                         / CAST(n AS DOUBLE))
                      * (CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                           / CAST(n AS DOUBLE)))
               * 1000000) AS BIGINT) AS r_e6
    FROM s
    """,
    doc="Are deep sessions long sessions?  Pearson correlation between "
    "a session's event count and its wall-clock duration (30-min-gap "
    "sessions) — near-1 means depth is just time and either metric "
    "suffices; materially below 1 means some sessions are "
    "rapid-fire (bots, bursts) and engagement dashboards need both "
    "axes.  Exact HUGEINT/DECIMAL sufficient statistics off the "
    "session grain, CAST-AS-DOUBLE floor-e6 for r.",
    tags=("analytics", "sessions"),
)
def session_depth_duration_corr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        F.when(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            <= _SESSION_GAP_MIN * 60 * 1000000,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
        "event_id",
    )
    sess = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("sid"),
    )
    per = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("x"),
        F.expr(
            "(max(unix_micros(ts)) - min(unix_micros(ts)))"
            " DIV 1000000"
        ).alias("y"),
    )
    s = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias(
            "sxy"
        ),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias(
            "sxx"
        ),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias(
            "syy"
        ),
    )
    return s.select(
        F.col("n").cast("long").alias("n_sessions"),
        F.expr("CAST((10000 * sx) DIV n AS BIGINT)").alias(
            "mean_depth_e4"
        ),
        F.expr("CAST((10000 * sy) DIV n AS BIGINT)").alias(
            "mean_duration_s_e4"
        ),
        F.expr(
            "CAST(floor("
            "(CAST(sxy AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
            "   / CAST(n AS DOUBLE))"
            " / sqrt((CAST(sxx AS DOUBLE)"
            "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
            "           / CAST(n AS DOUBLE))"
            "        * (CAST(syy AS DOUBLE)"
            "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
            "             / CAST(n AS DOUBLE)))"
            " * 1000000) AS BIGINT)"
        ).alias("r_e6"),
    )


# --- supplier activity histogram ----------------------------------------------------------------


@register(
    "supplier_activity_histogram",
    oracle="""
    , per AS (
        SELECT l_suppkey, count(*) AS n_lines
        FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (
        SELECT count(*) AS n_sup, sum(n_lines) AS n_total FROM per
    )
    SELECT length(bin(p.n_lines)) - 1 AS log2_lines,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(p.n_lines) AS BIGINT) AS n_lines,
           CAST((1000000 * count(*)) // max(t.n_sup) AS BIGINT)
               AS supplier_share_ppm,
           CAST((1000000 * sum(p.n_lines)) // max(t.n_total)
               AS BIGINT) AS volume_share_ppm
    FROM per p CROSS JOIN tot t
    GROUP BY length(bin(p.n_lines)) - 1
    """,
    doc="Supply-base activity distribution: suppliers histogrammed by "
    "power-of-two shipment-line count, with each band's share of "
    "suppliers vs share of volume — the long-tail picture behind "
    "excess_share_suppliers: if the bottom bands hold half the "
    "suppliers but 2 % of volume, consolidating them is cheap; if "
    "volume is spread, the tail is load-bearing.  One fact agg to "
    "supplier grain, exact integers, log2 via binary length.",
    tags=("analytics", "ops"),
)
def supplier_activity_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("n_sup"),
        F.sum("n_lines").alias("n_total"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .groupBy(
            (F.length(F.bin("n_lines")) - 1).alias("log2_lines")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.expr(
                "CAST((1000000 * count(*)) DIV max(n_sup) AS BIGINT)"
            ).alias("supplier_share_ppm"),
            F.expr(
                "CAST((1000000 * sum(n_lines)) DIV max(n_total)"
                " AS BIGINT)"
            ).alias("volume_share_ppm"),
        )
        .select(
            F.col("log2_lines").cast("long").alias("log2_lines"),
            "n_suppliers",
            "n_lines",
            "supplier_share_ppm",
            "volume_share_ppm",
        )
    )


# --- year-over-year customer retention -----------------------------------------------------------


@register(
    "customer_retention_by_year",
    oracle="""
    , cy AS (
        SELECT DISTINCT o_custkey,
               CAST(extract(year FROM o_orderdate) AS BIGINT) AS y
        FROM orders
    ),
    sz AS (SELECT y, count(*) AS n FROM cy GROUP BY y),
    ret AS (
        SELECT a.y, count(*) AS retained
        FROM cy a JOIN cy b
          ON b.o_custkey = a.o_custkey AND b.y = a.y + 1
        GROUP BY a.y
    )
    SELECT s.y AS order_year,
           CAST(s.n AS BIGINT) AS n_active,
           CAST(coalesce(r.retained, 0) AS BIGINT) AS n_retained_next,
           CAST((1000000 * coalesce(r.retained, 0)) // s.n AS BIGINT)
               AS retention_ppm
    FROM sz s
    JOIN sz nx ON nx.y = s.y + 1
    LEFT JOIN ret r ON r.y = s.y
    """,
    doc="Annual customer retention: of the customers who ordered in "
    "year y, the share who ordered again in y+1 — the yearly "
    "macro-retention that cohort_retention (event-grain, weekly) "
    "and repeat_order_hazard_curve (order-rank grain) both sit "
    "under; years missing a successor year are excluded rather than "
    "reported as 0.  Distinct (customer, year) pairs first, then an "
    "adjacent-year self equi-join — never the raw fact table twice.",
    tags=("analytics", "retention"),
)
def customer_retention_by_year(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cy = orders.select(
        "o_custkey",
        F.year("o_orderdate").cast("long").alias("y"),
    ).distinct()
    sz = cy.groupBy("y").agg(F.count(F.lit(1)).alias("n"))
    b = cy.select(
        F.col("o_custkey").alias("ck"), (F.col("y") - 1).alias("y")
    )
    ret = (
        cy.join(
            b, (cy["o_custkey"] == b["ck"]) & (cy["y"] == b["y"])
        )
        .groupBy(cy["y"].alias("yy"))
        .agg(F.count(F.lit(1)).alias("retained"))
    )
    nx = sz.select((F.col("y") - 1).alias("y"))
    return (
        sz.join(nx, "y")
        .join(ret, sz["y"] == ret["yy"], "left")
        .select(
            sz["y"].alias("order_year"),
            F.col("n").cast("long").alias("n_active"),
            F.coalesce(F.col("retained"), F.lit(0))
            .cast("long")
            .alias("n_retained_next"),
            F.expr(
                "CAST((1000000 * coalesce(retained, 0)) DIV n"
                " AS BIGINT)"
            ).alias("retention_ppm"),
        )
    )


# --- catalog grid coverage ------------------------------------------------------------------------


@register(
    "catalog_grid_coverage",
    oracle="""
    , grid AS (
        SELECT p_type, p_size, count(*) AS n_parts
        FROM part GROUP BY p_type, p_size
    ),
    dims AS (
        SELECT (SELECT count(DISTINCT p_type) FROM part) AS n_types,
               (SELECT count(DISTINCT p_size) FROM part) AS n_sizes,
               (SELECT count(*) FROM grid) AS n_cells,
               (SELECT count(*) FROM part) AS n_parts,
               (SELECT max(n_parts) FROM grid) AS max_cell
    )
    SELECT CAST(n_types AS BIGINT) AS n_types,
           CAST(n_sizes AS BIGINT) AS n_sizes,
           CAST(n_cells AS BIGINT) AS n_populated_cells,
           CAST(n_types * n_sizes AS BIGINT) AS n_grid_cells,
           CAST((1000000 * n_cells) // (n_types * n_sizes) AS BIGINT)
               AS occupancy_ppm,
           CAST(n_parts AS BIGINT) AS n_parts,
           CAST(max_cell AS BIGINT) AS max_parts_per_cell
    FROM dims
    """,
    doc="Assortment completeness: how much of the (type x size) "
    "catalog grid is actually populated — occupancy well below 1e6 "
    "means whole type-size combinations are unoffered (gaps a "
    "substitution recommender (part_substitution_candidates) "
    "cannot paper over), while a huge max cell is redundant "
    "assortment.  Dimension-table-only aggregates; exact integers.",
    tags=("analytics", "catalog"),
)
def catalog_grid_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    grid = part.groupBy("p_type", "p_size").agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    a = part.agg(
        F.countDistinct("p_type").alias("n_types"),
        F.countDistinct("p_size").alias("n_sizes"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    g = grid.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.max("n_parts").alias("max_cell"),
    )
    return a.crossJoin(g).select(
        F.col("n_types").cast("long").alias("n_types"),
        F.col("n_sizes").cast("long").alias("n_sizes"),
        F.col("n_cells").cast("long").alias("n_populated_cells"),
        (F.col("n_types") * F.col("n_sizes"))
        .cast("long")
        .alias("n_grid_cells"),
        F.expr(
            "CAST((1000000 * n_cells) DIV (n_types * n_sizes)"
            " AS BIGINT)"
        ).alias("occupancy_ppm"),
        F.col("n_parts").cast("long").alias("n_parts"),
        F.col("max_cell").cast("long").alias("max_parts_per_cell"),
    )


# --- brand specialization across part types -------------------------------------------------------


@register(
    "brand_type_specialization",
    oracle="""
    , bt AS (
        SELECT p_brand, p_type, count(*) AS n
        FROM part GROUP BY p_brand, p_type
    ),
    s AS (
        SELECT p_brand,
               sum(n) AS total,
               count(*) AS n_types,
               sum(n * (n - 1)) AS coll,
               max(n) AS top_n
        FROM bt GROUP BY p_brand
    )
    SELECT p_brand,
           CAST(total AS BIGINT) AS n_parts,
           CAST(n_types AS BIGINT) AS n_types,
           CAST((10000 * total * (total - 1))
                // greatest(coll, 1) AS BIGINT) AS effective_types_e4,
           CAST((1000000 * top_n) // total AS BIGINT)
               AS top_type_share_ppm
    FROM s
    """,
    doc="Brand specialization: the inverse-Simpson 'effective number "
    "of part types' each brand spans — a brand listing 40 types at "
    "effective 3.1 is a specialist with a long vanity tail, which "
    "changes how its supply risk (single_source_risk) and "
    "substitution options should be read.  Dimension-only "
    "collision arithmetic, exact integers.",
    tags=("analytics", "catalog"),
)
def brand_type_specialization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    bt = part.groupBy("p_brand", "p_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    s = bt.groupBy("p_brand").agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("n") * (F.col("n") - 1)).alias("coll"),
        F.max("n").alias("top_n"),
    )
    return s.select(
        "p_brand",
        F.col("total").cast("long").alias("n_parts"),
        F.col("n_types").cast("long").alias("n_types"),
        F.expr(
            "CAST((10000 * total * (total - 1))"
            " DIV greatest(coll, 1) AS BIGINT)"
        ).alias("effective_types_e4"),
        F.expr(
            "CAST((1000000 * top_n) DIV total AS BIGINT)"
        ).alias("top_type_share_ppm"),
    )


# --- year-over-year drift of the nation revenue mix ------------------------------------------------


@register(
    "nation_mix_drift_yoy",
    oracle="""
    , ny AS (
        SELECT CAST(extract(year FROM l.l_shipdate) AS BIGINT) AS y,
               s.s_nationkey AS nk,
               sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                              * 100, 0) AS BIGINT)) AS rev
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    ),
    yt AS (SELECT y, sum(rev) AS t FROM ny GROUP BY y),
    pairs AS (
        SELECT a.y,
               sum(abs(CAST(coalesce(a.rev, 0) AS HUGEINT) * tb.t
                       - CAST(coalesce(b.rev, 0) AS HUGEINT) * ta.t))
                   AS num,
               max(CAST(ta.t AS HUGEINT) * tb.t) AS den
        FROM ny a
        JOIN yt ta ON ta.y = a.y
        JOIN yt tb ON tb.y = a.y + 1
        LEFT JOIN ny b ON b.nk = a.nk AND b.y = a.y + 1
        GROUP BY a.y
    )
    SELECT y AS from_year,
           CAST(y + 1 AS BIGINT) AS to_year,
           CAST((1000000 * num) // (2 * den) AS BIGINT) AS tvd_ppm
    FROM pairs
    """,
    doc="Is the supply-nation revenue mix drifting?  Total-variation "
    "distance between consecutive years' nation revenue shares, "
    "computed EXACTLY as Σ|rev_i·T' − rev'_i·T| / (2·T·T') in "
    "HUGEINT/DECIMAL cross-multiplication — no per-share doubles, "
    "no rounding, so a 1-cent mix change is representable.  "
    "Sustained multi-1e4-ppm TVD is a supply-chain migration "
    "(supplier_share_shift names the movers; this sizes the total "
    "churn).  Note nations present only in year y+1 are outside the "
    "LEFT JOIN's reach and contribute via the share deficit — "
    "documented asymmetry, same on both engines.  One dim join, "
    "year-grain aggregates.",
    tags=("analytics", "drift"),
)
def nation_mix_drift_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    ny = (
        li.join(sup, li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy(
            F.year("l_shipdate").cast("long").alias("y"),
            F.col("s_nationkey").alias("nk"),
        )
        .agg(F.sum(cents).alias("rev"))
        # year x nation (tiny) read by the totals, the lagged side and
        # the drift join — materialize once, scan the fact once
        .transform(snapshot, eager=True)
    )
    yt = ny.groupBy("y").agg(F.sum("rev").alias("t"))
    ta = yt.select(F.col("y").alias("ya"), F.col("t").alias("tta"))
    tb = yt.select((F.col("y") - 1).alias("yb"), F.col("t").alias("ttb"))
    b = ny.select(
        F.col("nk").alias("nkb"),
        (F.col("y") - 1).alias("yb2"),
        F.col("rev").alias("revb"),
    )
    pairs = (
        ny.join(ta, ny["y"] == ta["ya"])
        .join(tb, ny["y"] == tb["yb"])
        .join(
            b,
            (ny["nk"] == b["nkb"]) & (ny["y"] == b["yb2"]),
            "left",
        )
        .groupBy(ny["y"].alias("y"))
        .agg(
            F.sum(
                F.abs(
                    F.col("rev").cast("decimal(38,0)") * F.col("ttb")
                    - F.coalesce(F.col("revb"), F.lit(0)).cast(
                        "decimal(38,0)"
                    )
                    * F.col("tta")
                )
            ).alias("num"),
            F.max(
                F.col("tta").cast("decimal(38,0)") * F.col("ttb")
            ).alias("den"),
        )
    )
    return pairs.select(
        F.col("y").alias("from_year"),
        (F.col("y") + 1).cast("long").alias("to_year"),
        F.expr(
            "CAST((1000000 * CAST(num AS DECIMAL(38,0)))"
            " DIV (2 * den) AS BIGINT)"
        ).alias("tvd_ppm"),
    )


# --- user lifecycle snapshot ------------------------------------------------------------------------


@register(
    "user_lifecycle_snapshot",
    oracle="""
    , mx AS (SELECT max(ts) AS t1 FROM events),
    u AS (
        SELECT e.user_id,
               (max(epoch_us(mx.t1)) - max(epoch_us(e.ts)))
                   // 86400000000 AS recency_d,
               (max(epoch_us(mx.t1)) - min(epoch_us(e.ts)))
                   // 86400000000 AS age_d,
               count(*) AS n_events
        FROM events e CROSS JOIN mx
        GROUP BY e.user_id
    ),
    staged AS (
        SELECT CASE WHEN age_d < 30 THEN 'new'
                    WHEN recency_d <= 30 THEN 'active'
                    WHEN recency_d <= 90 THEN 'at_risk'
                    ELSE 'churned' END AS stage,
               n_events
        FROM u
    ),
    tot AS (SELECT count(*) AS n FROM staged)
    SELECT s.stage,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(s.n_events) AS BIGINT) AS n_events,
           CAST((1000000 * count(*)) // max(t.n) AS BIGINT)
               AS user_share_ppm
    FROM staged s CROSS JOIN tot t
    GROUP BY s.stage
    """,
    doc="Lifecycle census at the table's high-water mark: every user "
    "classified new (<30 d old) / active (seen within 30 d) / "
    "at-risk (30-90 d quiet) / churned (>90 d) with user and event "
    "mass per stage — the four numbers a growth dashboard leads "
    "with, derived reproducibly from max(ts) rather than wall "
    "clock (dau_wau_stickiness gives the ratio view; this gives "
    "the stock view).  One user-grain agg; exact integer day "
    "arithmetic.",
    tags=("analytics", "retention"),
)
def user_lifecycle_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("t1"))
    u = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.expr(
                "(max(unix_micros(t1)) - max(unix_micros(ts)))"
                " DIV 86400000000"
            ).alias("recency_d"),
            F.expr(
                "(max(unix_micros(t1)) - min(unix_micros(ts)))"
                " DIV 86400000000"
            ).alias("age_d"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    staged = u.select(
        F.when(F.col("age_d") < 30, "new")
        .when(F.col("recency_d") <= 30, "active")
        .when(F.col("recency_d") <= 90, "at_risk")
        .otherwise("churned")
        .alias("stage"),
        "n_events",
    )
    tot = staged.agg(F.count(F.lit(1)).alias("n"))
    return (
        staged.crossJoin(F.broadcast(tot))
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.expr(
                "CAST((1000000 * count(*)) DIV max(n) AS BIGINT)"
            ).alias("user_share_ppm"),
        )
    )


# --- dead-stock share of the catalog ----------------------------------------------------------------


@register(
    "catalog_dead_stock_share",
    oracle="""
    , ordered AS (SELECT DISTINCT l_partkey FROM lineitem),
    flags AS (
        SELECT p.p_brand,
               CASE WHEN o.l_partkey IS NULL THEN 1 ELSE 0 END AS dead
        FROM part p LEFT JOIN ordered o ON o.l_partkey = p.p_partkey
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(dead) AS BIGINT) AS n_never_ordered,
           CAST((1000000 * sum(dead)) // count(*) AS BIGINT)
               AS dead_share_ppm
    FROM flags GROUP BY p_brand
    """,
    doc="Dead catalog per brand: parts that appear in no line item "
    "ever — the assortment carrying listing/maintenance cost with "
    "zero revenue, per brand so merchandising knows where to prune "
    "(the share view on top of the bare anti-join "
    "semi_join_parts_ordered exposes).  Distinct part keys from the "
    "fact table (one shuffle of keys only), LEFT JOIN against the "
    "dimension, exact integers.",
    tags=("analytics", "catalog"),
)
def catalog_dead_stock_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey"
    ).distinct()
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    flags = part.join(
        li, part["p_partkey"] == li["l_partkey"], "left"
    ).select(
        "p_brand",
        F.when(F.col("l_partkey").isNull(), 1).otherwise(0).alias(
            "dead"
        ),
    )
    return flags.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("dead").cast("long").alias("n_never_ordered"),
        F.expr(
            "CAST((1000000 * sum(dead)) DIV count(*) AS BIGINT)"
        ).alias("dead_share_ppm"),
    )


# --- payload property vs event value correlation ----------------------------------------------


@register(
    "props_value_correlation",
    oracle="""
    , pts AS (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS x,
               CAST(round(value * 100, 0) AS BIGINT) AS y
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
    ),
    s AS (
        SELECT event_type,
               count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy
        FROM pts GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           CAST(floor(
               (CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                  / CAST(n AS DOUBLE))
               / sqrt((CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                         / CAST(n AS DOUBLE))
                      * (CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                           / CAST(n AS DOUBLE)))
               * 1000000) AS BIGINT) AS r_e6
    FROM s
    """,
    doc="Is the JSON payload property informative about the event's "
    "value?  Pearson correlation per event type between the decoded "
    "props.k integer and the value column — near-zero r licenses "
    "dropping the JSON decode from hot paths entirely (a real cost: "
    "get_json_object is the most expensive scalar in the scan), "
    "material r means k belongs in the typed schema.  JSON "
    "extraction is identical on both engines "
    "(json_extract_string/get_json_object); exact integer "
    "sufficient statistics, CAST-AS-DOUBLE floor-e6.",
    tags=("analytics", "stats"),
)
def props_value_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("x"),
        F.round(F.col("value") * 100, 0).cast("long").alias("y"),
    ).filter(F.col("x").isNotNull())
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias(
            "sxy"
        ),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias(
            "sxx"
        ),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias(
            "syy"
        ),
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.expr(
            "CAST(floor("
            "(CAST(sxy AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
            "   / CAST(n AS DOUBLE))"
            " / sqrt((CAST(sxx AS DOUBLE)"
            "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
            "           / CAST(n AS DOUBLE))"
            "        * (CAST(syy AS DOUBLE)"
            "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
            "             / CAST(n AS DOUBLE)))"
            " * 1000000) AS BIGINT)"
        ).alias("r_e6"),
    )


# --- intraclass correlation of session depth within users -------------------------------------


@register(
    "session_depth_icc",
    oracle=f"""
    , flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w
                         <= INTERVAL {_SESSION_GAP_MIN} MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ),
    per AS (
        SELECT user_id, count(*) AS x
        FROM sess GROUP BY user_id, sid
    ),
    ug AS (
        SELECT user_id, count(*) AS k, sum(x) AS sx,
               sum(CAST(x AS HUGEINT) * x) AS sxx
        FROM per GROUP BY user_id
        HAVING count(*) >= 2
    ),
    g AS (
        SELECT count(*) AS n_users,
               sum(k) AS n,
               sum(sx) AS s,
               sum(sxx) AS ss,
               sum((CAST(sx AS HUGEINT) * sx * 10000) // k)
                   AS sb_e4
        FROM ug
    )
    SELECT CAST(n_users AS BIGINT) AS n_users,
           CAST(n AS BIGINT) AS n_sessions,
           CAST(floor(
               ((CAST(sb_e4 AS DOUBLE) / 10000.0
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE))
                / CAST(n_users - 1 AS DOUBLE)
                - (CAST(ss AS DOUBLE)
                   - CAST(sb_e4 AS DOUBLE) / 10000.0)
                  / CAST(n - n_users AS DOUBLE))
               / ((CAST(sb_e4 AS DOUBLE) / 10000.0
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE))
                  / CAST(n_users - 1 AS DOUBLE)
                  + (CAST(ss AS DOUBLE)
                     - CAST(sb_e4 AS DOUBLE) / 10000.0)
                    / CAST(n - n_users AS DOUBLE))
               * 1000000) AS BIGINT) AS icc_proxy_e6
    FROM g
    """,
    doc="Is session depth a USER trait or a session accident?  "
    "One-way variance decomposition of session event-counts within "
    "vs between users (users with ≥2 sessions): the reported proxy "
    "is (MSB − MSW)/(MSB + MSW) — positive means depth is sticky "
    "per user (personalization signal), ≈0 means sessions are "
    "exchangeable and per-user depth features are noise.  The "
    "between-group sum Σ(Sᵢ²/kᵢ) is kept exact in e4 fixed-point "
    "HUGEINT (integer-divided per user, identically both engines); "
    "the final ratio follows the CAST-AS-DOUBLE rule.  One session "
    "window, two tiny aggs.",
    tags=("analytics", "sessions", "stats"),
)
def session_depth_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            <= _SESSION_GAP_MIN * 60 * 1000000,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    sess = flagged.select(
        "user_id",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("sid"),
    )
    per = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("x")
    )
    ug = (
        per.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias(
                "sxx"
            ),
        )
        .filter(F.col("k") >= 2)
    )
    g = ug.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("k").alias("n"),
        F.sum("sx").alias("s"),
        F.sum("sxx").alias("ss"),
        F.sum(
            F.expr(
                "(CAST(sx AS DECIMAL(38,0)) * sx * 10000) DIV k"
            ).cast("decimal(38,0)")
        ).alias("sb_e4"),
    )
    return g.select(
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n").cast("long").alias("n_sessions"),
        F.expr(
            "CAST(floor("
            "((CAST(sb_e4 AS DOUBLE) / 10000.0"
            "  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
            "    / CAST(n AS DOUBLE))"
            " / CAST(n_users - 1 AS DOUBLE)"
            " - (CAST(ss AS DOUBLE)"
            "    - CAST(sb_e4 AS DOUBLE) / 10000.0)"
            "   / CAST(n - n_users AS DOUBLE))"
            " / ((CAST(sb_e4 AS DOUBLE) / 10000.0"
            "     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
            "       / CAST(n AS DOUBLE))"
            "    / CAST(n_users - 1 AS DOUBLE)"
            "    + (CAST(ss AS DOUBLE)"
            "       - CAST(sb_e4 AS DOUBLE) / 10000.0)"
            "      / CAST(n - n_users AS DOUBLE))"
            " * 1000000) AS BIGINT)"
        ).alias("icc_proxy_e6"),
    )


# --- order/line status consistency audit --------------------------------------------------------


@register(
    "status_consistency_audit",
    oracle="""
    , lm AS (
        SELECT l_orderkey,
               CASE WHEN min(l_linestatus) = max(l_linestatus)
                    THEN min(l_linestatus) ELSE 'MIXED' END AS line_mix
        FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
        SELECT o.o_orderstatus, lm.line_mix
        FROM orders o JOIN lm ON lm.l_orderkey = o.o_orderkey
    )
    SELECT o_orderstatus, line_mix,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(CASE WHEN (o_orderstatus = 'F' AND line_mix = 'F')
                       OR (o_orderstatus = 'O' AND line_mix = 'O')
                       OR (o_orderstatus = 'P' AND line_mix = 'MIXED')
                     THEN 1 ELSE 0 END AS BIGINT) AS is_consistent
    FROM j GROUP BY o_orderstatus, line_mix
    """,
    doc="Cross-table status invariant: TPC-H semantics say an order "
    "is F iff every line is F, O iff every line is O, P otherwise — "
    "the (order status × line mix) contingency with a consistency "
    "flag per cell surfaces exactly which invariant a CDC replay or "
    "partial load broke (referential_integrity_audit checks keys "
    "exist; this checks the STATE MACHINE agrees).  One order-grain "
    "line agg, one join, one fold; all integers/strings.",
    tags=("analytics", "dq"),
)
def status_consistency_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    lm = li.groupBy("l_orderkey").agg(
        F.when(
            F.min("l_linestatus") == F.max("l_linestatus"),
            F.min("l_linestatus"),
        )
        .otherwise("MIXED")
        .alias("line_mix")
    )
    j = orders.join(lm, orders["o_orderkey"] == lm["l_orderkey"])
    return j.groupBy("o_orderstatus", "line_mix").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.expr(
            "CAST(CASE WHEN (o_orderstatus = 'F' AND line_mix = 'F')"
            " OR (o_orderstatus = 'O' AND line_mix = 'O')"
            " OR (o_orderstatus = 'P' AND line_mix = 'MIXED')"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("is_consistent"),
    )


# --- copurchase degree vs revenue correlation -----------------------------------------------------


@register(
    "part_degree_revenue_corr",
    oracle="""
    , basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT DISTINCT x.l_partkey AS pk1, y.l_partkey AS pk2
        FROM basket x JOIN basket y
          ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
    ),
    deg AS (
        SELECT pk, count(*) AS d FROM (
            SELECT pk1 AS pk FROM edges
            UNION ALL SELECT pk2 AS pk FROM edges
        ) GROUP BY pk
    ),
    rev AS (
        SELECT l_partkey AS pk,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100,
                              0) AS BIGINT)) AS r
        FROM lineitem GROUP BY l_partkey
    ),
    pts AS (
        SELECT coalesce(d.d, 0) AS x, r.r AS y
        FROM rev r LEFT JOIN deg d USING (pk)
    ),
    s AS (
        SELECT count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy
        FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_parts,
           CAST((10000 * sx) // n AS BIGINT) AS mean_degree_e4,
           CAST(floor(
               (CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                  / CAST(n AS DOUBLE))
               / sqrt((CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                         / CAST(n AS DOUBLE))
                      * (CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                           / CAST(n AS DOUBLE)))
               * 1000000) AS BIGINT) AS r_e6
    FROM s
    """,
    doc="Do hub products sell more, or just co-occur more?  Pearson "
    "correlation across parts between copurchase-graph degree and "
    "revenue — high r means the graph centrality signals "
    "(pagerank_copurchase, rich_club) are revenue proxies and a "
    "recommender optimizing clicks double-counts; low r means "
    "centrality carries independent information worth a feature.  "
    "Zero-degree parts included via LEFT JOIN (excluding them "
    "inflates r).  Edge derivation is the bounded basket expansion; "
    "exact integer sufficient statistics, CAST-AS-DOUBLE floor-e6.",
    tags=("analytics", "graph", "stats"),
)
def part_degree_revenue_corr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    e1 = baskets.select("parts", F.posexplode("parts").alias("i", "pk1"))
    edges = (
        e1.select("i", "pk1", F.posexplode("parts").alias("j", "pk2"))
        .filter(F.col("j") > F.col("i"))
        .select("pk1", "pk2")
        .distinct()
    )
    deg = (
        edges.select(F.col("pk1").alias("pk"))
        .unionAll(edges.select(F.col("pk2").alias("pk")))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    rev = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                * 100,
                0,
            ).cast("long")
        ).alias("r")
    )
    pts = rev.join(F.broadcast(deg), "pk", "left").select(
        F.coalesce(F.col("d"), F.lit(0)).alias("x"),
        F.col("r").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias(
            "sxy"
        ),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias(
            "sxx"
        ),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias(
            "syy"
        ),
    )
    return s.select(
        F.col("n").cast("long").alias("n_parts"),
        F.expr("CAST((10000 * sx) DIV n AS BIGINT)").alias(
            "mean_degree_e4"
        ),
        F.expr(
            "CAST(floor("
            "(CAST(sxy AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
            "   / CAST(n AS DOUBLE))"
            " / sqrt((CAST(sxx AS DOUBLE)"
            "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
            "           / CAST(n AS DOUBLE))"
            "        * (CAST(syy AS DOUBLE)"
            "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
            "             / CAST(n AS DOUBLE)))"
            " * 1000000) AS BIGINT)"
        ).alias("r_e6"),
    )


# --- weekday ordering share per market segment ---------------------------------------------------


@register(
    "weekday_share_by_segment",
    oracle="""
    , o AS (
        SELECT c.c_mktsegment,
               CASE WHEN isodow(o.o_orderdate) <= 5 THEN 1 ELSE 0 END
                   AS is_weekday
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(is_weekday) AS BIGINT) AS n_weekday,
           CAST((1000000 * sum(is_weekday)) // count(*) AS BIGINT)
               AS weekday_share_ppm
    FROM o GROUP BY c_mktsegment
    """,
    doc="Business-rhythm segmentation: the share of each market "
    "segment's orders placed Monday-Friday — procurement-driven "
    "segments order on business days (high share), consumer-like "
    "segments spread across the week; the one-number check on "
    "whether segment labels carry the B2B/B2C distinction the "
    "pricing team assumes.  ISO weekday normalized across engines; "
    "one broadcast dim join, one agg.",
    tags=("analytics", "behavior"),
)
def weekday_share_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = orders.join(
        (cust), orders["o_custkey"] == F.col("c_custkey")
    ).select(
        "c_mktsegment",
        F.when(F.expr("weekday(o_orderdate) + 1") <= 5, 1)
        .otherwise(0)
        .alias("is_weekday"),
    )
    return o.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("is_weekday").cast("long").alias("n_weekday"),
        F.expr(
            "CAST((1000000 * sum(is_weekday)) DIV count(*) AS BIGINT)"
        ).alias("weekday_share_ppm"),
    )


# --- customer value trajectory sign test -----------------------------------------------------------


@register(
    "customer_value_trajectory",
    oracle="""
    , rk AS (
        SELECT o_custkey,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey)
                   AS rn,
               count(*) OVER (PARTITION BY o_custkey) AS k
        FROM orders
    ),
    halves AS (
        SELECT o_custkey,
               sum(CASE WHEN rn <= k // 2 THEN cents ELSE 0 END) AS s1,
               sum(CASE WHEN rn <= k // 2 THEN 1 ELSE 0 END) AS k1,
               sum(CASE WHEN rn > k - k // 2 THEN cents ELSE 0 END)
                   AS s2,
               sum(CASE WHEN rn > k - k // 2 THEN 1 ELSE 0 END) AS k2
        FROM rk WHERE k >= 4
        GROUP BY o_custkey
    ),
    lab AS (
        SELECT CASE
                 WHEN CAST(s2 AS HUGEINT) * k1 > CAST(s1 AS HUGEINT) * k2
                 THEN 1
                 WHEN CAST(s2 AS HUGEINT) * k1 < CAST(s1 AS HUGEINT) * k2
                 THEN -1 ELSE 0 END AS sgn
        FROM halves
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_growing,
           CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shrinking,
           CAST(floor(
               (CAST(sum(sgn) AS DOUBLE))
               / sqrt(CAST(sum(abs(sgn)) AS DOUBLE))
               * 1000000) AS BIGINT) AS sign_z_e6
    FROM lab
    """,
    doc="Are customers growing or shrinking?  Per customer with ≥4 "
    "orders, compare the mean order value of their first half vs "
    "second half (by order sequence) using exact cross-"
    "multiplication — no per-customer division — then the sign-test "
    "z = (up − down)/√(up + down) across customers.  A "
    "population-level drift detector that per-customer noise can't "
    "fake (each customer contributes ±1, not their variance); "
    "pairs with customer_value_migration's band matrix.  One "
    "customer-keyed rank window, exact integers, CAST-AS-DOUBLE "
    "final z.",
    tags=("analytics", "retention", "stats"),
)
def customer_value_trajectory(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rk = orders.select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias(
            "cents"
        ),
        F.row_number()
        .over(
            W.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            )
        )
        .alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("o_custkey"))
        .alias("k"),
    ).filter(F.col("k") >= 4)
    halves = rk.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.expr("rn <= k DIV 2"), F.col("cents")).otherwise(0)
        ).alias("s1"),
        F.sum(F.when(F.expr("rn <= k DIV 2"), 1).otherwise(0)).alias(
            "k1"
        ),
        F.sum(
            F.when(F.expr("rn > k - k DIV 2"), F.col("cents"))
            .otherwise(0)
        ).alias("s2"),
        F.sum(
            F.when(F.expr("rn > k - k DIV 2"), 1).otherwise(0)
        ).alias("k2"),
    )
    lab = halves.select(
        F.expr(
            "CASE WHEN CAST(s2 AS DECIMAL(38,0)) * k1"
            " > CAST(s1 AS DECIMAL(38,0)) * k2 THEN 1"
            " WHEN CAST(s2 AS DECIMAL(38,0)) * k1"
            " < CAST(s1 AS DECIMAL(38,0)) * k2 THEN -1"
            " ELSE 0 END"
        ).alias("sgn")
    )
    return lab.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_growing"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_shrinking"),
        F.expr(
            "CAST(floor((CAST(sum(sgn) AS DOUBLE))"
            " / sqrt(CAST(sum(abs(sgn)) AS DOUBLE))"
            " * 1000000) AS BIGINT)"
        ).alias("sign_z_e6"),
    )


# --- purchasing activity of negative-balance customers ---------------------------------------------


@register(
    "negative_balance_activity",
    oracle="""
    , lab AS (
        SELECT c.c_custkey,
               CASE WHEN c.c_acctbal < 0 THEN 1 ELSE 0 END AS neg,
               count(o.o_orderkey) AS n_orders,
               coalesce(sum(CAST(round(o.o_totalprice * 100, 0)
                                 AS BIGINT)), 0) AS cents
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, CASE WHEN c.c_acctbal < 0
                                   THEN 1 ELSE 0 END
    )
    SELECT neg AS is_negative_balance,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(n_orders) AS BIGINT) AS n_orders,
           CAST((10000 * sum(n_orders)) // count(*) AS BIGINT)
               AS orders_per_customer_e4,
           CAST((100 * sum(cents)) // greatest(sum(n_orders), 1)
               AS BIGINT) AS mean_order_value_e2
    FROM lab GROUP BY neg
    """,
    doc="Credit-risk behavior check: do negative-balance customers "
    "order less, or at lower value, than positive-balance ones?  "
    "Per balance sign: customers, order rate per customer, and mean "
    "order value — identical rates mean the balance field carries "
    "no behavioral signal and credit holds are not yet biting "
    "(negative_balance_by_nation locates the exposure; this tests "
    "whether it matters).  Never-ordered customers count in the "
    "denominator via LEFT JOIN; exact integers.",
    tags=("analytics", "risk"),
)
def negative_balance_activity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    orders = load_table(spark, sf_dir, "orders")
    lab = (
        cust.join(
            orders, cust["c_custkey"] == orders["o_custkey"], "left"
        )
        .groupBy(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, 1).otherwise(0).alias("neg"),
        )
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(
                    F.round(F.col("o_totalprice") * 100, 0).cast("long")
                ),
                F.lit(0),
            ).alias("cents"),
        )
    )
    return lab.groupBy(
        F.col("neg").alias("is_negative_balance")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.expr(
            "CAST((10000 * sum(n_orders)) DIV count(*) AS BIGINT)"
        ).alias("orders_per_customer_e4"),
        F.expr(
            "CAST((100 * sum(cents)) DIV greatest(sum(n_orders), 1)"
            " AS BIGINT)"
        ).alias("mean_order_value_e2"),
    )


# --- order-value coefficient-of-variation histogram --------------------------------------------


@register(
    "order_value_cv_histogram",
    oracle="""
    , per AS (
        SELECT o_custkey,
               count(*) AS n,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS s,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                   * CAST(round(o_totalprice * 100, 0) AS BIGINT))
                   AS ss
        FROM orders GROUP BY o_custkey
        HAVING count(*) >= 3
    ),
    cv AS (
        SELECT CAST(floor(
                   sqrt((CAST(ss AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                           / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                   / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                   * 10) AS BIGINT) AS cv_band
        FROM per
    ),
    tot AS (SELECT count(*) AS t FROM cv)
    SELECT c.cv_band,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST((1000000 * count(*)) // max(t.t) AS BIGINT)
               AS share_ppm
    FROM cv c CROSS JOIN tot t
    GROUP BY c.cv_band
    """,
    doc="How consistent is each customer's basket size?  Population "
    "CV (σ/μ) of order value per customer with ≥3 orders, "
    "histogrammed in 0.1-wide bands — the left mass is "
    "subscription-like predictable buyers (forecastable at customer "
    "grain), the right tail is project-driven lumpy demand where "
    "only portfolio-level forecasts work.  Sufficient statistics "
    "exact; the per-customer CV follows the CAST-AS-DOUBLE rule "
    "(sqrt is correctly rounded) before the floor-band.  One "
    "customer agg, one ~15-group agg.",
    tags=("analytics", "stats"),
)
def order_value_cv_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    per = (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("s"),
            F.sum(cents * cents).alias("ss"),
        )
        .filter(F.col("n") >= 3)
    )
    cv = per.select(
        F.expr(
            "CAST(floor("
            "sqrt((CAST(ss AS DOUBLE)"
            " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
            "   / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))"
            " / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
            " * 10) AS BIGINT)"
        ).alias("cv_band")
    )
    tot = cv.agg(F.count(F.lit(1)).alias("t"))
    return (
        cv.crossJoin(F.broadcast(tot))
        .groupBy("cv_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.expr(
                "CAST((1000000 * count(*)) DIV max(t) AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


# --- same-brand share of basket pairs ----------------------------------------------------------


@register(
    "basket_brand_loyalty",
    oracle="""
    , basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pe AS (
        SELECT b.l_orderkey, b.l_partkey, p.p_brand
        FROM basket b JOIN part p ON p.p_partkey = b.l_partkey
    ),
    pairs AS (
        SELECT sum(CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END)
                   AS same_brand,
               count(*) AS n_pairs
        FROM pe a JOIN pe b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
    ),
    base AS (
        SELECT sum(CAST(n AS HUGEINT) * (n - 1)) AS num,
               CAST(sum(n) AS HUGEINT) * (sum(n) - 1) AS den
        FROM (SELECT p_brand, count(*) AS n FROM pe GROUP BY p_brand)
    )
    SELECT CAST(p.n_pairs AS BIGINT) AS n_pairs,
           CAST(p.same_brand AS BIGINT) AS n_same_brand,
           CAST((1000000 * p.same_brand) // p.n_pairs AS BIGINT)
               AS same_brand_ppm,
           CAST((1000000 * b.num) // b.den AS BIGINT)
               AS expected_random_ppm
    FROM pairs p CROSS JOIN base b
    """,
    doc="Do baskets cluster by brand?  The share of within-order part "
    "pairs that share a brand, against the random-mixing baseline "
    "(the corpus-wide brand collision probability Σnᵢ(nᵢ−1)/N(N−1)) "
    "— same_brand meaningfully above expected means brand pulls "
    "co-purchase and brand-level recommendations "
    "(copurchase_brand_modularity) have signal to work with.  "
    "Basket pair expansion is the bounded ≤7-line form; baseline in "
    "exact HUGEINT/DECIMAL collision arithmetic.",
    tags=("analytics", "recsys"),
)
def basket_brand_loyalty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    pe = li.join(
        (part), li["l_partkey"] == F.col("p_partkey")
    ).select("l_orderkey", "l_partkey", "p_brand")
    a = pe.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_partkey").alias("pka"),
        F.col("p_brand").alias("ba"),
    )
    b = pe.select(
        F.col("l_orderkey").alias("okb"),
        F.col("l_partkey").alias("pkb"),
        F.col("p_brand").alias("bb"),
    )
    pairs = a.join(
        b,
        (F.col("ok") == F.col("okb")) & (F.col("pka") < F.col("pkb")),
    ).agg(
        F.sum(
            F.when(F.col("ba") == F.col("bb"), 1).otherwise(0)
        ).alias("same_brand"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    base = (
        pe.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(
                F.col("n").cast("decimal(38,0)") * (F.col("n") - 1)
            ).alias("num"),
            F.expr(
                "CAST(sum(n) AS DECIMAL(38,0)) * (sum(n) - 1)"
            ).alias("den"),
        )
    )
    return pairs.crossJoin(base).select(
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("same_brand").cast("long").alias("n_same_brand"),
        F.expr(
            "CAST((1000000 * same_brand) DIV n_pairs AS BIGINT)"
        ).alias("same_brand_ppm"),
        F.expr(
            "CAST((1000000 * num) DIV den AS BIGINT)"
        ).alias("expected_random_ppm"),
    )


# --- export partner diversity per supplier nation ---------------------------------------------------


@register(
    "export_partner_diversity",
    oracle="""
    , flow AS (
        SELECT sn.n_name AS supp_nation,
               cn.n_nationkey AS cust_nk,
               sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                              * 100, 0) AS BIGINT)) AS rev
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        GROUP BY sn.n_name, cn.n_nationkey
    ),
    s AS (
        SELECT supp_nation,
               count(*) AS n_partners,
               sum(rev) AS tot,
               sum(CAST(rev AS HUGEINT) * rev) AS ss,
               max(rev) AS top_rev
        FROM flow GROUP BY supp_nation
    )
    SELECT supp_nation,
           CAST(n_partners AS BIGINT) AS n_partners,
           CAST(tot AS BIGINT) AS export_cents,
           CAST((10000 * CAST(tot AS HUGEINT) * tot) // ss AS BIGINT)
               AS effective_partners_e4,
           CAST((1000000 * top_rev) // tot AS BIGINT)
               AS top_partner_share_ppm
    FROM s
    """,
    doc="Export concentration per supplier nation: the inverse-Simpson "
    "'effective number of customer nations' each supplier nation "
    "ships to — 25 listed partners at effective 2.5 means two "
    "demand markets hold that nation's export book, the demand-"
    "shock exposure trade_flow_matrix's raw grid doesn't rank.  "
    "Exact cents, HUGEINT/DECIMAL squares; the five-table join is "
    "all broadcast dims around one fact-fact orderkey join.",
    tags=("analytics", "risk"),
)
def export_partner_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    flow = (
        li.join(sup, li["l_suppkey"] == F.col("s_suppkey"))
        .join(
            F.broadcast(nat.select(
                F.col("n_nationkey").alias("snk"),
                F.col("n_name").alias("supp_nation"),
            )),
            F.col("s_nationkey") == F.col("snk"),
        )
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("supp_nation", F.col("c_nationkey").alias("cust_nk"))
        .agg(F.sum(cents).alias("rev"))
    )
    s = flow.groupBy("supp_nation").agg(
        F.count(F.lit(1)).alias("n_partners"),
        F.sum("rev").alias("tot"),
        F.sum(F.col("rev").cast("decimal(38,0)") * F.col("rev")).alias(
            "ss"
        ),
        F.max("rev").alias("top_rev"),
    )
    return s.select(
        "supp_nation",
        F.col("n_partners").cast("long").alias("n_partners"),
        F.col("tot").alias("export_cents"),
        F.expr(
            "CAST((10000 * CAST(tot AS DECIMAL(38,0)) * tot) DIV ss"
            " AS BIGINT)"
        ).alias("effective_partners_e4"),
        F.expr(
            "CAST((1000000 * top_rev) DIV tot AS BIGINT)"
        ).alias("top_partner_share_ppm"),
    )


# --- dominant line share within each order ------------------------------------------------------


@register(
    "dominant_line_share_histogram",
    oracle="""
    , per AS (
        SELECT l_orderkey,
               max(CAST(round(l_extendedprice * (1 - l_discount) * 100,
                              0) AS BIGINT)) AS top_c,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100,
                              0) AS BIGINT)) AS tot_c,
               count(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
        HAVING count(*) >= 2
    ),
    b AS (
        SELECT ((1000000 * top_c) // tot_c) // 100000 AS share_band,
               n_lines
        FROM per
    ),
    tot AS (SELECT count(*) AS n FROM b)
    SELECT CAST(b.share_band AS BIGINT) AS share_band,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST((10000 * sum(b.n_lines)) // count(*) AS BIGINT)
               AS mean_lines_e4,
           CAST((1000000 * count(*)) // max(t.n) AS BIGINT)
               AS share_ppm
    FROM b CROSS JOIN tot t
    GROUP BY b.share_band
    """,
    doc="Basket concentration: per multi-line order, the revenue share "
    "of its single largest line, banded in 10 % steps — a corpus of "
    "orders living in the 90 %+ band is 'one big item plus "
    "accessories' (anchor-item merchandising), an even spread is "
    "true basket shopping; changes which item a picker should stage "
    "first and what free-shipping thresholds do.  One order-grain "
    "agg; exact integer shares.",
    tags=("analytics", "behavior"),
)
def dominant_line_share_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    per = (
        li.groupBy("l_orderkey")
        .agg(
            F.max(cents).alias("top_c"),
            F.sum(cents).alias("tot_c"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .filter(F.col("n_lines") >= 2)
    )
    b = per.select(
        F.expr(
            "((1000000 * top_c) DIV tot_c) DIV 100000"
        ).alias("share_band"),
        "n_lines",
    )
    tot = b.agg(F.count(F.lit(1)).alias("n"))
    return (
        b.crossJoin(F.broadcast(tot))
        .groupBy("share_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.expr(
                "CAST((10000 * sum(n_lines)) DIV count(*) AS BIGINT)"
            ).alias("mean_lines_e4"),
            F.expr(
                "CAST((1000000 * count(*)) DIV max(n) AS BIGINT)"
            ).alias("share_ppm"),
        )
        .select(
            F.col("share_band").cast("long").alias("share_band"),
            "n_orders",
            "mean_lines_e4",
            "share_ppm",
        )
    )


# --- list vs realized unit price per brand --------------------------------------------------------


@register(
    "list_vs_realized_price_gap",
    oracle="""
    , j AS (
        SELECT p.p_brand,
               CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100,
                          0) AS BIGINT) AS realized_c,
               CAST(round(l.l_quantity, 0) AS BIGINT) AS qty,
               CAST(round(p.p_retailprice * 100, 0) AS BIGINT) AS list_c
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity >= 1
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST((100 * sum(realized_c)) // sum(qty) AS BIGINT)
               AS mean_realized_unit_e2,
           CAST((100 * sum(CAST(list_c AS HUGEINT) * qty)) // sum(qty)
               AS BIGINT) AS mean_list_unit_e2,
           CAST((1000000 * sum(realized_c))
                // sum(CAST(list_c AS HUGEINT) * qty) AS BIGINT)
               AS realization_ppm
    FROM j GROUP BY p_brand
    """,
    doc="Price realization per brand: quantity-weighted realized unit "
    "price (post-discount) against the catalog list price — "
    "realization_ppm is the share of list value actually collected, "
    "the discipline number behind discount_cost_by_year at brand "
    "grain (a brand realizing 88 % while peers hold 95 % is leaking "
    "margin through discounting, not price).  Exact integer cents "
    "with HUGEINT/DECIMAL weighted list mass; one broadcast dim "
    "join, one agg.",
    tags=("analytics", "pricing"),
)
def list_vs_realized_price_gap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= 1
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    j = li.join(
        (part), li["l_partkey"] == F.col("p_partkey")
    ).select(
        "p_brand",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
            0,
        )
        .cast("long")
        .alias("realized_c"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("qty"),
        F.round(F.col("p_retailprice") * 100, 0)
        .cast("long")
        .alias("list_c"),
    )
    # r08 (at-scale correctness, the VERDICT item 8 class): the cents
    # sums grow with the fact table, and 1e6 * sum overflows int64 at
    # the 100x replica (witnessed by the stress sweep under ANSI) —
    # compute the rationals in DECIMAL(38,0) like the oracle's HUGEINT;
    # the compared surfaces stay BIGINT via the outer casts
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.expr(
            "CAST((100 * sum(CAST(realized_c AS DECIMAL(38,0))))"
            " DIV sum(CAST(qty AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("mean_realized_unit_e2"),
        F.expr(
            "CAST((100 * sum(CAST(list_c AS DECIMAL(38,0)) * qty))"
            " DIV sum(CAST(qty AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("mean_list_unit_e2"),
        F.expr(
            "CAST((1000000 * sum(CAST(realized_c AS DECIMAL(38,0))))"
            " DIV sum(CAST(list_c AS DECIMAL(38,0)) * qty) AS BIGINT)"
        ).alias("realization_ppm"),
    )


# --- quarterly revenue with QoQ and YoY growth ------------------------------------------------------


@register(
    "quarterly_growth_qoq_yoy",
    oracle="""
    , q AS (
        SELECT CAST(extract(year FROM l_shipdate) AS BIGINT) * 4
               + CAST((extract(month FROM l_shipdate) - 1) // 3
                   AS BIGINT) AS qi,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100,
                              0) AS BIGINT)) AS rev
        FROM lineitem GROUP BY 1
    )
    SELECT a.qi // 4 AS year,
           a.qi % 4 + 1 AS quarter,
           CAST(a.rev AS BIGINT) AS revenue_cents,
           CAST((1000000 * a.rev) // p.rev - 1000000 AS BIGINT)
               AS qoq_growth_ppm,
           CAST((1000000 * a.rev) // y.rev - 1000000 AS BIGINT)
               AS yoy_growth_ppm
    FROM q a
    JOIN q p ON p.qi = a.qi - 1
    JOIN q y ON y.qi = a.qi - 4
    """,
    doc="The CFO's two growth numbers on one row: quarterly shipped "
    "revenue with quarter-over-quarter AND year-over-year growth — "
    "QoQ tells momentum but is seasonality-polluted; YoY removes "
    "seasonality but lags; reading them together separates trend "
    "from season without any decomposition model "
    "(volume_decomposition_shares does the model version).  "
    "Quarters index as year*4+q so adjacency is integer arithmetic; "
    "lags via self equi-joins on the quarter index — no window, no "
    "calendar table; exact cents.",
    tags=("analytics", "finance"),
)
def quarterly_growth_qoq_yoy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    q = li.groupBy(
        (
            F.year("l_shipdate").cast("long") * 4
            + ((F.month("l_shipdate") - 1) / 3).cast("long")
        ).alias("qi")
    ).agg(F.sum(cents).alias("rev"))
    p = q.select((F.col("qi") + 1).alias("qi"), F.col("rev").alias("prev"))
    y = q.select((F.col("qi") + 4).alias("qi"), F.col("rev").alias("yrev"))
    return (
        q.join(p, "qi")
        .join(y, "qi")
        .select(
            F.expr("qi DIV 4").alias("year"),
            F.expr("qi % 4 + 1").alias("quarter"),
            F.col("rev").alias("revenue_cents"),
            F.expr(
                "CAST((1000000 * rev) DIV prev - 1000000 AS BIGINT)"
            ).alias("qoq_growth_ppm"),
            F.expr(
                "CAST((1000000 * rev) DIV yrev - 1000000 AS BIGINT)"
            ).alias("yoy_growth_ppm"),
        )
    )


# --- shipping latency by supplier nation ------------------------------------------------------------


@register(
    "ship_latency_by_supplier_nation",
    oracle="""
    , lt AS (
        SELECT n.n_name,
               greatest(epoch_us(l.l_shipdate) // 86400000000
                        - epoch_us(o.o_orderdate) // 86400000000, 0)
                   AS days,
               l.l_orderkey, l.l_linenumber
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
    ),
    r AS (
        SELECT n_name, days,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY days, l_orderkey,
                                           l_linenumber) AS rn,
               count(*) OVER (PARTITION BY n_name) AS n
        FROM lt
    )
    SELECT n_name,
           CAST(max(n) AS BIGINT) AS n_lines,
           CAST(max(CASE WHEN rn = (n + 1) // 2 THEN days END)
               AS BIGINT) AS p50_days,
           CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN days END)
               AS BIGINT) AS p90_days,
           CAST((10000 * sum(days)) // max(n) AS BIGINT)
               AS mean_days_e4
    FROM r GROUP BY n_name
    """,
    doc="Fulfillment latency by supplier nation: exact nearest-rank "
    "P50/P90 (plus fixed-point mean) of order-to-ship days per "
    "nation — the customs/logistics geography that "
    "latency_by_priority_percentiles cuts by priority and "
    "supplier_latency_consistency cuts by supplier; nation is the "
    "grain procurement can actually re-route around.  One fact-fact "
    "join + broadcast dims, nation-partitioned rank with total "
    "order.",
    tags=("analytics", "ops"),
)
def ship_latency_by_supplier_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    lt = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(sup, li["l_suppkey"] == F.col("s_suppkey"))
        .join(
            F.broadcast(nat),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            F.expr(
                "greatest(unix_micros(l_shipdate) DIV 86400000000"
                " - unix_micros(o_orderdate) DIV 86400000000, 0)"
            ).alias("days"),
            "l_orderkey",
            "l_linenumber",
        )
    )
    wr = W.partitionBy("n_name").orderBy(
        "days", "l_orderkey", "l_linenumber"
    )
    wn = W.partitionBy("n_name")
    r = lt.select(
        "n_name",
        "days",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.groupBy("n_name").agg(
        F.max("n").cast("long").alias("n_lines"),
        F.max(
            F.when(F.expr("rn = (n + 1) DIV 2"), F.col("days"))
        ).cast("long").alias("p50_days"),
        F.max(
            F.when(F.expr("rn = (9 * n + 9) DIV 10"), F.col("days"))
        ).cast("long").alias("p90_days"),
        F.expr(
            "CAST((10000 * sum(days)) DIV max(n) AS BIGINT)"
        ).alias("mean_days_e4"),
    )


# --- price variance explained by part type ----------------------------------------------------------


@register(
    "price_variance_explained_by_type",
    oracle="""
    , p AS (
        SELECT p_type,
               CAST(round(p_retailprice * 100, 0) AS BIGINT) AS c
        FROM part
    ),
    per AS (
        SELECT p_type, count(*) AS n, sum(c) AS s,
               sum(CAST(c AS HUGEINT) * c) AS ss
        FROM p GROUP BY p_type
    ),
    tot AS (
        SELECT count(*) AS n_types,
               sum(n) AS n,
               sum(s) AS s,
               sum(ss) AS ss,
               sum((CAST(s AS HUGEINT) * s * 10000) // n) AS sb_e4
        FROM per
    )
    SELECT CAST(n_types AS BIGINT) AS n_types,
           CAST(n AS BIGINT) AS n_parts,
           CAST((1000000 * (sb_e4 - (CAST(s AS HUGEINT) * s * 10000)
                                    // n))
                // (10000 * ss - (CAST(s AS HUGEINT) * s * 10000) // n)
               AS BIGINT) AS r2_ppm
    FROM tot
    """,
    doc="Does part type explain price?  One-way ANOVA R² of retail "
    "price on p_type in exact e4 fixed-point integer arithmetic "
    "(between-type sum of squares over total, both via "
    "Σ(Sᵢ²·10⁴ DIV nᵢ) — no float sums anywhere) — near-zero means "
    "type is cosmetic for pricing and size/brand carry the signal "
    "(size_price_slope_by_type / brand_price_premium test those); "
    "the same pooled-ANOVA shape as label_separability_r2, on the "
    "catalog dimension.  Two tiny aggs.",
    tags=("analytics", "pricing", "stats"),
)
def price_variance_explained_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_type",
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("c"),
    )
    per = p.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias(
            "ss"
        ),
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        F.sum(
            F.expr(
                "(CAST(s AS DECIMAL(38,0)) * s * 10000) DIV n"
            ).cast("decimal(38,0)")
        ).alias("sb_e4"),
    )
    return tot.select(
        F.col("n_types").cast("long").alias("n_types"),
        F.col("n").cast("long").alias("n_parts"),
        F.expr(
            "CAST((1000000 * (sb_e4 - (CAST(s AS DECIMAL(38,0)) * s"
            " * 10000) DIV n))"
            " DIV (10000 * ss - (CAST(s AS DECIMAL(38,0)) * s * 10000)"
            " DIV n) AS BIGINT)"
        ).alias("r2_ppm"),
    )


# --- uniform-discount orders screen ------------------------------------------------------------------


@register(
    "uniform_discount_orders",
    oracle="""
    , per AS (
        SELECT l_orderkey,
               count(*) AS n_lines,
               min(CAST(round(l_discount * 100, 0) AS BIGINT)) AS dmin,
               max(CAST(round(l_discount * 100, 0) AS BIGINT)) AS dmax
        FROM lineitem GROUP BY l_orderkey
        HAVING count(*) >= 3
    ),
    lab AS (
        SELECT n_lines,
               CASE WHEN dmin = dmax THEN 1 ELSE 0 END AS uniform,
               CASE WHEN dmin = dmax AND dmin >= 8 THEN 1 ELSE 0 END
                   AS uniform_high
        FROM per
    )
    SELECT n_lines,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(uniform) AS BIGINT) AS n_uniform,
           CAST(sum(uniform_high) AS BIGINT) AS n_uniform_high,
           CAST((1000000 * sum(uniform)) // count(*) AS BIGINT)
               AS uniform_ppm
    FROM lab GROUP BY n_lines
    """,
    doc="Discount-stacking screen: among orders with ≥3 lines, how "
    "many carry the SAME discount on every line (and the same at "
    "8 %+) — line discounts drawn independently almost never agree "
    "across 3+ lines, so a high uniform rate at high discount is "
    "the signature of manual override or a coupon code applied "
    "order-wide where policy says per-line (the pricing-governance "
    "cousin of suspected_duplicate_orders).  Discount is exact "
    "integer percent; one order-grain agg.",
    tags=("analytics", "dq", "pricing"),
)
def uniform_discount_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = F.round(F.col("l_discount") * 100, 0).cast("long")
    per = (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min(d).alias("dmin"),
            F.max(d).alias("dmax"),
        )
        .filter(F.col("n_lines") >= 3)
    )
    lab = per.select(
        "n_lines",
        F.when(F.col("dmin") == F.col("dmax"), 1).otherwise(0).alias(
            "uniform"
        ),
        F.when(
            (F.col("dmin") == F.col("dmax")) & (F.col("dmin") >= 8), 1
        )
        .otherwise(0)
        .alias("uniform_high"),
    )
    return lab.groupBy("n_lines").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("uniform").cast("long").alias("n_uniform"),
        F.sum("uniform_high").cast("long").alias("n_uniform_high"),
        F.expr(
            "CAST((1000000 * sum(uniform)) DIV count(*) AS BIGINT)"
        ).alias("uniform_ppm"),
    ).select(
        F.col("n_lines").cast("long").alias("n_lines"),
        "n_orders",
        "n_uniform",
        "n_uniform_high",
        "uniform_ppm",
    )


# --- SLA attainment sweep by priority ----------------------------------------------------------------


@register(
    "sla_attainment_by_priority",
    oracle="""
    , lt AS (
        SELECT o.o_orderpriority,
               greatest(epoch_us(l.l_shipdate) // 86400000000
                        - epoch_us(o.o_orderdate) // 86400000000, 0)
                   AS days
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    sweep AS (SELECT unnest([30, 60, 90]) AS sla_days)
    SELECT lt.o_orderpriority, s.sla_days,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN lt.days <= s.sla_days THEN 1 ELSE 0 END)
               AS BIGINT) AS n_within,
           CAST((1000000 * sum(CASE WHEN lt.days <= s.sla_days
                                    THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS attainment_ppm
    FROM lt CROSS JOIN sweep s
    GROUP BY lt.o_orderpriority, s.sla_days
    """,
    doc="SLA attainment table: share of line shipments within "
    "30/60/90 days of order date, per priority class — the "
    "contract-facing number (percentiles answer 'how slow', "
    "attainment answers 'what % met the promise', and pricing tiers "
    "quote the latter).  Reading attainment flat across priorities "
    "at every threshold is the strongest form of the 'priority is "
    "theater' finding.  One fact-fact join, 3x literal fan-out "
    "folded map-side; exact integers.",
    tags=("analytics", "sla"),
)
def sla_attainment_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lt = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "o_orderpriority",
        F.expr(
            "greatest(unix_micros(l_shipdate) DIV 86400000000"
            " - unix_micros(o_orderdate) DIV 86400000000, 0)"
        ).alias("days"),
    )
    sweep = spark.createDataFrame(
        [(30,), (60,), (90,)], "sla_days INT"
    )
    return (
        lt.crossJoin(F.broadcast(sweep))
        .groupBy("o_orderpriority", "sla_days")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(
                F.when(F.col("days") <= F.col("sla_days"), 1)
                .otherwise(0)
            ).cast("long").alias("n_within"),
            F.expr(
                "CAST((1000000 * sum(CASE WHEN days <= sla_days"
                " THEN 1 ELSE 0 END)) DIV count(*) AS BIGINT)"
            ).alias("attainment_ppm"),
        )
    )


# --- return rate by shipping-latency band ------------------------------------------------------------


@register(
    "return_rate_by_latency_band",
    oracle="""
    , lt AS (
        SELECT greatest(epoch_us(l.l_shipdate) // 86400000000
                        - epoch_us(o.o_orderdate) // 86400000000, 0)
                   // 15 AS lat_band,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT lat_band,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(ret) AS BIGINT) AS n_returned,
           CAST((1000000 * sum(ret)) // count(*) AS BIGINT)
               AS return_ppm
    FROM lt GROUP BY lat_band
    """,
    doc="Do slow shipments come back?  Return rate per 15-day "
    "shipping-latency band — a rising curve quantifies the revenue "
    "cost of every fulfillment delay (the causal-flavored join of "
    "the latency histograms and return_rate_wilson_rank's "
    "supplier cut).  A flat curve kills the 'expedite to reduce "
    "returns' proposal before it's funded.  One fact-fact join, "
    "exact integer day bands.",
    tags=("analytics", "ops"),
)
def return_rate_by_latency_band(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lt = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        F.expr(
            "greatest(unix_micros(l_shipdate) DIV 86400000000"
            " - unix_micros(o_orderdate) DIV 86400000000, 0) DIV 15"
        ).alias("lat_band"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias(
            "ret"
        ),
    )
    return lt.groupBy("lat_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("ret").cast("long").alias("n_returned"),
        F.expr(
            "CAST((1000000 * sum(ret)) DIV count(*) AS BIGINT)"
        ).alias("return_ppm"),
    ).select(
        F.col("lat_band").cast("long").alias("lat_band"),
        "n_lines",
        "n_returned",
        "return_ppm",
    )


# --- supplier risk scorecard --------------------------------------------------------------------------


@register(
    "supplier_risk_scorecard",
    oracle="""
    , vol AS (
        SELECT l_suppkey,
               count(*) AS n_lines,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100,
                              0) AS BIGINT)) AS rev
        FROM lineitem GROUP BY l_suppkey
    ),
    lat AS (
        SELECT l.l_suppkey,
               max(CASE WHEN rn = (9 * n + 9) // 10 THEN days END)
                   AS p90_days
        FROM (
            SELECT l_suppkey,
                   greatest(epoch_us(l_shipdate) // 86400000000
                            - epoch_us(o_orderdate) // 86400000000, 0)
                       AS days,
                   row_number() OVER (PARTITION BY l_suppkey
                                      ORDER BY greatest(
                                          epoch_us(l_shipdate)
                                          // 86400000000
                                          - epoch_us(o_orderdate)
                                          // 86400000000, 0),
                                          l_orderkey, l_linenumber)
                       AS rn,
                   count(*) OVER (PARTITION BY l_suppkey) AS n
            FROM lineitem l2
            JOIN orders o ON o.o_orderkey = l2.l_orderkey
        ) l GROUP BY l.l_suppkey
    ),
    excl AS (
        SELECT s1 AS l_suppkey, count(*) AS n_exclusive_parts
        FROM (
            SELECT l_partkey, min(l_suppkey) AS s1,
                   count(DISTINCT l_suppkey) AS ns
            FROM lineitem GROUP BY l_partkey
        ) WHERE ns = 1
        GROUP BY s1
    ),
    scored AS (
        SELECT v.l_suppkey, v.n_lines, v.rev, la.p90_days,
               coalesce(e.n_exclusive_parts, 0) AS n_exclusive_parts
        FROM vol v
        JOIN lat la ON la.l_suppkey = v.l_suppkey
        LEFT JOIN excl e ON e.l_suppkey = v.l_suppkey
    )
    SELECT l_suppkey AS s_suppkey,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(rev AS BIGINT) AS revenue_cents,
           CAST(p90_days AS BIGINT) AS p90_latency_days,
           CAST(n_exclusive_parts AS BIGINT) AS n_exclusive_parts,
           CAST(row_number() OVER (
               ORDER BY n_exclusive_parts DESC, rev DESC, l_suppkey
           ) AS BIGINT) AS risk_rank
    FROM scored
    QUALIFY risk_rank <= 20
    """,
    doc="The procurement one-pager: per supplier, shipped volume and "
    "revenue, P90 order-to-ship latency, and the count of parts "
    "they exclusively supply — ranked by (exclusive parts, revenue) "
    "so the top rows are the suppliers whose failure the network "
    "cannot absorb (single_source_risk's part view re-keyed to the "
    "supplier you'd actually call).  Composite of three "
    "supplier-grain aggregates joined at dimension size; exact "
    "integers, total-ordered ranking.",
    tags=("analytics", "risk", "ops"),
)
def supplier_risk_scorecard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    vol = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"), F.sum(cents).alias("rev")
    )
    days = F.expr(
        "greatest(unix_micros(l_shipdate) DIV 86400000000"
        " - unix_micros(o_orderdate) DIV 86400000000, 0)"
    )
    lt = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "l_suppkey", days.alias("days"), "l_orderkey", "l_linenumber"
    )
    wr = W.partitionBy("l_suppkey").orderBy(
        "days", "l_orderkey", "l_linenumber"
    )
    wn = W.partitionBy("l_suppkey")
    lat = (
        lt.select(
            "l_suppkey",
            "days",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .groupBy("l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.expr("rn = (9 * n + 9) DIV 10"), F.col("days")
                )
            ).alias("p90_days")
        )
    )
    excl = (
        li.groupBy("l_partkey")
        .agg(
            F.min("l_suppkey").alias("s1"),
            F.countDistinct("l_suppkey").alias("ns"),
        )
        .filter(F.col("ns") == 1)
        .groupBy(F.col("s1").alias("l_suppkey"))
        .agg(F.count(F.lit(1)).alias("n_exclusive_parts"))
    )
    scored = (
        vol.join(lat, "l_suppkey")
        .join(excl, "l_suppkey", "left")
        .select(
            "l_suppkey",
            "n_lines",
            "rev",
            "p90_days",
            F.coalesce(F.col("n_exclusive_parts"), F.lit(0)).alias(
                "n_exclusive_parts"
            ),
        )
    )
    # top-20 via distributed top-k on the total order, then rank only
    # the survivors — no global row_number over the SCALING supplier
    # dimension
    return (
        scored.orderBy(
            F.desc("n_exclusive_parts"), F.desc("rev"), "l_suppkey"
        )
        .limit(20)
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("rev").alias("revenue_cents"),
            F.col("p90_days").cast("long").alias("p90_latency_days"),
            F.col("n_exclusive_parts").cast("long").alias(
                "n_exclusive_parts"
            ),
            F.row_number()
            .over(
                W.orderBy(
                    F.desc("n_exclusive_parts"), F.desc("rev"),
                    "l_suppkey",
                )
            )
            .cast("long")
            .alias("risk_rank"),
        )
    )


# --- revenue shipped within the order's first week -----------------------------------------------------


@register(
    "early_fulfillment_revenue_share",
    oracle="""
    , lt AS (
        SELECT o.o_orderpriority,
               CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100,
                          0) AS BIGINT) AS cents,
               CASE WHEN epoch_us(l.l_shipdate) // 86400000000
                         - epoch_us(o.o_orderdate) // 86400000000 <= 7
                    THEN 1 ELSE 0 END AS early
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(sum(early * cents) AS BIGINT) AS early_cents,
           CAST((1000000 * sum(early * cents)) // sum(cents)
               AS BIGINT) AS early_share_ppm
    FROM lt GROUP BY o_orderpriority
    """,
    doc="Cash-conversion speed: the share of line revenue shipped "
    "within 7 days of order date, per priority — revenue-weighted "
    "where the SLA views (sla_attainment_by_priority) are line-"
    "weighted, because a priority class can hit 90 % line "
    "attainment while its big-ticket lines all ship late.  Exact "
    "cents; one fact-fact join, one fold.",
    tags=("analytics", "finance", "ops"),
)
def early_fulfillment_revenue_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lt = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "o_orderpriority",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
            0,
        )
        .cast("long")
        .alias("cents"),
        F.when(
            F.expr(
                "unix_micros(l_shipdate) DIV 86400000000"
                " - unix_micros(o_orderdate) DIV 86400000000"
            )
            <= 7,
            1,
        )
        .otherwise(0)
        .alias("early"),
    )
    return lt.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.col("early") * F.col("cents")).alias("early_cents"),
        F.expr(
            "CAST((1000000 * sum(early * cents)) DIV sum(cents)"
            " AS BIGINT)"
        ).alias("early_share_ppm"),
    )


# --- part-type mix shift between seasons ----------------------------------------------------------------


@register(
    "type_mix_seasonal_shift",
    oracle="""
    , seas AS (
        SELECT p.p_type,
               CASE WHEN extract(month FROM l.l_shipdate)
                         IN (12, 1, 2) THEN 'winter'
                    WHEN extract(month FROM l.l_shipdate)
                         IN (6, 7, 8) THEN 'summer'
                    ELSE NULL END AS season,
               count(*) AS n
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE extract(month FROM l.l_shipdate) IN (12, 1, 2, 6, 7, 8)
        GROUP BY 1, 2
    ),
    tot AS (SELECT season, sum(n) AS t FROM seas GROUP BY season),
    w AS (
        SELECT s.p_type, s.n AS n_w, t.t AS t_w
        FROM seas s JOIN tot t USING (season)
        WHERE s.season = 'winter'
    ),
    m AS (
        SELECT s.p_type, s.n AS n_s, t.t AS t_s
        FROM seas s JOIN tot t USING (season)
        WHERE s.season = 'summer'
    )
    SELECT coalesce(w.p_type, m.p_type) AS p_type,
           CAST(coalesce(w.n_w, 0) AS BIGINT) AS winter_lines,
           CAST(coalesce(m.n_s, 0) AS BIGINT) AS summer_lines,
           CAST((1000000 * coalesce(w.n_w, 0))
                // coalesce(w.t_w, 1)
                - (1000000 * coalesce(m.n_s, 0))
                  // coalesce(m.t_s, 1) AS BIGINT)
               AS winter_minus_summer_share_ppm
    FROM w FULL OUTER JOIN m ON m.p_type = w.p_type
    """,
    doc="Seasonal product-mix contrast: each part type's share of "
    "winter (Dec-Feb) vs summer (Jun-Aug) line volume and the "
    "signed share gap — which SKU families actually swing with the "
    "calendar (the mix view under seasonal_index_monthly's "
    "aggregate seasonality), sized for inventory pre-positioning.  "
    "FULL OUTER join keeps types absent from one season; exact "
    "integer shares.",
    tags=("analytics", "seasonality"),
)
def type_mix_seasonal_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_type"
    )
    m = F.month("l_shipdate")
    seas = (
        li.join(part, li["l_partkey"] == F.col("p_partkey"))
        .filter(m.isin(12, 1, 2, 6, 7, 8))
        .groupBy(
            "p_type",
            F.when(m.isin(12, 1, 2), "winter")
            .otherwise("summer")
            .alias("season"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        # type x season contingency read by the totals and both season
        # arms — materialize once so the fact join runs once, not 3x
        .transform(snapshot, eager=True)
    )
    tot = seas.groupBy("season").agg(F.sum("n").alias("t"))
    j = seas.join(F.broadcast(tot), "season").transform(snapshot, eager=True)
    w = j.filter(F.col("season") == "winter").select(
        F.col("p_type").alias("tw"),
        F.col("n").alias("n_w"),
        F.col("t").alias("t_w"),
    )
    s = j.filter(F.col("season") == "summer").select(
        F.col("p_type").alias("ts"),
        F.col("n").alias("n_s"),
        F.col("t").alias("t_s"),
    )
    return w.join(s, w["tw"] == s["ts"], "full").select(
        F.coalesce(F.col("tw"), F.col("ts")).alias("p_type"),
        F.coalesce(F.col("n_w"), F.lit(0))
        .cast("long")
        .alias("winter_lines"),
        F.coalesce(F.col("n_s"), F.lit(0))
        .cast("long")
        .alias("summer_lines"),
        F.expr(
            "CAST((1000000 * coalesce(n_w, 0)) DIV coalesce(t_w, 1)"
            " - (1000000 * coalesce(n_s, 0)) DIV coalesce(t_s, 1)"
            " AS BIGINT)"
        ).alias("winter_minus_summer_share_ppm"),
    )


# --- catalog-level price vs demand correlation -----------------------------------------------------------


@register(
    "price_vs_demand_across_parts",
    oracle="""
    , d AS (
        SELECT l_partkey, count(*) AS n_lines,
               sum(CAST(round(l_quantity, 0) AS BIGINT)) AS qty
        FROM lineitem GROUP BY l_partkey
    ),
    pts AS (
        SELECT CAST(round(p.p_retailprice * 100, 0) AS BIGINT) AS x,
               coalesce(d.qty, 0) AS y
        FROM part p LEFT JOIN d ON d.l_partkey = p.p_partkey
    ),
    s AS (
        SELECT count(*) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy
        FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_parts,
           CAST((10000 * sy) // n AS BIGINT) AS mean_qty_e4,
           CAST(floor(
               (CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                  / CAST(n AS DOUBLE))
               / sqrt((CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                         / CAST(n AS DOUBLE))
                      * (CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                           / CAST(n AS DOUBLE)))
               * 1000000) AS BIGINT) AS r_e6
    FROM s
    """,
    doc="Cross-sectional demand curve: correlation across the catalog "
    "between a part's list price and its total ordered quantity "
    "(never-ordered parts included at zero via LEFT JOIN) — the "
    "static complement of discount_elasticity_by_brand's "
    "within-transaction slope; near-zero r says TPC-H-like demand "
    "ignores price and any price-optimization pitch needs real "
    "behavioral data.  Exact HUGEINT/DECIMAL sufficient stats, "
    "CAST-AS-DOUBLE floor-e6.",
    tags=("analytics", "pricing", "stats"),
)
def price_vs_demand_across_parts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice"
    )
    d = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias(
            "qty"
        )
    )
    pts = part.join(
        d, part["p_partkey"] == d["l_partkey"], "left"
    ).select(
        F.round(F.col("p_retailprice") * 100, 0)
        .cast("long")
        .alias("x"),
        F.coalesce(F.col("qty"), F.lit(0)).alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias(
            "sxy"
        ),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias(
            "sxx"
        ),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias(
            "syy"
        ),
    )
    return s.select(
        F.col("n").cast("long").alias("n_parts"),
        F.expr("CAST((10000 * sy) DIV n AS BIGINT)").alias(
            "mean_qty_e4"
        ),
        F.expr(
            "CAST(floor("
            "(CAST(sxy AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
            "   / CAST(n AS DOUBLE))"
            " / sqrt((CAST(sxx AS DOUBLE)"
            "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
            "           / CAST(n AS DOUBLE))"
            "        * (CAST(syy AS DOUBLE)"
            "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
            "             / CAST(n AS DOUBLE)))"
            " * 1000000) AS BIGINT)"
        ).alias("r_e6"),
    )


# --- quantity uniformity chi-square ------------------------------------------------------------------


@register(
    "quantity_uniformity_chi2",
    oracle="""
    , o AS (
        SELECT CAST(round(l_quantity, 0) AS BIGINT) AS q,
               count(*) AS o
        FROM lineitem GROUP BY 1
    ),
    n AS (SELECT sum(o) AS n, count(*) AS k FROM o),
    terms AS (
        SELECT (CAST(o.o * n.k - n.n AS HUGEINT)
                * (o.o * n.k - n.n) * 10000)
               // (CAST(n.n AS HUGEINT) * n.k) AS term_e4
        FROM o CROSS JOIN n
    )
    SELECT CAST((SELECT k FROM n) AS BIGINT) AS n_levels,
           CAST((SELECT n FROM n) AS BIGINT) AS n_lines,
           CAST(sum(term_e4) // (SELECT k FROM n) AS BIGINT)
               AS chi2_e4,
           CAST((SELECT k FROM n) - 1 AS BIGINT) AS dof
    FROM terms
    """,
    doc="Is line quantity drawn uniformly?  Chi-square "
    "goodness-of-fit of the observed quantity histogram against the "
    "uniform distribution over the observed levels — TPC-H "
    "generators are uniform by spec, so a significant deviation "
    "means the ingest dropped or duplicated rows non-uniformly "
    "(same exact term-wise integer fixed-point construction as "
    "discount_tax_independence_chi2: ((o·k − n)²·10⁴) DIV (n·k), "
    "integer-summed — no float sum anywhere).  One tiny agg.",
    tags=("analytics", "dq", "stats"),
)
def quantity_uniformity_chi2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = li.groupBy(
        F.round(F.col("l_quantity"), 0).cast("long").alias("q")
    ).agg(F.count(F.lit(1)).alias("o"))
    n = o.agg(F.sum("o").alias("n"), F.count(F.lit(1)).alias("k"))
    terms = o.crossJoin(F.broadcast(n)).select(
        F.expr(
            "(CAST(o * k - n AS DECIMAL(38,0)) * (o * k - n) * 10000)"
            " DIV (CAST(n AS DECIMAL(38,0)) * k)"
        ).alias("term_e4"),
        "n",
        "k",
    )
    return terms.agg(
        F.max("k").cast("long").alias("n_levels"),
        F.max("n").cast("long").alias("n_lines"),
        F.expr("CAST(sum(term_e4) DIV max(k) AS BIGINT)").alias(
            "chi2_e4"
        ),
        (F.max("k") - 1).cast("long").alias("dof"),
    )


# --- brand competition density per part type ---------------------------------------------------------


@register(
    "brand_competition_by_type",
    oracle="""
    , tb AS (
        SELECT p_type, p_brand, count(*) AS n
        FROM part GROUP BY p_type, p_brand
    ),
    s AS (
        SELECT p_type,
               count(*) AS n_brands,
               sum(n) AS n_parts,
               sum(n * (n - 1)) AS coll,
               max(n) AS top_n
        FROM tb GROUP BY p_type
    )
    SELECT p_type,
           CAST(n_brands AS BIGINT) AS n_brands,
           CAST(n_parts AS BIGINT) AS n_parts,
           CAST((10000 * n_parts * (n_parts - 1))
                // greatest(coll, 1) AS BIGINT)
               AS effective_brands_e4,
           CAST((1000000 * top_n) // n_parts AS BIGINT)
               AS top_brand_share_ppm
    FROM s
    """,
    doc="Competitive density per part type: raw and inverse-Simpson "
    "effective brand counts within each type — a type whose 20 "
    "listed brands are effectively 2 is a duopoly shelf where "
    "substitution (part_substitution_candidates) and price pressure "
    "behave completely differently than the brand count implies; "
    "the assortment mirror of brand_type_specialization.  Catalog-"
    "dimension-only collision arithmetic.",
    tags=("analytics", "catalog"),
)
def brand_competition_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    tb = part.groupBy("p_type", "p_brand").agg(
        F.count(F.lit(1)).alias("n")
    )
    s = tb.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_brands"),
        F.sum("n").alias("n_parts"),
        F.sum(F.col("n") * (F.col("n") - 1)).alias("coll"),
        F.max("n").alias("top_n"),
    )
    return s.select(
        "p_type",
        F.col("n_brands").cast("long").alias("n_brands"),
        F.col("n_parts").cast("long").alias("n_parts"),
        F.expr(
            "CAST((10000 * n_parts * (n_parts - 1))"
            " DIV greatest(coll, 1) AS BIGINT)"
        ).alias("effective_brands_e4"),
        F.expr(
            "CAST((1000000 * top_n) DIV n_parts AS BIGINT)"
        ).alias("top_brand_share_ppm"),
    )


# --- first-time buyer share per month ---------------------------------------------------------------


@register(
    "new_customer_share_monthly",
    oracle="""
    , f AS (
        SELECT o_custkey, min(o_orderdate) AS first_d
        FROM orders GROUP BY o_custkey
    ),
    m AS (
        SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP)
                   AS month,
               CASE WHEN date_trunc('month', o.o_orderdate)
                         = date_trunc('month', f.first_d)
                    THEN 1 ELSE 0 END AS is_new
        FROM orders o JOIN f ON f.o_custkey = o.o_custkey
    )
    SELECT month,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(is_new) AS BIGINT) AS n_first_month_orders,
           CAST((1000000 * sum(is_new)) // count(*) AS BIGINT)
               AS new_share_ppm
    FROM m GROUP BY month
    """,
    doc="Acquisition dependence on the order book: per calendar month, "
    "the share of orders placed by customers in their FIRST month "
    "ever — the demand-side twin of new_user_activity_share_weekly; "
    "a business whose order volume is mostly first-month customers "
    "is churning through its market.  First-order month via one "
    "customer-grain agg broadcast back; exact integers.",
    tags=("analytics", "retention"),
)
def new_customer_share_monthly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_d")
    )
    m = orders.join(F.broadcast(f), "o_custkey").select(
        F.date_trunc("month", "o_orderdate").alias("month"),
        F.when(
            F.date_trunc("month", "o_orderdate")
            == F.date_trunc("month", "first_d"),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    return m.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("is_new").cast("long").alias("n_first_month_orders"),
        F.expr(
            "CAST((1000000 * sum(is_new)) DIV count(*) AS BIGINT)"
        ).alias("new_share_ppm"),
    )


# --- urgent revenue share trend ---------------------------------------------------------------------


@register(
    "priority_revenue_trend",
    oracle="""
    , y AS (
        SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS y,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                   AS total_c,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN CAST(round(o_totalprice * 100, 0)
                                  AS BIGINT) ELSE 0 END) AS urgent_c
        FROM orders GROUP BY 1
    )
    SELECT y AS order_year,
           CAST(total_c AS BIGINT) AS total_cents,
           CAST(urgent_c AS BIGINT) AS urgent_cents,
           CAST((1000000 * urgent_c) // total_c AS BIGINT)
               AS urgent_share_ppm
    FROM y
    """,
    doc="Expedite-mix drift: the share of order VALUE carried by "
    "urgent/high priorities per year — a rising curve is margin "
    "pressure building in fulfillment (expedites cost more to "
    "serve) before latency metrics move; the temporal axis that "
    "priority_mix_by_status (status cut) and priority_by_order_rank "
    "(lifecycle cut) don't cover.  Exact cents, one agg.",
    tags=("analytics", "finance"),
)
def priority_revenue_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    y = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("y")
    ).agg(
        F.sum(cents).alias("total_c"),
        F.sum(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
                cents,
            ).otherwise(0)
        ).alias("urgent_c"),
    )
    return y.select(
        F.col("y").alias("order_year"),
        F.col("total_c").alias("total_cents"),
        F.col("urgent_c").alias("urgent_cents"),
        F.expr(
            "CAST((1000000 * urgent_c) DIV total_c AS BIGINT)"
        ).alias("urgent_share_ppm"),
    )


# --- geographic concentration per market segment ------------------------------------------------------


@register(
    "segment_geo_concentration",
    oracle="""
    , sn AS (
        SELECT c_mktsegment, c_nationkey, count(*) AS n
        FROM customer GROUP BY c_mktsegment, c_nationkey
    ),
    s AS (
        SELECT c_mktsegment,
               sum(n) AS total,
               count(*) AS n_nations,
               sum(CAST(n AS HUGEINT) * (n - 1)) AS coll,
               max(n) AS top_n
        FROM sn GROUP BY c_mktsegment
    )
    SELECT c_mktsegment,
           CAST(total AS BIGINT) AS n_customers,
           CAST(n_nations AS BIGINT) AS n_nations,
           CAST((10000 * CAST(total AS HUGEINT) * (total - 1))
                // greatest(coll, 1) AS BIGINT)
               AS effective_nations_e4,
           CAST((1000000 * top_n) // total AS BIGINT)
               AS top_nation_share_ppm
    FROM s
    """,
    doc="Is any segment geographically captive?  Effective number of "
    "nations (inverse Simpson) per market segment's customer base — "
    "a segment living in 3 effective nations is exposed to regional "
    "shocks and regulation in a way its 25-nation listing hides; "
    "the demand-side geography under cube_region_segment's revenue "
    "grid.  Customer-dimension-only collision arithmetic.",
    tags=("analytics", "risk"),
)
def segment_geo_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    sn = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    s = sn.groupBy("c_mktsegment").agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_nations"),
        F.sum(
            F.col("n").cast("decimal(38,0)") * (F.col("n") - 1)
        ).alias("coll"),
        F.max("n").alias("top_n"),
    )
    return s.select(
        "c_mktsegment",
        F.col("total").cast("long").alias("n_customers"),
        F.col("n_nations").cast("long").alias("n_nations"),
        F.expr(
            "CAST((10000 * CAST(total AS DECIMAL(38,0))"
            " * (total - 1)) DIV greatest(coll, 1) AS BIGINT)"
        ).alias("effective_nations_e4"),
        F.expr(
            "CAST((1000000 * top_n) DIV total AS BIGINT)"
        ).alias("top_nation_share_ppm"),
    )


# --- SKU-level repurchase rate --------------------------------------------------------------------------


@register(
    "part_repurchase_rate",
    oracle="""
    , cp AS (
        SELECT o.o_custkey, l.l_partkey,
               count(DISTINCT l.l_orderkey) AS n_orders
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_custkey, l.l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cust_part_pairs,
           CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_repurchased,
           CAST((1000000 * sum(CASE WHEN n_orders >= 2
                                    THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS repurchase_ppm,
           CAST(max(n_orders) AS BIGINT) AS max_orders_same_part
    FROM cp
    """,
    doc="SKU loyalty: of all (customer, part) relationships, the "
    "share where the same customer ordered the same part in two or "
    "more DISTINCT orders — the consumable-vs-durable signature "
    "that decides whether replenishment reminders "
    "(reorder_interval_histogram sets their timing) have anything "
    "to remind about.  One fact-fact join grouped at the "
    "relationship grain; exact integers.",
    tags=("analytics", "behavior"),
)
def part_repurchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cp = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey", "l_partkey")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
    )
    return cp.agg(
        F.count(F.lit(1)).cast("long").alias("n_cust_part_pairs"),
        F.sum(
            F.when(F.col("n_orders") >= 2, 1).otherwise(0)
        ).cast("long").alias("n_repurchased"),
        F.expr(
            "CAST((1000000 * sum(CASE WHEN n_orders >= 2 THEN 1"
            " ELSE 0 END)) DIV count(*) AS BIGINT)"
        ).alias("repurchase_ppm"),
        F.max("n_orders").cast("long").alias("max_orders_same_part"),
    )


# --- active-quarters histogram ----------------------------------------------------------------------


@register(
    "active_quarters_histogram",
    oracle="""
    , per AS (
        SELECT o_custkey,
               count(DISTINCT CAST(extract(year FROM o_orderdate)
                        AS BIGINT) * 4
                     + (CAST(extract(month FROM o_orderdate)
                        AS BIGINT) - 1) // 3) AS n_quarters
        FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT count(*) AS n FROM per)
    SELECT p.n_quarters,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST((1000000 * count(*)) // max(t.n) AS BIGINT)
               AS share_ppm
    FROM per p CROSS JOIN tot t
    GROUP BY p.n_quarters
    """,
    doc="Purchase regularity at the quarter grain: how many distinct "
    "calendar quarters each customer ordered in, histogrammed — the "
    "cheap cadence census that separates always-on accounts "
    "(quarters ≈ tenure) from one-burst buyers (1-2 quarters "
    "regardless of tenure), without the window machinery of "
    "cadence_acceleration_census.  One distinct-count agg; integer "
    "quarter index.",
    tags=("analytics", "retention"),
)
def active_quarters_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    qi = (
        F.year("o_orderdate").cast("long") * 4
        + ((F.month("o_orderdate").cast("long") - 1) / 3).cast("long")
    )
    per = orders.groupBy("o_custkey").agg(
        F.countDistinct(qi).alias("n_quarters")
    )
    tot = per.agg(F.count(F.lit(1)).alias("n"))
    return (
        per.crossJoin(F.broadcast(tot))
        .groupBy("n_quarters")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.expr(
                "CAST((1000000 * count(*)) DIV max(n) AS BIGINT)"
            ).alias("share_ppm"),
        )
        .select(
            F.col("n_quarters").cast("long").alias("n_quarters"),
            "n_customers",
            "share_ppm",
        )
    )
