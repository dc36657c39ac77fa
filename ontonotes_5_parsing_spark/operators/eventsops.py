"""Event-stream operators over the `events` table: tumbling windows,
sessionization, share-of-total — the batch forms of the streaming ops
the engine would run under Structured Streaming (`warc_ts` is the
event-time analog; SURVEY.md §2.9).

All timestamps leave the query as epoch BIGINTs so the oracle hash
never compares engine-formatted timestamps.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

SESSION_GAP_SEC = 1800


def _events(spark: SparkSession, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# --- tumbling 1-hour window aggregation -----------------------------------
def q_hourly_counts(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


SQL_HOURLY_COUNTS = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type,
       count(*)             AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


# --- sessionization: gap > 30 min starts a new session ---------------------
def q_sessionize(spark, sf_dir):
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_SEC), F.lit(1)).otherwise(F.lit(0)),
    )
    with_session = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
        )
    )


SQL_SESSIONIZE = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_SEC}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), with_session AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM with_session GROUP BY user_id, session_id
)
SELECT user_id,
       count(*)               AS n_sessions,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       max(n_events)          AS max_session_events
FROM per_session GROUP BY user_id
"""


# --- top users by value (deterministic top-k) -------------------------------
def q_top_users(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.round(F.sum("value"), 2).alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(F.desc("total_value"), "user_id")
        .limit(20)
    )


SQL_TOP_USERS = """
SELECT user_id, round(sum(value), 2) AS total_value, count(*) AS n_events
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id
LIMIT 20
"""


# --- share of total (unpartitioned window) ----------------------------------
def q_type_share(spark, sf_dir):
    ev = _events(spark, sf_dir)
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    total = Window.partitionBy()
    return counts.select(
        "event_type",
        "n_events",
        F.round(F.col("n_events") / F.sum("n_events").over(total), 6).alias("share"),
    )


SQL_TYPE_SHARE = """
WITH counts AS (
  SELECT event_type, count(*) AS n_events FROM events GROUP BY event_type
)
SELECT event_type, n_events,
       round(n_events / sum(n_events) OVER (), 6) AS share
FROM counts
"""


# --- moving average (rows frame) -------------------------------------------
def q_moving_avg(spark, sf_dir):
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg_7"),
    )


SQL_MOVING_AVG = """
SELECT user_id, event_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
         AS moving_avg_7
FROM events
"""


# --- as-of join: each purchase ↔ most recent strictly-prior click -----------
# The scale-path formulation: instead of a per-row range join (quadratic
# within user), the two streams are UNIONed, shuffled ONCE by user_id,
# sorted by (ts, kind, event_id), and the right side is carried forward
# with last_value(ignoreNulls) — an O(n log n) single-shuffle as-of join.
# kind orders purchases (0) before clicks (1) at equal ts, making the
# match strictly-prior; ties among clicks at the same ts resolve to the
# max event_id (the last in sort order), mirrored exactly in the oracle.
def q_asof_join(spark, sf_dir):
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("b_id"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(1).alias("kind"),
        F.col("event_id").alias("b_id"),
    )
    merged = purchases.unionByName(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "b_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        merged.withColumn("last_click_id", F.last("b_id", ignorenulls=True).over(w))
        .filter(F.col("kind") == 0)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "last_click_id",
        )
    )


SQL_ASOF_JOIN = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       (SELECT c.event_id
        FROM events c
        WHERE c.user_id = p.user_id
          AND c.event_type = 'click'
          AND c.ts < p.ts
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_id
FROM events p WHERE p.event_type = 'purchase'
"""


# --- range join: events banded into a value-interval dimension --------------
# The broadcast range-join pattern: the tiny interval dim broadcasts and
# the theta predicate (lo <= value < hi) evaluates map-side — no shuffle
# of the fact table at all (at 100 TB the alternative, a shuffle range
# join, only pays off when BOTH sides are large).
VALUE_BANDS = [(0.0, 10.0, "micro"), (10.0, 50.0, "small"),
               (50.0, 200.0, "medium"), (200.0, 1000.0, "large")]


def q_range_join(spark, sf_dir):
    ev = _events(spark, sf_dir)
    bands = spark.createDataFrame(VALUE_BANDS, ["lo", "hi", "band"])
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
            "left",
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


SQL_RANGE_JOIN = """
WITH bands(lo, hi, band) AS (
  VALUES (0.0, 10.0, 'micro'), (10.0, 50.0, 'small'),
         (50.0, 200.0, 'medium'), (200.0, 1000.0, 'large')
)
SELECT band, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events LEFT JOIN bands ON value >= lo AND value < hi
GROUP BY band
"""


# --- semi-structured JSON property extraction -------------------------------
# `props` is a JSON string column (the engine treats web-page metadata the
# same way); extraction stays JVM-side via get_json_object — at 100 TB a
# map-only scan, with the aggregate shuffling only (event_type) groups.
def q_json_props(spark, sf_dir):
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            # Integer-exact mean (milli-units, half-up integer division):
            # round(avg,4) hash-failed at the driver because DuckDB's
            # sum/avg intermediates are HUGEINT; pure integer arithmetic
            # at the boundary is bit-identical in both engines.
            # Sign audit (round-3 ADVICE worried DuckDB // floors while
            # Spark DIV truncates): measured, DuckDB's integer // ALSO
            # truncates toward zero (-7 // 2 = -3), so the two agree for
            # every sign — pinned by
            # test_float_boundaries.py::
            # test_integer_division_truncates_identically_both_engines.
            F.expr(
                "CAST((2000 * sum(k) + count(1)) DIV (2 * count(1)) AS BIGINT)"
            ).alias("avg_k_milli"),
        )
    )


SQL_JSON_PROPS = """
SELECT event_type,
       count(*)                                              AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS BIGINT)                                          AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST((2000 * sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
             + count(*)) // (2 * count(*)) AS BIGINT) AS avg_k_milli
FROM events GROUP BY event_type
"""


# --- day-over-day user retention --------------------------------------------
# Cohort analytics: distinct active users per day, joined to the next
# day's actives. Both sides are the same distinct-(day, user) aggregate;
# at scale this is one shuffle on user_id (the join key) over a table
# already reduced to |users|×|days| rows.
def q_daily_retention(spark, sf_dir):
    ev = _events(spark, sf_dir)
    daily = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    nxt = daily.select(
        (F.col("day") - F.expr("INTERVAL 1 DAY")).alias("day"),
        F.col("user_id").alias("r_user"),
    )
    joined = daily.alias("d").join(
        nxt.alias("n"),
        (F.col("d.day") == F.col("n.day")) & (F.col("d.user_id") == F.col("n.r_user")),
        "left",
    )
    return (
        joined.groupBy(F.unix_timestamp(F.col("d.day")).alias("day_epoch"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("r_user").alias("n_retained"),
            F.round(F.count("r_user") / F.count(F.lit(1)), 4).alias("retention"),
        )
    )


SQL_DAILY_RETENTION = """
WITH daily AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
), nxt AS (
  SELECT day - INTERVAL 1 DAY AS day, user_id AS r_user FROM daily
)
SELECT CAST(epoch(daily.day) AS BIGINT) AS day_epoch,
       count(*)                          AS n_users,
       count(r_user)                     AS n_retained,
       round(count(r_user) / count(*), 4) AS retention
FROM daily LEFT JOIN nxt ON daily.day = nxt.day AND daily.user_id = nxt.r_user
GROUP BY daily.day
"""


# --- ordered funnel (view → click → purchase) -------------------------------
# Sequence analytics: per user, the first view, the first click strictly
# after it, the first purchase strictly after that — then one row per
# funnel stage with the user count and conversion from stage 1. The
# stage milestones are conditional min-aggregations (one shuffle on
# user_id, map-side combinable); no self-joins, no window over the raw
# event stream — the shape that survives 10^12 events.
def q_funnel(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("t")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("t"))).alias("t_view")
    )
    # click/purchase milestones need the prior milestone — two more
    # conditional aggs over the same pre-shuffled grain
    joined = ev.join(per_user, "user_id")
    with_click = (
        joined.groupBy("user_id", "t_view")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("t") > F.col("t_view")),
                    F.col("t"),
                )
            ).alias("t_click")
        )
    )
    with_purchase = (
        ev.join(with_click, "user_id")
        .groupBy("user_id", "t_view", "t_click")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("t") > F.col("t_click")),
                    F.col("t"),
                )
            ).alias("t_purchase")
        )
    )
    n_view = F.count(F.when(F.col("t_view").isNotNull(), 1))
    n_click = F.count(F.when(F.col("t_click").isNotNull(), 1))
    n_purchase = F.count(F.when(F.col("t_purchase").isNotNull(), 1))
    totals = with_purchase.agg(
        n_view.alias("n_view"), n_click.alias("n_click"), n_purchase.alias("n_purchase")
    )
    stage = F.explode(
        F.array(
            F.struct(F.lit(1).alias("stage"), F.lit("view").alias("name"),
                     F.col("n_view").alias("n_users")),
            F.struct(F.lit(2).alias("stage"), F.lit("click").alias("name"),
                     F.col("n_click").alias("n_users")),
            F.struct(F.lit(3).alias("stage"), F.lit("purchase").alias("name"),
                     F.col("n_purchase").alias("n_users")),
        )
    )
    return totals.select(stage.alias("s"), "n_view").select(
        F.col("s.stage").alias("stage"),
        F.col("s.name").alias("stage_name"),
        F.col("s.n_users").alias("n_users"),
        F.round(F.col("s.n_users") / F.col("n_view"), 4).alias("conversion"),
    )


SQL_FUNNEL = """
WITH ev AS (
  SELECT user_id, event_type, CAST(epoch(ts) AS BIGINT) AS t FROM events
), v AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN t END) AS t_view
  FROM ev GROUP BY user_id
), c AS (
  SELECT ev.user_id, v.t_view,
         min(CASE WHEN event_type = 'click' AND t > t_view THEN t END) AS t_click
  FROM ev JOIN v USING (user_id) GROUP BY ev.user_id, v.t_view
), p AS (
  SELECT ev.user_id, c.t_view, c.t_click,
         min(CASE WHEN event_type = 'purchase' AND t > t_click THEN t END)
           AS t_purchase
  FROM ev JOIN c USING (user_id) GROUP BY ev.user_id, c.t_view, c.t_click
), totals AS (
  SELECT count(CASE WHEN t_view IS NOT NULL THEN 1 END)     AS n_view,
         count(CASE WHEN t_click IS NOT NULL THEN 1 END)    AS n_click,
         count(CASE WHEN t_purchase IS NOT NULL THEN 1 END) AS n_purchase
  FROM p
)
SELECT s.stage, s.stage_name, s.n_users,
       round(s.n_users / totals.n_view, 4) AS conversion
FROM totals, LATERAL (VALUES
  (1, 'view', n_view), (2, 'click', n_click), (3, 'purchase', n_purchase)
) AS s(stage, stage_name, n_users)
"""


# --- trailing-hour RANGE window ---------------------------------------------
# Event-time sliding window as a window FRAME (RANGE BETWEEN 3600
# PRECEDING), not a self-join: per event, the user's event count and
# value sum over the trailing hour. One shuffle on user_id; the frame
# scan is sort-local within each user partition.
def q_trailing_hour(spark, sf_dir):
    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("t"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_hour"),
        F.round(F.sum("value").over(w), 2).alias("value_trailing_hour"),
    )


SQL_TRAILING_HOUR = """
SELECT event_id, user_id,
       count(*) OVER w                 AS n_trailing_hour,
       round(sum(value) OVER w, 2)     AS value_trailing_hour
FROM (SELECT event_id, user_id, CAST(epoch(ts) AS BIGINT) AS t, value
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY t
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


QUERIES = {
    "win_events_moving_avg": (q_moving_avg, SQL_MOVING_AVG),
    "win_events_trailing_hour": (q_trailing_hour, SQL_TRAILING_HOUR),
    "evt_funnel": (q_funnel, SQL_FUNNEL),
    "evt_json_props": (q_json_props, SQL_JSON_PROPS),
    "evt_daily_retention": (q_daily_retention, SQL_DAILY_RETENTION),
    "evt_asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "evt_range_join": (q_range_join, SQL_RANGE_JOIN),
    "evt_hourly_counts": (q_hourly_counts, SQL_HOURLY_COUNTS),
    "evt_sessionize": (q_sessionize, SQL_SESSIONIZE),
    "evt_top_users": (q_top_users, SQL_TOP_USERS),
    "evt_type_share": (q_type_share, SQL_TYPE_SHARE),
}
