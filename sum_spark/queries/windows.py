"""Time-window queries Q27-Q29 (SURVEY §2.F) in their batch-declared form.

The streaming forms (Structured Streaming with watermarks) live in
``sum_spark.streaming``; these batch twins are what the DuckDB oracle can
check, and the streaming tests assert stream==batch on the same input.

All event timestamps are TIMESTAMP_NTZ (tables.load_table), so window
alignment and date_trunc are timezone-independent and line up with the
oracle's UTC-naive date_trunc/epoch arithmetic regardless of the caller's
session timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sum_spark.queries.base import query
from sum_spark.sources.tables import load_table


@query(
    "q27_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS c,
           ROUND(SUM(value), 2) AS s
    FROM events GROUP BY ws, event_type ORDER BY ws, event_type
    """,
    doc="1-hour tumbling window. Spark F.window(ts, '1 hour') starts are "
    "epoch-aligned in UTC ≡ date_trunc('hour').",
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 2).alias("s"))
        .select(F.col("w.start").alias("ws"), "event_type", "c", "s")
        .orderBy("ws", "event_type")
    )


@query(
    "q28_sliding_window",
    oracle="""
    WITH g AS (
      SELECT make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * 1000000) AS w0,
             event_type, value
      FROM events
    ),
    e AS (
      SELECT w0 AS ws, event_type, value FROM g
      UNION ALL
      SELECT w0 - INTERVAL '30 minutes' AS ws, event_type, value FROM g
    )
    SELECT 'slide' AS mode, ws, event_type, COUNT(*) AS c,
           ROUND(SUM(value), 2) AS s
    FROM e GROUP BY ws, event_type
    UNION ALL
    SELECT 'trail', ts, event_type,
           COUNT(*) OVER w,
           ROUND(SUM(value) OVER w, 2)
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY mode, ws, event_type
    """,
    doc="Sliding aggregation, both grains. 'slide' leg: 1-hour window "
    "every 30 minutes — each event lands in 2 windows; oracle = union "
    "of the two offset tumbling grids. 'trail' leg: the PER-EVENT "
    "trailing-hour aggregate (RANGE BETWEEN INTERVAL 1 HOUR PRECEDING "
    "AND CURRENT ROW over the NTZ timestamp order — a value-range "
    "window frame, a different physical operator from the groupBy "
    "grids: Spark's WindowExec with a range frame, timezone-free "
    "because the order column stays TIMESTAMP_NTZ end-to-end).",
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    slide = (
        events
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 2).alias("s"))
        .select(
            F.lit("slide").alias("mode"),
            F.col("w.start").alias("ws"), "event_type", "c", "s",
        )
    )
    over = (
        "OVER (PARTITION BY event_type ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    )
    trail = events.select(
        F.lit("trail").alias("mode"),
        F.col("ts").alias("ws"),
        "event_type",
        F.expr(f"COUNT(*) {over}").alias("c"),
        F.expr(f"ROUND(SUM(value) {over}, 2)").alias("s"),
    )
    return slide.unionByName(trail).orderBy("mode", "ws", "event_type")


@query(
    "q29_session_window",
    oracle="""
    SELECT user_id, MIN(ts) AS s, MAX(ts) AS e, COUNT(*) AS n
    FROM (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS grp
      FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         + INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS brk
        FROM events) b
    ) g
    GROUP BY user_id, grp ORDER BY user_id, s
    """,
    doc="30-minute-gap sessionization (gaps-and-islands) via the public "
    "operators/sessions.sessionize + session_bounds pair (per-event "
    "session ids, per-session bounds — one shuffle). Streaming twin: "
    "F.session_window(ts, '30 minutes') in sum_spark.streaming.",
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sum_spark.operators.sessions import session_bounds, sessionize

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    return session_bounds(sessionize(events, gap="30 minutes")).select(
        "user_id", "s", "e", "n"
    )
