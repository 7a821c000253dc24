"""Event-time window operators — batch semantics of the streaming superset
(SURVEY §2.12: the reference has NO streaming runtime; these are the
Spark-native operators exposed over the events table, with identical
Structured Streaming forms in ndl_core_data_pipeline_spark.streaming).

Batch and streaming share the same window()/session_window() expressions,
so the oracle-checked batch results here certify the streaming plans too.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load
from ._util import dsum, sql_dsum


def tumbling_window(spark, sf_dir):
    """Tumbling 1-hour event-time window aggregation (epoch-aligned — same
    boundaries as date_trunc('hour'))."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), dsum(F.col("value"), "sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window(spark, sf_dir):
    """Sliding window: 1-hour length, 30-minute hop — each event lands in
    two windows; Spark's window() generates the assignment without a join."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum(F.col("value"), "sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_window_per_user(spark, sf_dir):
    """Session window with 30-minute gap per user (the streaming-native form
    of W4 sessionization; ref analog: hansard conversation grouping,
    parser.py:203-252). Spark merges events whose gap < 30 min."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


def watermark_dedup_projection(spark, sf_dir):
    """Streaming dropDuplicates analog: distinct on the dedup key set
    (in streaming this is dropDuplicates + watermark state eviction)."""
    ev = load(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct()


def register(reg):
    reg.add(
        "events_tumbling_window",
        tumbling_window,
        "SELECT date_trunc('hour', ts) AS window_start, event_type, "
        "COUNT(*) AS n_events, " + sql_dsum("value") + " AS sum_value "
        "FROM events GROUP BY 1, 2",
    )
    reg.add(
        "events_sliding_window",
        sliding_window,
        # each event belongs to the 1h windows starting at trunc30(ts) and
        # trunc30(ts) - 30min (epoch-aligned, same as Spark's window())
        "WITH assigned AS ("
        "  SELECT make_timestamp((epoch_us(ts) - epoch_us(ts) % 1800000000) - s.shift) AS window_start, value"
        "  FROM events, (SELECT UNNEST([0, 1800000000]) AS shift) s"
        ") SELECT window_start, COUNT(*) AS n_events, "
        + sql_dsum("value")
        + " AS sum_value FROM assigned GROUP BY window_start",
    )
    reg.add(
        "events_session_window",
        session_window_per_user,
        # gaps-and-islands: new session when gap >= 30 min (Spark merges
        # strictly-smaller gaps)
        "WITH flagged AS ("
        "  SELECT user_id, ts,"
        "    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w < 1800000000 THEN 0 ELSE 1 END AS is_start"
        "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)"
        "), numbered AS ("
        "  SELECT user_id, ts, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM flagged"
        ") SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events "
        "FROM numbered GROUP BY user_id, sid",
    )
    reg.add(
        "events_distinct_keys",
        watermark_dedup_projection,
        "SELECT DISTINCT user_id, event_type FROM events",
    )
