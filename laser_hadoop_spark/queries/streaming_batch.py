"""Event-time window queries (SURVEY.md §2.9) run in batch mode.

The reference has no streaming (single-shot batch MR jobs,
LASERInputValidator.java:129); these are the [C] closure operators. The
same expressions run incrementally under Structured Streaming — see
laser_hadoop_spark/streaming/ (watermarks, stateful dedup, stream-static
joins) which is pytest-verified; here the identical logic is
oracle-checked over the batch `events` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from laser_hadoop_spark.functions.scalar import money_sum
from laser_hadoop_spark.registry import register
from laser_hadoop_spark.tables import table


@register(
    "q_tumbling_window_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1: tumbling 1-hour event-time window aggregate.

    Spark's window() is epoch-aligned, so 1-hour tumbling window starts
    equal date_trunc('hour') exactly.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            money_sum(F.col("value"), scale=2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_sliding_window_agg",
    oracle="""
    SELECT ws AS window_start, COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE) AS sum_value
    FROM (
        SELECT value,
               UNNEST(generate_series(
                   time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '45 minutes',
                   time_bucket(INTERVAL '15 minutes', ts),
                   INTERVAL '15 minutes')) AS ws
        FROM events
    )
    GROUP BY ws
    """,
)
def q_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2: sliding window (1 hour every 15 minutes).

    Each event lands in exactly 4 overlapping windows; the oracle
    reproduces the window fan-out with generate_series.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            money_sum(F.col("value"), scale=2).alias("sum_value"),
        )
        .select(F.col("window.start").alias("window_start"), "n_events", "sum_value")
    )


@register(
    "q_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ), sess AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sess_id
        FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events, CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE) AS sum_value
    FROM sess
    GROUP BY user_id, sess_id
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3: session windows with a 30-minute inactivity gap.

    Spark merges events into a session while each new event arrives
    strictly before previous_ts + gap; the oracle reconstructs the same
    sessions with a lag/cumulative-sum session-id assignment.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            money_sum(F.col("value"), scale=2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
