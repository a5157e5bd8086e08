"""Time-window aggregation operators (ST3 surface).

The reference is batch-only (daily ``run_date`` snapshots —
``README.md:13``, ``config.py:28-32``); its only time semantics is the
7-day overlap watermark (``rest_api.py:70-72``). These operators supply the
windowed-aggregation surface a streaming-capable engine needs, built on
``F.window`` / ``F.session_window`` — which evaluate identically over BATCH
DataFrames and STREAMING DataFrames, so every operator here serves both
modes: the batch path is oracle-checked against DuckDB, the streaming path
reuses the same plan under a watermark (``streaming.structured``).

Scale: window assignment is a stateless projection (no shuffle); the
aggregate shuffles on (window, key) — at 100 TB that is the unavoidable
one shuffle, with map-side partial aggregation and AQE coalescing. Session
windows shuffle on the session key then merge sort-locally per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.util import money_sum


def _kpi_aggs() -> list[Column]:
    # money_sum contract (util.py): DECIMAL-accumulate then one double
    # cast — ROUND(SUM(double),2) is the cross-engine half-cent hazard
    return [
        F.count(F.lit(1)).alias("n_events"),
        money_sum("value").alias("total_value"),
    ]


def tumbling_kpis(
    events: DataFrame,
    duration: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Non-overlapping epoch-aligned windows × key -> count / value sum."""
    return (
        events.groupBy(F.window(ts_col, duration).alias("w"), F.col(key_col))
        .agg(*_kpi_aggs())
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def sliding_kpis(
    events: DataFrame,
    duration: str = "1 day",
    slide: str = "6 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Overlapping windows (duration / slide epoch-aligned starts); each
    event lands in duration/slide windows."""
    return (
        events.groupBy(F.window(ts_col, duration, slide).alias("w"))
        .agg(*_kpi_aggs())
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def session_stats(
    events: DataFrame,
    gap: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows per user: a session extends while consecutive events
    are < gap apart; ``session_end`` = last event + gap (Spark semantics,
    reproduced by the gaps-and-islands oracle SQL).
    """
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(user_col))
        .agg(*_kpi_aggs())
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
