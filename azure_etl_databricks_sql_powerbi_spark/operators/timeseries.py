"""Time-series & product-analytics operators over the events stream
(EXT surface: the reference's gold layer feeds BI dashboards; these are
the standard BI/growth queries a warehouse engine must answer).

Scale notes, per operator:

- ``resample_daily_ffill``: the heavy side (per-day aggregate) shuffles
  once on the date key with map-side partial aggregation; the date spine
  is derived from one scalar min/max aggregate and is bounded by calendar
  cardinality (a century is ~37k rows), so the spine-side global
  forward-fill window is a deliberately tiny single-partition op — the
  fact never enters a global window.
- ``cumulative_distinct_users``: running COUNT(DISTINCT) is NOT computed
  as distinct-over-expanding-window (quadratic state). Each user collapses
  to one (first_day) row — one shuffle on user — then days cumulate new
  arrivals: the window input is again only per-day rows.
- ``cohort_retention``: week buckets are epoch-anchored (no scalar
  subquery against the data), cohort = min week per user (one shuffle),
  retention cell = count of distinct (user, week) pairs per offset.
- ``funnel_conversion``: strictly-ordered funnel stages resolve per user
  with one min-timestamp aggregate per stage joined on the user key; the
  single-row result aggregate is the only global step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_daily_ffill(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Calendar-complete daily series: avg(value) per day with gap days
    present, count 0-filled and the average forward-filled from the last
    observed day (leading gaps stay null)."""
    # exact_avg (util.py): the daily mean is an exact DECIMAL(18,2)
    # numerator over one IEEE division — ROUND(AVG(double), 4) is the
    # cross-engine quotient-rounding hazard (r12 money sweep)
    from azure_etl_databricks_sql_powerbi_spark.util import exact_avg

    daily = (
        events.groupBy(F.to_date(ts_col).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_avg(value_col).alias("avg_value"),
        )
    )
    spine = (
        events.agg(
            F.min(F.to_date(ts_col)).alias("d0"), F.max(F.to_date(ts_col)).alias("d1")
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(F.broadcast(daily), "day", "left")
        .select(
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(w).alias(
                "avg_value_ffill"
            ),
        )
        .orderBy("day")
    )


def cumulative_distinct_users(
    events: DataFrame, ts_col: str = "ts", user_col: str = "user_id"
) -> DataFrame:
    """Per day: users seen for the first time that day and the running
    total of distinct users to date — linear state, no distinct-over-
    window."""
    first_seen = events.groupBy(user_col).agg(
        F.min(F.to_date(ts_col)).alias("first_day")
    )
    daily_new = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    spine = (
        events.agg(
            F.min(F.to_date(ts_col)).alias("d0"), F.max(F.to_date(ts_col)).alias("d1")
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(F.broadcast(daily_new), "day", "left")
        .select("day", F.coalesce("new_users", F.lit(0)).alias("new_users"))
        .withColumn("cum_users", F.sum("new_users").over(w))
        .orderBy("day")
    )


def _epoch_week(day_col) -> F.Column:
    # Monday-anchored absolute week index (1970-01-05 was a Monday); no
    # data-derived anchor means no scalar subquery in the plan
    return F.floor(F.datediff(day_col, F.lit("1970-01-05").cast("date")) / 7).cast(
        "long"
    )


def cohort_retention(
    events: DataFrame, ts_col: str = "ts", user_col: str = "user_id"
) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-activity
    week; each cell counts distinct cohort members active ``week_offset``
    weeks later."""
    weekly = (
        events.select(
            F.col(user_col).alias("u"), _epoch_week(F.to_date(ts_col)).alias("week")
        )
        .distinct()
    )
    cohort = weekly.groupBy("u").agg(F.min("week").alias("cohort_week"))
    return (
        weekly.join(cohort, "u")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def funnel_conversion(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel: a user converts stage k only with an event
    of that type strictly after their stage-(k-1) conversion time. One
    row: distinct converting users per stage."""
    ev = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t"), F.col(ts_col).alias("ts")
    )
    reached = ev.where(F.col("t") == stages[0]).groupBy("u").agg(
        F.min("ts").alias("t0")
    )
    per_user = reached
    for i, stage in enumerate(stages[1:], start=1):
        nxt = (
            ev.where(F.col("t") == stage)
            .join(per_user.select("u", F.col(f"t{i-1}")), "u")
            .where(F.col("ts") > F.col(f"t{i-1}"))
            .groupBy("u")
            .agg(F.min("ts").alias(f"t{i}"))
        )
        per_user = per_user.join(nxt, "u", "left")
    return per_user.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"n_{stage}")
            for i, stage in enumerate(stages)
        ]
    )
