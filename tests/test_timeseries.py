"""Time-series/product-analytics operators: gap fill + forward fill,
cumulative distinct, cohorts, funnels — hand-built inputs with known
answers (the sf0.01 oracle checks run driver-side)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.operators.timeseries import (
    cohort_retention,
    cumulative_distinct_users,
    funnel_conversion,
    resample_daily_ffill,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_resample_fills_gaps_and_forward_fills(spark):
    t = dt.datetime
    ev = _ev(
        spark,
        [
            (1, t(2024, 1, 1, 10), 1, "view", 4.0),
            (2, t(2024, 1, 1, 11), 2, "view", 6.0),
            # Jan 2-3 silent
            (3, t(2024, 1, 4, 9), 1, "view", 10.0),
        ],
    )
    rows = {r["day"].isoformat(): r for r in resample_daily_ffill(ev).collect()}
    assert sorted(rows) == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    assert rows["2024-01-01"]["n_events"] == 2
    assert rows["2024-01-02"]["n_events"] == 0
    # gap days carry the last observed average forward
    assert rows["2024-01-02"]["avg_value_ffill"] == 5.0
    assert rows["2024-01-03"]["avg_value_ffill"] == 5.0
    assert rows["2024-01-04"]["avg_value_ffill"] == 10.0


def test_cumulative_distinct_counts_each_user_once(spark):
    t = dt.datetime
    ev = _ev(
        spark,
        [
            (1, t(2024, 1, 1), 1, "view", 0.0),
            (2, t(2024, 1, 1), 2, "view", 0.0),
            (3, t(2024, 1, 2), 1, "view", 0.0),  # returning, not new
            (4, t(2024, 1, 3), 3, "view", 0.0),
        ],
    )
    rows = {r["day"].isoformat(): r for r in cumulative_distinct_users(ev).collect()}
    assert [rows[d]["new_users"] for d in sorted(rows)] == [2, 0, 1]
    assert [rows[d]["cum_users"] for d in sorted(rows)] == [2, 2, 3]


def test_cohort_retention_offsets(spark):
    t = dt.datetime
    # user 1 active in week0 and week1; user 2 only week0; user 3 joins week1
    ev = _ev(
        spark,
        [
            (1, t(2024, 1, 1), 1, "view", 0.0),   # Mon, week A
            (2, t(2024, 1, 2), 2, "view", 0.0),
            (3, t(2024, 1, 8), 1, "view", 0.0),   # next week
            (4, t(2024, 1, 9), 3, "view", 0.0),
        ],
    )
    cells = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    weeks = sorted({c for c, _ in cells})
    a = weeks[0]
    assert cells[(a, 0)] == 2          # users 1,2 start week A
    assert cells[(a, 1)] == 1          # only user 1 returns
    assert cells[(a + 1, 0)] == 1      # user 3's cohort


def test_funnel_requires_strict_order(spark):
    t = dt.datetime
    ev = _ev(
        spark,
        [
            # user 1: full ordered funnel
            (1, t(2024, 1, 1, 9), 1, "view", 0.0),
            (2, t(2024, 1, 1, 10), 1, "click", 0.0),
            (3, t(2024, 1, 1, 11), 1, "purchase", 0.0),
            # user 2: purchase BEFORE click -> converts stage 2 only
            (4, t(2024, 1, 2, 9), 2, "view", 0.0),
            (5, t(2024, 1, 2, 10), 2, "purchase", 0.0),
            (6, t(2024, 1, 2, 11), 2, "click", 0.0),
            # user 3: click without view -> no stage at all
            (7, t(2024, 1, 3, 9), 3, "click", 0.0),
        ],
    )
    row = funnel_conversion(ev).first()
    assert (row["n_view"], row["n_click"], row["n_purchase"]) == (2, 2, 1)


def test_read_csv_roundtrip_with_schema(spark, tmp_path):
    from azure_etl_databricks_sql_powerbi_spark.sources.files import read_csv

    p = str(tmp_path / "in.csv")
    (tmp_path / "in.csv").write_text("id;name;amount\n1;ann;2.5\n2;bob;3.25\n")
    df = read_csv(
        spark, p, schema="id long, name string, amount double", delimiter=";"
    )
    got = {r["id"]: r for r in df.collect()}
    assert got[1]["name"] == "ann" and got[2]["amount"] == 3.25
    assert dict(df.dtypes) == {"id": "bigint", "name": "string", "amount": "double"}


def test_rolling_range_agg_is_event_time_not_row_frame(spark):
    """RANGE-frame semantics: two same-timestamp rows for one key get the
    SAME trailing aggregate (both inside each other's frame); rows beyond
    the interval fall out. A rows-frame would violate both."""
    from azure_etl_databricks_sql_powerbi_spark.operators.windows import (
        rolling_range_agg,
    )

    rows = [
        (1, 10, "2024-01-01 00:00:00", 100.0),
        (2, 10, "2024-01-05 00:00:00", 10.0),
        (3, 10, "2024-01-05 00:00:00", 1.0),   # same instant as row 2
        (4, 10, "2024-01-20 00:00:00", 7.0),   # outside 7d of the rest
        (5, 99, "2024-01-05 00:00:00", 50.0),  # other key: isolated
    ]
    df = spark.createDataFrame(
        rows, "order_id long, cust long, ts string, price double"
    ).select("order_id", "cust", F.col("ts").cast("timestamp").alias("ts"), "price")
    out = {
        r["order_id"]: (r["rolling_n"], r["rolling_sum"])
        for r in rolling_range_agg(
            df, ["cust"], "ts", "price", days=7, keys=["order_id"]
        ).collect()
    }
    assert out[1] == (1, 100.0)
    assert out[2] == out[3] == (3, 111.0)  # same frame for the tied instant
    assert out[4] == (1, 7.0)              # 15 days later: everything aged out
    assert out[5] == (1, 50.0)             # partition isolation
