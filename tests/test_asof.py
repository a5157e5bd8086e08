"""As-of / range join semantics on hand-built frames (edge cases the
oracle parity test can't isolate: equal timestamps, no-match nulls,
interval boundaries)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.operators.asof import (
    asof_join_backward,
    range_join_buckets,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05 00:00:00")),
            (2, 10, _ts("2024-01-01 00:00:00")),  # equal to right ts -> inclusive
            (3, 10, _ts("2023-12-31 00:00:00")),  # before any right -> null
            (4, 99, _ts("2024-06-01 00:00:00")),  # key with no right rows
        ],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:00"), "a"),
            (10, _ts("2024-01-04 00:00:00"), "b"),
            (10, _ts("2024-01-06 00:00:00"), "c"),
        ],
        "k long, rts timestamp, val string",
    )
    out = {
        r["event_id"]: r["val"]
        for r in asof_join_backward(left, right, on="k", left_ts="ts", right_ts="rts").collect()
    }
    assert out == {1: "b", 2: "a", 3: None, 4: None}


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 06:00:00")),  # == start -> in
            (2, _ts("2024-01-01 17:59:59")),  # just inside
            (3, _ts("2024-01-01 18:00:00")),  # == end -> out
            (4, _ts("2024-01-01 05:59:59")),  # before -> out
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(_ts("2024-01-01 06:00:00"), _ts("2024-01-01 18:00:00"))],
        "s timestamp, e timestamp",
    )
    got = sorted(
        r["pid"]
        for r in range_join_buckets(
            points, intervals, point_ts="ts", start_ts="s", end_ts="e", bucket="1 day"
        ).collect()
    )
    assert got == [1, 2]


def test_range_join_extra_key(spark):
    points = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01 12:00:00")), (2, 8, _ts("2024-01-01 12:00:00"))],
        "pid long, k long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(7, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
        "ik long, s timestamp, e timestamp",
    )
    got = [
        r["pid"]
        for r in range_join_buckets(
            points,
            intervals,
            point_ts="ts",
            start_ts="s",
            end_ts="e",
            bucket="1 day",
            extra_key=("k", "ik"),
        ).collect()
    ]
    assert got == [1]


def test_asof_no_cross_key_leakage(spark):
    """A right row from key A must never serve key B."""
    left = spark.createDataFrame(
        [(1, 2, _ts("2024-01-10 00:00:00"))], "event_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), 5.0)], "k long, rts timestamp, v double"
    )
    rows = asof_join_backward(left, right, on="k", left_ts="ts", right_ts="rts").collect()
    assert len(rows) == 1 and rows[0]["v"] is None


def test_asof_null_keys_never_match(spark):
    """SQL ASOF semantics: a NULL key on either side never matches. A
    null-keyed right row must not be carried into null-keyed left rows,
    and null-keyed left rows survive with null attachment."""
    left = spark.createDataFrame(
        [(1, None, _ts("2024-01-05 00:00:00")), (2, 10, _ts("2024-01-05 00:00:00"))],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (None, _ts("2024-01-01 00:00:00"), "nullkey"),
            (10, _ts("2024-01-01 00:00:00"), "a"),
            (10, None, "nullts"),  # null right_ts can't satisfy rts <= ts
        ],
        "k long, rts timestamp, val string",
    )
    out = {
        r["event_id"]: r["val"]
        for r in asof_join_backward(left, right, on="k", left_ts="ts", right_ts="rts").collect()
    }
    assert out == {1: None, 2: "a"}


def test_asof_forward_picks_next_and_is_inclusive(spark):
    from azure_etl_databricks_sql_powerbi_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05 00:00:00")),  # exact-equal right exists
            (2, 10, _ts("2024-01-06 00:00:00")),  # next is Jan 10
            (3, 10, _ts("2024-02-01 00:00:00")),  # nothing after
        ],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:00"), "early"),
            (10, _ts("2024-01-05 00:00:00"), "equal"),
            (10, _ts("2024-01-10 00:00:00"), "late"),
        ],
        "k long, rts timestamp, val string",
    )
    out = {
        r["event_id"]: r["val"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", direction="forward"
        ).collect()
    }
    assert out == {1: "equal", 2: "late", 3: None}


def test_asof_tolerance_nulls_far_matches(spark):
    from azure_etl_databricks_sql_powerbi_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-05 00:00:00")), (2, 10, _ts("2024-03-01 00:00:00"))],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 00:00:00"), "a")], "k long, rts timestamp, val string"
    )
    # backward: event 1 is 4 days after the right row (within 7d), event 2
    # is ~2 months after (outside) -> nulled
    out = {
        r["event_id"]: r["val"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            direction="backward", tolerance_seconds=7 * 86400,
        ).collect()
    }
    assert out == {1: "a", 2: None}
