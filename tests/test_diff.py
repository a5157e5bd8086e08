"""Keyed snapshot diff: planted add/remove/change detection, NULL
sentinel correctness (NULL-vs-'x' shifts are changes, not collisions),
unchanged rows dropped, digest map-side plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.operators.diff import diff_summary, table_diff

OLD = [
    (1, "a", 10.0),
    (2, "b", 20.0),
    (3, None, 30.0),
    (4, "d", None),
    (5, "same", 50.0),
]
NEW = [
    (2, "b", 21.0),       # changed value
    (3, "c", 30.0),       # NULL -> 'c' (sentinel must catch it)
    (4, None, "d"),       # swapped NULL position across columns
    (5, "same", 50.0),    # unchanged -> dropped
    (6, "f", 60.0),       # added
]                          # 1 removed


def _frames(spark):
    old = spark.createDataFrame(OLD, "k long, s string, v double")
    new = spark.createDataFrame(
        [(k, s, float(v) if isinstance(v, (int, float)) else None) for k, s, v in NEW[:4]]
        + [(6, "f", 60.0)],
        "k long, s string, v double",
    )
    return old, new


def test_table_diff_classifies(spark):
    old, new = _frames(spark)
    got = {r["k"]: r["change"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {1: "removed", 2: "changed", 3: "changed", 4: "changed", 6: "added"}
    # 5 (unchanged) must not appear at all
    assert 5 not in got


def test_null_column_swap_is_a_change(spark):
    """(NULL,'d') -> ('d',NULL) across two string columns must register as
    changed — the sentinel/separator scheme may not let values slide
    between columns."""
    old = spark.createDataFrame([(1, None, "d")], "k long, a string, b string")
    new = spark.createDataFrame([(1, "d", None)], "k long, a string, b string")
    rows = table_diff(old, new, ["k"]).collect()
    assert [(r["k"], r["change"]) for r in rows] == [(1, "changed")]


def test_diff_summary_counts(spark):
    old, new = _frames(spark)
    got = {r["change"]: r["n_keys"] for r in diff_summary(old, new, ["k"]).collect()}
    assert got == {"added": 1, "changed": 3, "removed": 1}


def test_digest_computed_before_join(spark):
    """Plan shape: the join's shuffle carries (key, digest) projections,
    not full rows — md5 appears below the join in the executed plan."""
    old, new = _frames(spark)
    plan = table_diff(old, new, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("md5(") == 2  # one digest per side
    # tree prints parent-above-child: every md5 Project must sit BELOW its
    # side's Exchange (map-side, i.e. textually after the first Exchange),
    # so the shuffle carries (key, digest), not the row payload
    first_exchange = plan.find("Exchange")
    assert first_exchange != -1
    assert plan.find("md5(") > first_exchange
