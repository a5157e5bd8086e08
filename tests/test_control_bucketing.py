"""Control plane (alerts/logging/QC gate) + bucketed co-located joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark import control
from azure_etl_databricks_sql_powerbi_spark.operators.qc import CheckResult
from azure_etl_databricks_sql_powerbi_spark.sources.bucketing import (
    bucketed_join_is_shuffle_free,
    write_bucketed,
)
from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


def _results(ok: bool) -> list[CheckResult]:
    return [
        CheckResult("min_rows", True, "n=100"),
        CheckResult("non_null", ok, "null_rate=0.0" if ok else "null_rate=0.4"),
    ]


def test_format_alert_marks_failures():
    msg = control.format_alert("etl", _results(False))
    assert msg.startswith("❌ etl: 1/2")
    assert "✅ min_rows" in msg and "❌ non_null" in msg


def test_send_alert_without_webhook_is_noop():
    assert control.send_alert("hello", webhook_url=None) is False


def test_qc_gate_passes_and_raises():
    assert control.qc_gate("etl", _results(True)) is True
    with pytest.raises(control.QCGateError):
        control.qc_gate("etl", _results(False))
    assert control.qc_gate("etl", _results(False), raise_on_fail=False) is False


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key => sort-merge join with zero
    Exchange in the physical plan (the co-location guarantee)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF, "orders")
        lineitem = load_table(spark, SF, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
        write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], n_buckets=8)
        joined, shuffle_free = bucketed_join_is_shuffle_free(
            spark, "b_orders", "b_lineitem", on=["o_orderkey"]
        )
        assert shuffle_free, "bucketed join still contains an Exchange"
        # and it is correct
        expected = orders.join(lineitem, on="o_orderkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_unbucketed_join_has_exchange(spark):
    """Control: the same join off plain parquet DOES shuffle — proving the
    bucketing (not AQE luck) removed the Exchange above."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF, "orders")
        lineitem = load_table(spark, SF, "lineitem")
        joined = orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
