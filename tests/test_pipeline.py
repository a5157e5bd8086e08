"""End-to-end medallion pipeline: bronze JSONL -> silver -> gold ->
warehouse with QC gates; idempotent re-runs; QC abort path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark import control
from azure_etl_databricks_sql_powerbi_spark.plans.pipeline import run_medallion
from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bronze_dir(spark, tmp_path_factory):
    """Land bronze JSONL from the catalog tables (the reference's bronze
    shape: one JSON object per line, run_extract.py:41-44)."""
    root = tmp_path_factory.mktemp("bronze")
    load_table(spark, SF, "customer").write.json(str(root / "customers"))
    load_table(spark, SF, "events").drop("props").write.json(str(root / "payments"))
    return str(root)


def test_pipeline_end_to_end_and_idempotent(spark, bronze_dir, tmp_path):
    out = str(tmp_path / "lake")
    stages = run_medallion(spark, bronze_dir, out, run_date="2024-02-01")
    n_cust = load_table(spark, SF, "customer").select("c_custkey").distinct().count()
    n_events = load_table(spark, SF, "events").count()

    assert stages["silver.customers"].count() == n_cust
    assert stages["gold.fact_payments"].count() == n_events
    a = {tuple(r) for r in stages["warehouse.fact_payments"].collect()}
    assert len(a) == n_events

    # silver/gold written partitioned by run_date
    got = spark.read.parquet(f"{out}/gold/dim_customers")
    assert "run_date" in got.columns

    # re-running the same run_date is a no-op for the warehouse (upsert)
    stages2 = run_medallion(spark, bronze_dir, out, run_date="2024-02-01")
    b = {tuple(r) for r in stages2["warehouse.fact_payments"].collect()}
    assert b == a


def test_pipeline_qc_gate_aborts(spark, tmp_path):
    """A bronze feed violating the unique-key check must abort before any
    silver write."""
    bad = str(tmp_path / "badbronze")
    cust = load_table(spark, SF, "customer").limit(50)
    cust.union(cust).write.json(f"{bad}/customers")  # duplicated keys...
    load_table(spark, SF, "events").drop("props").limit(50).write.json(f"{bad}/payments")
    out = str(tmp_path / "lake2")
    # duplicate keys are removed by clean_customers' dedup, so to hit the
    # gate use an impossible min_rows instead
    with pytest.raises(control.QCGateError):
        run_medallion(spark, bad, out, run_date="2024-02-01", min_rows=10**9)
    import os

    assert not os.path.exists(f"{out}/silver/customers")
