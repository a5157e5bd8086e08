"""End-to-end medallion pipeline runner — the engine's equivalent of the
reference's orchestration (``run_all_local.py:17-22``: extract → transform
→ load, plus the QC/alert flow of ``checks.py``/``alerts.py``), as one
driver-side function over distributed stages:

    bronze JSONL  --clean/conform-->  silver parquet (run_date-partitioned)
                  --star build----->  gold parquet   (run_date-partitioned)
                  --keyed MERGE---->  warehouse dir  (upsert, idempotent)

Every write is gated by QC checks (min_rows / null-rate / unique-key),
failures alert + abort. Re-running the same run_date is idempotent:
dynamic partition overwrite for silver/gold, keyed upsert for the
warehouse. Only the orchestration lives on the driver; all data movement
is Spark jobs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from azure_etl_databricks_sql_powerbi_spark import control
from azure_etl_databricks_sql_powerbi_spark.operators.qc import (
    check_min_rows,
    check_non_null,
    check_unique_key,
    run_checks,
)
from azure_etl_databricks_sql_powerbi_spark.operators.upsert import merge_upsert
from azure_etl_databricks_sql_powerbi_spark.plans import medallion
from azure_etl_databricks_sql_powerbi_spark.sources.files import (
    read_bronze_json,
    write_partitioned_parquet,
)


def run_medallion(
    spark: SparkSession,
    bronze_dir: str,
    out_dir: str,
    run_date: str,
    webhook_url: str | None = None,
    min_rows: int = 1,
) -> dict[str, DataFrame]:
    """Run bronze→silver→gold→warehouse for one ``run_date``.

    ``bronze_dir`` holds ``customers/*.json`` and ``payments/*.json``
    (JSONL, the reference's bronze shape — ``run_extract.py:41-44``).
    Returns the materialized stage DataFrames keyed by layer/table.
    """
    logger = control.get_logger()
    control.log_event(logger, "pipeline_start", run_date=run_date)

    # ---- bronze -> silver (schema-on-read + drift-tolerant conform)
    customers_bronze = read_bronze_json(spark, f"{bronze_dir}/customers")
    payments_bronze = read_bronze_json(spark, f"{bronze_dir}/payments")

    customers_silver = medallion.clean_customers(customers_bronze)
    payments_silver = medallion.clean_payments(payments_bronze)

    # ---- QC gates before any write (checks.py semantics, as aggregates)
    control.qc_gate(
        "silver.customers",
        run_checks(
            customers_silver,
            [
                check_min_rows(min_rows),
                check_non_null("c_custkey", max_null_rate=0.0),
                check_unique_key("c_custkey"),
            ],
        ),
        webhook_url,
    )
    control.qc_gate(
        "silver.payments",
        run_checks(
            payments_silver,
            [check_min_rows(min_rows), check_unique_key("event_id")],
        ),
        webhook_url,
    )

    write_partitioned_parquet(customers_silver, f"{out_dir}/silver/customers", run_date)
    write_partitioned_parquet(payments_silver, f"{out_dir}/silver/payments", run_date)

    # ---- silver -> gold (star shapes, reference run_transform.py:76-92)
    dim = medallion.dim_customers(customers_silver)
    fact = medallion.fact_payments(payments_silver)
    write_partitioned_parquet(dim, f"{out_dir}/gold/dim_customers", run_date)
    write_partitioned_parquet(fact, f"{out_dir}/gold/fact_payments", run_date)

    # ---- gold -> warehouse (keyed MERGE, reference run_load.py:57-96;
    # read-modify-write parquet locally, JDBC/Delta MERGE in production)
    wh = f"{out_dir}/warehouse/fact_payments"
    if os.path.exists(wh):
        target = spark.read.parquet(wh)
        merged = merge_upsert(target, fact, keys=["event_id"])
    else:
        merged = fact
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(wh)

    control.log_event(logger, "pipeline_done", run_date=run_date)
    return {
        "silver.customers": customers_silver,
        "silver.payments": payments_silver,
        "gold.dim_customers": dim,
        "gold.fact_payments": fact,
        "warehouse.fact_payments": spark.read.parquet(wh),
    }
