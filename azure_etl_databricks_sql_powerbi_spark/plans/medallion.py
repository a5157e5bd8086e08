"""Medallion (bronze -> silver -> gold) builders over the engine catalog.

Re-expresses the reference's transform stage (``run_transform.py:39-92``)
against the test catalog: ``customer`` plays the ``dim_customers`` role,
``events`` plays the payments-fact role (``value`` ≙ ``amount``, ``event_id``
≙ ``payment_id`` — FIXTURES.md mapping). Each builder is a pure
DataFrame -> DataFrame function: lazily planned, no actions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.operators.conform import ColumnSpec, Contract, conform
from azure_etl_databricks_sql_powerbi_spark.operators.dedup import dedupe_exact

# Deterministic audit timestamp used under test so silver outputs stay
# oracle-hashable (SURVEY.md §7 hard-part (a)); production passes None to
# get current_timestamp() like reference run_transform.py:59.
TEST_AUDIT_TS = "2026-01-01 00:00:00"

# Silver contract for the customer dimension (reference clean_customers,
# run_transform.py:39-60: dedup on id, timestamp casts, string cast +
# standardization, audit column).
CUSTOMERS_CONTRACT = Contract(
    columns=(
        ColumnSpec("c_custkey", "bigint", required=True),
        ColumnSpec("c_name", "string", expr=lambda c: F.lower(F.trim(c))),
        ColumnSpec("c_nationkey", "int"),
        ColumnSpec("c_acctbal", "double"),
        ColumnSpec("c_mktsegment", "string"),
    )
)

# Silver contract for the payments-shaped fact (reference clean_payments,
# run_transform.py:63-73: dedup on payment_id, money cast double,
# timestamp casts, audit column).
PAYMENTS_CONTRACT = Contract(
    columns=(
        ColumnSpec("event_id", "bigint", required=True),
        ColumnSpec("ts", "timestamp"),
        ColumnSpec("user_id", "bigint"),
        ColumnSpec("event_type", "string"),
        ColumnSpec("value", "double"),
    )
)


# Decimal-money variant of the payments contract (SURVEY.md §1.2: the
# reference chooses double for currency — run_transform.py:68 — which we
# match by default; DecimalType(18,2) is the offered exact-money option:
# sums are exact integers-of-cents, immune to float summation order, the
# right choice when the fact feeds a ledger instead of a dashboard).
PAYMENTS_DECIMAL_CONTRACT = Contract(
    columns=(
        ColumnSpec("event_id", "bigint", required=True),
        ColumnSpec("ts", "timestamp"),
        ColumnSpec("user_id", "bigint"),
        ColumnSpec("event_type", "string"),
        ColumnSpec("value", "decimal(18,2)"),
    )
)


def clean_payments_decimal(
    bronze: DataFrame, audit_ts: str | None = TEST_AUDIT_TS
) -> DataFrame:
    """events bronze -> silver payments-fact with exact decimal money."""
    return conform(
        dedupe_exact(bronze, ["event_id"]), PAYMENTS_DECIMAL_CONTRACT, audit_ts
    )


def clean_customers(bronze: DataFrame, audit_ts: str | None = TEST_AUDIT_TS) -> DataFrame:
    """customer bronze -> silver: key-dedup then drift-tolerant conform."""
    return conform(dedupe_exact(bronze, ["c_custkey"]), CUSTOMERS_CONTRACT, audit_ts)


def clean_payments(bronze: DataFrame, audit_ts: str | None = TEST_AUDIT_TS) -> DataFrame:
    """events bronze -> silver payments-fact."""
    return conform(dedupe_exact(bronze, ["event_id"]), PAYMENTS_CONTRACT, audit_ts)


def dim_customers(customers_silver: DataFrame) -> DataFrame:
    """Gold dim: silver minus audit column (reference run_transform.py:83-85)."""
    return customers_silver.drop("etl_loaded_at")


def fact_payments(payments_silver: DataFrame) -> DataFrame:
    """Gold fact: passthrough of silver (reference run_transform.py:88)."""
    return payments_silver.drop("etl_loaded_at")
