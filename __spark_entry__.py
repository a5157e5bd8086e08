"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001. ``queries()``
exposes one named callable per implemented operator from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for each (omitted only
for genuinely non-SQL-expressible ops, which get rows-only checks).

Column names are aliased identically on both sides; double aggregates are
rounded on both sides so the order-insensitive value hash is stable to
float summation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.operators.dedup import latest_per_key
from azure_etl_databricks_sql_powerbi_spark.operators.incremental import relative_watermark
from azure_etl_databricks_sql_powerbi_spark.operators.upsert import merge_upsert
from azure_etl_databricks_sql_powerbi_spark.plans import gold, medallion
from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table

SF0001 = "/root/testdata/sf0.001"

QueryFn = Callable[[SparkSession, str], DataFrame]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return gold.pricing_summary(load_table(spark, SF0001, "lineitem"))


# ---------------------------------------------------------------- queries


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.pricing_summary(load_table(spark, sf_dir, "lineitem"))


def _q_dim_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver = medallion.clean_customers(load_table(spark, sf_dir, "customer"))
    return medallion.dim_customers(silver)


def _q_fact_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver = medallion.clean_payments(load_table(spark, sf_dir, "events"))
    return medallion.fact_payments(silver)


def _q_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.star_revenue_by_region(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def _q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed MERGE upsert (J1): target = history, source = updated overlap
    batch (prices bumped 10%) — reproduces run_load.py:82-90 semantics."""
    orders = load_table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    # +1000.0 (exact in binary) rather than a rounded product: Spark's
    # BigDecimal HALF_UP and DuckDB's multiply-then-nearbyint disagree on
    # half-cent boundaries, which is arithmetic noise, not MERGE semantics.
    source = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
    ).withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
    return merge_upsert(target, source, keys=["o_orderkey"])


def _q_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return latest_per_key(
        orders, keys=["o_custkey"], order_by=["o_orderdate"], tiebreak=["o_orderkey"]
    )


def _q_top_customers_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.top_customers_by_segment(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


def _q_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.sales_rollup(load_table(spark, sf_dir, "orders"))


def _q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.customer_order_running_total(load_table(spark, sf_dir, "orders"))


def _q_events_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental overlap window (ST1): events within 7 days of max(ts)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    return relative_watermark(events, "ts", days=7)


def _q_events_json_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (F7) + grouped agg: parse props.k, KPI per event_type."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


def _q_union_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift-tolerant UNION (U1): two bronze snapshots with different
    column subsets combined via unionByName(allowMissingColumns)."""
    customer = load_table(spark, sf_dir, "customer")
    old = customer.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    new = customer.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return old.unionByName(new, allowMissingColumns=True)


def _q_qbo_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested QBO-shaped payload normalization (F9/S4): build
    {QueryResponse: {Invoice: [...]}} docs from orders (one per customer),
    then explode + flatten back to relational rows. The round-trip must
    reproduce the original projection — which is exactly the oracle."""
    from azure_etl_databricks_sql_powerbi_spark.operators.nested import (
        explode_path,
        flatten_struct,
    )

    orders = load_table(spark, sf_dir, "orders")
    nested = (
        orders.groupBy("o_custkey")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("o_orderkey").cast("string").alias("Id"),
                    F.col("o_totalprice").alias("TotalAmt"),
                    F.col("o_orderstatus").alias("Status"),
                )
            ).alias("Invoice")
        )
        .select(F.struct(F.col("Invoice")).alias("QueryResponse"))
    )
    return flatten_struct(explode_path(nested, "QueryResponse.Invoice"), "item")


def _q_qc_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QC check metrics (A2/A3 + uniqueness) as ONE aggregate pass."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg(F.col("o_custkey").isNull().cast("int")), 6).alias(
            "custkey_null_rate"
        ),
        F.count_distinct("o_orderkey").alias("n_keys"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("dup_keys"),
    )


def _q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (A6) — HLL sketches differ between engines, so
    this is a rows-only check; the unit test asserts the ±5% rel-error bound
    against the exact count instead."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.approx_count_distinct("o_custkey").alias("approx_custs"),
        F.approx_count_distinct("o_orderkey").alias("approx_orders"),
    )


QUERIES: dict[str, QueryFn] = {
    "pricing_summary": _q_pricing_summary,
    "dim_customers": _q_dim_customers,
    "fact_payments": _q_fact_payments,
    "star_revenue_by_region": _q_star_revenue,
    "merge_upsert_orders": _q_merge_upsert,
    "latest_order_per_customer": _q_latest_order_per_customer,
    "top_customers_by_segment": _q_top_customers_by_segment,
    "sales_rollup": _q_sales_rollup,
    "customer_running_total": _q_running_total,
    "events_watermark_7d": _q_events_watermark,
    "events_json_kpis": _q_events_json_kpis,
    "union_schema_drift": _q_union_drift,
    "qbo_invoices_flatten": _q_qbo_flatten,
    "qc_metrics_orders": _q_qc_metrics,
    "approx_distinct_orders": _q_approx_distinct,
}


def queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


# ------------------------------------------------------------- oracle SQL

_AUDIT = medallion.TEST_AUDIT_TS

ORACLES: dict[str, str] = {
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4)                                    AS avg_qty,
               ROUND(AVG(l_extendedprice), 4)                               AS avg_price,
               ROUND(AVG(l_discount), 4)                                    AS avg_disc,
               COUNT(*)                                                     AS count_order
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "dim_customers": f"""
        SELECT CAST(c_custkey AS BIGINT)          AS c_custkey,
               LOWER(TRIM(c_name))                AS c_name,
               CAST(c_nationkey AS INT)           AS c_nationkey,
               CAST(c_acctbal AS DOUBLE)          AS c_acctbal,
               CAST(c_mktsegment AS VARCHAR)      AS c_mktsegment
        FROM customer
    """,
    "fact_payments": """
        SELECT CAST(event_id AS BIGINT)  AS event_id,
               CAST(ts AS TIMESTAMP)     AS ts,
               CAST(user_id AS BIGINT)   AS user_id,
               event_type                AS event_type,
               CAST(value AS DOUBLE)     AS value
        FROM events
    """,
    "star_revenue_by_region": """
        SELECT r_name, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(DISTINCT o_orderkey)                        AS order_count
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """,
    "merge_upsert_orders": """
        WITH target AS (
            SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2001-01-01'
        ), source AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   o_totalprice + 1000.0 AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderdate >= TIMESTAMP '2000-06-01'
        )
        SELECT * FROM source
        UNION ALL
        SELECT t.* FROM target t
        WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
    """,
    "latest_order_per_customer": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC NULLS LAST, o_orderkey ASC
            ) AS rn
            FROM orders
        ) WHERE rn = 1
    """,
    "top_customers_by_segment": """
        WITH per_customer AS (
            SELECT c_mktsegment, o_custkey, c_name,
                   ROUND(SUM(o_totalprice), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment, o_custkey, c_name
        )
        SELECT c_mktsegment, o_custkey AS c_custkey, c_name, revenue,
               CAST(rnk AS INT) AS rnk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY c_mktsegment
                ORDER BY revenue DESC NULLS LAST, o_custkey ASC
            ) AS rnk
            FROM per_customer
        ) WHERE rnk <= 3
        ORDER BY c_mktsegment, rnk
    """,
    "sales_rollup": """
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*)                      AS n_orders,
               ROUND(SUM(o_totalprice), 2)   AS total_price,
               ROUND(AVG(o_totalprice), 4)   AS avg_price
        FROM orders
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
    """,
    "customer_running_total": """
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS running_revenue
        FROM orders
    """,
    "events_watermark_7d": """
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        FROM events
        QUALIFY CAST(ts AS TIMESTAMP)
            >= CAST(CAST(MAX(CAST(ts AS TIMESTAMP)) OVER () AS DATE) - INTERVAL 7 DAY AS TIMESTAMP)
    """,
    "events_json_kpis": """
        SELECT event_type,
               COUNT(*)                                        AS n_events,
               ROUND(SUM(value), 2)                            AS total_value,
               ROUND(AVG(CAST(props->>'$.k' AS BIGINT)), 4)    AS avg_k,
               COUNT(DISTINCT user_id)                         AS n_users
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "union_schema_drift": """
        SELECT c_custkey, c_name, c_acctbal, NULL AS c_mktsegment
        FROM customer WHERE c_custkey % 2 = 0
        UNION ALL
        SELECT c_custkey, c_name, NULL AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 2 = 1
    """,
    "qbo_invoices_flatten": """
        SELECT CAST(o_orderkey AS VARCHAR) AS Id,
               o_totalprice                AS TotalAmt,
               o_orderstatus               AS Status
        FROM orders
    """,
    "qc_metrics_orders": """
        SELECT CAST(COUNT(*) AS BIGINT)                                   AS n_rows,
               ROUND(AVG(CAST(o_custkey IS NULL AS INT)), 6)              AS custkey_null_rate,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)                 AS n_keys,
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)      AS dup_keys
        FROM orders
    """,
}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
