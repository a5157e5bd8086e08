"""Module-owned DuckDB twins for RETIRED gold-tier driver queries
(ROTATION_POLICY.md §3: retirement removes driver-evidence obligations,
never capability — the operator, its SQL twin, and the hash-exact proof
live on here)."""

from __future__ import annotations

import duckdb

from oracle_harness import compare

SF = "/root/testdata/sf0.001"

# Twin of plans/gold.dominant_shippers — formerly the driver oracle of
# `dominant_shippers`, retired r11 (§5 swap #3: §4.4 near-duplicate
# star-join shape of `top_quarter_shippers`, which remains declared).
DOMINANT_SHIPPERS_SQL = """
    WITH per_ps AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS ps_qty
        FROM read_parquet('{sf}/lineitem.parquet') GROUP BY 1, 2
    ),
    per_p AS (
        SELECT l_partkey, SUM(ps_qty) AS p_qty FROM per_ps GROUP BY 1
    ),
    dom AS (
        SELECT DISTINCT l_suppkey
        FROM per_ps JOIN per_p USING (l_partkey)
        WHERE ps_qty > 0.2 * p_qty
    )
    SELECT s_suppkey, s_name, s_acctbal
    FROM read_parquet('{sf}/supplier.parquet')
    WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
    ORDER BY s_suppkey
"""


def test_dominant_shippers_matches_duckdb_twin(spark):
    from azure_etl_databricks_sql_powerbi_spark.plans import gold

    out = gold.dominant_shippers(
        spark.read.parquet(f"{SF}/lineitem.parquet"),
        spark.read.parquet(f"{SF}/supplier.parquet"),
    )
    orc = duckdb.sql(DOMINANT_SHIPPERS_SQL.format(sf=SF)).df()
    assert compare(out, orc, float_tol=0) == []


# Twin of plans/gold.sales_rollup — formerly the driver oracle of
# `sales_rollup`, retired r12 (§5 swap #5: its ROLLUP grouping sets are
# a strict subset of the still-declared `sales_cube` power set, and the
# explicit-sets API keeps driver evidence via `grouping_sets_orders`).
# Money columns carry the r12 DECIMAL-accumulate contract on both sides.
SALES_ROLLUP_SQL = """
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*)                      AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(o_totalprice)     AS avg_price
    FROM read_parquet('{sf}/orders.parquet')
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""


def test_sales_rollup_matches_duckdb_twin(spark):
    from azure_etl_databricks_sql_powerbi_spark.plans import gold

    out = gold.sales_rollup(spark.read.parquet(f"{SF}/orders.parquet"))
    orc = duckdb.sql(SALES_ROLLUP_SQL.format(sf=SF)).df()
    assert compare(out, orc, float_tol=0) == []


# Twin of plans/gold.customer_order_running_total — formerly the driver
# oracle of `customer_running_total`, retired r12 (§5 swap #6: the §4.3
# composable-window merge — the still-declared `customer_order_windows`
# computes this exact running sum in its shared window sort). DECIMAL
# accumulate -> one double cast on both sides (the r12 money contract).
RUNNING_TOTAL_SQL = """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_revenue
    FROM read_parquet('{sf}/orders.parquet')
"""


def test_customer_running_total_matches_duckdb_twin(spark):
    from azure_etl_databricks_sql_powerbi_spark.plans import gold

    out = gold.customer_order_running_total(
        spark.read.parquet(f"{SF}/orders.parquet")
    )
    orc = duckdb.sql(RUNNING_TOTAL_SQL.format(sf=SF)).df()
    assert compare(out, orc, float_tol=0) == []


# Twin of the retired `customer_order_gaps` driver query (r12 §5 swap
# #7 freed its slot; the lag/lead + datediff plan is a strict subset of
# `customer_order_windows`). Exercises operators/windows.lag_lead
# standalone, exactly as the retired query composed it.
ORDER_GAPS_SQL = """
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_orderdate)  OVER w AS prev_orderdate,
           LEAD(o_orderdate) OVER w AS next_orderdate,
           CAST(date_diff('day', LAG(o_orderdate) OVER w, o_orderdate) AS INT)
               AS gap_days
    FROM read_parquet('{sf}/orders.parquet')
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def test_customer_order_gaps_matches_duckdb_twin(spark):
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.operators.windows import lag_lead

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    out = lag_lead(
        orders,
        partition_by=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        col="o_orderdate",
        lag_col="prev_orderdate",
        lead_col="next_orderdate",
    ).withColumn("gap_days", F.datediff("o_orderdate", "prev_orderdate"))
    orc = duckdb.sql(ORDER_GAPS_SQL.format(sf=SF)).df()
    assert compare(out, orc, float_tol=0) == []


# Twin of operators/windows.ntile_bucket over the per-customer revenue
# aggregate — formerly the driver oracle of `customer_revenue_quartiles`,
# retired r13 (§5 swap #11: the §4 re-rank's second fold — the NTILE
# column set now rides the still-declared `customer_order_distribution`,
# whose per-customer aggregate is the same window input). DECIMAL
# accumulate -> one double cast on both sides (the r12 money contract).
REVENUE_QUARTILES_SQL = """
    WITH per AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM read_parquet('{sf}/orders.parquet') GROUP BY o_custkey
    )
    SELECT o_custkey, revenue,
           NTILE(4) OVER (ORDER BY revenue DESC, o_custkey ASC) AS quartile
    FROM per
"""


def test_customer_revenue_quartiles_matches_duckdb_twin(spark):
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.operators.windows import (
        ntile_bucket,
    )
    from azure_etl_databricks_sql_powerbi_spark.util import money_sum

    per = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_custkey")
        .agg(money_sum("o_totalprice").alias("revenue"))
    )
    out = ntile_bucket(
        per,
        order_by=[F.col("revenue").desc(), F.col("o_custkey").asc()],
        n=4,
        bucket_col="quartile",
    )
    orc = duckdb.sql(REVENUE_QUARTILES_SQL.format(sf=SF)).df()
    assert compare(out, orc, float_tol=0) == []


# Twin of plans/gold.small_quantity_part_revenue — formerly the driver
# oracle of `small_qty_part_revenue`, retired r13 (§5 swap #12: §4.4
# overlapping correlated-scalar-subquery shape — the still-declared
# `min_cost_supplier` keeps the fact-vs-own-aggregate family's driver
# row). DECIMAL accumulate -> one double cast (the r12 money contract).
SMALL_QTY_SQL = """
    WITH li AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM read_parquet('{sf}/lineitem.parquet') l
        JOIN read_parquet('{sf}/part.parquet') p ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#12'
    ), thresh AS (
        SELECT l_partkey AS t_partkey, AVG(l_quantity) * 0.2 AS qty_thresh
        FROM li GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        AS avg_yearly
    FROM li JOIN thresh ON l_partkey = t_partkey
    WHERE l_quantity < qty_thresh
"""


def test_small_qty_part_revenue_matches_duckdb_twin(spark):
    from azure_etl_databricks_sql_powerbi_spark.plans import gold

    out = gold.small_quantity_part_revenue(
        spark.read.parquet(f"{SF}/lineitem.parquet"),
        spark.read.parquet(f"{SF}/part.parquet"),
    )
    orc = duckdb.sql(SMALL_QTY_SQL.format(sf=SF)).df()
    assert compare(out, orc, float_tol=0) == []
