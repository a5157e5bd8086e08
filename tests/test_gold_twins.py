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
