"""Pre-flight diagnostics tests: skew profile / summary vs DuckDB twins
on real orders/lineitem, and the join-explosion estimate vs the ACTUAL
join's count — the strongest oracle there is for a cardinality formula."""

from __future__ import annotations

import duckdb

from oracle_harness import compare

from azure_etl_databricks_sql_powerbi_spark.operators.diagnostics import (
    join_explosion_estimate,
    key_skew_profile,
    skew_summary,
)

SF = "/root/testdata/sf0.001"

SKEW_PROFILE_SQL = """
    WITH per AS (
        SELECT o_custkey AS key, COUNT(*) AS cnt
        FROM read_parquet('{sf}/orders.parquet') GROUP BY o_custkey
    ),
    t AS (SELECT SUM(cnt) AS total FROM per),
    ranked AS (
        SELECT key, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS rank,
               SUM(cnt) OVER (ORDER BY cnt DESC, key ASC
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM per
    )
    SELECT CAST(rank AS INT) AS rank, key, cnt,
           cnt / total AS share, cum / total AS cum_share
    FROM ranked, t WHERE rank <= 10
"""

SKEW_SUMMARY_SQL = """
    WITH per AS (
        SELECT l_suppkey, COUNT(*) AS cnt
        FROM read_parquet('{sf}/lineitem.parquet') GROUP BY l_suppkey
    )
    SELECT SUM(cnt) AS n_rows, COUNT(*) AS n_keys,
           MAX(cnt) AS max_key_cnt,
           SUM(cnt) / COUNT(*) AS avg_key_cnt,
           MAX(cnt) / (SUM(cnt) / COUNT(*)) AS skew_ratio
    FROM per
"""


def test_key_skew_profile_matches_duckdb(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = key_skew_profile(orders, "o_custkey", top_n=10)
    orc = duckdb.sql(SKEW_PROFILE_SQL.format(sf=SF)).df()
    assert compare(out, orc, float_tol=1e-12) == []


def test_skew_summary_matches_duckdb(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    out = skew_summary(li, "l_suppkey")
    orc = duckdb.sql(SKEW_SUMMARY_SQL.format(sf=SF)).df()
    assert compare(out, orc, float_tol=1e-12) == []


def test_join_explosion_estimate_equals_actual_join(spark):
    """The formula's whole claim: join_rows == COUNT(*) of the real join."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    est = join_explosion_estimate(
        orders.selectExpr("o_orderkey AS k"), li.selectExpr("l_orderkey AS k"), ["k"]
    ).collect()[0]
    actual = (
        orders.selectExpr("o_orderkey AS k")
        .join(li.selectExpr("l_orderkey AS k"), "k")
        .count()
    )
    assert est.join_rows == actual
    assert est.left_rows == orders.count()
    assert est.right_rows == li.count()
    assert est.amplification == actual / max(est.left_rows, est.right_rows)


def test_join_explosion_flags_many_to_many(spark):
    """A many-to-many key must report the multiplied cardinality, and a
    disjoint key set must report zero (the coalesce path)."""
    a = spark.createDataFrame([(1,)] * 3 + [(2,)], "k int")
    b = spark.createDataFrame([(1,)] * 4, "k int")
    est = join_explosion_estimate(a, b, ["k"]).collect()[0]
    assert est.join_rows == 12 and est.matching_keys == 1
    disjoint = join_explosion_estimate(
        a, spark.createDataFrame([(9,)], "k int"), ["k"]
    ).collect()[0]
    assert disjoint.join_rows == 0 and disjoint.matching_keys == 0
