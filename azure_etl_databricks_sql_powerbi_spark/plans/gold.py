"""Gold/BI analytical queries (SURVEY.md §2.3 J2, §2.4 A5/A6, §2.5 W2/W3).

These are the star-schema queries Power BI would issue against the
reference's gold layer, expressed as Catalyst plans:

- dimensions are broadcast (``F.broadcast``) — no shuffle of the fact side
  for the join itself; only the final aggregate shuffles, and that after
  map-side partial aggregation of a few grouping keys.
- filters sit directly on the fact scan so parquet predicate pushdown and
  partition pruning bound the IO (at 100 TB this is the difference between
  scanning a week and scanning the lake).
- double aggregates are rounded at the edge so results are stable to
  float summation order (needed for the order-insensitive oracle hash;
  also what a BI surface would display).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, ship_cutoff: str = "2001-09-01") -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing/returns rollup of the fact table.

    One scan of lineitem (only 7 columns read), map-side partial agg into
    4 groups -> tiny shuffle. The canonical 'curated analytics table' the
    reference's gold layer feeds to Power BI (README.md:10-11,27).
    """
    return (
        lineitem.filter(F.col("l_shipdate") < F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def star_revenue_by_region(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Multi-hop star join: fact -> orders -> customer -> nation -> region.

    customer/nation/region are broadcast: the 100 TB fact never shuffles
    for the join. orders<->lineitem is the one real (key) shuffle; AQE
    picks SMJ or shuffled-hash and handles skew.

    The distinct order count is NOT a ``count_distinct`` over the joined
    fact — that dedups |lineitem| rows per group (measured: 2.7x the whole
    query at sf0.1). Because the dim hops are N:1, the count is computed
    on the orders side (semi-joined to lineitem so orders with no lines
    don't count, exactly matching COUNT(DISTINCT o_orderkey) post-join)
    and joined back to the revenue aggregate on the tiny group key.
    """
    dims = lambda df, key: (  # noqa: E731 — shared dim-hop chain
        df.join(F.broadcast(customer), F.col(key) == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    revenue = (
        dims(
            lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"]),
            "o_custkey",
        )
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    order_count = (
        dims(
            orders.join(
                lineitem, orders["o_orderkey"] == lineitem["l_orderkey"], "left_semi"
            ),
            "o_custkey",
        )
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
    return revenue.join(order_count, ["r_name", "n_name"]).orderBy(
        "r_name", "n_name"
    )


def sales_rollup(orders: DataFrame) -> DataFrame:
    """Grouping-sets KPI: rollup over (orderpriority, orderstatus) (A5)."""
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


def top_customers_by_segment(orders: DataFrame, customer: DataFrame, k: int = 3) -> DataFrame:
    """Top-k revenue customers per market segment (W3 + broadcast dim)."""
    per_customer = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .join(F.broadcast(customer), F.col("o_custkey") == customer["c_custkey"])
    )
    from azure_etl_databricks_sql_powerbi_spark.operators.windows import top_k_per_group

    return top_k_per_group(
        per_customer.select("c_mktsegment", "c_custkey", "c_name", "revenue"),
        group_by=["c_mktsegment"],
        order_by=["revenue"],
        k=k,
        tiebreak=["c_custkey"],
    ).orderBy("c_mktsegment", "rnk")


def small_quantity_part_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#12"
) -> DataFrame:
    """TPC-H-Q17-shaped: yearly revenue from small-quantity line items,
    'small' defined per part as < 20% of that part's own average quantity.

    The scale-relevant shape: a fact joined against an aggregate of itself.
    The brand filter (broadcast dim semi-join) prunes the fact FIRST, so
    both the per-part aggregate and the re-join run on the pruned subset;
    the per-part threshold table is orders of magnitude smaller than the
    fact and AQE converts the re-join to broadcast at runtime.
    """
    parts = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thresh = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_thresh")
    )
    return (
        li.join(thresh, on="l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def customer_order_running_total(orders: DataFrame) -> DataFrame:
    """Running revenue per customer over order time (W2)."""
    from azure_etl_databricks_sql_powerbi_spark.operators.windows import running_agg

    out = running_agg(
        orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        agg_col="o_totalprice",
        out_col="running_revenue",
    )
    return out.withColumn("running_revenue", F.round("running_revenue", 2))
