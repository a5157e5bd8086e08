"""Gold/BI analytical queries (SURVEY.md §2.3 J2, §2.4 A5/A6, §2.5 W2/W3).

These are the star-schema queries Power BI would issue against the
reference's gold layer, expressed as Catalyst plans:

- dimensions are broadcast (``F.broadcast``) — no shuffle of the fact side
  for the join itself; only the final aggregate shuffles, and that after
  map-side partial aggregation of a few grouping keys.
- filters sit directly on the fact scan so parquet predicate pushdown and
  partition pruning bound the IO (at 100 TB this is the difference between
  scanning a week and scanning the lake).
- money aggregates follow the r12 DECIMAL-accumulate contract
  (``util.money_sum``): sums and products of 2-dp money columns
  accumulate in DecimalType (order-independent, exact), round — if at
  all — on the exact decimal, and cast to double ONCE at the edge;
  means/shares are UNROUNDED IEEE quotients of exact numerators.
  ``ROUND(SUM(double), 2)`` looks stable but diverges across engines at
  half-cent boundaries (two real one-cent splits surfaced in the r11
  sf1 sweep); quantity sums stay raw doubles because whole-number
  addends sum exactly in any order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.util import (
    disc_price,
    exact_avg,
    money_sum,
)


def pricing_summary(lineitem: DataFrame, ship_cutoff: str = "2001-09-01") -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing/returns rollup of the fact table.

    One scan of lineitem (only 7 columns read), map-side partial agg into
    4 groups -> tiny shuffle. The canonical 'curated analytics table' the
    reference's gold layer feeds to Power BI (README.md:10-11,27).
    """
    # Money math follows the r12 DECIMAL-accumulate sweep (util.money_sum
    # rationale): exact decimal sums / products, ONE double cast at the
    # end, and UNROUNDED IEEE quotients for the averages. Factor types
    # stay tight (price DECIMAL(12,2), rate DECIMAL(3,2)) so the 3-factor
    # sum_charge product keeps full precision under the 38-digit cap.
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_c = F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast(
        "decimal(3,2)"
    )
    tax_c = F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(3,2)")
    return (
        lineitem.filter(F.col("l_shipdate") < F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            F.round(F.sum(price * disc_c), 2).cast("double").alias(
                "sum_disc_price"
            ),
            F.round(F.sum(price * disc_c * tax_c), 2).cast("double").alias(
                "sum_charge"
            ),
            exact_avg("l_quantity", cents=False).alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
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
                F.sum(
                    disc_price()
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
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
            money_sum("o_totalprice").alias("total_price"),
            exact_avg("o_totalprice").alias("avg_price"),
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
        .agg(money_sum("o_totalprice").alias("revenue"))
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
        .agg((money_sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


def customer_order_running_total(orders: DataFrame) -> DataFrame:
    """Running revenue per customer over order time (W2)."""
    from azure_etl_databricks_sql_powerbi_spark.operators.windows import running_agg

    # The cumulative sum accumulates in DECIMAL (cast BEFORE the window)
    # so every prefix total is exact; one double cast replaces the old
    # ROUND(double, 2), which could land a prefix on a half-cent boundary
    # and split across engines (the r12 money sweep).
    out = running_agg(
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
        ),
        partition_by=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        agg_col="o_totalprice",
        out_col="running_revenue",
    )
    return out.withColumn(
        "o_totalprice", F.col("o_totalprice").cast("double")
    ).withColumn("running_revenue", F.col("running_revenue").cast("double"))


def trade_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str,
    nation_b: str,
) -> DataFrame:
    """TPC-H-Q7-shaped bilateral trade volume: revenue shipped between two
    nations (either direction) by supplier nation, customer nation, year.

    The 2-nation filter is applied to BOTH broadcast nation dims before the
    join, so fact rows for the other 23 nations drop at the (broadcast)
    join instead of surviving to a post-join filter; only the cross pairs
    (A,A)/(B,B) need the residual inequality. The fact side shuffles once
    (lineitem<->orders on the order key); the four dims ride broadcasts.
    """
    picked = [nation_a, nation_b]
    n_cust = nation.where(F.col("n_name").isin(picked)).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    n_supp = nation.where(F.col("n_name").isin(picked)).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(
                    disc_price()
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    target_nation: str,
    part_type: str,
    market_region: str,
) -> DataFrame:
    """TPC-H-Q8-shaped market share: the target nation's share of revenue
    for one part type sold into one region's customers, by order year.

    Selective dims filter FIRST (part type, region), then broadcast — the
    fact is pruned by the most selective predicate (part type) at the
    first join. The share is a conditional-sum ratio inside one aggregate
    pass, not two scans.
    """
    p = part.where(F.col("p_type") == part_type).select("p_partkey")
    r = region.where(F.col("r_name") == market_region).select("r_regionkey")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    # exact decimal volume; the share is an UNROUNDED IEEE quotient of
    # the two exact sums (ROUND(x, 6) of a quotient is the cross-engine
    # half-at-6dp hazard — the r12 money sweep)
    vol = disc_price()
    return (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cr_key") == F.col("r_regionkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == target_nation, vol).otherwise(
                        F.lit(0).cast("decimal(16,4)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def large_quantity_orders(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    min_total_qty: float = 300.0,
    k: int = 100,
) -> DataFrame:
    """TPC-H-Q18-shaped: customers whose orders exceed a total-quantity
    threshold — aggregate the fact FIRST (map-side partial sum on the
    order key), filter to the rare heavy orders, then join the tiny
    survivor set to orders/customer (AQE turns the survivor join into a
    broadcast at runtime). Deterministic top-k via TakeOrdered with a key
    tiebreak.
    """
    heavy = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > min_total_qty)
    )
    return (
        orders.join(heavy, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def bracket_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H-Q19-shaped: one revenue figure under an OR-of-ANDs predicate
    over part attributes x line quantity brackets. The whole disjunction
    is a single Catalyst filter after one broadcast join — brands/sizes
    prune the part dim before broadcast, quantity brackets evaluate on the
    fact side; no UNION of three scans.
    """
    p = part.where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") >= 1)
    ).select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            F.round(
                F.sum(
                    disc_price()
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


def sole_return_supplier(
    lineitem: DataFrame, supplier: DataFrame, k: int = 100
) -> DataFrame:
    """TPC-H-Q21-shaped semi+anti composition: suppliers who were the ONLY
    supplier with returned ('R') lines in multi-supplier orders.

    Both EXISTS branches are key-equi joins with a residual supplier
    inequality — they stay LeftSemi/LeftAnti on the order-key shuffle
    (asserted in tests/test_plan_shapes.py), never materializing the
    probe side. l1 is deduped to (order, supplier) pairs first so a
    supplier with several R-lines in one order counts that order once.
    """
    l1 = (
        lineitem.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others = lineitem.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    r_others = lineitem.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    waited = l1.join(
        others,
        (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
        "left_semi",
    ).join(
        r_others,
        (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
        "left_anti",
    )
    return (
        waited.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(k)
    )


def min_cost_supplier(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame, max_size: int = 10
) -> DataFrame:
    """TPC-H-Q2-shaped correlated-min lookup: for each small part, the
    supplier observed at the minimum per-unit price.

    The Q2 correlated subquery (``ps_supplycost = (SELECT MIN ...)``)
    becomes a window min over the per-(part, supplier) aggregate — one
    shuffle on the part key serves both the aggregate and the window, and
    the part/supplier dimensions broadcast onto the tiny winner set.

    The measure is ``MIN(l_extendedprice / l_quantity)`` — a min over
    exact IEEE divisions, so it is order-independent and bit-identical in
    any engine (an AVG here would make the argmin depend on summation
    order); it is also emitted raw, unrounded, for the same reason.
    Ties resolve to the lowest s_suppkey via row_number.
    """
    from pyspark.sql import Window

    unit = lineitem.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    per_ps = unit.groupBy("l_partkey", "l_suppkey").agg(
        F.min("unit_price").alias("min_unit_price")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("min_unit_price").asc(), F.col("l_suppkey").asc()
    )
    best = (
        per_ps.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        best.join(
            F.broadcast(part.where(F.col("p_size") < max_size)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            # raw double, NOT rounded: a min over exact IEEE divisions is
            # bit-identical across engines, while ROUND of a computed
            # division diverges (Spark decimal-string HALF_UP vs numeric
            # rounding) on values like 0.12625
            F.col("min_unit_price").alias("best_unit_price"),
        )
        .orderBy("p_partkey")
    )


def important_suppliers(lineitem: DataFrame, fraction: float = 0.001) -> DataFrame:
    """TPC-H-Q11-shaped scalar-subquery threshold: suppliers whose revenue
    exceeds ``fraction`` of GLOBAL revenue.

    The global total is a one-row aggregate joined in as a scalar (a
    broadcast nested-loop of exactly one row — the allow-listed scalar
    subquery shape); the per-supplier aggregate shuffles once on s_suppkey.
    """
    # revenue accumulates in DECIMAL so BOTH the threshold comparison and
    # the reported value are exact: with raw double sums the strict
    # inequality can flip for a boundary supplier across engines, and
    # ROUND of the double sum is the half-cent hazard (r12 money sweep).
    # The threshold itself is one IEEE product of the exact total.
    rev = F.sum(disc_price())
    per_supp = lineitem.groupBy("l_suppkey").agg(rev.alias("__rev_dec"))
    total = lineitem.agg(
        (rev.cast("double") * F.lit(fraction)).alias("__threshold")
    )
    return (
        per_supp.join(F.broadcast(total))
        .where(F.col("__rev_dec").cast("double") > F.col("__threshold"))
        .select(
            "l_suppkey",
            F.round("__rev_dec", 2).cast("double").alias("supp_revenue"),
        )
        .orderBy(F.col("supp_revenue").desc(), F.col("l_suppkey").asc())
    )


def top_quarter_shippers(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """TPC-H-Q15-shaped view + global-max join: per quarter, the
    supplier(s) with the maximum shipped quantity.

    The 'revenue view' is the per-(quarter, supplier) aggregate; the Q15
    equality against ``(SELECT MAX(...))`` is a broadcast join against the
    per-quarter max of that same aggregate (computed once, reused — Spark
    plans the reused aggregate as one exchange under AQE). The measure is
    ``SUM(l_quantity)`` — integral, so the max-equality is exact in every
    engine; Q15's sum-of-doubles equality would be summation-order lore.
    """
    q = lineitem.select(
        F.concat(
            F.year("l_shipdate").cast("string"),
            F.lit("-Q"),
            F.quarter("l_shipdate").cast("string"),
        ).alias("quarter"),
        "l_suppkey",
        "l_quantity",
    )
    view = q.groupBy("quarter", "l_suppkey").agg(
        F.sum("l_quantity").cast("long").alias("total_qty")
    )
    mx = view.groupBy("quarter").agg(F.max("total_qty").alias("max_qty"))
    return (
        view.join(F.broadcast(mx), "quarter")
        .where(F.col("total_qty") == F.col("max_qty"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("quarter", "s_suppkey", "s_name", "total_qty")
        .orderBy("quarter", "s_suppkey")
    )


def part_supplier_breadth(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame
) -> DataFrame:
    """TPC-H-Q16-shaped NOT-IN + COUNT DISTINCT: per (brand, type, size),
    how many DISTINCT suppliers shipped the part — excluding suppliers in
    bad standing (negative account balance), Q16's complaint-supplier
    NOT IN rendered as a broadcast anti-join (null-safe by construction:
    the exclusion key list is a projection of a non-null PK).
    """
    excluded = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        lineitem.join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


def dominant_shippers(
    lineitem: DataFrame, supplier: DataFrame, share: float = 0.2
) -> DataFrame:
    """TPC-H-Q20-shaped nested-threshold semi-join: suppliers who shipped
    more than ``share`` of some part's total quantity (a dominant source
    for that part), resolved to supplier names via left-semi.

    Inner aggregate (part, supplier) and part-total aggregate share the
    l_partkey shuffle; the comparison is exact (sums of integral
    quantities < 2^53). The supplier table never joins the fact — only the
    winner keys, as a left-semi.
    """
    per_ps = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("ps_qty")
    )
    per_p = per_ps.groupBy("l_partkey").agg(F.sum("ps_qty").alias("p_qty"))
    dominant = (
        per_ps.join(per_p, "l_partkey")
        .where(F.col("ps_qty") > F.lit(share) * F.col("p_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


def revenue_change_q6(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H-Q6-shaped forecast-revenue-change: one filtered scan, one
    global sum. Every predicate (shipdate range, discount band, quantity
    cap) sits directly on the parquet scan, so pushdown + min/max row-group
    skipping bound the IO; the aggregate is a single map-side partial sum
    with a 1-row exchange. The cheapest possible plan shape at 100 TB.
    """
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * F.col("l_discount").cast("decimal(3,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


def product_profit_q9(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_token: str = "widget",
    cost_ratio: float = 0.1,
) -> DataFrame:
    """TPC-H-Q9-shaped product-profit by nation and year.

    Adaptation (testdata has no partsupp/ps_supplycost): supply cost is
    modeled as ``cost_ratio * p_retailprice * l_quantity``, keeping Q9's
    structure — fact joined to a *filtered* part dim (name contains a
    token), supplier -> nation for the grouping key, orders for the year.
    part/supplier/nation broadcast; the part filter prunes the fact rows
    early (join-side filter, not post-aggregate). One shuffle for the
    (nation, year) aggregate.

    Money math is exact DecimalType end-to-end: ``ROUND(SUM(double), 2)``
    lands on half-cent boundaries where double accumulation order and
    rounding mode diverge across engines (observed: one row off by exactly
    one cent vs a DuckDB oracle). Each money input is cast to a tight
    decimal (exact, since the source doubles carry <=2 decimal places),
    the profit expression is computed and summed exactly, the exact
    decimal is rounded HALF_UP (both Spark and DuckDB round decimals half
    away from zero), and only the final value is cast to double to
    canonicalize the output representation.
    """
    ext = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    retail = F.col("p_retailprice").cast("decimal(12,2)")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    ratio = F.lit(cost_ratio).cast("decimal(6,4)")
    profit = (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").contains(name_token))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (
                ext * (F.lit("1.00").cast("decimal(3,2)") - disc)
                - ratio * retail * qty
            ).alias("amount"),
        )
    )
    return (
        profit.groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def returned_items_q10(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H-Q10-shaped returned-item report: top-k customers by revenue
    lost to returns in one quarter.

    The orders date filter is pushed to the orders scan (one quarter of
    orders joins the fact, not seven years); the returnflag filter is
    pushed to the lineitem scan. customer/nation broadcast. Top-k is
    TakeOrderedAndProject — no global sort materialization.

    Revenue is summed in exact DecimalType then rounded and cast to
    double at the edge — ``ROUND(SUM(double), 2)`` diverges by one cent
    across engines on half-cent boundaries (see product_profit_q9).
    """
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit("1.00").cast("decimal(3,2)")
        - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(k)
    )


def priority_line_health_q12(
    lineitem: DataFrame,
    orders: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H-Q12-shaped conditional-count join (adapted: testdata has no
    l_shipmode/l_receiptdate, so the grouping key is l_linestatus and the
    'late' window is the shipdate year).

    Structure preserved from Q12: fact filtered on a date range, joined to
    orders, and per group a CASE-conditional count splits critical
    (1-URGENT/2-HIGH) from other priorities — map-side partial aggregation
    of two counters per group, one tiny shuffle.
    """
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def promo_revenue_q14(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-02-01",
) -> DataFrame:
    """TPC-H-Q14-shaped promo-revenue share: percentage of one month's
    revenue coming from PROMO-type parts.

    Date filter pushed to the fact scan (one month of lineitem), part
    broadcast, both the conditional and total sums computed in ONE
    aggregate pass (no second scan, no self-join).
    """
    # exact decimal numerator/denominator, UNROUNDED IEEE arithmetic for
    # the percentage (r12 money sweep: ROUND of a money quotient is the
    # cross-engine half-at-4dp hazard); 100.0 * num / den associates
    # left-to-right on both sides
    dp = disc_price()
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", dp).otherwise(
                        F.lit(0).cast("decimal(16,4)")
                    )
                ).cast("double")
                / F.sum(dp).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


def stats_profile(lineitem: DataFrame) -> DataFrame:
    """Statistical profile of the fact table per return flag: sample
    correlation / covariance / stddev / variance of quantity vs price.

    All five moments come out of ONE hash-aggregate pass (Spark computes
    them as streaming moment accumulators with map-side partials) — a
    single scan + tiny shuffle regardless of fact size. Definitions are
    the sample (n-1) variants, matching DuckDB/ANSI corr/covar_samp/
    stddev_samp/var_samp bit-for-bit at double precision.
    """
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "qty_price_covar"
            ),
            F.round(F.stddev("l_extendedprice"), 4).alias("price_stddev"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        )
        .orderBy("l_returnflag")
    )
