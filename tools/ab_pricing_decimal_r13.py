"""r12 VERDICT directive #6: own the pricing_summary decimal tax or trim
it (0.35s -> 1.51s at sf1 was the densest money-sweep conversion).

Three variants, interleaved min-of-3 in ONE session (the A/B
discipline):

A. shipped   — plans/gold.pricing_summary (decimal contract).
B. pre-fused — the per-row decimal products projected ONCE below the
   aggregate (hand-CSE: dp = price*(1-d) feeds both sum_disc_price and
   sum_charge's 3-factor product), aggregates over plain columns. If
   Catalyst already eliminates the shared subexpression (or re-inlines
   the projection), B == A and the fusion is a no-op.
C. double    — the pre-r12 float arithmetic (ROUND(SUM(double),2)); NOT
   hash-exact at sf1 (the r11 half-cent postmortem), measured only as
   the intrinsic-cost reference: A - C is the price of exactness.

Also prints whether A and B produce the same physical agg expression
count (the "computed once?" question is answered by the plan, not the
stopwatch).
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from azure_etl_databricks_sql_powerbi_spark.plans.gold import pricing_summary  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.util import exact_avg, money_sum  # noqa: E402

SF_DIR = os.environ.get("AB_SF_DIR", os.path.join(REPO, ".data", "sf1"))
CUT = "2001-09-01"


def variant_b(lineitem: DataFrame) -> DataFrame:
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_c = F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast(
        "decimal(3,2)"
    )
    tax_c = F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(3,2)")
    # two selects so __charge genuinely REUSES the __dp column (a single
    # select cannot reference a sibling alias) — the hand-CSE under test
    pre = (
        lineitem.filter(F.col("l_shipdate") < F.lit(CUT).cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            (price * disc_c).alias("__dp"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "__dp",
            (F.col("__dp") * tax_c).alias("__charge"),
        )
    )
    return (
        pre.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            F.round(F.sum("__dp"), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum("__charge"), 2).cast("double").alias("sum_charge"),
            exact_avg("l_quantity", cents=False).alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def variant_c(lineitem: DataFrame) -> DataFrame:
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") < F.lit(CUT).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(
                F.sum(disc_price * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def main() -> None:
    spark = get_spark(app_name="ab-pricing", master="local[32]")
    li = load_table(spark, SF_DIR, "lineitem")

    variants = {
        "A_shipped": lambda: pricing_summary(li),
        "B_prefused": lambda: variant_b(li),
        "C_double": lambda: variant_c(li),
    }
    # plan diagnostics: count decimal multiplies in the partial-agg
    # stage of A vs B
    for name in ("A_shipped", "B_prefused"):
        plan = variants[name]()._jdf.queryExecution().executedPlan().toString()
        n_mult = plan.count("CheckOverflow")
        print(f"{name}: CheckOverflow nodes in plan = {n_mult}")

    times: dict[str, list[float]] = {n: [] for n in variants}
    for rep in range(3):
        for name, build in variants.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build().collect()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f}s reps={['%.3f' % t for t in ts]}")
    # exactness: A == B cell-for-cell
    a = pricing_summary(li).toPandas().astype(str)
    b = variant_b(li).toPandas().astype(str)
    print("A == B cell-for-cell:", a.equals(b))
    spark.stop()


if __name__ == "__main__":
    main()
