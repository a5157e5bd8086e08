"""One-session interleaved A/B for the r12 §4.3 window merge
(ROTATION_POLICY.md §5 swaps #6/#7): does `customer_order_windows`
actually cost less wall than the two queries it replaced?

A = the retired pair, recreated verbatim from the still-shipped
    operators (gold.customer_order_running_total; windows.lag_lead +
    datediff) — TWO actions, two Exchanges.
B = the merged driver query — ONE action, one Exchange, stacked
    Window nodes.

Interleaved A,B,A,B... min-of-N with clearCache between runs (the
round-1 postmortem discipline: only interleaved single-session numbers
are comparable). Full materialization via a count-style noop collect of
every column, matching bench.py's sink.

Usage::

    python /root/repo/tools/ab_window_merge_r12.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="ab-window-merge", master="local[32]")

    from azure_etl_databricks_sql_powerbi_spark.operators.windows import lag_lead
    from azure_etl_databricks_sql_powerbi_spark.plans import gold

    def run_retired_pair() -> None:
        orders = entry.load_table(spark, sf_dir, "orders")
        gold.customer_order_running_total(orders).write.format(
            "noop"
        ).mode("overwrite").save()
        lag_lead(
            orders.select("o_custkey", "o_orderkey", "o_orderdate"),
            partition_by=["o_custkey"],
            order_by=["o_orderdate", "o_orderkey"],
            col="o_orderdate",
            lag_col="prev_orderdate",
            lead_col="next_orderdate",
        ).withColumn(
            "gap_days", F.datediff("o_orderdate", "prev_orderdate")
        ).write.format("noop").mode("overwrite").save()

    def run_merged() -> None:
        entry.queries()["customer_order_windows"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()

    best = {"retired_pair": float("inf"), "merged": float("inf")}
    for _ in range(reps):
        for name, fn in (("retired_pair", run_retired_pair), ("merged", run_merged)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            best[name] = min(best[name], time.perf_counter() - t0)
    print(
        f"retired_pair={best['retired_pair']:.3f}s "
        f"merged={best['merged']:.3f}s "
        f"saving={(1 - best['merged'] / best['retired_pair']) * 100:.0f}%"
    )
    spark.stop()


if __name__ == "__main__":
    main()
