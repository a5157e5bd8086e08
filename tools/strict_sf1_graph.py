"""sf1 hash-exactness gate for the graph-tier oracles (round 8).

The four r8 graph queries have depth-bounded SQL twins (no unbounded
recursion), so unlike the closure oracles they CAN run in DuckDB at sf1
— but the triangle twin materializes the oriented wedge set (413M rows
on the sf1 co-order graph, measured) and DuckDB's default configuration
spills it to temp storage whose on-disk format amplified past the
container's free disk ("No space left on device"). The engine-side
Spark plan streams the same wedges through a pipelined hash join in
~50 s; the oracle, not the engine, needs the resource help. So this
gate runs the committed oracle SQL (verbatim from
``__spark_entry__.oracle_sql()``) on a connection configured for the
job: an explicit in-RAM budget (the 413M-row join needs ~25 GB; the
host has 128 GB) and insertion-order preservation off.

Usage::

    python /root/repo/tools/strict_sf1_graph.py
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from strict_oracle_check import canon  # noqa: E402

from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402

SF1 = os.path.join(REPO, ".data", "sf1")
# Default gate set: the depth-bounded twins DuckDB CAN evaluate at sf1.
# The triangle-family twins (triangle_counts_parts AND
# clustering_coefficients_parts — the latter embeds the same CTE chain)
# are excluded by measurement, not choice: their wedge materialization
# (413M rows on the sf1 co-order graph) spills past the container's
# 80 GB free disk even under a 96 GB RAM budget — the Spark plan
# pipelines the identical wedges in ~50 s; both stay hash-proven at
# sf0.01 (driver gate) and sf0.1 (strict_oracle_check). Pass query
# names to override.
QUERIES = [
    "label_propagation_parts",
    "personalized_pagerank_suppliers",
]


def main() -> int:
    global QUERIES
    if len(sys.argv) > 1:
        QUERIES = sys.argv[1:]
    spark = get_spark(app_name="strict-sf1-graph", master="local[8]")
    Q, O = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    # RAM-derived limit (~75% of physical memory) instead of a hard-coded
    # 96GB: on a smaller host the old constant over-committed and DuckDB
    # OOM-killed the process instead of spilling.
    total_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 2**30
    con.execute(f"SET memory_limit='{max(1, int(total_gb * 0.75))}GB'")
    con.execute("SET preserve_insertion_order=false")
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF1}/lineitem.parquet')"
    )
    ok_all = True
    for n in QUERIES:
        t0 = time.time()
        sp = Q[n](spark, SF1).toPandas()
        t1 = time.time()
        orc = con.execute(O[n]).df()
        t2 = time.time()
        a, b = canon(sp), canon(orc)
        exact = (
            list(a.columns) == list(b.columns) and len(a) == len(b) and a.equals(b)
        )
        print(
            f"{n} rows {len(a)} EXACT {exact} "
            f"(spark {t1 - t0:.0f}s, duckdb {t2 - t1:.0f}s)",
            flush=True,
        )
        ok_all = ok_all and exact
    print("ALL_EXACT", ok_all)
    spark.stop()
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
