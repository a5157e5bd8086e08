"""Decompose fuzzy_customer_pairs' sf0.1->sf1 wall ratio (r10 VERDICT
item 6: at 5.2x it was the worst non-exempt ratio on the board and the
number needed an owner).

The multi-pass SNM contract says CANDIDATES are linear (N x window per
pass), so a ratio approaching 10x at 10x data is what linear compute
looks like once fixed overhead stops dominating — the question is
whether the growth is (a) candidate volume (linear, healthy), (b)
verify-stage Levenshtein density (super-linear pair survival), or (c) a
stage whose cost is not linear. This script measures, interleaved in ONE
session (the A/B discipline):

  1. candidate pairs ENTERING the levenshtein verify (post rank-window +
     length filter, pre edit-distance) at both scales — the linearity
     check;
  2. emitted pairs at both scales;
  3. wall for the sort/rank stage alone vs the full query — the
     overhead split.

Run: python tools/fuzzy_sf1_decomp.py   (writes stdout; paste into
BENCH_SF1.md's note)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from azure_etl_databricks_sql_powerbi_spark.operators.fuzzy import (  # noqa: E402
    _global_sorted_rank,
    multi_pass_snm_pairs,
    snm_candidate_pairs,
)
from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.1"
SF_BIG = os.path.join(REPO, ".data", "sf1")
WINDOW, MAXD = 10, 2


def _candidates(df):
    """Pairs entering the levenshtein verify for ONE pass (forward sort)
    — the operator's OWN candidate stage (operators/fuzzy.
    snm_candidate_pairs), so the decomposition can never drift from the
    shipped plan."""
    return snm_candidate_pairs(df, "c_name", "c_custkey", WINDOW, MAXD).count()


def main() -> None:
    spark = get_spark(app_name="fuzzy-sf1-decomp")
    spark.sparkContext.setLogLevel("WARN")
    for rep in range(2):
        for sf in (SF_SMALL, SF_BIG):
            cust = spark.read.parquet(f"{sf}/customer.parquet")
            n = cust.count()

            t0 = time.perf_counter()
            _global_sorted_rank(
                cust.select("c_custkey", "c_name"), ["c_name", "c_custkey"], 32
            ).write.format("noop").mode("overwrite").save()
            t_rank = time.perf_counter() - t0
            spark.catalog.clearCache()

            cand = _candidates(cust)
            spark.catalog.clearCache()

            t0 = time.perf_counter()
            out = multi_pass_snm_pairs(cust, "c_name", "c_custkey", WINDOW, MAXD)
            emitted = out.count()
            t_full = time.perf_counter() - t0
            spark.catalog.clearCache()

            print(
                f"rep{rep} {sf}: N={n} candidates(fwd pass)={cand} "
                f"emitted={emitted} t_rank={t_rank:.2f}s t_full={t_full:.2f}s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
