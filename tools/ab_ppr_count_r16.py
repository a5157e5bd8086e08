"""Interleaved A/B (r16): personalized pagerank with vs without the
pre-loop node count. One session, alternating variants, min over rounds.
Same methodology as opt_probe (noop sink after warmup)."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.graph import pagerank as prmod  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-ppr-count-r16")
    spark.sparkContext.setLogLevel("WARN")
    qs = entrymod.queries()
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()

    fn = qs["personalized_pagerank_suppliers"]
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    res = {"always_count": [], "skip_count": []}
    order = [("skip_count", False), ("always_count", True)]
    if os.environ.get("AB_FLIP"):
        order.reverse()
    for r in range(rounds):
        for label, flag in order:
            prmod._AB_ALWAYS_COUNT = flag
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            res[label].append(round(time.monotonic() - t0, 3))
    print({k: (min(v), v) for k, v in res.items()})


if __name__ == "__main__":
    main()
