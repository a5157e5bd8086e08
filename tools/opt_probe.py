"""Optimization-round probe: time specific declared queries (same
methodology as bench.py — noop sink, min of 3) and dump their
``explain("formatted")`` to ``plans/r16/<q>_<tag>.txt``.

Usage::

    python tools/opt_probe.py TAG q1 q2 ...        # time + plan per query
    PROBE_RUNS=5 python tools/opt_probe.py TAG q1  # more repeats

Prints one JSON line {"tag": ..., "timings": {...}} at the end. Run on a
quiet box; interleave baseline/candidate probes in one session for A/B
claims (host shows cross-session drift — BENCH_TREND.md).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    runs = int(os.environ.get("PROBE_RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"opt-probe-{tag}")
    spark.sparkContext.setLogLevel("WARN")
    qs = entrymod.queries()

    # same warmup as bench.py: flagship plan + one pandas_udf noop
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _noop(s):
        return s

    spark.range(256).repartition(
        int(spark.sparkContext.defaultParallelism)
    ).select(_noop(F.col("id"))).write.format("noop").mode("overwrite").save()

    plandir = os.path.join(REPO, "plans", "r16")
    os.makedirs(plandir, exist_ok=True)
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        df = fn(spark, sf_dir)
        with open(os.path.join(plandir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        # the FINAL adaptive plan too: exchange/stage REUSE only
        # materializes there — the pre-execution dump prints a shared
        # subtree once per reference, overstating exchanges (r16). The
        # action must run through df's OWN QueryExecution (a noop write
        # command plans a SEPARATE one, leaving df's plan unfinalized),
        # but NOT via collect(): edge/pair-shaped queries return
        # corpus-sized outputs that would pile up on the driver at sf1+.
        # toLocalIterator holds at most one partition at a time.
        for _ in df.toLocalIterator():
            pass
        with open(os.path.join(plandir, f"{name}_{tag}_final.txt"), "w") as fh:
            fh.write(df._jdf.queryExecution().executedPlan().toString())
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"{tag}:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"tag": tag, "timings": timings}), flush=True)


if __name__ == "__main__":
    main()
