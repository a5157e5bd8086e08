"""Driver simulation: run every declared query against the DuckDB oracle
at sf0.01 under a PLAIN SparkSession (not the engine's ``get_spark``) —
the shape the round driver uses, so hidden dependencies on engine session
confs surface here, not in the round.

Usage (from anywhere; a foreign cwd is part of the test — it catches
closures that unpickle engine globals by module name)::

    python /root/repo/tools/drive_driver.py

Exit 0 = every oracle-backed query matches (within float tolerance) and
every rows-only query runs. See tools/strict_oracle_check.py for the
harsher hash-exact gate.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from oracle_harness import compare, duckdb_conn  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .appName("drive-driver")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

df = e.entry(spark)
rows = df.collect()
assert len(rows) > 0, "entry returned 0 rows"
print(f"entry: {len(rows)} rows OK", flush=True)

con = duckdb_conn(SF)
qs = e.queries()
sqls = e.oracle_sql()
fails = []
for name in qs:
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF)
        if name in sqls:
            odf = con.execute(sqls[name]).fetchdf()
            errs = compare(sdf, odf, float_tol=1e-6)
            status = "PASS" if not errs else "FAIL " + "; ".join(errs[:2])
        else:
            status = f"rows-only {sdf.count()}"
    except Exception as ex:
        status = f"ERROR {type(ex).__name__}: {ex}"[:200]
    if "FAIL" in status or "ERROR" in status:
        fails.append(name)
    print(f"{name:35s} {time.time() - t0:6.1f}s {status}", flush=True)
print("FAILS:", fails)
spark.stop()
sys.exit(1 if fails else 0)
