"""Silent-codegen-fallback sweep (VERDICT r14 "Next round" #3).

The r14 judge found `url_provenance_docs` running its main projection
INTERPRETED: a multi-reference expression blew Janino's 64 KB generated-
method limit, `ERROR CodeGenerator: Failed to compile` landed only in
executor stderr, and Spark silently degraded the stage — correctness
stayed EXACT, so nothing on the board noticed for two rounds. This tool
makes that failure class LOUD for every declared query:

- ``spark.sql.codegen.fallback=false`` — a whole-stage-codegen compile
  failure THROWS instead of silently interpreting the stage.
- ``spark.sql.codegen.factoryMode=CODEGEN_ONLY`` — expression-level
  codegen (UnsafeProjection / Predicate / Ordering, used outside WSCG)
  throws instead of falling back to interpreted evaluation.

Every `entry.queries()` callable is executed to completion (collect) at
the smoke scale under those confs; any Janino blowup anywhere in any
plan surfaces as a per-query failure. Run it after adding or touching
any Column-expression-heavy operator.

Usage::

    python /root/repo/tools/codegen_fallback_check.py            # all 150
    python /root/repo/tools/codegen_fallback_check.py q1 q2 ...  # specific

Prints one JSON line; exit 0 iff every checked query compiles.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402

from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_CODEGEN_SF", "/root/testdata/sf0.001")


def main() -> int:
    q_all = entry.queries()
    names = sys.argv[1:] or list(q_all)
    unknown = [n for n in names if n not in q_all]
    if unknown:
        # fail BEFORE the sweep: a typo'd name must not be reported as
        # a codegen failure while the intended query silently never runs
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark(app_name="codegen-sweep", master="local[8]")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    failures: dict[str, str] = {}
    plan_chars: dict[str, int] = {}
    for n in names:
        try:
            df = q_all[n](spark, SF)
            # optimized-plan size rides along as an observatory for the
            # NEXT blowup: the multi-reference class grows plan text long
            # before it breaks Janino (r13 measured 28.5M chars; healthy
            # queries sit well under 300k — the test_links bound).
            # Its OWN try: a failure stringifying a multi-megachar plan
            # must be reported as a measurement error, not masquerade as
            # a codegen failure — and must not skip the real check below
            try:
                plan_chars[n] = len(
                    df._jdf.queryExecution().optimizedPlan().toString()
                )
            except Exception as e:  # noqa: BLE001
                plan_chars[n] = -1
                print(
                    f"# plan-size measurement failed for {n}: {e}"[:200],
                    file=sys.stderr,
                )
            df.collect()
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            failures[n] = f"{type(e).__name__}: {e}"[:400]
    top = dict(
        sorted(plan_chars.items(), key=lambda kv: -kv[1])[:10]
    )
    print(
        json.dumps(
            {
                "sf": SF,
                "checked": len(names),
                "failures": failures,
                "top_plan_chars": top,
            }
        )
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
