"""One-off sf0.1 -> sf1 scaling measurement (VERDICT-r5 directive #2).

Runs the expensive-tier queries at sf0.1 (driver-shipped) and sf1
(``tools/gen_sf1.py``, 10x rows) in ONE session, reps interleaved
(0.1, 1, 0.1, 1) so host co-tenancy drift hits both scales equally,
min-of-2 per (query, scale), ``clearCache`` between runs (the A/B
discipline from the round-1 postmortem). Each run fully materializes via
the noop sink, same as bench.py.

Writes ``BENCH_SF1.md`` with per-query wall-clock at both scales and the
ratio; a ratio near 10 is linear scaling, below 10 means fixed overhead
(scheduler, codegen, streaming engine) still dominates at sf1, above 10
names a super-linear suspect.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402

QUERIES = [
    "pretraining_prep",
    "full_curation_pipeline",
    "near_dup_clusters",
    "leakage_safe_split",
    "sessionize_stream",
    "stateful_running_totals",
    "semantic_dedup_embeddings",
    "stream_upsert_replay",
    "embedding_near_pairs_lsh",
    "ann_ivf_topk",
    "interval_join_stream",
    "novel_docs_day2",
]

SF_SMALL = "/root/testdata/sf0.1"
SF_BIG = os.path.join(REPO, ".data", "sf1")
REPS = 2


def main() -> None:
    # argv selects a subset (round-6 additions pattern); default = full list
    global QUERIES
    if len(sys.argv) > 1:
        QUERIES = sys.argv[1:]
    if not os.path.exists(os.path.join(SF_BIG, "documents.parquet")):
        raise SystemExit("run tools/gen_sf1.py first")
    spark = get_spark(app_name="bench-sf1")
    spark.sparkContext.setLogLevel("WARN")
    qs = entrymod.queries()

    # warm JVM + Python workers (bench.py pattern)
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()

    best: dict[tuple[str, str], float] = {}
    for name in QUERIES:
        fn = qs[name]
        for _rep in range(REPS):
            for sf_dir in (SF_SMALL, SF_BIG):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                key = (name, sf_dir)
                best[key] = min(best.get(key, float("inf")), dt)
                spark.catalog.clearCache()
        print(
            f"{name}: sf0.1 {best[(name, SF_SMALL)]:.2f}s  "
            f"sf1 {best[(name, SF_BIG)]:.2f}s",
            flush=True,
        )

    # Merge with the committed table (keyed by query name) so successive
    # measurement sessions extend the board instead of clobbering it.
    # Rows whose query is no longer DECLARED are pruned on rewrite
    # (ROTATION_POLICY.md §6): a retired/renamed query must not keep a
    # stale number on the board forever.
    declared = set(entrymod.queries().keys())
    table_path = os.path.join(REPO, "BENCH_SF1.table.md")
    rows: dict[str, str] = {}
    order: list[str] = []
    if os.path.exists(table_path):
        for line in open(table_path):
            parts = [p.strip() for p in line.strip().strip("|").split("|")]
            if len(parts) == 4 and parts[0] not in ("query", "---"):
                if not set(parts[0]) <= {"-"} and parts[0] in declared:
                    rows[parts[0]] = line.rstrip("\n")
                    order.append(parts[0])
    for name in QUERIES:
        a, b = best[(name, SF_SMALL)], best[(name, SF_BIG)]
        rows[name] = f"| {name} | {a:.2f} | {b:.2f} | {b / a:.1f}x |"
        if name not in order:
            order.append(name)
    lines = [
        "| query | sf0.1 (s) | sf1 (s) | ratio (10x data) |",
        "|---|---|---|---|",
    ] + [rows[n] for n in order]
    table = "\n".join(lines)
    print(table, flush=True)
    with open(table_path, "w") as fh:
        fh.write(table + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
