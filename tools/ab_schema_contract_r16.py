"""Interleaved A/B (r16): declared-schema catalog reads vs per-call
footer inference, over a broad sample of declared queries (bench
methodology: noop sink, clearCache between queries). One session,
alternating variants per round, sum + per-query min reported."""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.sources import files as filesmod  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402

# a cross-tier sample: gold stars, text, ops, crawl, ANN, graph — mostly
# the fixed-cost tail the schema contract targets, plus two heavies as
# controls
SAMPLE = [
    "pricing_summary", "revenue_change_q6", "trade_volume_q7",
    "market_share_q8", "promo_revenue_q14", "top_quarter_shippers",
    "min_cost_supplier", "order_priority_exists", "idle_customer_balance",
    "price_histogram", "vocab_top100", "salient_terms",
    "repetition_ratio_docs", "pii_scrub_docs", "chunk_documents_rag",
    "stratified_sample_docs", "resample_daily_ffill", "cohort_retention",
    "funnel_conversion", "asof_forward_tolerance", "merge_upsert_orders",
    "skewed_join_salted", "dpp_priority_revenue", "triplet_candidates",
    "doc_fingerprint", "dataset_split_summary", "heavy_hitter_tokens",
    "url_provenance_docs", "bm25_rank_docs", "customer_order_distribution",
    "pagerank_supplier_part", "fuzzy_customer_pairs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-schema-contract-r16")
    spark.sparkContext.setLogLevel("WARN")
    qs = entrymod.queries()
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _noop(s):
        return s

    spark.range(256).repartition(
        int(spark.sparkContext.defaultParallelism)
    ).select(_noop(F.col("id"))).write.format("noop").mode("overwrite").save()

    rounds = int(os.environ.get("AB_ROUNDS", "2"))
    res = {"declared": {}, "inferred": {}}
    order = [("inferred", False), ("declared", True)]
    if os.environ.get("AB_FLIP"):
        order.reverse()
    for _ in range(rounds):
        for label, flag in order:
            filesmod._USE_CATALOG_SCHEMAS = flag
            for name in SAMPLE:
                t0 = time.monotonic()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.monotonic() - t0
                prev = res[label].get(name)
                res[label][name] = min(prev, dt) if prev else dt
                spark.catalog.clearCache()
    tot = {k: round(sum(v.values()), 3) for k, v in res.items()}
    per = {
        n: (round(res["inferred"][n], 3), round(res["declared"][n], 3))
        for n in SAMPLE
    }
    print(json.dumps({"totals_min_sum": tot, "per_query_inf_vs_decl": per}))


if __name__ == "__main__":
    main()
