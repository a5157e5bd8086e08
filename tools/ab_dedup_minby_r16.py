"""r16: interleaved A/B — exact-dedup min-id per md5 as a window
(row_number over partitionBy(md5(text)) orderBy(id), the shipped r5
shape) vs as ONE aggregate (groupBy(md5(text)).agg(min(id),
min_by(text, id))). The aggregate gets map-side partial aggregation
(duplicate texts collapse before the shuffle) and drops the
per-partition SORT of full-text rows (guide §2.2/§2.3). Kept rows are
identical by construction: min doc_id per md5 group, and every row in
a group carries the same text. Run: A,B alternating per round, full
pretraining_prep composition, noop sink, one session; result equality
checked via sorted row hash."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from azure_etl_databricks_sql_powerbi_spark.dedup.cluster import (  # noqa: E402
    shingle_edges,
)
from azure_etl_databricks_sql_powerbi_spark.functions import text as T  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.operators.chunking import (  # noqa: E402
    chunk_documents,
)
from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (  # noqa: E402
    leakage_safe_split,
)
from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.util import spread  # noqa: E402


def build(spark, sf_dir, variant):
    docs = load_table(spark, sf_dir, "documents")
    flags = T.gopher_quality_flags("text", min_words=10, max_words=200)
    gated = spread(docs).select("doc_id", "text").filter(flags["keep"] == 1)
    if variant == "window":
        w = Window.partitionBy(F.md5(F.col("text"))).orderBy(
            F.col("doc_id").asc()
        )
        deduped = (
            gated.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("doc_id", "text")
        )
    else:
        deduped = (
            gated.groupBy(F.md5(F.col("text")).alias("__fp"))
            .agg(
                F.min("doc_id").alias("doc_id"),
                F.min_by("text", F.col("doc_id")).alias("text"),
            )
            .select("doc_id", "text")
        )
    edges = shingle_edges(deduped, text_col="text", id_col="doc_id")
    split = leakage_safe_split(
        deduped, edges, {"train": 0.9, "val": 0.05, "test": 0.05},
        id_col="doc_id",
    )
    train = split.filter(F.col("split") == "train").select("doc_id", "text")
    return chunk_documents(
        train, text_col="text", id_col="doc_id", chunk_tokens=8, overlap=2
    )


def rowhash(df):
    return df.select(
        F.expr(
            "bit_xor(xxhash64(" + ", ".join(df.columns) + "))"
        ).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("N_ROUNDS", "3"))
    order = os.environ.get("AB_ORDER", "window,minby").split(",")
    spark = get_spark(app_name="ab-dedup-minby-r16")
    spark.sparkContext.setLogLevel("WARN")
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()

    ha = rowhash(build(spark, sf_dir, "window"))
    hb = rowhash(build(spark, sf_dir, "minby"))
    print(f"result equality: window={tuple(ha)} minby={tuple(hb)} "
          f"match={tuple(ha) == tuple(hb)}", flush=True)

    times = {v: [] for v in order}
    for r in range(rounds):
        for v in order:
            spark.catalog.clearCache()
            t0 = time.time()
            build(spark, sf_dir, v).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            times[v].append(dt)
            print(f"round {r} {v:7s} {dt:6.2f} s", flush=True)
    for v in order:
        print(f"{v:7s} min {min(times[v]):6.2f}  all "
              f"{['%.2f' % t for t in times[v]]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
