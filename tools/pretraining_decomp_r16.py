"""r16 follow-up: decompose pretraining_prep (the slowest query on the
final r16 bench, 5.1 s at sf0.1) into cumulative stages — gate, dedup
window, shingle edges, CC+split, chunking — min-of-N, noop sink, same
discipline as opt_probe. Measurement only; decides whether any stage
has actionable structure left or the query sits at its composed floor."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("N_RUNS", "3"))
    spark = get_spark(app_name="pretraining-decomp-r16")
    spark.sparkContext.setLogLevel("WARN")
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()

    from pyspark.sql import Window
    from azure_etl_databricks_sql_powerbi_spark.dedup.cluster import (
        shingle_edges,
    )
    from azure_etl_databricks_sql_powerbi_spark.functions import text as T
    from azure_etl_databricks_sql_powerbi_spark.operators.chunking import (
        chunk_documents,
    )
    from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (
        leakage_safe_split,
    )
    from azure_etl_databricks_sql_powerbi_spark.util import spread

    def docs():
        return load_table(spark, sf_dir, "documents")

    def gated():
        flags = T.gopher_quality_flags("text", min_words=10, max_words=200)
        return (
            spread(docs()).select("doc_id", "text").filter(flags["keep"] == 1)
        )

    def deduped():
        w = Window.partitionBy(F.md5(F.col("text"))).orderBy(
            F.col("doc_id").asc()
        )
        return (
            gated()
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("doc_id", "text")
        )

    def edges():
        return shingle_edges(deduped(), text_col="text", id_col="doc_id")

    def split():
        return leakage_safe_split(
            deduped(),
            edges(),
            {"train": 0.9, "val": 0.05, "test": 0.05},
            id_col="doc_id",
        )

    def train():
        return (
            split().filter(F.col("split") == "train").select("doc_id", "text")
        )

    def full():
        from azure_etl_databricks_sql_powerbi_spark.plans.curation import (
            pretraining_prep,
        )

        return pretraining_prep(docs())

    stages = [
        ("gated", gated),
        ("deduped", deduped),
        ("edges", edges),
        ("split (CC+join+split)", split),
        ("train select", train),
        ("full (chunking on top)", full),
    ]
    for name, fn in stages:
        best = float("inf")
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        print(f"{name:28s} min-of-{n_runs}: {best:6.2f} s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
