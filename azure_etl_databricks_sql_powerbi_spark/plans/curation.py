"""Training-data curation pipeline — the end-to-end composition of the
north-star text operators into one declarative plan:

    documents
      → language ID (keep English)                 [functions.text.lang_id]
      → quality gate (score >= threshold)          [functions.text.quality_score]
      → exact near-dup removal (min-id survivor)   [fingerprint + window]
      → per-doc stats out                          [token/char counts]

Everything is one Catalyst plan: scan → projection (all the text features,
computed once) → filter → one shuffle for the fingerprint window → final
projection. At 100 TB that is a single pass over the corpus plus a shuffle
of (fingerprint, doc_id) pairs — the canonical shape of a curation job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions import text as T
from azure_etl_databricks_sql_powerbi_spark.util import spread


def curate_documents(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Curated corpus: English, above the quality bar, content-deduped
    (lowest doc_id survives per fingerprint). Returns per-doc stats."""
    featured = spread(docs).select(
        F.col(id_col),
        T.lang_id(text_col).alias("pred_lang"),
        T.quality_score(text_col).alias("quality"),
        T.fingerprint_md5(text_col).alias("fp"),
        T.token_count(text_col).alias("n_tokens"),
        T.char_count(text_col).alias("n_chars"),
    )
    kept = featured.filter(
        (F.col("pred_lang") == lang) & (F.col("quality") >= min_quality)
    )
    w = Window.partitionBy("fp").orderBy(F.col(id_col).asc())
    return (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "quality", "n_tokens", "n_chars", "fp")
    )


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus 'data card': the summary a curation run publishes
    alongside the dataset (doc/source/language counts, token and char
    inventory, exact-duplicate rate).

    Single scan, one hash-aggregate — distinct counts are computed with
    count_distinct (Spark plans partial distinct aggregation; at 100 TB
    swap in approx_count_distinct if the 2-pass exact distinct on text
    is too hot, as qc.py's sketch path does). The dup rate is a raw
    long/long division — engine-exact, never rounded.
    """
    agg = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum(F.length(text_col)).cast("long").alias("total_chars"),
        F.sum(T.token_count(text_col)).cast("long").alias("total_tokens"),
        (F.count(F.lit(1)) - F.count_distinct(text_col)).alias("exact_dup_docs"),
    )
    return agg.select(
        "*",
        (F.col("exact_dup_docs") / F.col("n_docs")).alias("dup_rate"),
    )
