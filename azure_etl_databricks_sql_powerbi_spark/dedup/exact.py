"""Exact content deduplication (north-star dedup surface, hash-groupBy).

Fingerprint = hash of normalized text. Grouping on the fingerprint is one
hash aggregate with map-side partial aggregation; at 100 TB the shuffle
carries (hash, min_id, count) triples, never documents. ``xxhash64`` (8
bytes) is the scale default; ``md5`` is offered for oracle parity and
cross-system stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.text import (
    fingerprint_md5,
    fingerprint_xxhash,
)
from azure_etl_databricks_sql_powerbi_spark.util import spread


def dedup_exact_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", use_md5: bool = False
) -> DataFrame:
    """One row per distinct content fingerprint: canonical (min) id and
    duplicate count. ``canonical_id`` with ``n_dups`` is both the dedup
    verdict and the survivorship decision."""
    fp = fingerprint_md5(text_col) if use_md5 else fingerprint_xxhash(text_col)
    return (
        spread(df).select(fp.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def dedup_exact_keep_first(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Drop all but the lowest-id copy of each distinct content — a
    deterministic latest/first-per-fingerprint (window-free: min-id join
    back, broadcast-friendly when the dup set is small)."""
    fp = fingerprint_xxhash(text_col)
    with_fp = spread(df).withColumn("__fp", fp)
    canon = with_fp.groupBy("__fp").agg(F.min(id_col).alias("__keep"))
    return (
        with_fp.join(canon, on="__fp")
        .filter(F.col(id_col) == F.col("__keep"))
        .drop("__fp", "__keep")
    )
