"""Brute-force cosine similarity search (the correctness baseline).

Top-k neighbors for a (small) query set against a corpus:
``corpus JOIN broadcast(queries)`` — the 100 TB corpus streams through
executors once, never shuffles; per-pair cosine is a JVM fold
(``functions.vectors``); ranking is one window over the query key.

This is the exact-answer baseline that the LSH/IVF path (``lsh.py``) is
measured against; on a full self-join at scale prefer the bucketed
variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.vectors import cosine
from azure_etl_databricks_sql_powerbi_spark.util import spread


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """(query_id, rank, neighbor_id, cosine_sim) — top-k per query.

    Ties break on neighbor_id (deterministic / oracle-hashable).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    pairs = c.crossJoin(F.broadcast(q))
    if not include_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine("q_vec", "c_vec").alias("__cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.col("__cos").alias("cosine_sim"),
        )
    )


def cosine_near_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (id_a, id_b, cosine_sim) pairs above ``threshold`` — embedding
    near-duplicate detection. Quadratic: use only on a corpus that fits a
    broadcast, or go through the LSH bucketing in ``lsh.py``."""
    a = spread(df).select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    # threshold on the UNROUNDED cosine (round only for display) so the
    # predicate agrees bit-for-bit with a plain SQL `cosine >= t` oracle;
    # filtering on the rounded value would admit pairs in [t-5e-5, t).
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn("__cos", cosine("va", "vb"))
        .filter(F.col("__cos") >= threshold)
        .select("id_a", "id_b", F.col("__cos").alias("cosine_sim"))
    )
