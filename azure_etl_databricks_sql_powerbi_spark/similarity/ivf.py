"""IVF (inverted-file) approximate nearest neighbor — the centroid-
partitioned scale path for similarity search, complementing the SRP-LSH
variant (``lsh.py``).

Shape (classic IVF-Flat, e.g. the FAISS construction):

1. **train**: k-means centroids fitted driver-side with numpy on a small
   deterministic sample — centroids are a few KB of model state, exactly
   the kind of thing that belongs on the driver; the 100 TB corpus is
   never touched during training.
2. **assign**: every corpus vector gets a cell id = argmin centroid
   distance, computed in an Arrow-batched ``pandas_udf`` (one numpy matmul
   per batch — vectorized, ~100× a per-row Python UDF; the centroid matrix
   rides along as a closure constant, serialized once per executor).
   At rest, a production corpus would be WRITTEN partitioned/bucketed by
   ``cell`` so probes prune at scan time.
3. **probe**: a query searches only its ``nprobe`` nearest cells — an
   equi-join on cell id (hash join, broadcast for small query sets)
   followed by exact cosine re-rank inside the probed cells. Cost scales
   with corpus/nlist * nprobe instead of the full corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from azure_etl_databricks_sql_powerbi_spark.functions.vectors import cosine
from azure_etl_databricks_sql_powerbi_spark.util import spread


def train_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 42,
    sample_fraction: float = 0.25,
    sample_x: np.ndarray | None = None,
) -> np.ndarray:
    """Driver-side k-means (L2-normalized -> spherical) on a bounded
    sample; returns (nlist, dim) float64 centroids.

    The sample is ``df.sample(fraction).limit(n)``: the Bernoulli sample is
    a map-side filter and the limit plans as CollectLimit, which executes
    partitions incrementally until n rows arrive — so training reads a
    bounded prefix of the corpus, never a full scan or sort (the previous
    orderBy(hash).limit(n) planned as TakeOrderedAndProject = O(corpus)).
    If the sampled prefix comes up short the corpus is small (≲ n/fraction
    rows) and a plain limit(n) re-read is cheap. ``sample_x`` supplies an
    already-collected raw (n, d) matrix (``pq._sample_matrix`` contract)
    so composed trainers (IVF-PQ) sample once for both models."""
    if sample_x is not None:
        x = np.array(sample_x, dtype=np.float64, copy=True)
    else:
        base = df.select(id_col, vec_col)
        sample = (
            base.sample(fraction=sample_fraction, seed=seed)
            .limit(sample_size)
            .toPandas()
        )
        if len(sample) < sample_size:
            sample = base.limit(sample_size).toPandas()
        x = np.array([np.asarray(v, dtype=np.float64) for v in sample[vec_col]])
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def _cell_udf(centroids: np.ndarray, nprobe: int):
    """pandas_udf: vector -> its nprobe nearest cell ids (array<int>)."""
    cents = centroids  # closure constant, shipped once per executor

    @pandas_udf("array<int>")
    def cells(v: pd.Series) -> pd.Series:
        x = np.array([np.asarray(e, dtype=np.float64) for e in v])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ cents.T
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in top])

    return cells


def assign_cells(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    nprobe: int = 1,
    out_col: str = "cell",
) -> DataFrame:
    """Append the vector's nprobe nearest cell ids, exploded to one row per
    probed cell (nprobe=1 => the classic single-cell assignment)."""
    udf = _cell_udf(centroids, nprobe)
    return spread(df).withColumn("__cells", udf(F.col(vec_col))).select(
        "*", F.explode("__cells").alias(out_col)
    ).drop("__cells")


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe the query's nprobe cells, exact cosine
    re-rank inside them. Output schema matches ``bruteforce.cosine_topk``
    so recall is measurable with a plain join.

    Per-query re-rank work is ~nprobe * N / nlist: a fixed ``nlist`` is
    a constant-FACTOR knob here (search stays linear in N, unlike pair
    enumeration where fixed cells go quadratic), but at large N size it
    with ``dedup.semantic.auto_nlist`` to keep per-cell candidate counts
    — and so per-query latency — constant; past auto_nlist's ``hi``
    bound, ``train_centroids_distributed`` is the trainer."""
    cents = train_centroids(
        corpus, vec_col, id_col, nlist=nlist, sample_size=sample_size, seed=seed
    )
    c = assign_cells(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        cents,
        "c_vec",
        nprobe=1,
    )
    q = assign_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        cents,
        "q_vec",
        nprobe=nprobe,
    )
    cands = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id", "neighbor_id", cosine("q_vec", "c_vec").alias("__cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("__cos", 4).alias("cosine_sim"))
    )


def train_centroids_distributed(
    df: DataFrame,
    vec_col: str = "embedding",
    nlist: int = 16,
    iters: int = 8,
    seed: int = 42,
):
    """Full-corpus alternative to ``train_centroids`` (which fits on a
    bounded sample): Lloyd's over every vector via
    ``similarity.kmeans.kmeans_fit`` — per-iteration one shuffle-free
    scan, ≤ nlist partial rows per task, model-sized driver reduce.
    Use when the sample trainer misplaces small-but-important cells
    (skewed corpora) and the extra scans are acceptable; both trainers
    return the same (nlist, dim) spherical centroid contract, so
    ``assign_cells``/``ivf_cosine_topk`` compose with either."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.kmeans import kmeans_fit

    cents, _ = kmeans_fit(df, vec_col=vec_col, k=nlist, iters=iters, seed=seed)
    return cents
