"""Distributed spherical k-means (Lloyd's) over an embedding column.

Why this exists next to ``ivf.train_centroids``: the driver-side trainer
fits on a bounded *sample*, which is the right call when centroids only
seed an ANN index. But when the clustering IS the product (topic
bucketing, SemDeDup cells over a skewed corpus, curriculum binning), the
sample can misplace small clusters. This module runs Lloyd's iterations
over the FULL corpus with Spark doing the heavy pass:

- **assignment + partial sums** happen executor-side in one Arrow
  ``mapInPandas`` pass: each partition emits at most k rows of
  ``(cell, n, vec_sum)`` partials — the classic MLlib
  ``treeAggregate`` shape re-expressed on the DataFrame API.
- **centroid update** reduces those partials. Driver-side state is
  O(partitions × k × dim) per iteration — model-sized, never
  corpus-sized (documented bounded-collect contract, same class as the
  bloom/CMS partials in ``dedup/incremental.py`` / ``sketches/cms.py``).
- vectors are L2-normalized once; centroids renormalized each update
  (spherical k-means == cosine objective, matching ``ivf.py`` /
  ``dedup/semantic.py`` geometry).

At 100 TB the per-iteration cost is one full scan with NO shuffle (the
partials pass is map-side; the reduce moves partitions×k tiny rows), so
iterations scale linearly in corpus size and the quadratic never appears.

Reference parity: the reference engine (amunim-awan/azure-etl-databricks-sql-powerbi) has no
clustering surface; this is part of the EXT training-data-pipeline tier
(SURVEY.md §2 J3-EXT neighborhood).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import assign_cells
from azure_etl_databricks_sql_powerbi_spark.util import spread

_PARTIAL_SCHEMA = "cell int, n long, vec_sum array<double>, sq_err double"


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def _partials_pass(df: DataFrame, cents: np.ndarray, vec_col: str) -> pd.DataFrame:
    """One full-corpus pass: per-partition (cell, count, vector-sum,
    squared-cosine-error) partials via mapInPandas, reduced driver-side.

    The collect is bounded: each task yields ≤ k rows, so the driver sees
    at most numPartitions × k small rows regardless of corpus size."""
    k = len(cents)
    c = cents  # closure constant, shipped once per executor

    # NOTE: the closure must be self-contained (no engine-module globals)
    # so executors can unpickle it without the package on PYTHONPATH —
    # the drive_driver foreign-cwd contract (multimodal/ops.py pattern).
    def emit(batches):
        import numpy as np  # local import: ships by name, stdlib of the workers

        sums = np.zeros((k, c.shape[1]))
        counts = np.zeros(k, dtype=np.int64)
        sqe = np.zeros(k)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            sims = x @ c.T
            a = sims.argmax(axis=1)
            np.add.at(sums, a, x)
            counts += np.bincount(a, minlength=k)
            # spherical inertia: sum of (1 - cos) to the assigned centroid
            np.add.at(sqe, a, 1.0 - sims[np.arange(len(x)), a])
        live = counts > 0
        yield pd.DataFrame(
            {
                "cell": np.arange(k, dtype=np.int32)[live],
                "n": counts[live],
                "vec_sum": [row.tolist() for row in sums[live]],
                "sq_err": sqe[live],
            }
        )

    parts = df.select(vec_col).mapInPandas(emit, schema=_PARTIAL_SCHEMA).toPandas()
    return parts


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 10,
    seed: int = 42,
    tol: float = 1e-6,
):
    """Full-corpus spherical k-means. Returns ``(centroids, history)``
    where ``centroids`` is (k, dim) float64 and ``history`` is the
    per-iteration inertia list (monotone non-increasing; cells that go
    empty KEEP their previous centroid — deterministic, no resample —
    so monotonicity holds unconditionally; unit-tested).

    Deterministic: init is farthest-first traversal over a bounded spread
    sample (Bernoulli sample -> CollectLimit, the ``ivf.train_centroids``
    pattern — incremental partition execution, not a full scan; a
    plain-limit fallback covers tiny inputs). Farthest-first beats random
    seeding here because a contiguous prefix of a sorted corpus would put
    every random seed in one region; ties break to the lowest row index."""
    base = df.select(vec_col)
    sample_n = max(64 * k, 512)
    seed_rows = base.sample(fraction=0.25, seed=seed).limit(sample_n).toPandas()
    if len(seed_rows) < min(sample_n, 4 * k):
        seed_rows = base.limit(sample_n).toPandas()
    if not len(seed_rows):
        raise ValueError(
            "kmeans_fit: input corpus is empty — nothing to seed centroids from"
        )
    x0 = _normalize(
        np.array([np.asarray(v, dtype=np.float64) for v in seed_rows[vec_col]])
    )
    k_eff = min(k, len(x0))
    chosen = [0]
    max_sim = x0 @ x0[0]
    for _ in range(1, k_eff):
        nxt = int(np.argmin(max_sim))  # least similar to every chosen seed
        chosen.append(nxt)
        max_sim = np.maximum(max_sim, x0 @ x0[nxt])
    cents = x0[chosen].copy()

    # persist across supersteps: every iteration re-reads the corpus, so
    # caching the projected vector column trades memory for iters-1 scans
    # (the standard iterative-ML shape; MEMORY_AND_DISK so a 100 TB corpus
    # degrades to spill, not OOM). Unpersisted before return.
    #
    # NOT spread(): the partials pass is batch-vectorized (one numpy
    # matmul per Arrow batch), not per-row-heavy, so the scan's own
    # size-based partitioning is the right parallelism at every scale —
    # force-repartitioning a model-sized input to cluster width just
    # multiplies per-iteration task/worker dispatch by iters (guide §4.2:
    # keep batches large enough for vectorization to pay off; measured
    # r15 at sf0.1: 32 one-batch Python tasks per iteration -> 1).
    frozen = df.select(vec_col).persist()
    history: list[float] = []
    prev = None
    for _ in range(iters):
        parts = _partials_pass(frozen, cents, vec_col)
        inertia = float(parts["sq_err"].sum())
        history.append(inertia)
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        for _, row in parts.iterrows():
            sums[int(row["cell"])] += np.asarray(row["vec_sum"])
            counts[int(row["cell"])] += int(row["n"])
        live = counts > 0
        new = cents.copy()
        new[live] = _normalize(sums[live] / counts[live, None])
        # empty cells keep their previous centroid (deterministic, no resample)
        cents = new
        if prev is not None and abs(prev - inertia) <= tol * max(prev, 1.0):
            break
        prev = inertia
    frozen.unpersist()
    return cents, history


def kmeans_predict(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Append the nearest-centroid cluster id (Arrow-batched argmax —
    reuses ivf.assign_cells with nprobe=1, one numpy matmul per batch)."""
    return assign_cells(df, centroids, vec_col=vec_col, nprobe=1, out_col=out_col)


def kmeans_cluster_profile(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Fit + assign + per-cluster profile in one call — the driver-query
    shape: one row per non-empty cluster with its population and the
    lowest member id (a deterministic, hash-stable representative)."""
    cents, _ = kmeans_fit(df, vec_col=vec_col, k=k, iters=iters, seed=seed)
    assigned = kmeans_predict(df.select(id_col, vec_col), cents, vec_col=vec_col)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.min(id_col).alias("rep_id"),
        )
        .orderBy("cluster")
    )
