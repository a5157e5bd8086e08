"""SemDeDup-style semantic deduplication over an embedding column.

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): k-means-cluster the corpus
embeddings, compute pairwise cosine only WITHIN each cluster, and drop
all but one member of every semantic-duplicate pair above a threshold.
The clustering is what makes it tractable — candidate pairs are bounded
by cell population, never corpus², and cells are independent units of
work that parallelize across any cluster width.

Spark shape here:

1. centroids come from ``similarity.ivf.train_centroids`` (driver-side
   k-means on a bounded sample — KBs of state),
2. cell assignment is the same Arrow-batched matmul ``assign_cells``
   (one numpy GEMM per batch),
3. within-cell pairs via a self-equi-join on ``cell`` with ``id_a <
   id_b`` (a hash join whose build side is one cell's members), cosine
   scored JVM-side (``functions.vectors.cosine`` — zip_with/aggregate,
   codegen), and a ``max_cell`` guard caps degenerate cells exactly like
   the LSH buckets in ``dedup/minhash.py``,
4. the keep rule is deterministic: a vector survives unless it pairs
   above-threshold with a LOWER id in its cell (SemDeDup keeps one
   arbitrary member per duplicate pair; lowest-id is our arbitrary-but-
   reproducible choice). Survivors = corpus left-anti-join dropped ids.

No SQL oracle exists (k-means assignment is not SQL-expressible);
correctness is unit-tested on planted duplicate clusters
(tests/test_ext.py) and the contract query is rows-only by design.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.vectors import cosine
from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import (
    assign_cells,
    train_centroids,
)


def semantic_dup_pairs(
    df: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int = 10_000,
    observation: Observation | None = None,
) -> DataFrame:
    """Within-cell pairs with cosine >= threshold: ``(id_a, id_b,
    cosine_sim)``, id_a < id_b. Cells larger than ``max_cell`` are
    dropped with the same rationale as minhash's bucket cap: a cell that
    big means the centroids under-fit, and quadratic work inside it would
    dominate the job; re-train with larger nlist instead.

    The cap is never silent when the caller passes an ``observation``:
    after any action on the result, ``observation.get`` reports
    ``dropped_cells`` / ``dropped_rows`` (vectors excluded from dedup by
    the guard) — the repo's "No silent caps" contract. (Caveat shared by
    all observed caps here: metrics need the observed node to execute, so
    a plan AQE collapses to a fully-empty relation may skip them — at any
    realistic scale dedup output is never globally empty.)
    """
    # Materialize the assignment once (eager localCheckpoint, the
    # graph-tier lineage-cut discipline): the plan references ``cells``
    # three times (population guard + both pair legs), and each reference
    # would otherwise re-run the Arrow-batched centroid GEMM over the
    # whole corpus. SemDeDup's practical recipe materializes cluster
    # assignments anyway; this stores (id, vec, cell) once —
    # block-manager memory spilling to disk — instead of three full
    # corpus passes through the Python workers.
    cells = assign_cells(
        df.select(id_col, vec_col), centroids, vec_col, nprobe=1
    ).localCheckpoint(eager=True)
    # cell population guard: one tiny aggregate on (cell), broadcast back.
    # The observe node sits on the per-cell populations BEFORE the filter,
    # so over-cap cells hit the metric even though they never reach the
    # join. (DISTINCT aggregates are disallowed in observed metrics; pop
    # is one row per cell, so plain sums give cell and row counts.)
    pop = cells.groupBy("cell").agg(F.count(F.lit(1)).alias("__n"))
    if observation is not None:
        pop = pop.observe(
            observation,
            F.sum(F.when(F.col("__n") > max_cell, 1).otherwise(0)).alias(
                "dropped_cells"
            ),
            F.sum(
                F.when(F.col("__n") > max_cell, F.col("__n")).otherwise(0)
            ).alias("dropped_rows"),
        )
    bounded = cells.join(
        F.broadcast(pop.filter(F.col("__n") <= max_cell)), "cell"
    ).drop("__n")
    a = bounded.select(
        "cell",
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
    )
    b = bounded.select(
        "cell",
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
    )
    return (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("__cos", cosine("__va", "__vb"))
        .where(F.col("__cos") >= threshold)
        .select("id_a", "id_b", F.round("__cos", 4).alias("cosine_sim"))
    )


def auto_nlist(
    n_rows: int,
    target_cell: int = 128,
    lo: int = 16,
    hi: int = 4096,
) -> int:
    """Number of k-means cells that keeps PER-CELL population (and so
    per-cell quadratic pair work) constant as the corpus grows: cells
    proportional to N means total pair work cells * pop^2 / 2 = N *
    target_cell / 2 — LINEAR in N. A fixed nlist makes pop grow with N
    and pair work grow with N^2 (measured: 13.5x wall-clock at 10x data
    in BENCH_SF1.md before this fix). ``hi`` bounds the driver-side
    k-means GEMM (sample * nlist * dim per iteration); past that point a
    distributed trainer (e.g. pyspark.ml KMeans) is the 100 TB path and
    ``max_cell`` remains the backstop."""
    return min(hi, max(lo, -(-n_rows // target_cell)))


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int | None = None,
    sample_size: int = 2048,
    seed: int = 42,
    max_cell: int = 10_000,
    observation: Observation | None = None,
) -> DataFrame:
    """End-to-end SemDeDup: returns the surviving rows of ``df`` (all
    columns), having dropped every vector that is a semantic duplicate
    (cosine >= threshold, same cell) of a lower-id vector.

    ``nlist=None`` (the default) sizes the cell count from the corpus
    via ``auto_nlist`` — constant cell population, linear total pair
    work — at the cost of one count() job; pass an explicit ``nlist``
    to skip the count when the corpus size is known.

    ``observation`` (optional) surfaces the ``max_cell`` guard's dropped
    cell/row counts — see ``semantic_dup_pairs``.
    """
    if nlist is None:
        nlist = auto_nlist(df.count())
        sample_size = max(sample_size, 8 * nlist)
    cents = train_centroids(
        df, vec_col, id_col, nlist=nlist, sample_size=sample_size, seed=seed
    )
    pairs = semantic_dup_pairs(
        df, cents, threshold, id_col, vec_col, max_cell, observation
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dropped, id_col, "left_anti")
