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
3. within-cell pairs via one blocked numpy GEMM per cell inside
   ``applyInPandas`` (the cell IS the unit of parallelism; ``max_cell``
   bounds the matrix exactly like the LSH bucket caps in
   ``dedup/minhash.py``). A cell-key self-join with an expression-level
   cosine was measured 10x slower here: ``zip_with``/``aggregate``
   lambdas are interpreted per element, and the join materializes every
   candidate pair (pop² rows carrying two embedding copies each) just to
   throw most of them away. The GEMM touches the same pop² dot products
   but as one vectorized kernel, ships each vector across the shuffle
   once, and emits only above-threshold pairs,
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
import pandas as pd
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import (
    assign_cells,
    train_centroids,
)


def round_half_up_4(values: np.ndarray) -> np.ndarray:
    """Vectorized twin of Spark ``round(x, 4)`` (BigDecimal HALF_UP on the
    double's shortest round-trip decimal repr; Python ``repr(float)`` ==
    Java ``Double.toString``).

    ``np.round`` does banker's rounding on the BINARY double, which can
    only disagree with decimal HALF_UP when the scaled value sits
    essentially on a half boundary (for |x| <= 1 the multiply/repr noise
    is ~1e-12 in scaled units). So: vectorized ``np.round`` for the bulk,
    exact per-value Decimal only inside a generous 1e-6 band around the
    boundary — a duplicate-heavy cell at the ``max_cell`` cap no longer
    pays ~pop²/2 interpreted Decimal constructions (r10 ADVICE)."""
    from decimal import ROUND_HALF_UP, Decimal

    values = np.asarray(values, dtype=np.float64)
    rounded = np.round(values, 4)
    scaled = np.abs(values) * 1e4
    near_half = np.abs(scaled - np.floor(scaled) - 0.5) < 1e-6
    if near_half.any():
        rounded[near_half] = [
            float(
                Decimal(repr(float(v))).quantize(
                    Decimal("0.0001"), rounding=ROUND_HALF_UP
                )
            )
            for v in values[near_half]
        ]
    return rounded


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

    id_type = bounded.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cosine_sim double"
    # Row-blocked upper-triangular sweep: the worst-case cell (max_cell
    # rows) never holds a full pop x pop similarity matrix — the first
    # 1024-row panel against the remaining columns (~80 MB at the 10k
    # default cap) is the peak, shrinking every block — so the guard
    # stays a memory bound in practice, not just a work bound.
    block = 1024
    # captured driver-side so the executor closure can sys.path-bootstrap
    # before importing the engine rounding helper (cloudpickle serializes
    # module-level functions by name; see multimodal/ops.py)
    from azure_etl_databricks_sql_powerbi_spark.util import pkg_parent

    _parent = pkg_parent()

    def _cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import sys

        if _parent not in sys.path:
            sys.path.insert(0, _parent)
        from azure_etl_databricks_sql_powerbi_spark.dedup.semantic import (
            round_half_up_4,
        )

        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        x = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        # unit-normalize; zero vectors stay zero so every cosine against
        # them is exactly 0.0 (the expression form's denom==0 contract)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
        out_a, out_b, out_s = [], [], []
        for r0 in range(0, len(ids), block):
            # columns start at r0: positions left of the block can never
            # be an upper-triangle partner, so half the multiply work and
            # per-block memory vs a full x.T panel
            sims = x[r0 : r0 + block] @ x[r0:].T
            bi, jl = np.nonzero(sims >= threshold)
            i = bi + r0
            j = jl + r0
            # ids are sorted, so j > i implies ids[j] >= ids[i]; STRICT
            # id inequality (not position) keeps the id_a < id_b output
            # contract when ids repeat — the join form this replaced
            # never paired equal ids
            keep = ids[j] > ids[i]
            i, j = i[keep], j[keep]
            out_a.append(ids[i])
            out_b.append(ids[j])
            out_s.append(sims[bi[keep], jl[keep]])
        s = np.concatenate(out_s) if out_s else np.array([], dtype=np.float64)
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a) if out_a else np.array([], dtype=ids.dtype),
                "id_b": np.concatenate(out_b) if out_b else np.array([], dtype=ids.dtype),
                # Spark round(x,4) parity — vectorized banded HALF_UP
                "cosine_sim": round_half_up_4(s),
            }
        )

    return bounded.groupBy("cell").applyInPandas(_cell_pairs, out_schema)


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
