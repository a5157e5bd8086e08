"""Product quantization (PQ) for embedding search — the memory-compression
scale path alongside IVF (``ivf.py``) and SRP-LSH (``lsh.py``).

A d-dim float vector (d*8 bytes) becomes ``m`` one-byte codes: each of the
``m`` subspaces is k-means-quantized to ``k<=256`` centroids, and a vector
is represented by its per-subspace nearest-centroid ids (Jegou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI'11 — the FAISS
``PQm`` construction). At 100 TB of embeddings the codes table is ~d*8/m
times smaller than the vectors — it fits where the raw vectors cannot, and
scan-speed ADC scoring replaces full float arithmetic.

Spark shape (same discipline as ivf.py):

1. **train**: per-subspace k-means, driver-side numpy on a bounded
   ``sample(fraction).limit(n)`` read — the model is ``m*k*(d/m)`` floats
   (KBs); the corpus is never fully scanned for training.
2. **encode**: one Arrow-batched ``pandas_udf`` — per batch, ``m`` small
   matmuls + argmax; output ``array<smallint>`` codes (codes, not text or
   floats, are what shuffles or lands at rest).
3. **search (ADC)**: queries are BOUNDED and collected to the driver
   (same contract as IVF's probe set); their per-subspace distance tables
   (q x m x k doubles, KBs) ride into a ``mapInPandas`` over the CODES
   table only — the corpus vectors are never re-read at query time. Each
   Arrow batch emits its local top-k per query (a map-side combine), and
   one tiny window takes the global top-k: rows out of the scan =
   queries * k * n_batches, never |corpus|.

Approximation quality is measured in tests (recall vs the exact
brute-force baseline on clustered vectors); the contract query is
rows-only for the same reason as LSH/IVF — no SQL engine replicates the
trained quantizer.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from azure_etl_databricks_sql_powerbi_spark.util import spread


def bounded_query_pandas(
    queries: DataFrame, cols: list[str], max_queries: int
) -> pd.DataFrame:
    """Collect the query set to the driver with a LOUD bound: ADC search
    materializes per-query distance tables driver-side, so a corpus-sized
    ``queries`` frame must fail with ValueError instead of OOMing the
    driver (the snapshot-sink cap pattern, sources/sinks.py). Reads at
    most ``max_queries + 1`` rows — the overflow probe itself is bounded."""
    qp = queries.select(*cols).limit(max_queries + 1).toPandas()
    if len(qp) > max_queries:
        raise ValueError(
            f"query set exceeds max_queries={max_queries}; ADC search "
            "collects queries driver-side — batch the queries or raise "
            "max_queries deliberately"
        )
    return qp


def _sample_matrix(
    df: DataFrame, vec_col: str, sample_size: int, sample_fraction: float, seed: int
) -> np.ndarray:
    """Bounded deterministic training sample as an (n, d) float64 matrix
    (same sample(fraction).limit(n) contract as ivf.train_centroids)."""
    base = df.select(vec_col)
    sample = base.sample(fraction=sample_fraction, seed=seed).limit(sample_size).toPandas()
    if len(sample) < sample_size:
        sample = base.limit(sample_size).toPandas()
    return np.array([np.asarray(v, dtype=np.float64) for v in sample[vec_col]])


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 42,
    sample_fraction: float = 0.25,
    sample_x: np.ndarray | None = None,
) -> np.ndarray:
    """Fit per-subspace codebooks; returns (m, k, d/m) float64.

    Vectors are L2-normalized first (cosine regime: ADC inner products on
    normalized vectors rank like cosine). d must be divisible by m.
    ``sample_x`` supplies an already-collected raw (n, d) training matrix
    (the ``_sample_matrix`` contract) so composed trainers (IVF-PQ) run
    ONE bounded sample job instead of two identical ones (guide §1.2).
    """
    x = (
        np.array(sample_x, dtype=np.float64, copy=True)
        if sample_x is not None
        else _sample_matrix(df, vec_col, sample_size, sample_fraction, seed)
    )
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, sub))
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        kk = min(k, len(xs))
        cents = xs[rng.choice(len(xs), size=kk, replace=False)]
        for _ in range(iters):
            # L2 assignment within the subspace
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(kk):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        if kk < k:  # degenerate tiny corpus: pad with repeats
            cents = np.vstack([cents, np.repeat(cents[:1], k - kk, axis=0)])
        books[j] = cents
    return books


def encode_pq(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Append the m-byte PQ code (array<smallint>) for every vector."""
    books = codebooks  # closure constant, shipped once per executor
    m, _, sub = books.shape

    @pandas_udf("array<smallint>")
    def codes(v: pd.Series) -> pd.Series:
        x = np.array([np.asarray(e, dtype=np.float64) for e in v])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        out = np.empty((len(x), m), dtype=np.int16)
        for j in range(m):
            xs = x[:, j * sub : (j + 1) * sub]
            d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            out[:, j] = d2.argmin(axis=1)
        return pd.Series([row.tolist() for row in out])

    return spread(df).withColumn(out_col, codes(F.col(vec_col)))


def pq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    n_centroids: int = 16,
    sample_size: int = 2048,
    seed: int = 42,
    max_queries: int = 4096,
) -> DataFrame:
    """Approximate top-k neighbors by asymmetric-distance (ADC) scan of the
    PQ codes. Output schema matches ``bruteforce.cosine_topk``
    (query_id, rank, neighbor_id, adc_score) so recall is a plain join.
    The query set is driver-collected and hard-capped at ``max_queries``
    (ValueError beyond it) — tables are O(queries * m * k) doubles.
    """
    books = train_pq_codebooks(
        corpus, vec_col, m=m, k=n_centroids, sample_size=sample_size, seed=seed
    )
    coded = encode_pq(
        corpus.select(F.col(id_col).alias("neighbor_id"), vec_col), books, vec_col
    ).select("neighbor_id", "pq_code")

    qp = bounded_query_pandas(queries, [id_col, vec_col], max_queries)
    q_ids = qp[id_col].to_numpy()
    qx = np.array([np.asarray(v, dtype=np.float64) for v in qp[vec_col]])
    qx = qx / np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    mm, kk, sub = books.shape
    # ADC tables: T[q, j, c] = <q_sub_j, codebook[j][c]> — inner product on
    # normalized vectors, so Σ_j T[q, j, code_j] ranks like cosine
    tables = np.einsum("qjs,jcs->qjc", qx.reshape(len(qx), mm, sub), books)

    out_schema = "query_id long, neighbor_id long, adc_score double"
    local_k = k + 1  # a query may meet itself in the batch

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array([np.asarray(c, dtype=np.int64) for c in pdf["pq_code"]])
            ids = pdf["neighbor_id"].to_numpy()
            # S[q, b] = Σ_j tables[q, j, codes[b, j]]
            s = np.zeros((len(tables), len(codes)))
            for j in range(mm):
                s += tables[:, j, :][:, codes[:, j]]
            top = min(local_k, len(codes))
            idx = np.argpartition(-s, top - 1, axis=1)[:, :top]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, top),
                    "neighbor_id": ids[idx].ravel(),
                    "adc_score": np.take_along_axis(s, idx, axis=1).ravel(),
                }
            )

    partial = coded.mapInPandas(score_batches, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "neighbor_id", F.round("adc_score", 4).alias("adc_score")
        )
    )
