"""IVF-PQ: coarse cell pruning (``ivf.py``) composed with
compressed-domain ADC scoring (``pq.py``) — the standard FAISS shape for
billion-vector search (Jegou et al., TPAMI'11, §V: IVFADC).

Why the composition matters at 100 TB: IVF-Flat prunes WHICH vectors are
scanned (corpus/nlist * nprobe) but still reads full float vectors;
PQ-flat compresses WHAT is scanned (m bytes/vector) but reads every code.
IVF-PQ does both — the ADC scan touches only the probed cells' codes, so
cost is ~(nprobe/nlist) * |corpus| * m bytes.

Spark shape:

1. **train**: coarse centroids + PQ codebooks fitted driver-side on the
   same bounded CollectLimit sample discipline as ivf/pq — model state is
   KBs, the corpus is never fully scanned for training.
2. **index**: one pass assigns each corpus vector its cell
   (Arrow ``pandas_udf``) and its m-byte PQ code; at rest the coded table
   would be written partitioned by ``cell`` so the probe's ``isin`` filter
   becomes partition pruning at scan time.
3. **probe**: the bounded query batch's nprobe cells are computed
   driver-side (numpy over the KB centroid matrix); the codes table is
   filtered to the UNION of probed cells before the ADC ``mapInPandas``,
   and inside each Arrow batch a per-query cell-membership mask restricts
   scoring to that query's own cells. Each batch emits its local
   shortlist (map-side combine), one window takes the global shortlist.
4. **refine** (IVFPQR, optional but on by default): the ADC shortlist
   (refine_factor * k ids/query) is broadcast back against the corpus for
   exact cosine on the true vectors — a broadcast-hash semi-join bounded
   by the shortlist, never a second full scan. Refinement recovers the
   PQ quantization loss, so recall matches IVF-Flat at equal nprobe
   (asserted in tests/test_ext.py).

PQ here encodes the raw normalized vector, not the per-cell residual
(FAISS's default encodes residuals): one ADC table per query works across
all probed cells, keeping the scan a single mapInPandas. The refine step
recovers the accuracy the residual trick buys.

No reference counterpart — north-star similarity surface
(BASELINE.json); reference's closest analog is none (its compute is
delegated to SQL Server, run_load.py:57-96).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark.sql.functions import pandas_udf

from azure_etl_databricks_sql_powerbi_spark.functions.vectors import cosine
from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import (
    train_centroids,
)
from azure_etl_databricks_sql_powerbi_spark.similarity.pq import (
    _sample_matrix,
    bounded_query_pandas,
    train_pq_codebooks,
)
from azure_etl_databricks_sql_powerbi_spark.util import spread


def assign_and_encode_pq(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    cell_col: str = "cell",
    code_col: str = "pq_code",
) -> DataFrame:
    """Append the nearest-cell id AND the m-byte PQ code in ONE
    Arrow-batched pass — the IVF-PQ indexing projection (guide §4.2):
    the composed ``encode_pq(assign_cells(...))`` ran two ArrowEvalPython
    stages, shipping the full vector column across the Python boundary
    twice and L2-normalizing every batch twice. Cell choice replays
    ``assign_cells``' exact argsort expression and the codes replay
    ``encode_pq``'s subspace argmins on the same normalized batch, so
    the output is bit-identical to the two-stage composition (pinned in
    tests/test_ext.py::test_assign_and_encode_pq_matches_composition)."""
    cents, books = centroids, codebooks
    m, _, sub = books.shape

    @pandas_udf(f"struct<{cell_col}:int, {code_col}:array<smallint>>")
    def cell_and_code(v: pd.Series) -> pd.DataFrame:
        x = np.array([np.asarray(e, dtype=np.float64) for e in v])
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ cents.T
        top = np.argsort(-sims, axis=1)[:, :1]  # assign_cells(nprobe=1) exact
        codes = np.empty((len(x), m), dtype=np.int16)
        for j in range(m):
            xs = x[:, j * sub : (j + 1) * sub]
            d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.DataFrame(
            {
                cell_col: top[:, 0].astype("int32"),
                code_col: [row.tolist() for row in codes],
            }
        )

    out = spread(df).withColumn("__cc", cell_and_code(F.col(vec_col)))
    return out.select(
        "*", F.col(f"__cc.{cell_col}").alias(cell_col),
        F.col(f"__cc.{code_col}").alias(code_col),
    ).drop("__cc")


def ivfpq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 4,
    n_centroids: int = 16,
    sample_size: int = 2048,
    seed: int = 42,
    refine_factor: int = 4,
    max_queries: int = 4096,
) -> DataFrame:
    """Approximate top-k: ADC scan restricted to each query's nprobe
    cells, exact-cosine refinement of the shortlist. Output schema matches
    ``bruteforce.cosine_topk`` (query_id, rank, neighbor_id, cosine_sim)
    so recall is a plain join.

    This is the index-once-in-plan variant (train + encode + probe in a
    single lazy plan); ``similarity.index.save_index``/``load_index``
    materialize the same model + coded table at rest so day-N probes skip
    training and prune partitions (VERDICT r6 directive 2)."""
    spark = corpus.sparkSession
    # ONE bounded sample job feeds both trainers (before r16 centroids
    # and codebooks each ran an identical CollectLimit over the corpus;
    # the collected rows are the same, so both models are unchanged)
    x = _sample_matrix(corpus, vec_col, sample_size, 0.25, seed)
    cents = train_centroids(
        corpus, vec_col, id_col, nlist=nlist, sample_size=sample_size,
        seed=seed, sample_x=x,
    )
    books = train_pq_codebooks(
        corpus, vec_col, m=m, k=n_centroids, sample_size=sample_size,
        seed=seed, sample_x=x,
    )
    # one indexing pass AND one Python-boundary crossing: cell + m-byte
    # code per corpus vector (fused — see assign_and_encode_pq)
    coded = assign_and_encode_pq(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        ),
        cents,
        books,
        "c_vec",
    ).select("neighbor_id", "cell", "pq_code")

    def fetch(_union_cells: list[int]) -> DataFrame:
        # in-plan variant: refine fetches true vectors from the corpus
        # itself (shortlist broadcast semi-join bounds the read)
        return corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        )

    return _ivfpq_probe(
        spark,
        cents,
        books,
        coded,
        fetch,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        nprobe=nprobe,
        refine_factor=refine_factor,
        max_queries=max_queries,
    )


def _ivfpq_probe(
    spark,
    cents: np.ndarray,
    books: np.ndarray,
    coded: DataFrame,
    fetch_fn,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    nprobe: int,
    refine_factor: int,
    max_queries: int,
) -> DataFrame:
    """Shared IVFADC(+R) probe: ADC-scan ``coded`` (neighbor_id, cell,
    pq_code) restricted to the union of the queries' nprobe cells, then
    (optionally) exact-cosine refine over ``fetch_fn(union_cells)`` ->
    (neighbor_id, c_vec). Both the in-plan ``ivfpq_cosine_topk`` and the
    persisted-index ``similarity.index.query_index`` run THIS function, so
    the two paths cannot drift semantically."""
    qp = bounded_query_pandas(queries, [id_col, vec_col], max_queries)
    q_ids = qp[id_col].to_numpy()
    qx = np.array([np.asarray(v, dtype=np.float64) for v in qp[vec_col]])
    qx = qx / np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    # per-query probed cells, driver-side over the KB centroid matrix
    q_cells = np.argsort(-(qx @ cents.T), axis=1)[:, :nprobe].astype("int32")
    # member[q, cell] = does query q probe this cell
    member = np.zeros((len(qx), len(cents)), dtype=bool)
    member[np.arange(len(qx))[:, None], q_cells] = True
    union_cells = sorted({int(c) for c in q_cells.ravel()})

    mm, kk, sub = books.shape
    tables = np.einsum("qjs,jcs->qjc", qx.reshape(len(qx), mm, sub), books)

    out_schema = "query_id long, neighbor_id long, adc_score double"
    shortlist_k = refine_factor * k + 1  # +1: a query may meet itself

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array([np.asarray(c, dtype=np.int64) for c in pdf["pq_code"]])
            cells = pdf["cell"].to_numpy()
            ids = pdf["neighbor_id"].to_numpy()
            s = np.zeros((len(tables), len(codes)))
            for j in range(mm):
                s += tables[:, j, :][:, codes[:, j]]
            # a query only scores rows in its OWN probed cells
            s[~member[:, cells]] = -np.inf
            top = min(shortlist_k, len(codes))
            idx = np.argpartition(-s, top - 1, axis=1)[:, :top]
            scores = np.take_along_axis(s, idx, axis=1).ravel()
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, top),
                    "neighbor_id": ids[idx].ravel(),
                    "adc_score": scores,
                }
            )
            yield out[np.isfinite(scores)]

    # scan only the union of probed cells; with the coded table written
    # partitioned by cell this isin is partition pruning, not a filter
    partial = coded.filter(F.col("cell").isin(union_cells)).mapInPandas(
        score_batches, schema=out_schema
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        partial.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("__r", F.row_number().over(w_adc))
        .filter(F.col("__r") <= refine_factor * k)
        .select("query_id", "neighbor_id")
    )
    if refine_factor <= 1:
        # compressed-domain only: re-rank by ADC score
        return (
            partial.filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("rank", F.row_number().over(w_adc))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "rank",
                "neighbor_id",
                F.round("adc_score", 4).alias("adc_score"),
            )
        )

    # IVFPQR refine: fetch true vectors ONLY for shortlist ids (broadcast
    # semi-join bounded by queries * refine_factor * k rows) and re-rank
    # by exact cosine against the driver-known query vectors
    qdf = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(q_ids, qx)],
        "query_id long, q_vec array<double>",
    )
    fetched = fetch_fn(union_cells).join(F.broadcast(shortlist), on="neighbor_id")
    w_cos = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        fetched.join(F.broadcast(qdf), on="query_id")
        .select("query_id", "neighbor_id", cosine("q_vec", "c_vec").alias("__cos"))
        .withColumn("rank", F.row_number().over(w_cos))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "neighbor_id", F.round("__cos", 4).alias("cosine_sim")
        )
    )
