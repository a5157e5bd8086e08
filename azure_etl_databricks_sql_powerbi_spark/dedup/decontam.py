"""Benchmark decontamination: per-document n-gram overlap with an
evaluation corpus.

Training-data hygiene op the reference's ETL surface implies but never
ships (its curation stops at dedup — see reference ``README.md`` pipeline
description): before training, every candidate document is scored by how
many of its word n-grams appear in a benchmark/eval set, and documents
above a threshold are dropped as contaminated (the standard n-gram-overlap
decontamination used by LLM data pipelines).

Scale design (the 100 TB shape):

* The benchmark side is SMALL (eval suites are thousands of documents, so
  at most a few million distinct n-grams ~= tens of MB of 8-byte hashes).
  Its distinct n-gram-hash set is computed once and **broadcast**; the
  training corpus — the 100 TB side — is scanned exactly once and never
  shuffles its text: every shuffled/broadcast row is ``(long, long)``.
* N-grams are hashed to ``xxhash64`` longs immediately after generation
  (same trick as ``dedup/minhash.py``): the per-doc ``distinct`` and the
  overlap join carry 16 bytes/row instead of the gram strings.
* The per-doc score is one hash-aggregate over the exploded grams — a
  map-side partial combine keeps the shuffle at #distinct-grams/doc rows.

``broadcast_benchmark=False`` falls back to a shuffle hash join for the
(unusual) case of a benchmark too large to broadcast.

The contamination ratio is emitted as the RAW ``matched/total`` double —
integer division is exactly rounded in IEEE 754, so Spark and any SQL
oracle produce bit-identical values; rounding it (Spark HALF_UP vs DuckDB
half-even) is what would diverge (e.g. 1/128 at 6 decimals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.text import word_ngrams
from azure_etl_databricks_sql_powerbi_spark.util import spread

GRAM_HASH_SEED = 0x5EED


def _distinct_gram_hashes(
    df: DataFrame, text_col: str, n: int, *extra_cols: str
) -> DataFrame:
    """Explode word n-grams and hash each to a long; distinct per extra_cols.

    ``word_ngrams`` never returns an empty array (docs shorter than n words
    yield one whole-text shingle), so a plain ``explode`` loses no rows.
    """
    return (
        spread(df)
        .select(*extra_cols, F.explode(word_ngrams(text_col, n)).alias("__g"))
        .select(*extra_cols, F.xxhash64("__g", F.lit(GRAM_HASH_SEED)).alias("gh"))
        .distinct()
    )


def contamination_scores(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Score every training doc by benchmark n-gram overlap.

    Returns one row per training document:
      ``id_col, total_ngrams, matched_ngrams, contamination, contaminated``
    where ``contamination = matched/total`` over the doc's DISTINCT word
    n-grams and ``contaminated = 1`` iff ``contamination >= threshold``.
    """
    bench = _distinct_gram_hashes(benchmark, text_col, n).withColumn(
        "__hit", F.lit(1)
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    doc_grams = _distinct_gram_hashes(train, text_col, n, id_col)
    joined = doc_grams.join(bench, "gh", "left")
    ratio = F.col("matched_ngrams") / F.col("total_ngrams")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("total_ngrams"),
            F.count("__hit").alias("matched_ngrams"),
        )
        .select(
            id_col,
            "total_ngrams",
            "matched_ngrams",
            ratio.alias("contamination"),
            (ratio >= threshold).cast("int").alias("contaminated"),
        )
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop training docs whose benchmark n-gram overlap >= threshold.

    Left-semi join against the clean half of ``contamination_scores`` so
    the full training rows (text included) pass through untouched and the
    join key is just the id.
    """
    clean = contamination_scores(
        train, benchmark, n=n, threshold=threshold, id_col=id_col, text_col=text_col
    ).filter(F.col("contaminated") == 0)
    return train.join(clean.select(id_col), id_col, "left_semi")


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_benchmark: int = 100_000,
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic companion
    to the n-gram ``contamination_scores``: paraphrased or reformatted
    benchmark leakage shares no 8-grams but sits next to the benchmark in
    embedding space (the SemDeDup observation applied to decontamination).

    Per corpus vector: max cosine against the benchmark set and the
    arg-max benchmark id (id-tiebroken), plus ``contaminated`` =
    round(cos, 4) >= threshold. The benchmark side is broadcast —
    benchmark suites are thousands of rows vs a corpus of billions, so
    the pairing is MAP-SIDE (one BroadcastNestedLoopJoin, no corpus
    shuffle); the only shuffle is the per-corpus-id argmax window. At
    extreme benchmark sizes, pre-prune with IVF cells
    (``similarity/ivf.assign_cells`` on both sides, join on cell) before
    this exact pass — the ANN composition, not a new operator.

    The cosine is the pure-Column fold (``functions/vectors.cosine``) —
    identical sequential arithmetic in DuckDB's list_dot_product, so the
    whole operator is oracle-checkable (the ann_cosine_topk precedent).

    ``max_benchmark`` bounds the broadcast side with a loud ValueError
    (never a silent truncation, never an OOM mid-broadcast) — the
    ``_require_broadcastable_anchors`` precedent from hard-negative
    mining. A benchmark union past the cap belongs on the IVF-pruned
    path (``semantic_contamination_pruned``)."""
    from pyspark.sql import Window

    from azure_etl_databricks_sql_powerbi_spark.functions.vectors import cosine
    from azure_etl_databricks_sql_powerbi_spark.util import require_broadcastable

    require_broadcastable(
        benchmark,
        max_benchmark,
        "max_benchmark",
        "benchmark set",
        "prune with IVF cells first (semantic_contamination_pruned)",
    )
    b = F.broadcast(
        benchmark.select(
            F.col(id_col).alias("bench_id"), F.col(vec_col).alias("__b_vec")
        )
    )
    pairs = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(b).select(
        F.col(id_col),
        F.col("bench_id"),
        cosine(vec_col, "__b_vec").alias("__cos"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__cos").desc(), F.col("bench_id").asc()
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(id_col),
            F.col("bench_id").alias("matched_bench_id"),
            F.round("__cos", 4).alias("max_cosine"),
            (F.round("__cos", 4) >= threshold).cast("int").alias("contaminated"),
        )
        .orderBy(id_col)
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus rows whose max benchmark cosine stays below threshold —
    the filter form of ``semantic_contamination`` (same left-semi shape
    as the n-gram ``decontaminate``)."""
    clean = semantic_contamination(
        corpus, benchmark, threshold, id_col, vec_col
    ).filter(F.col("contaminated") == 0)
    return corpus.join(clean.select(id_col), id_col, "left_semi")


def semantic_contamination_pruned(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.4,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """The materialized scale path for ``semantic_contamination`` (not a
    docstring promise — the r6 IVF-PQ lesson): when the benchmark union
    is too large to broadcast-score against every corpus vector, prune
    with IVF cells first. Centroids are trained ON THE BENCHMARK (its
    neighborhoods are the only ones that matter for contamination); each
    benchmark vector gets its 1 nearest cell, each corpus vector probes
    its ``nprobe`` nearest, candidates come from the cell equi-join —
    pair work drops from |corpus| x |bench| to ~|corpus| x |bench| x
    nprobe / nlist — then the EXACT cosine + per-id argmax runs on
    candidates only.

    Approximation contract (unit-tested at the operating point): a
    contaminated doc is missed only if its nearest benchmark vector sits
    in none of the doc's nprobe probed cells — for the near-dup cosines
    decontamination targets, doc and match co-locate, so recall at the
    planted-twin operating point is 1.0 while candidate pairs stay a
    strict fraction of the cross product. Output: flagged docs only
    (id, matched_bench_id, max_cosine) with max_cosine >= threshold —
    the worklist form (the brute variant reports every doc)."""
    from pyspark.sql import Window

    from azure_etl_databricks_sql_powerbi_spark.functions.vectors import cosine
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import (
        assign_cells,
        train_centroids,
    )

    cents = train_centroids(
        benchmark, vec_col, id_col, nlist=nlist, sample_size=sample_size, seed=seed
    )
    b = assign_cells(
        benchmark.select(
            F.col(id_col).alias("bench_id"), F.col(vec_col).alias("__b_vec")
        ),
        cents,
        "__b_vec",
        nprobe=1,
    )
    c = assign_cells(
        corpus.select(F.col(id_col), F.col(vec_col)), cents, vec_col, nprobe=nprobe
    )
    pairs = c.join(b, on="cell").select(
        F.col(id_col),
        F.col("bench_id"),
        cosine(vec_col, "__b_vec").alias("__cos"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__cos").desc(), F.col("bench_id").asc()
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.round("__cos", 4) >= threshold))
        .select(
            F.col(id_col),
            F.col("bench_id").alias("matched_bench_id"),
            F.round("__cos", 4).alias("max_cosine"),
        )
        .orderBy(id_col)
    )
