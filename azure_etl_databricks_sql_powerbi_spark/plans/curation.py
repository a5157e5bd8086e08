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


def full_curation_pipeline(
    docs: DataFrame,
    benchmark_source: str = "src0",
    lang: str = "en",
    min_quality: float = 0.5,
    contam_n: int = 3,
    contam_threshold: float = 0.8,
    chunk_tokens: int = 10,
    weights: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The complete training-data curation chain in one declarative plan:

        raw docs (minus the benchmark slice)
          -> language gate + quality gate           [one projection pass]
          -> exact dedup (min-id per content fp)    [1 shuffle: fp window]
          -> benchmark decontamination              [broadcast gram set]
          -> C4-style span dedup + text rebuild     [2 long-key shuffles]
          -> deterministic content-hash split       [map-side, 0 shuffles]

    Output: ``(doc_id, split, text)`` — the records a tokenizer would
    consume. Composition stays lazy end-to-end: Catalyst fuses the gates
    into the first scan, and each stage's shuffle keys are ids/hashes,
    never full text (text rides the doc rows exactly twice — into the
    span explode and out of the reassembly).

    Every stage is individually oracle-checked by its own contract query
    (curate_documents, decontaminate_docs, dedup_spans_docs,
    dataset_split_summary); this query oracle-checks their COMPOSITION —
    the end-to-end row set a user of the reference's pipeline-runner
    pattern (run_all_local.py:17-22) would get.
    """
    from azure_etl_databricks_sql_powerbi_spark.dedup.decontam import decontaminate
    from azure_etl_databricks_sql_powerbi_spark.dedup.lines import dedup_corpus_spans
    from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (
        deterministic_split,
    )

    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    bench = docs.filter(F.col("source") == benchmark_source)
    train = docs.filter(F.col("source") != benchmark_source)

    featured = spread(train).select(
        F.col(id_col),
        F.col(text_col),
        T.lang_id(text_col).alias("pred_lang"),
        T.quality_score(text_col).alias("quality"),
        T.fingerprint_md5(text_col).alias("fp"),
    )
    gated = featured.filter(
        (F.col("pred_lang") == lang) & (F.col("quality") >= min_quality)
    )
    w = Window.partitionBy("fp").orderBy(F.col(id_col).asc())
    deduped = (
        gated.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, text_col)
    )
    clean = decontaminate(
        deduped, bench, n=contam_n, threshold=contam_threshold,
        id_col=id_col, text_col=text_col,
    )
    # materialize the decontaminated corpus ONCE (r15, guide §2.4): the
    # span-dedup stage consumes it from TWO subplans (the keeper
    # aggregate over span hashes AND the doc-side rejoin), and without
    # the cut each side re-ran the full upstream chain — scan → language/
    # quality gates → fingerprint window → decontamination anti-join
    # (measured: 6 document scans in the one plan). The checkpoint is the
    # CURATED corpus — strictly smaller than the input — written once;
    # at 100 TB that is the standard inter-stage materialization point a
    # curation pipeline persists anyway.
    clean = clean.localCheckpoint(eager=True)
    rebuilt = dedup_corpus_spans(
        clean, text_col=text_col, id_col=id_col, chunk_tokens=chunk_tokens
    )
    return deterministic_split(rebuilt, on="text", weights=weights).select(
        "doc_id", "split", "text"
    )


def pretraining_prep(
    docs: DataFrame,
    min_words: int = 10,
    max_words: int = 200,
    weights: dict[str, float] | None = None,
    chunk_tokens: int = 8,
    overlap: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pre-training preparation chain — the round-5 operators composed
    into one declarative plan:

        raw docs
          -> Gopher quality gate (rule flags -> keep)   [fused into scan]
          -> exact dedup (min-id per md5 fingerprint)   [1 fp shuffle]
          -> leakage-safe split (near-dup cluster       [CC rounds on
             representative decides the split)           8-byte edges]
          -> RAG chunking of the TRAIN split            [explode, 0 shuffle]

    Output: ``(doc_id, chunk_idx, n_tokens, chunk_text)`` — the exact
    records an embedding/pre-training tokenizer would consume, with the
    guarantee that no near-duplicate of a val/test document ever yields a
    train chunk. Each stage is individually oracle-checked by its own
    contract query (gopher_quality_docs, dedup_exact_docs,
    leakage_safe_split, chunk_documents_rag); this query oracle-checks
    their COMPOSITION."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.cluster import shingle_edges
    from azure_etl_databricks_sql_powerbi_spark.operators.chunking import (
        chunk_documents,
    )
    from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (
        leakage_safe_split,
    )

    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    flags = T.gopher_quality_flags(
        text_col, min_words=min_words, max_words=max_words
    )
    gated = spread(docs).select(id_col, text_col).filter(flags["keep"] == 1)
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    deduped = (
        gated.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, text_col)
        # NOT checkpointed (r15 pass measured it): the edge builder's
        # evaluation already materializes inside connected_components'
        # eager rounds, so the live plan re-runs the gate+window once —
        # a blocking text-row materialization here cost more than that
        # single recompute (7.5s vs 6.5s at sf0.1; contrast
        # full_curation_pipeline's `clean`, which IS consumed twice live)
    )
    edges = shingle_edges(deduped, text_col=text_col, id_col=id_col)
    split = leakage_safe_split(deduped, edges, weights, id_col=id_col)
    train = split.filter(F.col("split") == "train").select(id_col, text_col)
    return chunk_documents(
        train,
        text_col=text_col,
        id_col=id_col,
        chunk_tokens=chunk_tokens,
        overlap=overlap,
    )


def rag_ingest(
    docs: DataFrame,
    min_words: int = 10,
    max_words: int = 200,
    chunk_tokens: int = 8,
    overlap: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG ingestion chain — the retrieval-side composition (the
    pre-training twin is ``pretraining_prep``):

        raw docs
          -> Gopher quality gate                 [fused into scan]
          -> exact doc dedup (min-id per md5)    [1 fp shuffle]
          -> overlapping chunking               [explode, 0 shuffle]
          -> CHUNK-level dedup                  [1 chunk-text shuffle]

    The last stage is what RAG pipelines add over pre-training prep:
    boilerplate chunks shared across documents (headers, footers,
    licenses) collapse to ONE indexed chunk with provenance — the
    chunk-store dedup that keeps a vector index from drowning in
    repeated spans. Output per unique chunk:
    ``(chunk_id md5, n_tokens, n_occurrences, first_doc, chunk_text)``.

    Every stage is individually oracle-checked by its contract query
    (gopher_quality_docs, dedup_exact_docs, chunk_documents_rag); the
    driver query oracle-checks the COMPOSITION, chunk dedup included.
    """
    from azure_etl_databricks_sql_powerbi_spark.operators.chunking import (
        chunk_documents,
    )

    flags = T.gopher_quality_flags(text_col, min_words=min_words, max_words=max_words)
    gated = spread(docs).select(id_col, text_col).filter(flags["keep"] == 1)
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    deduped = (
        gated.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, text_col)
    )
    chunks = chunk_documents(
        deduped,
        text_col=text_col,
        id_col=id_col,
        chunk_tokens=chunk_tokens,
        overlap=overlap,
    )
    return (
        chunks.groupBy("chunk_text")
        .agg(
            F.max("n_tokens").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min(id_col).alias("first_doc"),
        )
        .select(
            F.md5("chunk_text").alias("chunk_id"),
            "n_tokens",
            "n_occurrences",
            "first_doc",
            "chunk_text",
        )
    )
