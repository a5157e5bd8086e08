"""Span-level corpus deduplication (C4/RefinedWeb-style line dedup).

C4 removes any three-sentence span that occurs more than once in the
corpus, keeping the first occurrence; RefinedWeb does the same at the
line/paragraph level. The operator here is that exact shape generalized
over a span extractor:

1. explode each document into ordered spans (lines if a separator is
   given, else fixed-size token chunks for unstructured text),
2. global first-seen-wins: one hash-aggregate over ``xxhash64(span)``
   picks the keeper ``(doc_id, span_idx)`` per distinct span,
3. semi-join spans back to their keepers and reassemble each surviving
   document in span order.

Scale shape: the only wide operations are (a) one groupBy on the span
hash — an 8-byte shuffle key with map-side partial min, never the span
text — and (b) the reassembly groupBy on doc_id. Span text itself moves
through the shuffle once, inside the doc-side rows, not the dedup side.
No window over the corpus, no driver state; both shuffles partition
freely at any cluster width.

North-star dedup surface (SURVEY.md §2 "North-star dedup"); no reference
analog (the reference dedups whole rows only — run_transform.py:49,65).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str | None = None,
    chunk_tokens: int = 10,
) -> DataFrame:
    """``(doc_id, span_idx, span)`` — one row per ordered span.

    With ``line_sep``, spans are separator-delimited lines. Without, the
    trimmed text is whitespace-tokenized and grouped into fixed
    ``chunk_tokens``-sized chunks (the unstructured-text fallback; the
    final partial chunk is kept). Pure JVM expressions (split + transform
    + slice), codegen'd, no Python.
    """
    if line_sep is not None:
        spans = F.split(F.col(text_col), F.lit(line_sep), -1)
    else:
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        toks = F.when(F.length(F.trim(F.col(text_col))) == 0, F.array()).otherwise(toks)
        n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
        spans = F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)
            ),
        )
        spans = F.when(F.size(toks) == 0, F.array()).otherwise(spans)
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(spans).alias("span_idx", "span")
    )


def dedup_spans_global(spans: DataFrame) -> DataFrame:
    """First-seen-wins global span dedup: for each distinct span keep the
    single occurrence with the lowest ``(doc_id, span_idx)``; every other
    occurrence (across documents AND repeats inside one document) drops.

    Span identity is its ``xxhash64`` — the dedup shuffle carries only
    8-byte hashes plus the packed (doc_id, span_idx) min-accumulator,
    never span text (the text rides only the doc-side rows of the final
    equi-join). A 64-bit collision silently merges two distinct spans;
    at 10^9 spans that is ~a 2.7e-2 birthday chance of ONE merged pair —
    the standard trade every hash-dedup pipeline (C4, RefinedWeb) makes.
    """
    hashed = spans.withColumn("__h", F.xxhash64("span"))
    keeper = hashed.groupBy("__h").agg(
        F.min(F.struct("doc_id", "span_idx")).alias("__keep")
    )
    return (
        hashed.join(keeper, "__h")
        .where(
            (F.col("doc_id") == F.col("__keep.doc_id"))
            & (F.col("span_idx") == F.col("__keep.span_idx"))
        )
        .select("doc_id", "span_idx", "span")
    )


def reassemble_docs(spans: DataFrame, joiner: str = " ") -> DataFrame:
    """Rebuild ``(doc_id, text)`` from surviving spans in original span
    order; documents whose every span was dropped disappear (as in C4).
    """
    return (
        spans.groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("span_idx", "span"))
                ).getField("span"),
                joiner,
            ).alias("text")
        )
    )


def dedup_corpus_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str | None = None,
    chunk_tokens: int = 10,
) -> DataFrame:
    """End-to-end C4-style span dedup: explode -> global first-seen-wins
    -> reassemble. Returns ``(doc_id, text)`` with duplicated spans
    removed corpus-wide (first occurrence kept).
    """
    spans = explode_spans(docs, text_col, id_col, line_sep, chunk_tokens)
    return reassemble_docs(dedup_spans_global(spans))
