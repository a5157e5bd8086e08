"""Document chunking for embedding/indexing pipelines.

RAG-style retrieval and embedding models consume fixed-size token windows,
not whole documents: each document is split into overlapping chunks of
``chunk_tokens`` whitespace tokens with ``overlap`` tokens shared between
consecutive chunks (stride = chunk_tokens - overlap). The 100 TB shape is
one projection + explode — no shuffle at all: chunk count is derived per
row, ``explode(sequence(...))`` fans out inside the scan stage, and the
chunk text is an ``slice``+``array_join`` over the token array. Output
cardinality is ~n_tokens/stride per doc — bounded and proportional to
input bytes, exactly like a tokenizer pass.

Pure Catalyst expressions end-to-end (no Python), so the oracle replicates
the arithmetic verbatim: n_chunks = 1 if n <= chunk_tokens else
ceil((n - chunk_tokens)/stride) + 1, chunk i = tokens[i*stride, +chunk_tokens).

No reference counterpart; north-star extension surface (similarity search
feeds on these chunks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 8,
    overlap: int = 2,
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk_text) — overlapping token windows.

    The last chunk may be short (the tail of the document); a document
    shorter than ``chunk_tokens`` (including empty) yields exactly one
    chunk. Deterministic: chunk_idx is the 0-based window index.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    # integer ceil((n - chunk_tokens)/stride) + 1, clamped to 1 chunk for
    # short docs; all small-int arithmetic, exact in any engine
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor(((n - chunk_tokens) + (stride - 1)) / stride).cast("long") + 1
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("__t"),
            n_chunks.alias("__nc"),
        )
        .select(
            id_col,
            "__t",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("__nc") - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            F.expr(f"slice(__t, chunk_idx * {stride} + 1, {chunk_tokens})").alias(
                "__chunk"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("__chunk").cast("long").alias("n_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )
