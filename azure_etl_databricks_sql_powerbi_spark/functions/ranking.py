"""BM25 full-text relevance ranking over the documents corpus.

Okapi BM25 (Robertson & Zaragoza 2009) with the Lucene idf variant
``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always positive). This is the
retrieval-tier companion to ``salient_terms`` (tf/df salience) and the
unigram/bigram LM quality scores: given a bag of query terms, rank the
corpus.

Cross-engine-exact by the micro-unit contract
(``unigram_logprob_scores`` precedent): the one transcendental (ln) is
quantized to integer micro-units immediately, every other op is a single
IEEE +,-,*,/ written with identical parenthesization in the DuckDB
oracle, the per-(doc,term) contribution is floor-quantized to micro-units
BEFORE the per-doc aggregation (exact integer SUM — no float
accumulation-order divergence), and the final score is one raw division.

Scale shape (100 TB): the corpus-sized work is ONE explode + two
aggregations — doc lengths (groupBy doc_id) and per-(doc,term) tf
(groupBy doc_id,token AFTER an ``isin(query_terms)`` map-side filter, so
only postings of the query's terms shuffle — posting-list-sized, not
corpus-sized). df and idf derive from the tf relation (tiny). N/avgdl is
a single 1-row bounded aggregate collect (QC-agg contract,
operators/qc.py:100). The final top-n is TakeOrdered, never a global
sort.

Reference parity: the reference engine has no retrieval surface; EXT
tier (SURVEY.md §2 F10-EXT neighborhood).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.text import tokens

K1 = 1.2
B = 0.75


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 25,
) -> DataFrame:
    """Rank documents against ``query_terms`` by BM25.

    Returns (rank, doc_id, n_hits, score): the ``top_n`` matching docs by
    (score desc, id asc) — deterministic total order. ``n_hits`` is how
    many distinct query terms the doc contains.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    doc_len = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))

    # one bounded 1-row aggregate collect: corpus-level scalars N, avgdl
    n_docs = df.count()
    total_tokens = doc_len.agg(F.sum("dl")).collect()[0][0] or 0
    avgdl = float(total_tokens) / float(n_docs) if n_docs else 1.0

    # map-side filter to the query's postings BEFORE the shuffle
    tf = (
        toks.filter(F.col("token").isin(list(query_terms)))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df_t / idf from the (doc,term) relation — term-cardinality-sized
    idf = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    idf = idf.select(
        "token",
        F.floor(
            F.ln(((F.lit(n_docs) - F.col("df_t")) + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5)) + F.lit(1.0))
            * F.lit(1e6)
        )
        .cast("long")
        .alias("idf_m"),
    )
    scored = (
        tf.join(F.broadcast(idf), on="token")
        .join(doc_len, on=id_col)
        .select(
            F.col(id_col),
            F.floor(
                (F.col("idf_m") * (F.col("tf") * F.lit(K1 + 1.0)))
                / (
                    F.col("tf")
                    + F.lit(K1)
                    * (F.lit(1.0 - B) + F.lit(B) * (F.col("dl") / F.lit(avgdl)))
                )
            )
            .cast("long")
            .alias("contrib_m"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.sum("contrib_m").alias("score_m"),
        )
    )
    top = scored.orderBy(F.col("score_m").desc(), F.col(id_col).asc()).limit(top_n)
    w = Window.orderBy(F.col("score_m").desc(), F.col(id_col).asc())
    return top.select(
        F.row_number().over(w).alias("rank"),
        F.col(id_col),
        F.col("n_hits").cast("long").alias("n_hits"),
        (F.col("score_m") / F.lit(1e6)).alias("score"),
    )
