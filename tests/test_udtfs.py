"""Python UDTF surface: SQL lateral-join usage, equivalence with the
built-in explode plans (the documented fast path), and empty/blank-input
contracts."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.text import tokens
from azure_etl_databricks_sql_powerbi_spark.functions.udtfs import register_udtfs

DOCS = [
    (1, "a b c d"),
    (2, "  x   y  "),
    (3, ""),
    (4, "solo"),
]


def _docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    df.createOrReplaceTempView("__udtf_docs")
    register_udtfs(spark)
    return df


def test_ngram_udtf_lateral_sql(spark):
    _docs(spark)
    rows = spark.sql(
        """
        SELECT d.doc_id, t.pos, t.ngram
        FROM __udtf_docs d, LATERAL ngrams(d.text, 2) t
        ORDER BY d.doc_id, t.pos
        """
    ).collect()
    got = [(r.doc_id, r.pos, r.ngram) for r in rows]
    assert got == [
        (1, 0, "a b"),
        (1, 1, "b c"),
        (1, 2, "c d"),
        (2, 0, "x y"),
    ]  # doc 3 (blank) and doc 4 (too short) emit nothing


def test_ngram_udtf_equals_builtin_plan(spark):
    """The UDTF must agree with the pure-Catalyst bigram construction
    (posexplode + lead-style self-zip) on every doc — the built-in plan
    stays the fast path; the UDTF is the imperative escape hatch."""
    df = _docs(spark)
    builtin = (
        df.select("doc_id", F.posexplode(tokens("text")).alias("pos", "tok"))
        .withColumn(
            "nxt",
            F.lead("tok").over(Window.partitionBy("doc_id").orderBy("pos")),
        )
        .filter(F.col("nxt").isNotNull())
        .select("doc_id", "pos", F.concat_ws(" ", "tok", "nxt").alias("ngram"))
    )
    via_udtf = spark.sql(
        "SELECT d.doc_id, t.pos, t.ngram FROM __udtf_docs d, LATERAL ngrams(d.text, 2) t"
    )
    assert sorted(map(tuple, builtin.collect())) == sorted(map(tuple, via_udtf.collect()))


def test_fixed_chunk_udtf(spark):
    _docs(spark)
    rows = spark.sql(
        """
        SELECT t.start, t.length, t.piece
        FROM (SELECT 'abcdefgh' AS s) x, LATERAL fixed_chunks(x.s, 3) t
        ORDER BY t.start
        """
    ).collect()
    assert [(r.start, r.length, r.piece) for r in rows] == [
        (0, 3, "abc"),
        (3, 3, "def"),
        (6, 2, "gh"),
    ]
