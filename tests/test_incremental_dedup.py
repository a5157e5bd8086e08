"""Bloom-prefiltered incremental dedup (dedup/incremental.py): exactness
at any fpp, pruning effectiveness, and chunking/quality-rule invariants
for the other round-5 operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.dedup import incremental
from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


def test_bloom_params_sane():
    m, k = incremental.bloom_params(1000, 0.01)
    assert m % 8 == 0 and m > 9000  # ~9.6 bits/key at 1% fpp
    assert 1 <= k <= 16
    # smaller fpp -> more bits
    m2, _ = incremental.bloom_params(1000, 0.001)
    assert m2 > m


def test_bloom_has_no_false_negatives(spark):
    """Every inserted key must probe positive — the property the
    definite-novel shortcut depends on."""
    df = spark.range(500).select(F.xxhash64("id").alias("h"))
    bitmap, n_bits, k = incremental.build_bloom(df, "h", 500, fpp=0.05)
    probed = incremental.split_by_bloom(df, "h", bitmap, n_bits, k)
    assert probed.filter(F.col("__bloom_hit") == 0).count() == 0


def test_novel_documents_exact_vs_anti_join(spark):
    """novel_documents == the plain anti-join, independent of fpp (the
    bloom only prunes; it never changes the result)."""
    docs = load_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 2 == 0)
    expected = (
        batch.select("doc_id", F.md5("text").alias("fingerprint"))
        .join(
            corpus.select(F.md5("text").alias("fingerprint")).distinct(),
            on="fingerprint",
            how="left_anti",
        )
    )
    for fpp in (0.5, 0.01):  # a terrible bloom and a good one
        got = incremental.novel_documents(batch, corpus, fpp=fpp)
        assert got.count() == expected.count()
        assert (
            got.join(expected, ["doc_id", "fingerprint"]).count() == expected.count()
        )


def test_bloom_prunes_most_duplicates(spark):
    """Scale contract: with a 1% bloom, the exact-confirm join sees only
    the true dups + ~fpp of the novel rows — NOT the whole batch."""
    docs = load_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 2 == 0)
    fp = F.md5(F.col("text"))
    h = F.xxhash64(F.col("text"))
    corpus_hashes = corpus.select(h.alias("__h"), fp.alias("__fp"))
    bitmap, n_bits, k = incremental.build_bloom(
        corpus_hashes, "__h", corpus.count(), fpp=0.01
    )
    probed = incremental.split_by_bloom(
        batch.select("doc_id", h.alias("__h")), "__h", bitmap, n_bits, k
    )
    n_batch = batch.count()
    n_positive = probed.filter(F.col("__bloom_hit") == 1).count()
    n_true_dup = (
        batch.select(fp.alias("fingerprint"))
        .join(corpus.select(fp.alias("fingerprint")).distinct(), "fingerprint")
        .count()
    )
    # join-side work is bounded by true dups + fpp slack, far below batch
    assert n_positive <= n_true_dup + max(5, int(0.05 * n_batch))
    assert n_positive < n_batch


def test_chunking_reassembles_and_overlaps(spark):
    """Chunk invariants: idx contiguous from 0, every chunk <= size
    tokens, consecutive chunks share exactly `overlap` tokens, and
    stripping the overlap reconstructs the document."""
    from azure_etl_databricks_sql_powerbi_spark.operators.chunking import (
        chunk_documents,
    )

    docs = load_table(spark, SF, "documents").limit(50)
    chunks = chunk_documents(docs, chunk_tokens=8, overlap=2)
    rows = sorted(
        chunks.collect(), key=lambda r: (r["doc_id"], r["chunk_idx"])
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    originals = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, rs in by_doc.items():
        assert [r["chunk_idx"] for r in rs] == list(range(len(rs)))
        toks_all = originals[did].split()
        rebuilt: list[str] = []
        for i, r in enumerate(rs):
            ctoks = r["chunk_text"].split() if r["chunk_text"] else []
            assert len(ctoks) <= 8
            assert r["n_tokens"] == len(ctoks)
            if i == 0:
                rebuilt.extend(ctoks)
            else:
                prev = rs[i - 1]["chunk_text"].split()
                assert prev[-2:] == ctoks[:2]  # shared overlap
                rebuilt.extend(ctoks[2:])
        assert rebuilt == toks_all


def test_chunking_rejects_bad_overlap(spark):
    from azure_etl_databricks_sql_powerbi_spark.operators.chunking import (
        chunk_documents,
    )

    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_gopher_flags_consistent(spark):
    """keep == AND of the four flags; ratios are raw divisions of the
    reported counts."""
    from azure_etl_databricks_sql_powerbi_spark.functions.text import (
        gopher_quality_flags,
    )

    docs = load_table(spark, SF, "documents")
    flags = gopher_quality_flags("text", min_words=10, max_words=200)
    out = docs.select("doc_id", "text", *[v.alias(k) for k, v in flags.items()])
    for r in out.collect():
        expected_keep = int(
            r["flag_word_count"]
            and r["flag_mean_word_len"]
            and r["flag_symbol_ratio"]
            and r["flag_stopwords"]
        )
        assert r["keep"] == expected_keep
        assert r["n_words"] == len(r["text"].split())
        nonws = len("".join(r["text"].split()))
        assert r["mean_word_len"] == pytest.approx(
            nonws / max(r["n_words"], 1), abs=0
        )
