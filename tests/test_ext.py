"""EXT-surface tests: text functions, exact/minhash/simhash dedup with
planted duplicates, vector kernels, LSH recall vs brute force."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.dedup.exact import (
    dedup_exact_keep_first,
    dedup_exact_stats,
)
from azure_etl_databricks_sql_powerbi_spark.dedup.minhash import near_dup_pairs as minhash_pairs
from azure_etl_databricks_sql_powerbi_spark.dedup.simhash import near_dup_pairs as simhash_pairs
from azure_etl_databricks_sql_powerbi_spark.functions import text as T
from azure_etl_databricks_sql_powerbi_spark.functions.vectors import (
    cosine,
    dot,
    l2_distance,
    unit_normalize,
)
from azure_etl_databricks_sql_powerbi_spark.similarity.bruteforce import (
    cosine_near_pairs,
    cosine_topk,
)
from azure_etl_databricks_sql_powerbi_spark.similarity.lsh import (
    expected_collision_prob,
    lsh_cosine_topk,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the birds sing in the tall green trees outside"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact duplicate of 0
        (2, BASE.replace("quick", "swift")),  # near-duplicate of 0
        (3, "completely different content about database engines and query plans"),
        (4, "el gato duerme en la casa y no quiere salir de la cama hoy"),
        (5, ""),  # empty doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count_and_empty(spark, docs):
    out = {r.doc_id: r.n for r in docs.select("doc_id", T.token_count("text").alias("n")).collect()}
    assert out[5] == 0
    assert out[0] == len(BASE.split())


def test_quality_and_lang(spark, docs):
    rows = {
        r.doc_id: (r.q, r.lang)
        for r in docs.select(
            "doc_id", T.quality_score("text").alias("q"), T.lang_id("text").alias("lang")
        ).collect()
    }
    assert rows[0][1] == "en"
    assert rows[4][1] == "es"
    assert 0 <= rows[5][0] <= 1 and rows[0][0] > rows[5][0]


def test_word_ngrams(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    out = df.select(T.word_ngrams("text", 3).alias("g")).collect()
    assert out[0].g == ["a b c", "b c d"]
    assert out[1].g == ["a b"]  # shorter than n -> whole text


def test_exact_dedup_planted(spark, docs):
    stats = dedup_exact_stats(docs).filter(F.col("n_dups") > 1).collect()
    assert len(stats) == 1 and stats[0].canonical_id == 0 and stats[0].n_dups == 2
    kept = dedup_exact_keep_first(docs)
    assert kept.count() == 5  # one of the two exact dups dropped
    assert kept.filter(F.col("doc_id") == 1).count() == 0


def test_minhash_finds_planted_near_dup(spark, docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in minhash_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0  # exact dup
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.5  # near dup
    assert (0, 3) not in pairs and (0, 4) not in pairs


def test_simhash_finds_planted_near_dup(spark, docs):
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs.get((0, 1)) == 0  # identical fingerprints
    assert (0, 2) in pairs  # one-word change stays within the ball
    assert (0, 3) not in pairs


@pytest.fixture(scope="module")
def vectors(spark):
    # 3 clusters of 5 near-identical vectors + self-ids, dim 8
    import random

    rng = random.Random(7)
    rows = []
    for c in range(3):
        center = [rng.gauss(0, 1) for _ in range(8)]
        for i in range(5):
            vec = [x + rng.gauss(0, 0.01) for x in center]
            rows.append((c * 5 + i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_vector_kernels(spark):
    df = spark.createDataFrame([([3.0, 4.0], [4.0, 3.0])], "a array<double>, b array<double>")
    r = df.select(
        dot("a", "b").alias("d"),
        cosine("a", "a").alias("self"),
        l2_distance("a", "b").alias("l2"),
        F.round(F.sqrt(F.aggregate(F.transform(unit_normalize("a"), lambda x: x * x), F.lit(0.0), lambda a, x: a + x)), 9).alias("unitnorm"),
    ).collect()[0]
    assert r.d == 24.0
    assert abs(r.self - 1.0) < 1e-12
    assert abs(r.l2 - math.sqrt(2)) < 1e-12
    assert r.unitnorm == 1.0


def test_bruteforce_topk_finds_cluster(spark, vectors):
    out = cosine_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=4)
    neighbors = {r.neighbor_id for r in out.collect()}
    assert neighbors == {1, 2, 3, 4}  # same-cluster vectors


def test_lsh_recall_on_clusters(spark, vectors):
    exact = cosine_topk(vectors, vectors.filter(F.col("vec_id") < 5), k=4)
    approx = lsh_cosine_topk(
        vectors, vectors.filter(F.col("vec_id") < 5), k=4, dim=8, n_bits=4, n_tables=8
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # near-identical vectors collide with prob ~1 per table; analytic bound
    assert expected_collision_prob(0.999, 4, 8) > 0.99
    assert recall >= 0.9, f"LSH recall too low: {recall}"


def test_ivf_recall_on_clusters(spark, vectors):
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import (
        assign_cells,
        ivf_cosine_topk,
        train_centroids,
    )

    exact = cosine_topk(vectors, vectors.filter(F.col("vec_id") < 5), k=4)
    approx = ivf_cosine_topk(
        vectors,
        vectors.filter(F.col("vec_id") < 5),
        k=4,
        nlist=3,
        nprobe=2,
        sample_size=15,
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # 3 tight clusters, 3 centroids, 2 probes -> same-cluster neighbors
    # are found essentially always
    assert recall >= 0.9, f"IVF recall too low: {recall}"
    # assignment is deterministic given the seed
    cents = train_centroids(vectors, nlist=3, sample_size=15)
    a1 = {(r.vec_id, r.cell) for r in assign_cells(vectors, cents).collect()}
    a2 = {(r.vec_id, r.cell) for r in assign_cells(vectors, cents).collect()}
    assert a1 == a2


def test_lsh_near_pairs_recall(spark, vectors):
    """LSH-bucketed near-pair dedup finds the same high-cosine pairs as the
    quadratic brute force on clustered vectors."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.lsh import lsh_near_pairs

    exact = {
        (r.id_a, r.id_b)
        for r in cosine_near_pairs(vectors, threshold=0.99).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in lsh_near_pairs(
            vectors, threshold=0.99, dim=8, n_bits=4, n_tables=8
        ).collect()
    }
    assert exact, "fixture should contain near-dup pairs"
    # every LSH pair is exact-verified, so no false positives possible
    assert approx <= exact
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall}"


def test_pq_recall_on_clusters(spark, vectors):
    from azure_etl_databricks_sql_powerbi_spark.similarity.pq import (
        encode_pq,
        pq_cosine_topk,
        train_pq_codebooks,
    )

    exact = cosine_topk(vectors, vectors.filter(F.col("vec_id") < 5), k=4)
    approx = pq_cosine_topk(
        vectors,
        vectors.filter(F.col("vec_id") < 5),
        k=4,
        m=4,
        n_centroids=4,
        sample_size=15,
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # 3 tight clusters quantized with 4 centroids/subspace: same-cluster
    # vectors share codes, so their ADC scores dominate
    assert recall >= 0.9, f"PQ recall too low: {recall}"
    # codes are deterministic given the seed, and one byte per subspace
    books = train_pq_codebooks(vectors, m=4, k=4, sample_size=15)
    c1 = encode_pq(vectors, books).select("vec_id", "pq_code").collect()
    c2 = encode_pq(vectors, books).select("vec_id", "pq_code").collect()
    assert sorted(map(str, c1)) == sorted(map(str, c2))
    assert all(len(r.pq_code) == 4 for r in c1)


# ------------------------------------------------------------- span dedup


def test_span_dedup_removes_cross_doc_duplicates(spark):
    from azure_etl_databricks_sql_powerbi_spark.dedup.lines import dedup_corpus_spans

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),          # original line
            (2, "alpha beta gamma"),          # exact duplicate doc -> vanishes
            (3, "delta epsilon\nalpha beta gamma"),  # 2nd line duplicated
            (4, "unique words here"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.text
        for r in dedup_corpus_spans(docs, line_sep="\n").collect()
    }
    assert out == {
        1: "alpha beta gamma",
        3: "delta epsilon",
        4: "unique words here",
    }  # doc 2 fully deduplicated away; doc 3 keeps only its novel line


def test_span_dedup_first_seen_within_doc(spark):
    from azure_etl_databricks_sql_powerbi_spark.dedup.lines import dedup_corpus_spans

    docs = spark.createDataFrame(
        [(7, "x y\nz w\nx y")], ["doc_id", "text"]
    )  # repeated line inside ONE doc: keep first occurrence only
    [row] = dedup_corpus_spans(docs, line_sep="\n").collect()
    assert row.text == "x y z w"


def test_span_dedup_chunk_mode_splits_and_reassembles(spark):
    from azure_etl_databricks_sql_powerbi_spark.dedup.lines import (
        dedup_corpus_spans,
        explode_spans,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(25))), (2, ""), (3, "   ")],
        ["doc_id", "text"],
    )
    spans = explode_spans(docs, chunk_tokens=10).collect()
    # 25 tokens -> chunks of 10/10/5; empty + whitespace docs -> no spans
    assert sorted((r.doc_id, r.span_idx) for r in spans) == [(1, 0), (1, 1), (1, 2)]
    assert [r.span for r in spans if r.span_idx == 2][0] == "t20 t21 t22 t23 t24"
    out = dedup_corpus_spans(docs, chunk_tokens=10).collect()
    assert len(out) == 1 and out[0].text == " ".join(f"t{i}" for i in range(25))


# --------------------------------------------------------- semantic dedup


def test_semantic_dedup_keeps_one_per_cluster(spark, vectors):
    """3 planted clusters of 5 near-identical vectors: SemDeDup at 0.99
    must keep exactly the lowest id of each cluster and all pairs must be
    intra-cluster."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.semantic import (
        semantic_dedup,
        semantic_dup_pairs,
    )
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import train_centroids

    survivors = sorted(
        r.vec_id
        for r in semantic_dedup(
            vectors, threshold=0.99, nlist=3, sample_size=15
        ).collect()
    )
    assert survivors == [0, 5, 10]

    cents = train_centroids(vectors, nlist=3, sample_size=15)
    pairs = semantic_dup_pairs(vectors, cents, threshold=0.99).collect()
    assert len(pairs) == 3 * 10  # C(5,2) per cluster
    assert all(r.id_a // 5 == r.id_b // 5 for r in pairs)


def test_semantic_dedup_max_cell_guard(spark, vectors):
    """A max_cell below the cell population must drop those cells from
    pair generation entirely (no quadratic blowup on degenerate cells)."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.semantic import semantic_dup_pairs
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import train_centroids

    cents = train_centroids(vectors, nlist=3, sample_size=15)
    assert semantic_dup_pairs(vectors, cents, threshold=0.5, max_cell=4).count() == 0
