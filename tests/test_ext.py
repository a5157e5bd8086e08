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


def test_bigram_logprob_discriminates_shuffled_text(spark):
    """The interpolated bigram LM must rank fluent text (whose bigrams
    ride the corpus head) above the SAME tokens shuffled (fluent
    unigrams, unseen bigrams) — the failure mode a unigram score cannot
    see. Also pins the n_bigram_hits accounting and the empty-doc row."""
    from azure_etl_databricks_sql_powerbi_spark.functions.text import (
        bigram_logprob_scores,
    )

    fluent = "the cat sat on the mat"
    rows = [(i, fluent) for i in range(10)]  # corpus head: fluent bigrams
    rows.append((10, "mat the on sat cat the"))  # same unigrams, shuffled
    rows.append((11, ""))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        # bigram vocab of 5 = exactly the fluent doc's 5 bigrams (count 10
        # each); the shuffled doc's singleton bigrams miss the cut
        for r in bigram_logprob_scores(df, vocab_size=50, bigram_vocab_size=5).collect()
    }
    assert out[11].n_tokens == 0 and out[11].mean_logprob == 0.0
    assert out[0].n_tokens == 6
    # every consecutive pair of the fluent doc is in the bigram head
    assert out[0].n_bigram_hits == 5
    # the shuffled doc falls off the bigram head and scores strictly lower
    assert out[10].n_bigram_hits == 0
    assert out[10].mean_logprob < out[0].mean_logprob


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


def test_ivfpq_recall_matches_ivf_flat(spark, vectors):
    """IVF-PQ with exact refinement recovers PQ quantization loss: recall
    >= IVF-Flat at equal nlist/nprobe (the VERDICT-r5 acceptance bar)."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import ivf_cosine_topk
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivfpq import (
        ivfpq_cosine_topk,
    )

    qs = vectors.filter(F.col("vec_id") < 5)
    exact = cosine_topk(vectors, qs, k=4)
    flat = ivf_cosine_topk(vectors, qs, k=4, nlist=3, nprobe=2, sample_size=15)
    comp = ivfpq_cosine_topk(
        vectors, qs, k=4, nlist=3, nprobe=2, m=4, n_centroids=4,
        sample_size=15, refine_factor=4,
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    rf = {(r.query_id, r.neighbor_id) for r in flat.collect()}
    rc = {(r.query_id, r.neighbor_id) for r in comp.collect()}
    recall_flat = len(e & rf) / len(e)
    recall_comp = len(e & rc) / len(e)
    assert recall_comp >= recall_flat, (recall_comp, recall_flat)
    assert recall_comp >= 0.9
    # deterministic across runs
    again = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_cosine_topk(
            vectors, qs, k=4, nlist=3, nprobe=2, m=4, n_centroids=4,
            sample_size=15, refine_factor=4,
        ).collect()
    }
    assert again == rc


def test_assign_and_encode_pq_matches_composition(spark, vectors):
    """r16: the fused one-pass indexing kernel (assign_and_encode_pq)
    must be BIT-IDENTICAL to the two-stage composition it replaced
    (encode_pq over assign_cells at nprobe=1) — the kernel re-implements
    both argmins by hand, so this is the pin that makes a drift in
    either copy fail loudly instead of silently changing shipped ANN
    results (ann_ivfpq_* are rows-only, no oracle hash to catch it)."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import (
        assign_cells,
        train_centroids,
    )
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivfpq import (
        assign_and_encode_pq,
    )
    from azure_etl_databricks_sql_powerbi_spark.similarity.pq import (
        encode_pq,
        train_pq_codebooks,
    )

    cents = train_centroids(vectors, nlist=3, sample_size=15)
    books = train_pq_codebooks(vectors, m=4, k=4, sample_size=15)
    fused = assign_and_encode_pq(vectors, cents, books)
    composed = encode_pq(assign_cells(vectors, cents, nprobe=1), books)
    a = sorted(
        (r.vec_id, r.cell, tuple(r.pq_code))
        for r in fused.select("vec_id", "cell", "pq_code").collect()
    )
    b = sorted(
        (r.vec_id, r.cell, tuple(r.pq_code))
        for r in composed.select("vec_id", "cell", "pq_code").collect()
    )
    assert a and a == b


def test_ivfpq_scans_fraction_of_corpus(spark):
    """The ADC scan's input is bounded by the probed cells, not the
    corpus: with queries drawn from few clusters, rows entering the scan
    (cell IN union-of-probed) are a strict fraction of the corpus."""
    import random

    from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import (
        assign_cells,
        train_centroids,
    )
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivfpq import (
        ivfpq_cosine_topk,
    )
    import numpy as np

    rng = random.Random(11)
    rows = []
    for c in range(8):  # 8 well-separated clusters
        center = [rng.gauss(0, 1) * 4 for _ in range(8)]
        for i in range(25):
            rows.append(
                (c * 25 + i, [x + rng.gauss(0, 0.05) for x in center])
            )
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = corpus.filter(F.col("vec_id") < 3)  # all from cluster 0

    # replicate the probe: same seeds -> same centroids -> same cells
    cents = train_centroids(corpus, nlist=8, sample_size=200)
    qp = qs.toPandas()
    qx = np.array([np.asarray(v, dtype=np.float64) for v in qp["embedding"]])
    qx = qx / np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    union_cells = sorted(
        {int(c) for c in np.argsort(-(qx @ cents.T), axis=1)[:, :2].ravel()}
    )
    assigned = assign_cells(
        corpus.select("vec_id", F.col("embedding").alias("c_vec")), cents,
        "c_vec", nprobe=1,
    )
    n_scanned = assigned.filter(F.col("cell").isin(union_cells)).count()
    n_total = corpus.count()
    assert n_scanned < n_total / 2, (n_scanned, n_total)

    # and the composed search still finds the same-cluster neighbors
    # (refine_factor=8: same-cluster ADC scores are near-ties, so the
    # shortlist must cover the probed cluster for exact re-rank to order it)
    out = ivfpq_cosine_topk(
        corpus, qs, k=4, nlist=8, nprobe=2, m=4, n_centroids=8, sample_size=200,
        refine_factor=8,
    )
    got = {(r.query_id, r.neighbor_id) for r in out.collect()}
    exact = cosine_topk(corpus, qs, k=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    assert len(e & got) / len(e) >= 0.9


def test_pq_query_guard_rejects_oversized_query_frame(spark, vectors):
    """VERDICT-r5 nit: a corpus-sized queries frame must fail loudly, not
    OOM the driver building per-query ADC tables."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivfpq import (
        ivfpq_cosine_topk,
    )
    from azure_etl_databricks_sql_powerbi_spark.similarity.pq import pq_cosine_topk

    with pytest.raises(ValueError, match="max_queries"):
        pq_cosine_topk(vectors, vectors, k=2, sample_size=15, max_queries=5)
    with pytest.raises(ValueError, match="max_queries"):
        ivfpq_cosine_topk(vectors, vectors, k=2, sample_size=15, max_queries=5)


def _clustered_corpus(spark, n_clusters=8, per_cluster=25, dim=8, seed=11):
    import random

    rng = random.Random(seed)
    rows = []
    for c in range(n_clusters):
        center = [rng.gauss(0, 1) * 4 for _ in range(dim)]
        for i in range(per_cluster):
            rows.append((c * per_cluster + i, [x + rng.gauss(0, 0.05) for x in center]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_persisted_index_matches_inplan_operator(spark, tmp_path):
    """VERDICT r6 directive 2: save_index -> load_index -> query_index
    answers WITHOUT retraining and row-for-row matches the in-plan
    ivfpq_cosine_topk (same seeds => same model; both run _ivfpq_probe,
    so the persisted path cannot drift semantically)."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.index import (
        load_index,
        query_index,
        save_index,
    )
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivfpq import (
        ivfpq_cosine_topk,
    )

    corpus = _clustered_corpus(spark)
    qs = corpus.filter(F.col("vec_id") < 3)
    save_index(
        corpus, str(tmp_path / "idx"), nlist=8, m=4, n_centroids=8, sample_size=200
    )
    loaded = load_index(spark, str(tmp_path / "idx"))
    day2 = {
        (r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
        for r in query_index(loaded, qs, k=4, nprobe=2, refine_factor=8).collect()
    }
    inplan = {
        (r.query_id, r.rank, r.neighbor_id, r.cosine_sim)
        for r in ivfpq_cosine_topk(
            corpus, qs, k=4, nlist=8, nprobe=2, m=4, n_centroids=8,
            sample_size=200, refine_factor=8,
        ).collect()
    }
    assert day2 == inplan
    # the exact-cosine refine also makes it high-recall vs brute force
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(corpus, qs, k=4).collect()}
    got = {(q, n) for q, _rk, n, _c in day2}
    assert len(exact & got) / len(exact) >= 0.9


def test_append_to_index_finds_new_vectors_without_retrain(spark, tmp_path):
    """Day-3 incremental maintenance: a new batch encoded with the FROZEN
    model and appended into the cell layout is immediately searchable; a
    planted twin of a query vector surfaces as its top neighbor, the
    model arrays are untouched, and pre-existing rows still answer."""
    import numpy as np

    from azure_etl_databricks_sql_powerbi_spark.similarity.index import (
        append_to_index,
        load_index,
        query_index,
        save_index,
    )

    corpus = _clustered_corpus(spark)
    save_index(
        corpus, str(tmp_path / "idx"), nlist=8, m=4, n_centroids=8, sample_size=200
    )
    idx = load_index(spark, str(tmp_path / "idx"))
    cents_before = idx.centroids.copy()

    # plant a near-twin of vec 0 under a NEW id, plus unrelated new rows
    v0 = corpus.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    twin = [x + 0.001 for x in v0]
    batch = spark.createDataFrame(
        [(10_000, twin), (10_001, [9.0] * 8)],
        "vec_id long, embedding array<double>",
    )
    idx2 = append_to_index(idx, batch, str(tmp_path / "idx"))
    assert np.array_equal(idx2.centroids, cents_before)  # no retrain

    qs = corpus.filter(F.col("vec_id") == 0)
    got = query_index(idx2, qs, k=3, nprobe=2, refine_factor=8).collect()
    assert got[0].neighbor_id == 10_000  # the appended twin wins rank 1
    # old corpus rows still present in the same index
    assert any(r.neighbor_id < 200 for r in got)


def test_save_index_full_trainer_contract(spark, tmp_path):
    """trainer='full' (distributed Lloyd's coarse centroids) produces the
    same index layout and a queryable, high-recall index; bad trainer
    names fail loudly."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.index import (
        query_index,
        save_index,
    )

    corpus = _clustered_corpus(spark)
    idx = save_index(
        corpus, str(tmp_path / "idxf"), nlist=8, m=4, n_centroids=8,
        sample_size=200, trainer="full",
    )
    assert idx.centroids.shape == (8, 8)
    qs = corpus.filter(F.col("vec_id") < 3)
    got = {
        (r.query_id, r.neighbor_id)
        for r in query_index(idx, qs, k=4, nprobe=2, refine_factor=8).collect()
    }
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(corpus, qs, k=4).collect()}
    assert len(exact & got) / len(exact) >= 0.9
    with pytest.raises(ValueError, match="trainer"):
        save_index(corpus, str(tmp_path / "idxbad"), trainer="nope")


def test_persisted_index_probe_prunes_cell_partitions(spark, tmp_path):
    """The materialized partition-pruning claim (the r6 gap): the probe's
    scan of the coded table carries PartitionFilters on `cell`, and the
    files it reads are ONLY the probed-cell directories — never the whole
    corpus layout (the test_dpp_prunes_fact_partitions precedent)."""
    import re

    import numpy as np

    from azure_etl_databricks_sql_powerbi_spark.similarity.index import (
        load_index,
        query_index,
        save_index,
    )

    corpus = _clustered_corpus(spark)
    qs = corpus.filter(F.col("vec_id") < 3)  # all from one cluster
    save_index(
        corpus, str(tmp_path / "idx"), nlist=8, m=4, n_centroids=8, sample_size=200
    )
    loaded = load_index(spark, str(tmp_path / "idx"))
    out = query_index(loaded, qs, k=4, nprobe=2, refine_factor=8)

    # replicate the driver-side probe to know the expected cell union
    qp = qs.toPandas()
    qx = np.array([np.asarray(v, dtype=np.float64) for v in qp["embedding"]])
    qx = qx / np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    union_cells = {
        int(c) for c in np.argsort(-(qx @ loaded.centroids.T), axis=1)[:, :2].ravel()
    }

    plan = out._jdf.queryExecution().executedPlan().toString()
    pf_lines = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "cell" in ln
    ]
    assert pf_lines, plan  # the isin compiles to a partition filter, not a row filter
    assert any("cell" in ln and " IN " in ln.upper() for ln in pf_lines), pf_lines

    # physical file set AT RUNTIME: input_file_name() over the same
    # pruned scan shape reports only probed-cell partition directories
    # (df.inputFiles() can't prove this — it lists the pre-pruning
    # FileIndex). The files actually read are a strict subset of the
    # 8-cell layout and all inside the probed union.
    files_read = [
        r[0]
        for r in loaded.coded.filter(F.col("cell").isin(list(union_cells)))
        .select(F.input_file_name())
        .distinct()
        .collect()
    ]
    cells_read = {
        int(m.group(1)) for f in files_read if (m := re.search(r"cell=(\d+)", f))
    }
    assert cells_read, files_read
    assert cells_read <= union_cells, (cells_read, union_cells)
    # and strictly fewer than the full layout (8 cells written)
    assert len(cells_read) < 8


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


def test_auto_srp_params_linear_candidate_work():
    """auto_srp_params widens the SRP code with the corpus so expected
    bucket population stays ~target_bucket: total in-bucket candidate
    work scales LINEARLY with N (a fixed 8-bit code grows it with N² —
    the 6.4x sf0.1->sf1 ratio measured in BENCH_SF1 before this). The
    chosen table count must clear the analytic recall target at the
    design cosine."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.lsh import (
        auto_srp_params,
        expected_collision_prob,
    )

    # clamps + recall guarantee
    bits, tables = auto_srp_params(22, sim=0.99, target_recall=0.99999)
    assert bits == 4  # lo clamp for tiny corpora
    assert expected_collision_prob(0.99, bits, tables) >= 0.99999

    bits1, tables1 = auto_srp_params(22_000, sim=0.99, target_recall=0.99999)
    assert bits1 == math.ceil(math.log2(22_000 / 16))  # ~target_bucket pop
    assert expected_collision_prob(0.99, bits1, tables1) >= 0.99999

    def candidate_work(n: int) -> float:
        bits, tables = auto_srp_params(n, sim=0.99, target_recall=0.99999)
        pop = n / 2**bits
        return tables * (2**bits) * pop * (pop - 1) / 2

    # 10x the corpus inside the unclamped regime -> ~10x the candidate
    # work (the ceil on bits makes it lumpy; fixed bits would give ~100x)
    ratio = candidate_work(220_000) / candidate_work(22_000)
    assert 3 <= ratio <= 25, ratio

    # infeasible recall at max_tables steps bits down, never explodes
    bits2, tables2 = auto_srp_params(
        10**6, sim=0.80, target_recall=0.999, max_tables=32
    )
    assert tables2 <= 32
    assert expected_collision_prob(0.80, bits2, tables2) >= 0.999

    # unreachable even at lo_bits -> LOUD ValueError, never a silently
    # lower-recall config (the no-silent-caps contract)
    with pytest.raises(ValueError, match="no SRP config"):
        auto_srp_params(10**7, sim=0.5, target_recall=0.99999, max_tables=8)
    with pytest.raises(ValueError, match="target_recall"):
        auto_srp_params(1000, sim=0.9, target_recall=1.0)


def test_auto_nlist_linear_pair_work():
    """auto_nlist keeps per-cell population (so per-cell quadratic pair
    work) constant as the corpus grows: total candidate pairs scale
    LINEARLY with N, not quadratically (the fixed-nlist failure measured
    in BENCH_SF1.md). Also pins the clamps."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.semantic import auto_nlist

    # clamps
    assert auto_nlist(0) == 16
    assert auto_nlist(100) == 16  # lo
    assert auto_nlist(10**9) == 4096  # hi bounds driver k-means
    # ceil division
    assert auto_nlist(129, target_cell=128, lo=1) == 2

    def pair_work(n: int) -> float:
        cells = auto_nlist(n)
        pop = n / cells
        return cells * pop * (pop - 1) / 2

    # 10x the corpus inside the unclamped regime -> ~10x the pair work
    # (fixed nlist would give ~100x)
    ratio = pair_work(200_000) / pair_work(20_000)
    assert 8 <= ratio <= 13, ratio


def test_contract_queries_realistic_operating_point(spark):
    """The embedding contract queries run with planted near-dups at a
    realistic >=0.92 threshold (round-3 directive): LSH must recover every
    planted pair and nothing else (precision 1.0), its bucketing must keep
    candidate pairs under 5% of all pairs (i.e. it actually prunes), and
    SemDeDup must drop exactly the planted copies."""
    import __spark_entry__ as entrymod
    from azure_etl_databricks_sql_powerbi_spark.similarity.lsh import add_bucket_codes
    from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    n = emb.count()
    planted = entrymod._plant_near_dups(emb)
    n_planted = planted.count() - n

    pairs = entrymod._q_embedding_near_pairs_lsh(spark, sf).collect()
    assert len(pairs) == n_planted
    assert all(r.id_b - r.id_a == 1_000_000 for r in pairs)

    # pruning: distinct candidate pairs (same-bucket in any table) < 5% of
    # all C(N,2) pairs — replicate the query's bucket config
    n_tables = 8
    coded = add_bucket_codes(
        planted.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")),
        "v", dim=64, n_bits=8, n_tables=n_tables, seed=42,
    )
    melted = coded.select(
        "id",
        F.posexplode(
            F.array(*[F.col(f"bucket_{t}") for t in range(n_tables)])
        ).alias("tbl", "code"),
    )
    cands = (
        melted.alias("a")
        .join(
            melted.alias("b"),
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.code") == F.col("b.code"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select("a.id", "b.id")
        .distinct()
        .count()
    )
    total = planted.count()
    all_pairs = total * (total - 1) // 2
    assert cands < 0.05 * all_pairs, f"{cands}/{all_pairs} candidates — LSH not pruning"

    survivors = entrymod._q_semantic_dedup(spark, sf)
    assert survivors.count() == n
    assert survivors.agg(F.max("vec_id")).first()[0] < 1_000_000


def test_semantic_dup_pairs_never_pairs_equal_ids(spark):
    """Rows sharing a vec_id (bad upstream data) must not produce
    id_a == id_b rows — the strict id_a < id_b output contract. The
    positional upper-triangle of the GEMM rewrite would pair them;
    the strict id comparison excludes them (and semantic_dedup's
    drop-by-id_b then cannot silently drop both copies)."""
    import numpy as np

    from azure_etl_databricks_sql_powerbi_spark.dedup.semantic import semantic_dup_pairs

    rows = [(7, [1.0, 0.0]), (7, [0.99, 0.01]), (9, [0.98, 0.02])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = np.array([[1.0, 0.0]])
    pairs = semantic_dup_pairs(df, cents, threshold=0.5, id_col="vec_id").collect()
    assert all(r.id_a < r.id_b for r in pairs)
    # both physical id-7 rows still pair with id 9 (multiplicity kept)
    assert sorted((r.id_a, r.id_b) for r in pairs) == [(7, 9), (7, 9)]


def test_semantic_dedup_max_cell_guard(spark, vectors):
    """A max_cell below the cell population must drop those cells from
    pair generation entirely (no quadratic blowup on degenerate cells)."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.semantic import semantic_dup_pairs
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import train_centroids

    cents = train_centroids(vectors, nlist=3, sample_size=15)
    assert semantic_dup_pairs(vectors, cents, threshold=0.5, max_cell=4).count() == 0


# ------------------------------------------------- no-silent-caps metrics
#
# Each capped operator takes an optional Observation and reports what the
# cap dropped (VERDICT r3 directive #4). Tests trip the cap while leaving
# survivors — the realistic regime, and also required because AQE prunes
# the CollectMetrics node from a plan it collapses to a fully-empty
# relation (observed metrics then never materialize).


def test_semantic_max_cell_cap_is_observed(spark):
    """When the max_cell guard trips, the caller-supplied Observation must
    report the dropped cell/row counts while surviving cells still pair."""
    from pyspark.sql import Observation

    from azure_etl_databricks_sql_powerbi_spark.dedup.semantic import semantic_dup_pairs
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import train_centroids

    import random

    rng = random.Random(3)
    big = [rng.gauss(0, 1) for _ in range(8)]
    small = [rng.gauss(0, 1) for _ in range(8)]
    rows = [(i, [x + rng.gauss(0, 0.01) for x in big]) for i in range(6)]
    rows += [(10 + i, [x + rng.gauss(0, 0.01) for x in small]) for i in range(2)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = train_centroids(vecs, nlist=2, sample_size=8)
    obs = Observation("semantic_caps")
    out = semantic_dup_pairs(vecs, cents, threshold=0.9, max_cell=5, observation=obs)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert pairs == {(10, 11)}  # the 6-member cell is over cap; 2-member survives
    assert obs.get["dropped_cells"] == 1
    assert obs.get["dropped_rows"] == 6

    # and with the cap NOT tripping, the metrics must read zero
    obs2 = Observation("semantic_caps_ok")
    semantic_dup_pairs(vecs, cents, threshold=0.9, max_cell=100, observation=obs2).count()
    assert obs2.get["dropped_cells"] == 0


def test_minhash_max_bucket_cap_is_observed(spark):
    """max_bucket trips -> Observation reports dropped buckets + their
    member rows instead of silently skipping them; under-cap buckets
    still emit their pairs."""
    from pyspark.sql import Observation

    quad = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod"
    duo = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, quad) for i in range(4)] + [(10, duo), (11, duo)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    obs = Observation("minhash_caps")
    # identical docs share every band bucket: the 4-copy doc's buckets are
    # over a cap of 3 (dropped + reported), the 2-copy doc's are under it
    out = minhash_pairs(docs, threshold=0.5, max_bucket=3, observation=obs)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert pairs == {(10, 11)}
    assert obs.get["dropped_buckets"] > 0
    assert obs.get["dropped_bucket_rows"] == 4 * obs.get["dropped_buckets"]


def test_shingle_df_cap_is_observed(spark):
    """Boilerplate shingles above max_df are counted via the Observation,
    not silently excluded from edge generation."""
    from pyspark.sql import Observation

    from azure_etl_databricks_sql_powerbi_spark.dedup.cluster import shingle_edges

    # one 5-gram in 4 docs (over max_df=3 -> dropped + reported), another
    # in 2 docs (in band -> the surviving edge)
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(4)]
        + [(10, "one two three four five"), (11, "one two three four five")],
        ["doc_id", "text"],
    )
    obs = Observation("shingle_caps")
    edges = shingle_edges(docs, n=5, min_df=2, max_df=3, observation=obs)
    assert {(r.u, r.v) for r in edges.collect()} == {(10, 11)}
    assert obs.get["dropped_shingles"] == 1


def test_lsh_near_pairs_max_bucket_cap_is_observed(spark):
    """lsh_near_pairs' bucket cap reports dropped buckets via Observation
    while under-cap buckets still verify and emit their pairs."""
    from pyspark.sql import Observation

    from azure_etl_databricks_sql_powerbi_spark.similarity.lsh import lsh_near_pairs

    import random

    rng = random.Random(5)
    big = [rng.gauss(0, 1) for _ in range(8)]
    small = [rng.gauss(0, 1) for _ in range(8)]
    rows = [(i, [x + rng.gauss(0, 0.005) for x in big]) for i in range(5)]
    rows += [(10 + i, [x + rng.gauss(0, 0.005) for x in small]) for i in range(2)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    obs = Observation("lsh_caps")
    out = lsh_near_pairs(
        vecs,
        threshold=0.9,
        dim=8,
        n_bits=6,
        n_tables=4,
        max_bucket=4,
        observation=obs,
    )
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert pairs == {(10, 11)}  # 5-member buckets over cap; 2-member survives
    assert obs.get["dropped_buckets"] > 0
    assert obs.get["dropped_bucket_rows"] == 5 * obs.get["dropped_buckets"]


# --------------------------------------------------------------- BPE


def test_bpe_merges_save_load_roundtrip(spark, tmp_path):
    """Tokenizer-state persistence: save/load preserves the merge table
    EXACTLY (order = ranks = the model), and applying the loaded table
    tokenizes identically to the in-memory one — day-N jobs pin the
    tokenizer version instead of re-sampling."""
    from azure_etl_databricks_sql_powerbi_spark.functions.bpe import (
        apply_bpe,
        load_merges,
        save_merges,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [(i, "low lower lowest newest widest new") for i in range(30)],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, n_merges=20, sample_size=30)
    save_merges(merges, str(tmp_path / "tok"))
    loaded = load_merges(str(tmp_path / "tok"))
    assert loaded == merges  # order-exact: ranks are list positions
    a = {r.doc_id: r.bpe_tokens for r in apply_bpe(docs, merges).collect()}
    b = {r.doc_id: r.bpe_tokens for r in apply_bpe(docs, loaded).collect()}
    assert a == b


def test_bpe_learns_paper_merges_and_roundtrips(spark):
    """Pin the Sennrich et al. (2016) corpus: deterministic merge order
    (freq desc, lexicographic tie-break) and greedy encode. Tokens must
    roundtrip: concat(tokens) minus the end-marker == the word."""
    from azure_etl_databricks_sql_powerbi_spark.functions.bpe import (
        END,
        encode_word,
        learn_merges,
    )

    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_merges(freqs, 10)
    assert merges[:4] == [("e", "s"), ("es", "t" + END), ("l", "o"), ("e", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["newest" + END]
    assert encode_word("low", ranks) == ["low" + END]
    # unseen word decomposes to learned subwords + chars, never drops text
    assert encode_word("lowest", ranks) == ["lo", "w", "est" + END]
    assert encode_word("", ranks) == []
    for w in ("low", "lowest", "wider", "a", "newestnewest"):
        toks = encode_word(w, ranks)
        assert "".join(t.replace(END, "") for t in toks) == w


def test_bpe_apply_distributed_roundtrip_and_plan(spark):
    """apply_bpe tokenizes corpus-side through one Arrow pandas_udf:
    every doc's token concat reconstructs its whitespace-stripped text,
    and the plan has ZERO exchanges (scan-stage map, linear at any
    width). Training twice on the same frame yields identical merges
    (single-action sample materialization)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.bpe import (
        END,
        apply_bpe,
        train_bpe,
    )

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the newest widest cat"),
        (2, ""),
        (3, "lower low lowest"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, n_merges=50, sample_size=10)
    assert merges == train_bpe(df, n_merges=50, sample_size=10)
    out = apply_bpe(df, merges)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for r in out.collect():
        joined = "".join(t.replace(END, "") for t in r.bpe_tokens)
        assert joined == "".join(r.text.split())


def test_blocked_fuzzy_pairs_planted_typos(spark):
    """Blocking + length-band + levenshtein verify: planted one-edit
    typos inside a block are found, cross-block twins are not (blocking
    contract), and the band never drops a true match."""
    from azure_etl_databricks_sql_powerbi_spark.operators.fuzzy import (
        blocked_fuzzy_pairs,
    )

    rows = [
        (1, 1, "jonathan smith"),
        (2, 1, "jonathan smyth"),   # 1 edit, same block -> pair
        (3, 1, "completely other"),
        (4, 2, "jonathan smith"),   # identical text, DIFFERENT block -> no pair
        (5, 1, "jonathan smithers"),  # 4 edits from #1 -> pruned
        (6, 1, "jonathan  smith"),  # 1 insert (double space) -> pair w/ 1
    ]
    df = spark.createDataFrame(rows, "id long, block int, name string")
    got = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in blocked_fuzzy_pairs(df, ["block"], "name", "id", 2).collect()
    }
    assert got == {(1, 2): 1, (1, 6): 1, (2, 6): 2}


def test_hashed_features_sparse_dense_agree(spark):
    """Feature hashing: dense assembly == sparse triples, total mass ==
    token count (nothing lost to hashing), buckets within [0, dim),
    identical tokens land in identical buckets across documents."""
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.functions.features import (
        dense_features,
        hashed_text_features,
    )

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a d"), (3, "")], "doc_id long, text string"
    )
    sparse = hashed_text_features(df, dim=8)
    rows = sparse.collect()
    assert all(0 <= r["bucket"] < 8 for r in rows)
    assert sum(r["tf"] for r in rows) == 6  # total token mass preserved
    # same token -> same bucket everywhere: doc1's 'a' bucket == doc2's
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["bucket"]] = r["tf"]
    a_bucket = [b for b, tf in by_doc[1].items() if tf == 2]  # 'a' twice in doc1
    assert len(a_bucket) == 1 and a_bucket[0] in by_doc[2]

    dense = {r["doc_id"]: r["features"] for r in dense_features(sparse, dim=8).collect()}
    for doc, buckets in by_doc.items():
        vec = dense[doc]
        assert len(vec) == 8
        for b in range(8):
            assert vec[b] == buckets.get(b, 0)


def test_sorted_neighborhood_pairs_linear_candidates(spark):
    """SNM: planted mid/late-string typos are found without any blocking
    key, every reported distance is correct, pairs are unique and
    canonical (id_a < id_b), and the global rank machinery survives
    multi-partition range repartitioning."""
    from azure_etl_databricks_sql_powerbi_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    rows = [(i, f"record number {i:04d} common tail") for i in range(40)]
    rows += [
        (100, "record number 0007 common tail"),   # exact dup of id 7
        (101, "record number 0013 commn tail"),    # 1 deletion vs id 13
        (102, "zzz totally elsewhere"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    out = sorted_neighborhood_pairs(df, "name", "id", window=5, partitions=4)
    got = {(r["id_a"], r["id_b"]): r["edit_distance"] for r in out.collect()}
    assert got[(7, 100)] == 0
    assert got[(13, 101)] == 1
    assert all(a < b for a, b in got)
    assert len(got) == len(set(got))
    # consecutive serials differ by >=1 edit; window keeps candidates
    # N*w-bounded, and nothing pairs with the far-away outlier
    assert not any(102 in p for p in got)


def test_multi_pass_snm_catches_leading_typos(spark):
    """Single-pass SNM misses twins differing in the LEADING character
    (they sort apart); the reversed-key pass finds them. Multi-pass =
    union of both, deduplicated."""
    from azure_etl_databricks_sql_powerbi_spark.operators.fuzzy import (
        multi_pass_snm_pairs,
        sorted_neighborhood_pairs,
    )

    rows = [(i, f"{c}armichael road 42") for i, c in enumerate("abdefghijklmnop")]
    rows += [(100, "carmichael road 42")]  # 1 sub at position 0 vs id 2 ('d'...)
    # under forward sort, 'c...' sits >window away from nothing? ensure
    # distance: interleave distractors so forward-adjacent strings differ
    rows += [(200 + i, f"{c}zzzz unrelated {i:03d}") for i, c in enumerate("abcdefghij")]
    df = spark.createDataFrame(rows, "id long, name string")

    multi = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in multi_pass_snm_pairs(df, "name", "id", window=2).collect()
    }
    # every "Xarmichael road 42" pair differs only at position 0 ->
    # distance 1; the reversed pass makes them ALL mutual neighbors
    twins = [(a, b) for (a, b), d in multi.items() if d == 1]
    assert len(twins) >= 10, multi
    single = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(df, "name", "id", window=2).collect()
    }
    assert set(multi) > single  # strictly more recall than one pass


def test_weighted_sample_proportional_and_deterministic(spark):
    """A-ES weighted sampling: same seed -> identical sample (pure
    function of the data), heavier rows overrepresented vs uniform,
    zero-weight rows never drawn, no duplicates."""
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (
        weighted_sample,
    )

    # 500 light rows (w=1) + 100 heavy rows (w=50) + 10 zero-weight
    df = spark.range(610).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") >= 600, 0)
        .when(F.col("id") >= 500, 50)
        .otherwise(1)
        .alias("w"),
    )
    s1 = sorted(r["doc_id"] for r in weighted_sample(df, "w", 100, salt="t").collect())
    s2 = sorted(r["doc_id"] for r in weighted_sample(df, "w", 100, salt="t").collect())
    assert s1 == s2 and len(s1) == len(set(s1)) == 100
    assert all(i < 600 for i in s1)  # zero-weight excluded
    heavy = sum(1 for i in s1 if i >= 500)
    # heavy rows are 1/6 of the population but 50x the mass: expect a
    # strong majority of the sample (exact count is deterministic)
    assert heavy > 60, heavy
    # a different salt re-draws
    s3 = sorted(r["doc_id"] for r in weighted_sample(df, "w", 100, salt="u").collect())
    assert s3 != s1
