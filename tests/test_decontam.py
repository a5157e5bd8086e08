"""Benchmark decontamination (dedup/decontam) + ORC source roundtrip."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.dedup.decontam import (
    contamination_scores,
    decontaminate,
)
from azure_etl_databricks_sql_powerbi_spark.sources.files import read_orc, write_orc


def _corpora(spark):
    bench = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "pack my box with five dozen liquor jugs"),
        ],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # exact copy of a benchmark doc -> contamination 1.0
            (1, "the quick brown fox jumps over the lazy dog"),
            # half-overlapping: shares a 5-token prefix with bench doc 100
            (2, "the quick brown fox jumps straight into a deep icy river"),
            # disjoint vocabulary -> contamination 0.0
            (3, "completely unrelated words about spark catalyst planning"),
            # short doc (<= n tokens) -> single whole-text shingle
            (4, "pack my box"),
        ],
        "doc_id long, text string",
    )
    return train, bench


def test_contamination_scores_planted(spark):
    train, bench = _corpora(spark)
    rows = {
        r["doc_id"]: r
        for r in contamination_scores(train, bench, n=3, threshold=0.8).collect()
    }
    assert rows[1]["contamination"] == 1.0 and rows[1]["contaminated"] == 1
    assert 0.0 < rows[2]["contamination"] < 0.8 and rows[2]["contaminated"] == 0
    assert rows[3]["contamination"] == 0.0 and rows[3]["contaminated"] == 0
    # doc 4 is a whole-text shingle that is NOT a benchmark trigram ("pack
    # my box" != any 3-gram of bench 101? it IS its first trigram) -> matched
    assert rows[4]["total_ngrams"] == 1 and rows[4]["contamination"] == 1.0


def test_decontaminate_drops_only_contaminated(spark):
    train, bench = _corpora(spark)
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(train, bench, n=3, threshold=0.8).collect()
    )
    assert kept == [2, 3]


def test_contamination_counts_are_distinct_ngrams(spark):
    # repeated n-grams in a doc count once (DISTINCT semantics)
    bench = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "a b c a b c a b c")], "doc_id long, text string"
    )
    row = contamination_scores(train, bench, n=3).collect()[0]
    # grams of train: {a b c, b c a, c a b} distinct; only "a b c" matches
    assert row["total_ngrams"] == 3
    assert row["matched_ngrams"] == 1


def test_orc_roundtrip(spark, tmp_path):
    df = spark.range(100).withColumn("part", (F.col("id") % 3).cast("int"))
    path = str(tmp_path / "orc_out")
    write_orc(df, path, partition_cols=("part",))
    back = read_orc(spark, path)
    assert back.count() == 100
    # partition pruning works on the discovered layout
    assert back.filter(F.col("part") == 1).count() == 33
    assert set(back.columns) == {"id", "part"}


def test_semantic_contamination_flags_embedding_twins(spark):
    """A corpus vector that is a near-copy of a benchmark vector (no
    shared n-grams needed) is flagged with the right argmax id; an
    orthogonal vector is not; the filter form drops exactly the flagged
    rows. Ties on cosine break to the lowest bench id."""
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.dedup.decontam import (
        semantic_contamination,
        semantic_decontaminate,
    )

    bench = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (10, [0.99, 0.01, 0.0]),   # twin of bench 0 -> contaminated
            (11, [0.0, 0.0, 1.0]),     # orthogonal -> clean
            (12, [0.5, 0.5, 0.0]),     # equidistant: tie -> bench 0
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: r
        for r in semantic_contamination(corpus, bench, threshold=0.9).collect()
    }
    assert got[10].contaminated == 1 and got[10].matched_bench_id == 0
    assert got[11].contaminated == 0
    assert got[12].matched_bench_id == 0  # id tiebreak on exact cosine tie
    clean = semantic_decontaminate(corpus, bench, threshold=0.9)
    assert {r.vec_id for r in clean.collect()} == {11, 12}


# Module-owned DuckDB twin of semantic_contamination on the real embeddings
# table — formerly the driver oracle of `semantic_decontam_docs`, RETIRED
# r11 (ROTATION_POLICY.md §5 swap #2: the brute |corpus|x|bench| pairing
# measured 8.9x wall at 10x data; `semantic_decontam_pruned` is the declared
# decontamination contract). Per §3, retirement removes driver evidence
# obligations, never capability: the twin and its hash-exact proof live on
# here.
SEMANTIC_DECONTAM_SQL = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM read_parquet('{sf}/embeddings.parquet')),
    b AS (SELECT * FROM e WHERE vec_id < 20),
    c AS (SELECT * FROM e WHERE vec_id >= 20),
    pairs AS (
        SELECT c.vec_id AS vec_id, b.vec_id AS bench_id,
               CASE WHEN sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(b.v, b.v)) = 0
                    THEN 0.0
                    ELSE list_dot_product(c.v, b.v)
                         / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(b.v, b.v)))
               END AS cos
        FROM c, b
    ),
    best AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY cos DESC, bench_id ASC
        ) AS rn FROM pairs
    )
    SELECT vec_id,
           bench_id AS matched_bench_id,
           ROUND(cos, 4) AS max_cosine,
           CAST(ROUND(cos, 4) >= 0.4 AS INTEGER) AS contaminated
    FROM best WHERE rn = 1
    ORDER BY vec_id
"""


def test_semantic_contamination_matches_duckdb_twin(spark):
    """Hash-exact (float_tol=0) vs the module-owned twin on the real
    embeddings table — preserves the retired driver query's full
    oracle-parity proof as a unit fixture."""
    import duckdb

    from oracle_harness import compare

    from azure_etl_databricks_sql_powerbi_spark.dedup.decontam import (
        semantic_contamination,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    out = semantic_contamination(
        emb.filter("vec_id >= 20"), emb.filter("vec_id < 20"), threshold=0.4
    )
    orc = duckdb.sql(SEMANTIC_DECONTAM_SQL.format(sf=sf)).df()
    assert compare(out, orc, float_tol=0) == []


def test_semantic_contamination_benchmark_cap_raises_loudly(spark):
    """A benchmark set past ``max_benchmark`` must die with ValueError
    BEFORE the broadcast cross product runs (the
    ``_require_broadcastable_anchors`` precedent, r10 verdict directive):
    the brute pairing is |corpus| x |bench| map-side work AND a full
    broadcast of the benchmark — unbounded growth belongs on the
    IVF-pruned path. The probe is bounded (limit(cap+1)), and at or
    under the cap the operator runs unchanged."""
    import pytest
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.dedup.decontam import (
        semantic_contamination,
    )

    bench = spark.range(5).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="max_benchmark"):
        semantic_contamination(corpus, bench, max_benchmark=4)
    assert semantic_contamination(corpus, bench, max_benchmark=5).count() == 1


def test_semantic_contamination_pruned_recall_and_pruning(spark):
    """The cell-pruned variant finds every planted twin the brute
    variant flags at the near-dup operating point (recall 1.0), while
    its candidate join touches a strict fraction of the cross product."""
    import random

    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.dedup.decontam import (
        semantic_contamination,
        semantic_contamination_pruned,
    )

    rng = random.Random(3)
    # benchmark: 8 well-separated cluster centers x 10 vectors
    bench_rows, corpus_rows = [], []
    centers = [[rng.gauss(0, 1) * 4 for _ in range(8)] for _ in range(8)]
    for ci, ctr in enumerate(centers):
        for i in range(10):
            bench_rows.append(
                (ci * 10 + i, [x + rng.gauss(0, 0.05) for x in ctr])
            )
    # corpus: 40 contaminated twins (near a bench vector) + 60 clean
    for i in range(40):
        ctr = centers[i % 8]
        corpus_rows.append((1000 + i, [x + rng.gauss(0, 0.02) for x in ctr]))
    for i in range(60):
        corpus_rows.append(
            (2000 + i, [rng.gauss(0, 1) * 4 for _ in range(8)])
        )
    bench = spark.createDataFrame(bench_rows, "vec_id long, embedding array<double>")
    corpus = spark.createDataFrame(corpus_rows, "vec_id long, embedding array<double>")

    thr = 0.95
    brute_flagged = {
        r.vec_id
        for r in semantic_contamination(corpus, bench, threshold=thr).collect()
        if r.contaminated == 1
    }
    pruned = semantic_contamination_pruned(
        corpus, bench, threshold=thr, nlist=8, nprobe=2, sample_size=80
    )
    pruned_flagged = {r.vec_id for r in pruned.collect()}
    assert brute_flagged, "fixture must plant real contamination"
    # every brute-flagged twin is found by the pruned path
    assert brute_flagged <= pruned_flagged | set(), (
        brute_flagged - pruned_flagged
    )
    assert pruned_flagged == brute_flagged  # and nothing spurious

    # pruning: candidate pairs are a strict fraction of the cross product
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import (
        assign_cells,
        train_centroids,
    )

    cents = train_centroids(bench, nlist=8, sample_size=80)
    b = assign_cells(
        bench.select(F.col("vec_id").alias("bench_id"), F.col("embedding").alias("v")),
        cents, "v", nprobe=1,
    )
    c = assign_cells(corpus, cents, "embedding", nprobe=2)
    n_candidates = c.join(b, on="cell").count()
    assert n_candidates < corpus.count() * bench.count() / 2
