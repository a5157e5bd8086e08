"""Connected-components clustering: algorithm vs brute-force union-find,
structural edge cases, and the keep-one-per-cluster dedup verdict."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.dedup.cluster import (
    assign_clusters,
    connected_components,
    shingle_edges,
)
from tests.conftest import SF_SMOKE


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference: brute-force union-find, component = min node id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    roots: dict[int, int] = {}
    for n in parent:
        r = find(n)
        roots[r] = min(roots.get(r, n), n)
    return {n: roots[find(n)] for n in parent}


def _cc_spark(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "u long, v long")
    return {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }


def test_cc_matches_union_find_on_pseudorandom_graph(spark):
    # deterministic pseudo-random graph: 120 nodes, ~90 edges from a
    # multiplicative hash — mixes chains, merges, and isolated pairs
    edges = [((i * 7919) % 120, (i * 104729 + 13) % 120) for i in range(90)]
    edges = [(u, v) for u, v in edges if u != v]
    assert _cc_spark(spark, edges) == _uf_components(edges)


def test_cc_long_chain_converges_logarithmically(spark):
    # a 64-node path is the worst diameter case: label must travel end to
    # end; large/small-star does it in O(log n) rounds, under max_iter=25
    edges = [(i, i + 1) for i in range(63)]
    got = _cc_spark(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 64


def test_cc_two_components_and_duplicate_self_edges(spark):
    edges = [(5, 3), (3, 9), (20, 21), (21, 20), (7, 7)]
    got = _cc_spark(spark, edges)
    # self-loop (7,7) contributes no node; duplicate orientation collapses
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "u long, v long")
    assert connected_components(df).count() == 0


def test_assign_clusters_keep_one_per_cluster(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    edges = spark.createDataFrame([(1, 4), (4, 8), (2, 3)], "u long, v long")
    out = assign_clusters(docs, edges).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[8]["cluster_id"] == 1 and not by_id[8]["keep"]
    assert by_id[4]["cluster_id"] == 1 and not by_id[4]["keep"]
    assert by_id[1]["keep"] and by_id[2]["keep"] and not by_id[3]["keep"]
    # isolated docs are their own cluster and kept
    assert by_id[0]["keep"] and by_id[0]["cluster_id"] == 0
    # exactly one keeper per cluster
    keepers = [r for r in out if r["keep"]]
    assert len(keepers) == len({r["cluster_id"] for r in out})


def test_shingle_edges_planted_dups(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),
        (1, base + " extra"),          # near-dup of 0 (shares 5-grams)
        (2, "totally different words with no overlap at all here"),
        # hot-shingle doc family: shares boilerplate with everything
        (3, base),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    edges = {(r["u"], r["v"]) for r in shingle_edges(df, n=5).collect()}
    assert (0, 1) in edges and (0, 3) in edges and (1, 3) in edges
    assert not any(2 in e for e in edges)


def test_shingle_edges_max_df_drops_boilerplate(spark):
    common = "one two three four five six"
    rows = [(i, f"{common} tail{i}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # every doc shares the boilerplate 5-grams; df=8 > max_df=5 drops them
    assert shingle_edges(df, n=5, max_df=5).count() == 0
    # raising the cap to 8 admits the bucket: all 28 pairs appear
    assert shingle_edges(df, n=5, max_df=8).count() == 28


def test_near_dup_clusters_on_testdata(spark):
    """End-to-end on the real documents table at sf0.001: planted dups
    cluster, every cluster keeps exactly its min doc, row count preserved."""
    from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    edges = shingle_edges(docs, n=5, min_df=2, max_df=10)
    out = assign_clusters(docs.select("doc_id"), edges)
    rows = out.collect()
    assert len(rows) == docs.count()
    clusters: dict[int, list[int]] = {}
    for r in rows:
        clusters.setdefault(r["cluster_id"], []).append(r["doc_id"])
    # cluster id is the member minimum; exactly one keeper per cluster
    for cid, members in clusters.items():
        assert cid == min(members)
    keepers = sum(1 for r in rows if r["keep"])
    assert keepers == len(clusters)
    # the synthetic corpus has planted near-dups: some multi-doc cluster
    assert any(len(m) > 1 for m in clusters.values())


def test_large_star_nodedup_composes_identically(spark):
    """The r16 fixpoint-loop shape: feeding _small_star from
    _large_star(dedup=False) must produce the same edge SET as the
    deduped composition — small-star's min aggregate is
    multiplicity-insensitive and its final distinct restores set
    semantics, which is what lets the loop drop one exchange+aggregate
    per round."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.cluster import (
        _large_star,
        _small_star,
    )

    edges = [(i, (i * 13 + 3) % 41) for i in range(80)] + [(1, 2), (2, 3)]
    e = spark.createDataFrame(
        [(u, v) for u, v in edges if u != v], "u long, v long"
    )
    deduped = {(r.u, r.v) for r in _small_star(_large_star(e, dedup=True)).collect()}
    fused = {(r.u, r.v) for r in _small_star(_large_star(e, dedup=False)).collect()}
    assert fused == deduped
