"""PageRank: exact agreement with a pure-python reference under the
same integer micro-unit arithmetic, mass conservation bounds, ranking
sanity (hub > leaf), and the SQL-unroll generator's DuckDB parity."""

from __future__ import annotations

import math

import duckdb

from azure_etl_databricks_sql_powerbi_spark.graph.pagerank import (
    MICRO,
    pagerank,
    pagerank_sql_unrolled,
)

# star: hub 0 <-> leaves 1..4, plus a 5-6 pair
EDGES = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)] + [(5, 6), (6, 5)]


def _py_pagerank(edges, d=0.85, iters=3):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s, _ in set(edges):
        out[s] = out.get(s, 0) + 1
    r = {v: MICRO // n for v in nodes}
    base = math.floor((1.0 - d) * MICRO / n)
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for s, t in set(edges):
            nxt[t] += math.floor((r[s] * d) / out[s])
        r = nxt
    return r


def test_pagerank_matches_reference_exactly(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank_m"] for r in pagerank(df, iterations=3).collect()}
    assert got == _py_pagerank(EDGES)


def test_pagerank_hub_ranks_highest_and_mass_bounded(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    rows = pagerank(df, iterations=5).collect()
    ranks = {r["node"]: r["rank_m"] for r in rows}
    assert ranks[0] == max(ranks.values())  # the star hub dominates
    # floored arithmetic only ever loses mass: total <= 1.0, and not by much
    total = sum(ranks.values())
    assert 0.9 * MICRO < total <= MICRO


def test_sql_unroll_matches_spark(spark):
    """The generated DuckDB CTE chain reproduces Spark's integer state
    bit-for-bit — the mechanism behind the driver oracle."""
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = sorted(
        (r["node"], r["rank_m"]) for r in pagerank(df, iterations=3).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE el (src BIGINT, dst BIGINT); INSERT INTO el VALUES "
        + ",".join(f"({s},{t})" for s, t in EDGES)
    )
    sql = pagerank_sql_unrolled("SELECT DISTINCT src, dst FROM el", iterations=3)
    oracle = sorted(
        (int(a), int(b))
        for a, b in con.execute(sql + "\nSELECT node, rank_m FROM final").fetchall()
    )
    assert got == oracle


# directed graph WITH dangling nodes: 3 and 4 have no out-edges
DANGLING_EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (1, 4), (5, 0), (0, 5)]


def _py_pagerank_dangling(edges, d=0.85, iters=3):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s, _ in set(edges):
        out[s] = out.get(s, 0) + 1
    r = {v: MICRO // n for v in nodes}
    base = math.floor((1.0 - d) * MICRO / n)
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if v not in out)
        share = math.floor((dang * d) / n)
        nxt = {v: base + share for v in nodes}
        for s, t in set(edges):
            nxt[t] += math.floor((r[s] * d) / out[s])
        r = nxt
    return r


def test_pagerank_dangling_redistribution_exact(spark):
    """dangling=True: Spark, the pure-python reference, and the DuckDB
    unroll agree bit-for-bit on a graph WITH out-degree-0 nodes — and
    conserve strictly more mass than the drop-dangling default."""
    df = spark.createDataFrame(DANGLING_EDGES, "src long, dst long")
    got = {
        r["node"]: r["rank_m"]
        for r in pagerank(df, iterations=3, dangling=True).collect()
    }
    assert got == _py_pagerank_dangling(DANGLING_EDGES)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE el (src BIGINT, dst BIGINT); INSERT INTO el VALUES "
        + ",".join(f"({s},{t})" for s, t in DANGLING_EDGES)
    )
    sql = pagerank_sql_unrolled(
        "SELECT DISTINCT src, dst FROM el", iterations=3, dangling=True
    )
    oracle = dict(con.execute(sql + "\nSELECT node, rank_m FROM final").fetchall())
    assert got == {int(k): int(v) for k, v in oracle.items()}

    dropped = {
        r["node"]: r["rank_m"]
        for r in pagerank(df, iterations=3, dangling=False).collect()
    }
    assert sum(got.values()) > sum(dropped.values())
    assert 0.9 * MICRO < sum(got.values()) <= MICRO


def test_pagerank_bucketed_no_edge_exchange(spark):
    """VERDICT r6 directive 5: with the edge relation bucketed by src,
    the superstep join plans with NO Exchange on the edge side — only
    the node-sized rank frame shuffles into the bucket partitioning —
    and the bucketed run's ranks equal the plain run's bit-for-bit."""
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.graph.pagerank import (
        pagerank_bucketed,
        prepare_edges,
        superstep_contribs,
    )
    from azure_etl_databricks_sql_powerbi_spark.sources.bucketing import (
        write_bucketed,
    )

    df = spark.createDataFrame(EDGES, "src long, dst long")
    table = "pr_edges_bucket_test"
    try:
        # n_buckets must match spark.sql.shuffle.partitions (32 in tests):
        # a mismatched bucket count makes the planner abandon the layout
        got = {
            r["node"]: r["rank_m"]
            for r in pagerank_bucketed(
                spark, df, table=table, n_buckets=32, iterations=3
            ).collect()
        }
        assert got == _py_pagerank(EDGES)

        # plan shape of one superstep over the bucketed table, broadcast
        # disabled so the join shape is the sort-merge a 100 TB edge
        # relation would get
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            e = spark.table(table)
            nodes = (
                e.select(F.col("src").alias("node"))
                .union(e.select(F.col("dst").alias("node")))
                .distinct()
            )
            ranks = nodes.select("node", F.lit(100).cast("long").alias("rank_m"))
            plan = (
                superstep_contribs(ranks, prepare_edges(e), 0.85)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            # the scan uses the bucket layout...
            assert "SelectedBucketsCount" in plan, plan
            # ...and nothing re-shuffles on src: the edge scan AND the
            # outdeg aggregate both ride the bucket partitioning
            assert "Exchange hashpartitioning(src" not in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_triangle_counts_known_graph_and_oracle(spark):
    """Triangle counting (graph/triangles.py): K4 + pendant path ground
    truth; exactly-once materialization (no /3 correction); and the
    DuckDB twin (triangle_sql) reproduces Spark bit-for-bit on the
    part co-order graph at sf0.001 — the pagerank oracle discipline."""
    from azure_etl_databricks_sql_powerbi_spark.graph.triangles import (
        triangle_counts,
        triangle_sql,
    )

    # K4 on {0,1,2,3} (4 triangles, each node in 3) + path 3-4-5 (none)
    k4 = [(i, j) for i in range(4) for j in range(4) if i < j]
    edges = k4 + [(3, 4), (4, 5), (4, 3)]  # dup edge direction on purpose
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # 4,5 absent: zero triangles

    # cross-engine exactness on a real derived graph
    import duckdb
    from pyspark.sql import functions as F

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    )
    cte = (
        "SELECT l1.l_partkey AS src, l2.l_partkey AS dst "
        "FROM lineitem l1 JOIN lineitem l2 "
        "ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey"
    )
    oracle = dict(con.execute(triangle_sql(cte)).fetchall())

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    l1 = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    l2 = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    sedges = l1.join(l2, "l_orderkey").filter(F.col("src") < F.col("dst"))
    sgot = {r.node: r.n_triangles for r in triangle_counts(sedges).collect()}
    assert sgot == {int(k): int(v) for k, v in oracle.items()}
    assert len(sgot) > 0  # the co-order graph actually has triangles


def test_clustering_coefficients_exact(spark):
    """Local clustering coefficient: K4 nodes are fully clustered (1.0),
    a pendant node reports the 0.0 convention, and the DuckDB twin
    reproduces Spark bit-for-bit (one raw IEEE division per row)."""
    import duckdb

    from azure_etl_databricks_sql_powerbi_spark.graph.triangles import (
        clustering_coefficients,
        clustering_sql,
    )

    k4 = [(i, j) for i in range(4) for j in range(4) if i < j]
    edges = k4 + [(3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.deg, r.n_triangles, r.clustering)
        for r in clustering_coefficients(df).collect()
    }
    assert got[0] == (3, 3, 1.0) and got[1] == (3, 3, 1.0) and got[2] == (3, 3, 1.0)
    assert got[3][0] == 4 and got[3][1] == 3 and abs(got[3][2] - 0.5) < 1e-12
    assert got[4] == (1, 0, 0.0)  # degree-1: 0.0 by convention

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE el (src BIGINT, dst BIGINT); INSERT INTO el VALUES "
        + ",".join(f"({s},{t})" for s, t in edges)
    )
    oracle = {
        int(n): (int(d), int(t), float(c))
        for n, d, t, c in con.execute(
            clustering_sql("SELECT src, dst FROM el")
        ).fetchall()
    }
    assert got == oracle


def test_label_propagation_communities_and_oracle(spark):
    """Deterministic synchronous LPA (graph/lpa.py): a barbell of two
    5-cliques joined by one bridge edge resolves into exactly two
    communities split at the bridge; the fixed-K DuckDB unroll
    reproduces Spark's labels bit-for-bit; and a python reference of
    the same synchronous recurrence agrees."""
    import duckdb

    from azure_etl_databricks_sql_powerbi_spark.graph.lpa import (
        label_propagation,
        lpa_sql_unrolled,
    )

    # two 5-cliques {0..4}, {10..14} + bridge (4, 10)
    c1 = [(i, j) for i in range(5) for j in range(5) if i < j]
    c2 = [(10 + i, 10 + j) for i in range(5) for j in range(5) if i < j]
    edges = c1 + c2 + [(4, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.label for r in label_propagation(df, iterations=4).collect()}
    comm1 = {got[v] for v in range(5)}
    comm2 = {got[v] for v in range(10, 15)}
    assert len(comm1) == 1 and len(comm2) == 1 and comm1 != comm2

    # python reference: same synchronous majority/min-tiebreak recurrence
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    lab = {v: v for v in nbrs}
    for _ in range(4):
        nxt = {}
        for v, ns in nbrs.items():
            freq: dict[int, int] = {}
            for u in ns:
                freq[lab[u]] = freq.get(lab[u], 0) + 1
            best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        lab = nxt
    assert got == lab

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE el (src BIGINT, dst BIGINT); INSERT INTO el VALUES "
        + ",".join(f"({s},{t})" for s, t in edges)
    )
    sql = lpa_sql_unrolled("SELECT src, dst FROM el", iterations=4)
    oracle = dict(con.execute(sql + "\nSELECT node, label FROM final").fetchall())
    assert got == {int(k): int(v) for k, v in oracle.items()}


def _py_ppr(edges, seeds, d=0.85, iters=3, dangling=False):
    nodes = sorted({x for e in edges for x in e})
    out: dict[int, int] = {}
    for s, _ in set(edges):
        out[s] = out.get(s, 0) + 1
    nb = len(seeds)
    base = math.floor((1.0 - d) * MICRO / nb)
    init = MICRO // nb
    r = {v: (init if v in seeds else 0) for v in nodes}
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if v not in out) if dangling else 0
        share = math.floor((dang * d) / nb) if dangling else 0
        nxt = {
            v: (base + share if v in seeds else 0) for v in nodes
        }
        for s, t in set(edges):
            nxt[t] += math.floor((r[s] * d) / out[s])
        r = nxt
    return r


def test_lpa_superstep_no_exchange(spark):
    """The r16 LPA layout contract (guide §2.4): with the adjacency
    persisted hash-partitioned by ``node`` — the AGGREGATION key — and
    the label frame broadcast, one superstep plans with ZERO exchanges
    above the cached adjacency scan: the broadcast join preserves the
    streamed side's partitioning, HashPartitioning(node) satisfies the
    (node, label) count's clustering (subset rule), and the per-node
    min_by argmin rides the same partitioning. A regression (adjacency
    partitioned on the join key, or the argmin going back through a
    sort+window needing its own exchange) re-shuffles edge-width data
    every superstep."""
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.graph.lpa import lpa_superstep

    e = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(200) if i != (i * 7) % 23],
        "a long, b long",
    )
    adj = (
        e.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(e.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .repartition("node")
        .dropDuplicates(["node", "nbr"])
        .persist()
    )
    try:
        labels = adj.select("node").distinct().select(
            "node", F.col("node").alias("label")
        ).localCheckpoint(eager=True)
        step = lpa_superstep(adj, labels, broadcast_labels=True)
        plan = step._jdf.queryExecution().executedPlan().toString()
        # the section ABOVE the cached adjacency scan is the per-superstep
        # work; the InMemoryRelation tail records the one-time build
        # lineage (which legitimately contains the single build exchange)
        live = plan.split("InMemoryRelation")[0]
        assert "BroadcastHashJoin" in live
        assert "Exchange hashpartitioning" not in live
        assert "Window" not in live  # argmin is an aggregate, not a window
    finally:
        adj.unpersist()


def test_triangle_adjacency_exchange_reused(spark):
    """The r16 intersection shape: both adjacency references (the
    exploded probe side and the hi-keyed build side) must share one
    canonicalized shuffle subtree — ReusedExchange — so the edge build
    and orientation run once with no checkpoint, and the only other
    hash exchanges are the wedge-probe re-key and the final credit
    aggregate. A regression to per-leg recompute doubles the
    edge-construction work at any scale."""
    from azure_etl_databricks_sql_powerbi_spark.graph.triangles import (
        triangle_counts,
    )

    edges = spark.createDataFrame(
        [(i % 40, (i * 11) % 37) for i in range(400)], "src long, dst long"
    )
    df = triangle_counts(edges)
    df.collect()  # AQE materializes stage reuse in the FINAL plan only
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_lpa_bucketed_no_adjacency_exchange(spark):
    """VERDICT r15 item 1, LPA leg: with the adjacency written bucketed
    by ``nbr`` (the superstep JOIN key — the beyond-broadcast regime's
    layout), a shuffle-join superstep plans with NO Exchange keyed on
    the adjacency: only the node-sized label frame (its own __lnode
    key) shuffles into the bucket partitioning, plus the node-sized
    aggregates. And the bucketed run's labels equal the plain run's
    bit-for-bit."""
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.graph.lpa import (
        label_propagation,
        label_propagation_bucketed,
        lpa_superstep,
    )

    edges = [(i, (i * 7) % 53) for i in range(300) if i != (i * 7) % 53]
    df = spark.createDataFrame(edges, "src long, dst long")
    table = "lpa_adj_bucket_test"
    try:
        plain = {
            (r.node, r.label)
            for r in label_propagation(df, iterations=3).collect()
        }
        bucketed = {
            (r.node, r.label)
            for r in label_propagation_bucketed(
                spark, df, table=table, n_buckets=32, iterations=3
            ).collect()
        }
        assert bucketed == plain

        # one shuffle-join superstep over the bucketed table, broadcast
        # disabled so the join shape is what multi-GB label state gets
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            adjb = spark.table(table)
            labels = adjb.select("node").distinct().select(
                "node", F.col("node").alias("label")
            ).localCheckpoint(eager=True)
            step = lpa_superstep(adjb, labels, broadcast_labels=False)
            step.collect()
            plan = step._jdf.queryExecution().executedPlan().toString()
            assert "SelectedBucketsCount" in plan, plan
            assert "Exchange hashpartitioning(nbr" not in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_triangles_bucketed_no_lo_exchange(spark):
    """VERDICT r15 item 1, triangles leg: with the oriented list written
    bucketed by ``lo``, the adjacency aggregate and the exploded probe
    side ride the bucket partitioning — NO Exchange keyed on ``lo``
    anywhere in the intersection; the wedge-mass re-key to ``hi`` is
    the only edge-shaped shuffle left (the Σ outdeg² floor). Counts
    equal the plain run's bit-for-bit."""
    from azure_etl_databricks_sql_powerbi_spark.graph.triangles import (
        triangle_counts,
        triangle_counts_bucketed,
    )

    edges = [(i, (i * 11) % 37) for i in range(400) if i != (i * 11) % 37]
    df = spark.createDataFrame(edges, "src long, dst long")
    table = "tri_o_bucket_test"
    try:
        plain = {
            (r.node, r.n_triangles) for r in triangle_counts(df).collect()
        }
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = triangle_counts_bucketed(spark, df, table=table, n_buckets=32)
            bucketed = {(r.node, r.n_triangles) for r in out.collect()}
            assert bucketed == plain
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "SelectedBucketsCount" in plan, plan
            assert "Exchange hashpartitioning(lo" not in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_personalized_pagerank_exact_and_seed_locality(spark):
    """Personalized PageRank: teleport mass lands only on the seed set,
    so rank concentrates near the seeds (node 5's component dominates
    when seeded there, unlike the global variant where hub 0 wins);
    Spark ≡ python reference ≡ DuckDB unroll bit-for-bit, including the
    dangling+seeds interaction."""
    from azure_etl_databricks_sql_powerbi_spark.graph.pagerank import (
        pagerank_sql_unrolled,
        personalized_pagerank,
    )

    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["node"]: r["rank_m"]
        for r in personalized_pagerank(df, seeds=[5], iterations=3).collect()
    }
    assert got == _py_ppr(EDGES, {5})
    # locality: the seeded component outranks the star hub
    assert got[5] > got[0] and got[6] > got[0]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE el (src BIGINT, dst BIGINT); INSERT INTO el VALUES "
        + ",".join(f"({s},{t})" for s, t in EDGES)
    )
    sql = pagerank_sql_unrolled(
        "SELECT DISTINCT src, dst FROM el", iterations=3, seeds=[5]
    )
    oracle = dict(con.execute(sql + "\nSELECT node, rank_m FROM final").fetchall())
    assert got == {int(k): int(v) for k, v in oracle.items()}

    # dangling + seeds: redistribution gated to the seed set, still exact
    ddf = spark.createDataFrame(DANGLING_EDGES, "src long, dst long")
    got_d = {
        r["node"]: r["rank_m"]
        for r in personalized_pagerank(
            ddf, seeds=[0, 1], iterations=3, dangling=True
        ).collect()
    }
    assert got_d == _py_ppr(DANGLING_EDGES, {0, 1}, dangling=True)
    con2 = duckdb.connect()
    con2.execute(
        "CREATE TABLE el (src BIGINT, dst BIGINT); INSERT INTO el VALUES "
        + ",".join(f"({s},{t})" for s, t in DANGLING_EDGES)
    )
    sql_d = pagerank_sql_unrolled(
        "SELECT DISTINCT src, dst FROM el", iterations=3, dangling=True,
        seeds=[0, 1],
    )
    oracle_d = dict(
        con2.execute(sql_d + "\nSELECT node, rank_m FROM final").fetchall()
    )
    assert got_d == {int(k): int(v) for k, v in oracle_d.items()}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="seed"):
        personalized_pagerank(df, seeds=[])


def test_weighted_pagerank_exact(spark):
    """weight_col: mass splits proportionally to integer edge weights
    (duplicate (src,dst) rows sum), Spark ≡ python reference ≡ DuckDB
    unroll bit-for-bit, and a heavier edge earns its target more rank
    than the uniform run gives it."""
    # hub 0 -> {1 (w=9), 2 (w=1)}; back edges keep mass circulating;
    # the duplicate (0,1) rows must sum to w=9
    wedges = [(0, 1, 4), (0, 1, 5), (0, 2, 1), (1, 0, 1), (2, 0, 1)]
    df = spark.createDataFrame(wedges, "src long, dst long, w long")
    got = {
        r["node"]: r["rank_m"]
        for r in pagerank(df, iterations=3, weight_col="w").collect()
    }

    # python reference with summed weights
    agg: dict[tuple[int, int], int] = {}
    for s, t, w in wedges:
        agg[(s, t)] = agg.get((s, t), 0) + w
    nodes = sorted({x for s, t in agg for x in (s, t)})
    n = len(nodes)
    out_w: dict[int, int] = {}
    for (s, _t), w in agg.items():
        out_w[s] = out_w.get(s, 0) + w
    r = {v: MICRO // n for v in nodes}
    base = math.floor((1.0 - 0.85) * MICRO / n)
    for _ in range(3):
        nxt = {v: base for v in nodes}
        for (s, t), w in agg.items():
            nxt[t] += math.floor(((r[s] * 0.85) * w) / out_w[s])
        r = nxt
    assert got == r
    assert got[1] > got[2]  # the w=9 edge dominates the w=1 edge

    # uniform run on the same topology gives 1 and 2 equal rank
    uni = {
        rr["node"]: rr["rank_m"]
        for rr in pagerank(
            spark.createDataFrame(
                [(s, t) for s, t, _ in wedges], "src long, dst long"
            ),
            iterations=3,
        ).collect()
    }
    assert uni[1] == uni[2]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE el (src BIGINT, dst BIGINT, w BIGINT); INSERT INTO el VALUES "
        + ",".join(f"({s},{t},{w})" for s, t, w in wedges)
    )
    from azure_etl_databricks_sql_powerbi_spark.graph.pagerank import (
        pagerank_sql_unrolled as unroll,
    )

    sql = unroll(
        "SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM el GROUP BY src, dst",
        iterations=3,
        weighted=True,
    )
    oracle = dict(con.execute(sql + "\nSELECT node, rank_m FROM final").fetchall())
    assert got == {int(k): int(v) for k, v in oracle.items()}


def test_weighted_dangling_combination_matches_unroll(spark):
    """The variant axes compose: weighted + dangling redistribution
    still matches the generated unroll exactly."""
    wedges = [(0, 1, 3), (0, 2, 1), (1, 2, 2)]  # node 2 dangles
    df = spark.createDataFrame(wedges, "src long, dst long, w long")
    got = {
        r["node"]: r["rank_m"]
        for r in pagerank(df, iterations=3, weight_col="w", dangling=True).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE el (src BIGINT, dst BIGINT, w BIGINT); INSERT INTO el VALUES "
        + ",".join(f"({s},{t},{w})" for s, t, w in wedges)
    )
    sql = pagerank_sql_unrolled(
        "SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM el GROUP BY src, dst",
        iterations=3,
        weighted=True,
        dangling=True,
    )
    oracle = dict(con.execute(sql + "\nSELECT node, rank_m FROM final").fetchall())
    assert got == {int(k): int(v) for k, v in oracle.items()}
    # dangling node 2 received mass yet re-emits none except via teleport
    assert got[2] > 0


def test_pagerank_empty_edges_raises(spark):
    """ADVICE r7: an empty edge list raises a clear ValueError instead
    of an opaque ZeroDivisionError (the kmeans_fit guard, mirrored)."""
    import pytest

    from azure_etl_databricks_sql_powerbi_spark.graph.pagerank import pagerank

    empty = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty"):
        pagerank(empty).collect()


def test_pagerank_bucketed_refuses_silent_clobber(spark):
    """ADVICE r7: the persisted bucketed-edge table name is explicit and
    an existing table is never overwritten unless overwrite=True — two
    callers ranking different graphs can't clobber each other."""
    import pytest

    from azure_etl_databricks_sql_powerbi_spark.graph.pagerank import (
        pagerank_bucketed,
    )

    df = spark.createDataFrame(EDGES, "src long, dst long")
    table = "pr_edges_clobber_guard_test"
    try:
        first = {
            r["node"]: r["rank_m"]
            for r in pagerank_bucketed(
                spark, df, table=table, n_buckets=32, iterations=2
            ).collect()
        }
        assert first  # wrote + ranked
        with pytest.raises(ValueError, match="already exists"):
            pagerank_bucketed(spark, df, table=table, n_buckets=32, iterations=2)
        # explicit opt-in rewrites and still ranks identically
        again = {
            r["node"]: r["rank_m"]
            for r in pagerank_bucketed(
                spark, df, table=table, n_buckets=32, iterations=2, overwrite=True
            ).collect()
        }
        assert again == first
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
