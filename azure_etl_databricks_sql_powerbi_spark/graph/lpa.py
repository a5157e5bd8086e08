"""Label propagation (LPA) community detection — the third graph-tier
operator: PageRank ranks nodes (`pagerank.py`), triangles measure local
density (`triangles.py`), LPA finds the communities themselves
(Raghavan et al. 2007) — e.g. grouping near-duplicate document clusters
or co-occurring entities into neighborhoods coarser than connected
components (`dedup/cluster.py` merges anything reachable; LPA splits a
connected graph along its sparse cuts).

Determinism contract (LPA is notoriously order-dependent; this variant
pins every choice so the operator is ORACLE-CHECKABLE): synchronous
updates (all nodes recompute from the PREVIOUS iteration's labels — no
update order to tiebreak), each node adopts the most frequent label
among its neighbors, ties broken to the SMALLEST label id, fixed K
iterations, initial label = own id. Every step is integer arithmetic +
counting + argmin — so a fixed-K unrolled SQL CTE chain reproduces the
labels bit-for-bit in DuckDB (the ``pagerank_sql_unrolled`` discipline;
one module owns both the operator and the oracle generator).

Scale shape per superstep: one join (labels × edges, both directions) +
one groupBy(node, label) count + one per-node argmin window — the same
two-to-three shuffles PageRank pays, with ``localCheckpoint`` lineage
cuts between iterations; label state is node-sized. Synchronous LPA may
oscillate on bipartite-ish structures (the known property) — fixed K
sidesteps non-termination, and the driver contract is exact replay, not
convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Broadcast the node-sized label frame under this ESTIMATED byte size
# (the guide §3.1 comfort zone). Bytes, not rows: node ids can be long
# strings (URLs), where a row-count cap would force a multi-GB
# broadcast collect onto the driver that Spark's own size guard (which
# the explicit hint bypasses) exists to prevent. Past the cap the
# superstep falls back to the plain shuffle join — the regime
# ``label_propagation_bucketed`` exists for.
_BROADCAST_LABEL_CAP_BYTES = 256 << 20


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous LPA over an undirected edge list (both directions are
    generated internally). Returns (node, label) after ``iterations``
    supersteps; isolated nodes keep their own id (none exist when the
    node set derives from edges). Deterministic: majority label, ties to
    the smallest label id."""
    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).filter(F.col("a") != F.col("b"))
    # Undirected adjacency, both directions, deduped — persisted
    # HASH-PARTITIONED BY ``node`` (the AGGREGATION key), not the
    # superstep join key (r16, guide §2.4). The r15 pass measured
    # nbr-partitioning and correctly rejected it: the join side never
    # moves (labels broadcast). What DID move every superstep was the
    # downstream (node, label) count aggregate and the per-node argmax —
    # two edge-width exchanges × K iterations. HashPartitioning(node)
    # satisfies the clustering of BOTH (subset rule), so with the label
    # frame broadcast the whole superstep runs exchange-free on top of
    # the cached adjacency (plan pinned in tests/test_pagerank.py). The
    # dropDuplicates rides the same single build exchange (one edge-wide
    # shuffle total — the input-side distinct the build previously paid
    # is subsumed by this dedup, identical result set).
    adj = (
        e.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(e.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .repartition("node")
        .dropDuplicates(["node", "nbr"])
        .persist()
    )
    labels = adj.select("node").distinct().select(
        "node", F.col("node").alias("label")
    )
    # Bounded driver scalars from ONE job (also forces the adjacency
    # build once): decide whether the node-sized label frame fits a
    # broadcast, by ESTIMATED BYTES (UTF-8 payload of both columns +
    # per-row hash-relation overhead — labels are always node ids, so
    # the estimate from the initial frame holds for every superstep).
    # Under the cap the hint pins the BroadcastHashJoin at PLAN time —
    # without it the checkpointed label frame has no size estimate, the
    # initial plan inserts an edge-wide Exchange(nbr) under a
    # sort-merge join, and AQE's late broadcast conversion still pays
    # the adjacency's map-side shuffle write every superstep. Past the
    # cap (multi-GB label state) the plain join is kept: one edge
    # exchange per superstep, the regime the bucketed edge layout
    # exists for.
    est = labels.select(
        F.sum(
            F.octet_length(F.col("node").cast("string"))
            + F.octet_length(F.col("label").cast("string"))
            + F.lit(32)
        ).alias("est_bytes")
    ).collect()[0]["est_bytes"]
    broadcast_ok = (est or 0) <= _BROADCAST_LABEL_CAP_BYTES
    for _ in range(iterations):
        labels = lpa_superstep(
            adj, labels, broadcast_labels=broadcast_ok
            # cut lineage each superstep (the pagerank/CC discipline)
        ).localCheckpoint(eager=False)
    out = labels.localCheckpoint(eager=True)  # release adj afterwards
    adj.unpersist()
    return out


def lpa_superstep(
    adj: DataFrame, labels: DataFrame, broadcast_labels: bool = True
) -> DataFrame:
    """One synchronous LPA superstep over the prepared adjacency:
    every node adopts the majority label among its neighbors' PREVIOUS
    labels, ties to the smallest label. Factored out so the exchange-free
    plan shape over a node-partitioned adjacency is directly testable
    (tests/test_pagerank.py::test_lpa_superstep_no_exchange)."""
    # label-side join key keeps its own name (__lnode) so a plan reader
    # — and the bucketed-layout test — can tell the label frame's
    # exchange apart from an (illegitimate) adjacency re-shuffle: the
    # label exchange prints as hashpartitioning(__lnode...), an
    # adjacency re-shuffle would print as hashpartitioning(nbr...).
    lbl = labels.select(
        F.col("node").alias("__lnode"), F.col("label").alias("nbr_label")
    )
    if broadcast_labels:
        lbl = F.broadcast(lbl)
    counts = (
        adj.join(lbl, adj["nbr"] == lbl["__lnode"])
        .groupBy("node", "nbr_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # per-node argmin as ONE aggregate (min_by over the (-n, label)
    # order) instead of Sort + row_number window: minimizing -n is
    # the majority rule, the label tie-breaks ascending in its own
    # type (struct comparison is lexicographic, so string node ids
    # keep working), no per-superstep sort, and it pipelines into
    # the same partition-local agg chain.
    return counts.groupBy("node").agg(
        F.min_by(
            F.col("nbr_label"),
            F.struct((-F.col("n")).alias("__negn"), F.col("nbr_label")),
        ).alias("label")
    )


def label_propagation_bucketed(
    spark,
    edges: DataFrame,
    table: str,
    n_buckets: int = 32,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    overwrite: bool = False,
) -> DataFrame:
    """LPA over a BUCKETED adjacency table — the beyond-broadcast 100 TB
    layout (the ``pagerank_bucketed`` pattern, VERDICT r15 item 1): when
    label state no longer fits a broadcast, each superstep joins
    adjacency⋈labels on ``nbr`` as a shuffle join, and a per-run
    adjacency would re-exchange the (corpus-sized) edge relation every
    superstep. Writing the adjacency ONCE bucketed+sorted by ``nbr``
    makes every superstep's join co-locate on the adjacency side — NO
    Exchange keyed on the adjacency ever appears; only the node-sized
    label frame shuffles into the bucket partitioning (plan-asserted in
    tests/test_pagerank.py::test_lpa_bucketed_no_adjacency_exchange).
    The table persists for reuse across runs — community detection
    re-runs on the same edge inventory, so the one-time bucketed write
    amortizes exactly like the warehouse fact layout.

    ``n_buckets`` should equal the session's shuffle-partition count
    (mismatch makes the planner abandon the bucket layout — the
    pagerank_bucketed finding). ``table`` is REQUIRED and never
    silently overwritten (ADVICE r7 discipline)."""
    from azure_etl_databricks_sql_powerbi_spark.sources.bucketing import (
        write_bucketed,
    )

    if spark.catalog.tableExists(table) and not overwrite:
        raise ValueError(
            f"label_propagation_bucketed: table {table!r} already exists; "
            "pass overwrite=True to rewrite it, or choose a per-graph name"
        )
    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).filter(F.col("a") != F.col("b"))
    adj = (
        e.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(e.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .dropDuplicates(["node", "nbr"])
    )
    write_bucketed(adj, table, ["nbr"], n_buckets=n_buckets)
    adjb = spark.table(table)
    labels = adjb.select("node").distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(iterations):
        labels = lpa_superstep(
            adjb, labels, broadcast_labels=False
        ).localCheckpoint(eager=False)
    return labels.localCheckpoint(eager=True)


def lpa_sql_unrolled(edges_cte: str, iterations: int = 3) -> str:
    """Exact DuckDB twin of ``label_propagation``: the fixed-K
    synchronous recurrence unrolled as CTEs. ``edges_cte`` must be a SQL
    relation with columns (src, dst)."""
    sql = [
        f"WITH raw AS ({edges_cte}),",
        "e AS (SELECT DISTINCT src AS a, dst AS b FROM raw WHERE src <> dst),",
        "adj AS (SELECT DISTINCT node, nbr FROM ("
        "SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b, a FROM e)),",
        "l0 AS (SELECT DISTINCT node, node AS label FROM adj),",
    ]
    for i in range(iterations):
        prev, cur = f"l{i}", f"l{i + 1}"
        sql.append(
            f"{cur} AS (SELECT node, nbr_label AS label FROM ("
            f"SELECT c.node, c.nbr_label, ROW_NUMBER() OVER ("
            f"PARTITION BY c.node ORDER BY c.n DESC, c.nbr_label ASC) AS r "
            f"FROM (SELECT adj.node, p.label AS nbr_label, "
            f"CAST(COUNT(*) AS BIGINT) AS n "
            f"FROM adj JOIN {prev} p ON p.node = adj.nbr "
            f"GROUP BY adj.node, p.label) c) WHERE r = 1),"
        )
    sql.append(f"final AS (SELECT node, label FROM l{iterations})")
    return "\n".join(sql)
