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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # undirected adjacency, both directions, deduped. NOT pre-partitioned
    # on the superstep join key: the r15 optimization pass measured that
    # variant (repartition("nbr") + sortWithinPartitions before persist)
    # and the final AQE plan showed each steady-state superstep already
    # runs a BroadcastHashJoin with the NODE-sized label frame as build
    # side — the adjacency never moves, so the extra edge-wide exchange
    # at cache build bought nothing (5.50s -> 5.86s at sf0.1). In the
    # beyond-broadcast regime (labels >> broadcast cap) the right layout
    # is the bucketed edge table (the pagerank_bucketed pattern), not a
    # per-run repartition.
    adj = (
        e.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionAll(e.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .distinct()
        .persist()
    )
    labels = adj.select("node").distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(iterations):
        nbr_labels = adj.join(
            labels.select(
                F.col("node").alias("nbr"), F.col("label").alias("nbr_label")
            ),
            on="nbr",
        )
        counts = nbr_labels.groupBy("node", "nbr_label").agg(
            F.count(F.lit(1)).alias("n")
        )
        w = Window.partitionBy("node").orderBy(
            F.col("n").desc(), F.col("nbr_label").asc()
        )
        labels = (
            counts.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .select("node", F.col("nbr_label").alias("label"))
            # cut lineage each superstep (the pagerank/CC discipline)
            .localCheckpoint(eager=False)
        )
    out = labels.localCheckpoint(eager=True)  # release adj afterwards
    adj.unpersist()
    return out


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
