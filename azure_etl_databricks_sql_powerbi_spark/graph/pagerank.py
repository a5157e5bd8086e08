"""Distributed PageRank — the iterative-graph tier next to the
connected-components operator (``dedup/cluster.py``).

Pregel-lite on the DataFrame API: ranks live in a node-sized frame,
each iteration is one join (rank × out-edges) + one groupBy(dst) sum —
the two shuffles per superstep Spark can't avoid — with ``persist`` +
``localCheckpoint`` between iterations to cut lineage growth (the CC
precedent at `dedup/cluster.py`). Edges are re-used across iterations
(persist once); at 100 TB the edge relation would be bucketed by src so
the per-iteration join co-locates.

Cross-engine-exact iteration (the micro-unit contract,
``functions/ranking.py`` precedent): ranks are INTEGER micro-units.
Per superstep each out-neighbor contribution is
``floor((r_m * d) / outdeg)`` — one IEEE multiply and one divide on
exact integers, floored back to integers — and the new rank is
``base_m + SUM(contrib_m)`` with ``base_m = floor((1-d)*1e6/n)``.
Integer state in, integer state out: a FIXED-K unrolled SQL CTE chain
reproduces the exact ranks, so even this iterative operator gets a
hash-green DuckDB oracle (rare for graph ops).

Dangling nodes (outdeg 0) contribute nothing (their mass leaks — the
"remove dangling mass" simplification); undirected graphs (pass both
edge directions) have none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list. Returns
    ``(node, rank_m, rank)``: integer micro-unit rank (the exact,
    hash-comparable state) and its raw IEEE division to double.

    Node set = every id appearing as src or dst; initial rank
    ``floor(1e6/n)`` micro-units each.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    e = e.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # bounded: one scalar off a distinct count
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    base_m = int((1.0 - damping) * MICRO // n)  # floor of exact double div
    init_m = MICRO // n
    ranks = nodes.select("node", F.lit(init_m).cast("long").alias("rank_m"))

    for _ in range(iterations):
        contribs = (
            ranks.join(e, ranks["node"] == e["src"])
            .join(outdeg, on="src")
            .select(
                F.col("dst").alias("node"),
                F.floor((F.col("rank_m") * F.lit(damping)) / F.col("outdeg"))
                .cast("long")
                .alias("contrib_m"),
            )
            .groupBy("node")
            .agg(F.sum("contrib_m").alias("in_m"))
        )
        ranks = (
            nodes.join(contribs, on="node", how="left")
            .select(
                "node",
                (F.lit(base_m) + F.coalesce("in_m", F.lit(0))).cast("long").alias("rank_m"),
            )
            # cut lineage: K iterations of join+agg otherwise stack into one
            # enormous plan (CC operator precedent)
            .localCheckpoint(eager=False)
        )
    out = ranks.select(
        "node", "rank_m", (F.col("rank_m") / F.lit(float(MICRO))).alias("rank")
    )
    # Materialize the result (node-sized) so the cached edge/node relations
    # can be released NOW: without the eager checkpoint, unpersisting here
    # would force every superstep's join to recompute the distinct edge
    # shuffle at collect time, and leaving them cached accumulates executor
    # memory across a long bench session (ADVICE r6). The checkpoint blocks
    # are the result itself and are GC'd with the returned frame.
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    nodes.unpersist()
    return out


def pagerank_sql_unrolled(
    edges_cte: str,
    damping: float = 0.85,
    iterations: int = 3,
) -> str:
    """Generate the EXACT DuckDB twin of ``pagerank``: the fixed-K
    iteration unrolled as a CTE chain over the same integer micro-unit
    arithmetic. ``edges_cte`` must be a SQL relation named ``e`` with
    columns (src, dst), already DISTINCT."""
    # CAST the damping literal to DOUBLE: a bare 0.85 types as
    # DECIMAL(3,2) in DuckDB, which would multiply rank_m in exact
    # decimal while Spark does an IEEE double multiply — the products
    # can differ by 1 ulp near a floor boundary (ADVICE r6). With the
    # cast both engines run the identical IEEE arithmetic.
    d = f"CAST({damping!r} AS DOUBLE)"
    sql = [
        f"WITH e AS ({edges_cte}),",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),",
        "outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY src),",
        "r0 AS (SELECT node, CAST(1000000 // (SELECT n FROM n) AS BIGINT) AS rank_m FROM nodes),",
    ]
    for i in range(iterations):
        prev, cur = f"r{i}", f"r{i + 1}"
        sql.append(
            f"{cur} AS (SELECT nodes.node, CAST("
            f"CAST(FLOOR((1.0 - {d}) * 1000000 / (SELECT n FROM n)) AS BIGINT)"
            f" + COALESCE(c.in_m, 0) AS BIGINT) AS rank_m FROM nodes LEFT JOIN ("
            f"SELECT e.dst AS node, CAST(SUM(CAST(FLOOR((p.rank_m * {d}) / o.outdeg) AS BIGINT)) AS BIGINT) AS in_m"
            f" FROM {prev} p JOIN e ON e.src = p.node JOIN outdeg o ON o.src = e.src"
            f" GROUP BY e.dst) c ON c.node = nodes.node),"
        )
    sql.append(
        f"final AS (SELECT node, rank_m, rank_m / 1000000.0 AS rank FROM r{iterations})"
    )
    return "\n".join(sql)
