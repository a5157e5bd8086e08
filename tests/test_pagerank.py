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
