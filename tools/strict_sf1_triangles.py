"""Close the triangle-family sf1 strict-gate exclusion (round 8).

``triangle_counts_parts`` / ``clustering_coefficients_parts`` were the
only oracle queries left without an sf1 hash-exactness point: their
DuckDB twins materialize the oriented wedge set as a self-join (413M
rows on the sf1 co-order graph, measured), and DuckDB's spill format
amplified that join past the container's free disk even under a 96 GB
RAM budget (documented in ``tools/strict_sf1_graph.py``). The Spark
plan pipelines the identical wedges in ~50 s — the ORACLE, not the
engine, was resource-bound.

This gate swaps the wedge self-join for an exact numpy evaluation of
the same mathematical object and keeps everything else identical to
the committed oracle:

1. DuckDB runs the committed edge derivation verbatim
   (``__spark_entry__._CO_ORDER_EDGES_SQL`` + the twins' own
   DISTINCT/LEAST/GREATEST canonicalization) to produce the undirected
   edge list.
2. numpy computes per-node triangle memberships with the same
   degree-orientation bound the engine uses (Schank & Wagner 2005):
   wedges enumerate per-pivot out-neighbor pairs (Σ outdeg² total,
   never deg²), the closing edge is a binary search into the sorted
   packed edge set, and each triangle is found exactly once at its
   minimum vertex. Streaming per-pivot, so peak memory is one pivot's
   wedge block — no 413M-row materialization anywhere.
3. Clustering coefficients finish with the twins' own arithmetic:
   integer 2*T(v) and deg(v)*(deg(v)-1), ONE IEEE-double division —
   numpy float64 and Spark DoubleType round identically, so the
   compare is cell-for-cell exact with NO float tolerance.
4. The Spark queries run at sf1 and are compared via
   ``strict_oracle_check.canon`` — the strict-gate discipline.

The oracle stays independent of the Spark implementation: the edge
derivation is DuckDB's, the triangle count is 60 lines of textbook
numpy verified against brute-force ``itertools.combinations`` ground
truth by a hypothesis property test
(``tests/test_properties.py::test_numpy_triangle_oracle_equals_bruteforce``).

Usage::

    python /root/repo/tools/strict_sf1_triangles.py
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF1 = os.path.join(REPO, ".data", "sf1")


def triangle_memberships(src: np.ndarray, dst: np.ndarray):
    """Exact per-node triangle membership counts over an undirected
    graph given as (src, dst) edge arrays (any orientation, dups and
    self-loops tolerated — canonicalized here exactly like the twins'
    ``e`` CTE). Returns (nodes, deg, tri) aligned int64 arrays: every
    distinct node, its undirected degree, and the number of triangles
    it belongs to."""
    a = np.minimum(src, dst).astype(np.int64)
    b = np.maximum(src, dst).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[: len(a)], inv[len(a) :]
    # distinct undirected edges in index space (nodes sorted -> ai < bi)
    n = len(nodes)
    ekeys = np.unique(ai * n + bi)
    ai, bi = ekeys // n, ekeys % n
    deg = np.bincount(ai, minlength=n) + np.bincount(bi, minlength=n)
    # orient low -> high under the (degree, id) total order; id < n so
    # deg*n + id is collision-free and preserves the lexicographic order
    okey = deg.astype(np.int64) * n + np.arange(n, dtype=np.int64)
    a_is_lo = okey[ai] < okey[bi]
    lo = np.where(a_is_lo, ai, bi)
    hi = np.where(a_is_lo, bi, ai)
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    starts = np.flatnonzero(np.r_[True, lo[1:] != lo[:-1]])
    ends = np.r_[starts[1:], len(lo)]
    tri = np.zeros(n, dtype=np.int64)
    hit_chunks: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        d = e - s
        if d < 2:
            continue
        nb = hi[s:e]  # sorted ascending within the (lo, hi) lexsort
        iu, ju = np.triu_indices(d, 1)
        x, y = nb[iu], nb[ju]  # x < y by construction
        wkeys = x * n + y
        pos = np.searchsorted(ekeys, wkeys)
        pos[pos == len(ekeys)] = 0
        closed = ekeys[pos] == wkeys
        n_closed = int(closed.sum())
        if n_closed:
            tri[lo[s]] += n_closed
            hit_chunks.append(x[closed])
            hit_chunks.append(y[closed])
    if hit_chunks:
        tri += np.bincount(np.concatenate(hit_chunks), minlength=n)
    return nodes, deg.astype(np.int64), tri


def numpy_triangle_counts(edges: pd.DataFrame) -> pd.DataFrame:
    """Oracle twin of ``graph.triangles.triangle_counts``: (node,
    n_triangles) for nodes in >= 1 triangle."""
    nodes, _, tri = triangle_memberships(
        edges["src"].to_numpy(), edges["dst"].to_numpy()
    )
    m = tri > 0
    return pd.DataFrame({"node": nodes[m], "n_triangles": tri[m]})


def numpy_clustering_coefficients(edges: pd.DataFrame) -> pd.DataFrame:
    """Oracle twin of ``graph.triangles.clustering_coefficients``:
    (node, deg, n_triangles, clustering) for every node, clustering =
    2*T/(deg*(deg-1)) as ONE float64 division, 0.0 when deg < 2."""
    nodes, deg, tri = triangle_memberships(
        edges["src"].to_numpy(), edges["dst"].to_numpy()
    )
    denom = np.where(deg >= 2, deg * (deg - 1.0), 1.0)
    clustering = np.where(deg >= 2, (2.0 * tri) / denom, 0.0)
    return pd.DataFrame(
        {"node": nodes, "deg": deg, "n_triangles": tri, "clustering": clustering}
    )


def main() -> int:
    import __spark_entry__ as entry
    from strict_oracle_check import canon

    from azure_etl_databricks_sql_powerbi_spark.session import get_spark

    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF1}/lineitem.parquet')"
    )
    t0 = time.time()
    edges = con.execute(
        "SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst "
        f"FROM ({entry._CO_ORDER_EDGES_SQL}) WHERE src <> dst"
    ).df()
    t1 = time.time()
    print(f"edges {len(edges)} ({t1 - t0:.1f}s)", flush=True)

    oracles = {
        "triangle_counts_parts": numpy_triangle_counts(edges),
        "clustering_coefficients_parts": numpy_clustering_coefficients(edges),
    }
    t2 = time.time()
    print(f"numpy oracle ({t2 - t1:.1f}s)", flush=True)

    spark = get_spark(app_name="strict-sf1-triangles", master="local[8]")
    Q = entry.queries()
    ok_all = True
    for name, orc in oracles.items():
        ts = time.time()
        sp = Q[name](spark, SF1).toPandas()
        te = time.time()
        a, b = canon(sp), canon(orc)
        exact = (
            list(a.columns) == list(b.columns) and len(a) == len(b) and a.equals(b)
        )
        print(
            f"{name} cols {list(a.columns) == list(b.columns)} "
            f"rows {len(a) == len(b)} {len(a)} EXACT {exact} "
            f"(spark {te - ts:.1f}s)",
            flush=True,
        )
        ok_all = ok_all and exact
    print("ALL_EXACT", ok_all)
    spark.stop()
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
