"""Close the last sf1 strict-gate exclusion (VERDICT r7 directive #6).

``near_dup_clusters`` / ``leakage_safe_split`` / ``pretraining_prep``
were the only oracle queries excluded from the sf1 hash-exactness log:
their DuckDB twins compute the near-dup cluster assignment with a
RECURSIVE min-label CTE, and DuckDB's unbounded recursion over the sf1
edge set (~129k candidate edges over 50k docs) runs >25 min (documented
in commit bc8cc75) while Spark's large-star/small-star CC finishes in
seconds. The closure is the ONLY slow piece — the non-recursive prefix
(shingle -> rare -> candidate edges) takes ~10 s at sf1.

So this gate swaps the recursion for an exact equivalent and keeps
everything else cell-for-cell identical to the committed oracle SQL:

1. DuckDB runs the oracle's own non-recursive prefix to produce the
   candidate edge list (and, for pretraining_prep, the gated+deduped
   doc set the edges derive from).
2. Python union-find with min-label representatives computes connected
   components over those edges. This is semantically identical to the
   recursive CTE (min reachable node id per node on an undirected
   graph) but O(E alpha(E)) instead of materializing every
   (node, reachable-comp) pair.
3. The component table is registered back into DuckDB and the oracle's
   own SUFFIX SQL (keep verdict / md5 split buckets / chunking) runs
   against it unchanged.
4. The Spark query runs at sf1 and is compared cell-for-cell (string
   canon, NO float tolerance) — the strict_oracle_check discipline.

The oracle therefore stays independent of the Spark implementation: the
edge derivation is DuckDB's, the closure is a 15-line textbook
union-find, and the downstream arithmetic is the committed SQL.

Usage::

    python /root/repo/tools/strict_sf1_closure.py
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# strict_oracle_check lives in tools/ — resolve it explicitly so this
# module also imports from a foreign cwd (script-directory resolution
# only covers the __main__ case)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from strict_oracle_check import canon  # noqa: E402

from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402

SF1 = os.path.join(REPO, ".data", "sf1")

# The oracle's own non-recursive prefix (verbatim from
# __spark_entry__.ORACLES["near_dup_clusters"]): documents -> 5-token
# shingles -> rare (df in [2, 10]) -> candidate edges.
_EDGES_FROM_DOCUMENTS = r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               CASE WHEN len(t) <= 5 THEN array_to_string(t, ' ')
                    ELSE array_to_string(t[i.i:i.i+4], ' ') END AS shingle
        FROM toks, UNNEST(range(1, GREATEST(len(t) - 4, 1) + 1)) AS i(i)
    ),
    rare AS (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING COUNT(*) BETWEEN 2 AND 10
    )
    SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
    FROM sh a JOIN sh b USING (shingle)
    WHERE a.doc_id < b.doc_id
      AND shingle IN (SELECT shingle FROM rare)
"""

# pretraining_prep's prefix: Gopher gate + exact dedup first (verbatim
# from ORACLES["pretraining_prep"] CTEs t0/m/gated/ded).
_DED_SQL = r"""
    WITH t0 AS (
        SELECT doc_id, text,
               CASE WHEN length(TRIM(text)) = 0
                    THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(TRIM(text), '\s+') END AS toks
        FROM documents
    ),
    m AS (
        SELECT doc_id, text, toks,
               CAST(len(toks) AS BIGINT) AS n_words,
               length(regexp_replace(text, '\s', '', 'g'))
                   / GREATEST(len(toks), 1) AS mean_word_len,
               (length(regexp_replace(text, '[^#…]', '', 'g'))
                + len(regexp_extract_all(text, '\.\.\.')))
                   / GREATEST(len(toks), 1) AS symbol_ratio,
               len(list_filter(toks, x -> lower(x) IN
                   ('the','and','of','to','in','is','you','that','it','for')))
                   AS stop_hits
        FROM t0
    ),
    gated AS (
        SELECT doc_id, text FROM m
        WHERE n_words >= 10 AND n_words <= 200
          AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
          AND symbol_ratio <= 0.1 AND stop_hits >= 2
    )
    SELECT doc_id, text FROM (
        SELECT doc_id, text,
               ROW_NUMBER() OVER (
                   PARTITION BY md5(text) ORDER BY doc_id
               ) AS rn
        FROM gated
    ) WHERE rn = 1
"""

_EDGES_FROM_DED = _EDGES_FROM_DOCUMENTS.replace("FROM documents", "FROM ded")

# Oracle suffixes, verbatim from the committed SQL, with the recursive
# `comp` CTE replaced by the registered `comp` table.
_SUFFIX = {
    "near_dup_clusters": """
        SELECT d.doc_id,
               COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
               COALESCE(c.cluster_id, d.doc_id) = d.doc_id AS keep
        FROM documents d LEFT JOIN comp c USING (doc_id)
    """,
    "leakage_safe_split": """
        WITH assigned AS (
            SELECT d.doc_id,
                   COALESCE(c.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp c USING (doc_id)
        ),
        b AS (
            SELECT doc_id, cluster_id,
                   CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))
                        AS UBIGINT) % 10000 AS bucket
            FROM assigned
        )
        SELECT doc_id, cluster_id,
               CASE WHEN bucket < 9000 THEN 'train'
                    WHEN bucket < 9500 THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    """,
    "pretraining_prep": """
        WITH assigned AS (
            SELECT d.doc_id, d.text,
                   COALESCE(c.cluster_id, d.doc_id) AS cluster_id
            FROM ded d LEFT JOIN comp c USING (doc_id)
        ),
        train AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))
                            AS UBIGINT) % 10000 AS bucket
                FROM assigned
            ) WHERE bucket < 9000
        ),
        ttoks AS (
            SELECT doc_id,
                   CASE WHEN length(TRIM(text)) = 0
                        THEN CAST([] AS VARCHAR[])
                        ELSE string_split_regex(TRIM(text), '\\s+') END AS t
            FROM train
        ),
        counted AS (
            SELECT doc_id, t, len(t) AS n,
                   CASE WHEN len(t) <= 8 THEN 1
                        ELSE ((len(t) - 8 + 5) // 6) + 1 END AS n_chunks
            FROM ttoks
        )
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_idx,
               CAST(len(t[i * 6 + 1 : i * 6 + 8]) AS BIGINT) AS n_tokens,
               array_to_string(t[i * 6 + 1 : i * 6 + 8], ' ') AS chunk_text
        FROM counted CROSS JOIN UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
    """,
}


def min_label_components(edges: pd.DataFrame) -> pd.DataFrame:
    """Union-find with min-id representatives — exactly the recursive
    CTE's fixpoint (min reachable node per node, undirected)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(edges["u"].to_numpy(), edges["v"].to_numpy()):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:  # min id becomes the representative
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo

    nodes = sorted(set(edges["u"].tolist()) | set(edges["v"].tolist()))
    return pd.DataFrame(
        {"doc_id": nodes, "cluster_id": [find(n) for n in nodes]}
    ).astype("int64")


def oracle_frame(con: duckdb.DuckDBPyConnection, name: str) -> pd.DataFrame:
    if name == "pretraining_prep":
        ded = con.execute(_DED_SQL).fetchdf()
        con.register("ded", ded)
        edges = con.execute(_EDGES_FROM_DED).fetchdf()
    else:
        edges = con.execute(_EDGES_FROM_DOCUMENTS).fetchdf()
    con.register("comp", min_label_components(edges))
    return con.execute(_SUFFIX[name]).fetchdf()


def main() -> int:
    spark = get_spark(app_name="strict-sf1-closure", master="local[8]")
    qs = entry.queries()
    ok_all = True
    for name in ("near_dup_clusters", "leakage_safe_split", "pretraining_prep"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF1}/documents.parquet')"
        )
        t0 = time.time()
        sp = qs[name](spark, SF1).toPandas()
        orc = oracle_frame(con, name)
        a, b = canon(sp), canon(orc)
        same_cols = list(a.columns) == list(b.columns)
        same_rows = len(a) == len(b)
        exact = same_cols and same_rows and a.equals(b)
        print(
            f"{name} cols {same_cols} rows {same_rows} {len(a)} "
            f"EXACT {exact} ({time.time() - t0:.1f}s)",
            flush=True,
        )
        if not exact:
            ok_all = False
            if same_cols and same_rows:
                for c in a.columns:
                    neq = a[c] != b[c]
                    if neq.any():
                        i = neq.idxmax()
                        print(
                            f"  first diff col {c} row {i}: spark={a[c][i]!r} "
                            f"oracle={b[c][i]!r} ({int(neq.sum())} cells)"
                        )
        con.close()
    print("ALL_EXACT", ok_all)
    spark.stop()
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
