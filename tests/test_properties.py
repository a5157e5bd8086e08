"""Property-based tests (hypothesis) for the core keyed operators — the
test layer the reference lacks entirely (SURVEY.md §5).

Each property runs a handful of randomized small tables through the real
Spark operators; examples are capped low because each example is a Spark
job, not a pure function call.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.operators.scd2 import scd2_from_snapshots
from azure_etl_databricks_sql_powerbi_spark.operators.upsert import merge_upsert

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # key
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=1,
    max_size=12,
)


@given(target_rows=rows_strategy, source_rows=rows_strategy)
@settings(**SETTINGS)
def test_merge_upsert_properties(spark, target_rows, source_rows):
    """MERGE semantics (run_load.py:82-90): source wins on key match,
    unmatched target rows survive, and the merge is idempotent."""
    # one row per key on each side (MERGE requires unique source keys)
    target = spark.createDataFrame(
        list({k: (k, v) for k, v in target_rows}.values()), "k long, v long"
    )
    source = spark.createDataFrame(
        list({k: (k, v) for k, v in source_rows}.values()), "k long, v long"
    )
    merged = merge_upsert(target, source, keys=["k"])
    got = {r["k"]: r["v"] for r in merged.collect()}

    expected = {k: v for k, v in {k: (k, v) for k, v in target_rows}.values()}
    expected.update({k: v for k, v in {k: (k, v) for k, v in source_rows}.values()})
    assert got == expected

    twice = merge_upsert(merged, source, keys=["k"])
    assert {r["k"]: r["v"] for r in twice.collect()} == got


snapshot_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=30),  # day offset
        st.sampled_from(["a", "b", "c"]),  # tracked value
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda t: (t[0], t[1]),  # one version per (key, ts)
)


@given(snaps=snapshot_strategy)
@settings(**SETTINGS)
def test_scd2_intervals_partition_timeline(spark, snaps):
    """SCD2 invariants for any version stream: exactly one current row per
    key, no interval overlaps or gaps, first valid_from == first version."""
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(k, s, base + dt.timedelta(days=d)) for k, d, s in snaps],
        "k long, status string, ts timestamp",
    )
    hist = scd2_from_snapshots(df, ["k"], ["status"], "ts").collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    keys_in = {k for k, _, _ in snaps}
    assert set(by_key) == keys_in
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r["valid_from"])
        currents = [r for r in rows if r["is_current"]]
        assert len(currents) == 1
        assert rows[-1]["valid_to"] is None and rows[-1]["is_current"]
        # contiguity: each valid_to == next valid_from; no zero-length runs
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["status"] != b["status"]  # runs are collapsed
        first_ts = min(base + dt.timedelta(days=d) for kk, d, _ in snaps if kk == k)
        assert rows[0]["valid_from"] == first_ts


@given(
    drop=st.sets(st.sampled_from(["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]))
)
@settings(**SETTINGS)
def test_conform_tolerates_any_column_drift(spark, drop):
    """Dropping any subset of optional bronze columns still conforms to the
    contract schema (the reference's `if col in df.columns` guards,
    run_transform.py:49-70, as a total function)."""
    from azure_etl_databricks_sql_powerbi_spark.plans.medallion import (
        CUSTOMERS_CONTRACT,
    )
    from azure_etl_databricks_sql_powerbi_spark.operators.conform import conform

    full = spark.createDataFrame(
        [(1, " Ann ", 3, 10.5, "SEG")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    bronze = full.drop(*drop)
    out = conform(bronze, CUSTOMERS_CONTRACT, audit_ts="2026-01-01 00:00:00")
    expected_cols = [c.name for c in CUSTOMERS_CONTRACT.columns] + ["etl_loaded_at"]
    assert out.columns == expected_cols
    row = out.collect()[0]
    assert row["c_custkey"] == 1
    if "c_name" not in drop:
        assert row["c_name"] == "ann"
    else:
        assert row["c_name"] is None


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["aa bb", "cc dd", "ee ff", "gg hh", "ii jj"]),
        min_size=1,
        max_size=4,
    ),
    min_size=1,
    max_size=5,
)


@given(doc_lines=docs_strategy)
@settings(**SETTINGS)
def test_span_dedup_invariants(spark, doc_lines):
    """For ANY corpus: (1) surviving spans are globally unique, (2) every
    distinct input span survives exactly once, (3) the survivor of each
    span is its first occurrence (lowest doc_id, then span_idx)."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.lines import (
        dedup_spans_global,
        explode_spans,
    )

    docs = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(doc_lines)],
        ["doc_id", "text"],
    )
    spans = explode_spans(docs, line_sep="\n")
    kept = dedup_spans_global(spans).collect()

    kept_spans = [r.span for r in kept]
    assert len(kept_spans) == len(set(kept_spans))  # globally unique

    all_spans = {s for lines in doc_lines for s in lines}
    assert set(kept_spans) == all_spans  # nothing lost, nothing invented

    first = {}
    for i, lines in enumerate(doc_lines):
        for j, s in enumerate(lines):
            if s not in first:
                first[s] = (i, j)
    assert {(r.doc_id, r.span_idx) for r in kept} == set(first.values())


@given(
    n_tokens=st.integers(min_value=0, max_value=40),
    chunk_tokens=st.integers(min_value=2, max_value=10),
    overlap_frac=st.integers(min_value=0, max_value=100),
)
@settings(**SETTINGS)
def test_chunking_arithmetic_properties(spark, n_tokens, chunk_tokens, overlap_frac):
    """For ANY (doc length, window, overlap): chunk indices are contiguous
    from 0, every chunk has 1..chunk_tokens tokens (a short/empty doc has
    exactly one possibly-empty chunk), consecutive chunks overlap by
    exactly `overlap`, and stripping the overlap reconstructs the doc."""
    from azure_etl_databricks_sql_powerbi_spark.operators.chunking import (
        chunk_documents,
    )

    overlap = (overlap_frac * (chunk_tokens - 1)) // 101  # < chunk_tokens
    stride = chunk_tokens - overlap
    text = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(
            df, chunk_tokens=chunk_tokens, overlap=overlap
        ).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
    if n_tokens <= chunk_tokens:
        assert len(rows) == 1
    else:
        # ceil((n - w)/s) + 1
        assert len(rows) == -((n_tokens - chunk_tokens) // -stride) + 1
    rebuilt: list[str] = []
    for i, r in enumerate(rows):
        ctoks = r["chunk_text"].split() if r["chunk_text"] else []
        assert r["n_tokens"] == len(ctoks)
        assert len(ctoks) <= chunk_tokens
        if i == 0:
            rebuilt.extend(ctoks)
        else:
            prev = rows[i - 1]["chunk_text"].split()
            assert prev[-overlap:] == ctoks[:overlap] if overlap else True
            rebuilt.extend(ctoks[overlap:])
    assert rebuilt == text.split()


asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # key
        st.integers(min_value=0, max_value=500),   # ts seconds
        st.integers(min_value=-50, max_value=50),  # payload
    ),
    min_size=1,
    max_size=10,
)


@given(
    left_rows=asof_rows,
    right_rows=asof_rows,
    direction=st.sampled_from(["backward", "forward"]),
    tolerance=st.sampled_from([None, 30, 120]),
)
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(
    spark, left_rows, right_rows, direction, tolerance
):
    """The engine's union+window as-of join must agree with pandas
    merge_asof (per key, both directions, with/without tolerance) on
    arbitrary small timelines — the external-reference property the
    point tests can't give. Duplicate (key, ts) right rows are dropped
    to one (merge_asof requires and the engine resolves ties
    deterministically; dedup makes both sides' resolution identical)."""
    import pandas as pd

    epoch = dt.datetime(2024, 1, 1)
    l_pdf = pd.DataFrame(
        [(k, epoch + dt.timedelta(seconds=s), v) for k, s, v in left_rows],
        columns=["k", "ts", "lv"],
    ).drop_duplicates(["k", "ts"]).sort_values(["ts", "k"]).reset_index(drop=True)
    r_pdf = pd.DataFrame(
        [(k, epoch + dt.timedelta(seconds=s), v) for k, s, v in right_rows],
        columns=["k", "rts", "rv"],
    ).drop_duplicates(["k", "rts"]).sort_values(["rts", "k"]).reset_index(drop=True)

    expected = pd.merge_asof(
        l_pdf.sort_values("ts"),
        r_pdf.rename(columns={"rts": "ts"}).sort_values("ts"),
        on="ts",
        by="k",
        direction=direction,
        tolerance=None if tolerance is None else pd.Timedelta(seconds=tolerance),
    )
    exp = {
        (r.k, r.ts): (None if pd.isna(r.rv) else int(r.rv))
        for r in expected.itertuples()
    }

    from azure_etl_databricks_sql_powerbi_spark.operators.asof import asof_join

    left = spark.createDataFrame(l_pdf, "k long, ts timestamp, lv long")
    right = spark.createDataFrame(
        r_pdf, "k long, rts timestamp, rv long"
    )
    got_rows = asof_join(
        left,
        right,
        on="k",
        left_ts="ts",
        right_ts="rts",
        right_cols=["rv"],
        direction=direction,
        tolerance_seconds=tolerance,
    ).collect()
    got = {(r["k"], r["ts"]): r["rv"] for r in got_rows}
    assert got == exp


rolling_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # key
        st.integers(min_value=0, max_value=2000),   # ts seconds
        st.integers(min_value=-20, max_value=20),   # value
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: (t[0], t[1]),  # pandas resolves ts ties
    # positionally, Spark's RANGE frame set-wise — compare on tie-free data
)


@given(rows=rolling_rows, window_s=st.sampled_from([60, 300, 1200]))
@settings(**SETTINGS)
def test_rolling_range_agg_matches_pandas(spark, rows, window_s):
    """The RANGE-frame trailing aggregate must agree with pandas
    time-based rolling (closed='both' == Spark's inclusive bounds) per
    key on arbitrary tie-free timelines."""
    import pandas as pd

    from azure_etl_databricks_sql_powerbi_spark.operators.windows import (
        rolling_range_agg,
    )

    epoch = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        [(k, epoch + dt.timedelta(seconds=s), float(v)) for k, s, v in rows],
        columns=["k", "ts", "v"],
    )
    exp = {}
    for k, g in pdf.sort_values("ts").groupby("k"):
        r = g.rolling(pd.Timedelta(seconds=window_s), on="ts", closed="both")
        for (_, row), n, s in zip(g.iterrows(), r["v"].count(), r["v"].sum()):
            exp[(k, row.ts)] = (int(n), float(s))

    df = spark.createDataFrame(pdf, "k long, ts timestamp, v double")
    got_rows = rolling_range_agg(
        df, ["k"], "ts", "v", seconds=window_s
    ).collect()
    got = {
        (r["k"], r["ts"]): (r["rolling_n"], float(r["rolling_sum"]))
        for r in got_rows
    }
    assert got == exp


snap_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),               # key
        st.one_of(st.none(), st.integers(-5, 5)),            # a
        st.one_of(st.none(), st.sampled_from(["x", "y"])),   # b
    ),
    min_size=0,
    max_size=8,
    unique_by=lambda t: t[0],
)


@given(old_rows=snap_rows, new_rows=snap_rows)
@settings(**SETTINGS)
def test_table_diff_matches_dict_reference(spark, old_rows, new_rows):
    """Snapshot diff vs the obvious dict comparison on arbitrary keyed
    snapshots with NULLs: added/removed/changed classification and the
    drop-unchanged contract must agree exactly."""
    from azure_etl_databricks_sql_powerbi_spark.operators.diff import table_diff

    schema = "k long, a long, b string"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    got = {r["k"]: r["change"] for r in table_diff(old, new, ["k"]).collect()}

    o = {k: (a, b) for k, a, b in old_rows}
    n = {k: (a, b) for k, a, b in new_rows}
    exp = {}
    for k in o.keys() | n.keys():
        if k not in n:
            exp[k] = "removed"
        elif k not in o:
            exp[k] = "added"
        elif o[k] != n[k]:
            exp[k] = "changed"
    assert got == exp


edge_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=14,
)


@given(edges=edge_strategy, iters=st.sampled_from([1, 2, 3]))
@settings(**SETTINGS)
def test_pagerank_exact_on_arbitrary_graphs(spark, edges, iters):
    """The integer micro-unit PageRank must equal the pure-python
    recurrence on ARBITRARY directed graphs (dangling nodes, cycles,
    multi-edges collapse via distinct) for any iteration count — the
    generalization of the fixed star-graph point test."""
    import math

    from azure_etl_databricks_sql_powerbi_spark.graph.pagerank import MICRO, pagerank

    d = 0.85
    dedup = sorted(set(edges))
    nodes = sorted({x for e in dedup for x in e})
    n = len(nodes)
    out = {}
    for s, _ in dedup:
        out[s] = out.get(s, 0) + 1
    r = {v: MICRO // n for v in nodes}
    base = math.floor((1.0 - d) * MICRO / n)
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for s, t in dedup:
            nxt[t] += math.floor((r[s] * d) / out[s])
        r = nxt

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        row["node"]: row["rank_m"]
        for row in pagerank(df, damping=d, iterations=iters).collect()
    }
    assert got == r


@given(
    weights=st.lists(st.integers(1, 40), min_size=6, max_size=12),
    boost_idx=st.integers(0, 5),
)
@settings(**SETTINGS)
def test_weighted_sample_monotone_in_weight(spark, weights, boost_idx):
    """A-ES invariant: with everyone else's weight and the uniforms
    fixed, RAISING one row's weight can only improve its key — a row in
    the sample stays in the sample after a weight boost."""
    from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (
        weighted_sample,
    )

    k = max(2, len(weights) // 2)
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    before = {r["doc_id"] for r in weighted_sample(df, "w", k, salt="m").collect()}

    boosted = [(i, w * 10 if i == boost_idx else w) for i, w in rows]
    df2 = spark.createDataFrame(boosted, "doc_id long, w long")
    after = {r["doc_id"] for r in weighted_sample(df2, "w", k, salt="m").collect()}
    if boost_idx in before:
        assert boost_idx in after


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=1,
    max_size=20,
)


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_triangle_counts_match_brute_force(spark, edges):
    """Degree-oriented triangle counting equals brute-force enumeration
    on ARBITRARY random multigraphs (self-loops, duplicate and reversed
    edges included): per-node counts identical, and total triangle
    credit is divisible by 3 (each triangle credits exactly 3 corners —
    the exactly-once materialization invariant)."""
    import itertools

    from azure_etl_databricks_sql_powerbi_spark.graph.triangles import (
        triangle_counts,
    )

    eset = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({x for e in eset for x in e})
    expected: dict[int, int] = {}
    for trio in itertools.combinations(nodes, 3):
        a, b, c = trio
        if {(a, b), (a, c), (b, c)} <= eset:
            for v in trio:
                expected[v] = expected.get(v, 0) + 1

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == expected
    assert sum(got.values()) % 3 == 0


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_label_propagation_matches_python_reference(spark, edges):
    """Synchronous LPA equals a pure-python replay of the same
    majority/min-tiebreak recurrence on ARBITRARY random graphs — the
    determinism contract that makes the operator oracle-checkable."""
    from azure_etl_databricks_sql_powerbi_spark.graph.lpa import label_propagation

    eset = {(a, b) for a, b in edges if a != b}
    if not eset:
        return
    nbrs: dict[int, set[int]] = {}
    for a, b in eset:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    lab = {v: v for v in nbrs}
    for _ in range(3):
        nxt = {}
        for v, ns in nbrs.items():
            freq: dict[int, int] = {}
            for u in ns:
                freq[lab[u]] = freq.get(lab[u], 0) + 1
            nxt[v] = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        lab = nxt

    df = spark.createDataFrame(list(eset), "src long, dst long")
    got = {r.node: r.label for r in label_propagation(df, iterations=3).collect()}
    assert got == lab


weighted_edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=15,
)


@given(wedges=weighted_edges_strategy)
@settings(**SETTINGS)
def test_weighted_pagerank_exact_on_arbitrary_graphs(spark, wedges):
    """Weighted PageRank equals the pure-python replay of the identical
    integer micro-unit recurrence on ARBITRARY random weighted
    multigraphs (duplicate (src,dst) rows sum their weights)."""
    import math as m

    from azure_etl_databricks_sql_powerbi_spark.graph.pagerank import MICRO, pagerank

    wedges = [(a, b, w) for a, b, w in wedges if a != b]
    if not wedges:
        return
    agg: dict[tuple[int, int], int] = {}
    for s, t, w in wedges:
        agg[(s, t)] = agg.get((s, t), 0) + w
    nodes = sorted({x for s, t in agg for x in (s, t)})
    n = len(nodes)
    out_w: dict[int, int] = {}
    for (s, _t), w in agg.items():
        out_w[s] = out_w.get(s, 0) + w
    r = {v: MICRO // n for v in nodes}
    base = m.floor((1.0 - 0.85) * MICRO / n)
    for _ in range(3):
        nxt = {v: base for v in nodes}
        for (s, t), w in agg.items():
            nxt[t] += m.floor(((r[s] * 0.85) * w) / out_w[s])
        r = nxt

    df = spark.createDataFrame(wedges, "src long, dst long, w long")
    got = {
        row["node"]: row["rank_m"]
        for row in pagerank(df, iterations=3, weight_col="w").collect()
    }
    assert got == r


# ---- union-find closure (the sf1 strict-gate oracle core) ----------------

edge_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=60,
)


@given(edges=edge_strategy)
@settings(max_examples=200, deadline=None)
def test_union_find_equals_bfs_min_reachability(edges):
    """tools/strict_sf1_closure.min_label_components claims to compute the
    recursive CTE's fixpoint — min reachable node id per node on the
    undirected graph. Verify against a brute BFS closure on arbitrary
    graphs (self-loop-free; duplicates and both orientations allowed)."""
    import pandas as pd

    from tools.strict_sf1_closure import min_label_components

    df = pd.DataFrame(edges, columns=["u", "v"])
    got = dict(
        zip(min_label_components(df)["doc_id"], min_label_components(df)["cluster_id"])
    )

    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for node in adj:
        seen, frontier = {node}, [node]
        while frontier:
            nxt = [m for f in frontier for m in adj[f] if m not in seen]
            seen.update(nxt)
            frontier = nxt
        assert got[node] == min(seen), (node, sorted(seen))
    assert set(got) == set(adj)


# ---- numpy triangle oracle (the sf1 strict-gate triangle core) ------------


@given(edges=edge_strategy)
@settings(max_examples=200, deadline=None)
def test_numpy_triangle_oracle_equals_bruteforce(edges):
    """tools/strict_sf1_triangles.triangle_memberships claims per-node
    triangle membership over the canonicalized undirected graph — the
    mathematical object the resource-bound DuckDB wedge self-join
    computes. Verify counts, degrees, AND the clustering division
    against brute-force itertools trios on arbitrary graphs
    (duplicates and both orientations allowed)."""
    import itertools

    import pandas as pd

    from tools.strict_sf1_triangles import (
        numpy_clustering_coefficients,
        numpy_triangle_counts,
    )

    eset = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({x for e in eset for x in e})
    tri = {v: 0 for v in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= eset:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    deg = {v: sum(1 for e in eset if v in e) for v in nodes}

    df = pd.DataFrame(edges, columns=["src", "dst"])
    got_tri = numpy_triangle_counts(df)
    assert dict(zip(got_tri["node"], got_tri["n_triangles"])) == {
        v: t for v, t in tri.items() if t > 0
    }

    got_cc = numpy_clustering_coefficients(df).set_index("node")
    assert sorted(got_cc.index) == nodes
    for v in nodes:
        row = got_cc.loc[v]
        assert row["deg"] == deg[v]
        assert row["n_triangles"] == tri[v]
        want = (2.0 * tri[v]) / (deg[v] * (deg[v] - 1.0)) if deg[v] >= 2 else 0.0
        assert row["clustering"] == want


# ---- SemDeDup within-cell pair stage (blocked GEMM, r10 rewrite) -----------

vec_sets = st.lists(
    st.lists(st.integers(min_value=-5, max_value=5), min_size=4, max_size=4),
    min_size=2,
    max_size=14,
)


@given(vecs=vec_sets, threshold=st.sampled_from([0.317, 0.613, 0.904]))
@settings(**SETTINGS)
def test_semantic_dup_pairs_matches_bruteforce(spark, vecs, threshold):
    """The blocked-GEMM applyInPandas pair stage must reproduce the
    O(n²) per-pair definition exactly: same pair set (id_a < id_b,
    unrounded cosine >= threshold, within the same assigned cell), and
    the reported similarity within the display-rounding quantum. Cell
    assignment is taken from the same public assign_cells the operator
    uses — the property isolates the pair generation that the r10
    rewrite replaced. Thresholds are chosen away from cosines integer
    vectors can hit exactly, so GEMM-vs-scalar last-ulp noise cannot
    flip membership."""
    import math

    import numpy as np

    from azure_etl_databricks_sql_powerbi_spark.dedup.semantic import (
        semantic_dup_pairs,
    )
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import assign_cells

    rows = [(i, [float(c) for c in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = np.array([[1.0, 0.0, 0.0, 0.0], [0.0, -1.0, 0.0, 1.0]])

    got = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in semantic_dup_pairs(df, cents, threshold=threshold).collect()
    }

    cell_of = {
        r.vec_id: r.cell
        for r in assign_cells(df, cents, "embedding", nprobe=1).collect()
    }

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0 or nb == 0:
            return 0.0
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    want = {}
    for i, va in rows:
        for j, vb in rows:
            if i < j and cell_of[i] == cell_of[j]:
                c = cos(va, vb)
                if c >= threshold:
                    want[(i, j)] = c

    assert set(got) == set(want)
    for pair, sim in want.items():
        assert abs(got[pair] - sim) <= 1e-4 + 1e-9


# ---- auto_srp_params (r10 LSH density auto-sizing) -------------------------


@given(
    n=st.integers(min_value=1, max_value=10**9),
    sim=st.floats(min_value=0.9, max_value=0.999),
    recall=st.sampled_from([0.9, 0.99, 0.999, 0.99999]),
)
@settings(max_examples=300, deadline=None)
def test_auto_srp_params_invariants(n, sim, recall):
    """Pure-function invariants: whenever auto_srp_params returns (it may
    raise only the documented infeasibility ValueError), the analytic
    recall target is MET at the design cosine, bits sit inside the
    clamps, and the table count is minimal (one fewer table misses the
    target). Bits are non-decreasing in corpus size at fixed knobs."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.lsh import (
        auto_srp_params,
        expected_collision_prob,
    )

    try:
        bits, tables = auto_srp_params(n, sim=sim, target_recall=recall)
    except ValueError:
        return  # documented infeasibility path
    assert 4 <= bits <= 24 and 1 <= tables <= 64
    assert expected_collision_prob(sim, bits, tables) >= recall
    if tables > 1:
        assert expected_collision_prob(sim, bits, tables - 1) < recall
    if n >= 2:
        smaller_bits, _ = auto_srp_params(n // 2, sim=sim, target_recall=recall)
        assert smaller_bits <= bits


# ---- round_half_up_4 (r11 vectorized banded rounding) -----------------------


@given(
    xs=st.lists(
        st.one_of(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
            # adversarial: exact half-boundary decimals whose DOUBLE sits
            # just above/below k*1e-4 + 5e-5 — where banker's rounding on
            # the binary value diverges from decimal HALF_UP
            st.integers(min_value=-9999, max_value=9999).map(
                lambda k: (2 * k + 1) / 2e4
            ),
        ),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=300, deadline=None)
def test_round_half_up_4_matches_decimal_reference(xs):
    """The vectorized banded rounding must equal the all-Decimal
    reference (Spark round(x,4): HALF_UP on the shortest round-trip
    decimal repr) on EVERY double — bulk values via np.round, boundary
    values via the Decimal band. This pins the r11 rewrite that removed
    the per-pair interpreted Decimal loop from the SemDeDup GEMM stage."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from azure_etl_databricks_sql_powerbi_spark.dedup.semantic import round_half_up_4

    got = round_half_up_4(np.array(xs, dtype=np.float64))
    want = [
        float(
            Decimal(repr(float(v))).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
        )
        for v in xs
    ]
    assert got.tolist() == want


# ---------------------------------------------------------------- frontier

_ROBOTS_LINES = st.sampled_from(
    [
        "User-agent: *",
        "User-agent: trainbot",
        "",
        "Disallow: /x",
        "Crawl-delay: 1",
        "Crawl-delay: 2.5",
        "Crawl-delay: 0",
        "Crawl-delay: 86400",
        "Crawl-delay: -1",
        "Crawl-delay: nan",
        "Crawl-delay: 1e999",
        "Crawl-delay: fast",
        "Crawl-delay:",
    ]
)

# the finite, non-negative values the line pool can declare — the ONLY
# non-default delays any schedule may carry (cap folds them down)
_VALID_POOL = {1.0, 2.5, 0.0, 86400.0}


@given(
    docs=st.lists(
        st.lists(_ROBOTS_LINES, min_size=0, max_size=10).map("\n".join),
        min_size=1,
        max_size=3,
    ),
    agent=st.sampled_from(["*", "trainbot"]),
    cap=st.sampled_from([None, 30.0]),
)
@settings(**SETTINGS)
def test_crawl_delay_properties(spark, docs, agent, cap):
    """For ANY robots.txt built from the directive pool: every
    effective delay is finite, non-negative, at most the cap, and is
    either the default or (the capped image of) a value some line
    actually declared — garbage lines can never mint a delay."""
    import math

    from azure_etl_databricks_sql_powerbi_spark.functions.robots import parse_robots
    from azure_etl_databricks_sql_powerbi_spark.sources.frontier import crawl_delays

    frame = spark.createDataFrame(
        [(f"d{i}.com", txt) for i, txt in enumerate(docs)],
        "domain string, robots_txt string",
    )
    rows = crawl_delays(
        parse_robots(frame), agent=agent, default_delay_s=1.0, max_delay_s=cap
    ).collect()
    allowed = {1.0} | {
        v if cap is None else min(v, cap) for v in _VALID_POOL
    }
    for r in rows:
        assert math.isfinite(r.delay_s) and r.delay_s >= 0
        if cap is not None:
            assert r.delay_s <= cap
        assert r.delay_s in allowed, (r.domain, r.delay_s)


@given(
    caps=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # host index
            st.integers(min_value=0, max_value=99),  # page id
        ),
        min_size=1,
        max_size=16,
        unique=True,
    ),
    n_lanes=st.sampled_from([1, 8, 64]),
)
@settings(**SETTINGS)
def test_fetch_schedule_properties(spark, caps, n_lanes):
    """For ANY capture set: row count and input columns are preserved,
    each host's slots are exactly the permutation 1..n_h in urlkey
    order, offsets are exactly (slot-1)*delay, and every host maps to
    ONE lane in [0, n_lanes) — per-host serialization survives any
    fan-out."""
    from azure_etl_databricks_sql_powerbi_spark.sources.frontier import fetch_schedule

    # DISTINCT registered domains per host index — subdomains of one
    # domain would all fold to it and collapse the host dimension
    # (review finding: h{h}.example.com left by_host with one key)
    frame = spark.createDataFrame(
        [
            (f"https://host{h}.com/p/{p}", f"com,host{h})/p/{p:02d}")
            for h, p in caps
        ],
        "url string, urlkey string",
    )
    out = fetch_schedule(
        frame, None, order_cols=("urlkey",), default_delay_s=2.0, n_lanes=n_lanes
    ).collect()
    assert len(out) == len(caps)
    by_host: dict[str, list] = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    for rows in by_host.values():
        rows.sort(key=lambda r: r.urlkey)
        assert [r.slot for r in rows] == list(range(1, len(rows) + 1))
        assert all(
            r.scheduled_offset_s == (r.slot - 1) * r.delay_s for r in rows
        )
        lanes = {r.lane for r in rows}
        assert len(lanes) == 1 and all(0 <= x < n_lanes for x in lanes)


shuffle_ids = st.lists(
    st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=40, unique=True
)


@given(ids=shuffle_ids, seed=st.integers(0, 5), n_shards=st.sampled_from([1, 3, 8]))
@settings(**SETTINGS)
def test_epoch_shuffle_properties(spark, ids, seed, n_shards):
    """Training-order materialization invariants on arbitrary corpora:
    (a) the shuffle is a permutation (every id once, pos dense per
    shard); (b) the manifest's fingerprints xor to a hashlib-md5
    reference value — an INDEPENDENT Python replay of the Column
    arithmetic, so a substring-offset or signedness bug in the engine
    expression cannot self-confirm."""
    import hashlib
    from functools import reduce

    from azure_etl_databricks_sql_powerbi_spark.operators.shuffle import (
        epoch_shuffle,
        shard_manifest,
    )

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    sh = epoch_shuffle(df, seed=seed, n_shards=n_shards).collect()
    assert sorted(r.doc_id for r in sh) == sorted(ids)
    by_shard: dict[int, list[int]] = {}
    for r in sh:
        assert 0 <= r.shard_id < n_shards
        by_shard.setdefault(r.shard_id, []).append(r.pos)
    for ps in by_shard.values():
        assert sorted(ps) == list(range(len(ps)))

    rows = shard_manifest(
        epoch_shuffle(df, seed=seed, n_shards=n_shards)
    ).collect()
    assert sum(r.n_docs for r in rows) == len(ids)
    got = reduce(lambda a, b: a ^ b, (r.fingerprint for r in rows))
    want = reduce(
        lambda a, b: a ^ b,
        (
            int(hashlib.md5(str(i).encode()).hexdigest()[8:22], 16)
            for i in ids
        ),
    )
    assert got == want


frontier_caps = st.lists(
    st.tuples(
        st.sampled_from(["a.com", "b.com", "c.org", "long-tail.net"]),  # host
        st.integers(min_value=0, max_value=99),  # order key
    ),
    min_size=1,
    max_size=30,
)


@given(caps=frontier_caps, quota=st.integers(1, 5), n_lanes=st.sampled_from([1, 4]))
@settings(**SETTINGS)
def test_frontier_chain_properties(spark, caps, quota, n_lanes):
    """Quota/priority invariants on arbitrary capture sets: per-host
    keep-count is min(host count, quota); kept rows are exactly the
    slot-prefix of each host; per-lane priority ranks are a bijection
    1..n with per-host slot order preserved inside the rank."""
    from azure_etl_databricks_sql_powerbi_spark.sources.frontier import (
        crawl_quota,
        fetch_schedule,
        prioritize_frontier,
    )

    rows = [
        (f"http://{h}/p{k}-{i}", f"{h})/p{k}-{i}", k)
        for i, (h, k) in enumerate(caps)
    ]
    df = spark.createDataFrame(rows, "url string, urlkey string, k int")
    sched = fetch_schedule(
        df, None, url_col="url", order_cols=("k", "urlkey"), n_lanes=n_lanes
    )
    kept = crawl_quota(sched, quota).collect()
    full = sched.collect()
    per_host_full: dict[str, list] = {}
    for r in full:
        per_host_full.setdefault(r.host, []).append(r)
    per_host_kept: dict[str, list] = {}
    for r in kept:
        per_host_kept.setdefault(r.host, []).append(r)
    for h, frows in per_host_full.items():
        krows = per_host_kept.get(h, [])
        assert len(krows) == min(len(frows), quota)
        # kept = exactly the slot-prefix
        assert {r.urlkey for r in krows} == {
            r.urlkey for r in frows if r.slot <= quota
        }
    scores = spark.createDataFrame(
        [("a.com", 5.0), ("c.org", 1.0)], "domain string, score double"
    )
    ranked = prioritize_frontier(crawl_quota(sched, quota), scores).collect()
    by_lane: dict[int, list] = {}
    for r in ranked:
        by_lane.setdefault(r.lane, []).append(r)
    for lane_rows in by_lane.values():
        lane_rows.sort(key=lambda r: r.priority_rank)
        assert [r.priority_rank for r in lane_rows] == list(
            range(1, len(lane_rows) + 1)
        )
        prev: dict[str, int] = {}
        for r in lane_rows:
            if r.host in prev:
                assert r.slot > prev[r.host]  # slot order inside the rank
            prev[r.host] = r.slot
