"""Hard-negative mining tests: cross-label constraint, determinism, and a
module-owned DuckDB twin on the real embeddings table (the graph-tier
pattern: the SQL twin lives next to the operator and is pytest-proven
before the query enters a driver window)."""

from __future__ import annotations

import duckdb

from oracle_harness import compare

from azure_etl_databricks_sql_powerbi_spark.similarity.negatives import (
    hard_negatives,
    triplet_candidates,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


# The DuckDB twin of hard_negatives(corpus=embeddings, anchors=vec_id<8,
# k=5): same cosine, same cross-label predicate, same tie-break.
NEGATIVES_SQL = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
               FROM read_parquet('{sf}/embeddings.parquet')),
    a AS (SELECT * FROM e WHERE vec_id < 8),
    pairs AS (
        SELECT a.vec_id AS anchor_id, c.vec_id AS negative_id,
               c.label AS negative_label,
               CASE WHEN sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(c.v, c.v)) = 0
                    THEN 0.0
                    ELSE list_dot_product(a.v, c.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(c.v, c.v)))
               END AS cos
        FROM e c, a WHERE c.label <> a.label
    )
    SELECT anchor_id, CAST(rank AS INT) AS rank, negative_id,
           negative_label, cos AS cosine_sim
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY anchor_id ORDER BY cos DESC, negative_id ASC
        ) AS rank FROM pairs
    ) WHERE rank <= 5
"""


# The DuckDB twin of triplet_candidates(corpus=embeddings, anchors=vec_id<4,
# k_pos=2, k_neg=3): same cosine fold, same (anchor_id, same-label) ranking
# windows, same tie-breaks, margin rounded from the UNROUNDED difference —
# the module-owned oracle behind the r11-declared `triplet_candidates`
# contract query (ROTATION_POLICY.md §5 swap #2).
TRIPLETS_SQL = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
               FROM read_parquet('{sf}/embeddings.parquet')),
    a AS (SELECT * FROM e WHERE vec_id < 4),
    scored AS (
        SELECT a.vec_id AS anchor_id, c.vec_id AS cand_id,
               (c.label = a.label) AS same,
               CASE WHEN sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(c.v, c.v)) = 0
                    THEN 0.0
                    ELSE list_dot_product(a.v, c.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(c.v, c.v)))
               END AS cos
        FROM e c, a WHERE c.vec_id <> a.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY anchor_id, same ORDER BY cos DESC, cand_id ASC
        ) AS rnk FROM scored
    ),
    pos AS (SELECT anchor_id, cand_id AS positive_id, cos AS pc
            FROM ranked WHERE same AND rnk <= 2),
    neg AS (SELECT anchor_id, cand_id AS negative_id, cos AS nc
            FROM ranked WHERE NOT same AND rnk <= 3)
    SELECT p.anchor_id AS anchor_id, positive_id, negative_id,
           pc AS pos_sim, nc AS neg_sim,
           pc - nc AS margin
    FROM pos p JOIN neg n ON p.anchor_id = n.anchor_id
"""


def test_triplet_candidates_matches_duckdb_twin(spark):
    """Hash-exact (float_tol=0) against the module-owned twin — the
    pytest proof that gates declaring `triplet_candidates` on the driver
    board (the NEGATIVES_SQL / graph-tier discipline)."""
    emb = _emb(spark)
    out = triplet_candidates(emb, emb.filter("vec_id < 4"), k_pos=2, k_neg=3)
    orc = duckdb.sql(TRIPLETS_SQL.format(sf=SF)).df()
    assert compare(out, orc, float_tol=0) == []


def test_hard_negatives_matches_duckdb_twin(spark):
    emb = _emb(spark)
    out = hard_negatives(emb, emb.filter("vec_id < 8"), k=5)
    orc = duckdb.sql(NEGATIVES_SQL.format(sf=SF)).df()
    assert compare(out, orc, float_tol=1e-9) == []


def test_hard_negatives_never_returns_anchor_label(spark):
    emb = _emb(spark)
    out = hard_negatives(emb, emb.filter("vec_id < 8"), k=5)
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    for r in out.collect():
        assert r.negative_label != labels[r.anchor_id]
        assert 1 <= r.rank <= 5


def test_hard_negatives_min_sim_floor(spark):
    emb = _emb(spark)
    floored = hard_negatives(emb, emb.filter("vec_id < 8"), k=50, min_sim=0.5)
    assert all(r.cosine_sim >= 0.5 for r in floored.collect())


def test_triplet_margins_and_shapes(spark):
    emb = _emb(spark)
    out = triplet_candidates(
        emb, emb.filter("vec_id < 4"), k_pos=2, k_neg=3
    ).collect()
    labels = {r.vec_id: r.label for r in _emb(spark).collect()}
    # bounded fan-out: at most k_pos * k_neg triplets per anchor
    per_anchor: dict[int, int] = {}
    for r in out:
        per_anchor[r.anchor_id] = per_anchor.get(r.anchor_id, 0) + 1
        assert labels[r.positive_id] == labels[r.anchor_id]
        assert labels[r.negative_id] != labels[r.anchor_id]
        assert abs(r.margin - round(r.pos_sim - r.neg_sim, 4)) < 2e-4
    assert per_anchor and all(v <= 6 for v in per_anchor.values())


def test_anchor_cap_raises_loudly(spark):
    """A non-broadcastable anchor set must die with ValueError BEFORE the
    pair stage runs (the bounded_query_pandas cap pattern) — in both
    miners — and the probe is bounded (limit(max+1)), so the cap check
    itself stays cheap on a huge anchor frame."""
    import pytest

    emb = _emb(spark)
    with pytest.raises(ValueError, match="max_anchors"):
        hard_negatives(emb, emb, k=2, max_anchors=10)
    with pytest.raises(ValueError, match="max_anchors"):
        triplet_candidates(emb, emb, max_anchors=10)
    # at or under the cap the miners run unchanged
    assert hard_negatives(emb, emb.filter("vec_id < 3"), k=1, max_anchors=3).count() == 3


def test_hard_negatives_ivf_full_probe_equals_brute(spark):
    """At nprobe == nlist every cell is probed, so the IVF miner must
    reproduce the broadcast miner EXACTLY (same candidates, same
    tie-break, same rounding) — the equivalence that makes recall at
    smaller nprobe measurable."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.negatives import (
        hard_negatives_ivf,
    )

    emb = _emb(spark)
    anchors = emb.filter("vec_id < 8")
    brute = hard_negatives(emb, anchors, k=5)
    ivf = hard_negatives_ivf(emb, anchors, k=5, nlist=8, nprobe=8)
    assert compare(ivf, brute.toPandas(), float_tol=0) == []


def test_hard_negatives_ivf_partial_probe_is_subset_ranked(spark):
    """At nprobe < nlist the candidate space shrinks: every returned
    negative must still be cross-label, ranks stay dense 1..k' per
    anchor, and no anchor returns more than k rows."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.negatives import (
        hard_negatives_ivf,
    )

    emb = _emb(spark)
    anchors = emb.filter("vec_id < 8")
    labels = {r.vec_id: r.label for r in anchors.collect()}
    out = hard_negatives_ivf(emb, anchors, k=5, nlist=8, nprobe=2).collect()
    per: dict[int, list[int]] = {}
    for r in out:
        assert r.negative_label != labels[r.anchor_id]
        per.setdefault(r.anchor_id, []).append(r.rank)
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5
