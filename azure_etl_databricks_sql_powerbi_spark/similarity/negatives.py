"""Hard-negative mining for contrastive / retrieval training data.

Given anchor vectors and a labeled corpus, the standard recipe for
training embedding models (in-batch negatives are too easy) is: for each
anchor, the top-k most-similar corpus vectors whose label DIFFERS — the
"hard" negatives that sit near the decision boundary. Reference parity:
the reference engine has no similarity tier at all; this extends the
brute-force baseline (``bruteforce.cosine_topk``) with the cross-label
constraint, keeping the same plan shape and determinism contract.

Scale shape: identical to the brute baseline — the (small) anchor set
broadcasts, the 100 TB corpus streams through executors ONCE with no
shuffle on the pair stage; the only exchange is the per-anchor top-k
window. The label-mismatch predicate lands inside the same codegen stage
as the cosine fold, so mismatched pairs are dropped before ranking. For
anchor sets too big to broadcast, mine per-shard: the IVF route
(``similarity/ivf.py``) bounds candidates first and this ranking applies
unchanged to its candidate set.

Determinism/oracle: cosine is the shared JVM fold (``functions.vectors``),
ties break on neighbor id, the threshold (if any) applies to the
UNROUNDED score (the ``cosine_near_pairs`` discipline), rounding is
display-only — so a plain SQL twin (list_dot_product in DuckDB) is
hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.vectors import cosine
from azure_etl_databricks_sql_powerbi_spark.util import spread


def _require_broadcastable_anchors(anchors: DataFrame, max_anchors: int) -> None:
    """LOUD driver-side bound on the anchor set — delegates to the shared
    ``util.require_broadcastable`` (bounded limit(cap+1) probe, ValueError
    past the cap, never a silent truncation)."""
    from azure_etl_databricks_sql_powerbi_spark.util import require_broadcastable

    require_broadcastable(
        anchors,
        max_anchors,
        "max_anchors",
        "anchor set",
        "mine per-shard or route through the IVF candidate bound "
        "(similarity/ivf.py)",
    )


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    min_sim: float | None = None,
    max_anchors: int = 100_000,
) -> DataFrame:
    """(anchor_id, rank, negative_id, negative_label, cosine_sim) —
    the k corpus vectors most similar to each anchor among those with a
    DIFFERENT label.

    ``min_sim`` optionally drops easy negatives below a similarity floor
    (applied to the unrounded cosine, so an SQL ``cos >= t`` twin agrees
    bit-for-bit). Ties break on negative_id. NULL labels never satisfy
    the inequality (standard SQL three-valued logic) — unlabeled rows on
    either side are silently excluded; label them (e.g. via
    ``similarity/kmeans`` cluster ids) before mining.

    ``max_anchors`` bounds the broadcast side with a loud ValueError
    (never a silent truncation) — see ``_require_broadcastable_anchors``.
    """
    _require_broadcastable_anchors(anchors, max_anchors)
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("a_vec"),
        F.col(label_col).alias("a_label"),
    )
    c = spread(corpus).select(
        F.col(id_col).alias("negative_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(label_col).alias("negative_label"),
    )
    pairs = c.join(
        F.broadcast(a), F.col("negative_label") != F.col("a_label")
    )
    scored = pairs.select(
        "anchor_id",
        "negative_id",
        "negative_label",
        cosine("a_vec", "c_vec").alias("__cos"),
    )
    if min_sim is not None:
        scored = scored.filter(F.col("__cos") >= min_sim)
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("__cos").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "anchor_id",
            "rank",
            "negative_id",
            "negative_label",
            F.col("__cos").alias("cosine_sim"),
        )
    )


def triplet_candidates(
    corpus: DataFrame,
    anchors: DataFrame,
    k_pos: int = 1,
    k_neg: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_anchors: int = 100_000,
) -> DataFrame:
    """(anchor_id, positive_id, negative_id, pos_sim, neg_sim, margin) —
    anchor/positive/negative training triplets: the top ``k_pos``
    SAME-label neighbors crossed with the top ``k_neg`` cross-label hard
    negatives. ``margin = pos_sim - neg_sim``; small or negative margins
    are the triplets a contrastive loss learns most from.

    One corpus pass produces both sides (the broadcast-anchor scoring is
    shared); the positive×negative cross is per-anchor k_pos*k_neg rows —
    bounded fan-out, never a corpus-sized join. ``max_anchors`` bounds
    the broadcast side with a loud ValueError.
    """
    _require_broadcastable_anchors(anchors, max_anchors)
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("a_vec"),
        F.col(label_col).alias("a_label"),
    )
    c = spread(corpus).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(label_col).alias("cand_label"),
    )
    scored = (
        c.join(F.broadcast(a), F.col("cand_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "cand_id",
            (F.col("cand_label") == F.col("a_label")).alias("same"),
            cosine("a_vec", "c_vec").alias("__cos"),
        )
    )
    w = Window.partitionBy("anchor_id", "same").orderBy(
        F.col("__cos").desc(), F.col("cand_id").asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    pos = ranked.filter(F.col("same") & (F.col("rank") <= k_pos)).select(
        "anchor_id",
        F.col("cand_id").alias("positive_id"),
        F.col("__cos").alias("__pos_cos"),
    )
    neg = ranked.filter(~F.col("same") & (F.col("rank") <= k_neg)).select(
        "anchor_id",
        F.col("cand_id").alias("negative_id"),
        F.col("__cos").alias("__neg_cos"),
    )
    return pos.join(neg, "anchor_id").select(
        "anchor_id",
        "positive_id",
        "negative_id",
        F.col("__pos_cos").alias("pos_sim"),
        F.col("__neg_cos").alias("neg_sim"),
        (F.col("__pos_cos") - F.col("__neg_cos")).alias("margin"),
    )


def hard_negatives_ivf(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    nlist: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    seed: int = 42,
    min_sim: float | None = None,
) -> DataFrame:
    """``hard_negatives`` for anchor sets too big to broadcast: IVF cells
    bound the candidate space first (the ``ivf_cosine_topk`` recipe), so
    the anchor-corpus pairing becomes a plain shuffle EQUI-join on the
    cell id — no broadcast anywhere, hence no ``max_anchors`` cap. Each
    anchor probes its ``nprobe`` nearest cells and is exactly re-ranked
    against the cross-label vectors inside them; cost scales with
    corpus/nlist * nprobe per anchor instead of the full corpus.

    Approximate by construction (a hard negative outside the probed
    cells is missed — the standard IVF recall trade); at
    ``nprobe == nlist`` every cell is probed and the output is IDENTICAL
    to ``hard_negatives`` (pinned by test), which makes recall directly
    measurable at any smaller nprobe. Same output schema, tie-break, and
    unrounded ``min_sim`` contract as the broadcast miner.
    """
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import (
        assign_cells,
        train_centroids,
    )

    cents = train_centroids(
        corpus, vec_col, id_col, nlist=nlist, sample_size=sample_size, seed=seed
    )
    c = assign_cells(
        spread(corpus).select(
            F.col(id_col).alias("negative_id"),
            F.col(vec_col).alias("c_vec"),
            F.col(label_col).alias("negative_label"),
        ),
        cents,
        "c_vec",
        nprobe=1,
    )
    a = assign_cells(
        spread(anchors).select(
            F.col(id_col).alias("anchor_id"),
            F.col(vec_col).alias("a_vec"),
            F.col(label_col).alias("a_label"),
        ),
        cents,
        "a_vec",
        nprobe=nprobe,
    )
    # shuffle equi-join on cell; nprobe > 1 can pair the same (anchor,
    # negative) through several probed cells — dedup before ranking
    cands = (
        c.join(a, "cell")
        .filter(F.col("negative_label") != F.col("a_label"))
        .dropDuplicates(["anchor_id", "negative_id"])
    )
    scored = cands.select(
        "anchor_id",
        "negative_id",
        "negative_label",
        cosine("a_vec", "c_vec").alias("__cos"),
    )
    if min_sim is not None:
        scored = scored.filter(F.col("__cos") >= min_sim)
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("__cos").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "anchor_id",
            "rank",
            "negative_id",
            "negative_label",
            F.col("__cos").alias("cosine_sim"),
        )
    )
