"""Quality-signal ensembling: combine heterogeneous per-document scores
into one curation ranking.

A serious curation pipeline never filters on ONE signal: the Gopher
rules (``functions/text.gopher_quality_flags``), the unigram/bigram LM
scores (``functions/text``), and the distilled classifier logit
(``functions/classifier``) each catch garbage the others miss, and their
raw scales are incomparable (rule hit-counts vs log-likelihoods vs
logits). The standard fix is RANK ensembling: replace each score by its
percent rank over the corpus, then average — scale-free, outlier-immune,
and monotone in every input signal.

Scale shape: one DISTRIBUTED global rank per signal — the
``fuzzy._global_sorted_rank`` machinery (range partition → local rank →
bounded per-partition offsets), NEVER a single-partition
``Window.orderBy`` — so k signals cost k range exchanges of the corpus,
the same profile as the curriculum-decile op. The row count for the
percent denominator is one aggregate, shared across signals; the
combination is row-local arithmetic.

Determinism/oracle: the (score, id) total order has no ties, so
``PERCENT_RANK() OVER (ORDER BY score, id)`` degenerates to
``(row_number-1)/(n-1)`` — exactly what the distributed rank computes —
and the weighted average is an explicit left-to-right double sum, so a
plain SQL twin (``ensemble_sql``) replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.operators.fuzzy import (
    _global_sorted_rank,
)


def _normalized_weights(
    score_cols: list[str], weights: list[float] | None
) -> list[float]:
    """Shared validation for the operator AND its SQL twin — the twin
    must reject exactly the inputs the operator rejects, or the
    module-owns-its-oracle discipline silently diverges on bad input."""
    if not score_cols:
        raise ValueError("ensemble needs at least one score column")
    if len(set(score_cols)) != len(score_cols):
        raise ValueError(f"duplicate score columns: {score_cols}")
    if weights is None:
        weights = [1.0] * len(score_cols)
    if len(weights) != len(score_cols):
        raise ValueError(
            f"{len(weights)} weights for {len(score_cols)} score columns"
        )
    z = float(sum(weights))
    if z <= 0:
        raise ValueError("weights must sum to a positive value")
    return [float(w) / z for w in weights]


def _check_pr_collisions(
    columns: list[str], score_cols: list[str], out_col: str
) -> None:
    """Reject inputs whose generated ``<col>_pr`` / ``out_col`` names
    collide with existing columns. The operator's ``withColumn`` would
    silently REPLACE the clashing column while the SQL twin's
    ``SELECT *, ... AS <col>_pr`` keeps both (or errors) — the one input
    class where the two engines silently desynchronize, so it must be a
    loud ValueError on the operator side."""
    taken = set(columns)
    clashes = [f"{c}_pr" for c in score_cols if f"{c}_pr" in taken]
    if out_col in taken:
        clashes.append(out_col)
    if clashes:
        raise ValueError(
            f"ensemble output columns collide with existing input "
            f"columns: {clashes} — rename the inputs or pass a different "
            "out_col"
        )


def ensemble_rank_scores(
    df: DataFrame,
    score_cols: list[str],
    id_col: str,
    weights: list[float] | None = None,
    out_col: str = "ensemble_rank",
    partitions: int = 32,
) -> DataFrame:
    """Append per-signal percent ranks (``<col>_pr``) and their weighted
    average ``out_col`` in [0, 1]; higher = better under every signal's
    "higher is better" convention (negate a signal upstream if lower is
    better).

    ``weights`` defaults to uniform; they are normalized to sum 1 so the
    output stays a [0, 1] rank regardless of the caller's scale. The row
    count feeding the percent denominator is one bounded action.

    Score columns must be NON-NULL: Spark sorts NULLs first ascending
    while SQL PERCENT_RANK defaults NULLS LAST, so a NULL score would
    silently land at opposite ends of the two engines' rankings —
    ``F.coalesce`` a left-joined signal to its worst value upstream.
    """
    norm = _normalized_weights(score_cols, weights)
    _check_pr_collisions(df.columns, score_cols, out_col)
    denom = max(df.count() - 1, 1)
    out = df
    for c in score_cols:
        out = (
            # every rank in the chain KEEPS the output materialization
            # (materialize=True): the r16 pass tried dropping it for the
            # intermediate signals ("consumed once by the next rank") and
            # measured mixture_curation_budget consistently ~10% slower —
            # the next call's repartitionByRange evaluates its child
            # TWICE (range-boundary sampling pass + shuffle pass), so an
            # unmaterialized intermediate recomputes its whole rank
            # window for the sampler. Single-pass means single
            # EVALUATION, which only a plain downstream consumer gives.
            _global_sorted_rank(out, [c, id_col], partitions, out_col="__r")
            .withColumn(f"{c}_pr", F.col("__r") / F.lit(denom))
            .drop("__r")
        )
    combined = F.lit(0.0)
    for c, wt in zip(score_cols, norm):
        combined = combined + F.col(f"{c}_pr") * F.lit(wt)
    return out.withColumn(out_col, combined)


def ensemble_sql(
    source_cte: str,
    score_cols: list[str],
    id_col: str,
    weights: list[float] | None = None,
    out_col: str = "ensemble_rank",
) -> str:
    """The ANSI-SQL twin of ``ensemble_rank_scores`` over a relation
    defined by ``source_cte`` — same no-ties ranks, same left-to-right
    weighted sum, and the SAME input validation (the
    module-owns-its-oracle discipline: the twin must reject what the
    operator rejects)."""
    norm = _normalized_weights(score_cols, weights)
    prs = ", ".join(
        f"PERCENT_RANK() OVER (ORDER BY {c} ASC, {id_col} ASC) AS {c}_pr"
        for c in score_cols
    )
    comb = "0.0"
    for c, wt in zip(score_cols, norm):
        comb = f"({comb} + {c}_pr * {wt!r})"
    return (
        f"WITH src AS ({source_cte}), "
        f"ranked AS (SELECT *, {prs} FROM src) "
        f"SELECT *, {comb} AS {out_col} FROM ranked"
    )
