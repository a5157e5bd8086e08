"""Domain/source mixing for training-data assembly.

When a corpus is assembled from many sources ("domains"), the training
recipe needs per-domain token budgets: proportional to availability but
capped so no single domain dominates (the standard web-scale mixing rule).
This operator computes, per domain: inventory, natural share, and the
capped token allocation — the driver table a sampler
(``sampling.quota_sample_per_group``) then consumes.

Scale shape: one hash-aggregate over the corpus (map-side combine on the
domain key), then a one-row global total joined back as a broadcast scalar
— the allow-listed scalar-subquery pattern. The 100 TB side is scanned
once; everything after the aggregate is #domains rows.

Oracle determinism: token totals are exact longs; ``share`` is a raw
long/long IEEE division (bit-identical in any engine, never rounded);
the cap is ``floor(cap_frac * total)`` — a double product and floor, both
exactly defined — compared and min'd in long space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def domain_mix_allocation(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    cap_frac: float = 0.2,
) -> DataFrame:
    """Per-domain token budget: ``min(inventory, floor(cap_frac * total))``.

    Returns one row per domain:
    ``domain, doc_count, token_count, share, alloc_tokens, capped``
    where ``share = token_count / total`` (raw double) and ``capped = 1``
    iff the cap bound the allocation.
    """
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.sum(token_col).cast("long").alias("token_count"),
    )
    total = per.agg(F.sum("token_count").alias("__total"))
    cap = F.floor(F.lit(cap_frac) * F.col("__total")).cast("long")
    return (
        per.join(F.broadcast(total))
        .select(
            "domain",
            "doc_count",
            "token_count",
            (F.col("token_count") / F.col("__total")).alias("share"),
            F.least(F.col("token_count"), cap).alias("alloc_tokens"),
            (F.col("token_count") > cap).cast("int").alias("capped"),
        )
        .orderBy("domain")
    )


def temperature_mix_allocation(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    budget_tokens: int,
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-based domain mixing (the multilingual-pretraining
    rule, e.g. XLM's q_i ∝ p_i^α): sampling weight ``q = p^α / Σ p^α``
    over natural shares ``p``, so α=1 reproduces natural proportions,
    α→0 approaches uniform, and the usual α≈0.2-0.5 UP-weights
    low-resource domains without letting any head domain dominate —
    the smooth alternative to ``domain_mix_allocation``'s hard cap.

    Returns per domain: ``domain, token_count, natural_share, q,
    alloc_tokens, oversubscribed`` where ``alloc_tokens =
    min(inventory, floor(budget * q))`` and ``oversubscribed = 1`` iff
    the domain's inventory could not fill its temperature quota (its
    surplus is NOT silently re-spread — re-run with the residual budget
    if full utilization matters; silent redistribution would break the
    q-proportionality contract).

    Same scale shape as the capped variant: one corpus aggregate, then
    #domains-row arithmetic with a broadcast 1-row total."""
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.sum(token_col).cast("long").alias("token_count"),
    )
    total = per.agg(F.sum("token_count").alias("__total"))
    p = F.col("token_count") / F.col("__total")
    powered = per.join(F.broadcast(total)).withColumn(
        "__pa", F.pow(p, F.lit(float(alpha)))
    )
    z = powered.agg(F.sum("__pa").alias("__z"))
    q = F.col("__pa") / F.col("__z")
    return (
        powered.join(F.broadcast(z))
        .select(
            "domain",
            "token_count",
            (F.col("token_count") / F.col("__total")).alias("natural_share"),
            q.alias("q"),
            F.least(
                F.col("token_count"),
                F.floor(F.lit(int(budget_tokens)) * q).cast("long"),
            ).alias("alloc_tokens"),
            (F.floor(F.lit(int(budget_tokens)) * q) > F.col("token_count"))
            .cast("int")
            .alias("oversubscribed"),
        )
        .orderBy("domain")
    )


def sample_to_token_budget(
    df: DataFrame,
    allocation: DataFrame,
    domain_col: str,
    token_col: str,
    id_col: str,
    salt: str = "",
    require_full_coverage: bool = True,
) -> DataFrame:
    """MATERIALIZE a mixing allocation: per domain, keep documents in
    deterministic hash-priority order until the domain's ``alloc_tokens``
    budget is filled — the step that turns ``domain_mix_allocation`` /
    ``temperature_mix_allocation`` (driver-sized tables of per-domain
    budgets) into the actual training corpus.

    A document is kept iff it STARTS inside the budget (its cumulative
    token count before it is < alloc_tokens) — the same
    straddle-the-boundary convention as ``sampling.pack_sequences``, so
    the realized token count can overshoot by at most one document. The
    priority order is the md5-prefix integer of
    ``sampling.hash_bucket`` (portable: any engine with md5 — including
    the DuckDB oracle — replays it bit-for-bit; xxhash64 would not be)
    with id tiebreak: a pure function of the data, so re-runs and the
    SQL twin select the identical subset; changing ``salt`` redraws.

    Scale shape: the allocation table is #domains rows and broadcasts;
    the only shuffle is the per-domain cumsum window — one Exchange on
    the domain key, the same shape a groupBy would pay. Skew note: a
    single giant domain serializes its own cumsum; at that point the
    domain IS the corpus and the budget cut is better expressed as a
    global sample.

    Documents join the allocation on the domain key INNER, so a domain
    with no allocation row contributes nothing — with a stale or
    hand-filtered allocation that is silent data loss for exactly the
    function whose contract is "materialize the allocation". By default
    (``require_full_coverage=True``) the corpus's domain inventory is
    checked against the allocation first (one distinct over the domain
    key — trivial next to the cumsum shuffle) and a missing domain
    raises; pass ``False`` only when sampling a deliberate domain
    subset.

    Returns the kept rows of ``df`` plus ``cum_tokens_before`` (exact
    long), for audit.
    """
    from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (
        hash_bucket,
    )

    if require_full_coverage:
        missing = [
            r[0]
            for r in df.select(F.col(domain_col))
            .distinct()
            .join(
                F.broadcast(allocation.select(F.col("domain").alias(domain_col))),
                domain_col,
                "left_anti",
            )
            .limit(20)
            .collect()
        ]
        if missing:
            raise ValueError(
                f"sample_to_token_budget: corpus domains with no allocation "
                f"row (first {len(missing)}): {missing} — recompute the "
                "allocation on the current corpus, or pass "
                "require_full_coverage=False to sample a domain subset"
            )

    pri = hash_bucket(id_col, 1 << 32, salt)
    w = (
        Window.partitionBy(domain_col)
        .orderBy(pri.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("long")
    alloc = allocation.select(
        F.col("domain").alias(domain_col), F.col("alloc_tokens")
    )
    return (
        df.join(F.broadcast(alloc), domain_col)
        .withColumn("cum_tokens_before", cum_before)
        .filter(F.col("cum_tokens_before") < F.col("alloc_tokens"))
        .drop("alloc_tokens")
    )
