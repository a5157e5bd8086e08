"""Incremental / watermark semantics.

The reference's incremental extraction is a poor-man's watermark: re-extract
everything with ``updated_since = today - N days`` (``rest_api.py:20-26,
70-72``; ``endpoints.yml: from_days_ago: 7``) and rely on key-dedup + keyed
upsert to make reprocessing idempotent. In-engine that is a plain filter —
which Catalyst pushes down to the parquet scan (PushedFilters), so at 100 TB
the overlap window reads only the matching row groups / partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def watermark_filter(
    df: DataFrame,
    ts_col: str,
    days_ago: int | None = None,
    since: str | Column | None = None,
) -> DataFrame:
    """Rows with ``ts_col`` at/after the watermark.

    ``days_ago`` mirrors the reference's ``from_days_ago`` (relative to the
    current date — nondeterministic, production mode); ``since`` takes an
    explicit timestamp/date literal for deterministic, oracle-hashable runs.
    """
    if (days_ago is None) == (since is None):
        raise ValueError("pass exactly one of days_ago / since")
    if days_ago is not None:
        cutoff = F.date_sub(F.current_date(), days_ago).cast("timestamp")
    else:
        cutoff = F.lit(since).cast("timestamp") if isinstance(since, str) else since
    return df.filter(F.col(ts_col) >= cutoff)


def relative_watermark(df: DataFrame, ts_col: str, days: int) -> DataFrame:
    """Overlap window relative to the data's own max timestamp.

    Deterministic variant used in tests/oracle: cutoff = max(ts) - N days,
    computed as a scalar subquery-ish cross join of a 1-row aggregate —
    Spark broadcasts the single row; there is no full-data shuffle.
    """
    bound = df.agg(
        F.date_sub(F.max(ts_col).cast("date"), days).cast("timestamp").alias("__cutoff")
    )
    return (
        df.crossJoin(F.broadcast(bound))
        .filter(F.col(ts_col) >= F.col("__cutoff"))
        .drop("__cutoff")
    )


def aggregate_state(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, Column | str],
) -> DataFrame:
    """Per-key ALGEBRAIC aggregate partials — the mergeable state of an
    incrementally-maintained rollup: ``n_rows`` plus ``<m>_sum`` /
    ``<m>_min`` / ``<m>_max`` per measure. COUNT/SUM/MIN/MAX are the
    classic merge-safe (commutative-monoid) aggregates; AVG is derived
    at ``finalize_state``. Persist this state once per day with
    ``df.write.parquet`` and tomorrow's refresh touches only the new
    batch — the 100 TB point is that history is NEVER re-scanned, the
    same shape as ``dedup/incremental``'s persisted corpus state.

    Sums accumulate in whatever type the caller passes — cast money
    measures to DecimalType for cross-engine-exact totals (the round-4
    half-cent lesson)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for name, c in measures.items():
        c = F.col(c) if isinstance(c, str) else c
        aggs.append(F.sum(c).alias(f"{name}_sum"))
        aggs.append(F.min(c).alias(f"{name}_min"))
        aggs.append(F.max(c).alias(f"{name}_max"))
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregate_states(
    states: list[DataFrame], keys: list[str], measure_names: list[str]
) -> DataFrame:
    """Merge any number of aggregate-state frames into one: counts and
    sums add, mins min, maxes max — one union + one keyed shuffle whose
    input is STATE-sized (distinct keys per state), not data-sized."""
    from functools import reduce

    unioned = reduce(lambda a, b: a.unionByName(b), states)
    aggs = [F.sum("n_rows").cast("long").alias("n_rows")]
    for m in measure_names:
        aggs.append(F.sum(f"{m}_sum").alias(f"{m}_sum"))
        aggs.append(F.min(f"{m}_min").alias(f"{m}_min"))
        aggs.append(F.max(f"{m}_max").alias(f"{m}_max"))
    return unioned.groupBy(*keys).agg(*aggs)


def finalize_state(state: DataFrame, measure_names: list[str]) -> DataFrame:
    """Derive the non-mergeable outputs from merged partials: per
    measure, ``<m>_avg`` = exact-sum cast to double, divided by count —
    ONE raw IEEE division (never accumulate doubles, never round a
    computed float — the hash-exactness contract)."""
    out = state
    for m in measure_names:
        out = out.withColumn(
            f"{m}_avg",
            F.col(f"{m}_sum").cast("double") / F.col("n_rows"),
        )
    return out


def distinct_state(
    df: DataFrame,
    keys: list[str],
    cols: list[str],
    lg_k: int = 12,
) -> DataFrame:
    """Per-key MERGEABLE distinct-count state — the DISTINCT companion to
    ``aggregate_state`` (COUNT/SUM/MIN/MAX merge trivially; COUNT
    DISTINCT does not). Each tracked column becomes an Apache
    DataSketches HLL sketch (``hll_sketch_agg``, binary, ~2^lg_k bytes
    cap) that unions losslessly across batches: persist today's sketches,
    union tomorrow's — history is never re-scanned, and the state row is
    KBs per (key, col) regardless of data volume. Sketches are
    deterministic for a given input SET, so merge-of-parts equals
    whole-corpus exactly (unit-tested), while the estimate carries the
    usual ~1.6%/sqrt(2^lg_k) HLL error vs true distinct."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs.append(F.hll_sketch_agg(F.col(c), F.lit(lg_k)).alias(f"{c}_hll"))
    return df.groupBy(*keys).agg(*aggs)


def merge_distinct_states(
    states: list[DataFrame], keys: list[str], cols: list[str]
) -> DataFrame:
    """Union distinct-count states: counts add, sketches HLL-union —
    state-sized shuffle, lossless with respect to the final estimate."""
    from functools import reduce

    unioned = reduce(lambda a, b: a.unionByName(b), states)
    aggs = [F.sum("n_rows").cast("long").alias("n_rows")]
    for c in cols:
        aggs.append(F.hll_union_agg(F.col(f"{c}_hll")).alias(f"{c}_hll"))
    return unioned.groupBy(*keys).agg(*aggs)


def finalize_distinct(state: DataFrame, cols: list[str]) -> DataFrame:
    """Resolve sketches to estimates: ``<col>_distinct_est`` (long)."""
    out = state
    for c in cols:
        out = out.withColumn(
            f"{c}_distinct_est",
            F.hll_sketch_estimate(F.col(f"{c}_hll")).cast("long"),
        ).drop(f"{c}_hll")
    return out
