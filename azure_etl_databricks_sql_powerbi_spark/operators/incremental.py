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
