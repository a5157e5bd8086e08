"""Window-function operators for gold/BI KPIs (SURVEY.md §2.5 W1-W3).

All built-in window expressions — one shuffle on the partition key, then
in-partition sort; no UDFs. ``top_k_per_group`` uses ``row_number`` (ties
broken deterministically by the tiebreak columns) so results are
oracle-hashable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[str],
    k: int,
    descending: bool = True,
    tiebreak: Sequence[str] = (),
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per group (W3) with a deterministic rank column."""
    ordering: list[Column] = [
        F.col(c).desc_nulls_last() if descending else F.col(c).asc_nulls_last()
        for c in order_by
    ]
    ordering += [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*group_by).orderBy(*ordering)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def lag_lead(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    col: str,
    lag_col: str = "prev_value",
    lead_col: str = "next_value",
) -> DataFrame:
    """Previous/next value per partition (W2 lag/lead analytics).

    One shuffle on the partition key; order_by must be a total order within
    the partition for deterministic (oracle-hashable) output.
    """
    w = Window.partitionBy(*partition_by).orderBy(*[F.col(c).asc() for c in order_by])
    return df.withColumn(lag_col, F.lag(col).over(w)).withColumn(
        lead_col, F.lead(col).over(w)
    )


def ntile_bucket(
    df: DataFrame,
    order_by: Sequence[Column],
    n: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Equal-count quantile buckets via a global NTILE (W2).

    A global ORDER BY window runs on ONE partition — fine for the
    post-aggregate cardinalities it is meant for (per-customer rollups,
    i.e. rows = |keys|, not |fact|). For bucketing a raw 100 TB fact use
    approx percentile thresholds + width_bucket instead of a total sort.
    """
    w = Window.orderBy(*order_by)
    return df.withColumn(bucket_col, F.ntile(n).over(w))


def running_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    agg_col: str,
    out_col: str = "running_sum",
    func: str = "sum",
) -> DataFrame:
    """Running aggregate per partition (W2): rowsBetween(unbounded, current).

    Uses rowsBetween (not the rangeBetween default) so duplicate order keys
    accumulate row-at-a-time — deterministic given a total order.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*[F.col(c).asc() for c in order_by])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fn = getattr(F, func)
    return df.withColumn(out_col, fn(F.col(agg_col)).over(w))


def rank_distribution(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: str,
    keys: Sequence[str],
) -> DataFrame:
    """percent_rank + cume_dist of ``order_by`` within each partition
    (W2 analytic surface): where does each row sit in its group's
    distribution? One shuffle on the partition keys; the in-partition sort
    is local. ``keys`` are the identifying columns carried through.
    """
    w = Window.partitionBy(*partition_by).orderBy(F.col(order_by).asc())
    return df.select(
        *keys,
        *partition_by,
        F.col(order_by),
        # UNROUNDED: (rank-1)/(n-1) and rank/n are single IEEE divisions
        # of exact integers — bit-identical in every engine, while
        # ROUND(q, 6) splits on dyadic quotients whose shortest repr ends
        # in 5 at the 7th digit (e.g. n-1 = 128) — the r12 sweep
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
    )


def rolling_range_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    ts_col: str,
    value_col: str,
    days: int | None = None,
    keys: Sequence[str] = (),
    out_prefix: str = "rolling",
    seconds: int | None = None,
) -> DataFrame:
    """Time-RANGE window frame (W2 completion): per-key aggregates over
    the trailing ``days``-day interval of EVENT TIME — `RANGE BETWEEN
    INTERVAL n DAYS PRECEDING AND CURRENT ROW`, not a row-count frame
    (two orders on the same key and day see the same trailing revenue
    regardless of row order; a rows-frame would not).

    Implementation: ``rangeBetween`` over epoch seconds — Spark's RANGE
    frames take numeric bounds, so the timestamp is projected to
    ``unix_timestamp`` once and the frame is ``[-days*86400, 0]``
    seconds, which is exactly the SQL interval frame on second-precision
    data. One shuffle on the partition key; the frame scan is a local
    per-partition sliding aggregate (Spark keeps a running frame, not a
    per-row rescan)."""
    if (days is None) == (seconds is None):
        raise ValueError("pass exactly one of days / seconds")
    span = seconds if seconds is not None else days * 86400
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(epoch)
        .rangeBetween(-span, 0)
    )
    return df.select(
        *keys,
        *partition_by,
        F.col(ts_col),
        F.col(value_col),
        F.count(F.lit(1)).over(w).alias(f"{out_prefix}_n"),
        F.sum(value_col).over(w).alias(f"{out_prefix}_sum"),
    )
