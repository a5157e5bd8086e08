"""Small engine-wide helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Ensure at least ``target`` (default: cluster parallelism) partitions
    before compute-heavy per-row work.

    A small parquet file arrives as ONE partition (files split on row-group
    boundaries only), so an expensive projection after it would run on one
    core. The round-robin repartition shuffles the raw rows once — cheap
    for exactly the inputs that have too few partitions. At 100 TB inputs
    already carry thousands of partitions and this is a no-op (the guard
    avoids an extra full-data shuffle there).
    """
    target = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
