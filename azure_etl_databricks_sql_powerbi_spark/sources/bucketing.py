"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the recurring fact⋈fact join (orders ⋈ lineitem, events ⋈
sessions) dominates shuffle cost. Writing both sides bucketed on the join
key (``bucketBy(n, key).sortBy(key)``) lets Catalyst plan a sort-merge
join with NO Exchange on either side: each task reads matching buckets
directly. That trades a one-time bucketed write for every subsequent
join/aggregate on the key being shuffle-free — the standard warehouse
layout decision, and the engine-level answer to "pre-partition for
co-located joins" (SURVEY §2.3/J2, §7 phase 6).

Local note: bucketed tables must go through ``saveAsTable`` (the metastore
records bucket spec); plain ``.parquet(path)`` writes lose it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> tuple[DataFrame, bool]:
    """Join two bucketed tables and report whether the physical plan is
    Exchange-free (used by tests; also a handy production sanity probe —
    a silently mis-bucketed table reintroduces a 100 TB shuffle)."""
    joined = spark.table(left_table).join(spark.table(right_table), on=on)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return joined, "Exchange" not in plan
