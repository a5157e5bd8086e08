"""Snapshot reconciliation — keyed table diff (added / removed / changed).

The reference pipeline re-extracts a rolling window every day and MERGEs
it over the warehouse (run_load.py:75-90); the question its operators
never answer is "what did that day's load actually change?". ``table_diff``
computes it as one full-outer join on the business key comparing a
row-content digest:

- digest = ``md5(concat_ws(sep, normalized cols))`` — md5 is available
  and byte-identical in Spark and DuckDB, which is what makes the diff
  oracle-checkable cross-engine (xxhash64 is Spark-only). Values are
  normalized to strings with explicit NULL sentinels so (NULL, 'x')
  never collides with ('x', NULL) and column order is pinned.
- one shuffle on the key for the join; the digest is computed map-side,
  so at 100 TB the shuffle carries (key, 32-byte digest), never the row
  payload. With both snapshots bucketed by key the join co-locates and
  the diff is shuffle-free.

Output: (key cols, change) with change in {'added','removed','changed'};
unchanged rows are dropped (the overwhelmingly common case carries no
information and would dominate the output at scale).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "\x00NULL\x00"
SEP = "\x01"


def row_digest(df: DataFrame, keys: Sequence[str]) -> Column:
    """md5 digest over every non-key column (sorted by name for a
    deterministic, schema-drift-stable order), NULLs sentineled."""
    cols = sorted(c for c in df.columns if c not in set(keys))
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL)) for c in cols
    ]
    return F.md5(F.concat_ws(SEP, *parts))


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Keyed diff of two snapshots. Returns (keys..., change) for every
    key whose presence or content differs; content equality is digest
    equality over the sorted non-key columns (both frames must share
    them — enforce upstream with the schema-drift guard if needed)."""
    keys = list(keys)
    o = old.select(*keys, row_digest(old, keys).alias("__old_digest"))
    n = new.select(*keys, row_digest(new, keys).alias("__new_digest"))
    joined = o.join(n, on=keys, how="full_outer")
    return joined.select(
        *keys,
        F.when(F.col("__old_digest").isNull(), F.lit("added"))
        .when(F.col("__new_digest").isNull(), F.lit("removed"))
        .when(F.col("__old_digest") != F.col("__new_digest"), F.lit("changed"))
        .alias("change"),
    ).filter(F.col("change").isNotNull())


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """One row per change kind with its count — the QC-gate form (pair
    with operators/qc.py thresholds to fail a load that changed too
    much)."""
    return (
        table_diff(old, new, keys)
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("change")
    )
