"""Skew mitigation for joins and aggregates — the manual tools for when
AQE's runtime skew-join splitting isn't enough (e.g. one key holding 10%
of 100 TB, or a deliberately partitioned write).

- ``salted_join``: the classic hot-key fix. The skewed (big) side gets a
  salt in [0, n); the small side is exploded n× carrying every salt; the
  join key becomes (key, salt), splitting each hot key's rows across n
  tasks. Exact same rows out as the plain join — n× replication of the
  SMALL side is the price.
- ``two_phase_distinct``: count-distinct under skew: first dedup on
  (key, value) — the shuffle that spreads hot keys across partitions by
  value — then count per key. Spark's partial aggregation handles plain
  counts/sums already; distinct is the one that needs the two-step.

Salts are derived from ``xxhash64`` of a stable column (or the whole row),
NOT ``rand()``: deterministic under task retry/speculation, which matters
for exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, n: int, salt_on: str | None, seed: int) -> Column:
    src = F.col(salt_on) if salt_on else F.concat_ws("\x00", *df.columns)
    return F.pmod(F.xxhash64(src.cast("string"), F.lit(seed)), F.lit(n)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_on: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """``big ⋈ small`` on ``keys`` with hot-key splitting.

    Result is row-identical to ``big.join(small, keys, how)``; only the
    physical key distribution changes. ``how`` supports inner/left (the
    shapes where `big` drives the result).
    """
    assert how in ("inner", "left"), "salted_join supports inner/left"
    b = big.withColumn("__salt", _salt_col(big, n_salts, salt_on, seed))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return b.join(s, on=[*keys, "__salt"], how=how).drop("__salt")


def two_phase_distinct(
    df: DataFrame, keys: list[str], value: str, out_col: str = "n_distinct"
) -> DataFrame:
    """COUNT(DISTINCT value) GROUP BY keys, skew-robust: phase 1 shuffles
    on (keys, value) so a hot key's values spread over all partitions;
    phase 2 counts the already-distinct rows per key (map-side combinable).
    """
    return (
        df.select(*keys, value)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
