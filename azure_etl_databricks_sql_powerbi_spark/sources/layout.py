"""Z-order (Morton-curve) multi-dimensional file layout.

The scale problem: a 100 TB table range-partitioned on ONE column prunes
scans filtered on that column only; filters on a second dimension read
everything. Interleaving the bits of several dimensions into one Morton
key and range-writing on it gives every file a small bounding box in ALL
interleaved dimensions, so min/max file statistics prune scans on any of
them (the layout behind Delta Lake's ``OPTIMIZE ZORDER BY`` and
Databricks' liquid clustering; Morton 1966).

Everything here is pure Catalyst ``Column`` arithmetic — normalization is
one bounded 1-row min/max aggregate broadcast back, rank + interleave are
shift/mask expressions — so the key computation is exact, codegen'd, and
reproducible bit-for-bit in any engine (the DuckDB oracle for
``zorder_layout_stats`` runs the same arithmetic).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_rank(c: Column | str, bits: int, mn: Column, mx: Column) -> Column:
    """Rank a value into ``[0, 2**bits)`` by min-max scaling:
    ``floor((x - mn) * (2**bits - 1) / (mx - mn))`` with the degenerate
    all-equal column ranking 0. One IEEE double division + floor —
    identical in any engine; NULLs rank 0 (sort first, like NULLS FIRST).
    """
    c = F.col(c) if isinstance(c, str) else c
    top = F.lit(float(2**bits - 1))
    span = (mx - mn).cast("double")
    rank = F.floor((c - mn).cast("double") * top / span).cast("long")
    return F.coalesce(
        F.when(span > 0, rank).otherwise(F.lit(0)), F.lit(0)
    )


def interleave_bits(ranks: list[Column], bits: int) -> Column:
    """Morton-interleave ``len(ranks)`` rank columns of ``bits`` bits
    each: output bit ``i * n + d`` is bit ``i`` of dimension ``d``. Pure
    shift/mask/sum arithmetic (no UDF): ``sum_d sum_i
    ((rank_d >> i) & 1) << (i*n + d)``."""
    n = len(ranks)
    terms: list[Column] = []
    for d, r in enumerate(ranks):
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(r, i).bitwiseAND(F.lit(1)), i * n + d)
            )
    return reduce(lambda a, b: a + b, terms).cast("long")


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8, out_col: str = "z_key"
) -> DataFrame:
    """Append the Morton key of ``cols`` (numeric/date/timestamp) as
    ``out_col``. The per-column min/max come from ONE 1-row aggregate
    joined back by broadcast — a metadata-scale action at any corpus
    size (same bounded-agg contract as operators/qc.py)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__mn_{c}"))
        aggs.append(F.max(c).alias(f"__mx_{c}"))
    stats = df.agg(*aggs)
    with_stats = df.crossJoin(F.broadcast(stats))
    ranks = [
        minmax_rank(c, bits, F.col(f"__mn_{c}"), F.col(f"__mx_{c}")) for c in cols
    ]
    return with_stats.withColumn(out_col, interleave_bits(ranks, bits)).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 32,
    fmt: str = "parquet",
) -> None:
    """Cluster ``df`` on the Morton curve of ``cols`` and write:
    ``repartitionByRange(n_files, z_key)`` (one range shuffle — contiguous
    curve segments per file) + ``sortWithinPartitions`` (clusters pages
    inside each file so parquet column-index stats prune at page level
    too), then drop the helper key. Min/max file stats on every
    interleaved column are tight boxes -> multi-dimensional scan pruning."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "z_key")
        .sortWithinPartitions("z_key")
        .drop("z_key")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )
