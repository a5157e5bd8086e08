"""Small engine-wide helpers."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Catalyst reports this sentinel (spark.sql.defaultSizeInBytes = Long.Max)
# when a relation has no size estimate (e.g. RDD-backed frames).
_UNKNOWN_SIZE = 1 << 62


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Ensure at least ``target`` (default: cluster parallelism) partitions
    before compute-heavy per-row work.

    A small parquet file arrives as ONE partition (files split on row-group
    boundaries only), so an expensive projection after it would run on one
    core. The round-robin repartition shuffles the raw rows once — cheap
    for exactly the inputs that have too few partitions. At 100 TB inputs
    already carry thousands of partitions and this is a no-op (the guard
    avoids an extra full-data shuffle there).

    The partition-count check uses Catalyst's LOGICAL size estimate
    (``optimizedPlan().stats()``) against ``spark.sql.files.maxPartitionBytes``
    — the same arithmetic the scan planner uses — so deciding costs one
    logical optimization pass and never builds physical plans or RDD
    lineage. Only frames with no size estimate (RDD-backed, never the
    parquet scale path) fall back to the RDD partition probe.
    """
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        size = _UNKNOWN_SIZE
    if size < _UNKNOWN_SIZE:
        try:  # resolved long, whatever unit string the conf was set with
            max_part = int(spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes())
        except Exception:
            max_part = 128 * 1024 * 1024
        est_partitions = max(1, -(-size // max_part))
        return df.repartition(target) if est_partitions < target else df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def require_broadcastable(
    df: DataFrame, cap: int, cap_name: str, role: str, remedy: str
) -> None:
    """LOUD driver-side bound on a frame about to be broadcast (the
    ``pq.bounded_query_pandas`` cap pattern): broadcast sides ship to
    every executor, so a corpus-sized frame must fail with ValueError
    instead of OOMing the cluster mid-broadcast. Reads at most
    ``cap + 1`` rows — the probe itself is bounded. Shared by
    hard-negative anchor mining (``similarity/negatives.py``) and brute
    semantic decontamination (``dedup/decontam.py``)."""
    n = df.limit(cap + 1).count()
    if n > cap:
        raise ValueError(
            f"{role} exceeds {cap_name}={cap}; the pair stage broadcasts "
            f"it to every executor — {remedy}, or raise {cap_name} "
            "deliberately"
        )


def pkg_parent() -> str:
    """Directory containing the engine package — captured DRIVER-side so
    executor closures can sys.path-bootstrap before importing engine
    modules (cloudpickle serializes module-global references by name, and
    executors without the package on PYTHONPATH would fail to unpickle).
    Canonical copy; every mapInPandas module uses this one."""
    import os

    import azure_etl_databricks_sql_powerbi_spark as _pkg

    return os.path.dirname(os.path.dirname(os.path.abspath(_pkg.__file__)))


def double_hash_positions(hashes, width: int, depth: int):
    """Kirsch-Mitzenmacher double hashing: position g_i(x) = h1 + i*h2
    (mod width) for i in [0, depth) from the two 32-bit halves of a 64-bit
    hash (h2 forced odd). Returns a (len(hashes), depth) int64 numpy array
    — shared by the bloom filter (dedup/incremental.py) and the count-min
    sketch (sketches/cms.py)."""
    import numpy as np

    h = np.asarray(hashes, dtype=np.uint64)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.int64)
    i = np.arange(depth, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % width


def hex_prefix_long(c: Column | str, start: int = 1, length: int = 8) -> Column:
    """Slice ``length`` hex chars of a hex-string column (md5 etc.) from
    1-based ``start`` and parse them as a non-negative BIGINT.

    THE portable hash arithmetic of the engine: any engine with md5 and
    hex parsing — including the DuckDB oracle via
    ``CAST(concat('0x', substr(h, start, length)) AS UBIGINT)`` —
    reproduces it bit-for-bit. Keep every md5-prefix bucket/fingerprint
    derivation on this ONE definition (``sampling.hash_bucket``,
    ``features.hash_bucket``, ``operators/shuffle``) so a portability
    fix can never miss a copy. ``length`` ≤ 15 keeps the value inside
    a signed 64-bit long (60 bits).
    """
    if length > 15:
        raise ValueError(f"hex_prefix_long: length {length} overflows BIGINT")
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(c, start, length), 16, 10).cast("long")


def money_sum(c: Column | str) -> Column:
    """Exact money sum: DECIMAL(18,2)-accumulate, then ONE double cast.

    ``ROUND(SUM(double), 2)`` is a latent cross-engine hash hazard: the
    double sum is order-dependent in its last bits, and when the true
    total sits on a half-cent boundary Spark (BigDecimal HALF_UP) and
    DuckDB (multiply + nearbyint) round apart — the r11 sf1 sweep caught
    two such one-cent divergences on queries that were exact at sf0.01.
    Accumulating in DecimalType is order-independent and exact (2-dp
    money doubles cast losslessly to DECIMAL(18,2); DECIMAL(38,2) holds
    ~1e36 so no overflow at any realistic corpus scale), and the final
    decimal→double cast is correctly rounded identically in both
    engines. DuckDB twin: ``CAST(SUM(CAST(c AS DECIMAL(18,2))) AS
    DOUBLE)``."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast("decimal(18,2)")).cast("double")


def exact_avg(c: Column | str, cents: bool = True) -> Column:
    """Deterministic mean: exact numerator, one IEEE double division.

    ``ROUND(AVG(x), n)`` compounds two cross-engine hazards — the
    order-dependent double sum AND rounding a quotient whose shortest
    decimal repr can land exactly on a half at the n-th digit. Both
    vanish by (a) accumulating the numerator exactly (DECIMAL(18,2) for
    2-dp money columns; the raw sum is already exact for whole-number
    or integer columns — pass cents=False) and (b) emitting the
    UNROUNDED quotient: double division of identical operands is
    correctly rounded by IEEE 754 in every engine, bit-for-bit. DuckDB
    twin: ``CAST(SUM(CAST(c AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c)``
    (or ``CAST(SUM(c) AS DOUBLE) / COUNT(c)`` with cents=False)."""
    c = F.col(c) if isinstance(c, str) else c
    num = (
        F.sum(c.cast("decimal(18,2)")) if cents else F.sum(c)
    ).cast("double")
    return num / F.count(c)


def disc_price(
    price_col: str = "l_extendedprice", disc_col: str = "l_discount"
) -> Column:
    """Exact discounted-price product ``price × (1 − discount)`` in tight
    decimals, the one revenue expression the TPC-H-shaped tier sums (r12
    review: nine copy-pasted sites made the next precision tweak a
    9-place hazard). Both operands cast to (12,2)/(3,2); the subtract
    widens the rate to DECIMAL(4,2), so Spark's product is DECIMAL(17,4)
    (p1+p2+1) while DuckDB's twin lands DECIMAL(16,4) (p1+p2) — the
    DECLARED precisions differ, the 4-dp values are exact and identical
    in both (r13 ADVICE clarification). DuckDB twin: ``CAST(p AS
    DECIMAL(12,2)) * (CAST('1.00' AS DECIMAL(3,2)) - CAST(d AS
    DECIMAL(3,2)))``. Compose with
    ``F.round(F.sum(disc_price()), 2).cast("double")`` for the money-sum
    contract."""
    return F.col(price_col).cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col(disc_col).cast("decimal(3,2)")
    )
