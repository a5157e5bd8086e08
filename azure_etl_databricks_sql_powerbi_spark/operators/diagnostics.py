"""Pre-flight data diagnostics: key-skew profiling and join-explosion
estimation.

At 100 TB the two silent killers of a join-heavy plan are (a) one hot
key holding a double-digit share of the fact table (a single straggler
task absorbs it) and (b) many-to-many joins whose output cardinality is
orders of magnitude above either input. Both are knowable BEFORE running
the expensive plan from nothing but per-key counts — aggregates that
cost one map-side-combined pass each. These operators compute exactly
that, as plain DataFrames so the numbers land in QC gates
(``operators/qc.py``) or drive mitigation (``operators/skew.salted_join``,
AQE skew splitting).

Everything here is exact integer arithmetic over counts plus raw IEEE
divisions at the output edge (the ``mean_word_len`` contract), so each
profile has a straightforward SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Top-``top_n`` heaviest keys: (key, cnt, share, cum_share, rank).

    ``share`` is the key's fraction of all rows; ``cum_share`` the running
    fraction held by the top ``rank`` keys — the "top 10 keys hold 40% of
    the table" readout that decides whether a salt or a broadcast is
    needed. Ties break on the key value. One hash-aggregate over the
    input; the top-N cut is a distributed TakeOrdered (orderBy+limit), so
    the only single-partition work — the rank/cum_share window — runs
    over ≤ ``top_n`` rows, never over the distinct-key set.
    """
    per = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = per.agg(F.sum("cnt").alias("__total"))
    top = per.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.join(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .withColumn("__cum", F.sum("cnt").over(cum))
        .select(
            "rank",
            "key",
            "cnt",
            (F.col("cnt") / F.col("__total")).alias("share"),
            (F.col("__cum") / F.col("__total")).alias("cum_share"),
        )
    )


def skew_summary(df: DataFrame, key: str) -> DataFrame:
    """One row: (n_rows, n_keys, max_key_cnt, avg_key_cnt, skew_ratio).

    ``skew_ratio = max_key_cnt / avg_key_cnt`` — 1.0 is perfectly
    uniform; a ratio near the shuffle partition count means one task
    owns the hot key outright. avg is a raw long/long division.
    """
    per = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_key_cnt"),
        (F.sum("cnt") / F.count(F.lit(1))).alias("avg_key_cnt"),
        (
            F.max("cnt") / (F.sum("cnt") / F.count(F.lit(1)))
        ).alias("skew_ratio"),
    )


def join_explosion_estimate(
    left: DataFrame, right: DataFrame, keys: list[str]
) -> DataFrame:
    """EXACT inner-join output cardinality without running the join.

    |A ⋈ B| = Σ_k cnt_A(k) · cnt_B(k): two map-side-combined aggregates
    plus a join on the (small) distinct-key sets — never the row-level
    join itself. One row out:
    (left_rows, right_rows, matching_keys, join_rows, amplification)
    where ``amplification = join_rows / greatest(left_rows, right_rows)``
    — above ~1 the join fans out and a 100 TB input becomes a multiple of
    itself in shuffle + output cost. Exact, not an estimate from sampled
    statistics, at the price of one pass per side (the row totals derive
    from the per-key aggregates, so each input really is scanned once).

    ``join_rows`` is decimal(38,0): the per-key products live in exactly
    the extreme-skew regime this tool exists to flag, where a single hot
    key with >3e9 rows on both sides overflows a long product (ANSI-on
    Spark 4 would throw; ANSI-off would silently wrap negative — either
    way the diagnostic dies on its own target input if computed in
    longs). ``amplification`` divides as double at the output edge.
    """
    la = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("__lc"))
    ra = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("__rc"))
    lt = la.agg(F.coalesce(F.sum("__lc"), F.lit(0)).cast("long").alias("left_rows"))
    rt = ra.agg(F.coalesce(F.sum("__rc"), F.lit(0)).cast("long").alias("right_rows"))
    per_key = la.join(ra, keys).select(
        (
            F.col("__lc").cast("decimal(38,0)") * F.col("__rc").cast("decimal(38,0)")
        ).alias("__prod")
    )
    j = per_key.agg(
        F.count(F.lit(1)).alias("matching_keys"),
        F.coalesce(F.sum("__prod"), F.lit(0).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("join_rows"),
    )
    return (
        j.join(F.broadcast(lt))
        .join(F.broadcast(rt))
        .select(
            "left_rows",
            "right_rows",
            "matching_keys",
            "join_rows",
            (
                F.col("join_rows").cast("double")
                / F.greatest(F.col("left_rows"), F.col("right_rows")).cast("double")
            ).alias("amplification"),
        )
    )
