"""As-of and range (interval) joins — J4-EXT in SURVEY.md §2.3.

Spark has no native ASOF JOIN; the scalable formulations here are the
standard ones:

- **as-of (backward)**: union the two sides tagged, sort within each key by
  time, and carry the most recent right-side row forward with
  ``last(..., ignorenulls=True)`` over a running window. ONE shuffle on the
  key (the window's partitionBy), no point-in-time self-join blowup, no
  range condition at all — this is the merge-join shape that survives
  100 TB (each key's timeline is processed in one sorted pass).
  The naive alternative — non-equi join + per-left-row max() — is a
  broadcast nested loop; it is what we avoid.

- **range join**: equi-join on a coarse time bucket + exact interval
  filter. Expanding each interval to the buckets it overlaps turns a
  non-equi interval join into an equi-join Catalyst executes as a hash
  join; bucket width trades expansion factor against per-bucket fanout
  (pick ~= median interval length).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Generalized as-of join (the pandas ``merge_asof`` surface).

    For every left row, attach within the same ``on`` key:

    - ``direction="backward"``: the LATEST right row with
      ``right_ts <= left_ts`` (DuckDB ``ASOF JOIN`` >= semantics),
    - ``direction="forward"``: the EARLIEST right row with
      ``right_ts >= left_ts``.

    Ties on timestamp resolve to the right row (an equal-time right row
    IS visible in both directions). ``tolerance_seconds`` bounds the
    match: a carried right row farther than the tolerance from
    ``left_ts`` is nulled out (exactly pandas' ``tolerance``), computed
    post-carry as a cheap per-row projection — the window shape and
    shuffle count don't change.

    Scale shape: union + sorted window = ONE shuffle on the key, each
    key's timeline processed in one sorted pass; no non-equi join, no
    per-left-row subquery.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    l_tag = left.withColumn("__t", F.col(left_ts)).withColumn("__is_l", F.lit(1))
    # SQL ASOF/equi-join semantics: NULL keys never match, and a NULL
    # right_ts can't satisfy the inequality. Without this filter the
    # window (partitioned by key) would group null-keyed right rows with
    # null-keyed left rows and carry them forward — a match SQL never makes.
    # Null-keyed LEFT rows are preserved (with null right columns), as in a
    # left join.
    r_tag = (
        right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
        .select(
            on,
            F.col(right_ts).alias("__t"),
            *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        )
        .withColumn("__is_l", F.lit(0))
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    carry_cols = [*right_cols, "__m"]  # __m = the matched right timestamp
    unioned = unioned.withColumn(
        "__r___m", F.when(F.col("__is_l") == 0, F.col("__t"))
    )

    if direction == "backward":
        # right rows sort BEFORE left at equal __t => inclusive; carry the
        # most recent right value forward
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__t").asc(), F.col("__is_l").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        # right rows sort AFTER left at equal __t => inclusive; take the
        # next right value looking forward
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__t").asc(), F.col("__is_l").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731

    carried = unioned.select(
        "*", *[carry(f"__r_{c}").alias(f"__c_{c}") for c in carry_cols]
    )
    if tolerance_seconds is not None:
        within = (
            F.abs(
                F.unix_timestamp(F.col("__c___m")) - F.unix_timestamp(F.col("__t"))
            )
            <= tolerance_seconds
        )
        out_cols = [
            F.when(within, F.col(f"__c_{c}")).alias(c) for c in right_cols
        ]
    else:
        out_cols = [F.col(f"__c_{c}").alias(c) for c in right_cols]
    return carried.filter(F.col("__is_l") == 1).select(*left.columns, *out_cols)


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join (see ``asof_join``; kept as the stable name the
    rest of the engine and tests use)."""
    return asof_join(left, right, on, left_ts, right_ts, right_cols, "backward")


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: str = "1 day",
    extra_key: tuple[str, str] | None = None,
) -> DataFrame:
    """points ⋈ intervals ON point_ts in [start_ts, end_ts) — executed as an
    equi-join on coarse time buckets (interval rows are exploded to every
    bucket they overlap) + the exact range filter.

    ``extra_key`` optionally adds an (points_col, intervals_col) equi key.
    Without bucketing this would be a broadcast-nested-loop join; with it,
    a plain shuffled hash join whose fanout is bounded by
    interval_length/bucket + 1 rows per interval.
    """
    seconds = {"1 hour": 3600, "6 hours": 21600, "1 day": 86400}[bucket]
    # bucket index = floor(epoch_seconds / bucket_seconds), exact long math
    p = points.withColumn(
        "__b", (F.unix_timestamp(F.col(point_ts)) / seconds).cast("long")
    )
    iv = intervals.withColumn(
        "__bs", (F.unix_timestamp(F.col(start_ts)) / seconds).cast("long")
    ).withColumn("__be", (F.unix_timestamp(F.col(end_ts)) / seconds).cast("long"))
    exploded = iv.select(
        "*", F.explode(F.sequence(F.col("__bs"), F.col("__be"))).alias("__b")
    ).drop("__bs", "__be")
    join_keys = ["__b"]
    drop_cols = ["__b"]
    if extra_key is not None:
        pk, ik = extra_key
        p = p.withColumn("__k", F.col(pk))
        exploded = exploded.withColumn("__k", F.col(ik))
        join_keys.append("__k")
        drop_cols.append("__k")
    joined = p.join(exploded, on=join_keys).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop(*drop_cols)
