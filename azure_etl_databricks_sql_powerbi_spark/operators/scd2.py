"""SCD Type-2 (slowly changing dimension) history — the dimensional-
modeling extension of the reference's full-overwrite MERGE
(``run_load.py:57-96`` replaces every non-key column, keeping no history;
an SCD2 dimension keeps every version with validity intervals — the gold
dim shape BI actually wants for point-in-time joins, and the natural
companion of the as-of join in ``operators/asof.py``).

Two constructions:

- ``scd2_from_snapshots``: rebuild the full history from versioned rows in
  ONE window pass: collapse consecutive same-value runs, then
  ``valid_from = ts, valid_to = lead(ts), is_current = lead IS NULL``.
  One shuffle on the key; fully oracle-checkable SQL.
- ``scd2_apply``: incremental merge of one new batch into an existing
  history — close changed current rows, insert new versions, leave the
  rest. Join-based (broadcast when the batch is small), idempotent for a
  re-applied batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_snapshots(
    snapshots: DataFrame,
    keys: list[str],
    tracked: list[str],
    ts_col: str,
) -> DataFrame:
    """History table from versioned rows (one row per key per change ts).

    Consecutive rows with unchanged ``tracked`` values are collapsed into
    one interval (run-length compression via a lag-comparison flag summed
    into a run id — the gaps-and-islands shape again).
    """
    w_ts = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    change_flag = F.coalesce(
        sum(
            [
                (~F.col(c).eqNullSafe(F.lag(c).over(w_ts))).cast("int")
                for c in tracked
            ],
            F.lit(0),
        )
        > 0,
        F.lit(True),  # first row of a key starts a run
    ).cast("int")
    runs = snapshots.withColumn(
        "__run",
        F.sum(
            F.when(F.lag(ts_col).over(w_ts).isNull(), 1).otherwise(change_flag)
        ).over(w_ts.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_run = runs.groupBy(*keys, "__run").agg(
        *[F.first(c).alias(c) for c in tracked],
        F.min(ts_col).alias("valid_from"),
    )
    w_run = Window.partitionBy(*keys).orderBy(F.col("valid_from").asc())
    return (
        per_run.withColumn("valid_to", F.lead("valid_from").over(w_run))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__run")
    )


def scd2_apply(
    history: DataFrame,
    batch: DataFrame,
    keys: list[str],
    tracked: list[str],
    ts_col: str,
) -> DataFrame:
    """Merge one batch of new versions (one row per key, effective at its
    ``ts_col``) into an SCD2 ``history`` (schema as produced by
    ``scd2_from_snapshots``).

    - changed or new key -> close the old current row (valid_to = batch ts)
      and append the new current version
    - unchanged tracked values -> history untouched (idempotent re-apply)
    """
    cur = history.filter(F.col("is_current"))
    past = history.filter(~F.col("is_current"))

    b = batch.select(
        *keys, *[F.col(c).alias(f"__new_{c}") for c in tracked], F.col(ts_col).alias("__eff")
    )
    joined = cur.join(b, on=keys, how="full_outer")
    changed = F.coalesce(
        sum(
            [(~F.col(c).eqNullSafe(F.col(f"__new_{c}"))).cast("int") for c in tracked],
            F.lit(0),
        )
        > 0,
        F.lit(True),
    )
    has_batch = F.col("__eff").isNotNull()
    has_cur = F.col("valid_from").isNotNull()

    untouched_cur = joined.filter(has_cur & (~has_batch | ~changed)).select(
        *keys, *tracked, "valid_from", "valid_to", F.lit(True).alias("is_current")
    )
    # A late-arriving batch (__eff before the open row's valid_from) would
    # silently emit an inverted interval (valid_to < valid_from); fail
    # loudly instead — out-of-order batches must be handled upstream
    # (replay through scd2_from_snapshots), not absorbed as corrupt history.
    guarded_valid_to = F.when(
        F.col("__eff") < F.col("valid_from"),
        F.raise_error(
            F.concat(
                F.lit(
                    "scd2_apply: batch effective ts precedes current row's "
                    "valid_from (late-arriving batch) for key "
                ),
                F.concat_ws("|", *[F.col(k).cast("string") for k in keys]),
            )
        ).cast(history.schema["valid_to"].dataType),
    ).otherwise(F.col("__eff"))
    closed = joined.filter(has_cur & has_batch & changed).select(
        *keys,
        *tracked,
        "valid_from",
        guarded_valid_to.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = joined.filter(has_batch & (~has_cur | changed)).select(
        *keys,
        *[F.col(f"__new_{c}").alias(c) for c in tracked],
        F.col("__eff").alias("valid_from"),
        F.lit(None).cast(history.schema["valid_to"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return past.unionByName(untouched_cur).unionByName(closed).unionByName(opened)


def pit_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    fact_ts: str,
    dim_cols: list[str] | None = None,
    broadcast_dim: bool = False,
) -> DataFrame:
    """Point-in-time join — the reason SCD2 history exists: attach to
    each fact row the dimension version that was valid AT the fact's
    timestamp (``valid_from <= ts < valid_to``, open current version
    ``valid_to IS NULL`` matches everything after its start).

    Plan shape: an EQUI hash join on the business keys with the interval
    predicate evaluated as the join's residual condition — versions per
    key are few (bounded by change frequency, not data size), so the
    per-key match fan-out is tiny and the join scales exactly like any
    keyed fact-dim join: one shuffle on the keys, or zero with
    ``broadcast_dim=True`` when the dimension fits the broadcast
    threshold. Facts dated before the key's first version (or with keys
    absent from the dimension) are kept with NULL dim columns (left
    join) so coverage gaps are observable rather than silently dropped.
    """
    dim_cols = dim_cols or [
        c
        for c in dim.columns
        if c not in keys and c not in ("valid_from", "valid_to", "is_current")
    ]
    d = dim.select(
        *[F.col(k).alias(f"__dk_{k}") for k in keys],
        "valid_from",
        "valid_to",
        *dim_cols,
    )
    if broadcast_dim:
        d = F.broadcast(d)
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__dk_{k}"))
    ts = F.col(fact_ts)
    cond = (
        cond
        & (ts >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (ts < F.col("valid_to")))
    )
    return fact.join(d, cond, "left").drop(
        *[f"__dk_{k}" for k in keys], "valid_from", "valid_to"
    )
