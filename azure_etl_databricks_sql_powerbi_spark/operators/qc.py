"""Data-quality checks as Spark aggregates (reference ``checks.py:9-35``).

The reference evaluates checks on a driver-side pandas frame
(``checks.py:16-28``) — impossible at 100 TB. Here every check is an
aggregate expression and ``run_checks`` evaluates ALL checks in a single
pass over the data (one job, one partial-aggregate shuffle of a handful of
numbers), then gates writes on the result.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    """Mirrors reference ``checks.py:9-14``."""

    check_name: str
    passed: bool
    detail: str = ""


@dataclass(frozen=True)
class _AggCheck:
    name: str
    agg: Column  # produces the measured value
    # (measured_value) -> (passed, detail)
    kind: str
    threshold: float


def check_min_rows(min_rows: int) -> _AggCheck:
    """Reference ``checks.py:16-19``: row count >= min_rows."""
    return _AggCheck(f"min_rows>={min_rows}", F.count(F.lit(1)), "min_rows", float(min_rows))


def check_non_null(col: str, max_null_rate: float = 0.0) -> _AggCheck:
    """Reference ``checks.py:22-28``: null fraction of ``col`` <= rate.

    A missing column is a failed check (reference ``checks.py:23-24``);
    that is resolved at plan-build time in ``run_checks``.
    """
    return _AggCheck(
        f"non_null:{col}",
        F.avg(F.col(col).isNull().cast("int")),
        "max_null_rate",
        max_null_rate,
    )


def check_unique_key(*cols: str) -> _AggCheck:
    """Extension: key uniqueness (duplicate count == 0)."""
    return _AggCheck(
        f"unique_key:{','.join(cols)}",
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])).cast("double"),
        "max_value",
        0.0,
    )


def check_accepted_values(col: str, allowed: list) -> _AggCheck:
    """Extension (dbt `accepted_values`): count of rows whose ``col``
    holds a value OUTSIDE the allowed domain (NULL is not a violation —
    pair with check_non_null to forbid it). Completes the dbt generic
    quartet with check_unique_key / check_non_null /
    referential_orphan_counts."""
    return _AggCheck(
        f"accepted_values:{col}",
        F.sum(
            (F.col(col).isNotNull() & ~F.col(col).isin(list(allowed))).cast("long")
        ).cast("double"),
        "max_value",
        0.0,
    )


def check_freshness(ts_col: str, max_age_days: int) -> _AggCheck:
    """Extension: newest ``ts_col`` within ``max_age_days`` of now."""
    return _AggCheck(
        f"freshness:{ts_col}<={max_age_days}d",
        F.datediff(F.current_date(), F.max(ts_col).cast("date")).cast("double"),
        "max_value",
        float(max_age_days),
    )


def _evaluate(check: _AggCheck, value: float | None) -> CheckResult:
    if check.kind == "min_rows":
        v = float(value or 0)
        return CheckResult(check.name, v >= check.threshold, f"rows={int(v)}")
    v = float(value) if value is not None else 0.0
    passed = v <= check.threshold
    return CheckResult(check.name, passed, f"value={v:.6f}")


def run_checks(df: DataFrame, checks: list[_AggCheck]) -> list[CheckResult]:
    """Evaluate all checks in ONE aggregate job over ``df``.

    Missing-column checks fail without touching the data (the reference's
    ``col not in df.columns`` branch, ``checks.py:23-24``).
    """
    results: dict[int, CheckResult] = {}
    live: list[tuple[int, _AggCheck]] = []
    for i, chk in enumerate(checks):
        ref_cols = {c for c in df.columns}
        needed = _referenced_column(chk)
        if needed is not None and needed not in ref_cols:
            results[i] = CheckResult(chk.name, False, f"column '{needed}' missing")
        else:
            live.append((i, chk))
    if live:
        row = df.agg(*[chk.agg.alias(f"c{i}") for i, chk in live]).collect()[0]
        for i, chk in live:
            results[i] = _evaluate(chk, row[f"c{i}"])
    return [results[i] for i in range(len(checks))]


def _referenced_column(check: _AggCheck) -> str | None:
    if check.name.startswith("non_null:"):
        return check.name.split(":", 1)[1]
    if check.name.startswith("freshness:"):
        return check.name.split(":", 1)[1].split("<=")[0]
    return None


def run_checks_df(
    spark: SparkSession, df: DataFrame, checks: list[_AggCheck]
) -> DataFrame:
    """Checks as a small result DataFrame (QC-gate-friendly, joinable)."""
    rows = [(r.check_name, r.passed, r.detail) for r in run_checks(df, checks)]
    return spark.createDataFrame(rows, "check_name string, passed boolean, detail string")


def qc_gate(df: DataFrame, checks: list[_AggCheck]) -> DataFrame:
    """Raise if any check fails; otherwise pass ``df`` through (reference
    gates writes on QC + Slack alert, ``run_all_local.py`` + ``alerts.py``)."""
    failed = [r for r in run_checks(df, checks) if not r.passed]
    if failed:
        summary = "; ".join(f"{r.check_name} ({r.detail})" for r in failed)
        raise ValueError(f"QC gate failed: {summary}")
    return df


def attach_observed_checks(
    df: DataFrame, checks: list[_AggCheck], name: str = "qc"
):
    """Zero-extra-pass QC: attach the checks to ``df`` as an
    ``Observation`` so their aggregates are computed AS A SIDE EFFECT of
    whatever action consumes the plan (typically the gold write), instead
    of ``run_checks``'s separate aggregate job over the data.

    At 100 TB the difference is one full scan: ``run_checks`` re-reads the
    table to aggregate; an observation folds the same partial aggregates
    into the tasks the write already runs, shipping a handful of numbers
    to the driver with the task results.

    Returns ``(observed_df, finish)`` — run your action on ``observed_df``
    (write, count, foreach), then call ``finish()`` for the
    ``list[CheckResult]``. ``finish`` blocks until the action completes;
    missing-column checks fail at plan time exactly like ``run_checks``.

    One carve-out: Spark rejects DISTINCT aggregates in observed metrics
    (INVALID_OBSERVED_METRICS), so ``check_unique_key`` checks can't ride
    the action — they run as a ``run_checks`` pass of their own inside
    ``finish()``. Everything else (counts, null rates, freshness) is
    observed at zero extra cost.
    """
    from pyspark.sql import Observation

    results: dict[int, CheckResult] = {}
    live: list[tuple[int, _AggCheck]] = []
    fallback: list[tuple[int, _AggCheck]] = []
    for i, chk in enumerate(checks):
        needed = _referenced_column(chk)
        if needed is not None and needed not in df.columns:
            results[i] = CheckResult(chk.name, False, f"column '{needed}' missing")
        elif chk.name.startswith("unique_key:"):
            fallback.append((i, chk))
        else:
            live.append((i, chk))

    if live:
        obs = Observation(name)
        observed = df.observe(obs, *[chk.agg.alias(f"c{i}") for i, chk in live])
    else:
        obs, observed = None, df

    def finish() -> list[CheckResult]:
        if obs is not None:
            got = obs.get  # blocks until the consuming action finishes
            for i, chk in live:
                results[i] = _evaluate(chk, got[f"c{i}"])
        if fallback:
            for (i, _), res in zip(
                fallback, run_checks(df, [chk for _, chk in fallback])
            ):
                results[i] = res
        return [results[i] for i in range(len(checks))]

    return observed, finish


def referential_orphan_counts(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key integrity QC: one row with an orphan count per
    declared relation ``(name, child, fk_col, parent, pk_col)`` — child
    rows whose FK value has no matching parent PK (NULL FKs count as
    orphans: a fact with no dimension linkage is unjoinable either way).

    Each relation is a LEFT ANTI hash join reduced to a 1-row count, and
    the scalar results cross-join into the single QC row — at 100 TB
    each anti-join shuffles on its own key (or broadcasts a small
    parent) independently; the cross joins combine literally one row
    each. The classic dbt ``relationships`` test, engine-side."""
    out: DataFrame | None = None
    for name, child, fk, parent, pk in relations:
        cnt = (
            child.join(
                parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
            )
            .agg(F.count(F.lit(1)).cast("long").alias(f"orphans_{name}"))
        )
        out = cnt if out is None else out.crossJoin(cnt)
    if out is None:
        raise ValueError("no relations declared")
    return out
