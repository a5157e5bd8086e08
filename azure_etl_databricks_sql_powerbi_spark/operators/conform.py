"""Drift-tolerant schema conform operator.

The reference cleans bronze with per-column ``if "col" in df.columns`` guards
(``run_transform.py:49-72``): casts are applied only when the column exists,
so schema drift in upstream APIs never breaks the job. This operator is the
general form: a declared *contract* of column -> (type, optional expression)
is applied to whatever subset of columns is present, missing contract columns
are added as typed nulls, and extra columns are optionally dropped.

Everything is Column expressions — Catalyst sees one projection, so the whole
conform collapses into the scan's ReadSchema (column pruning) and stays inside
WholeStageCodegen. No shuffles, no UDFs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColumnSpec:
    """One contract column.

    ``dtype`` is a Spark SQL type string (``"timestamp"``, ``"double"`` ...).
    ``expr`` optionally maps the incoming column to its clean form (e.g.
    ``lambda c: F.lower(F.trim(c))`` for email standardization — the behavior
    the reference's docstring promises at ``run_transform.py:44`` but never
    implements; here it is a real operator).
    """

    name: str
    dtype: str
    expr: Callable[[Column], Column] | None = None
    required: bool = False


@dataclass(frozen=True)
class Contract:
    """Silver-table contract: ordered columns plus audit metadata."""

    columns: tuple[ColumnSpec, ...]
    audit_col: str | None = "etl_loaded_at"
    drop_extras: bool = True
    names: tuple[str, ...] = field(init=False)

    def __post_init__(self) -> None:
        object.__setattr__(self, "names", tuple(c.name for c in self.columns))


def conform(
    df: DataFrame,
    contract: Contract,
    audit_ts: str | None = None,
) -> DataFrame:
    """Apply ``contract`` to ``df`` tolerating schema drift.

    - present column: apply ``expr`` (if any) then cast to ``dtype``
    - missing optional column: add as typed null (so unions/writes align)
    - missing required column: raise (fail fast at plan time, not mid-job)
    - extras: kept or dropped per ``contract.drop_extras``
    - audit column: ``current_timestamp()`` (reference ``run_transform.py:59``)
      or a literal timestamp string under test so results stay deterministic
      and oracle-hashable.
    """
    present = set(df.columns)
    out: list[Column] = []
    for spec in contract.columns:
        if spec.name in present:
            col = F.col(spec.name)
            if spec.expr is not None:
                col = spec.expr(col)
            out.append(col.cast(spec.dtype).alias(spec.name))
        elif spec.required:
            raise ValueError(
                f"contract column '{spec.name}' missing from input "
                f"(have: {sorted(present)})"
            )
        else:
            out.append(F.lit(None).cast(spec.dtype).alias(spec.name))
    if not contract.drop_extras:
        out.extend(F.col(c) for c in df.columns if c not in contract.names)
    if contract.audit_col:
        audit = (
            F.lit(audit_ts).cast("timestamp")
            if audit_ts is not None
            else F.current_timestamp()
        )
        out.append(audit.alias(contract.audit_col))
    return df.select(*out)
