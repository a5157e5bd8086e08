"""Key deduplication operators.

The reference dedups with ``df.dropDuplicates([key])`` — first-wins,
nondeterministic under parallel read order (``run_transform.py:49-50,65-66``).
The engine offers both:

- ``dedupe_exact``: the reference's semantics (one hash aggregate; map-side
  partial aggregation keeps the shuffle small — the right default at 100 TB
  when any representative row will do).
- ``latest_per_key``: deterministic latest-record-per-key via a ranked
  window, the correct upsert-input semantics (newest ``updated_at`` wins).
  One shuffle on the key; skewed keys are handled by AQE skew-join/partition
  splitting since the window partitions by the same key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Deterministic tiebreak column: monotonically_increasing_id is stable within
# a single plan execution, enough to break exact order-column ties.
_ROWNUM = "__rn"


def dedupe_exact(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """First-wins key dedup (reference ``run_transform.py:49-50``)."""
    return df.dropDuplicates(list(keys))


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    descending: bool = True,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Keep exactly one row per key: the greatest (default) by ``order_by``.

    Deterministic replacement for ``dropDuplicates`` when a version column
    exists (SURVEY.md W1). ``tiebreak`` columns break order ties so the
    result is oracle-hashable.
    """
    ordering = [
        F.col(c).desc_nulls_last() if descending else F.col(c).asc_nulls_last()
        for c in order_by
    ]
    ordering += [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*ordering)
    return (
        df.withColumn(_ROWNUM, F.row_number().over(w))
        .filter(F.col(_ROWNUM) == 1)
        .drop(_ROWNUM)
    )
