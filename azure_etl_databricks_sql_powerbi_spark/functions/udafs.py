"""Pandas UDAF surface (SURVEY.md §2.10) — Arrow-batched grouped-agg
user-defined aggregates, the API for aggregation logic Spark's built-ins
can't express.

Like the UDTF tier (``udtfs.py``), these exist to complete the ENGINE's
extension surface: the shipped examples are deliberately verifiable
(median, midrange) so the API path gets a hash-exact DuckDB oracle, and
each is ALSO expressible with built-ins — unit tests pin UDAF ≡ built-in
so the native path stays the documented default.

Execution shape: one shuffle on the group key, then each group's column
arrives as ONE pandas Series per group (Arrow transfer). That means a
grouped-agg pandas UDAF materializes the whole group in executor memory
— fine for bounded groups (status codes, days), wrong for unbounded key
cardinality per group; built-in aggregates (or ``applyInPandas`` with
chunked logic) are the 100 TB path there.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact median (numpy: middle value, or the mean of the two middle
    values for even counts — the same definition DuckDB's MEDIAN uses on
    doubles, so results hash-match cross-engine)."""
    return float(np.median(v.dropna().to_numpy(dtype=np.float64)))


@pandas_udf("double")
def midrange_udaf(v: pd.Series) -> float:
    """(min + max) / 2 — one IEEE add and one divide on exact inputs."""
    x = v.dropna().to_numpy(dtype=np.float64)
    return float((x.min() + x.max()) / 2.0)
