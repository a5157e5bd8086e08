"""Vector column functions over array<float|double> embeddings (J3 surface).

Dot products / norms / cosine are ``zip_with`` + ``aggregate`` expressions
— evaluated in the JVM per row, no Python, no shuffle. Computation is done
in DOUBLE (inputs cast up) so results are reproducible against the DuckDB
oracle and stable across partitionings: per-row folds are sequential
left-to-right in both engines.

For 100 TB-scale similarity joins see ``similarity/`` (LSH bucketing) —
these kernels are the inner loop either way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either side has zero norm."""
    d = dot(a, b)
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(d / denom)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def unit_normalize(a: Column | str) -> Column:
    """Scale to unit L2 norm (zero vectors pass through unchanged).

    Pre-normalizing the corpus once turns every cosine into a plain dot
    product — at scale this halves the similarity-join arithmetic."""
    a = F.col(a) if isinstance(a, str) else a
    n = norm(a)
    return F.when(n == 0, as_double(a)).otherwise(
        F.transform(as_double(a), lambda x: x / n)
    )


def cosine_batch(a: Column | str, b: Column | str) -> Column:
    """Arrow-batched cosine for HOT paths with many pairs: one numpy
    einsum per batch instead of an interpreted per-row fold. Results match
    ``cosine`` to float-rounding; use this where pair counts are large
    (LSH verify joins), the expression form where a plan must stay
    Python-free.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(x: pd.Series, y: pd.Series) -> pd.Series:
        xm = np.array([np.asarray(v, dtype=np.float64) for v in x])
        ym = np.array([np.asarray(v, dtype=np.float64) for v in y])
        num = np.einsum("ij,ij->i", xm, ym)
        den = np.linalg.norm(xm, axis=1) * np.linalg.norm(ym, axis=1)
        return pd.Series(np.where(den == 0, 0.0, num / np.maximum(den, 1e-300)))

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _cos(a, b)
