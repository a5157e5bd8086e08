"""Compression-ratio quality signal (north-star extension — the
RefinedWeb/Gopher-adjacent heuristic a web-scale curation pipeline runs
beside the rule gates): ``deflate(text) / len(text)``.

Why it works: machine-generated/templated/boilerplate text is highly
self-similar and compresses far below natural prose (~0.3-0.45 for
English), while encrypted/binary/garbled payloads masquerading as text
are incompressible (ratio near or above 1.0). A [lo, hi] band on the
ratio is therefore a cheap two-sided junk filter orthogonal to the
token-statistics gates (``gopher_quality_flags``), and the signal
composes with the rank ensembler (``functions/ensemble``) like any other
quality column.

Execution shape: zlib is stdlib-C; the UDF is an Arrow-batched
``pandas_udf`` (defined INSIDE the builder so cloudpickle ships it by
value — the ``vectors.cosine_batch`` pattern), one C deflate call per
document per batch. This is a deliberate exception to the
"built-ins first" rule: no Catalyst expression can compute DEFLATE, and
per-batch C calls keep the Python tax to the Arrow hop. Level 6 (zlib
default) is pinned — the ratio is level-dependent, so changing it would
silently shift every threshold downstream. No SQL oracle exists (DuckDB
has no zlib scalar); correctness is pinned by construction-based units:
repetitive << prose < random, determinism, and the exact
len(compress)/len(raw) arithmetic on known strings.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZLIB_LEVEL = 6  # pinned: ratios (and any thresholds built on them) are
# level-dependent; bump only with a migration note


def compression_ratio(c: Column | str) -> Column:
    """``len(zlib.compress(utf8(text), 6)) / len(utf8(text))`` as double;
    NULL for NULL text, NULL for empty text (no bytes to price — callers
    gate empties with the length filters they already run)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, ZLIB_LEVEL)) / len(raw)

        return texts.map(one)

    c = F.col(c) if isinstance(c, str) else c
    return _ratio(c)


def compression_band_filter(
    df: DataFrame,
    text_col: str = "text",
    lo: float = 0.20,
    hi: float = 0.75,
) -> DataFrame:
    """Rows whose compression ratio lies in [lo, hi] — drops the
    too-compressible (templated/repetitive spam) AND the high-entropy
    (base64 blobs, garbled, random-alphabet) tails in one pass.
    NULL/empty text fails the band (no signal = no keep), consistent
    with the curation gates' default. Calibration anchors (measured, see
    tests): repeated spam phrases ≈0.03, short English prose ≈0.66,
    random alphanumerics ≈0.78 — so [0.20, 0.75] keeps prose while
    cutting both tails for ~100-char-to-KB docs. Ratios FALL as docs
    get longer (more context to exploit), so tune per-corpus from the
    ``compression_ratio`` distribution (``approx_percentiles`` is the
    cheap way at scale)."""
    # materialize the ratio ONCE: referencing the pandas UDF twice in the
    # filter would let a planner that doesn't dedup equal UDF expressions
    # run the deflate twice per row (r11 ADVICE)
    if "__cr" in df.columns:
        raise ValueError(
            "compression_band_filter uses '__cr' as a temp column; "
            "rename the existing '__cr' column first"
        )
    return (
        df.withColumn("__cr", compression_ratio(text_col))
        .filter((F.col("__cr") >= lo) & (F.col("__cr") <= hi))
        .drop("__cr")
    )
