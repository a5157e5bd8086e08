"""Privacy operators: deterministic pseudonymization and k-anonymity QC.

Complements ``functions/text.scrub_pii`` (which removes PII *patterns*
from free text): these operate on STRUCTURED identifier columns.

- ``pseudonymize`` replaces identifier columns with keyed sha256
  digests. Deterministic (same input + salt -> same token), so
  joinability across tables survives masking — the property analytics
  needs and raw redaction destroys. All JVM-side Column exprs
  (``F.sha2``), hex output identical to DuckDB's ``sha256`` — fully
  oracle-checkable.
- ``k_anonymity_violations`` reports quasi-identifier groups smaller
  than k: any such group re-identifies its members by combination of
  "harmless" attributes (Sweeney 2002). One hash aggregate on the
  quasi-identifier tuple; a QC gate (operators/qc.py) can fail a
  release when violations exist.

Salting: the salt is a pipeline secret (``secrets.py`` provider), not a
per-row random — per-row randomness would break determinism and
joinability. Rotating the salt re-keys the whole pseudonym space.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pseudonymize(
    df: DataFrame,
    cols: Sequence[str],
    salt: str,
    prefix_len: int = 16,
) -> DataFrame:
    """Replace each named column with a keyed digest token
    ``sha256(salt || value)`` truncated to ``prefix_len`` hex chars
    (64 bits at 16 chars — collision-safe for any realistic entity
    count). NULL stays NULL (a masked NULL would fabricate data)."""
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.when(
                F.col(c).isNotNull(),
                F.substring(
                    F.sha2(F.concat(F.lit(salt), F.col(c).cast("string")), 256),
                    1,
                    prefix_len,
                ),
            ),
        )
    return out


def k_anonymity_violations(
    df: DataFrame,
    quasi_identifiers: Sequence[str],
    k: int,
) -> DataFrame:
    """Quasi-identifier combinations held by fewer than ``k`` rows —
    the re-identifiable groups. Returns (quasi cols..., n_rows),
    smallest first; empty result == the release is k-anonymous."""
    qi = list(quasi_identifiers)
    return (
        df.groupBy(*qi)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") < k)
        .orderBy(F.col("n_rows").asc(), *[F.col(c).asc() for c in qi])
    )
