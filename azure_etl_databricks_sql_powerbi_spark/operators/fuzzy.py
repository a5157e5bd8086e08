"""Blocked fuzzy-match self-join — the entity-resolution primitive
(find records that are *nearly* the same entity by edit distance).

Shape: classic blocking + verify. The self-join runs ONLY inside a
blocking key (one hash shuffle on the block columns; per-block work is
quadratic in block size, so block choice bounds the explosion — the
same cap discipline as the LSH band join and the SemDeDup cell cap).
Inside a block, two cheap filters run BEFORE the O(len²) levenshtein:
the canonical ``id_a < id_b`` dedup and a length band
(``abs(len_a - len_b) <= max_distance`` — a true lower bound on edit
distance, so it never drops a real match). All built-in Column exprs:
``F.levenshtein`` is JVM-side and identically defined in DuckDB, which
makes the operator fully oracle-checkable.

At 100 TB the blocking key IS the design decision: a key that buckets
the corpus into ~constant-size groups (nation, zip, sorted-token
prefix) keeps per-block work flat while the shuffle carries only
(block, id, text).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.util import spread


def blocked_fuzzy_pairs(
    df: DataFrame,
    block_cols: Sequence[str],
    text_col: str,
    id_col: str,
    max_distance: int = 2,
) -> DataFrame:
    """All intra-block pairs with ``levenshtein(text_a, text_b) <=
    max_distance``. Returns (id_a, id_b, edit_distance), id_a < id_b."""
    block_cols = list(block_cols)
    # spread the probe side: a small single-file input would otherwise
    # run the ENTIRE quadratic verify in one task (measured at sf0.1:
    # 13s single-core -> sub-second across 32) — the per-block pair work
    # is the expensive stage, so it must be partition-parallel
    df = spread(df)
    a = df.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("__text_a"),
    )
    b = df.select(
        *block_cols,
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("__text_b"),
    )
    pairs = (
        a.join(b, on=block_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        # length band: |len_a - len_b| is a lower bound on edit distance —
        # prunes before the expensive levenshtein without losing matches
        .filter(
            F.abs(F.length("__text_a") - F.length("__text_b")) <= max_distance
        )
        .select(
            "id_a",
            "id_b",
            # threshold-bounded levenshtein (Spark 3.5+): the DP early-
            # exits once distance must exceed the bound — O(k*n) per pair
            # instead of O(n^2), ~6x on the verify stage (measured at
            # sf0.1: 22.9s -> 4.4s for the customer-pairs query). Returns
            # -1 past the bound, so the filter keeps [0, max_distance]
            # and the kept values ARE the true distances (oracle-equal).
            F.levenshtein(
                F.col("__text_a"), F.col("__text_b"), max_distance + 1
            ).alias("edit_distance"),
        )
        .filter(
            (F.col("edit_distance") >= 0) & (F.col("edit_distance") <= max_distance)
        )
    )
    return pairs
