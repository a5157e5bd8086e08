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
    max_distance``. Returns (id_a, id_b, edit_distance), id_a < id_b.

    Scale contract: per-block work is quadratic in block size, so the
    block key's cardinality must grow with N (zip+name-prefix, composite
    keys) — a CONSTANT-cardinality key (e.g. nation alone) makes total
    work ~N²/cardinality and is wrong at the 100 TB design point. The
    declared fuzzy-ER contract query therefore runs
    ``multi_pass_snm_pairs`` (linear candidates for any corpus); this
    operator remains the blocked-ER surface for corpora with a genuinely
    fine blocking key, unit-tested on planted typos."""
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


def _global_sorted_rank(
    df: DataFrame,
    sort_cols: Sequence[str],
    partitions: int = 32,
    out_col: str = "__rank",
    materialize: bool = True,
) -> DataFrame:
    """Dense global rank under a total order WITHOUT a single-partition
    window: range-partition on the sort key, rank locally, then add each
    partition's offset (the scalable zipWithIndex shape — the offsets
    collect is bounded by the partition count, never the data).

    ``materialize`` controls the SECOND (output) checkpoint only — the
    input checkpoint that freezes range boundaries is unconditional
    (correctness). Keep the default for callers that consume the rank
    from two or more subplans (SNM's self-join, ensembles fanning out);
    pass ``False`` from single-pass consumers, which would otherwise pay
    a blocking materialization to save zero recomputes (VERDICT r15).
    Note the trade both checkpoints share: localCheckpoint storage is
    executor-local and non-recoverable — at cluster scale an executor
    loss under a truncated lineage fails the job instead of recomputing
    (acceptable for these node-row-sized rank frames; a 100 TB corpus
    materialization would use reliable checkpoint/storage instead)."""
    d = df.repartitionByRange(partitions, *[F.col(c) for c in sort_cols])
    # eager localCheckpoint (not persist) BEFORE the counts action: the
    # offsets below and the final plan must see the SAME partition
    # boundaries (range sampling may resample on recompute, which would
    # corrupt every offset). Checkpointing freezes the boundaries even
    # under memory pressure AND releases the blocks via the context
    # cleaner when the frame is GC'd — persist here leaked one cached
    # relation per call with no caller-reachable unpersist (ADVICE r6).
    d = d.withColumn("__pid", F.spark_partition_id()).localCheckpoint(eager=True)
    # bounded collect: one row per partition
    counts = {
        r["__pid"]: r["n"]
        for r in d.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_expr = F.lit(0)
    for pid, off in offsets.items():
        offset_expr = F.when(F.col("__pid") == pid, F.lit(off)).otherwise(offset_expr)
    from pyspark.sql import Window

    w = Window.partitionBy("__pid").orderBy(*[F.col(c).asc() for c in sort_cols])
    ranked = d.withColumn(
        out_col, (offset_expr + F.row_number().over(w) - 1).cast("long")
    ).drop("__pid")
    if not materialize:
        return ranked
    # materialize the RANKED rows too (r15, guide §2.4): multi-consumer
    # callers (SNM joins the ranked frame to itself; the ensemble chains
    # ranks then fans out) would otherwise re-pay Exchange(__pid) + Sort
    # + Window per consumer, because the pre-window checkpoint loses
    # partitioning info. Measured at sf0.1: fuzzy_customer_pairs ran
    # FOUR rank windows for two passes. One node-row-sized
    # materialization replaces all of them.
    return ranked.localCheckpoint(eager=True)


def snm_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 10,
    max_distance: int = 2,
    partitions: int = 32,
    sort_key=None,
) -> DataFrame:
    """The candidate stage of one sorted-neighborhood pass, shared by the
    verify pipeline (``sorted_neighborhood_pairs``) and the scaling
    decomposition tool (``tools/fuzzy_sf1_decomp.py``) so measurements
    can never drift from the shipped plan: global sorted rank via range
    partitioning, bucket-adjacency equi-join (each record probes its own
    ``floor(rank/window)`` bucket and the previous one, so any two rows
    within ``window`` ranks share a bucket key in exactly one side),
    exact ``|rank diff| <= window`` filter, and the cheap length
    prefilter. Output columns: (id_a, id_b, __text_a, __text_b, __ra,
    __rb) — candidates ENTERING the levenshtein verify, N x window rows,
    linear in N by construction."""
    base = df.select(id_col, text_col)
    if sort_key is not None:
        base = base.withColumn("__sortkey", sort_key)
        sort_cols = ["__sortkey", id_col]
    else:
        sort_cols = [text_col, id_col]
    ranked = _global_sorted_rank(base, sort_cols, partitions).drop("__sortkey")
    bucket = F.floor(F.col("__rank") / window)
    a = ranked.select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("__text_a"),
        F.col("__rank").alias("__ra"),
        bucket.alias("__b"),
    )
    b = ranked.select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("__text_b"),
        F.col("__rank").alias("__rb"),
        F.explode(F.array(bucket, bucket - 1)).alias("__b"),
    )
    return (
        a.join(b, on="__b")
        .filter(
            (F.col("__rb") > F.col("__ra"))
            & (F.col("__rb") - F.col("__ra") <= window)
        )
        .filter(
            F.abs(F.length("__text_a") - F.length("__text_b")) <= max_distance
        )
        # the bucket key is join plumbing, not part of the documented
        # (id_a, id_b, __text_a, __text_b, __ra, __rb) contract
        .drop("__b")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 10,
    max_distance: int = 2,
    partitions: int = 32,
    sort_key=None,
) -> DataFrame:
    """Sorted-neighborhood entity resolution (Hernández & Stolfo 1995) —
    the SCALE path where a natural blocking key is missing or too
    coarse (see `blocked_fuzzy_pairs`: a constant-cardinality key makes
    intra-block work quadratic in N). Sort the corpus once, compare each
    record only to its ``window`` neighbors in sort order: candidate
    count is N×window — LINEAR in N by construction, for any corpus.

    Mechanics: global sorted rank via range partitioning (no
    single-partition window), neighbor candidates via an equi-join on
    ``floor(rank/window)`` buckets (each bucket joins itself and its
    successor, so every pair within ``window`` ranks co-occurs in ≥1
    bucket pair), exact ``|rank diff| <= window`` filter, then the same
    threshold-bounded levenshtein verify as the blocked variant.

    Known SNM property (why this is candidates-only, recall-tested, not
    oracle-exact): a typo in the leading characters can sort a record
    far from its twin. Production runs multi-pass with rotated sort keys;
    the single-pass recall contract is unit-tested on planted mid/late
    typos."""
    candidates = snm_candidate_pairs(
        df, text_col, id_col, window, max_distance, partitions, sort_key
    )
    return (
        candidates.select(
            # pairs are unique by RANK order; canonicalize to id order
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.levenshtein(
                F.col("__text_a"), F.col("__text_b"), max_distance + 1
            ).alias("edit_distance"),
        )
        .filter(
            (F.col("edit_distance") >= 0) & (F.col("edit_distance") <= max_distance)
        )
    )


def multi_pass_snm_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 10,
    max_distance: int = 2,
    partitions: int = 32,
) -> DataFrame:
    """Multi-pass sorted neighborhood — the production SNM shape: one
    pass sorted on the text, one on its REVERSE. A single pass misses
    twins whose difference is in the leading characters (they sort far
    apart); under the reversed key those same twins become sort
    neighbors. Any pair within ``max_distance`` differs in at most
    ``max_distance`` positions, so it is adjacent-ish under at least one
    of the two keys unless edits hit both extremes — each extra pass
    multiplies candidates by a constant, keeping the total linear.
    Pairs are unioned and deduplicated (same canonical id order and
    distance from both passes)."""
    fwd = sorted_neighborhood_pairs(
        df, text_col, id_col, window, max_distance, partitions
    )
    rev = sorted_neighborhood_pairs(
        df,
        text_col,
        id_col,
        window,
        max_distance,
        partitions,
        sort_key=F.reverse(F.col(text_col)),
    )
    return fwd.unionByName(rev).dropDuplicates(["id_a", "id_b"])
