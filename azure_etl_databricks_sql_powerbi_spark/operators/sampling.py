"""Dataset curation operators for training-data pipelines: deterministic
splits, stratified quota sampling, and sequence packing.

These are the ops a 100 TB LLM-data pipeline runs after cleaning/dedup
(north-star surface; no analog in the reference, which stops at gold
tables — cf. run_transform.py:76-92). All are pure Catalyst expressions:

- splits/sampling hash CONTENT (md5), not row position — assignment is
  reproducible across re-runs, partitionings, and engines (``rand()`` or
  zipWithIndex would be neither), and needs no shuffle at all: a split is
  a map-side filter, so each split of a 100 TB corpus is one scan.
- packing is one window cumsum per pack group — a single shuffle on the
  grouping key; bins never cross groups, so groups parallelize.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col: Column | str, buckets: int = 10_000, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets) from md5 of a column.

    md5 (not xxhash64) so the assignment is portable: any engine with md5
    — including the DuckDB oracle — reproduces it bit-for-bit. The first 8
    hex chars give 32 uniform bits, plenty for split ratios.
    """
    from ..util import hex_prefix_long

    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(c.cast("string"), F.lit(salt)))
    return (hex_prefix_long(h, 1, 8) % buckets).alias("bucket")


def deterministic_split(
    df: DataFrame,
    on: str,
    weights: Mapping[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Append a split label ('train'/'val'/...) by hashed content weight.

    Weights need not sum to 1 (they are normalized). Assignment depends
    only on ``on``'s value + salt: stable under re-runs, appends, and
    repartitioning — the property that makes held-out sets trustworthy
    when the corpus is rebuilt.
    """
    total = sum(weights.values())
    buckets = 10_000
    bucket = hash_bucket(on, buckets, salt)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = bucket < int(acc * buckets)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def leakage_safe_split(
    df: DataFrame,
    edges: DataFrame,
    weights: Mapping[str, float],
    id_col: str = "doc_id",
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Cluster-aware deterministic split: the split is assigned by the
    NEAR-DUP CLUSTER representative (``dedup/cluster.assign_clusters``
    minimum id), so a document and its near-duplicates always land in the
    same split — the train/test-contamination guard a plain per-document
    split cannot give (a test doc whose near-dup sits in train leaks the
    answer). ``edges`` is the candidate near-dup edge set (e.g.
    ``dedup/cluster.shingle_edges``); docs with no near-dup cluster to
    themselves and split exactly like ``deterministic_split``.

    Output: df columns + ``cluster_id`` + ``keep`` + ``out_col``.
    """
    from azure_etl_databricks_sql_powerbi_spark.dedup.cluster import assign_clusters

    clustered = assign_clusters(df, edges, id_col=id_col)
    return deterministic_split(
        clustered, on="cluster_id", weights=weights, salt=salt, out_col=out_col
    )


def quota_sample_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    n: int,
    on: str,
    salt: str = "",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic stratified sample: n rows per group, chosen by hash
    order (domain-mixing quotas). One shuffle on the group key; the hash
    order is uniform, so this is an unbiased without-replacement sample
    that every re-run reproduces."""
    h = hash_bucket(on, 1 << 32, salt)
    w = Window.partitionBy(*group_by).orderBy(h.asc(), F.col(on).asc())
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    ctx_len: int,
    order_by: Sequence[str],
    group_by: Sequence[str] = (),
    bin_col: str = "bin_id",
    offset_col: str = "start_offset",
) -> DataFrame:
    """Concatenate-and-chop sequence packing (the LLM-pretraining layout):
    documents are laid end-to-end in ``order_by`` order and cut into
    ``ctx_len``-token bins; a document may straddle a boundary.

    Emits each row's ``start_offset`` in the token stream and the bin its
    first token lands in. One window cumsum per ``group_by`` partition (no
    partition => one global stream: fine for bounded corpora, use groups
    at scale so each shard packs independently)."""
    w = (
        Window.partitionBy(*group_by)
        .orderBy(*[F.col(c).asc() for c in order_by])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return df.withColumn(offset_col, cum - F.col(token_col)).withColumn(
        bin_col, (F.col(offset_col) / ctx_len).cast("long")
    )


def weighted_sample(
    df: DataFrame,
    weight: Column | str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-ES): each row draws key ``-ln(u) / w`` from a
    pseudo-uniform u and the k SMALLEST keys win — inclusion probability
    proportional to weight, one pass, no replacement bookkeeping.

    Spark-exact and oracle-exact by construction:

    - u derives from md5(salt || id) — the same hex-prefix arithmetic as
      feature hashing (``functions/features.hash_bucket``), identical in
      DuckDB, so the "randomness" is a pure function of the row (re-runs
      and retries sample the SAME rows — the md5-split determinism
      contract of ``deterministic_split``).
    - the key is floor-quantized to integer micro-units with an id
      tiebreak. Quantization plus the tiebreak REDUCES boundary
      sensitivity (a 1-ulp ln divergence only matters when it crosses a
      micro-unit floor boundary, ~1e-6 of draws, AND that key sits
      exactly on the top-k cut); it does not eliminate it — cross-engine
      exactness ultimately rests on Spark and DuckDB libm agreeing on
      ln() for these inputs, which the driver's hash gate verifies
      empirically per scale factor.
    - top-k by (key_m, id) plans as TakeOrderedAndProject — no global
      sort at 100 TB.

    Rows with non-positive weight are excluded (zero mass)."""
    from ..util import hex_prefix_long

    w = F.col(weight) if isinstance(weight, str) else weight
    u32 = hex_prefix_long(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
    )
    # u in (0, 1]: (int + 1) / 2^32 — one IEEE division of exact integers
    u = (u32 + F.lit(1)).cast("double") / F.lit(4294967296.0)
    key_m = F.floor(((-F.ln(u)) / w.cast("double")) * F.lit(1e6)).cast("long")
    return (
        df.filter(w > 0)
        .withColumn("__key_m", key_m)
        .orderBy(F.col("__key_m").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__key_m")
    )
