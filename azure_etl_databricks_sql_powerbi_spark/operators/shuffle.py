"""Training-order materialization: deterministic epoch shuffle, per-shard
manifests, and the sharded training-data writer.

The last mile of an LLM-data pipeline (north-star surface; no analog in
the reference, which stops at gold tables — cf. run_transform.py:76-92):
after curation, a corpus must reach the dataloader as N shards in a
reproducible pseudo-random order. The contract here:

- **Epoch shuffle** — a seeded deterministic permutation. Every row is
  keyed by ``md5('epoch<seed>:' || id)``: content-addressed, so the
  order is stable under re-runs, appends, and repartitioning (``rand()``
  or ``zipWithIndex`` would be neither), and PORTABLE — any engine with
  md5, including the DuckDB oracle, replays it bit-for-bit (the
  ``sampling.hash_bucket`` discipline).
- **No global sort.** A total order over 100 TB would range-shuffle the
  whole corpus through one ordering; dataloaders don't need it. Shard
  assignment is the key's top 32 bits mod ``n_shards`` and the order
  WITHIN a shard is the key itself — the same distributional guarantee
  (every shard is a uniform random sample; every in-shard prefix is
  unbiased), at the cost of ONE Exchange on ``shard_id`` plus per-shard
  sorts that parallelize perfectly. Size ``n_shards`` to the target
  shard payload (corpus_bytes / ~1-4 GiB), not the cluster width.
- **Manifest** — per-shard ``(n_docs, n_tokens, first/last doc, a
  56-bit order-independent xor fingerprint)``: the receipt a training
  job checks before burning GPU-hours, and the resume index for
  mid-epoch restarts. Because the window already hash-partitions by
  ``shard_id``, the manifest's aggregation reuses that partitioning —
  the whole shuffle+manifest plan carries exactly one Exchange
  (pinned in tests/test_shuffle.py).

The fingerprint is DELIBERATELY computed from the unseeded content
digest ``md5(id)`` (chars 9..22 = 56 bits), not from the seeded epoch
key that drives shard assignment: shard membership changes with the
seed, but each doc's fingerprint contribution does not — so the xor of
ALL shards' fingerprints is a corpus invariant across epochs/seeds (the
cheapest possible cross-epoch "same corpus?" receipt; pinned in
tests/test_shuffle.py::test_fingerprint_xor_is_seed_invariant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..util import hex_prefix_long

__all__ = [
    "epoch_key",
    "epoch_shuffle",
    "shard_manifest",
    "write_training_shards",
    "duckdb_shard_manifest_sql",
    "resume_from_cursor",
]


def epoch_key(on: Column | str, seed: int = 0) -> Column:
    """Seeded permutation key: md5 hex of ``'epoch<seed>:' || id``."""
    c = F.col(on) if isinstance(on, str) else on
    return F.md5(F.concat(F.lit(f"epoch{seed}:"), c.cast("string")))


def epoch_shuffle(
    df: DataFrame,
    on: str = "doc_id",
    seed: int = 0,
    n_shards: int = 16,
    shard_col: str = "shard_id",
    pos_col: str = "pos",
) -> DataFrame:
    """Append ``(shard_id, pos)``: a deterministic epoch-shuffled
    training order as N independently-ordered shards.

    ``shard_id`` = top 32 key bits mod ``n_shards``; ``pos`` = 0-based
    rank within the shard by ``(key, id)`` — the id tie-break makes the
    order total even under (astronomically unlikely) md5-prefix ties.
    One Exchange on ``shard_id``; nothing global.
    """
    clash = {"__ekey", shard_col, pos_col} & set(df.columns)
    if clash:
        raise ValueError(
            f"epoch_shuffle would overwrite existing column(s) {sorted(clash)}; "
            "rename them or pass different shard_col/pos_col"
        )
    key = epoch_key(on, seed)
    out = df.withColumn("__ekey", key).withColumn(
        shard_col,
        (hex_prefix_long("__ekey", 1, 8) % n_shards).cast("int"),
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("__ekey"), F.col(on))
    return (
        out.withColumn(pos_col, (F.row_number().over(w) - 1).cast("long"))
        .drop("__ekey")
    )


def shard_manifest(
    shuffled: DataFrame,
    on: str = "doc_id",
    text_col: str | None = None,
    shard_col: str = "shard_id",
    pos_col: str = "pos",
) -> DataFrame:
    """Per-shard receipt over an ``epoch_shuffle`` output.

    Columns: ``shard_id, n_docs, first_doc, last_doc, fingerprint`` and,
    when ``text_col`` is given, ``n_tokens`` (whitespace tokens — the
    corpus-wide token-accounting convention of ``functions.text``).
    ``fingerprint`` xors each doc's 56-bit slice of the UNSEEDED content
    digest ``md5(id)`` — commutative (needs no order, can't overflow a
    BIGINT) and seed-independent, so the xor across all shards is a
    cross-epoch corpus invariant (see module docstring);
    ``first/last_doc`` are the shard's positional boundary docs
    (``min_by/max_by`` on ``pos``), the spot-check anchors for a resume.
    """
    fp_bits = hex_prefix_long(F.md5(F.col(on).cast("string")), 9, 14)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.min_by(F.col(on), F.col(pos_col)).alias("first_doc"),
        F.max_by(F.col(on), F.col(pos_col)).alias("last_doc"),
        F.bit_xor(fp_bits).alias("fingerprint"),
    ]
    if text_col is not None:
        aggs.insert(1, F.sum(token_count(text_col)).cast("long").alias("n_tokens"))
    return shuffled.groupBy(shard_col).agg(*aggs).orderBy(shard_col)


def duckdb_shard_manifest_sql(
    table: str = "documents",
    on: str = "doc_id",
    seed: int = 0,
    n_shards: int = 16,
    text_col: str | None = None,
) -> str:
    """Module-owned DuckDB replay of ``epoch_shuffle`` + ``shard_manifest``
    (dual-dialect oracle builder — the ``hash_bucket`` md5 idiom)."""
    tokens_sql = (
        r"""
               CAST(SUM(CASE WHEN LENGTH(TRIM({t})) = 0 THEN 0
                        ELSE len(string_split_regex(TRIM({t}), '\s+'))
                   END) AS BIGINT) AS n_tokens,""".format(t=text_col)
        if text_col is not None
        else ""
    )
    return f"""
        WITH k AS (
            SELECT *,
                   md5(concat('epoch{seed}:', CAST({on} AS VARCHAR))) AS ekey
            FROM {table}
        ), s AS (
            SELECT *,
                   CAST(CAST(concat('0x', substr(ekey, 1, 8)) AS UBIGINT)
                        % {n_shards} AS INT) AS shard_id,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY CAST(CAST(concat('0x', substr(ekey, 1, 8))
                                         AS UBIGINT) % {n_shards} AS INT)
                       ORDER BY ekey, {on}
                   ) - 1 AS BIGINT) AS pos
            FROM k
        )
        SELECT shard_id,
               COUNT(*) AS n_docs,{tokens_sql}
               arg_min({on}, pos) AS first_doc,
               arg_max({on}, pos) AS last_doc,
               CAST(bit_xor(CAST(concat('0x',
                        substr(md5(CAST({on} AS VARCHAR)), 9, 14))
                    AS UBIGINT)) AS BIGINT) AS fingerprint
        FROM s
        GROUP BY shard_id
        ORDER BY shard_id
    """


def write_training_shards(
    df: DataFrame,
    path: str,
    on: str = "doc_id",
    seed: int = 0,
    n_shards: int = 16,
    text_col: str | None = None,
) -> DataFrame:
    """Materialize the epoch-shuffled order as ``shard_id=K`` parquet
    dirs, rows stored in shard order, and return the manifest of what
    was WRITTEN (computed by reading the files back — the receipt
    certifies the sink, not the plan).

    All rows of a shard hash to the same task (``repartition`` on
    ``shard_id``), so each shard directory holds exactly one file whose
    row order is ``pos`` (``sortWithinPartitions``; parquet preserves
    in-file order). A task may carry several shards when ``n_shards``
    exceeds the partition count's hash range — still one file per shard.
    """
    sh = epoch_shuffle(df, on=on, seed=seed, n_shards=n_shards)
    (
        sh.repartition(n_shards, F.col("shard_id"))
        .sortWithinPartitions("shard_id", "pos")
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .parquet(path)
    )
    back = sh.sparkSession.read.parquet(path)
    return shard_manifest(back, on=on, text_col=text_col)


def resume_from_cursor(
    shuffled: DataFrame,
    cursor: DataFrame,
    shard_col: str = "shard_id",
    pos_col: str = "pos",
    next_pos_col: str = "next_pos",
) -> DataFrame:
    """The mid-epoch restart the manifest exists for: drop every row a
    crashed training job already consumed.

    ``cursor`` is ``(<shard_col>, <next_pos_col>)`` — per shard, the
    first position NOT yet consumed (0 = nothing consumed; a shard
    absent from the cursor restarts from 0). Append-style checkpoint
    logs are welcome: multiple rows per shard reduce to the FURTHEST
    position (max) before the join, so a stale duplicate can never
    re-emit consumed rows. One broadcast join + a map-side filter: no
    shuffle, so resuming a 100 TB epoch costs one scan of the
    unconsumed remainder. Determinism of the remainder is exactly the
    epoch_shuffle guarantee — same seed, same corpus, same order.
    """
    clash = {"__cur_shard", "__cur_pos"} & set(shuffled.columns)
    if clash:
        raise ValueError(
            f"resume_from_cursor's internal column(s) {sorted(clash)} already "
            "exist on the shuffled frame; rename them first"
        )
    cur = (
        cursor.select(
            F.col(shard_col).alias("__cur_shard"),
            F.col(next_pos_col).alias("__cur_pos"),
        )
        .groupBy("__cur_shard")
        .agg(F.max("__cur_pos").alias("__cur_pos"))
    )
    return (
        shuffled.join(
            F.broadcast(cur),
            shuffled[shard_col] == F.col("__cur_shard"),
            "left",
        )
        .filter(F.col(pos_col) >= F.coalesce(F.col("__cur_pos"), F.lit(0)))
        .drop("__cur_shard", "__cur_pos")
    )
