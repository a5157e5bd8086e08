"""SimHash near-duplicate detection — 64-bit fingerprints, Hamming-ball
matching via band-pigeonhole blocking. Pure Catalyst expressions.

Construction (Charikar '02): per token, take a 64-bit hash; for each bit
position accumulate +1/-1 across tokens; the sign of each accumulator is
the fingerprint bit. Two docs are near-dups when the Hamming distance of
their fingerprints <= k.

Implementation notes:
- the per-doc fold is ``explode(tokens)`` → ``groupBy(id).agg(64 × sum)``:
  one hash-aggregate with 64 long buffers, fully inside whole-stage codegen
  with map-side partial aggregation. (The alternative — a higher-order
  ``aggregate``/``zip_with`` fold building a 64-array per token — runs
  interpreted per row and allocates per element; ~10× slower measured.)
- ``explode_outer`` keeps empty docs: their null token contributes 0 to
  every bit sum, giving fingerprint 0 (matching the fold-over-empty-array
  semantics).
- matching: split 64 bits into (k+1) bands; Hamming <= k implies at least
  one identical band (pigeonhole), so an equi-join on (band_idx, band_val)
  finds all candidates — the only shuffle, carrying (id, 16-bit band) rows;
- verify: ``bit_count(a XOR b) <= k`` — one instruction per pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.text import tokens
from azure_etl_databricks_sql_powerbi_spark.util import spread


def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    counter_bits: int = 16,
) -> DataFrame:
    """(id, fp) 64-bit SimHash fingerprints, one hash-aggregate.

    The 64 per-bit token counters are packed ``counter_bits`` wide into
    ``64 / (64/counter_bits)`` long accumulators (16-bit fields -> 16 sum
    buffers instead of 64): each token contributes a packed long per
    accumulator and one ``SUM(long)`` accumulates 4 counters at once —
    measured ~2x faster than one sum per bit at sf0.1. Valid while every
    doc has < 2**counter_bits tokens (16 bits = 65,535; chunk longer docs
    upstream or pass counter_bits=32).
    """
    fields_per_long = 64 // counter_bits
    n_packed = 64 // fields_per_long
    tok = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode_outer(tokens(text_col)).alias("t"),
    ).select("id", F.xxhash64("t", F.lit(seed)).alias("h"))
    # sign of the ±1 fold == majority vote: bit j of the fingerprint is set
    # iff 2 * (#tokens with bit j set) > #tokens — each counter is a plain
    # sum of an extracted bit, no conditional per row. Empty docs: their
    # single explode_outer null row still hashes (xxhash64 skips null
    # children but hashes the seed literal), so every empty doc gets the
    # SAME deterministic non-zero fingerprint — empty docs pair with each
    # other, which is the dedup behavior we want.
    packed_exprs = []
    for k in range(n_packed):
        e = F.lit(0).cast("long")
        for i in range(fields_per_long):
            j = k * fields_per_long + i
            bit = F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))
            e = e + bit * F.lit(1 << (counter_bits * i)).cast("long")
        packed_exprs.append(e.alias(f"p{k}"))
    sums = tok.select("id", *packed_exprs).groupBy("id").agg(
        *[F.sum(f"p{k}").alias(f"s{k}") for k in range(n_packed)],
        F.count(F.lit(1)).alias("n"),
    )
    # unpack counters, take majority bits into a long (j=63 is the sign
    # bit: 1<<63 doesn't fit a signed long, use its two's-complement value)
    mask = (1 << counter_bits) - 1
    packed = F.lit(0).cast("long")
    for j in range(64):
        k, i = divmod(j, fields_per_long)
        c = F.shiftrightunsigned(F.col(f"s{k}"), counter_bits * i).bitwiseAND(
            F.lit(mask)
        )
        bit_literal = (1 << j) if j < 63 else -(1 << 63)
        packed = packed.bitwiseOR(
            F.when(c * 2 > F.col("n"), F.lit(bit_literal).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sums.select("id", packed.alias("fp"))


def _band(col: Column, band_idx: int, band_bits: int) -> Column:
    mask = (1 << band_bits) - 1
    return F.shiftrightunsigned(col, band_idx * band_bits).bitwiseAND(F.lit(mask))


def near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(simhash) <= max_hamming.

    Uses (max_hamming+1) bands; band width = 64 // bands. Candidates come
    from a banded SELF-equi-join: the whole pair expansion stays inside
    whole-stage codegen (an in-bucket expansion via collect_list +
    higher-order ``transform``/``slice`` runs interpreted per element —
    measured ~3x slower at 500k candidate pairs). The (id, fp) table is 16
    bytes/doc; persisting it keeps the fingerprint aggregate from running
    once per join side (measured 4x at sf0.1 — exchange reuse does not
    cover both alias sides reliably). At 1B docs the cache is ~16 GB
    cluster-wide and MEMORY_AND_DISK spills safely.
    """
    from pyspark.storagelevel import StorageLevel

    n_bands = max_hamming + 1
    band_bits = 64 // n_bands
    fps = simhash_fingerprints(df, text_col, id_col, seed).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    banded = fps.select(
        "id",
        "fp",
        F.posexplode(
            F.array(*[_band(F.col("fp"), b, band_bits) for b in range(n_bands)])
        ).alias("band_idx", "band_val"),
    )
    pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp"))).alias("hamming"),
        )
    )
    # distinct collapses pairs colliding in several bands; only surviving
    # near-dup pairs reach this final (small) shuffle
    return pairs.filter(F.col("hamming") <= max_hamming).distinct()


# ------------------------------------------------ persisted fingerprint index


def save_simhash_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    counter_bits: int = 16,
) -> None:
    """Persist the corpus's SimHash state — one (id, fp) parquet plus the
    fingerprint parameters. Unlike the MinHash index (which must store
    band buckets AND shingle sets), 8 bytes per document IS the complete
    state: probe-time bands derive from the fingerprint with pure bit
    math, and the Hamming verify reads the same column — the cheapest
    persisted near-dup identity in the family. meta.json pins
    (seed, counter_bits): a probe fingerprinted differently matches
    nothing, so the parameters travel with the state."""
    import json
    import os

    simhash_fingerprints(corpus, text_col, id_col, seed, counter_bits).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "fingerprints"))
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump({"seed": seed, "counter_bits": counter_bits}, fh)


def near_dups_against_simhash_index(
    batch: DataFrame,
    spark,
    path: str,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate (batch_id, corpus_id, hamming) pairs between a
    day-N batch and the indexed corpus, Hamming <= max_hamming — the
    corpus side costs one 8-byte-per-doc parquet scan, never a
    re-fingerprint. Bands on BOTH sides derive in-plan from the stored
    fp (band-pigeonhole: Hamming <= k implies >= 1 equal band of the
    k+1); candidates equi-join on (band_idx, band_val), then one
    bit_count(xor) verifies exactly."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    n_bands = max_hamming + 1
    band_bits = 64 // n_bands

    def banded(fps: DataFrame, idc: str) -> DataFrame:
        return fps.select(
            F.col("id").alias(idc),
            F.col("fp").alias(f"__fp_{idc}"),
            F.posexplode(
                F.array(*[_band(F.col("fp"), b, band_bits) for b in range(n_bands)])
            ).alias("band_idx", "band_val"),
        )

    bfps = simhash_fingerprints(
        batch, text_col, id_col, meta["seed"], meta["counter_bits"]
    )
    cfps = spark.read.parquet(os.path.join(path, "fingerprints"))
    pairs = banded(bfps, "batch_id").join(
        banded(cfps, "corpus_id"), on=["band_idx", "band_val"]
    )
    return (
        pairs.select(
            "batch_id",
            "corpus_id",
            F.bit_count(
                F.col("__fp_batch_id").bitwiseXOR(F.col("__fp_corpus_id"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
