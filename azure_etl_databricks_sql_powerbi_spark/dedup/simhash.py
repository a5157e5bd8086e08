"""SimHash near-duplicate detection — 64-bit fingerprints, Hamming-ball
matching via band-pigeonhole blocking. Pure Catalyst expressions.

Construction (Charikar '02): per token, take a 64-bit hash; for each bit
position accumulate +1/-1 across tokens; the sign of each accumulator is
the fingerprint bit. Two docs are near-dups when the Hamming distance of
their fingerprints <= k.

Implementation notes:
- the per-doc fold is ``aggregate(tokens, zeros[64], elementwise±1)`` —
  one projection, no explode, no shuffle, no UDF;
- matching: split 64 bits into (k+1) bands; Hamming <= k implies at least
  one identical band (pigeonhole), so an equi-join on (band_idx, band_val)
  finds all candidates — the only shuffle, carrying (id, 16-bit band) rows;
- verify: ``bit_count(a XOR b) <= k`` — one instruction per pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.text import tokens


def simhash64(text_col: Column | str, seed: int = 42) -> Column:
    """64-bit SimHash of whitespace tokens (JVM-side fold).

    Shift amounts must be Python ints (``F.shiftright`` takes no Column
    numBits), so the 64 bit positions are unrolled driver-side into the
    expression tree — still one projection at runtime.
    """
    toks = tokens(text_col)

    def bitvec(t: Column) -> Column:
        h = F.xxhash64(t, F.lit(seed))
        return F.array(
            *[
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                    F.lit(-1)
                )
                for j in range(64)
            ]
        )

    sums = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), 64),
        lambda acc, t: F.zip_with(acc, bitvec(t), lambda a, b: a + b),
    )
    # pack signs into a long: bit j set iff sums[j] > 0 (j=63 is the sign
    # bit: 1<<63 doesn't fit a signed long, use its two's-complement value)
    packed = F.lit(0).cast("long")
    for j in range(64):
        bit_literal = (1 << j) if j < 63 else -(1 << 63)
        packed = packed.bitwiseOR(
            F.when(F.element_at(sums, j + 1) > 0, F.lit(bit_literal).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return packed


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

    Uses (max_hamming+1) bands; band width = 64 // bands.
    """
    n_bands = max_hamming + 1
    band_bits = 64 // n_bands
    fps = df.select(F.col(id_col).alias("id"), simhash64(text_col, seed).alias("fp"))
    banded = fps.select(
        "id",
        "fp",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"), _band(F.col("fp"), b, band_bits).alias("band_val"))
                for b in range(n_bands)
            ])
        ).alias("band"),
    ).select("id", "fp", "band.band_idx", "band.band_val")
    left = banded.select("band_idx", "band_val", F.col("id").alias("id_a"), F.col("fp").alias("fp_a"))
    right = banded.select("band_idx", "band_val", F.col("id").alias("id_b"), F.col("fp").alias("fp_b"))
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        left.join(right, on=["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )
