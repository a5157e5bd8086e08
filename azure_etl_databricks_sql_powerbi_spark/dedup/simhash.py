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
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """(id, fp) 64-bit SimHash fingerprints, one hash-aggregate."""
    tok = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode_outer(tokens(text_col)).alias("t"),
    ).select("id", F.xxhash64("t", F.lit(seed)).alias("h"))
    # sign of the ±1 fold == majority vote: bit j of the fingerprint is set
    # iff 2 * (#tokens with bit j set) > #tokens — so each aggregate is a
    # plain sum of an extracted bit, no conditional per row. Empty docs:
    # their single null row makes every c_j NULL -> no bit set -> fp = 0.
    sums = tok.groupBy("id").agg(
        *[
            F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))).alias(f"c{j}")
            for j in range(64)
        ],
        F.count(F.lit(1)).alias("n"),
    )
    # pack majority bits into a long (j=63 is the sign bit: 1<<63 doesn't
    # fit a signed long, use its two's-complement value)
    packed = F.lit(0).cast("long")
    for j in range(64):
        bit_literal = (1 << j) if j < 63 else -(1 << 63)
        packed = packed.bitwiseOR(
            F.when(
                F.col(f"c{j}") * 2 > F.col("n"), F.lit(bit_literal).cast("long")
            ).otherwise(F.lit(0).cast("long"))
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

    Uses (max_hamming+1) bands; band width = 64 // bands.
    """
    n_bands = max_hamming + 1
    band_bits = 64 // n_bands
    fps = simhash_fingerprints(df, text_col, id_col, seed)
    banded = fps.select(
        "id",
        "fp",
        F.posexplode(
            F.array(*[_band(F.col("fp"), b, band_bits) for b in range(n_bands)])
        ).alias("band_idx", "band_val"),
    )
    # one groupBy on the band key + in-bucket pair expansion (instead of a
    # self-join, which would compute the fingerprint aggregate twice and
    # shuffle both sides); bucket contents are (id, fp) structs — 16 bytes
    buckets = (
        banded.groupBy("band_idx", "band_val")
        .agg(F.collect_list(F.struct("id", "fp")).alias("ms"))
        .filter(F.size("ms") >= 2)
    )
    sorted_ms = F.array_sort("ms")  # struct sort: by id first
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    sorted_ms,
                    lambda x, i: F.transform(
                        F.slice(sorted_ms, i + 2, F.size(sorted_ms)),
                        lambda y: F.struct(
                            x["id"].alias("id_a"),
                            y["id"].alias("id_b"),
                            F.bit_count(x["fp"].bitwiseXOR(y["fp"])).alias("hamming"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b", "p.hamming")
    return pairs.filter(F.col("hamming") <= max_hamming).distinct()
