"""MinHash + LSH near-duplicate detection (shingle → minhash → band →
bucket-join), built entirely from Catalyst expressions — no UDFs, no MLlib
model fitting, deterministic given the seed.

Pipeline (the standard construction, e.g. Broder '97 / MMDS ch.3):

1. shingle: word n-grams per doc (``functions.text.word_ngrams``)
2. signature: k minhashes; minhash_i = min over shingles of
   ``xxhash64(shingle, seed_i)`` — computed as ``array_min(transform(...))``
   per row, JVM-side
3. bands: split the k-vector into b bands of r values; hash each band
4. bucket-join: docs sharing any (band_idx, band_hash) are candidates —
   a groupBy/self-join on the band key, the ONLY shuffle in the pipeline,
   and it shuffles (doc_id, band_hash) pairs, never text
5. verify: exact Jaccard on distinct shingle sets for candidate pairs

At 100 TB: the candidate step is linear in corpus size (b rows per doc);
skewed buckets (boilerplate shingles) are capped by ``max_bucket`` to bound
the quadratic blowup inside a bucket — the standard guard in web-dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.text import word_ngrams


def minhash_signature(shingles: Column, num_hashes: int = 32, seed: int = 42) -> Column:
    """k-wide MinHash signature of an array<string> column."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s, i=i: F.xxhash64(s, F.lit(seed + i))))
            for i in range(num_hashes)
        ]
    )


def band_hashes(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Hash each band of the signature -> array<long> of length ``bands``."""
    return F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(signature, b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias(f"band{b}")
            for b in range(bands)
        ]
    )


def candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """(id_a, id_b) candidate pairs sharing >= 1 LSH band bucket."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        band_hashes(
            minhash_signature(
                F.array_distinct(word_ngrams(text_col, ngram)), num_hashes, seed
            ),
            bands,
            rows_per_band,
        ).alias("bands"),
    )
    buckets = sig.select(
        "id", F.posexplode("bands").alias("band_idx", "band_hash")
    )
    # cap pathological buckets (boilerplate) to bound the self-join blowup
    sized = buckets.withColumn(
        "__bucket_n",
        F.count(F.lit(1)).over(Window.partitionBy("band_idx", "band_hash")),
    ).filter(F.col("__bucket_n") <= max_bucket)
    left = sized.select("band_idx", "band_hash", F.col("id").alias("id_a"))
    right = sized.select("band_idx", "band_hash", F.col("id").alias("id_b"))
    return (
        left.join(right, on=["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    ngram: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard over distinct shingle
    sets; returns (id_a, id_b, jaccard >= threshold)."""
    cands = candidate_pairs(df, text_col, id_col, ngram, num_hashes, bands, seed)
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_ngrams(text_col, ngram)).alias("sh"),
    )
    a = shingled.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = shingled.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cands.join(a, on="id_a")
        .join(b, on="id_b")
        .withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1)), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
