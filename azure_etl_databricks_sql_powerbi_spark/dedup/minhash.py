"""MinHash + LSH near-duplicate detection (shingle → minhash → band →
bucket-join), built entirely from Catalyst expressions — no UDFs, no MLlib
model fitting, deterministic given the seed.

Pipeline (the standard construction, e.g. Broder '97 / MMDS ch.3):

1. shingle: word n-grams per doc (``functions.text.word_ngrams``), exploded
   to one (doc, shingle-hash) row each — the string is hashed ONCE with
   ``xxhash64`` and never carried further.
2. signature: k minhashes via ONE hash-aggregate:
   ``groupBy(id).agg(min(xxhash64(h, seed_i)) for i in range(k))``.
   Re-hashing the 8-byte shingle hash per signature slot stays inside
   whole-stage codegen with map-side partial aggregation — unlike a
   higher-order ``transform``/``aggregate`` formulation, which Spark
   evaluates interpreted per row. (Duplicates need no pre-dedup: ``min``
   over a multiset equals ``min`` over its set.)
3. bands: split the k signature columns into b bands of r, hash each band.
4. bucket-join: ``groupBy(band_idx, band_hash).agg(collect_list(id))`` then
   in-bucket pair expansion — ONE shuffle carrying (id, band_hash) pairs,
   never text. Oversized buckets (boilerplate shingles) are dropped by
   ``max_bucket``, the standard web-dedup guard bounding the quadratic
   in-bucket blowup.
5. verify: exact Jaccard on the docs' distinct shingle-hash sets
   (``collect_set`` from the same aggregate — the shuffled-exchange subtree
   is shared with step 2, so Spark's ReuseExchange computes it once).

At 100 TB: everything before the band groupBy is scan + map-side combine;
the two shuffles carry ~(k·8 + b·16) bytes/doc. Skewed buckets are capped;
AQE handles residual skew in the verify join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.text import word_ngrams
from azure_etl_databricks_sql_powerbi_spark.util import spread


def _signature_with_sets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ngram: int,
    num_hashes: int,
    seed: int,
) -> DataFrame:
    """One shuffle: (id, mh0..mh{k-1}, sh=set of shingle hashes)."""
    hashed = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(text_col, ngram)).alias("s"),
    ).select("id", F.xxhash64(F.col("s"), F.lit(seed)).alias("h"))
    return hashed.groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.col("h"), F.lit(seed + 1 + i))).alias(f"mh{i}")
            for i in range(num_hashes)
        ],
        F.collect_set("h").alias("sh"),
    )


def band_cols(num_hashes: int, bands: int) -> list[Column]:
    """Hash each band of r = k/b signature columns -> b long columns."""
    rows_per_band = num_hashes // bands
    return [
        F.xxhash64(
            F.concat_ws(
                ",",
                *[
                    F.col(f"mh{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
        ).alias(f"band{b}")
        for b in range(bands)
    ]


def candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    max_bucket: int = 1000,
    observation: Observation | None = None,
) -> DataFrame:
    """(id_a, id_b) candidate pairs sharing >= 1 LSH band bucket."""
    assert num_hashes % bands == 0
    sig = _signature_with_sets(df, text_col, id_col, ngram, num_hashes, seed)
    return _candidates_from_sig(sig, num_hashes, bands, max_bucket, observation)


def _pairs_in_bucket(ids: Column) -> Column:
    """All (id_a < id_b) pairs within one bucket's id list."""
    sorted_ids = F.array_sort(ids)
    return F.flatten(
        F.transform(
            sorted_ids,
            lambda x, i: F.transform(
                F.slice(sorted_ids, i + 2, F.size(sorted_ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )


def _candidates_from_sig(
    sig: DataFrame,
    num_hashes: int,
    bands: int,
    max_bucket: int,
    observation: Observation | None = None,
) -> DataFrame:
    """In-bucket pair expansion after one groupBy on the band key.

    The higher-order ``transform``/``slice`` expansion runs interpreted,
    but MinHash buckets are tiny by construction (``max_bucket`` caps the
    quadratic blowup and the band hash spreads everything else), so the
    interpreted path over few-element arrays beats a self-join's extra
    shuffles here — the opposite trade from simhash's Hamming bands, which
    collide heavily by design (see simhash.near_dup_pairs; measured both
    ways at sf0.1: collect_list 1.2s vs self-join 2.7s for this operator).
    """
    grouped = (
        sig.select(
            "id",
            F.posexplode(F.array(*band_cols(num_hashes, bands))).alias(
                "band_idx", "band_hash"
            ),
        )
        .groupBy("band_idx", "band_hash")
        .agg(F.collect_list("id").alias("ids"))
    )
    if observation is not None:
        # "No silent caps": count over-cap buckets (and the member rows
        # excluded from pairing) before the filter drops them
        grouped = grouped.observe(
            observation,
            F.sum(
                F.when(F.size("ids") > max_bucket, 1).otherwise(0)
            ).alias("dropped_buckets"),
            F.sum(
                F.when(F.size("ids") > max_bucket, F.size("ids")).otherwise(0)
            ).alias("dropped_bucket_rows"),
        )
    buckets = grouped.filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    return (
        buckets.select(F.explode(_pairs_in_bucket(F.col("ids"))).alias("p"))
        .select("p.id_a", "p.id_b")
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
    max_bucket: int = 1000,
    observation: Observation | None = None,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard over distinct shingle-hash
    sets; returns (id_a, id_b, jaccard >= threshold).

    ``observation`` (optional) surfaces the ``max_bucket`` guard: after an
    action, ``observation.get`` reports ``dropped_buckets`` /
    ``dropped_bucket_rows`` instead of silently skipping oversized buckets.

    Jaccard is computed on the 64-bit shingle hashes rather than the shingle
    strings — identical up to xxhash64 collisions (~n²/2⁶⁴), and the verify
    join then shuffles 8-byte longs instead of raw text.
    """
    assert num_hashes % bands == 0
    from pyspark.storagelevel import StorageLevel

    # the signature table feeds three consumers (band buckets + both sides
    # of the verify join); exchange reuse does NOT cover all three
    # subtrees (measured: ~1.5s persisted vs ~2.2s recomputed at sf0.1),
    # so persist it once — it is the small derivative (k longs + hashed
    # shingle set per doc), orders of magnitude under the corpus, and
    # MEMORY_AND_DISK spills safely at scale
    sig = _signature_with_sets(df, text_col, id_col, ngram, num_hashes, seed).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cands = _candidates_from_sig(sig, num_hashes, bands, max_bucket, observation)
    sets_a = sig.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sets_b = sig.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cands.join(sets_a, on="id_a")
        .join(sets_b, on="id_b")
        .withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1)), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------ persisted LSH index


def save_minhash_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> None:
    """Persist the corpus's LSH state so day-N batches find near-dups
    AGAINST the corpus without ever re-shingling it — the near-dup
    completion of the persisted-state family (exact dedup has
    ``save_corpus_state``; ANN has ``similarity.index.save_index``):

    - ``{path}/bands/`` — (band_idx, band_hash, id, bucket_size) parquet,
      PARTITIONED BY band_idx: a probe joins on (band_idx, band_hash), so
      each of the b band joins reads only its own partition, and
      ``bucket_size`` is precomputed so the boilerplate guard
      (``max_bucket``) filters index-side WITHOUT re-counting.
    - ``{path}/shingles/`` — (id, sh) distinct shingle-hash sets for the
      exact-Jaccard verify (8-byte hashes, never text).
    - ``{path}/meta.json`` — the signature parameters; a probe MUST use
      identical (ngram, num_hashes, bands, seed) or buckets are garbage,
      so the probe reads them from here rather than trusting the caller.

    The corpus is scanned exactly once (one signature aggregate feeds
    both outputs)."""
    import json
    import os

    from pyspark.sql import Window as W

    sig = _signature_with_sets(corpus, text_col, id_col, ngram, num_hashes, seed)
    sig = sig.persist()
    band_rows = sig.select(
        "id",
        F.posexplode(F.array(*band_cols(num_hashes, bands))).alias(
            "band_idx", "band_hash"
        ),
    )
    sized = band_rows.withColumn(
        "bucket_size",
        F.count(F.lit(1)).over(W.partitionBy("band_idx", "band_hash")),
    )
    sized.write.mode("overwrite").partitionBy("band_idx").parquet(
        os.path.join(path, "bands")
    )
    sig.select("id", "sh").write.mode("overwrite").parquet(
        os.path.join(path, "shingles")
    )
    sig.unpersist()
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(
            {"ngram": ngram, "num_hashes": num_hashes, "bands": bands, "seed": seed},
            fh,
        )


def near_dups_against_index(
    batch: DataFrame,
    spark,
    path: str,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 1000,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate pairs between ``batch`` and the indexed corpus —
    the corpus side costs parquet scans only (band buckets + shingle
    sets), never a re-shingle: the batch is signed with the INDEX's
    parameters (read from meta.json), batch band rows equi-join the
    stored buckets (band_idx partition pruning + the precomputed
    ``bucket_size <= max_bucket`` boilerplate guard), and candidates are
    verified with the same exact-Jaccard the one-shot operator uses,
    reading corpus shingle sets FROM the index.

    Output: (batch_id, corpus_id, jaccard) with jaccard >= threshold;
    a batch doc that IS in the corpus (same id) self-matches — filter
    ``batch_id != corpus_id`` upstream if ids share a space and that is
    unwanted. ``materialize=False`` skips the eager checkpoint (and the
    batch-signature unpersist) so tests can assert the LIVE plan scans
    only index parquet, never the corpus source."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    bsig = _signature_with_sets(
        batch, text_col, id_col, meta["ngram"], meta["num_hashes"], meta["seed"]
    ).persist()
    bband = bsig.select(
        F.col("id").alias("batch_id"),
        F.posexplode(
            F.array(*band_cols(meta["num_hashes"], meta["bands"]))
        ).alias("band_idx", "band_hash"),
    )
    index_bands = spark.read.parquet(os.path.join(path, "bands")).filter(
        F.col("bucket_size") <= max_bucket
    )
    cands = (
        bband.join(index_bands, on=["band_idx", "band_hash"])
        .select("batch_id", F.col("id").alias("corpus_id"))
        .distinct()
    )
    corpus_sets = spark.read.parquet(os.path.join(path, "shingles")).select(
        F.col("id").alias("corpus_id"), F.col("sh").alias("sh_c")
    )
    batch_sets = bsig.select(F.col("id").alias("batch_id"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_b", "sh_c"))
    union = F.size(F.array_union("sh_b", "sh_c"))
    out = (
        cands.join(batch_sets, on="batch_id")
        .join(corpus_sets, on="corpus_id")
        .withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1)), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("batch_id", "corpus_id", "jaccard")
    )
    if not materialize:
        return out
    out = out.localCheckpoint(eager=True)
    bsig.unpersist()
    return out
