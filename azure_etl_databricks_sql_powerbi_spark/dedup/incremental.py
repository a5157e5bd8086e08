"""Incremental (batch-vs-corpus) dedup with a bloom prefilter.

The daily-ingest problem at 100 TB: a new crawl batch arrives and must be
deduped against the EXISTING corpus without re-shuffling the corpus per
batch. The classic pattern (what Spark's runtime bloom-filter join does
internally, but ``bloom_filter_agg`` is not exposed to users — hand-rolled
here):

1. Build one bloom filter over the corpus fingerprints: each corpus
   partition folds its hashes into a fixed-size bit array
   (``mapInPandas``, vectorized numpy double-hashing), the per-partition
   bitmaps are OR-reduced on the driver (bounded: ``n_bits/8`` bytes per
   partition, independent of corpus rows) and broadcast.
2. Probe the NEW batch against the broadcast bloom (Arrow-batched,
   numpy): bloom-NEGATIVE rows are *definitely novel* (blooms have no
   false negatives) and skip the join entirely.
3. Only bloom-POSITIVE rows (true dups + ~fpp false positives) go
   through the exact-confirm LEFT ANTI join on the md5 fingerprint.

Net effect: the per-batch shuffle carries ``dup_rate + fpp`` of the batch
instead of all of it, and the corpus is never re-shuffled (its distinct
fingerprint table is a one-time build the daily job reuses). Semantics
are EXACT — identical to a plain anti-join — for any fpp; the bloom only
prunes rows the join would drop anyway... in the negative direction.

No reference counterpart (the reference re-extracts full snapshots daily,
``run_extract.py:41-44``); this is the north-star incremental-ingest
surface.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Standard sizing: m = -n ln p / (ln 2)^2 bits, k = (m/n) ln 2
    probes. m is rounded up to a byte multiple, k clamped to [1, 16]."""
    n = max(1, expected_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 7) // 8) * 8
    k = max(1, min(16, round((m / n) * math.log(2))))
    return m, k


def build_bloom(
    df: DataFrame, hash_col: str, expected_items: int, fpp: float = 0.01
) -> tuple[bytes, int, int]:
    """One bloom filter over ``df[hash_col]`` (xxhash64 longs): partial
    bitmap per partition via ``mapInPandas``, OR-reduce on the driver.

    Driver-side contract (documented, bounded): the collect returns at
    most ``num_partitions`` bitmaps of ``n_bits/8`` bytes each — sized by
    the filter, never by the data. Returns (bitmap, n_bits, k)."""
    from azure_etl_databricks_sql_powerbi_spark.util import pkg_parent as _pp

    n_bits, k = bloom_params(expected_items, fpp)
    pkg_parent = _pp()

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # sys.path bootstrap + in-closure import: executor tasks must not
        # unpickle engine-module globals by module name (multimodal/ops.py
        # pattern)
        import sys

        if pkg_parent not in sys.path:
            sys.path.insert(0, pkg_parent)
        import numpy as np

        from azure_etl_databricks_sql_powerbi_spark.util import (
            double_hash_positions,
        )

        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        seen = False
        for pdf in it:
            if len(pdf):
                seen = True
                pos = double_hash_positions(pdf[hash_col].values, n_bits, k).ravel()
                np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    import numpy as np

    acc = np.zeros(n_bits // 8, dtype=np.uint8)
    for row in df.select(hash_col).mapInPandas(partial, "bitmap binary").collect():
        acc |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return acc.tobytes(), n_bits, k


def split_by_bloom(
    df: DataFrame, hash_col: str, bitmap: bytes, n_bits: int, k: int
) -> DataFrame:
    """Adds ``__bloom_hit int`` (1 = possibly in corpus, 0 = definitely
    novel) via a broadcast bitmap probe — Arrow-batched, numpy, no JVM
    round-trips per row."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    from azure_etl_databricks_sql_powerbi_spark.util import pkg_parent as _pp

    spark = df.sparkSession
    # Driver-side contract: one broadcast of the bitmap per call, released
    # at session end (Spark has no post-action hook to unpersist a lazily
    # consumed broadcast). Size is bounded by the filter (n_bits/8 bytes),
    # never the data; long-lived sessions issuing many calls should reuse
    # one (bitmap, n_bits, k) across batches — that reuse is the intended
    # daily-ingest shape anyway.
    bc = spark.sparkContext.broadcast(bitmap)
    # fresh StructType: StructType.add would MUTATE df's live schema object
    out_schema = StructType(
        list(df.schema.fields) + [StructField("__bloom_hit", IntegerType())]
    )
    pkg_parent = _pp()

    def probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # bootstrap + in-closure import: see build_bloom
        import sys

        if pkg_parent not in sys.path:
            sys.path.insert(0, pkg_parent)
        import numpy as np

        from azure_etl_databricks_sql_powerbi_spark.util import (
            double_hash_positions,
        )

        bits = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in it:
            if not len(pdf):
                continue
            pos = double_hash_positions(pdf[hash_col].values, n_bits, k)
            hit = (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
            pdf = pdf.copy()
            pdf["__bloom_hit"] = hit.all(axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(probe, out_schema)


def novel_documents(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Rows of ``batch`` whose ``text_col`` does NOT appear in ``corpus``
    — exact anti-join semantics, bloom-accelerated.

    Output: (id_col, fingerprint md5-hex) ordered by id. The md5
    fingerprint (not raw text) is both the join key (16 bytes through the
    shuffle instead of documents) and the oracle-checkable output."""
    if expected_items is None:
        # one corpus pass; at known scale pass the inventory in instead
        expected_items = corpus.count() or 1
    fp = F.md5(F.col(text_col))
    h = F.xxhash64(F.col(text_col))
    corpus_hashes = corpus.select(h.alias("__h"), fp.alias("__fp"))
    bitmap, n_bits, k = build_bloom(corpus_hashes, "__h", expected_items, fpp)

    probed = split_by_bloom(
        batch.select(F.col(id_col), fp.alias("fingerprint"), h.alias("__h")),
        "__h",
        bitmap,
        n_bits,
        k,
    )
    definite_novel = probed.filter(F.col("__bloom_hit") == 0)
    # exact-confirm only the bloom positives (true dups + ~fpp FPs)
    confirmed_novel = probed.filter(F.col("__bloom_hit") == 1).join(
        corpus_hashes.select(F.col("__fp").alias("fingerprint")).distinct(),
        on="fingerprint",
        how="left_anti",
    )
    return (
        definite_novel.select(id_col, "fingerprint")
        .unionByName(confirmed_novel.select(id_col, "fingerprint"))
        .orderBy(id_col)
    )
