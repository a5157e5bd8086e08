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

import json
import math
import os
import tempfile
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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
    n_bits, k = bloom_params(expected_items, fpp)
    return bloom_bitmap(df, hash_col, n_bits, k), n_bits, k


def bloom_bitmap(df: DataFrame, hash_col: str, n_bits: int, k: int) -> bytes:
    """Bitmap with FIXED (n_bits, k) — the mergeable primitive: bitmaps
    built with identical parameters OR together losslessly, which is what
    lets ``absorb_batch`` fold a day-N batch into an existing state
    without touching the corpus."""
    from azure_etl_databricks_sql_powerbi_spark.util import pkg_parent as _pp

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
    return acc.tobytes()


def split_by_bloom(
    df: DataFrame,
    hash_col: str,
    bitmap: bytes,
    n_bits: int,
    k: int,
    bloom_bc=None,
) -> DataFrame:
    """Adds ``__bloom_hit int`` (1 = possibly in corpus, 0 = definitely
    novel) via a broadcast bitmap probe — Arrow-batched, numpy, no JVM
    round-trips per row.

    Pass ``bloom_bc`` (a ``Broadcast[bytes]`` of the same bitmap, e.g.
    from ``CorpusState.bloom_broadcast``) to reuse one broadcast across
    many batches in a long-lived session instead of allocating a fresh
    one per call — the daily-ingest shape. Without it, one broadcast of
    ``n_bits/8`` bytes is created per call (bounded by the filter, never
    the data) and released at session end."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    from azure_etl_databricks_sql_powerbi_spark.util import pkg_parent as _pp

    spark = df.sparkSession
    bc = bloom_bc if bloom_bc is not None else spark.sparkContext.broadcast(bitmap)
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


@dataclass
class CorpusState:
    """The persisted identity of a corpus for incremental dedup: its
    distinct md5 fingerprint table (exact-confirm side) plus the bloom
    bitmap over the xxhash64 fingerprints (prefilter side).

    The whole point of this object is that day-N ingest never touches the
    corpus again: ``fingerprints`` is a small parquet table (16-byte hex
    per distinct document) and ``bitmap`` is sized by the filter, so the
    daily job's cost is O(batch), not O(corpus). ``bloom_broadcast``
    caches ONE Spark broadcast of the bitmap for reuse across batches
    (the ADVICE-r5 leak fix: wrappers used to allocate a fresh broadcast
    per call with no reuse path); call ``unpersist`` when retiring the
    state."""

    fingerprints: DataFrame  # columns: fingerprint (md5 hex), h (xxhash64)
    bitmap: bytes
    n_bits: int
    k: int
    # the fpp the bitmap was SIZED for (None for ad-hoc in-memory states):
    # the reference point the drift monitor compares against
    sized_fpp: float | None = None
    _bc: object | None = field(default=None, repr=False, compare=False)

    def bloom_broadcast(self, spark: SparkSession):
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(self.bitmap)
        return self._bc

    def unpersist(self) -> None:
        if self._bc is not None:
            self._bc.unpersist()
            self._bc = None

    def fill_ratio(self) -> float:
        """Fraction of set bits — the direct observable behind bloom fpp
        drift. One popcount over the model-sized bitmap."""
        import numpy as np

        arr = np.frombuffer(self.bitmap, dtype=np.uint8)
        return float(np.unpackbits(arr).sum()) / float(self.n_bits)

    def effective_fpp(self) -> float:
        """Current expected false-positive rate: a probe false-positives
        when all k probed bits are set, so fpp = fill_ratio ** k. At the
        sized inventory (optimal k) fill is ~0.5 and this equals
        ``sized_fpp``; absorbing past the inventory raises it."""
        return self.fill_ratio() ** self.k

    def needs_compaction(self, factor: float = 4.0) -> bool:
        """Data-driven re-size trigger (VERDICT r7 item: the 'periodic
        save_corpus_state is the compaction' prose, made a monitored
        threshold): True once the measured effective fpp exceeds
        ``factor``x what the bitmap was sized for. Drift costs exact-
        confirm work, never correctness, so the factor trades bitmap
        rebuild cost against wasted anti-join probes."""
        if self.sized_fpp is None:
            return False
        return self.effective_fpp() > factor * self.sized_fpp


def _fingerprint_cols(text_col: str) -> tuple:
    return F.md5(F.col(text_col)), F.xxhash64(F.col(text_col))


def build_corpus_state(
    corpus: DataFrame,
    text_col: str = "text",
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> CorpusState:
    """One-time (or per-compaction) corpus pass: distinct fingerprint
    table + bloom bitmap. In-memory variant; ``save_corpus_state`` is the
    durable one."""
    if expected_items is None:
        # one corpus pass; at known scale pass the inventory in instead
        expected_items = corpus.count() or 1
    fp, h = _fingerprint_cols(text_col)
    fingerprints = corpus.select(
        fp.alias("fingerprint"), h.alias("h")
    ).distinct()
    bitmap, n_bits, k = build_bloom(fingerprints, "h", expected_items, fpp)
    return CorpusState(fingerprints, bitmap, n_bits, k, sized_fpp=fpp)


def save_corpus_state(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> CorpusState:
    """Materialize the corpus dedup state under ``path``:

    - ``{path}/fingerprints/`` — parquet (fingerprint md5-hex, h xxhash64),
      distinct; the exact-confirm side of every future batch.
    - ``{path}/bloom.bin`` — the raw bitmap bytes.
    - ``{path}/meta.json`` — ``{n_bits, k, fpp}`` so the probe is
      reconstructed exactly.

    The returned state reads fingerprints back FROM THE PARQUET, so the
    bloom build is the last time the corpus itself is ever scanned.
    Local-fs writes here; on a cluster the same layout lands on
    ``abfss://`` via the Hadoop path builders in ``sources/cloudfs.py``."""
    if expected_items is None:
        expected_items = corpus.count() or 1
    spark = corpus.sparkSession
    fp, h = _fingerprint_cols(text_col)
    fp_path = os.path.join(path, "fingerprints")
    corpus.select(fp.alias("fingerprint"), h.alias("h")).distinct().write.mode(
        "overwrite"
    ).parquet(fp_path)
    fingerprints = spark.read.parquet(fp_path)
    bitmap, n_bits, k = build_bloom(fingerprints, "h", expected_items, fpp)
    with open(os.path.join(path, "bloom.bin"), "wb") as fh:
        fh.write(bitmap)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump({"n_bits": n_bits, "k": k, "fpp": fpp}, fh)
    return CorpusState(fingerprints, bitmap, n_bits, k, sized_fpp=fpp)


def load_corpus_state(spark: SparkSession, path: str) -> CorpusState:
    """Load a ``save_corpus_state`` layout. The fingerprint DataFrame is
    lazy — nothing is scanned until a batch actually probes it — and the
    bitmap is one bounded local read."""
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    with open(os.path.join(path, "bloom.bin"), "rb") as fh:
        bitmap = fh.read()
    fingerprints = spark.read.parquet(os.path.join(path, "fingerprints"))
    return CorpusState(
        fingerprints, bitmap, meta["n_bits"], meta["k"], sized_fpp=meta.get("fpp")
    )


def absorb_batch(
    state: CorpusState,
    batch: DataFrame,
    path: str,
    text_col: str = "text",
) -> CorpusState:
    """Fold a day-N batch INTO the persisted state — continuous-ingestion
    maintenance with ZERO corpus work, the property the mergeable
    primitives were chosen for: bloom bitmaps with fixed (n_bits, k) OR
    losslessly (``bloom_bitmap``), and the fingerprint table appends.

    Steps (all sized by the batch, never the corpus): distinct batch
    fingerprints → LEFT ANTI against the state's fingerprint parquet
    (keeps the table distinct; the bloom prunes nothing here by design —
    correctness first, this is a state write) → append the genuinely-new
    fingerprints → OR their bitmap into the state's and rewrite
    ``bloom.bin``. Returns the refreshed state (reading fingerprints
    back from parquet; the old state's broadcast is released).

    fpp drift: the bitmap's size was chosen for the ORIGINAL corpus
    inventory, so absorbing far beyond it raises the effective
    false-positive rate — which costs exact-confirm work, never
    correctness (the anti-join stays exact at ANY fpp). The trigger is
    MONITORED, not prose: check ``state.needs_compaction()`` (measured
    fill-ratio**k vs the fpp the bitmap was sized for) after absorbing,
    and when it fires run a ``save_corpus_state`` re-size — the same
    cadence as the ANN re-index."""
    spark = batch.sparkSession
    fp, h = _fingerprint_cols(text_col)
    fp_path = os.path.join(path, "fingerprints")
    existing = spark.read.parquet(fp_path)
    new_fps = (
        batch.select(fp.alias("fingerprint"), h.alias("h"))
        .distinct()
        .join(existing.select("fingerprint"), on="fingerprint", how="left_anti")
    )
    # localCheckpoint BEFORE the append: the append rewrites the relation
    # new_fps's anti-join reads, and the bitmap build below must see the
    # SAME novel set the append writes
    new_fps = new_fps.localCheckpoint(eager=True)
    import numpy as np

    batch_bits = bloom_bitmap(new_fps, "h", state.n_bits, state.k)
    merged = (
        np.frombuffer(state.bitmap, dtype=np.uint8)
        | np.frombuffer(batch_bits, dtype=np.uint8)
    ).tobytes()
    # WRITE ORDER IS THE CRASH-SAFETY INVARIANT: bloom FIRST, fingerprints
    # second. A crash after the bloom write leaves extra bits whose
    # fingerprints never landed — only FALSE POSITIVES, absorbed by the
    # exact confirm. The reverse order would leave appended fingerprints
    # the bloom doesn't know, and a bloom-negative probe skips the exact
    # confirm entirely — a FALSE NEGATIVE that silently re-admits
    # duplicates forever (r7 review finding). The bloom write itself is
    # ATOMIC (temp file + os.replace, same filesystem): a crash MID-write
    # must never truncate bloom.bin, because a partial bitmap loses
    # already-set corpus bits — the same false-negative failure the
    # ordering exists to prevent (ADVICE r7).
    fd, tmp_bloom = tempfile.mkstemp(dir=path, prefix="bloom.", suffix=".tmp")
    with os.fdopen(fd, "wb") as fh:
        fh.write(merged)
    os.replace(tmp_bloom, os.path.join(path, "bloom.bin"))
    new_fps.write.mode("append").parquet(fp_path)
    state.unpersist()
    return CorpusState(
        spark.read.parquet(fp_path),
        merged,
        state.n_bits,
        state.k,
        sized_fpp=state.sized_fpp,
    )


def novel_documents_against_state(
    batch: DataFrame,
    state: CorpusState,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``batch`` not fingerprint-present in the corpus the state
    was built from — WITHOUT scanning that corpus. Exact NOT-EXISTS
    semantics: bloom-negative rows are definitely novel (no false
    negatives); bloom-positive rows exact-confirm via LEFT ANTI against
    the state's fingerprint table (a parquet scan of 16-byte hashes, not
    documents). Reuses the state's cached bloom broadcast across calls.

    Output: (id_col, fingerprint md5-hex) ordered by id."""
    fp, h = _fingerprint_cols(text_col)
    probed = split_by_bloom(
        batch.select(F.col(id_col), fp.alias("fingerprint"), h.alias("__h")),
        "__h",
        state.bitmap,
        state.n_bits,
        state.k,
        bloom_bc=state.bloom_broadcast(batch.sparkSession),
    )
    definite_novel = probed.filter(F.col("__bloom_hit") == 0)
    # exact-confirm only the bloom positives (true dups + ~fpp FPs)
    confirmed_novel = probed.filter(F.col("__bloom_hit") == 1).join(
        state.fingerprints.select("fingerprint").distinct(),
        on="fingerprint",
        how="left_anti",
    )
    return (
        definite_novel.select(id_col, "fingerprint")
        .unionByName(confirmed_novel.select(id_col, "fingerprint"))
        .orderBy(id_col)
    )


def novel_documents(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    expected_items: int | None = None,
    fpp: float = 0.01,
    state: CorpusState | None = None,
) -> DataFrame:
    """Rows of ``batch`` whose ``text_col`` does NOT appear in ``corpus``
    — exact anti-join semantics, bloom-accelerated.

    Output: (id_col, fingerprint md5-hex) ordered by id. The md5
    fingerprint (not raw text) is both the join key (16 bytes through the
    shuffle instead of documents) and the oracle-checkable output.

    Pass a prebuilt ``state`` (from ``build_corpus_state`` /
    ``load_corpus_state``) to skip the corpus pass AND reuse its single
    bloom broadcast across batches; otherwise the state is built here
    (one corpus scan + one fresh broadcast per call)."""
    if state is None:
        state = build_corpus_state(corpus, text_col, expected_items, fpp)
    return novel_documents_against_state(batch, state, text_col, id_col)
