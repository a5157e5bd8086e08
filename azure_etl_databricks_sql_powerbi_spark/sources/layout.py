"""Z-order (Morton-curve) multi-dimensional file layout.

The scale problem: a 100 TB table range-partitioned on ONE column prunes
scans filtered on that column only; filters on a second dimension read
everything. Interleaving the bits of several dimensions into one Morton
key and range-writing on it gives every file a small bounding box in ALL
interleaved dimensions, so min/max file statistics prune scans on any of
them (the layout behind Delta Lake's ``OPTIMIZE ZORDER BY`` and
Databricks' liquid clustering; Morton 1966).

Everything here is pure Catalyst ``Column`` arithmetic — normalization is
one bounded 1-row min/max aggregate broadcast back, rank + interleave are
shift/mask expressions — so the key computation is exact, codegen'd, and
reproducible bit-for-bit in any engine (the DuckDB oracle for
``zorder_layout_stats`` runs the same arithmetic).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_rank(c: Column | str, bits: int, mn: Column, mx: Column) -> Column:
    """Rank a value into ``[0, 2**bits)`` by min-max scaling:
    ``floor((x - mn) * (2**bits - 1) / (mx - mn))`` with the degenerate
    all-equal column ranking 0. One IEEE double division + floor —
    identical in any engine; NULLs rank 0 (sort first, like NULLS FIRST).
    """
    c = F.col(c) if isinstance(c, str) else c
    top = F.lit(float(2**bits - 1))
    span = (mx - mn).cast("double")
    rank = F.floor((c - mn).cast("double") * top / span).cast("long")
    return F.coalesce(
        F.when(span > 0, rank).otherwise(F.lit(0)), F.lit(0)
    )


def interleave_bits(ranks: list[Column], bits: int) -> Column:
    """Morton-interleave ``len(ranks)`` rank columns of ``bits`` bits
    each: output bit ``i * n + d`` is bit ``i`` of dimension ``d``. Pure
    shift/mask/sum arithmetic (no UDF): ``sum_d sum_i
    ((rank_d >> i) & 1) << (i*n + d)``."""
    n = len(ranks)
    terms: list[Column] = []
    for d, r in enumerate(ranks):
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(r, i).bitwiseAND(F.lit(1)), i * n + d)
            )
    return reduce(lambda a, b: a + b, terms).cast("long")


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8, out_col: str = "z_key"
) -> DataFrame:
    """Append the Morton key of ``cols`` (numeric/date/timestamp) as
    ``out_col``. The per-column min/max come from ONE 1-row aggregate
    joined back by broadcast — a metadata-scale action at any corpus
    size (same bounded-agg contract as operators/qc.py)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__mn_{c}"))
        aggs.append(F.max(c).alias(f"__mx_{c}"))
    stats = df.agg(*aggs)
    with_stats = df.crossJoin(F.broadcast(stats))
    ranks = [
        minmax_rank(c, bits, F.col(f"__mn_{c}"), F.col(f"__mx_{c}")) for c in cols
    ]
    return with_stats.withColumn(out_col, interleave_bits(ranks, bits)).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 32,
    fmt: str = "parquet",
) -> None:
    """Cluster ``df`` on the Morton curve of ``cols`` and write:
    ``repartitionByRange(n_files, z_key)`` (one range shuffle — contiguous
    curve segments per file) + ``sortWithinPartitions`` (clusters pages
    inside each file so parquet column-index stats prune at page level
    too), then drop the helper key. Min/max file stats on every
    interleaved column are tight boxes -> multi-dimensional scan pruning."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "z_key")
        .sortWithinPartitions("z_key")
        .drop("z_key")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )


def compact_files(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
    sort_cols: list[str] | None = None,
) -> dict[str, int]:
    """Small-file compaction (the OPTIMIZE/bin-packing half of table
    maintenance; ``write_zordered`` is the clustering half): rewrite a
    directory of many small files into ``ceil(total_bytes /
    target_file_bytes)`` right-sized files.

    Why it matters at 100 TB: streaming sinks and over-parallel writers
    leave thousands of KB-scale files per partition; every scan then
    pays one task + one open per file and the NameNode/listing pays the
    metadata. Compaction is a metadata decision (file count from total
    bytes — read from the filesystem, no data scan) plus one
    ``coalesce`` rewrite (coalesce, not repartition: narrowing to fewer
    partitions needs no shuffle; pass ``sort_cols`` to re-sort while
    compacting, which then does shuffle via the range write).

    Writes to ``<path>.__compact_tmp``, atomically swaps directories on
    success, and returns ``{"files_before", "files_after",
    "bytes_total"}`` for the QC log. Hadoop FS API throughout, so the
    same code runs on file:/, HDFS, or abfss:// (sources/cloudfs conf).
    """
    import math

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    src = Path(path)
    fs = src.getFileSystem(conf)

    def data_files(p):
        out = []
        for st in fs.listStatus(p):
            f = st.getPath()
            if st.isDirectory():
                out.extend(data_files(f))
            elif not f.getName().startswith(("_", ".")):
                out.append(st)
        return out

    before = data_files(src)
    total = sum(st.getLen() for st in before)
    n_out = max(1, math.ceil(total / target_file_bytes))

    tmp = Path(path.rstrip("/") + ".__compact_tmp")
    df = spark.read.format(fmt).load(path)
    if sort_cols:
        df = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        df = df.coalesce(n_out)
    df.write.format(fmt).mode("overwrite").save(str(tmp))

    after = len(data_files(tmp))
    old = Path(path.rstrip("/") + ".__compact_old")
    if not fs.rename(src, old):
        raise IOError(f"compact_files: cannot stage {path}")
    if not fs.rename(tmp, src):
        fs.rename(old, src)  # roll back
        raise IOError(f"compact_files: swap failed for {path}")
    fs.delete(old, True)
    return {
        "files_before": len(before),
        "files_after": after,
        "bytes_total": int(total),
    }
