"""Feature hashing (the "hashing trick", Weinberger et al. 2009) —
fixed-dimension text featurization with NO vocabulary state.

Why it matters at 100 TB: a count-vectorizer needs a corpus-wide vocab
(a shuffle + a broadcast that grows with the corpus); the hashing trick
needs neither — each token maps to ``hash(token) % dim`` map-side, so
featurization is a pure scan-stage projection that never shuffles until
the per-document aggregation. Collisions are the accepted trade
(bounded by dim choice); no state means train/serve skew is impossible.

Hash choice: the bucket is ``int(md5(token)[:8 hex], 16) % dim`` — md5
is available and bit-identical in Spark (``conv(substr(md5(x),1,8),
16, 10)``) and DuckDB (``('0x' || substr(md5(x),1,8))::BIGINT``), which
makes the featurizer hash-exact cross-engine. xxhash64 would be faster
but is Spark-only; swap it in production if oracle parity isn't needed.

Output is SPARSE (doc, bucket, tf) triples — the representation that
scales; ``dense_features`` assembles the dense array in-plan (pure
Catalyst, no UDF) for consumers that want vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.text import tokens


def hash_bucket(col, dim: int):
    """Column expr: token -> stable bucket in [0, dim). 32 hex-bit md5
    prefix parsed to int — identical arithmetic in DuckDB."""
    from ..util import hex_prefix_long

    c = F.col(col) if isinstance(col, str) else col
    return (hex_prefix_long(F.md5(c), 1, 8) % dim).cast("int")


def hashed_text_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """Sparse hashed term frequencies: one (id, bucket, tf) row per
    non-empty bucket per document. Bucket assignment is map-side; the
    only shuffle is the per-(doc, bucket) count."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    return (
        toks.select(id_col, hash_bucket("token", dim).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def dense_features(
    sparse: DataFrame,
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """Assemble the dense count vector per id from the sparse triples —
    pure Catalyst (map_from_entries + transform over a sequence), no
    Python. Missing buckets are 0."""
    per_doc = sparse.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "tf"))
        ).alias("__m")
    )
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return per_doc.select(
        id_col,
        F.transform(
            idx, lambda b: F.coalesce(F.col("__m")[b], F.lit(0).cast("long"))
        ).alias("features"),
    )
