"""File sources and sinks (parquet / JSON bronze), Spark-native.

Replaces the reference's driver-side blob plumbing with distributed IO:

- ``load_parquet_from_adls`` (reference ``run_load.py:33-54``) listed blobs,
  downloaded every part into driver memory, pyarrow-concatenated and went to
  pandas — a single-node bottleneck. Here it is one ``spark.read.parquet``:
  distributed scan, predicate pushdown, column pruning for free.
- ``read_bronze_jsonl`` (reference ``run_transform.py:23-26``) maps to
  ``spark.read.json`` with an optional explicit schema (avoids the eager
  inference pass over 100 TB of bronze).
- ``write_parquet`` (reference ``run_transform.py:29-36``) path-encoded the
  partition by hand; here it is ``partitionBy("run_date")`` + dynamic
  partition overwrite, so re-running one day never clobbers others and
  downstream readers get partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# The engine's test catalog (TPC-H-ish star schema + events + LLM-data
# tables). At production scale these are Hive/Unity catalog tables; the
# name->path convention is the only local-mode concession.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# The catalog schema CONTRACT (r16, guide §1.2/§6): at production scale
# these tables live in a metastore that DECLARES their schemas; reading
# them with per-call footer inference is a dev-mode convenience that
# costs a listing + footer-read job on EVERY ``spark.read.parquet``
# (~0.1 s/call here — ~200 load_table sites × 3 timed bench runs made
# inference the largest single slice of the per-query fixed-cost tail).
# Declaring the schema makes the read planning-free and is also the
# correctness posture ``read_bronze_json`` already preaches: an
# inference pass over 100 TB is wrong, and a DRIFTING inference result
# breaks downstream conform logic silently. The declared DDLs are pinned
# against fresh inference over every shipped scale factor by
# tests/test_sources.py::test_catalog_schema_contract, so data drift fails
# loudly instead of nulling out columns. (``events.ts`` is parquet
# TIMESTAMP(NANOS); Spark 4.1 reads it as TIMESTAMP_NTZ with ns→us
# truncation — DuckDB's TIMESTAMP_NS -> TIMESTAMP cast truncates
# identically.)
CATALOG_SCHEMAS: dict[str, str] = {
    "region": "r_regionkey INT, r_name STRING",
    "nation": "n_nationkey INT, n_name STRING, n_regionkey INT",
    "customer": (
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, "
        "c_acctbal DOUBLE, c_mktsegment STRING"
    ),
    "supplier": (
        "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE"
    ),
    "part": (
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE"
    ),
    "orders": (
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, "
        "o_orderpriority STRING"
    ),
    "lineitem": (
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
        "l_linestatus STRING, l_shipdate TIMESTAMP_NTZ"
    ),
    "events": (
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    ),
    "documents": (
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT"
    ),
    "embeddings": "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
}

# A/B seam: True = declared-schema reads (shipped); False = the pre-r16
# per-call footer inference, kept so tools/ab_schema_contract_r16.py can
# reconstruct the old behavior interleaved in one session.
_USE_CATALOG_SCHEMAS = True


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table from ``{sf_dir}/{name}.parquet`` with its
    DECLARED schema (``CATALOG_SCHEMAS`` — see the contract note there);
    unknown table names fall back to footer inference.

    ``events``: Spark 4.1's reader maps parquet TIMESTAMP(NANOS) to
    TIMESTAMP_NTZ (microsecond truncation, matching DuckDB's
    TIMESTAMP_NS -> TIMESTAMP cast), which is exactly what the declared
    schema pins. The legacy nanos-as-long conf + ``div 1000`` conversion
    serve only the INFERENCE path (unknown-name fallback or
    ``_USE_CATALOG_SCHEMAS = False``): a declared TIMESTAMP_NTZ read can
    never surface ``ts`` as bigint, so on a runtime whose vectorized
    reader rejects NANOS the declared read fails at scan time — the
    recovery there is the inference path, not this branch, and the conf
    is not touched (no pointless session-conf mutation) when the schema
    is declared.
    """
    schema = CATALOG_SCHEMAS.get(name) if _USE_CATALOG_SCHEMAS else None
    if name == "events":
        if schema is None:
            try:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            except Exception:
                pass
        reader = spark.read.schema(schema) if schema else spark.read
        df = reader.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    reader = spark.read.schema(schema) if schema else spark.read
    return reader.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Read several catalog tables at once; keys are table names."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def read_bronze_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    multiline: bool = False,
) -> DataFrame:
    """Bronze JSON/JSONL reader (reference ``run_transform.py:23-26``).

    With ``schema=None`` Spark runs an eager inference pass — acceptable for
    small bronze, wrong at 100 TB; callers on the scale path must pass the
    contract schema so the read stays lazy and prunable.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if multiline:
        reader = reader.option("multiLine", "true")
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
    timestamp_format: str | None = None,
) -> DataFrame:
    """CSV landing-zone reader (bronze surface alongside JSON/parquet).

    Same scale contract as ``read_bronze_json``: pass the schema on the
    100 TB path — ``inferSchema`` is an extra full read, and a drifting
    inference result breaks the conform layer's drift guard downstream.
    Malformed rows go to ``_corrupt_record`` (PERMISSIVE) rather than
    failing the job, matching the reference's tolerate-and-QC posture.
    """
    reader = spark.read.option("header", str(header).lower()).option("sep", delimiter)
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """ORC reader — the columnar format of Hive-side warehouses, read with
    the same contract as parquet: vectorized scan, predicate pushdown, and
    column pruning all apply, so downstream plans are format-agnostic.
    Passing ``schema`` pins the read schema (and skips footer inference on
    wide directories)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """ORC sink mirroring ``write_partitioned_parquet`` (same dynamic
    partition-overwrite semantics; only declared partition columns present
    in ``df`` are used)."""
    writer = df.write.mode(mode)
    cols = [c for c in partition_cols if c in df.columns]
    if cols:
        writer = writer.partitionBy(*cols)
    writer.orc(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    run_date: str | None = None,
    partition_cols: tuple[str, ...] = ("run_date",),
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet sink (reference ``run_transform.py:29-36``).

    Adds ``run_date`` as a real column when given so Hive-style partition
    discovery + pruning replace the reference's manual path construction.
    With ``spark.sql.sources.partitionOverwriteMode=dynamic`` (engine
    default), ``mode="overwrite"`` only replaces the partitions present in
    ``df`` — idempotent daily re-runs.
    """
    if run_date is not None and "run_date" not in df.columns:
        df = df.withColumn("run_date", F.lit(run_date))
    writer = df.write.mode(mode)
    cols = [c for c in partition_cols if c in df.columns]
    if cols:
        writer = writer.partitionBy(*cols)
    writer.parquet(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Opaque binary-file scan (S-EXT): Spark's built-in ``binaryFile``
    source — the native way to ingest an image/audio corpus laid out as
    one object per file. Yields (path, modificationTime, length, content)
    with reads parallelized across files; ``glob`` pushes a
    pathGlobFilter into file listing (prunes before any byte is read).
    ``max_bytes`` guards executors against pathological objects with a
    filter on the source's ``length`` metadata column — binaryFile pushes
    path/length/modificationTime predicates into the listing, so
    oversized objects are SKIPPED before any byte is read. (Previously
    this set ``spark.sql.sources.binaryFile.maxLength`` session-wide,
    which leaked the cap to every later binaryFile scan because the conf
    is only consulted lazily at execution — ADVICE r6; the pushed filter
    is per-scan and shows up in PushedFilters.) Pair with
    ``multimodal.ops.land_media_files`` for the landing half."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df
