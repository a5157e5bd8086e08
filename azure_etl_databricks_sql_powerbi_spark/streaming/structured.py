"""Structured Streaming wiring: file-stream sources, watermarked windowed
aggregation, in-stream dedup, and a foreachBatch upsert sink.

The reference's incremental story is a daily re-extract with a 7-day
overlap window plus key-dedup plus MERGE (``rest_api.py:70-72``,
``run_transform.py:49-50``, ``run_load.py:82-90``). The streaming
equivalents here keep those exact semantics under continuous arrival:

- overlap window       -> ``withWatermark`` (bounded lateness, state GC)
- re-extract dedup     -> ``dropDuplicatesWithinWatermark`` (keyed, bounded
                          state — the unbounded ``dropDuplicates`` variant
                          would grow state forever at 100 TB/day)
- MERGE into warehouse -> ``foreachBatch`` + the engine's join-based
                          ``merge_upsert`` per micro-batch (idempotent:
                          re-processing a batch converges to the same
                          target, exactly like re-running a day)

Everything uses ``trigger(availableNow=True)`` under test: process all
files, checkpoint, stop — which is also the production pattern for
"streaming-batch" daily runs on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def stream_files(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-arrival stream (the Spark-native replacement for the
    reference's daily poll of new API pages). Schema must be explicit:
    streaming readers never infer."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def with_watermark(events: DataFrame, ts_col: str = "ts", delay: str = "7 days") -> DataFrame:
    """Bounded-lateness marker (ST1): state for windows older than
    max(event time) - delay is finalized and dropped — the streaming form
    of the reference's 7-day overlap (``endpoints.yml:29``)."""
    return events.withWatermark(ts_col, delay)


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "7 days",
) -> DataFrame:
    """Keyed dedup with bounded state (ST2): duplicates arriving within the
    watermark horizon are dropped; state is GC'd past it. Streaming
    equivalent of batch ``dropDuplicates(keys)`` under re-extract overlap."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def run_to_memory(
    df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    checkpoint: str | None = None,
    shuffle_partitions: int | None = None,
) -> StreamingQuery:
    """Drain all available input into an in-memory table (tests / smoke):
    returns after processing everything currently in the source.

    ``shuffle_partitions`` sizes the STATE STORE count for this drain
    (pinned at first query start from the session conf; AQE cannot
    resize stateful exchanges): every stateful operator opens one state
    store per shuffle partition per micro-batch, so a small-volume
    stream behind the session-wide 32 pays 32x store open/commit
    overhead (measured 2.1x on the interval-join drain at sf0.1 with 8).
    At production volume, size it to key cardinality / throughput
    instead. The session conf is restored after the drain."""
    spark = df.sparkSession
    prev = None
    if shuffle_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        writer = (
            df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
        )
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        q = writer.start()
        q.awaitTermination()
        return q
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def run_foreach_batch_upsert(
    df: DataFrame,
    target_path: str,
    keys: list[str],
    checkpoint: str,
    shuffle_partitions: int | None = None,
) -> StreamingQuery:
    """Continuous MERGE: each micro-batch is upserted into a parquet target
    with the engine's join-based merge (J1 semantics, ``run_load.py:82-90``).

    foreachBatch gives batch-DataFrame APIs per trigger — the standard way
    to run keyed upserts from a stream when the sink is not a Delta table.
    The per-batch read-modify-write of the target is the local-mode
    concession; on Delta/Iceberg the same callable issues MERGE INTO.
    """
    from azure_etl_databricks_sql_powerbi_spark.operators.upsert import merge_upsert

    def _upsert(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        import os

        if batch.isEmpty():
            return
        if os.path.exists(target_path):
            target = spark.read.parquet(target_path)
            merged = merge_upsert(target, batch, keys=keys)
        else:
            merged = batch
        # write via temp dir + atomic rename is overkill locally; overwrite
        # after full materialization (collect to driver would not scale --
        # localCheckpoint breaks the lineage onto executor-local storage)
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_path)

    # state-store sizing for the dedup/watermark operators upstream of
    # the sink — same scoped-conf contract as run_to_memory
    spark = df.sparkSession
    prev = None
    if shuffle_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            df.writeStream.foreachBatch(_upsert)
            .outputMode("update")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    right_prefix: str = "r_",
) -> DataFrame:
    """Watermarked stream-stream interval join (attribution shape): every
    right event that lands on the same key within ``within`` AFTER a left
    event — e.g. clicks attributed to impressions.

    Both sides carry a watermark and the join condition bounds
    ``right_ts`` to ``[left_ts, left_ts + within]``, which is what lets
    Spark GC join state: a buffered left row can be dropped once the
    right watermark passes ``left_ts + within``. An unconstrained
    stream-stream join would buffer both streams forever — the 100 TB/day
    failure mode this operator exists to avoid.

    Right-side columns are prefixed (``right_prefix``) so the joined
    schema never collides; output is append-mode eligible (inner join).
    The batch equivalence (same rows as the identical batch join once both
    streams drain) is asserted in tests/test_streaming.py.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    r = r.select([F.col(c).alias(f"{right_prefix}{c}") for c in r.columns])
    rk, rts = f"{right_prefix}{key}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(key) == F.col(rk))
        & (F.col(rts) >= F.col(left_ts))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").drop(rk)
