"""Structured Streaming surface: batch/stream window parity, bounded-state
dedup, foreachBatch upsert, custom stateful totals.

Strategy: every streaming plan is drained with trigger(availableNow=True)
and compared against the equivalent BATCH computation on the same input —
streaming correctness reduces to batch correctness plus state semantics.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table
from azure_etl_databricks_sql_powerbi_spark.streaming import structured, windows
from azure_etl_databricks_sql_powerbi_spark.streaming.stateful import running_totals

SF = "/root/testdata/sf0.001"

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events re-landed as a parquet dir of four CONTIGUOUS time slices,
    written oldest-first (the file source processes files in modification-
    time order) — the realistic arrival shape, and required for append-mode
    tests: out-of-order files would put data behind the watermark, and
    Spark would correctly drop it."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    events = load_table(spark, SF, "events")
    day = F.dayofmonth("ts")
    for lo, hi in ((0, 8), (8, 16), (16, 23), (23, 32)):
        events.filter((day >= lo) & (day < hi)).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _stream(spark, events_dir, **kw):
    return structured.stream_files(spark, events_dir, EVENTS_SCHEMA, **kw)


def test_streaming_tumbling_matches_batch(spark, events_dir, tmp_path):
    batch = load_table(spark, SF, "events")
    expected = {
        tuple(r)
        for r in windows.tumbling_kpis(batch, "1 day").collect()
    }
    stream = windows.tumbling_kpis(_stream(spark, events_dir), "1 day")
    structured.run_to_memory(stream, "tumbling_complete", output_mode="complete")
    got = {tuple(r) for r in spark.table("tumbling_complete").collect()}
    assert got == expected


def test_streaming_append_emits_only_closed_windows(spark, events_dir):
    """Append mode + watermark: only windows the watermark has passed are
    emitted; with maxFilesPerTrigger=1 the watermark advances between
    micro-batches, so all but the newest window(s) finalize."""
    src = _stream(spark, events_dir, max_files_per_trigger=1)
    agg = windows.tumbling_kpis(structured.with_watermark(src, delay="1 hour"), "1 day")
    structured.run_to_memory(agg, "tumbling_append", output_mode="append")
    emitted = spark.table("tumbling_append")
    batch = windows.tumbling_kpis(load_table(spark, SF, "events"), "1 day")
    n_batch = batch.count()
    # emitted is a subset of the batch answer, with matching rows
    joined = emitted.join(
        batch, on=["window_start", "window_end", "event_type", "n_events", "total_value"]
    )
    n_emitted = emitted.count()
    assert 0 < n_emitted <= n_batch
    assert joined.count() == n_emitted


def test_dedup_within_watermark(spark, events_dir, tmp_path):
    """Duplicated input stream -> unique event_ids out (ST2 semantics)."""
    src = _stream(spark, events_dir)
    doubled = src.union(src)
    dd = structured.dedup_within_watermark(doubled, ["event_id"], delay="30 days")
    structured.run_to_memory(
        dd, "dedup_stream", output_mode="append", checkpoint=str(tmp_path / "ck")
    )
    out = spark.table("dedup_stream")
    n = load_table(spark, SF, "events").count()
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n


def test_foreach_batch_upsert_idempotent(spark, events_dir, tmp_path):
    """Stream -> keyed upsert target == batch dedup-by-key; re-running the
    same data (fresh checkpoint) leaves the target unchanged (J1/ST2)."""
    target = str(tmp_path / "target")
    for run in range(2):
        src = _stream(spark, events_dir).select("event_id", "user_id", "value")
        structured.run_foreach_batch_upsert(
            src, target, keys=["event_id"], checkpoint=str(tmp_path / f"ck{run}")
        )
    got = spark.read.parquet(target)
    n = load_table(spark, SF, "events").count()
    assert got.count() == n
    assert got.select("event_id").distinct().count() == n


def test_stateful_running_totals(spark, events_dir, tmp_path):
    """applyInPandasWithState totals after draining == batch groupBy."""
    src = _stream(spark, events_dir, max_files_per_trigger=2)
    out = running_totals(src)
    structured.run_to_memory(
        out, "run_totals", output_mode="update", checkpoint=str(tmp_path / "ck")
    )
    # update mode re-emits a key per trigger; the LAST emit per key is the
    # final state. Memory sink appends, so dedup keeping max n_events.
    final = (
        spark.table("run_totals")
        .groupBy("user_id")
        .agg(F.max_by(F.struct("n_events", "total_value"), "n_events").alias("s"))
        .select("user_id", "s.n_events", "s.total_value")
    )
    expected = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce("value", F.lit(0.0)).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    assert {tuple(r) for r in final.collect()} == {tuple(r) for r in expected.collect()}


def test_sessionize_bounded_state(spark, events_dir, tmp_path):
    """ST4 eviction contract: the custom sessionizer's closed sessions
    match the batch gap-split exactly, and its final state holds ONLY the
    still-open sessions — total_sessions == emitted + state rows, so
    timed-out state was provably evicted (bounded state)."""
    from pyspark.sql import Window

    from azure_etl_databricks_sql_powerbi_spark.streaming.stateful import sessionize

    src = _stream(spark, events_dir, max_files_per_trigger=1)
    sess = sessionize(
        structured.with_watermark(src, delay="1 minute"), gap_minutes=120
    )
    q = structured.run_to_memory(
        sess, "sessions_stream", output_mode="append", checkpoint=str(tmp_path / "ck")
    )
    emitted = spark.table("sessions_stream")

    # batch truth: split each user's ordered events on >2h gaps
    # (ts is TIMESTAMP_NTZ in the parquet; unix_micros needs TIMESTAMP)
    batch = load_table(spark, SF, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = (
        batch.withColumn("prev_us", F.unix_micros(F.lag("ts").over(w)))
        .withColumn("cur_us", F.unix_micros("ts"))
        .withColumn(
            "new_sess",
            (
                F.col("prev_us").isNull()
                | ((F.col("cur_us") - F.col("prev_us")) > 7200 * 1_000_000)
            ).cast("int"),
        )
        .withColumn("sid", F.sum("new_sess").over(w))
    )
    sessions = flagged.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )

    n_emitted = emitted.count()
    matched = emitted.join(
        sessions, ["user_id", "session_start", "session_end", "n_events"]
    ).count()
    assert n_emitted > 0 and matched == n_emitted

    state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    total_sessions = sessions.count()
    assert state_rows == total_sessions - n_emitted  # exact accounting
    assert state_rows < total_sessions  # eviction actually happened


def test_session_windows_batch(spark):
    """session_window sanity: sessions are per-user, non-overlapping, and
    every event is inside [start, end)."""
    events = load_table(spark, SF, "events")
    sess = windows.session_stats(events, gap="2 hours")
    # session count <= event count; all sessions have >= 1 event
    total_events = events.count()
    agg = sess.agg(
        F.sum("n_events").alias("s"), F.min("n_events").alias("m")
    ).collect()[0]
    assert agg["s"] == total_events
    assert agg["m"] >= 1
    # non-overlap per user: no session starts before the previous one ends
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_start")
    overlaps = (
        sess.withColumn("prev_end", F.lag("session_end").over(w))
        .filter(F.col("prev_end").isNotNull() & (F.col("session_start") < F.col("prev_end")))
        .count()
    )
    assert overlaps == 0


def test_stream_upsert_replay_equals_batch(spark, tmp_path):
    """The ST2 contract query chain (doubled stream -> bounded-state dedup
    -> foreachBatch merge_upsert) produces EXACTLY the rows of the batch
    equivalent (union -> dropDuplicates(key) -> merge) on the same input —
    stream ≡ batch, row for row, not just by count."""
    import __spark_entry__ as entrymod

    got = entrymod.queries()["stream_upsert_replay"](spark, SF)
    batch = (
        load_table(spark, SF, "events")
        .select("event_id", "user_id", "value")
        .dropDuplicates(["event_id"])
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in batch.collect()}


def test_stream_stream_interval_join_equals_batch(spark, events_dir):
    """Watermarked stream-stream interval join (clicks within 1h after a
    view on the same user) emits exactly the rows of the identical batch
    join once both streams drain."""
    views_s = structured.stream_files(spark, events_dir, EVENTS_SCHEMA).where(
        F.col("event_type") == "view"
    ).select("user_id", "ts", "event_id")
    clicks_s = structured.stream_files(spark, events_dir, EVENTS_SCHEMA).where(
        F.col("event_type") == "click"
    ).select("user_id", "ts", "event_id")
    joined = structured.stream_stream_interval_join(
        views_s, clicks_s, key="user_id", left_ts="ts", right_ts="ts",
        within="1 hour", watermark="2 hours",
    )
    structured.run_to_memory(joined, "ssj_out")
    got = {
        tuple(r)
        for r in spark.table("ssj_out")
        .select("user_id", "event_id", "r_event_id")
        .collect()
    }

    ev = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    v = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), "event_id"
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
    )
    batch = v.join(
        c,
        (F.col("user_id") == F.col("cu"))
        & (F.col("cts") >= F.col("vts"))
        & (F.col("cts") <= F.col("vts") + F.expr("INTERVAL 1 hour")),
    )
    want = {
        tuple(r) for r in batch.select("user_id", "event_id", "cid").collect()
    }
    assert got == want and len(want) > 0


def test_rocksdb_state_store_matches_batch(spark, events_dir):
    """100 TB stateful posture: the default HDFS-backed state store keeps
    every key's state on the executor HEAP — at web-scale key
    cardinality that OOMs; RocksDBStateStoreProvider (bundled
    rocksdbjni) spills state to local disk with changelog checkpointing.
    Run the same windowed aggregate under RocksDB: results must equal
    the batch answer bit-for-bit and the state operator's metrics must
    prove RocksDB actually held the state."""
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        batch = load_table(spark, SF, "events")
        expected = {
            tuple(r) for r in windows.tumbling_kpis(batch, "1 day").collect()
        }
        stream = windows.tumbling_kpis(_stream(spark, events_dir), "1 day")
        q = structured.run_to_memory(
            stream, "tumbling_rocksdb", output_mode="complete"
        )
        got = {tuple(r) for r in spark.table("tumbling_rocksdb").collect()}
        assert got == expected
        metrics = q.lastProgress["stateOperators"][0]["customMetrics"]
        assert any("rocksdb" in k.lower() for k in metrics), metrics
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python state-server protocol needs protobuf "
    "(not in this container); the wiring/plan surface is covered by "
    "test_tws_plan_builds_without_execution",
)
def test_tws_running_totals_matches_batch_and_3x_tier(spark, events_dir, tmp_path):
    """transformWithStateInPandas (Spark 4.x named-state API, RocksDB
    provider) drained totals == batch GROUP BY == the 3.x
    applyInPandasWithState tier — the two stateful APIs are contract-
    identical on the same input."""
    from azure_etl_databricks_sql_powerbi_spark.streaming.tws import (
        rocksdb_conf,
        running_totals_tws,
    )

    with rocksdb_conf(spark):
        src = _stream(spark, events_dir, max_files_per_trigger=2)
        out = running_totals_tws(src)
        structured.run_to_memory(
            out, "tws_totals", output_mode="update", checkpoint=str(tmp_path / "ck")
        )
    final = (
        spark.table("tws_totals")
        .groupBy("user_id")
        .agg(F.max_by(F.struct("n_events", "total_value"), "n_events").alias("s"))
        .select("user_id", "s.n_events", "s.total_value")
    )
    expected = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce("value", F.lit(0.0)).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    assert {tuple(r) for r in final.collect()} == {tuple(r) for r in expected.collect()}


def test_tws_plan_builds_without_execution(spark, events_dir):
    """The TWS surface that IS verifiable without protobuf: the processor
    protocol (init/handleInputRows against a fake handle/state) and the
    streaming plan wiring (groupBy -> transformWithStateInPandas analyzes
    and carries the declared output schema)."""
    import pandas as pd

    from azure_etl_databricks_sql_powerbi_spark.streaming.tws import (
        RunningTotalsProcessor,
        running_totals_tws,
    )

    # plan wiring: analysis succeeds, schema is the declared contract
    src = _stream(spark, events_dir)
    out = running_totals_tws(src)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == ["user_id", "n_events", "total_value"]

    # processor fold logic against a minimal fake state
    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def getValueState(self, name, schema, ttlDurationMs=None):
            return FakeState()

    p = RunningTotalsProcessor()
    p.init(FakeHandle())
    b1 = pd.DataFrame({"user_id": [7, 7], "value": [1.5, None]})
    b2 = pd.DataFrame({"user_id": [7], "value": [2.0]})
    (out1,) = list(p.handleInputRows((7,), iter([b1]), None))
    (out2,) = list(p.handleInputRows((7,), iter([b2]), None))
    assert out1.iloc[0].tolist() == [7, 2, 1.5]
    assert out2.iloc[0].tolist() == [7, 3, 3.5]


def test_streaming_dedup_against_persisted_state(spark, tmp_path):
    """Continuous-ingestion dedup end-to-end: a file stream drains
    micro-batch by micro-batch through foreachBatch, each batch probes
    the PERSISTED corpus state (exact NOT-EXISTS, unbounded history —
    beyond dropDuplicatesWithinWatermark's bounded window), appends only
    novel docs to the target, and absorbs them into the state so LATER
    micro-batches see them. Cross-batch dups and corpus dups both land
    exactly zero extra rows."""
    from azure_etl_databricks_sql_powerbi_spark.dedup import incremental
    from azure_etl_databricks_sql_powerbi_spark.streaming import structured

    state_dir = str(tmp_path / "state")
    src_dir = str(tmp_path / "in")
    target = str(tmp_path / "target")
    ck = str(tmp_path / "ck")

    corpus = spark.createDataFrame(
        [(i, f"corpus doc {i}") for i in range(20)], "doc_id long, text string"
    )
    incremental.save_corpus_state(corpus, state_dir, fpp=0.01)

    # wave 1: 5 novel + 2 corpus dups; wave 2: 3 novel + 2 REPEATS of wave 1
    wave1 = [(100 + i, f"novel one {i}") for i in range(5)] + [
        (900, "corpus doc 3"),
        (901, "corpus doc 7"),
    ]
    wave2 = [(200 + i, f"novel two {i}") for i in range(3)] + [
        (902, "novel one 0"),
        (903, "novel one 4"),
    ]
    import os

    os.makedirs(src_dir, exist_ok=True)
    spark.createDataFrame(wave1, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    spark.createDataFrame(wave2, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)

    holder = {"state": incremental.load_corpus_state(spark, state_dir)}

    def sink(batch_df, _epoch):
        novel_ids = incremental.novel_documents_against_state(
            batch_df, holder["state"]
        ).select("doc_id")
        novel = batch_df.join(novel_ids, on="doc_id")
        novel.write.mode("append").parquet(target)
        holder["state"] = incremental.absorb_batch(
            holder["state"], novel, state_dir
        )

    stream = structured.stream_files(
        spark, src_dir, "doc_id long, text string", max_files_per_trigger=1
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r.text for r in spark.read.parquet(target).collect()}
    # exactly the 8 novel texts; corpus dups and cross-batch repeats dropped
    assert got == {f"novel one {i}" for i in range(5)} | {
        f"novel two {i}" for i in range(3)
    }
    assert spark.read.parquet(target).count() == 8
    # and the final persisted state knows everything: a replay of both
    # waves yields zero novel docs
    replay = spark.createDataFrame(wave1 + wave2, "doc_id long, text string")
    final_state = incremental.load_corpus_state(spark, state_dir)
    assert incremental.novel_documents_against_state(replay, final_state).count() == 0
    final_state.unpersist()
    holder["state"].unpersist()


def test_stateful_running_totals_half_cent_boundary(spark, tmp_path):
    """Exact binary half-cents must fold like the DECIMAL(18,2) cast
    (HALF_UP on the shortest decimal repr: 0.125 -> 13 cents), not like
    numpy's banker's rounding on the binary double (-> 12 cents) — the
    r12 review caught bare np.round diverging from the batch twin and
    the DuckDB oracle on exactly these values."""
    src_dir = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, 7, 0.125), (2, 7, 0.375), (3, 7, 1.0), (4, 8, 2.625)],
        "event_id bigint, user_id bigint, value double",
    ).repartition(1).write.parquet(src_dir)
    stream = structured.stream_files(
        spark, src_dir, "event_id bigint, user_id bigint, value double"
    )
    structured.run_to_memory(
        running_totals(stream),
        "rt_halfcent",
        output_mode="update",
        checkpoint=str(tmp_path / "ck"),
        shuffle_partitions=4,
    )
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.table("rt_halfcent")
        .groupBy("user_id")
        .agg(F.max_by(F.struct("n_events", "total_value"), "n_events").alias("s"))
        .select("user_id", "s.n_events", "s.total_value")
        .collect()
    }
    # HALF_UP per value: 0.13 + 0.38 + 1.00 = 1.51; 2.625 -> 2.63
    # (banker's would give 0.12 + 0.38 + 1.00 = 1.50 and 2.62)
    assert got[7] == (3, 1.51) and got[8] == (1, 2.63)
