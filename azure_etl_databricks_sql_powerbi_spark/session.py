"""SparkSession factory with scale-oriented defaults.

The reference creates a bare session (``run_transform.py:104``); this engine
centralizes the confs that matter at 100 TB: AQE (runtime coalescing, skew
join splitting), dynamic partition overwrite for idempotent ``run_date``
re-runs, Arrow for the few Pandas-UDF paths, and shuffle-partition sizing.

On a real cluster the same builder is used — only ``master`` and memory
change; nothing in the engine assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[32]/128GiB test harness; on a 1000-executor
# cluster, raise shuffle.partitions (or leave AQE's coalescing to shrink an
# intentionally-high initial number, which is the recommended posture).
_DEFAULT_CONFS: dict[str, str] = {
    # Runtime re-planning: coalesce tiny shuffle partitions, split skewed
    # ones, convert sort-merge to broadcast when a side turns out small.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Idempotent re-runs of one run_date partition without clobbering others.
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Arrow transfer for the (rare) pandas_udf / mapInPandas paths.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Local-harness shuffle width; at scale this is cluster-tuned.
    "spark.sql.shuffle.partitions": "32",
    # Keep parquet scans splittable around executor memory at target SF.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Join strategy stays at the sort-merge-preferring default. r15 A/B'd
    # preferSortMergeJoin=false (+ AQE SHJ threshold) at sf0.1: mixed
    # (triangles -11%, near_dup +16%, rest ±5%). r16 closed the question
    # at sf1 (VERDICT item 8): the shuffled-hash wins that appear there
    # (near_dup -25%, triangles -16% when the run survives) come with the
    # exact failure §3.1 warns about — the 128m AQE threshold run DIED
    # with "Can't acquire 134217728 bytes memory to build hash relation"
    # once 32 concurrent tasks each tried to build a threshold-sized hash
    # relation. A per-task-memory-aware threshold is cluster sizing, not
    # an engine default; sort-merge spills gracefully and stays.
    # Runtime semi-join (bloom) filters: a selective dim-side predicate
    # injects a bloom filter into the fact scan of shuffle joins, cutting
    # shuffle input before the exchange — at 100 TB this is the difference
    # between shuffling the lake and shuffling the match set. (Plan shape
    # guarded in tests/test_plan_shapes.py::test_runtime_bloom_filter.)
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Timestamps as TIMESTAMP (not TIMESTAMP_NTZ) to match testdata parquet.
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "azure-etl-databricks-sql-powerbi-spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's default confs.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    cluster pass ``None`` with a pre-set master or use spark-submit.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    confs = dict(_DEFAULT_CONFS)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
