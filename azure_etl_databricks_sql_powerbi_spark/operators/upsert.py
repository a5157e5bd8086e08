"""Join-based keyed MERGE upsert, pure Spark.

The reference stages the batch into ``tmp_{table}`` and runs a SQL Server
``MERGE`` (``run_load.py:57-96``): WHEN MATCHED -> update every non-key
column from the source, WHEN NOT MATCHED -> insert. The exact relational
equivalent — and the one that runs in Catalyst instead of a database — is:

    result = source  UNION ALL  (target LEFT ANTI JOIN source ON keys)

i.e. matched target rows are fully replaced by their source row (every
non-key column overwritten, reproducing MERGE's update-all semantics),
unmatched target rows survive, unmatched source rows are the inserts.

Scale posture: the anti-join shuffles both sides on the key unless the
source batch is small — the common case for incremental loads — in which
case ``broadcast_source=True`` (default "auto") turns it into a broadcast
hash join with NO shuffle of the 100 TB target. Skewed upsert keys are
split by AQE. For a deterministic result the source must be unique per key;
``dedupe_source_by`` applies latest-per-key first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.operators.dedup import latest_per_key


def _fits_broadcast(df: DataFrame) -> bool:
    """True iff Catalyst's own size estimate of ``df`` is within the
    session's ``spark.sql.autoBroadcastJoinThreshold`` (and the threshold
    is not disabled with -1). Falls back to False on any estimation
    failure — NOT broadcasting is always safe (Catalyst/AQE may still pick
    a broadcast join on its own); forcing a broadcast of an unexpectedly
    large batch can OOM executors."""
    try:
        jconf = df.sparkSession._jsparkSession.sessionState().conf()
        threshold = int(jconf.autoBroadcastJoinThreshold())
        if threshold <= 0:
            return False
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        return size <= threshold
    except Exception:
        return False


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    dedupe_source_by: Sequence[str] | None = None,
    broadcast_source: bool | str = "auto",
) -> DataFrame:
    """MERGE semantics of reference ``run_load.py:82-90`` as a Spark plan.

    Columns are aligned by name to the target's schema; the source must
    contain at least the target's columns (extras are dropped, mirroring the
    MERGE statement which only references target columns).

    ``broadcast_source``: "auto" (default) broadcasts the source key probe
    only when its Catalyst size estimate fits the session's
    autoBroadcastJoinThreshold; True forces the hint (caller asserts the
    batch is small — an oversized forced broadcast can OOM executors);
    False leaves join strategy entirely to Catalyst/AQE.
    """
    keys = list(keys)
    missing = [c for c in target.columns if c not in source.columns]
    if missing:
        raise ValueError(f"source is missing target columns: {missing}")
    src = source
    if dedupe_source_by:
        src = latest_per_key(src, keys, dedupe_source_by)
    src = src.select(*target.columns)
    probe = src.select(*keys)
    if broadcast_source is True or (broadcast_source == "auto" and _fits_broadcast(probe)):
        probe = F.broadcast(probe)
    kept_target = target.join(probe, on=keys, how="left_anti")
    return src.unionByName(kept_target)
