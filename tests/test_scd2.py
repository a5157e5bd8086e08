"""SCD2 history: snapshot rebuild, incremental apply, idempotency, and
rebuild ≡ incremental equivalence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.operators.scd2 import (
    scd2_apply,
    scd2_from_snapshots,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _snapshots(spark):
    rows = [
        # key 1: a -> a (collapsed) -> b
        (1, "a", _ts("2024-01-01")),
        (1, "a", _ts("2024-02-01")),
        (1, "b", _ts("2024-03-01")),
        # key 2: constant
        (2, "x", _ts("2024-01-15")),
    ]
    return spark.createDataFrame(rows, "k long, status string, ts timestamp")


def test_from_snapshots_runs_and_intervals(spark):
    hist = scd2_from_snapshots(_snapshots(spark), ["k"], ["status"], "ts")
    got = {
        (r["k"], r["status"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in hist.collect()
    }
    assert got == {
        (1, "a", _ts("2024-01-01"), _ts("2024-03-01"), False),
        (1, "b", _ts("2024-03-01"), None, True),
        (2, "x", _ts("2024-01-15"), None, True),
    }


def test_apply_change_new_and_idempotent(spark):
    hist = scd2_from_snapshots(_snapshots(spark), ["k"], ["status"], "ts")
    batch = spark.createDataFrame(
        [
            (1, "c", _ts("2024-04-01")),  # change
            (2, "x", _ts("2024-04-01")),  # unchanged -> no-op
            (3, "new", _ts("2024-04-01")),  # new key
        ],
        "k long, status string, ts timestamp",
    )
    out = scd2_apply(hist, batch, ["k"], ["status"], "ts")
    got = {
        (r["k"], r["status"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    }
    assert (1, "b", _ts("2024-03-01"), _ts("2024-04-01"), False) in got
    assert (1, "c", _ts("2024-04-01"), None, True) in got
    assert (2, "x", _ts("2024-01-15"), None, True) in got
    assert (3, "new", _ts("2024-04-01"), None, True) in got
    assert len(got) == 5
    # re-applying the identical batch changes nothing
    again = {
        (r["k"], r["status"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_apply(out, batch, ["k"], ["status"], "ts").collect()
    }
    assert again == got


def test_apply_equals_rebuild(spark):
    """Applying versions batch-by-batch reproduces the one-shot rebuild."""
    snaps = _snapshots(spark)
    full = scd2_from_snapshots(snaps, ["k"], ["status"], "ts")
    # replay: first batch = earliest row per key, then each later ts batch
    first = scd2_from_snapshots(
        snaps.withColumn(
            "__rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "k"
                ).orderBy("ts")
            ),
        ).filter(F.col("__rn") == 1).drop("__rn"),
        ["k"],
        ["status"],
        "ts",
    )
    hist = first
    for ts in [_ts("2024-02-01"), _ts("2024-03-01")]:
        batch = snaps.filter(F.col("ts") == ts)
        hist = scd2_apply(hist, batch, ["k"], ["status"], "ts")
    a = {tuple(r) for r in hist.collect()}
    b = {tuple(r) for r in full.collect()}
    assert a == b


def test_apply_late_batch_raises(spark):
    """A batch whose effective ts precedes the open row's valid_from must
    fail loudly (inverted interval guard), not emit valid_to < valid_from."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    hist = scd2_from_snapshots(_snapshots(spark), ["k"], ["status"], "ts")
    late = spark.createDataFrame(
        [(1, "z", _ts("2024-02-15"))], "k long, status string, ts timestamp"
    )  # key 1's open row starts 2024-03-01 -> late
    with pytest.raises(SparkRuntimeException, match="late-arriving batch"):
        scd2_apply(hist, late, ["k"], ["status"], "ts").collect()


def test_pit_join_picks_version_valid_at_fact_ts(spark):
    """Facts at interval boundaries, mid-interval, before the first
    version (NULL), in the open current version, and with an unknown key
    (NULL) — plus the broadcast-dim plan shape."""
    from azure_etl_databricks_sql_powerbi_spark.operators.scd2 import pit_join

    hist = scd2_from_snapshots(_snapshots(spark), ["k"], ["status"], "ts")
    facts = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-01")),  # exactly on first valid_from -> a
            (101, 1, _ts("2024-02-15")),  # mid first interval -> a
            (102, 1, _ts("2024-03-01")),  # on the change ts -> the NEW version b
            (103, 1, _ts("2030-01-01")),  # far future, open row -> b
            (104, 1, _ts("2023-12-31")),  # before any version -> NULL
            (105, 9, _ts("2024-06-01")),  # unknown key -> NULL
        ],
        "fid long, k long, ts timestamp",
    )
    out = pit_join(facts, hist, keys=["k"], fact_ts="ts", broadcast_dim=True)
    got = {r.fid: r.status for r in out.collect()}
    assert got == {100: "a", 101: "a", 102: "b", 103: "b", 104: None, 105: None}
    assert out.count() == 6  # left join: no fact dropped, no fan-out
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_referential_orphan_counts(spark):
    """Planted orphans: dangling FK, NULL FK (counts as orphan), and a
    fully-covered edge counting zero."""
    from azure_etl_databricks_sql_powerbi_spark.operators.qc import (
        referential_orphan_counts,
    )

    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 7), (13, None)], "cid long, fk long"
    )
    ok_child = spark.createDataFrame([(20, 1)], "cid long, fk long")
    row = referential_orphan_counts(
        [
            ("bad", child, "fk", parent, "pk"),
            ("good", ok_child, "fk", parent, "pk"),
        ]
    ).collect()[0]
    assert row.orphans_bad == 2  # fk=7 dangling + fk=NULL
    assert row.orphans_good == 0
