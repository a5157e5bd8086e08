"""Unit tests for core operators: conform drift-tolerance, dedup
determinism, upsert MERGE semantics + idempotency, QC checks, nested
flattening — mirroring the reference's behaviors (SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.operators.conform import ColumnSpec, Contract, conform
from azure_etl_databricks_sql_powerbi_spark.operators.dedup import dedupe_exact, latest_per_key
from azure_etl_databricks_sql_powerbi_spark.operators.nested import (
    explode_path,
    flatten_all,
    flatten_struct,
)
from azure_etl_databricks_sql_powerbi_spark.operators.qc import (
    check_freshness,
    check_min_rows,
    check_non_null,
    check_unique_key,
    qc_gate,
    run_checks,
)
from azure_etl_databricks_sql_powerbi_spark.operators.upsert import merge_upsert

CONTRACT = Contract(
    columns=(
        ColumnSpec("id", "bigint", required=True),
        ColumnSpec("email", "string", expr=lambda c: F.lower(F.trim(c))),
        ColumnSpec("created_at", "timestamp"),
        ColumnSpec("amount", "double"),
    )
)


def test_conform_applies_casts_and_exprs(spark):
    df = spark.createDataFrame(
        [("1", "  Bob@X.COM ", "2024-01-01 00:00:00", "12.5")],
        "id string, email string, created_at string, amount string",
    )
    out = conform(df, CONTRACT, audit_ts="2026-01-01 00:00:00")
    row = out.collect()[0]
    assert row.id == 1 and row.email == "bob@x.com"
    assert str(row.created_at) == "2024-01-01 00:00:00"
    assert row.amount == 12.5
    assert str(row.etl_loaded_at) == "2026-01-01 00:00:00"
    assert dict(out.dtypes)["amount"] == "double"


def test_conform_tolerates_missing_optional_column(spark):
    df = spark.createDataFrame([("1",)], "id string")  # drifted: no email/amount
    out = conform(df, CONTRACT, audit_ts="2026-01-01 00:00:00")
    assert out.columns == ["id", "email", "created_at", "amount", "etl_loaded_at"]
    assert out.collect()[0].email is None


def test_conform_missing_required_raises(spark):
    df = spark.createDataFrame([("x",)], "email string")
    with pytest.raises(ValueError, match="id"):
        conform(df, CONTRACT)


def test_conform_drops_extras_by_default(spark):
    df = spark.createDataFrame([("1", "z")], "id string, junk string")
    out = conform(df, CONTRACT, audit_ts="2026-01-01 00:00:00")
    assert "junk" not in out.columns


def test_dedupe_exact_one_row_per_key(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "id long, v string")
    assert dedupe_exact(df, ["id"]).count() == 2


def test_latest_per_key_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01", "old"), (1, "2024-02-01", "new"), (2, "2024-01-15", "only")],
        "id long, updated_at string, v string",
    ).withColumn("updated_at", F.to_timestamp("updated_at"))
    out = {r.id: r.v for r in latest_per_key(df, ["id"], ["updated_at"]).collect()}
    assert out == {1: "new", 2: "only"}


def _orders(spark, rows):
    return spark.createDataFrame(rows, "k long, status string, price double")


def test_merge_upsert_update_and_insert(spark):
    target = _orders(spark, [(1, "old", 10.0), (2, "keep", 20.0)])
    source = _orders(spark, [(1, "new", 11.0), (3, "ins", 30.0)])
    out = {r.k: (r.status, r.price) for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: ("new", 11.0), 2: ("keep", 20.0), 3: ("ins", 30.0)}


def test_merge_upsert_idempotent(spark):
    target = _orders(spark, [(1, "old", 10.0), (2, "keep", 20.0)])
    source = _orders(spark, [(1, "new", 11.0), (3, "ins", 30.0)])
    once = merge_upsert(target, source, ["k"])
    twice = merge_upsert(once, source, ["k"])
    assert sorted(once.collect()) == sorted(twice.collect())


def test_merge_upsert_dedupes_source(spark):
    target = _orders(spark, [(1, "old", 10.0)])
    source = spark.createDataFrame(
        [(1, "v1", 1.0, 1), (1, "v2", 2.0, 2)], "k long, status string, price double, ver int"
    )
    out = merge_upsert(target, source, ["k"], dedupe_source_by=["ver"]).collect()
    assert len(out) == 1 and out[0].status == "v2"


def test_qc_checks_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x"), (2, "c", "y")], "id long, v string, n string"
    )
    results = run_checks(
        df,
        [
            check_min_rows(2),
            check_min_rows(10),
            check_non_null("n", max_null_rate=0.5),
            check_non_null("n", max_null_rate=0.1),
            check_non_null("missing_col"),
            check_unique_key("id"),
        ],
    )
    passed = [r.passed for r in results]
    assert passed == [True, False, True, False, False, False]
    assert "missing" in results[4].detail


def test_qc_gate_raises_on_failure(spark):
    df = spark.createDataFrame([(1,)], "id long")
    assert qc_gate(df, [check_min_rows(1)]) is df
    with pytest.raises(ValueError, match="min_rows"):
        qc_gate(df, [check_min_rows(5)])


def test_check_freshness(spark):
    df = spark.createDataFrame([("2020-01-01",)], "ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    (res,) = run_checks(df, [check_freshness("ts", max_age_days=30)])
    assert not res.passed  # 2020 is stale


def _qbo_shaped(spark):
    return spark.createDataFrame(
        [
            (
                {
                    "Invoice": [
                        {"Id": "1", "Total": 10.0},
                        {"Id": "2", "Total": 20.0},
                    ],
                    "maxResults": 2,
                },
            )
        ],
        "QueryResponse struct<Invoice: array<struct<Id: string, Total: double>>, maxResults: long>",
    )


def test_explode_path_and_flatten(spark):
    df = _qbo_shaped(spark)
    items = explode_path(df, "QueryResponse.Invoice")
    flat = flatten_struct(items, "item")
    rows = sorted((r.Id, r.Total) for r in flat.collect())
    assert rows == [("1", 10.0), ("2", 20.0)]


def test_flatten_all_recursive(spark):
    df = _qbo_shaped(spark)
    flat = flatten_all(df, explode_arrays=True)
    assert sorted(flat.columns) == [
        "QueryResponse_Invoice_Id",
        "QueryResponse_Invoice_Total",
        "QueryResponse_maxResults",
    ]
    assert flat.count() == 2


def test_approx_count_distinct_bound(spark):
    from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    exact = orders.select(F.count_distinct("o_custkey")).collect()[0][0]
    approx = orders.select(F.approx_count_distinct("o_custkey")).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05


def test_approx_percentile_bound(spark):
    """approx_percentile at accuracy 10k must land within 1% relative
    error of the exact interpolated percentile on this data."""
    from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    exact = orders.select(F.percentile("o_totalprice", 0.5)).collect()[0][0]
    approx = orders.select(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10_000))
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.01


def test_salted_join_matches_plain(spark):
    """Skewed fact (one hot key) joined salted == plain join, inner+left."""
    from azure_etl_databricks_sql_powerbi_spark.operators.skew import (
        salted_join,
        two_phase_distinct,
    )

    big = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("rowid"),
    )
    small = spark.createDataFrame(
        [(int(i), f"dim{i}") for i in range(40)], "k long, label string"
    )
    for how in ("inner", "left"):
        plain = {tuple(r) for r in big.join(small, on=["k"], how=how).collect()}
        salted = {
            tuple(r)
            for r in salted_join(big, small, keys=["k"], n_salts=8, how=how,
                                 salt_on="rowid").collect()
        }
        assert salted == plain, how
    # two-phase distinct == direct count_distinct
    direct = {
        (r["k"], r["n"]) for r in big.groupBy("k").agg(F.count_distinct("rowid").alias("n")).collect()
    }
    twop = {
        (r["k"], r["n_distinct"]) for r in two_phase_distinct(big, ["k"], "rowid").collect()
    }
    assert twop == direct


def test_merge_upsert_auto_broadcast_modes(spark):
    """broadcast_source='auto' (default) broadcasts only when Catalyst's
    size estimate fits autoBroadcastJoinThreshold; the plan carries a
    BroadcastHashJoin for a tiny batch and results are identical across
    all three modes."""
    target = spark.createDataFrame(
        [(i, "old", float(i)) for i in range(100)], "k long, status string, price double"
    )
    # Range-backed source so Catalyst has a real size estimate; an
    # RDD-backed frame has unknown stats and auto correctly declines to
    # force the broadcast (Catalyst/AQE still may).
    source = spark.range(1, 2).select(
        F.col("id").alias("k"), F.lit("new").alias("status"), F.lit(9.9).alias("price")
    )
    plans = {}
    results = {}
    for mode in ("auto", True, False):
        df = merge_upsert(target, source, ["k"], broadcast_source=mode)
        plans[str(mode)] = df._jdf.queryExecution().executedPlan().toString()
        results[str(mode)] = {tuple(r) for r in df.collect()}
    assert "BroadcastHashJoin" in plans["auto"]  # tiny probe -> broadcast
    assert "BroadcastHashJoin" in plans["True"]
    assert results["auto"] == results["True"] == results["False"]


def test_observed_qc_matches_run_checks(spark, tmp_path):
    """attach_observed_checks must produce the SAME results as run_checks
    while piggybacking on the consuming action (a write) instead of a
    second scan; missing-column checks still fail at plan time."""
    from azure_etl_databricks_sql_powerbi_spark.operators.qc import attach_observed_checks

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x"), (2, "c", "y")], "id long, v string, n string"
    )
    checks = [
        check_min_rows(2),
        check_min_rows(10),
        check_non_null("n", max_null_rate=0.5),
        check_non_null("missing_col"),
        check_unique_key("id"),
    ]
    observed, finish = attach_observed_checks(df, checks)
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = finish()
    want = run_checks(df, checks)
    assert [(r.check_name, r.passed) for r in got] == [
        (r.check_name, r.passed) for r in want
    ]
    assert spark.read.parquet(str(tmp_path / "out")).count() == 3


def test_observed_qc_all_missing_columns(spark):
    from azure_etl_databricks_sql_powerbi_spark.operators.qc import attach_observed_checks

    df = spark.createDataFrame([(1,)], "id long")
    out, finish = attach_observed_checks(df, [check_non_null("nope")])
    assert out is df  # no observation attached when nothing is live
    [r] = finish()
    assert not r.passed and "missing" in r.detail


def test_pandas_udaf_median_equals_builtin(spark):
    """§2.10 UDAF surface: the Arrow grouped-agg median UDAF must agree
    with the built-in F.median on every group — the built-in stays the
    documented fast path."""
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.functions.udafs import median_udaf

    df = spark.createDataFrame(
        [(g, float(v)) for g in range(4) for v in range(g + 3)],
        "g int, v double",
    )
    via_udaf = {
        r["g"]: r["m"]
        for r in df.groupBy("g").agg(median_udaf("v").alias("m")).collect()
    }
    builtin = {
        r["g"]: r["m"]
        for r in df.groupBy("g").agg(F.median("v").alias("m")).collect()
    }
    assert via_udaf == builtin


def test_pseudonymize_preserves_joinability_and_nulls(spark):
    """Keyed masking: identical values get identical tokens (joins still
    line up), different salts re-key the space, NULLs stay NULL, raw
    values never appear in the output."""
    from azure_etl_databricks_sql_powerbi_spark.operators.privacy import pseudonymize

    a = spark.createDataFrame([(1, "alice"), (2, "bob"), (3, None)], "id long, name string")
    b = spark.createDataFrame([(9, "alice")], "id long, name string")
    ma = pseudonymize(a, ["name"], salt="s1").collect()
    mb = pseudonymize(b, ["name"], salt="s1").collect()
    tok = {r["id"]: r["name"] for r in ma}
    assert tok[3] is None
    assert tok[1] == mb[0]["name"]          # joinability across tables
    assert tok[1] != tok[2]
    assert "alice" not in (tok[1] or "")    # raw value gone
    rekeyed = pseudonymize(a, ["name"], salt="s2").collect()[0]["name"]
    assert rekeyed != tok[1]                # salt rotation re-keys


def test_k_anonymity_violations_flags_small_groups(spark):
    from azure_etl_databricks_sql_powerbi_spark.operators.privacy import (
        k_anonymity_violations,
    )

    rows = [("us", "A")] * 5 + [("us", "B")] * 2 + [("de", "A")]
    df = spark.createDataFrame(rows, "country string, seg string")
    got = {
        (r["country"], r["seg"]): r["n_rows"]
        for r in k_anonymity_violations(df, ["country", "seg"], k=3).collect()
    }
    assert got == {("us", "B"): 2, ("de", "A"): 1}


def test_accepted_values_check(spark):
    """dbt accepted_values semantics: out-of-domain non-NULL values
    count as violations, NULL does not (pair with check_non_null)."""
    from azure_etl_databricks_sql_powerbi_spark.operators.qc import (
        check_accepted_values,
        run_checks,
    )

    df = spark.createDataFrame(
        [("a",), ("b",), ("zzz",), (None,), ("b",)], "status string"
    )
    (res,) = run_checks(df, [check_accepted_values("status", ["a", "b"])])
    assert not res.passed  # one 'zzz'
    (ok,) = run_checks(df, [check_accepted_values("status", ["a", "b", "zzz"])])
    assert ok.passed
