"""Tests for sample_to_token_budget (allocation -> materialized corpus)
and ensemble_rank_scores (multi-signal rank averaging), each against a
module-owned DuckDB twin on the real documents table."""

from __future__ import annotations

import duckdb

from oracle_harness import compare

from azure_etl_databricks_sql_powerbi_spark.functions.ensemble import (
    ensemble_rank_scores,
    ensemble_sql,
)
from azure_etl_databricks_sql_powerbi_spark.operators.mixing import (
    domain_mix_allocation,
    sample_to_token_budget,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from pyspark.sql import functions as F

    return spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "n_tokens", F.size(F.split(F.trim("text"), r"\s+"))
    )


# DuckDB twin: the allocation arithmetic (domain_mix_allocation's green
# oracle pattern) + the budget-cut window with the SAME md5-prefix
# priority the operator uses (sampling.hash_bucket — portable by design).
BUDGET_SQL = r"""
    WITH d AS (
        SELECT *, len(string_split_regex(TRIM(text), '\s+')) AS n_tokens
        FROM read_parquet('{sf}/documents.parquet')
    ),
    per AS (
        SELECT source AS domain, SUM(n_tokens)::BIGINT AS token_count
        FROM d GROUP BY source
    ),
    t AS (SELECT SUM(token_count) AS total FROM per),
    alloc AS (
        SELECT domain,
               LEAST(token_count,
                     CAST(FLOOR(0.3 * total) AS BIGINT)) AS alloc_tokens
        FROM per, t
    ),
    ranked AS (
        SELECT d.*,
               (SUM(n_tokens) OVER (
                    PARTITION BY source
                    ORDER BY CAST(concat('0x',
                        substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS UBIGINT) % 4294967296 ASC,
                             doc_id ASC
                    ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT
                   AS cum_tokens_before,
               a.alloc_tokens
        FROM d JOIN alloc a ON a.domain = d.source
    )
    SELECT doc_id, cum_tokens_before
    FROM ranked WHERE cum_tokens_before < alloc_tokens
"""


def test_budget_sampler_matches_duckdb_twin(spark):
    docs = _docs(spark)
    alloc = domain_mix_allocation(docs, "source", "n_tokens", cap_frac=0.3)
    out = sample_to_token_budget(docs, alloc, "source", "n_tokens", "doc_id").select(
        "doc_id", "cum_tokens_before"
    )
    orc = duckdb.sql(BUDGET_SQL.format(sf=SF)).df()
    assert compare(out, orc, float_tol=0) == []


def test_budget_sampler_respects_allocation(spark):
    """Every domain's realized tokens land in [alloc - overshoot, alloc +
    one straddling doc]; keep-set is a pure function of the data."""
    docs = _docs(spark)
    alloc = domain_mix_allocation(docs, "source", "n_tokens", cap_frac=0.3)
    out = sample_to_token_budget(docs, alloc, "source", "n_tokens", "doc_id")
    budgets = {r.domain: r.alloc_tokens for r in alloc.collect()}
    realized: dict[str, int] = {}
    max_doc: dict[str, int] = {}
    for r in out.collect():
        realized[r.source] = realized.get(r.source, 0) + r.n_tokens
        max_doc[r.source] = max(max_doc.get(r.source, 0), r.n_tokens)
        assert r.cum_tokens_before < budgets[r.source]
    for dom, tok in realized.items():
        # overshoot bounded by the one straddling document
        assert tok < budgets[dom] + max_doc[dom]
    # determinism: second run keeps the identical id set
    again = sample_to_token_budget(docs, alloc, "source", "n_tokens", "doc_id")
    assert sorted(r.doc_id for r in again.select("doc_id").collect()) == sorted(
        r.doc_id for r in out.select("doc_id").collect()
    )


def test_budget_sampler_salt_redraws(spark):
    # cap_frac small enough that the budget BINDS (cuts docs) in every
    # domain — an unbinding budget keeps all docs under any priority
    # order, which is correct but tests nothing about the salt.
    docs = _docs(spark)
    alloc = domain_mix_allocation(docs, "source", "n_tokens", cap_frac=0.02)
    a = {
        r.doc_id
        for r in sample_to_token_budget(
            docs, alloc, "source", "n_tokens", "doc_id"
        ).collect()
    }
    b = {
        r.doc_id
        for r in sample_to_token_budget(
            docs, alloc, "source", "n_tokens", "doc_id", salt="v2"
        ).collect()
    }
    assert a != b  # a different priority order selects a different prefix


def test_ensemble_matches_module_twin(spark):
    from pyspark.sql import functions as F

    docs = _docs(spark).select(
        "doc_id",
        F.col("n_chars").cast("double").alias("s1"),
        F.col("n_tokens").cast("double").alias("s2"),
    )
    out = ensemble_rank_scores(docs, ["s1", "s2"], "doc_id", weights=[2.0, 1.0])
    src = (
        "SELECT doc_id, CAST(n_chars AS DOUBLE) AS s1, "
        r"CAST(len(string_split_regex(TRIM(text), '\s+')) AS DOUBLE) AS s2 "
        f"FROM read_parquet('{SF}/documents.parquet')"
    )
    orc = duckdb.sql(
        ensemble_sql(src, ["s1", "s2"], "doc_id", weights=[2.0, 1.0])
    ).df()
    assert compare(out, orc, float_tol=1e-12) == []


def test_ensemble_rank_bounds_and_monotonicity(spark):
    docs = _docs(spark).selectExpr(
        "doc_id", "CAST(n_chars AS DOUBLE) AS s1"
    )
    out = ensemble_rank_scores(docs, ["s1"], "doc_id").collect()
    by_score = sorted(out, key=lambda r: (r.s1, r.doc_id))
    assert by_score[0].ensemble_rank == 0.0
    assert abs(by_score[-1].ensemble_rank - 1.0) < 1e-12
    ranks = [r.ensemble_rank for r in by_score]
    assert ranks == sorted(ranks)  # monotone in the signal


def test_budget_sampler_missing_domain_raises(spark):
    docs = _docs(spark)
    dropped = docs.selectExpr("MIN(source)").collect()[0][0]
    alloc = domain_mix_allocation(
        docs.filter(f"source <> '{dropped}'"), "source", "n_tokens"
    )
    import pytest

    with pytest.raises(ValueError, match="no allocation row"):
        sample_to_token_budget(docs, alloc, "source", "n_tokens", "doc_id")
    # deliberate subset sampling stays available
    out = sample_to_token_budget(
        docs, alloc, "source", "n_tokens", "doc_id", require_full_coverage=False
    )
    assert out.select("source").distinct().count() == alloc.count()


def test_ensemble_sql_rejects_what_the_operator_rejects():
    """The twin must fail on the same bad input as the operator, or the
    oracle silently diverges (weights zip-truncation)."""
    import pytest

    for bad in ([2.0], [], [0.0, 0.0]):
        with pytest.raises(ValueError):
            ensemble_sql(
                "SELECT 1 AS s1, 2 AS s2, 3 AS id", ["s1", "s2"], "id", weights=bad
            )


def test_ensemble_pr_collision_raises(spark):
    """An input already carrying <col>_pr or out_col must fail loudly:
    withColumn would silently replace it while the SQL twin keeps both —
    the one silent-desync input class (ADVICE r8)."""
    import pytest
    from pyspark.sql import functions as F

    docs = _docs(spark).select(
        "doc_id",
        F.col("n_chars").cast("double").alias("s1"),
        F.lit(0.0).alias("s1_pr"),
    )
    with pytest.raises(ValueError, match="collide"):
        ensemble_rank_scores(docs, ["s1"], "doc_id")
    with pytest.raises(ValueError, match="collide"):
        ensemble_rank_scores(
            docs.drop("s1_pr").withColumn("ensemble_rank", F.lit(1.0)),
            ["s1"],
            "doc_id",
        )
    with pytest.raises(ValueError, match="duplicate"):
        ensemble_rank_scores(docs.drop("s1_pr"), ["s1", "s1"], "doc_id")
