"""Units: domain mixing allocation, corpus stats, Q2-shaped argmin plan."""

from __future__ import annotations

from azure_etl_databricks_sql_powerbi_spark.operators.mixing import (
    domain_mix_allocation,
)
from azure_etl_databricks_sql_powerbi_spark.plans.curation import corpus_stats
from azure_etl_databricks_sql_powerbi_spark.plans.gold import min_cost_supplier


def test_domain_mix_cap_and_share(spark):
    df = spark.createDataFrame(
        [("a", 800), ("a", 100), ("b", 80), ("c", 20)],
        "source string, toks long",
    )
    rows = {
        r["domain"]: r
        for r in domain_mix_allocation(df, "source", "toks", cap_frac=0.5).collect()
    }
    # total = 1000; cap = 500
    assert rows["a"]["token_count"] == 900
    assert rows["a"]["alloc_tokens"] == 500 and rows["a"]["capped"] == 1
    assert rows["b"]["alloc_tokens"] == 80 and rows["b"]["capped"] == 0
    assert rows["c"]["share"] == 20 / 1000
    assert rows["a"]["doc_count"] == 2


def test_corpus_stats_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1", 5),
            (2, "a b c", "en", "s1", 5),  # exact dup
            (3, "", "de", "s2", 0),  # empty text -> 0 tokens
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    r = corpus_stats(df).collect()[0]
    assert r["n_docs"] == 3 and r["n_sources"] == 2 and r["n_langs"] == 2
    assert r["total_tokens"] == 6 and r["total_chars"] == 10
    assert r["exact_dup_docs"] == 1
    assert r["dup_rate"] == 1 / 3


# The retired corpus_stats driver query's full SQL twin + hash-exact
# proof (ROTATION_POLICY.md §5 swap #13: the data-card column set now
# rides dataset_split_summary per split; the operator and this
# cell-for-cell contract REMAIN — retirement removes driver-evidence
# obligations, never capability).
CORPUS_STATS_SQL = r"""
    SELECT COUNT(*)::BIGINT AS n_docs,
           COUNT(DISTINCT source)::BIGINT AS n_sources,
           COUNT(DISTINCT lang)::BIGINT AS n_langs,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                         ELSE len(string_split_regex(TRIM(text), '\s+'))
                    END) AS BIGINT) AS total_tokens,
           (COUNT(*) - COUNT(DISTINCT text))::BIGINT AS exact_dup_docs,
           (COUNT(*) - COUNT(DISTINCT text)) / COUNT(*) AS dup_rate
    FROM documents
"""


def test_corpus_stats_twin_hash_exact(spark):
    """The retired query's oracle contract, cell-for-cell at sf0.001
    (the tests/test_gold_twins.py pattern for hash-exact retirees)."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = corpus_stats(docs).collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = con.execute(CORPUS_STATS_SQL).fetchone()
    cols = (
        "n_docs", "n_sources", "n_langs", "total_chars", "total_tokens",
        "exact_dup_docs", "dup_rate",
    )
    eng = {c: got[c] for c in cols}
    orc = dict(zip([d[0] for d in con.execute(CORPUS_STATS_SQL).description],
                   want))
    assert eng == orc


def test_min_cost_supplier_ties_resolve_to_lowest_suppkey(spark):
    lineitem = spark.createDataFrame(
        [
            # part 1: suppliers 7 and 3 at identical unit price -> pick 3
            (1, 7, 2.0, 10.0),
            (1, 3, 4.0, 20.0),
            # part 1: supplier 9 cheaper on one line
            (1, 9, 4.0, 16.0),
        ],
        "l_partkey long, l_suppkey long, l_quantity double, l_extendedprice double",
    )
    part = spark.createDataFrame(
        [(1, "widget", "B", "T", 5, 9.99)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    supplier = spark.createDataFrame(
        [(3, "s3", 0, 1.0), (7, "s7", 0, 1.0), (9, "s9", 0, 1.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    rows = min_cost_supplier(lineitem, part, supplier).collect()
    assert len(rows) == 1
    assert rows[0]["s_suppkey"] == 9 and rows[0]["best_unit_price"] == 4.0


def test_temperature_mix_flattens_and_respects_inventory(spark):
    """Temperature invariants: α=1 reproduces natural shares; smaller α
    strictly up-weights the low-resource domain and down-weights the
    head; q sums to 1; allocations never exceed inventory or budget,
    and the starved-inventory domain is flagged oversubscribed."""
    from azure_etl_databricks_sql_powerbi_spark.operators.mixing import (
        temperature_mix_allocation,
    )

    rows = (
        [(i, "web", 100) for i in range(90)]
        + [(1000 + i, "code", 100) for i in range(9)]
        + [(2000, "books", 100)]
    )
    df = spark.createDataFrame(rows, "doc_id long, domain string, n_tokens long")

    nat = {
        r.domain: r
        for r in temperature_mix_allocation(
            df, "domain", "n_tokens", budget_tokens=5000, alpha=1.0
        ).collect()
    }
    assert abs(nat["web"].q - 0.9) < 1e-12
    assert abs(nat["books"].q - 0.01) < 1e-12

    cool = {
        r.domain: r
        for r in temperature_mix_allocation(
            df, "domain", "n_tokens", budget_tokens=5000, alpha=0.3
        ).collect()
    }
    assert abs(sum(r.q for r in cool.values()) - 1.0) < 1e-9
    assert cool["books"].q > nat["books"].q  # low-resource up-weighted
    assert cool["web"].q < nat["web"].q      # head down-weighted
    for r in cool.values():
        assert r.alloc_tokens <= r.token_count
    assert sum(r.alloc_tokens for r in cool.values()) <= 5000
    # books holds 100 tokens but its temperature quota wants far more
    assert cool["books"].oversubscribed == 1 and cool["books"].alloc_tokens == 100
    assert cool["web"].oversubscribed == 0
