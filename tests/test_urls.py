"""URL/domain provenance functions: host extraction, registered-domain
semantics (multi-part suffixes, IP hosts, non-URLs), blocklist filtering
in both forms, concentration stats — and a DuckDB twin pinning host +
registered domain + blocklist verdict cell-for-cell (the functions/pii.py
dialect-parity discipline: one shared RE2/Java-compatible regex)."""

from __future__ import annotations

import duckdb
import pytest

from azure_etl_databricks_sql_powerbi_spark.functions.urls import (
    HOST6_RE,
    HOST_RE,
    MULTI_PART_SUFFIXES,
    domain_stats,
    filter_blocklisted_domains,
    registered_domain,
    url_host,
)

ROWS = [
    (1, "https://WWW.Example.COM/path?q=1#frag"),
    (2, "http://user:pw@news.bbc.co.uk:8080/story"),
    (3, "https://sub.deep.blog.example.co.uk/"),
    (4, "ftp://mirror.kernel.org/pub"),
    (5, "https://10.0.0.1:8443/admin"),
    (6, "not a url at all"),
    (7, "https://localhost/dev"),
    (8, "https://cdn.static.example.com.au/img.png"),
    (9, "https://BadSite.com./trailing-root-dot"),
    (10, "https://[2001:db8::1]:8443/v6"),
]
SCHEMA = "doc_id long, url string"

WANT_HOST = {
    1: "www.example.com",
    2: "news.bbc.co.uk",
    3: "sub.deep.blog.example.co.uk",
    4: "mirror.kernel.org",
    5: "10.0.0.1",
    6: None,
    7: "localhost",
    8: "cdn.static.example.com.au",
    9: "badsite.com",
    10: "2001:db8::1",
}
WANT_DOMAIN = {
    1: "example.com",
    2: "bbc.co.uk",
    3: "example.co.uk",
    4: "kernel.org",
    5: "10.0.0.1",
    6: None,
    7: "localhost",
    8: "example.com.au",
    9: "badsite.com",
    10: "2001:db8::1",
}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_host_and_registered_domain(spark, docs):
    got = {
        r.doc_id: (r.h, r.d)
        for r in docs.select(
            "doc_id",
            url_host("url").alias("h"),
            registered_domain("url").alias("d"),
        ).collect()
    }
    for i, host in WANT_HOST.items():
        assert got[i][0] == host, (i, got[i])
    for i, dom in WANT_DOMAIN.items():
        assert got[i][1] == dom, (i, got[i])


def test_blocklist_filtering_both_forms(spark, docs):
    # mixed case on the blocklist side must still block (domains compare
    # lowercase both sides), and the trailing-root-dot URL (9) must not
    # evade its blocklist entry
    blocked = ["Example.co.uk", "kernel.org", "BADSITE.com"]
    seq_kept = {
        r.doc_id
        for r in filter_blocklisted_domains(docs, "url", blocked).collect()
    }
    assert seq_kept == {1, 2, 5, 7, 8, 10}  # 3,4,9 blocked; 6 unparseable dropped
    df_blocked = spark.createDataFrame([(d,) for d in blocked], "domain string")
    df_kept = {
        r.doc_id
        for r in filter_blocklisted_domains(docs, "url", df_blocked).collect()
    }
    assert df_kept == seq_kept
    with_unparseable = {
        r.doc_id
        for r in filter_blocklisted_domains(
            docs, "url", blocked, keep_unparseable=True
        ).collect()
    }
    assert with_unparseable == seq_kept | {6}
    # empty blocklist keeps every parseable row
    assert {
        r.doc_id for r in filter_blocklisted_domains(docs, "url", []).collect()
    } == {1, 2, 3, 4, 5, 7, 8, 9, 10}
    # a pre-existing __dom column must refuse loudly, never be clobbered
    import pytest as _pytest
    from pyspark.sql import functions as F

    with _pytest.raises(ValueError, match="__dom"):
        filter_blocklisted_domains(
            docs.withColumn("__dom", F.lit("x")), "url", df_blocked
        )


def test_domain_stats_shares_and_null_row(spark, docs):
    rows = {r.domain: r for r in domain_stats(docs, "url").collect()}
    assert rows["example.com"].n_docs == 1
    assert abs(rows["example.com"].share - round(1 / 9, 6)) < 1e-9
    assert rows[None].n_docs == 1 and rows[None].share is None  # coverage loss visible
    parseable = [r for d, r in rows.items() if d is not None]
    # shares are display-rounded to 6 dp, so the sum is off by at most
    # one rounding quantum per domain
    assert abs(sum(r.share for r in parseable) - 1.0) <= 1e-6 * len(parseable)


def test_host_domain_and_verdict_match_duckdb_twin(spark, docs):
    """Dialect parity: same HOST_RE, same label arithmetic, same
    multi-part suffix set replayed in DuckDB — host, registered domain,
    and blocklist verdict identical cell-for-cell."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    suffixes = ", ".join(f"'{s}'" for s in MULTI_PART_SUFFIXES)
    blocked = "'example.co.uk', 'kernel.org'"
    sql = f"""
        WITH h0 AS (
            SELECT doc_id,
                   nullif(lower(regexp_extract(url, '{HOST6_RE}', 1)), '') AS host6,
                   nullif(regexp_replace(
                       lower(regexp_extract(url, '{HOST_RE}', 1)),
                       '\\.+$', ''), '') AS hostn
            FROM t
        ),
        h AS (SELECT doc_id, coalesce(host6, hostn) AS host FROM h0),
        d AS (
            SELECT doc_id, host,
                   CASE
                     WHEN host IS NULL THEN NULL
                     WHEN regexp_matches(host, '^\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}$')
                          OR contains(host, ':')
                          OR len(string_split(host, '.')) <= 2 THEN host
                     WHEN array_to_string(string_split(host, '.')[-2:], '.')
                          IN ({suffixes})
                       THEN array_to_string(string_split(host, '.')[-3:], '.')
                     ELSE array_to_string(string_split(host, '.')[-2:], '.')
                   END AS dom
            FROM h
        )
        SELECT doc_id, host, dom,
               dom IS NOT NULL AND dom NOT IN ({blocked}) AS kept
        FROM d
    """
    orc = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    from pyspark.sql import functions as F

    got = {
        r.doc_id: (r.h, r.d, r.kept)
        for r in docs.select(
            "doc_id",
            url_host("url").alias("h"),
            registered_domain("url").alias("d"),
            F.coalesce(
                registered_domain("url").isNotNull()
                & ~registered_domain("url").isin("example.co.uk", "kernel.org"),
                F.lit(False),
            ).alias("kept"),
        ).collect()
    }
    assert got == orc
