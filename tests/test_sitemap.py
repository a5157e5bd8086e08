"""Sitemap XML parsing (functions/sitemap): hand-written expectations
over realistic pretty-printed documents — CRUCIALLY including the
optional-field misalignment case (an entry missing lastmod between two
that have it) that parallel whole-document field arrays would get
wrong — sitemap-index detection, malformed-field behavior, the DuckDB
twin cell-for-cell from the module's own builder, the frontier
composition (canonicalize + robots prune), and the all-JVM plan pin."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.sitemap import (
    duckdb_parse_sitemap_sql,
    parse_sitemap,
    sitemap_frontier,
)

# pretty-printed, entry 2 omits lastmod/changefreq/priority, entry 3
# omits loc; priority '0.8' casts, 'high' does not
SITEMAP_XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>
      https://a.com/page1
    </loc>
    <lastmod>2024-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url>
    <loc>https://a.com/page2</loc>
  </url>
  <url>
    <lastmod>2024-02-01</lastmod>
  </url>
  <url>
    <loc>https://a.com/page3</loc>
    <priority>high</priority>
  </url>
</urlset>
"""

INDEX_XML = """<sitemapindex>
  <sitemap>
    <loc>https://a.com/sitemap-1.xml.gz</loc>
    <lastmod>2024-03-01</lastmod>
  </sitemap>
  <sitemap><loc>https://a.com/sitemap-2.xml.gz</loc></sitemap>
</sitemapindex>
"""

# sitemaps.org REQUIRES entity-escaping of data values: the canonical
# encoding of a two-parameter URL carries &amp;, and a double-escape
# must decode exactly once (&amp;amp; -> the text &amp;)
ENTITY_XML = (
    "<urlset><url>"
    "<loc>https://a.com/p?a=1&amp;b=2</loc>"
    "</url><url>"
    "<loc>https://a.com/q?x=&amp;amp;</loc>"
    "</url></urlset>"
)


def _docs(spark):
    return spark.createDataFrame(
        [("s", SITEMAP_XML), ("i", INDEX_XML), ("e", ENTITY_XML),
         ("n", None)],
        "doc_id string, xml string",
    )


def test_parse_hand_written(spark):
    rows = {
        (r.doc_id, r.kind, r.entry_idx): r
        for r in parse_sitemap(_docs(spark), keep_cols=("doc_id",)).collect()
    }
    e0 = rows[("s", "url", 0)]
    # surrounding whitespace/newlines trim away
    assert e0.loc == "https://a.com/page1"
    assert e0.lastmod == "2024-01-05"
    assert e0.changefreq == "daily" and e0.priority == 0.8
    # THE alignment case: entry 1 has only loc; its optional fields are
    # NULL, not entry 2's values
    e1 = rows[("s", "url", 1)]
    assert e1.loc == "https://a.com/page2"
    assert e1.lastmod is None and e1.changefreq is None
    # loc-less entry survives as a NULL-loc row (prunable, not an error)
    e2 = rows[("s", "url", 2)]
    assert e2.loc is None and e2.lastmod == "2024-02-01"
    # malformed priority -> NULL double
    assert rows[("s", "url", 3)].priority is None
    # index entries come out as kind='sitemap'
    assert rows[("i", "sitemap", 0)].loc == "https://a.com/sitemap-1.xml.gz"
    assert rows[("i", "sitemap", 1)].lastmod is None
    # no cross-kind leakage
    assert ("i", "url", 0) not in rows
    assert ("s", "sitemap", 0) not in rows
    # entity decode, exactly once (r13 sitemap review #1: &amp; is the
    # REQUIRED encoding of '&' in a loc; &amp;amp; decodes to '&amp;')
    assert rows[("e", "url", 0)].loc == "https://a.com/p?a=1&b=2"
    assert rows[("e", "url", 1)].loc == "https://a.com/q?x=&amp;"
    # NULL xml contributes zero rows (posexplode drops NULL arrays)
    assert not any(k[0] == "n" for k in rows)


def test_clash_guard_and_single_scan(spark):
    import pytest

    docs = _docs(spark)
    with pytest.raises(ValueError, match="reserved columns"):
        parse_sitemap(docs.withColumnRenamed("doc_id", "kind"),
                      keep_cols=("kind",))
    # ONE scan of the source (r13 sitemap review #4: the per-kind union
    # regex-scanned every XML body twice)
    plan = (
        parse_sitemap(docs, keep_cols=("doc_id",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") == 1


def test_duckdb_twin_cell_for_cell(spark):
    got = (
        parse_sitemap(_docs(spark), keep_cols=("doc_id",))
        .orderBy("doc_id", "kind", "entry_idx")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id VARCHAR, xml VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)",
        [("s", SITEMAP_XML), ("i", INDEX_XML), ("e", ENTITY_XML),
         ("n", None)],
    )
    want = con.execute(
        duckdb_parse_sitemap_sql(keep_cols=("doc_id",))
        + " ORDER BY doc_id, kind, entry_idx"
    ).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    assert got.astype(str).equals(want.astype(str))


def test_frontier_composition_with_robots(spark):
    """parse → canonicalize → distinct → robots prune: the seed list a
    fetch stage consumes. Uses UN-canonical locs (uppercase host, utm
    params, duplicates) and a robots table blocking one path."""
    from azure_etl_databricks_sql_powerbi_spark.functions.robots import (
        parse_robots,
    )

    xml = (
        "<urlset>"
        "<url><loc>https://A.com/keep?utm_source=x</loc></url>"
        "<url><loc>https://a.com/keep</loc></url>"  # dup after canon
        "<url><loc>https://a.com/private/x</loc></url>"
        "<url><loc>not a url</loc></url>"
        "</urlset>"
    )
    docs = spark.createDataFrame([(xml,)], "xml string")
    rules = parse_robots(
        spark.createDataFrame(
            [("a.com", "User-agent: *\nDisallow: /private/")],
            "domain string, robots_txt string",
        )
    )
    got = sorted(
        r.url for r in sitemap_frontier(docs, rules=rules).collect()
    )
    assert got == ["https://a.com/keep"]
    # without rules, the blocked URL stays; the non-URL loc never enters
    got2 = sorted(r.url for r in sitemap_frontier(docs).collect())
    assert got2 == ["https://a.com/keep", "https://a.com/private/x"]


def test_parse_plan_is_all_jvm(spark):
    plan = (
        parse_sitemap(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "MapInPandas" not in plan


# ---- property: dialect parity over adversarial XML fragments ----

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_XML_FRAGMENTS = [
    "<url>", "</url>", "<sitemap>", "</sitemap>", "<urlset>",
    "</urlset>", "<loc>", "</loc>", "<lastmod>", "</lastmod>",
    "<priority>", "</priority>", "<changefreq>", "</changefreq>",
    "https://a.com/p?x=1&amp;y=2", "2024-01-05", "0.8", "high",
    "daily", "&amp;amp;", "&lt;", " ", "\n  ", "<", ">", "text",
    "<url >", "<loc >",
]

_xml_docs = st.lists(
    st.lists(st.sampled_from(_XML_FRAGMENTS), max_size=16).map("".join),
    min_size=1,
    max_size=12,
)


@given(docs=_xml_docs)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_parse_sitemap_dialect_parity_property(spark, docs):
    """For any recombination of sitemap-ish fragments (nested/unclosed
    tags, entity escapes, whitespace padding, malformed priorities),
    Spark's parse equals the DuckDB builder cell-for-cell."""
    rows = [(str(i), x) for i, x in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id string, xml string")
    got = (
        parse_sitemap(df, keep_cols=("doc_id",))
        .orderBy("doc_id", "kind", "entry_idx")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id VARCHAR, xml VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    want = con.execute(
        duckdb_parse_sitemap_sql(keep_cols=("doc_id",))
        + " ORDER BY doc_id, kind, entry_idx"
    ).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    assert got.astype(str).equals(want.astype(str))


# ---- §5 swap #14: the declared sitemap_frontier query's unit proofs


def test_sitemap_plant_selector_coverage():
    """Simulate the plant in plain Python (the r13 correlated-selector
    lesson): the domain index floor(doc_id/4) % 20 must hit every
    (sitemap-branch, robots-branch) combination — doc_id % 20 would
    pin sitemap branch k to robots branch k % 4 — and the content
    index floor(doc_id/80) % 5 must cover all 5 values per branch."""
    n = 500  # sf0.001 documents row count
    combos = set()
    qcov = {b: set() for b in range(4)}
    for doc_id in range(n):
        b = doc_id % 4
        d = (doc_id // 4) % 20
        q = (doc_id // 80) % 5
        combos.add((b, d % 4))  # robots branch of the target domain
        qcov[b].add(q)
    assert combos == {(b, r) for b in range(4) for r in range(4)}
    for b, qs in qcov.items():
        assert qs == set(range(5)), f"branch {b}: only {qs}"


def test_sitemap_frontier_entry_query_vs_oracle(spark):
    """The declared query vs the entry's actual ORACLES string at unit
    scale, plus hand-written verdict spot checks: the sitemap-index
    pointer never reaches the frontier, /private/secret is blocked on
    full-policy domains, the longer /private/ok allow wins, /no-train/
    is allowed for the default '*' agent, the entity-escaped dup loc
    canonicalizes (lowercase host, :443 dropped, utm stripped, &amp;
    decoded) and deduplicates across documents."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        r.url
        for r in entry.QUERIES["sitemap_frontier"](spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(
        r[0]
        for r in con.execute(entry.ORACLES["sitemap_frontier"]).fetchall()
    )
    assert len(got) == len(want) > 0
    assert got == want
    s = set(got)
    assert not any(u.endswith(".xml") for u in s)  # index rows pruned
    assert "https://site0.com/dup.html?a=1" in s   # canon + decode
    assert sum(1 for u in s if u.endswith("/dup.html?a=1")) == 20  # deduped
    assert "https://site0.com/private/secret0.html" not in s  # blocked
    assert "https://site1.com/private/secret0.html" in s  # empty Disallow
    assert any("/private/ok" in u and "site0.com" in u for u in s)
    assert any("/no-train/" in u for u in s)  # '*' agent allowed
    assert not any(
        "/blocked/" in u
        and int(u.split("site")[1].split(".")[0]) % 4 == 2
        for u in s
    )
