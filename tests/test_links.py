"""Hyperlink extraction / URL resolution / canonicalization / edge
building (functions/links): hand-written expectations per resolution
branch and canonicalization rule, DuckDB twin parity cell-for-cell from
the module's own builders, the all-JVM plan pin, and the PLAN-SIZE
BOUND that pins the r13 expression-blowup regression (multi-reference
CASE templates inflated the optimized plan to 28.5M chars / 108 MiB
task binaries; the single-reference regex design keeps it ~75k)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.links import (
    canonicalize_urls,
    duckdb_canonicalize_url_sql,
    duckdb_extract_links_sql,
    duckdb_resolve_hrefs_sql,
    extract_links,
    link_edges,
    resolve_hrefs,
)

HTML = (
    '<p><a href="https://X.com:443/a?utm_source=z&b=1#f">x</a>\n'
    "<a href='/root.html'>y</a> <a href=\"../up/page#frag\">z</a>\n"
    '<A HREF="//cdn.x.com/lib.js">w</A> <a href="mailto:a@b.c">m</a>\n'
    '<a href="sub/./d.html">s</a> <a href="#top">t</a></p>'
)
BASE = "https://Base.com/dir/sub/index.html?q=2"


def test_extract_links_hand_written(spark):
    df = spark.createDataFrame([(HTML,)], "html string")
    got = df.select(extract_links("html").alias("l")).collect()[0].l
    # double-quoted matches in document order first, then single-quoted
    assert got == [
        "https://X.com:443/a?utm_source=z&b=1#f",
        "../up/page#frag",
        "//cdn.x.com/lib.js",
        "mailto:a@b.c",
        "sub/./d.html",
        "#top",
        "/root.html",
    ]


RESOLVE_CASES = [
    # (base, href, expected)
    (BASE, "https://other.com/abs", "https://other.com/abs"),
    (BASE, "//cdn.x.com/lib.js", "https://cdn.x.com/lib.js"),
    (BASE, "/root.html", "https://Base.com/root.html"),
    (BASE, "rel.html", "https://Base.com/dir/sub/rel.html"),
    (BASE, "./same.html", "https://Base.com/dir/sub/same.html"),
    (BASE, "../up/page", "https://Base.com/dir/up/page"),
    (BASE, "../../top", "https://Base.com/top"),
    # bound: with a fully-nested chain each pass collapses ONE level
    # (matches cannot overlap), so 4 passes resolve 4 of the 5 levels
    # and the residue stays, conservatively
    (
        "https://h.com/a/b/c/d/e/f.html",
        "../../../../../x",
        "https://h.com/a/../x",
    ),
    (BASE, "#top", None),
    (BASE, "", None),
    (BASE, None, None),
    (BASE, "mailto:a@b.c", None),
    (BASE, "javascript:void(0)", None),
    (BASE, "JAVASCRIPT:alert(1)", None),  # scheme match is case-blind
    # scheme-less base: absolute hrefs survive, relative cannot resolve
    ("not a url", "https://ok.com/x", "https://ok.com/x"),
    ("not a url", "rel.html", None),
    (None, "rel.html", None),
    # base with no path: relative joins with the '/' separator
    ("https://bare.com", "x.html", "https://bare.com/x.html"),
    # dot-segments in an ABSOLUTE href collapse too (frontier form)...
    (BASE, "https://a.com/p/../q", "https://a.com/q"),
    # ...never across the authority (the prefix/tail split), and a
    # path-LEADING '..' residue collapses to '/' per RFC
    # remove_dot_segments — a fetcher requests /q here (r14 ADVICE #2)
    (BASE, "https://a.com/../q", "https://a.com/q"),
    (BASE, "https://a.com/../../q", "https://a.com/q"),
    (BASE, "https://a.com/../", "https://a.com/"),
    (BASE, "https://a.com/..", "https://a.com/"),
    # leading residue PRODUCED by the collapse chains resolves too
    (BASE, "https://a.com/a/../../q", "https://a.com/q"),
    # r14 ADVICE #1: WHATWG trims surrounding space/tab/CR/LF before
    # scheme detection — multi-line attributes stay root-relative /
    # absolute instead of falling into the generic-relative branch
    (BASE, "\n  /page", "https://Base.com/page"),
    (BASE, " https://x.com/a", "https://x.com/a"),
    (BASE, "\t../up\r\n", "https://Base.com/dir/up"),
    (BASE, "   ", None),  # whitespace-only trims to '' -> NULL
    # r13 links review #1: contains('://') is NOT absoluteness — the
    # ubiquitous outbound-redirect href resolves against the base
    (BASE, "/out?url=https://x.com", "https://Base.com/out?url=https://x.com"),
    (BASE, "go?to=https://x.com",
     "https://Base.com/dir/sub/go?to=https://x.com"),
    # r13 links review #2: dot-collapse never rewrites path-like QUERY
    # values (RFC 3986 limits dot-segment removal to the path)
    (BASE, "/p?path=/a/b/../c", "https://Base.com/p?path=/a/b/../c"),
    # r13 links review #3: any scheme-bearing ref without '://' is
    # non-fetchable, not a relative path
    (BASE, "about:blank", None),
    (BASE, "spotify:track:xyz", None),
    (BASE, "tel:+1-555", None),
    # r13 links review #4: terminal '..' / '.' resolve like '../' / './'
    (BASE, "..", "https://Base.com/dir/"),
    (BASE, ".", "https://Base.com/dir/sub/"),
    (BASE, "../", "https://Base.com/dir/"),
    (BASE, "./", "https://Base.com/dir/sub/"),
    # r13 links review #5: query-only refs replace the base's QUERY,
    # keeping its full path (RFC 3986 section 5.3)
    (BASE, "?q=3", "https://Base.com/dir/sub/index.html?q=3"),
]


def test_resolve_hrefs_hand_written(spark):
    df = spark.createDataFrame(
        [(i, b, h) for i, (b, h, _) in enumerate(RESOLVE_CASES)],
        "id int, base string, href string",
    )
    out = {
        r.id: r.resolved_url
        for r in resolve_hrefs(df, "base", "href").collect()
    }
    for i, (b, h, want) in enumerate(RESOLVE_CASES):
        assert out[i] == want, f"case {i}: {b} + {h}: {out[i]} != {want}"


CANON_CASES = [
    ("https://X.com:443/a?utm_source=z&b=1#f", "https://x.com/a?b=1"),
    ("http://a.com:80/x", "http://a.com/x"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),  # non-default kept
    ("https://a.com:80/x", "https://a.com:80/x"),  # 80 is not https' default
    ("https://A.com", "https://a.com/"),
    ("https://a.com//x///y", "https://a.com/x/y"),
    ("https://a.com/x?c=2&a=1&b=3", "https://a.com/x?a=1&b=3&c=2"),
    ("https://a.com/x?utm_source=a&utm_medium=b", "https://a.com/x"),
    ("https://a.com/x?gclid=123&z=1", "https://a.com/x?z=1"),
    ("https://a.com/x?", "https://a.com/x"),
    ("HTTPS://a.com/x", "https://a.com/x"),
    ("no scheme here", None),
    (None, None),
]


def test_canonicalize_urls_hand_written(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)],
        "id int, u string",
    )
    out = {
        r.id: r.canonical_url
        for r in canonicalize_urls(df, "u").collect()
    }
    for i, (u, want) in enumerate(CANON_CASES):
        assert out[i] == want, f"case {i}: {u}: {out[i]} != {want}"


def test_duckdb_twins_cell_for_cell(spark):
    """All three builders vs the engine over the union of every fixture
    above (the module-owned-twin discipline)."""
    rows = [
        (i, b, h)
        for i, (b, h, _) in enumerate(RESOLVE_CASES)
    ] + [
        (100 + i, u, "x.html")
        for i, (u, _) in enumerate(CANON_CASES)
    ]
    df = spark.createDataFrame(rows, "id int, base string, href string")
    eng = resolve_hrefs(df, "base", "href", "res")
    eng = canonicalize_urls(eng, "base", "canon_base")
    eng = canonicalize_urls(eng, "res", "canon_res")
    got = {
        r.id: (r.res, r.canon_base, r.canon_res) for r in eng.collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, base VARCHAR, href VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    res_sql = duckdb_resolve_hrefs_sql("base", "href")
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"""SELECT id, {res_sql} AS res,
                  {duckdb_canonicalize_url_sql('base')} AS canon_base,
                  {duckdb_canonicalize_url_sql(f'({res_sql})')} AS canon_res
               FROM t"""
        ).fetchall()
    }
    assert got == want
    # extraction twin
    h = spark.createDataFrame([(HTML,)], "html string")
    eng_l = h.select(extract_links("html").alias("l")).collect()[0].l
    con.execute("CREATE TABLE p(html VARCHAR)")
    con.execute("INSERT INTO p VALUES (?)", (HTML,))
    orc_l = con.execute(
        f"SELECT {duckdb_extract_links_sql('html')} FROM p"
    ).fetchone()[0]
    assert eng_l == orc_l


# The three documented engine-vs-RFC-fold divergence classes (see the
# duckdb_resolve_hrefs_rfc_sql docstring): deep '../' chains, deep './'
# runs, and all-dot segments. Each row = (base, href, engine_expected,
# rfc_expected) — pinned EMPIRICALLY so a plant or fixture drifting
# into one of these classes fails THIS loud pin instead of silently
# hash-mismatching the declared query (r14 review #1).
RFC_DIVERGENCE_CASES = [
    (  # (a) ../ deeper than _DOTDOT_PASSES = 4
        "https://h.com/a/b/c/d/e/f.html",
        "../../../../../x",
        "https://h.com/a/../x",
        "https://h.com/x",
    ),
    (  # (b) ./ runs deeper than _DOT_SEG_PASSES = 2 (4+ adjacent)
        "https://h.com/",
        "https://h.com/./././././x",
        "https://h.com/./x",
        "https://h.com/x",
    ),
    (  # (c) all-dot segment: not 'collapsible' for DOTDOT_RE, popped
        # by the stack fold
        "https://h.com/",
        "https://h.com/.../../x",
        "https://h.com/.../../x",
        "https://h.com/x",
    ),
]


def test_rfc_resolver_independent_oracle_parity(spark):
    """The INDEPENDENT-algorithm resolver oracle
    (duckdb_resolve_hrefs_rfc_sql: position arithmetic + a true
    list_reduce stack fold — no shared pattern constants) agrees with
    the engine on every hand-written fixture EXCEPT the three
    documented residue classes, where the engine keeps the
    conservative bounded-pass residue and the RFC stack resolves
    fully. Each divergence is pinned HERE (engine and RFC values BOTH
    asserted) so a plant drifting past the bounds fails loudly
    instead of silently hash-mismatching."""
    from azure_etl_databricks_sql_powerbi_spark.functions.links import (
        duckdb_resolve_hrefs_rfc_sql,
    )

    rows = [(i, b, h) for i, (b, h, _) in enumerate(RESOLVE_CASES)]
    df = spark.createDataFrame(rows, "id int, base string, href string")
    eng = {
        r.id: r.res for r in resolve_hrefs(df, "base", "href", "res").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, base VARCHAR, href VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    rfc = {
        r[0]: r[3]
        for r in con.execute(
            duckdb_resolve_hrefs_rfc_sql("t", "base", "href", "res")
        ).fetchall()
    }
    deep = {
        i for i, (_, h, _w) in enumerate(RESOLVE_CASES)
        if h == "../../../../../x"
    }
    assert deep, "the bounded-depth fixture must stay in RESOLVE_CASES"
    for i, (b, h, want) in enumerate(RESOLVE_CASES):
        if i in deep:
            assert eng[i] == "https://h.com/a/../x"
            assert rfc[i] == "https://h.com/x"
        else:
            assert eng[i] == rfc[i] == want, (
                f"case {i}: {b!r} + {h!r}: engine {eng[i]!r} "
                f"rfc {rfc[i]!r} want {want!r}"
            )
    # all three documented residue classes, both sides pinned
    drows = [
        (i, b, h) for i, (b, h, _e, _r) in enumerate(RFC_DIVERGENCE_CASES)
    ]
    ddf = spark.createDataFrame(drows, "id int, base string, href string")
    deng = {
        r.id: r.res
        for r in resolve_hrefs(ddf, "base", "href", "res").collect()
    }
    con.execute("CREATE TABLE d(id INT, base VARCHAR, href VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", drows)
    drfc = {
        r[0]: r[3]
        for r in con.execute(
            duckdb_resolve_hrefs_rfc_sql("d", "base", "href", "res")
        ).fetchall()
    }
    for i, (b, h, eng_want, rfc_want) in enumerate(RFC_DIVERGENCE_CASES):
        assert deng[i] == eng_want, (i, b, h, deng[i])
        assert drfc[i] == rfc_want, (i, b, h, drfc[i])


def test_link_edges_end_to_end_and_dedup(spark):
    df = spark.createDataFrame(
        [(BASE, HTML), (BASE, HTML)],  # duplicate page -> same edges
        "url string, html string",
    )
    edges = sorted(
        (r.src, r.dst) for r in link_edges(df).collect()
    )
    src = "https://base.com/dir/sub/index.html?q=2"
    assert edges == [
        (src, "https://base.com/dir/sub/sub/d.html"),
        (src, "https://base.com/dir/up/page"),
        (src, "https://base.com/root.html"),
        (src, "https://cdn.x.com/lib.js"),
        (src, "https://x.com/a?b=1"),
    ]
    # dedup=False keeps the duplicate page's repeats
    assert link_edges(df, dedup=False).count() == 10


def test_link_edges_prefilter_equivalence(spark):
    """r16: link_edges drops NULL endpoints via cheap precondition
    filters on the RAW url/href (pushdown-safe) instead of
    ``isNotNull`` over the computed endpoints (whose pushdown
    re-inlined the whole regex chain into one mega-Filter). This pins
    the equivalence: the shipped shape must produce EXACTLY the rows of
    the old filter-at-the-end shape — reconstructed inline from the
    same building blocks — over an adversarial corpus that exercises
    every nullness branch (null/empty/scheme-less/whitespace base;
    empty, fragment-only, scheme-colon, protocol-relative, query-only,
    root-relative, relative, whitespace-wrapped, entity-escaped
    hrefs)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.links import (
        decode_href_entities,
    )

    hrefs = [
        "",                              # empty -> NULL
        "#top",                          # pure fragment -> NULL
        "https://Abs.com:443/x?utm_source=z&b=1#f",  # absolute
        " \n https://ws-abs.com/x \t ",  # WHATWG-trim absolute
        "mailto:a@b.c",                  # scheme-colon, no :// -> NULL
        "javascript:void(0)",            # -> NULL
        "data:text/plain;base64,AAA",    # -> NULL
        "tel:+1-555",                    # -> NULL
        "about:blank",                   # -> NULL
        "//cdn.x.com/lib.js",            # protocol-relative
        "?page=2",                       # query-only
        "/root.html",                    # root-relative
        "rel/./path/../x.html",          # relative w/ dot segments
        "\n  /ws.html  ",                # whitespace root-relative
        "a/../../../../deep.html",       # over-deep ../ residue
        "/out?url=https://x.com",        # contains :// but relative
        "x?a=1&amp;b=2",                 # entity-escaped query
    ]
    html = "".join(f'<a href="{h}">t</a>' for h in hrefs)
    bases = [
        None,                              # null base -> all NULL src
        "",                                # empty base
        "not-a-url/path",                  # scheme-less base
        "HTTPS://Mixed.Case.com:443/d/i.html?q=1#frag",
        "https://plain.com",               # no-path base
        " https://lead-ws.com/a/b.html",   # base with lead space (no trim!)
        "ftp://files.example.org/pub/",    # non-http scheme
    ]
    pages = spark.createDataFrame(
        [(b, html) for b in bases], "url string, html string"
    )

    def old_shape(df, dedup):
        # the pre-r16 link_edges, verbatim: canonicalize both endpoints,
        # THEN filter isNotNull over the computed columns
        src_pages = canonicalize_urls(
            df.select(
                F.col("url").alias("__lk_page"),
                F.col("html").alias("__lk_html"),
            ),
            "__lk_page",
            "src",
        )
        exploded = src_pages.select(
            "src",
            "__lk_page",
            F.explode(
                F.transform(extract_links("__lk_html"), decode_href_entities)
            ).alias("__lk_raw"),
        )
        resolved = resolve_hrefs(exploded, "__lk_page", "__lk_raw", "__lk_dst")
        both = canonicalize_urls(resolved, "__lk_dst", "dst")
        out = both.select("src", "dst").filter(
            F.col("dst").isNotNull() & F.col("src").isNotNull()
        )
        return out.distinct() if dedup else out

    for dedup in (False, True):  # multiset equality is the stronger pin
        got = sorted(
            (r.src, r.dst) for r in link_edges(pages, dedup=dedup).collect()
        )
        want = sorted(
            (r.src, r.dst) for r in old_shape(pages, dedup).collect()
        )
        assert got == want, (dedup, got[:5], want[:5])
        assert want, "adversarial fixture must keep some edges"
        assert all(s is not None and d is not None for s, d in got)
    # the whole point: no resolve/canonicalize chain re-derived inside a
    # pushed Filter. The chain itself is ~15k optimized-plan chars; the
    # old output-side isNotNull shape measured ~111k (the mega-filter
    # was ~100k of it). 30k headroom still fails loudly if even ONE
    # duplicated chain copy comes back.
    plan = link_edges(pages)._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 30_000, f"pushed mega-filter is back: {len(plan)} chars"


def test_all_jvm_and_plan_size_bound(spark):
    """Zero Python nodes in the full pipeline, and the optimized-plan
    size bound that pins the r13 expression-blowup regression: with the
    multi-reference CASE templates this plan measured 28.5M characters
    (129s to optimize, 108 MiB task binaries, driver OOM); the
    single-reference regex design keeps it around 75k."""
    df = spark.createDataFrame([(BASE, HTML)], "url string, html string")
    e = link_edges(df)
    phys = e._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in phys and "MapInPandas" not in phys
    opt = e._jdf.queryExecution().optimizedPlan().toString()
    assert len(opt) < 300_000, f"plan blew up again: {len(opt)} chars"


def test_temp_column_clash_guards(spark):
    df = spark.createDataFrame([(BASE, "x", 1)], "b string, h string, __lk_res0 int")
    with pytest.raises(ValueError, match="temp columns"):
        resolve_hrefs(df, "b", "h")
    df2 = spark.createDataFrame([(BASE, 1)], "u string, __cu_rest int")
    with pytest.raises(ValueError, match="temp columns"):
        canonicalize_urls(df2, "u")


# Dual-dialect HTML+href planting over the documents table — parsed
# VERBATIM by Spark F.expr AND DuckDB. DECLARED as of §5 swap #13: the
# plant constants live in __spark_entry__ (the _PSL_PLANT_SQL
# precedent); the tests below are the declared query's unit-scale
# proofs — branch-coverage simulation (the r13 correlated-selector
# lesson), the generated-twin replay via the three module builders,
# AND the entry oracle itself (independent RFC resolver), cell for
# cell against the entry query.
from __spark_entry__ import (  # noqa: E402
    _LINKS_PLANT_BASE_SQL as LINKS_PLANT_BASE_SQL,
    _LINKS_PLANT_HTML_SQL as LINKS_PLANT_HTML_SQL,
)


def test_links_plant_selector_coverage():
    """Simulate the plant in plain Python over the real doc_id range:
    every branch's content selector must hit ALL its values (quotient
    selectors floor(doc_id/7) % k are independent of the branch
    selector doc_id % 7; %20 is coprime to 7), so no branch
    degenerates to a single constant edge — the r13
    correlated-selector lesson, where doc_id %5-in-%5 made most
    combinations unreachable while still hashing exact."""
    # EXACTLY the sf0.001 table size — simulating doc_ids the shipped
    # plant never renders would let coverage pass on phantom rows
    # (r14 review #3)
    n = 500
    combos: dict[int, set[int]] = {b: set() for b in range(7)}
    for doc_id in range(n):
        b = doc_id % 7
        q = doc_id // 7
        # branch 0's planted href varies by doc_id ITSELF (the v=
        # query param — unbounded distinct dst, one per branch-0 doc);
        # %20 selectors below are the branches whose CONTENT uses them
        # (3 and 6). The r14 ADVICE fix: the old map modeled branch 0
        # with the page-URL's %20 selector, which is not what the
        # plant renders for that branch.
        c = {0: doc_id, 1: q % 6, 2: q % 3, 3: doc_id % 20,
             4: q % 4, 5: q % 5, 6: doc_id % 20}[b]
        combos[b].add(c)
    n_b0 = len([d for d in range(n) if d % 7 == 0])
    expect = {0: n_b0, 1: 6, 2: 3, 3: 20, 4: 4, 5: 5, 6: 20}
    for b, k in expect.items():
        assert len(combos[b]) == k, f"branch {b}: only {combos[b]}"
    # the PAGE-URL host selector (base plant: doc_id % 20, all
    # branches) must also cover all 20 hosts WITHIN every branch —
    # relative-href resolution depends on the base, so a branch stuck
    # on one host would exercise one resolution base only
    base_combos: dict[int, set[int]] = {b: set() for b in range(7)}
    for doc_id in range(n):
        base_combos[doc_id % 7].add(doc_id % 20)
    for b, hosts in base_combos.items():
        assert len(hosts) == 20, f"branch {b}: hosts {sorted(hosts)}"


def test_link_edges_plant_dual_dialect_hash_exact(spark):
    """The declared-query shape at unit scale: planted pages over the
    documents table through the FULL chain (extract → resolve →
    canonicalize × 2 → distinct), Spark vs (a) the DuckDB replay
    composed from the module's own three builders AND (b) the entry's
    actual ORACLES string (independent RFC resolver) — cell for cell,
    three-way."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pages = docs.select(
        F.expr(LINKS_PLANT_BASE_SQL).alias("url"),
        F.expr(LINKS_PLANT_HTML_SQL).alias("html"),
    )
    got = sorted(
        (r.src, r.dst) for r in link_edges(pages).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    # (b) the entry oracle — the very string the driver runs
    import __spark_entry__ as entry

    oracle = sorted(
        tuple(r)
        for r in con.execute(entry.ORACLES["link_edges_docs"]).fetchall()
    )
    assert got == oracle
    # and the entry QUERY is this same plant + chain
    eq = sorted(
        (r.src, r.dst)
        for r in entry.QUERIES["link_edges_docs"](spark, sf).collect()
    )
    assert eq == got
    # the replay mirrors link_edges' in-array entity decode: the same
    # ordered ENTITY_REPLACES chain over the extracted raw href
    from azure_etl_databricks_sql_powerbi_spark.functions.html import (
        duckdb_decode_entities_sql,
    )

    dec = duckdb_decode_entities_sql("raw")
    res_sql = duckdb_resolve_hrefs_sql("url", f"({dec})")
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH pages AS (
                SELECT {LINKS_PLANT_BASE_SQL} AS url,
                       {LINKS_PLANT_HTML_SQL} AS html
                FROM documents
            ),
            hrefs AS (
                SELECT url, unnest({duckdb_extract_links_sql('html')})
                           AS raw
                FROM pages
            ),
            res AS (
                SELECT {duckdb_canonicalize_url_sql('url')} AS src,
                       {duckdb_canonicalize_url_sql(f'({res_sql})')} AS dst
                FROM hrefs
            )
            SELECT DISTINCT src, dst FROM res
            WHERE src IS NOT NULL AND dst IS NOT NULL
            """
        ).fetchall()
    )
    assert len(got) == len(want) > 0
    assert got == want
    # the non-fetchable branch contributed no mailto/frag edges
    assert not any("mailto" in d or "#" in d for _, d in got)


def test_domain_edges_and_crawl_pagerank_composition(spark):
    """The crawl→graph bridge end to end: planted pages → link_edges →
    registered-domain rollup (intra-domain self-loops dropped, weights
    summed) → WEIGHTED pagerank from the graph tier. Pins the
    composition contract (domain_edges' output shape is pagerank's
    weighted-input shape) and the rank ordering a hub/authority plant
    implies."""
    from azure_etl_databricks_sql_powerbi_spark.functions.links import (
        domain_edges,
    )
    from azure_etl_databricks_sql_powerbi_spark.graph.pagerank import (
        pagerank,
    )

    def page(site: int, links: list[str]) -> tuple[str, str]:
        html = "".join(f'<a href="{u}">l</a>' for u in links)
        return (f"https://site{site}.com/index.html", html)

    pages = spark.createDataFrame(
        [
            # sites 1-3 all endorse hub.com; hub endorses site1 only;
            # intra-domain navigation must not count
            page(1, ["https://hub.com/a", "/nav", "about.html"]),
            page(2, ["https://hub.com/a", "https://hub.com/b"]),
            page(3, ["https://hub.com/a?utm_source=x"]),
            (
                "https://hub.com/index.html",
                '<a href="https://site1.com/x">o</a>',
            ),
        ],
        "url string, html string",
    )
    de = {(r.src, r.dst): r.n_links for r in domain_edges(pages).collect()}
    assert de == {
        ("site1.com", "hub.com"): 1,
        ("site2.com", "hub.com"): 2,  # weights sum, no URL dedup
        ("site3.com", "hub.com"): 1,
        ("hub.com", "site1.com"): 1,
    }
    ranks = {
        r.node: r.rank
        for r in pagerank(
            domain_edges(pages), weight_col="n_links", iterations=3
        ).collect()
    }
    assert set(ranks) == {"hub.com", "site1.com", "site2.com", "site3.com"}
    # the hub out-ranks everyone; its sole endorsee out-ranks the
    # endorsers it never links back to
    assert ranks["hub.com"] > ranks["site1.com"] > ranks["site2.com"]
    assert ranks["site2.com"] == ranks["site3.com"]


# ---- properties: dialect parity + frontier-key idempotence ----

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# Fragments recombining into every hazardous URL shape the resolution
# and canonicalization patterns can meet: scheme case variants, ports,
# dot-segments (terminal and nested), query/fragment splits, embedded
# absolute URLs, scheme-colon refs, empty/degenerate pieces.
_BASE_FRAGMENTS = [
    "https://", "HTTP://", "ftp://", "", "a.com", "A.com:443",
    "b.org:80", "/dir", "/sub", "/index.html", "?q=1", "#f",
    "not a url", ".", "//",
]
_HREF_FRAGMENTS = [
    "https://x.com", "HTTPS://Y.com:443", "//cdn.com", "/p", "p",
    "./", "../", "..", ".", "?x=1&utm_source=y", "?url=https://e.com",
    "#f", "mailto:", "a:b", "about:blank", "://", "&", "=", "",
    "/a//b", "/x/../y", "x.html",
]

_pairs = st.lists(
    st.tuples(
        st.lists(st.sampled_from(_BASE_FRAGMENTS), max_size=5).map("".join),
        st.lists(st.sampled_from(_HREF_FRAGMENTS), max_size=5).map("".join),
    ),
    min_size=1,
    max_size=25,
)


@given(pairs=_pairs)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_links_dialect_parity_property(spark, pairs):
    """For any recombination of hazardous URL fragments, Spark's
    resolve + canonicalize equal the DuckDB builders cell-for-cell —
    hunting Java-regex-vs-RE2 and branch-order divergences the hand
    fixtures can't enumerate. One Spark job + one DuckDB query per
    example (the batched-rows cost discipline)."""
    rows = [(i, b, h) for i, (b, h) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "id long, base string, href string")
    eng = canonicalize_urls(
        resolve_hrefs(df, "base", "href", "res"), "res", "canon"
    )
    got = {r.id: (r.res, r.canon) for r in eng.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, base VARCHAR, href VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    res_sql = duckdb_resolve_hrefs_sql("base", "href")
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT id, {res_sql},"
            f" {duckdb_canonicalize_url_sql(f'({res_sql})')} FROM t"
        ).fetchall()
    }
    for i, b, h in rows:
        assert got[i] == want[i], (repr(b), repr(h), got[i], want[i])


@given(pairs=_pairs)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_canonicalize_idempotence_property(spark, pairs):
    """canonicalize(canonicalize(u)) == canonicalize(u) for any
    resolvable input — THE frontier-key property: a canonical URL seen
    again (e.g. re-extracted from a crawl of itself) must map to the
    same key, or frontier dedup leaks refetches."""
    rows = [(i, b, h) for i, (b, h) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "id long, base string, href string")
    once = canonicalize_urls(
        resolve_hrefs(df, "base", "href", "res"), "res", "c1"
    )
    twice = canonicalize_urls(once, "c1", "c2")
    for r in twice.collect():
        assert r.c2 == r.c1, (r.id, repr(r.c1), repr(r.c2))


def test_warc_link_edges_end_to_end(spark, tmp_path):
    """The WAT pass: a member-per-record gzip WARC shard with linked
    HTML pages → warc_link_edges → (src, dst) canonical pairs, both
    connectors row-identical; domain_level returns the weighted rollup.
    Links extract from the RAW markup (a relative href, an absolute
    one with tracking params, a mailto that must vanish); the
    text/plain response and the request record contribute nothing."""
    import gzip

    from azure_etl_databricks_sql_powerbi_spark.functions.links import (
        warc_link_edges,
    )

    def record(uri: str, rec_id: str, body: bytes, ctype: bytes) -> bytes:
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n\r\n"
            + body
        )
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "Content-Type: application/http;msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        return head + payload + b"\r\n\r\n"

    shard = tmp_path / "crawl-0.warc.gz"
    with open(shard, "wb") as fh:
        fh.write(gzip.compress(record(
            "https://Site1.com/dir/index.html", "r-1",
            b'<a href="next.html">n</a>'
            b'<a href="https://Hub.com:443/x?utm_source=s&amp;k=1">h</a>'
            b'<a href="mailto:a@b.c">m</a>',
            b"text/html",
        )))
        fh.write(gzip.compress(record(
            "https://site2.com/p", "r-2",
            b'<a href="//hub.com/y">p</a>', b"text/html; charset=utf-8",
        )))
        fh.write(gzip.compress(record(
            "https://site3.com/t", "r-3",
            b'<a href="https://nowhere.com/z">z</a>', b"text/plain",
        )))

    want = [
        ("https://site1.com/dir/index.html", "https://hub.com/x?k=1"),
        ("https://site1.com/dir/index.html",
         "https://site1.com/dir/next.html"),
        ("https://site2.com/p", "https://hub.com/y"),
    ]
    for connector in ("paths", "binary"):
        got = sorted(
            (r.src, r.dst)
            for r in warc_link_edges(
                spark, str(tmp_path), connector=connector
            ).collect()
        )
        assert got == want, connector

    dom = {
        (r.src, r.dst): r.n_links
        for r in warc_link_edges(
            spark, str(tmp_path), domain_level=True
        ).collect()
    }
    # site1's self-link drops (intra-domain), both hub links survive
    assert dom == {
        ("site1.com", "hub.com"): 1,
        ("site2.com", "hub.com"): 1,
    }
