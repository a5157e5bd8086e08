"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001. ``queries()``
exposes one named callable per implemented operator from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for each (omitted only
for genuinely non-SQL-expressible ops, which get rows-only checks).

Column names are aliased identically on both sides; double aggregates are
rounded on both sides so the order-insensitive value hash is stable to
float summation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.operators.dedup import latest_per_key
from azure_etl_databricks_sql_powerbi_spark.operators.incremental import relative_watermark
from azure_etl_databricks_sql_powerbi_spark.operators.upsert import merge_upsert
from azure_etl_databricks_sql_powerbi_spark.plans import gold, medallion
from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table
from azure_etl_databricks_sql_powerbi_spark.util import (
    disc_price,
    exact_avg,
    money_sum,
    spread,
)

SF0001 = "/root/testdata/sf0.001"

QueryFn = Callable[[SparkSession, str], DataFrame]


def _scratch_dir(prefix: str) -> str:
    """mkdtemp registered for atexit removal. Queries that re-land data
    (streaming drains, persisted dedup state) get a unique dir per
    invocation; bench runs each query 3x and the driver re-runs rounds,
    so un-reaped tempdirs would accumulate (ADVICE r5). atexit (not
    inline rmtree) because the returned DataFrame is lazy — the files
    must survive until the driver collects it."""
    import atexit
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    return tmp


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return gold.pricing_summary(load_table(spark, SF0001, "lineitem"))


# ---------------------------------------------------------------- queries


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.pricing_summary(load_table(spark, sf_dir, "lineitem"))


def _q_dim_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver = medallion.clean_customers(load_table(spark, sf_dir, "customer"))
    return medallion.dim_customers(silver)


def _q_fact_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver = medallion.clean_payments(load_table(spark, sf_dir, "events"))
    return medallion.fact_payments(silver)


def _q_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.star_revenue_by_region(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def _q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed MERGE upsert (J1): target = history, source = updated overlap
    batch (prices bumped 10%) — reproduces run_load.py:82-90 semantics."""
    orders = load_table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    # +1000.0 (exact in binary) rather than a rounded product: Spark's
    # BigDecimal HALF_UP and DuckDB's multiply-then-nearbyint disagree on
    # half-cent boundaries, which is arithmetic noise, not MERGE semantics.
    source = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
    ).withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
    return merge_upsert(target, source, keys=["o_orderkey"])


def _q_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return latest_per_key(
        orders, keys=["o_custkey"], order_by=["o_orderdate"], tiebreak=["o_orderkey"]
    )


def _q_top_customers_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.top_customers_by_segment(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


def _q_compression_band_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio band filter (functions/compress): survivors of
    the [0.20, 0.75] two-sided junk band — drops templated/repetitive
    spam (over-compressible) AND base64/garbled tails (incompressible)
    in one Arrow-batched stdlib-zlib pass, the documented built-ins-first
    exception. Rows-only BY NECESSITY: no SQL oracle can exist (DuckDB
    has no zlib scalar); the exact len(compress)/len(raw) arithmetic,
    the repetitive << prose < random ordering anchors, determinism, and
    the single-UDF-evaluation plan are pinned by tests/test_compress.py.
    Declared r12 via ROTATION_POLICY.md §5 swap #5 (retired sales_rollup,
    whose ROLLUP grouping sets are a strict subset of the still-declared
    sales_cube power set; its twin lives on in tests/test_gold_twins.py)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.compress import (
        compression_band_filter,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    return compression_band_filter(docs, lo=0.20, hi=0.75).select(
        "doc_id", "source"
    )


def _q_customer_order_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composable window suite (W2; ROTATION_POLICY.md §4.3 merge, §5
    swap #6): ONE shared window sort (PARTITION BY o_custkey ORDER BY
    o_orderdate, o_orderkey) carries the exact DECIMAL running revenue
    AND the prev/next order dates + consecutive-order day gap that the
    retired customer_running_total / customer_order_gaps queries spent
    two driver rows on — same partitioning and ordering, so Catalyst
    plans a single Exchange+Sort feeding stacked Window nodes
    (plan-pinned in tests/test_plan_shapes.py). The retired queries'
    standalone SQL twins live on in tests/test_gold_twins.py."""
    from azure_etl_databricks_sql_powerbi_spark.operators.windows import lag_lead

    orders = load_table(spark, sf_dir, "orders")
    run = gold.customer_order_running_total(orders)
    out = lag_lead(
        run,
        partition_by=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        col="o_orderdate",
        lag_col="prev_orderdate",
        lead_col="next_orderdate",
    )
    return out.withColumn("gap_days", F.datediff("o_orderdate", "prev_orderdate"))


def _q_events_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental overlap window (ST1): events within 7 days of max(ts)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    return relative_watermark(events, "ts", days=7)


def _q_events_json_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (F7) + grouped agg: parse props.k, KPI per event_type."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
            exact_avg("k", cents=False).alias("avg_k"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


def _q_union_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift-tolerant UNION (U1): two bronze snapshots with different
    column subsets combined via unionByName(allowMissingColumns)."""
    customer = load_table(spark, sf_dir, "customer")
    old = customer.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    new = customer.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return old.unionByName(new, allowMissingColumns=True)


def _q_qbo_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested QBO-shaped payload normalization (F9/S4): build
    {QueryResponse: {Invoice: [...]}} docs from orders (one per customer),
    then explode + flatten back to relational rows. The round-trip must
    reproduce the original projection — which is exactly the oracle."""
    from azure_etl_databricks_sql_powerbi_spark.operators.nested import (
        explode_path,
        flatten_struct,
    )

    orders = load_table(spark, sf_dir, "orders")
    nested = (
        orders.groupBy("o_custkey")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("o_orderkey").cast("string").alias("Id"),
                    F.col("o_totalprice").alias("TotalAmt"),
                    F.col("o_orderstatus").alias("Status"),
                )
            ).alias("Invoice")
        )
        .select(F.struct(F.col("Invoice")).alias("QueryResponse"))
    )
    return flatten_struct(explode_path(nested, "QueryResponse.Invoice"), "item")


def _q_qc_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QC check metrics (A2/A3 + uniqueness) as ONE aggregate pass.
    n_custkeys is the ROTATION_POLICY §4.2 fold of the retired
    approx_distinct_orders query (r12 swap #4): the distinct-cardinality
    QC signal rides this aggregate exactly (count_distinct), while the
    approximate HLL surface keeps its driver evidence on
    incremental_distinct_day2 and its ±5% bound unit test."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum(F.col("o_custkey").isNull().cast("int")).cast("double")
            / F.count(F.lit(1))
        ).alias("custkey_null_rate"),
        F.count_distinct("o_orderkey").alias("n_keys"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("dup_keys"),
        F.count_distinct("o_custkey").alias("n_custkeys"),
    )


# URL construction for _q_url_provenance_docs, written once in the SQL
# dialect both engines parse identically (CASE/%/CAST/|| only) and used
# verbatim on BOTH sides — Spark via F.expr, DuckDB inlined in the
# oracle — so the planting can never desync. Branches exercise every
# urls.py path: unparseable text, multi-part suffixes (co.uk/com.au),
# deep subdomains, IPv4 + port, trailing root dot + mixed case,
# userinfo, bracketed IPv6, and plain two-label hosts.
_URL_PLANT_SQL = """CASE doc_id % 10
  WHEN 0 THEN 'plain text ref ' || CAST(doc_id AS STRING)
  WHEN 1 THEN 'https://WWW.News' || CAST(doc_id % 7 AS STRING)
       || '.co.uk/s/' || CAST(doc_id AS STRING)
  WHEN 2 THEN 'https://cdn' || CAST(doc_id % 5 AS STRING)
       || '.assets.site' || CAST(doc_id % 3 AS STRING) || '.com/a.png'
  WHEN 3 THEN 'http://10.' || CAST(doc_id % 4 AS STRING) || '.0.'
       || CAST(doc_id % 256 AS STRING) || ':8080/x'
  WHEN 4 THEN 'https://BadSite' || CAST(doc_id % 3 AS STRING) || '.COM./p'
  WHEN 5 THEN 'https://blog.shop' || CAST(doc_id % 4 AS STRING)
       || '.com.au/item'
  WHEN 6 THEN 'ftp://mirror.kernel.org/pub/' || CAST(doc_id AS STRING)
  WHEN 7 THEN 'https://user:pw@portal.example' || CAST(doc_id % 2 AS STRING)
       || '.org:444/q?x=1'
  WHEN 8 THEN 'https://[2001:db8::' || CAST(doc_id % 9 + 1 AS STRING)
       || ']/v6'
  ELSE 'https://site' || CAST(doc_id % 25 AS STRING) || '.net/page#f'
END"""

# badsite0/1 (but not 2) prove the anti-join blocks selectively;
# kernel.org wipes a whole branch; news3.co.uk blocks one multi-part
# registered domain while its co.uk siblings survive.
_URL_BLOCKLIST = ("badsite0.com", "badsite1.com", "kernel.org", "news3.co.uk")

# PSL snapshot for _q_registered_domain_psl_docs (ROTATION_POLICY.md §5
# swap #10) — a deliberately overlapping slice of the real Public
# Suffix List: k12.ma.us / ma.us / us all present so the k=3 match must
# WIN over its own shorter suffixes (longest-match proof), plus a
# 4-label entry at the max_suffix_labels edge and bare TLDs for the
# host-equals-suffix proper-suffix rule.
_PSL_SNAPSHOT = (
    "co.uk",
    "uk",
    "k12.ma.us",
    "ma.us",
    "us",
    "gov.bd",
    "bd",
    "cdn.prod.atlassian-dev.net",
    "net",
    "com",
    "com.au",
    "amazonaws.com",
)

# URL planting for the PSL query, the _URL_PLANT_SQL discipline (one
# dual-dialect string, CAST(... AS STRING) concat, no backslashes or
# apostrophes). Branches: multi-sub + UPPERCASE host under co.uk,
# longest-match under k12.ma.us, the 4-label suffix edge, unlisted-TLD
# fallback, IPv4 + single-label pass-through, non-URL NULL, gov.bd,
# and host == suffix-with-one-extra-label (proper-suffix rule).
_PSL_PLANT_SQL = """CASE doc_id % 9
  WHEN 0 THEN 'https://A' || CAST(doc_id % 7 AS STRING)
       || '.Shop.Example.CO.UK/p'
  WHEN 1 THEN 'http://www' || CAST(doc_id % 3 AS STRING)
       || '.district' || CAST(doc_id % 5 AS STRING) || '.k12.ma.us/pg'
  WHEN 2 THEN 'https://site' || CAST(doc_id % 4 AS STRING)
       || '.cdn.prod.atlassian-dev.net/a'
  WHEN 3 THEN 'http://deep.sub.host' || CAST(doc_id % 3 AS STRING)
       || '.zz/x'
  WHEN 4 THEN 'http://192.168.' || CAST(doc_id % 200 AS STRING)
       || '.1/x'
  WHEN 5 THEN 'http://localhost:8080/admin'
  WHEN 6 THEN 'no url here ' || CAST(doc_id AS STRING)
  WHEN 7 THEN 'https://portal.ministry' || CAST(doc_id % 2 AS STRING)
       || '.gov.bd/x'
  ELSE 'http://co.uk/x'
END"""


def _q_registered_domain_psl_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain extraction against a FULL public-suffix table
    (functions/urls.registered_domain_psl; ROTATION_POLICY.md §5 swap
    #10) — the scale path behind url_provenance_docs' embedded-subset
    heuristic: longest proper-suffix match via max_suffix_labels
    BROADCAST hash joins against the (lowercased, deduped) snapshot,
    ZERO shuffles before the final count. Planting exercises
    longest-match precedence (k12.ma.us beats ma.us beats us), the
    4-label edge, unlisted-TLD fallback, IPv4/single-label/NULL
    pass-throughs, and the proper-suffix rule (host co.uk under a
    listed uk). Hash-exact vs an oracle built from the module's own
    duckdb_registered_domain_psl_sql (an INDEPENDENT SQL replay of the
    documented semantics — CASE over string_split slices, no joins);
    hand-written per-branch domain expectations live in
    tests/test_urls.py (the generated-twin mitigation norm)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.urls import (
        registered_domain_psl,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PSL_PLANT_SQL).alias("url")
    )
    sfx = spark.createDataFrame(
        [(s,) for s in _PSL_SNAPSHOT], "suffix string"
    )
    dom = registered_domain_psl(docs, "url", sfx)
    return (
        dom.groupBy("domain")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc_nulls_last("domain"))
    )

# Mojibake planting for _q_normalize_text_docs, written once in the SQL
# dialect intersection (the _URL_PLANT_SQL discipline) and parsed
# VERBATIM by F.expr and DuckDB. Non-ASCII code points are embedded RAW
# (both parsers read literals as UTF-8 — verified code-point-identical);
# chr(n) appears only for n <= 255, where Spark's mod-256 chr and
# DuckDB's code-point chr agree. Each branch exercises one
# functions/normalize.CLEAN_STEPS pattern or the NFC step.
_NORM_PLANT_SQL = (
    "CASE doc_id % 9\n"
    # decomposed e + U+0301: the NFC composition target
    "  WHEN 0 THEN text || ' caf" + "e\u0301" + " mojibake'\n"
    # BOM prefix + ZWSP splitting a word
    "  WHEN 1 THEN '" + "\ufeff" + "' || text || ' zero" + "\u200b"
    + "width'\n"
    # CRLF, lone CR, and U+2028 LINE SEPARATOR -> LF
    "  WHEN 2 THEN text || chr(13) || chr(10) || 'crlf' || chr(13)"
    " || 'cr" + "\u2028" + "ls'\n"
    # C0 (BEL), DEL, C1 (NEL) control junk
    "  WHEN 3 THEN 'bel' || chr(7) || 'del' || chr(127) || 'nel'"
    " || chr(133) || ' ' || text\n"
    # Zs separators (NBSP+em-space run, ideographic space) + a plain
    # double-space run
    "  WHEN 4 THEN 'x" + "\u00a0\u2003" + "y" + "\u3000"
    + " z  w ' || text\n"
    # trailing spaces + a 4-newline blank run + trailing junk
    "  WHEN 5 THEN text || '   ' || chr(10) || chr(10) || chr(10)"
    " || chr(10) || 'tail  '\n"
    # soft hyphen and ZWJ inside words
    "  WHEN 6 THEN 'co" + "\u00ad" + "operate zero" + "\u200d"
    + "join ' || text\n"
    # line-start indentation survives; the interior run collapses
    "  WHEN 7 THEN 'head:' || chr(10) || '    indented   run'"
    " || chr(10) || text\n"
    "  ELSE text\n"
    "END"
)

# HTML planting for _q_html_extract_docs (ROTATION_POLICY.md §5 swap
# #8), written once in the SQL dialect intersection and parsed VERBATIM
# by F.expr and DuckDB. No backslashes (Spark SQL treats them as
# escapes, DuckDB does not) and no literal apostrophes (quote-doubling
# differs); &#39; carries the apostrophe case instead. Each branch
# arms one functions/html.STRIP_STEPS pass or ENTITY_REPLACES ordering
# rule; hand-written expected outputs for the same shapes live in
# tests/test_html.py FIXTURES.
_HTML_PLANT_SQL = (
    "CASE doc_id % 12\n"
    # the dominant named entities, &nbsp; -> real NBSP
    "  WHEN 0 THEN text || ' &lt;i&gt; &quot;q&quot; &#39;s&#39;"
    " &apos;a&apos; nb&nbsp;sp &amp; done'\n"
    # double-escapes: &amp;lt; is the TEXT &lt;, never '<'
    "  WHEN 1 THEN '&amp;lt;b&amp;gt; &amp;amp; ' || text\n"
    # live script with attributes; markup smuggled inside its body
    '  WHEN 2 THEN \'pre<script type="text/javascript">var s ='
    ' "<b>x</b>";</script>post \' || text\n'
    # commented-out script opener must NOT arm the script pass; the
    # unclosed trailing comment strips to end-of-text (\\z fallback)
    "  WHEN 3 THEN 'keep<!-- <script src=x.js> -->mid ' || text"
    " || '<!--unclosed tail'\n"
    # style payload and a CDATA block both vanish whole
    "  WHEN 4 THEN 's1<style>.c{color:red}</style>s2"
    "<![CDATA[var j=1;]]>s3 ' || text\n"
    # DOCTYPE + processing instruction + head/title wrapper
    '  WHEN 5 THEN \'<!DOCTYPE html><?xml version="1.0"'
    ' encoding="utf-8"?><html><head><title>T</title></head><body>\''
    " || text || '</body></html>'\n"
    # block-level tags become newlines (paragraph structure survives)
    "  WHEN 6 THEN '<h1>Head</h1><p>p1</p><p>p2</p><ul><li>a</li>"
    "<li>b</li></ul><br/>' || text\n"
    # inline tags with attributes (the &amp; inside href dies WITH the
    # tag, never reaches entity decode)
    '  WHEN 7 THEN \'<a href="https://x.example/?a=1&amp;b=2"'
    ' title="t">link</a> <span class="s">sp</span> <B CLASS="x">bold'
    "</B> <img src=\"i.png\"/> ' || text\n"
    # unclosed script strips to end-of-text, conservatively
    "  WHEN 8 THEN text || ' tail<script>var x = 1;'\n"
    # IE downlevel-revealed conditionals: markers strip, body stays
    "  WHEN 9 THEN 'a<![if !IE]>revealed<![endif]>b ' || text\n"
    # stray angle brackets in prose survive (letter-after-< rule)
    "  WHEN 10 THEN 'a < b, x<5, 3>2, y >= z ' || text\n"
    "  ELSE text\n"
    "END"
)


def _q_html_extract_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction (functions/html; ROTATION_POLICY.md §5
    swap #8): deterministic markup planting — entities + double-escapes,
    live/commented/unclosed scripts, style, CDATA, DOCTYPE/PI, IE
    conditionals, block-vs-inline tags, stray angle brackets — via ONE
    dual-dialect _HTML_PLANT_SQL string, then the pure-JVM strip_html
    chain (8 regex + 7 literal replaces, one whole-stage-codegen
    projection, zero Python). Hash-exact INCLUDING the extracted text
    itself (the pii/normalize precedent) vs the oracle generated from
    the module's own duckdb_strip_html_sql builder — Java regex vs RE2
    cell-for-cell on every pass; hand-written fixture expectations live
    in tests/test_html.py (the generated-twin mitigation norm). The
    composed crawl chain read_warc → html_to_text → canonicalize gets
    separate driver evidence via warc_html_corpus."""
    from azure_etl_databricks_sql_powerbi_spark.functions.html import strip_html

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_HTML_PLANT_SQL).alias("html")
    )
    stripped = docs.select(
        "doc_id", "html", strip_html("html").alias("text")
    )
    return stripped.select(
        "doc_id",
        "text",
        (F.length("html") - F.length("text"))
        .cast("bigint")
        .alias("strip_len_delta"),
    )


# Dual-dialect page planting for the WAT-pass query (parsed VERBATIM by
# Spark F.expr AND DuckDB; no backslashes, no apostrophes — double-quoted
# hrefs only, chr(10) for the literal newline). The BRANCH selector is
# doc_id % 7; every branch's CONTENT varies by a coprime modulus
# (doc_id % 20, % 5, doc_id itself) or a QUOTIENT selector
# (floor(doc_id / 7) % k — independent of doc_id % 7), so every
# (branch, content) combination occurs and no branch degenerates to a
# single constant edge (the r13 correlated-selector lesson,
# tests/test_links.py simulates the coverage). Branches arm: [0]
# absolute + default port + utm strip + the REQUIRED &amp; attribute
# escape (entity decode), [1] root-relative + a fragment-only ref that
# must contribute NO edge, [2] ../ relative collapse, [3]
# protocol-relative scheme adoption (uppercase tag/attr), [4]
# non-fetchable mailto + bare relative, [5] WHATWG whitespace trim
# (newline + spaces inside the attribute — r14 ADVICE #1), [6]
# path-leading ../ residue collapse in an absolute href (r14 ADVICE #2).
# The page number repeats with period 420 = lcm of every selector
# (20, 5, 7 direct; 6/3/4/5 via floor(doc_id/7): 420/7 = 60 ≡ 0 mod
# all four), so docs d and d+420 render IDENTICAL pages on branches
# 1-6 — the final DISTINCT provably removes real duplicate edges —
# while branch 0's dst varies by doc_id itself, so the edge count
# still grows with the table (both properties simulated in
# tests/test_links.py).
_LINKS_PLANT_BASE_SQL = (
    "'https://site' || CAST(doc_id % 20 AS STRING) || '.com/d'"
    " || CAST(doc_id % 5 AS STRING) || '/sub/page'"
    " || CAST(doc_id % 420 AS STRING) || '.html'"
)
_LINKS_PLANT_HTML_SQL = """CASE doc_id % 7
  WHEN 0 THEN '<p><a href="https://Hub.com:443/t?utm_source=x&amp;v='
       || CAST(doc_id AS STRING) || '">h</a></p>'
  WHEN 1 THEN '<a href="/idx'
       || CAST(CAST(floor(doc_id / 7) AS INT) % 6 AS STRING)
       || '.html">r</a><a href="#frag">n</a>'
  WHEN 2 THEN '<a href="../up'
       || CAST(CAST(floor(doc_id / 7) AS INT) % 3 AS STRING)
       || '/p.html">u</a>'
  WHEN 3 THEN '<A HREF="//cdn.site' || CAST(doc_id % 20 AS STRING)
       || '.com/lib.js">c</A>'
  WHEN 4 THEN '<a href="mailto:x@y.z">m</a><a href="rel'
       || CAST(CAST(floor(doc_id / 7) AS INT) % 4 AS STRING)
       || '.html">q</a>'
  WHEN 5 THEN '<a href="' || chr(10) || '  /ws'
       || CAST(CAST(floor(doc_id / 7) AS INT) % 5 AS STRING)
       || '.html  ">w</a>'
  ELSE '<a href="https://lead' || CAST(doc_id % 20 AS STRING)
       || '.com/../x.html">l</a>'
END"""


def _q_link_edges_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WAT pass as driver evidence (functions/links;
    ROTATION_POLICY.md §5 swap #13): deterministic page planting over
    the documents table (_LINKS_PLANT_BASE_SQL/_LINKS_PLANT_HTML_SQL,
    the pii planting discipline) through the FULL crawl→graph chain —
    extract_links → entity decode inside a transform lambda →
    resolve_hrefs → canonicalize BOTH endpoints → distinct (src, dst).
    Hash-exact INCLUDING the canonical URL text. The oracle's
    RESOLUTION step is an INDEPENDENT SQL algorithm
    (links.duckdb_resolve_hrefs_rfc_sql: position arithmetic + a true
    list_reduce stack fold — the registered_domain_psl precedent,
    VERDICT r13 "What's wrong" #4), composed with the module-owned
    extract/canonicalize builders; hand-written RFC-3986 expectations
    live in tests/test_links.py. Plan contract: single-reference regex
    derivations only, zero Python nodes, optimized plan < 300k chars
    (tests/test_links.py pins all three — the r13 expression-blowup
    regression)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.links import (
        link_edges,
    )

    # spread: the single-file parquet scan is ONE input split, and the
    # ~60-regex-per-row extract/resolve/canonicalize pipeline would run
    # on one core (the round-6 fuzzy lesson; measured 5.4s -> sub-1s on
    # local[32] at sf0.1)
    docs = spread(load_table(spark, sf_dir, "documents"))
    pages = docs.select(
        F.expr(_LINKS_PLANT_BASE_SQL).alias("url"),
        F.expr(_LINKS_PLANT_HTML_SQL).alias("html"),
    )
    return link_edges(pages)


def _q_url_provenance_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-crawl provenance card (functions/urls): deterministic planted
    URLs (shared _URL_PLANT_SQL, the pii planting discipline) → host +
    registered-domain extraction (regex-only, Java ≡ RE2) → DataFrame
    blocklist anti-join (keep_unparseable=True so the NULL-domain
    coverage row stays visible) → per-domain concentration with the
    EXACT IEEE share quotient (round_to=None — n/total double division
    is bit-identical across engines; ROUND of it is not). Hash-exact vs
    the oracle generated from the module's own duckdb_host_sql /
    duckdb_registered_domain_sql builders; hand-written planted-URL
    expectations live in tests/test_urls.py (the generated-twin
    mitigation norm). Declared r12 via ROTATION_POLICY.md §5 swap #4
    (retired approx_distinct_orders, a §4.2 foldable scalar — its exact
    distinct-custkey fold now rides qc_metrics_orders; HLL evidence
    remains on incremental_distinct_day2 + tests/test_incremental_dedup)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.urls import (
        domain_stats,
        filter_blocklisted_domains,
    )

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select("doc_id", F.expr(_URL_PLANT_SQL).alias("url"))
    blocked = spark.createDataFrame(
        [(d,) for d in _URL_BLOCKLIST], "domain string"
    )
    # extract ONCE: the anti-join keeps its computed domain column and
    # the stats consume it, instead of re-running the regex chain per
    # row (r12 review)
    kept = filter_blocklisted_domains(
        planted, "url", blocked, keep_unparseable=True,
        keep_domain_col="__prov_dom",
    )
    return domain_stats(kept, "url", round_to=None, domain_col="__prov_dom")


# ------------------------------------------------------ EXT: text analysis


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-quality metrics (F10): token counts, punctuation, stopword
    ratio, composite quality score — all JVM-side expressions."""
    from azure_etl_databricks_sql_powerbi_spark.functions import text as T

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        T.char_count("text").alias("n_chars"),
        T.token_count("text").alias("n_tokens"),
        T.avg_token_len("text").alias("avg_token_len"),
        T.punct_ratio("text").alias("punct_ratio"),
        T.stopword_ratio("text", T.LANG_PROFILES["en"]).alias("stop_ratio_en"),
        T.quality_score("text").alias("quality"),
    )


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID heuristic per doc + agreement flag."""
    from azure_etl_databricks_sql_powerbi_spark.functions import text as T

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        T.lang_id("text").alias("predicted_lang"),
    )


def _q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (rolling-hash family): md5 of normalized text
    (oracle-replicable; xxhash64 variant is the scale path, tested in unit
    tests since DuckDB lacks xxhash64)."""
    from azure_etl_databricks_sql_powerbi_spark.functions import text as T

    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", T.fingerprint_md5("text").alias("fp_md5"))


def _q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup via hash-groupBy (md5 flavor for the oracle)."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.exact import dedup_exact_stats

    docs = load_table(spark, sf_dir, "documents")
    return dedup_exact_stats(docs, use_md5=True)


def _q_token_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (word-set) Jaccard near-dup pairs on a bounded slice —
    the oracle-checked ground truth the MinHash path approximates."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = docs.select(
        "doc_id",
        F.array_distinct(F.split(F.trim("text"), r"\s+")).alias("ws"),
    )
    a = toks.select(F.col("doc_id").alias("id_a"), F.col("ws").alias("ws_a"))
    b = toks.select(F.col("doc_id").alias("id_b"), F.col("ws").alias("ws_b"))
    inter = F.size(F.array_intersect("ws_a", "ws_b"))
    union = F.size(F.array_union("ws_a", "ws_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= 0.9)
        .select("id_a", "id_b", "jaccard")
    )


# WARC shard fixture for _q_warc_html_corpus: deterministic archives
# generated ONCE per sf_dir from the documents table (the streaming
# queries' tempdir-fixture discipline, cached like _MINHASH_INDEX_CACHE
# because bench runs each query 3x). doc_id % 5 routes each document:
# 0 -> text/plain response (survives http_only, dies at the HTML
# content-type filter), 1 -> request record (pruned by http_only),
# 2/3/4 -> HTML response. Expected output rows = |{docs: id%5 >= 2}|,
# pinned by tests/test_warc.py::test_warc_fixture_row_arithmetic.
# The writer ALSO emits index.cdxj beside the shards (offsets recorded
# while writing, one line per RECORD incl. the request/plain branches
# select_captures must prune) — the staged warc_cdx_ranged_corpus
# chain reads the corpus index-first and must return exactly the
# full-scan rows (tests/test_cdx.py).
_WARC_SHARD_CACHE: dict[str, str] = {}
_WARC_N_SHARDS = 4


def _warc_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir in _WARC_SHARD_CACHE:
        return _WARC_SHARD_CACHE[sf_dir]
    import gzip
    import json as _json
    import os

    out_dir = _scratch_dir("spark_graft_warc_")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
    )
    from contextlib import ExitStack

    offsets = [0] * _WARC_N_SHARDS
    # ONE ExitStack owns all five handles: if any open raises, the
    # already-open ones still close (the r14 ADVICE leak note — the
    # old shards-then-index open order leaked the shard handles when
    # the index open failed)
    with ExitStack() as stack:
        shards = [
            stack.enter_context(
                open(os.path.join(out_dir, f"shard-{i}.warc.gz"), "wb")
            )
            for i in range(_WARC_N_SHARDS)
        ]
        # index lines stream straight to disk — buffering the whole
        # index in a list would contradict the loop's own
        # bounded-memory discipline below (r14 review)
        index_fh = stack.enter_context(
            open(os.path.join(out_dir, "index.cdxj"), "w")
        )
        # toLocalIterator bounds driver memory at one partition
        for row in docs.toLocalIterator():
            doc_id, text = row["doc_id"], row["text"] or ""
            kind = doc_id % 5
            if kind == 1:
                warc_type = "request"
                ctype = "application/warc-fields"
                payload = f"GET /doc/{doc_id} HTTP/1.1\r\n".encode()
            else:
                warc_type = "response"
                ctype = "application/http;msgtype=response"
                if kind == 0:
                    http_ctype, body = "text/plain", text
                else:
                    http_ctype, body = (
                        "text/html; charset=utf-8",
                        f"<html><head><title>doc {doc_id}</title>"
                        f"<script>var d={doc_id};</script></head>"
                        f"<body><h1>Doc {doc_id}</h1><p>{text}</p>"
                        f"</body></html>",
                    )
                body_b = body.encode("utf-8")
                payload = (
                    f"HTTP/1.1 200 OK\r\nContent-Type: {http_ctype}"
                    f"\r\n\r\n".encode() + body_b
                )
            head = (
                f"WARC/1.0\r\n"
                f"WARC-Type: {warc_type}\r\n"
                f"WARC-Record-ID: <urn:doc:{doc_id}>\r\n"
                f"WARC-Target-URI: http://corpus.example/doc/{doc_id}\r\n"
                f"Content-Type: {ctype}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode()
            member = gzip.compress(head + payload + b"\r\n\r\n")
            si = doc_id % _WARC_N_SHARDS
            meta = {
                "url": f"http://corpus.example/doc/{doc_id}",
                "digest": f"sha1:DOC{doc_id}",
                "length": str(len(member)),
                "offset": str(offsets[si]),
                "filename": f"shard-{si}.warc.gz",
            }
            # request records carry no HTTP status/mime — their NULL
            # status fails select_captures' filter, exactly like a
            # real index's non-response lines
            if kind != 1:
                meta["status"] = "200"
                meta["mime"] = http_ctype
            index_fh.write(
                f"example,corpus)/doc/{doc_id} "
                f"2024010100{doc_id % 60:02d}00 {_json.dumps(meta)}\n"
            )
            shards[si].write(member)
            offsets[si] += len(member)
    _WARC_SHARD_CACHE[sf_dir] = out_dir
    return out_dir


def _q_warc_html_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl-style ingestion end to end (sources/warc +
    functions/html + functions/normalize; ROTATION_POLICY.md §5 swap
    #9): deterministic member-per-record gzip WARC shards generated
    from the documents table (_warc_fixture_dir), then the composed
    chain read_warc_paths → http_only prune → HTML content-type filter
    → html_to_text (JVM strip + NFC batch). Uses the PATH-STREAMING
    connector (r12 VERDICT "What's missing" #3 — per-task memory ~one
    record regardless of shard size; rows ≡ the binaryFile connector,
    unit-pinned). Rows-only by necessity — DuckDB cannot parse WARC;
    semantics are pinned by hand-built exact-Content-Length archives
    across all three gzip layouts, chunk-boundary stress, corruption/
    resync/folding/cap units, and the fixture row arithmetic
    (tests/test_warc.py)."""
    from azure_etl_databricks_sql_powerbi_spark.sources.warc import (
        warc_html_corpus,
    )

    shard_dir = _warc_fixture_dir(spark, sf_dir)
    # explicit suffix glob: the fixture dir also holds index.cdxj (the
    # staged index-first chain's input) — the WARC scan must list
    # shards only, the P5 suffix-predicate discipline
    return warc_html_corpus(
        spark, shard_dir + "/*.warc.gz", connector="paths"
    )


def _q_warc_cdx_ranged_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INDEX-FIRST crawl ingestion chain as driver evidence
    (ROTATION_POLICY.md §5 swap #15; VERDICT r13 "What's missing" #3 /
    r14 #1 executed): over the SAME fixture shards warc_html_corpus
    full-scans, read the index.cdxj written beside them and run
    sources/warc.warc_cdx_ranged_corpus — read_cdxj → select_captures
    (status/mime prune + dedup-by-digest BEFORE any byte is fetched) →
    cdx_fetch_plan (one row per shard, offset-sorted ranges, ONE
    shuffle) → read_warc_ranges (pyarrow random-access, monotone seeks,
    lying index lines skipped not amplified) → the ONE shared HTML
    prune/text tail. This is the 100 TB access pattern: the index
    decides WHICH bytes, the reader seeks exactly those. Rows-only by
    necessity — DuckDB cannot parse WARC; semantics pinned by
    tests/test_cdx.py (index-first rows ≡ full-scan rows on the
    digest-unique fixture; deterministic-winner selection on planted
    duplicate digests) plus the ranged-reader bounds/exact-range units
    in tests/test_warc.py."""
    from azure_etl_databricks_sql_powerbi_spark.sources.warc import (
        warc_cdx_ranged_corpus,
    )

    shard_dir = _warc_fixture_dir(spark, sf_dir)
    return warc_cdx_ranged_corpus(
        spark, shard_dir + "/index.cdxj", base_uri=shard_dir + "/"
    )


# CDXJ planting for _q_cdx_capture_selection (ROTATION_POLICY.md §5 swap
# #11), written once in the SQL dialect intersection and parsed VERBATIM
# by F.expr and DuckDB (the _URL_PLANT_SQL discipline: CAST..AS STRING
# concat, no backslashes, no apostrophes; the JSON double-quotes are
# fine inside SQL single-quoted literals). Branch doc_id % 6: 0-1 html
# 200 — branch 1 doc d reuses branch 0 doc d-1's digest (997 is prime
# to every branch stride, so EVERY adjacent pair collides and distinct
# digests grow with the table instead of saturating), making dedup
# fodder where the two ts layouts let BOTH winner directions occur:
# the day selector is % 7 — COPRIME to the branch stride 6, so branch
# 0's day residues cover all of 0..6 and the wrap (branch-0 day 7 vs
# branch-1 day 1, where branch 1 wins) actually fires — with % 9 the
# branch-0 residues were stuck in {0,3,6} and branch 1 could never
# win (the r13 swap-commit review's second finding, simulation-proven);
# 2 = 404, 3 = pdf, 4 = malformed JSON (urlkey/ts parse, JSON fields
# NULL), 5 = non-CDXJ line (all fields NULL).
_CDX_PLANT_SQL = """CASE doc_id % 6
  WHEN 0 THEN 'com,site' || CAST(doc_id % 20 AS STRING) || ')/p'
       || CAST(doc_id AS STRING) || ' 2024010'
       || CAST(doc_id % 7 + 1 AS STRING)
       || '000000 {"url": "https://site' || CAST(doc_id % 20 AS STRING)
       || '.com/p' || CAST(doc_id AS STRING)
       || '", "mime": "text/html", "status": "200", "digest": "sha1:D'
       || CAST(doc_id % 997 AS STRING) || '", "length": "'
       || CAST(doc_id % 900 + 100 AS STRING) || '", "offset": "'
       || CAST(doc_id * 1000 AS STRING)
       || '", "filename": "shard-' || CAST(doc_id % 4 AS STRING)
       || '.warc.gz"}'
  WHEN 1 THEN 'com,site' || CAST(doc_id % 20 AS STRING) || ')/q'
       || CAST(doc_id AS STRING) || ' 2024010'
       || CAST(doc_id % 7 + 1 AS STRING)
       || '120000 {"url": "https://site' || CAST(doc_id % 20 AS STRING)
       || '.com/q' || CAST(doc_id AS STRING)
       || '", "mime": "text/html; charset=utf-8", "status": "200",'
       || ' "digest": "sha1:D' || CAST((doc_id - 1) % 997 AS STRING)
       || '", "length": "' || CAST(doc_id % 700 + 50 AS STRING)
       || '", "offset": "' || CAST(doc_id * 1000 + 17 AS STRING)
       || '", "filename": "shard-' || CAST(doc_id % 4 AS STRING)
       || '.warc.gz"}'
  WHEN 2 THEN 'com,gone)/x' || CAST(doc_id AS STRING)
       || ' 20240101000000 {"url": "https://gone.com/x'
       || CAST(doc_id AS STRING)
       || '", "mime": "text/html", "status": "404", "digest":'
       || ' "sha1:G' || CAST(doc_id AS STRING)
       || '", "length": "300", "offset": "'
       || CAST(doc_id * 1000 AS STRING)
       || '", "filename": "shard-9.warc.gz"}'
  WHEN 3 THEN 'com,docs)/d' || CAST(doc_id AS STRING)
       || ' 20240101000000 {"url": "https://docs.com/d'
       || CAST(doc_id AS STRING)
       || '", "mime": "application/pdf", "status": "200", "digest":'
       || ' "sha1:P' || CAST(doc_id AS STRING)
       || '", "length": "9000", "offset": "'
       || CAST(doc_id * 1000 AS STRING)
       || '", "filename": "shard-9.warc.gz"}'
  WHEN 4 THEN 'com,broken)/ 20240101000000 {not json '
       || CAST(doc_id AS STRING)
  ELSE 'garbage line ' || CAST(doc_id AS STRING)
END"""


def _q_cdx_capture_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-index capture selection (sources/cdx; ROTATION_POLICY.md §5
    swap #11) — the stage that decides WHICH bytes of a 100 TB crawl get
    fetched: planted CDXJ index lines over the documents table (ONE
    dual-dialect _CDX_PLANT_SQL string) → parse_cdxj (single JsonToStructs
    evaluation, all JVM, plan-pinned in tests/test_cdx.py) →
    select_captures (status/MIME prune, then ONE capture per content
    digest — earliest (ts, urlkey, filename, offset) wins, NULL digests
    shielded from collapse). Hash-exact INCLUDING the parsed fields and
    the dedup winners vs an oracle composed from the module's own
    duckdb_parse_cdxj_sql builder plus a window-function replay of the
    documented selection; hand-written fixture expectations live in
    tests/test_cdx.py (the generated-twin mitigation norm). The
    downstream per-shard ranged-fetch plan (array-typed, not SQL-
    hashable) keeps its evidence in the ranged ≡ full-scan unit."""
    from azure_etl_databricks_sql_powerbi_spark.sources.cdx import (
        parse_cdxj,
        select_captures,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        F.expr(_CDX_PLANT_SQL).alias("value")
    )
    return select_captures(parse_cdxj(docs))


# robots.txt planting for _q_robots_policy_docs (ROTATION_POLICY.md §5
# swap #12), written once in the SQL dialect intersection (chr(10)
# newlines — n<=255 so Spark's mod-256 chr agrees with DuckDB; no
# backslashes, no apostrophes). One robots document per site0..site19
# domain, doc_id % 4 branches: 0 = a full policy (comment line, inline
# comment, * group with allow-beats-disallow tie fodder, wildcard and
# $-anchor patterns, a blank-line group end, a mixed-case TrainBot
# group with a crawl-delay), 1 = the classic empty-Disallow allow-all,
# 2 = an orphan rule (dropped per REP) + a * block + a post-blank
# orphan (also dropped), 3 = NO robots.txt at all (the docs side
# filters the branch out; its URLs must default-allow).
_ROBOTS_DOMAIN_PLANT_SQL = "'site' || CAST(doc_id AS STRING) || '.com'"
_ROBOTS_TXT_PLANT_SQL = """CASE doc_id % 4
  WHEN 0 THEN '# robots for site' || CAST(doc_id AS STRING) || chr(10)
       || 'User-agent: *' || chr(10)
       || 'Disallow: /private/ # staff only' || chr(10)
       || 'Allow: /private/ok' || chr(10)
       || 'Disallow: /tmp*.bak' || chr(10)
       || 'Disallow: /exact$' || chr(10)
       || chr(10)
       || 'User-Agent: TrainBot' || chr(10)
       || 'Disallow: /no-train/' || chr(10)
       || 'Crawl-delay: 7'
  WHEN 1 THEN 'User-agent: *' || chr(10) || 'Disallow:'
  ELSE 'Disallow: /orphan/' || chr(10)
       || 'User-agent: *' || chr(10)
       || 'Disallow: /blocked/' || chr(10)
       || chr(10)
       || 'Disallow: /after-blank/'
END"""
# URLs over the WHOLE documents table onto the 20 domains (branch-3
# domains carry no robots.txt -> default allow). Path branches arm:
# plain allow, the /private/ block, the longer-allow-wins tie, the
# wildcard, the $ anchor (and its non-match sibling), the
# trainbot-only block, and the branch-2 /blocked/ prefix. The path
# branch selector is floor(doc_id / 20) % 8 — NOT doc_id % 8, which is
# fully correlated with the domain's robots branch (domain index is
# doc_id % 20 and 4 | 8, 4 | 20, so path k would only ever land on
# robots branch k % 4 and five of the eight scenarios could never fire
# — the r13 swap-commit review's top finding). With the quotient
# selector every (path, robots-branch) combination occurs on every
# shipped table size. Branch 0 also prefixes www. + an uppercase
# scheme-host to exercise host lowering + registered-domain label
# arithmetic on both sides.
_ROBOTS_URL_PLANT_SQL = """CASE CAST(floor(doc_id / 20) AS INT) % 8
  WHEN 0 THEN 'https://WWW.site' || CAST(doc_id % 20 AS STRING)
       || '.com/public/page'
  WHEN 1 THEN 'https://site' || CAST(doc_id % 20 AS STRING)
       || '.com/private/secret'
  WHEN 2 THEN 'https://site' || CAST(doc_id % 20 AS STRING)
       || '.com/private/ok'
  WHEN 3 THEN 'https://site' || CAST(doc_id % 20 AS STRING)
       || '.com/tmp' || CAST(doc_id AS STRING) || '.bak'
  WHEN 4 THEN 'https://site' || CAST(doc_id % 20 AS STRING)
       || '.com/exact'
  WHEN 5 THEN 'https://site' || CAST(doc_id % 20 AS STRING)
       || '.com/exactly'
  WHEN 6 THEN 'https://site' || CAST(doc_id % 20 AS STRING)
       || '.com/no-train/x'
  ELSE 'https://site' || CAST(doc_id % 20 AS STRING)
       || '.com/blocked/x' || CAST(doc_id AS STRING)
END"""


def _q_robots_policy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-exclusion policy verdicts (functions/robots;
    ROTATION_POLICY.md §5 swap #12) — the post-hoc robots.txt filter a
    training pipeline runs over an archived crawl: planted robots
    documents (ONE dual-dialect _ROBOTS_TXT_PLANT_SQL) → parse_robots
    (stanza binding via window functions, patterns compiled to
    Java ≡ RE2 anchored regexes, all JVM) → filter_robots_allowed for
    BOTH the default '*' agent and an exact 'trainbot' agent (group
    selection: exact beats *, permission-empty exact groups allow-all),
    union-tagged. Per-URL verdicts: broadcast rules join + one window
    keyed by the real doc_id (row_id_col — deterministic across stage
    re-attempts), longest pattern wins, allow on ties, default allow.
    Hash-exact INCLUDING the winning-rule text vs an oracle composed
    from the module's own duckdb_parse_robots_sql builder plus a
    window replay of the documented group-selection/longest-match
    semantics; hand-written verdict expectations live in
    tests/test_robots.py (the generated-twin mitigation norm)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.robots import (
        filter_robots_allowed,
        parse_robots,
    )

    docs = load_table(spark, sf_dir, "documents")
    robots = docs.filter(
        (F.col("doc_id") < 20) & (F.col("doc_id") % 4 < 3)
    ).select(
        F.expr(_ROBOTS_DOMAIN_PLANT_SQL).alias("domain"),
        F.expr(_ROBOTS_TXT_PLANT_SQL).alias("robots_txt"),
    )
    # materialize the (domain-count-sized) rule table ONCE (r15, guide
    # §2.4 + the filter_robots_allowed eager-probe note): without the
    # checkpoint its window-heavy parse lineage is evaluated FOUR times —
    # the broadcastability probe and the verdict join, for each of the
    # two agent branches (before: 8 document scans / 15 Window nodes in
    # the plan; after: the parse runs once)
    rules = parse_robots(robots).localCheckpoint(eager=True)
    urls = docs.select("doc_id", F.expr(_ROBOTS_URL_PLANT_SQL).alias("url"))
    parts = [
        filter_robots_allowed(
            urls, rules, agent=agent, keep_verdict=True, row_id_col="doc_id"
        ).select(
            "doc_id",
            "url",
            F.lit(agent).alias("agent"),
            "robots_allowed",
            "robots_rule",
        )
        for agent in ("*", "trainbot")
    ]
    return parts[0].unionByName(parts[1])


# Sitemap planting for _q_sitemap_frontier (ROTATION_POLICY.md §5 swap
# #14), in the SQL dialect intersection (chr(10) newlines, no
# backslashes, no apostrophes; XML attribute quotes are double quotes
# inside single-quoted SQL literals). The DOMAIN index is
# floor(doc_id / 4) % 20 — NOT doc_id % 20, which is correlated with
# the doc_id % 4 branch selector (4 | 20: branch-k sitemaps would only
# ever target domains whose ROBOTS doc is branch k % 4, starving most
# (sitemap-branch, robots-branch) scenarios — the r13
# correlated-selector lesson); the content index is floor(doc_id / 80)
# % 5, independent of both. Branches arm: [0] plain entry + lastmod +
# priority, a robots-blocked /private/ entry, and an entity-escaped
# multi-param loc on an uppercase host + default port + utm param
# (decode + canonicalize work; its canonical form REPEATS across docs
# sharing a domain, so the frontier DISTINCT provably removes real
# duplicates) + a malformed <priority>high</priority>; [1]
# pretty-printed loc wrapped in newline+indent (the whitespace-trim
# pass) + a loc-less entry that must vanish; [2] a sitemap-INDEX
# pointer that must NOT reach the frontier + a /no-train/ entry ('*'
# group selection: allowed for the default agent); [3] a non-URL loc
# (canonicalize NULL, dropped) + a /blocked/ entry (blocked on
# robots-branch-2 domains). Robots side reuses the swap-#12 plants —
# the composed query IS the crawl-seeding pipeline those rules feed.
_SITEMAP_DOM_SQL = "CAST(CAST(floor(doc_id / 4) AS INT) % 20 AS STRING)"
_SITEMAP_Q_SQL = "CAST(CAST(floor(doc_id / 80) AS INT) % 5 AS STRING)"
_SITEMAP_PLANT_SQL = f"""CASE doc_id % 4
  WHEN 0 THEN '<?xml version="1.0"?><urlset>'
       || '<url><loc>https://site' || {_SITEMAP_DOM_SQL}
       || '.com/public/p' || {_SITEMAP_Q_SQL}
       || '.html</loc><lastmod>2024-01-01</lastmod>'
       || '<priority>0.8</priority></url>'
       || '<url><loc>https://site' || {_SITEMAP_DOM_SQL}
       || '.com/private/secret' || {_SITEMAP_Q_SQL}
       || '.html</loc></url>'
       || '<url><loc>https://Site' || {_SITEMAP_DOM_SQL}
       || '.com:443/dup.html?utm_source=x&amp;a=1</loc>'
       || '<priority>high</priority></url></urlset>'
  WHEN 1 THEN '<urlset><url><loc>' || chr(10) || '  https://site'
       || {_SITEMAP_DOM_SQL} || '.com/private/ok' || {_SITEMAP_Q_SQL}
       || '.html' || chr(10) || '</loc>'
       || '<changefreq>daily</changefreq></url>'
       || '<url><lastmod>2024-02-02</lastmod></url></urlset>'
  WHEN 2 THEN '<sitemapindex><sitemap><loc>https://site'
       || {_SITEMAP_DOM_SQL} || '.com/sitemap' || {_SITEMAP_Q_SQL}
       || '.xml</loc></sitemap></sitemapindex>'
       || '<urlset><url><loc>https://site' || {_SITEMAP_DOM_SQL}
       || '.com/no-train/x' || {_SITEMAP_Q_SQL}
       || '.html</loc></url></urlset>'
  ELSE '<urlset><url><loc>not a url</loc></url>'
       || '<url><loc>https://site' || {_SITEMAP_DOM_SQL}
       || '.com/blocked/x' || {_SITEMAP_Q_SQL}
       || '.html</loc></url></urlset>'
END"""


def _q_sitemap_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-seeding pipeline end-to-end (functions/sitemap +
    functions/robots; ROTATION_POLICY.md §5 swap #14): planted sitemap
    XML (ONE dual-dialect _SITEMAP_PLANT_SQL) → parse_sitemap
    (block-isolate-then-extract, whitespace trim, entity decode,
    index/url kind split) → canonicalize_urls → distinct →
    filter_robots_allowed for the default '*' agent over the
    swap-#12 robots rule table. Hash-exact INCLUDING the canonical
    frontier URL text vs an oracle composed from the module's OWN
    duckdb_parse_sitemap_sql + duckdb_canonicalize_url_sql +
    duckdb_parse_robots_sql builders plus the robots_policy_docs
    window replay (single-agent form); hand-written frontier
    expectations live in tests/test_sitemap.py."""
    from azure_etl_databricks_sql_powerbi_spark.functions.robots import (
        parse_robots,
    )
    from azure_etl_databricks_sql_powerbi_spark.functions.sitemap import (
        sitemap_frontier,
    )

    # spread: same single-split rationale as _q_link_edges_docs — the
    # sitemap side runs block-extraction + per-entry canonicalization
    # regexes per row
    docs = spread(load_table(spark, sf_dir, "documents"))
    sitemaps = docs.select(F.expr(_SITEMAP_PLANT_SQL).alias("xml"))
    robots = docs.filter(
        (F.col("doc_id") < 20) & (F.col("doc_id") % 4 < 3)
    ).select(
        F.expr(_ROBOTS_DOMAIN_PLANT_SQL).alias("domain"),
        F.expr(_ROBOTS_TXT_PLANT_SQL).alias("robots_txt"),
    )
    # one materialization shares the rule parse between the broadcast
    # probe and the frontier's verdict join (the robots_policy_docs
    # rationale; rules are domain-count-sized)
    rules = parse_robots(robots).localCheckpoint(eager=True)
    return sitemap_frontier(sitemaps, rules=rules)


# ------------------------------------------------- EXT: similarity search


def _q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for queries vec_id<10 (exact baseline)."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.bruteforce import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


def _q_embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs above 0.4 (bounded slice)."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.bruteforce import (
        cosine_near_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return cosine_near_pairs(emb, threshold=0.4)


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-5 (rows-only; recall vs brute force is
    asserted in unit tests)."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.lsh import lsh_cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)



# ----------------------------------------------------- EXT: time windows


def _q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day windows x event_type (ST3; F.window — identical plan
    serves batch and Structured Streaming, see streaming/windows.py)."""
    from azure_etl_databricks_sql_powerbi_spark.streaming.windows import tumbling_kpis

    return tumbling_kpis(load_table(spark, sf_dir, "events"), "1 day")


def _q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-day windows every 6 hours (each event in 4 windows)."""
    from azure_etl_databricks_sql_powerbi_spark.streaming.windows import sliding_kpis

    return sliding_kpis(load_table(spark, sf_dir, "events"), "1 day", "6 hours")


def _q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows, 2-hour gap (F.session_window; oracle is
    the classic gaps-and-islands SQL with identical end = last + gap)."""
    from azure_etl_databricks_sql_powerbi_spark.streaming.windows import session_stats

    return session_stats(load_table(spark, sf_dir, "events"), "2 hours")



# ------------------------------------------------------- EXT: multimodal


def _q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media metadata over GENERATED REAL PNGs — the same
    provenance as media_decode_features (and the r15-retired
    media_frames, §5 swap #15; VERDICT-r5 nit: this query was the last
    one on synthetic fake-media bytes). Each doc
    gets a valid in-plan PNG (stored-deflate, per-row height = 8 +
    doc_id % 9) and the engine extracts (media_type sniffed from real
    magic bytes, n_bytes) JVM-side. With compress_level=0 the PNG length
    is exact arithmetic (multimodal/png.encoded_png_size), so the oracle
    verifies REAL byte sizes in SQL: n_bytes = 49*h + 68 at width 16.
    Content sha256 is decode-path territory — unit-tested in
    tests/test_multimodal.py, not SQL-expressible."""
    from azure_etl_databricks_sql_powerbi_spark.multimodal import ops

    docs = load_table(spark, sf_dir, "documents")
    media = ops.attach_generated_png(
        docs, width=16, height=8, vary_height_mod=9, compress_level=0
    )
    return ops.media_metadata(media).select("media_id", "media_type", "n_bytes")


def _q_media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end (no _fake_features): deterministic
    PNGs are generated in-plan per document (multimodal.png.encode_png —
    actual zlib-compressed 8-bit RGB), then decoded + featurized through
    the real codec path (_decode_image: PIL when importable, else the
    stdlib PNG decoder with filter reconstruction). Rows-only: pixel
    featurization has no SQL oracle; encoder<->decoder roundtrip and
    embedding determinism are unit-tested (tests/test_multimodal.py)."""
    from azure_etl_databricks_sql_powerbi_spark.multimodal import ops

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    media = ops.attach_generated_png(docs, width=16, height=16)
    feats = ops.decode_image_features(media, fake_features=False)
    return feats.select(
        "media_id",
        "width",
        "height",
        F.round(F.element_at("embedding", 1), 6).alias("emb_0"),
    )



# ---------------------------------------- EXT: as-of / range joins, BI ops


def _q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode end-to-end: deterministic PCM16 WAV tones are
    generated in-plan per document (multimodal.wav.encode_wav — actual
    RIFF containers), then parsed back (decode_wav) for duration / RMS /
    zero-crossing-rate / peak. Rows-only: the codec round-trip and the
    feature math are unit-tested (tests/test_multimodal.py); zcr ~
    2*freq/sample_rate gives an analytic cross-check."""
    from azure_etl_databricks_sql_powerbi_spark.multimodal import ops

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    media = ops.attach_generated_wav(docs)
    return ops.audio_features(media)


def _q_asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of backward join (J4-EXT): each event picks the customer's latest
    order with o_orderdate <= ts — union + sorted-window carry-forward (one
    shuffle, merge-join shape; operators/asof.py). Right side is first
    reduced to one row per (custkey, orderdate) so the as-of choice is
    deterministic on both engines."""
    from azure_etl_databricks_sql_powerbi_spark.operators.asof import asof_join_backward
    from azure_etl_databricks_sql_powerbi_spark.operators.dedup import latest_per_key

    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = latest_per_key(
        load_table(spark, sf_dir, "orders"),
        keys=["o_custkey", "o_orderdate"],
        order_by=["o_orderkey"],
        tiebreak=[],
    ).select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    return asof_join_backward(
        events.withColumn("o_custkey", F.col("user_id")),
        orders,
        on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    ).select("event_id", "ts", "user_id", "o_orderkey", "o_totalprice")


def _q_range_join_business_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via bucket expansion (J4-EXT): events against per-day
    [06:00, 18:00) windows, executed as an equi-join on day buckets + exact
    range filter (operators/asof.py range_join_buckets)."""
    from azure_etl_databricks_sql_powerbi_spark.operators.asof import range_join_buckets

    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    days = (
        events.select(F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .select(
            (F.col("d") + F.expr("INTERVAL 6 HOURS")).alias("win_start"),
            (F.col("d") + F.expr("INTERVAL 18 HOURS")).alias("win_end"),
        )
    )
    joined = range_join_buckets(
        events, days, point_ts="ts", start_ts="win_start", end_ts="win_end", bucket="1 day"
    )
    return (
        joined.groupBy("win_start", "win_end")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
        )
    )


def _q_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (BI surface): order counts + revenue per priority x status."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(money_sum("o_totalprice"))
        .withColumnsRenamed({"F": "rev_f", "O": "rev_o", "P": "rev_p"})
    )


def _q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (linear interpolation — same definition
    as DuckDB quantile_cont)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        *[
            F.round(F.percentile("o_totalprice", q), 4).alias(f"p{int(q*100)}")
            for q in (0.25, 0.5, 0.75, 0.9)
        ]
    )


def _q_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate (A5): all grouping-set combinations of status x
    priority."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("total_price"),
        )
    )


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (north-star text surface): whitespace tokens
    and a BPE-ish regex segmentation (letter runs / digit runs / single
    punctuation), both pure JVM regex ops."""
    from azure_etl_databricks_sql_powerbi_spark.functions import text as T

    docs = spread(load_table(spark, sf_dir, "documents"))
    bpe_pattern = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_ws_tokens"),
        F.regexp_count("text", F.lit(bpe_pattern)).alias("n_bpe_tokens"),
    )



def _q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat approximate top-5 (rows-only; recall vs brute force is
    asserted in unit tests). Centroids trained driver-side, assignment via
    Arrow-batched pandas_udf, probe = equi-join on cell id."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivf import ivf_cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, nlist=16, nprobe=4)



def _q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-5 (rows-only; recall >= IVF-Flat at equal
    nprobe and scan-fraction bound asserted in tests/test_ext.py): coarse
    cells prune WHICH codes the ADC scan reads (isin on the probed-cell
    union -> partition pruning on a cell-partitioned table), PQ codes
    compress WHAT it reads (m bytes/vector), and the exact-cosine refine
    of the broadcast shortlist recovers quantization loss — the FAISS
    IVFADC+R shape (similarity/ivfpq.py)."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.ivfpq import (
        ivfpq_cosine_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_cosine_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, nlist=16, nprobe=4, m=4
    )


_ANN_INDEX_CACHE: dict[str, str] = {}


def _q_ann_ivfpq_day2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-2 ANN against a PERSISTED IVF-PQ index (similarity/index.py —
    VERDICT r6 directive 2): the corpus is trained + PQ-encoded ONCE into
    an index directory (model.npz + coded parquet PARTITIONED BY cell,
    cached per sf_dir like the dedup-state day-2 queries), then the query
    batch loads the index and answers with zero training work — the ADC
    scan's cell.isin(probed) is partition pruning on the coded layout
    (PartitionFilters plan-asserted in tests/test_ext.py), and the
    exact-cosine refine fetches true vectors from the SAME pruned
    partitions. Rows-only by design (ANN has no SQL oracle); recall vs
    brute force and probe-path identity with the in-plan ivfpq operator
    are unit-tested."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.index import (
        load_index,
        query_index,
        save_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    if sf_dir not in _ANN_INDEX_CACHE:
        idx_dir = _scratch_dir("ann_index_")
        # save_index already returns the freshly loaded index — reuse it
        # instead of loading twice on the build call (r7 review finding)
        index = save_index(emb, idx_dir, nlist=16, m=4)
        _ANN_INDEX_CACHE[sf_dir] = idx_dir
    else:
        index = load_index(spark, _ANN_INDEX_CACHE[sf_dir])
    # a DIFFERENT query slice than ann_ivfpq_topk's vec_id<10, so day-2
    # evidence is not a replay of the day-1 batch
    return query_index(
        index, emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 20)),
        k=5, nprobe=4,
    )


def _q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed full-corpus spherical k-means over the embeddings table
    (similarity/kmeans.py — Lloyd's with executor-side Arrow partial sums,
    model-sized driver reduce). Rows-only by design: k-means is not
    SQL-expressible; convergence (inertia monotone), determinism, planted-
    cluster recovery, and the <=k-rows-per-partition partials bound are
    unit-tested (tests/test_kmeans.py). Output: one row per non-empty
    cluster (cluster, n_members, rep_id)."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.kmeans import (
        kmeans_cluster_profile,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_cluster_profile(emb, k=16, iters=8, seed=42)


def _q_bm25_rank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval over documents (functions/ranking.py): rank
    the corpus against a fixed 4-term query. Hash-exact vs DuckDB by the
    micro-unit contract (ln quantized to integer micro-units, exact
    integer SUM per doc, one final raw division — the unigram-LM
    precedent). Posting filter is map-side (only query-term rows reach
    the tf shuffle); final top-n is TakeOrderedAndProject."""
    from azure_etl_databricks_sql_powerbi_spark.functions.ranking import bm25_rank

    docs = load_table(spark, sf_dir, "documents")
    return bm25_rank(docs, ["dup", "hash", "vector", "stream"], top_n=25)


def _q_rag_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG ingestion composition (plans/curation.rag_ingest): Gopher
    gate -> exact doc dedup -> overlapping chunking -> chunk-level dedup
    with provenance — one lazy plan; the chunk-store dedup is what keeps
    a vector index free of repeated boilerplate spans. Oracle: the full
    CTE composition in DuckDB (gate + dedup + UNNEST chunking + GROUP BY
    chunk text), hash-exact."""
    from azure_etl_databricks_sql_powerbi_spark.plans.curation import rag_ingest

    docs = load_table(spark, sf_dir, "documents")
    return rag_ingest(docs, chunk_tokens=8, overlap=2)


def _q_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES,
    operators/sampling.weighted_sample): 100 documents drawn with
    inclusion probability ∝ length (n_chars) — importance sampling for
    curation mixes. md5-derived uniforms + micro-quantized keys make the
    draw a pure function of the data, so the SAME rows win in DuckDB:
    hash-exact, and re-runs/retries are reproducible by construction."""
    from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (
        weighted_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs, "n_chars", k=100, salt="r6").select(
        "doc_id", "lang", "n_chars"
    )


def _q_curriculum_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: corpus ordered by model-based quality (the
    hash-exact unigram LM score) and cut into 10 rank bands — the
    quality-ordered schedule a curriculum-learning data loader consumes.
    Scalable shape: the global order comes from the distributed rank
    (operators/fuzzy._global_sorted_rank — range partitioning + bounded
    offsets), NOT a single-partition ntile window; band assignment is a
    map-side expression. Output per decile: population and the score
    range (min/max are selections of already-hash-exact doubles, so no
    float accumulation enters the oracle compare)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.text import (
        unigram_logprob_scores,
    )
    from azure_etl_databricks_sql_powerbi_spark.operators.fuzzy import (
        _global_sorted_rank,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = unigram_logprob_scores(docs, vocab_size=1000).select(
        "doc_id", "mean_logprob"
    )
    n = scored.count()  # bounded: one scalar
    # single-pass consumer: the decile aggregate reads the rank once, so
    # the output-side checkpoint would be a pure blocking materialization
    # (materialize=False — VERDICT r15 item 4)
    ranked = _global_sorted_rank(
        scored, ["mean_logprob", "doc_id"], materialize=False
    )
    return (
        ranked.withColumn(
            "decile", F.floor(F.col("__rank") * 10 / F.lit(n)).cast("int")
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("mean_logprob").alias("min_score"),
            F.max("mean_logprob").alias("max_score"),
        )
        .orderBy("decile")
    )


def _q_hashed_features_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (functions/features.py — the vocabulary-free
    fixed-dim featurizer): sparse (doc, bucket, tf) triples over a
    64-bucket space. Bucket = md5-prefix arithmetic identical in DuckDB,
    so the whole featurizer is hash-exact; the dense assembly variant is
    unit-tested (sparse ≡ dense, pure Catalyst)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.features import (
        hashed_text_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    return hashed_text_features(docs, dim=64)


def _q_pseudonymize_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy tier (operators/privacy.py): customer name/phone-ish
    identifiers replaced by keyed sha256 pseudonyms (deterministic, so
    joins still line up after masking), plus the k-anonymity violation
    report over (nation, segment) quasi-identifiers appended as a QC
    relation would consume it. Hash-exact: Spark sha2 ≡ DuckDB sha256
    on identical salted input."""
    from azure_etl_databricks_sql_powerbi_spark.operators.privacy import (
        k_anonymity_violations,
        pseudonymize,
    )

    cust = load_table(spark, sf_dir, "customer")
    masked = pseudonymize(cust, ["c_name"], salt="unit-test-salt").select(
        "c_custkey", F.col("c_name").alias("name_token"), "c_nationkey", "c_mktsegment"
    )
    viol = k_anonymity_violations(cust, ["c_nationkey", "c_mktsegment"], k=10)
    # one relation: masked rows LEFT JOIN their group's violation flag
    return masked.join(
        viol.select("c_nationkey", "c_mktsegment", F.lit(1).alias("reidentifiable")),
        on=["c_nationkey", "c_mktsegment"],
        how="left",
    ).select(
        "c_custkey",
        "name_token",
        "c_nationkey",
        "c_mktsegment",
        F.coalesce("reidentifiable", F.lit(0)).cast("int").alias("reidentifiable"),
    )


def _q_median_price_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF surface (§2.10, functions/udafs.py): per-(status,
    priority) median and midrange of order totals through Arrow grouped-
    agg UDAFs. Exact-median definition matches DuckDB's MEDIAN on
    doubles, midrange is two IEEE ops — both hash-exact. The built-in
    F.median equivalence is unit-pinned; this query keeps the UDAF API
    path driver-verified."""
    from azure_etl_databricks_sql_powerbi_spark.functions.udafs import (
        median_udaf,
        midrange_udaf,
    )

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            median_udaf("o_totalprice").alias("median_price"),
            midrange_udaf("o_totalprice").alias("midrange_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


def _q_orders_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML surface (Spark 4 built-in from_xml): order rows serialized to
    XML in-plan, parsed back with an explicit schema, typed fields
    returned. Self-oracle: parsing what we serialized must return the
    original columns, so the oracle just selects them directly — the
    parse either reproduces them (green) or it doesn't."""
    orders = load_table(spark, sf_dir, "orders")
    xml = orders.select(
        "o_orderkey",
        F.concat(
            F.lit("<order><custkey>"),
            F.col("o_custkey").cast("string"),
            F.lit("</custkey><status>"),
            F.col("o_orderstatus"),
            F.lit("</status><price>"),
            F.col("o_totalprice").cast("string"),
            F.lit("</price></order>"),
        ).alias("payload"),
    )
    parsed = xml.select(
        "o_orderkey",
        F.from_xml(
            "payload", "custkey BIGINT, status STRING, price DOUBLE"
        ).alias("x"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("x.custkey").alias("o_custkey"),
        F.col("x.status").alias("o_orderstatus"),
        F.col("x.price").alias("o_totalprice"),
    )


_KHOP_EDGES_SQL = """
    SELECT 'S' || CAST(l_suppkey AS {str_t}) AS src,
           'P' || CAST(l_partkey AS {str_t}) AS dst FROM {li}
    UNION ALL
    SELECT 'P' || CAST(l_partkey AS {str_t}),
           'S' || CAST(l_suppkey AS {str_t}) FROM {li}
"""

_KHOP_SQL = """
WITH RECURSIVE reach(node, dist) AS (
  SELECT 'S1' AS node, 0 AS dist
  UNION ALL
  SELECT DISTINCT e.dst, r.dist + 1
  FROM reach r
  JOIN ({edges}) e ON e.src = r.node
  WHERE r.dist < 3
)
SELECT dist, COUNT(*) AS n_nodes
FROM (SELECT node, MIN(dist) AS dist FROM reach GROUP BY node)
GROUP BY dist
ORDER BY dist
"""


_KHOP_EDGE_CACHE: dict[str, tuple] = {}  # sf_dir -> (session, persisted edges)


def _q_khop_reach_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 RECURSIVE CTE surface (SPARK-24497): depth-bounded BFS
    over the supplier↔part graph — nodes within 3 hops of supplier S1,
    counted per first-reached distance. The recursive term joins only
    the PREVIOUS step (SQL-standard working-table semantics) and
    applies DISTINCT per step, so the frontier is node-bounded and the
    path explosion a naive closure would hit never materializes; the
    dist < 3 guard bounds recursion depth unconditionally. The edge
    relation is persisted ONCE PER (session, sf_dir) via a bounded
    module cache (the _DEDUP_STATE_CACHE daily-job precedent —
    materialized-view semantics): inlined, every recursion step would
    re-scan lineitem and rebuild the union (measured ~1.8x at sf0.1).
    persist (in-memory COLUMNAR InMemoryRelation) beats an eager
    localCheckpoint here — the recursion scans the relation once per
    step, and the columnar cached scan is ~2x the deserialized RDD-block
    read (measured 1.6s vs 3.4s warm at sf0.1). Unlike the r6 per-call
    cacheTable (ADVICE cache-leak family), the cache holds ONE frame per
    sf_dir, and an eviction (session clearCache, memory pressure) just
    recomputes lazily into cache — never wrong, never accumulating. The
    SAME recursion text runs in DuckDB as the oracle."""
    # one entry PER sf_dir (not per session): a stale entry from a
    # previous SparkSession is evicted — best-effort unpersisted — so the
    # cache cannot pin dead session graphs or grow across session
    # restarts (r7 review finding)
    cached = _KHOP_EDGE_CACHE.get(sf_dir)
    if cached is not None and cached[0] is not spark:
        try:
            cached[1].unpersist()
        except Exception:
            pass  # the owning session is gone; dropping the ref suffices
        cached = None
        _KHOP_EDGE_CACHE.pop(sf_dir, None)
    if cached is None:
        li = load_table(spark, sf_dir, "lineitem")
        li.createOrReplaceTempView("__khop_li")
        edges = spark.sql(
            _KHOP_EDGES_SQL.format(str_t="STRING", li="__khop_li")
        ).persist()
        _KHOP_EDGE_CACHE[sf_dir] = (spark, edges)
    else:
        edges = cached[1]
    edges.createOrReplaceTempView("__khop_edges")
    return spark.sql(_KHOP_SQL.format(edges="SELECT * FROM __khop_edges"))


def _q_fuzzy_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy-join CONTRACT query — multi-pass sorted
    neighborhood (operators/fuzzy.multi_pass_snm_pairs): candidates from
    TWO linear passes (sorted on c_name and on reverse(c_name)), each
    N x window pairs, unioned + deduped, verified with the same
    threshold-bounded levenshtein as the blocked variant.

    Scale honesty (VERDICT r6 directive 1): this query previously ran
    blocked_fuzzy_pairs with `nation` as the blocking key — cardinality
    25, CONSTANT, so intra-block verify work grew quadratically in N
    (the one `weak` row on the r6 board). Multi-pass SNM is linear in N
    by construction for ANY corpus, measured sub-linear at sf1
    (BENCH_SF1.md); the nation-blocked variant is retired to a unit-test
    fixture (tests/test_ext.py). Oracle: the identical two-pass
    rank-window semantics in DuckDB (ROW_NUMBER over each sort key,
    UNION dedup) — hash-exact because both sorts are total orders and
    levenshtein is identically defined in both engines."""
    from azure_etl_databricks_sql_powerbi_spark.operators.fuzzy import (
        multi_pass_snm_pairs,
    )

    cust = load_table(spark, sf_dir, "customer")
    return multi_pass_snm_pairs(
        cust, "c_name", "c_custkey", window=10, max_distance=2
    )


def _q_snm_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity resolution (operators/fuzzy.
    sorted_neighborhood_pairs) — the LINEAR-candidates scale path
    (N×window pairs for ANY corpus, no blocking key needed; see the
    BENCH_SF1 fuzzy-join analysis). Distributed global rank via range
    partitioning + bucket-adjacency join. Oracle: the identical
    rank-window semantics in DuckDB (ROW_NUMBER self-join) — hash-exact
    because the sort is a total order (name, id)."""
    from azure_etl_databricks_sql_powerbi_spark.operators.fuzzy import (
        sorted_neighborhood_pairs,
    )

    cust = load_table(spark, sf_dir, "customer")
    return sorted_neighborhood_pairs(
        cust, "c_name", "c_custkey", window=10, max_distance=2
    )


def _q_quality_classifier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distilled hashed linear quality classifier (functions/classifier.
    distill_quality_classifier): the rule-based Gopher gate labels the
    corpus, per-bucket naive-Bayes log-odds + class prior are learned
    over hash_bucket token features (weight table = 512 rows, model-
    sized), and every document is scored with an EXACT integer micro-nat
    logit sum — the fastText-style quality-filter train+apply chain as
    one lazy plan. Oracle: the identical label/train/score CTE chain in
    DuckDB (same md5 buckets, same ln quantization); hash-exact incl.
    float logits."""
    from azure_etl_databricks_sql_powerbi_spark.functions.classifier import (
        distill_quality_classifier,
    )

    docs = load_table(spark, sf_dir, "documents")
    return distill_quality_classifier(docs, n_buckets=512)


def _q_triplet_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor/positive/negative contrastive-training triplets
    (similarity/negatives.triplet_candidates): per anchor (vec_id < 4),
    top-2 same-label neighbors crossed with top-3 cross-label hard
    negatives from ONE shared broadcast-anchor scoring pass; margin =
    round(pos_cos - neg_cos, 4) of the UNROUNDED cosines. Hash-exact vs
    the module-owned TRIPLETS_SQL twin (tests/test_negatives.py).
    Declared r11 via ROTATION_POLICY.md §5 swap #2, replacing the
    retired brute semantic_decontam_docs (the board's one quadratic
    oracle-parity query — its operator, SQL twin, and unit proof moved
    to tests/test_decontam.py; semantic_decontam_pruned remains the
    declared decontamination contract)."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.negatives import (
        triplet_candidates,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return triplet_candidates(emb, emb.filter(F.col("vec_id") < 4), k_pos=2, k_neg=3)


def _q_events_variant_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType surface: events.props parsed ONCE into a
    variant column (parse_json — binary semi-structured encoding, the
    engine-native replacement for repeated get_json_object string
    parses), fields extracted with variant_get and aggregated per
    event_type. Oracle: DuckDB json_extract on the same path."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("p")
    ).select(
        "event_type",
        F.variant_get("p", "$.k", "int").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("long").alias("k_sum"),
            F.min("k").cast("int").alias("k_min"),
            F.max("k").cast("int").alias("k_max"),
        )
        .orderBy("event_type")
    )


def _q_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment under a real streaming drain, with a SQL
    oracle: events re-landed as arrival files and STREAMED, joined per
    micro-batch against the STATIC broadcast customer dimension (the
    canonical streaming-ETL enrich shape — the static side is planned as
    a fresh broadcast per micro-batch, no state), then aggregated per
    (segment, event_type) in complete mode. Drained result ≡ the batch
    join+GROUP BY, which is exactly what the DuckDB oracle computes."""
    import os

    from azure_etl_databricks_sql_powerbi_spark.streaming import structured

    tmp = _scratch_dir("st_enrich_")
    src_dir, ck = f"{tmp}/in", f"{tmp}/ck"
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    events.repartition(4).write.parquet(src_dir)
    stream = structured.stream_files(
        spark,
        src_dir,
        "event_id bigint, user_id bigint, value double",
        max_files_per_trigger=2,
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = stream.join(F.broadcast(cust), on="user_id")
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        money_sum("value").alias("total_value"),
    )
    table = os.path.basename(tmp)
    structured.run_to_memory(
        agg, table, output_mode="complete", checkpoint=ck, shuffle_partitions=8
    )
    return spark.table(table)


def _q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot reconciliation (operators/diff.table_diff): orders
    vs a deterministically perturbed day-2 snapshot (keys %101 removed,
    %97 repriced +1.00, %89 cloned under shifted keys) -> one
    (key, added|removed|changed) row per difference. Spark classifies by
    map-side md5 row digest (the shuffle carries key+digest, plan-
    tested); the oracle classifies the same snapshot semantically with
    IS DISTINCT FROM — digests never cross the engine boundary, so
    double-to-string formatting differences can't bite."""
    from azure_etl_databricks_sql_powerbi_spark.operators.diff import table_diff

    old = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    changed_price = F.when(
        key % 97 == 0, F.col("o_totalprice") + F.lit(1.0)
    ).otherwise(F.col("o_totalprice"))
    new = (
        old.filter(key % 101 != 0)
        .withColumn("o_totalprice", changed_price)
        .unionByName(
            old.filter(key % 89 == 0).withColumn(
                "o_orderkey", key + F.lit(10_000_000)
            )
        )
    )
    return table_diff(old, new, ["o_orderkey"])


def _q_rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (operators/windows.rolling_range_agg —
    the W2 surface's interval-frame member, distinct from every
    rows-frame query): per-customer trailing-7-day order count and
    revenue at each order. Revenue accumulates in DECIMAL(18,2) inside
    the frame (running-frame float addition is order-dependent across
    engines) and casts to double only at the output edge — the
    hash-exactness contract from the r4 postmortem."""
    from azure_etl_databricks_sql_powerbi_spark.operators.windows import (
        rolling_range_agg,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price_dec"),
    )
    out = rolling_range_agg(
        orders,
        partition_by=["o_custkey"],
        ts_col="o_orderdate",
        value_col="price_dec",
        days=7,
        keys=["o_orderkey"],
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.col("rolling_n").cast("long").alias("n_7d"),
        F.col("rolling_sum").cast("double").alias("revenue_7d"),
    )


def _q_pagerank_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PageRank (graph/pagerank.py) over the undirected
    supplier↔part co-occurrence graph from lineitem: entity importance
    by shared order flow. Fixed-3-iteration Pregel-lite (join + groupBy
    per superstep, localCheckpoint lineage cuts); integer micro-unit
    rank state makes even this ITERATIVE operator hash-exact vs a
    mechanically-unrolled DuckDB CTE chain. Top-25 by (rank_m, node)."""
    from azure_etl_databricks_sql_powerbi_spark.graph.pagerank import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    s = F.concat(F.lit("S"), F.col("l_suppkey").cast("string"))
    p = F.concat(F.lit("P"), F.col("l_partkey").cast("string"))
    edges = li.select(s.alias("src"), p.alias("dst")).union(
        li.select(p.alias("src"), s.alias("dst"))
    )
    return (
        pagerank(edges, damping=0.85, iterations=3)
        .orderBy(F.col("rank_m").desc(), F.col("node").asc())
        .limit(25)
    )


def _co_order_part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part co-order graph: an edge (src, dst) per pair of parts shipped
    in the same order (src < dst keeps it canonical) — the shared input
    of the triangle / clustering / label-propagation queries. The SQL
    twin is ``_CO_ORDER_EDGES_SQL``.

    Kept as the literal self-join: the r16 pass A/B'd the §2.3
    "aggregate before you shuffle" alternative (collect_set per order +
    map-side sorted-pair expansion — one lineitem exchange instead of
    two) INTERLEAVED in one session feeding triangle_counts, and the
    join won (min-of-3 3.80 s vs 4.85 s; 2 of 3 rounds pairwise): at
    this row width the nested transform/flatten/explode costs more CPU
    than the extra hash-join exchange saves. Re-measure on a cluster
    where shuffle crosses a real network before revisiting."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l1 = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    l2 = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    return l1.join(l2, "l_orderkey").filter(F.col("src") < F.col("dst"))


_CO_ORDER_EDGES_SQL = (
    "SELECT l1.l_partkey AS src, l2.l_partkey AS dst "
    "FROM lineitem l1 JOIN lineitem l2 "
    "ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey"
)


def _q_triangle_counts_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle membership over the co-order graph
    (graph/triangles.triangle_counts): Schank-Wagner degree orientation
    bounds wedge work at Σ outdeg² <= |E|^1.5 — a 10M-degree hub
    generates ZERO wedges — and each triangle materializes exactly once
    at its minimum vertex (no /3 correction). Pure integer arithmetic,
    so the module-owned DuckDB twin (triangle_sql) is hash-exact."""
    from azure_etl_databricks_sql_powerbi_spark.graph.triangles import (
        triangle_counts,
    )

    return triangle_counts(_co_order_part_edges(spark, sf_dir))


def _q_clustering_coefficients_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per part (graph/triangles.
    clustering_coefficients): 2*T(v)/(deg(v)*(deg(v)-1)) — integer
    numerator/denominator, ONE raw IEEE division at the output edge
    (the mean_word_len contract), hash-exact vs clustering_sql."""
    from azure_etl_databricks_sql_powerbi_spark.graph.triangles import (
        clustering_coefficients,
    )

    return clustering_coefficients(_co_order_part_edges(spark, sf_dir))


def _q_label_propagation_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label-propagation communities over the
    part co-order graph (graph/lpa.label_propagation): majority label,
    ties to the smallest id, fixed 3 supersteps — every choice pinned so
    the fixed-K unrolled DuckDB CTE chain (lpa_sql_unrolled) replays the
    labels bit-for-bit. One join + count + argmin window per superstep,
    localCheckpoint lineage cuts between iterations."""
    from azure_etl_databricks_sql_powerbi_spark.graph.lpa import label_propagation

    return label_propagation(_co_order_part_edges(spark, sf_dir), iterations=3)


def _q_personalized_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (graph/pagerank.personalized_pagerank) over
    the supplier↔part co-occurrence graph FROM seed suppliers S1-S3:
    teleport mass (base, init) lands only on the seeds, so rank is
    link-structure proximity to them — the related-entities primitive.
    Same integer micro-unit state as the global query, so the seeded
    SQL unroll (pagerank_sql_unrolled(seeds=...)) stays hash-exact.
    Top-25 by (rank_m, node)."""
    from azure_etl_databricks_sql_powerbi_spark.graph.pagerank import (
        personalized_pagerank,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    s = F.concat(F.lit("S"), F.col("l_suppkey").cast("string"))
    p = F.concat(F.lit("P"), F.col("l_partkey").cast("string"))
    edges = li.select(s.alias("src"), p.alias("dst")).union(
        li.select(p.alias("src"), s.alias("dst"))
    )
    return (
        personalized_pagerank(
            edges, seeds=["S1", "S2", "S3"], damping=0.85, iterations=3
        )
        .orderBy(F.col("rank_m").desc(), F.col("node").asc())
        .limit(25)
    )


_MINHASH_INDEX_CACHE: dict[str, str] = {}
_SIMHASH_INDEX_CACHE: dict[str, str] = {}


def _q_minhash_near_dup_day2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-2 near-dup detection against the PERSISTED LSH index
    (dedup/minhash.save_minhash_index / near_dups_against_index — the
    novel_docs_day2 precedent for the NEAR-dup family): the corpus
    (doc_id % 5 != 0) is shingled + banded ONCE into an index directory
    (band buckets partitioned by band_idx, shingle sets, meta.json);
    the day-2 batch (doc_id % 3 == 0) probes it WITHOUT any corpus
    re-shingle — the probe plan's only file sources are index parquet
    (tests/test_incremental_dedup.py::
    test_minhash_day2_plan_never_rescans_corpus). Same-id self-matches
    (the batch slice overlapping the corpus) are filtered so the result
    is the genuine cross-doc near-dup set. Rows-only (xxhash64 has no
    DuckDB twin); the Jaccard-verify arithmetic is oracle-checked via
    token_jaccard_pairs."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.minhash import (
        near_dups_against_index,
        save_minhash_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    if sf_dir not in _MINHASH_INDEX_CACHE:
        idx_dir = _scratch_dir("minhash_idx_")
        save_minhash_index(docs.filter(F.col("doc_id") % 5 != 0), idx_dir)
        _MINHASH_INDEX_CACHE[sf_dir] = idx_dir
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    return near_dups_against_index(
        batch, spark, _MINHASH_INDEX_CACHE[sf_dir], threshold=0.5
    ).filter(F.col("batch_id") != F.col("corpus_id"))


def _q_simhash_near_dup_day2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-2 SimHash probe against the persisted fingerprint index
    (dedup/simhash.save_simhash_index / near_dups_against_simhash_index):
    the corpus side costs one 8-byte-per-doc parquet scan — bands derive
    from the stored fp with pure bit math, one bit_count(xor) verifies.
    Same corpus/batch slices as the MinHash twin; rows-only (Hamming
    band-pigeonhole recall is unit-tested)."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.simhash import (
        near_dups_against_simhash_index,
        save_simhash_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    if sf_dir not in _SIMHASH_INDEX_CACHE:
        idx_dir = _scratch_dir("simhash_idx_")
        save_simhash_index(docs.filter(F.col("doc_id") % 5 != 0), idx_dir)
        _SIMHASH_INDEX_CACHE[sf_dir] = idx_dir
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    return near_dups_against_simhash_index(
        batch, spark, _SIMHASH_INDEX_CACHE[sf_dir], max_hamming=3
    ).filter(F.col("batch_id") != F.col("corpus_id"))


def _q_semantic_decontam_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MATERIALIZED scale path of embedding-space decontamination
    (dedup/decontam.semantic_contamination_pruned — VERDICT r7 item 4):
    when the benchmark is too large to broadcast-score brute-force, IVF
    cells trained ON THE BENCHMARK prune the pair space to ~nprobe/nlist
    of the cross product before the exact cosine + per-id argmax. A
    LARGER benchmark slice than the brute query (vec_id < 200 vs < 20)
    exercises the regime the path exists for. Rows-only by design (cell
    assignment is iterative k-means); recall 1.0 at the planted-twin
    operating point and the pruning bound are unit-tested
    (tests/test_decontam.py)."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.decontam import (
        semantic_contamination_pruned,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") < 200)
    corpus = emb.filter(F.col("vec_id") >= 200)
    return semantic_contamination_pruned(
        corpus, bench, threshold=0.4, nlist=16, nprobe=4
    )


def _q_media_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-file ingestion loop (S-EXT): generated real PNGs are LANDED
    as one file per object executor-side (multimodal/ops.land_media_files)
    then scanned back with Spark's built-in ``binaryFile`` source
    (sources/files.read_binary_files, pathGlobFilter pushed into listing)
    — the native shape for a 100 TB image corpus laid out object-per-file.
    media_id parses from the file name, media_type sniffs real magic
    bytes JVM-side, n_bytes is the source's ``length`` metadata column.
    Oracle: stored-deflate PNG size is exact arithmetic (49*h + 68 at
    width 16, h = 8 + doc_id % 9 — the media_metadata precedent)."""
    from azure_etl_databricks_sql_powerbi_spark.multimodal import ops
    from azure_etl_databricks_sql_powerbi_spark.sources.files import read_binary_files

    docs = load_table(spark, sf_dir, "documents")
    media = ops.attach_generated_png(
        docs, width=16, height=8, vary_height_mod=9, compress_level=0
    )
    tmp = _scratch_dir("binfile_")
    ops.land_media_files(media, tmp)
    bf = read_binary_files(spark, tmp, glob="*.png")
    return bf.select(
        F.regexp_extract("path", r"(\d+)\.png$", 1).cast("bigint").alias("media_id"),
        ops.sniff_media_type("content").alias("media_type"),
        F.col("length").alias("n_bytes"),
    )


def _q_ngrams_udtf_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (SURVEY §2.10, functions/udtfs.py): corpus
    top-20 word trigrams computed through a registered UDTF in a SQL
    LATERAL join — the Spark 3.5+/4.x table-function extension point.
    The built-in explode plan remains the documented fast path (UDTF ≡
    built-in pinned in tests/test_udtfs.py); this query exists to keep
    the UDTF registration + lateral-join path driver-verified. Oracle:
    DuckDB position self-join trigrams."""
    from azure_etl_databricks_sql_powerbi_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__udtf_corpus")
    return spark.sql("""
        SELECT t.ngram, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM __udtf_corpus d, LATERAL ngrams(d.text, 3) t
        GROUP BY t.ngram
        ORDER BY n_occurrences DESC, t.ngram ASC
        LIMIT 20
    """)


def _q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY GROUPING SETS via spark.sql (A5 completes rollup/cube):
    per-(status,priority), per-status, and grand total in one pass."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*)                    AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                           AS total_price
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """)


def _q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped star query: top-10 unshipped-revenue orders for one
    segment — broadcast dim filter + fact join + TakeOrderedAndProject."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1996-03-15").cast("timestamp")
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(disc_price()), 2).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )



def _q_brand_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped star query over the two previously-uncovered dims:
    revenue/quantity by part brand x supplier nation (part + supplier are
    broadcast — the lineitem fact never shuffles before the aggregate)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("p_brand", "n_name")
        .agg(
            # money product accumulates in DECIMAL, exact-rounds, then
            # casts to double (the decimal_star_rollup contract): the
            # double-sum ROUND diverged by a half-cent at sf1 (r11 sweep)
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (
                        F.lit(1).cast("decimal(18,2)")
                        - F.col("l_discount").cast("decimal(18,2)")
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )



def _plant_near_dups(emb: DataFrame, every: int = 10, jitter: float = 0.18) -> DataFrame:
    """Append a deterministic near-duplicate copy of every ``every``-th
    vector, entirely in-plan: copy vec_id = original + 1_000_000, each
    component scaled by ``1 + jitter*sin(31*vec_id + 7*i)`` (a fixed
    pseudo-random perturbation — no RNG, reproducible across runs/sf).
    With jitter 0.18 the copy's cosine to its original is ~0.99, far above
    a realistic 0.92 near-dup threshold, while the untouched corpus stays
    near-orthogonal (max pairwise cosine ~0.6) — so dedup/LSH contract
    queries get a real operating point where buckets/cells actually prune."""
    src = emb.filter((F.col("vec_id") % every) == 0)
    copies = src.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x * (1.0 + jitter * F.sin(F.col("vec_id") * 31 + i * 7))
            ).cast("float"),
        ).alias("embedding"),
        F.col("label"),
    )
    return emb.unionByName(copies)


def _parquet_num_rows(sf_dir: str, table: str) -> int:
    """Driver-side parquet-footer row count (zero Spark jobs) — sizes
    auto_srp_params without a counting action that would re-execute the
    planting pipeline and corpus scan on every invocation (r10 ADVICE).
    Handles both single-file and directory parquet layouts."""
    import glob as _glob
    import os

    import pyarrow.parquet as _pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    files = (
        [path]
        if os.path.isfile(path)
        else _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    if not files:
        # a silent 0 would size LSH params from an empty corpus — fail loud
        raise FileNotFoundError(f"no parquet files under {path}")
    return sum(_pq.ParquetFile(f).metadata.num_rows for f in files)


def _q_embedding_near_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup pairs at the operator's REAL design
    point: deterministic planted near-dups (see _plant_near_dups; cosine
    ~0.99 to their originals) over the otherwise near-orthogonal corpus,
    threshold 0.92. SRP width/tables AUTO-SIZE from the corpus
    (lsh.auto_srp_params, the auto_nlist discipline): bits ~
    log2(N/target_bucket) keep bucket population — and so in-bucket
    quadratic candidate work — constant as data grows (the fixed 8x8
    config this replaced measured 6.4x wall at 10x data, BENCH_SF1), and
    the table count is the smallest whose analytic >=1-of-T recall at the
    planted cosine 0.99 clears 0.99999 (expected_collision_prob). The
    1e-5 bound is PER PAIR: at the driver scales (tens-to-thousands of
    planted pairs, where recall is unit-tested) a miss is vanishingly
    unlikely, but a corpus with millions of true pairs should raise
    target_recall to keep the expected miss count << 1. Rows-only —
    emitted pairs are exact-verified so precision is 1.0 by
    construction."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.lsh import (
        auto_srp_params,
        lsh_near_pairs,
    )

    emb = _plant_near_dups(load_table(spark, sf_dir, "embeddings"))
    # N from parquet footers + the planting arithmetic (every 10th vec_id
    # gets a copy): no Spark action, so the planting pipeline runs once.
    base_n = _parquet_num_rows(sf_dir, "embeddings")
    n_bits, n_tables = auto_srp_params(
        base_n + (base_n + 9) // 10, sim=0.99, target_recall=0.99999, target_bucket=16
    )
    return lsh_near_pairs(emb, threshold=0.92, n_bits=n_bits, n_tables=n_tables)


def _q_curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline: lang filter -> quality gate -> exact
    content dedup -> per-doc stats, as ONE declarative plan."""
    from azure_etl_databricks_sql_powerbi_spark.plans.curation import curate_documents

    return curate_documents(load_table(spark, sf_dir, "documents"))



def _q_scd2_customer_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history built from order-status snapshots: one
    validity interval per run of equal status per customer (window
    run-length compression + lead(); operators/scd2.py)."""
    from azure_etl_databricks_sql_powerbi_spark.operators.scd2 import scd2_from_snapshots

    orders = load_table(spark, sf_dir, "orders")
    versions = latest_per_key(
        orders, keys=["o_custkey", "o_orderdate"], order_by=["o_orderkey"], tiebreak=[]
    ).select("o_custkey", "o_orderdate", "o_orderstatus")
    return scd2_from_snapshots(
        versions, keys=["o_custkey"], tracked=["o_orderstatus"], ts_col="o_orderdate"
    )


def _q_dbt_qc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt generic-test quartet in ONE single-pass QC report
    (operators/qc: unique_key + non_null + accepted_values; the fourth —
    relationships — is referential_integrity_qc): measured values for
    every check off one aggregate over orders, zero extra scans. The
    deliberately-impossible status domain makes accepted_values a
    NON-vacuous count (real violations > 0 at every sf), so the oracle
    verifies the measurement, not just a zero."""
    from azure_etl_databricks_sql_powerbi_spark.operators.qc import (
        check_accepted_values,
        check_non_null,
        check_unique_key,
    )

    orders = load_table(spark, sf_dir, "orders")
    uniq = check_unique_key("o_orderkey")
    nn = check_non_null("o_custkey")
    acc = check_accepted_values("o_orderstatus", ["O", "F"])  # 'P' counts
    row = orders.agg(
        uniq.agg.cast("double").alias("dup_orderkeys"),
        nn.agg.cast("double").alias("null_custkey_rate"),
        acc.agg.cast("double").alias("bad_status_rows"),
    )
    return row.select(
        "dup_orderkeys",
        "null_custkey_rate",
        "bad_status_rows",
        (
            (F.col("dup_orderkeys") <= uniq.threshold)
            & (F.col("null_custkey_rate") <= nn.threshold)
            & (F.col("bad_status_rows") <= acc.threshold)
        )
        .cast("int")
        .alias("all_passed"),
    )


def _q_referential_integrity_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key integrity QC (operators/qc.referential_orphan_counts):
    orphan counts across the star's three FK edges in one result row —
    each edge a LEFT ANTI hash join reduced to a scalar (the dbt
    'relationships' test engine-side). NULL FKs count as orphans on both
    sides (anti-join no-match ≡ NOT EXISTS true)."""
    from azure_etl_databricks_sql_powerbi_spark.operators.qc import (
        referential_orphan_counts,
    )

    return referential_orphan_counts(
        [
            (
                "lineitem_orders",
                load_table(spark, sf_dir, "lineitem"),
                "l_orderkey",
                load_table(spark, sf_dir, "orders"),
                "o_orderkey",
            ),
            (
                "orders_customer",
                load_table(spark, sf_dir, "orders"),
                "o_custkey",
                load_table(spark, sf_dir, "customer"),
                "c_custkey",
            ),
            (
                "customer_nation",
                load_table(spark, sf_dir, "customer"),
                "c_nationkey",
                load_table(spark, sf_dir, "nation"),
                "n_nationkey",
            ),
        ]
    )


def _q_orders_pit_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (operators/scd2.pit_join) — the consumption
    side of SCD2: each order row picks up the status version that was
    valid AT its order date (valid_from <= d < valid_to, open current
    version matches forward). Equi hash join on the business key with
    the interval as residual condition — per-key fan-out is versions-
    per-key (change frequency), so it scales like any keyed fact-dim
    join; hash-exact vs the same history CTE + BETWEEN join in DuckDB."""
    from azure_etl_databricks_sql_powerbi_spark.operators.scd2 import (
        pit_join,
        scd2_from_snapshots,
    )

    orders = load_table(spark, sf_dir, "orders")
    versions = latest_per_key(
        orders, keys=["o_custkey", "o_orderdate"], order_by=["o_orderkey"], tiebreak=[]
    ).select("o_custkey", "o_orderdate", "o_orderstatus")
    dim = scd2_from_snapshots(
        versions, keys=["o_custkey"], tracked=["o_orderstatus"], ts_col="o_orderdate"
    )
    fact = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    return (
        pit_join(fact, dim, keys=["o_custkey"], fact_ts="o_orderdate")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.col("o_orderstatus").alias("status_at_order"),
        )
        .orderBy("o_orderkey")
    )


def _q_normalize_text_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode/text canonicalization (functions/normalize; ROTATION_
    POLICY.md §5 swap #7): deterministic mojibake planting — decomposed
    NFC targets, BOM/zero-width invisibles, CRLF/CR, C0+C1 controls,
    NBSP runs, trailing spaces, blank runs, preserved indent — via ONE
    dual-dialect _NORM_PLANT_SQL string (raw non-ASCII code points parse
    identically in Spark SQL and DuckDB literals, verified; chr(n) is
    dual-dialect only for n<=255 — Spark's chr is mod-256), then
    canonicalize_documents: clean (JVM regex chain) + NFC (Arrow
    pandas_udf, single evaluation, plan-pinned) with norm_changed /
    norm_len_delta audits. Hash-exact INCLUDING the canonicalized text
    itself (the pii_scrub_docs precedent) vs the oracle generated from
    the module's own duckdb_canonicalize_sql builder — which pits Python
    unicodedata against DuckDB's native utf8proc nfc_normalize;
    hand-written fixture expectations live in tests/test_normalize.py
    (the generated-twin mitigation norm)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.normalize import (
        canonicalize_documents,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_NORM_PLANT_SQL).alias("text")
    )
    return canonicalize_documents(docs, "text")


def _q_customer_cohorts_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (U-EXT): INTERSECT (retained customers, ordered in
    both 2000 and 2001) and EXCEPT (churned, 2000 only), union-tagged."""
    orders = load_table(spark, sf_dir, "orders")
    y2000 = (
        orders.filter(F.year("o_orderdate") == 2000).select("o_custkey").distinct()
    )
    y2001 = (
        orders.filter(F.year("o_orderdate") == 2001).select("o_custkey").distinct()
    )
    retained = y2000.intersect(y2001).withColumn("cohort", F.lit("retained"))
    churned = y2000.subtract(y2001).withColumn("cohort", F.lit("churned"))
    return retained.unionByName(churned)


def _q_unpivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT then UNPIVOT/melt round trip (BI surface): wide revenue per
    priority x status back to long form."""
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(money_sum("o_totalprice"))
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["F", "O", "P"],
        variableColumnName="o_orderstatus",
        valueColumnName="revenue",
    )


def _q_order_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by aggregates (A5): price of each customer's first and
    latest order — deterministic because o_orderkey is unique."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_totalprice", "o_orderkey").alias("latest_order_price"),
        F.min_by("o_totalprice", "o_orderkey").alias("first_order_price"),
        F.max("o_orderkey").alias("max_orderkey"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def _q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (A5): count_if / filtered sums per status
    (the FILTER-clause idiom, JVM-side CASE expressions)."""
    orders = load_table(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 150000
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(big).alias("n_big"),
        money_sum(F.when(big, F.col("o_totalprice"))).alias("big_rev"),
        (F.sum(big.cast("int")).cast("double") / F.count(F.lit(1))).alias(
            "big_share"
        ),
    )


def _q_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped LEFT SEMI join (EXISTS): count orders per priority
    that have at least one line item shipped after the order date. The
    semi join never materializes lineitem columns — Catalyst keeps only
    the key probe, so the fact side shuffles just l_orderkey."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    late = lineitem.filter(F.col("l_shipdate") > F.lit("2000-06-01").cast("timestamp"))
    return (
        orders.join(late, orders["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def _q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped LEFT OUTER join + double aggregate + global NTILE:
    distribution of customers by order count AND revenue quartile,
    INCLUDING zero-order customers (the outer join's null branch — an
    inner join would silently drop them; their NULL revenue coalesces to
    0 for the quartile sort). The quartile column set was merged from the
    retired `customer_revenue_quartiles` (ROTATION_POLICY.md §5 swap #11,
    the §4 re-rank's second fold): the NTILE window runs on the SAME
    per-customer aggregate this query already builds — |customers| rows,
    never the fact — ordered by (exact DECIMAL revenue desc, c_custkey
    asc), a total order, so the bucket assignment is deterministic in
    both engines."""
    from azure_etl_databricks_sql_powerbi_spark.operators.windows import ntile_bucket

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders, customer["c_custkey"] == orders["o_custkey"], "left_outer"
        )
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("c_count"),
            money_sum("o_totalprice").alias("revenue"),
        )
    )
    bucketed = ntile_bucket(
        per_cust,
        order_by=[
            F.coalesce(F.col("revenue"), F.lit(0.0)).desc(),
            F.col("c_custkey").asc(),
        ],
        n=4,
        bucket_col="quartile",
    )
    return (
        bucketed.groupBy("c_count", "quartile")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(
            F.col("n_customers").desc(),
            F.col("c_count").desc(),
            F.col("quartile").asc(),
        )
    )


def _q_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped LEFT ANTI join + scalar subquery: customers with no
    2001 orders whose balance exceeds the positive-balance average, grouped
    by nation. The scalar average is a one-row broadcast; the anti join is
    the U2 'NOT EXISTS' branch of the MERGE rewrite as a standalone op."""
    customer = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 2001
    )
    # threshold must be the EXACT mean: a raw double AVG differs between
    # engines in its last bits (order-dependent sum) and can flip the
    # strict inequality for a boundary customer (r12 money sweep)
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        exact_avg("c_acctbal").alias("avg_bal")
    )
    return (
        customer.join(
            recent, customer["c_custkey"] == recent["o_custkey"], "left_anti"
        )
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            money_sum("c_acctbal").alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


def _q_dataset_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/val/test split (north-star
    curation op): md5-bucket assignment is a map-side expression — zero
    shuffle, reproducible across engines/re-runs (operators/sampling.py).
    Carries the corpus data card PER SPLIT (§5 swap #13 fold: the
    retired one-row corpus_stats query's column set — source/lang
    cardinalities, char inventory, exact-dup count/rate — rides this
    summary; the split hashes on text, so identical texts land in ONE
    split and the per-split dup counts partition the global count
    exactly. plans/curation.corpus_stats and its twin remain,
    tests/test_mixing_stats.py)."""
    from azure_etl_databricks_sql_powerbi_spark.functions import text as T
    from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (
        deterministic_split,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    split = deterministic_split(
        docs, on="text", weights={"train": 0.9, "val": 0.05, "test": 0.05}
    )
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(T.token_count("text")).alias("total_tokens"),
            F.count_distinct("source").alias("n_sources"),
            F.count_distinct("lang").alias("n_langs"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
            (F.count(F.lit(1)) - F.count_distinct("text")).alias(
                "exact_dup_docs"
            ),
        )
        .withColumn(
            "dup_rate", F.col("exact_dup_docs") / F.col("n_docs")
        )
        .orderBy("split")
    )


def _q_stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified quota sample: 20 docs per language, chosen by hash order
    (deterministic domain-mixing quota; operators/sampling.py)."""
    from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (
        quota_sample_per_group,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return quota_sample_per_group(docs, group_by=["lang"], n=20, on="doc_id")


def _q_pack_sequences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chop sequence packing into 2048-token bins (LLM
    pretraining layout), SHARDED: docs are hash-assigned to 16 shards and
    each shard packs independently (window cumsum partitioned by shard).
    The shard count bounds every window partition, so the plan is a normal
    hash-partitioned exchange — no single-partition global stream — and
    scales linearly with shards; the global variant stays available in
    operators/sampling.py (unit-tested) for bounded corpora."""
    from azure_etl_databricks_sql_powerbi_spark.functions import text as T
    from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (
        hash_bucket,
        pack_sequences,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        hash_bucket("doc_id", 16).alias("shard"),
    )
    return pack_sequences(
        docs, "n_tokens", 2048, order_by=["doc_id"], group_by=["shard"]
    )


def _q_skewed_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberately-skewed fact⋈dim join (90% of orders on ONE hot key)
    through operators/skew.salted_join: the big side is salted into 8
    sub-keys and the dim replicated 8x, so the hot key spreads over 8
    tasks instead of stalling one straggler. The dim carries a merge-join
    hint to simulate a dimension beyond the broadcast threshold — the only
    regime where skew matters (a broadcast join never shuffles the fact).
    Salting is physically transparent (row-identical to the plain join),
    so this IS oracle-checkable. Plan shape asserted in
    tests/test_plan_shapes.py::test_salted_join_shape."""
    from azure_etl_databricks_sql_powerbi_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    big = orders.select(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10 < 9, F.lit(0))
        .otherwise(F.col("o_custkey") % 24 + 1)
        .alias("hot_key"),
    )
    dim = (
        load_table(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").alias("hot_key"), "n_name")
        .hint("merge")
    )
    joined = salted_join(big, dim, keys=["hot_key"], n_salts=8, salt_on="o_totalprice")
    return (
        joined.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # money sum accumulates in DECIMAL and casts the exact result
            # to double (the decimal_star_rollup discipline): a double-sum
            # ROUND diverged from DuckDB by a half-cent at sf1 (r11 sweep)
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("n_name")
    )


def _q_stream_upsert_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2 end-to-end under Structured Streaming, HASH-EXACT since r15
    (promoted from rows-only — the §4 tail rule executed in place, no slot
    needed): the final MERGE target is deterministic because the doubled
    copies are byte-identical, the 30-day dedup delay exceeds the data
    span, and the upsert is pass-through per unique event_id — so the
    drained state ≡ ``SELECT event_id, user_id, value FROM events`` and
    the driver now checks the streaming side effect cell-for-cell.
    Batch≡stream equivalence is additionally proven in
    tests/test_streaming.py::test_stream_upsert_replay_equals_batch:
    events re-landed as arrival files, streamed with a DOUBLED source
    (re-extract duplicates), deduped with bounded state
    (dropDuplicatesWithinWatermark), and MERGEd into a parquet target via
    foreachBatch — the reference's overlap-window + dedup + MERGE daily
    cycle (rest_api.py:70-72, run_transform.py:49-50, run_load.py:82-90)
    as one continuous pipeline. Returns the final target keyed rows."""
    from azure_etl_databricks_sql_powerbi_spark.streaming import structured

    tmp = _scratch_dir("st2_replay_")
    src_dir, target, ck = f"{tmp}/in", f"{tmp}/target", f"{tmp}/ck"
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    events.write.parquet(src_dir)
    stream = structured.stream_files(
        spark, src_dir, "event_id bigint, ts timestamp, user_id bigint, value double"
    )
    doubled = stream.union(stream)  # simulate overlap re-extract duplicates
    deduped = structured.dedup_within_watermark(doubled, ["event_id"], delay="30 days")
    structured.run_foreach_batch_upsert(
        deduped.drop("ts"),
        target,
        keys=["event_id"],
        checkpoint=ck,
        shuffle_partitions=8,
    )
    return spark.read.parquet(target)


def _q_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 stateful operator under a real streaming drain, with a SQL
    oracle: events re-landed as arrival files, streamed through
    ``applyInPandasWithState`` running per-key (count, sum) state
    (streaming/stateful.py), drained with availableNow into a memory
    sink. The LAST update emitted per key is the final state, which by
    construction equals the batch ``GROUP BY user_id`` — so this custom
    stateful operator gets a driver-checked green row, not rows-only.
    Eviction/bounded-state semantics are covered by the sessionize
    operator's test (test_streaming.py::test_sessionize_bounded_state)."""
    import os

    from azure_etl_databricks_sql_powerbi_spark.streaming import structured
    from azure_etl_databricks_sql_powerbi_spark.streaming.stateful import running_totals

    tmp = _scratch_dir("st4_totals_")
    src_dir, ck = f"{tmp}/in", f"{tmp}/ck"
    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    # several input files -> several micro-batches -> state actually folds
    events.repartition(4).write.parquet(src_dir)
    stream = structured.stream_files(
        spark,
        src_dir,
        "event_id bigint, ts timestamp, user_id bigint, value double",
        max_files_per_trigger=2,
    )
    table = os.path.basename(tmp)  # unique per run: memory sink names collide
    structured.run_to_memory(
        running_totals(stream),
        table,
        output_mode="update",
        checkpoint=ck,
        shuffle_partitions=8,
    )
    return (
        spark.table(table)
        .groupBy("user_id")
        .agg(F.max_by(F.struct("n_events", "total_value"), "n_events").alias("s"))
        .select("user_id", "s.n_events", "s.total_value")
    )


def _q_sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 event-time sessionizer under a real streaming drain (rows-only:
    closed-session emission has no SQL oracle; exact batch≡stream equality
    AND the bounded-state eviction accounting are asserted in
    tests/test_streaming.py::test_sessionize_bounded_state): events are
    re-landed as arrival files, streamed through the custom
    ``applyInPandasWithState`` sessionizer (streaming/stateful.py,
    2-hour gap, 1-minute watermark) and drained with availableNow into a
    memory sink. Emits one row per CLOSED session — the same gap-split
    semantics as the batch ``events_sessions_2h`` query; sessions still
    open at the final watermark stay in state by design, so the row count
    is slightly below the batch session count."""
    import os

    from azure_etl_databricks_sql_powerbi_spark.streaming import structured
    from azure_etl_databricks_sql_powerbi_spark.streaming.stateful import sessionize

    tmp = _scratch_dir("st4_sessions_")
    src_dir, ck = f"{tmp}/in", f"{tmp}/ck"
    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    # several input files -> several micro-batches -> watermark advances
    # between triggers and event-time timeouts actually fire
    events.repartition(4).write.parquet(src_dir)
    stream = structured.stream_files(
        spark,
        src_dir,
        "event_id bigint, ts timestamp, user_id bigint",
        max_files_per_trigger=2,
    )
    table = os.path.basename(tmp)  # unique per run: memory sink names collide
    structured.run_to_memory(
        sessionize(
            structured.with_watermark(stream, delay="1 minute"), gap_minutes=120
        ),
        table,
        output_mode="append",
        checkpoint=ck,
        shuffle_partitions=8,
    )
    return spark.table(table).select(
        "user_id", "session_start", "session_end", "n_events"
    )


def _q_interval_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream watermarked interval join under a real streaming
    drain (streaming/structured.stream_stream_interval_join, unit-only
    since r3 — VERDICT-r5 item 8): events re-landed as arrival files,
    views and clicks streamed as two sources, clicks attributed to views
    on the same user within 1 hour, drained availableNow into a memory
    sink. The inner interval join emits rows when both sides match and
    the bounded condition lets Spark GC buffered state past the
    watermark; a full single-drain emits exactly the batch join's rows
    (tests/test_streaming.py::test_stream_stream_interval_join_equals_batch),
    so unlike sessionize this streaming query gets a FULL SQL oracle."""
    import os

    from azure_etl_databricks_sql_powerbi_spark.streaming import structured

    tmp = _scratch_dir("ssj_contract_")
    src_dir, ck = f"{tmp}/in", f"{tmp}/ck"
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    events.write.parquet(src_dir)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    views = structured.stream_files(spark, src_dir, schema).where(
        F.col("event_type") == "view"
    ).select("user_id", "ts", "event_id")
    clicks = structured.stream_files(spark, src_dir, schema).where(
        F.col("event_type") == "click"
    ).select("user_id", "ts", "event_id")
    joined = structured.stream_stream_interval_join(
        views, clicks, key="user_id", left_ts="ts", right_ts="ts",
        within="1 hour", watermark="2 hours",
    )
    table = os.path.basename(tmp)  # unique per run: memory sink names collide
    structured.run_to_memory(joined, table, checkpoint=ck, shuffle_partitions=8)
    return (
        spark.table(table)
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("r_event_id").alias("click_id"),
        )
        .orderBy("user_id", "view_id", "click_id")
    )


def _q_resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill + forward fill over the event stream
    (operators/timeseries.resample_daily_ffill): the spine-side global
    window is bounded by calendar cardinality, never fact rows."""
    from azure_etl_databricks_sql_powerbi_spark.operators.timeseries import (
        resample_daily_ffill,
    )

    return resample_daily_ffill(load_table(spark, sf_dir, "events"))


def _q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count via first-seen collapse
    (operators/timeseries.cumulative_distinct_users) — linear state, no
    distinct-over-expanding-window."""
    from azure_etl_databricks_sql_powerbi_spark.operators.timeseries import (
        cumulative_distinct_users,
    )

    return cumulative_distinct_users(load_table(spark, sf_dir, "events"))


def _q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle
    (operators/timeseries.cohort_retention)."""
    from azure_etl_databricks_sql_powerbi_spark.operators.timeseries import (
        cohort_retention,
    )

    return cohort_retention(load_table(spark, sf_dir, "events"))


def _q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered view->click->purchase funnel
    (operators/timeseries.funnel_conversion)."""
    from azure_etl_databricks_sql_powerbi_spark.operators.timeseries import (
        funnel_conversion,
    )

    return funnel_conversion(load_table(spark, sf_dir, "events"))


def _q_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-5 salient terms by tf/df (log-free tf-idf ranking: the
    per-doc ORDER of tf*N/df equals tf/df, and avoiding ln() keeps the
    score bit-identical across engines for the oracle hash). Ranking uses
    the UNROUNDED score (IEEE division agrees across engines) with a token
    tiebreak; rounding happens only in the projection."""
    from pyspark.sql import Window

    from azure_etl_databricks_sql_powerbi_spark.functions.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "token").withColumn("raw", F.col("tf") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(F.col("raw").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("doc_id", "token", "tf", "df", F.col("raw").alias("score"), "rank")
    )


def _q_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (dedup/decontam.contamination_scores):
    score every non-benchmark doc by 3-gram overlap with the 'src0'
    benchmark slice; the contamination ratio is the RAW matched/total
    division (bit-identical IEEE in Spark and DuckDB — no round, no libm)."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.decontam import (
        contamination_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return contamination_scores(train, bench, n=3, threshold=0.8)


_DEDUP_STATE_CACHE: dict[str, str] = {}


def _q_novel_docs_day2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-2 incremental dedup against PERSISTED corpus state
    (dedup/incremental.save_corpus_state / load_corpus_state /
    novel_documents_against_state): the corpus (doc_id % 5 != 0) is
    fingerprinted + bloom'd ONCE into a state directory (cached per
    sf_dir, like a daily job reusing yesterday's state), then the day-2
    batch (doc_id % 3 == 0 — a different overlap slice than day 1's
    evens) is deduped against the loaded state WITHOUT any corpus scan:
    the batch-2 job's plan reads only the 16-byte fingerprint parquet
    (asserted in tests/test_incremental_dedup.py::
    test_day2_plan_never_rescans_corpus). Semantics stay EXACT
    NOT-EXISTS — the retired one-shot's oracle shape (its twin lives at
    tests/test_incremental_dedup.py::NOVEL_DOCS_SQL since r13) — and
    the state's single bloom broadcast is reused across calls (the
    ADVICE-r5 broadcast-leak fix)."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.incremental import (
        load_corpus_state,
        novel_documents_against_state,
        save_corpus_state,
    )

    docs = load_table(spark, sf_dir, "documents")
    if sf_dir not in _DEDUP_STATE_CACHE:
        state_dir = _scratch_dir("dedup_state_")
        save_corpus_state(
            docs.filter(F.col("doc_id") % 5 != 0), state_dir, fpp=0.01
        )
        _DEDUP_STATE_CACHE[sf_dir] = state_dir
    state = load_corpus_state(spark, _DEDUP_STATE_CACHE[sf_dir])
    batch2 = docs.filter(F.col("doc_id") % 3 == 0)
    return novel_documents_against_state(batch2, state)


_KPI_STATE_CACHE: dict[str, str] = {}
_DISTINCT_STATE_CACHE: dict[str, str] = {}


def _q_incremental_kpis_day2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained KPI rollup from PERSISTED aggregate
    state (operators/incremental.{aggregate_state,merge_aggregate_states,
    finalize_state}): history (o_orderdate < 1997-01-01) is rolled up
    ONCE into per-(status, priority) algebraic partials and parquet'd
    (cached per sf_dir like a nightly job's state table); the day-2
    refresh aggregates only the new batch (>= 1997-01-01 — Catalyst
    pushes the date filter to the scan) and MERGES it with the loaded
    state. History is never re-scanned — the OLAP companion to
    novel_docs_day2. Money sums accumulate in decimal(18,2); avg is one
    IEEE division of the exact sum — hash-exact vs a full recompute in
    DuckDB (the oracle proves merge ≡ recompute)."""
    from azure_etl_databricks_sql_powerbi_spark.operators.incremental import (
        aggregate_state,
        finalize_state,
        merge_aggregate_states,
    )

    keys = ["o_orderstatus", "o_orderpriority"]
    measures = {"price": F.col("o_totalprice").cast("decimal(18,2)")}
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("timestamp")
    if sf_dir not in _KPI_STATE_CACHE:
        state_dir = _scratch_dir("kpi_state_")
        aggregate_state(
            orders.filter(F.col("o_orderdate") < cut), keys, measures
        ).write.mode("overwrite").parquet(state_dir)
        _KPI_STATE_CACHE[sf_dir] = state_dir
    history_state = spark.read.parquet(_KPI_STATE_CACHE[sf_dir])
    batch_state = aggregate_state(
        orders.filter(F.col("o_orderdate") >= cut), keys, measures
    )
    merged = merge_aggregate_states([history_state, batch_state], keys, ["price"])
    return (
        finalize_state(merged, ["price"])
        .select(
            *keys,
            F.col("n_rows").alias("n_orders"),
            F.col("price_sum").cast("double").alias("price_sum"),
            F.col("price_min").cast("double").alias("price_min"),
            F.col("price_max").cast("double").alias("price_max"),
            F.col("price_avg"),
        )
        .orderBy(*keys)
    )


def _q_incremental_distinct_day2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable DISTINCT-count state (operators/incremental.
    {distinct_state,merge_distinct_states,finalize_distinct}) — the
    COUNT DISTINCT companion to incremental_kpis_day2, which algebraic
    partials cannot express: per-status customer reach tracked as
    persisted HLL sketches (Apache DataSketches via hll_sketch_agg),
    history sketched ONCE to parquet, day-2 batch sketched and UNIONED
    losslessly. Rows-only by design (HLL estimate has no SQL oracle);
    units pin merge-of-parts ≡ whole-corpus exactly, <5% error vs true
    distinct, and KB-bounded state rows."""
    from azure_etl_databricks_sql_powerbi_spark.operators.incremental import (
        distinct_state,
        finalize_distinct,
        merge_distinct_states,
    )

    keys = ["o_orderstatus"]
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("timestamp")
    if sf_dir not in _DISTINCT_STATE_CACHE:
        state_dir = _scratch_dir("hll_state_")
        distinct_state(
            orders.filter(F.col("o_orderdate") < cut), keys, ["o_custkey"]
        ).write.mode("overwrite").parquet(state_dir)
        _DISTINCT_STATE_CACHE[sf_dir] = state_dir
    history = spark.read.parquet(_DISTINCT_STATE_CACHE[sf_dir])
    batch = distinct_state(
        orders.filter(F.col("o_orderdate") >= cut), keys, ["o_custkey"]
    )
    merged = merge_distinct_states([history, batch], keys, ["o_custkey"])
    return (
        finalize_distinct(merged, ["o_custkey"])
        .select(
            *keys,
            F.col("n_rows").alias("n_orders"),
            F.col("o_custkey_distinct_est").alias("distinct_customers_est"),
        )
        .orderBy(*keys)
    )


def _q_gopher_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rule flags (functions/text.gopher_quality_flags):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    stopword presence, and the composite keep decision — all pure Column
    expressions over exact counts; ratios are raw IEEE divisions (never
    rounded) so the oracle replicates them bit-identically."""
    from azure_etl_databricks_sql_powerbi_spark.functions.text import (
        gopher_quality_flags,
    )

    docs = load_table(spark, sf_dir, "documents")
    flags = gopher_quality_flags("text", min_words=10, max_words=200)
    return docs.select(
        "doc_id", *[v.alias(k) for k, v in flags.items()]
    ).orderBy("doc_id")


def _q_unigram_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram quality (functions/text.unigram_logprob_scores):
    mean token log-probability under the corpus top-1000 unigram LM —
    the model-based companion to the rule-based Gopher gate. Per-token
    logprobs are quantized to integer micro-nats over the broadcast vocab
    so the per-doc aggregation is an exact integer SUM (no float
    accumulation-order divergence) and the score is one raw IEEE
    division — hash-exact vs the same vocab CTE in DuckDB."""
    from azure_etl_databricks_sql_powerbi_spark.functions.text import (
        unigram_logprob_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    return unigram_logprob_scores(docs, vocab_size=1000).orderBy("doc_id")


def _q_bigram_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM quality (functions/text.bigram_logprob_scores):
    mean token log-probability under a Jelinek-Mercer bigram model
    (0.7 * P(cur|prev) + 0.3 * P_uni(cur), top-4000 bigrams / top-1000
    unigrams, unigram first token, backoff + OOV floors) — the rung
    above the CCNet unigram score toward KenLM-style filtering: shuffled
    text with fluent unigrams drops to the backoff tier. Same
    hash-exactness contract: integer micro-nat quantization over the
    vocab relations, exact integer per-doc SUM, one raw IEEE division;
    the interpolation complement is the literal 0.3 on both sides (the
    computed 1-0.7 differs in IEEE and would hash-mismatch)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.text import (
        bigram_logprob_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    return bigram_logprob_scores(docs).orderBy("doc_id")


def _q_zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit (sources/layout): Morton-interleave the
    8-bit min-max ranks of (o_custkey, o_totalprice), split the curve
    into 32 contiguous file buckets (z_key >> 11), and report each
    bucket's bounding box in BOTH dimensions — the min/max file stats a
    100 TB scan would prune on. Tight boxes in all interleaved dims are
    the whole point of z-ordering vs single-column range layout. Pure
    shift/mask/sum Catalyst arithmetic, one bounded 1-row min/max agg
    broadcast back; hash-exact vs the same arithmetic in DuckDB."""
    from azure_etl_databricks_sql_powerbi_spark.sources.layout import zorder_key

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    keyed = zorder_key(orders, ["o_custkey", "o_totalprice"], bits=8)
    return (
        keyed.withColumn("z_bucket", F.shiftright(F.col("z_key"), 11))
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("o_custkey").cast("long").alias("custkey_lo"),
            F.max("o_custkey").cast("long").alias("custkey_hi"),
            F.min("o_totalprice").alias("price_lo"),
            F.max("o_totalprice").alias("price_hi"),
        )
        .orderBy("z_bucket")
    )


def _q_bpe_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BPE tokenization (functions/bpe): merge table learned
    driver-side from a bounded sample (Sennrich et al. 2016 — the
    train_centroids sample contract: Bernoulli + CollectLimit, one
    action), tokenization applied corpus-side through one Arrow
    pandas_udf with per-batch word memoization — zero shuffles, linear
    at any cluster width. Rows-only by design (greedy iterative merges
    are not SQL-expressible); the merge algorithm reproduces the
    paper's corpus in tests/test_ext.py and every doc roundtrips."""
    from azure_etl_databricks_sql_powerbi_spark.functions import text as T
    from azure_etl_databricks_sql_powerbi_spark.functions.bpe import (
        apply_bpe,
        train_bpe,
    )

    docs = load_table(spark, sf_dir, "documents")
    # 60 merges against the testdata's ~31-word Zipf vocab: the head
    # merges to whole-word tokens, the tail stays subword-split, so the
    # subwords_per_word feature is non-vacuous (>1 on tail-heavy docs)
    merges = train_bpe(docs, n_merges=60, sample_size=512)
    return (
        apply_bpe(spread(docs), merges)
        .select(
            "doc_id",
            F.size("bpe_tokens").cast("long").alias("n_bpe_tokens"),
            T.token_count("text").cast("long").alias("n_ws_tokens"),
            (
                F.size("bpe_tokens")
                / F.greatest(T.token_count("text"), F.lit(1)).cast("double")
            ).alias("subwords_per_word"),
        )
        .orderBy("doc_id")
    )


def _q_chunk_documents_rag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping token-window chunking
    (operators/chunking.chunk_documents): 8-token windows, 2-token
    overlap — explode(sequence) fan-out inside the scan stage, zero
    shuffles; chunk text via slice+array_join Catalyst expressions."""
    from azure_etl_databricks_sql_powerbi_spark.operators.chunking import (
        chunk_documents,
    )

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=8, overlap=2).orderBy(
        "doc_id", "chunk_idx"
    )


def _q_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters with EXACT final counts
    (sketches/cms.heavy_hitter_tokens): tokens occurring >= 1% of total
    occurrences. The CMS never underestimates, so its map-side prune
    keeps a superset of the true heavy hitters; the exact aggregate runs
    on candidates only and a final HAVING drops the eps-slack — identical
    semantics to the plain explode+groupBy+HAVING the oracle runs.
    The total count sizing the threshold is read off the sketch itself
    (every CMS row sums to exactly N increments) — no extra pass."""
    from azure_etl_databricks_sql_powerbi_spark.sketches.cms import (
        heavy_hitter_tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    return heavy_hitter_tokens(docs, min_share_denom=100, eps=0.001)


def _q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped correlated-min (plans/gold.min_cost_supplier)."""
    return gold.min_cost_supplier(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
    )


def _q_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shaped scalar-subquery threshold (plans/gold.important_suppliers)."""
    return gold.important_suppliers(load_table(spark, sf_dir, "lineitem"))


def _q_top_quarter_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shaped view + global-max join (plans/gold.top_quarter_shippers)."""
    return gold.top_quarter_shippers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
    )


def _q_part_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped NOT-IN + count-distinct (plans/gold.part_supplier_breadth)."""
    return gold.part_supplier_breadth(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
    )


def _q_pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub with deterministic planted identifiers (functions/pii.
    scrub_documents): every 7th document gets an email + IPv4 appended
    in-plan (the _plant_near_dups discipline — reproducible across
    runs/sf, no RNG), then the one-pass scrub-and-audit runs: per-doc
    match counts BEFORE redaction, text redacted by the chained
    regexp_replace codegen stage. Hash-exact: every pattern is
    Java-regex ≡ RE2 (no lookaround/backrefs, parity pinned by
    tests/test_pii.py), so counts AND redacted text compare
    cell-for-cell against the DuckDB twin. Declared r11 via
    ROTATION_POLICY.md §5 swap #3 (retired dominant_shippers, a §4.4
    near-duplicate star shape of top_quarter_shippers; its twin lives
    on in tests/test_gold_twins.py)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.pii import scrub_documents

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com from 10.0.0."),
                (F.col("doc_id") % 256).cast("string"),
            ),
        ).otherwise(F.col("text")),
    )
    return (
        scrub_documents(planted)
        .select("doc_id", "pii_total", F.col("text").alias("clean_text"))
        .orderBy("doc_id")
    )


def _q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source capped token allocation (operators/mixing)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.text import token_count
    from azure_etl_databricks_sql_powerbi_spark.operators.mixing import (
        domain_mix_allocation,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "toks", token_count("text")
    )
    return domain_mix_allocation(docs, "source", "toks", cap_frac=0.08)


def _q_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped bilateral trade volume (plans/gold.trade_volume)."""
    return gold.trade_volume(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        "NATION_1",
        "NATION_2",
    )


def _q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shaped market share of NATION_3 in PROMO parts sold to EUROPE
    customers (plans/gold.market_share)."""
    return gold.market_share(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "part"),
        "NATION_3",
        "PROMO",
        "EUROPE",
    )


def _q_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped heavy-order customers (plans/gold.large_quantity_orders)."""
    return gold.large_quantity_orders(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        min_total_qty=300.0,
    )


def _q_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped OR-of-ANDs bracket revenue (plans/gold.bracket_revenue)."""
    return gold.bracket_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def _q_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped semi+anti supplier ranking (plans/gold.sole_return_supplier)."""
    return gold.sole_return_supplier(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "supplier")
    )


def _q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS (not just pairs): rare-shingle candidate edges ->
    distributed connected components (alternating large-star/small-star,
    O(log n) rounds of groupBy+join over 8-byte pairs) -> keep-one-per-
    cluster verdict for every doc. Oracle: the same edges + a recursive
    CTE computing min-label reachability in DuckDB — the iterative Spark
    algorithm is checked against a declarative transitive closure. (Spark
    joins on xxhash64(shingle) so shuffles never carry text; the oracle
    joins on the shingle string — identical modulo a ~2^-64 hash-collision
    probability.)"""
    from azure_etl_databricks_sql_powerbi_spark.dedup.cluster import (
        assign_clusters,
        shingle_edges,
    )

    docs = load_table(spark, sf_dir, "documents")
    edges = shingle_edges(docs, n=5, min_df=2, max_df=10)
    return assign_clusters(docs.select("doc_id"), edges).select(
        "doc_id", "cluster_id", "keep"
    )


def _q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split
    (operators/sampling.leakage_safe_split): split assigned by the
    near-dup CLUSTER representative, so a test document's near-duplicate
    can never sit in train. Oracle: the near_dup_clusters recursive-CTE
    closure + the same md5-bucket split arithmetic on the cluster id."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.cluster import shingle_edges
    from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = load_table(spark, sf_dir, "documents")
    edges = shingle_edges(docs, n=5, min_df=2, max_df=10)
    return leakage_safe_split(
        docs.select("doc_id"),
        edges,
        weights={"train": 0.9, "val": 0.05, "test": 0.05},
    ).select("doc_id", "cluster_id", "split")


def _q_pretraining_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 operators composed end-to-end
    (plans/curation.pretraining_prep): Gopher gate -> exact dedup ->
    leakage-safe split -> chunk the TRAIN split. Oracle replays the whole
    chain as one CTE composition (gate arithmetic, min-id dedup window,
    recursive-CTE cluster closure, md5 split buckets, list-slice
    chunking)."""
    from azure_etl_databricks_sql_powerbi_spark.plans.curation import (
        pretraining_prep,
    )

    return pretraining_prep(load_table(spark, sf_dir, "documents"))


_DPP_FACT_CACHE: dict[str, str] = {}


def _partitioned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders re-landed as a Hive-partitioned table (partition column =
    o_orderpriority), cached per sf_dir so repeated calls in one process
    reuse the same materialization. This is the layout the medallion sink
    (sources/files.write_partitioned_parquet) produces at scale."""
    if sf_dir not in _DPP_FACT_CACHE:
        tmp = _scratch_dir("dpp_orders_")
        load_table(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
            "o_orderpriority"
        ).parquet(tmp)
        _DPP_FACT_CACHE[sf_dir] = tmp
    return spark.read.parquet(_DPP_FACT_CACHE[sf_dir])


def _q_dpp_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact is partitioned on the join key
    and the dim's filter is only known at plan time THROUGH the join —
    Spark must insert a dynamicpruning subquery (reusing the dim's
    broadcast) so the fact scan reads 2 of 5 partitions instead of all.
    At 100 TB this is the difference between scanning the whole fact and
    scanning the partitions the dim selects; asserted in
    tests/test_plan_shapes.py::test_dpp_prunes_fact_partitions. The static
    analog (literal predicate pruning at read) is covered by
    tests/test_sources.py::test_partitioned_write_prunes_on_read."""
    fact = _partitioned_orders(spark, sf_dir)
    dim = spark.createDataFrame(
        [
            ("1-URGENT", "expedite"),
            ("2-HIGH", "expedite"),
            ("3-MEDIUM", "standard"),
            ("4-NOT SPECIFIED", "standard"),
            ("5-LOW", "deferred"),
        ],
        "o_orderpriority string, tier string",
    ).where(F.col("tier") == "expedite")
    return (
        fact.join(F.broadcast(dim), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def _q_vocab_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 whitespace tokens by frequency (explode
    -> count -> TakeOrderedAndProject; deterministic tiebreak on token)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(100)
    )


def _q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram of order prices (BI surface): one aggregate
    pass, bin = floor(price/step) clamped to [0, nbins)."""
    orders = load_table(spark, sf_dir, "orders")
    nbins, step = 20, 30_000.0
    bin_id = F.least(
        F.floor(F.col("o_totalprice") / step).cast("long"), F.lit(nbins - 1)
    )
    return (
        orders.groupBy(bin_id.alias("bin_id"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("total_price"),
        )
        .orderBy("bin_id")
    )


def _q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile per status — the sketch path that replaces the
    exact sort-based percentile at 100 TB (rows-only: sketches are
    engine-specific; the unit test bounds the error vs the exact value)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10_000)).alias("ap50"),
        F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10_000)).alias("ap90"),
    )


def _q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signal: top-bigram share per doc
    (functions/text.top_ngram_share; docs with <=2 tokens collapse to one
    whole-text shingle => share 1.0, matching word_ngrams semantics)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.text import top_ngram_share

    docs = spread(load_table(spark, sf_dir, "documents"))
    return top_ngram_share(docs, n=2)


def _q_revenue_change_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.revenue_change_q6(load_table(spark, sf_dir, "lineitem"))


def _q_product_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.product_profit_q9(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def _q_returned_items_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.returned_items_q10(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


def _q_priority_line_health_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.priority_line_health_q12(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
    )


def _q_promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.promo_revenue_q14(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def _q_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.stats_profile(load_table(spark, sf_dir, "lineitem"))


def _q_order_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_databricks_sql_powerbi_spark.operators.windows import rank_distribution

    return rank_distribution(
        load_table(spark, sf_dir, "orders"),
        partition_by=["o_orderstatus"],
        order_by="o_totalprice",
        keys=["o_orderkey"],
    )


def _q_dedup_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global span dedup over the corpus: 10-token chunks,
    first occurrence (lowest doc_id, span_idx) wins corpus-wide, docs
    reassembled from surviving spans (dedup/lines.py)."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.lines import dedup_corpus_spans

    docs = spread(load_table(spark, sf_dir, "documents"))
    return dedup_corpus_spans(docs, chunk_tokens=10)


def _q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540) over the embeddings table: k-means
    cells -> within-cell cosine pairs -> keep lowest id per duplicate
    pair. Rows-only by design (k-means assignment has no SQL oracle);
    keep-one-per-planted-cluster semantics unit-tested in test_ext.py.

    Runs at the paper's realistic operating point: deterministic planted
    near-dups (_plant_near_dups; cosine ~0.99) at threshold 0.92. The
    planted copy lands in its original's k-means cell (it is a tiny
    perturbation), pairs above threshold, and — having the higher id —
    is dropped; the near-orthogonal rest of the corpus survives. Cell
    count auto-sizes with the corpus (dedup/semantic.auto_nlist) so
    per-cell population — and the within-cell quadratic — stays constant
    as data grows: total pair work is linear in corpus size (the fixed
    nlist=16 this replaced measured 13.5x wall-clock at 10x data,
    BENCH_SF1.md)."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.semantic import semantic_dedup

    emb = _plant_near_dups(load_table(spark, sf_dir, "embeddings"))
    return (
        semantic_dedup(emb, threshold=0.92)
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


def _q_full_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_etl_databricks_sql_powerbi_spark.plans.curation import (
        full_curation_pipeline,
    )

    return full_curation_pipeline(load_table(spark, sf_dir, "documents"))


def _q_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance (pandas merge_asof surface): each
    event picks the customer's NEXT order (o_orderdate >= ts) but only
    within 30 days — farther matches null out. Same union + sorted-window
    shape as the backward join (one shuffle), direction flips the window
    frame, tolerance is a post-carry projection."""
    from azure_etl_databricks_sql_powerbi_spark.operators.asof import asof_join
    from azure_etl_databricks_sql_powerbi_spark.operators.dedup import latest_per_key

    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = latest_per_key(
        load_table(spark, sf_dir, "orders"),
        keys=["o_custkey", "o_orderdate"],
        order_by=["o_orderkey"],
        tiebreak=[],
    ).select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    return asof_join(
        events.withColumn("o_custkey", F.col("user_id")),
        orders,
        on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        direction="forward",
        tolerance_seconds=30 * 86400,
    ).select("event_id", "ts", "user_id", "o_orderkey", "o_totalprice")


def _q_payments_decimal_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-money rollup on the DecimalType(18,2) payments contract
    (plans/medallion.PAYMENTS_DECIMAL_CONTRACT): decimal sums are exact
    integers-of-cents, so the aggregate itself never rounds. The FINAL
    output columns are cast to double on both the Spark and oracle sides
    purely to canonicalize the textual representation (DecimalType renders
    trailing zeros, `101951.00`, while the oracle pipeline degrades DuckDB
    decimals to floats rendering `101951.0` — numerically identical values
    that hash-differ). Internal arithmetic stays decimal; only the contract
    edge is double."""
    silver = medallion.clean_payments_decimal(load_table(spark, sf_dir, "events"))
    return (
        silver.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_payments"),
            F.sum("value").cast("decimal(18,2)").cast("double").alias("total_value"),
            F.min("value").cast("double").alias("min_value"),
            F.max("value").cast("double").alias("max_value"),
        )
        .orderBy("event_type")
    )


def _q_decimal_star_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-money star aggregate (decimal Q1 shape through joins+rollup):
    lineitem revenue in DecimalType end-to-end — money at scale 2,
    revenue = gross * (1 - discount) at scale 4, summed EXACTLY, never
    rounded (a scale-down cast would hit Spark-vs-DuckDB rounding-mode
    divergence on half boundaries; keeping the product scale avoids
    rounding entirely). Dims (customer, nation) broadcast; fact shuffles
    once on o_orderkey for the orders join, then rollup(n_name,
    l_returnflag) gives per-nation, nation-total, and grand-total money.

    The FINAL money columns are cast to double on both sides to
    canonicalize representation (decimal trailing zeros hash-differ from
    the oracle's float rendering even when values are identical); the
    exact decimal sum happens first, so the cast maps the same exact
    decimal to the same double in both engines."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    gross = F.col("l_extendedprice").cast("decimal(18,2)")
    one_minus_disc = F.lit("1.00").cast("decimal(3,2)") - F.col("l_discount").cast(
        "decimal(4,2)"
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            "l_returnflag",
            gross.alias("__gross"),
            (gross * one_minus_disc).alias("__rev"),
        )
        .rollup("n_name", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("__gross").cast("decimal(38,2)").cast("double").alias("gross_total"),
            F.sum("__rev").cast("decimal(38,4)").cast("double").alias("revenue_total"),
        )
    )


def _q_strip_boilerplate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate passage removal
    (dedup/boilerplate.strip_boilerplate): every 8-token window shared by
    ≥5 distinct documents is stripped from every document it covers —
    the bounded-window variant of repeated-substring dedup (Lee et al.
    2022), the curation step document-level dedup cannot express. Plan
    shape: corpus-sized shuffles carry only (id, 8-byte xxhash64) window
    rows; token removal is a row-local array_except position-set
    difference, never a per-token shuffle. Full oracle: the module's
    STRIP_SQL twin (same \\s+ tokenization, same short-doc whole-text
    window, same coverage arithmetic) — hash-exact."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.boilerplate import (
        strip_boilerplate,
    )

    docs = load_table(spark, sf_dir, "documents")
    return strip_boilerplate(docs, n=8, min_df=5)


def _q_mixture_curation_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation mixture (functions/ensemble.ensemble_rank_scores
    → operators/mixing.domain_mix_allocation → sample_to_token_budget) in
    ONE plan: two incomparable quality signals (chars, tokens) become
    percent ranks via the distributed global-rank machinery (never a
    single-partition window), their weighted average gates the worst
    quartile out, the surviving corpus gets a per-domain token budget
    (min(inventory, floor(2% of total))), and the budget is MATERIALIZED
    in deterministic md5-priority order — the allocation table is
    #domains rows and broadcasts; the only corpus shuffles are k range
    exchanges for the ranks and one hash exchange for the per-domain
    cumsum. cap_frac=0.02 binds in every domain at the test scale (an
    unbinding budget would keep everything and test nothing). Oracle:
    one CTE chain built around the module-owned ensemble_sql twin plus
    the BUDGET_SQL window arithmetic, bit-exact (the 0.02 cap multiplies
    as DOUBLE on both sides — DuckDB's bare 0.02 literal is DECIMAL and
    would floor differently at exact-integer edges)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.ensemble import (
        ensemble_rank_scores,
    )
    from azure_etl_databricks_sql_powerbi_spark.operators.mixing import (
        domain_mix_allocation,
        sample_to_token_budget,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .withColumn("n_tokens", F.size(F.split(F.trim("text"), r"\s+")))
        .withColumn("s_chars", F.col("n_chars").cast("double"))
        .withColumn("s_tokens", F.col("n_tokens").cast("double"))
        .select("doc_id", "source", "n_tokens", "s_chars", "s_tokens")
    )
    ranked = ensemble_rank_scores(
        docs, ["s_chars", "s_tokens"], "doc_id", weights=[2.0, 1.0]
    )
    kept = ranked.filter(F.col("ensemble_rank") >= 0.25)
    alloc = domain_mix_allocation(kept, "source", "n_tokens", cap_frac=0.02)
    return sample_to_token_budget(
        kept, alloc, "source", "n_tokens", "doc_id"
    ).select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "ensemble_rank",
        "cum_tokens_before",
    )


def _q_join_diagnostics_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row pre-flight diagnostics (operators/diagnostics): the
    key-skew summary of lineitem on l_suppkey UNIONED (as a single wide
    row via two broadcast one-row joins) with the EXACT join-explosion
    estimate of orders ⋈ lineitem on orderkey — |A ⋈ B| = Σ cl·cr from
    per-key counts, never the row-level join. Two map-side-combined
    aggregates per input; everything after the per-key aggregates is
    driver-sized. join_rows is decimal(38,0) inside the operator (a hot
    key with >3e9 rows per side overflows a long product — the exact
    regime this tool flags); the driver projection casts it to long,
    exact at any test sf. Full oracle: the same count arithmetic as two
    DuckDB CTE chains cross-joined."""
    from azure_etl_databricks_sql_powerbi_spark.operators.diagnostics import (
        join_explosion_estimate,
        skew_summary,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    skew = skew_summary(li, "l_suppkey")
    expl = join_explosion_estimate(
        orders.select(F.col("o_orderkey").alias("k")),
        li.select(F.col("l_orderkey").alias("k")),
        ["k"],
    )
    return skew.join(F.broadcast(expl)).select(
        "n_rows",
        "n_keys",
        "max_key_cnt",
        "avg_key_cnt",
        "skew_ratio",
        "left_rows",
        "right_rows",
        "matching_keys",
        F.col("join_rows").cast("long").alias("join_rows"),
        "amplification",
    )


# Key order matters: the correctness driver verifies the FIRST 50 entries
# against the DuckDB oracle at sf0.01. The window rotates each round so
# every declared query keeps fresh driver evidence (rotation history is
# tracked in tools/rotation_manifest.json and guarded by
# tests/test_rotation.py). Round-6 window: 11 new/changed queries, the 11
# r3-era stale greens (oldest evidence first), the 6 round-5 newcomers
# for a second consecutive green, and the first 22 of the 45-query
# round-4-evidence cohort (the cohort's remaining 23 lead the round-7
# queue; see the dict comments below). Every query keeps its oracle
# regardless of position; tests/test_oracle_parity.py checks ALL of them
# at sf0.001 on every pytest run.
QUERIES: dict[str, QueryFn] = {
    # --- round-16 window: the r13-evidence cohort (ex-r10 cohort with
    # §5 swaps #8–12 in place; stalest on the board — last green r13,
    # re-greens this round per ROTATION_POLICY.md §2) ---
    "strip_boilerplate_docs": _q_strip_boilerplate_docs,
    "mixture_curation_budget": _q_mixture_curation_budget,
    "join_diagnostics_summary": _q_join_diagnostics_summary,
    # (3 composed r10 queries above + the 47-query ex-r6 cohort below;
    # 3 + 47 = 50, exact window fit) ---
    "novel_docs_day2": _q_novel_docs_day2,
    "interval_join_stream": _q_interval_join_stream,
    "unigram_quality_docs": _q_unigram_quality_docs,
    "bigram_quality_docs": _q_bigram_quality_docs,
    "bpe_tokenize_docs": _q_bpe_tokenize_docs,
    "zorder_layout_stats": _q_zorder_layout_stats,
    "incremental_kpis_day2": _q_incremental_kpis_day2,
    "orders_pit_status": _q_orders_pit_status,
    "referential_integrity_qc": _q_referential_integrity_qc,
    "dbt_qc_report_orders": _q_dbt_qc_report,
    "ann_ivfpq_topk": _q_ann_ivfpq,
    "media_metadata": _q_media_metadata,
    "kmeans_clusters_embeddings": _q_kmeans_clusters,
    "ngrams_udtf_docs": _q_ngrams_udtf_docs,
    "media_binaryfile_scan": _q_media_binaryfile_scan,
    "rolling_7d_revenue": _q_rolling_7d_revenue,
    "snapshot_diff_orders": _q_snapshot_diff_orders,
    "stream_static_enrich": _q_stream_static_enrich,
    "incremental_distinct_day2": _q_incremental_distinct_day2,
    "events_variant_kpis": _q_events_variant_kpis,
    "khop_reach_supplier": _q_khop_reach_supplier,
    "snm_customer_pairs": _q_snm_customer_pairs,
    "median_price_by_status": _q_median_price_udaf,
    "orders_xml_roundtrip": _q_orders_xml_roundtrip,
    "pseudonymize_customers": _q_pseudonymize_customers,
    "hashed_features_docs": _q_hashed_features_docs,
    "curriculum_quality_deciles": _q_curriculum_deciles,
    "weighted_sample_docs": _q_weighted_sample_docs,
    "rag_ingest_chunks": _q_rag_ingest,
    # §5 swap #11: cdx_capture_selection replaced customer_revenue_quartiles
    # in place (the NTILE column set merged into customer_order_distribution)
    "cdx_capture_selection": _q_cdx_capture_selection,
    "customer_cohorts_setops": _q_customer_cohorts_setops,
    "unpivot_status_revenue": _q_unpivot_status_revenue,
    "order_extremes_by_customer": _q_order_extremes,
    "conditional_agg_orders": _q_conditional_agg,
    # §5 swap #12: robots_policy_docs replaced small_qty_part_revenue in
    # place (Q17 shape retired to tests/test_gold_twins.py; the
    # correlated-scalar family keeps min_cost_supplier declared)
    "robots_policy_docs": _q_robots_policy_docs,
    "html_extract_docs": _q_html_extract_docs,
    "warc_html_corpus": _q_warc_html_corpus,
    "ann_lsh_topk": _q_ann_lsh,
    "ann_ivf_topk": _q_ann_ivf,
    "embedding_near_pairs_lsh": _q_embedding_near_pairs_lsh,
    "registered_domain_psl_docs": _q_registered_domain_psl_docs,
    "heavy_hitter_tokens": _q_heavy_hitter_tokens,
    "leakage_safe_split": _q_leakage_safe_split,
    "chunk_documents_rag": _q_chunk_documents_rag,
    "pretraining_prep": _q_pretraining_prep,
    "sessionize_stream": _q_sessionize_stream,
    "order_priority_exists": _q_order_priority_exists,
    # ================= end of the 50-entry driver window =================
    # --- round-14-evidence cohort (the ex-r11/r7 cohort with §5 swaps
    # #1–3 and #13–14 in place; re-greens in the r17 window) ---
    "fuzzy_customer_pairs": _q_fuzzy_customer_pairs,
    "pagerank_supplier_part": _q_pagerank_supplier_part,
    "bm25_rank_docs": _q_bm25_rank_docs,
    "ann_ivfpq_day2": _q_ann_ivfpq_day2,
    "quality_classifier_docs": _q_quality_classifier_docs,
    "triplet_candidates": _q_triplet_candidates,
    "customer_order_distribution": _q_customer_order_distribution,
    "idle_customer_balance": _q_idle_customer_balance,
    "dataset_split_summary": _q_dataset_split_summary,
    "stratified_sample_docs": _q_stratified_sample_docs,
    "pack_sequences_docs": _q_pack_sequences_docs,
    "skewed_join_salted": _q_skewed_join_salted,
    "stream_upsert_replay": _q_stream_upsert_replay,
    "dpp_priority_revenue": _q_dpp_priority_revenue,
    "near_dup_clusters": _q_near_dup_clusters,
    "resample_daily_ffill": _q_resample_daily,
    "cumulative_distinct_users": _q_cumulative_users,
    "cohort_retention": _q_cohort_retention,
    "funnel_conversion": _q_funnel_conversion,
    "salient_terms": _q_salient_terms,
    "decontaminate_docs": _q_decontaminate_docs,
    "min_cost_supplier": _q_min_cost_supplier,
    "important_suppliers": _q_important_suppliers,
    "top_quarter_shippers": _q_top_quarter_shippers,
    "part_supplier_breadth": _q_part_supplier_breadth,
    "pii_scrub_docs": _q_pii_scrub_docs,
    # §5 swap #13: link_edges_docs replaced corpus_stats in place (the
    # one-row data card folded into dataset_split_summary's per-split
    # stats columns; twin + proof moved to tests/test_mixing_stats.py)
    "link_edges_docs": _q_link_edges_docs,
    # §5 swap #14: sitemap_frontier replaced hard_negatives in place
    # (same broadcast-anchor BNL family as the still-declared
    # triplet_candidates; twin + proof live in tests/test_negatives.py)
    "sitemap_frontier": _q_sitemap_frontier,
    "domain_mix_allocation": _q_domain_mix,
    "trade_volume_q7": _q_trade_volume,
    "market_share_q8": _q_market_share,
    "large_quantity_orders_q18": _q_large_quantity_orders,
    "bracket_revenue_q19": _q_bracket_revenue,
    "sole_return_supplier_q21": _q_sole_return_supplier,
    "vocab_top100": _q_vocab_top100,
    "price_histogram": _q_price_histogram,
    "approx_percentiles_by_status": _q_approx_percentiles,
    "repetition_ratio_docs": _q_repetition_ratio,
    "revenue_change_q6": _q_revenue_change_q6,
    "priority_line_health_q12": _q_priority_line_health_q12,
    "promo_revenue_q14": _q_promo_revenue_q14,
    "stats_profile_lineitem": _q_stats_profile,
    "order_rank_distribution": _q_order_rank_distribution,
    "dedup_spans_docs": _q_dedup_spans_docs,
    "semantic_dedup_embeddings": _q_semantic_dedup,
    "full_curation_pipeline": _q_full_curation,
    "asof_forward_tolerance": _q_asof_forward_tolerance,
    "stateful_running_totals": _q_stateful_running_totals,
    "pricing_summary": _q_pricing_summary,
    "merge_upsert_orders": _q_merge_upsert,
    # --- round-15-evidence cohort (the ex-r12/r9 cohort with §5 swaps
    # #4–7 and #15 in place; freshest — re-greens in the r18 window) ---
    "triangle_counts_parts": _q_triangle_counts_parts,
    "clustering_coefficients_parts": _q_clustering_coefficients_parts,
    "label_propagation_parts": _q_label_propagation_parts,
    "personalized_pagerank_suppliers": _q_personalized_pagerank_suppliers,
    "minhash_near_dup_day2": _q_minhash_near_dup_day2,
    "simhash_near_dup_day2": _q_simhash_near_dup_day2,
    "semantic_decontam_pruned": _q_semantic_decontam_pruned,
    "payments_decimal_rollup": _q_payments_decimal_rollup,
    "decimal_star_rollup": _q_decimal_star_rollup,
    "product_profit_q9": _q_product_profit_q9,
    "returned_items_q10": _q_returned_items_q10,
    "audio_features": _q_audio_features,
    "warc_cdx_ranged_corpus": _q_warc_cdx_ranged_corpus,
    "media_decode_features": _q_media_decode_features,
    "star_revenue_by_region": _q_star_revenue,
    "dedup_exact_docs": _q_dedup_exact_docs,
    "asof_events_orders": _q_asof_events_orders,
    "dim_customers": _q_dim_customers,
    "fact_payments": _q_fact_payments,
    "latest_order_per_customer": _q_latest_order_per_customer,
    "top_customers_by_segment": _q_top_customers_by_segment,
    "compression_band_docs": _q_compression_band_docs,
    "customer_order_windows": _q_customer_order_windows,
    "events_watermark_7d": _q_events_watermark,
    "events_json_kpis": _q_events_json_kpis,
    "union_schema_drift": _q_union_drift,
    "qbo_invoices_flatten": _q_qbo_flatten,
    "qc_metrics_orders": _q_qc_metrics,
    "url_provenance_docs": _q_url_provenance_docs,
    "text_stats": _q_text_stats,
    "lang_id_docs": _q_lang_id,
    "doc_fingerprint": _q_doc_fingerprint,
    "token_jaccard_pairs": _q_token_jaccard,
    "ann_cosine_topk": _q_ann_bruteforce,
    "embedding_near_pairs": _q_embedding_near_pairs,
    "events_tumbling_daily": _q_events_tumbling,
    "events_sliding_6h": _q_events_sliding,
    "events_sessions_2h": _q_events_sessions,
    "range_join_business_hours": _q_range_join_business_hours,
    "status_pivot_by_priority": _q_status_pivot,
    "price_percentiles_by_status": _q_price_percentiles,
    "sales_cube": _q_sales_cube,
    "token_counts_docs": _q_token_counts,
    "grouping_sets_orders": _q_grouping_sets,
    "shipping_priority_top10": _q_shipping_priority,
    "brand_nation_volume": _q_brand_nation_volume,
    "curate_documents": _q_curate_documents,
    "scd2_customer_status": _q_scd2_customer_status,
    "normalize_text_docs": _q_normalize_text_docs,
    "gopher_quality_docs": _q_gopher_quality_docs,
}


def queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


# ------------------------------------------------------------- oracle SQL

_AUDIT = medallion.TEST_AUDIT_TS


def _pagerank_oracle() -> str:
    """DuckDB twin of _q_pagerank_supplier_part: the fixed-3-iteration
    integer-state recurrence mechanically unrolled by the same module
    that implements the operator (graph/pagerank.pagerank_sql_unrolled),
    so Spark and the oracle share ONE definition of the arithmetic."""
    from azure_etl_databricks_sql_powerbi_spark.graph.pagerank import (
        pagerank_sql_unrolled,
    )

    edges = (
        "SELECT 'S' || CAST(l_suppkey AS VARCHAR) AS src, "
        "'P' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem "
        "UNION "
        "SELECT 'P' || CAST(l_partkey AS VARCHAR), "
        "'S' || CAST(l_suppkey AS VARCHAR) FROM lineitem"
    )
    return (
        pagerank_sql_unrolled(edges, damping=0.85, iterations=3)
        + "\nSELECT node, rank_m, rank FROM final"
        + "\nORDER BY rank_m DESC, node ASC LIMIT 25"
    )

ORACLES: dict[str, str] = {
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)  AS sum_base_price,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                   * (CAST('1.00' AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))), 2) AS DOUBLE) AS sum_charge,
               CAST(SUM(l_quantity) AS DOUBLE) / COUNT(l_quantity)          AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
               COUNT(*)                                                     AS count_order
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "dim_customers": f"""
        SELECT CAST(c_custkey AS BIGINT)          AS c_custkey,
               LOWER(TRIM(c_name))                AS c_name,
               CAST(c_nationkey AS INT)           AS c_nationkey,
               CAST(c_acctbal AS DOUBLE)          AS c_acctbal,
               CAST(c_mktsegment AS VARCHAR)      AS c_mktsegment
        FROM customer
    """,
    "fact_payments": """
        SELECT CAST(event_id AS BIGINT)  AS event_id,
               CAST(ts AS TIMESTAMP)     AS ts,
               CAST(user_id AS BIGINT)   AS user_id,
               event_type                AS event_type,
               CAST(value AS DOUBLE)     AS value
        FROM events
    """,
    "star_revenue_by_region": """
        SELECT r_name, n_name,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue,
               COUNT(DISTINCT o_orderkey)                        AS order_count
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """,
    "merge_upsert_orders": """
        WITH target AS (
            SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2001-01-01'
        ), source AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   o_totalprice + 1000.0 AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderdate >= TIMESTAMP '2000-06-01'
        )
        SELECT * FROM source
        UNION ALL
        SELECT t.* FROM target t
        WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
    """,
    "latest_order_per_customer": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC NULLS LAST, o_orderkey ASC
            ) AS rn
            FROM orders
        ) WHERE rn = 1
    """,
    "top_customers_by_segment": """
        WITH per_customer AS (
            SELECT c_mktsegment, o_custkey, c_name,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment, o_custkey, c_name
        )
        SELECT c_mktsegment, o_custkey AS c_custkey, c_name, revenue,
               CAST(rnk AS INT) AS rnk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY c_mktsegment
                ORDER BY revenue DESC NULLS LAST, o_custkey ASC
            ) AS rnk
            FROM per_customer
        ) WHERE rnk <= 3
        ORDER BY c_mktsegment, rnk
    """,
    "customer_order_windows": """
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_revenue,
               LAG(o_orderdate)  OVER w AS prev_orderdate,
               LEAD(o_orderdate) OVER w AS next_orderdate,
               CAST(date_diff('day', LAG(o_orderdate) OVER w, o_orderdate)
                   AS INT) AS gap_days
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    "events_watermark_7d": """
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        FROM events
        QUALIFY CAST(ts AS TIMESTAMP)
            >= CAST(CAST(MAX(CAST(ts AS TIMESTAMP)) OVER () AS DATE) - INTERVAL 7 DAY AS TIMESTAMP)
    """,
    "events_json_kpis": """
        SELECT event_type,
               COUNT(*)                                        AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
               CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS DOUBLE)
                   / COUNT(CAST(props->>'$.k' AS BIGINT))      AS avg_k,
               COUNT(DISTINCT user_id)                         AS n_users
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "union_schema_drift": """
        SELECT c_custkey, c_name, c_acctbal, NULL AS c_mktsegment
        FROM customer WHERE c_custkey % 2 = 0
        UNION ALL
        SELECT c_custkey, c_name, NULL AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 2 = 1
    """,
    "qbo_invoices_flatten": """
        SELECT CAST(o_orderkey AS VARCHAR) AS Id,
               o_totalprice                AS TotalAmt,
               o_orderstatus               AS Status
        FROM orders
    """,
    "qc_metrics_orders": """
        SELECT CAST(COUNT(*) AS BIGINT)                                   AS n_rows,
               CAST(SUM(CAST(o_custkey IS NULL AS INT)) AS DOUBLE) / COUNT(*) AS custkey_null_rate,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)                 AS n_keys,
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)      AS dup_keys,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT)                  AS n_custkeys
        FROM orders
    """,
    "text_stats": r"""
        WITH t AS (
            SELECT doc_id, text,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE CAST(len(string_split_regex(TRIM(text), '\s+')) AS INT)
                   END AS n_tokens,
                   LENGTH(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                       / GREATEST(LENGTH(text), 1) AS praw,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE len(list_filter(string_split_regex(TRIM(text), '\s+'),
                             x -> lower(x) IN ('the','and','of','to','in','is','you','that','it','for')))
                   END AS hits
            FROM documents
        )
        SELECT doc_id,
               CAST(LENGTH(text) AS INT)  AS n_chars,
               n_tokens,
               LENGTH(regexp_replace(text, '\s', '', 'g'))
                   / GREATEST(n_tokens, 1)                       AS avg_token_len,
               praw                                              AS punct_ratio,
               hits / GREATEST(n_tokens, 1)                      AS stop_ratio_en,
               0.3 * LEAST(n_tokens / 50.0, 1.0)
                   + 0.3 * (1.0 - LEAST(praw * 5, 1.0))
                   + 0.4 * LEAST((hits / GREATEST(n_tokens, 1)) * 4, 1.0) AS quality
        FROM t
    """,
    "lang_id_docs": r"""
        WITH s AS (
            SELECT doc_id, lang,
                   string_split_regex(TRIM(text), '\s+') AS toks
            FROM documents
        ), h AS (
            SELECT doc_id, lang,
                   len(list_filter(toks, x -> lower(x) IN ('the','and','of','to','in','is','you','that','it','for'))) AS en,
                   len(list_filter(toks, x -> lower(x) IN ('el','la','de','que','y','en','un','los','se','no')))      AS es,
                   len(list_filter(toks, x -> lower(x) IN ('der','die','und','in','den','von','zu','das','mit','sich'))) AS de,
                   len(list_filter(toks, x -> lower(x) IN ('le','la','de','et','les','des','en','un','du','une')))     AS fr
            FROM s
        )
        SELECT doc_id, lang AS labeled_lang,
               CASE WHEN en >= es AND en >= de AND en >= fr THEN 'en'
                    WHEN es >= de AND es >= fr THEN 'es'
                    WHEN de >= fr THEN 'de'
                    ELSE 'fr' END AS predicted_lang
        FROM h
    """,
    "doc_fingerprint": """
        SELECT doc_id,
               md5(TRIM(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp_md5
        FROM documents
    """,
    "dedup_exact_docs": """
        SELECT md5(TRIM(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
               CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
               CAST(COUNT(*) AS BIGINT)    AS n_dups
        FROM documents
        GROUP BY 1
    """,
    "heavy_hitter_tokens": r"""
        WITH occ AS (
            SELECT unnest(string_split_regex(TRIM(text), '\s+')) AS token
            FROM documents
            WHERE length(TRIM(text)) > 0
        ), thr AS (
            SELECT GREATEST(1, COUNT(*) // 100) AS t FROM occ
        )
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM occ
        GROUP BY token
        HAVING COUNT(*) >= (SELECT t FROM thr)
        ORDER BY token
    """,
    "novel_docs_day2": """
        SELECT b.doc_id, md5(b.text) AS fingerprint
        FROM documents b
        WHERE b.doc_id % 3 = 0
          AND NOT EXISTS (
              SELECT 1 FROM documents c
              WHERE c.doc_id % 5 <> 0 AND md5(c.text) = md5(b.text)
          )
        ORDER BY b.doc_id
    """,
    "pagerank_supplier_part": _pagerank_oracle(),
    "khop_reach_supplier": _KHOP_SQL.format(
        edges=_KHOP_EDGES_SQL.format(str_t="VARCHAR", li="lineitem")
    ),
    "rag_ingest_chunks": r"""
        WITH t AS (
            SELECT doc_id, text,
                   CASE WHEN length(TRIM(text)) = 0
                        THEN CAST([] AS VARCHAR[])
                        ELSE string_split_regex(TRIM(text), '\s+') END AS toks
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_words,
                   length(regexp_replace(text, '\s', '', 'g'))
                       / GREATEST(len(toks), 1) AS mean_word_len,
                   (length(regexp_replace(text, '[^#…]', '', 'g'))
                    + len(regexp_extract_all(text, '\.\.\.')))
                       / GREATEST(len(toks), 1) AS symbol_ratio,
                   len(list_filter(toks, x -> lower(x) IN
                       ('the','and','of','to','in','is','you','that','it','for')))
                       AS stop_hits
            FROM t
        ),
        gated AS (
            SELECT t.doc_id, t.text, t.toks
            FROM t JOIN m USING (doc_id)
            WHERE m.n_words >= 10 AND m.n_words <= 200
              AND m.mean_word_len >= 2.0 AND m.mean_word_len <= 12.0
              AND m.symbol_ratio <= 0.1 AND m.stop_hits >= 2
        ),
        dd AS (
            -- dedup on RAW text (the engine's md5(text) partition), not
            -- the normalized token join
            SELECT doc_id, toks FROM (
                SELECT g.*, ROW_NUMBER() OVER (
                    PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
                FROM gated g
            ) WHERE rn = 1
        ),
        c AS (
            SELECT doc_id, toks,
                   CASE WHEN len(toks) <= 8 THEN 1
                        ELSE ((len(toks) - 8 + 5) // 6) + 1 END AS n_chunks
            FROM dd
        ),
        ch AS (
            SELECT doc_id,
                   CAST(len(toks[i * 6 + 1 : i * 6 + 8]) AS BIGINT) AS n_tokens,
                   array_to_string(toks[i * 6 + 1 : i * 6 + 8], ' ') AS chunk_text
            FROM c CROSS JOIN UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
        )
        SELECT md5(chunk_text) AS chunk_id,
               CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               MIN(doc_id) AS first_doc,
               chunk_text
        FROM ch
        GROUP BY chunk_text
    """,
    "dbt_qc_report_orders": """
        SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS DOUBLE)
                   AS dup_orderkeys,
               AVG(CAST(o_custkey IS NULL AS INT)) AS null_custkey_rate,
               CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                              AND o_orderstatus NOT IN ('O', 'F')
                             THEN 1 ELSE 0 END) AS DOUBLE) AS bad_status_rows,
               CAST(
                   (COUNT(*) - COUNT(DISTINCT o_orderkey) <= 0)
                   AND (AVG(CAST(o_custkey IS NULL AS INT)) <= 0.0)
                   AND (SUM(CASE WHEN o_orderstatus IS NOT NULL
                                  AND o_orderstatus NOT IN ('O', 'F')
                                 THEN 1 ELSE 0 END) <= 0)
               AS INT) AS all_passed
        FROM orders
    """,
    "weighted_sample_docs": """
        -- A-ES keys from the same md5-uniform + micro-quantization
        SELECT doc_id, lang, n_chars
        FROM (
            SELECT doc_id, lang, n_chars,
                   CAST(FLOOR(((-ln((CAST(('0x' || substr(md5('r6' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
                                     / 4294967296.0))
                               / CAST(n_chars AS DOUBLE)) * 1000000.0) AS BIGINT)
                       AS key_m
            FROM documents
            WHERE n_chars > 0
        )
        ORDER BY key_m ASC, doc_id ASC
        LIMIT 100
    """,
    "hashed_features_docs": r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(TRIM(text), '\s+')) AS token
            FROM documents
            WHERE length(TRIM(text)) > 0
        )
        SELECT doc_id,
               CAST(CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 64 AS INT)
                   AS bucket,
               CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks
        GROUP BY doc_id, bucket
    """,
    "pseudonymize_customers": """
        WITH viol AS (
            SELECT c_nationkey, c_mktsegment
            FROM customer
            GROUP BY c_nationkey, c_mktsegment
            HAVING COUNT(*) < 10
        )
        SELECT c.c_custkey,
               CASE WHEN c.c_name IS NOT NULL
                    THEN substr(lower(sha256('unit-test-salt' || c.c_name)), 1, 16)
               END AS name_token,
               c.c_nationkey, c.c_mktsegment,
               CAST(CASE WHEN v.c_nationkey IS NULL THEN 0 ELSE 1 END AS INT)
                   AS reidentifiable
        FROM customer c
        LEFT JOIN viol v
          ON v.c_nationkey = c.c_nationkey AND v.c_mktsegment = c.c_mktsegment
    """,
    "median_price_by_status": """
        SELECT o_orderstatus, o_orderpriority,
               MEDIAN(o_totalprice) AS median_price,
               (MIN(o_totalprice) + MAX(o_totalprice)) / 2.0 AS midrange_price
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
        ORDER BY o_orderstatus, o_orderpriority
    """,
    "orders_xml_roundtrip": """
        -- self-oracle: parsing the in-plan serialization must reproduce
        -- the source columns exactly
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
    """,
    "fuzzy_customer_pairs": """
        -- multi-pass SNM twin: one rank-window pass per sort key
        -- (c_name, reverse(c_name)), UNION dedups identical pairs
        WITH fwd AS (
            SELECT c_custkey, c_name,
                   ROW_NUMBER() OVER (ORDER BY c_name ASC, c_custkey ASC) - 1
                       AS r
            FROM customer
        ),
        rev AS (
            SELECT c_custkey, c_name,
                   ROW_NUMBER() OVER (ORDER BY reverse(c_name) ASC, c_custkey ASC) - 1
                       AS r
            FROM customer
        )
        SELECT LEAST(a.c_custkey, b.c_custkey)    AS id_a,
               GREATEST(a.c_custkey, b.c_custkey) AS id_b,
               CAST(levenshtein(a.c_name, b.c_name) AS INT) AS edit_distance
        FROM fwd a
        JOIN fwd b
          ON b.r > a.r AND b.r - a.r <= 10
        WHERE abs(length(a.c_name) - length(b.c_name)) <= 2
          AND levenshtein(a.c_name, b.c_name) <= 2
        UNION
        SELECT LEAST(a.c_custkey, b.c_custkey)    AS id_a,
               GREATEST(a.c_custkey, b.c_custkey) AS id_b,
               CAST(levenshtein(a.c_name, b.c_name) AS INT) AS edit_distance
        FROM rev a
        JOIN rev b
          ON b.r > a.r AND b.r - a.r <= 10
        WHERE abs(length(a.c_name) - length(b.c_name)) <= 2
          AND levenshtein(a.c_name, b.c_name) <= 2
    """,
    "snm_customer_pairs": """
        WITH ranked AS (
            SELECT c_custkey, c_name,
                   ROW_NUMBER() OVER (ORDER BY c_name ASC, c_custkey ASC) - 1
                       AS r
            FROM customer
        )
        SELECT LEAST(a.c_custkey, b.c_custkey)    AS id_a,
               GREATEST(a.c_custkey, b.c_custkey) AS id_b,
               CAST(levenshtein(a.c_name, b.c_name) AS INT) AS edit_distance
        FROM ranked a
        JOIN ranked b
          ON b.r > a.r AND b.r - a.r <= 10
        WHERE abs(length(a.c_name) - length(b.c_name)) <= 2
          AND levenshtein(a.c_name, b.c_name) <= 2
    """,
    # Twin of tests/test_negatives.py::TRIPLETS_SQL (pytest-proven before
    # declaration, per ROTATION_POLICY.md §3): same cosine fold, same
    # (anchor_id, same-label) ranking windows, same tie-breaks, margin
    # rounded from the UNROUNDED cosine difference.
    "triplet_candidates": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
        a AS (SELECT * FROM e WHERE vec_id < 4),
        scored AS (
            SELECT a.vec_id AS anchor_id, c.vec_id AS cand_id,
                   (c.label = a.label) AS same,
                   CASE WHEN sqrt(list_dot_product(a.v, a.v))
                             * sqrt(list_dot_product(c.v, c.v)) = 0
                        THEN 0.0
                        ELSE list_dot_product(a.v, c.v)
                             / (sqrt(list_dot_product(a.v, a.v))
                                * sqrt(list_dot_product(c.v, c.v)))
                   END AS cos
            FROM e c, a WHERE c.vec_id <> a.vec_id
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY anchor_id, same ORDER BY cos DESC, cand_id ASC
            ) AS rnk FROM scored
        ),
        pos AS (SELECT anchor_id, cand_id AS positive_id, cos AS pc
                FROM ranked WHERE same AND rnk <= 2),
        neg AS (SELECT anchor_id, cand_id AS negative_id, cos AS nc
                FROM ranked WHERE NOT same AND rnk <= 3)
        SELECT p.anchor_id AS anchor_id, positive_id, negative_id,
               pc AS pos_sim, nc AS neg_sim,
               pc - nc AS margin
        FROM pos p JOIN neg n ON p.anchor_id = n.anchor_id
    """,
    "quality_classifier_docs": r"""
        -- distill + apply: Gopher label -> per-bucket NB log-odds +
        -- class prior (micro-nat quantized) -> exact integer logit sums
        WITH t AS (
            SELECT doc_id,
                   CASE WHEN length(TRIM(text)) = 0
                        THEN CAST([] AS VARCHAR[])
                        ELSE string_split_regex(TRIM(text), '\s+') END AS toks,
                   text
            FROM documents
        ), lab AS (
            SELECT doc_id, toks,
                   CAST(len(toks) >= 10 AND len(toks) <= 200
                        AND length(regexp_replace(text, '\s', '', 'g'))
                            / GREATEST(len(toks), 1) >= 2.0
                        AND length(regexp_replace(text, '\s', '', 'g'))
                            / GREATEST(len(toks), 1) <= 12.0
                        AND (length(regexp_replace(text, '[^#…]', '', 'g'))
                             + len(regexp_extract_all(text, '\.\.\.')))
                            / GREATEST(len(toks), 1) <= 0.1
                        AND len(list_filter(toks, x -> lower(x) IN
                            ('the','and','of','to','in','is','you','that','it','for')))
                            >= 2
                       AS INTEGER) AS label
            FROM t
        ), feats AS (
            -- hashed tokens + the two per-doc band features (word-count
            -- decile, stopword-hit level) — functions/classifier.feature_rows
            SELECT doc_id, label,
                   CAST(CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 512 AS INT)
                       AS bucket,
                   1 AS is_tok
            FROM (SELECT doc_id, label, unnest(toks) AS token FROM lab)
            UNION ALL
            SELECT doc_id, label,
                   CAST(512 + LEAST(len(toks) // 10, 40) AS INT), 0
            FROM lab
            UNION ALL
            SELECT doc_id, label,
                   CAST(553 + LEAST(len(list_filter(toks, x -> lower(x) IN
                       ('the','and','of','to','in','is','you','that','it','for'))), 5)
                       AS INT), 0
            FROM lab
        ), wc AS (
            SELECT bucket,
                   SUM(label) AS pos, SUM(1 - label) AS neg
            FROM feats GROUP BY bucket
        ), tot AS (
            SELECT SUM(pos) AS pos_tot, SUM(neg) AS neg_tot FROM wc
        ), w AS (
            -- multinomial NB: ln(P(bucket|pos)/P(bucket|neg)), add-one
            -- smoothed, class-mass normalized over the 559-feature space
            -- (same arithmetic as functions/classifier.train_bucket_log_odds)
            SELECT bucket,
                   CAST(FLOOR((ln((pos + 1.0) / ((SELECT pos_tot FROM tot) + 559.0))
                               - ln((neg + 1.0) / ((SELECT neg_tot FROM tot) + 559.0)))
                              * 1000000) AS BIGINT) AS w_m
            FROM wc
        ), prior AS (
            SELECT CAST(FLOOR(ln((SUM(label) + 1.0) / (SUM(1 - label) + 1.0))
                              * 1000000) AS BIGINT) AS prior_m
            FROM lab
        ), scored AS (
            SELECT f.doc_id,
                   CAST(SUM(f.is_tok) AS BIGINT) AS n_tokens,
                   CAST(SUM(w.w_m) AS BIGINT) AS sum_m
            FROM feats f JOIN w USING (bucket)
            GROUP BY f.doc_id
        )
        SELECT l.doc_id,
               COALESCE(s.n_tokens, 0) AS n_tokens,
               ((SELECT prior_m FROM prior) + COALESCE(s.sum_m, 0)) / 1000000.0
                   AS logit,
               CAST(((SELECT prior_m FROM prior) + COALESCE(s.sum_m, 0)) > 0
                    AS INTEGER) AS predicted_keep,
               l.label AS rule_keep
        FROM lab l LEFT JOIN scored s USING (doc_id)
        ORDER BY doc_id
    """,
    "events_variant_kpis": """
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
               CAST(MIN(CAST(json_extract(props, '$.k') AS INT)) AS INT)    AS k_min,
               CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT)    AS k_max
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "stream_static_enrich": """
        SELECT c.c_mktsegment,
               COUNT(*)             AS n_events,
               CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events e
        JOIN customer c ON c.c_custkey = e.user_id
        GROUP BY c.c_mktsegment
    """,
    "snapshot_diff_orders": """
        -- same perturbed snapshot, classified semantically (IS DISTINCT
        -- FROM) instead of by row digest — engine-neutral equivalence
        WITH newsnap AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1.0
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 101 <> 0
            UNION ALL
            SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 89 = 0
        ),
        classified AS (
            SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                   CASE WHEN o.o_orderkey IS NULL THEN 'added'
                        WHEN n.o_orderkey IS NULL THEN 'removed'
                        WHEN (o.o_custkey      IS DISTINCT FROM n.o_custkey)
                          OR (o.o_orderstatus  IS DISTINCT FROM n.o_orderstatus)
                          OR (o.o_totalprice   IS DISTINCT FROM n.o_totalprice)
                          OR (o.o_orderdate    IS DISTINCT FROM n.o_orderdate)
                          OR (o.o_orderpriority IS DISTINCT FROM n.o_orderpriority)
                        THEN 'changed' END AS change
            FROM orders o FULL JOIN newsnap n ON n.o_orderkey = o.o_orderkey
        )
        SELECT o_orderkey, change FROM classified WHERE change IS NOT NULL
    """,
    "rolling_7d_revenue": """
        -- RANGE frame over epoch seconds (identical numeric frame to the
        -- Spark rangeBetween); decimal accumulation, double at the edge
        SELECT o_orderkey, o_custkey,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   AS revenue_7d
        FROM orders
        WINDOW w AS (
            PARTITION BY o_custkey
            ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
            RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
        )
    """,
    "media_binaryfile_scan": """
        -- files landed as <doc_id>.png then scanned via binaryFile; the
        -- stored-deflate PNG size is exact arithmetic (media_metadata
        -- precedent): sig 8 + IHDR 25 + IDAT (12+2+5+raw+4) + IEND 12,
        -- raw = h * (1 + 3*16), h = 8 + doc_id % 9
        SELECT doc_id AS media_id,
               'image/png' AS media_type,
               CAST(49 * (8 + doc_id % 9) + 68 AS BIGINT) AS n_bytes
        FROM documents
    """,
    "ngrams_udtf_docs": r"""
        WITH t AS (
            SELECT doc_id,
                   CASE WHEN length(TRIM(text)) = 0
                        THEN CAST([] AS VARCHAR[])
                        ELSE string_split_regex(TRIM(text), '\s+') END AS toks
            FROM documents
        ),
        pt AS (
            SELECT doc_id,
                   unnest(toks) AS token,
                   unnest(range(1, len(toks) + 1)) AS pos
            FROM t
        ),
        tri AS (
            SELECT a.token || ' ' || b.token || ' ' || c.token AS ngram
            FROM pt a
            JOIN pt b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
            JOIN pt c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        )
        SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM tri
        GROUP BY ngram
        ORDER BY n_occurrences DESC, ngram ASC
        LIMIT 20
    """,
    "bm25_rank_docs": r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(TRIM(text), '\s+')) AS token
            FROM documents
            WHERE length(TRIM(text)) > 0
        ),
        dl AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
            FROM toks GROUP BY doc_id
        ),
        scal AS (
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
                   CAST((SELECT SUM(dl) FROM dl) AS DOUBLE)
                       / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS avgdl
        ),
        tf AS (
            SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks
            WHERE token IN ('dup', 'hash', 'vector', 'stream')
            GROUP BY doc_id, token
        ),
        idf AS (
            -- literals CAST to DOUBLE so DuckDB runs the same IEEE
            -- arithmetic as Spark (bare 0.5 types DECIMAL and the
            -- decimal division can differ by 1 ulp — ADVICE r6)
            SELECT token,
                   CAST(FLOOR(ln((((SELECT n_docs FROM scal) - COUNT(*)) + CAST(0.5 AS DOUBLE))
                                 / (COUNT(*) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) * 1000000) AS BIGINT)
                       AS idf_m
            FROM tf GROUP BY token
        ),
        contrib AS (
            SELECT tf.doc_id,
                   CAST(FLOOR((idf.idf_m * (tf.tf * CAST(2.2 AS DOUBLE)))
                        / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dl.dl / (SELECT avgdl FROM scal)))))
                       AS BIGINT) AS contrib_m
            FROM tf JOIN idf USING (token) JOIN dl USING (doc_id)
        ),
        scored AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
                   CAST(SUM(contrib_m) AS BIGINT) AS score_m
            FROM contrib GROUP BY doc_id
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_m DESC, doc_id ASC) AS INT)
                   AS rank,
               doc_id, n_hits, score_m / 1000000.0 AS score
        FROM scored
        ORDER BY score_m DESC, doc_id ASC
        LIMIT 25
    """,
    "unigram_quality_docs": r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(TRIM(text), '\s+')) AS token
            FROM documents
            WHERE length(TRIM(text)) > 0
        ),
        counts AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
        total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM counts),
        vocab AS (
            SELECT token,
                   CAST(FLOOR(ln(cnt / CAST((SELECT t FROM total) AS DOUBLE))
                              * 1000000) AS BIGINT) AS logp_m
            FROM counts
            ORDER BY cnt DESC, token ASC
            LIMIT 1000
        ),
        per_doc AS (
            SELECT tk.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
                   CAST(SUM(COALESCE(v.logp_m,
                        CAST(FLOOR(ln(1.0 / CAST((SELECT t FROM total) AS DOUBLE))
                                   * 1000000) AS BIGINT))) AS BIGINT) AS sum_m
            FROM toks tk LEFT JOIN vocab v USING (token)
            GROUP BY tk.doc_id
        )
        SELECT d.doc_id,
               COALESCE(p.n_tokens, 0) AS n_tokens,
               COALESCE(p.n_oov, 0) AS n_oov,
               CASE WHEN p.n_tokens > 0
                    THEN p.sum_m / (1000000.0 * p.n_tokens)
                    ELSE 0.0 END AS mean_logprob
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
        ORDER BY d.doc_id
    """,
    "incremental_kpis_day2": r"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
               CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_min,
               CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_max,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS price_avg
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
        ORDER BY o_orderstatus, o_orderpriority
    """,
    "zorder_layout_stats": r"""
        WITH s AS (
            SELECT MIN(o_custkey) AS mnc, MAX(o_custkey) AS mxc,
                   MIN(o_totalprice) AS mnp, MAX(o_totalprice) AS mxp
            FROM orders
        ),
        r AS (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   CAST(FLOOR(CAST(o_custkey - s.mnc AS DOUBLE) * 255.0
                              / CAST(s.mxc - s.mnc AS DOUBLE)) AS BIGINT) AS rc,
                   CAST(FLOOR(CAST(o_totalprice - s.mnp AS DOUBLE) * 255.0
                              / CAST(s.mxp - s.mnp AS DOUBLE)) AS BIGINT) AS rp
            FROM orders, s
        ),
        z AS (
            SELECT *,
                   (((rc >> 0) & 1) << 0)
                   + (((rp >> 0) & 1) << 1)
                   + (((rc >> 1) & 1) << 2)
                   + (((rp >> 1) & 1) << 3)
                   + (((rc >> 2) & 1) << 4)
                   + (((rp >> 2) & 1) << 5)
                   + (((rc >> 3) & 1) << 6)
                   + (((rp >> 3) & 1) << 7)
                   + (((rc >> 4) & 1) << 8)
                   + (((rp >> 4) & 1) << 9)
                   + (((rc >> 5) & 1) << 10)
                   + (((rp >> 5) & 1) << 11)
                   + (((rc >> 6) & 1) << 12)
                   + (((rp >> 6) & 1) << 13)
                   + (((rc >> 7) & 1) << 14)
                   + (((rp >> 7) & 1) << 15) AS z_key
            FROM r
        )
        SELECT z_key >> 11 AS z_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(o_custkey) AS BIGINT) AS custkey_lo,
               CAST(MAX(o_custkey) AS BIGINT) AS custkey_hi,
               MIN(o_totalprice) AS price_lo,
               MAX(o_totalprice) AS price_hi
        FROM z
        GROUP BY z_bucket
        ORDER BY z_bucket
    """,
    "bigram_quality_docs": r"""
        WITH t AS (
            SELECT doc_id,
                   CASE WHEN length(TRIM(text)) = 0
                        THEN CAST([] AS VARCHAR[])
                        ELSE string_split_regex(TRIM(text), '\s+') END AS toks
            FROM documents
        ),
        pt AS (
            SELECT doc_id,
                   unnest(toks) AS token,
                   unnest(range(1, len(toks) + 1)) AS pos
            FROM t
        ),
        uni AS (SELECT token, COUNT(*) AS cnt FROM pt GROUP BY token),
        total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM uni),
        big AS (
            SELECT a.token AS prev, b.token AS cur, COUNT(*) AS c_pc
            FROM pt a JOIN pt b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
            GROUP BY 1, 2
        ),
        bigv AS (
            SELECT bc.prev, bc.cur,
                   CAST(FLOOR(ln(0.7 * (bc.c_pc / CAST(up.cnt AS DOUBLE))
                                 + 0.3 * (uc.cnt / CAST((SELECT t FROM total) AS DOUBLE)))
                              * 1000000) AS BIGINT) AS big_m
            FROM (SELECT * FROM big
                  ORDER BY c_pc DESC, prev ASC, cur ASC LIMIT 4000) bc
            JOIN uni up ON up.token = bc.prev
            JOIN uni uc ON uc.token = bc.cur
        ),
        univ AS (
            SELECT token,
                   CAST(FLOOR(ln(cnt / CAST((SELECT t FROM total) AS DOUBLE))
                              * 1000000) AS BIGINT) AS uni0_m,
                   CAST(FLOOR(ln(0.3 * (cnt / CAST((SELECT t FROM total) AS DOUBLE)))
                              * 1000000) AS BIGINT) AS fb_m
            FROM uni ORDER BY cnt DESC, token ASC LIMIT 1000
        ),
        first_s AS (
            SELECT pt.doc_id,
                   COALESCE(v.uni0_m,
                        CAST(FLOOR(ln(1.0 / CAST((SELECT t FROM total) AS DOUBLE))
                                   * 1000000) AS BIGINT)) AS m,
                   CAST(0 AS BIGINT) AS hit
            FROM pt LEFT JOIN univ v USING (token)
            WHERE pt.pos = 1
        ),
        rest_s AS (
            SELECT a.doc_id,
                   COALESCE(bv.big_m, v.fb_m,
                        CAST(FLOOR(ln(0.3 * (1.0 / CAST((SELECT t FROM total) AS DOUBLE)))
                                   * 1000000) AS BIGINT)) AS m,
                   CASE WHEN bv.big_m IS NOT NULL
                        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS hit
            FROM pt a
            JOIN pt p ON p.doc_id = a.doc_id AND p.pos = a.pos - 1
            LEFT JOIN bigv bv ON bv.prev = p.token AND bv.cur = a.token
            LEFT JOIN univ v ON v.token = a.token
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(hit) AS BIGINT) AS n_bigram_hits,
                   CAST(SUM(m) AS BIGINT) AS sum_m
            FROM (SELECT * FROM first_s UNION ALL SELECT * FROM rest_s)
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(p.n_tokens, 0) AS n_tokens,
               COALESCE(p.n_bigram_hits, 0) AS n_bigram_hits,
               CASE WHEN p.n_tokens > 0
                    THEN p.sum_m / (1000000.0 * p.n_tokens)
                    ELSE 0.0 END AS mean_logprob
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
        ORDER BY d.doc_id
    """,
    "gopher_quality_docs": r"""
        WITH t AS (
            SELECT doc_id,
                   CASE WHEN length(TRIM(text)) = 0
                        THEN CAST([] AS VARCHAR[])
                        ELSE string_split_regex(TRIM(text), '\s+') END AS toks,
                   text
            FROM documents
        ), m AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_words,
                   length(regexp_replace(text, '\s', '', 'g'))
                       / GREATEST(len(toks), 1) AS mean_word_len,
                   (length(regexp_replace(text, '[^#…]', '', 'g'))
                    + len(regexp_extract_all(text, '\.\.\.')))
                       / GREATEST(len(toks), 1) AS symbol_ratio,
                   len(list_filter(toks, x -> lower(x) IN
                       ('the','and','of','to','in','is','you','that','it','for')))
                       AS stop_hits
            FROM t
        )
        SELECT doc_id, n_words, mean_word_len, symbol_ratio,
               CAST(n_words >= 10 AND n_words <= 200 AS INTEGER)
                   AS flag_word_count,
               CAST(mean_word_len >= 2.0 AND mean_word_len <= 12.0 AS INTEGER)
                   AS flag_mean_word_len,
               CAST(symbol_ratio <= 0.1 AS INTEGER) AS flag_symbol_ratio,
               CAST(stop_hits >= 2 AS INTEGER) AS flag_stopwords,
               CAST(n_words >= 10 AND n_words <= 200
                    AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
                    AND symbol_ratio <= 0.1 AND stop_hits >= 2 AS INTEGER)
                   AS keep
        FROM m
        ORDER BY doc_id
    """,
    "chunk_documents_rag": r"""
        WITH t AS (
            SELECT doc_id,
                   CASE WHEN length(TRIM(text)) = 0
                        THEN CAST([] AS VARCHAR[])
                        ELSE string_split_regex(TRIM(text), '\s+') END AS toks
            FROM documents
        ), c AS (
            SELECT doc_id, toks, len(toks) AS n,
                   CASE WHEN len(toks) <= 8 THEN 1
                        ELSE ((len(toks) - 8 + 5) // 6) + 1 END AS n_chunks
            FROM t
        )
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_idx,
               CAST(len(toks[i * 6 + 1 : i * 6 + 8]) AS BIGINT) AS n_tokens,
               array_to_string(toks[i * 6 + 1 : i * 6 + 8], ' ') AS chunk_text
        FROM c CROSS JOIN UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
        ORDER BY doc_id, chunk_idx
    """,
    "token_jaccard_pairs": r"""
        WITH toks AS (
            SELECT doc_id, list_distinct(string_split_regex(TRIM(text), '\s+')) AS ws
            FROM documents WHERE doc_id < 100
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.ws, b.ws))
                   / len(list_distinct(list_concat(a.ws, b.ws))) AS jaccard
        FROM toks a JOIN toks b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.ws, b.ws))
                  / len(list_distinct(list_concat(a.ws, b.ws))) >= 0.9
    """,
    "ann_cosine_topk": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT * FROM e WHERE vec_id < 10),
        pairs AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CASE WHEN sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)) = 0
                        THEN 0.0
                        ELSE list_dot_product(q.v, c.v)
                             / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))
                   END AS cos
            FROM e c, q WHERE c.vec_id <> q.vec_id
        )
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
               cos AS cosine_sim
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC
            ) AS rank FROM pairs
        ) WHERE rank <= 5
    """,
    "embedding_near_pairs": """
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CASE WHEN sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)) = 0
                    THEN 0.0
                    ELSE list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
               END AS cosine_sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE CASE WHEN sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)) = 0
                   THEN 0.0
                   ELSE list_dot_product(a.v, b.v)
                        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
              END >= 0.4
    """,
    "interval_join_stream": """
        WITH e AS (
            SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
            FROM events
        )
        SELECT v.user_id,
               v.event_id AS view_id,
               c.event_id AS click_id
        FROM e v JOIN e c
          ON v.event_type = 'view' AND c.event_type = 'click'
         AND c.user_id = v.user_id
         AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
        ORDER BY v.user_id, view_id, click_id
    """,
    "events_tumbling_daily": """
        WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events)
        SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS window_start,
               make_timestamp((epoch_us(ts) // 86400000000) * 86400000000
                              + 86400000000)                               AS window_end,
               event_type,
               COUNT(*)             AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM e
        GROUP BY 1, 2, 3
    """,
    "events_sliding_6h": """
        WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        w AS (
            SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000
                                  - k * 21600000000) AS window_start,
                   value
            FROM e CROSS JOIN (SELECT unnest(range(0, 4)) AS k)
        )
        SELECT window_start,
               window_start + INTERVAL 1 DAY AS window_end,
               COUNT(*)             AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM w
        GROUP BY 1, 2
    """,
    "events_sessions_2h": """
        WITH e AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                   CASE WHEN ts - LAG(CAST(ts AS TIMESTAMP))
                            OVER (PARTITION BY user_id ORDER BY ts) < INTERVAL 2 HOUR
                        THEN 0 ELSE 1 END AS new_s
            FROM events
        ), g AS (
            SELECT *, SUM(new_s) OVER (
                PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
            ) AS sid FROM e
        )
        SELECT user_id,
               MIN(ts)                     AS session_start,
               MAX(ts) + INTERVAL 2 HOUR   AS session_end,
               COUNT(*)                    AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)        AS total_value
        FROM g GROUP BY user_id, sid
    """,
    "media_metadata": """
        -- real generated PNGs, stored-deflate: total bytes = sig 8 +
        -- IHDR 25 + IDAT (12 + 2 + 5 + raw + 4) + IEND 12 with raw =
        -- h * (1 + 3*16) scanline bytes, h = 8 + doc_id % 9
        SELECT doc_id AS media_id,
               'image/png' AS media_type,
               CAST(49 * (8 + doc_id % 9) + 68 AS BIGINT) AS n_bytes
        FROM documents
    """,
    "asof_events_orders": """
        WITH o AS (
            SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
            FROM orders
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC
            ) = 1
        )
        SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts, e.user_id,
               o.o_orderkey, o.o_totalprice
        FROM events e
        ASOF LEFT JOIN o
          ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) >= o.o_orderdate
    """,
    "payments_decimal_rollup": """
        SELECT event_type,
               COUNT(*) AS n_payments,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                    AS DOUBLE) AS total_value,
               CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
               CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "stateful_running_totals": """
        SELECT user_id,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(COALESCE(value, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY user_id
    """,
    # The drained MERGE target is fully deterministic: the doubled source's
    # copies are byte-identical rows, dedup-within-watermark (30-day delay
    # > the data span) collapses them regardless of batch assignment, and
    # the keyed MERGE then lands exactly one pass-through row per unique
    # event_id (no arithmetic — value is IEEE-exact from the same parquet).
    # So the final state ≡ the distinct source relation (r15 promotion:
    # rows-only → hash-exact; the interval_join_stream precedent that a
    # streaming drain can carry a full SQL oracle).
    "stream_upsert_replay": """
        SELECT event_id, user_id, value FROM events
    """,
    "decimal_star_rollup": """
        SELECT n_name, l_returnflag,
               COUNT(*) AS n_lines,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                         AS DECIMAL(38,2)) AS DOUBLE) AS gross_total,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                             * (CAST('1.00' AS DECIMAL(3,2))
                                - CAST(l_discount AS DECIMAL(4,2))))
                         AS DECIMAL(38,4)) AS DOUBLE) AS revenue_total
        FROM lineitem
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation    ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, l_returnflag)
    """,
    "asof_forward_tolerance": """
        WITH o AS (
            SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
            FROM orders
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC
            ) = 1
        )
        SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts, e.user_id,
               o.o_orderkey, o.o_totalprice
        FROM events e
        LEFT JOIN o
          ON e.user_id = o.o_custkey
         AND o.o_orderdate >= CAST(e.ts AS TIMESTAMP)
         AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP) + INTERVAL 30 DAY
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY e.event_id ORDER BY o.o_orderdate ASC
        ) = 1
    """,
    "range_join_business_hours": """
        WITH days AS (
            SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL 6 HOUR  AS win_start,
                            date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL 18 HOUR AS win_end
            FROM events
        )
        SELECT d.win_start, d.win_end,
               COUNT(*)             AS n_events,
               CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events e JOIN days d
          ON CAST(e.ts AS TIMESTAMP) >= d.win_start
         AND CAST(e.ts AS TIMESTAMP) <  d.win_end
        GROUP BY d.win_start, d.win_end
    """,
    "status_pivot_by_priority": """
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_o,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_p
        FROM orders
        GROUP BY o_orderpriority
    """,
    "price_percentiles_by_status": """
        SELECT o_orderstatus,
               ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
               ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
               ROUND(quantile_cont(o_totalprice, 0.90), 4) AS p90
        FROM orders
        GROUP BY o_orderstatus
    """,
    "sales_cube": """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*)                    AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "token_counts_docs": r"""
        SELECT doc_id,
               CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                    ELSE CAST(len(string_split_regex(TRIM(text), '\s+')) AS INT)
               END AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT)
                   AS n_bpe_tokens
        FROM documents
    """,
    "grouping_sets_orders": """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*)                    AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
    "shipping_priority_top10": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1996-03-15'
          AND l_shipdate  > TIMESTAMP '1996-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "brand_nation_volume": """
        SELECT p_brand, n_name,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (CAST(1 AS DECIMAL(18,2))
                                 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                    AS DOUBLE)                                   AS revenue,
               ROUND(SUM(l_quantity), 2)                         AS sum_qty,
               COUNT(*)                                          AS n_lines
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        GROUP BY p_brand, n_name
    """,
    "curate_documents": r"""
        WITH feat AS (
            SELECT doc_id,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE CAST(len(string_split_regex(TRIM(text), '\s+')) AS INT)
                   END AS n_tokens,
                   CAST(LENGTH(text) AS INT) AS n_chars,
                   LENGTH(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                       / GREATEST(LENGTH(text), 1) AS praw,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE len(list_filter(string_split_regex(TRIM(text), '\s+'),
                             x -> lower(x) IN ('the','and','of','to','in','is','you','that','it','for')))
                   END AS en,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE len(list_filter(string_split_regex(TRIM(text), '\s+'),
                             x -> lower(x) IN ('el','la','de','que','y','en','un','los','se','no')))
                   END AS es,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE len(list_filter(string_split_regex(TRIM(text), '\s+'),
                             x -> lower(x) IN ('der','die','und','in','den','von','zu','das','mit','sich')))
                   END AS de,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE len(list_filter(string_split_regex(TRIM(text), '\s+'),
                             x -> lower(x) IN ('le','la','de','et','les','des','en','un','du','une')))
                   END AS fr,
                   md5(TRIM(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
            FROM documents
        ), scored AS (
            SELECT doc_id, n_tokens, n_chars, fp,
                   CASE WHEN en >= es AND en >= de AND en >= fr THEN 'en'
                        WHEN es >= de AND es >= fr THEN 'es'
                        WHEN de >= fr THEN 'de'
                        ELSE 'fr' END AS pred_lang,
                   0.3 * LEAST(n_tokens / 50.0, 1.0)
                       + 0.3 * (1.0 - LEAST(praw * 5, 1.0))
                       + 0.4 * LEAST((en / GREATEST(n_tokens, 1)) * 4, 1.0) AS quality
            FROM feat
        )
        SELECT doc_id, quality, n_tokens, n_chars, fp
        FROM scored
        WHERE pred_lang = 'en' AND quality >= 0.5
        QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id ASC) = 1
    """,
    "scd2_customer_status": """
        WITH versions AS (
            SELECT o_custkey, o_orderdate, o_orderstatus
            FROM orders
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC
            ) = 1
        ), lagged AS (
            SELECT *,
                   LAG(o_orderdate)   OVER w AS prev_ts,
                   LAG(o_orderstatus) OVER w AS prev_status
            FROM versions
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
        ), runs AS (
            SELECT *,
                   SUM(CASE WHEN prev_ts IS NULL
                             OR o_orderstatus IS DISTINCT FROM prev_status
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate
                       ROWS UNBOUNDED PRECEDING
                   ) AS run
            FROM lagged
        ), per_run AS (
            SELECT o_custkey, run,
                   MIN(o_orderstatus) AS o_orderstatus,
                   MIN(o_orderdate)   AS valid_from
            FROM runs GROUP BY o_custkey, run
        )
        SELECT o_custkey, o_orderstatus, valid_from,
               LEAD(valid_from) OVER wv            AS valid_to,
               LEAD(valid_from) OVER wv IS NULL    AS is_current
        FROM per_run
        WINDOW wv AS (PARTITION BY o_custkey ORDER BY valid_from)
    """,
    "referential_integrity_qc": """
        SELECT
            CAST((SELECT COUNT(*) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_orderkey = l.l_orderkey))
                 AS BIGINT) AS orphans_lineitem_orders,
            CAST((SELECT COUNT(*) FROM orders o
                  WHERE NOT EXISTS (SELECT 1 FROM customer c
                                    WHERE c.c_custkey = o.o_custkey))
                 AS BIGINT) AS orphans_orders_customer,
            CAST((SELECT COUNT(*) FROM customer c
                  WHERE NOT EXISTS (SELECT 1 FROM nation n
                                    WHERE n.n_nationkey = c.c_nationkey))
                 AS BIGINT) AS orphans_customer_nation
    """,
    "orders_pit_status": """
        WITH versions AS (
            SELECT o_custkey, o_orderdate, o_orderstatus
            FROM orders
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC
            ) = 1
        ), lagged AS (
            SELECT *,
                   LAG(o_orderdate)   OVER w AS prev_ts,
                   LAG(o_orderstatus) OVER w AS prev_status
            FROM versions
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
        ), runs AS (
            SELECT *,
                   SUM(CASE WHEN prev_ts IS NULL
                             OR o_orderstatus IS DISTINCT FROM prev_status
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate
                       ROWS UNBOUNDED PRECEDING
                   ) AS run
            FROM lagged
        ), per_run AS (
            SELECT o_custkey, run,
                   MIN(o_orderstatus) AS o_orderstatus,
                   MIN(o_orderdate)   AS valid_from
            FROM runs GROUP BY o_custkey, run
        ), hist AS (
            SELECT o_custkey, o_orderstatus, valid_from,
                   LEAD(valid_from) OVER wv AS valid_to
            FROM per_run
            WINDOW wv AS (PARTITION BY o_custkey ORDER BY valid_from)
        )
        SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
               h.o_orderstatus AS status_at_order
        FROM orders o
        LEFT JOIN hist h
          ON h.o_custkey = o.o_custkey
         AND o.o_orderdate >= h.valid_from
         AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)
        ORDER BY o.o_orderkey
    """,
    "customer_cohorts_setops": """
        WITH y2000 AS (
            SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 2000
        ), y2001 AS (
            SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 2001
        )
        SELECT o_custkey, 'retained' AS cohort
        FROM (SELECT * FROM y2000 INTERSECT SELECT * FROM y2001)
        UNION ALL
        SELECT o_custkey, 'churned' AS cohort
        FROM (SELECT * FROM y2000 EXCEPT SELECT * FROM y2001)
    """,
    "unpivot_status_revenue": """
        WITH wide AS (
            SELECT o_orderpriority,
                   CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_f,
                   CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_o,
                   CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_p
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, 'F' AS o_orderstatus, rev_f AS revenue FROM wide
        UNION ALL
        SELECT o_orderpriority, 'O', rev_o FROM wide
        UNION ALL
        SELECT o_orderpriority, 'P', rev_p FROM wide
    """,
    "order_extremes_by_customer": """
        SELECT o_custkey,
               arg_max(o_totalprice, o_orderkey) AS latest_order_price,
               arg_min(o_totalprice, o_orderkey) AS first_order_price,
               MAX(o_orderkey)                   AS max_orderkey,
               COUNT(*)                          AS n_orders
        FROM orders GROUP BY o_custkey
    """,
    "conditional_agg_orders": """
        SELECT o_orderstatus,
               COUNT(*)                                              AS n_orders,
               COUNT(*) FILTER (WHERE o_totalprice > 150000)         AS n_big,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_totalprice > 150000) AS DOUBLE)
                                                                     AS big_rev,
               CAST(SUM(CAST(o_totalprice > 150000 AS INT)) AS DOUBLE) / COUNT(*) AS big_share
        FROM orders GROUP BY o_orderstatus
    """,
    "order_priority_exists": """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > TIMESTAMP '2000-06-01'
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "customer_order_distribution": """
        WITH per_cust AS (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS revenue
            FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        ), bucketed AS (
            SELECT c_count,
                   NTILE(4) OVER (
                       ORDER BY coalesce(revenue, 0.0) DESC, c_custkey ASC
                   ) AS quartile
            FROM per_cust
        )
        SELECT c_count, quartile, COUNT(*) AS n_customers
        FROM bucketed
        GROUP BY c_count, quartile
        ORDER BY n_customers DESC, c_count DESC, quartile ASC
    """,
    "idle_customer_balance": """
        SELECT c_nationkey,
               COUNT(*)                 AS n_custs,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 2001
        )
          AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                               / COUNT(c_acctbal)
                           FROM customer WHERE c_acctbal > 0.0)
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    "dataset_split_summary": r"""
        WITH b AS (
            SELECT text, source, lang,
                   CAST(concat('0x', substr(md5(text), 1, 8)) AS UBIGINT) % 10000
                       AS bucket,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE CAST(len(string_split_regex(TRIM(text), '\s+')) AS INT)
                   END AS n_tokens
            FROM documents
        )
        SELECT CASE WHEN bucket < 9000 THEN 'train'
                    WHEN bucket < 9500 THEN 'val'
                    ELSE 'test' END          AS split,
               COUNT(*)                      AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               COUNT(DISTINCT source)::BIGINT AS n_sources,
               COUNT(DISTINCT lang)::BIGINT   AS n_langs,
               CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
               (COUNT(*) - COUNT(DISTINCT text))::BIGINT AS exact_dup_docs,
               (COUNT(*) - COUNT(DISTINCT text)) / COUNT(*) AS dup_rate
        FROM b
        GROUP BY 1
        ORDER BY 1
    """,
    "stratified_sample_docs": """
        WITH h AS (
            SELECT doc_id, lang,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS UBIGINT) AS hb
            FROM documents
        )
        SELECT doc_id, lang, CAST(rk AS INT) AS sample_rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY lang ORDER BY hb ASC, doc_id ASC
            ) AS rk FROM h
        ) WHERE rk <= 20
    """,
    "pack_sequences_docs": r"""
        WITH t AS (
            SELECT doc_id,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE CAST(len(string_split_regex(TRIM(text), '\s+')) AS INT)
                   END AS n_tokens,
                   CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS UBIGINT) % 16 AS BIGINT) AS shard
            FROM documents
        ), c AS (
            SELECT doc_id, n_tokens, shard,
                   CAST(SUM(n_tokens) OVER (
                       PARTITION BY shard
                       ORDER BY doc_id ROWS UNBOUNDED PRECEDING
                   ) - n_tokens AS BIGINT) AS start_offset
            FROM t
        )
        SELECT doc_id, n_tokens, shard, start_offset,
               CAST(FLOOR(start_offset / 2048.0) AS BIGINT) AS bin_id
        FROM c
    """,
    "skewed_join_salted": """
        WITH big AS (
            SELECT o_totalprice,
                   CASE WHEN o_orderkey % 10 < 9 THEN 0
                        ELSE o_custkey % 24 + 1 END AS hot_key
            FROM orders
        ), dim AS (
            SELECT n_nationkey AS hot_key, n_name FROM nation
        )
        SELECT n_name,
               COUNT(*)                       AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                              AS revenue
        FROM big JOIN dim USING (hot_key)
        GROUP BY n_name
        ORDER BY n_name
    """,
    "resample_daily_ffill": r"""
        WITH daily AS (
            SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(value) AS avg_value
            FROM events GROUP BY 1
        ),
        spine AS (
            SELECT UNNEST(generate_series(
                       MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)),
                       MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)),
                       INTERVAL 1 DAY))::DATE AS day
            FROM events
        )
        SELECT s.day,
               COALESCE(d.n_events, 0) AS n_events,
               LAST_VALUE(d.avg_value IGNORE NULLS) OVER (
                   ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS avg_value_ffill
        FROM spine s LEFT JOIN daily d USING (day)
        ORDER BY s.day
    """,
    "cumulative_distinct_users": r"""
        WITH fs AS (
            SELECT user_id,
                   MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS first_day
            FROM events GROUP BY 1
        ),
        dn AS (SELECT first_day AS day, COUNT(*) AS new_users FROM fs GROUP BY 1),
        spine AS (
            SELECT UNNEST(generate_series(
                       MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)),
                       MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)),
                       INTERVAL 1 DAY))::DATE AS day
            FROM events
        )
        SELECT s.day,
               COALESCE(dn.new_users, 0) AS new_users,
               CAST(SUM(COALESCE(dn.new_users, 0)) OVER (
                   ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_users
        FROM spine s LEFT JOIN dn USING (day)
        ORDER BY s.day
    """,
    "cohort_retention": r"""
        WITH weekly AS (
            SELECT DISTINCT user_id AS u,
                   CAST(FLOOR(date_diff('day', DATE '1970-01-05',
                        CAST(CAST(ts AS TIMESTAMP) AS DATE)) / 7) AS BIGINT) AS week
            FROM events
        ),
        cohort AS (SELECT u, MIN(week) AS cohort_week FROM weekly GROUP BY u)
        SELECT cohort_week, week - cohort_week AS week_offset,
               COUNT(*) AS n_users
        FROM weekly JOIN cohort USING (u)
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "funnel_conversion": r"""
        WITH r0 AS (
            SELECT user_id AS u, MIN(CAST(ts AS TIMESTAMP)) AS t0
            FROM events WHERE event_type = 'view' GROUP BY 1
        ),
        r1 AS (
            SELECT e.user_id AS u, MIN(CAST(e.ts AS TIMESTAMP)) AS t1
            FROM events e JOIN r0 ON e.user_id = r0.u
            WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > r0.t0
            GROUP BY 1
        ),
        r2 AS (
            SELECT e.user_id AS u, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
            FROM events e JOIN r1 ON e.user_id = r1.u
            WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > r1.t1
            GROUP BY 1
        )
        SELECT (SELECT COUNT(*) FROM r0) AS n_view,
               (SELECT COUNT(*) FROM r1) AS n_click,
               (SELECT COUNT(*) FROM r2) AS n_purchase
    """,
    "salient_terms": r"""
        WITH toks AS (
            SELECT doc_id,
                   UNNEST(string_split_regex(TRIM(text), '\s+')) AS token
            FROM documents WHERE LENGTH(TRIM(text)) > 0
        ),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        scored AS (
            SELECT doc_id, token, tf, df, tf::DOUBLE / df AS raw
            FROM tf JOIN dfreq USING (token)
        )
        SELECT doc_id, token, tf, df, raw AS score,
               CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY raw DESC, token ASC) AS rn
            FROM scored
        )
        WHERE rn <= 5
    """,
    "decontaminate_docs": r"""
        WITH toks AS (
            SELECT doc_id, source,
                   string_split_regex(TRIM(text), '\s+') AS t
            FROM documents
        ),
        gramlists AS (
            -- mirror word_ngrams: docs with <= 3 tokens get one whole-text
            -- shingle (empty text included: [''] on both engines)
            SELECT doc_id, source,
                   CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
                        ELSE [array_to_string(t[i:i+2], ' ')
                              FOR i IN generate_series(1, len(t) - 2)]
                   END AS gs
            FROM toks
        ),
        bench AS (
            SELECT DISTINCT g
            FROM gramlists, UNNEST(gs) AS u(g)
            WHERE source = 'src0'
        ),
        doc_grams AS (
            SELECT DISTINCT doc_id, g
            FROM gramlists, UNNEST(gs) AS u(g)
            WHERE source <> 'src0'
        ),
        per_doc AS (
            SELECT d.doc_id,
                   COUNT(*)::BIGINT AS total_ngrams,
                   COUNT(b.g)::BIGINT AS matched_ngrams
            FROM doc_grams d LEFT JOIN bench b USING (g)
            GROUP BY d.doc_id
        )
        SELECT doc_id, total_ngrams, matched_ngrams,
               matched_ngrams / total_ngrams AS contamination,
               CAST(matched_ngrams / total_ngrams >= 0.8 AS INT) AS contaminated
        FROM per_doc
    """,
    "min_cost_supplier": """
        WITH unit AS (
            SELECT l_partkey, l_suppkey,
                   l_extendedprice / l_quantity AS up
            FROM lineitem
        ),
        per_ps AS (
            SELECT l_partkey, l_suppkey, MIN(up) AS min_unit_price
            FROM unit GROUP BY 1, 2
        ),
        best AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY l_partkey
                    ORDER BY min_unit_price ASC, l_suppkey ASC) AS rn
                FROM per_ps
            ) WHERE rn = 1
        )
        SELECT p_partkey, p_name, s_suppkey, s_name,
               min_unit_price AS best_unit_price
        FROM best
        JOIN part ON l_partkey = p_partkey AND p_size < 10
        JOIN supplier ON l_suppkey = s_suppkey
        ORDER BY p_partkey
    """,
    "important_suppliers": """
        WITH per_supp AS (
            SELECT l_suppkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                       * (CAST('1.00' AS DECIMAL(3,2))
                          - CAST(l_discount AS DECIMAL(3,2)))) AS rev_dec
            FROM lineitem GROUP BY 1
        )
        SELECT l_suppkey, CAST(ROUND(rev_dec, 2) AS DOUBLE) AS supp_revenue
        FROM per_supp
        WHERE CAST(rev_dec AS DOUBLE) > (
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                       * (CAST('1.00' AS DECIMAL(3,2))
                          - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) * 0.001
            FROM lineitem
        )
        ORDER BY supp_revenue DESC, l_suppkey ASC
    """,
    "top_quarter_shippers": """
        WITH v AS (
            SELECT year(l_shipdate)::VARCHAR || '-Q' || quarter(l_shipdate)::VARCHAR
                       AS quarter,
                   l_suppkey,
                   CAST(SUM(l_quantity) AS BIGINT) AS total_qty
            FROM lineitem GROUP BY 1, 2
        ),
        m AS (SELECT quarter, MAX(total_qty) AS max_qty FROM v GROUP BY 1)
        SELECT v.quarter, s_suppkey, s_name, total_qty
        FROM v
        JOIN m ON v.quarter = m.quarter AND v.total_qty = m.max_qty
        JOIN supplier ON l_suppkey = s_suppkey
        ORDER BY v.quarter, s_suppkey
    """,
    "part_supplier_breadth": """
        WITH pairs AS (
            SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
            )
        )
        SELECT p_brand, p_type, p_size,
               COUNT(*)::BIGINT AS supplier_cnt
        FROM pairs
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "domain_mix_allocation": r"""
        WITH per AS (
            SELECT source AS domain,
                   COUNT(*)::BIGINT AS doc_count,
                   CAST(SUM(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                                 ELSE len(string_split_regex(TRIM(text), '\s+'))
                            END) AS BIGINT) AS token_count
            FROM documents GROUP BY 1
        ),
        tot AS (SELECT SUM(token_count)::BIGINT AS total FROM per)
        SELECT domain, doc_count, token_count,
               token_count / total AS share,
               LEAST(token_count, CAST(FLOOR(0.08 * total) AS BIGINT))
                   AS alloc_tokens,
               CAST(token_count > CAST(FLOOR(0.08 * total) AS BIGINT) AS INT)
                   AS capped
        FROM per, tot
        ORDER BY domain
    """,
    "trade_volume_q7": """
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE cn.n_name IN ('NATION_1', 'NATION_2')
          AND sn.n_name IN ('NATION_1', 'NATION_2')
          AND cn.n_name <> sn.n_name
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "market_share_q8": """
        SELECT year(o_orderdate) AS o_year,
               CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                              THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                   * (CAST('1.00' AS DECIMAL(3,2))
                                      - CAST(l_discount AS DECIMAL(3,2)))
                              ELSE CAST('0.0000' AS DECIMAL(16,4)) END) AS DOUBLE)
                   / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (CAST('1.00' AS DECIMAL(3,2))
                             - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS mkt_share
        FROM lineitem
        JOIN part      ON l_partkey = p_partkey
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region    ON cn.n_regionkey = r_regionkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
        GROUP BY o_year
        ORDER BY o_year
    """,
    "large_quantity_orders_q18": """
        WITH heavy AS (
            SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING ROUND(SUM(l_quantity), 2) > 300.0
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM orders
        JOIN heavy    ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
        LIMIT 100
    """,
    "bracket_revenue_q19": """
        SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "sole_return_supplier_q21": """
        WITH l1 AS (
            SELECT DISTINCT l_orderkey, l_suppkey
            FROM lineitem WHERE l_returnflag = 'R'
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
                SELECT 1 FROM lineitem l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 100
    """,
    "near_dup_clusters": r"""
        WITH RECURSIVE toks AS (
            SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS t
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   CASE WHEN len(t) <= 5 THEN array_to_string(t, ' ')
                        ELSE array_to_string(t[i.i:i.i+4], ' ') END AS shingle
            FROM toks, UNNEST(range(1, GREATEST(len(t) - 4, 1) + 1)) AS i(i)
        ),
        rare AS (
            SELECT shingle FROM sh GROUP BY shingle
            HAVING COUNT(*) BETWEEN 2 AND 10
        ),
        edges AS (
            SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
            FROM sh a JOIN sh b USING (shingle)
            WHERE a.doc_id < b.doc_id
              AND shingle IN (SELECT shingle FROM rare)
        ),
        bidir AS (
            SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
        ),
        labels AS (
            SELECT u AS node, u AS comp FROM bidir
            UNION
            SELECT b.v AS node, l.comp
            FROM labels l JOIN bidir b ON b.u = l.node
        ),
        comp AS (
            SELECT node AS doc_id, MIN(comp) AS cluster_id
            FROM labels GROUP BY node
        )
        SELECT d.doc_id,
               COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
               COALESCE(c.cluster_id, d.doc_id) = d.doc_id AS keep
        FROM documents d LEFT JOIN comp c USING (doc_id)
    """,
    "pretraining_prep": r"""
        WITH RECURSIVE t0 AS (
            SELECT doc_id, text,
                   CASE WHEN length(TRIM(text)) = 0
                        THEN CAST([] AS VARCHAR[])
                        ELSE string_split_regex(TRIM(text), '\s+') END AS toks
            FROM documents
        ),
        m AS (
            SELECT doc_id, text, toks,
                   CAST(len(toks) AS BIGINT) AS n_words,
                   length(regexp_replace(text, '\s', '', 'g'))
                       / GREATEST(len(toks), 1) AS mean_word_len,
                   (length(regexp_replace(text, '[^#…]', '', 'g'))
                    + len(regexp_extract_all(text, '\.\.\.')))
                       / GREATEST(len(toks), 1) AS symbol_ratio,
                   len(list_filter(toks, x -> lower(x) IN
                       ('the','and','of','to','in','is','you','that','it','for')))
                       AS stop_hits
            FROM t0
        ),
        gated AS (
            SELECT doc_id, text FROM m
            WHERE n_words >= 10 AND n_words <= 200
              AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
              AND symbol_ratio <= 0.1 AND stop_hits >= 2
        ),
        ded AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       ROW_NUMBER() OVER (
                           PARTITION BY md5(text) ORDER BY doc_id
                       ) AS rn
                FROM gated
            ) WHERE rn = 1
        ),
        dtoks AS (
            SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS t
            FROM ded
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   CASE WHEN len(t) <= 5 THEN array_to_string(t, ' ')
                        ELSE array_to_string(t[i.i:i.i+4], ' ') END AS shingle
            FROM dtoks, UNNEST(range(1, GREATEST(len(t) - 4, 1) + 1)) AS i(i)
        ),
        rare AS (
            SELECT shingle FROM sh GROUP BY shingle
            HAVING COUNT(*) BETWEEN 2 AND 10
        ),
        edges AS (
            SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
            FROM sh a JOIN sh b USING (shingle)
            WHERE a.doc_id < b.doc_id
              AND shingle IN (SELECT shingle FROM rare)
        ),
        bidir AS (
            SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
        ),
        labels AS (
            SELECT u AS node, u AS comp FROM bidir
            UNION
            SELECT b.v AS node, l.comp
            FROM labels l JOIN bidir b ON b.u = l.node
        ),
        comp AS (
            SELECT node AS doc_id, MIN(comp) AS cluster_id
            FROM labels GROUP BY node
        ),
        assigned AS (
            SELECT d.doc_id, d.text,
                   COALESCE(c.cluster_id, d.doc_id) AS cluster_id
            FROM ded d LEFT JOIN comp c USING (doc_id)
        ),
        train AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))
                            AS UBIGINT) % 10000 AS bucket
                FROM assigned
            ) WHERE bucket < 9000
        ),
        ttoks AS (
            SELECT doc_id,
                   CASE WHEN length(TRIM(text)) = 0
                        THEN CAST([] AS VARCHAR[])
                        ELSE string_split_regex(TRIM(text), '\s+') END AS t
            FROM train
        ),
        counted AS (
            SELECT doc_id, t, len(t) AS n,
                   CASE WHEN len(t) <= 8 THEN 1
                        ELSE ((len(t) - 8 + 5) // 6) + 1 END AS n_chunks
            FROM ttoks
        )
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_idx,
               CAST(len(t[i * 6 + 1 : i * 6 + 8]) AS BIGINT) AS n_tokens,
               array_to_string(t[i * 6 + 1 : i * 6 + 8], ' ') AS chunk_text
        FROM counted CROSS JOIN UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
    """,
    "leakage_safe_split": r"""
        WITH RECURSIVE toks AS (
            SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS t
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   CASE WHEN len(t) <= 5 THEN array_to_string(t, ' ')
                        ELSE array_to_string(t[i.i:i.i+4], ' ') END AS shingle
            FROM toks, UNNEST(range(1, GREATEST(len(t) - 4, 1) + 1)) AS i(i)
        ),
        rare AS (
            SELECT shingle FROM sh GROUP BY shingle
            HAVING COUNT(*) BETWEEN 2 AND 10
        ),
        edges AS (
            SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
            FROM sh a JOIN sh b USING (shingle)
            WHERE a.doc_id < b.doc_id
              AND shingle IN (SELECT shingle FROM rare)
        ),
        bidir AS (
            SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
        ),
        labels AS (
            SELECT u AS node, u AS comp FROM bidir
            UNION
            SELECT b.v AS node, l.comp
            FROM labels l JOIN bidir b ON b.u = l.node
        ),
        comp AS (
            SELECT node AS doc_id, MIN(comp) AS cluster_id
            FROM labels GROUP BY node
        ),
        assigned AS (
            SELECT d.doc_id,
                   COALESCE(c.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp c USING (doc_id)
        ),
        b AS (
            SELECT doc_id, cluster_id,
                   CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))
                        AS UBIGINT) % 10000 AS bucket
            FROM assigned
        )
        SELECT doc_id, cluster_id,
               CASE WHEN bucket < 9000 THEN 'train'
                    WHEN bucket < 9500 THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    """,
    "dpp_priority_revenue": """
        WITH dim AS (
            SELECT * FROM (VALUES
                ('1-URGENT', 'expedite'),
                ('2-HIGH', 'expedite'),
                ('3-MEDIUM', 'standard'),
                ('4-NOT SPECIFIED', 'standard'),
                ('5-LOW', 'deferred')
            ) AS t(o_orderpriority, tier)
            WHERE tier = 'expedite'
        )
        SELECT o_orderpriority,
               COUNT(*)                    AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders JOIN dim USING (o_orderpriority)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "vocab_top100": r"""
        SELECT token, COUNT(*) AS freq
        FROM (
            SELECT unnest(string_split_regex(TRIM(text), '\s+')) AS token
            FROM documents WHERE LENGTH(TRIM(text)) > 0
        )
        GROUP BY token
        ORDER BY freq DESC, token ASC
        LIMIT 100
    """,
    "repetition_ratio_docs": r"""
        WITH s AS (
            SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS toks
            FROM documents
        ), g AS (
            SELECT doc_id, array_to_string(toks, ' ') AS gram
            FROM s WHERE len(toks) <= 2
            UNION ALL
            SELECT doc_id, concat(toks[i], ' ', toks[i + 1]) AS gram
            FROM s, LATERAL unnest(range(1, len(toks))) AS t(i)
            WHERE len(toks) > 2
        ), per AS (
            SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2
        )
        SELECT doc_id,
               CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_2gram_share,
               CAST(SUM(c) AS BIGINT)                    AS n_2grams
        FROM per GROUP BY doc_id
    """,
    "price_histogram": """
        SELECT LEAST(CAST(FLOOR(o_totalprice / 30000.0) AS BIGINT), 19) AS bin_id,
               COUNT(*)                    AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY 1
        ORDER BY 1
    """,
    "revenue_change_q6": """
        SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(l_discount AS DECIMAL(3,2))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "product_profit_q9": """
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(ROUND(SUM(
                   CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST('1.00' AS DECIMAL(3,2))
                        - CAST(l_discount AS DECIMAL(4,2)))
                   - CAST('0.1000' AS DECIMAL(6,4))
                     * CAST(p_retailprice AS DECIMAL(12,2))
                     * CAST(l_quantity AS DECIMAL(12,2))
               ), 2) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC
    """,
    "returned_items_q10": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(ROUND(SUM(
                   CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST('1.00' AS DECIMAL(3,2))
                        - CAST(l_discount AS DECIMAL(4,2)))
               ), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "priority_line_health_q12": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "promo_revenue_q14": """
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                  THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                       * (CAST('1.00' AS DECIMAL(3,2))
                                          - CAST(l_discount AS DECIMAL(3,2)))
                                  ELSE CAST('0.0000' AS DECIMAL(16,4)) END) AS DOUBLE)
                     / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (CAST('1.00' AS DECIMAL(3,2))
                               - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-02-01'
    """,
    "stats_profile_lineitem": """
        SELECT l_returnflag,
               COUNT(*)                                         AS n_lines,
               ROUND(corr(l_quantity, l_extendedprice), 6)      AS qty_price_corr,
               ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
               ROUND(stddev_samp(l_extendedprice), 4)           AS price_stddev,
               ROUND(var_samp(l_quantity), 4)                   AS qty_var
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "order_rank_distribution": """
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w    AS cume_dist
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC)
    """,
    "full_curation_pipeline": r"""
        WITH feat AS (
            SELECT doc_id, text,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE CAST(len(string_split_regex(TRIM(text), '\s+')) AS INT)
                   END AS n_tokens,
                   LENGTH(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                       / GREATEST(LENGTH(text), 1) AS praw,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE len(list_filter(string_split_regex(TRIM(text), '\s+'),
                             x -> lower(x) IN ('the','and','of','to','in','is','you','that','it','for')))
                   END AS en,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE len(list_filter(string_split_regex(TRIM(text), '\s+'),
                             x -> lower(x) IN ('el','la','de','que','y','en','un','los','se','no')))
                   END AS es,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE len(list_filter(string_split_regex(TRIM(text), '\s+'),
                             x -> lower(x) IN ('der','die','und','in','den','von','zu','das','mit','sich')))
                   END AS de,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE len(list_filter(string_split_regex(TRIM(text), '\s+'),
                             x -> lower(x) IN ('le','la','de','et','les','des','en','un','du','une')))
                   END AS fr,
                   md5(TRIM(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
            FROM documents WHERE source <> 'src0'
        ), scored AS (
            SELECT doc_id, text, fp,
                   CASE WHEN en >= es AND en >= de AND en >= fr THEN 'en'
                        WHEN es >= de AND es >= fr THEN 'es'
                        WHEN de >= fr THEN 'de'
                        ELSE 'fr' END AS pred_lang,
                   0.3 * LEAST(n_tokens / 50.0, 1.0)
                       + 0.3 * (1.0 - LEAST(praw * 5, 1.0))
                       + 0.4 * LEAST((en / GREATEST(n_tokens, 1)) * 4, 1.0) AS quality
            FROM feat
        ), deduped AS (
            SELECT doc_id, text
            FROM (
                SELECT doc_id, text,
                       ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
                FROM scored
                WHERE pred_lang = 'en' AND quality >= 0.5
            ) WHERE rn = 1
        ), gramlists AS (
            SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS t
            FROM deduped
        ), bench_toks AS (
            SELECT string_split_regex(TRIM(text), '\s+') AS t
            FROM documents WHERE source = 'src0'
        ), bench AS (
            SELECT DISTINCT g FROM (
                SELECT CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
                            ELSE [array_to_string(t[i:i+2], ' ')
                                  FOR i IN generate_series(1, len(t) - 2)]
                       END AS gs
                FROM bench_toks
            ), UNNEST(gs) AS u(g)
        ), doc_grams AS (
            SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                       CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
                            ELSE [array_to_string(t[i:i+2], ' ')
                                  FOR i IN generate_series(1, len(t) - 2)]
                       END AS gs
                FROM gramlists
            ), UNNEST(gs) AS u(g)
        ), contam AS (
            SELECT d.doc_id,
                   COUNT(*)   AS total_ngrams,
                   COUNT(b.g) AS matched_ngrams
            FROM doc_grams d LEFT JOIN bench b USING (g)
            GROUP BY d.doc_id
        ), clean AS (
            SELECT dd.doc_id, dd.text
            FROM deduped dd JOIN contam c USING (doc_id)
            WHERE c.matched_ngrams / c.total_ngrams < 0.8
        ), ctoks AS (
            SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS t
            FROM clean WHERE LENGTH(TRIM(text)) > 0
        ), spans AS (
            SELECT doc_id, CAST(i AS INTEGER) AS span_idx,
                   array_to_string(t[(i * 10 + 1):(i * 10 + 10)], ' ') AS span
            FROM ctoks,
                 LATERAL unnest(range(0, CAST(CEIL(len(t) / 10.0) AS BIGINT))) AS u(i)
        ), ranked AS (
            SELECT doc_id, span_idx, span,
                   ROW_NUMBER() OVER (
                       PARTITION BY span ORDER BY doc_id, span_idx
                   ) AS rn
            FROM spans
        ), rebuilt AS (
            SELECT doc_id, string_agg(span, ' ' ORDER BY span_idx) AS text
            FROM ranked WHERE rn = 1
            GROUP BY doc_id
        )
        SELECT doc_id,
               CASE WHEN CAST(concat('0x', substr(md5(text), 1, 8)) AS UBIGINT)
                         % 10000 < 9000 THEN 'train'
                    WHEN CAST(concat('0x', substr(md5(text), 1, 8)) AS UBIGINT)
                         % 10000 < 9500 THEN 'val'
                    ELSE 'test' END AS split,
               text
        FROM rebuilt
    """,
    "dedup_spans_docs": r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS t
            FROM documents WHERE LENGTH(TRIM(text)) > 0
        ), spans AS (
            SELECT doc_id, CAST(i AS INTEGER) AS span_idx,
                   array_to_string(t[(i * 10 + 1):(i * 10 + 10)], ' ') AS span
            FROM toks,
                 LATERAL unnest(range(0, CAST(CEIL(len(t) / 10.0) AS BIGINT))) AS u(i)
        ), ranked AS (
            SELECT doc_id, span_idx, span,
                   ROW_NUMBER() OVER (
                       PARTITION BY span ORDER BY doc_id, span_idx
                   ) AS rn
            FROM spans
        )
        SELECT doc_id, string_agg(span, ' ' ORDER BY span_idx) AS text
        FROM ranked WHERE rn = 1
        GROUP BY doc_id
    """,
}

# curriculum deciles reuse the unigram-LM score oracle verbatim as a
# subquery, so Spark and DuckDB derive the ORDER from the SAME
# hash-exact score definition (single source of truth)
ORACLES["curriculum_quality_deciles"] = f"""
    WITH scores AS (
        SELECT doc_id, mean_logprob FROM ({ORACLES["unigram_quality_docs"]})
    ),
    ranked AS (
        SELECT doc_id, mean_logprob,
               ROW_NUMBER() OVER (ORDER BY mean_logprob ASC, doc_id ASC) - 1
                   AS r,
               (SELECT COUNT(*) FROM scores) AS n
        FROM scores
    )
    SELECT CAST(FLOOR(r * 10 / n) AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT)       AS n_docs,
           MIN(mean_logprob)              AS min_score,
           MAX(mean_logprob)              AS max_score
    FROM ranked
    GROUP BY 1
    ORDER BY 1
"""


def _graph_tier_oracles() -> dict[str, str]:
    """DuckDB twins of the r8 graph-tier queries, generated by the SAME
    modules that implement the operators (the pagerank_sql_unrolled
    discipline: one module owns both the arithmetic and its oracle
    text, so they can never drift)."""
    from azure_etl_databricks_sql_powerbi_spark.graph.lpa import lpa_sql_unrolled
    from azure_etl_databricks_sql_powerbi_spark.graph.pagerank import (
        pagerank_sql_unrolled,
    )
    from azure_etl_databricks_sql_powerbi_spark.graph.triangles import (
        clustering_sql,
        triangle_sql,
    )

    sp_edges = (
        "SELECT 'S' || CAST(l_suppkey AS VARCHAR) AS src, "
        "'P' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem "
        "UNION "
        "SELECT 'P' || CAST(l_partkey AS VARCHAR), "
        "'S' || CAST(l_suppkey AS VARCHAR) FROM lineitem"
    )
    return {
        "triangle_counts_parts": triangle_sql(_CO_ORDER_EDGES_SQL),
        "clustering_coefficients_parts": clustering_sql(_CO_ORDER_EDGES_SQL),
        "label_propagation_parts": (
            lpa_sql_unrolled(_CO_ORDER_EDGES_SQL, iterations=3)
            + "\nSELECT node, label FROM final"
        ),
        "personalized_pagerank_suppliers": (
            pagerank_sql_unrolled(
                sp_edges, damping=0.85, iterations=3, seeds=["S1", "S2", "S3"]
            )
            + "\nSELECT node, rank_m, rank FROM final"
            + "\nORDER BY rank_m DESC, node ASC LIMIT 25"
        ),
    }


ORACLES.update(_graph_tier_oracles())


# DuckDB twin of strip_boilerplate(documents, n=8, min_df=5) — the
# module-owned STRIP_SQL contract (tests/test_boilerplate.py): same
# trim + \s+ tokenization, same short-doc single-whole-doc window, same
# coverage positions s..min(s+n-1, len); cell-exact integer arithmetic.
ORACLES["strip_boilerplate_docs"] = r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN length(TRIM(text)) = 0
                    THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(TRIM(text), '\s+') END AS t
        FROM documents
    ),
    nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
    wins AS (
        SELECT doc_id, n, i.i AS s, array_to_string(t[i.i:i.i+7], ' ') AS w
        FROM nz, UNNEST(range(1, GREATEST(n - 7, 1) + 1)) AS i(i)
    ),
    bp AS (
        SELECT w FROM (SELECT DISTINCT doc_id, w FROM wins)
        GROUP BY w HAVING COUNT(*) >= 5
    ),
    covered AS (
        SELECT DISTINCT doc_id, p.p AS pos
        FROM wins JOIN bp USING (w),
             UNNEST(range(s, LEAST(s + 7, n) + 1)) AS p(p)
    ),
    positions AS (
        SELECT doc_id, i.i AS pos, t[i.i] AS tok
        FROM nz, UNNEST(range(1, n + 1)) AS i(i)
    ),
    kept AS (
        SELECT doc_id,
               COALESCE(string_agg(tok, ' ' ORDER BY pos), '') AS clean_text,
               COUNT(*) AS n_tokens_kept
        FROM positions ANTI JOIN covered USING (doc_id, pos)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(k.clean_text, '') AS clean_text,
           COALESCE(k.n_tokens_kept, 0) AS n_tokens_kept,
           len(t.t) - COALESCE(k.n_tokens_kept, 0) AS n_tokens_removed
    FROM documents d
    JOIN toks t USING (doc_id)
    LEFT JOIN kept k ON k.doc_id = d.doc_id
"""


def _mixture_curation_oracle() -> str:
    """CTE chain around the module-owned ensemble_sql twin plus the
    BUDGET_SQL window arithmetic (tests/test_mixing_budget.py): percent
    ranks → weighted average → worst-quartile gate → per-domain cap
    min(inventory, floor(0.02 * total)) → md5-priority cumsum cut. The
    cap multiplies as DOUBLE explicitly: DuckDB's bare 0.02 literal is
    DECIMAL and floors differently from Spark's IEEE double at
    exact-integer products."""
    from azure_etl_databricks_sql_powerbi_spark.functions.ensemble import (
        ensemble_sql,
    )

    src = (
        "SELECT doc_id, source, "
        r"len(string_split_regex(TRIM(text), '\s+')) AS n_tokens, "
        "CAST(n_chars AS DOUBLE) AS s_chars, "
        r"CAST(len(string_split_regex(TRIM(text), '\s+')) AS DOUBLE)"
        " AS s_tokens "
        "FROM documents"
    )
    ens = ensemble_sql(
        src, ["s_chars", "s_tokens"], "doc_id", weights=[2.0, 1.0]
    )
    return f"""
    WITH ens AS ({ens}),
    kept AS (SELECT * FROM ens WHERE ensemble_rank >= 0.25),
    per AS (
        SELECT source AS domain, CAST(SUM(n_tokens) AS BIGINT) AS token_count
        FROM kept GROUP BY source
    ),
    t AS (SELECT SUM(token_count) AS total FROM per),
    alloc AS (
        SELECT domain,
               LEAST(token_count,
                     CAST(FLOOR(CAST(0.02 AS DOUBLE) * total) AS BIGINT))
                   AS alloc_tokens
        FROM per, t
    ),
    ranked2 AS (
        SELECT k.doc_id, k.source, k.n_tokens, k.ensemble_rank,
               CAST(SUM(k.n_tokens) OVER (
                    PARTITION BY k.source
                    ORDER BY CAST(concat('0x',
                        substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8))
                        AS UBIGINT) % 4294967296 ASC,
                             k.doc_id ASC
                    ROWS UNBOUNDED PRECEDING) - k.n_tokens AS BIGINT)
                   AS cum_tokens_before,
               a.alloc_tokens
        FROM kept k JOIN alloc a ON a.domain = k.source
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           ensemble_rank, cum_tokens_before
    FROM ranked2 WHERE cum_tokens_before < alloc_tokens
    """


ORACLES["mixture_curation_budget"] = _mixture_curation_oracle()


def _pii_scrub_oracle() -> str:
    """DuckDB twin of _q_pii_scrub_docs, BUILT from the pii module's OWN
    SQL twin builders (duckdb_count_sql/duckdb_redact_sql — one
    definition shared with tests/test_pii.py, the NEGATIVES_SQL
    module-owned-twin discipline) so the oracle can never desync from
    the operator, including the NULL-text COALESCE semantics. Same
    planting CASE as the Spark side."""
    from azure_etl_databricks_sql_powerbi_spark.functions.pii import (
        duckdb_count_sql,
        duckdb_redact_sql,
    )

    return f"""
        WITH planted AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0
                        THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                             || '@example.com from 10.0.0.'
                             || CAST(doc_id % 256 AS VARCHAR)
                        ELSE text END AS text
            FROM documents
        )
        SELECT doc_id,
               {duckdb_count_sql("text")} AS pii_total,
               {duckdb_redact_sql("text")} AS clean_text
        FROM planted
        ORDER BY doc_id
    """


ORACLES["pii_scrub_docs"] = _pii_scrub_oracle()


def _url_provenance_oracle() -> str:
    """DuckDB twin of _q_url_provenance_docs, BUILT from the urls
    module's OWN twin builders (duckdb_host_sql /
    duckdb_registered_domain_sql — one definition shared with
    tests/test_urls.py) over the verbatim _URL_PLANT_SQL, so neither the
    planting nor the extraction can desync. Share is the exact IEEE
    double quotient on both sides (no ROUND — the r11 half-cent
    contract)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.urls import (
        duckdb_host_sql,
        duckdb_registered_domain_sql,
    )

    blocked = ", ".join(f"'{d}'" for d in _URL_BLOCKLIST)
    return f"""
        WITH planted AS (
            SELECT doc_id, {_URL_PLANT_SQL} AS url FROM documents
        ),
        h AS (SELECT doc_id, {duckdb_host_sql("url")} AS host FROM planted),
        d AS (
            SELECT doc_id, {duckdb_registered_domain_sql("host")} AS dom
            FROM h
        ),
        kept AS (
            SELECT dom FROM d WHERE dom IS NULL OR dom NOT IN ({blocked})
        ),
        counts AS (
            SELECT dom AS domain, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM kept GROUP BY dom
        ),
        tot AS (SELECT SUM(n_docs) AS t FROM counts WHERE domain IS NOT NULL)
        SELECT domain, n_docs,
               CASE WHEN domain IS NOT NULL
                    THEN CAST(n_docs AS DOUBLE) / CAST(t AS DOUBLE)
               END AS share
        FROM counts, tot
        ORDER BY n_docs DESC, domain ASC NULLS LAST
    """


ORACLES["url_provenance_docs"] = _url_provenance_oracle()


def _registered_domain_psl_oracle() -> str:
    """DuckDB twin of _q_registered_domain_psl_docs: host extraction
    from the module's duckdb_host_sql, then the module's
    duckdb_registered_domain_psl_sql — an INDEPENDENT replay of the
    documented longest-match semantics (CASE over string_split slices
    with the snapshot inlined as literals; the engine runs broadcast
    joins) over the verbatim _PSL_PLANT_SQL. Hand-written per-branch
    expectations: tests/test_urls.py (the generated-twin mitigation
    norm)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.urls import (
        duckdb_host_sql,
        duckdb_registered_domain_psl_sql,
    )

    return f"""
        WITH planted AS (
            SELECT doc_id, {_PSL_PLANT_SQL} AS url FROM documents
        ),
        hosts AS (
            SELECT doc_id, {duckdb_host_sql("url")} AS host FROM planted
        ),
        doms AS (
            SELECT doc_id,
                   {duckdb_registered_domain_psl_sql("host", _PSL_SNAPSHOT)}
                       AS domain
            FROM hosts
        )
        SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM doms
        GROUP BY domain
        ORDER BY n_docs DESC, domain ASC NULLS LAST
    """


ORACLES["registered_domain_psl_docs"] = _registered_domain_psl_oracle()


def _link_edges_oracle() -> str:
    """DuckDB twin of _q_link_edges_docs (§5 swap #13): extraction and
    canonicalization replay via the module-owned builders
    (duckdb_extract_links_sql / duckdb_canonicalize_url_sql — RE2 runs
    the same backslash-free patterns), entity decode via the SAME
    ordered ENTITY_REPLACES chain the engine's transform lambda runs,
    and RESOLUTION via links.duckdb_resolve_hrefs_rfc_sql — an
    INDEPENDENT SQL algorithm (position arithmetic + a true
    list_reduce stack fold per RFC 3986 remove_dot_segments; the
    engine runs anchored-regex derivations), the
    registered_domain_psl precedent for structurally-lower shared-bug
    risk. Hand-written RFC-3986 expectations and the pinned
    bounded-depth divergence: tests/test_links.py."""
    from azure_etl_databricks_sql_powerbi_spark.functions.html import (
        duckdb_decode_entities_sql,
    )
    from azure_etl_databricks_sql_powerbi_spark.functions.links import (
        duckdb_canonicalize_url_sql,
        duckdb_extract_links_sql,
        duckdb_resolve_hrefs_rfc_sql,
    )

    dec = duckdb_decode_entities_sql("raw")
    # AS MATERIALIZED throughout: DuckDB's default CTE inlining
    # substitutes each stage's expression tree into EVERY reference
    # site — with the deep resolve/canonicalize derivations the
    # DISTINCT + IS NOT NULL consumers re-trigger exactly the
    # expression blowup the engine's plan-size contract exists for
    # (observed: the un-materialized form never finished at sf0.001;
    # materialized runs in ~0.1s)
    return f"""
        WITH pages AS MATERIALIZED (
            SELECT {_LINKS_PLANT_BASE_SQL} AS url,
                   {_LINKS_PLANT_HTML_SQL} AS html
            FROM documents
        ),
        hrefs AS MATERIALIZED (
            SELECT url, unnest({duckdb_extract_links_sql("html")}) AS raw
            FROM pages
        ),
        dec AS MATERIALIZED (
            SELECT url, {dec} AS href FROM hrefs
        ),
        res AS MATERIALIZED (
            {duckdb_resolve_hrefs_rfc_sql("dec", "url", "href", "resolved")}
        ),
        can AS MATERIALIZED (
            SELECT {duckdb_canonicalize_url_sql("url")} AS src,
                   {duckdb_canonicalize_url_sql("resolved")} AS dst
            FROM res
        )
        SELECT DISTINCT src, dst FROM can
        WHERE src IS NOT NULL AND dst IS NOT NULL
    """


ORACLES["link_edges_docs"] = _link_edges_oracle()


def _sitemap_frontier_oracle() -> str:
    """DuckDB twin of _q_sitemap_frontier (§5 swap #14): the module's
    OWN duckdb_parse_sitemap_sql builder over the verbatim plant,
    canonicalization via duckdb_canonicalize_url_sql, the robots rule
    table via duckdb_parse_robots_sql over the swap-#12 plants, and
    the robots_policy_docs window replay in its single-agent '*' form
    (filter_robots_allowed(agent='*') keeps only '*'-group rows, so
    group selection reduces to the agent filter; longest pattern wins,
    allow on ties, default allow; the DISTINCT frontier URL is unique
    per row, so the per-URL window needs no synthetic row id). AS
    MATERIALIZED throughout — the link_edges_docs lesson: DuckDB's
    CTE inlining re-expands the deep parse/canonicalize trees into
    every reference site."""
    from azure_etl_databricks_sql_powerbi_spark.functions.links import (
        duckdb_canonicalize_url_sql,
    )
    from azure_etl_databricks_sql_powerbi_spark.functions.robots import (
        duckdb_parse_robots_sql,
        duckdb_url_path_sql,
    )
    from azure_etl_databricks_sql_powerbi_spark.functions.sitemap import (
        duckdb_parse_sitemap_sql,
    )
    from azure_etl_databricks_sql_powerbi_spark.functions.urls import (
        duckdb_host_sql,
        duckdb_registered_domain_sql,
    )

    dom = duckdb_registered_domain_sql(duckdb_host_sql("url"))
    return f"""
        WITH robots_docs AS MATERIALIZED (
            SELECT {_ROBOTS_DOMAIN_PLANT_SQL} AS domain,
                   {_ROBOTS_TXT_PLANT_SQL} AS robots_txt
            FROM documents
            WHERE doc_id < 20 AND doc_id % 4 < 3
        ),
        rules AS MATERIALIZED (
            {duckdb_parse_robots_sql("robots_docs")}
        ),
        sitemaps AS MATERIALIZED (
            SELECT {_SITEMAP_PLANT_SQL} AS xml FROM documents
        ),
        entries AS MATERIALIZED (
            {duckdb_parse_sitemap_sql("sitemaps", "xml")}
        ),
        canon AS MATERIALIZED (
            SELECT {duckdb_canonicalize_url_sql("loc")} AS url
            FROM entries
            WHERE kind = 'url' AND loc IS NOT NULL
        ),
        frontier AS MATERIALIZED (
            SELECT DISTINCT url FROM canon WHERE url IS NOT NULL
        ),
        u AS MATERIALIZED (
            SELECT url, {dom} AS dom,
                   {duckdb_url_path_sql("url")} AS path
            FROM frontier
        ),
        j AS (
            SELECT u.*, r.directive, r.pattern_len, r.regex
            FROM u
            LEFT JOIN rules r ON u.dom = r.domain AND r.agent = '*'
        ),
        m AS (
            SELECT *, coalesce(regex IS NOT NULL
                               AND regexp_matches(path, regex),
                               FALSE) AS hit
            FROM j
        ),
        best AS (
            SELECT *, row_number() OVER (
                PARTITION BY url
                ORDER BY hit DESC, pattern_len DESC,
                         (directive = 'disallow') ASC
            ) AS rk
            FROM m
        )
        SELECT url FROM best
        WHERE rk = 1 AND ((NOT hit) OR directive = 'allow')
    """


ORACLES["sitemap_frontier"] = _sitemap_frontier_oracle()


def _normalize_docs_oracle() -> str:
    """DuckDB twin of _q_normalize_text_docs, BUILT from the normalize
    module's OWN duckdb_canonicalize_sql builder (one definition shared
    with tests/test_normalize.py) over the verbatim _NORM_PLANT_SQL, so
    neither planting nor canonicalization can desync. The canonical text
    is computed ONCE in a CTE and both audit columns derive from it —
    mirroring canonicalize_documents' single-evaluation shape — and the
    NFC step pits DuckDB's native utf8proc nfc_normalize against Python
    unicodedata cell-for-cell. Hand-written expectations:
    tests/test_normalize.py FIXTURES (the generated-twin mitigation
    norm)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.normalize import (
        duckdb_canonicalize_sql,
    )

    return f"""
        WITH planted AS (
            SELECT doc_id, {_NORM_PLANT_SQL} AS raw FROM documents
        ),
        canon AS (
            SELECT doc_id, raw,
                   {duckdb_canonicalize_sql("raw")} AS text
            FROM planted
        )
        SELECT doc_id, text,
               text <> raw AS norm_changed,
               CAST(length(raw) - length(text) AS BIGINT) AS norm_len_delta
        FROM canon
    """


ORACLES["normalize_text_docs"] = _normalize_docs_oracle()


def _html_extract_oracle() -> str:
    """DuckDB twin of _q_html_extract_docs, BUILT from the html module's
    OWN duckdb_strip_html_sql builder (one definition shared with
    tests/test_html.py) over the verbatim _HTML_PLANT_SQL, so neither
    planting nor stripping can desync — every regex pass runs RE2 here
    vs Java regex in Spark, cell-for-cell, and the entity replaces are
    literal in both. Hand-written expectations: tests/test_html.py
    FIXTURES (the generated-twin mitigation norm)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.html import (
        duckdb_strip_html_sql,
    )

    return f"""
        WITH planted AS (
            SELECT doc_id, {_HTML_PLANT_SQL} AS html FROM documents
        ),
        stripped AS (
            SELECT doc_id, html,
                   {duckdb_strip_html_sql("html")} AS text
            FROM planted
        )
        SELECT doc_id, text,
               CAST(length(html) - length(text) AS BIGINT)
                   AS strip_len_delta
        FROM stripped
    """


ORACLES["html_extract_docs"] = _html_extract_oracle()


def _cdx_selection_oracle() -> str:
    """DuckDB twin of _q_cdx_capture_selection, composed from the cdx
    module's OWN duckdb_parse_cdxj_sql builder (one definition shared
    with tests/test_cdx.py) over the verbatim _CDX_PLANT_SQL, plus a
    window-function replay of select_captures' documented semantics:
    status 200 + MIME contains 'html', then ONE capture per digest —
    earliest (ts, urlkey, filename, offset) wins (ts ASC NULLS LAST on
    both sides: explicit in Spark, DuckDB's default), NULL digests kept
    individually. Hand-written expectations: tests/test_cdx.py (the
    generated-twin mitigation norm)."""
    from azure_etl_databricks_sql_powerbi_spark.sources.cdx import (
        duckdb_parse_cdxj_sql,
    )

    return f"""
        WITH planted AS (
            SELECT {_CDX_PLANT_SQL} AS value FROM documents
        ),
        parsed AS (
            SELECT {duckdb_parse_cdxj_sql("value")} FROM planted
        ),
        selected AS (
            SELECT * FROM parsed
            WHERE status IN (200) AND contains(lower(mime), 'html')
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY digest
                -- NULL ordering pinned per key: Spark's asc() is NULLS
                -- FIRST while DuckDB's ASC defaults NULLS LAST, so the
                -- secondary keys spell FIRST explicitly (ts is
                -- asc_nulls_last on the engine side, hence LAST here)
                ORDER BY ts ASC NULLS LAST, urlkey ASC NULLS FIRST,
                         filename ASC NULLS FIRST,
                         "offset" ASC NULLS FIRST
            ) AS rk
            FROM selected
        )
        SELECT urlkey, ts, url, mime, status, digest,
               length, "offset", filename, languages, encoding
        FROM ranked
        WHERE digest IS NULL OR rk = 1
    """


ORACLES["cdx_capture_selection"] = _cdx_selection_oracle()


def _robots_policy_oracle() -> str:
    """DuckDB twin of _q_robots_policy_docs, composed from the robots
    module's OWN duckdb_parse_robots_sql builder (stanza binding +
    pattern→regex compilation, cell-for-cell proven in
    tests/test_robots.py) over the verbatim plants, plus a window
    replay of filter_robots_allowed's documented semantics: a CROSS
    JOIN with the two queried agents replays the engine's two
    per-agent passes at once — group selection (exact agent beats *,
    via a per-(url, agent) max window), path match on the compiled
    RE2 ≡ Java regexes, longest pattern wins, allow on ties
    (disallow sorts last at equal length), default allow on no match /
    no robots. Tie-breaks beyond the pinned ordering never reach the
    output: they only occur between non-matching rows, whose verdict
    columns are identical (allowed, NULL rule). Hand-written verdict
    expectations: tests/test_robots.py (the generated-twin mitigation
    norm)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.robots import (
        duckdb_parse_robots_sql,
        duckdb_url_path_sql,
    )
    from azure_etl_databricks_sql_powerbi_spark.functions.urls import (
        duckdb_host_sql,
        duckdb_registered_domain_sql,
    )

    dom = duckdb_registered_domain_sql(duckdb_host_sql("url"))
    return f"""
        WITH robots_docs AS (
            SELECT {_ROBOTS_DOMAIN_PLANT_SQL} AS domain,
                   {_ROBOTS_TXT_PLANT_SQL} AS robots_txt
            FROM documents
            WHERE doc_id < 20 AND doc_id % 4 < 3
        ),
        rules AS (
            {duckdb_parse_robots_sql("robots_docs")}
        ),
        urls AS (
            SELECT doc_id, {_ROBOTS_URL_PLANT_SQL} AS url FROM documents
        ),
        u AS (
            SELECT doc_id, url, {dom} AS dom,
                   {duckdb_url_path_sql("url")} AS path
            FROM urls
        ),
        j AS (
            SELECT u.*, q.agent AS q_agent, r.agent AS r_agent,
                   r.directive, r.pattern, r.pattern_len, r.regex
            FROM u
            CROSS JOIN (VALUES ('*'), ('trainbot')) q(agent)
            LEFT JOIN rules r
              ON u.dom = r.domain
             AND (r.agent = q.agent OR r.agent = '*')
        ),
        g AS (
            SELECT *, max(CASE WHEN r_agent = q_agent THEN 1 ELSE 0 END)
                          OVER (PARTITION BY doc_id, q_agent) AS has_exact
            FROM j
        ),
        grp AS (
            SELECT * FROM g
            WHERE r_agent IS NULL
               OR (CASE WHEN has_exact = 1 THEN r_agent = q_agent
                        ELSE r_agent = '*' END)
        ),
        m AS (
            SELECT *, (regex IS NOT NULL
                       AND regexp_matches(path, regex)) AS hit
            FROM grp
        ),
        best AS (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id, q_agent
                ORDER BY hit DESC, pattern_len DESC,
                         (directive = 'disallow') ASC
            ) AS rk
            FROM m
        )
        SELECT doc_id, url, q_agent AS agent,
               ((NOT hit) OR directive = 'allow') AS robots_allowed,
               CASE WHEN hit THEN directive || ' ' || pattern END
                   AS robots_rule
        FROM best
        WHERE rk = 1
    """


ORACLES["robots_policy_docs"] = _robots_policy_oracle()

# Twin of the one-row diagnostics union: the skew summary's raw IEEE
# divisions and the exact Σ cl·cr join cardinality, cross-joined
# driver-sized (tests/test_diagnostics.py arithmetic, view-backed).
ORACLES["join_diagnostics_summary"] = """
    WITH per AS (
        SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey
    ),
    skew AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
               MAX(cnt) AS max_key_cnt,
               SUM(cnt) / COUNT(*) AS avg_key_cnt,
               MAX(cnt) / (SUM(cnt) / COUNT(*)) AS skew_ratio
        FROM per
    ),
    la AS (SELECT o_orderkey AS k, COUNT(*) AS lc FROM orders GROUP BY o_orderkey),
    ra AS (SELECT l_orderkey AS k, COUNT(*) AS rc FROM lineitem GROUP BY l_orderkey),
    lt AS (SELECT CAST(COALESCE(SUM(lc), 0) AS BIGINT) AS left_rows FROM la),
    rt AS (SELECT CAST(COALESCE(SUM(rc), 0) AS BIGINT) AS right_rows FROM ra),
    j AS (
        SELECT COUNT(*) AS matching_keys,
               CAST(COALESCE(SUM(lc * rc), 0) AS BIGINT) AS join_rows
        FROM la JOIN ra USING (k)
    )
    SELECT n_rows, n_keys, max_key_cnt, avg_key_cnt, skew_ratio,
           left_rows, right_rows, matching_keys, join_rows,
           CAST(join_rows AS DOUBLE)
               / CAST(GREATEST(left_rows, right_rows) AS DOUBLE)
               AS amplification
    FROM skew, lt, rt, j
"""


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
