"""Sitemap XML parsing for crawl seeding (north-star extension; the
reference engine at /root/reference has no crawl surface). Completes
the crawl-policy story: ``functions/robots`` surfaces ``Sitemap:``
directives as rule rows; this module turns the fetched sitemap bodies
into frontier URLs — ``parse_sitemap → canonicalize_urls →
filter_robots_allowed`` is the standard seed pipeline.

Spark-first shape, all JVM, the ``functions/links`` discipline:

1. **``parse_sitemap``** — XML documents → one row per ``<url>`` or
   ``<sitemap>`` entry with ``(kind, loc, lastmod, changefreq,
   priority)``. Entries are isolated FIRST (``regexp_extract_all`` of
   whole ``<url>…</url>`` / ``<sitemap>…</sitemap>`` blocks →
   ``posexplode``), then fields extract PER BLOCK — extracting parallel
   field arrays from the whole document would misalign the moment one
   entry omits an optional field (most do). ``kind`` distinguishes
   sitemap-index pointers (``sitemap``) from page entries (``url``):
   a real pipeline loops index → fetch → parse until only ``url`` rows
   remain (fetching is the connector's job, not this parser's).
2. Field values trim surrounding whitespace/newlines (real sitemaps
   pretty-print); ``priority`` casts to double (NULL on malformed),
   entries with no ``<loc>`` yield NULL loc (prunable) rather than
   erroring.

This is deliberately a REGEX entry-splitter, not an XML parser (no
DTD, no namespace resolution, no CDATA) — the 100 TB contract is a
fixed whole-stage-codegen projection per document. Known
simplifications (documented, deterministic): tags must be unprefixed
lowercase ``<url>``/``<loc>``/… (the sitemaps.org canonical form;
namespace-prefixed feeds are rare and land NULL fields, never errors);
``<![CDATA[...]]>`` locs are not unwrapped; ``lastmod`` stays a STRING
(W3C datetime offsets cast differently across engines — the consumer
decides the timezone contract).

Pattern dialect contract: Java ≡ RE2 throughout. The one escape used
(``\\s``) reads identically in both engines; it never passes through a
Spark SQL string literal (the engine side is pure Column API, and the
DuckDB builder embeds patterns in literals that do no escape
processing) — so the ``functions/links`` embed-verbatim property
holds even though the patterns are not strictly backslash-free.
Oracle-checkable cell-for-cell via the module-owned
``duckdb_parse_sitemap_sql`` builder; hand-written fixture
expectations live in ``tests/test_sitemap.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# whole-entry blocks; (?is) both dialects; lazy body; '<url>' (exact,
# optionally space-padded) cannot match '<urlset'
URL_BLOCK_RE = "(?is)<url\\s*>(.*?)</url>"
SITEMAP_BLOCK_RE = "(?is)<sitemap\\s*>(.*?)</sitemap>"
# per-block fields: content up to the closing '<'
LOC_RE = "(?is)<loc\\s*>([^<]*)</loc>"
LASTMOD_RE = "(?is)<lastmod\\s*>([^<]*)</lastmod>"
CHANGEFREQ_RE = "(?is)<changefreq\\s*>([^<]*)</changefreq>"
PRIORITY_RE = "(?is)<priority\\s*>([^<]*)</priority>"

# field-value trim: plain trim() strips SPACES only in both engines —
# pretty-printed sitemaps wrap <loc> values in newlines+indent. Same
# btrim(chars) approach as functions/normalize (its _TRIM_CHARS plus
# carriage return: sitemaps are fetched bytes, CRLF survives).
_TRIM_CHARS = " \t\n\r"

_FIELDS = (
    ("loc", LOC_RE),
    ("lastmod", LASTMOD_RE),
    ("changefreq", CHANGEFREQ_RE),
    ("priority", PRIORITY_RE),
)

_SM_RESERVED = (
    "kind", "entry_idx", "__sm_urls", "__sm_maps", "__sm_nu",
    "__sm_pos", "__sm_block",
)


def _field_value(block: Column, pat: str) -> Column:
    """extract → whitespace-trim → named-entity decode → '' becomes
    NULL. Entity decode reuses functions/html's ordered ENTITY_REPLACES
    (&amp; LAST for double-escape correctness): sitemaps.org REQUIRES
    entity-escaping of data values, so every multi-parameter URL
    arrives as '...?a=1&amp;b=2' — skipping the decode corrupts the
    loc the fetch stage requests (r13 sitemap review #1). The fold is
    links.decode_href_entities — ONE engine-side definition, mirroring
    the oracle side's single duckdb_decode_entities_sql builder (the
    r14 ADVICE de-duplication)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.links import (
        decode_href_entities,
    )

    out = decode_href_entities(
        F.btrim(F.regexp_extract(block, pat, 1), F.lit(_TRIM_CHARS))
    )
    return F.nullif(out, F.lit(""))


def parse_sitemap(
    docs: DataFrame, xml_col: str = "xml", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Sitemap/sitemap-index documents → entry rows ``(kind, entry_idx,
    loc, lastmod, changefreq, priority)`` (+ ``keep_cols`` carried
    through, e.g. the fetch URL for provenance). ``entry_idx`` is the
    entry's position within its document and kind — with a carried
    document key it is a stable row id (the robots ``row_id_col``
    pattern). ONE scan of the source: both block arrays extract in the
    same projection and a single posexplode walks their concatenation,
    with kind/entry_idx derived from the position against the url-array
    length (two per-kind passes would regex-scan every XML body twice;
    r13 sitemap review #4)."""
    clash = [
        c for c in _SM_RESERVED if c in keep_cols or c == xml_col
    ]
    if clash:
        raise ValueError(
            f"parse_sitemap uses reserved columns {clash}; rename the "
            "existing column(s) first"
        )
    carried = [F.col(c) for c in keep_cols]
    arrays = docs.select(
        *carried,
        F.regexp_extract_all(
            F.col(xml_col), F.lit(URL_BLOCK_RE), 1
        ).alias("__sm_urls"),
        F.regexp_extract_all(
            F.col(xml_col), F.lit(SITEMAP_BLOCK_RE), 1
        ).alias("__sm_maps"),
    )
    exploded = arrays.select(
        *keep_cols,
        F.size("__sm_urls").alias("__sm_nu"),
        F.posexplode(F.concat("__sm_urls", "__sm_maps")).alias(
            "__sm_pos", "__sm_block"
        ),
    )
    is_url = F.col("__sm_pos") < F.col("__sm_nu")
    return exploded.select(
        *keep_cols,
        F.when(is_url, F.lit("url")).otherwise(F.lit("sitemap")).alias("kind"),
        F.when(is_url, F.col("__sm_pos"))
        .otherwise(F.col("__sm_pos") - F.col("__sm_nu"))
        .alias("entry_idx"),
        *[
            _field_value(F.col("__sm_block"), pat).alias(name)
            for name, pat in _FIELDS
            if name != "priority"
        ],
        # try_cast: malformed priorities ('high') are NULL, never ANSI
        # errors
        _field_value(F.col("__sm_block"), PRIORITY_RE)
        .try_cast("double")
        .alias("priority"),
    )


def sitemap_frontier(
    docs: DataFrame,
    xml_col: str = "xml",
    rules: DataFrame | None = None,
    agent: str = "*",
    broadcast_rules: bool = True,
    max_broadcast_rules: int = 2_000_000,
) -> DataFrame:
    """Page entries → canonical frontier URLs, optionally pruned by a
    robots rule table: ``parse_sitemap`` (url rows only, NULL locs
    dropped) → ``links.canonicalize_urls`` → distinct →
    ``robots.filter_robots_allowed`` when ``rules`` is given. Returns
    one ``url`` column — the seed list a fetch stage consumes.
    ``broadcast_rules``/``max_broadcast_rules`` forward to the robots
    filter: a full-web frontier's rule table (~10^8 domains) is past
    broadcast size, and THIS composition is exactly the consumer that
    needs the shuffle equi-join-on-domain path
    (``broadcast_rules=False``) rather than a ValueError."""
    from azure_etl_databricks_sql_powerbi_spark.functions.links import (
        SCHEME_RE,
        canonicalize_urls,
    )

    entries = parse_sitemap(docs, xml_col).filter(
        (F.col("kind") == "url") & F.col("loc").isNotNull()
    )
    # canonical url IS NOT NULL ⟺ loc has an ANCHORED scheme (the
    # links.link_edges nullness proof: canonicalize returns NULL exactly
    # when the scheme match fails or the input is null; everything else
    # is null-preserving). Filtering the RAW loc replaces the former
    # output-side isNotNull(url), whose pushdown re-inlined the whole
    # canonicalize chain into the predicate per entry row (r16, the
    # link_edges mega-filter finding).
    absolute = entries.select("loc").filter(
        F.regexp_extract(F.col("loc"), SCHEME_RE, 1) != ""
    )
    canon = canonicalize_urls(absolute, "loc", "url")
    out = canon.select("url").distinct()
    if rules is not None:
        from azure_etl_databricks_sql_powerbi_spark.functions.robots import (
            filter_robots_allowed,
        )

        out = filter_robots_allowed(
            out,
            rules,
            agent=agent,
            broadcast_rules=broadcast_rules,
            max_broadcast_rules=max_broadcast_rules,
        )
    return out


# ---------------------------------------------------------------- oracle


def duckdb_parse_sitemap_sql(
    docs_relation: str = "docs",
    xml_expr: str = "xml",
    keep_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of :func:`parse_sitemap`, generated from the
    module's OWN block/field patterns (the functions/pii discipline):
    same block isolation (``regexp_extract_all`` + 0-based unnest
    position arithmetic, matching ``posexplode``), same per-block field
    extraction, same trim/nullif/double-cast. Returns a full SELECT
    over ``docs_relation``."""
    from azure_etl_databricks_sql_powerbi_spark.functions.html import (
        duckdb_decode_entities_sql,
    )

    keep = "".join(f"{c}, " for c in keep_cols)
    # _TRIM_CHARS rendered via chr() so the SQL string stays one-line
    # ASCII (the functions/normalize twin convention)
    trim_chars = "concat(' ', chr(9), chr(10), chr(13))"

    def field(pat: str, alias: str) -> str:
        # entity decode via the ONE shared builder (the r14 ADVICE
        # finding: a private replace-loop here contradicted
        # duckdb_decode_entities_sql's single-definition purpose)
        v = duckdb_decode_entities_sql(
            f"trim(regexp_extract(block, '{pat}', 1), {trim_chars})"
        )
        return f"nullif({v}, '') AS {alias}"

    field_sql = ",\n               ".join(
        field(pat, "__p_raw" if name == "priority" else name)
        for name, pat in _FIELDS
    )
    return f"""
        WITH arrays AS (
            SELECT {keep}
                   regexp_extract_all({xml_expr}, '{URL_BLOCK_RE}', 1)
                       AS u,
                   regexp_extract_all({xml_expr}, '{SITEMAP_BLOCK_RE}', 1)
                       AS m
            FROM {docs_relation}
        ),
        blocks AS (
            SELECT {keep}len(u) AS nu,
                   unnest(generate_series(0, len(u) + len(m) - 1)) AS pos,
                   unnest(list_concat(u, m)) AS block
            FROM arrays
        ),
        extracted AS (
            SELECT {keep}
                   CASE WHEN pos < nu THEN 'url' ELSE 'sitemap' END
                       AS kind,
                   CAST(CASE WHEN pos < nu THEN pos ELSE pos - nu END
                        AS INTEGER) AS entry_idx,
               {field_sql}
            FROM blocks
        )
        SELECT {keep}kind, entry_idx, loc, lastmod, changefreq,
               TRY_CAST(__p_raw AS DOUBLE) AS priority
        FROM extracted
    """
