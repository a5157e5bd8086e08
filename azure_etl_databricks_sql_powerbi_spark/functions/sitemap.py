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

from pyspark.sql import DataFrame
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
# pretty-printed sitemaps wrap <loc> values in newlines+indent. The
# character classes below contain the literal whitespace characters
# (no escapes), so they embed verbatim in both dialects.
WS_LEAD_RE = "^[ \t\r\n]+"
WS_TRAIL_RE = "[ \t\r\n]+$"

_FIELDS = (
    ("loc", LOC_RE),
    ("lastmod", LASTMOD_RE),
    ("changefreq", CHANGEFREQ_RE),
    ("priority", PRIORITY_RE),
)


def parse_sitemap(
    docs: DataFrame, xml_col: str = "xml", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Sitemap/sitemap-index documents → entry rows ``(kind, entry_idx,
    loc, lastmod, changefreq, priority)`` (+ ``keep_cols`` carried
    through, e.g. the fetch URL for provenance). ``entry_idx`` is the
    entry's position within its document and kind — with a carried
    document key it is a stable row id (the robots ``row_id_col``
    pattern)."""
    carried = [F.col(c) for c in keep_cols]
    parts = []
    for kind, block_re in (("url", URL_BLOCK_RE), ("sitemap", SITEMAP_BLOCK_RE)):
        blocks = docs.select(
            *carried,
            F.lit(kind).alias("kind"),
            F.posexplode(
                F.regexp_extract_all(F.col(xml_col), F.lit(block_re), 1)
            ).alias("entry_idx", "__sm_block"),
        )
        fields = [
            F.nullif(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_extract("__sm_block", pat, 1),
                        WS_LEAD_RE,
                        "",
                    ),
                    WS_TRAIL_RE,
                    "",
                ),
                F.lit(""),
            ).alias(name)
            for name, pat in _FIELDS
        ]
        parts.append(blocks.select(*keep_cols, "kind", "entry_idx", *fields))
    out = parts[0].unionByName(parts[1])
    # try_cast: malformed priorities ('high') are NULL, not ANSI errors
    return out.withColumn(
        "priority", F.col("priority").try_cast("double")
    )


def sitemap_frontier(
    docs: DataFrame,
    xml_col: str = "xml",
    rules: DataFrame | None = None,
    agent: str = "*",
) -> DataFrame:
    """Page entries → canonical frontier URLs, optionally pruned by a
    robots rule table: ``parse_sitemap`` (url rows only, NULL locs
    dropped) → ``links.canonicalize_urls`` → distinct →
    ``robots.filter_robots_allowed`` when ``rules`` is given. Returns
    one ``url`` column — the seed list a fetch stage consumes."""
    from azure_etl_databricks_sql_powerbi_spark.functions.links import (
        canonicalize_urls,
    )

    entries = parse_sitemap(docs, xml_col).filter(
        (F.col("kind") == "url") & F.col("loc").isNotNull()
    )
    canon = canonicalize_urls(entries.select("loc"), "loc", "url")
    out = (
        canon.filter(F.col("url").isNotNull()).select("url").distinct()
    )
    if rules is not None:
        from azure_etl_databricks_sql_powerbi_spark.functions.robots import (
            filter_robots_allowed,
        )

        out = filter_robots_allowed(out, rules, agent=agent)
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
    keep = "".join(f"{c}, " for c in keep_cols)
    selects = []
    for kind, block_re in (("url", URL_BLOCK_RE), ("sitemap", SITEMAP_BLOCK_RE)):
        selects.append(f"""
            SELECT {keep}'{kind}' AS kind,
                   unnest(generate_series(0,
                       len(regexp_extract_all({xml_expr},
                           '{block_re}', 1)) - 1)) AS entry_idx,
                   unnest(regexp_extract_all({xml_expr},
                       '{block_re}', 1)) AS block
            FROM {docs_relation}
        """)
    field_sql = ",\n               ".join(
        f"nullif(regexp_replace(regexp_replace("
        f"regexp_extract(block, '{pat}', 1),"
        f" '{WS_LEAD_RE}', '', 'g'), '{WS_TRAIL_RE}', '', 'g'), '')"
        f" AS {'__p_raw' if name == 'priority' else name}"
        for name, pat in _FIELDS
    )
    return f"""
        WITH blocks AS ({selects[0]} UNION ALL {selects[1]}),
        extracted AS (
            SELECT {keep}kind, entry_idx,
               {field_sql}
            FROM blocks
        )
        SELECT {keep}kind, entry_idx, loc, lastmod, changefreq,
               TRY_CAST(__p_raw AS DOUBLE) AS priority
        FROM extracted
    """
