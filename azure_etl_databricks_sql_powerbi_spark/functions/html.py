"""HTML → text extraction for web-crawl curation (north-star extension;
the reference engine at /root/reference has no text surface). This is
the step UPSTREAM of everything in ``functions/normalize``: a crawl
corpus arrives as markup, and tag/entity residue poisons every
downstream signal (token counts, n-gram shingles, quality ratios,
dedup hashes). Composes as ``canonicalize_text(strip_html(text))``.

Two paths, the ``functions/normalize`` split:

1. **``strip_html``** — pure Column expressions, JVM-side, zero Python:
   drop comments and CDATA first (so a commented-out ``<script>``
   opener can never arm the script pass), then ``<script>``/``<style>``
   payloads (their CONTENT is never prose), then ``<!DOCTYPE>``
   declarations and ``<?...?>`` processing instructions, turn
   block-level tags into newlines (so ``<p>a</p><p>b</p>`` keeps its
   paragraph structure for the blank-run logic downstream), strip every
   remaining tag, then (by default) decode the named entities that
   dominate real crawls via literal ``replace`` (no regex needed):
   ``&lt; &gt; &quot; &#39; &apos; &nbsp;``
   and — LAST, so double-escapes like ``&amp;lt;`` correctly yield the
   literal ``&lt;`` rather than ``<`` — ``&amp;``. Entity decode runs
   AFTER tag stripping, so markup smuggled as ``&lt;b&gt;`` stays
   text, never becomes a tag.
2. **``unescape_entities``** — the full entity table (all HTML5 named
   entities plus numeric ``&#d;``/``&#xh;`` forms, which no regex can
   decode — they need ``chr``): an Arrow-batched ``pandas_udf`` over
   stdlib ``html.unescape`` (C-accelerated lookup, the
   ``functions/compress`` built-ins-first exception). Use it when the
   corpus actually carries exotic entities; the JVM path covers the
   overwhelming majority at scan speed.

This is deliberately a TEXT EXTRACTOR, not an HTML parser: no DOM, no
attribute semantics, no entity re-encoding — the 100 TB contract is a
fixed chain of codegen'd regex/replace passes per document (eight
regex + seven literal replaces, no tree ever materialized, one
whole-stage-codegen projection; pass-count pinned by a unit test). Pathological markup (unclosed
``<script>``, tags split across documents) degrades to conservative
behavior (strip to end / leave text alone), never to an error.

Pattern dialect contract (the ``functions/pii`` discipline): every
pattern is valid AND equivalent in Java regex (Spark) and RE2 (DuckDB)
— inline ``(?is)`` flags and lazy ``.*?`` are supported by both, no
lookaround, no backreferences — and the named-entity pass is literal
``replace``, so the whole JVM path is oracle-checkable cell-for-cell
via the module-owned ``duckdb_strip_html_sql`` builder; hand-written
fixture expectations live in ``tests/test_html.py`` (the
generated-twin mitigation norm).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Regex passes, applied in ORDER (insertion order is the contract).
# ASCII-only; (?is) = case-insensitive + dot-matches-newline in both
# Java and RE2.
STRIP_STEPS: tuple[tuple[str, str], ...] = (
    # comments and CDATA wrappers FIRST — a commented-out '<script>'
    # opener must vanish harmlessly here, or the script pass below
    # would treat it as live and delete every character up to the next
    # '</script>' (or end of document) — r12 review, empirically a
    # whole-document-body loss on real crawl HTML. (Keep CDATA's inner
    # text? No: CDATA in crawl HTML is almost always JS/CSS payload —
    # drop the whole block, same conservative rule as script.)
    (r"(?s)<!--.*?(?:-->|\z)", ""),
    (r"(?s)<!\[CDATA\[.*?(?:\]\]>|\z)", ""),
    # script/style payloads are code, never prose — drop tag AND body.
    # Lazy body + closing tag; an unclosed block strips to end-of-doc
    # (conservative: better to lose a tail than ship JavaScript into
    # the corpus). The fallback anchor is \z, NOT $ — Java's $ matches
    # BEFORE a final newline while RE2's does not, and \z means
    # end-of-text in both. The [^>]* after the name allows attributes.
    (r"(?is)<script\b[^>]*>.*?(?:</script\s*>|\z)", ""),
    (r"(?is)<style\b[^>]*>.*?(?:</style\s*>|\z)", ""),
    # declarations ('<!DOCTYPE html>' heads ~every real page), IE
    # downlevel-revealed conditional markers ('<![if !IE]>' /
    # '<![endif]>' — their BODY is revealed text and must be kept, the
    # markers stripped; the optional '[' covers them, and CDATA can
    # never reach here because its pass runs earlier), and
    # '<?xml ...?>' processing instructions — the generic tag strip
    # below requires a LETTER after '<'/'</', so without these passes
    # all three survive verbatim into the corpus (r12/r13 reviews).
    (r"<!\[?[A-Za-z][^>]*>", ""),
    (r"(?s)<\?.*?(?:\?>|\z)", ""),
    # block-level boundaries -> newline, so paragraph structure
    # survives for normalize's blank-run cap. br joins the list (it IS
    # a line break) — self-closing forms covered by [^>]*.
    (
        r"(?i)</?(?:p|div|br|li|ul|ol|dl|dt|dd|tr|td|th|table|thead|"
        r"tbody|h[1-6]|blockquote|pre|section|article|aside|header|"
        r"footer|nav|form|figure|figcaption|hr|title)\b[^>]*>",
        "\n",
    ),
    # every remaining tag (inline spans, links, unknown elements) -> ''.
    # Requires a letter or / after < , so stray 'a < b' survives.
    (r"(?s)</?[A-Za-z][^>]*>", ""),
)

# Named entities decoded JVM-side, as LITERAL replaces, in ORDER.
# &amp; must be LAST: '&amp;lt;' means the four characters '&lt;' —
# decoding &amp; first and &lt; second would wrongly yield '<'.
# &nbsp; decodes to the real NBSP (U+00A0) so the downstream
# normalize Zs fold owns the space semantics — one owner per concern.
ENTITY_REPLACES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_html(c: Column | str, decode_entities: bool = True) -> Column:
    """Markup stripped + (by default) the dominant named entities
    decoded, as one chained JVM codegen stage (regexp_replace x8 +
    literal replace x7 — the counts a unit test pins against
    STRIP_STEPS/ENTITY_REPLACES). NULL -> NULL (both engines' replace/
    regexp_replace null-propagate). ``decode_entities=False`` strips
    tags ONLY — required when :func:`unescape_entities` runs next, so
    entities decode exactly once (decoding twice breaks the
    double-escape guarantee: '&amp;amp;' must yield the text '&amp;',
    never '&' — r12 review). Output whitespace is NOT normalized —
    compose with ``functions/normalize.canonicalize_text`` for the
    canonical form."""
    out = F.col(c) if isinstance(c, str) else c
    for pattern, repl in STRIP_STEPS:
        out = F.regexp_replace(out, pattern, repl)
    if decode_entities:
        for search, repl in ENTITY_REPLACES:
            out = F.replace(out, F.lit(search), F.lit(repl))
    return out


def unescape_entities(c: Column | str) -> Column:
    """FULL HTML5 entity decode — every named entity plus numeric
    ``&#d;``/``&#xh;`` forms — via stdlib ``html.unescape`` in an
    Arrow-batched ``pandas_udf`` (numeric forms need ``chr``; no regex
    can compute them — the documented built-ins-first exception).
    Applies NO tag stripping; run :func:`strip_html` first. NULL ->
    NULL."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _unescape(texts: pd.Series) -> pd.Series:
        import html as _html

        return texts.map(lambda t: None if t is None else _html.unescape(t))

    c = F.col(c) if isinstance(c, str) else c
    return _unescape(c)


def html_to_text(c: Column | str, full_entities: bool = False) -> Column:
    """The composed extractor: :func:`strip_html`, optionally with the
    full :func:`unescape_entities` pass, then
    ``normalize.canonicalize_text`` (whitespace + NFC). The default
    ``full_entities=False`` keeps the whole pipeline JVM-side except
    normalize's single NFC batch. With ``full_entities=True`` the JVM
    entity replaces are SKIPPED (tag strip only) and ``html.unescape``
    is the single decoder — entities must decode exactly once on
    either path."""
    from azure_etl_databricks_sql_powerbi_spark.functions.normalize import (
        canonicalize_text,
    )

    if full_entities:
        out = unescape_entities(strip_html(c, decode_entities=False))
    else:
        out = strip_html(c)
    return canonicalize_text(out)


# ---------------------------------------------------------------- oracle
# Module-owned DuckDB twin of the JVM path (generated from the SAME
# constants, so engine and oracle cannot desync; hand-written fixture
# expectations in tests/test_html.py are the independent check).


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def duckdb_decode_entities_sql(expr: str) -> str:
    """DuckDB twin of the ordered ``ENTITY_REPLACES`` chain (the same
    fold :func:`strip_html` and ``links.decode_href_entities`` run
    JVM-side): literal ``replace`` steps in ORDER, ``&amp;`` last so a
    double-escape decodes exactly once. ONE definition for every
    oracle that replays the decode (the r14 review's
    duplicated-fold finding) — returns a SQL expression string over
    ``expr``."""
    out = expr
    for search, repl in ENTITY_REPLACES:
        s = search.replace("'", "''")
        r = repl.replace("'", "''")
        out = f"replace({out}, '{s}', '{r}')"
    return out


def duckdb_strip_html_sql(
    text_expr: str = "text", decode_entities: bool = True
) -> str:
    """DuckDB twin of :func:`strip_html` — same regex passes (RE2
    accepts the (?is)/lazy forms verbatim), same literal entity
    replaces, same order, same ``decode_entities`` switch."""
    out = text_expr
    for pattern, repl in STRIP_STEPS:
        out = (
            f"regexp_replace({out}, {_sql_quote(pattern)}, "
            f"{_sql_quote(repl)}, 'g')"
        )
    if decode_entities:
        for search, repl in ENTITY_REPLACES:
            out = f"replace({out}, {_sql_quote(search)}, {_sql_quote(repl)})"
    return out
