"""HTML → text extraction: hand-written fixtures with exact expected
outputs (the generated-twin mitigation norm), cell-for-cell DuckDB
parity of the JVM path, the \\z-not-$ unclosed-block dialect case,
entity-order semantics (&amp; last), full-entity unescape vs stdlib,
composition with canonicalize, and the all-JVM plan pin."""

from __future__ import annotations

import html as _stdlib_html

import duckdb
import pytest

from azure_etl_databricks_sql_powerbi_spark.functions.html import (
    duckdb_strip_html_sql,
    html_to_text,
    strip_html,
    unescape_entities,
)

# (doc_id, raw_html, expected strip_html output) — expectations BY HAND.
FIXTURES = [
    (1, "<p>Hello <b>world</b></p>", "\nHello world\n"),
    (2, "a<script type='t'>var q=1;</script>b", "ab"),
    # unclosed script ending in a newline: the \z fallback must strip
    # to END OF TEXT in both engines (Java's $ would stop before \n)
    (3, "a<script>junk\n", "a"),
    (4, "x<style>.c{color:red}</style>y", "xy"),
    (5, "a<!-- hidden -->b<!--unclosed", "ab"),
    (6, "a<![CDATA[var x;]]>b", "ab"),
    # entity decode: the dominant named set, &nbsp; -> real NBSP
    (
        7,
        "Tom &amp; Jerry &lt;3 &quot;q&quot; &#39;s&#39;&nbsp;end",
        'Tom & Jerry <3 "q" \'s\' end',
    ),
    # double-escape: &amp;lt; is the TEXT '&lt;', never '<'
    (8, "&amp;lt;b&amp;gt;", "&lt;b&gt;"),
    # markup smuggled as entities stays text (decode AFTER strip)
    (9, "&lt;b&gt;not bold&lt;/b&gt;", "<b>not bold</b>"),
    # stray < followed by space or digit is prose, not a tag
    (10, "a < b and x<5 but y<z", "a < b and x<5 but y<z"),
    # block tags keep paragraph structure as newlines
    (11, "<h1>T</h1><p>a</p><p>b</p>", "\nT\n\na\n\nb\n"),
    (12, "l1<br/>l2<BR>l3", "l1\nl2\nl3"),
    (13, "<P CLASS='x'>a</P><SCRIPT>s()</SCRIPT>", "\na\n"),
    (14, '<a href="u" title="t">link</a> <img src="i"/>', "link "),
    (15, "", ""),
    (16, None, None),
    # DOCTYPE and <?xml?> never reach the corpus (r12 review: the
    # generic strip needs a letter after '<', so these need own passes)
    (17, "<!DOCTYPE html><p>hi</p>", "\nhi\n"),
    (18, "<?xml version='1.0'?><p>x</p>", "\nx\n"),
    # a COMMENTED-OUT script opener must not arm the script pass and
    # eat the document body (r12 review: comments strip first)
    (19, "keep<!-- <script src=x.js> -->rest stays", "keeprest stays"),
    # IE downlevel-REVEALED conditionals: the markers strip, the body
    # (real revealed text) stays (r13 ADVICE — previously both markers
    # leaked through every pass)
    (20, "a<![if !IE]>shown<![endif]>b", "ashownb"),
    # ... and the CDATA pass still owns <![CDATA[ (runs earlier), so
    # the widened declaration pattern never truncates a CDATA block
    (21, "x<![CDATA[if !IE]]>y<![endif]>z", "xyz"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in FIXTURES], "doc_id long, text string"
    )


def test_strip_html_matches_handwritten_expectations(spark, docs):
    got = {
        r.doc_id: r.out
        for r in docs.select(
            "doc_id", strip_html("text").alias("out")
        ).collect()
    }
    for doc_id, _, want in FIXTURES:
        assert got[doc_id] == want, (doc_id, repr(got[doc_id]), repr(want))


def test_duckdb_twin_matches_cell_for_cell(spark, docs):
    pdf = docs.toPandas().sort_values("doc_id")
    con = duckdb.connect()
    con.register("fixtures", pdf)
    oracle = {
        r[0]: r[1]
        for r in con.sql(
            f"SELECT doc_id, {duckdb_strip_html_sql('text')} "
            "FROM fixtures ORDER BY doc_id"
        ).fetchall()
    }
    got = {
        r.doc_id: r.out
        for r in docs.select(
            "doc_id", strip_html("text").alias("out")
        ).collect()
    }
    for doc_id, _, _ in FIXTURES:
        assert got[doc_id] == oracle[doc_id], (
            doc_id,
            repr(got[doc_id]),
            repr(oracle[doc_id]),
        )


def test_unescape_entities_full_table(spark):
    rows = [
        (1, "&#233;clair &#x2019;s &eacute; &hellip; &amp;"),
        (2, "no entities"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.out
        for r in df.select(
            "doc_id", unescape_entities("text").alias("out")
        ).collect()
    }
    for doc_id, raw in rows:
        want = None if raw is None else _stdlib_html.unescape(raw)
        assert got[doc_id] == want, (doc_id, repr(got[doc_id]), repr(want))
    # numeric entities really decoded (the thing no regex can do)
    assert got[1].startswith("éclair ’s")


def test_html_to_text_composition(spark):
    # decomposed e+U+0301 inside markup, NBSP entities, empty paragraph:
    # strip -> canonicalize yields composed NFC text with capped blanks
    raw = "<p>caf" + "e\u0301" + "&nbsp;&nbsp;shop</p><p></p><p>next</p>"
    df = spark.createDataFrame([(1, raw)], "doc_id long, text string")
    out = df.select(html_to_text("text").alias("out")).collect()[0].out
    assert out == "caf\u00e9 shop\n\nnext", repr(out)


def test_full_entities_path_decodes_exactly_once(spark):
    """html_to_text(full_entities=True) must skip the JVM entity
    replaces so html.unescape is the single decoder — '&amp;amp;' is
    the literal text '&amp;', never '&' (r12 review caught the double
    decode)."""
    rows = [(1, "<p>a &amp;amp; b</p>"), (2, "<p>&amp;lt;b&amp;gt;</p>")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.out
        for r in df.select(
            "doc_id", html_to_text("text", full_entities=True).alias("out")
        ).collect()
    }
    assert got[1] == "a &amp; b", repr(got[1])
    assert got[2] == "&lt;b&gt;", repr(got[2])
    # and the default JVM path makes the same promise via &amp;-last
    jvm = {
        r.doc_id: r.out
        for r in df.select(
            "doc_id", html_to_text("text").alias("out")
        ).collect()
    }
    assert jvm == got


def test_strip_html_is_pure_jvm_and_composed_plan_has_one_udf(spark):
    """strip_html must plan with ZERO Python evaluation nodes (the
    100 TB scan-speed contract); html_to_text's only Python is
    normalize's single NFC ArrowEvalPython."""
    df = spark.createDataFrame([(1, "<p>a</p>")], "doc_id long, text string")
    plan_strip = (
        df.select(strip_html("text").alias("o"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan_strip, plan_strip
    assert "BatchEvalPython" not in plan_strip, plan_strip
    plan_full = (
        df.select(html_to_text("text").alias("o"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan_full.count("ArrowEvalPython") == 1, plan_full


# ---- property: dialect parity over adversarial markup fragments ----

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# Fragments chosen to recombine into every hazardous shape the
# STRIP_STEPS patterns can meet: nested/unclosed/commented openers,
# entity double-escapes, stray '<'/'&', case variants, \z-tail cases.
_FRAGMENTS = [
    "<script>", "</script>", "<SCRIPT src=x>", "<style>", "</style>",
    "<!--", "-->", "<![CDATA[", "]]>", "<!DOCTYPE html>", "<?xml?>",
    "<?", "?>", "<p>", "</p>", "<br/>", "<b>", "</b>", "<a href='u'>",
    "&amp;", "&lt;", "&gt;", "&nbsp;", "&amp;lt;", "&#39;", "&",
    "<", ">", "a < b", "x<5", "text", "var q=1;", " ", "\n", "\t",
]

_markup = st.lists(
    st.lists(st.sampled_from(_FRAGMENTS), max_size=12).map("".join),
    min_size=1,
    max_size=25,
)


@given(texts=_markup)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_strip_html_dialect_parity_property(spark, texts):
    """For any recombination of hazardous markup fragments, Spark's
    strip_html equals the DuckDB twin cell-for-cell — this hunts
    Java-regex-vs-RE2 divergences in the lazy/(?is)/\\z pattern forms
    that the hand fixtures can't enumerate. One Spark job + one DuckDB
    query per example (the batched-rows cost discipline)."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.out
        for r in df.select(
            "doc_id", strip_html("text").alias("out")
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    orc = {
        r[0]: r[1]
        for r in con.sql(
            f"SELECT doc_id, {duckdb_strip_html_sql('text')} FROM t"
        ).fetchall()
    }
    for i, _ in rows:
        assert got[i] == orc[i], (i, repr(texts[i]), repr(got[i]), repr(orc[i]))


def test_docstring_pass_counts_match_the_constants():
    """The module sells its scale contract as 'eight regex + seven
    literal replaces' — pin the counts so the next pattern edit must
    update the contract (the r12 review caught a stale 'seven')."""
    from azure_etl_databricks_sql_powerbi_spark.functions import html as m

    assert len(m.STRIP_STEPS) == 8
    assert len(m.ENTITY_REPLACES) == 7
    assert "eight\nregex + seven literal replaces" in m.__doc__
