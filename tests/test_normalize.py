"""Unicode/text canonicalization: hand-written mojibake fixtures with
exact expected outputs (the generated-twin mitigation norm — the DuckDB
twin is generated from CLEAN_STEPS, so these expectations are the
independent check), cell-for-cell DuckDB parity including the NFC step,
NULL/empty semantics, idempotency, the clean-before-NFC ordering
contract, and the single-UDF-evaluation plan pin."""

from __future__ import annotations

import duckdb
import pytest

from azure_etl_databricks_sql_powerbi_spark.functions.normalize import (
    canonicalize_documents,
    canonicalize_text,
    clean_text,
    duckdb_canonicalize_sql,
    duckdb_clean_sql,
)

# (doc_id, raw, expected_canonical) — expectations written BY HAND,
# invisibles spelled as explicit \\u escapes so the fixture is readable.
FIXTURES = [
    # NFC composition: decomposed e + U+0301 -> precomposed \u00e9
    (1, "caf" + "e\u0301", "caf\u00e9"),
    # ordering contract: ZWSP BETWEEN base and combining mark blocks
    # composition unless the clean pass strips it first
    (2, "e\u200b\u0301", "\u00e9"),
    # C0 controls (BEL, US) stripped; tab/newline survive as whitespace
    (3, "a\x07b\x1fc", "abc"),
    # C1 block (NEL U+0085, U+009F) stripped
    (4, "x\u0085y\u009fz", "xyz"),
    # CRLF and lone CR -> LF
    (5, "a\r\nb\rc", "a\nb\nc"),
    # NBSP folded into the space-run collapse
    (6, "a\u00a0\u00a0b  c\t d", "a b c d"),
    # trailing spaces before a newline dropped; leading indent KEPT
    (7, "line1  \n    code", "line1\n    code"),
    # blank runs capped at one empty line
    (8, "p1\n\n\n\n\np2", "p1\n\np2"),
    # end-trim (space, tab, newline)
    (9, "  hi \n", "hi"),
    # soft hyphen and BOM are invisible splitters -> stripped
    (10, "co\u00adoperate", "cooperate"),
    (11, "\ufeffdoc body", "doc body"),
    # already-canonical text is untouched
    (12, "caf\u00e9", "caf\u00e9"),
    (13, "plain ascii text", "plain ascii text"),
    (14, "", ""),
    (15, None, None),
    # line-start indentation (incl. tabs) survives the run collapse
    (16, "if x:\n\tdo(  1,   2 )", "if x:\n\tdo( 1, 2 )"),
    # whitespace-only "blank" lines become truly blank, then capped
    (17, "p1\n   \n\t\n \np2", "p1\n\np2"),
    # Zs separators (em space, ideographic space) fold into the space
    # run; U+2028 LINE SEPARATOR becomes a real LF (r12 review)
    (18, "a\u2003\u2003b\u3000c\u2028d", "a b c\nd"),
    # a trailing em space is folded, then end-trimmed
    (19, "tail\u2003", "tail"),
    # NFC can GROW text: U+0344 decomposes to U+0308 U+0301, and 'q'
    # has no precomposed diaeresis form to recompose with — the
    # negative norm_len_delta path ('x' would recompose into U+1E8D)
    (20, "q\u0344", "q\u0308\u0301"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in FIXTURES], "doc_id long, text string"
    )


def test_canonicalize_matches_handwritten_expectations(spark, docs):
    got = {
        r.doc_id: r.out
        for r in docs.select(
            "doc_id", canonicalize_text("text").alias("out")
        ).collect()
    }
    for doc_id, _, want in FIXTURES:
        assert got[doc_id] == want, (doc_id, repr(got[doc_id]), repr(want))


def test_duckdb_twin_matches_cell_for_cell(spark, docs):
    """The module-owned builders (clean-only AND full canonicalize, which
    exercises DuckDB's native nfc_normalize vs Python unicodedata) agree
    with the Spark side on every fixture — the engine-equivalence claim
    the module docstring makes, verified empirically."""
    pdf = docs.toPandas().sort_values("doc_id")
    con = duckdb.connect()
    con.register("fixtures", pdf)
    oracle = con.sql(
        f"SELECT doc_id, {duckdb_clean_sql('text')} AS cleaned, "
        f"{duckdb_canonicalize_sql('text')} AS canon "
        "FROM fixtures ORDER BY doc_id"
    ).df()
    got = {
        r.doc_id: (r.cleaned, r.canon)
        for r in docs.select(
            "doc_id",
            clean_text("text").alias("cleaned"),
            canonicalize_text("text").alias("canon"),
        ).collect()
    }
    for _, row in oracle.iterrows():
        s_clean, s_canon = got[row.doc_id]
        assert s_clean == row.cleaned or (
            s_clean is None and row.cleaned is None
        ), (row.doc_id, repr(s_clean), repr(row.cleaned))
        assert s_canon == row.canon or (
            s_canon is None and row.canon is None
        ), (row.doc_id, repr(s_canon), repr(row.canon))


def test_canonicalize_is_idempotent(spark, docs):
    once = docs.select(
        "doc_id", canonicalize_text("text").alias("text")
    )
    twice = once.select(
        "doc_id", canonicalize_text("text").alias("text")
    )
    a = {r.doc_id: r.text for r in once.collect()}
    b = {r.doc_id: r.text for r in twice.collect()}
    assert a == b


def test_canonicalize_documents_audit_columns(spark, docs):
    out = {
        r.doc_id: r
        for r in canonicalize_documents(docs, "text").collect()
    }
    # fixture 1 shrinks by 1 char (two code points compose into one)
    assert out[1].text == "café"
    assert out[1].norm_changed is True and out[1].norm_len_delta == 1
    # untouched ASCII: flagged unchanged, zero delta
    assert out[13].norm_changed is False and out[13].norm_len_delta == 0
    # NFC growth: U+0344 decomposes, so the delta goes NEGATIVE
    assert out[20].norm_changed is True and out[20].norm_len_delta == -1
    # NULL text: NULL audits (no signal)
    assert out[15].text is None
    assert out[15].norm_changed is None and out[15].norm_len_delta is None
    # temp-column collision refuses loudly
    with pytest.raises(ValueError, match="__canon"):
        canonicalize_documents(docs.withColumn("__canon", docs.doc_id))


def test_canonicalize_documents_plans_one_udf_evaluation(spark):
    """canonicalize_documents derives text + 2 audit columns from ONE
    materialized canonical value; the plan must carry exactly one
    ArrowEvalPython node / one _nfc call (the compression_band_filter
    plan-pin discipline)."""
    df = spark.createDataFrame(
        [(1, "x\u0301  y")], "doc_id long, text string"
    )
    plan = (
        canonicalize_documents(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan
    assert plan.count("_nfc") == 1, plan


# ---- property: dialect parity + idempotency over adversarial strings ----

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# Curated adversarial alphabet: every CLEAN_STEPS class member, plain
# text, and long-stable combining marks (Unicode 1.1 Latin diacritics —
# deliberately NOT arbitrary unicode, where Python unicodedata and
# DuckDB utf8proc may track different Unicode versions; the module
# docstring states that caveat).
_ALPHABET = (
    " \t\n\r"
    "\x00\x07\x0b\x0c\x7f\x85\x9f"
    " ­​‌‍﻿"
    "abcXYZ09. -"
    "\u2003\u3000\u2028"
    "éèé̀ß"
)

_texts = st.lists(
    st.text(alphabet=_ALPHABET, max_size=24), min_size=1, max_size=25
)


@given(texts=_texts)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_canonicalize_dialect_parity_and_idempotency_property(spark, texts):
    """For any string over the adversarial alphabet: (1) Spark's
    canonicalize_text equals the DuckDB twin cell-for-cell (the builder
    cannot desync from CLEAN_STEPS, but Java-regex-vs-RE2 semantics
    could — this hunts that), and (2) canonicalization is idempotent.
    One Spark job + one DuckDB query per example (batched rows, the
    test_properties.py cost discipline)."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.canon, r.again)
        for r in df.select(
            "doc_id",
            canonicalize_text("text").alias("canon"),
            canonicalize_text(canonicalize_text("text")).alias("again"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    orc = {
        r[0]: r[1]
        for r in con.sql(
            f"SELECT doc_id, {duckdb_canonicalize_sql('text')} FROM t"
        ).fetchall()
    }
    for i, _ in rows:
        assert got[i][0] == orc[i], (i, repr(texts[i]), repr(got[i][0]), repr(orc[i]))
        assert got[i][1] == got[i][0], (i, repr(texts[i]))
