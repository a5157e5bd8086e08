"""PII scrubbing: planted-identifier redaction, audit counts, pattern
dialect parity with DuckDB (RE2) — the module's patterns promise to mean
the same thing in both engines, so a DuckDB twin pins every count and
every redacted string cell-for-cell."""

from __future__ import annotations

import duckdb
import pytest

from azure_etl_databricks_sql_powerbi_spark.functions.pii import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
    scrub_documents,
)

ROWS = [
    (1, "contact me at jane.doe+spam@example.co.uk or at work"),
    (2, "card 4111 1111 1111 1111 expires soon; backup 5500-0000-0000-0004"),
    (3, "ssn 123-45-6789 leaked next to phone +1 (415) 555-0199"),
    (4, "server at 10.0.0.1 and 192.168.255.255 no pii otherwise"),
    (5, "clean document with order number 12345 and year 2026"),
    (6, "mixed: bob@host.io from 8.8.8.8 called +44 20 7946 0958"),
    # precision fixtures for the r12 card tightening: NONE of these may
    # redact — a 13-digit epoch-millis timestamp (no issuer prefix 3-6),
    # a run of years (mixed groups are not 4-4-4-N with ONE separator),
    # a mixed-separator almost-card, and a 16-digit id starting with 7
    (7, "event at 1755244800000 during 2021 2022 2023 2024 review"),
    (8, "ref 4111 1111-1111 1111 is an order id, not a card"),
    (9, "tracking 7000123412341234 confirmed"),
    # true positives the tightened pattern must still catch: unseparated
    # Visa-prefix 16-digit and Amex-prefix 15-digit
    (10, "pay with 4111111111111111 or amex 371449635398431"),
    # Mastercard 2-series BIN band (2221-2720, issued since 2017) must
    # redact in all three forms — the r12 review caught the plain [3-6]
    # prefix silently leaking these
    (11, "ms 2221000012345678 also 2720 9999 8888 7777 and 2345-6789-0123-4567"),
]
SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_redaction_removes_every_planted_identifier(spark, docs):
    out = {r.doc_id: r.text for r in docs.select("doc_id", redact_pii("text").alias("text")).collect()}
    assert "[EMAIL]" in out[1] and "example.co.uk" not in out[1]
    assert out[2].count("[CARD]") == 2 and "4111" not in out[2]
    assert "[SSN]" in out[3] and "[PHONE]" in out[3]
    assert out[4].count("[IP]") == 2
    # precision: clean text with short digit runs is untouched
    assert out[5] == ROWS[4][1]
    assert "[EMAIL]" in out[6] and "[IP]" in out[6] and "[PHONE]" in out[6]
    # r12 card precision contract: timestamps / year runs / mixed
    # separators / non-issuer 16-digit ids all SURVIVE...
    assert out[7] == ROWS[6][1]
    assert out[8] == ROWS[7][1]
    assert out[9] == ROWS[8][1]
    # ...while unseparated true cards with issuer prefixes still redact
    assert out[10].count("[CARD]") == 2 and "4111111111111111" not in out[10]
    assert out[11].count("[CARD]") == 3 and "2221" not in out[11]


def test_redaction_is_idempotent(spark, docs):
    once = docs.select("doc_id", redact_pii("text").alias("text"))
    twice = once.select("doc_id", redact_pii("text").alias("text"))
    assert {(r.doc_id, r.text) for r in once.collect()} == {
        (r.doc_id, r.text) for r in twice.collect()
    }


def test_audit_counts_match_hand_counts(spark, docs):
    got = {r.doc_id: r.asDict() for r in pii_counts(docs).collect()}
    assert got[1]["email_n"] == 1 and got[1]["pii_total"] == 1
    assert got[2]["card_n"] == 2 and got[2]["pii_total"] == 2
    assert got[3]["ssn_n"] == 1 and got[3]["phone_n"] == 1
    assert got[4]["ip_n"] == 2
    assert got[5]["pii_total"] == 0
    assert got[6]["pii_total"] == 3
    assert got[7]["pii_total"] == 0 and got[8]["pii_total"] == 0
    assert got[9]["pii_total"] == 0
    assert got[10]["card_n"] == 2 and got[10]["pii_total"] == 2
    assert got[11]["card_n"] == 3 and got[11]["pii_total"] == 3


def test_scrub_documents_pipeline_form(spark, docs):
    out = {r.doc_id: r for r in scrub_documents(docs).collect()}
    assert out[3].pii_total == 2 and "[SSN]" in out[3].text
    assert out[5].pii_total == 0 and out[5].text == ROWS[4][1]


def test_null_text_counts_zero_and_tokens_stay_digit_free(spark):
    """NULL text must report 0 for every kind (config-independent — the
    size(NULL) hazard), and every replacement token must be digit- and
    @-free, the invariant the idempotency contract rests on."""
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.functions.pii import _replacement

    for kind in PII_PATTERNS:
        tok = _replacement(kind)
        assert not any(ch.isdigit() for ch in tok) and "@" not in tok, tok

    spark_df = spark.createDataFrame([(1, None)], SCHEMA)
    row = pii_counts(spark_df).collect()[0]
    assert row.pii_total == 0 and all(
        row[f"{k}_n"] == 0 for k in PII_PATTERNS
    )
    # redaction of NULL stays NULL (regexp_replace null-propagates)
    assert (
        spark_df.select(redact_pii("text").alias("t")).collect()[0].t is None
    )


def test_empty_kinds_tuple_is_a_noop_not_scrub_everything(spark, docs):
    """An explicit empty kinds tuple must select NO patterns — a
    truthiness test would silently scrub the whole corpus when a
    programmatic kind filter comes out empty."""
    out = {
        r.doc_id: r.text
        for r in docs.select(
            "doc_id", redact_pii("text", kinds=()).alias("text")
        ).collect()
    }
    assert out == dict(ROWS)
    scrubbed = scrub_documents(docs, kinds=()).collect()
    assert all(r.pii_total == 0 for r in scrubbed)


def test_counts_and_redaction_match_duckdb_twin(spark, docs):
    """Dialect-parity pin: per-doc counts (regexp_extract_all length) and
    the fully-redacted text (chained regexp_replace, 'g') must be
    cell-for-cell identical between Spark (Java regex) and DuckDB (RE2)
    — the property that makes every pattern here oracle-checkable if a
    scrub query is ever declared on the driver board."""
    from azure_etl_databricks_sql_powerbi_spark.functions.pii import (
        duckdb_count_sql,
        duckdb_kind_count_sql,
        duckdb_redact_sql,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    # include a NULL-text row: the twin builders must COALESCE it to 0
    # exactly like the Spark side (len(regexp_extract_all(NULL)) is NULL
    # in DuckDB — the gap a non-shared twin had)
    twin_rows = ROWS + [(99, None)]
    con.executemany("INSERT INTO t VALUES (?, ?)", twin_rows)
    sdf = spark.createDataFrame(twin_rows, SCHEMA)

    count_cols = ", ".join(
        f"{duckdb_kind_count_sql(kind)} AS {kind}_n" for kind in PII_PATTERNS
    )
    orc_counts = {
        r[0]: r
        for r in con.execute(
            f"SELECT doc_id, {count_cols}, "
            f"{duckdb_count_sql('text')} AS pii_total FROM t"
        ).fetchall()
    }
    got_counts = {r.doc_id: tuple(r) for r in pii_counts(sdf).collect()}
    assert got_counts == orc_counts

    orc_text = dict(
        con.execute(
            f"SELECT doc_id, {duckdb_redact_sql('text')} FROM t"
        ).fetchall()
    )
    got_text = {
        r.doc_id: r.text
        for r in sdf.select("doc_id", redact_pii("text").alias("text")).collect()
    }
    assert got_text == orc_text
