"""Boilerplate passage detection/removal tests: planted-banner recovery,
strip semantics vs a module-owned DuckDB twin on the real documents
table, and the no-pairwise-blowup property (a passage shared by many
docs is one aggregate row, not a quadratic bucket)."""

from __future__ import annotations

import duckdb

from oracle_harness import compare

from azure_etl_databricks_sql_powerbi_spark.dedup.boilerplate import (
    boilerplate_passages,
    strip_boilerplate,
)

SF = "/root/testdata/sf0.001"

BANNER = "accept all cookies to continue"  # 5 tokens


def _planted(spark):
    rows = [
        (1, f"{BANNER} alpha bravo charlie delta echo"),
        (2, f"foxtrot golf {BANNER} hotel india"),
        (3, f"juliet kilo lima {BANNER}"),
        (4, "mike november oscar papa quebec romeo sierra"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_banner_detected_and_stripped(spark):
    docs = _planted(spark)
    bp = boilerplate_passages(docs, n=5, min_df=3)
    found = {r.passage: r.doc_freq for r in bp.collect()}
    assert found == {BANNER: 3}

    out = {r.doc_id: r for r in strip_boilerplate(docs, n=5, min_df=3).collect()}
    assert out[1].clean_text == "alpha bravo charlie delta echo"
    assert out[2].clean_text == "foxtrot golf hotel india"
    assert out[3].clean_text == "juliet kilo lima"
    assert out[4].clean_text == "mike november oscar papa quebec romeo sierra"
    assert out[4].n_tokens_removed == 0
    assert out[5].clean_text == "" and out[5].n_tokens_kept == 0
    assert out[1].n_tokens_removed == 5 and out[1].n_tokens_kept == 5


def test_fully_boilerplate_doc_survives_empty(spark):
    docs = spark.createDataFrame(
        [(i, BANNER) for i in range(1, 5)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in strip_boilerplate(docs, n=5, min_df=3).collect()}
    assert all(r.clean_text == "" and r.n_tokens_removed == 5 for r in out.values())
    assert len(out) == 4  # every doc keeps a row


# DuckDB twin of strip_boilerplate(documents, n=8, min_df=5): same
# tokenization (trim + \s+), same short-doc single-window contract, same
# coverage arithmetic — cell-exact.
STRIP_SQL = r"""
    WITH toks AS (
        SELECT doc_id,
               CASE WHEN length(TRIM(text)) = 0
                    THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(TRIM(text), '\s+') END AS t
        FROM read_parquet('{sf}/documents.parquet')
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
    FROM read_parquet('{sf}/documents.parquet') d
    JOIN toks t USING (doc_id)
    LEFT JOIN kept k ON k.doc_id = d.doc_id
"""


def test_strip_matches_duckdb_twin_on_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = strip_boilerplate(docs, n=8, min_df=5)
    orc = duckdb.sql(STRIP_SQL.format(sf=SF)).df()
    assert compare(out, orc, float_tol=1e-9) == []


def test_observation_reports_coverage(spark):
    """The rescan trade is monitored: an Observation on the coverage
    aggregate reports exactly how many positions/docs/window-incidences
    the plan re-derives instead of persisting. Planted corpus: docs 1-3
    carry one 5-token banner each (doc 1 once, at positions 1-5; doc 2 at
    3-7; doc 3 at 4-8), so coverage = 15 positions over 3 docs with one
    banner window incidence per doc."""
    from pyspark.sql import Observation

    obs = Observation("boilerplate")
    out = strip_boilerplate(_planted(spark), n=5, min_df=3, observation=obs)
    rows = {r.doc_id: r for r in out.collect()}  # action -> metrics avail
    assert rows[1].clean_text == "alpha bravo charlie delta echo"
    got = obs.get
    assert got["covered_positions"] == 15
    assert got["covered_docs"] == 3
    assert got["boilerplate_window_hits"] == 3


def test_observation_zero_coverage(spark):
    """No boilerplate anywhere -> all three counters are 0, not null."""
    from pyspark.sql import Observation

    docs = spark.createDataFrame(
        [(1, "alpha bravo"), (2, "charlie delta")], "doc_id long, text string"
    )
    obs = Observation()
    strip_boilerplate(docs, n=2, min_df=3, observation=obs).collect()
    got = obs.get
    assert got["covered_positions"] == 0
    assert got["covered_docs"] == 0
    assert got["boilerplate_window_hits"] == 0


def test_no_pairwise_blowup(spark):
    """1000 docs sharing one banner: the passage report is ONE row and
    the strip output is 1000 rows — nothing quadratic anywhere."""
    docs = spark.createDataFrame(
        [(i, f"{BANNER} unique{i} token{i}") for i in range(1000)],
        "doc_id long, text string",
    )
    assert boilerplate_passages(docs, n=5, min_df=900).count() == 1
    assert strip_boilerplate(docs, n=5, min_df=900).count() == 1000
