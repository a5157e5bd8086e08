"""Compression-ratio quality signal: exact arithmetic vs local zlib,
ordering of repetitive << prose < random, NULL/empty semantics, and the
band filter's two-sided drop."""

from __future__ import annotations

import random
import string
import zlib

import pytest

from azure_etl_databricks_sql_powerbi_spark.functions.compress import (
    ZLIB_LEVEL,
    compression_band_filter,
    compression_ratio,
)

PROSE = (
    "The quick brown fox jumps over the lazy dog while the river bends "
    "quietly through the valley and the evening settles over the town. "
    "Farmers bring in the last of the harvest as children run along the "
    "hedgerows trading stories about the fair that arrives next week."
)
REPETITIVE = "buy now click here " * 60
_rng = random.Random(42)
RANDOM_TEXT = "".join(
    _rng.choice(string.ascii_letters + string.digits) for _ in range(1000)
)

ROWS = [
    (1, PROSE),
    (2, REPETITIVE),
    (3, RANDOM_TEXT),
    (4, None),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_ratio_matches_local_zlib_exactly(spark, docs):
    got = {
        r.doc_id: r.ratio
        for r in docs.select(
            "doc_id", compression_ratio("text").alias("ratio")
        ).collect()
    }
    for doc_id, text in ROWS:
        if not text:
            assert got[doc_id] is None, doc_id
        else:
            raw = text.encode("utf-8")
            want = len(zlib.compress(raw, ZLIB_LEVEL)) / len(raw)
            assert got[doc_id] == want, doc_id


def test_ratio_orders_repetitive_prose_random(spark, docs):
    got = {
        r.doc_id: r.ratio
        for r in docs.select(
            "doc_id", compression_ratio("text").alias("ratio")
        ).collect()
    }
    # calibration anchors the band defaults rest on (module docstring)
    assert got[2] < 0.2 < got[1] < 0.75 < got[3]


def test_band_filter_drops_both_tails_and_nulls(spark, docs):
    kept = {r.doc_id for r in compression_band_filter(docs).collect()}
    assert kept == {1}  # repetitive, random-alphabet, NULL, empty all dropped
    wide = {
        r.doc_id
        for r in compression_band_filter(docs, lo=0.0, hi=10.0).collect()
    }
    assert wide == {1, 2, 3}  # NULL/empty still fail the band


def test_band_filter_plans_exactly_one_udf_evaluation(spark):
    """The band references the ratio twice (>= lo AND <= hi); the plan
    must still evaluate the pandas UDF ONCE per row — Spark's
    ExtractPythonUDFs dedups the equal expressions into a single
    ArrowEvalPython node whose output the Filter references twice. This
    pins the claim (r12 review: the docstring asserted it untested)."""
    df = spark.createDataFrame([(1, "hello world " * 20)], "doc_id long, text string")
    plan = (
        compression_band_filter(df, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan
    assert plan.count("_ratio") == 1, plan
