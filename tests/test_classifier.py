"""Distilled hashed linear quality classifier (functions/classifier.py):
teacher agreement, external-weights application, empty-doc prior
fallback, and model-sized weight table."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.classifier import (
    apply_linear_classifier,
    distill_quality_classifier,
    train_bucket_log_odds,
)
from tests.conftest import SF_SMOKE


def test_distilled_classifier_agrees_with_its_teacher(spark):
    """The distilled model must substantially reproduce the rule gate it
    was trained on (in-sample NB distillation on well-separated rule
    outcomes) — the whole point of distilling: a smooth scorer that ranks
    like the rules."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = distill_quality_classifier(docs, n_buckets=512)
    rows = out.collect()
    assert len(rows) == docs.count()
    agree = sum(1 for r in rows if r.predicted_keep == r.rule_keep)
    assert agree / len(rows) >= 0.8, f"teacher agreement {agree / len(rows):.2f}"
    # both classes are represented — the model is not a constant
    preds = {r.predicted_keep for r in rows}
    assert preds == {0, 1}, preds


def test_apply_with_external_weights_and_empty_doc_prior(spark):
    """apply_linear_classifier takes any (bucket, w_m) frame — a model
    trained elsewhere — and a doc with no tokens scores exactly the bare
    prior."""
    docs = spark.createDataFrame(
        [(1, "alpha alpha beta"), (2, "   ")], "doc_id long, text string"
    )
    from azure_etl_databricks_sql_powerbi_spark.functions.features import (
        hash_bucket,
    )

    b_alpha = docs.sparkSession.createDataFrame(
        [("alpha",), ("beta",)], "token string"
    ).select(hash_bucket("token", 64).alias("b")).collect()
    weights = spark.createDataFrame(
        [(b_alpha[0].b, 2_000_000), (b_alpha[1].b, -500_000)], "bucket int, w_m long"
    )
    prior = spark.createDataFrame([(100_000,)], "prior_m long")
    got = {
        r.doc_id: r
        for r in apply_linear_classifier(
            docs, weights, prior, n_buckets=64
        ).collect()
    }
    # doc 1: prior + 2*alpha + beta = 0.1 + 4.0 - 0.5 = 3.6
    assert got[1].n_tokens == 3
    assert abs(got[1].logit - 3.6) < 1e-9
    assert got[1].predicted_keep == 1
    # doc 2: no tokens -> bare prior
    assert got[2].n_tokens == 0
    assert abs(got[2].logit - 0.1) < 1e-9


def test_weight_table_is_model_sized(spark):
    """The trained state is bounded by n_buckets (the hashing trick: no
    vocabulary-sized model), and every weight is finite."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    from azure_etl_databricks_sql_powerbi_spark.functions.features import (
        hash_bucket,
    )
    from azure_etl_databricks_sql_powerbi_spark.functions.text import tokens

    ltoks = (
        docs.select(
            F.explode(tokens("text")).alias("token"),
            F.lit(1).alias("__label"),
        )
        .withColumn("bucket", hash_bucket("token", 64))
    )
    w = train_bucket_log_odds(ltoks, 64).collect()
    assert len(w) <= 64
    assert all(r.w_m is not None for r in w)


def test_classifier_save_load_apply_identical(spark, tmp_path):
    """Model persistence through the TRAIN ENTRY POINT (no hand-copied
    label/feature chain — the r7 review finding): scores from the loaded
    model equal the in-memory model's exactly (integer weights roundtrip
    losslessly) — train once, apply to day-N batches."""
    from azure_etl_databricks_sql_powerbi_spark.functions.classifier import (
        load_classifier,
        save_classifier,
        train_quality_classifier,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(200)
    weights, prior = train_quality_classifier(docs, n_buckets=64)
    save_classifier(weights, prior, str(tmp_path / "model"), n_buckets=64)
    lw, lp, lnb = load_classifier(spark, str(tmp_path / "model"))
    assert lnb == 64  # the hash-space size travels WITH the model

    batch = docs.limit(50)
    a = {
        r.doc_id: (r.n_tokens, r.logit, r.predicted_keep)
        for r in apply_linear_classifier(batch, weights, prior, n_buckets=64).collect()
    }
    b = {
        r.doc_id: (r.n_tokens, r.logit, r.predicted_keep)
        for r in apply_linear_classifier(batch, lw, lp, n_buckets=lnb).collect()
    }
    assert a == b


def test_unseen_bucket_counts_token_with_zero_weight(spark):
    """ADVICE r7: applying an EXTERNAL model whose weight table lacks
    some buckets must not drop those tokens — they contribute weight 0
    but still count toward n_tokens (left join + coalesce, not inner)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.features import (
        hash_bucket,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta beta")], "doc_id long, text string"
    )
    buckets = {
        r.token: r.b
        for r in spark.createDataFrame([("alpha",), ("beta",)], "token string")
        .select("token", hash_bucket("token", 64).alias("b"))
        .collect()
    }
    assert buckets["alpha"] != buckets["beta"]  # no collision at 64
    # weights cover ONLY alpha's bucket — beta is unseen-by-the-model
    weights = spark.createDataFrame(
        [(buckets["alpha"], 2_000_000)], "bucket int, w_m long"
    )
    prior = spark.createDataFrame([(100_000,)], "prior_m long")
    got = apply_linear_classifier(docs, weights, prior, n_buckets=64).collect()[0]
    assert got.n_tokens == 3  # beta's two tokens still counted
    assert abs(got.logit - 2.1) < 1e-9  # prior 0.1 + alpha 2.0 + beta 0
