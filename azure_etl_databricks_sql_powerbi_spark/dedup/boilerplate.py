"""Cross-document boilerplate passage detection and removal.

Web-scale corpora are full of VERBATIM repeated passages that are not
document duplicates: cookie banners, license headers, navigation
footers, forum signatures. Document-level dedup (exact/MinHash) keeps
every copy because the surrounding document differs; yet for training
data the repeated passage is exactly what you want gone — it dominates
gradient updates out of proportion to its information content (the
motivation behind repeated-substring dedup, Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better"). This module
implements the bounded window variant of that idea:

- ``boilerplate_passages``: every ``n``-token window whose DOCUMENT
  frequency (distinct docs containing it) reaches ``min_df`` — the
  report of what the corpus repeats.
- ``strip_boilerplate``: per document, drop every token position covered
  by at least one such window; keep the rest in order.

Scale shape: windows are the shingle machinery (``dedup/cluster``) with
positions kept. The document-frequency aggregate and the
boilerplate-membership join both carry ``xxhash64(window)`` — 8 bytes,
never window text — and the coverage expansion is a bounded explode
(≤ n positions per covered window). No pairwise work anywhere: cost is
O(total tokens), independent of how many documents share a passage —
this is what makes it usable where pair-based dedup explodes
(a banner shared by 10M pages is ONE aggregate row here, not 10M² pairs).

Determinism: pure token/position arithmetic, no floats; tokenization is
the shared ``functions.text.tokens`` contract (trimmed, ``\\s+``), so a
DuckDB twin (string_split_regex + UNNEST(range) windows) is hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.text import tokens
from azure_etl_databricks_sql_powerbi_spark.util import spread


def _windows(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, start, w_h, len): every n-token window with its 1-based start
    position and xxhash64 of the window text. Docs shorter than ``n``
    tokens yield one window = the whole doc (the ``word_ngrams``
    short-doc contract); empty docs yield none."""
    toks = tokens(text_col)
    return (
        spread(df)
        .select(
            F.col(id_col).alias("id"),
            toks.alias("t"),
            F.size(toks).alias("len"),
        )
        .filter(F.col("len") > 0)
        .select(
            "id",
            "len",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.col("len") - (n - 1), F.lit(1))
                )
            ).alias("start"),
            "t",
        )
        .select(
            "id",
            "len",
            "start",
            F.xxhash64(F.array_join(F.slice("t", F.col("start"), n), " ")).alias(
                "w_h"
            ),
        )
    )


def boilerplate_passages(
    df: DataFrame,
    n: int = 8,
    min_df: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(passage, doc_freq): every ``n``-token window appearing in at
    least ``min_df`` DISTINCT documents, with its document frequency.

    This is the reporting surface, so the aggregate here carries the
    window TEXT (the answer) rather than its hash — use it on corpora
    where the boilerplate report itself is small (it always is: the
    output is bounded by distinct repeated windows, not corpus size).

    Windows come from the shared ``functions.text.word_ngrams`` contract
    (including its short-doc whole-text rule); empty documents are
    filtered first, since the ngram helper maps them to a single ''
    shingle which is not a passage.
    """
    from azure_etl_databricks_sql_powerbi_spark.functions.text import word_ngrams

    wins = (
        spread(df)
        .filter(F.size(tokens(text_col)) > 0)
        .select(
            F.col(id_col).alias("id"),
            F.explode(word_ngrams(text_col, n)).alias("passage"),
        )
        .distinct()
    )
    return (
        wins.groupBy("passage")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_df)
    )


def strip_boilerplate(
    df: DataFrame,
    n: int = 8,
    min_df: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    observation: Observation | None = None,
) -> DataFrame:
    """(id_col, clean_text, n_tokens_kept, n_tokens_removed): every token
    position covered by ≥1 boilerplate window removed, survivors joined
    by single spaces in original order.

    A window starting at ``s`` covers positions ``s .. min(s+n-1, len)``.
    Fully-stripped and empty documents survive with ``clean_text = ''``
    (the caller decides whether to drop them — a quality gate concern,
    not a dedup one).

    Plan shape: the only corpus-sized shuffles carry (id, 8-byte hash)
    window rows; the token REMOVAL itself never shuffles the corpus —
    covered positions aggregate per doc (output bounded by boilerplate
    coverage, typically a small fraction of tokens), join back onto the
    docs, and a row-local set difference (array_except over the position
    range) gathers the surviving tokens.
    An earlier draft reassembled docs by shuffling every (id, pos,
    token) row through a groupBy — corpus-sized where this is
    coverage-sized. The tokenize+window+hash map stage runs twice (the
    df-frequency aggregate and the coverage probe consume ``wins`` under
    different exchanges, so AQE cannot reuse one scan) plus a third
    tokenize in the output projection — a deliberate rescan-vs-persist
    trade: materializing the per-token window frame costs ~corpus-sized
    storage at 100 TB, while the rescans are map-only passes over the
    source columns. Window membership joins on ``xxhash64`` (the
    ``shingle_edges`` discipline: a ~2^-64 collision could strip a
    non-boilerplate window; the text-keyed SQL twin is identical modulo
    that probability).

    The rescan trade is never silent when the caller passes an
    ``observation`` (the minhash/semantic "No silent caps" discipline):
    after an action, ``observation.get`` reports ``covered_positions``
    (exact count of stripped token positions corpus-wide),
    ``covered_docs`` (documents touched by any boilerplate window), and
    ``boilerplate_window_hits`` (distinct (doc, window) boilerplate
    incidences) — the three numbers that price the coverage aggregate
    this plan rescans for instead of persisting.
    """
    wins = _windows(df, text_col, id_col, n)
    # boilerplate membership by hash: distinct (doc, window) -> doc freq
    bp = (
        wins.select("id", "w_h")
        .distinct()
        .groupBy("w_h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("w_h")
    )
    per_doc_aggs = [F.collect_set("pos").alias("__cov")]
    cov_cols = ["id"]
    if observation is not None:
        # distinct boilerplate windows hitting this doc — collected in the
        # same single aggregation pass, monitoring-only (skipped otherwise,
        # and w_h is only projected into the explode when it is consumed)
        per_doc_aggs.append(F.size(F.collect_set("w_h")).alias("__nw"))
        cov_cols.append("w_h")
    cov_sets = (
        wins.join(bp, "w_h")
        .select(
            *cov_cols,
            F.explode(
                F.sequence(
                    F.col("start"),
                    F.least(F.col("start") + (n - 1), F.col("len")),
                )
            ).alias("pos"),
        )
        .groupBy("id")
        .agg(*per_doc_aggs)
    )
    toks = tokens(text_col)
    base = df.select(F.col(id_col).alias("id"), toks.alias("__t"))
    cov = F.coalesce(F.col("__cov"), F.array().cast("array<int>"))
    # kept positions via one hash-set difference (O(n_tokens + coverage)
    # row-local), then a positional gather — NOT a per-token
    # array_contains probe, which is O(n_tokens x coverage) and on the
    # module's own target case (a long fully-covered doc) quadratic.
    # array_except preserves first-array order in the current Spark
    # implementation (the API docs only promise "without duplicates"), so
    # ascending positions stay ascending and the gather keeps original
    # token order; the hash-exact DuckDB twin test pins this dependency.
    pos_all = F.when(
        F.size("__t") > 0, F.sequence(F.lit(1), F.size("__t"))
    ).otherwise(F.array().cast("array<int>"))
    kept_pos = F.array_except(pos_all, cov)
    kept = F.transform(kept_pos, lambda p: F.element_at(F.col("__t"), p))
    joined = base.join(cov_sets, "id", "left")
    if observation is not None:
        # Observe on the JOINED frame, not cov_sets: when no window reaches
        # min_df the cov_sets subtree is empty and AQE empty-relation
        # propagation prunes a CollectMetrics node attached there out of
        # the physical plan entirely (Observation.get then throws instead
        # of reporting zeros). The left join's output always executes, so
        # the metrics node here survives any empty right side.
        # size(NULL) is NULL under ANSI (Spark 4 default) but -1 with ANSI
        # off — the inner coalesce makes the metric config-independent
        # (uncovered docs contribute 0 either way, never -1).
        joined = joined.observe(
            observation,
            F.coalesce(
                F.sum(F.coalesce(F.size("__cov"), F.lit(0))), F.lit(0)
            ).alias("covered_positions"),
            F.count(F.when(F.col("__cov").isNotNull(), 1)).alias(
                "covered_docs"
            ),
            F.coalesce(F.sum("__nw"), F.lit(0)).alias(
                "boilerplate_window_hits"
            ),
        )
    return joined.select(
        F.col("id").alias(id_col),
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).cast("long").alias("n_tokens_kept"),
        (F.size("__t") - F.size(kept)).cast("long").alias("n_tokens_removed"),
    )
