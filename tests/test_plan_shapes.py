"""Physical-plan shape assertions for the flagship queries.

Correctness tests prove the engine computes the right answer; these prove
it computes it the way a 100 TB deployment needs: filters pushed into the
parquet scan, column pruning at the reader, dimensions broadcast (fact
side never shuffles for the join), top-k as TakeOrderedAndProject instead
of a global sort, and semi joins that don't materialize the probe side.
A regression here (a lost broadcast hint, a filter that stopped pushing)
changes no answers at sf0.001 but is exactly what kills a cluster run.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def entry(spark):
    import __spark_entry__ as entrymod

    return entrymod


def test_pricing_summary_pushdown_and_pruning(spark, entry):
    df = entry.queries()["pricing_summary"](spark, SF_SMOKE)
    plan = _plan(df)
    # ship-date predicate reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # column pruning: the scan reads only the 7 needed columns — join keys
    # and line identifiers must NOT be in ReadSchema
    read_schema = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    for col in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
        assert col not in read_schema, f"scan reads unneeded column {col}"
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        assert col in read_schema


def test_star_revenue_broadcasts_all_dims(spark, entry):
    df = entry.queries()["star_revenue_by_region"](spark, SF_SMOKE)
    plan = _plan(df)
    # customer, nation, region ride broadcast joins; only lineitem<->orders
    # may shuffle
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("BroadcastExchange") >= 3


def test_shipping_priority_is_take_ordered(spark, entry):
    df = entry.queries()["shipping_priority_top10"](spark, SF_SMOKE)
    plan = _plan(df)
    # orderBy().limit() must plan as TakeOrderedAndProject — a global sort
    # of the aggregate output would be a scale bug
    assert "TakeOrderedAndProject" in plan
    # the one-segment customer dim is broadcast
    assert "BroadcastHashJoin" in plan


def test_semi_join_stays_semi(spark, entry):
    df = entry.queries()["order_priority_exists"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "LeftSemi" in plan
    # the semi probe side scans only the join key + pushed filter column
    read_schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    li_schema = next(ln for ln in read_schemas if "l_orderkey" in ln)
    assert "l_extendedprice" not in li_schema


def test_anti_join_stays_anti(spark, entry):
    df = entry.queries()["idle_customer_balance"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "LeftAnti" in plan


def test_watermark_filter_pushes_down(spark, entry):
    """relative_watermark's derived cutoff is a literal-free predicate, but
    the events scan must still push the IsNotNull(ts) guard."""
    df = entry.queries()["events_watermark_7d"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "PushedFilters" in plan


# Queries ALLOWED to show these physical shapes, each for a stated reason;
# anything not listed must plan without them. BNLJoin = broadcast
# nested-loop (fine for 1-row scalar subqueries and bounded brute-force
# baselines); SinglePartitionExchange = global aggregate/window (fine when
# the input is already a tiny aggregate or the op is documented global).
_ALLOWED_FLAGS = {
    "events_watermark_7d": {"BNLJoin", "SinglePartitionExchange"},  # scalar max(ts)
    "qc_metrics_orders": {"SinglePartitionExchange"},  # one-row result
    "dbt_qc_report_orders": {"SinglePartitionExchange"},  # one-row QC report
    # domain_stats: 1-row parseable-total broadcast (BNLJoin) + global
    # aggregate over the bounded per-domain counts + global final sort
    "url_provenance_docs": {"BNLJoin", "SinglePartitionExchange"},
    "token_jaccard_pairs": {"BNLJoin"},  # bounded exact ground truth (id<100)
    "ann_cosine_topk": {"BNLJoin"},  # brute-force baseline by design
    "embedding_near_pairs": {"BNLJoin"},  # bounded exact ground truth
    # global ntile over the per-customer aggregate (documented in
    # operators/windows.ntile_bucket — |customers| rows, never the fact)
    "customer_order_distribution": {"SinglePartitionExchange"},
    "idle_customer_balance": {"BNLJoin", "SinglePartitionExchange"},  # scalar avg
    "bracket_revenue_q19": {"SinglePartitionExchange"},  # one-row result
    # spine queries: scalar min/max date + global window over the CALENDAR
    # spine (bounded by days-in-range, never fact rows) — documented in
    # operators/timeseries.py
    "resample_daily_ffill": {"SinglePartitionExchange"},
    "cumulative_distinct_users": {"SinglePartitionExchange"},
    "funnel_conversion": {"SinglePartitionExchange"},  # one-row result
    # Q11 shape: global revenue threshold is a 1-row aggregate joined as a
    # broadcast scalar (documented in plans/gold.important_suppliers)
    "important_suppliers": {"BNLJoin", "SinglePartitionExchange"},
    "corpus_stats": {"SinglePartitionExchange"},  # one-row data card
    # 1-row class-prior aggregate broadcast onto the scored docs
    # (functions/classifier.py — the domain_mix_allocation shape)
    "quality_classifier_docs": {"BNLJoin", "SinglePartitionExchange"},
    # cross-label pairing is a non-equi predicate on a BROADCAST anchor
    # set (similarity/negatives.{hard_negatives,triplet_candidates} —
    # max_anchors ValueError bounds the broadcast side; the
    # ann_cosine_topk shape)
    # (hard_negatives retired r14, §5 swap #14 — its BNL plan contract
    # is re-pointed at the operator in the negatives plan test below)
    "triplet_candidates": {"BNLJoin"},
    # 1-row global token total broadcast onto #domains rows (operators/mixing)
    "domain_mix_allocation": {"BNLJoin", "SinglePartitionExchange"},
    "revenue_change_q6": {"SinglePartitionExchange"},  # one-row result
    "promo_revenue_q14": {"SinglePartitionExchange"},  # one-row result
    # 1-row global min/max normalization stats broadcast onto the fact
    # (sources/layout.zorder_key — same scalar-agg shape as events_watermark_7d)
    "zorder_layout_stats": {"BNLJoin", "SinglePartitionExchange"},
    # one QC row: per-edge 1-row anti-join counts cross-joined literally
    # one row each (operators/qc.referential_orphan_counts)
    "referential_integrity_qc": {"BNLJoin", "SinglePartitionExchange"},
    # one-row diagnostics: the skew/explosion summaries are single global
    # aggregates (map-side-combined partials) cross-joined one row each
    # (operators/diagnostics — the referential_integrity_qc shape)
    "join_diagnostics_summary": {"BNLJoin", "SinglePartitionExchange"},
    # 1-row corpus total + #domains allocation broadcast onto the docs
    # (the domain_mix_allocation shape composed with the budget window)
    "mixture_curation_budget": {"BNLJoin", "SinglePartitionExchange"},
}


def test_salted_join_shape(spark, entry):
    """The skewed-join demo must actually exercise the salt: a shuffled
    (non-broadcast) join whose partitioning key includes __salt — i.e. the
    hot key's rows really are split across n_salts partitions — and the
    dim side replicated via explode, not broadcast."""
    df = entry.queries()["skewed_join_salted"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # the join's exchanges hash-partition on (hot_key, __salt)
    import re

    assert re.search(r"hashpartitioning\(hot_key#\d+L?, __salt#\d+", plan), plan
    assert "BroadcastHashJoin" not in plan


def test_q21_exists_branches_stay_semi_anti(spark, entry):
    """Both correlated EXISTS branches must plan as LeftSemi/LeftAnti on
    the order-key equi condition (residual supplier inequality riding
    along) — a rewrite into inner joins would duplicate fact rows and a
    BNL would be quadratic."""
    df = entry.queries()["sole_return_supplier_q21"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q18_heavy_orders_take_ordered(spark, entry):
    """Q18 aggregates the fact before any join and tops out via
    TakeOrderedAndProject, never a global sort."""
    df = entry.queries()["large_quantity_orders_q18"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan


def test_q7_filters_nation_dims_before_join(spark, entry):
    """The 2-nation predicate must evaluate on the broadcast nation dims
    (dim-side DataFilters), not as a post-join filter on the fact."""
    df = entry.queries()["trade_volume_q7"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 4
    n_name_filtered = [
        ln for ln in plan.splitlines() if "n_name" in ln and "PushedFilters" in ln and "In(" in ln
    ]
    assert n_name_filtered, "nation filter did not reach the dim scan"


def test_dpp_prunes_fact_partitions(spark, entry):
    """Dynamic partition pruning: the partitioned fact's scan must carry a
    dynamicpruning expression on the partition column (fed by the dim's
    broadcast), so only dim-selected partitions are read — at scale the
    difference between scanning 2 partitions and the whole fact. The
    result itself is oracle-checked; this guards the physical mechanism."""
    df = entry.queries()["dpp_priority_revenue"](spark, SF_SMOKE)
    plan = _plan(df)
    scan_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln and "dpp_orders_" in ln
    ]
    assert scan_lines, plan
    assert any("dynamicpruningexpression" in ln for ln in scan_lines), scan_lines


def test_no_unapproved_cartesian_or_global_exchange(spark, entry):
    """Every queries() plan is free of cartesian products, broadcast
    nested-loop joins, and single-partition exchanges except the
    explicitly-allowed scalar/bounded/global cases above."""
    for name, fn in entry.queries().items():
        plan = _plan(fn(spark, SF_SMOKE))
        flags = set()
        if "CartesianProduct" in plan:
            flags.add("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan:
            flags.add("BNLJoin")
        if "Exchange SinglePartition" in plan:
            flags.add("SinglePartitionExchange")
        extra = flags - _ALLOWED_FLAGS.get(name, set())
        assert not extra, f"{name}: unapproved plan shapes {extra}"


def test_small_qty_join_prunes_fact_first(spark):
    """Q17 shape: the brand semi-filter must hit lineitem BEFORE the
    self-aggregate join — the broadcast of the filtered part dim appears
    under both consumers of the pruned fact. (Called on the operator
    directly: the driver query retired r13, §5 swap #12 — capability and
    plan contract remain.)"""
    import re

    from azure_etl_databricks_sql_powerbi_spark.plans import gold

    df = gold.small_quantity_part_revenue(
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet"),
        spark.read.parquet(f"{SF_SMOKE}/part.parquet"),
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # brand equality is evaluated at the part scan (DataFilters), not after
    # the join
    assert re.search(r"p_brand#\d+ = Brand#12", plan)


def test_runtime_bloom_filter_prunes_fact_before_shuffle(spark):
    """Scale posture: with a selective dim-side predicate on a shuffle
    join, the optimizer must inject a runtime bloom filter
    (bloom_filter_agg on the dim, might_contain on the fact scan) so the
    fact side is pruned BEFORE the exchange. Size thresholds are forced
    because the local test tables are far below the 10 GB application-side
    default; the conf itself ships enabled in session.get_spark."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        od = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(od, li["l_orderkey"] == od["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_decimal_star_rollup_broadcasts_and_single_agg_exchange(spark, entry):
    """Exact-money star rollup: every dim join is broadcast (the fact side
    never shuffles pre-aggregate at this sf), the rollup keeps partial
    aggregation before its one exchange, and the money arithmetic stays
    DecimalType through the aggregate — only the FINAL output edge casts
    to double (representation canonicalization vs the oracle; r4 verdict
    item 1)."""
    df = entry.queries()["decimal_star_rollup"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2  # customer + nation at least
    assert "Expand" in plan  # rollup grouping-set expansion
    # partial-then-final aggregate around exactly one shuffle exchange
    assert plan.count("Exchange hashpartitioning") == 1
    # the SUMs themselves are decimal (exact) ...
    assert "sum(__gross" in plan and "sum(__rev" in plan
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "decimal(38,2)" in analyzed and "decimal(38,4)" in analyzed
    # ... and only the contract edge is double
    types = dict(df.dtypes)
    assert types["gross_total"] == "double"
    assert types["revenue_total"] == "double"


def test_chunking_is_shuffle_free(spark):
    """chunk_documents is one scan + explode + project — the fan-out
    happens inside the scan stage, no Exchange anywhere (the 100 TB
    contract: chunking cost is proportional to input bytes, never a
    shuffle)."""
    from azure_etl_databricks_sql_powerbi_spark.operators.chunking import (
        chunk_documents,
    )
    from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table

    df = chunk_documents(load_table(spark, SF_SMOKE, "documents"))
    plan = _plan(df)
    assert "Exchange" not in plan, plan[:2000]
    assert "Generate explode" in plan or "Generate" in plan  # the fan-out


def test_novel_docs_bloom_keeps_anti_join(spark, entry):
    """The bloom-prefiltered incremental dedup still plans its exact
    confirm as a LEFT ANTI join (never a rewrite that could change
    semantics), and the bloom probe is a map-side Python stage (one
    mapInPandas over the batch), not a join. (Built from the operator
    directly since the one-shot query retired — r13 §5 swap #10; the
    declared day-2 plan is a superset, pinned in
    tests/test_incremental_dedup.py::test_day2_plan_never_rescans_corpus.)"""
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.dedup.incremental import (
        novel_documents,
    )
    from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    df = novel_documents(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 5 != 0),
        fpp=0.01,
    )
    plan = _plan(df)
    assert "LeftAnti" in plan
    assert "MapInPandas" in plan


def test_heavy_hitters_single_agg_exchange(spark, entry):
    """The CMS-pruned exact aggregate shuffles once on the token key;
    the sketch probe itself is map-side (MapInPandas before the
    exchange, so the long tail is dropped pre-shuffle)."""
    df = entry.queries()["heavy_hitter_tokens"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "MapInPandas" in plan
    # one hash exchange for the exact groupBy; the orderBy adds a range
    # exchange after the aggregate, never a second hash shuffle
    assert plan.count("Exchange hashpartitioning") == 1


def test_fuzzy_join_is_equi_join_not_cartesian(spark):
    """The blocked fuzzy join must plan as a hash equi-join on the
    blocking key (levenshtein as a post-join filter), never a
    CartesianProduct / BroadcastNestedLoopJoin — the blocking IS the
    scale design."""
    from azure_etl_databricks_sql_powerbi_spark.operators.fuzzy import (
        blocked_fuzzy_pairs,
    )
    from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table

    df = load_table(spark, SF_SMOKE, "customer")
    plan = (
        blocked_fuzzy_pairs(df, ["c_nationkey"], "c_name", "c_custkey", 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert "levenshtein" in plan


def test_rag_ingest_is_one_bounded_plan(spark):
    """The composed RAG chain (gate -> doc dedup -> chunk -> chunk
    dedup) must stay ONE lazy plan with at most 3 exchanges: the
    fingerprint window shuffle and the chunk-dedup aggregate pair; the
    quality gate and the chunk explode add none."""
    from azure_etl_databricks_sql_powerbi_spark.plans.curation import rag_ingest
    from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = (
        rag_ingest(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 3, plan.count("Exchange")


def test_hashed_features_bucket_is_map_side(spark):
    """Feature hashing: the bucket projection (md5/conv arithmetic) must
    sit BELOW the aggregation exchange, so the shuffle carries (id,
    bucket), never tokens."""
    from azure_etl_databricks_sql_powerbi_spark.functions.features import (
        hashed_text_features,
    )
    from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = (
        hashed_text_features(docs)._jdf.queryExecution().executedPlan().toString()
    )
    first_exchange = plan.find("Exchange")
    assert first_exchange != -1
    assert plan.find("md5", first_exchange) > first_exchange  # md5 below it


def test_classifier_weights_ride_broadcast_joins(spark, entry):
    """The distilled classifier's scoring join (feature occurrences x
    weight table) and prior attachment must BROADCAST the model-sized
    side — a shuffle join keyed on bucket would re-shuffle the entire
    token-occurrence stream at 100 TB."""
    df = entry.queries()["quality_classifier_docs"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # the only SinglePartition exchanges are the 1-row prior/total aggs
    assert plan.count("Exchange SinglePartition") <= 3, plan


def test_hard_negatives_broadcasts_anchors_no_corpus_shuffle(spark):
    """The corpus side must stream (broadcast-nested-loop against the
    anchor set); the only Exchange is the per-anchor top-k window."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.negatives import (
        hard_negatives,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    plan = _plan(hard_negatives(emb, emb.filter("vec_id < 4"), k=3))
    assert "BroadcastNestedLoopJoin" in plan
    # exactly one shuffle: the window's hashpartitioning on anchor_id
    assert plan.count("Exchange hashpartitioning") == 1


def test_budget_sampler_single_domain_exchange(spark):
    """Allocation broadcasts; the corpus pays ONE hash exchange (the
    per-domain cumsum window), nothing else. A literal allocation table
    isolates the sampler's own plan from the allocation computation's."""
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.operators.mixing import (
        sample_to_token_budget,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").withColumn(
        "n_tokens", F.size(F.split(F.trim("text"), r"\s+"))
    )
    alloc = spark.createDataFrame(
        [(r[0], 500) for r in docs.select("source").distinct().collect()],
        "domain string, alloc_tokens long",
    )
    plan = _plan(
        sample_to_token_budget(
            docs, alloc, "source", "n_tokens", "doc_id",
            require_full_coverage=False,
        )
    )
    assert "BroadcastExchange" in plan  # the #domains-row allocation
    assert plan.count("Exchange hashpartitioning") == 1  # the cumsum window
    assert "Exchange SinglePartition" not in plan


def test_ensemble_never_plans_single_partition_window(spark):
    """percent ranks must come from the distributed global rank — a
    plain Window.orderBy would plan Exchange SinglePartition over the
    corpus."""
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.functions.ensemble import (
        ensemble_rank_scores,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", F.col("n_chars").cast("double").alias("s1")
    )
    plan = _plan(ensemble_rank_scores(docs, ["s1"], "doc_id", partitions=4))
    assert "Exchange SinglePartition" not in plan


def test_triangle_closing_is_intersection_not_wedge_join(spark):
    """The triangle stage must close via array_intersect over collected
    adjacency (nothing wider than the edge list shuffles) — a regression
    to the wedge self-join would re-materialize sum(outdeg^2) rows. The
    wedge build was a join keyed ONLY on the shared pivot; adjacency
    joins key on lo/hi, so a pivot-keyed equi-join disappearing from the
    plan plus the intersect expression appearing pins the shape."""
    from azure_etl_databricks_sql_powerbi_spark.graph.triangles import (
        triangle_counts,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    df = triangle_counts(edges)
    plan = _plan(df)
    assert "array_intersect" in plan
    # the wedge formulation's join keyed on a column named exactly `pivot`
    # — anchor on the word-bounded column name so an unrelated conf/rule
    # containing "pivot" can't trip the regression pin
    import re

    assert not re.search(r"\bpivot#\d+", plan)
    # exactly one triangle, every corner credited once
    rows = {r.node: r.n_triangles for r in df.collect()}
    assert rows == {1: 1, 2: 1, 3: 1}


def test_negative_mining_plans_broadcast_anchors_and_prune_topk(spark, entry):
    """Scale contract of the r11-declared mining queries
    (similarity/negatives): the ANCHOR side reaches the pairing as a
    broadcast (BroadcastNestedLoopJoin — the corpus streams through
    executors once, no corpus shuffle on the pair stage), and the
    per-anchor top-k is pruned map-side BEFORE the one window exchange
    (WindowGroupLimit Partial) — at 100 TB the shuffle carries at most
    k rows per (anchor, partition), never the scored pair stream. A
    regression to a shuffled (sort-merge) pairing or an unpruned window
    would flip both markers."""
    from azure_etl_databricks_sql_powerbi_spark.similarity.negatives import (
        hard_negatives,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    plans = {
        # hard_negatives' driver query retired r14 (§5 swap #14) — the
        # plan contract is pinned on the operator directly, the
        # small_quantity_part_revenue precedent
        "hard_negatives": _plan(
            hard_negatives(emb, emb.filter("vec_id < 8"), k=5)
        ),
        "triplet_candidates": _plan(
            entry.queries()["triplet_candidates"](spark, SF_SMOKE)
        ),
    }
    for name, plan in plans.items():
        assert "BroadcastNestedLoopJoin" in plan, name
        assert "WindowGroupLimit" in plan, name
        # the pairing itself must not shuffle: no sort-merge join anywhere
        # in hard_negatives (its only join IS the pairing); triplet's
        # final pos x neg combine is a small equi-join and MAY sort-merge,
        # but its pairing stage is pinned by the two markers above.
        if name == "hard_negatives":
            assert "SortMergeJoin" not in plan, name


def test_customer_order_windows_single_exchange_shared_sort(spark, entry):
    """The §4.3 merged window suite: the running DECIMAL sum (ROWS
    frame) and lag/lead (offset frame) share one PARTITION BY/ORDER BY,
    so the plan must carry exactly ONE hash exchange and ONE sort —
    stacked Window nodes, never a second shuffle (the merge's whole
    point: two retired driver rows now cost one Exchange)."""
    df = entry.queries()["customer_order_windows"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Exchange rangepartitioning") == 0, plan
    assert plan.count("+- Sort") == 1, plan
    assert plan.count("Window") >= 1


def test_normalize_docs_single_scan_no_shuffle(spark, entry):
    """Canonicalization is a pure per-row map: one parquet scan with
    column pruning (doc_id, text only), the regex chain JVM-side, ONE
    ArrowEvalPython for the NFC pandas_udf, and zero exchanges."""
    df = entry.queries()["normalize_text_docs"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "n_chars" not in plan.split("ReadSchema")[-1], plan


def test_registered_domain_psl_docs_big_side_never_shuffles(spark, entry):
    """The full-PSL longest-match path (r13 §5 swap #10) keeps the BIG
    side shuffle-free until the final count: 4 BroadcastHashJoins (one
    per candidate suffix length), and every hash Exchange in the plan
    is either the tiny suffix relation's distinct (__sfxK columns,
    bounded by |PSL| ≈ 10k) or the final domain aggregate — the
    documents side reaches its groupBy without ever repartitioning."""
    df = entry.queries()["registered_domain_psl_docs"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") == 4
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    hash_ex = re.findall(r"Exchange hashpartitioning\(([^,]+),", plan)
    non_suffix = [c for c in hash_ex if not c.startswith("__sfx")]
    assert len(non_suffix) == 1 and non_suffix[0].startswith("domain")
