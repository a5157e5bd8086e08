"""Training-order materialization (operators/shuffle.py): permutation
properties, the dual-dialect manifest twin, the sharded writer roundtrip,
and the plan/codegen pins. The manifest twin at documents-table scale IS
the future declared query's oracle (ROTATION_POLICY §4 declare-ready)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, SF_SMOKE

from azure_etl_databricks_sql_powerbi_spark.operators.shuffle import (
    duckdb_shard_manifest_sql,
    epoch_shuffle,
    shard_manifest,
    write_training_shards,
)

SEED, N_SHARDS = 42, 16


def _docs(spark, sf=SF_SMOKE):
    return spark.read.parquet(f"{sf}/documents.parquet")


def _canon(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def test_epoch_shuffle_is_a_permutation(spark):
    docs = _docs(spark)
    sh = epoch_shuffle(docs, seed=SEED, n_shards=N_SHARDS).select(
        "doc_id", "shard_id", "pos"
    )
    rows = sh.collect()
    assert len(rows) == docs.count()
    assert len({r.doc_id for r in rows}) == len(rows)  # every doc exactly once
    # pos is dense 0..n-1 within every shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r.pos)
    assert set(by_shard) <= set(range(N_SHARDS))
    for ps in by_shard.values():
        assert sorted(ps) == list(range(len(ps)))
    # uniformity (loose): no shard empty or >3x the mean shard size
    sizes = [len(p) for p in by_shard.values()]
    assert len(by_shard) == N_SHARDS and max(sizes) <= 3 * (len(rows) // N_SHARDS)


def test_epoch_shuffle_stable_under_repartition_and_moves_with_seed(spark):
    docs = _docs(spark)
    base = epoch_shuffle(docs, seed=SEED, n_shards=N_SHARDS)
    again = epoch_shuffle(docs.repartition(7), seed=SEED, n_shards=N_SHARDS)
    key = lambda df: sorted(
        (r.doc_id, r.shard_id, r.pos)
        for r in df.select("doc_id", "shard_id", "pos").collect()
    )
    assert key(base) == key(again)  # content-addressed: partitioning-invariant
    other = epoch_shuffle(docs, seed=SEED + 1, n_shards=N_SHARDS)
    moved = sum(
        1
        for a, b in zip(key(base), key(other))
        if (a[1], a[2]) != (b[1], b[2])
    )
    assert moved > 400  # a different seed reshuffles essentially everything


def test_epoch_shuffle_rejects_column_clash(spark):
    docs = _docs(spark).withColumn("pos", F.lit(0))
    with pytest.raises(ValueError, match="pos"):
        epoch_shuffle(docs, seed=SEED, n_shards=N_SHARDS)


def test_fingerprint_xor_is_seed_invariant(spark):
    """The fingerprint is the UNSEEDED content digest by design: shard
    membership moves with the seed, but the xor of ALL shards'
    fingerprints depends only on corpus membership — the cross-epoch
    'same corpus?' receipt (module docstring contract)."""
    from functools import reduce

    docs = _docs(spark)

    def total_fp(seed):
        rows = shard_manifest(
            epoch_shuffle(docs, seed=seed, n_shards=N_SHARDS)
        ).collect()
        per_shard = [r.fingerprint for r in rows]
        return reduce(lambda a, b: a ^ b, per_shard), per_shard

    t1, fp1 = total_fp(SEED)
    t2, fp2 = total_fp(SEED + 1)
    assert t1 == t2  # corpus invariant
    assert fp1 != fp2  # but per-shard membership DID move with the seed


@pytest.mark.parametrize("sf", [SF_SMOKE, SF_CORRECT])
def test_shard_manifest_matches_duckdb_twin(spark, sf):
    """STAGED declare-ready (ROTATION_POLICY §4): the manifest query at
    documents-table scale, cell-for-cell against the module-owned DuckDB
    replay (all columns integral — no float tolerance involved)."""
    from oracle_harness import duckdb_conn

    got = shard_manifest(
        epoch_shuffle(_docs(spark, sf), seed=SEED, n_shards=N_SHARDS),
        text_col="text",
    ).toPandas()
    want = (
        duckdb_conn(sf)
        .execute(
            duckdb_shard_manifest_sql("documents", "doc_id", SEED, N_SHARDS, "text")
        )
        .df()
    )
    assert _canon(got).equals(_canon(want))


def test_write_training_shards_roundtrip(spark):
    docs = _docs(spark)
    pre = shard_manifest(
        epoch_shuffle(docs, seed=SEED, n_shards=N_SHARDS), text_col="text"
    ).toPandas()
    with tempfile.TemporaryDirectory(prefix="shards_") as tmp:
        path = f"{tmp}/epoch0"
        written = write_training_shards(
            docs, path, seed=SEED, n_shards=N_SHARDS, text_col="text"
        ).toPandas()
        # the written receipt equals the planned manifest
        assert _canon(written).equals(_canon(pre))
        # one parquet file per shard, rows stored in shard order
        import glob
        import os

        import pyarrow.parquet as pq

        dirs = sorted(glob.glob(f"{path}/shard_id=*"))
        assert len(dirs) == N_SHARDS
        for d in dirs[:3]:  # spot-check 3 shards' in-file order
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert len(files) == 1
            tbl = pq.read_table(f"{d}/{files[0]}", columns=["pos"])
            ps = tbl.column("pos").to_pylist()
            assert ps == sorted(ps) and ps[0] == 0


def test_shuffle_manifest_plan_one_exchange_no_python(spark):
    """The scale pin: the window already hash-partitions by shard_id, so
    the manifest's aggregation must REUSE that partitioning — exactly one
    Exchange in the whole shuffle+manifest plan, and no Python nodes."""
    m = shard_manifest(
        epoch_shuffle(_docs(spark), seed=SEED, n_shards=N_SHARDS), text_col="text"
    )
    plan = m._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
    # (the final orderBy over n_shards manifest rows may add one range
    # Exchange — that's a 16-row sort, not a data shuffle; not pinned)
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert bad not in plan


def test_shuffle_manifest_whole_stage_compiles(spark):
    """The r14 lesson applied BEFORE declaring: every stage of the staged
    query must whole-stage-compile loudly (fallback=false + CODEGEN_ONLY
    turn a Janino failure into an error instead of silent interpretation)."""
    fallback = spark.conf.get("spark.sql.codegen.fallback")
    factory = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try:
        n = shard_manifest(
            epoch_shuffle(_docs(spark), seed=SEED, n_shards=N_SHARDS),
            text_col="text",
        ).count()
        assert n == N_SHARDS
    finally:
        spark.conf.set("spark.sql.codegen.fallback", fallback)
        spark.conf.set("spark.sql.codegen.factoryMode", factory)


def test_resume_from_cursor(spark):
    """Resume = the exact unconsumed remainder: per-shard suffixes from
    next_pos, shards absent from the cursor restart whole, and the
    consumed∪remainder partition is exact (no row lost or duplicated)."""
    from azure_etl_databricks_sql_powerbi_spark.operators.shuffle import (
        resume_from_cursor,
    )

    docs = _docs(spark)
    sh = epoch_shuffle(docs, seed=SEED, n_shards=4)
    cursor = spark.createDataFrame(
        [(0, 5), (1, 0), (2, 10**6)], "shard_id int, next_pos long"
    )  # shard 3 absent -> restarts from 0; shard 2 fully consumed
    rest = resume_from_cursor(sh, cursor).collect()
    full = sh.collect()
    want = {
        (r.doc_id, r.shard_id, r.pos)
        for r in full
        if r.pos >= {0: 5, 1: 0, 2: 10**6}.get(r.shard_id, 0)
    }
    assert {(r.doc_id, r.shard_id, r.pos) for r in rest} == want
    assert not any(r.shard_id == 2 for r in rest)
    # plan: broadcast join only — no Exchange beyond the window's own
    plan = resume_from_cursor(sh, cursor)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # two hash Exchanges: the shuffle's own (data side) + the KB-sized
    # cursor's max-reduction before its broadcast — never the data again
    assert plan.count("Exchange hashpartitioning") == 2


def test_resume_cursor_append_log_reduces_to_furthest(spark):
    """An append-style checkpoint log (several rows per shard) must
    reduce to max(next_pos) — a stale duplicate can never re-emit
    consumed rows, and never duplicates remainder rows."""
    from azure_etl_databricks_sql_powerbi_spark.operators.shuffle import (
        resume_from_cursor,
    )

    sh = epoch_shuffle(_docs(spark), seed=SEED, n_shards=4)
    log = spark.createDataFrame(
        [(0, 2), (0, 7), (1, 3), (1, 1)], "shard_id int, next_pos long"
    )
    rest = resume_from_cursor(sh, log).collect()
    want = {
        (r.doc_id, r.shard_id, r.pos)
        for r in sh.collect()
        if r.pos >= {0: 7, 1: 3}.get(r.shard_id, 0)
    }
    got = [(r.doc_id, r.shard_id, r.pos) for r in rest]
    assert len(got) == len(set(got))  # no duplicated rows
    assert set(got) == want
    with pytest.raises(ValueError, match="__cur_pos"):
        resume_from_cursor(sh.withColumn("__cur_pos", F.lit(0)), log)


def test_dataloader_chain_end_to_end(spark):
    """The full materialization seam, composed exactly as the module
    docstrings advise: deterministic_split → epoch_shuffle →
    pack_sequences WITHIN each shard (group_by=shard, order_by=pos —
    the pack docstring's at-scale shape) → offsets/bins replayed by a
    pure-Python prefix sum, and per-shard token totals cross-checked
    against shard_manifest's independent aggregation path. Pins the
    interfaces between the operators so a column rename in one can't
    silently break the chain."""
    from azure_etl_databricks_sql_powerbi_spark.functions.text import token_count
    from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (
        deterministic_split,
        pack_sequences,
    )

    docs = _docs(spark).select("doc_id", "text")
    train = deterministic_split(docs, on="text", weights={"train": 0.9, "val": 0.1})
    train = train.filter(F.col("split") == "train").drop("split")
    sh = epoch_shuffle(train, seed=7, n_shards=4).withColumn(
        "n_tokens", token_count("text").cast("long")
    )
    packed = pack_sequences(
        sh, "n_tokens", ctx_len=256, order_by=["pos"], group_by=["shard_id"]
    ).select("doc_id", "shard_id", "pos", "n_tokens", "start_offset", "bin_id")
    rows = packed.collect()
    assert len(rows) == train.count()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r)
    # token conservation vs an INDEPENDENT aggregation path: the packed
    # stream length per shard must equal shard_manifest's n_tokens
    # (Spark hash aggregate over the pre-pack frame, not these rows)
    manifest_tokens = {
        r.shard_id: r.n_tokens
        for r in shard_manifest(sh.drop("n_tokens"), text_col="text").collect()
    }
    for shard, shard_rows in by_shard.items():
        shard_rows.sort(key=lambda r: r.pos)
        # pure-Python replay: offsets are the exclusive prefix sums of
        # n_tokens in pos order, bins are offset // ctx_len
        acc = 0
        for r in shard_rows:
            assert r.start_offset == acc
            assert r.bin_id == acc // 256
            acc += r.n_tokens
        assert acc == manifest_tokens[shard]


def test_writer_edge_cases_empty_shards_and_single_doc(spark):
    """n_shards >> corpus: empty shards produce neither a directory nor
    a manifest row, and the written receipt still equals the planned
    manifest (both enumerate only occupied shards). A single-doc corpus
    degenerates cleanly to one shard, one file, pos 0."""
    import glob

    # deterministic subset (limit() without order may pick different
    # rows across the writer's and the plan's independent jobs)
    docs = _docs(spark).filter(F.col("doc_id") < 40)
    with tempfile.TemporaryDirectory(prefix="shards_edge_") as tmp:
        wide = write_training_shards(
            docs, f"{tmp}/wide", seed=SEED, n_shards=256
        ).toPandas()
        plan = shard_manifest(
            epoch_shuffle(docs, seed=SEED, n_shards=256)
        ).toPandas()
        assert _canon(wide).equals(_canon(plan))
        dirs = glob.glob(f"{tmp}/wide/shard_id=*")
        assert len(dirs) == len(wide) <= 40  # occupied shards only
        assert int(wide["n_docs"].sum()) == 40

        one = docs.filter(F.col("doc_id") == 0)
        written = write_training_shards(
            one, f"{tmp}/one", seed=SEED, n_shards=8
        ).toPandas()
        assert len(written) == 1
        assert written["n_docs"].iloc[0] == 1
        assert written["first_doc"].iloc[0] == written["last_doc"].iloc[0]
