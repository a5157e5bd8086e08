"""Scalable approximate similarity search: random-hyperplane LSH buckets.

The scale path for similarity over 100 TB of embeddings: sign-random-
projection (SRP / "SimHash for vectors", Charikar '02) assigns every
vector a small bucket code; candidates are pairs sharing a code in at
least one of ``n_tables`` independent tables. Join cost is linear in data
× tables instead of quadratic, and the bucket join is an equi-join
Catalyst executes as a hash join.

Hyperplanes are generated from a seeded RNG on the driver (a few KB) and
embedded in the plan as literals — executors never see Python. The bucket
probe + exact re-rank gives the classic recall/cost trade: more tables or
fewer bits => higher recall, bigger buckets.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Observation, Window
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.vectors import as_double, cosine
from azure_etl_databricks_sql_powerbi_spark.util import spread


def _hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int) -> list[list[list[float]]]:
    """[table][bit][dim] gaussian hyperplanes, deterministic in seed."""
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]
        for _ in range(n_tables)
    ]


def srp_code(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket code (one long) for one table —
    pure-expression variant (kept for environments without Arrow; the
    batch path below is the hot one)."""
    v = as_double(vec)
    bits = []
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        proj = F.aggregate(
            F.zip_with(v, lit_plane, lambda x, p: x * p), F.lit(0.0), lambda a, x: a + x
        )
        bits.append(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def add_bucket_codes(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Append ``bucket_0..bucket_{t-1}`` long columns (one per table).

    All tables' projections happen in ONE Arrow-batched ``pandas_udf``:
    a single (batch × dim) @ (dim × n_bits·n_tables) numpy matmul, then
    sign-bit packing — instead of n_bits·n_tables interpreted higher-order
    folds per row. The plane matrix is a closure constant shipped once per
    executor.
    """
    from pyspark.sql.functions import pandas_udf

    planes = _hyperplanes(dim, n_bits, n_tables, seed)
    mat = np.array(planes, dtype=np.float64).reshape(n_tables * n_bits, dim).T
    weights = np.tile(1 << np.arange(n_bits, dtype=np.int64), n_tables)

    @pandas_udf("array<long>")
    def codes(v: pd.Series) -> pd.Series:
        x = np.array([np.asarray(e, dtype=np.float64) for e in v])
        bits = (x @ mat) > 0  # (batch, n_tables*n_bits)
        packed = (bits * weights).reshape(len(x), n_tables, n_bits).sum(axis=2)
        return pd.Series([row.tolist() for row in packed])

    out = spread(df).withColumn("__codes", codes(F.col(vec_col)))
    for t in range(n_tables):
        out = out.withColumn(f"bucket_{t}", F.element_at("__codes", t + 1))
    return out.drop("__codes")


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe matching buckets in any table, exact
    cosine re-rank inside the candidate set.

    Output schema matches ``bruteforce.cosine_topk`` so recall can be
    measured by a plain join of the two results.
    """
    c = add_bucket_codes(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "c_vec",
        dim,
        n_bits,
        n_tables,
        seed,
    )
    q = add_bucket_codes(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec",
        dim,
        n_bits,
        n_tables,
        seed,
    )
    # long format: (id, table, code) for corpus and queries; candidates are
    # equi-join matches on (table, code) in ANY table -> distinct pair
    def melt(df: DataFrame, id_name: str, vec_name: str) -> DataFrame:
        return df.select(
            id_name,
            vec_name,
            F.explode(
                F.array(*[
                    F.struct(F.lit(t).alias("tbl"), F.col(f"bucket_{t}").alias("code"))
                    for t in range(n_tables)
                ])
            ).alias("b"),
        ).select(id_name, vec_name, "b.tbl", "b.code")

    cm = melt(c, "neighbor_id", "c_vec")
    qm = melt(q, "query_id", "q_vec")
    cands = (
        cm.join(F.broadcast(qm), on=["tbl", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id", "neighbor_id", cosine("q_vec", "c_vec").alias("__cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("__cos", 4).alias("cosine_sim"))
    )


def expected_collision_prob(cos_sim: float, n_bits: int, n_tables: int) -> float:
    """Analytic SRP recall estimate: P(collide in >=1 table) for a pair at
    the given cosine — used by tests to sanity-check recall."""
    theta = math.acos(max(-1.0, min(1.0, cos_sim)))
    p_bit = 1 - theta / math.pi
    p_table = p_bit**n_bits
    return 1 - (1 - p_table) ** n_tables


def auto_srp_params(
    n_rows: int,
    sim: float = 0.95,
    target_recall: float = 0.99,
    target_bucket: int = 16,
    lo_bits: int = 4,
    hi_bits: int = 24,
    max_tables: int = 64,
) -> tuple[int, int]:
    """(n_bits, n_tables) that keep SRP bucketing linear as the corpus
    grows — the ``dedup/semantic.auto_nlist`` discipline applied to LSH.

    Fixed-width codes are the same scale failure fixed nlist was for
    SemDeDup: at 8 bits there are only 256 buckets per table, so bucket
    population grows with N and in-bucket candidate pairs grow with N² —
    the banded join's cost curve, measured as the worst sf0.1→sf1 ratio
    on the board before this existed. Sizing ``n_bits`` at
    log2(N / target_bucket) keeps expected bucket population (hence
    per-bucket quadratic work) CONSTANT, so total candidates scale ~N ×
    target_bucket × tables.

    Wider codes lower per-table collision probability, so ``n_tables``
    is then the smallest count whose analytic >=1-of-T recall
    (``expected_collision_prob``) reaches ``target_recall`` for a true
    pair at cosine ``sim`` — size it at the cosine true duplicates
    actually have (e.g. 0.99 for near-dup copies), not at the detection
    threshold:
    boundary pairs get softer recall, real duplicates keep the guarantee.
    If that table count exceeds ``max_tables`` (very wide codes + a low
    ``sim``), bits step down until feasible — bucket population, not
    recall, is what then degrades, and the ``max_bucket`` guard still
    bounds the worst case. If even ``lo_bits`` cannot reach the target
    within ``max_tables``, the combination is infeasible and this raises
    ValueError (the "no silent caps" contract — returning a
    quietly-lower-recall config would let callers believe a guarantee
    they don't have); lower ``target_recall``, raise ``max_tables``, or
    accept a brute-force pass instead."""
    if not 0.0 < target_recall < 1.0:
        raise ValueError(
            f"target_recall must be in (0, 1), got {target_recall}; SRP "
            "collision recall is probabilistic — 1.0 needs the brute path"
        )
    theta = math.acos(max(-1.0, min(1.0, sim)))
    p_bit = 1 - theta / math.pi
    bits = min(
        hi_bits,
        max(lo_bits, math.ceil(math.log2(max(1.0, n_rows / target_bucket)))),
    )
    while bits >= lo_bits:
        p_table = p_bit**bits
        if p_table >= 1.0:
            return bits, 1
        need = math.ceil(math.log(1 - target_recall) / math.log(1 - p_table))
        if need <= max_tables:
            return bits, max(1, need)
        bits -= 1
    raise ValueError(
        f"no SRP config reaches recall {target_recall} at cosine {sim} "
        f"within max_tables={max_tables} even at lo_bits={lo_bits} "
        f"(needs {need} tables); lower target_recall, raise max_tables, "
        "or use the exact brute-force pair path"
    )


def lsh_near_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    max_bucket: int = 5000,
    observation: Observation | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold — the scale
    path replacing ``bruteforce.cosine_near_pairs``'s quadratic self-join.

    Bucket on SRP codes, then a banded SELF-equi-join on (table, code)
    expands candidate pairs fully inside whole-stage codegen (at loose
    thresholds buckets collide heavily and an in-bucket ``collect_list`` +
    higher-order expansion runs interpreted per pair — measured ~2x slower
    at sf0.1; same finding as simhash.near_dup_pairs). The coded table
    (id, vector, codes) is persisted: it is read by both join sides and
    both verify sides, and recomputing it would re-run the pandas_udf
    projection per consumer. Oversized buckets (``max_bucket``) are
    dropped by a count semi-filter before the join — the standard guard
    bounding the quadratic in-bucket blowup at scale.

    Size ``n_bits``/``n_tables`` with ``auto_srp_params`` when the corpus
    size is known: fixed-width codes let bucket population — and the
    banded join's in-bucket quadratic — grow with N.
    """
    from pyspark.storagelevel import StorageLevel

    from azure_etl_databricks_sql_powerbi_spark.functions.vectors import cosine_batch

    coded = add_bucket_codes(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        "v",
        dim,
        n_bits,
        n_tables,
        seed,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    melted = coded.select(
        "id",
        F.posexplode(
            F.array(*[F.col(f"bucket_{t}") for t in range(n_tables)])
        ).alias("tbl", "code"),
    )
    sized = melted.groupBy("tbl", "code").agg(F.count(F.lit(1)).alias("n"))
    if observation is not None:
        # "No silent caps": report oversized buckets before dropping them
        sized = sized.observe(
            observation,
            F.sum(F.when(F.col("n") > max_bucket, 1).otherwise(0)).alias(
                "dropped_buckets"
            ),
            F.sum(
                F.when(F.col("n") > max_bucket, F.col("n")).otherwise(0)
            ).alias("dropped_bucket_rows"),
        )
    ok = sized.filter((F.col("n") >= 2) & (F.col("n") <= max_bucket)).select(
        "tbl", "code"
    )
    keep = melted.join(ok, ["tbl", "code"])
    cands = (
        keep.alias("a")
        .join(
            keep.alias("b"),
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.code") == F.col("b.code"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    a = coded.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = coded.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cands.join(a, on="id_a")
        .join(b, on="id_b")
        .withColumn("cosine_sim", F.round(cosine_batch("va", "vb"), 4))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
