"""Near-duplicate clustering: candidate edges -> connected components ->
keep-one-per-cluster (north-star dedup surface).

Pair generators (exact fingerprints, MinHash/SimHash verification,
``shingle_edges`` below) emit PAIRS; a curation pipeline needs CLUSTERS —
"these 7 docs are all the same article; keep one". Transitive closure over
pairs is connected components, computed here with the alternating
large-star / small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14): each round is a groupBy + join over
(node, node) long pairs, and the edge set converges to a star per
component in O(log n) rounds — against the reference engine's surface this
is an EXT operator (the reference has no graph step; its dedup is
single-key MERGE, run_load.py:82-90).

Scale design:

- Edges carry two 8-byte longs, nothing else, through every round.
- ``shingle_edges`` joins docs on ``xxhash64(shingle)`` — the shuffle never
  carries shingle text. A document-frequency cap drops hot shingles
  (boilerplate n-grams that would create quadratic buckets), the same
  bucket-cap discipline as minhash.py/lsh.py. Hash collisions can in
  principle merge two shingles (P ~ n^2/2^64); for candidate generation
  that only adds a verifiable edge, never drops one.
- Each round's edge set is eagerly localCheckpoint'ed: iterative plans
  otherwise grow exponentially (every round references the previous plan
  several times), so lineage must be CUT, not just cached — persist alone
  leaves analysis/stringification O(2^rounds). The convergence checksum
  is one tiny aggregate per materialized round. Near-dup components are
  shallow (dups of one article all link to each other), so 3-5 rounds is
  typical; >25 implies a pathological graph, and the loop raises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.text import word_ngrams
from azure_etl_databricks_sql_powerbi_spark.util import spread


def shingle_edges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_df: int = 2,
    max_df: int = 10,
    observation: Observation | None = None,
) -> DataFrame:
    """Candidate near-dup edges: doc pairs sharing >=1 word ``n``-gram whose
    document frequency is in ``[min_df, max_df]``.

    Rare-shingle blocking: a shingle shared by 2..max_df docs is strong
    evidence of copying; one shared by thousands is boilerplate and would
    emit a quadratic bucket, so it is dropped (same role as minhash's
    ``max_bucket``). Plan: explode -> distinct -> df-filter (one hash
    aggregate) -> self-equi-join on the 8-byte shingle hash.

    The boilerplate cap is never silent when the caller passes an
    ``observation``: after an action, ``observation.get`` reports
    ``dropped_shingles`` (distinct shingles above ``max_df``, each a
    skipped candidate bucket).

    Returns distinct ``(u, v)`` with ``u < v``.
    """
    sh = (
        spread(df)
        .select(F.col(id_col).alias("u"), F.explode(word_ngrams(text_col, n)).alias("sh"))
        .select("u", F.xxhash64("sh").alias("sh_h"))
        .distinct()
    )
    dfreq = sh.groupBy("sh_h").agg(F.count(F.lit(1)).alias("df"))
    if observation is not None:
        # observe BEFORE the band filter so over-cap shingles hit the metric
        dfreq = dfreq.observe(
            observation,
            F.sum(F.when(F.col("df") > max_df, 1).otherwise(0)).alias(
                "dropped_shingles"
            ),
        )
    in_band = dfreq.where(F.col("df").between(min_df, max_df)).select("sh_h")
    bounded = sh.join(in_band, "sh_h")
    right = bounded.select(F.col("sh_h"), F.col("u").alias("v"))
    return (
        bounded.join(right, "sh_h")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


def _large_star(e: DataFrame, dedup: bool = True) -> DataFrame:
    """One large-star round: every node links its LARGER neighbors to the
    minimum of its neighborhood (incl. itself).

    ``dedup=False`` skips the output distinct when the caller feeds the
    result straight into ``_small_star`` (the fixpoint loop): small-star's
    min aggregate is multiplicity-insensitive and its own final distinct
    restores set semantics, so the intermediate exchange+aggregate buys
    nothing — one fewer shuffle per round (r16, guide §2.4). Row count
    stays bounded by 2|E| either way."""
    b = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        b.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    out = (
        b.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    return out.distinct() if dedup else out


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: every node links its smaller-or-equal
    neighbors (and itself) to the minimum among them."""
    d = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    m = d.groupBy("u").agg(F.min("v").alias("m"))
    pairs = (
        d.join(m, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_link = m.select("u", F.col("m").alias("v"))
    return (
        pairs.union(self_link).where(F.col("u") != F.col("v")).distinct()
    )


def _checksum_metrics() -> list:
    """The orientation- and order-insensitive edge-set fingerprint as
    ``observe`` metrics: (count, sum of undirected row hashes). The sum
    runs in decimal so it cannot overflow long; hashing (least, greatest)
    makes (a,b) == (b,a), since rounds alternate edge orientation. As an
    observation the fingerprint rides the SAME action that materializes
    the round's checkpoint — before r16 every round paid a second
    (re-scan) job just for the convergence check."""
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64(F.least("u", "v"), F.greatest("u", "v")).cast("decimal(38,0)")
        ).alias("h"),
    ]


def _observed_checkpoint(e: DataFrame) -> tuple[DataFrame, tuple]:
    """Eagerly localCheckpoint ``e`` with the convergence checksum
    observed on the materializing action; returns (checkpointed frame,
    (n, h))."""
    obs = Observation()
    ck = e.observe(obs, *_checksum_metrics()).localCheckpoint(eager=True)
    got = obs.get
    return ck, (got["n"], got["h"])


def connected_components(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_iter: int = 25,
) -> DataFrame:
    """Component label per node: ``(node, component)`` where component is
    the minimum node id in the connected component. Nodes appear iff they
    appear in ``edges``; callers left-join and coalesce to self-label
    isolated rows (see ``assign_clusters``).

    Alternates large-star/small-star until the edge set is a fixed point
    (checksum-stable), which at fixpoint is exactly one star per component:
    every non-minimum node holds one edge to the component minimum.
    """
    # Every round is localCheckpoint'ed (eager): the logical plan would
    # otherwise grow exponentially (each round references the previous
    # plan several times via union/join), which blows up analysis and the
    # plan stringifier long before the data does. localCheckpoint persists
    # the round's partitions on executors and truncates lineage; on a
    # cluster where executor loss matters, swap for reliable checkpoint().
    e0, cs = _observed_checkpoint(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    e = e0
    for _ in range(max_iter):
        # dedup=False: small-star's min aggregate and final distinct make
        # the intermediate large-star distinct redundant (see _large_star)
        e_new, cs_new = _observed_checkpoint(
            _small_star(_large_star(e, dedup=False))
        )
        if cs_new == cs:
            break
        e, cs = e_new, cs_new
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    nodes = e0.select(F.col("u").alias("node")).union(
        e0.select(F.col("v").alias("node"))
    ).distinct()
    # fixpoint edges are (node, component_min) stars; the minimum itself
    # carries no outgoing edge -> coalesce to self
    labels = e.select(F.greatest("u", "v").alias("node"), F.least("u", "v").alias("c"))
    labels = labels.groupBy("node").agg(F.min("c").alias("c"))
    return (
        nodes.join(labels, "node", "left")
        .select("node", F.coalesce("c", "node").alias("component"))
    )


def assign_clusters(
    df: DataFrame, edges: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Attach the dedup verdict to every row of ``df``: ``cluster_id`` (the
    component minimum, self for docs with no near-dup) and ``keep`` (true
    for exactly one doc per cluster — the canonical minimum). Filtering on
    ``keep`` IS the dedup; keeping ``cluster_id`` preserves provenance."""
    comp = connected_components(edges).withColumnRenamed("node", id_col)
    return (
        df.join(comp, id_col, "left")
        .withColumn("cluster_id", F.coalesce("component", F.col(id_col)))
        .withColumn("keep", F.col("cluster_id") == F.col(id_col))
        .drop("component")
    )
