"""Crawl-frontier politeness scheduling — the stage between the crawl
index's fetch plan (WHICH bytes: ``sources/cdx.cdx_fetch_plan``) and the
ranged fetch (``sources/warc.read_warc_ranges``): WHEN each capture may
be fetched. A crawler that hammers one host gets blocked (and is rude);
the politeness contract is *serialize within a host, parallelize across
hosts*, with the per-host spacing coming from robots.txt
``Crawl-delay`` where the publisher declares one.

North-star extension: the reference engine at /root/reference has no
crawl surface (its closest analog is the REST source's fixed inter-page
rate limiting, `rest_api.py:58-93` — a single-stream politeness knob);
this module is the archive-scale generalization: per-HOST spacing over
millions of hosts at once.

Two stages, both pure Catalyst:

1. **``crawl_delays``** — parsed robots rules (``functions/robots.
   parse_robots`` output) → one ``(domain, delay_s)`` row per domain.
   Group selection per REP exactly as ``filter_robots_allowed``: the
   exact agent's group if the domain declares one (marker rows make
   zero-rule groups visible), else the ``*`` group — and an exact
   group WITHOUT a Crawl-delay means "no declared delay" (the
   default), never the ``*`` group's value. Within the winning group
   the LARGEST valid value wins (REP leaves multiples undefined;
   largest is the conservative, deterministic choice). Invalid values
   (non-numeric, negative) are ignored per-line — a typo must not
   un-declare the group. One hash aggregate, no window, no shuffle of
   anything bigger than the rule table.
2. **``fetch_schedule``** — captures (the ``sources/cdx``
   ``select_captures`` shape, or any frame with a URL) × delays →
   per-capture ``(host, lane, slot, delay_s, scheduled_offset_s)``:
   ``slot`` is the capture's position in its host's deterministic
   fetch order (caller-supplied total order — default the CDX winner
   order ``ts, urlkey, filename, offset``), ``scheduled_offset_s =
   (slot - 1) * delay_s`` is the earliest start relative to the
   host's first fetch, and ``lane`` routes the host to one of
   ``n_lanes`` fetch workers via the portable md5-prefix bucket
   (``operators/sampling.hash_bucket`` — the SAME arithmetic the
   DuckDB oracle replays, so lane assignment is engine-independent
   and stable across re-runs/partitionings).

100 TB shape: the delay table is per-domain KB-to-MB scale —
broadcast, guarded by ``util.require_broadcastable`` with the proven
shuffle equi-join fallback (the ``filter_robots_allowed`` r14
discipline); the ONE shuffle is the per-host window over index
METADATA rows (urlkey/ts/offset — never payload bytes), the same class
as ``cdx_fetch_plan``'s groupBy. Hosts are the natural unit of
politeness and the natural skew risk: a mega-host's captures land in
one window partition, but its schedule is inherently sequential — the
skew is the semantics, not an accident, and lanes keep the *worker*
assignment balanced across hosts.

Oracle/twin: ``duckdb_crawl_delays_sql`` replays the group selection +
aggregate from the module's own constants; the full schedule twin
(parse → delays → join → window → lane) is composed in
``tests/test_frontier.py`` from this builder plus the robots/urls
module-owned builders and proven cell-for-cell, including the float
offsets (integer × small-decimal doubles — exact IEEE in both
engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the default per-host spacing when no (valid) Crawl-delay is declared,
# in seconds — the common crawler default of 1 fetch/second/host.
DEFAULT_DELAY_S = 1.0

# value parse shared by engine and oracle: robots values arrive trimmed
# from parse_robots; TRY_CAST keeps typos NULL in both dialects, and
# the >= 0 guard drops negatives (NULL >= 0 is NULL → also dropped).
# NaN and Infinity need their own guards: BOTH engines order NaN
# greater than every number, so 'Crawl-delay: nan' would pass >= 0 AND
# win the max; '1e999' casts to +Infinity in both, which would make
# slot 1's offset 0.0 * inf = NaN and every later slot inf — the same
# offset poisoning. The <= DBL_MAX bound rejects inf in both dialects
# (NaN fails it too; isnan kept for explicitness). One deliberate
# parse divergence is pinned in tests/test_frontier.py: the literal
# 'inf' casts to +Infinity in DuckDB but NULL in Spark (Java's parser
# wants 'Infinity') — the finiteness gate classifies BOTH as invalid,
# so the divergence is unobservable in any output.
_DELAY_VALUE_SQL = "try_cast({pattern} AS double)"
_DELAY_VALID_SQL = (
    "{val} >= 0 AND {val} <= 1.7976931348623157e308 AND NOT isnan({val})"
)

_SCHEDULE_OUT_COLS = ("host", "delay_s", "slot", "scheduled_offset_s", "lane")


def crawl_delays(
    rules: DataFrame,
    agent: str = "*",
    default_delay_s: float = DEFAULT_DELAY_S,
    max_delay_s: float | None = None,
) -> DataFrame:
    """Parsed robots rules → effective ``(domain, delay_s)`` for
    ``agent``, one row per domain that declares a group for ``agent``
    or ``*``. Domains with no robots.txt at all, AND domains whose
    robots.txt only addresses other agents (no matching group → no
    restrictions per REP), are ABSENT from the output — a standalone
    consumer must left-join and default, exactly as
    :func:`fetch_schedule` does; an inner join on this table silently
    drops such domains.

    ``max_delay_s`` caps the effective value: hostile or confused
    robots files declare ``Crawl-delay: 86400``, and an uncapped
    scheduler would happily plan one fetch per day — at archive scale
    the cap is what keeps a single publisher from stretching the whole
    plan. ``None`` (default) = no cap; the cap applies to the
    *effective* value, default included.
    """
    agent = agent.lower()
    val_sql = _DELAY_VALUE_SQL.format(pattern="pattern")
    val = F.expr(val_sql)
    valid = (F.col("directive") == "crawl-delay") & F.expr(
        _DELAY_VALID_SQL.format(val=val_sql)
    )
    exact = F.col("agent") == agent
    g = (
        rules.filter(F.col("agent").isin(agent, "*"))
        .groupBy("domain")
        .agg(
            # marker rows (directive 'user-agent') count: a domain that
            # declares the exact agent with an EMPTY group selects the
            # exact group (→ default delay), not '*' — the
            # filter_robots_allowed group-selection rule
            F.max(exact.cast("int")).alias("__has_exact"),
            F.max(F.when(exact & valid, val)).alias("__d_exact"),
            F.max(F.when(~exact & valid, val)).alias("__d_star"),
        )
    )
    eff = F.coalesce(
        F.when(F.col("__has_exact") == 1, F.col("__d_exact")).otherwise(
            F.col("__d_star")
        ),
        F.lit(float(default_delay_s)),
    )
    if max_delay_s is not None:
        eff = F.least(eff, F.lit(float(max_delay_s)))
    return g.select("domain", eff.alias("delay_s"))


def fetch_schedule(
    captures: DataFrame,
    rules: DataFrame | None = None,
    *,
    url_col: str = "url",
    order_cols: tuple[str, ...] = ("ts", "urlkey", "filename", "offset"),
    agent: str = "*",
    default_delay_s: float = DEFAULT_DELAY_S,
    max_delay_s: float | None = None,
    n_lanes: int = 64,
    broadcast_delays: bool = True,
    max_broadcast_domains: int = 2_000_000,
) -> DataFrame:
    """Captures → captures + ``host``, ``delay_s``, ``slot``,
    ``scheduled_offset_s``, ``lane``.

    - ``host`` is the registered domain of ``url_col`` — the SAME key
      ``functions/robots`` files rules under, so the delay join can
      never miss on a www./port variant. URLs without a parseable
      host (NULL) schedule as one shared NULL-host group on the
      default delay: they are kept (a scheduler must not silently
      drop work) and trivially identifiable downstream.
    - ``slot`` = 1-based position in the host's fetch order.
      ``order_cols`` MUST be a per-host total order for the schedule
      to be deterministic (the default is the ``sources/cdx`` winner
      order; ``(filename, offset)`` alone is already total for CDX
      shapes). NULLs order last.
    - ``scheduled_offset_s`` = ``(slot - 1) * delay_s`` — earliest
      start relative to the host's first fetch. Relative, not
      absolute: wall-clock anchoring is the fetch loop's job (and
      would break determinism).
    - ``lane`` = md5-prefix bucket of host in ``[0, n_lanes)`` — the
      worker assignment. Same-host rows always share a lane, so
      per-host serialization survives the fan-out.

    Plan: delay build is one aggregate over the (tiny) rule table;
    the delay join broadcasts under ``require_broadcastable`` (pass
    ``broadcast_delays=False`` past ~``max_broadcast_domains`` rule
    domains for the shuffle equi-join — same results, unit-pinned);
    the ONE data shuffle is the per-host window over index metadata.

    NOTE the broadcast guard is EAGER (the ``filter_robots_allowed``
    caveat verbatim): it runs a ``limit(cap+1).count()`` Spark job when
    this function is CALLED, and the delay table's lineage — the
    ``crawl_delays`` aggregate over the whole ``parse_robots``
    pipeline — is then evaluated AGAIN by the real query. Acceptable
    when rules come from a small parse; if deriving them is expensive,
    ``rules.persist()`` before calling (probe and query then share one
    evaluation) or pass ``broadcast_delays=False``, which skips the
    probe entirely.
    """
    reserved = [*_SCHEDULE_OUT_COLS, "__cd_dom", "__cd_delay"]
    clash = [c for c in reserved if c in captures.columns]
    if clash:
        raise ValueError(
            f"fetch_schedule produces/uses columns {clash}; rename the "
            "existing column(s) first"
        )
    missing = [c for c in order_cols if c not in captures.columns]
    if missing:
        raise ValueError(
            f"order_cols {missing} not in captures; pass order_cols= "
            "naming a per-host total order"
        )
    from azure_etl_databricks_sql_powerbi_spark.functions.urls import (
        registered_domain,
    )
    from azure_etl_databricks_sql_powerbi_spark.operators.sampling import (
        hash_bucket,
    )
    from azure_etl_databricks_sql_powerbi_spark.util import (
        require_broadcastable,
    )

    # the delay for hosts with no (selected) robots rules — capped like
    # every effective value, on BOTH the with-rules and no-rules paths
    eff_default = (
        float(default_delay_s)
        if max_delay_s is None
        else min(float(default_delay_s), float(max_delay_s))
    )
    u = captures.withColumn("host", registered_domain(F.col(url_col)))
    if rules is not None:
        delays = crawl_delays(
            rules,
            agent=agent,
            default_delay_s=default_delay_s,
            max_delay_s=max_delay_s,
        ).select(
            F.col("domain").alias("__cd_dom"),
            F.col("delay_s").alias("__cd_delay"),
        )
        if broadcast_delays:
            require_broadcastable(
                delays,
                max_broadcast_domains,
                "max_broadcast_domains",
                "the per-domain crawl-delay table",
                "pass broadcast_delays=False for the shuffle "
                "equi-join-on-host path",
            )
            delays = F.broadcast(delays)
        u = (
            u.join(delays, u["host"] == delays["__cd_dom"], "left")
            .drop("__cd_dom")
            .withColumn(
                # robots-less domains: absent from the delay table
                "delay_s",
                F.coalesce(F.col("__cd_delay"), F.lit(eff_default)),
            )
            .drop("__cd_delay")
        )
    else:
        u = u.withColumn("delay_s", F.lit(eff_default))
    w = Window.partitionBy("host").orderBy(
        *[F.col(c).asc_nulls_last() for c in order_cols]
    )
    return (
        u.withColumn("slot", F.row_number().over(w))
        .withColumn(
            "scheduled_offset_s",
            (F.col("slot") - F.lit(1)).cast("double") * F.col("delay_s"),
        )
        .withColumn(
            "lane",
            hash_bucket(
                F.coalesce(F.col("host"), F.lit("")), buckets=int(n_lanes)
            ).cast("int"),
        )
    )


def crawl_quota(
    schedule: DataFrame,
    max_per_host: int,
    flag_col: str | None = None,
) -> DataFrame:
    """Per-host crawl budget over a :func:`fetch_schedule` output.

    Real crawls bound each host's share of the cycle (politeness says
    WHEN, quota says HOW MANY — an archive host with 10M captures must
    not consume a worker's whole cycle). ``slot`` is already the
    1-based per-host fetch position, so enforcement is a FILTER riding
    the window fetch_schedule already paid for — zero additional
    shuffles at any scale.

    With ``flag_col=None`` (default) rows past the budget are dropped;
    the deferred remainder — the NEXT cycle's natural frontier — is the
    exact complement (``slot > max_per_host``), re-derivable from the
    same schedule. With ``flag_col`` given, ALL rows are kept and the
    overflow is marked instead, for sinks that persist both verdicts.
    """
    if max_per_host < 1:
        raise ValueError(f"max_per_host must be >= 1, got {max_per_host}")
    if "slot" not in schedule.columns:
        raise ValueError("crawl_quota expects a fetch_schedule output (no 'slot')")
    if flag_col is not None and flag_col in schedule.columns:
        raise ValueError(
            f"crawl_quota would overwrite existing column {flag_col!r}; "
            "pass a different flag_col"
        )
    over = F.col("slot") > max_per_host
    if flag_col is not None:
        return schedule.withColumn(flag_col, over)
    return schedule.filter(~over)


def prioritize_frontier(
    schedule: DataFrame,
    domain_scores: DataFrame,
    domain_col: str = "domain",
    score_col: str = "score",
    rank_col: str = "priority_rank",
    broadcast_scores: bool = True,
    max_broadcast_domains: int = 2_000_000,
) -> DataFrame:
    """Order each worker's queue by harvested domain value: the
    links→frontier bridge.

    ``domain_scores`` is ``(<domain_col>, <score_col>)`` — typically
    ``graph.pagerank`` or an indegree rollup over
    ``functions/links.domain_edges`` from the PREVIOUS crawl (pagerank
    emits ``(node, ..., rank)``: pass ``domain_col="node",
    score_col="rank"``).
    Each lane (= worker, from fetch_schedule's md5 routing) gets a
    dense 1-based ``rank_col`` ordering its own queue by
    ``(score DESC NULLS LAST, host, slot)``: high-value domains first,
    unscored (newly discovered) domains at the tail, and within a host
    the politeness slot order is PRESERVED because ``(score, host)``
    is constant across the host's rows.

    Deliberately NO global sort: a total frontier order at archive
    scale would range-shuffle the world for nothing — workers consume
    per-lane queues, so per-lane ranks are the real contract. The one
    new Exchange is the per-lane window; the score join broadcasts
    under ``require_broadcastable`` with the shuffle equi-join
    fallback (the delay-table discipline; the guard is EAGER — see
    ``fetch_schedule``'s NOTE, which applies verbatim).
    """
    from azure_etl_databricks_sql_powerbi_spark.util import require_broadcastable

    for c in ("host", "slot", "lane"):
        if c not in schedule.columns:
            raise ValueError(
                f"prioritize_frontier expects a fetch_schedule output (no {c!r})"
            )
    clash = {rank_col, score_col, "__ds_dom", "__ds_score"} & set(schedule.columns)
    if clash:
        raise ValueError(
            f"prioritize_frontier would produce duplicate column(s) "
            f"{sorted(clash)}; rename them or pass different "
            "rank_col/score_col"
        )
    scores = domain_scores.select(
        F.col(domain_col).alias("__ds_dom"), F.col(score_col).alias("__ds_score")
    )
    if broadcast_scores:
        require_broadcastable(
            scores,
            max_broadcast_domains,
            "max_broadcast_domains",
            "the per-domain score table",
            "pass broadcast_scores=False for the shuffle equi-join-on-host path",
        )
        scores = F.broadcast(scores)
    joined = (
        schedule.join(scores, schedule["host"] == scores["__ds_dom"], "left")
        .drop("__ds_dom")
        .withColumnRenamed("__ds_score", score_col)
    )
    w = Window.partitionBy("lane").orderBy(
        F.col(score_col).desc_nulls_last(), F.col("host").asc_nulls_last(), F.col("slot").asc()
    )
    return joined.withColumn(rank_col, F.row_number().over(w))


# ---------------------------------------------------------------- oracle


def duckdb_crawl_delays_sql(
    rules_relation: str = "rules",
    agent: str = "*",
    default_delay_s: float = DEFAULT_DELAY_S,
    max_delay_s: float | None = None,
) -> str:
    """DuckDB twin of :func:`crawl_delays`, generated from the module's
    OWN value-parse SQL and selection constants (the functions/pii
    discipline): same agent pre-filter, same has-exact/group pick,
    same max-of-valid aggregate, same default/cap fold. Returns a full
    SELECT over ``rules_relation`` (a ``parse_robots``-shaped
    relation). Hand-written expectations in ``tests/test_frontier.py``
    are the independent check."""
    a = agent.lower().replace("'", "''")
    val = _DELAY_VALUE_SQL.format(pattern="pattern")
    valid = _DELAY_VALID_SQL.format(val=val)
    eff = (
        f"coalesce(CASE WHEN has_exact = 1 THEN d_exact ELSE d_star END, "
        f"CAST({float(default_delay_s)!r} AS DOUBLE))"
    )
    if max_delay_s is not None:
        eff = f"least({eff}, CAST({float(max_delay_s)!r} AS DOUBLE))"
    return f"""
        SELECT domain, {eff} AS delay_s
        FROM (
            SELECT domain,
                   max(CASE WHEN agent = '{a}' THEN 1 ELSE 0 END)
                       AS has_exact,
                   max(CASE WHEN agent = '{a}'
                             AND directive = 'crawl-delay'
                             AND {valid}
                        THEN {val} END) AS d_exact,
                   max(CASE WHEN agent = '*'
                             AND directive = 'crawl-delay'
                             AND {valid}
                        THEN {val} END) AS d_star
            FROM {rules_relation}
            WHERE agent IN ('{a}', '*')
            GROUP BY domain
        )
    """


def duckdb_lane_sql(host_expr: str, n_lanes: int = 64) -> str:
    """DuckDB twin of the lane assignment — the md5-prefix bucket
    arithmetic of ``operators/sampling.hash_bucket`` (salt-less form)
    over a host expression, NULL hosts folding to ``''`` exactly as
    the engine does."""
    src = f"coalesce({host_expr}, '')"
    return (
        f"CAST(CAST(('0x' || substr(md5({src}), 1, 8)) AS BIGINT) "
        f"% {int(n_lanes)} AS INTEGER)"
    )

