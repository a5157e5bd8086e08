"""Crawl-frontier politeness scheduling (``sources/frontier``):
hand-written expectations for the REP group selection of
``Crawl-delay`` (exact-beats-*, empty exact group → default not *,
invalid/negative values ignored, max-of-multiples, cap), the per-host
serialized fetch slots (deterministic order, offsets, lane routing,
NULL-host fall-through, broadcast≡shuffle join parity), and the STAGED
declared-query twin: the full schedule proven cell-for-cell against a
DuckDB replay composed from the module-owned oracle builders
(ROTATION_POLICY §4 declare-ready discipline)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.functions.robots import (
    duckdb_parse_robots_sql,
    parse_robots,
)
from azure_etl_databricks_sql_powerbi_spark.sources.frontier import (
    crawl_delays,
    duckdb_crawl_delays_sql,
    duckdb_lane_sql,
    fetch_schedule,
)

# one robots document per delay-selection branch; keys arrive
# case-insensitively (parse lowercases), values survive inline comments
ROBOTS_DOCS = [
    # exact group declares 10, '*' declares 2 → trainbot 10, others 2
    ("a.com", "User-agent: *\nCrawl-delay: 2\n\nUser-agent: trainbot\nCrawl-Delay: 10\n"),
    # only '*', with an inline comment on the value
    ("b.com", "User-agent: *\nCrawl-delay: 4 # be gentle\n"),
    # trainbot declares an EMPTY group (marker only): exact selection →
    # DEFAULT for trainbot, never '*' group's 5
    ("c.com", "User-agent: trainbot\n\nUser-agent: *\nCrawl-delay: 5\n"),
    # invalid value → ignored → default
    ("d.com", "User-agent: *\nCrawl-delay: fast\n"),
    # negative → ignored → default
    ("e.com", "User-agent: *\nCrawl-delay: -3\n"),
    # multiple valid values → the largest (conservative) wins
    ("f.com", "User-agent: *\nCrawl-delay: 2\nCrawl-delay: 7\n"),
    # past the cap
    ("g.com", "User-agent: *\nCrawl-delay: 86400\n"),
    # fractional value
    ("h.com", "User-agent: *\nCrawl-delay: 1.5\n"),
    # robots.txt with no delay anywhere → default
    ("i.com", "User-agent: *\nDisallow: /private/\n"),
    # 'nan' parses to a DOUBLE that both engines order ABOVE every
    # number (it would pass >= 0 and win the max unguarded) → ignored
    ("j.com", "User-agent: *\nCrawl-delay: nan\nCrawl-delay: 3\n"),
    # '1e999' casts to +Infinity in BOTH engines — unguarded it would
    # win the max and make slot 1's offset 0.0*inf = NaN; 'inf' is the
    # PINNED parse divergence (DuckDB +Infinity, Spark NULL — Java
    # wants 'Infinity') that the finiteness gate makes unobservable
    ("l.com", "User-agent: *\nCrawl-delay: 1e999\nCrawl-delay: inf\nCrawl-delay: 6\n"),
]


@pytest.fixture(scope="module")
def rules(spark):
    docs = spark.createDataFrame(
        ROBOTS_DOCS, "domain string, robots_txt string"
    )
    return parse_robots(docs).cache()


def _delays(rules, **kw):
    rows = crawl_delays(rules, **kw).collect()
    return {r.domain: r.delay_s for r in rows}


def test_crawl_delay_group_selection(rules):
    d = _delays(rules, agent="trainbot")
    assert d["a.com"] == 10.0  # exact beats *
    assert d["b.com"] == 4.0  # inline comment stripped
    assert d["c.com"] == 1.0  # empty exact group → default, NOT *'s 5
    assert d["d.com"] == 1.0  # invalid → default
    assert d["e.com"] == 1.0  # negative → default
    assert d["f.com"] == 7.0  # max of multiples
    assert d["h.com"] == 1.5  # fractional
    assert d["i.com"] == 1.0  # no delay declared
    assert d["j.com"] == 3.0  # NaN invalid; the valid sibling wins
    assert d["l.com"] == 6.0  # inf variants invalid; finite sibling wins


def test_crawl_delay_star_agent_and_cap(rules):
    d = _delays(rules, agent="*", max_delay_s=30.0)
    assert d["a.com"] == 2.0  # '*' asks for the '*' group
    assert d["g.com"] == 30.0  # cap
    assert _delays(rules, agent="*")["g.com"] == 86400.0  # uncapped


CAPTURES = [
    # (url, urlkey, ts, filename, offset) — (ts, urlkey, filename,
    # offset) is a per-host TOTAL order; www. variant must join a.com's
    # delay via registered_domain
    ("http://www.a.com/p1", "com,a)/p1", "2024-01-01 00:00:00", "s1.warc.gz", 0),
    ("http://a.com/p2", "com,a)/p2", "2024-01-01 00:00:01", "s1.warc.gz", 100),
    ("http://a.com/p3", "com,a)/p3", "2024-01-01 00:00:01", "s2.warc.gz", 0),
    ("http://b.com/x", "com,b)/x", "2024-01-02 00:00:00", "s1.warc.gz", 200),
    ("http://b.com/y", "com,b)/y", "2024-01-02 00:00:05", "s2.warc.gz", 50),
    # no robots.txt for k.com → default delay
    ("http://k.com/only", "com,k)/only", "2024-01-03 00:00:00", "s3.warc.gz", 0),
    # l.com routes the inf/1e999/'inf' robots plant through the TWIN
    # compare: both dialects must agree the finite 6 wins
    ("http://l.com/a", "com,l)/a", "2024-01-03 01:00:00", "s3.warc.gz", 5),
    ("http://l.com/b", "com,l)/b", "2024-01-03 01:00:01", "s3.warc.gz", 7),
    # malformed URL: NULL host group, kept on the default delay
    ("not-a-url", "zz)/bad", "2024-01-04 00:00:00", "s3.warc.gz", 10),
]

@pytest.fixture(scope="module")
def captures(spark):
    raw = spark.createDataFrame(
        CAPTURES,
        "url string, urlkey string, ts string, filename string, offset long",
    )
    return raw.withColumn("ts", F.to_timestamp("ts")).cache()


def test_fetch_schedule_slots_offsets_lanes(spark, captures, rules):
    out = fetch_schedule(
        captures, rules, agent="trainbot", n_lanes=16
    ).collect()
    by_key = {r.urlkey: r for r in out}
    assert len(out) == len(CAPTURES)  # nothing dropped, NULL host kept

    # a.com: delay 10 (trainbot group), serialized in (ts, urlkey) order
    a = [by_key[k] for k in ("com,a)/p1", "com,a)/p2", "com,a)/p3")]
    assert all(r.host == "a.com" for r in a)  # www. folded by reg-domain
    assert [r.slot for r in a] == [1, 2, 3]
    assert [r.scheduled_offset_s for r in a] == [0.0, 10.0, 20.0]
    assert len({r.lane for r in a}) == 1  # one host, one lane

    # b.com: delay 4, two captures
    b = [by_key["com,b)/x"], by_key["com,b)/y"]]
    assert [r.slot for r in b] == [1, 2]
    assert [r.scheduled_offset_s for r in b] == [0.0, 4.0]

    # robots-less and NULL-host rows: default delay 1.0
    assert by_key["com,k)/only"].delay_s == 1.0
    bad = by_key["zz)/bad"]
    assert bad.host is None and bad.delay_s == 1.0 and bad.slot == 1
    assert all(0 <= r.lane < 16 for r in out)


def test_fetch_schedule_broadcast_equals_shuffle(spark, captures, rules):
    kw = dict(agent="trainbot", max_delay_s=30.0, n_lanes=8)
    a = fetch_schedule(captures, rules, broadcast_delays=True, **kw)
    b = fetch_schedule(captures, rules, broadcast_delays=False, **kw)
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb


def test_fetch_schedule_without_rules_and_guards(spark, captures):
    out = fetch_schedule(captures, None, default_delay_s=2.0).collect()
    assert {r.delay_s for r in out} == {2.0}

    # the cap applies to the default on the no-rules path too
    capped = fetch_schedule(
        captures, None, default_delay_s=2.0, max_delay_s=0.5
    ).collect()
    assert {r.delay_s for r in capped} == {0.5}

    with pytest.raises(ValueError, match="order_cols"):
        fetch_schedule(captures.drop("ts"), None)
    with pytest.raises(ValueError, match="rename"):
        fetch_schedule(captures.withColumn("slot", F.lit(1)), None)


def test_fetch_schedule_plan_shape(spark, captures, rules):
    """100 TB posture pinned: the delay table joins BROADCAST (the
    capture side never shuffles on a rule key), the ONE Exchange is
    the per-host window's hash partitioning over index metadata, and
    the whole schedule is JVM-side — zero Python nodes."""
    plan = (
        fetch_schedule(captures, rules, agent="trainbot")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # exactly one capture-side shuffle: the host window. Every other
    # Exchange keys on the rule table's domain — KB-scale robots
    # metadata inside the broadcast subtree (the warc_cdx_ranged_corpus
    # precedent: index-side shuffles don't move payload bytes)
    import re

    keys = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert keys.count("host") == 1
    assert set(keys) <= {"host", "domain"}
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


# ------------------------------------------------------------------
# Pre-staged declared-query shape (the 6fdd190 CDX precedent): the
# dual-dialect plants + composed twin the r16 declare lifts verbatim
# into __spark_entry__. Domain index doc_id % 12 over 8 robots
# branches: dom_idx 0..9 carry robots.txt (branch = dom_idx % 8, so
# 8/9 re-arm branches 0/1 on a second domain and branches 2..7 each
# fire from exactly one domain — every branch fires on ANY table with
# >= 12 docs); dom_idx 10/11 carry NO robots.txt, arming the
# robots-less default path; the www. prefix selector doc_id % 3
# varies WITHIN each domain, arming registered-domain folding per
# host.
# ------------------------------------------------------------------

# one robots document per delay-selection branch, keyed by dom_idx
_FRONTIER_ROBOTS_PLANT_SQL = """CASE dom_idx % 8
  WHEN 0 THEN 'User-agent: *' || chr(10) || 'Crawl-delay: 2'
       || chr(10) || chr(10) || 'User-Agent: TrainBot' || chr(10)
       || 'Crawl-Delay: 10'
  WHEN 1 THEN 'User-agent: *' || chr(10)
       || 'Crawl-delay: 4 # be gentle'
  WHEN 2 THEN 'User-agent: trainbot' || chr(10) || chr(10)
       || 'User-agent: *' || chr(10) || 'Crawl-delay: 5'
  WHEN 3 THEN 'User-agent: *' || chr(10) || 'Crawl-delay: fast'
       || chr(10) || 'Crawl-delay: nan' || chr(10)
       || 'Crawl-delay: 1e999' || chr(10) || 'Crawl-delay: inf'
       || chr(10) || 'Crawl-delay: 3'
  WHEN 4 THEN 'User-agent: *' || chr(10) || 'Crawl-delay: -3'
  WHEN 5 THEN 'User-agent: *' || chr(10) || 'Crawl-delay: 2'
       || chr(10) || 'Crawl-delay: 7'
  WHEN 6 THEN 'User-agent: *' || chr(10) || 'Crawl-delay: 86400'
  ELSE 'User-agent: *' || chr(10) || 'Crawl-delay: 1.5'
END"""

# captures planted over the WHOLE documents table — expressions only
# (aliases applied per side: DuckDB must quote "offset")
_FRONTIER_CAPTURE_EXPRS = {
    "url": (
        "CASE WHEN doc_id % 3 = 0 THEN 'https://WWW.site' "
        "ELSE 'https://site' END || CAST(doc_id % 12 AS STRING) "
        "|| '.com/p/' || CAST(doc_id AS STRING)"
    ),
    "urlkey": (
        "'com,site' || CAST(doc_id % 12 AS STRING) || ')/p/' "
        "|| CAST(doc_id AS STRING)"
    ),
    "filename": "'s' || CAST(doc_id % 4 AS STRING) || '.warc.gz'",
    "offset": "doc_id * 100",
}

_STAGED_AGENT, _STAGED_DEFAULT, _STAGED_CAP, _STAGED_LANES = (
    "trainbot", 1.0, 30.0, 16,
)


def test_fetch_schedule_staged_declared_shape(spark, sf_dir):
    """STAGED declare-ready (ROTATION_POLICY §4): the FULL declared
    query at documents-table scale — captures planted from doc_id
    arithmetic, robots documents planted per domain (dom_idx 10/11
    robots-less), schedule computed for the exact 'trainbot' agent
    with the 30 s cap, proven cell-for-cell (float_tol=0) against the
    DuckDB replay composed from the module-owned builders. The r16
    declare lifts this plant + oracle verbatim into the entry."""
    import duckdb

    from oracle_harness import compare
    from azure_etl_databricks_sql_powerbi_spark.functions.urls import (
        duckdb_host_sql,
        duckdb_registered_domain_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    caps = docs.selectExpr(
        "doc_id",
        *[f"{ex} AS {name}" for name, ex in _FRONTIER_CAPTURE_EXPRS.items()],
    )
    robots_docs = (
        docs.selectExpr("CAST(doc_id % 12 AS INT) AS dom_idx")
        .filter("dom_idx < 10")
        .distinct()
        .selectExpr(
            "'site' || CAST(dom_idx AS STRING) || '.com' AS domain",
            f"{_FRONTIER_ROBOTS_PLANT_SQL} AS robots_txt",
        )
    )
    got = fetch_schedule(
        caps,
        parse_robots(robots_docs),
        url_col="url",
        order_cols=("urlkey", "filename", "offset"),
        agent=_STAGED_AGENT,
        default_delay_s=_STAGED_DEFAULT,
        max_delay_s=_STAGED_CAP,
        n_lanes=_STAGED_LANES,
    ).select("urlkey", "host", "delay_s", "slot", "scheduled_offset_s", "lane")

    # hand-written anchors, independent of the generated twin: branch
    # 0 domains (dom_idx 0 and 8) carry the exact-agent 10 s delay;
    # branch-2 domains select trainbot's EMPTY group → default 1.0
    # (never *'s 5); branch-6 hits the cap; 10/11 are robots-less
    by_host = {
        r.host: r.delay_s for r in got.select("host", "delay_s").distinct().collect()
    }
    assert by_host["site0.com"] == 10.0 and by_host["site8.com"] == 10.0
    assert by_host["site2.com"] == 1.0
    assert by_host["site3.com"] == 3.0  # fast/nan/1e999 invalid, 3 wins
    assert by_host["site6.com"] == 30.0  # capped
    assert by_host["site10.com"] == 1.0 and by_host["site11.com"] == 1.0

    host = duckdb_registered_domain_sql(duckdb_host_sql("c.url"))
    order = 'urlkey ASC NULLS LAST, filename ASC NULLS LAST, "offset" ASC NULLS LAST'
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    sql = f"""
        WITH captures AS (
            SELECT doc_id,
                   {_FRONTIER_CAPTURE_EXPRS['url']} AS url,
                   {_FRONTIER_CAPTURE_EXPRS['urlkey']} AS urlkey,
                   {_FRONTIER_CAPTURE_EXPRS['filename']} AS filename,
                   {_FRONTIER_CAPTURE_EXPRS['offset']} AS "offset"
            FROM documents
        ),
        robots_docs AS (
            SELECT 'site' || CAST(dom_idx AS STRING) || '.com' AS domain,
                   {_FRONTIER_ROBOTS_PLANT_SQL} AS robots_txt
            FROM (SELECT DISTINCT CAST(doc_id % 12 AS INT) AS dom_idx
                  FROM documents WHERE doc_id % 12 < 10)
        ),
        rules AS MATERIALIZED (
            {duckdb_parse_robots_sql("robots_docs")}
        ),
        delays AS MATERIALIZED (
            {duckdb_crawl_delays_sql(
                "rules", _STAGED_AGENT, _STAGED_DEFAULT, _STAGED_CAP)}
        ),
        hosted AS (
            SELECT c.urlkey, c.filename, c."offset", {host} AS host
            FROM captures c
        ),
        joined AS (
            SELECT h.*,
                   coalesce(d.delay_s,
                            CAST({min(_STAGED_DEFAULT, _STAGED_CAP)!r}
                                 AS DOUBLE)) AS delay_s
            FROM hosted h LEFT JOIN delays d ON h.host = d.domain
        )
        SELECT urlkey, host, delay_s,
               CAST(row_number() OVER (
                   PARTITION BY host ORDER BY {order}) AS INTEGER) AS slot,
               CAST((CAST(row_number() OVER (
                   PARTITION BY host ORDER BY {order}) AS INTEGER) - 1)
                    AS DOUBLE) * delay_s AS scheduled_offset_s,
               {duckdb_lane_sql("host", _STAGED_LANES)} AS lane
        FROM joined
    """
    oracle = con.execute(sql).fetchdf()
    errs = compare(got, oracle, float_tol=0.0)
    assert not errs, errs


def test_fetch_schedule_staged_duckdb_twin(spark, captures, rules):
    """STAGED declare-ready (ROTATION_POLICY §4): the politeness
    schedule proven cell-for-cell against a DuckDB replay composed
    from the module-owned builders (parse_robots twin → crawl_delays
    twin → registered-domain host twin → window + lane arithmetic) —
    the future declared query's oracle at unit scale, hash-exact
    class including the float offsets."""
    import duckdb

    from oracle_harness import compare
    from azure_etl_databricks_sql_powerbi_spark.functions.urls import (
        duckdb_host_sql,
        duckdb_registered_domain_sql,
    )

    agent, default_s, cap_s, n_lanes = "trainbot", 1.0, 30.0, 16
    got = fetch_schedule(
        captures,
        rules,
        agent=agent,
        default_delay_s=default_s,
        max_delay_s=cap_s,
        n_lanes=n_lanes,
    ).select(
        "urlkey", "host", "delay_s", "slot", "scheduled_offset_s", "lane"
    )

    con = duckdb.connect()
    con.register(
        "robots_docs",
        pd.DataFrame(ROBOTS_DOCS, columns=["domain", "robots_txt"]),
    )
    con.register("captures", captures.toPandas())
    host = duckdb_registered_domain_sql(duckdb_host_sql("c.url"))
    eff_default = min(default_s, cap_s)
    sql = f"""
        WITH rules AS MATERIALIZED (
            {duckdb_parse_robots_sql("robots_docs")}
        ),
        delays AS MATERIALIZED (
            {duckdb_crawl_delays_sql("rules", agent, default_s, cap_s)}
        ),
        hosted AS (
            SELECT c.urlkey, c.ts, c.filename, c."offset",
                   {host} AS host
            FROM captures c
        ),
        joined AS (
            SELECT h.*,
                   coalesce(d.delay_s,
                            CAST({eff_default!r} AS DOUBLE)) AS delay_s
            FROM hosted h LEFT JOIN delays d ON h.host = d.domain
        )
        SELECT urlkey, host, delay_s,
               CAST(row_number() OVER (
                   PARTITION BY host
                   ORDER BY ts ASC NULLS LAST, urlkey ASC NULLS LAST,
                            filename ASC NULLS LAST,
                            "offset" ASC NULLS LAST) AS INTEGER) AS slot,
               CAST((CAST(row_number() OVER (
                   PARTITION BY host
                   ORDER BY ts ASC NULLS LAST, urlkey ASC NULLS LAST,
                            filename ASC NULLS LAST,
                            "offset" ASC NULLS LAST) AS INTEGER) - 1)
                    AS DOUBLE)
                   * delay_s AS scheduled_offset_s,
               {duckdb_lane_sql("host", n_lanes)} AS lane
        FROM joined
    """
    oracle = con.execute(sql).fetchdf()
    errs = compare(got, oracle, float_tol=0.0)
    assert not errs, errs


def test_staged_shape_compiles_codegen_only(spark, sf_dir):
    """The r14 lesson applied BEFORE declaring: the staged schedule's
    stages must whole-stage-compile — a Janino failure would silently
    run interpreted and only surface in executor stderr. fallback=false
    turns any compile failure into a loud error."""
    fallback = spark.conf.get("spark.sql.codegen.fallback")
    factory = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        caps = docs.selectExpr(
            "doc_id",
            *[f"{ex} AS {n}" for n, ex in _FRONTIER_CAPTURE_EXPRS.items()],
        )
        robots_docs = (
            docs.selectExpr("CAST(doc_id % 12 AS INT) AS dom_idx")
            .filter("dom_idx < 10")
            .distinct()
            .selectExpr(
                "'site' || CAST(dom_idx AS STRING) || '.com' AS domain",
                f"{_FRONTIER_ROBOTS_PLANT_SQL} AS robots_txt",
            )
        )
        n = fetch_schedule(
            caps,
            parse_robots(robots_docs),
            url_col="url",
            order_cols=("urlkey", "filename", "offset"),
            agent=_STAGED_AGENT,
            default_delay_s=_STAGED_DEFAULT,
            max_delay_s=_STAGED_CAP,
            n_lanes=_STAGED_LANES,
        ).count()
        assert n == docs.count()
    finally:
        spark.conf.set("spark.sql.codegen.fallback", fallback)
        spark.conf.set("spark.sql.codegen.factoryMode", factory)


def test_crawl_quota_filters_and_flags(spark, captures, rules):
    from azure_etl_databricks_sql_powerbi_spark.sources.frontier import crawl_quota

    sched = fetch_schedule(captures, rules, agent="trainbot", n_lanes=16)
    kept = crawl_quota(sched, 2).collect()
    # every host bounded; a.com (3 captures) lost exactly its slot-3 row
    per_host: dict = {}
    for r in kept:
        per_host[r.host] = per_host.get(r.host, 0) + 1
    assert max(per_host.values()) <= 2
    assert per_host["a.com"] == 2
    # the flagged variant keeps everything and marks the exact complement
    flagged = crawl_quota(sched, 2, flag_col="deferred").collect()
    assert len(flagged) == len(CAPTURES)
    deferred = {r.urlkey for r in flagged if r.deferred}
    kept_keys = {r.urlkey for r in kept}
    assert deferred == {r.urlkey for r in sched.collect() if r.slot > 2}
    assert kept_keys | deferred == {r.urlkey for r in flagged}
    assert not (kept_keys & deferred)
    with pytest.raises(ValueError, match="max_per_host"):
        crawl_quota(sched, 0)
    with pytest.raises(ValueError, match="slot"):
        crawl_quota(captures, 2)


def test_prioritize_frontier_per_lane_ranks(spark, captures, rules):
    """The links→frontier bridge: each lane's queue orders by domain
    score desc (unscored hosts at the tail), host blocks contiguous,
    slot order preserved within a host — and NO global sort: ranks are
    dense 1..n PER LANE."""
    from azure_etl_databricks_sql_powerbi_spark.sources.frontier import (
        crawl_quota,
        prioritize_frontier,
    )

    sched = fetch_schedule(captures, rules, agent="trainbot", n_lanes=1)
    scores = spark.createDataFrame(
        [("a.com", 0.9), ("b.com", 2.5), ("ghost.com", 7.0)],
        "domain string, score double",
    )
    out = prioritize_frontier(sched, scores)
    rows = sorted(out.collect(), key=lambda r: (r.lane, r.priority_rank))
    by_lane: dict = {}
    for r in rows:
        by_lane.setdefault(r.lane, []).append(r)
    for lane_rows in by_lane.values():
        # dense 1..n within the lane
        assert [r.priority_rank for r in lane_rows] == list(
            range(1, len(lane_rows) + 1)
        )
        # scores non-increasing (None = -inf at the tail)
        seq = [(-1e18 if r.score is None else r.score) for r in lane_rows]
        assert seq == sorted(seq, reverse=True)
        # within a host: contiguous block, slot order preserved
        seen = set()
        prev_host, prev_slot = object(), 0
        for r in lane_rows:
            if r.host != prev_host:
                assert r.host not in seen  # contiguity: no host reappears
                seen.add(r.host)
                prev_host, prev_slot = r.host, r.slot
            else:
                assert r.slot > prev_slot
                prev_slot = r.slot
    # with one lane, b.com (2.5) outranks a.com (0.9); unscored hosts last
    single = by_lane[next(iter(by_lane))]
    hosts_in_order = [r.host for r in single]
    assert hosts_in_order.index("b.com") < hosts_in_order.index("a.com")
    scored = {"a.com", "b.com"}
    tail = [h for h in hosts_in_order if h not in scored]
    assert hosts_in_order[-len(tail):] == tail if tail else True
    # composes with the quota filter without recomputing any window
    q = prioritize_frontier(crawl_quota(sched, 1), scores).collect()
    assert max(r.slot for r in q) == 1


def test_prioritize_frontier_guard_and_fallback(spark, captures, rules):
    from azure_etl_databricks_sql_powerbi_spark.sources.frontier import (
        prioritize_frontier,
    )

    sched = fetch_schedule(captures, rules, agent="trainbot", n_lanes=4)
    scores = spark.createDataFrame(
        [("a.com", 0.9), ("b.com", 2.5)], "domain string, score double"
    )
    with pytest.raises(ValueError, match="max_broadcast_domains"):
        prioritize_frontier(sched, scores, max_broadcast_domains=1)
    bc = prioritize_frontier(sched, scores).collect()
    sh = prioritize_frontier(sched, scores, broadcast_scores=False).collect()
    key = lambda rows: sorted((r.urlkey, r.lane, r.priority_rank, r.score) for r in rows)
    assert key(bc) == key(sh)


def test_quota_and_priority_clash_guards(spark, captures, rules):
    from azure_etl_databricks_sql_powerbi_spark.sources.frontier import (
        crawl_quota,
        prioritize_frontier,
    )

    sched = fetch_schedule(captures, rules, agent="trainbot", n_lanes=4)
    with pytest.raises(ValueError, match="flag_col"):
        crawl_quota(sched, 2, flag_col="slot")
    scores = spark.createDataFrame([("a.com", 1.0)], "domain string, score double")
    with pytest.raises(ValueError, match="duplicate column"):
        prioritize_frontier(sched.withColumn("score", F.lit(0.0)), scores)
    # pagerank-shaped score tables work via domain_col/score_col
    pr_shaped = spark.createDataFrame(
        [("a.com", 123, 2.5)], "node string, rank_m long, rank double"
    )
    out = prioritize_frontier(sched, pr_shaped, domain_col="node", score_col="rank")
    a = [r for r in out.collect() if r.host == "a.com"]
    assert a and all(r.rank == 2.5 for r in a)


_PRIORITY_SCORE_SQL = (
    "CAST((dom_idx % 5) AS DOUBLE) + 2.0"  # deliberate cross-domain ties
)
_STAGED_QUOTA = 25


def test_prioritized_schedule_staged_declared_shape(spark, sf_dir):
    """STAGED declare-ready (ROTATION_POLICY §4, r17 candidate
    `prioritized_crawl_schedule`): the COMPOSED frontier chain at
    documents-table scale — fetch_schedule → crawl_quota →
    prioritize_frontier — against a DuckDB replay that extends the
    fetch_schedule twin with the quota predicate and the per-lane
    priority window. Scores are planted per domain with deliberate
    cross-domain TIES (broken by host asc) and dom_idx % 3 == 2
    domains left UNSCORED (they must sink to each lane's tail);
    robots-less domains 10/11 ride the default delay through the
    whole chain. A declare lifts plant + oracle verbatim."""
    import duckdb

    from oracle_harness import compare
    from azure_etl_databricks_sql_powerbi_spark.functions.urls import (
        duckdb_host_sql,
        duckdb_registered_domain_sql,
    )
    from azure_etl_databricks_sql_powerbi_spark.sources.frontier import (
        crawl_quota,
        prioritize_frontier,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    caps = docs.selectExpr(
        "doc_id",
        *[f"{ex} AS {name}" for name, ex in _FRONTIER_CAPTURE_EXPRS.items()],
    )
    robots_docs = (
        docs.selectExpr("CAST(doc_id % 12 AS INT) AS dom_idx")
        .filter("dom_idx < 10")
        .distinct()
        .selectExpr(
            "'site' || CAST(dom_idx AS STRING) || '.com' AS domain",
            f"{_FRONTIER_ROBOTS_PLANT_SQL} AS robots_txt",
        )
    )
    scores = (
        docs.selectExpr("CAST(doc_id % 12 AS INT) AS dom_idx")
        .filter("dom_idx % 3 != 2")
        .distinct()
        .selectExpr(
            "'site' || CAST(dom_idx AS STRING) || '.com' AS domain",
            f"{_PRIORITY_SCORE_SQL} AS score",
        )
    )
    got = prioritize_frontier(
        crawl_quota(
            fetch_schedule(
                caps,
                parse_robots(robots_docs),
                url_col="url",
                order_cols=("urlkey", "filename", "offset"),
                agent=_STAGED_AGENT,
                default_delay_s=_STAGED_DEFAULT,
                max_delay_s=_STAGED_CAP,
                n_lanes=_STAGED_LANES,
            ),
            _STAGED_QUOTA,
        ),
        scores,
    ).select("urlkey", "host", "slot", "lane", "score", "priority_rank")

    rows = got.collect()
    # hand anchors independent of the twin: quota bites, ranks are dense
    # per lane, scores non-increasing by rank, unscored hosts at the tail
    assert max(r.slot for r in rows) <= _STAGED_QUOTA
    by_lane: dict = {}
    for r in rows:
        by_lane.setdefault(r.lane, []).append(r)
    for lane_rows in by_lane.values():
        lane_rows.sort(key=lambda r: r.priority_rank)
        assert [r.priority_rank for r in lane_rows] == list(
            range(1, len(lane_rows) + 1)
        )
        seq = [(-1.0 if r.score is None else r.score) for r in lane_rows]
        assert seq == sorted(seq, reverse=True)
    unscored = {r.host for r in rows if r.score is None}
    assert any(h in unscored for h in ("site2.com", "site5.com", "site8.com"))
    assert "site10.com" in unscored or "site11.com" in unscored

    host = duckdb_registered_domain_sql(duckdb_host_sql("c.url"))
    order = 'urlkey ASC NULLS LAST, filename ASC NULLS LAST, "offset" ASC NULLS LAST'
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    sql = f"""
        WITH captures AS (
            SELECT doc_id,
                   {_FRONTIER_CAPTURE_EXPRS['url']} AS url,
                   {_FRONTIER_CAPTURE_EXPRS['urlkey']} AS urlkey,
                   {_FRONTIER_CAPTURE_EXPRS['filename']} AS filename,
                   {_FRONTIER_CAPTURE_EXPRS['offset']} AS "offset"
            FROM documents
        ),
        robots_docs AS (
            SELECT 'site' || CAST(dom_idx AS STRING) || '.com' AS domain,
                   {_FRONTIER_ROBOTS_PLANT_SQL} AS robots_txt
            FROM (SELECT DISTINCT CAST(doc_id % 12 AS INT) AS dom_idx
                  FROM documents WHERE doc_id % 12 < 10)
        ),
        rules AS MATERIALIZED (
            {duckdb_parse_robots_sql("robots_docs")}
        ),
        delays AS MATERIALIZED (
            {duckdb_crawl_delays_sql(
                "rules", _STAGED_AGENT, _STAGED_DEFAULT, _STAGED_CAP)}
        ),
        scores AS MATERIALIZED (
            SELECT 'site' || CAST(dom_idx AS STRING) || '.com' AS domain,
                   {_PRIORITY_SCORE_SQL} AS score
            FROM (SELECT DISTINCT CAST(doc_id % 12 AS INT) AS dom_idx
                  FROM documents WHERE dom_idx % 3 != 2)
        ),
        hosted AS (
            SELECT c.urlkey, c.filename, c."offset", {host} AS host
            FROM captures c
        ),
        joined AS (
            SELECT h.*,
                   coalesce(d.delay_s,
                            CAST({min(_STAGED_DEFAULT, _STAGED_CAP)!r}
                                 AS DOUBLE)) AS delay_s
            FROM hosted h LEFT JOIN delays d ON h.host = d.domain
        ),
        slotted AS (
            SELECT urlkey, host,
                   CAST(row_number() OVER (
                       PARTITION BY host ORDER BY {order}) AS INTEGER) AS slot,
                   {duckdb_lane_sql("host", _STAGED_LANES)} AS lane
            FROM joined
        ),
        quota AS (
            SELECT * FROM slotted WHERE slot <= {_STAGED_QUOTA}
        )
        SELECT q.urlkey, q.host, q.slot, q.lane, s.score,
               CAST(row_number() OVER (
                   PARTITION BY q.lane
                   ORDER BY s.score DESC NULLS LAST,
                            q.host ASC NULLS LAST,
                            q.slot ASC) AS INTEGER) AS priority_rank
        FROM quota q LEFT JOIN scores s ON q.host = s.domain
    """
    oracle = con.execute(sql).fetchdf()
    errs = compare(got, oracle, float_tol=0.0)
    assert not errs, errs
