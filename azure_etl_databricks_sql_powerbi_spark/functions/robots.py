"""robots.txt parsing and URL permission filtering — the crawl-policy
half of curation (north-star extension; the reference engine at
/root/reference has no crawl surface). A training-data pipeline that
re-processes an archived crawl still honors exclusions: publishers
change their robots.txt AFTER a crawl, and post-hoc filtering against
a current snapshot is standard practice.

Spark-first shape, two stages:

1. **``parse_robots``** — robots.txt documents (one per domain) →
   RULE rows ``(domain, agent, directive, pattern, prio)``. The stanza
   structure (a run of ``User-agent:`` lines binds the rule lines
   after it — until a BLANK LINE or the next agent-run; rules before
   any agent line are ignored per spec) is resolved with WINDOW
   functions over line numbers, not Python: ``posexplode`` the lines,
   mark agent-run starts, propagate the run id with a running
   ``last(ignorenulls)``, then join rules to the agents of their own
   run. All JVM.
2. **``filter_robots_allowed``** — URLs × rules: broadcast the (tiny)
   rule table, keep each URL's rules for the MOST SPECIFIC matching
   agent group (exact agent beats ``*`` — the spec's group-selection
   rule, simplified to the two groups a curation pipeline queries),
   match path patterns (literal prefixes; ``*`` wildcards and a
   trailing ``$`` anchor converted to an RE2≡Java regex with
   everything else escaped), pick the LONGEST matching pattern, allow
   on ties (the Google/REP tie-break), allow when nothing matches or
   the domain has no robots.txt. One broadcast join + one window keyed
   by a per-row id (duplicate URLs — e.g. multiple captures of one
   URL — each keep their own verdict) — no shuffle of the URL side on
   a rule key before the verdict.

Pattern-length specificity ("longest pattern wins") follows REP;
``crawl-delay``/``sitemap`` lines are surfaced as rules with their own
directive so downstream can read them, but they never affect
permission. An empty Disallow ("Disallow:") means allow-all per
spec: it carries a NULL match regex, contributes nothing to matching,
and permission falls through to the default allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# line shape: "Directive: value" with optional inline '#' comment.
_LINE_RE = r"^\s*([A-Za-z-]+)\s*:\s*([^#]*)"

# REP matches rules against the URL's path(+query). ONE definition in
# the SQL dialect intersection (instr/substring/CASE parse identically
# in Spark and DuckDB), shared by the engine's __path derivation and
# the duckdb_url_path_sql oracle builder so the two can never desync
# (the r13 swap-commit review's twin-discipline finding). A URL
# without '://' (relative or malformed) has NO path under this rule —
# instr()=0 would otherwise yield substring(url, 3), a garbage path
# that can spuriously match rules — so it derives NULL and falls
# through to default-allow with a NULL rule (r13 ADVICE #3).
_AFTER_SCHEME_SQL = (
    "CASE WHEN instr({url}, '://') = 0 THEN CAST(NULL AS STRING) "
    "ELSE substring({url}, instr({url}, '://') + 3) END"
)
_PATH_FROM_AFTER_SQL = (
    "CASE WHEN instr({after}, '/') = 0 THEN '/' "
    "ELSE substring({after}, instr({after}, '/')) END"
)

# Columns the broadcast rule side contributes to the permission join —
# ONE definition shared by the perm projection and the clash guard, so
# the two can never drift (r13 review #2).
_RULE_SIDE_COLS = (
    "__r_dom",
    "__r_agent",
    "directive",
    "pattern",
    "pattern_len",
    "regex",
)


def parse_robots(
    docs: DataFrame, domain_col: str = "domain", text_col: str = "robots_txt"
) -> DataFrame:
    """robots.txt documents → rule rows ``(domain, agent, directive,
    pattern, pattern_len, regex)``. Stanza binding per REP: a run of
    consecutive ``User-agent`` lines owns the rules that follow until
    the next agent-run OR a blank line ends the group; rules with no
    preceding agent line in scope are dropped. ``allow``/``disallow``
    rows carry a ready-to-use anchored match regex; other directives
    (``crawl-delay``, ``sitemap``, …) pass through with NULL regex."""
    lines = docs.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(text_col), "\r?\n")).alias(
            "line_no", "line"
        ),
    )
    parsed = lines.select(
        "domain",
        "line_no",
        F.lower(F.regexp_extract("line", _LINE_RE, 1)).alias("key"),
        F.trim(F.regexp_extract("line", _LINE_RE, 2)).alias("value"),
        (F.trim("line") == "").alias("is_blank"),
    )
    w = Window.partitionBy("domain").orderBy("line_no")
    # group ids: a User-agent line that does NOT directly follow
    # another User-agent line starts a new agent-run; a blank line or
    # a new run closes the previous group's rule scope.
    marked = parsed.withColumn(
        "is_agent", F.col("key") == F.lit("user-agent")
    ).withColumn(
        "run_start",
        F.col("is_agent")
        & ~F.coalesce(F.lag("is_agent").over(w), F.lit(False)),
    )
    # scope id: every run_start (and every blank line) bumps a counter;
    # rules see the id of the last agent-run, blanks invalidate it
    scoped = (
        marked.withColumn(
            "run_id",
            F.sum(F.col("run_start").cast("int")).over(w),
        )
        .withColumn(
            "blanks_before",
            F.sum(F.col("is_blank").cast("int")).over(w),
        )
    )
    # g_domain (not a bare "domain") so the rules↔agents join below is
    # an UNAMBIGUOUS equi-join: both sides share the `scoped` lineage,
    # and same-named column references in a self-join make Spark emit
    # its "trivially true equals predicate" warning while it
    # disambiguates via plan-id metadata — explicit aliases keep the
    # join meaning in the query text instead of the resolver
    agents = scoped.filter(F.col("is_agent")).select(
        F.col("domain").alias("g_domain"),
        F.col("run_id").alias("g_run"),
        F.lower("value").alias("agent"),
        F.col("blanks_before").alias("g_blanks"),
        F.col("line_no").alias("agent_line"),
    )
    rules = scoped.filter(
        ~F.col("is_agent")
        & ~F.col("is_blank")
        & (F.col("key") != "")
        & (F.col("run_id") > 0)
    ).select(
        "domain",
        F.col("run_id").alias("r_run"),
        F.col("blanks_before").alias("r_blanks"),
        F.col("key").alias("directive"),
        F.col("value").alias("pattern"),
        F.col("line_no").alias("rule_line"),
    )
    # a rule belongs to its run's agents only if no blank line
    # intervened between the END of the agent-run and the rule…
    # REP's actual rule is simpler: blank lines end a GROUP. Joining
    # on same run + same blank count as the run's LAST agent line
    # implements exactly that (agents in a run share blanks_before).
    joined = rules.join(
        # agents is |user-agent lines| rows — broadcast keeps the whole
        # rule build shuffle-free (robots documents are KB-scale)
        F.broadcast(agents),
        (F.col("domain") == F.col("g_domain"))
        & (F.col("r_run") == F.col("g_run"))
        & (F.col("r_blanks") == F.col("g_blanks")),
    ).select(
        "domain",
        "agent",
        "directive",
        "pattern",
        "rule_line",
    )
    pat = F.col("pattern")
    esc = F.regexp_replace(pat, r"([.^+?()\[\]{}|\\$])", r"\\$1")
    # one trailing (escaped) \$ back to an anchor; * to .* — the
    # replacement is Java-escaped (\$): a bare '$' in a Java
    # replacement string is a group reference and throws
    core = F.regexp_replace(esc, r"\\\$$", "\\$")
    rx = F.concat(F.lit("^"), F.regexp_replace(core, r"\*", ".*"))
    # an EMPTY Allow/Disallow value means "no rule" per REP (the
    # classic "Disallow:" = allow-everything form) — it must contribute
    # NOTHING to matching, so permission falls through to the default
    # allow; a match-everything regex here would invert it into a
    # total block (r13 review)
    is_perm = F.col("directive").isin("allow", "disallow") & (
        F.col("pattern") != ""
    )
    rule_rows = joined.select(
        "domain",
        "agent",
        "directive",
        "pattern",
        F.when(is_perm, F.length("pattern")).alias("pattern_len"),
        F.when(is_perm, rx).alias("regex"),
        "rule_line",
    )
    # every User-agent line ALSO emits a marker row (directive
    # 'user-agent', NULL regex — it can never win a path match): a
    # group with ZERO rule lines must still be VISIBLE to group
    # selection, or its agent wrongly inherits the '*' group's blocks
    # where RFC 9309 gives it an own (empty = allow-all) group (r13
    # review #1 — the crawl-delay fix one step further)
    marker_rows = agents.select(
        F.col("g_domain").alias("domain"),
        "agent",
        F.lit("user-agent").alias("directive"),
        F.col("agent").alias("pattern"),
        F.lit(None).cast("int").alias("pattern_len"),
        F.lit(None).cast("string").alias("regex"),
        F.col("agent_line").alias("rule_line"),
    )
    return rule_rows.unionByName(marker_rows)


def filter_robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    agent: str = "*",
    keep_verdict: bool = False,
    row_id_col: str | None = None,
    broadcast_rules: bool = True,
    max_broadcast_rules: int = 2_000_000,
) -> DataFrame:
    """Keep the URLs the rule table permits for ``agent``. Group
    selection per REP, simplified to the two groups a pipeline
    queries: rules for the EXACT agent if that domain declares any,
    else the ``*`` group. Path match = the module's anchored regex;
    the LONGEST matching pattern decides; a tie prefers allow; no
    matching rule (or no robots.txt for the domain) allows. URLs
    without ``://`` carry a NULL path and fall through to
    default-allow with a NULL ``robots_rule`` (see
    ``_AFTER_SCHEME_SQL``). ``keep_verdict=True`` keeps blocked rows
    and adds ``robots_allowed``/``robots_rule`` columns instead of
    filtering.

    Join strategy: ``broadcast_rules=True`` (default) ships the rule
    table to every executor — one broadcast join + one per-URL window,
    the URL side never shuffles on a rule key — and is guarded by
    ``util.require_broadcastable``: a rule table over
    ``max_broadcast_rules`` rows raises ValueError instead of OOMing
    the driver mid-broadcast (a full-web crawl has ~10^8 domains'
    worth of rules). ``broadcast_rules=False`` takes the shuffle
    equi-join on the domain key instead — same verdicts
    (unit-pinned), linear scale-out, for rule tables past broadcast
    size.

    NOTE the guard is EAGER: it runs a ``limit(cap+1).count()`` Spark
    job when this function is CALLED (not when the result is
    consumed), and the rule-table lineage is then evaluated again by
    the real query — acceptable when rules come from a small parse,
    but if deriving them is expensive, ``rules.persist()`` before
    calling (probe and join then share one evaluation) or pass
    ``broadcast_rules=False``, which skips the probe entirely (the
    r14 ADVICE eager-probe note)."""
    from azure_etl_databricks_sql_powerbi_spark.functions.urls import (
        registered_domain,
    )
    from azure_etl_databricks_sql_powerbi_spark.util import (
        require_broadcastable,
    )

    # the clash guard covers BOTH the URL-side temp columns and the
    # rule-side columns the join introduces — either kind of collision
    # would otherwise surface as an AMBIGUOUS_REFERENCE deep in the
    # plan instead of a clean error (r13 review)
    reserved = [
        "__rid", "__dom", "__path", "__after", "__has_exact", "__hit",
        "__rk", "robots_allowed", "robots_rule",
        *_RULE_SIDE_COLS,
    ]
    clash = [c for c in reserved if c in urls.columns]
    if clash:
        raise ValueError(
            f"filter_robots_allowed uses temp columns {clash}; rename "
            "the existing column(s) first"
        )
    agent = agent.lower()
    # keep NON-permission directives of the two candidate groups too:
    # group selection must see an exact-agent group that declares only
    # e.g. Crawl-delay (REP gives that agent its own permission-empty
    # group = allow-all, NOT the '*' group's blocks — r13 review).
    # Their regex is NULL, so they can never win a path match.
    perm = rules.filter(F.col("agent").isin(agent, "*")).select(
        F.col("domain").alias(_RULE_SIDE_COLS[0]),
        F.col("agent").alias(_RULE_SIDE_COLS[1]),
        *_RULE_SIDE_COLS[2:],
    )
    # a unique per-row key: windows keyed on the URL VALUE would
    # collapse duplicate-URL rows (multiple captures of one URL — the
    # exact shape sources/cdx produces) and all NULL-url rows into one
    # survivor (r13 review). monotonically_increasing_id is stable
    # within one plan execution but NOT across stage re-attempts on a
    # nondeterministically-ordered input (the SPARK-23207 class) —
    # pass ``row_id_col`` naming a REAL unique key (capture id, file
    # offset) whenever the frame has one; the synthetic id is the
    # fallback for keyless frames (r13 review #2).
    if row_id_col is not None:
        if row_id_col not in urls.columns:
            raise ValueError(f"row_id_col {row_id_col!r} not in urls")
        u = urls.withColumn("__rid", F.col(row_id_col))
    else:
        u = urls.withColumn("__rid", F.monotonically_increasing_id())
    u = u.withColumn("__dom", registered_domain(F.col(url_col)))
    # path+query, '' -> '/' (REP matches against the path) — the shared
    # module-owned SQL, see _AFTER_SCHEME_SQL/_PATH_FROM_AFTER_SQL
    u = (
        u.withColumn("__after", F.expr(_AFTER_SCHEME_SQL.format(url=url_col)))
        .withColumn("__path", F.expr(_PATH_FROM_AFTER_SQL.format(after="__after")))
        .drop("__after")
    )
    if broadcast_rules:
        require_broadcastable(
            perm,
            max_broadcast_rules,
            "max_broadcast_rules",
            "the per-domain robots rule table",
            "pass broadcast_rules=False for the shuffle "
            "equi-join-on-domain path",
        )
        perm = F.broadcast(perm)
    j = u.join(perm, u["__dom"] == perm["__r_dom"], "left")
    # group selection: exact agent outranks '*'; if the domain has any
    # exact-agent rule, '*' rules are ignored for it
    has_exact = F.max(
        (F.col("__r_agent") == agent).cast("int")
    ).over(Window.partitionBy("__rid"))
    grp = j.withColumn("__has_exact", has_exact).filter(
        F.col("__r_agent").isNull()
        | F.when(F.col("__has_exact") == 1, F.col("__r_agent") == agent)
        .otherwise(F.col("__r_agent") == "*")
    )
    matched = grp.withColumn(
        "__hit",
        # coalesce: a NULL __path (URL without '://', see
        # _AFTER_SCHEME_SQL) makes the RLIKE NULL — treat as no-hit so
        # such rows default-allow instead of carrying tri-state
        # verdicts through the window ordering
        F.coalesce(
            F.col("regex").isNotNull()
            # column-valued pattern: the Column API's .rlike takes only
            # a literal, the SQL form takes any expression
            & F.expr("__path RLIKE regex"),
            F.lit(False),
        ),
    )
    # longest pattern wins, allow beats disallow on equal length;
    # URLs with no hit (or no rules at all) fall through to allow
    wbest = Window.partitionBy("__rid").orderBy(
        F.desc("__hit"),
        F.desc("pattern_len"),
        F.asc(F.col("directive") == "disallow"),
    )
    best = (
        matched.withColumn("__rk", F.row_number().over(wbest))
        .filter(F.col("__rk") == 1)
        .withColumn(
            "robots_allowed",
            ~F.col("__hit") | (F.col("directive") == "allow"),
        )
        .withColumn(
            "robots_rule",
            F.when(F.col("__hit"), F.concat_ws(" ", "directive", "pattern")),
        )
    )
    if keep_verdict:
        return best.select(*urls.columns, "robots_allowed", "robots_rule")
    return best.filter("robots_allowed").select(*urls.columns)


# ---------------------------------------------------------------- oracle


def duckdb_url_path_sql(url_expr: str) -> str:
    """DuckDB twin of :func:`filter_robots_allowed`'s ``__path``
    derivation, rendered from the SAME module-owned SQL the engine
    evaluates (``_AFTER_SCHEME_SQL`` / ``_PATH_FROM_AFTER_SQL`` parse
    identically in both dialects), so a future change to the path rule
    cannot silently desync the oracle. Returns a SQL expression string
    over ``url_expr``."""
    after = _AFTER_SCHEME_SQL.format(url=url_expr)
    return _PATH_FROM_AFTER_SQL.format(after=f"({after})")


def duckdb_parse_robots_sql(
    docs_relation: str = "docs",
    domain_expr: str = "domain",
    text_expr: str = "robots_txt",
) -> str:
    """DuckDB twin of :func:`parse_robots`, generated from the module's
    OWN line regex and step order (the functions/pii discipline):
    parallel-unnest line numbering, the same key/value extraction, the
    same agent-run/blank-count stanza windows, the same rule↔agent
    join, and the same pattern→regex compilation (RE2 replacement
    dialect: ``\\1`` group refs, literal ``$``; Java needs ``$``
    escaped — the one divergence, handled per side). Returns a full
    SELECT over ``docs_relation``; hand-written fixture expectations
    in ``tests/test_robots.py`` are the independent check."""
    return f"""
        WITH lines AS (
            SELECT {domain_expr} AS domain,
                   unnest(string_split_regex({text_expr}, '\\r?\\n'))
                       AS line,
                   unnest(generate_series(
                       0, len(string_split_regex({text_expr}, '\\r?\\n'))
                          - 1))
                       AS line_no
            FROM {docs_relation}
        ),
        parsed AS (
            SELECT domain, line_no,
                   lower(regexp_extract(line, '{_LINE_RE}', 1)) AS key,
                   trim(regexp_extract(line, '{_LINE_RE}', 2)) AS value,
                   trim(line) = '' AS is_blank
            FROM lines
        ),
        marked AS (
            SELECT *, key = 'user-agent' AS is_agent,
                   (key = 'user-agent') AND NOT coalesce(
                       lag(key = 'user-agent') OVER
                           (PARTITION BY domain ORDER BY line_no),
                       FALSE) AS run_start
            FROM parsed
        ),
        scoped AS (
            SELECT *,
                   sum(CASE WHEN run_start THEN 1 ELSE 0 END) OVER
                       (PARTITION BY domain ORDER BY line_no) AS run_id,
                   sum(CASE WHEN is_blank THEN 1 ELSE 0 END) OVER
                       (PARTITION BY domain ORDER BY line_no)
                       AS blanks_before
            FROM marked
        ),
        agents AS (
            SELECT domain AS g_domain, run_id AS g_run,
                   lower(value) AS agent, blanks_before AS g_blanks,
                   line_no AS agent_line
            FROM scoped WHERE is_agent
        ),
        rules AS (
            SELECT domain, run_id AS r_run, blanks_before AS r_blanks,
                   key AS directive, value AS pattern,
                   line_no AS rule_line
            FROM scoped
            WHERE NOT is_agent AND NOT is_blank AND key <> ''
              AND run_id > 0
        ),
        joined AS (
            SELECT r.domain, a.agent, r.directive, r.pattern,
                   r.rule_line
            FROM rules r JOIN agents a
              ON r.domain = a.g_domain AND r.r_run = a.g_run
             AND r.r_blanks = a.g_blanks
        )
        SELECT domain, agent, directive, pattern,
               CASE WHEN directive IN ('allow', 'disallow')
                         AND pattern <> ''
                    THEN CAST(length(pattern) AS INTEGER) END
                   AS pattern_len,
               CASE WHEN directive IN ('allow', 'disallow')
                         AND pattern <> ''
                    THEN '^' || replace(
                             regexp_replace(
                                 regexp_replace(pattern,
                                     '([.^+?()\\[\\]{{}}|\\\\$])',
                                     '\\\\\\1', 'g'),
                                 '\\\\\\$$', '$'),
                             '*', '.*') END
                   AS regex,
               rule_line
        FROM joined
        UNION ALL
        SELECT g_domain AS domain, agent, 'user-agent' AS directive,
               agent AS pattern, CAST(NULL AS INTEGER) AS pattern_len,
               CAST(NULL AS VARCHAR) AS regex, agent_line AS rule_line
        FROM agents
    """
