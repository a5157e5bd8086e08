"""URL / domain functions for corpus provenance filtering (north-star
extension; the reference engine has no text surface — this is the
web-crawl curation step that runs before content filters: extract each
document's host and registered domain, drop blocklisted domains, and
report per-domain concentration).

All Column expressions over ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd, zero UDF. Host extraction deliberately uses a
regex (not ``F.parse_url``) so the SAME pattern runs in DuckDB's RE2 —
the functions/pii.py dialect contract: no lookaround, no backreferences,
every result oracle-checkable cell-for-cell (tests/test_urls.py pins a
DuckDB twin for host, registered domain, and the blocklist verdict).

Registered-domain semantics: last two host labels, or last three when
the two-label suffix is a known multi-part public suffix (co.uk,
com.au, …). The embedded suffix set is a small, documented subset of the
Mozilla Public Suffix List — the zero-dependency default, enough for
provenance bucketing. Deployments with exotic ccTLD needs load a full
PSL snapshot as a 1-column table and use :func:`registered_domain_psl`
(r12): longest-match via ``max_suffix_labels`` broadcast hash joins,
zero shuffles, zero UDFs — same 100 TB posture as the embedded path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://[userinfo@]HOST[:port][/|?|#...] — capture group 1 = host.
# Java-regex AND RE2 valid/equivalent (character classes + one group).
HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/@?#]*@)?([^/:?#]+)"
# bracketed IPv6 literal host: scheme://[userinfo@][ADDR]... — without
# this, HOST_RE would stop at the first ':' inside the address and
# report a truncated garbage host like "[2001"
HOST6_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/@?#]*@)?\[([^\]/]+)\]"

# Two-label suffixes under which the REGISTERED domain has three labels.
# Subset of the Public Suffix List (documented limitation, see module
# docstring); sorted for deterministic plan text.
MULTI_PART_SUFFIXES: tuple[str, ...] = (
    "ac.uk",
    "co.in",
    "co.jp",
    "co.kr",
    "co.nz",
    "co.uk",
    "co.za",
    "com.au",
    "com.br",
    "com.cn",
    "com.mx",
    "com.sg",
    "com.tr",
    "gov.uk",
    "net.au",
    "or.jp",
    "org.au",
    "org.uk",
)


def url_host(c: Column | str) -> Column:
    """Lower-cased host of an absolute URL; NULL for text that is not an
    absolute URL (no scheme). Ports, userinfo, paths, queries, and
    fragments are stripped; a trailing root-label dot is normalized away
    ("example.com." ≡ "example.com" per DNS — otherwise a single dot
    would bypass any domain blocklist); bracketed IPv6 literals return
    the bare address."""
    c = F.col(c) if isinstance(c, str) else c
    host6 = F.lower(F.regexp_extract(c, HOST6_RE, 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(c, HOST_RE, 1)), r"\.+$", ""
    )
    return (
        F.when(host6 != "", host6)
        .when(host != "", host)
        .otherwise(F.lit(None).cast("string"))
    )


def _registered_domain_of_host(host: Column) -> Column:
    """Label arithmetic over an ALREADY-DERIVED host. ``host`` must be a
    cheap reference (attribute or lambda variable) — the CASE below
    references it ~8×, so handing it a computed expression re-creates
    the multi-reference blowup :func:`registered_domain` exists to
    avoid."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    is_ip = host.rlike(
        r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"
    ) | host.contains(":")
    return (
        F.when(host.isNull(), None)
        .when(is_ip | (n <= 2), host)
        .when(last2.isin(*MULTI_PART_SUFFIXES), last3)
        .otherwise(last2)
    )


def registered_domain(c: Column | str) -> Column:
    """Registered (pay-level) domain of an absolute URL: last two host
    labels, or three under a known multi-part suffix. IPv4 and IPv6
    literal hosts pass through whole (an address is provenance of its
    own — IPv6 is recognized by the ':' no hostname may contain); NULL
    propagates from non-URLs.

    The host derivation (a 4-regex CASE) appears exactly ONCE in the
    returned expression tree: the label arithmetic references it ~8×, so
    a naive composition inlines ~16 ``regexp_extract`` copies into one
    projection and the generated ``processNext()`` blows Janino's 64 KB
    method limit — the stage then silently runs INTERPRETED (the r14
    judge finding on ``url_provenance_docs``; 3× ``ERROR CodeGenerator``
    in executor stderr, correctness unaffected). The fix is the
    functions/links.py single-reference discipline: run the consumer
    inside a ``transform`` lambda over a 1-element array — lambda
    variables are cheap references and lambda bodies are opaque to
    projection collapse, so the host regexes execute once per row and
    the enclosing stage compiles (pinned by
    tests/test_urls.py::test_registered_domain_projection_compiles)."""
    return F.element_at(
        F.transform(F.array(url_host(c)), _registered_domain_of_host), 1
    )


def filter_blocklisted_domains(
    df: DataFrame,
    url_col: str,
    blocked: DataFrame | Sequence[str],
    keep_unparseable: bool = False,
    keep_domain_col: str | None = None,
) -> DataFrame:
    """Rows whose registered domain is NOT on the blocklist.

    ``blocked`` is either a 1-column DataFrame of domains (scale path —
    a multi-million-row blocklist anti-joins on the domain key; Spark/AQE
    broadcasts it when it is small) or an in-memory sequence (convenience
    path, compiled into the plan as a literal IN-set — keep it small).
    Documents without a parseable absolute URL are dropped by default
    (provenance-unknown is blocklist-unknown); ``keep_unparseable=True``
    retains them. ``keep_domain_col`` names an output column carrying
    the already-extracted registered domain, so a downstream consumer
    (``domain_stats(domain_col=...)``) never re-runs the regex chain —
    at corpus scale the extraction is the dominant per-row cost."""
    dom = registered_domain(url_col)
    if isinstance(blocked, DataFrame):
        tmp = keep_domain_col or "__dom"
        if tmp in df.columns:
            # withColumn would silently REPLACE the clashing column (the
            # functions/ensemble.py collision discipline) — refuse loudly
            raise ValueError(
                f"filter_blocklisted_domains uses '{tmp}' as a temp "
                f"column; rename the existing '{tmp}' column first"
            )
        key = blocked.columns[0]
        # left_anti is duplicate-insensitive on the build side: no
        # distinct() — it would add a full shuffle over a blocklist that
        # can be millions of rows. Domains compare lowercase on BOTH
        # sides (url_host lowercases the probe side).
        out = df.withColumn(tmp, dom).join(
            blocked.select(F.lower(F.col(key)).alias(tmp)),
            on=tmp,
            how="left_anti",
        )
        if not keep_unparseable:
            out = out.filter(F.col(tmp).isNotNull())
        return out if keep_domain_col else out.drop(tmp)
    blocked = [b.lower() for b in blocked]

    def _verdict(d: Column) -> Column:
        cond = ~d.isin(*blocked) if blocked else F.lit(True)
        if keep_unparseable:
            return d.isNull() | cond
        return d.isNotNull() & cond

    # evaluate the domain extraction ONCE per row: the verdict
    # references it 2x (null guard + isin), each Column-level reference
    # is a full copy of the regex chain, and a plain aliased projection
    # does NOT help — filter pushdown re-inlines project aliases into
    # the pushed predicate (PushPredicateThroughNonJoin; the r15 review
    # verified the re-inlined plan empirically). The transform-lambda
    # barrier is the same single-reference discipline registered_domain
    # uses internally.
    out = df.filter(F.element_at(F.transform(F.array(dom), _verdict), 1))
    if keep_domain_col:
        if keep_domain_col in df.columns:
            raise ValueError(
                f"filter_blocklisted_domains uses '{keep_domain_col}' as "
                f"a temp column; rename the existing column first"
            )
        out = out.withColumn(keep_domain_col, dom)
    return out


def domain_stats(
    df: DataFrame,
    url_col: str,
    round_to: int | None = 6,
    domain_col: str | None = None,
) -> DataFrame:
    """Per-registered-domain concentration: (domain, n_docs, share),
    share of PARSEABLE documents, descending — the provenance data card
    a mixing/cap policy reads (one aggregate + one 1-row total broadcast,
    the domain_mix_allocation shape). Unparseable URLs are reported as
    the NULL-domain row so coverage loss is never silent. ``round_to``
    display-rounds the share; pass ``None`` for the exact IEEE quotient
    (the hash-compare contract: n/total double division is bit-identical
    across engines, ROUND of it is not — the r11 half-cent lesson)."""
    dom = (
        F.col(domain_col) if domain_col else registered_domain(url_col)
    )
    counts = df.select(dom.alias("domain")).groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    total = counts.filter(F.col("domain").isNotNull()).agg(
        F.sum("n_docs").alias("__tot")
    )
    share = F.col("n_docs") / F.col("__tot")
    if round_to is not None:
        share = F.round(share, round_to)
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "domain",
            "n_docs",
            F.when(F.col("domain").isNotNull(), share).alias("share"),
        )
        .orderBy(F.col("n_docs").desc(), F.col("domain").asc_nulls_last())
    )


def duckdb_host_sql(url_expr: str) -> str:
    """DuckDB twin of :func:`url_host`, built from the module's OWN
    regexes (the functions/pii.py module-owned-twin discipline: the
    oracle can never desync from the operator). Returns a SQL expression
    string over ``url_expr``."""
    return (
        f"coalesce("
        f"nullif(lower(regexp_extract({url_expr}, '{HOST6_RE}', 1)), ''), "
        f"nullif(regexp_replace("
        f"lower(regexp_extract({url_expr}, '{HOST_RE}', 1)), '\\.+$', ''), ''))"
    )


def duckdb_registered_domain_sql(host_expr: str) -> str:
    """DuckDB twin of :func:`registered_domain` over an already-extracted
    ``host_expr`` (compose with :func:`duckdb_host_sql`), replaying the
    same label arithmetic and the same MULTI_PART_SUFFIXES set."""
    suffixes = ", ".join(f"'{s}'" for s in MULTI_PART_SUFFIXES)
    return f"""CASE
        WHEN {host_expr} IS NULL THEN NULL
        WHEN regexp_matches({host_expr},
                 '^\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}$')
             OR contains({host_expr}, ':')
             OR len(string_split({host_expr}, '.')) <= 2 THEN {host_expr}
        WHEN array_to_string(string_split({host_expr}, '.')[-2:], '.')
             IN ({suffixes})
          THEN array_to_string(string_split({host_expr}, '.')[-3:], '.')
        ELSE array_to_string(string_split({host_expr}, '.')[-2:], '.')
    END"""


def registered_domain_psl(
    df: DataFrame,
    url_col: str,
    suffixes: DataFrame,
    out_col: str = "domain",
    max_suffix_labels: int = 4,
) -> DataFrame:
    """Registered domain via a FULL public-suffix table (the scale path
    the embedded :data:`MULTI_PART_SUFFIXES` subset approximates):
    longest-match against a 1-column DataFrame of suffixes (a Public
    Suffix List snapshot — ~10k rows, broadcast), then one more label.

    Plan shape: ``max_suffix_labels`` broadcast hash joins (longest
    candidate first), ZERO shuffles — each join probes the tiny suffix
    relation with the host's last-k-label string; ``coalesce`` picks the
    longest match, and unlisted TLDs fall back to PSL's implicit
    one-label-suffix rule (registered = last two labels), identical to
    :func:`registered_domain`'s default branch. IP hosts (v4 dotted quad
    or anything with ':') and single-label hosts pass through whole;
    NULL propagates from non-URLs. Wildcard/exception PSL rules are not
    modeled (documented limitation — the snapshot should be
    pre-expanded)."""
    reserved = ["__host", "__skip", out_col] + [
        c
        for k in range(1, max_suffix_labels + 1)
        for c in (f"__cand{k}", f"__sfx{k}")
    ]
    clash = [c for c in reserved if c in df.columns]
    if clash:
        # withColumn would silently REPLACE (and the final drop would
        # DELETE) clashing caller columns — refuse loudly, the
        # filter_blocklisted_domains/'__dom' discipline
        raise ValueError(
            f"registered_domain_psl uses temp columns {clash}; rename "
            "the existing column(s) first"
        )
    key = suffixes.columns[0]
    # ONE lowercase+distinct over the suffix table, re-aliased per k —
    # not one distinct aggregation per join (r12 review)
    sfx_base = suffixes.select(F.lower(F.col(key)).alias("__sfx")).distinct()
    host = url_host(url_col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    is_ip = host.rlike(
        r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"
    ) | host.contains(":")
    out = df.withColumn("__host", host).withColumn(
        "__skip", host.isNull() | is_ip | (n <= 1)
    )
    # candidate last-k-label strings, longest first; NULL when the host
    # has <= k labels (a suffix must be a PROPER suffix of the host)
    for k in range(max_suffix_labels, 0, -1):
        cand = F.when(
            ~F.col("__skip") & (F.size(F.split("__host", r"\.")) > k),
            F.array_join(F.slice(F.split("__host", r"\."), -k, k), "."),
        )
        sfx = F.broadcast(sfx_base.withColumnRenamed("__sfx", f"__sfx{k}"))
        out = out.withColumn(f"__cand{k}", cand).join(
            sfx, F.col(f"__cand{k}") == F.col(f"__sfx{k}"), "left"
        )
    hl = F.split("__host", r"\.")
    dom = F.when(F.col("__skip"), F.col("__host"))
    for k in range(max_suffix_labels, 0, -1):
        dom = dom.when(
            F.col(f"__sfx{k}").isNotNull(),
            F.array_join(F.slice(hl, -(k + 1), k + 1), "."),
        )
    # unlisted TLD: implicit one-label suffix -> last two labels
    dom = dom.otherwise(F.array_join(F.slice(hl, -2, 2), "."))
    drop = ["__host", "__skip"] + [
        c for k in range(1, max_suffix_labels + 1) for c in (f"__cand{k}", f"__sfx{k}")
    ]
    return out.withColumn(out_col, dom).drop(*drop)


def duckdb_registered_domain_psl_sql(
    host_expr: str,
    suffixes: "list[str] | tuple[str, ...]",
    max_suffix_labels: int = 4,
) -> str:
    """DuckDB twin of :func:`registered_domain_psl` over an
    already-extracted ``host_expr`` (compose with
    :func:`duckdb_host_sql`), replaying the same documented semantics
    independently of the join plan: longest proper-suffix match against
    the (lowercased, deduped) suffix snapshot, then one more label;
    skip-through for NULL / IPv4 / ':' / single-label hosts; implicit
    one-label-suffix fallback (last two labels). The suffix list is
    inlined as literals, so the oracle needs no extra table."""
    sfx = sorted({s.lower() for s in suffixes})
    in_list = ", ".join("'" + s.replace("'", "''") + "'" for s in sfx)
    parts = f"string_split({host_expr}, '.')"
    branches = "\n".join(
        f"        WHEN len({parts}) > {k} AND "
        f"array_to_string({parts}[-{k}:], '.') IN ({in_list})\n"
        f"          THEN array_to_string({parts}[-{k + 1}:], '.')"
        for k in range(max_suffix_labels, 0, -1)
    )
    return f"""CASE
        WHEN {host_expr} IS NULL THEN NULL
        WHEN regexp_matches({host_expr},
                 '^\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}$')
             OR contains({host_expr}, ':')
             OR len({parts}) <= 1 THEN {host_expr}
{branches}
        ELSE array_to_string({parts}[-2:], '.')
    END"""
