"""PII scrubbing for training-data curation (north-star extension; the
reference engine at /root/reference has no text surface at all — this
fills the curation step a 100 TB pretraining pipeline runs between
quality filtering and packing: redact personal identifiers before the
corpus is frozen, the BigScience/CCNet-style regex pass).

Everything is a Column expression over ``pyspark.sql.functions``
(``regexp_replace`` / ``regexp_extract_all``) — JVM-side, whole-stage-
codegen'd, zero Python in the hot path, runs at scan speed with full
column pruning. No UDF fallback is needed.

Pattern dialect contract: every pattern below is valid AND equivalent in
Java's regex (Spark) and RE2 (DuckDB) — no lookaround, no backreferences
— so counting/redaction is oracle-checkable cell-for-cell
(tests/test_pii.py pins a DuckDB twin on planted rows). Patterns are
deliberately conservative (precision over recall): a false redaction
destroys training signal silently, while residual PII is caught by the
audit count (`pii_counts`) reviewers act on.

Order matters and is part of the contract: kinds are applied in
``PII_PATTERNS`` insertion order, so longer/more-specific matches
(credit-card digit runs) fire before subsumable ones (phone).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# kind -> (pattern, replacement token). Insertion order = application order.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — the narrow classic; no quoted-locals/IP-literals
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    # card shapes, precision-first (r11 ADVICE): every form requires a
    # real issuer prefix — [3-6] (Amex/JCB/Visa/MC-5x/Discover) or the
    # Mastercard 2-series BIN band 22-27 (issued since 2017) — and the
    # separated forms must use ONE uniform separator in 4-4-4-N groups.
    # The old \d{4}[ \-]?... shape redacted 13-digit epoch-millis
    # timestamps, year runs like '2021 2022 2023 2024' (20xx stays
    # excluded: 2-series requires the SECOND digit in 2-7), and
    # mixed-separator ids as [CARD], destroying training signal
    # silently. Alternation only — no lookaround or backrefs,
    # Java ≡ RE2.
    "card": (
        r"\b(?:(?:2[2-7]\d{2}|[3-6]\d{3}) \d{4} \d{4} \d{1,4}"
        r"|(?:2[2-7]\d{2}|[3-6]\d{3})-\d{4}-\d{4}-\d{1,4}"
        r"|(?:2[2-7]\d{11,14}|[3-6]\d{12,15}))\b"
    ),
    # US SSN shape NNN-NN-NNNN
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # international-ish phone: +CC then 8-14 digits with optional
    # space/dash/paren separators; the leading + keeps precision high
    "phone": r"\+\d{1,3}[ \-]?\(?\d{1,4}\)?(?:[ \-]?\d{2,4}){2,4}",
    # dotted-quad IPv4 (also matches out-of-range quads like 999.…;
    # redaction-safe: over-matching an almost-IP is acceptable). Named
    # "ip", not "ipv4": replacement tokens must stay digit-free so the
    # idempotency invariant holds by construction, not by accident.
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def _selected(kinds):
    """`kinds is None` means all patterns; an explicit empty tuple means
    NONE (a truthiness test here would silently scrub everything when a
    programmatic filter comes out empty)."""
    return tuple(PII_PATTERNS) if kinds is None else tuple(kinds)


def _total_expr(text_col, kinds):
    """Sum of per-kind match counts — the ONE definition both pii_counts
    and scrub_documents report, so the audit metric cannot fork."""
    total = F.lit(0)
    for k in kinds:
        total = total + pii_match_count(text_col, k)
    return total.cast("long")


def _replacement(kind: str) -> str:
    return f"[{kind.upper()}]"


def duckdb_count_sql(text_expr: str = "text", kinds=None) -> str:
    """Module-owned DuckDB twin of ``_total_expr`` — the ONE definition
    every oracle/test uses (the NEGATIVES_SQL module-owned-twin
    discipline), with the SAME NULL semantics as the Spark side:
    ``len(regexp_extract_all(NULL, ...))`` is NULL in DuckDB, so each
    term is COALESCEd to 0 exactly as ``pii_match_count`` does."""
    kinds = _selected(kinds)
    terms = " + ".join(
        f"COALESCE(len(regexp_extract_all({text_expr}, "
        f"'{PII_PATTERNS[k]}')), 0)"
        for k in kinds
    )
    return f"CAST({terms or '0'} AS BIGINT)"


def duckdb_kind_count_sql(kind: str, text_expr: str = "text") -> str:
    """DuckDB twin of ``pii_match_count`` for one kind (NULL-coalesced)."""
    return (
        f"CAST(COALESCE(len(regexp_extract_all({text_expr}, "
        f"'{PII_PATTERNS[kind]}')), 0) AS BIGINT)"
    )


def duckdb_redact_sql(text_expr: str = "text", kinds=None) -> str:
    """DuckDB twin of ``redact_pii``: the same chained global
    regexp_replace in insertion order (NULL text stays NULL — both
    engines' regexp_replace null-propagates)."""
    out = text_expr
    for k in _selected(kinds):
        out = (
            f"regexp_replace({out}, '{PII_PATTERNS[k]}', "
            f"'{_replacement(k)}', 'g')"
        )
    return out


def redact_pii(
    c: Column | str, kinds: tuple[str, ...] | None = None
) -> Column:
    """Text with every PII match replaced by its ``[KIND]`` token — one
    chained ``regexp_replace`` per kind, a single codegen stage.
    Idempotent: replacement tokens contain no digits or ``@`` (enforced
    by a unit test over PII_PATTERNS keys), so no pattern can match the
    output of another (unit-pinned). ``kinds=None`` selects all patterns;
    an explicit empty tuple is a no-op."""
    out = F.col(c) if isinstance(c, str) else c
    for kind in _selected(kinds):
        out = F.regexp_replace(out, PII_PATTERNS[kind], _replacement(kind))
    return out


def pii_match_count(c: Column | str, kind: str) -> Column:
    """Number of matches of one PII kind in the column (audit metric).
    NULL text counts as 0 matches — the coalesce keeps the metric
    config-independent (size(NULL) is NULL under ANSI but -1 with ANSI
    off; the dedup/boilerplate.py coverage-metric lesson) and matches a
    DuckDB twin written with the same COALESCE."""
    c = F.col(c) if isinstance(c, str) else c
    return F.coalesce(
        F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[kind]), F.lit(0))),
        F.lit(0),
    )


def pii_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """Per-document audit row: (id, <kind>_n ... , pii_total). Counts are
    computed BEFORE redaction (insertion order doesn't matter for
    counting — kinds may overlap on pathological text, which the audit
    deliberately surfaces rather than hides). One scan, one projection,
    no shuffle; corpus-level totals are a follow-up agg the caller owns."""
    kinds = _selected(kinds)
    cols = [
        pii_match_count(text_col, k).cast("long").alias(f"{k}_n") for k in kinds
    ]
    return df.select(
        F.col(id_col), *cols, _total_expr(text_col, kinds).alias("pii_total")
    )


def scrub_documents(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """The pipeline form: same frame with ``text_col`` redacted in place
    plus a ``pii_total`` audit column (matches found pre-redaction), so a
    curation plan can both scrub and quarantine-by-threshold in one pass."""
    kinds = _selected(kinds)
    return df.withColumn("pii_total", _total_expr(text_col, kinds)).withColumn(
        text_col, redact_pii(text_col, kinds)
    )
