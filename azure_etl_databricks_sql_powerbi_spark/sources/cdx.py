"""CDX(J) crawl-index source — the sidecar that makes WARC usable at
100 TB. Common Crawl ships a per-crawl URL index (CDXJ: one line per
capture, ``<urlkey> <timestamp14> <json>``) so a curation pipeline can
pick WHICH records to read and fetch them by byte range instead of
scanning every shard; this module parses the index and turns a
selection into a per-shard fetch plan. Composes with ``sources/warc``:
``read_cdxj → filters/dedup → cdx_fetch_plan → (ranged fetch) →
iter_warc_records``.

Spark-first shape: the whole parse is ONE whole-stage-codegen
projection — a 3-group regex split (``(\\S+) (\\S+) (.*)``, valid and
equivalent in Java regex and RE2) plus a single ``from_json`` per line
(never one ``get_json_object`` per field, which would re-parse the
JSON N times); malformed lines surface as NULL columns instead of
killing the scan (from_json PERMISSIVE + try-cast semantics). The
fetch plan is one shuffle keyed by shard filename, offset-sorted
ranges per shard — tasks then read each shard sequentially
(monotonically increasing offsets), one ranged read per record.

Oracle/twin: ``duckdb_parse_cdxj_sql`` replays the same parse from the
module's own regex + field list via DuckDB's native JSON extraction —
cell-for-cell checkable without a WARC byte anywhere.

Reference surface shape: the reference engine's REST source pages
through a remote index and fetches payloads (`rest_api.py`); CDX is
the batch-archive analogue — index first, payload second.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# One pattern, Java ≡ RE2: urlkey, 14-digit-ish timestamp, JSON rest.
CDXJ_LINE_RE = r"^(\S+) (\S+) (.*)$"

# The JSON fields a curation pipeline consumes, in output order.
# (string-typed in the index; numeric casts applied after extraction so
# a malformed value lands NULL, never an error).
CDX_FIELDS = (
    "url",
    "mime",
    "status",
    "digest",
    "length",
    "offset",
    "filename",
    "languages",
    "encoding",
)

_JSON_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType()) for f in CDX_FIELDS]
)


def parse_cdxj(df: DataFrame, line_col: str = "value") -> DataFrame:
    """CDXJ lines → typed columns: ``urlkey``, ``ts`` (timestamp from
    the 14-digit capture time), the :data:`CDX_FIELDS` (``status`` int,
    ``length``/``offset`` long, rest string). One codegen projection:
    regex 3-split + ONE ``from_json``. Lines that do not match the
    shape (or carry broken JSON) keep NULLs in the derived columns —
    a malformed index line must never kill a 100 TB scan."""
    line = F.col(line_col)
    urlkey = F.regexp_extract(line, CDXJ_LINE_RE, 1)
    ts14 = F.regexp_extract(line, CDXJ_LINE_RE, 2)
    js = F.regexp_extract(line, CDXJ_LINE_RE, 3)
    # two projections: the struct is aliased once and field-extracted in
    # a SECOND select — written in one select, CollapseProject inlines a
    # from_json copy per field into the optimized plan (9 parses per
    # line before codegen CSE gets a say); a non-cheap alias referenced
    # 9 times blocks the collapse, pinning ONE JsonToStructs
    # (tests/test_cdx.py::test_parse_plan_is_single_jvm_projection)
    staged = df.select(
        F.when(urlkey != "", urlkey).alias("urlkey"),
        F.try_to_timestamp(ts14, F.lit("yyyyMMddHHmmss")).alias("ts"),
        F.from_json(js, _JSON_SCHEMA).alias("__rec"),
    )
    rec = F.col("__rec")
    return staged.select(
        "urlkey",
        "ts",
        rec["url"].alias("url"),
        rec["mime"].alias("mime"),
        rec["status"].cast("int").alias("status"),
        rec["digest"].alias("digest"),
        rec["length"].cast("long").alias("length"),
        rec["offset"].cast("long").alias("offset"),
        rec["filename"].alias("filename"),
        rec["languages"].alias("languages"),
        rec["encoding"].alias("encoding"),
    )


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ shards (plain or ``.gz`` — Spark's text source decompresses
    by extension) → parsed index rows. Index shards split/parallelize
    like any text source; the parse adds no shuffle."""
    return parse_cdxj(spark.read.text(path), "value")


def select_captures(
    cdx: DataFrame,
    statuses: tuple[int, ...] = (200,),
    mime_contains: str | None = "html",
    dedup_by_digest: bool = True,
) -> DataFrame:
    """The standard curation pre-selection over a parsed index: keep
    the wanted HTTP statuses and MIME family, then (optionally) ONE
    capture per content digest — Common Crawl stores every re-crawl of
    identical content, and fetching byte-identical payloads is pure
    waste. Deterministic winner: earliest (ts, urlkey, filename,
    offset). Malformed lines never reach the output: their NULL status
    fails the status filter (they are not fetchable — no offset); the
    NULL-digest keep-rule below only shields SELECTED rows that lack a
    digest from being collapsed into one "NULL-digest group" by the
    dedup window (r13 review: an earlier draft of this docstring
    claimed malformed rows fail open — they do not, inspect them on
    the parsed frame BEFORE selection)."""
    out = cdx.filter(F.col("status").isin(*statuses))
    if mime_contains is not None:
        out = out.filter(F.lower("mime").contains(mime_contains.lower()))
    if not dedup_by_digest:
        return out
    from pyspark.sql import Window

    w = (
        Window.partitionBy("digest")
        .orderBy(
            F.col("ts").asc_nulls_last(),
            F.col("urlkey").asc(),
            F.col("filename").asc(),
            F.col("offset").asc(),
        )
    )
    ranked = out.withColumn("__rk", F.row_number().over(w))
    return (
        ranked.filter(F.col("digest").isNull() | (F.col("__rk") == 1))
        .drop("__rk")
    )


def cdx_fetch_plan(cdx: DataFrame) -> DataFrame:
    """Selected captures → one row per WARC shard with its byte ranges
    OFFSET-SORTED (``ranges`` array of (offset, length) structs) plus
    ``n_records`` / ``total_bytes`` — the shape a ranged-fetch stage
    consumes: one task per shard, monotone seeks, no full-shard read.
    ONE shuffle (groupBy filename); the sort is per-group via
    array_sort on the collected ranges (offsets are unique within a
    shard, so the struct sort is total)."""
    ranges = F.array_sort(
        F.collect_list(F.struct(F.col("offset"), F.col("length")))
    )
    return (
        cdx.filter(
            F.col("filename").isNotNull()
            # negatives are lying index lines: a negative offset would
            # raise in the ranged reader's seek, a negative length
            # becomes read(rest-of-shard) (r13 review — the reader
            # ALSO guards per-range; both layers are cheap)
            & (F.col("offset") >= 0)
            & (F.col("length") > 0)
        )
        .groupBy("filename")
        .agg(
            ranges.alias("ranges"),
            F.count(F.lit(1)).alias("n_records"),
            F.sum("length").alias("total_bytes"),
        )
    )


# ---------------------------------------------------------------- oracle


def duckdb_parse_cdxj_sql(line_expr: str = "value") -> str:
    """DuckDB twin of :func:`parse_cdxj`, built from the module's OWN
    regex and field list (the functions/pii discipline): same 3-group
    split, DuckDB-native JSON extraction, same casts (``TRY_CAST`` ≡
    Spark's null-on-malformed cast), ``strptime`` for the capture
    time. Returns a projection list for a SELECT."""
    js = f"regexp_extract({line_expr}, '{CDXJ_LINE_RE}', 3)"
    parts = [
        f"nullif(regexp_extract({line_expr}, '{CDXJ_LINE_RE}', 1), '')"
        " AS urlkey",
        f"try_strptime(nullif(regexp_extract({line_expr},"
        f" '{CDXJ_LINE_RE}', 2), ''), '%Y%m%d%H%M%S') AS ts",
    ]
    casts = {"status": "INTEGER", "length": "BIGINT", "offset": "BIGINT"}
    for f_ in CDX_FIELDS:
        ex = f"json_extract_string(try_cast({js} AS JSON), '$.{f_}')"
        if f_ in casts:
            ex = f"TRY_CAST({ex} AS {casts[f_]})"
        parts.append(f'{ex} AS "{f_}"')
    return ",\n       ".join(parts)


# ------------------------------------------------------- incremental crawls


def latest_captures(cdx: DataFrame) -> DataFrame:
    """One row per ``urlkey``: the LATEST capture (``ts`` desc;
    deterministic ``filename``/``offset`` asc tiebreak for re-crawls in
    the same second). Rows with a NULL ``urlkey`` are dropped — an
    unkeyed capture cannot be compared across crawls (malformed index
    lines land here; inspect them on the parsed frame, the
    ``select_captures`` rule). ONE shuffle on urlkey."""
    from pyspark.sql import Window

    w = Window.partitionBy("urlkey").orderBy(
        F.col("ts").desc_nulls_last(),
        F.col("filename").asc_nulls_last(),
        F.col("offset").asc_nulls_last(),
    )
    return (
        cdx.filter(F.col("urlkey").isNotNull())
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def crawl_delta(old_cdx: DataFrame, new_cdx: DataFrame) -> DataFrame:
    """URL-level diff between two crawl snapshots: ``(urlkey, change)``
    with change in {'added', 'removed', 'changed'} — the crawl-ops
    question ("what moved between crawls?") answered from the INDEX
    alone, no payload byte read. Each side reduces to its latest
    capture per urlkey, then ``operators/diff.table_diff`` compares the
    index's content digest — so at 100 TB the join shuffle carries
    (urlkey, 32-byte digest), never a row payload. Two captures both
    missing a digest compare equal (the diff's NULL sentinel):
    digest-less URLs only surface on presence changes, which is the
    most an index can honestly say about them."""
    from azure_etl_databricks_sql_powerbi_spark.operators.diff import (
        table_diff,
    )

    o = latest_captures(old_cdx).select("urlkey", "digest")
    n = latest_captures(new_cdx).select("urlkey", "digest")
    return table_diff(o, n, keys=["urlkey"])


def novel_digests(old_cdx: DataFrame, new_cdx: DataFrame) -> DataFrame:
    """The incremental-ingestion feed: the new crawl's latest captures
    whose content digest appears NOWHERE in the old index — "process
    only the bytes this crawl actually added", the cross-crawl
    extension of ``select_captures``' within-crawl digest dedup. A URL
    whose content merely moved (same digest, new urlkey) is correctly
    absent; a new capture WITHOUT a digest is kept (a NULL anti-join
    key never matches — unknown content must fail open into
    processing, the reader's dedup still guards downstream). Shuffle
    anti-join on digest: both sides are crawl-scale, so neither
    broadcasts; composes with ``cdx_fetch_plan`` for the ranged fetch
    of exactly these captures."""
    old_digests = (
        old_cdx.select("digest").filter(F.col("digest").isNotNull()).distinct()
    )
    return latest_captures(new_cdx).join(
        old_digests, on="digest", how="left_anti"
    )
