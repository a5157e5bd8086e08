"""WARC (Web ARChive, ISO 28500) source — the format a web-crawl
curation pipeline actually starts from (Common Crawl ships WARC), so
the engine's ingestion story is complete end-to-end:
``read_warc → functions/html.html_to_text → functions/normalize`` →
dedup/quality tiers.

Pure stdlib (``zlib``) — no warcio/fastwarc dependency. Two layers:

1. **Record parser** (:func:`iter_warc_records`) — a STREAMING
   generator over an iterator of byte chunks: it buffers only until the
   current record completes, so memory is bounded by the largest
   RECORD, never the file. Gzip handling matches the two real layouts:
   *member-per-record* gzip (the Common Crawl convention — each record
   its own gzip member, concatenated) and whole-file gzip, both via a
   ``zlib.decompressobj(wbits=31)`` loop fed fixed-size windows with
   ``max_length``-bounded output; plain WARC streams in the same
   window size. Malformed data degrades conservatively: a record whose
   declared ``Content-Length`` overruns the data yields nothing
   further (a truncated shard loses its tail record, not the job), and
   a garbled mid-shard header skips that record and resyncs on the
   next ``WARC/`` instead of discarding the rest of the shard.
2. **Spark connector** (:func:`read_warc`) — ``binaryFile`` scan →
   ``mapInPandas``, one streaming parse per file per batch. The closure
   bootstraps ``sys.path`` from a captured package-parent before
   importing this module (the ``multimodal/ops.py`` pattern — executors
   unpickle by module name, and the driver sim from a foreign cwd is
   the regression gate for it). Payload text is decoded
   ``utf-8/replace`` at parse time: this engine's WARC surface is the
   TEXT curation path; binary payloads (images in WARC) belong to the
   multimodal tier and a dedicated reader.

100 TB posture: one task per WARC shard (Common Crawl shards are ~1 GB
gzip — under Spark's 2 GB ``binaryFile`` ceiling), decompression and
record parsing stream in ~1 MiB windows with amortized-O(n) buffer
compaction, rows leave the task in 10k-record DataFrame slices, and
the output is a plain DataFrame that partitions/filters like any other
source. Measured anchor (``tools/warc_scale_smoke.py``, 20k records,
one shard = one task, warm session): ~12k records/s parse, ~8k
records/s with the full HTML→canonical-text extraction — a 100k-record
Common Crawl shard is ~10 s of single-task work, and shards
parallelize across the scan. ``http_only=True``
prunes non-response records (request/metadata/warcinfo) inside the
generator, before any row materializes.

Reference surface shape: the reference engine's REST source
(`rest_api.py`) is also a "fetch remote payloads into rows" connector;
WARC is its batch-archive analogue on the curation side.
"""

from __future__ import annotations

import zlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

GZIP_MAGIC = b"\x1f\x8b"

# Spark schema of read_warc's output.
WARC_SCHEMA = (
    "path string, warc_type string, record_id string, target_uri string, "
    "content_type string, http_content_type string, http_status int, "
    "body_text string, n_bytes long"
)


# Bounded feed/output unit for the streaming decompressor and the
# record buffer's compaction threshold. 1 MiB keeps per-task transient
# memory flat regardless of shard size.
_CHUNK = 1 << 20


def _iter_decompressed(
    data: bytes, chunk_size: int = _CHUNK
) -> Iterator[bytes]:
    """Yield decompressed chunks of AT MOST ``chunk_size`` bytes —
    TRUE streaming for every layout (r12 review: the first cut sliced
    ``data[pos:]`` per member, O(members × file) memcpy, and emitted
    whole-file gzip as ONE file-sized chunk). Compressed input is fed
    through a ``memoryview`` in fixed windows with ``max_length``
    bounding each output; member boundaries (the Common Crawl
    record-per-member layout) restart the decompressor on ``eof``, and
    a header split across feed windows is handled by zlib's own
    buffering. A corrupt member (or trailing garbage that is not a new
    member) ends the stream conservatively instead of raising."""
    if not data.startswith(GZIP_MAGIC):
        mv = memoryview(data)
        for i in range(0, len(data), chunk_size):
            yield bytes(mv[i : i + chunk_size])
        return
    mv = memoryview(data)
    pos = 0
    d = zlib.decompressobj(wbits=31)
    pending = b""  # compressed bytes already read but not yet consumed
    while True:
        if not pending:
            if pos < len(data):
                pending = bytes(mv[pos : pos + chunk_size])
                pos += len(pending)
            else:
                try:
                    rest = d.flush()
                except zlib.error:
                    return
                if rest:
                    yield rest
                return
        try:
            out = d.decompress(pending, chunk_size)
        except zlib.error:
            return
        if d.eof:
            # member finished: whatever followed it is the next
            # member's (possibly partial) header or trailing garbage
            pending = d.unused_data
            if pending or pos < len(data):
                d = zlib.decompressobj(wbits=31)
            else:
                if out:
                    yield out
                return
        else:
            pending = d.unconsumed_tail
        if out:
            yield out


def iter_warc_records(
    chunks: Iterable[bytes], http_only: bool = False
) -> Iterator[dict]:
    """Streaming WARC record generator over byte chunks. Yields dicts
    with ``warc_type``, ``record_id``, ``target_uri``, ``content_type``
    (the WARC record header — ``application/http;...`` for responses),
    ``http_content_type`` (the MIME type from the HTTP header block —
    the one an HTML filter actually wants; None for non-HTTP payloads),
    ``http_status`` (int or None), ``body_text`` (utf-8/replace), and
    ``n_bytes`` (ORIGINAL payload byte length, pre-decode). For
    ``response`` records carrying an HTTP payload, the HTTP header
    block is split off: status comes from the status line, body is the
    bytes after the first blank line. ``http_only=True`` skips
    everything but HTTP responses before materializing text."""
    buf = bytearray()
    off = 0  # read offset — front-deletion per record would memmove the
    # whole remainder every time (O(records × buffered bytes), r12
    # review); instead the offset advances and the buffer compacts in
    # _CHUNK-sized steps, so consumption is amortized O(n).
    chunk_iter = iter(chunks)

    def fill(need: int) -> bool:
        while len(buf) - off < need:
            nxt = next(chunk_iter, None)
            if nxt is None:
                return False
            buf.extend(nxt)
        return True

    def advance(n: int) -> None:
        nonlocal off
        off += n
        if off >= _CHUNK:
            del buf[:off]
            off = 0

    while True:
        # locate the end of the header block, pulling chunks as needed.
        # On a miss, the next search resumes 3 bytes before the old end
        # (a separator can straddle the boundary) instead of rescanning
        # from `off` — a garbled 100 MB binary payload would otherwise
        # cost O(payload²/chunk) byte scans on the resync path (r12
        # review).
        search_from = off
        while True:
            head_end = buf.find(b"\r\n\r\n", search_from)
            if head_end != -1:
                break
            search_from = max(off, len(buf) - 3)
            nxt = next(chunk_iter, None)
            if nxt is None:
                return
            buf.extend(nxt)
        header_blob = bytes(buf[off:head_end])
        # tolerate inter-record padding: headers must start at WARC/
        start = header_blob.find(b"WARC/")
        if start == -1:
            advance(head_end + 4 - off)
            continue
        lines = header_blob[start:].split(b"\r\n")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        if length < 0:
            # one garbled header must not discard the rest of the shard
            # (r12 review): skip past this header block and let the
            # padding branch resync on the next 'WARC/'. The bad
            # record's payload scans as garbage blocks until then.
            # Negative PARSEABLE lengths take the same branch — a
            # negative offset would wrap find()/fill() arithmetic into
            # an infinite duplicate-emitting loop (r12 review,
            # empirically confirmed).
            advance(head_end + 4 - off)
            continue
        if not fill(head_end + 4 - off + length):
            return  # truncated shard: drop the tail record, not the job
        payload = bytes(buf[head_end + 4 : head_end + 4 + length])
        advance(head_end + 4 + length - off)

        warc_type = headers.get("warc-type", "")
        status: int | None = None
        http_ctype: str | None = None
        body = payload
        if payload.startswith(b"HTTP/"):
            split = payload.find(b"\r\n\r\n")
            if split != -1:
                http_lines = payload[:split].split(b"\r\n")
                parts = http_lines[0].split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for hline in http_lines[1:]:
                    hk, hsep, hv = hline.partition(b":")
                    if hsep and hk.strip().lower() == b"content-type":
                        http_ctype = hv.strip().decode("utf-8", "replace")
                        break
                body = payload[split + 4 :]
        if http_only and (warc_type != "response" or status is None):
            continue
        yield {
            "warc_type": warc_type,
            "record_id": headers.get("warc-record-id", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "content_type": headers.get("content-type", ""),
            "http_content_type": http_ctype,
            "http_status": status,
            "body_text": body.decode("utf-8", "replace"),
            "n_bytes": len(payload),
        }


def read_warc(
    spark: SparkSession, path: str, http_only: bool = False
) -> DataFrame:
    """WARC shards → one row per record (schema: ``WARC_SCHEMA``).
    ``binaryFile`` scan, then a streaming parse per file in
    ``mapInPandas`` — the decompress/parse loop holds one record, not
    one file. ``http_only=True`` keeps only HTTP ``response`` records
    (the text-curation path), pruned inside the generator."""
    from azure_etl_databricks_sql_powerbi_spark.multimodal.ops import (
        _package_parent,
    )

    pkg_parent = _package_parent()

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if pkg_parent not in sys.path:
            sys.path.insert(0, pkg_parent)
        from azure_etl_databricks_sql_powerbi_spark.sources.warc import (
            _iter_decompressed,
            iter_warc_records,
        )

        cols = [
            "path",
            "warc_type",
            "record_id",
            "target_uri",
            "content_type",
            "http_content_type",
            "http_status",
            "body_text",
            "n_bytes",
        ]
        def emit(rows: list) -> pd.DataFrame:
            out = pd.DataFrame(rows, columns=cols)
            out["http_status"] = out["http_status"].astype("Int32")
            out["n_bytes"] = out["n_bytes"].astype("Int64")
            return out

        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                # emit in bounded slices — accumulating a whole shard's
                # records as Python dicts before one giant DataFrame
                # would hold several GB of object overhead per task and
                # defeat the parser's streaming (r12 review)
                rows: list = []
                for rec in iter_warc_records(
                    _iter_decompressed(bytes(content)), http_only=http_only
                ):
                    rows.append({"path": fpath, **rec})
                    if len(rows) >= 10_000:
                        yield emit(rows)
                        rows = []
                if rows:
                    yield emit(rows)

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def warc_html_corpus(spark: SparkSession, path: str) -> DataFrame:
    """The composed Common-Crawl-style ingestion: HTTP responses whose
    Content-Type says HTML, extracted to canonical text —
    ``read_warc(http_only=True)``, filtered on the HTTP header block's
    Content-Type (the WARC record header says ``application/http`` for
    every response — filtering on it keeps nothing), →
    ``functions/html.html_to_text``.
    Output: (target_uri, record_id, text). The single Python stage is
    the WARC parse + normalize's NFC batch; the HTML strip itself is
    JVM codegen."""
    from pyspark.sql import functions as F

    from azure_etl_databricks_sql_powerbi_spark.functions.html import (
        html_to_text,
    )

    recs = read_warc(spark, path, http_only=True)
    return (
        recs.filter(F.lower("http_content_type").contains("html"))
        .select(
            "target_uri",
            "record_id",
            html_to_text("body_text").alias("text"),
        )
    )
