"""WARC source: hand-built archives with exact Content-Length records
(plain, member-per-record gzip, whole-file gzip), streaming-parser
semantics (truncation drops the tail record only, padding tolerated),
the Spark connector end-to-end over binaryFile, and the composed
Common-Crawl-style ingestion warc_html_corpus ≡ html_to_text."""

from __future__ import annotations

import gzip

import pytest

from azure_etl_databricks_sql_powerbi_spark.sources.warc import (
    _iter_decompressed,
    iter_warc_records,
    read_warc,
    warc_html_corpus,
)


def _record(warc_type: str, uri: str, rec_id: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + (
            "Content-Type: application/http;msgtype=response\r\n"
            if warc_type == "response"
            else "Content-Type: application/warc-fields\r\n"
        )
        + f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http(body: bytes, ctype: bytes = b"text/html") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n\r\n" + body
    )


HTML_BODY = b"<p>Tom &amp; Jerry</p><script>x()</script><p>end</p>"

RECORDS = [
    _record("warcinfo", "", "info-1", b"software: test\r\n"),
    _record("request", "http://ex.com/a", "req-1", b"GET /a HTTP/1.1\r\n"),
    _record("response", "http://ex.com/a", "resp-1", _http(HTML_BODY)),
    _record(
        "response",
        "http://ex.com/b.png",
        "resp-2",
        _http(b"\x89PNGnotreallytext", b"image/png"),
    ),
]
PLAIN = b"".join(RECORDS)
MEMBER_GZ = b"".join(gzip.compress(r) for r in RECORDS)  # CC layout
WHOLE_GZ = gzip.compress(PLAIN)


@pytest.mark.parametrize("blob", [PLAIN, MEMBER_GZ, WHOLE_GZ])
def test_parser_all_layouts(blob):
    recs = list(iter_warc_records(_iter_decompressed(blob)))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo",
        "request",
        "response",
        "response",
    ]
    resp = recs[2]
    assert resp["target_uri"] == "http://ex.com/a"
    assert resp["record_id"] == "<urn:uuid:resp-1>"
    assert resp["http_status"] == 200
    # WARC record header vs HTTP payload header: both surfaced
    assert resp["content_type"].startswith("application/http")
    assert resp["http_content_type"] == "text/html"
    assert resp["body_text"] == HTML_BODY.decode()
    # n_bytes counts the ORIGINAL payload (HTTP headers included)
    assert resp["n_bytes"] == len(_http(HTML_BODY))
    # non-HTTP payloads carry no status
    assert recs[0]["http_status"] is None


def test_parser_http_only_prunes_early():
    recs = list(iter_warc_records(_iter_decompressed(PLAIN), http_only=True))
    assert [r["record_id"] for r in recs] == [
        "<urn:uuid:resp-1>",
        "<urn:uuid:resp-2>",
    ]


def test_parser_truncation_drops_tail_record_only():
    cut = PLAIN[: len(PLAIN) - len(RECORDS[-1]) + 10]  # last record cut
    recs = list(iter_warc_records(_iter_decompressed(cut)))
    assert len(recs) == 3  # first three intact, tail dropped, no raise


def test_parser_tolerates_leading_padding():
    recs = list(iter_warc_records(_iter_decompressed(b"\r\n\r\n" + PLAIN)))
    assert len(recs) == 4


def test_read_warc_spark_end_to_end(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(PLAIN)
    (tmp_path / "b.warc.gz").write_bytes(MEMBER_GZ)
    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 8  # 4 records x 2 shards
    by = {(r.path.split("/")[-1], r.record_id): r for r in rows}
    r = by[("a.warc", "<urn:uuid:resp-1>")]
    assert r.warc_type == "response" and r.http_status == 200
    assert r.body_text == HTML_BODY.decode()
    assert by[("b.warc.gz", "<urn:uuid:resp-1>")].body_text == r.body_text


def test_warc_html_corpus_composition(spark, tmp_path):
    (tmp_path / "c.warc.gz").write_bytes(MEMBER_GZ)
    out = warc_html_corpus(spark, str(tmp_path)).collect()
    # only the HTML response survives (png filtered by content-type)
    assert len(out) == 1
    assert out[0].target_uri == "http://ex.com/a"
    assert out[0].text == "Tom & Jerry\n\nend"


def test_parser_correct_at_any_chunk_boundary():
    """chunk_size=7 forces record headers, payloads, gzip members, and
    the \\r\\n\\r\\n separators to split across feed windows — output
    must be identical to the one-chunk parse (the streaming rewrite's
    correctness pin, r12 review)."""
    want = list(iter_warc_records(_iter_decompressed(PLAIN)))
    for blob in (PLAIN, MEMBER_GZ, WHOLE_GZ):
        got = list(iter_warc_records(_iter_decompressed(blob, chunk_size=7)))
        assert got == want, blob[:20]


def test_parser_resyncs_after_garbled_midshard_header():
    """One corrupted Content-Length must lose ONE record, not the rest
    of the shard (r12 review: the first cut returned, silently
    discarding every later record)."""
    bad = RECORDS[1].replace(b"Content-Length:", b"Content-Length: x")
    blob = RECORDS[0] + bad + RECORDS[2] + RECORDS[3]
    recs = list(iter_warc_records(_iter_decompressed(blob)))
    ids = [r["record_id"] for r in recs]
    assert "<urn:uuid:req-1>" not in ids  # the garbled record is lost
    assert ids[0] == "<urn:uuid:info-1>"  # ...but its neighbors are not
    assert "<urn:uuid:resp-1>" in ids and "<urn:uuid:resp-2>" in ids


def test_parser_negative_content_length_resyncs_not_loops():
    """'Content-Length: -999999' parses as an int, and a negative
    offset would wrap find()/fill() arithmetic into an INFINITE loop
    re-emitting consumed records (r12 review, empirically confirmed on
    the first resync cut) — it must take the garbled-header branch."""
    bad = RECORDS[1].replace(b"Content-Length: 17", b"Content-Length: -999999")
    assert bad != RECORDS[1]
    blob = RECORDS[0] + bad + RECORDS[2] + RECORDS[3]
    recs = list(iter_warc_records(_iter_decompressed(blob)))
    ids = [r["record_id"] for r in recs]
    assert len(recs) < 10  # terminates
    assert ids[0] == "<urn:uuid:info-1>"
    assert "<urn:uuid:resp-1>" in ids and "<urn:uuid:resp-2>" in ids


def test_decompressor_resyncs_after_corrupt_gzip_member():
    """A corrupt gzip member in a member-per-record shard must lose
    that member only, resyncing on the next member's magic (r13
    ADVICE: it used to end the stream, silently dropping every later
    record)."""
    members = [gzip.compress(r) for r in RECORDS]
    corrupt = members[1][:10] + b"\x00garbage\x00" + members[1][14:]
    blob = members[0] + corrupt + members[2] + members[3]
    recs = list(iter_warc_records(_iter_decompressed(blob)))
    ids = [r["record_id"] for r in recs]
    assert ids[0] == "<urn:uuid:info-1>"
    assert "<urn:uuid:resp-1>" in ids and "<urn:uuid:resp-2>" in ids
    # ...and at any chunk boundary (magic may straddle windows)
    for cs in (7, 64):
        got = list(
            iter_warc_records(_iter_decompressed(blob, chunk_size=cs))
        )
        assert [r["record_id"] for r in got] == ids


def test_parser_joins_folded_header_lines():
    """WARC/1.0 line folding: a space/tab-led continuation line extends
    the previous header's VALUE (r13 ADVICE: it used to parse as a
    bogus new key, mis-reading folded Target-URI headers)."""
    payload = b"folded ok"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:uuid:fold-1>\r\n"
        b"WARC-Target-URI: http://ex.com/very/\r\n"
        b"\tlong/path\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload + b"\r\n\r\n"
    )
    recs = list(iter_warc_records(_iter_decompressed(rec)))
    assert len(recs) == 1
    assert recs[0]["target_uri"] == "http://ex.com/very/ long/path"
    assert recs[0]["body_text"] == "folded ok"


def test_parser_caps_lying_content_length():
    """A Content-Length far beyond the real data must not buffer the
    remainder of the shard for that one record (r13 ADVICE): with a
    cap, it takes the skip/resync branch and later records survive."""
    lying = RECORDS[1].replace(
        b"Content-Length: 17", b"Content-Length: 99999999"
    )
    assert lying != RECORDS[1]
    blob = RECORDS[0] + lying + RECORDS[2] + RECORDS[3]
    recs = list(
        iter_warc_records(_iter_decompressed(blob), max_record_bytes=4096)
    )
    ids = [r["record_id"] for r in recs]
    assert ids[0] == "<urn:uuid:info-1>"
    assert "<urn:uuid:req-1>" not in ids
    assert "<urn:uuid:resp-1>" in ids and "<urn:uuid:resp-2>" in ids
    # without the cap the same blob merely truncates (fill() hits end
    # of data): the tail records after the liar are consumed as its
    # payload — the ADVICE's shard-sized buffering, bounded here only
    # by the test blob's size
    uncapped = list(iter_warc_records(_iter_decompressed(blob)))
    assert "<urn:uuid:resp-2>" not in [r["record_id"] for r in uncapped]


def test_read_warc_paths_identical_rows_to_binaryfile_path(spark, tmp_path):
    """The path-streaming connector (pyarrow FS open inside the task)
    must produce IDENTICAL rows to the binaryFile connector on the
    same shards — r12 VERDICT 'What's missing' #3."""
    from azure_etl_databricks_sql_powerbi_spark.sources.warc import (
        read_warc_paths,
    )

    (tmp_path / "a.warc").write_bytes(PLAIN)
    (tmp_path / "b.warc.gz").write_bytes(MEMBER_GZ)
    key = lambda r: (r["path"], r["record_id"], r["warc_type"])
    via_bytes = sorted(
        (r.asDict() for r in read_warc(spark, str(tmp_path)).collect()),
        key=key,
    )
    via_paths = sorted(
        (r.asDict() for r in read_warc_paths(spark, str(tmp_path)).collect()),
        key=key,
    )
    assert via_paths == via_bytes and len(via_bytes) == 8


def test_warc_fixture_row_arithmetic(spark):
    """The declared warc_html_corpus query's row count is exact
    arithmetic over the documents table: doc_id%5==1 is a request
    (pruned by http_only), %5==0 is a text/plain response (dies at the
    HTML content-type filter), %5 in {2,3,4} are HTML responses — and
    every surviving text is markup-free with the planted title/script
    stripped (the rows-only exemption's semantic pin)."""
    import __spark_entry__ as entry

    out = entry._q_warc_html_corpus(spark, entry.SF0001).collect()
    docs = spark.read.parquet(f"{entry.SF0001}/documents.parquet")
    expected = docs.filter("doc_id % 5 >= 2").count()
    assert len(out) == expected > 0
    by_uri = {r.target_uri: r.text for r in out}
    some_id = sorted(
        int(u.rsplit("/", 1)[1]) for u in by_uri
    )[0]
    txt = by_uri[f"http://corpus.example/doc/{some_id}"]
    assert f"Doc {some_id}" in txt          # the <h1> body survives
    assert f"var d={some_id}" not in txt    # script payload stripped
    assert "<" not in txt and ">" not in txt  # no markup residue at all
    assert f"doc {some_id}" in txt           # <title> text is kept (block tag -> LF)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except Exception:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:

    @settings(max_examples=60, deadline=None)
    @given(
        recs=st.lists(
            st.tuples(
                st.sampled_from(["response", "request", "resource"]),
                st.binary(min_size=0, max_size=400),
            ),
            min_size=1,
            max_size=6,
        ),
        layout=st.sampled_from(["plain", "member", "whole"]),
        chunk_size=st.sampled_from([7, 64, 1 << 20]),
    )
    def test_warc_roundtrip_property(recs, layout, chunk_size):
        """Arbitrary binary payloads — including ones embedding
        '\\r\\n\\r\\n', 'WARC/', gzip magic, or HTTP-looking prefixes —
        roundtrip through build→(gzip layout)→streaming parse at any
        chunk boundary: count, type, id, and n_bytes always; body_text
        equality whenever the payload is not an HTTP block (those split
        headers off by design)."""
        built = b"".join(
            _record(t, f"http://x/{i}", f"p-{i}", p)
            for i, (t, p) in enumerate(recs)
        )
        if layout == "member":
            blob = b"".join(
                gzip.compress(_record(t, f"http://x/{i}", f"p-{i}", p))
                for i, (t, p) in enumerate(recs)
            )
        elif layout == "whole":
            blob = gzip.compress(built)
        else:
            blob = built
        got = list(
            iter_warc_records(_iter_decompressed(blob, chunk_size=chunk_size))
        )
        assert len(got) == len(recs)
        for i, ((t, p), r) in enumerate(zip(recs, got)):
            assert r["warc_type"] == t
            assert r["record_id"] == f"<urn:uuid:p-{i}>"
            assert r["n_bytes"] == len(p)
            if not p.startswith(b"HTTP/"):
                assert r["body_text"] == p.decode("utf-8", "replace")


def test_write_warc_conversions_roundtrip(spark, tmp_path):
    """The WET-style sink closes the crawl loop: curated text written
    as conversion records by the EXECUTORS (one gzip shard per
    partition, manifest returned), and read_warc roundtrips every
    (uri, text) pair byte-faithfully — including non-ASCII text whose
    Content-Length must count UTF-8 BYTES, not characters."""
    from azure_etl_databricks_sql_powerbi_spark.sources.warc import (
        write_warc_conversions,
    )

    rows = [
        ("http://ex.com/a", "<rid-a>", "plain ascii text"),
        ("http://ex.com/b", "<rid-b>", "café ünïcode — ≠ ascii"),
        ("http://ex.com/c", "<rid-c>", "multi\nline\n\ntext"),
        ("http://ex.com/d", "<rid-d>", None),  # NULL text skipped
    ]
    df = spark.createDataFrame(
        rows, "target_uri string, record_id string, text string"
    ).repartition(2)
    out = str(tmp_path / "wet")
    manifest = write_warc_conversions(df, out).collect()
    assert sum(m.n_records for m in manifest) == 3
    assert all(m.path.endswith(".warc.gz") for m in manifest)

    back = read_warc(spark, out).collect()
    assert len(back) == 3
    got = {(r.target_uri, r.body_text) for r in back}
    want = {(u, t) for u, _, t in rows if t is not None}
    assert got == want
    for r in back:
        assert r.warc_type == "conversion"
        assert r.record_id.startswith("<urn:md5:")
        assert r.n_bytes == len(
            dict(((u, t) for u, _, t in rows if t))[r.target_uri].encode()
        )
    # determinism: same input -> same record ids (md5, not uuid)
    out2 = str(tmp_path / "wet2")
    write_warc_conversions(df, out2).collect()
    back2 = {r.record_id for r in read_warc(spark, out2).collect()}
    assert back2 == {r.record_id for r in back}


def test_stream_warc_matches_batch_rows(spark, tmp_path):
    """The streaming binaryFile connector drains the SAME rows the
    batch connector reads from the same shards (batch ≡ stream, the
    engine's streaming discipline), including rows arriving across two
    micro-batches via maxFilesPerTrigger=1."""
    from azure_etl_databricks_sql_powerbi_spark.sources.warc import (
        stream_warc,
    )
    from azure_etl_databricks_sql_powerbi_spark.streaming.structured import (
        run_to_memory,
    )

    land = tmp_path / "landing"
    land.mkdir()
    (land / "a.warc").write_bytes(PLAIN)
    (land / "b.warc.gz").write_bytes(MEMBER_GZ)

    name = f"warc_drain_{tmp_path.name}"
    stream = stream_warc(
        spark, str(land), http_only=True, max_files_per_trigger=1
    )
    q = run_to_memory(stream, name, shuffle_partitions=4)
    try:
        got = spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()
    want = read_warc(spark, str(land), http_only=True).collect()
    key = lambda r: (r.path, r.record_id)
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) == 4  # 2 http responses x 2 shards
    gd = {key(r): r.body_text for r in got}
    wd = {key(r): r.body_text for r in want}
    assert gd == wd


def test_body_decodes_by_declared_charset():
    """Non-UTF-8 crawl payloads decode by the HTTP header's charset
    parameter (quotes tolerated, case-insensitive codec lookup); a
    missing/unknown charset falls back to utf-8/replace instead of
    failing — decoding latin-1 as utf-8 would turn every accented char
    into U+FFFD and poison dedup shingles downstream."""
    body = "café señor – ü".encode("iso-8859-1", "replace")
    cases = [
        (b'text/html; charset="ISO-8859-1"', "caf\xe9 se\xf1or"),
        (b"text/html; charset=iso-8859-1; foo=bar", "caf\xe9 se\xf1or"),
        # lying/unknown charset -> utf-8/replace fallback, no raise
        (b"text/html; charset=not-a-codec", "caf�"),
        (b"text/html", "caf�"),
    ]
    for ctype, prefix in cases:
        rec = _record("response", "http://e/x", "c-1", _http(body, ctype))
        out = list(iter_warc_records(_iter_decompressed(rec)))
        assert len(out) == 1, ctype
        assert out[0]["body_text"].startswith(prefix), (
            ctype,
            out[0]["body_text"][:12],
        )
        # n_bytes still counts ORIGINAL payload bytes
        assert out[0]["n_bytes"] == len(_http(body, ctype))


def test_resync_recovers_next_member_at_every_window_alignment():
    """r13 review: when a corrupt member's zlib error surfaces at a
    feed-window boundary, the next window can START with the next
    valid member's magic — a fixed scan-from-1 would skip that good
    member. Sweeping chunk_size over 1..64 puts the boundary
    everywhere; with a PROMPTLY-erroring corruption (invalid deflate
    block) the members before AND after must survive at every
    alignment. (A truncated-tail corruption is different and
    UNRECOVERABLE by design: the desynced deflate stream consumes the
    following members as valid data and only the end-of-member CRC
    detects it — no streaming parser can resync inside bytes that
    decoded 'successfully'; documented in _iter_decompressed_stream.)"""
    members = [gzip.compress(r) for r in RECORDS]
    corrupt = members[1][:10] + b"\x00\x00\x00\x00garbage" + members[1][14:]
    blob = members[0] + corrupt + members[2] + members[3]
    for cs in range(1, 65):
        got = [
            r["record_id"]
            for r in iter_warc_records(_iter_decompressed(blob, chunk_size=cs))
        ]
        assert got[0] == "<urn:uuid:info-1>", cs
        assert "<urn:uuid:resp-1>" in got, cs   # member AFTER the corrupt one
        assert "<urn:uuid:resp-2>" in got, cs


def test_warc_wet_write_readback_staged(spark, tmp_path):
    """STAGED declare-ready (ROTATION_POLICY §4, r15): the WET
    write->read-back corpus shape at documents-table scale — the query
    a future swap would declare rows-only (DuckDB cannot parse WARC).
    Curated text from the sf0.001 documents table is written as
    conversion records BY THE EXECUTORS (one gzip shard per partition,
    manifest returned) and read back via the batch connector: row set
    ≡ input (uri, text) pairs including non-ASCII, record ids
    deterministic (md5 of uri+text), shard count == input partitions.
    This test IS the future declared query at unit scale."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from azure_etl_databricks_sql_powerbi_spark.sources.warc import (
        write_warc_conversions,
    )

    docs = spark.read.parquet(f"{entry.SF0001}/documents.parquet")
    df = (
        docs.filter(F.col("text").isNotNull())
        .select(
            F.concat(
                F.lit("http://corpus.example/doc/"), F.col("doc_id")
            ).alias("target_uri"),
            F.concat(
                F.lit("<urn:doc:"), F.col("doc_id"), F.lit(">")
            ).alias("record_id"),
            "text",
        )
        .repartition(4)
    )
    out = str(tmp_path / "wet_corpus")
    manifest = write_warc_conversions(df, out).collect()
    n_in = df.count()
    assert sum(m.n_records for m in manifest) == n_in
    assert len(manifest) == 4  # one shard per partition, none empty

    back = read_warc(spark, out + "/*.warc.gz")
    got = {(r.target_uri, r.body_text) for r in back.collect()}
    want = {(r.target_uri, r.text) for r in df.collect()}
    assert got == want
    # determinism across re-writes (bench runs each query 3x): md5
    # record ids, not uuids
    out2 = str(tmp_path / "wet_corpus2")
    write_warc_conversions(df, out2).collect()
    ids = lambda d: {r.record_id for r in read_warc(spark, d).collect()}  # noqa: E731
    assert ids(out) == ids(out2)
