"""CDX(J) crawl-index source: hand-written fixture lines with exact
expected values (incl. malformed lines that must parse to NULLs, not
errors), cell-for-cell DuckDB twin parity from the module's own
builder, digest dedup determinism, fetch-plan arithmetic + offset
ordering, and the all-JVM single-from_json plan pin."""

from __future__ import annotations

import duckdb
import pytest

from azure_etl_databricks_sql_powerbi_spark.sources.cdx import (
    cdx_fetch_plan,
    duckdb_parse_cdxj_sql,
    parse_cdxj,
    read_cdxj,
    select_captures,
)

LINES = [
    # two captures of the SAME content (same digest), different shards
    'com,example)/ 20240101000000 {"url": "https://example.com/", '
    '"mime": "text/html", "status": "200", "digest": "sha1:AAA", '
    '"length": "1200", "offset": "0", "filename": "w1.warc.gz"}',
    'com,example)/ 20240102000000 {"url": "https://example.com/", '
    '"mime": "text/html", "status": "200", "digest": "sha1:AAA", '
    '"length": "1190", "offset": "900", "filename": "w2.warc.gz"}',
    # different content, same shard as #1, later offset
    'com,example)/a 20240101010203 {"url": "https://example.com/a", '
    '"mime": "text/html; charset=utf-8", "status": "200", '
    '"digest": "sha1:BBB", "length": "800", "offset": "1200", '
    '"filename": "w1.warc.gz"}',
    # 404 and a PDF: both pruned by the default selection
    'com,example)/gone 20240101000000 {"url": "https://example.com/gone", '
    '"mime": "text/html", "status": "404", "digest": "sha1:CCC", '
    '"length": "300", "offset": "2000", "filename": "w1.warc.gz"}',
    'com,example)/doc 20240101000000 {"url": "https://example.com/doc", '
    '"mime": "application/pdf", "status": "200", "digest": "sha1:DDD", '
    '"length": "9000", "offset": "2300", "filename": "w1.warc.gz"}',
    # malformed JSON: the line must survive as NULL fields
    "com,broken)/ 20240101000000 {not json",
    # not a CDXJ line at all
    "garbage",
]


@pytest.fixture(scope="module")
def cdx(spark):
    df = spark.createDataFrame([(ln,) for ln in LINES], "value string")
    return parse_cdxj(df)


def test_parse_hand_written_expectations(cdx):
    rows = {(r.urlkey, r.offset): r for r in cdx.collect()}
    r = rows[("com,example)/", 0)]
    assert r.url == "https://example.com/"
    assert r.status == 200 and r.length == 1200
    assert r.filename == "w1.warc.gz"
    assert str(r.ts) == "2024-01-01 00:00:00"
    a = rows[("com,example)/a", 1200)]
    assert a.mime == "text/html; charset=utf-8"
    assert str(a.ts) == "2024-01-01 01:02:03"
    # malformed JSON: urlkey/ts parse, JSON fields NULL
    broken = rows[("com,broken)/", None)]
    assert broken.url is None and broken.status is None
    # non-CDXJ line: everything NULL (the regex matches 'garbage' as a
    # one-token line with empty ts/json, all derived fields NULL)
    assert (None, None) in rows or ("garbage", None) in rows


def test_duckdb_twin_cell_for_cell(cdx):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(value VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(ln,) for ln in LINES])
    want = con.execute(
        f"SELECT {duckdb_parse_cdxj_sql('value')} FROM t"
    ).df()
    got = cdx.toPandas()
    assert list(got.columns) == list(want.columns)
    assert got.astype(str).equals(want.astype(str))


def test_select_captures_dedups_by_digest_deterministically(cdx):
    sel = select_captures(cdx).collect()
    # sha1:AAA keeps the EARLIEST ts capture only; 404 and pdf pruned;
    # the NULL-digest malformed rows are pruned by status filter here
    by_digest = {}
    for r in sel:
        by_digest.setdefault(r.digest, []).append(r)
    assert len(by_digest["sha1:AAA"]) == 1
    assert by_digest["sha1:AAA"][0].filename == "w1.warc.gz"
    assert "sha1:CCC" not in by_digest and "sha1:DDD" not in by_digest
    assert len(by_digest["sha1:BBB"]) == 1
    # without dedup both AAA captures survive
    both = select_captures(cdx, dedup_by_digest=False).collect()
    assert sum(1 for r in both if r.digest == "sha1:AAA") == 2


def test_fetch_plan_groups_sorts_and_sums(cdx):
    plan = {
        r.filename: r
        for r in cdx_fetch_plan(select_captures(cdx)).collect()
    }
    w1 = plan["w1.warc.gz"]
    assert w1.n_records == 2 and w1.total_bytes == 1200 + 800
    assert [(x.offset, x.length) for x in w1.ranges] == [(0, 1200), (1200, 800)]
    assert "w2.warc.gz" not in plan  # its only capture lost the dedup


def test_parse_plan_is_single_jvm_projection(cdx):
    plan = cdx._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan
    # ONE JsonToStructs evaluation feeding every field (a per-field
    # get_json_object would parse the JSON N times)
    opt = cdx._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("from_json") <= 1


def test_read_cdxj_from_text_shards(spark, tmp_path):
    import gzip as _gz

    (tmp_path / "idx-0.cdxj").write_text("\n".join(LINES[:3]) + "\n")
    (tmp_path / "idx-1.cdxj.gz").write_bytes(
        _gz.compress(("\n".join(LINES[3:]) + "\n").encode())
    )
    got = read_cdxj(spark, str(tmp_path)).collect()
    assert len(got) == len(LINES)
    assert sum(1 for r in got if r.status == 200) == 4


def test_cdx_to_ranged_warc_end_to_end(spark, tmp_path):
    """The full index-first access path: build a member-per-record gzip
    shard + its CDXJ index (offsets recorded while building), then
    read_cdxj → select_captures → cdx_fetch_plan → read_warc_ranges
    must return EXACTLY the rows a full-shard scan returns for the
    selected records — at the cost of the selected byte ranges only."""
    import gzip as _gz
    import json as _json

    from azure_etl_databricks_sql_powerbi_spark.sources.warc import (
        read_warc,
        read_warc_ranges,
    )

    def record(rec_id: str, uri: str, body: bytes, ctype: bytes) -> bytes:
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n\r\n" + body
        )
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "Content-Type: application/http;msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        return head + payload + b"\r\n\r\n"

    recs = [
        ("r-0", "http://ex.com/0", b"<p>zero</p>", b"text/html"),
        ("r-1", "http://ex.com/1", b"<p>one</p>", b"text/html"),
        ("r-2", "http://ex.com/2", b"not html", b"text/plain"),
        ("r-3", "http://ex.com/3", b"<p>three</p>", b"text/html"),
    ]
    shard = tmp_path / "shard-0.warc.gz"
    index_lines, off = [], 0
    with open(shard, "wb") as fh:
        for i, (rid, uri, body, ctype) in enumerate(recs):
            member = _gz.compress(record(rid, uri, body, ctype))
            meta = {
                "url": uri,
                "mime": ctype.decode(),
                "status": "200",
                "digest": f"sha1:D{i}",
                "length": str(len(member)),
                "offset": str(off),
                "filename": shard.name,
            }
            index_lines.append(
                f"com,ex)/{i} 2024010100000{i} {_json.dumps(meta)}"
            )
            fh.write(member)
            off += len(member)
    (tmp_path / "idx.cdxj").write_text("\n".join(index_lines) + "\n")

    cdx = read_cdxj(spark, str(tmp_path / "idx.cdxj"))
    plan = cdx_fetch_plan(select_captures(cdx))  # html + 200 + dedup
    got = read_warc_ranges(
        spark, plan, base_uri=str(tmp_path) + "/"
    ).collect()
    want = [
        r
        for r in read_warc(spark, str(shard)).collect()
        if "html" in (r.http_content_type or "")
    ]
    key = lambda r: r.record_id
    got_d = {key(r): r for r in got}
    want_d = {key(r): r for r in want}
    assert set(got_d) == set(want_d) == {
        "<urn:uuid:r-0>", "<urn:uuid:r-1>", "<urn:uuid:r-3>"
    }
    for k in got_d:
        g, w = got_d[k], want_d[k]
        assert (g.target_uri, g.body_text, g.http_status, g.n_bytes) == (
            w.target_uri, w.body_text, w.http_status, w.n_bytes
        )


def test_lying_negative_ranges_are_skipped_not_fatal(spark, tmp_path):
    """r13 review: a lying index line with a negative offset/length
    must be dropped at plan time AND skipped by the ranged reader —
    a negative offset raised in seek (4x task retries -> job abort),
    a negative length became read(rest-of-shard)."""
    import gzip as _gz

    from azure_etl_databricks_sql_powerbi_spark.sources.warc import (
        read_warc_ranges,
    )

    rec = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:uuid:ok-1>\r\n"
        b"Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    member = _gz.compress(rec)
    shard = tmp_path / "s.warc.gz"
    shard.write_bytes(member)

    # plan-time: negatives never reach the plan
    raw = spark.createDataFrame(
        [
            ("s.warc.gz", 0, len(member), "sha1:A", 200, "text/html"),
            ("s.warc.gz", -5, 100, "sha1:B", 200, "text/html"),
            ("s.warc.gz", 0, -1, "sha1:C", 200, "text/html"),
        ],
        "filename string, offset long, length long, digest string, "
        "status int, mime string",
    )
    plan = cdx_fetch_plan(raw)
    ranges = plan.collect()[0].ranges
    assert [(r.offset, r.length) for r in ranges] == [(0, len(member))]

    # reader-side: a hand-built plan with garbage ranges still yields
    # the one good record and never fails the task
    bad_plan = spark.createDataFrame(
        [
            (
                str(shard),
                [
                    {"offset": -5, "length": 100},
                    {"offset": 0, "length": -1},
                    {"offset": 10_000_000, "length": 10},  # past EOF
                    {"offset": 0, "length": len(member) + 999},  # over-long, clamped
                ],
            )
        ],
        "filename string, ranges array<struct<offset: long, length: long>>",
    )
    got = read_warc_ranges(spark, bad_plan).collect()
    assert [r.record_id for r in got] == ["<urn:uuid:ok-1>"]


# The declared query's plant lives in __spark_entry__._CDX_PLANT_SQL
# (ROTATION_POLICY.md §5 swap #11 — `cdx_capture_selection`); this test
# imports it so the unit proof and the driver query can never desync.


def test_cdx_plant_dual_dialect_hash_exact(spark):
    """The declared-query parse at unit scale: planted CDXJ lines over
    the documents table, parsed by parse_cdxj (Spark) vs the
    duckdb_parse_cdxj_sql twin over the VERBATIM same plant — cell
    for cell, including the malformed branches' NULL fields."""
    import duckdb

    from pyspark.sql import functions as F

    from __spark_entry__ import _CDX_PLANT_SQL as CDX_PLANT_SQL

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    planted = docs.select(F.expr(CDX_PLANT_SQL).alias("value"))
    got = (
        parse_cdxj(planted)
        .orderBy("urlkey", "offset", "url")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = con.execute(
        f"""
        WITH planted AS (
            SELECT {CDX_PLANT_SQL} AS value FROM documents
        )
        SELECT {duckdb_parse_cdxj_sql('value')} FROM planted
        ORDER BY urlkey, "offset", url
        """
    ).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    assert got.astype(str).equals(want.astype(str))


def test_warc_cdx_ranged_corpus_staged(spark):
    """STAGED declare-ready (ROTATION_POLICY §4: the composed
    index-first chain, VERDICT r13 'What's missing' #3): the entry's
    WARC fixture now writes index.cdxj beside its shards (offsets
    recorded while writing, one line per record INCLUDING the
    request/plain branches select_captures must prune), and
    warc_cdx_ranged_corpus — read_cdxj → select_captures →
    cdx_fetch_plan → read_warc_ranges → HTML prune → html_to_text —
    must return EXACTLY the rows the full-scan warc_html_corpus
    returns: the index decided WHICH bytes to fetch, the reader fetched
    only those, and the text is identical. This test IS the future
    declared query at unit scale (rows-only by necessity: DuckDB
    cannot parse WARC)."""
    import __spark_entry__ as entry
    from azure_etl_databricks_sql_powerbi_spark.sources.warc import (
        warc_cdx_ranged_corpus,
        warc_html_corpus,
    )

    sf = entry.SF0001
    shard_dir = entry._warc_fixture_dir(spark, sf)
    got = {
        r.record_id: (r.target_uri, r.text)
        for r in warc_cdx_ranged_corpus(
            spark, shard_dir + "/index.cdxj", base_uri=shard_dir + "/"
        ).collect()
    }
    want = {
        r.record_id: (r.target_uri, r.text)
        for r in warc_html_corpus(
            spark, shard_dir + "/*.warc.gz", connector="paths"
        ).collect()
    }
    # full-scan keeps text/plain OUT at the html filter and requests
    # out at http_only; the index path prunes BOTH at selection time —
    # identical survivors, identical text
    assert got == want
    assert len(got) > 0
    # the fixture arithmetic: survivors are exactly doc_id % 5 >= 2
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert len(got) == sum(1 for d in range(n_docs) if d % 5 >= 2)


def test_warc_cdx_ranged_corpus_dedup_winner(spark, tmp_path):
    """The r14 review's vacuous-dedup finding: the entry fixture's
    digests are unique, so the staged equivalence test cannot catch a
    dedup regression. Here two captures share a digest with DIFFERENT
    bodies and timestamps — the index-first chain must fetch ONLY the
    deterministic winner (earliest ts per select_captures' pinned
    ordering) and must not fetch the loser's bytes at all; with
    dedup_by_digest=False both captures come back."""
    import gzip as _gz
    import json as _json

    from azure_etl_databricks_sql_powerbi_spark.sources.warc import (
        warc_cdx_ranged_corpus,
    )

    def record(rec_id: str, uri: str, body: bytes) -> bytes:
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        )
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "Content-Type: application/http;msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        return head + payload + b"\r\n\r\n"

    recs = [
        # (rec_id, uri, body, ts, digest) — r-a/r-b share a digest;
        # r-a's EARLIER ts makes it the pinned winner
        ("r-a", "http://ex.com/dup", b"<p>winner</p>", "20240101000000",
         "sha1:SAME"),
        ("r-b", "http://ex.com/dup2", b"<p>loser</p>", "20240102000000",
         "sha1:SAME"),
        ("r-c", "http://ex.com/solo", b"<p>solo</p>", "20240103000000",
         "sha1:SOLO"),
    ]
    shard = tmp_path / "shard-0.warc.gz"
    lines, off = [], 0
    with open(shard, "wb") as fh:
        for rid, uri, body, ts, digest in recs:
            member = _gz.compress(record(rid, uri, body))
            meta = {
                "url": uri, "mime": "text/html", "status": "200",
                "digest": digest, "length": str(len(member)),
                "offset": str(off), "filename": shard.name,
            }
            lines.append(f"com,ex)/{rid} {ts} {_json.dumps(meta)}")
            fh.write(member)
            off += len(member)
    (tmp_path / "idx.cdxj").write_text("\n".join(lines) + "\n")

    deduped = {
        r.record_id: r.text
        for r in warc_cdx_ranged_corpus(
            spark, str(tmp_path / "idx.cdxj"),
            base_uri=str(tmp_path) + "/",
        ).collect()
    }
    assert set(deduped) == {"<urn:uuid:r-a>", "<urn:uuid:r-c>"}
    assert deduped["<urn:uuid:r-a>"] == "winner"
    both = {
        r.record_id
        for r in warc_cdx_ranged_corpus(
            spark, str(tmp_path / "idx.cdxj"),
            base_uri=str(tmp_path) + "/", dedup_by_digest=False,
        ).collect()
    }
    assert both == {"<urn:uuid:r-a>", "<urn:uuid:r-b>", "<urn:uuid:r-c>"}


def test_warc_cdx_ranged_corpus_plan_shape(spark):
    """The declared chain's scale contract as a plan pin (r15): BOTH
    Exchanges sit on the INDEX side (hashpartitioning on digest — the
    dedup window; hashpartitioning on filename — the per-shard fetch
    plan), the ranged fetch is ONE MapInPandas, and nothing downstream
    of it ever shuffles — at 100 TB the index rows are ~1/1000 of the
    corpus bytes, so the only shuffles in the chain move metadata,
    never fetched content."""
    import __spark_entry__ as entry

    df = entry.QUERIES["warc_cdx_ranged_corpus"](spark, entry.SF0001)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange") == 2, phys.count("Exchange")
    assert "hashpartitioning(digest" in phys
    assert "hashpartitioning(filename" in phys
    assert phys.count("MapInPandas") == 1
    # the fetched-content tail (everything ABOVE the MapInPandas in the
    # plan string) is shuffle-free: project/filter/Arrow-eval only
    tail = phys.split("MapInPandas")[0]
    assert "Exchange" not in tail, tail


# ------------------------------------------------------- incremental crawls

def _cdxj(urlkey, ts, digest=None, filename="w.warc.gz", offset=0):
    dig = f'"digest": "{digest}", ' if digest else ""
    return (
        f'{urlkey} {ts} {{"url": "https://x/{urlkey}", "mime": "text/html", '
        f'"status": "200", {dig}"length": "100", '
        f'"offset": "{offset}", "filename": "{filename}"}}'
    )


# old crawl: stable content, content-to-change, content-to-vanish, a
# mover (digest M under /old), a digest-less URL, a within-crawl
# re-crawl whose LATEST is R2, and a malformed line (NULL urlkey)
OLD_LINES = [
    _cdxj("com,stable)/", "20240101000000", "sha1:S"),
    _cdxj("com,changed)/", "20240101000000", "sha1:C1"),
    _cdxj("com,gone)/", "20240101000000", "sha1:G"),
    _cdxj("com,mover)/old", "20240101000000", "sha1:M"),
    _cdxj("com,nodigest)/", "20240101000000"),
    _cdxj("com,recrawl)/", "20240101000000", "sha1:R1"),
    _cdxj("com,recrawl)/", "20240102000000", "sha1:R2"),
    "junk",
]

# new crawl one week on: stable unchanged, changed now C2, gone absent,
# the mover's content M re-appears under /new, digest-less unchanged,
# recrawl still at R2 (old's LATEST, not R1), a brand-new URL, and a
# within-crawl re-crawl whose stale capture reuses OLD digest G but
# whose LATEST digest X2 is novel — novelty must be judged on the
# reduced latest capture, not every capture
NEW_LINES = [
    _cdxj("com,stable)/", "20240108000000", "sha1:S"),
    _cdxj("com,changed)/", "20240108000000", "sha1:C2"),
    _cdxj("com,mover)/new", "20240108000000", "sha1:M"),
    _cdxj("com,nodigest)/", "20240108000000"),
    _cdxj("com,recrawl)/", "20240108000000", "sha1:R2"),
    _cdxj("com,new)/", "20240108000000", "sha1:N"),
    _cdxj("com,new2)/", "20240108000000", "sha1:G", offset=10),
    _cdxj("com,new2)/", "20240109000000", "sha1:X2", offset=20),
]


@pytest.fixture(scope="module")
def two_crawls(spark):
    old = parse_cdxj(
        spark.createDataFrame([(ln,) for ln in OLD_LINES], "value string")
    )
    new = parse_cdxj(
        spark.createDataFrame([(ln,) for ln in NEW_LINES], "value string")
    )
    return old, new


def test_latest_captures_reduction(two_crawls):
    from azure_etl_databricks_sql_powerbi_spark.sources.cdx import latest_captures

    old, _ = two_crawls
    rows = {r.urlkey: r.digest for r in latest_captures(old).collect()}
    assert rows["com,recrawl)/"] == "sha1:R2"  # ts-desc winner
    assert None not in rows  # malformed (NULL-urlkey) line dropped
    assert len(rows) == 6


def test_crawl_delta_expectations(two_crawls):
    from azure_etl_databricks_sql_powerbi_spark.sources.cdx import crawl_delta

    old, new = two_crawls
    got = {r.urlkey: r.change for r in crawl_delta(old, new).collect()}
    assert got == {
        "com,changed)/": "changed",
        "com,gone)/": "removed",
        "com,mover)/old": "removed",
        "com,mover)/new": "added",
        "com,new)/": "added",
        "com,new2)/": "added",
        # stable, nodigest (sentinel==sentinel), recrawl (R2==R2): absent
    }


def test_novel_digests_expectations(two_crawls):
    from azure_etl_databricks_sql_powerbi_spark.sources.cdx import novel_digests

    old, new = two_crawls
    got = {r.urlkey: r.digest for r in novel_digests(old, new).collect()}
    assert got == {
        "com,changed)/": "sha1:C2",
        "com,new)/": "sha1:N",
        "com,new2)/": "sha1:X2",  # judged on the LATEST capture, not G
        "com,nodigest)/": None,  # unknown content fails open
        # mover M, stable S, recrawl R2: content already in the old crawl
    }


# ONE definition of the independent delta replay (window reduction +
# full outer join + direct digest comparison), shared by the unit twin
# and the staged declared shape below — two copies could silently
# desync on a semantics fix (review finding)
_DELTA_LATEST_SQL = (
    "SELECT urlkey, digest FROM ("
    "SELECT urlkey, digest, row_number() OVER ("
    "PARTITION BY urlkey ORDER BY ts DESC NULLS LAST, "
    'filename ASC NULLS LAST, "offset" ASC NULLS LAST) AS rk '
    "FROM {src} WHERE urlkey IS NOT NULL) WHERE rk = 1"
)

# expects CTE names for the two reduced sides; closes the WITH chain
_DELTA_REPLAY_TAIL_SQL = """
        o AS ({o}),
        n AS ({n}),
        j AS (
            SELECT coalesce(o.urlkey, n.urlkey) AS urlkey,
                   CASE WHEN o.urlkey IS NULL THEN 'added'
                        WHEN n.urlkey IS NULL THEN 'removed'
                        WHEN coalesce(o.digest, chr(1)) <>
                             coalesce(n.digest, chr(1)) THEN 'changed'
                   END AS change
            FROM o FULL OUTER JOIN n ON o.urlkey = n.urlkey
        )
        SELECT urlkey, change FROM j WHERE change IS NOT NULL
"""


def _delta_replay_sql(old_cte: str, new_cte: str) -> str:
    return _DELTA_REPLAY_TAIL_SQL.format(
        o=_DELTA_LATEST_SQL.format(src=old_cte),
        n=_DELTA_LATEST_SQL.format(src=new_cte),
    )


def test_crawl_delta_duckdb_twin(spark, two_crawls):
    """INDEPENDENT SQL replay of the documented delta semantics (window
    reduction + full outer join + direct digest comparison — a
    different algorithm than the engine's table_diff md5-digest path),
    composed with the module's own parse builder, cell-for-cell."""
    from oracle_harness import compare
    from azure_etl_databricks_sql_powerbi_spark.sources.cdx import crawl_delta

    old, new = two_crawls
    con = duckdb.connect()
    import pandas as pd

    con.register("old_lines", pd.DataFrame({"value": OLD_LINES}))
    con.register("new_lines", pd.DataFrame({"value": NEW_LINES}))
    sql = f"""
        WITH old_cdx AS (
            SELECT {duckdb_parse_cdxj_sql("value")} FROM old_lines
        ),
        new_cdx AS (
            SELECT {duckdb_parse_cdxj_sql("value")} FROM new_lines
        ),
        {_delta_replay_sql("old_cdx", "new_cdx")}
    """
    oracle = con.execute(sql).fetchdf()
    errs = compare(crawl_delta(old, new), oracle)
    assert not errs, errs


# ------------------------------------------------------------------
# Pre-staged declared-query shape for crawl_delta (ROTATION_POLICY §4):
# two crawl snapshots planted in parsed-index shape over the documents
# table, one class per doc_id % 8 — stable, changed, gone, added,
# mover (same digest, new urlkey), digest-less-both, a re-crawl whose
# old LATEST matches new (the reduction pin), and a new-side stale
# capture reusing the old digest under a novel latest. {off} formats
# the offset alias per dialect (DuckDB must quote the keyword; Spark
# would read a double-quoted token as a string literal).
# ------------------------------------------------------------------

_DELTA_BASE_SQL = (
    "SELECT doc_id, CAST(doc_id % 8 AS INT) AS cls, "
    "CAST(doc_id % 40 AS INT) AS dom FROM {src}"
)

_DELTA_OLD_PLANT_SQL = """
    SELECT CASE WHEN cls = 4
                THEN 'com,site' || CAST(dom AS STRING) || ')/old/'
                     || CAST(doc_id AS STRING)
                ELSE 'com,site' || CAST(dom AS STRING) || ')/p/'
                     || CAST(doc_id AS STRING) END AS urlkey,
           try_cast('2024-01-01 00:00:00' AS timestamp) AS ts,
           CASE WHEN cls = 5 THEN CAST(NULL AS STRING)
                WHEN cls = 6 THEN 'sha1:R1-' || CAST(doc_id AS STRING)
                ELSE 'sha1:V' || CAST(doc_id AS STRING) END AS digest,
           'o' || CAST(doc_id % 4 AS STRING) || '.warc.gz' AS filename,
           doc_id * 10 AS {off}
    FROM ({base}) WHERE cls <> 3
    UNION ALL
    SELECT 'com,site' || CAST(dom AS STRING) || ')/p/'
               || CAST(doc_id AS STRING),
           try_cast('2024-01-02 00:00:00' AS timestamp),
           'sha1:R2-' || CAST(doc_id AS STRING),
           'o9.warc.gz', doc_id * 10 + 1
    FROM ({base}) WHERE cls = 6
"""

_DELTA_NEW_PLANT_SQL = """
    SELECT CASE WHEN cls = 4
                THEN 'com,site' || CAST(dom AS STRING) || ')/new/'
                     || CAST(doc_id AS STRING)
                ELSE 'com,site' || CAST(dom AS STRING) || ')/p/'
                     || CAST(doc_id AS STRING) END AS urlkey,
           try_cast('2024-01-08 00:00:00' AS timestamp) AS ts,
           CASE WHEN cls = 5 THEN CAST(NULL AS STRING)
                WHEN cls = 1 THEN 'sha1:C2-' || CAST(doc_id AS STRING)
                WHEN cls = 6 THEN 'sha1:R2-' || CAST(doc_id AS STRING)
                WHEN cls = 7 THEN 'sha1:X2-' || CAST(doc_id AS STRING)
                ELSE 'sha1:V' || CAST(doc_id AS STRING) END AS digest,
           'n' || CAST(doc_id % 4 AS STRING) || '.warc.gz' AS filename,
           doc_id * 10 AS {off}
    FROM ({base}) WHERE cls <> 2
    UNION ALL
    SELECT 'com,site' || CAST(dom AS STRING) || ')/p/'
               || CAST(doc_id AS STRING),
           try_cast('2024-01-07 00:00:00' AS timestamp),
           'sha1:V' || CAST(doc_id AS STRING),
           'n9.warc.gz', doc_id * 10 + 1
    FROM ({base}) WHERE cls = 7
"""


def test_crawl_delta_staged_declared_shape(spark, sf_dir):
    """STAGED declare-ready: the FULL declared crawl_delta query at
    documents-table scale, hash-exact class — per-class hand
    expectations plus the independent DuckDB replay cell-for-cell.
    The r16 declare lifts plants + oracle verbatim into the entry."""
    from oracle_harness import compare
    from azure_etl_databricks_sql_powerbi_spark.sources.cdx import crawl_delta

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents_v"
    )
    base_sp = _DELTA_BASE_SQL.format(src="documents_v")
    old = spark.sql(_DELTA_OLD_PLANT_SQL.format(base=base_sp, off="offset"))
    new = spark.sql(_DELTA_NEW_PLANT_SQL.format(base=base_sp, off="offset"))
    got = crawl_delta(old, new)

    # per-class hand expectations over the fixture arithmetic
    rows = got.collect()
    by_change: dict[str, set] = {}
    for r in rows:
        by_change.setdefault(r.change, set()).add(r.urlkey)
    n_docs = spark.table("documents_v").count()

    def n_cls(k: int) -> int:
        return sum(1 for d in range(n_docs) if d % 8 == k)
    assert len(by_change.get("changed", ())) == n_cls(1) + n_cls(7)
    assert len(by_change.get("removed", ())) == n_cls(2) + n_cls(4)
    assert len(by_change.get("added", ())) == n_cls(3) + n_cls(4)
    # stable/digest-less/re-crawl classes contribute NOTHING
    assert len(rows) == sum(len(v) for v in by_change.values())
    assert len(rows) == (
        n_cls(1) + n_cls(7) + n_cls(2) + 2 * n_cls(4) + n_cls(3)
    )

    import pandas as pd  # noqa: F401  (oracle_harness dependency)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    base_dk = _DELTA_BASE_SQL.format(src="documents")
    sql = f"""
        WITH old_cdx AS (
            {_DELTA_OLD_PLANT_SQL.format(base=base_dk, off='"offset"')}
        ),
        new_cdx AS (
            {_DELTA_NEW_PLANT_SQL.format(base=base_dk, off='"offset"')}
        ),
        {_delta_replay_sql("old_cdx", "new_cdx")}
    """
    oracle = con.execute(sql).fetchdf()
    errs = compare(got, oracle)
    assert not errs, errs


def test_incremental_crawl_plan_shapes(two_crawls):
    """100 TB posture pinned: every shuffle in the delta and the novel
    feed keys on urlkey or digest — (key, 32-byte digest) index
    metadata, never a capture payload — the novel feed plans a real
    LeftAnti, and both plans are all-JVM."""
    import re

    from azure_etl_databricks_sql_powerbi_spark.sources.cdx import (
        crawl_delta,
        novel_digests,
    )

    old, new = two_crawls
    for df, anti in ((crawl_delta(old, new), False), (novel_digests(old, new), True)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        keys = set(re.findall(r"Exchange hashpartitioning\((\w+)#", plan))
        assert keys <= {"urlkey", "digest"}, keys
        if anti:
            assert "LeftAnti" in plan
        for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert node not in plan


def test_staged_delta_compiles_codegen_only(spark, sf_dir):
    """The r14 lesson applied BEFORE declaring: the staged delta's
    stages must whole-stage-compile loudly (fallback=false), never
    silently drop to interpreted evaluation."""
    from azure_etl_databricks_sql_powerbi_spark.sources.cdx import crawl_delta

    fallback = spark.conf.get("spark.sql.codegen.fallback")
    factory = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try:
        spark.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).createOrReplaceTempView("documents_v")
        base_sp = _DELTA_BASE_SQL.format(src="documents_v")
        old = spark.sql(_DELTA_OLD_PLANT_SQL.format(base=base_sp, off="offset"))
        new = spark.sql(_DELTA_NEW_PLANT_SQL.format(base=base_sp, off="offset"))
        assert crawl_delta(old, new).count() > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", fallback)
        spark.conf.set("spark.sql.codegen.factoryMode", factory)
