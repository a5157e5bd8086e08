"""Throughput smoke for the WARC connector: build a synthetic
member-per-record gzip archive (the Common Crawl layout) with N HTML
response records, run the full ``read_warc`` → ``warc_html_corpus``
path on Spark, and print records/s + MB/s. Correctness is asserted
(row counts, one spot-checked extraction), so this doubles as a
larger-than-unit integration check; the number gives the connector a
measured scale anchor next to its streaming design claims.

Usage::

    python /root/repo/tools/warc_scale_smoke.py [n_records] [body_repeat]
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.sources.warc import (  # noqa: E402
    read_warc,
    warc_html_corpus,
)

BODY = (
    "<p>Paragraph one with <b>markup</b> &amp; entities.</p>"
    "<script>var junk = 1;</script>"
    "<p>Paragraph two, prose continues here for a while.</p>"
)


def _record(i: int, body: bytes) -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
        f"WARC-Target-URI: http://ex.com/{i}\r\n"
        f"Content-Type: application/http;msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    body = (BODY * rep).encode()
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "smoke.warc.gz")
        with open(path, "wb") as f:
            for i in range(n):
                f.write(gzip.compress(_record(i, body)))
        size_mb = os.path.getsize(path) / 1e6
        spark = get_spark(app_name="warc-smoke", master="local[8]")
        # warmup: JVM + first-job costs land here, not in the numbers
        read_warc(spark, path).limit(1).count()
        t0 = time.perf_counter()
        assert read_warc(spark, path).count() == n
        t_read = time.perf_counter() - t0
        t0 = time.perf_counter()
        corpus = warc_html_corpus(spark, path)
        assert corpus.count() == n
        t_full = time.perf_counter() - t0
        one = corpus.filter("target_uri = 'http://ex.com/7'").collect()[0]
        assert "markup & entities" in one.text and "junk" not in one.text

        # r13 connectors on the same shard: path-streaming (bounded
        # task memory) and CDX-ranged (selective access)
        from azure_etl_databricks_sql_powerbi_spark.sources.warc import (
            read_warc_paths,
            read_warc_ranges,
        )

        t0 = time.perf_counter()
        assert read_warc_paths(spark, path).count() == n
        t_paths = time.perf_counter() - t0

        # ranged: every 10th record, offsets from the member layout
        offs, off = [], 0
        with open(path, "rb") as f2:
            data = f2.read()
        # recompute member sizes exactly as written
        sizes = [len(gzip.compress(_record(i, body))) for i in range(n)]
        assert sum(sizes) == len(data)
        ranges = []
        for i, s in enumerate(sizes):
            if i % 10 == 0:
                ranges.append({"offset": off, "length": s})
            off += s
        plan = spark.createDataFrame(
            [(path, ranges)],
            "filename string, "
            "ranges array<struct<offset: long, length: long>>",
        )
        t0 = time.perf_counter()
        got = read_warc_ranges(spark, plan).count()
        t_ranged = time.perf_counter() - t0
        assert got == len(ranges)

        print(
            f"n={n} shard={size_mb:.1f}MB body={len(body)}B | "
            f"read_warc {t_read:.2f}s ({n / t_read:,.0f} rec/s) | "
            f"read_warc_paths {t_paths:.2f}s ({n / t_paths:,.0f} rec/s) | "
            f"ranged 1/10th {t_ranged:.2f}s "
            f"({len(ranges) / t_ranged:,.0f} rec/s) | "
            f"+html_to_text {t_full:.2f}s ({n / t_full:,.0f} rec/s)"
        )
        spark.stop()


if __name__ == "__main__":
    main()
