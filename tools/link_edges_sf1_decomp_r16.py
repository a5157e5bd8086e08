"""r16 VERDICT item 6: decompose link_edges_docs at sf1 to decide whether
the regex projection (extract/resolve/canonicalize) justifies an
Arrow-native parser. Cumulative stage timings, min-of-2, noop sink —
same discipline as opt_probe."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from azure_etl_databricks_sql_powerbi_spark.functions.links import (  # noqa: E402
    canonicalize_urls,
    decode_href_entities,
    extract_links,
    resolve_hrefs,
)
from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.util import spread  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.data/sf1")
    spark = get_spark(app_name="link-edges-sf1-decomp-r16")
    spark.sparkContext.setLogLevel("WARN")
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()

    docs = spread(load_table(spark, sf_dir, "documents"))
    pages = docs.select(
        F.expr(entrymod._LINKS_PLANT_BASE_SQL).alias("url"),
        F.expr(entrymod._LINKS_PLANT_HTML_SQL).alias("html"),
    )

    def src_pages():
        return canonicalize_urls(
            pages.select(
                F.col("url").alias("__lk_page"),
                F.col("html").alias("__lk_html"),
            ),
            "__lk_page",
            "src",
        )

    def hrefs():
        return src_pages().select(
            "src",
            "__lk_page",
            F.explode(
                F.transform(extract_links("__lk_html"), decode_href_entities)
            ).alias("__lk_raw"),
        )

    def resolved():
        return resolve_hrefs(hrefs(), "__lk_page", "__lk_raw", "__lk_dst")

    def both():
        return canonicalize_urls(resolved(), "__lk_dst", "dst")

    def filtered():
        return both().select("src", "dst").filter(
            F.col("dst").isNotNull() & F.col("src").isNotNull()
        )

    stages = [
        ("pages_only", lambda: pages),
        ("plus_src_canon", src_pages),
        ("plus_extract_explode_decode", hrefs),
        ("plus_resolve", resolved),
        ("plus_dst_canon", both),
        ("plus_filter", filtered),
        ("plus_distinct_full", lambda: filtered().distinct()),
    ]
    runs = int(os.environ.get("PROBE_RUNS", "2"))
    out = {}
    for name, fn in stages:
        ts = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            ts.append(round(time.monotonic() - t0, 3))
        out[name] = (min(ts), ts)
        print(name, out[name], flush=True)
    print({k: v[0] for k, v in out.items()})


if __name__ == "__main__":
    main()
