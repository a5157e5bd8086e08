"""Interleaved A/B (r16): link_edges_docs with the old output-side
isNotNull(src,dst) filter (reconstructed inline, pre-r16 shape) vs the
shipped precondition filters. One session, alternating, min over rounds."""
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
    link_edges,
    resolve_hrefs,
)
from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.util import spread  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-link-edges-nullpush-r16")
    spark.sparkContext.setLogLevel("WARN")
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()

    def pages():
        docs = spread(load_table(spark, sf_dir, "documents"))
        return docs.select(
            F.expr(entrymod._LINKS_PLANT_BASE_SQL).alias("url"),
            F.expr(entrymod._LINKS_PLANT_HTML_SQL).alias("html"),
        )

    def old_shape():
        df = pages()
        src_pages = canonicalize_urls(
            df.select(
                F.col("url").alias("__lk_page"),
                F.col("html").alias("__lk_html"),
            ),
            "__lk_page",
            "src",
        )
        exploded = src_pages.select(
            "src",
            "__lk_page",
            F.explode(
                F.transform(extract_links("__lk_html"), decode_href_entities)
            ).alias("__lk_raw"),
        )
        resolved = resolve_hrefs(exploded, "__lk_page", "__lk_raw", "__lk_dst")
        both = canonicalize_urls(resolved, "__lk_dst", "dst")
        return both.select("src", "dst").filter(
            F.col("dst").isNotNull() & F.col("src").isNotNull()
        ).distinct()

    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    res = {"old": [], "new": []}
    order = [("old", old_shape), ("new", lambda: link_edges(pages()))]
    if os.environ.get("AB_FLIP"):
        order.reverse()
    for _ in range(rounds):
        for label, fn in order:
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            res[label].append(round(time.monotonic() - t0, 3))
    print({k: (min(v), v) for k, v in res.items()})


if __name__ == "__main__":
    main()
