"""Interleaved A/B (r16): sitemap_frontier with the old output-side
isNotNull(url) filter (reconstructed inline) vs the shipped raw-loc
precondition filter. One session, alternating, min over rounds."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from azure_etl_databricks_sql_powerbi_spark.functions.links import (  # noqa: E402
    canonicalize_urls,
)
from azure_etl_databricks_sql_powerbi_spark.functions.robots import (  # noqa: E402
    filter_robots_allowed,
    parse_robots,
)
from azure_etl_databricks_sql_powerbi_spark.functions.sitemap import (  # noqa: E402
    parse_sitemap,
)
from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.sources.files import load_table  # noqa: E402
from azure_etl_databricks_sql_powerbi_spark.util import spread  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-sitemap-nullpush-r16")
    spark.sparkContext.setLogLevel("WARN")
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()

    def build(old: bool):
        docs = spread(load_table(spark, sf_dir, "documents"))
        sitemaps = docs.select(F.expr(entrymod._SITEMAP_PLANT_SQL).alias("xml"))
        robots = docs.filter(
            (F.col("doc_id") < 20) & (F.col("doc_id") % 4 < 3)
        ).select(
            F.expr(entrymod._ROBOTS_DOMAIN_PLANT_SQL).alias("domain"),
            F.expr(entrymod._ROBOTS_TXT_PLANT_SQL).alias("robots_txt"),
        )
        rules = parse_robots(robots).localCheckpoint(eager=True)
        entries = parse_sitemap(sitemaps, "xml").filter(
            (F.col("kind") == "url") & F.col("loc").isNotNull()
        )
        if old:
            canon = canonicalize_urls(entries.select("loc"), "loc", "url")
            out = canon.filter(F.col("url").isNotNull()).select("url").distinct()
        else:
            from azure_etl_databricks_sql_powerbi_spark.functions.links import (
                SCHEME_RE,
            )
            absolute = entries.select("loc").filter(
                F.regexp_extract(F.col("loc"), SCHEME_RE, 1) != ""
            )
            out = canonicalize_urls(absolute, "loc", "url").select("url").distinct()
        return filter_robots_allowed(out, rules, agent="*")

    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    res = {"old": [], "new": []}
    order = [("old", True), ("new", False)]
    if os.environ.get("AB_FLIP"):
        order.reverse()
    for _ in range(rounds):
        for label, old in order:
            spark.catalog.clearCache()
            t0 = time.monotonic()
            build(old).write.format("noop").mode("overwrite").save()
            res[label].append(round(time.monotonic() - t0, 3))
    print({k: (min(v), v) for k, v in res.items()})


if __name__ == "__main__":
    main()
