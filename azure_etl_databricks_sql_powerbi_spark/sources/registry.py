"""Config-driven source registry (reference ``endpoints.yml`` +
``run_extract.py:30-45,64-72,80-88`` capabilities).

A YAML spec declares sources (auth kind, headers) and endpoints
(path, pagination, incremental). ``extract_bronze`` interprets the spec
and returns one bronze DataFrame per endpoint — the engine analog of the
reference's extract stage, with transports injected so the registry is
testable offline and swappable in production.

Spec shape (same information content as the reference's endpoints.yml):

    sources:
      superoperator:
        kind: rest
        endpoints:
          - name: customers
            path: /v1/customers
            page_size: 500
            incremental: {param: updated_since, from_days_ago: 7}
      quickbooks:
        kind: oauth_query
        endpoints:
          - name: invoices
            query: "select * from Invoice maxresults 1000"
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date

import yaml
from pyspark.sql import DataFrame, SparkSession

from azure_etl_databricks_sql_powerbi_spark.sources.oauth import OAuth2QueryClient
from azure_etl_databricks_sql_powerbi_spark.sources.rest import (
    IncrementalConfig,
    PagePagination,
    RestSource,
    iter_paginated,
    records_to_df,
)


@dataclass(frozen=True)
class EndpointSpec:
    source: str
    name: str
    kind: str  # "rest" | "oauth_query"
    path: str | None = None
    query: str | None = None
    page_size: int = 500
    max_pages: int = 10_000
    incremental: IncrementalConfig | None = None


def parse_spec(text: str) -> list[EndpointSpec]:
    """Parse the YAML spec into endpoint specs (reference run_extract.py:80-88)."""
    doc = yaml.safe_load(text) or {}
    specs: list[EndpointSpec] = []
    for source, scfg in (doc.get("sources") or {}).items():
        kind = scfg.get("kind", "rest")
        for ep in scfg.get("endpoints") or []:
            inc = None
            if ep.get("incremental"):
                icfg = ep["incremental"]
                inc = IncrementalConfig(
                    param=icfg.get("param", "updated_since"),
                    from_days_ago=int(icfg.get("from_days_ago", 7)),
                )
            specs.append(
                EndpointSpec(
                    source=source,
                    name=ep["name"],
                    kind=kind,
                    path=ep.get("path"),
                    query=ep.get("query"),
                    page_size=int(ep.get("page_size", 500)),
                    max_pages=int(ep.get("max_pages", 10_000)),
                    incremental=inc,
                )
            )
    return specs


def extract_bronze(
    spark: SparkSession,
    specs: list[EndpointSpec],
    rest_sources: dict[str, RestSource],
    oauth_clients: dict[str, OAuth2QueryClient] | None = None,
    as_of: date | None = None,
) -> dict[str, DataFrame]:
    """Run every endpoint spec and land bronze DataFrames keyed
    ``{source}.{name}`` (reference run_extract.py main loop)."""
    out: dict[str, DataFrame] = {}
    oauth_clients = oauth_clients or {}
    for spec in specs:
        key = f"{spec.source}.{spec.name}"
        if spec.kind == "rest":
            source = rest_sources[spec.source]
            records = iter_paginated(
                source,
                spec.path or f"/{spec.name}",
                PagePagination(page_size=spec.page_size, max_pages=spec.max_pages),
                spec.incremental,
                as_of=as_of,
            )
            out[key] = records_to_df(spark, records)
        elif spec.kind == "oauth_query":
            client = oauth_clients[spec.source]
            payload = client.query(spec.query or f"select * from {spec.name}")
            out[key] = records_to_df(spark, [payload])
        else:
            raise ValueError(f"unknown source kind: {spec.kind}")
    return out
