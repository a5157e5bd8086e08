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
        auth:                         # optional; resolved via SecretProvider
          header: X-Api-Key
          value: {secret: so-api-key, env: SO_API_KEY}
          template: "{value}"         # reference run_extract.py:24-26
        endpoints:
          - name: customers
            path: /v1/customers
            page_size: 500
            incremental: {param: updated_since, from_days_ago: 7}
      quickbooks:
        kind: oauth_query
        auth:
          token_url: https://oauth.example/token
          refresh_token: {secret: qbo-refresh, env: QBO_REFRESH_TOKEN}
          client_id: {secret: qbo-client-id, env: QBO_CLIENT_ID}
          client_secret: {secret: qbo-client-secret, env: QBO_CLIENT_SECRET}
        endpoints:
          - name: invoices
            query: "select * from Invoice maxresults 1000"

Auth values are either literals or ``{secret: NAME, env: FALLBACK}``
references resolved through a ``SecretProvider`` (O2) — the YAML never
holds credentials, mirroring the reference's Key-Vault-name indirection
(``endpoints.yml`` + ``run_extract.py:24-26``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import date
from typing import Any

import yaml
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

from azure_etl_databricks_sql_powerbi_spark.secrets import SecretProvider
from azure_etl_databricks_sql_powerbi_spark.sources.oauth import (
    OAuth2QueryClient,
    QueryTransport,
    TokenTransport,
)
from azure_etl_databricks_sql_powerbi_spark.sources.rest import (
    IncrementalConfig,
    PagePagination,
    RestSource,
    Transport,
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


def resolve_auth_value(value: Any, secrets: SecretProvider) -> str:
    """A YAML auth value is either a literal or ``{secret: NAME, env:
    FALLBACK}`` resolved through the provider (vault first, env fallback —
    reference ``secrets.py:26-43``)."""
    if isinstance(value, dict):
        return secrets.get_secret(value.get("secret", ""), value.get("env"))
    return str(value)


def build_rest_sources(
    text: str,
    secrets: SecretProvider,
    transports: dict[str, Transport],
    rate_limit_s: float = 0.0,
) -> dict[str, RestSource]:
    """Construct one authenticated ``RestSource`` per ``kind: rest`` source
    in the YAML: the auth header value is resolved via the SecretProvider
    and formatted through the spec's template (reference
    ``run_extract.py:24-26`` header_template.format)."""
    doc = yaml.safe_load(text) or {}
    out: dict[str, RestSource] = {}
    for source, scfg in (doc.get("sources") or {}).items():
        if scfg.get("kind", "rest") != "rest":
            continue
        headers: dict[str, str] = {}
        auth = scfg.get("auth")
        if auth:
            resolved = resolve_auth_value(auth.get("value", ""), secrets)
            headers[auth.get("header", "Authorization")] = auth.get(
                "template", "{value}"
            ).format(value=resolved)
        out[source] = RestSource(
            transport=transports[source], headers=headers, rate_limit_s=rate_limit_s
        )
    return out


def build_oauth_clients(
    text: str,
    secrets: SecretProvider,
    token_transports: dict[str, TokenTransport],
    query_transports: dict[str, QueryTransport],
) -> dict[str, OAuth2QueryClient]:
    """Construct one ``OAuth2QueryClient`` per ``kind: oauth_query`` source,
    with refresh token / client id / client secret resolved through the
    SecretProvider (reference ``run_extract.py:48-60`` pulls the same three
    from Key Vault)."""
    doc = yaml.safe_load(text) or {}
    out: dict[str, OAuth2QueryClient] = {}
    for source, scfg in (doc.get("sources") or {}).items():
        if scfg.get("kind") != "oauth_query":
            continue
        auth = scfg.get("auth") or {}
        out[source] = OAuth2QueryClient(
            token_url=str(auth.get("token_url", "")),
            refresh_token=resolve_auth_value(auth.get("refresh_token", ""), secrets),
            client_id=resolve_auth_value(auth.get("client_id", ""), secrets),
            client_secret=resolve_auth_value(auth.get("client_secret", ""), secrets),
            token_transport=token_transports[source],
            query_transport=query_transports[source],
        )
    return out


_MAXRESULTS_RE = re.compile(r"\bmaxresults\s+(\d+)\b", re.IGNORECASE)


def parse_maxresults(statement: str | None) -> int | None:
    """Extract the ``maxresults N`` cap from a QBO-style query (L3 in
    SURVEY.md §2.6; reference ``endpoints.yml:49,51``)."""
    if not statement:
        return None
    m = _MAXRESULTS_RE.search(statement)
    return int(m.group(1)) if m else None


def enforce_maxresults(df: DataFrame, n: int) -> DataFrame:
    """Cap every entity array inside ``QueryResponse`` at ``n`` rows —
    engine-side enforcement of the query's ``maxresults`` so replayed
    captured payloads honor the same limit the live API would apply."""
    qr = next((f for f in df.schema.fields if f.name == "QueryResponse"), None)
    if qr is None or not isinstance(qr.dataType, StructType):
        return df
    col = F.col("QueryResponse")
    for sub in qr.dataType.fields:
        if isinstance(sub.dataType, ArrayType):
            col = col.withField(sub.name, F.slice(f"QueryResponse.{sub.name}", 1, n))
    return df.withColumn("QueryResponse", col)


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
            statement = spec.query or f"select * from {spec.name}"
            payload = client.query(statement)
            df = records_to_df(spark, [payload])
            cap = parse_maxresults(statement)
            if cap is not None:
                df = enforce_maxresults(df, cap)
            out[key] = df
        else:
            raise ValueError(f"unknown source kind: {spec.kind}")
    return out
