"""Connector-layer tests: pagination, response shapes, OAuth retry,
YAML registry, distributed fetch — all offline via injected transports."""

from __future__ import annotations

import json
from datetime import date

import pytest
from pyspark.sql import functions as F

from azure_etl_databricks_sql_powerbi_spark.sources.oauth import AuthError, OAuth2QueryClient
from azure_etl_databricks_sql_powerbi_spark.sources.registry import extract_bronze, parse_spec
from azure_etl_databricks_sql_powerbi_spark.sources.rest import (
    IncrementalConfig,
    PagePagination,
    RestSource,
    fetch_distributed,
    iter_paginated,
    parse_items,
    records_to_df,
    to_jsonl,
)


def make_fake_transport(total: int, page_size_served: int = 500, envelope: str | None = "data"):
    """Serves `total` records as pages; records are {"id": i, "v": i*2}."""
    calls: list[dict] = []

    def transport(path, params, headers):
        calls.append({"path": path, "params": dict(params), "headers": dict(headers)})
        page = int(params.get("page", 1))
        size = min(int(params.get("per_page", 500)), page_size_served)
        start = (page - 1) * size
        items = [{"id": i, "v": i * 2} for i in range(start, min(start + size, total))]
        return items if envelope is None else {envelope: items}

    transport.calls = calls
    return transport


def test_parse_items_shapes():
    assert parse_items([{"a": 1}]) == [{"a": 1}]
    assert parse_items({"data": [{"a": 1}]}) == [{"a": 1}]
    assert parse_items({"items": []}) == []
    assert parse_items({"results": [{"b": 2}]}) == [{"b": 2}]
    assert parse_items(None) == []
    with pytest.raises(ValueError):
        parse_items({"unexpected": 1})


def test_iter_paginated_stops_on_short_page():
    t = make_fake_transport(total=120)
    src = RestSource(transport=t)
    got = list(iter_paginated(src, "/v1/things", PagePagination(page_size=50)))
    assert len(got) == 120
    assert [c["params"]["page"] for c in t.calls] == [1, 2, 3]


def test_iter_paginated_stops_on_empty_page():
    t = make_fake_transport(total=100)  # exactly 2 full pages of 50
    src = RestSource(transport=t)
    got = list(iter_paginated(src, "/v1/things", PagePagination(page_size=50)))
    assert len(got) == 100
    assert [c["params"]["page"] for c in t.calls] == [1, 2, 3]  # 3rd page empty


def test_iter_paginated_max_pages_cap():
    t = make_fake_transport(total=10_000)
    src = RestSource(transport=t)
    got = list(iter_paginated(src, "/x", PagePagination(page_size=10, max_pages=3)))
    assert len(got) == 30


def test_incremental_param_sent():
    t = make_fake_transport(total=5)
    src = RestSource(transport=t, headers={"X-Api-Key": "k"})
    list(
        iter_paginated(
            src,
            "/x",
            PagePagination(page_size=10),
            IncrementalConfig(from_days_ago=7),
            as_of=date(2026, 1, 8),
        )
    )
    assert t.calls[0]["params"]["updated_since"] == "2026-01-01"
    assert t.calls[0]["headers"]["X-Api-Key"] == "k"


def test_to_jsonl_roundtrip():
    recs = [{"a": 1}, {"b": "x"}]
    lines = to_jsonl(recs).splitlines()
    assert [json.loads(line) for line in lines] == recs


def test_records_to_df(spark):
    df = records_to_df(spark, [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}])
    assert df.count() == 2
    assert set(df.columns) == {"id", "v"}


def test_oauth_lazy_refresh_and_401_retry():
    tokens = iter(["tok1", "tok2"])
    refreshes = []

    def token_transport(url, refresh, cid, secret):
        refreshes.append(url)
        return {"access_token": next(tokens)}

    attempts = []

    def query_transport(path, params, headers):
        attempts.append(headers["Authorization"])
        if headers["Authorization"] == "Bearer tok1":
            raise AuthError("401")
        return {"QueryResponse": {"Invoice": [{"Id": "1"}]}}

    client = OAuth2QueryClient(
        token_url="https://token",
        refresh_token="r",
        client_id="c",
        client_secret="s",
        token_transport=token_transport,
        query_transport=query_transport,
    )
    out = client.query("select * from Invoice maxresults 1000")
    assert out["QueryResponse"]["Invoice"] == [{"Id": "1"}]
    assert refreshes == ["https://token"] * 2  # lazy + after-401
    assert attempts == ["Bearer tok1", "Bearer tok2"]


SPEC_YAML = """
sources:
  superoperator:
    kind: rest
    endpoints:
      - name: customers
        path: /v1/customers
        page_size: 50
        incremental: {param: updated_since, from_days_ago: 7}
      - name: payments
        path: /v1/payments
        page_size: 50
  quickbooks:
    kind: oauth_query
    endpoints:
      - name: invoices
        query: "select * from Invoice maxresults 1000"
"""


def test_registry_extracts_all_endpoints(spark):
    specs = parse_spec(SPEC_YAML)
    assert [s.name for s in specs] == ["customers", "payments", "invoices"]
    assert specs[0].incremental.from_days_ago == 7

    def token_transport(url, refresh, cid, secret):
        return {"access_token": "t"}

    def query_transport(path, params, headers):
        return {"QueryResponse": {"Invoice": [{"Id": "1", "Total": 10.0}]}}

    bronze = extract_bronze(
        spark,
        specs,
        rest_sources={"superoperator": RestSource(transport=make_fake_transport(75))},
        oauth_clients={
            "quickbooks": OAuth2QueryClient(
                "https://token", "r", "c", "s", token_transport, query_transport
            )
        },
        as_of=date(2026, 1, 8),
    )
    assert bronze["superoperator.customers"].count() == 75
    assert bronze["superoperator.payments"].count() == 75
    qbo = bronze["quickbooks.invoices"]
    assert qbo.select("QueryResponse.Invoice").count() == 1


def test_fetch_distributed(spark):
    total = 200

    # Defined locally (not via the module-level factory) so cloudpickle
    # serializes it by value — executors can't import the test module.
    def make_source():
        def transport(path, params, headers):
            page = int(params.get("page", 1))
            size = int(params.get("per_page", 500))
            start = (page - 1) * size
            return {"data": [{"id": i, "v": i * 2} for i in range(start, min(start + size, 200))]}

        return RestSource(transport=transport)

    df = fetch_distributed(
        spark, make_source, "/x", n_pages=4, pagination=PagePagination(page_size=50)
    )
    rows = df.count()
    assert rows == total
    from pyspark.sql import functions as F

    parsed = df.select(F.get_json_object("raw", "$.id").cast("long").alias("id"))
    assert parsed.agg(F.count_distinct("id")).collect()[0][0] == total


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """run_date-partitioned write + filtered read => the scan only touches
    the matching partition's files (partition pruning replaces the
    reference's manual path construction, run_transform.py:24)."""
    import glob

    from azure_etl_databricks_sql_powerbi_spark.sources.files import (
        load_table,
        write_partitioned_parquet,
    )

    path = str(tmp_path / "gold")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders").limit(1000)
    for day in ("2024-01-01", "2024-01-02", "2024-01-03"):
        write_partitioned_parquet(orders, path, run_date=day)
    assert len(glob.glob(f"{path}/run_date=*")) == 3

    pruned = spark.read.parquet(path).filter(F.col("run_date") == "2024-01-02")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # physical scan reports exactly one of three partitions selected
    assert "PartitionFilters" in plan
    files = {r[0] for r in pruned.select(F.input_file_name()).distinct().collect()}
    assert files and all("run_date=2024-01-02" in f for f in files)

    # dynamic overwrite of ONE partition leaves the others intact
    write_partitioned_parquet(orders.limit(10), path, run_date="2024-01-02")
    counts = {
        r["run_date"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy(F.col("run_date").cast("string").alias("run_date"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts["2024-01-02"] == 10
    assert counts["2024-01-01"] == counts["2024-01-03"] == 1000


# ---------------------------------------------------------------- O1/O2


def test_catalog_schema_contract(spark):
    """r16: load_table reads every catalog table with its DECLARED
    schema (CATALOG_SCHEMAS) instead of per-call footer inference. This
    pins the contract against the data: fresh inference over every
    shipped scale factor must match the declared DDL exactly (names,
    types, order) — a drifting file schema must fail HERE, loudly, not
    silently null out a column at read time."""
    import glob
    import os

    from pyspark.sql.types import StructType

    from azure_etl_databricks_sql_powerbi_spark.sources.files import (
        CATALOG_SCHEMAS,
        TABLES,
        load_table,
    )

    assert set(CATALOG_SCHEMAS) == set(TABLES)
    sf_dirs = sorted(glob.glob("/root/testdata/sf*"))
    assert sf_dirs, "driver testdata must be present"
    for sf_dir in sf_dirs:
        for name in TABLES:
            path = f"{sf_dir}/{name}.parquet"
            if not os.path.exists(path):
                continue
            inferred = spark.read.parquet(path).schema
            declared = StructType.fromDDL(CATALOG_SCHEMAS[name])
            assert [(f.name, f.dataType) for f in inferred.fields] == [
                (f.name, f.dataType) for f in declared.fields
            ], (sf_dir, name, inferred.simpleString())
    # and the loaded frame exposes the declared shape (events included —
    # its NANOS column must surface as TIMESTAMP_NTZ, the type every
    # oracle twin CASTs against)
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    assert ev.limit(5).count() == 5


def test_appconfig_env_and_dotenv(tmp_path):
    from azure_etl_databricks_sql_powerbi_spark.config import get_config, parse_dotenv

    dotenv = tmp_path / ".env"
    dotenv.write_text(
        "# comment\nexport LAKE_ROOT='/from/dotenv'\nLOG_LEVEL=DEBUG\nRUN_DATE=2026-02-01\n"
    )
    # env wins over the file (load_dotenv(override=False) semantics)
    cfg = get_config(
        env={"LOG_LEVEL": "WARN", "KEYVAULT_URL": "https://kv"}, dotenv_path=dotenv
    )
    assert cfg.log_level == "WARN"
    assert cfg.lake_root == "/from/dotenv"
    assert cfg.run_date == "2026-02-01"
    assert cfg.keyvault_url == "https://kv"
    # RUN_DATE defaults to (injected) today; frozen dataclass
    import datetime as dt

    import pytest

    cfg2 = get_config(env={}, today=dt.date(2026, 8, 13))
    assert cfg2.run_date == "2026-08-13"
    assert cfg2.keyvault_url is None
    with pytest.raises(Exception):
        cfg2.run_date = "nope"
    assert parse_dotenv('A="x y"\nbad line\n') == {"A": "x y"}


def test_secret_provider_resolution_order():
    import pytest

    from azure_etl_databricks_sql_powerbi_spark.secrets import SecretProvider

    # vault client (mapping form) wins
    p = SecretProvider(vault_client={"api-key": "vaulted"}, env={"API_KEY": "from-env"})
    assert p.get_secret("api-key", env_fallback="API_KEY") == "vaulted"
    # no vault -> env fallback
    p2 = SecretProvider(env={"API_KEY": "from-env"})
    assert p2.get_secret("api-key", env_fallback="API_KEY") == "from-env"
    # neither -> loud error naming both
    p3 = SecretProvider(env={})
    with pytest.raises(RuntimeError, match="api-key.*API_KEY"):
        p3.get_secret("api-key", env_fallback="API_KEY")
    with pytest.raises(ValueError):
        p3.get_secret("")


AUTH_SPEC_YAML = """
sources:
  superoperator:
    kind: rest
    auth:
      header: X-Api-Key
      value: {secret: so-api-key, env: SO_API_KEY}
    endpoints:
      - name: customers
        path: /v1/customers
        page_size: 50
  quickbooks:
    kind: oauth_query
    auth:
      token_url: https://token
      refresh_token: {secret: qbo-refresh, env: QBO_REFRESH_TOKEN}
      client_id: literal-id
      client_secret: {secret: qbo-secret, env: QBO_SECRET}
    endpoints:
      - name: invoices
        query: "select * from Invoice maxresults 2"
"""


def test_registry_auth_via_secret_provider(spark):
    """YAML auth blocks resolve through the SecretProvider (vault first,
    env fallback) into live header/credential wiring — O1/O2 integration."""
    from azure_etl_databricks_sql_powerbi_spark.secrets import SecretProvider
    from azure_etl_databricks_sql_powerbi_spark.sources.registry import (
        build_oauth_clients,
        build_rest_sources,
        parse_spec,
    )

    secrets = SecretProvider(
        vault_client={"so-api-key": "k-from-vault"},  # vault hit
    )
    t = make_fake_transport(total=5)
    sources = build_rest_sources(AUTH_SPEC_YAML, secrets, transports={"superoperator": t})
    assert sources["superoperator"].headers == {"X-Api-Key": "k-from-vault"}

    # oauth creds: mix of vault-missing->env fallback and literals
    env_secrets = SecretProvider(
        env={"QBO_REFRESH_TOKEN": "r-env", "QBO_SECRET": "s-env"}
    )

    def token_transport(url, refresh, cid, secret):
        assert (url, refresh, cid, secret) == ("https://token", "r-env", "literal-id", "s-env")
        return {"access_token": "t"}

    def query_transport(path, params, headers):
        return {
            "QueryResponse": {
                "Invoice": [{"Id": "1"}, {"Id": "2"}, {"Id": "3"}],
                "maxResults": 3,
            }
        }

    clients = build_oauth_clients(
        AUTH_SPEC_YAML,
        env_secrets,
        token_transports={"quickbooks": token_transport},
        query_transports={"quickbooks": query_transport},
    )
    specs = [s for s in parse_spec(AUTH_SPEC_YAML) if s.kind == "oauth_query"]
    bronze = extract_bronze(spark, specs, rest_sources={}, oauth_clients=clients)
    # maxresults 2 in the query is enforced engine-side on the replayed
    # payload: the 3-entity capture is capped to 2
    row = bronze["quickbooks.invoices"].select("QueryResponse.Invoice").first()
    assert [e["Id"] for e in row[0]] == ["1", "2"]


def test_parse_maxresults():
    from azure_etl_databricks_sql_powerbi_spark.sources.registry import parse_maxresults

    assert parse_maxresults("select * from Invoice maxresults 1000") == 1000
    assert parse_maxresults("select * from Invoice MAXRESULTS 5") == 5
    assert parse_maxresults("select * from Invoice") is None
    assert parse_maxresults(None) is None


# ----------------------------------------------------------- cloud fs (S8)


def test_abfss_uri_and_medallion_layout():
    from azure_etl_databricks_sql_powerbi_spark.sources import cloudfs

    assert (
        cloudfs.abfss_uri("lake", "acct", "gold/finance/fact")
        == "abfss://lake@acct.dfs.core.windows.net/gold/finance/fact"
    )
    assert cloudfs.abfss_uri("lake", "acct") == "abfss://lake@acct.dfs.core.windows.net"
    # reference adls.py:14-18 layout, as prunable partition directories
    assert (
        cloudfs.medallion_path("abfss://lake@acct.dfs.core.windows.net",
                               "silver", "finance", "payments", "2026-08-13")
        == "abfss://lake@acct.dfs.core.windows.net/silver/finance/payments/run_date=2026-08-13"
    )
    with pytest.raises(ValueError):
        cloudfs.medallion_path("/root", "platinum", "d", "t")


def test_adls_conf_shapes_and_secret_wiring():
    from azure_etl_databricks_sql_powerbi_spark.secrets import SecretProvider
    from azure_etl_databricks_sql_powerbi_spark.sources import cloudfs

    key = cloudfs.adls_key_conf("acct", "K")
    assert key == {"fs.azure.account.key.acct.dfs.core.windows.net": "K"}

    secrets = SecretProvider(vault_client={"sp-secret": "hunter2"})
    oauth = cloudfs.adls_oauth_conf(
        "acct", "tid", "cid", secrets.get_secret("sp-secret")
    )
    host = "acct.dfs.core.windows.net"
    assert oauth[f"fs.azure.account.auth.type.{host}"] == "OAuth"
    assert oauth[f"fs.azure.account.oauth2.client.secret.{host}"] == "hunter2"
    assert oauth[f"fs.azure.account.oauth2.client.endpoint.{host}"].endswith(
        "/tid/oauth2/token"
    )


def test_apply_fs_conf_hits_live_hadoop_configuration(spark):
    from azure_etl_databricks_sql_powerbi_spark.sources import cloudfs

    cloudfs.apply_fs_conf(spark, {"fs.azure.test.probe": "42"})
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.azure.test.probe") == "42"


def test_write_raw_json_snapshot_byte_shape(spark, tmp_path):
    """Reference run_extract.py:69-71 parity: one pretty-printed JSON
    document (ensure_ascii=False, indent=2) per endpoint/run_date."""
    import json

    from azure_etl_databricks_sql_powerbi_spark.sources.sinks import (
        write_raw_json_snapshot,
    )

    df = spark.createDataFrame([(1, "café"), (2, "b")], ["id", "name"])
    out = write_raw_json_snapshot(df, str(tmp_path / "qb"), run_date="2026-08-13")
    text = open(out, encoding="utf-8").read()
    assert out.endswith("run_date=2026-08-13/data.json")
    assert "café" in text  # ensure_ascii=False, not é
    assert text.startswith("[\n  {")  # indent=2 document, not JSONL
    data = sorted(json.loads(text), key=lambda d: d["id"])
    assert data == [{"id": 1, "name": "café"}, {"id": 2, "name": "b"}]

    big = spark.range(200_000).withColumnRenamed("id", "x")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="snapshot"):
        write_raw_json_snapshot(big, str(tmp_path / "nope"))
