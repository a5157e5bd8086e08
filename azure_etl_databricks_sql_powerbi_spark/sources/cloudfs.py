"""Cloud-filesystem wiring: ADLS Gen2 / any Hadoop-FS scheme for Spark.

Reference parity: ``reference/adls.py:10-38`` wraps the Azure blob SDK
with explicit ``upload_text``/``download_text``/``list_blobs`` calls and a
medallion blob layout (``adls.py:14-18``). Spark needs none of that
imperative surface — every reader/writer in this engine takes a path, and
the Hadoop ABFS connector (public ``hadoop-azure`` configuration surface)
makes ``abfss://...`` paths first-class once the account auth config is
set. So the Spark-native equivalent is: build the URI, set the conf,
then ``spark.read.parquet(uri)`` / ``df.write.parquet(uri)`` — predicate
pushdown, partition pruning and committers all apply unchanged, which a
driver-side SDK wrapper would forfeit.

In this sandbox there is no Azure endpoint, so tests cover URI/layout/conf
construction and conf application to the live Hadoop configuration — the
I/O path itself is the same ``load_table``/``write_partitioned_parquet``
code exercised everywhere against ``file:/`` URIs (Hadoop-FS is the
shared abstraction; only the scheme changes).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_SUFFIX = "dfs.core.windows.net"


def abfss_uri(container: str, account: str, path: str = "") -> str:
    """``abfss://<container>@<account>.dfs.core.windows.net/<path>``."""
    path = path.lstrip("/")
    base = f"abfss://{container}@{account}.{_SUFFIX}"
    return f"{base}/{path}" if path else base


def adls_key_conf(account: str, access_key: str) -> dict[str, str]:
    """SharedKey auth config (hadoop-azure): the minimal dev/test setup."""
    return {f"fs.azure.account.key.{account}.{_SUFFIX}": access_key}


def adls_oauth_conf(
    account: str, tenant_id: str, client_id: str, client_secret: str
) -> dict[str, str]:
    """Service-principal OAuth2 config (hadoop-azure client-credentials
    flow) — the production path; pair with the engine's secret provider so
    the secret never lands in code or YAML."""
    host = f"{account}.{_SUFFIX}"
    return {
        f"fs.azure.account.auth.type.{host}": "OAuth",
        f"fs.azure.account.oauth.provider.type.{host}": (
            "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider"
        ),
        f"fs.azure.account.oauth2.client.id.{host}": client_id,
        f"fs.azure.account.oauth2.client.secret.{host}": client_secret,
        f"fs.azure.account.oauth2.client.endpoint.{host}": (
            f"https://login.microsoftonline.com/{tenant_id}/oauth2/token"
        ),
    }


def apply_fs_conf(spark: SparkSession, conf: dict[str, str]) -> None:
    """Apply filesystem config to the LIVE Hadoop configuration (runtime
    ``sc.hadoopConfiguration``, not session-builder confs — FS settings
    are read by the Hadoop layer per access, so this works mid-session)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hconf.set(k, v)


def medallion_path(
    root: str,
    layer: str,
    domain: str,
    table: str,
    run_date: str | None = None,
) -> str:
    """The reference's medallion blob layout (``adls.py:14-18``) on any
    Hadoop-FS root: ``{root}/{layer}/{domain}/{table}[/run_date=D]``.
    ``run_date=`` is a real partition directory, so a date-filtered read
    prunes at the listing level."""
    if layer not in ("bronze", "silver", "gold"):
        raise ValueError(f"unknown medallion layer: {layer!r}")
    base = f"{root.rstrip('/')}/{layer}/{domain}/{table}"
    return f"{base}/run_date={run_date}" if run_date else base
