"""App configuration — O1 in SURVEY.md §2.11 (reference ``config.py:27-42``).

The reference builds a frozen ``AppConfig`` from the process environment
after an optional ``.env`` overlay (``load_dotenv(override=False)``) and
defaults ``run_date`` to today. This engine reproduces that surface with
two test-friendly twists:

- the environment is an injectable mapping (tests never mutate
  ``os.environ``);
- the ``.env`` parser is a ~15-line built-in (KEY=VALUE lines, ``#``
  comments, optional quotes) so the engine has no dependency on the
  python-dotenv package; semantics match ``override=False`` — the real
  environment wins over the file.

Azure-specific fields (ADLS account, SQL server) generalize to engine
terms: ``lake_root`` is any Hadoop-filesystem URI (abfss://, s3a://,
file:/) and ``jdbc_url``/``jdbc_table_prefix`` cover the staging sink.
"""

from __future__ import annotations

import os
from collections.abc import Mapping
from dataclasses import dataclass
from datetime import date
from pathlib import Path


def parse_dotenv(text: str) -> dict[str, str]:
    """Parse ``KEY=VALUE`` lines; ``#`` comments and blanks are skipped;
    surrounding single/double quotes are stripped; an optional leading
    ``export`` is tolerated."""
    out: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        if line.startswith("export "):
            line = line[len("export ") :].lstrip()
        key, _, value = line.partition("=")
        key = key.strip()
        value = value.strip()
        if len(value) >= 2 and value[0] == value[-1] and value[0] in "\"'":
            value = value[1:-1]
        if key:
            out[key] = value
    return out


def load_env(
    env: Mapping[str, str] | None = None,
    dotenv_path: str | os.PathLike | None = None,
) -> dict[str, str]:
    """Merged view: ``.env`` file values overlaid by the (real or injected)
    environment — the environment wins, matching the reference's
    ``load_dotenv(override=False)``."""
    env = dict(os.environ if env is None else env)
    if dotenv_path:
        p = Path(dotenv_path)
        if p.exists():
            merged = parse_dotenv(p.read_text())
            merged.update(env)
            return merged
    return env


@dataclass(frozen=True)
class AppConfig:
    """Frozen run configuration (reference ``config.py:10-24``)."""

    run_date: str
    log_level: str = "INFO"
    # lake (bronze/silver/gold root) — any Hadoop FS URI; local dir in tests
    lake_root: str = ""
    lake_container: str = "datalake"
    # secret vault (None => env-fallback-only SecretProvider)
    keyvault_url: str | None = None
    # JDBC staging sink (optional)
    jdbc_url: str = ""
    jdbc_table_prefix: str = "tmp_"


def get_config(
    env: Mapping[str, str] | None = None,
    dotenv_path: str | os.PathLike | None = None,
    today: date | None = None,
) -> AppConfig:
    """Environment (+ optional .env overlay) -> frozen AppConfig.

    ``RUN_DATE`` defaults to today's ISO date (reference ``config.py:28-32``);
    ``today`` is injectable so tests are deterministic.
    """
    e = load_env(env, dotenv_path)
    run_date = e.get("RUN_DATE") or (today or date.today()).isoformat()
    return AppConfig(
        run_date=run_date,
        log_level=e.get("LOG_LEVEL", "INFO"),
        lake_root=e.get("LAKE_ROOT", ""),
        lake_container=e.get("LAKE_CONTAINER", "datalake"),
        keyvault_url=e.get("KEYVAULT_URL"),
        jdbc_url=e.get("JDBC_URL", ""),
        jdbc_table_prefix=e.get("JDBC_TABLE_PREFIX", "tmp_"),
    )
