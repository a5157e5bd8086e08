"""Control plane: structured logging, alert formatting/dispatch, QC gate.

Reference surface: ``alerts.py:11-22`` (Slack webhook post with ✅/❌
formatting), ``logging_utils.py:4-10`` (structured logger), ``checks.py``
run-or-alert flow wired in ``run_extract.py``/``run_transform.py``. All
driver-side concerns — none of this touches executors.

The webhook post is gated: no URL (or no ``requests``) means format-only,
so tests and air-gapped runs never attempt network.
"""

from __future__ import annotations

import json
import logging
import sys
from collections.abc import Sequence

from azure_etl_databricks_sql_powerbi_spark.operators.qc import CheckResult


def get_logger(name: str = "azure_etl_databricks_sql_powerbi_spark") -> logging.Logger:
    """Structured (JSON-line) logger (reference ``logging_utils.py:4-10``)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter('{"ts":"%(asctime)s","level":"%(levelname)s","logger":"%(name)s","msg":%(message)s}'))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


def log_event(logger: logging.Logger, event: str, **fields: object) -> None:
    logger.info(json.dumps({"event": event, **fields}))


def format_alert(pipeline: str, results: Sequence[CheckResult]) -> str:
    """✅/❌ summary message (reference ``alerts.py:15-20`` formatting)."""
    ok = all(r.passed for r in results)
    head = f"{'✅' if ok else '❌'} {pipeline}: {sum(r.passed for r in results)}/{len(results)} checks passed"
    lines = [head] + [
        f"  {'✅' if r.passed else '❌'} {r.check_name}: {r.detail}" for r in results
    ]
    return "\n".join(lines)


def send_alert(
    message: str, webhook_url: str | None = None, timeout: int = 10
) -> bool:
    """POST to a Slack-style webhook; returns False (after logging) when no
    URL is configured or the post fails — alerting must never take the
    pipeline down (reference ``alerts.py:21-22`` swallows errors too)."""
    logger = get_logger()
    if not webhook_url:
        log_event(logger, "alert_skipped_no_webhook", message=message)
        return False
    try:
        import requests

        resp = requests.post(webhook_url, json={"text": message}, timeout=timeout)
        resp.raise_for_status()
        return True
    except Exception as exc:  # noqa: BLE001
        log_event(logger, "alert_failed", error=str(exc))
        return False


class QCGateError(RuntimeError):
    """Raised when a QC gate fails before a write."""


def qc_gate(
    pipeline: str,
    results: Sequence[CheckResult],
    webhook_url: str | None = None,
    raise_on_fail: bool = True,
) -> bool:
    """Evaluate check results before a write: alert + (optionally) abort on
    failure — the reference's implicit run_checks→alert→continue flow made
    into an explicit gate (O5 + O6)."""
    ok = all(r.passed for r in results)
    message = format_alert(pipeline, results)
    log_event(get_logger(), "qc_gate", pipeline=pipeline, passed=ok)
    if not ok:
        send_alert(message, webhook_url)
        if raise_on_fail:
            raise QCGateError(message)
    return ok
