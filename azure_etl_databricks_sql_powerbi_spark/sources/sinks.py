"""Warehouse sinks: staged JDBC upsert and JSONL bronze landing.

The reference loads gold into Azure SQL by staging into ``tmp_{table}``
then running a database MERGE (``run_load.py:57-96``). In-engine the merge
itself is ``operators.upsert.merge_upsert`` (runs in Catalyst, testable);
JDBC remains available as an *optional sink* for the staged pattern —
``df.write.format("jdbc")`` is distributed (one connection per partition)
unlike the reference's single pandas ``to_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jdbc_staging(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    staging_prefix: str = "tmp_",
    num_partitions: int | None = None,
) -> str:
    """Stage ``df`` into ``{staging_prefix}{table}`` over JDBC (reference
    ``run_load.py:72-73``), returning the staging table name for a
    subsequent database-side MERGE. Distributed write; ``num_partitions``
    caps concurrent connections."""
    staging = f"{staging_prefix}{table}"
    writer = df.write.format("jdbc").option("url", url).option("dbtable", staging)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    if num_partitions:
        writer = writer.option("numPartitions", str(num_partitions))
    writer.mode("overwrite").save()
    return staging


def build_merge_sql(table: str, staging: str, key_cols: list[str], all_cols: list[str]) -> str:
    """The database-side MERGE statement for the staged pattern (reference
    ``run_load.py:75-90`` semantics): update all non-key columns on match,
    insert on miss. Offered for parity; the engine-native path is
    ``merge_upsert``."""
    on = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
    non_key = [c for c in all_cols if c not in key_cols]
    set_clause = ", ".join(f"t.{c} = s.{c}" for c in non_key)
    cols = ", ".join(all_cols)
    src_cols = ", ".join(f"s.{c}" for c in all_cols)
    return (
        f"MERGE INTO {table} AS t USING {staging} AS s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({src_cols});"
    )


def write_jsonl_bronze(df: DataFrame, path: str, run_date: str | None = None) -> None:
    """Bronze JSONL landing (reference ``run_extract.py:41-44``): one JSON
    object per line, optionally under a run_date= partition directory."""
    target = f"{path}/run_date={run_date}" if run_date else path
    df.write.mode("overwrite").json(target)


def write_raw_json_snapshot(
    df: DataFrame, path: str, run_date: str | None = None, indent: int = 2
) -> str:
    """Byte-shape parity with the reference's raw snapshot
    (``run_extract.py:69-71``): ONE pretty-printed JSON array per
    endpoint/run_date, ``ensure_ascii=False`` + ``indent=2``.

    Deliberately a driver-side materialization: the reference snapshot is
    a single small API response document, not a dataset — use
    ``write_jsonl_bronze`` for anything Spark-scale. Guarded by a row
    cap so the footgun of pointing it at a fact table fails loudly.
    Returns the written file path.
    """
    import json
    import os

    # Cap enforced BEFORE materialization: collect at most cap+1 rows via
    # limit() so pointing this at a fact table raises here instead of
    # OOMing the driver on an unbounded collect.
    cap = 100_000
    rows = df.limit(cap + 1).toJSON().collect()
    if len(rows) > cap:
        raise ValueError(
            "write_raw_json_snapshot is for small API-response snapshots; "
            f"more than {cap} rows — use write_jsonl_bronze for datasets"
        )
    data = [json.loads(r) for r in rows]
    target = f"{path}/run_date={run_date}" if run_date else path
    os.makedirs(target, exist_ok=True)
    out = os.path.join(target, "data.json")
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(data, fh, ensure_ascii=False, indent=indent)
    return out
