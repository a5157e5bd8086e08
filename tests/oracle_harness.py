"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side by side, then compares
row count, column names, and order-insensitive values (approximate for
floats). Catching mismatches here at sf0.001 is much cheaper than waiting
for the driver's sf0.01 CORRECTNESS pass.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if df.empty:
        return df.reset_index(drop=True)
    # canonical row order: stringify every cell, sort
    key = df.astype(str).apply(lambda r: "\x00".join(r.values), axis=1)
    df = df.loc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return df


def compare(spark_df, oracle_df: pd.DataFrame, float_tol: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    errs: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        errs.append(f"columns: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}")
        return errs
    if len(sp) != len(oracle_df):
        errs.append(f"rowcount: spark={len(sp)} oracle={len(oracle_df)}")
        return errs
    a, b = _normalize(sp), _normalize(oracle_df)
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            for i, (x, y) in enumerate(zip(av, bv)):
                xn, yn = pd.isna(x), pd.isna(y)
                if xn and yn:
                    continue
                if xn != yn or not math.isclose(
                    float(x), float(y), rel_tol=float_tol, abs_tol=float_tol
                ):
                    errs.append(f"col {col} row {i}: spark={x} oracle={y}")
                    break
        else:
            if not av.astype(str).equals(bv.astype(str)):
                diff = (av.astype(str) != bv.astype(str)).idxmax()
                errs.append(
                    f"col {col} first diff row {diff}: spark={av[diff]!r} oracle={bv[diff]!r}"
                )
    return errs
