"""Nested / semi-structured normalization (SURVEY.md F9, S4 bronze shape).

The reference lands QuickBooks responses as one nested JSON document per
endpoint (``run_extract.py:69-71``: ``{"QueryResponse": {"Invoice":
[...]}}``). Normalizing that to a relational silver table is a compose of
built-ins — dot-path selection, ``explode``, struct flattening — all
Catalyst-visible (generator pushdown, column pruning into the JSON/parquet
reader), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def explode_path(df: DataFrame, path: str, alias: str = "item") -> DataFrame:
    """Explode the array at a dot ``path`` (e.g. ``QueryResponse.Invoice``)
    into one row per element."""
    return df.select(F.explode(F.col(path)).alias(alias))


def flatten_struct(df: DataFrame, col: str, prefix: str = "") -> DataFrame:
    """Promote every field of struct column ``col`` to a top-level column."""
    fields = df.schema[col].dataType
    if not isinstance(fields, StructType):
        raise ValueError(f"column '{col}' is not a struct")
    cols = [F.col(f"{col}.{f.name}").alias(f"{prefix}{f.name}") for f in fields.fields]
    others = [F.col(c) for c in df.columns if c != col]
    return df.select(*others, *cols)


def flatten_all(df: DataFrame, separator: str = "_", explode_arrays: bool = False) -> DataFrame:
    """Recursively flatten every struct column (and optionally explode every
    array-of-struct) until the schema is flat — the generic bronze->silver
    normalizer for drift-prone nested payloads."""
    while True:
        struct_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, StructType)
        ]
        array_cols = (
            [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, ArrayType)
                and isinstance(f.dataType.elementType, StructType)
            ]
            if explode_arrays
            else []
        )
        if not struct_cols and not array_cols:
            return df
        for c in struct_cols:
            fields = df.schema[c].dataType.fields
            df = df.select(
                *[F.col(x) for x in df.columns if x != c],
                *[F.col(f"{c}.{f.name}").alias(f"{c}{separator}{f.name}") for f in fields],
            )
        for c in array_cols:
            df = df.withColumn(c, F.explode_outer(F.col(c)))
