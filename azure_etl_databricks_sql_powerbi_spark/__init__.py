"""azure_etl_databricks_sql_powerbi_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL scaffold ``amunim-awan/azure-etl-databricks-sql-powerbi``
(config-driven ingestion, medallion layering, cleaning/conforming,
keyed upsert, incremental/watermark semantics, QC gates) plus the
large-scale training-data-pipeline surface (dedup, similarity search,
multimodal columns, text analysis).

Everything is declared through the DataFrame / Spark SQL API so Catalyst
and Tungsten pick the physical strategy; Pandas UDFs appear only where
built-in operators genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from azure_etl_databricks_sql_powerbi_spark.session import get_spark  # noqa: F401
