from azure_etl_databricks_sql_powerbi_spark.sources.files import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    read_bronze_json,
    write_partitioned_parquet,
)
