from azure_etl_databricks_sql_powerbi_spark.plans import gold, medallion  # noqa: F401
