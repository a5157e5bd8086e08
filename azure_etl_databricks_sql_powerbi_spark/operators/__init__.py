from azure_etl_databricks_sql_powerbi_spark.operators.conform import (  # noqa: F401
    ColumnSpec,
    Contract,
    conform,
)
from azure_etl_databricks_sql_powerbi_spark.operators.dedup import (  # noqa: F401
    dedupe_exact,
    latest_per_key,
)
from azure_etl_databricks_sql_powerbi_spark.operators.upsert import merge_upsert  # noqa: F401
from azure_etl_databricks_sql_powerbi_spark.operators.incremental import (  # noqa: F401
    watermark_filter,
)
from azure_etl_databricks_sql_powerbi_spark.operators.qc import (  # noqa: F401
    CheckResult,
    check_freshness,
    check_min_rows,
    check_non_null,
    check_unique_key,
    run_checks,
    run_checks_df,
)
from azure_etl_databricks_sql_powerbi_spark.operators.windows import (  # noqa: F401
    running_agg,
    top_k_per_group,
)
