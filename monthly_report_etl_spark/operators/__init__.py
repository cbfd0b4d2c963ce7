from monthly_report_etl_spark.operators import exports  # noqa: F401
