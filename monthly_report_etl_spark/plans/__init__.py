from monthly_report_etl_spark.plans.monthly_report import monthly_report  # noqa: F401
