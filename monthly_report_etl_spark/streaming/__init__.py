from monthly_report_etl_spark.streaming.events_stream import (  # noqa: F401
    run_windowed_counts_once,
    sessionize_batch,
    windowed_counts_stream,
)
