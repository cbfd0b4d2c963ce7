"""The end-to-end monthly report: the reference's two jobs as ONE plan.

Reference shape (README.md:10-16): run_exports_query.py executes the
7-CTE query once per lender, enriches in pandas, writes one TSV per
lender; merge_all_lenders.py then unions the files. Here the whole thing
is a single lazy Catalyst plan ending in one partitioned write — the
"merge" job collapses into reading one partitioned dataset (SURVEY §2.12
C1/C3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from monthly_report_etl_spark.config import PipelineConfig
from monthly_report_etl_spark.operators import exports
from monthly_report_etl_spark.operators.enrich import (
    add_rank_columns,
    clean_for_export,
    enrich_with_tiers,
)


def monthly_report(
    raw_df: DataFrame,
    competitor_df: DataFrame,
    config: PipelineConfig | None = None,
    clean: bool = True,
) -> DataFrame:
    """raw exports_deals + competitor list → final 28-column report.

    Column contract: FIXTURES.md §A4 — the query's 22 columns plus
    Category / Tier / Tier Category / Link to Image and the two lagged
    rank columns.
    """
    config = config or PipelineConfig()
    # enrich first, order last — the reference sorts in SQL and the pandas
    # merges are stable/order-preserving (run_exports_query.py:224,157), so
    # ordering once at the end is equivalent and avoids sorting rows that
    # joins would reshuffle anyway
    # add_rank_columns consumes its input twice (rank-universe aggregate +
    # merge-back), but the second branch is column-pruned by Catalyst down
    # to 4 narrow columns — measured CHEAPER to recompute than to persist
    # the wide enriched rows (persisting doubled wall time at bench scale)
    df = exports.exports_pipeline(raw_df, config.start_date, config.end_date, sort="none")
    df = enrich_with_tiers(df, competitor_df)
    df = add_rank_columns(df, config)
    if clean:
        df = clean_for_export(df)
    return df.repartition("associated_lender").sortWithinPartitions(
        "associated_lender", "scenarioId"
    )
