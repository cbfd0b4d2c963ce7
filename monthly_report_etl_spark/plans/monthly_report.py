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
    df = exports.exports_pipeline(raw_df, config.start_date, config.end_date, sort="none")
    df = enrich_with_tiers(df, competitor_df)
    # add_rank_columns consumes its input twice (rank-universe aggregate +
    # merge-back), and Spark shares no diamond subplans: profiled at bench
    # scale (r20), the rank step re-executed the whole scan→dedup→explode→
    # classify→tiers chain a second time, tripling the plan's cost (1.7s →
    # 4.8s warm). localCheckpoint(eager=False) materializes the enriched
    # rows ONCE (executor-local, lazily at first action) so both branches
    # read them back — interleaved A/B at sf0.1: 6.59s → 5.49s median
    # (-17%), 6.10s → 4.65s min. The materialized set is report-sized (the
    # job's own output, which export jobs write to a sink anyway), so the
    # disk cost is output-scale, not input-scale. An earlier experiment
    # with .persist() doubled wall time — persist routes through the
    # CacheManager (plan-matching, block eviction accounting) where
    # localCheckpoint is a plain RDD materialization; on a multi-node
    # cluster swap for reliable checkpoint() if executor loss must be
    # survivable mid-job.
    df = df.localCheckpoint(eager=False)
    df = add_rank_columns(df, config)
    if clean:
        df = clean_for_export(df)
    return df.repartition("associated_lender").sortWithinPartitions(
        "associated_lender", "scenarioId"
    )
