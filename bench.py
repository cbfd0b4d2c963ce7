"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is timed end-to-end through a ``noop`` sink write — full plan
execution on every row, nothing collected to the driver. The flagship
monthly_report additionally runs the real exports pipeline on a generated
exports_deals fixture scaled with the SF (the reference's actual workload,
which the driver tables can't express).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from monthly_report_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "exports_report_events",
    "pricing_summary",
    "global_denominators",
    "dedup_latest_maxby",
    "rank_pivot_merge_back",
    "topk_orders",
    "union_by_name",
    "json_extract_props",
    "olap_shipping_priority",
    "olap_local_supplier_volume",
    "olap_returned_items",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_exact",
    "similarity_knn_brute_force",
    "similarity_ann_lsh",
    "similarity_ivf_topk",
    "text_quality_score",
    "corpus_tfidf_top_terms",
    "corpus_bigram_top",
    "streaming_sessionize",
    "asof_join",
    "window_family",
    "events_funnel",
    "events_sessionize_batch",
    "window_distribution",
    "olap_large_orders",
    "corpus_repetition_stats",
    "embeddings_quantize_int8",
    "dedup_prefix_jaccard",
    "events_sliding_window",
    "corpus_stratified_sample",
    "olap_forecast_revenue",
    "olap_nation_pair_volume",
    "olap_market_share",
    "olap_product_profit",
    "corpus_pack_sequences_ranged",
    "corpus_decontaminate",
    "text_unigram_logprob",
]


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def _run(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _fixture_paths(sf: float) -> tuple[str, str]:
    """Generate (once, cached by mtime-keyed path) the exports_deals fixture
    sized to the scale factor."""
    from monthly_report_etl_spark.fixtures import write_fixture

    n_scenarios = max(500, int(80_000 * sf))
    out = f"/tmp/spark_graft_bench_fixture_sf{sf}_n{n_scenarios}"
    deals = os.path.join(out, "exports_deals.parquet")
    comp = os.path.join(out, "competitor_list.csv")
    if not (os.path.exists(deals) and os.path.exists(comp)):
        write_fixture(out, n_scenarios=n_scenarios, seed=42)
    return deals, comp


def main() -> None:
    sf = _sf_from_dir(SF_DIR)
    spark = get_spark(app_name="bench")

    from monthly_report_etl_spark.catalog import QUERIES
    from monthly_report_etl_spark.config import PipelineConfig
    from monthly_report_etl_spark.plans import monthly_report
    from monthly_report_etl_spark.schemas import COMPETITOR_LIST_SCHEMA
    from monthly_report_etl_spark.sources import read_lookup_csv

    timings: dict[str, float] = {}

    # Warm the JVM/codegen so q1 doesn't pay session startup. The flagship
    # runs first in HEADLINE and was absorbing ~2.5s of first-query compile
    # (parquet footer reads, get_json_object codegen) — run its exact plan
    # once on the tiny sf0.001 tables so every timed number below is
    # steady-state execution, not compile time.
    _run(QUERIES["pricing_summary"](spark, SF_DIR).limit(1))
    _run(QUERIES["exports_report_events"](spark, "/root/testdata/sf0.001"))

    for name in HEADLINE:
        t0 = time.perf_counter()
        _run(QUERIES[name](spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    deals_path, comp_path = _fixture_paths(sf)
    raw = spark.read.parquet(deals_path)
    comp = read_lookup_csv(spark, comp_path, COMPETITOR_LIST_SCHEMA)
    t0 = time.perf_counter()
    _run(monthly_report(raw, comp, PipelineConfig()))
    timings["monthly_report_full"] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
