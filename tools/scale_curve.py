"""Time the most expensive headline queries at two scale factors and
print the wall-time ratio table for SCALE.md §8.

Usage:
    python tools/make_scale_data.py
    python tools/scale_curve.py            # times sf0.1 then the 10x set

A ratio near 10 at a 10x data step is linear scaling; materially above
10 means a super-linear stage (candidate blowup, skew, state growth)
that would bite three more orders of magnitude at 100 TB.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monthly_report_etl_spark.session import get_spark  # noqa: E402

SMALL = "/root/testdata/sf0.1"
BIG = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale/sf1")

QUERIES_UNDER_TEST = [
    "dedup_prefix_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_ann_lsh",
    "similarity_ivf_topk",
    "similarity_knn_brute_force",
    "corpus_tfidf_top_terms",
    "corpus_decontaminate",
    "exports_report_events",
    "olap_shipping_priority",
    "olap_market_share",
]


def main() -> None:
    from monthly_report_etl_spark.catalog import QUERIES

    spark = get_spark(app_name="scale_curve")
    # warm codegen/session on the tiny SF so neither timed column absorbs
    # first-query compile
    for name in QUERIES_UNDER_TEST:
        QUERIES[name](spark, "/root/testdata/sf0.001").write.mode(
            "overwrite"
        ).format("noop").save()

    out: dict[str, dict[str, float]] = {}
    for sf_dir, label in ((SMALL, "sf0.1"), (BIG, "sf1")):
        for name in QUERIES_UNDER_TEST:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            out.setdefault(name, {})[label] = round(time.perf_counter() - t0, 3)
            print(f"{label} {name} {out[name][label]}", flush=True)

    print(json.dumps(out))
    print(f"{'query':35s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s}")
    for name, t in out.items():
        print(
            f"{name:35s} {t['sf0.1']:8.2f} {t['sf1']:8.2f} "
            f"{t['sf1'] / t['sf0.1']:7.1f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
