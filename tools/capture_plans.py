"""Capture .explain("formatted") for catalog/bench entries to files.

Writes plans/<tag>/<entry>_<suffix>.txt for each named entry (default:
every bench HEADLINE entry). Resolution matches bench.py: the five
pure-path benchables time the raw operators, so their plans are captured
from the same functions the bench actually times.

Usage:
    python tools/capture_plans.py --tag r20 --suffix before [entry ...]
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]
    tag, suffix = "r20", "before"
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for flag in ("--tag", "--suffix", "--sf-dir"):
        if flag in args:
            i = args.index(flag)
            if i + 1 >= len(args) or args[i + 1].startswith("--"):
                print(f"usage: capture_plans.py [--tag T] [--suffix S] "
                      f"[--sf-dir D] [entry ...]", file=sys.stderr)
                return 2
            val = args[i + 1]
            if flag == "--tag":
                tag = val
            elif flag == "--suffix":
                suffix = val
            else:
                sf = val
            del args[i:i + 2]

    import bench
    from monthly_report_etl_spark.catalog import QUERIES
    from monthly_report_etl_spark.session import get_spark

    extras = bench._extra_headline()
    names = args or list(bench.HEADLINE)
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    for name in names:
        fn = extras.get(name) or QUERIES[name]
        df = fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        joins = [
            k for k in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                        "BroadcastNestedLoopJoin", "CartesianProduct")
            if k in plan
        ]
        py = [k for k in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                          "MapInPandas", "FlatMapGroupsInPandas") if k in plan]
        print(f"{name}: exchanges={n_ex} joins={joins} python={py} -> {path}",
              flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
