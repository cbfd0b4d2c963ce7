"""Scale curve for the FLAGSHIP JOBS (VERDICT r8 #5): monthly_report_full
and export_job_parquet had never appeared on the SCALE.md curve — only
the events-table stand-in (exports_report_events) rode the replica
steps. This harness scales the exports_deals fixture itself (the
reference's actual workload shape: N scenarios x ~48 lenders, dims
fixed) and times

* ``monthly_report_full`` — the end-to-end report plan
  (plans/monthly_report.py: filter → max_by dedup → failure rules →
  broadcast denominators → rank/pivot enrichment → classifier) through
  a noop sink, and
* ``export_job_parquet`` — the full export job including the dual
  TSV + compacting sized-parquet sink (jobs.run_export_job).

The scale question: does the rank/pivot/enrichment TAIL (the part the
events stand-in doesn't exercise) and the dual-sink staging scale like
the core pipeline? A ratio near the scenario step is linear; materially
above it means a stage whose cost grows with something other than rows
(e.g. the pivot's column fan-out, the sized-writer's file count math).

Usage:
    python tools/scale_jobs.py       # 1x (bench's sf0.1 size), 10x, 30x
    SPARK_GRAFT_JOBS_STEPS=1,10 SPARK_GRAFT_JOBS_REPS=3 python tools/scale_jobs.py
Prints one JSON line per (job, step) and a ratio table for SCALE.md §8f.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monthly_report_etl_spark.session import get_spark  # noqa: E402

# 1x = the size bench.py uses at sf0.1 (max(500, 80000*0.1) = 8000)
BASE_SCENARIOS = int(os.environ.get("SPARK_GRAFT_JOBS_BASE", "8000"))
STEPS = [
    int(s)
    for s in os.environ.get("SPARK_GRAFT_JOBS_STEPS", "1,10,30").split(",")
    if s
]
REPS = max(1, int(os.environ.get("SPARK_GRAFT_JOBS_REPS", "2")))


def _fixture(step: int) -> tuple[str, str]:
    from monthly_report_etl_spark.fixtures import write_fixture

    n = BASE_SCENARIOS * step
    out = f"/tmp/spark_graft_scale_jobs_n{n}"
    deals = os.path.join(out, "exports_deals.parquet")
    comp = os.path.join(out, "competitor_list.csv")
    if not (os.path.exists(deals) and os.path.exists(comp)):
        write_fixture(out, n_scenarios=n, seed=42)
    return deals, comp


def _timed(fn) -> dict:
    samples = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return {
        "median": round(statistics.median(samples), 2),
        "min": round(min(samples), 2),
        "max": round(max(samples), 2),
    }


def main() -> None:
    from monthly_report_etl_spark.config import PipelineConfig
    from monthly_report_etl_spark.jobs import run_export_job
    from monthly_report_etl_spark.plans import monthly_report
    from monthly_report_etl_spark.schemas import COMPETITOR_LIST_SCHEMA
    from monthly_report_etl_spark.sources import read_lookup_csv

    spark = get_spark(app_name="scale_jobs")
    # untimed warm pass (tiny fixture) so the first timed point doesn't
    # absorb session/codegen compile — same policy as bench.py
    from monthly_report_etl_spark.fixtures import write_fixture

    warm = "/tmp/spark_graft_scale_jobs_warm"
    wd, wc = (
        (os.path.join(warm, "exports_deals.parquet"),
         os.path.join(warm, "competitor_list.csv"))
        if os.path.exists(os.path.join(warm, "exports_deals.parquet"))
        else write_fixture(warm, n_scenarios=200, seed=42)
    )
    monthly_report(
        spark.read.parquet(wd),
        read_lookup_csv(spark, wc, COMPETITOR_LIST_SCHEMA),
        PipelineConfig(),
    ).write.mode("overwrite").format("noop").save()

    out: dict[str, dict[str, float]] = {}
    for step in STEPS:
        deals_path, comp_path = _fixture(step)
        raw = spark.read.parquet(deals_path)
        comp = read_lookup_csv(spark, comp_path, COMPETITOR_LIST_SCHEMA)
        label = f"{step}x"

        t = _timed(
            lambda: monthly_report(raw, comp, PipelineConfig())
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        out.setdefault("monthly_report_full", {})[label] = t["median"]
        print(
            json.dumps(
                {"job": "monthly_report_full", "step": label, "sec": t}
            ),
            flush=True,
        )

        def job():
            dst = os.path.join(tempfile.gettempdir(), "spark_graft_scale_export")
            shutil.rmtree(dst, ignore_errors=True)
            run_export_job(
                spark,
                deals_path,
                comp_path,
                os.path.join(dst, "tsv"),
                parquet_dir=os.path.join(dst, "parquet"),
            )

        t = _timed(job)
        out.setdefault("export_job_parquet", {})[label] = t["median"]
        print(
            json.dumps({"job": "export_job_parquet", "step": label, "sec": t}),
            flush=True,
        )

    labels = [f"{s}x" for s in STEPS]
    print(json.dumps(out))
    hdr = " ".join(f"{lb:>8s}" for lb in labels)
    print(f"{'job':25s} {hdr} {'ratio':>7s}")
    for name, t in out.items():
        cols = " ".join(f"{t[lb]:8.2f}" for lb in labels)
        print(f"{name:25s} {cols} {t[labels[-1]] / t[labels[0]]:7.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
