"""Time named catalog entries standalone — the floor-attribution A/B
harness (VERDICT r18 next #2).

Runs each named entry REPS times (first rep reported separately as
cold) against --sf-dir on a local[32] session and prints one JSON line
per entry: {"entry", "repo", "cold", "warm_median", "warm", "host"}.

The --repo flag points at ANY checkout (e.g. a git worktree pinned at a
historical commit): its path is prepended to sys.path so that
checkout's __spark_entry__ and package are the ones imported. This is
how a "did the code or the host move?" question gets a measured answer:
run the same entries from a pinned-era worktree and from HEAD
back-to-back on the same quiet host and compare warm medians.

Usage:
    python tools/time_entries.py [--repo DIR] [--sf-dir DIR]
        [--reps N] entry [entry ...]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> int:
    args = sys.argv[1:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 4
    for flag, setter in (("--repo", "repo"), ("--sf-dir", "sf"),
                         ("--reps", "reps")):
        if flag in args:
            i = args.index(flag)
            if i + 1 >= len(args) or args[i + 1].startswith("--"):
                print(f"usage: time_entries.py [--repo DIR] [--sf-dir DIR] "
                      f"[--reps N] entry ...", file=sys.stderr)
                return 2
            val = args[i + 1]
            if setter == "repo":
                repo = os.path.abspath(val)
            elif setter == "sf":
                sf = val
            else:
                reps = int(val)
            del args[i:i + 2]
    if not args:
        print("usage: time_entries.py [--repo DIR] [--sf-dir DIR] "
              "[--reps N] entry ...", file=sys.stderr)
        return 2

    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod
    assert entrymod.__file__.startswith(repo + os.sep), (
        f"imported {entrymod.__file__}, wanted the {repo} checkout")
    from monthly_report_etl_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    queries = entrymod.queries()
    la1 = os.getloadavg()[0]
    for name in args:
        fn = queries[name]
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            # the noop sink, same as bench.py's _noop_write: full plan
            # execution, no Arrow transfer — keeps these numbers
            # comparable to the BENCH floors being attributed
            fn(spark, sf).write.mode("overwrite").format("noop").save()
            times.append(round(time.monotonic() - t0, 3))
        print(json.dumps({
            "entry": name, "repo": repo, "cold": times[0],
            "warm_median": round(statistics.median(times[1:]), 3),
            "warm": times[1:], "host_load1_pre": round(la1, 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
