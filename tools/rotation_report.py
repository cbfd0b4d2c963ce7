"""Mechanical freshness/rotation report (VERDICT r15 #1 follow-through).

The r15 rotation failure was a MANUAL step silently missed; the pytest
guards (test_plans.py::test_driver_window_*) now fail a forgotten
rotation, and this tool makes the whole freshness ledger derivable from
committed files alone:

  * per-entry LATEST-GREEN round across every CORRECTNESS_r*.json
    (green = rows+schema+hash all true, no err);
  * the cohort histogram (how many entries sit at each latest round);
  * the staleness check — after round N closes, no entry's latest-green
    may trail by more than 2 rounds (the builder's standing invariant);
  * the DUE cohort for the next window (the oldest latest-green round's
    entries), which COVERAGE.md's pre-stated plan must name;
  * whether the CURRENT `_DRIVER_WINDOW_PRIORITY` equals the due cohort
    it claims to schedule (drift = the r15 failure mode).

Usage: python tools/rotation_report.py [--next-round N]
Exit 1 if any entry violates the 2-round staleness bound at the newest
recorded round (informational listing otherwise).
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def latest_green() -> tuple[dict[str, int], int]:
    """Map entry -> newest round with a fully-green driver row, plus the
    newest recorded round number."""
    latest: dict[str, int] = {}
    newest = 0
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        # basename only (ADVICE r16): a checkout under a directory named
        # e.g. repo_r2/ would otherwise misparse every round as 2
        rnd = int(re.search(r"_r(\d+)", os.path.basename(path)).group(1))
        newest = max(newest, rnd)
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                # hash_match is absent for rows-only (non-SQL) checks;
                # treat a present-and-false hash as NOT green
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, newest


def main() -> int:
    from monthly_report_etl_spark.catalog import (
        QUERIES,
        _DRIVER_WINDOW_PRIORITY,
    )

    from monthly_report_etl_spark.catalog import _DRIVER_WINDOW_ROUND

    latest, newest = latest_green()
    entries = set(QUERIES)

    # ADVICE r17: the pytest rotation guard only *warns* in the
    # round-closed state (CORRECTNESS for the declared round already
    # written), and a warning is invisible to the grep-for-pass/fail
    # receipt workflow. Print the obligation as a first-class line here,
    # where every round-start receipt run reads it.
    if newest >= _DRIVER_WINDOW_ROUND:
        print(
            f"ROTATE-DUE: round {_DRIVER_WINDOW_ROUND} is closed "
            f"(CORRECTNESS_r{newest}.json recorded) — rotate "
            f"_DRIVER_WINDOW_PRIORITY and bump _DRIVER_WINDOW_ROUND to "
            f"{newest + 1} as the FIRST commit of the new round"
        )

    never = sorted(entries - set(latest))
    hist: dict[int, list[str]] = {}
    for name in entries & set(latest):
        hist.setdefault(latest[name], []).append(name)

    print(f"newest recorded round: r{newest}")
    print(f"catalog entries: {len(entries)}; with a green row: "
          f"{len(entries) - len(never)}; never-green: {len(never)}")
    for rnd in sorted(hist):
        print(f"  r{rnd}-latest: {len(hist[rnd])} entries")
    if never:
        print("never-green (must sit in the current window):")
        for n in never:
            mark = "OK(window)" if n in _DRIVER_WINDOW_PRIORITY else "UNSCHEDULED"
            print(f"  {n} [{mark}]")

    # the due cohort for the NEXT window = oldest latest-green entries
    oldest = min(hist) if hist else None
    if oldest is not None:
        due = sorted(hist[oldest])
        print(f"\ndue cohort for the next window (r{oldest}-latest, "
              f"{len(due)} entries):")
        for n in due:
            print(f"  {n}")
        in_window = [n for n in due if n in _DRIVER_WINDOW_PRIORITY]
        print(f"of which already in _DRIVER_WINDOW_PRIORITY: "
              f"{len(in_window)}/{len(due)}")

    # staleness bound: at round newest, nothing may be older than
    # newest-2 (the standing <=2-round invariant, broken once at r15)
    stale = sorted(
        n for n, r in latest.items() if r < newest - 2 and n in entries
    )
    if stale:
        print(f"\nSTALENESS VIOLATION (> 2 rounds behind r{newest}):")
        for n in stale:
            print(f"  {n} (r{latest[n]})")
        return 1
    print(f"\nstaleness bound holds: every green entry is >= r{newest - 2}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
