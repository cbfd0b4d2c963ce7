"""Compare two bench check JSONs (artifacts/bench_sf01_r{N}_check.json)
and print the regression picture the round reviews need: total walls,
median per-entry ratio, and the movers past a threshold — using the
WARM medians when both runs carry the r13 cold/warm split, so first-rep
table/cache builds (dedup_simhash's shingle table, recursive_order_chains'
adj materialization, corpus_bpe_train_merges' first checkpoint) can't
masquerade as plan regressions.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [threshold]

Reads the FIRST JSON document in each file (bench.py historically wrote
two documents — full then compact — to stdout captures). When either
run predates the split (spread = {median,min,max} only), the warm row
is labelled MIXED — it falls back to that run's all-reps median, which
still contains the cold rep, biasing ratios. A move past
the threshold on the warm medians is worth attributing; a move that
appears on the all-reps medians but not the warm ones is warmup noise
(r13 lesson: a check run minutes after a heavy pytest session showed a
uniform ~5% inflation with 1.3-1.5x movers that fully reverted on an
idle host — compare on a quiet machine, and compare warm-to-warm).
"""

from __future__ import annotations

import json
import statistics
import sys


def load(path: str) -> dict:
    # lstrip: raw_decode rejects leading whitespace/newlines, plausible
    # in a shell-captured check file
    with open(path) as f:
        obj, _ = json.JSONDecoder().raw_decode(f.read().lstrip())
    return obj


def warm_median(run: dict, name: str) -> float | None:
    s = run.get("spread", {}).get(name)
    if not s:
        return run["queries"].get(name)
    warm = s.get("warm")
    return (warm or s)["median"]


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    names = [k for k in new["queries"] if k in old["queries"]]
    print(f"total: {old['value']} -> {new['value']} "
          f"({new['value'] / old['value']:.3f}x) over {len(names)} shared entries")

    def has_warm(run):
        # a missing/empty spread is NOT warm — all() over an empty dict
        # is vacuously True, which would label a legacy check file
        # 'warm median' while silently falling back to all-reps medians
        s = run.get("spread")
        return bool(s) and all("warm" in v for v in s.values())

    warm_label = "warm median"
    if not (has_warm(old) and has_warm(new)):
        # pre-r13 checks carry only {median,min,max}: warm_median falls
        # back to the all-reps median there, so the comparison mixes a
        # cold-free numerator with a cold-contaminated denominator (or
        # vice versa) — say so rather than report a biased row silently
        warm_label = "warm median — MIXED: one run lacks the cold/warm split, fell back to its all-reps median"

    for label, pick in (
        ("all-reps median", lambda run, n: run["queries"][n]),
        (warm_label, warm_median),
    ):
        ratios = []
        dropped = []
        for n in names:
            a, b = pick(old, n), pick(new, n)
            if a is not None and b is not None and a > 0 and b > 0:
                ratios.append((b / a, n, a, b))
            else:
                dropped.append(n)
        if not ratios:
            print(f"[{label}] no comparable entries "
                  f"(all {len(names)} dropped: zero/missing medians)")
            continue
        ratios.sort(reverse=True)
        med = statistics.median(r for r, *_ in ratios)
        movers = [(n, round(r, 2), a, b) for r, n, a, b in ratios if r >= thresh]
        note = f"; dropped {len(dropped)} zero/missing: {dropped}" if dropped else ""
        print(f"[{label}] median ratio {med:.3f}; "
              f"movers >= {thresh}x: {movers or 'none'}{note}")

    s_old = old.get("streaming", {}).get("rows_per_sec")
    s_new = new.get("streaming", {}).get("rows_per_sec")
    if s_old and s_new:
        print(f"streaming rows/s: {s_old} -> {s_new} ({s_new / s_old:.3f}x)")


if __name__ == "__main__":
    main()
