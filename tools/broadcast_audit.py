"""Broadcast-provenance audit (r20, VERDICT r19 next #2): the
generalization of the r19 prefix-jaccard scale find.

For every catalog entry, build its DataFrame against a SCALED input dir
(explain-only — no timing, no execution beyond what plan construction
itself runs, e.g. iterative trainers), walk the physical plan, and
classify every BroadcastHashJoin / BroadcastNestedLoopJoin build side by
PROVENANCE, not estimated size:

* OK        — the build subtree scans no scaled table (fixed dims, CSV
              lookups, literal/model relations), or reduces a scaled
              scan through a LIMIT/model-sized construct;
* REVIEW    — the build subtree scans a scaled table but an Aggregate
              sits between the scan and the broadcast: bounded iff the
              grouping cardinality is corpus-independent (per-purpose
              denominators, distinct lender lists, fixed probe sets).
              Listed with the aggregate so the bound can be argued;
* FLAG      — the build subtree scans a scaled table with NO reducing
              aggregate: the build grows with the corpus — exactly the
              r19 OOM class (static size misestimates broadcast it
              invisibly at sf0.1 and kill the job at scale).

Scaled tables = the fact tables tools/make_scale_data.py replicates
(orders, lineitem, events, documents, embeddings); dimensions stay fixed
in that model, matching a facts-grow-against-dims deployment.

Usage:
    python tools/broadcast_audit.py [--sf-dir DIR] [entry ...]
Default dir: /tmp/spark_graft_scale/full10x (all tables at 10x).
Exit 1 if any FLAG. Output is one line per entry + a summary.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALED_TABLES = ("orders", "lineitem", "events", "documents", "embeddings")
BROADCAST_JOINS = ("BroadcastHashJoinExec", "BroadcastNestedLoopJoinExec")
AGG_NODES = ("HashAggregateExec", "SortAggregateExec", "ObjectHashAggregateExec")
LIMIT_NODES = ("TakeOrderedAndProjectExec", "GlobalLimitExec", "LocalLimitExec")


def _children(node):
    out = []
    it = node.children().iterator()
    while it.hasNext():
        out.append(it.next())
    return out


def _walk(node):
    yield node
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        # the wrapped plan is a field, not a child — audit the INITIAL
        # (statically planned) tree: that is where the r19 bug class
        # lives (AQE may later improve it, but must not be relied on)
        yield from _walk(node.initialPlan())
        return
    if name in ("QueryStageExec", "BroadcastQueryStageExec",
                "ShuffleQueryStageExec"):
        yield from _walk(node.plan())
        return
    for c in _children(node):
        yield from _walk(c)


def _scan_paths(node) -> tuple[list[str], bool]:
    """Scaled-table file scans anywhere under ``node``.

    Returns (tables hit, any_unparseable). ADVICE r20 #3: the original
    matched only the FIRST LINE of the scan node's toString — a
    FileSourceScanExec with a long Location list truncates it, so a
    scaled-table scan could be missed and a corpus-growing broadcast
    classified OK. Now the file index's rootPaths are read structurally;
    scans where that fails fall back to the FULL node string, and if no
    scaled table matches there either, the scan is flagged unparseable
    so the caller classifies REVIEW instead of OK."""
    hits, unparseable = [], False
    for n in _walk(node):
        name = n.getClass().getSimpleName()
        if name not in (
            "FileSourceScanExec", "BatchScanExec", "RowDataSourceScanExec"
        ):
            continue
        text = None
        if name == "FileSourceScanExec":
            try:
                it = n.relation().location().rootPaths().iterator()
                parts = []
                while it.hasNext():
                    parts.append(it.next().toString())
                text = " ".join(parts)
            except Exception:
                text = None
        if text is None:
            # non-V1 scans (or a failed structural read): the full
            # multi-line string, which still elides very long location
            # lists — an empty match here is therefore NOT trusted
            text = n.toString()
            if not any(f"{t}.parquet" in text for t in SCALED_TABLES):
                unparseable = True
        for t in SCALED_TABLES:
            if f"{t}.parquet" in text:
                hits.append(t)
    return hits, unparseable


OPAQUE_NODES = (
    # constructs whose size ESTIMATE does not track the data: a build
    # side containing one of these can be broadcast on a misestimate at
    # any scale — the r19 prefix-jaccard class (its checkpoint hid the
    # corpus-growing prefix rows behind a LogicalRDD with no stats)
    "RDDScanExec", "ExternalRDDScanExec",
    "SortMergeJoinExec", "ShuffledHashJoinExec",
    "BroadcastHashJoinExec", "BroadcastNestedLoopJoinExec",
    "CartesianProductExec", "GenerateExec", "WindowExec",
)


def _classify_build(build) -> tuple[str, str]:
    scans, unparseable = _scan_paths(build)
    names = [n.getClass().getSimpleName() for n in _walk(build)]
    aggs = [n for n in _walk(build) if n.getClass().getSimpleName() in AGG_NODES]
    has_limit = any(n in LIMIT_NODES for n in names)
    opaque = sorted({n for n in names if n in OPAQUE_NODES})
    if not scans:
        if ("RDDScanExec" in opaque or "ExternalRDDScanExec" in opaque) and not (
            aggs or has_limit
        ):
            return "FLAG", (
                "checkpoint/RDD build side with no reducing aggregate — "
                "stats-opaque, provenance unknown (the r19 evasion shape)"
            )
        if unparseable and not (aggs or has_limit):
            # ADVICE r20 #3: a scan whose location could not be read is
            # never silently OK — surface it for adjudication
            return "REVIEW", (
                "build side contains a scan whose location is unparseable "
                "— provenance unverified, adjudicate manually"
            )
        return "OK", "no scaled-table scan in build side"
    if has_limit:
        return "REVIEW", f"scaled scan {sorted(set(scans))} reduced by LIMIT"
    if aggs:
        keys = aggs[0].toString().split("\n")[0][:120]
        return "REVIEW", f"scaled scan {sorted(set(scans))} behind aggregate: {keys}"
    if opaque:
        return "FLAG", (
            f"scaled scan {sorted(set(scans))} behind estimate-opaque "
            f"{opaque} with NO reducing aggregate — misestimate class"
        )
    return "SCANSIZED", (
        f"scaled scan {sorted(set(scans))} (+filter/project only): the "
        f"broadcast decision derives from the scan's ACTUAL bytes, so it "
        f"self-corrects past the session threshold at scale"
    )


def _audit_plan(df) -> list[tuple[str, str, str]]:
    plan = df._jdf.queryExecution().executedPlan()
    results = []
    for n in _walk(plan):
        name = n.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            # audit the initial plan inside AQE — the static decisions
            continue
        if name in BROADCAST_JOINS:
            kids = _children(n)
            side = "BuildRight" if "BuildRight" in n.toString().split("\n")[0] else (
                "BuildLeft" if "BuildLeft" in n.toString().split("\n")[0] else "?"
            )
            if side == "BuildLeft":
                build = kids[0]
            elif side == "BuildRight":
                build = kids[1]
            else:
                # conservative: audit both
                for k in kids:
                    verdict, why = _classify_build(k)
                    results.append((name, verdict, why + " (side unknown)"))
                continue
            verdict, why = _classify_build(build)
            results.append((f"{name}/{side}", verdict, why))
    return results


def main() -> int:
    args = sys.argv[1:]
    sf = "/tmp/spark_graft_scale/full10x"
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        if i + 1 >= len(args) or args[i + 1].startswith("--"):
            print("usage: broadcast_audit.py [--sf-dir DIR] [entry ...]",
                  file=sys.stderr)
            return 2
        sf = args[i + 1]
        del args[i:i + 2]

    from monthly_report_etl_spark.catalog import QUERIES
    from monthly_report_etl_spark.session import get_spark

    spark = get_spark(app_name="broadcast_audit")
    names = args or list(QUERIES)
    flags = reviews = scansized = skipped = 0
    for name in names:
        try:
            df = QUERIES[name](spark, sf)
            rows = _audit_plan(df)
        except Exception as exc:
            print(f"{name}: SKIP ({type(exc).__name__}: {str(exc).splitlines()[0][:100]})",
                  flush=True)
            skipped += 1
            continue
        if not rows:
            print(f"{name}: no broadcast joins", flush=True)
            continue
        for join, verdict, why in rows:
            print(f"{name}: {verdict} {join} — {why}", flush=True)
            if verdict == "FLAG":
                flags += 1
            elif verdict == "REVIEW":
                reviews += 1
            elif verdict == "SCANSIZED":
                scansized += 1
    print(f"summary: entries={len(names)} FLAG={flags} REVIEW={reviews} "
          f"SCANSIZED={scansized} SKIP={skipped}", flush=True)
    spark.stop()
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
