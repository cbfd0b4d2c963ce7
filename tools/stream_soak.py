"""Streaming state-size soak (VERDICT r8 #6): turn "state is bounded by
the watermark horizon" from a design note into a measured claim.

The throughput bench (bench.py) drives the whole input in ONE micro-batch
— real state eviction never happens there, so it can't show whether state
grows with input. This harness stages an Rx replica of the sf0.1 events
table as K TIME-ORDERED parquet files and drives the same
windowed-counts query with ``maxFilesPerTrigger=1`` (append mode, noop
sink): the watermark advances between batches, closed 1-hour windows are
evicted, and ``StreamingQueryProgress.stateOperators`` records rows/bytes
actually held per batch.

The claim under test: max state rows tracks #(open 1h window, event_type)
groups inside the 10-minute watermark horizon — a function of the TIME
RANGE and key cardinality, NOT of input rows — so the 10x and 100x runs
must show ~equal state highwater while input rows differ 10x.

Replication model = tools/make_scale_data.py events rule: event_id /
user_id offset per replica (more users at the same per-user density,
same time range), so window-domain size is constant across scales —
exactly the shape under which a state leak would be visible as a rising
curve.

Usage:
    python tools/stream_soak.py                       # 10x and 100x
    SPARK_GRAFT_SOAK_REPLICAS=10 python tools/stream_soak.py
Prints one JSON line per scale plus a summary ratio line for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monthly_report_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICA_STEPS = [
    int(r)
    for r in os.environ.get("SPARK_GRAFT_SOAK_REPLICAS", "10,100").split(",")
    if r
]
N_BATCH_FILES = int(os.environ.get("SPARK_GRAFT_SOAK_BATCHES", "20"))


def _stage_replica_files(replicas: int) -> str:
    """Rx replica of the SF events table, globally time-sorted and split
    into N_BATCH_FILES sequential parquet files. Spark's FileStreamSource
    orders files by MODIFICATION TIME (ties unspecified — ADVICE r9 #3:
    fast sequential writes can land on the same mtime granularity and
    process out of time order, silently inflating watermark drops), so
    each part file gets an explicit strictly-increasing mtime via
    os.utime() after writing; the zero-padded names are for humans.
    Cached by source (mtime, size) fingerprint."""
    src = os.path.join(SF_DIR, "events.parquet")
    st = os.stat(src)
    # v2: explicit strictly-increasing mtimes (a pre-fix staged dir may
    # carry tied mtimes, so the layout version is part of the cache key)
    tag = f"{os.path.basename(SF_DIR)}_{replicas}x_{N_BATCH_FILES}f_{int(st.st_mtime)}_{st.st_size}_v2"
    out = f"/tmp/spark_graft_soak_{tag}"
    done = os.path.join(out, "_STAGED")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    ev = pd.read_parquet(src)
    eid = int(ev["event_id"].max()) + 1
    uid = int(ev["user_id"].max()) + 1
    parts = []
    for i in range(replicas):
        rep = ev.copy(deep=False)
        rep["event_id"] = rep["event_id"] + i * eid
        rep["user_id"] = rep["user_id"] + i * uid
        parts.append(rep)
    full = pd.concat(parts, ignore_index=True).sort_values(
        "ts", kind="stable", ignore_index=True
    )
    base = time.time() - 10 * N_BATCH_FILES
    for j, chunk in enumerate(np.array_split(full, N_BATCH_FILES)):
        path = os.path.join(out, f"part-{j:04d}.parquet")
        chunk.to_parquet(path, index=False)
        os.utime(path, (base + 10 * j, base + 10 * j))  # strict mtime order
    with open(done, "w") as f:
        f.write("ok")
    return out


def _soak(spark, replicas: int, shape: str = "windowed_counts") -> dict:
    """shape: 'windowed_counts' (state = open (window, type) groups —
    must stay FLAT as input scales), 'dedup' (state = distinct
    (user_id, event_type) keys inside the 1h lateness horizon — grows
    with key RATE by contract, never with total history; eviction shows
    as state << cumulative keys processed), or 'interval_join' (the
    stream-stream attribution join: BOTH sides buffered within the
    watermark+interval horizon, so state follows arrival rate × horizon
    — replicas multiply the rate over a fixed event-time span, so
    state_rows should scale ~linearly with replicas while staying far
    below cumulative input, and end < max shows eviction)."""
    from monthly_report_etl_spark.streaming.events_stream import (
        dedup_stream,
        interval_join_stream,
        windowed_counts_stream,
    )

    builder = {
        "windowed_counts": windowed_counts_stream,
        "dedup": dedup_stream,
        "interval_join": interval_join_stream,
    }[shape]
    src = _stage_replica_files(replicas)
    n_rows = spark.read.parquet(src).count()
    t0 = time.perf_counter()
    q = (
        builder(spark, src, max_files_per_trigger=1)
        .writeStream.outputMode("append")
        .format("noop")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = list(q.recentProgress)
    finally:
        q.stop()
    wall = time.perf_counter() - t0
    batches = [p for p in progress if p.get("numInputRows", 0) > 0]
    state_rows = [
        so["numRowsTotal"]
        for p in batches
        for so in (p.get("stateOperators") or [])
    ]
    state_mem = [
        so.get("memoryUsedBytes", 0)
        for p in batches
        for so in (p.get("stateOperators") or [])
    ]
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in batches
        for so in (p.get("stateOperators") or [])
    )
    return {
        "shape": shape,
        "replicas": replicas,
        "input_rows": n_rows,
        "batches": len(batches),
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_rows / wall, 1),
        "state_rows_max": max(state_rows, default=0),
        "state_rows_end": state_rows[-1] if state_rows else 0,
        "state_memory_mb_max": round(max(state_mem, default=0) / 1e6, 2),
        "rows_dropped_by_watermark": int(dropped),
    }


def main() -> None:
    shapes = [
        s
        for s in os.environ.get(
            "SPARK_GRAFT_SOAK_SHAPES", "windowed_counts,dedup,interval_join"
        ).split(",")
        if s
    ]
    spark = get_spark(app_name="stream_soak")
    for shape in shapes:
        results = []
        for r in REPLICA_STEPS:
            res = _soak(spark, r, shape)
            results.append(res)
            print(json.dumps(res), flush=True)
        if len(results) >= 2:
            a, b = results[0], results[-1]
            print(
                json.dumps(
                    {
                        "shape": shape,
                        "summary": "state growth vs input growth",
                        "input_ratio": round(b["input_rows"] / a["input_rows"], 2),
                        "state_rows_ratio": round(
                            b["state_rows_max"] / max(1, a["state_rows_max"]), 2
                        ),
                        "state_mem_ratio": round(
                            b["state_memory_mb_max"]
                            / max(0.01, a["state_memory_mb_max"]),
                            2,
                        ),
                    }
                )
            )
    spark.stop()


if __name__ == "__main__":
    main()
