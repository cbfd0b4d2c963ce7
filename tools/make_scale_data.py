"""Build an Nx scale-up of /root/testdata/sf0.1 for the SCALE.md §8
scaling-curve study (sf0.1 → sf1 wall-time ratios; r7 adds a 30x
documents-only step for the two worst absolute dedup entries).

Env knobs:
    SPARK_GRAFT_SCALE_DIR       output dir (default /tmp/spark_graft_scale/sf1)
    SPARK_GRAFT_SCALE_REPLICAS  replication factor N (default 10)
    SPARK_GRAFT_SCALE_TABLES    comma list to build a subset (default: all) —
                                e.g. "documents" for the 30x dedup step,
                                since prefix-jaccard/minhash read only it

This is a MEASUREMENT artifact, not test input: correctness runs only on
the driver-generated testdata; this dataset exists so super-linear
operators can be caught at 10x before they'd be caught at 1000x.

Replication model (replica i in 0..9, replica 0 = the original rows):

* dimensions (region, nation, customer, supplier, part) copy unchanged —
  facts grow 10x against fixed dimensions, the realistic shape;
* orders/lineitem: o_orderkey / l_orderkey offset by i * (max+1) so the
  fact-fact join keys stay consistent within a replica and disjoint
  across replicas; dimension FKs (custkey/partkey/suppkey) unchanged;
* events: event_id and user_id offset — 10x users at the same per-user
  event density (per-key state must not grow with SF);
* documents: doc_id offset and every whitespace token of replicas i>0
  suffixed with `~i`, so each replica reproduces the original's
  near-dup/shingle structure internally while sharing NO shingles across
  replicas — corpus 10x bigger at the same dup rate and posting-list
  skew, which is the honest scaling model for dedup (10 identical copies
  would instead manufacture a quadratic cross-replica near-dup blowup);
* embeddings: vec_id offset, vectors copied — the query set (vec_id <
  10) stays fixed while candidate volume scales 10x.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale/sf1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
TABLES = {
    t
    for t in os.environ.get(
        "SPARK_GRAFT_SCALE_TABLES",
        "region,nation,customer,supplier,part,orders,lineitem,events,documents,embeddings",
    ).split(",")
    if t
}

DIMS = ("region", "nation", "customer", "supplier", "part")


def _read(name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SRC}/{name}.parquet")


def _write(df: pd.DataFrame, name: str) -> None:
    df.to_parquet(f"{OUT}/{name}.parquet", index=False)
    print(f"{name}: {len(df)} rows", flush=True)


def _replicate(df: pd.DataFrame, offsets: dict[str, int], n: int = REPLICAS) -> pd.DataFrame:
    parts = []
    for i in range(n):
        rep = df.copy(deep=False)
        for col, step in offsets.items():
            rep[col] = rep[col] + i * step
        parts.append(rep)
    return pd.concat(parts, ignore_index=True)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    for name in DIMS:
        if name in TABLES:
            _write(_read(name), name)

    if {"orders", "lineitem"} & TABLES:
        orders = _read("orders")
        okey_step = int(orders["o_orderkey"].max()) + 1
        if "orders" in TABLES:
            _write(_replicate(orders, {"o_orderkey": okey_step}), "orders")
        if "lineitem" in TABLES:
            lineitem = _read("lineitem")
            _write(_replicate(lineitem, {"l_orderkey": okey_step}), "lineitem")

    if "events" in TABLES:
        events = _read("events")
        _write(
            _replicate(
                events,
                {
                    "event_id": int(events["event_id"].max()) + 1,
                    "user_id": int(events["user_id"].max()) + 1,
                },
            ),
            "events",
        )

    if "documents" in TABLES:
        docs = _read("documents")
        dkey_step = int(docs["doc_id"].max()) + 1
        parts = [docs]
        for i in range(1, REPLICAS):
            rep = docs.copy()
            rep["doc_id"] = rep["doc_id"] + i * dkey_step
            tag = f"~{i}"
            rep["text"] = rep["text"].map(
                lambda t: " ".join(tok + tag for tok in t.split())
            )
            parts.append(rep)
        _write(pd.concat(parts, ignore_index=True), "documents")

    if "embeddings" in TABLES:
        emb = _read("embeddings")
        _write(
            _replicate(emb, {"vec_id": int(emb["vec_id"].max()) + 1}), "embeddings"
        )


if __name__ == "__main__":
    sys.exit(main())
