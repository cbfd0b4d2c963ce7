"""Similarity search over the ``embeddings`` table: brute-force cosine
top-k (exact baseline) and a random-hyperplane-LSH bucketed ANN variant
(the scale path).

Scale design (100 TB of vectors):

* brute force is a broadcast cross join (queries are broadcast; the corpus
  streams) + per-partition top-k via window — exact, O(Q x N), right when
  Q is small;
* LSH hashes every vector to a bucket signature as a per-row projection,
  then only joins query buckets — candidate volume drops by ~2^bits;
  recall is tunable with multiple tables (OR-amplification);
* IVF trains a k-means coarse quantizer (distributed Lloyd iterations —
  only the k x dim model crosses to the driver, like MLlib), then each
  query probes its nearest clusters with exact re-rank — the best
  recall/candidate trade on clustered corpora, rows-only for the SQL gate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monthly_report_etl_spark.functions.vectors import cosine_similarity

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query set

KNN_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {N_QUERIES}),
scored AS (
    SELECT q.query_id, v.vec_id AS neighbor_id,
           list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(range(1, len(q.qe) + 1), i -> q.qe[i] * v.e[i])),
               (acc, x) -> acc + x)
           / (sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                  list_transform(range(1, len(q.qe) + 1), i -> q.qe[i] * q.qe[i])),
                  (acc, x) -> acc + x))
            * sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                  list_transform(range(1, len(v.e) + 1), i -> v.e[i] * v.e[i])),
                  (acc, x) -> acc + x))) AS cos
    FROM q JOIN v ON v.vec_id <> q.query_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS rn
    FROM scored
)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {TOP_K}
"""


def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the query set (vec_id < N_QUERIES).

    Queries broadcast; the corpus streams through one stage computing the
    fold-dot-product; per-query top-k via window on a small intermediate
    (Q x N rows partitioned by query). Tiebreak on neighbor_id makes the
    result total-ordered for the oracle.
    """
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine_similarity(F.col("qe"), F.col("e")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos", 6).alias("cosine"),
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (rows-only for the driver gate; recall-tested in pytest)
# ---------------------------------------------------------------------------

# 4 bits x 8 OR'd tables: for the top-5 neighbors of iid random 64-d
# vectors (angles ~65-75°, P(bit agree) ≈ 0.60-0.64), per-table collision
# ≈ 0.62^4 ≈ 0.15 → candidate recall 1-(1-0.15)^8 ≈ 0.73 before re-rank.
# More bits would need clustered data to pay off.
LSH_BITS = 4
LSH_TABLES = 8
_DIM = 64


def _hyperplane(table: int, bit: int) -> list[float]:
    """Deterministic pseudo-random hyperplane — no RNG state, reproducible
    across sessions: component d = sin(1e4*table + 100*bit + d) (iid-ish
    in [-1, 1], fixed at plan-build time)."""
    return [math.sin(10_000.0 * table + 100.0 * bit + d) for d in range(_DIM)]


def _lit_dot(e_col: F.Column, weights: list[float]) -> F.Column:
    """dot(e, literal weight vector) as plain indexed arithmetic:
    ``e[0]*w0 + e[1]*w1 + ...`` summed in a balanced tree.

    Higher-order ``aggregate``/``zip_with`` folds are CodegenFallback
    (interpreted per row — the 10-30x trap measured on minhash shingles);
    indexed element access + multiply-add stays inside whole-stage
    codegen. The balanced tree keeps generated-expression depth O(log n)
    so janino never sees a 64-deep left chain.
    """
    terms = [e_col[d] * F.lit(w) for d, w in enumerate(weights)]
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def _bucket_expr(e_col: F.Column, table: int) -> F.Column:
    """LSH bucket id: sign bits of LSH_BITS full-dimension hyperplane dots
    (codegen'd indexed arithmetic — no HOF, no UDF)."""
    bits = []
    for bit in range(LSH_BITS):
        dot = _lit_dot(e_col, _hyperplane(table, bit))
        bits.append(F.when(dot > 0, F.lit(1 << bit)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH over LSH_TABLES tables,
    exact cosine re-rank inside the union of matching buckets.

    Per-row bucket projection → equi-join on (table, bucket) against the
    broadcast query buckets → exact re-rank of candidates. The join key
    volume is #vectors x LSH_TABLES small ints — the 100 TB shape.
    """
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    buckets = v.select(
        "vec_id",
        "e",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("table"), _bucket_expr(F.col("e"), t).alias("bucket"))
                    for t in range(LSH_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "e", "tb.table", "tb.bucket")
    q = buckets.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        "table",
        "bucket",
    )
    cand = (
        buckets.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qe", "vec_id", "e")
        .distinct()
    )
    scored = cand.withColumn("cos", cosine_similarity(F.col("qe"), F.col("e")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos", 6).alias("cosine"),
            "rn",
        )
    )


CATALOG: dict[str, tuple] = {
    "similarity_knn_brute_force": (knn_brute_force, KNN_ORACLE),
    "similarity_ann_lsh": (ann_lsh_topk, None),  # approximate: rows-only + pytest recall
}


# ---------------------------------------------------------------------------
# IVF ANN: k-means coarse quantizer + probe-limited exact search
# ---------------------------------------------------------------------------

IVF_CLUSTERS = 16
IVF_ITERS = 3
IVF_PROBES = 4


def _normalized(df: DataFrame, vec_col: str = "e") -> DataFrame:
    from monthly_report_etl_spark.functions.vectors import l2_norm

    n = l2_norm(F.col(vec_col))
    return df.withColumn(
        vec_col, F.transform(F.col(vec_col), lambda x: x / n)
    )


def _nearest_centroid(vec_col, centroids: list[list[float]]):
    """argmax dot(vec, centroid) over the (driver-held) centroid list —
    expressed as array_max over (dot, cid) structs, pure JVM expressions
    (codegen'd indexed dots — see _lit_dot)."""
    scored = []
    for cid, c in enumerate(centroids):
        dot = _lit_dot(vec_col, list(c))
        scored.append(F.struct(dot.alias("dot"), F.lit(cid).alias("cid")))
    return F.array_max(F.array(*scored))["cid"]


def train_ivf_centroids(
    spark: SparkSession, sf_dir: str, k: int = IVF_CLUSTERS, iters: int = IVF_ITERS
) -> list[list[float]]:
    """Lloyd's k-means on normalized vectors (cosine k-means).

    Assignment and the per-dimension mean are fully distributed
    (posexplode → groupBy(cluster, dim) avg → reassemble). Only the MODEL
    (k x dim floats) crosses to the driver between iterations — the same
    contract as MLlib's KMeans; data never does. Init is the first k
    vectors by vec_id (deterministic, no RNG).
    """
    v = _normalized(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
    )
    centroids = [
        r["e"] for r in v.orderBy("vec_id").limit(k).collect()
    ]  # k x 64 floats: model init, not a data path
    for _ in range(iters):
        assigned = v.withColumn("cid", _nearest_centroid(F.col("e"), centroids))
        dims = assigned.select(
            "cid", F.posexplode("e").alias("dim", "x")
        )
        means = (
            dims.groupBy("cid", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
        )
        new = {r["cid"]: r["centroid"] for r in means.collect()}  # model state only
        centroids = [new.get(cid, centroids[cid]) for cid in range(k)]
    return centroids


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: assign the corpus to trained coarse clusters; each query
    searches only its IVF_PROBES nearest clusters with exact cosine, then
    window top-k.

    The scale shape: the corpus is scanned once to tag cluster ids (pure
    projection), and the search join is equi on cluster id — candidate
    volume drops to ~PROBES/K of the corpus vs brute force. Centroids are
    plan literals (k x dim), no broadcast table needed.
    """
    centroids = train_ivf_centroids(spark, sf_dir)
    v = _normalized(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
    )
    tagged = v.withColumn("cid", _nearest_centroid(F.col("e"), centroids))
    q = tagged.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    # per-query probe list: top IVF_PROBES centroids by dot product
    probe_structs = []
    for cid, c in enumerate(centroids):
        dot = _lit_dot(F.col("qe"), list(c))
        probe_structs.append(F.struct(dot.alias("dot"), F.lit(cid).alias("cid")))
    probes = F.slice(
        F.reverse(F.array_sort(F.array(*probe_structs))), 1, IVF_PROBES
    )
    q = q.withColumn("probe_cid", F.explode(F.transform(probes, lambda s: s["cid"])))
    cand = tagged.join(
        F.broadcast(q), (F.col("cid") == F.col("probe_cid")) & (F.col("vec_id") != F.col("query_id"))
    )
    scored = cand.withColumn("cos", cosine_similarity(F.col("qe"), F.col("e")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), F.round("cos", 6).alias("cosine"), "rn")
    )


CATALOG["similarity_ivf_topk"] = (ivf_topk, None)  # iterative model: rows-only + pytest recall
