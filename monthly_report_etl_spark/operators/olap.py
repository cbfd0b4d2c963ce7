"""Classic OLAP query shapes over the TPC-H-ish testdata — the multi-join
aggregate pipelines every analytics engine is judged on. These exercise
join ordering, partial aggregation and top-k together (the reference never
joins more than a 48-row dim; a real engine must handle fact-to-fact).

Shapes (names follow the TPC-H queries they resemble; data is the driver's
synthetic star schema, constants picked for selectivity on it):

* shipping-priority (Q3-like): 3-way join, filtered both sides, grouped
  revenue, top-10.
* local-supplier-volume (Q5-like): 5-way join through two dimension
  chains, per-nation revenue.
* returned-items (Q10-like): fact-fact join + customer rollup, top-20.

Scale notes: fact-fact joins shuffle both sides on the join key (no way
around data motion); dims broadcast; aggregates get map-side partials;
top-k is TakeOrdered (per-partition heaps), never a global sort.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


SHIPPING_PRIORITY_ORACLE = """
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: dim-filtered 3-way join → grouped revenue → top-10.

    customer broadcasts; orders⋈lineitem shuffles on orderkey once and the
    grouped agg reuses that partitioning (no second exchange)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


LOCAL_SUPPLIER_VOLUME_ORACLE = """
SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
"""


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: 5-way join with a cross-dimension equality (supplier and
    customer share a nation) → per-nation revenue. supplier/nation/customer
    broadcast; the single big shuffle is lineitem⋈orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


RETURNED_ITEMS_ORACLE = """
SELECT c.c_custkey, c.c_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       ROUND(c.c_acctbal, 2) AS c_acctbal
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-lineitem revenue per customer, top-20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", F.round("c_acctbal", 2).alias("c_acctbal"))
    )


REGIONAL_REVENUE_ORACLE = """
SELECT r.r_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY r.r_name
"""


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dimension chain region→nation→customer joined into the fact
    side (completes coverage of every testdata table). The three dims
    broadcast as one chained lookup; lineitem⋈orders is the only
    shuffle."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
    )


UNPIVOT_ORACLE = """
SELECT p_partkey, metric, val FROM (
    SELECT p_partkey,
           CAST(p_retailprice AS DOUBLE) AS retailprice,
           CAST(p_size AS DOUBLE) AS size
    FROM part
) UNPIVOT (val FOR metric IN (retailprice, size))
"""


def unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (``stack``/UNPIVOT) — the inverse of A6's pivot."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    ).unpivot("p_partkey", ["retailprice", "size"], "metric", "val")


POSEXPLODE_ORACLE = """
SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, tok
FROM (
    SELECT doc_id, string_split(text, ' ') AS toks
    FROM documents WHERE doc_id < 20
) t, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g,
     LATERAL (SELECT toks[i] AS tok) x
"""


def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — ordinal-preserving explode (DuckDB needs a lateral
    generate_series to express the ordinal)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).withColumn("pos", F.col("pos").cast("long"))


CATALOG: dict[str, tuple] = {
    "olap_regional_revenue": (regional_revenue, REGIONAL_REVENUE_ORACLE),
    "olap_shipping_priority": (shipping_priority, SHIPPING_PRIORITY_ORACLE),
    "olap_local_supplier_volume": (local_supplier_volume, LOCAL_SUPPLIER_VOLUME_ORACLE),
    "olap_returned_items": (returned_items, RETURNED_ITEMS_ORACLE),
    "unpivot_part": (unpivot_part, UNPIVOT_ORACLE),
    "posexplode_tokens": (posexplode_tokens, POSEXPLODE_ORACLE),
}
