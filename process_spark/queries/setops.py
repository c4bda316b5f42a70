"""Set operations & dedup queries (SURVEY.md §2.9, O59-O62)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from process_spark.operators.dedup import exact_dedup, keep_latest
from process_spark.queries._util import t
from process_spark.queries.registry import register


@register(
    "setop_union_all",
    oracle="""
    SELECT key, kind FROM (
      SELECT c_custkey AS key, 'customer' AS kind FROM customer
      UNION ALL
      SELECT s_suppkey AS key, 'supplier' AS kind FROM supplier
    )
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O59: unionByName of two conformed sides (bag semantics)."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.lit("customer").alias("kind")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.lit("supplier").alias("kind")
    )
    return c.unionByName(s)


@register(
    "setop_union_by_name_missing",
    oracle="""
    SELECT n_nationkey AS key, n_name AS name, NULL AS extra FROM nation
    UNION ALL
    SELECT r_regionkey AS key, r_name AS name, 'region' AS extra FROM region
    """,
)
def setop_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O59: unionByName(allowMissingColumns=True) — schema evolution
    across days/files (the reference's multi-day combine)."""
    n = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("key"), F.col("n_name").alias("name")
    )
    r = t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("key"),
        F.col("r_name").alias("name"),
        F.lit("region").alias("extra"),
    )
    return n.unionByName(r, allowMissingColumns=True)


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O60: set intersection (nations having both customers and
    suppliers)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O60: bag intersection — keeps min(multiplicity) copies per key,
    so nations keep as many rows as they have matching suppliers."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@register(
    "setop_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT c_custkey FROM customer
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O61: bag difference (order rows beyond one-per-customer)."""
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.exceptAll(c)


@register(
    "dedup_exact_subset",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def dedup_exact_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O62: exact dedup on a column subset (hash shuffle + map-side
    combine — safe at any scale)."""
    return exact_dedup(
        t(spark, sf_dir, "events").select("user_id", "event_type")
    )


@register(
    "dedup_keep_latest",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, ts, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id, ts, event_type FROM ranked WHERE rn = 1
    """,
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O62 keep-latest: one row per (user, event_type) by recency,
    tie-broken on event_id for determinism."""
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    return keep_latest(
        e.withColumn("__ord", F.struct(F.col("ts"), F.col("event_id"))),
        key=["user_id", "event_type"],
        order_col="__ord",
    ).drop("__ord")
