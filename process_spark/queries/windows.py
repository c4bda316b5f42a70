"""Window-function queries (SURVEY.md §2.7, O48-O55; §2.8 O56-O58).

Every window partitions by a real key (user/order/group) — the
unpartitioned-orderBy single-task anti-pattern is banned engine-wide
(SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from process_spark.operators.relational import topk_per_group
from process_spark.operators.series import sessionize
from process_spark.queries._util import fscaled, t
from process_spark.queries.registry import register


@register(
    "win_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O48: ranking family. Ordering made total by the o_orderkey
    tie-break — rank over a non-unique ordering is nondeterministic."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT user_id, event_id, ts,
           LAG(event_id) OVER w AS prev_event,
           LEAD(event_id) OVER w AS next_event,
           EPOCH(ts) - EPOCH(LAG(ts) OVER w) AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O49: lag/lead — the primitive under heading-delta/tack detection
    (SURVEY.md O54) expressed on the events table. Second deltas via
    double-epoch subtraction, identical arithmetic on both sides."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        (F.col("ts").cast("double") - prev_ts.cast("double")).alias(
            "secs_since_prev"
        ),
    )


@register(
    "win_cumulative",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_orders
    FROM orders
    """,
)
def win_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O50: cumulative frames (running distance/time pattern). The
    running sum goes through exact decimals — frame order differs
    engine-to-engine, plain double accumulation would drift."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("running_orders"),
    )


@register(
    "win_time_range_frame",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY EPOCH(ts)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_last_hour,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY EPOCH(ts)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour
    FROM events
    """,
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O51: trailing time-range frame (rolling 1 h totals per user —
    the rolling-30s-average pattern of SURVEY.md O27/O51)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("sum_last_hour"),
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
    )


@register(
    "win_analytic_values",
    oracle="""
    SELECT user_id, event_id,
           FIRST_VALUE(event_id) OVER w AS first_event,
           LAST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event,
           NTH_VALUE(event_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_event,
           CAST(FLOOR(PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY value, event_id) * 1000000000.0 + 0.5) AS BIGINT) AS pr_e9,
           CAST(FLOOR(CUME_DIST() OVER (PARTITION BY user_id ORDER BY value, event_id) * 1000000000.0 + 0.5) AS BIGINT) AS cd_e9
    FROM events
    WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_analytic_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O52: first/last/nth value + percent_rank/cume_dist."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_val = Window.partitionBy("user_id").orderBy("value", "event_id")
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.first("event_id").over(w).alias("first_event"),
            F.last("event_id").over(w_full).alias("last_event"),
            F.nth_value("event_id", 2).over(w_full).alias("second_event"),
            # Exact-int ratios → identical bits → the 1e-9 floor grid
            # is boundary-risk-free (`_util` float policy).
            F.floor(F.percent_rank().over(w_val) * 1000000000.0 + 0.5)
            .cast("long")
            .alias("pr_e9"),
            F.floor(F.cume_dist().over(w_val) * 1000000000.0 + 0.5)
            .cast("long")
            .alias("cd_e9"),
        )
    )


@register(
    "win_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, ts,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
    FROM flagged
    """,
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O53: gap-based sessionization — the reference's race
    segmentation re-expressed (operators.series.sessionize): lag →
    gap flag → cumulative sum, partitioned by user."""
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return sessionize(
        e, ts_col="ts", gap="30 minutes", partition_by=["user_id"],
        tie_break=["event_id"],
    ).select("user_id", "event_id", "ts", "session_id")


@register(
    "win_session_stats",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_rows
    FROM sess GROUP BY user_id, session_id
    """,
)
def win_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O53/D4: per-session summaries (session start/end/size)."""
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    s = sessionize(
        e, ts_col="ts", gap="30 minutes", partition_by=["user_id"],
        tie_break=["event_id"],
    )
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "sort_global_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_global_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O56+O57: global top-k — Spark plans TakeOrderedAndProject (per-
    partition heap + driver merge), never a full global sort."""
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    SELECT c_mktsegment, c_custkey, c_acctbal
    FROM ranked WHERE rn <= 3
    """,
)
def topk_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O57: top-k per group (operators.relational.topk_per_group)."""
    return topk_per_group(
        t(spark, sf_dir, "customer").select(
            "c_mktsegment", "c_custkey", "c_acctbal"
        ),
        partition_by=["c_mktsegment"],
        order_by=[F.col("c_acctbal").desc(), F.col("c_custkey")],
        k=3,
    )
