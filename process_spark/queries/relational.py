"""Scan / filter / join queries (SURVEY.md §2.1, §2.2, §2.5).

Every query here is oracle-checked against DuckDB at sf0.01. Plan
notes (verified with .explain): dim joins broadcast; fact-fact joins
shuffle on the join key with AQE handling skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from process_spark.operators.relational import asof_join, interval_join
from process_spark.queries._util import davg, dsum, o_davg, o_dsum, t
from process_spark.queries.registry import register


# --- flagship (O2 O12 O22 O38 O56) ---------------------------------------

@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum('l_quantity', 'sum_qty')},
           {o_dsum('l_extendedprice', 'sum_base_price')},
           {o_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {o_davg('l_quantity', 'avg_qty')},
           {o_davg('l_extendedprice', 'avg_price')},
           {o_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary (SURVEY.md §7.2 PR1).

    Scale: single hash aggregate over the fact table, partial+final
    (map-side combine) — the shuffle carries only |groups| rows.
    Predicate pushes to the parquet scan.
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- scans & filters (O2, O12, O13) ---------------------------------------

@register(
    "scan_project_filter",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice BETWEEN 1000 AND 50000
    """,
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2+O12: projection + predicate; both push into the parquet scan."""
    return (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderstatus") == "F")
            & F.col("o_totalprice").between(1000, 50000)
        )
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@register(
    "filter_in_null_combo",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND c_acctbal IS NOT NULL AND c_acctbal > 0
    """,
)
def filter_in_null_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O12: IN-list + null check + boolean combination."""
    c = t(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_acctbal").isNotNull()
        & (F.col("c_acctbal") > 0)
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "clean_clamp_outliers",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN value < 0 THEN 0 WHEN value > 100 THEN 100 ELSE value END AS value_clamped
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    """,
)
def clean_clamp_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13: data cleaning — mandatory-field drop + outlier clamping.
    NULL measurements stay NULL: Spark's greatest/least SKIP nulls
    (greatest(NULL, 0) = 0), which would silently fabricate a 0.0
    reading for a missing value — the isNotNull guard keeps the clamp
    honest and matches the oracle's CASE."""
    e = t(spark, sf_dir, "events").dropna(subset=["user_id", "event_type"])
    clamped = F.when(
        F.col("value").isNotNull(),
        F.least(F.greatest(F.col("value"), F.lit(0.0)), F.lit(100.0)),
    )
    return e.select("event_id", "user_id", clamped.alias("value_clamped"))


# --- joins (O29-O33, O36) --------------------------------------------------

@register(
    "join_fact_dims_chain",
    oracle=f"""
    SELECT n_name AS nation, r_name AS region,
           {o_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n_name, r_name
    ORDER BY nation, region
    """,
)
def join_fact_dims_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O29+O30: fact⋈fact⋈dim chain. lineitem⋈orders shuffles on the
    order key; nation/region are broadcast (hinted — 25/5 rows at every
    SF, bounded forever). Customer GROWS with SF, so it carries no
    hint: AQE broadcasts it at small SF from measured size and shuffles
    it at 100 TB (SURVEY.md §4.2)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("nation", "region")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O31: left outer preserving customers with zero orders."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_full_outer",
    oracle="""
    WITH su AS (SELECT s_nationkey, COUNT(*) AS n_sup FROM supplier GROUP BY s_nationkey),
         cu AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey)
    SELECT COALESCE(s_nationkey, c_nationkey) AS nationkey,
           COALESCE(n_sup, 0) AS n_sup, COALESCE(n_cust, 0) AS n_cust
    FROM su FULL OUTER JOIN cu ON s_nationkey = c_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O31: full outer of two grouped sides."""
    su = (
        t(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_sup"))
    )
    cu = (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    j = su.join(cu, su.s_nationkey == cu.c_nationkey, "outer")
    return j.select(
        F.coalesce("s_nationkey", "c_nationkey").alias("nationkey"),
        F.coalesce("n_sup", F.lit(0)).alias("n_sup"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal < -900
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O31: right outer — all deeply-negative-balance customers kept
    even with no orders (null order columns). Catalyst plans it as the
    mirrored left join with the filtered side broadcast."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") < -900)
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_totalprice", "c_name"
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT l.l_orderkey, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price,
           MAX(o.o_orderpriority) AS priority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY l.l_orderkey
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O29 at scale: fact⋈fact equi-join through *bucketed* tables —
    both sides written bucketed by the join key so the sort-merge join
    reads co-located buckets with NO shuffle exchange (the decisive
    optimization for repeated 100 TB fact-fact joins; explain() shows
    no Exchange above either scan). The bucketed copies are
    materialized once per (sf_dir, session) into the local warehouse.
    Results are identical to the plain join, so the oracle checks the
    logical semantics while the physical plan is the point."""
    import hashlib

    from process_spark.operators.relational import bucketed_join

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderpriority"
    )
    j = bucketed_join(
        spark,
        li,
        o,
        left_key="l_orderkey",
        right_key="o_orderkey",
        n_buckets=8,
        tag=f"q_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    return (
        j.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_price"),
            F.max("o_orderpriority").alias("priority"),
        )
    )


@register(
    "join_salted_skew",
    oracle="""
    WITH user_totals AS (
      SELECT user_id, COUNT(*) AS n_user,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS user_value
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, u.n_user, u.user_value
    FROM events e JOIN user_totals u ON e.user_id = u.user_id
    WHERE e.event_type = 'click'
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact⋈dim join (SURVEY.md §4.2 "salting for
    skew"): enrich each click with its user's totals through a salted
    join — the big side salted on a unique column, the per-user dim
    replicated across 8 salt values, so one hot user's events spread
    over 8 reducers instead of one. Results are identical to the plain
    join, which is what the oracle checks."""
    from process_spark.operators.skew import salted_join

    e = t(spark, sf_dir, "events")
    user_totals = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_user"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("user_value"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id"
    )
    return salted_join(
        clicks,
        user_totals,
        key="user_id",
        salt=F.xxhash64("event_id"),
        n_salts=8,
    ).select("event_id", "user_id", "n_user", "user_value")


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O32: EXISTS → left semi join."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O33: NOT EXISTS → left anti join.

    The price filter makes the result discriminating: every customer
    has *some* order in the testdata, so an unfiltered anti join is
    vacuously empty and the hash check proves nothing."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross_blocked",
    oracle="""
    SELECT r1.r_name AS region_a, r2.r_name AS region_b
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey < r2.r_regionkey
    """,
)
def join_cross_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O36: cross join with an ordering predicate bounding the output."""
    r1 = t(spark, sf_dir, "region").alias("r1")
    r2 = t(spark, sf_dir, "region").alias("r2")
    return (
        r1.crossJoin(r2)
        .filter(F.col("r1.r_regionkey") < F.col("r2.r_regionkey"))
        .select(
            F.col("r1.r_name").alias("region_a"), F.col("r2.r_name").alias("region_b")
        )
    )


# --- interval & as-of joins (O34, O35) -------------------------------------

@register(
    "join_interval_events_windows",
    oracle="""
    WITH iv AS (
      SELECT user_id AS iv_user,
             MIN(ts) AS iv_start,
             MIN(ts) + INTERVAL 2 DAY AS iv_end
      FROM events GROUP BY user_id
    )
    SELECT iv_user, COUNT(*) AS n_events_in_window
    FROM events JOIN iv
      ON user_id = iv_user AND ts >= iv_start AND ts < iv_end
    GROUP BY iv_user
    """,
)
def join_interval_events_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O34: point-in-interval join via the bucketed rewrite
    (operators.relational.interval_join) — equi-join on time bucket +
    residual predicate; no BroadcastNestedLoop at scale."""
    e = t(spark, sf_dir, "events")
    iv = e.groupBy(F.col("user_id").alias("iv_user")).agg(
        F.min("ts").alias("iv_start"),
        (F.min("ts") + F.expr("INTERVAL 2 DAY")).alias("iv_end"),
    )
    joined = interval_join(
        e.select("ts", "user_id"),
        iv,
        point_ts="ts",
        start_ts="iv_start",
        end_ts="iv_end",
        bucket_seconds=86400,
    )
    return (
        joined.filter(F.col("user_id") == F.col("iv_user"))
        .groupBy("iv_user")
        .agg(F.count(F.lit(1)).alias("n_events_in_window"))
    )


@register(
    "join_asof_purchase_before_click",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT MAX(p.ts) FROM events p
             WHERE p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts
           ) AS last_purchase_ts
    FROM events e
    WHERE e.event_type = 'click'
    """,
)
def join_asof_purchase_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O35: as-of join — for each click, the most recent prior purchase
    ts for the same user (operators.relational.asof_join: union + LOCF,
    one shuffle, no range explosion)."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("ts").alias("last_purchase_ts")
    )
    return asof_join(
        clicks,
        purchases,
        on_ts="ts",
        right_ts="p_ts",
        by=["user_id"],
        value_cols=["last_purchase_ts"],
        direction="backward",
    ).select("event_id", "user_id", "ts", "last_purchase_ts")


@register(
    "sort_within_partitions",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice
    FROM lineitem
    """,
)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O58: write-time clustering — repartition by order key, sort each
    partition by (orderkey, linenumber). The row SET is unchanged (the
    oracle checks exactly that); the value is the layout: range-free
    clustering feeds min/max-indexed parquet at 100 TB without a global
    sort's single range-partitioner."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"
    )
    return li.repartition(F.col("l_orderkey")).sortWithinPartitions(
        "l_orderkey", "l_linenumber"
    )
