"""Aggregation queries (SURVEY.md §2.6, O38-O47)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from process_spark.queries._util import davg, dsum, fscaled, o_davg, o_dsum, t
from process_spark.queries.registry import register


@register(
    "agg_basic_stats",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {o_dsum('value', 'sum_value')},
           {o_davg('value', 'avg_value')},
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def agg_basic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O38: hash aggregate with the full basic stat set."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", "sum_value"),
            davg("value", "avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT DATE_TRUNC('day', ts) AS day, COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT event_type) AS n_types
    FROM events GROUP BY DATE_TRUNC('day', ts)
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O39: exact distinct counts per day (approx variant is rows-only,
    see agg_approx_distinct). Day key stays a timestamp (date_trunc) on
    both sides — DATE-typed outputs render differently across engines."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


@register("agg_approx_distinct")  # rows-only: HLL sketches are engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O39 approx: HLL approx_count_distinct — the 100 TB path (no
    per-key exact distinct shuffle). Engine-specific sketch → no
    oracle; error bounded vs exact in tests/test_edge_cases.py."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("approx_users"))
    )


@register("agg_approx_percentile")  # rows-only: GK sketch is engine-specific
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O41 approx: percentile_approx (Greenwald-Khanna mergeable
    summary) — the 100 TB percentile path: one streaming pass with
    map-side-combinable sketches, where the exact form materializes
    every group's sorted values. accuracy=10000 bounds the RANK error
    at n/10000 per group. Engine-specific sketch → no oracle; the rank
    error is bounded vs the exact percentile in
    tests/test_edge_cases.py (an approximate operator needs a quality
    contract, not just a row count — same policy as recall@k and the
    HLL bound)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
            F.percentile_approx("value", 0.9, 10000).alias("p90_approx"),
        )
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {o_dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O40: rollup with subtotal + grand-total rows."""
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty"))
    )


@register(
    "agg_cube_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O40: cube + grouping_id disambiguating the margin rows."""
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n")
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {o_dsum('l_extendedprice', 'sum_price')}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O40/O102: explicit GROUPING SETS through the SQL surface —
    independent margins per flag and per status plus a grand total,
    planned as a single Expand + hash aggregate (one fact scan, not
    three)."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                 AS sum_price
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_median_percentile",
    oracle="""
    SELECT l_returnflag,
           CAST(FLOOR(MEDIAN(l_extendedprice) * 1000000.0 + 0.5) AS BIGINT)
             AS median_micro,
           CAST(FLOOR(QUANTILE_CONT(l_extendedprice, 0.9) * 1000000.0
                     + 0.5) AS BIGINT) AS p90_micro
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O41: median + interpolated percentile, hashed as half-up-scaled
    micro-units — the even-n/interpolation formula is an engine seam,
    so raw doubles are a latent mismatch (`_util` float policy; approx
    variants stay rows-only per SURVEY.md §7.3)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            fscaled(F.median("l_extendedprice"), "median_micro"),
            fscaled(F.percentile("l_extendedprice", 0.9), "p90_micro"),
        )
    )


@register(
    "agg_moments_corr",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(STDDEV_SAMP(value) * 10000.0 + 0.5) AS BIGINT) AS sd_e4,
           CAST(FLOOR(VAR_SAMP(value) * 10000.0 + 0.5) AS BIGINT) AS var_e4,
           CAST(FLOOR(CORR(value, CAST(user_id AS DOUBLE)) * 1000000.0
                     + 0.5) AS BIGINT) AS corr_e6
    FROM events GROUP BY event_type
    """,
)
def agg_moments_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O42: stddev/variance/correlation. No exact-decimal form exists —
    hashed as half-up-scaled integers with granularity far above the
    distributed-vs-serial summation noise (`_util` float policy)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            fscaled(F.stddev_samp("value"), "sd_e4", 10000),
            fscaled(F.var_samp("value"), "var_e4", 10000),
            fscaled(
                F.corr(F.col("value"), F.col("user_id").cast("double")), "corr_e6"
            ),
        )
    )


@register(
    "agg_argmax_first_last",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rmax,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value ASC, event_id ASC) AS rmin
      FROM events WHERE value IS NOT NULL
    )
    SELECT user_id,
           MAX(CASE WHEN rmax = 1 THEN event_id END) AS max_value_event,
           MAX(CASE WHEN rmin = 1 THEN event_id END) AS min_value_event,
           MAX(value) AS max_value
    FROM ranked GROUP BY user_id
    """,
)
def agg_argmax_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O43: argmax/argmin via max_by/min_by. Tie-broken on
    (value, event_id) — bare max_by over a non-unique ordering value is
    nondeterministic in any engine, so the oracle could never match."""
    ord_key = F.struct(F.col("value"), F.col("event_id"))
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max_by("event_id", ord_key).alias("max_value_event"),
            F.min_by("event_id", ord_key).alias("min_value_event"),
            F.max("value").alias("max_value"),
        )
    )


@register(
    "agg_collect_sorted_list",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           array_to_string(LIST(o_orderkey ORDER BY o_orderkey), ',') AS order_keys
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_collect_sorted_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O44: array agg, deterministically sorted (collect_list order is
    nondeterministic → always sort_array before exposing).

    The array is exposed as a comma-joined string: the driver's result
    canonicalizer cannot hash list-typed cells, and a joined string of
    bigints renders identically in Spark and DuckDB."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("o_orderkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("order_keys"),
        )
    )


@register(
    "agg_conditional",
    oracle=f"""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS n_clicks,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           {o_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END", 'purchase_value')}
    FROM events GROUP BY user_id
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O45: count_if / sum(when(...)) conditional aggregation."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count_if(F.col("event_type") == "click").alias("n_clicks"),
            F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
            dsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    0.0
                ),
                "purchase_value",
            ),
        )
    )


@register(
    "agg_histogram_2d",
    oracle=f"""
    SELECT CAST(FLOOR(value / 10) * 10 AS DOUBLE) AS value_bin,
           event_type,
           COUNT(*) AS n,
           {o_davg('value', 'avg_in_bin')}
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
)
def agg_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O46: 2-D histogram binning (the polar-table pattern: bin × bin →
    aggregate; SURVEY.md O46)."""
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vbin = (F.floor(F.col("value") / 10) * 10).cast("double")
    return e.groupBy(vbin.alias("value_bin"), F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n"), davg("value", "avg_in_bin")
    )


@register(
    "agg_having",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {o_dsum('o_totalprice', 'total_spend')}
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O47: post-aggregation filter (HAVING)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_spend"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "agg_salted_two_phase",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe hot-key rollup (SURVEY.md §4.2): event_type has only 5
    values, so a plain groupBy funnels 1/5 of 100 TB through single
    reducers; the salted two-phase spreads phase 1 over 16 reducers per
    key. Decimal sums make the two-phase result bit-equal to the plain
    one — which is exactly what the oracle checks."""
    from process_spark.operators.skew import salted_sum

    e = t(spark, sf_dir, "events")
    sums = salted_sum(
        e,
        keys=["event_type"],
        value=F.col("value").cast("decimal(18,6)"),
        alias="__dec_total",
        salt=F.xxhash64("event_id"),
        n_salts=16,
    )
    counts = salted_sum(
        e,
        keys=["event_type"],
        value=F.lit(1).cast("long"),
        alias="n",
        salt=F.xxhash64("event_id"),
        n_salts=16,
    )
    return sums.join(counts, "event_type").select(
        "event_type",
        F.col("__dec_total").cast("double").alias("total_value"),
        "n",
    )


@register(
    "profile_column_stats",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) - COUNT(o_orderpriority) AS null_priorities,
           MIN(o_orderdate) AS min_date,
           MAX(o_orderdate) AS max_date,
           {o_davg('o_totalprice', 'avg_price')},
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    """,
)
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling in one scan — the dataset-card pass a training
    pipeline runs before ingesting a new source: row counts, key
    cardinality, null counts, value ranges, exact-decimal averages.
    One job, one aggregate, no shuffle beyond the final combine."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        (F.count(F.lit(1)) - F.count("o_orderpriority")).alias("null_priorities"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
        davg("o_totalprice", "avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "agg_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
)
def agg_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O38/O43 composite — ordered funnel analysis, the event-analytics
    report every product pipeline runs: per user, the first 'view',
    the first 'click' STRICTLY AFTER that view, and the first
    'purchase' strictly after that click (stage order enforced on
    event time, not just existence — a click before the first view
    does not convert). Later stages left-join, so drop-off is visible
    as NULLs and stage conversion rates are one aggregation away.
    Scale shape: three filtered map-side-combined min-aggregations
    chained by user-keyed equi-joins — no window over the raw event
    log, no self-join on the full table; every intermediate is bounded
    by |users|."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return v.join(c, "user_id", "left").join(p, "user_id", "left").select(
        "user_id", "t_view", "t_click", "t_purchase"
    )


@register(
    "agg_cohort_retention",
    oracle="""
    WITH firstd AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT)
             AS day_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM act a JOIN firstd f USING (user_id)
    GROUP BY 1, 2
    """,
)
def agg_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O38/O39 composite — cohort retention, the other standard
    event-analytics report: users cohorted by first-seen day, then for
    each (cohort_day, day_offset) the count of distinct cohort members
    active that many days later — the retention matrix a dashboard
    heatmaps. Scale shape: one distinct-(user, day) projection (the
    activity table — map-side combinable), one min-aggregation for the
    cohort key, one user-keyed join, and a final count-distinct over a
    bounded (cohort × offset) domain. No window anywhere; everything
    shuffles on user_id or the tiny report key."""
    e = t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    firstd = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = e.distinct()
    return (
        act.join(firstd, "user_id")
        .groupBy(
            # DATE-typed output cells stringify differently across the
            # two engines' pandas bridges — emit the ISO string both
            # sides (the comparator-safe form for calendar keys)
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


@register(
    "agg_funnel_windowed",
    # agg_funnel_conversion's chained-min CTEs plus one bounded-gap
    # predicate per transition: integral-second comparison on floored
    # epoch seconds (Spark ts.cast(long) == DuckDB FLOOR(epoch(ts))),
    # so the hash is exact.
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
        AND CAST(FLOOR(epoch(e.ts)) AS BIGINT)
            - CAST(FLOOR(epoch(v.t_view)) AS BIGINT) <= 86400
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        AND CAST(FLOOR(epoch(e.ts)) AS BIGINT)
            - CAST(FLOOR(epoch(c.t_click)) AS BIGINT) <= 259200
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
)
def agg_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O38/O43 composite — agg_funnel_conversion with PER-TRANSITION
    WINDOWS, the form real funnel reports take: a click only converts
    within 24 hours of the first view, a purchase within 72 hours of
    that click — an unbounded-gap funnel overstates conversion by
    crediting returns that are really new journeys. Built on the
    parameterized :func:`funnel_stages` operator (any stage sequence,
    any per-transition gap in seconds), keeping the hardcoded twin's
    scale shape exactly: one filtered map-side min-aggregation per
    stage chained by user-keyed joins, no window over the raw log,
    every intermediate bounded by |users|."""
    from process_spark.operators.series import funnel_stages

    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    out = funnel_stages(
        e,
        stages=["view", "click", "purchase"],
        max_gaps=[86400, 259200],
    )
    return out.select(
        "user_id",
        F.col("t_1").alias("t_view"),
        F.col("t_2").alias("t_click"),
        F.col("t_3").alias("t_purchase"),
    )
