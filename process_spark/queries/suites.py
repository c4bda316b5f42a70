"""Multi-operator suite queries for the driver's graded window.

The driver grades the first 50 registry entries (one CORRECTNESS row
per query). Single-operator demo queries would cap driver evidence at
50 of SURVEY.md §2's ~80 oracle-checkable operators, so operators that
share a table and grain are ALSO exercised together in one suite query
(exactly as q1 covers scan+filter+agg+sort at once). Each suite
composes the same engine primitives (functions/, operators/) as the
per-operator queries, which stay registered below the window for
focused debugging.

Hash-stability rules are inherited from the per-operator queries they
compose (see queries/_util.py): exact-decimal sums, 6-dp rounding of
transcendentals, explicit tie-breaks on every ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from process_spark.functions import angles, geo
from process_spark.operators.series import (
    forward_fill,
    linear_interpolate,
    sessionize,
)
from process_spark.queries._util import dsum, o_dsum, o_davg, o_pmod, t
from process_spark.queries.registry import register


# --- NMEA scalar math: O15 O16 O17 O18 O19 O20 -----------------------------

@register(
    "nmea_scalar_suite",
    oracle=f"""
    WITH base AS (
      SELECT event_id, value FROM events WHERE value IS NOT NULL
    ), obs AS (
      SELECT event_id, value,
             value AS bs,
             FMOD({o_pmod('value * 13', '360')}, 180) AS awa,
             value * CAST(1.5 AS DOUBLE) + CAST(4 AS DOUBLE) AS aws,
             37.0 + value / 100 AS lat1, -122.0 - value / 200 AS lon1,
             37.0 + value / 90  AS lat2, -122.0 - value / 210 AS lon2
      FROM base
    ), tw AS (
      SELECT *,
             SQRT(aws*aws + bs*bs - 2*aws*bs*COS(RADIANS(awa))) AS tws_raw,
             DEGREES(ATAN2(aws * SIN(RADIANS(awa)),
                           aws * COS(RADIANS(awa)) - bs)) AS twa_raw
      FROM obs
    )
    SELECT event_id,
           value / (3600.0 / 1852.0) AS speed_mps,
           value * 1852.0 AS dist_m,
           RADIANS(value) AS val_rad,
           DEGREES(value / 10) AS val_deg,
           {o_pmod('value + 16.0', '360.0')} AS hdg_true,
           {o_pmod('value - 16.0', '360.0')} AS hdg_mag,
           {o_pmod('value * 7', '360')} AS norm360,
           {o_pmod('(value * 7 + 180)', '360')} - 180 AS norm180,
           {o_pmod('((value * 7 - value * 3) + 180)', '360')} - 180 AS delta,
           CASE WHEN value > 0 THEN ROUND(tws_raw, 6) END AS tws,
           CASE WHEN value > 0 THEN ROUND(twa_raw, 6) END AS twa,
           CASE WHEN value > 0 THEN ROUND(bs * COS(RADIANS(twa_raw)), 6) END AS vmg,
           ROUND(2 * 6371000.0 * ASIN(SQRT(
             POW(SIN((RADIANS(lat2) - RADIANS(lat1)) / 2), 2)
             + COS(RADIANS(lat1)) * COS(RADIANS(lat2))
               * POW(SIN((RADIANS(lon2) - RADIANS(lon1)) / 2), 2)
           )), 6) AS hav_m
    FROM tw
    """,
)
def nmea_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O15+O16+O17+O18+O19+O20 in one pass over events.value: unit
    conversions, magnetic/true heading, angle wrap/delta, true wind,
    VMG, and haversine — the reference's full per-sample scalar math
    (functions.angles / functions.geo), every column a codegen'd
    expression. Wind columns are NULL for non-positive speeds; trig
    outputs rounded to 6 dp on both sides (ULP noise)."""
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = F.col("value")
    bs = v
    awa = angles.norm_360(bs * 13) % 180
    aws = bs * 1.5 + 4
    twa_raw = angles.true_wind_angle(aws, awa, bs)
    wind_ok = v > 0
    return e.select(
        "event_id",
        angles.knots_to_mps("value").alias("speed_mps"),
        angles.nm_to_meters("value").alias("dist_m"),
        F.radians("value").alias("val_rad"),
        F.degrees(v / 10).alias("val_deg"),
        angles.mag_to_true(v, F.lit(16.0)).alias("hdg_true"),
        angles.norm_360(v - F.lit(16.0)).alias("hdg_mag"),
        angles.norm_360(v * 7).alias("norm360"),
        angles.norm_180(v * 7).alias("norm180"),
        angles.angle_diff(v * 7, v * 3).alias("delta"),
        F.when(wind_ok, F.round(angles.true_wind_speed(aws, awa, bs), 6)).alias(
            "tws"
        ),
        F.when(wind_ok, F.round(twa_raw, 6)).alias("twa"),
        F.when(wind_ok, F.round(angles.vmg(bs, twa_raw), 6)).alias("vmg"),
        F.round(
            geo.haversine_m(
                F.lit(37.0) + v / 100,
                F.lit(-122.0) - v / 200,
                F.lit(37.0) + v / 90,
                F.lit(-122.0) - v / 210,
            ),
            6,
        ).alias("hav_m"),
    )


# --- Aggregates: O43 + O45 -------------------------------------------------

@register(
    "agg_argmax_conditional",
    oracle=f"""
    WITH base AS (
      SELECT user_id, event_id, value, event_type
      FROM events WHERE value IS NOT NULL
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id DESC) AS rmax,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY value ASC, event_id ASC) AS rmin
      FROM base
    )
    SELECT user_id,
           MAX(CASE WHEN rmax = 1 THEN event_id END) AS max_value_event,
           MAX(CASE WHEN rmin = 1 THEN event_id END) AS min_value_event,
           MAX(value) AS max_value,
           COUNT(*) FILTER (WHERE event_type = 'click') AS n_clicks,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           {o_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END",
                   'purchase_value')}
    FROM ranked GROUP BY user_id
    """,
)
def agg_argmax_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O43+O45 per user in one hash aggregate: argmax/argmin via
    max_by/min_by (tie-broken on (value, event_id)) plus count_if /
    sum(when(...)) conditional aggregation."""
    ord_key = F.struct(F.col("value"), F.col("event_id"))
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max_by("event_id", ord_key).alias("max_value_event"),
            F.min_by("event_id", ord_key).alias("min_value_event"),
            F.max("value").alias("max_value"),
            F.count_if(F.col("event_type") == "click").alias("n_clicks"),
            F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
            dsum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0.0),
                "purchase_value",
            ),
        )
    )


# --- Aggregates: O46 + O47 -------------------------------------------------

@register(
    "agg_histogram_having",
    oracle=f"""
    SELECT CAST(FLOOR(value / 10) * 10 AS DOUBLE) AS value_bin,
           event_type,
           COUNT(*) AS n,
           {o_davg('value', 'avg_in_bin')}
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    HAVING COUNT(*) >= 5
    """,
)
def agg_histogram_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O46+O47: 2-D histogram binning with a post-aggregation HAVING
    filter on the bin population."""
    from process_spark.queries._util import davg

    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vbin = (F.floor(F.col("value") / 10) * 10).cast("double")
    return (
        e.groupBy(vbin.alias("value_bin"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), davg("value", "avg_in_bin"))
        .filter(F.col("n") >= 5)
    )


# --- Windows over orders: O48 + O50 ----------------------------------------

@register(
    "win_orders_suite",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER wp AS rn,
           RANK() OVER wp AS rnk,
           DENSE_RANK() OVER wp AS drnk,
           NTILE(4) OVER wp AS quartile,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER wd AS DOUBLE)
             AS running_spend,
           COUNT(*) OVER wd AS running_orders
    FROM orders
    WINDOW wp AS (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey),
           wd AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def win_orders_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O48+O50 per order row: the ranking family over a price window
    plus cumulative frames over a date window (running spend through
    exact decimals — frame order differs engine-to-engine)."""
    wp = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    wd = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(wp).alias("rn"),
        F.rank().over(wp).alias("rnk"),
        F.dense_rank().over(wp).alias("drnk"),
        F.ntile(4).over(wp).alias("quartile"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(wd)
        .cast("double")
        .alias("running_spend"),
        F.count(F.lit(1)).over(wd).alias("running_orders"),
    )


# --- Windows over events: O37 O49 O51 O52 O53 ------------------------------

@register(
    "win_events_suite",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             floor(epoch(ts)) AS tsec,
             CASE WHEN LAG(ts) OVER wo IS NULL
                   OR ts > LAG(ts) OVER wo + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW wo AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT user_id, event_id, ts,
           LAG(event_id) OVER wo AS prev_event,
           LEAD(event_id) OVER wo AS next_event,
           EPOCH(ts) - EPOCH(LAG(ts) OVER wo) AS secs_since_prev,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER wr AS DOUBLE)
             AS sum_last_hour,
           COUNT(value) OVER wr AS n_last_hour,
           FIRST_VALUE(event_id) OVER wo AS first_event,
           LAST_VALUE(event_id) OVER wf AS last_event,
           NTH_VALUE(event_id, 2) OVER wf AS second_event,
           ROUND(PERCENT_RANK() OVER wv, 9) AS pr,
           ROUND(CUME_DIST() OVER wv, 9) AS cd,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
    FROM flagged
    WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id),
           wf AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           wv AS (PARTITION BY user_id ORDER BY value NULLS LAST, event_id),
           wr AS (PARTITION BY user_id ORDER BY floor(epoch(ts))
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def win_events_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O37+O49+O51+O52+O53 per event row, all windows partitioned by
    user: lag/lead (the self-compare primitive under maneuver
    detection), trailing 1 h range frame, analytic values
    (first/last/nth, percent_rank/cume_dist with explicit NULLS LAST so
    both engines order identically), and gap-based sessionization
    (operators.series.sessionize)."""
    base = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    s = sessionize(base, ts_col="ts", gap="30 minutes", partition_by=["user_id"])
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wv = Window.partitionBy("user_id").orderBy(
        F.col("value").asc_nulls_last(), F.col("event_id")
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    prev_ts = F.lag("ts").over(wo)
    return s.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("event_id").over(wo).alias("prev_event"),
        F.lead("event_id").over(wo).alias("next_event"),
        (F.col("ts").cast("double") - prev_ts.cast("double")).alias(
            "secs_since_prev"
        ),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(wr)
        .cast("double")
        .alias("sum_last_hour"),
        F.count("value").over(wr).alias("n_last_hour"),
        F.first("event_id").over(wo).alias("first_event"),
        F.last("event_id").over(wf).alias("last_event"),
        F.nth_value("event_id", 2).over(wf).alias("second_event"),
        F.round(F.percent_rank().over(wv), 9).alias("pr"),
        F.round(F.cume_dist().over(wv), 9).alias("cd"),
        "session_id",
    )


# --- Set operations: O59 + O60 + O61 ---------------------------------------

@register(
    "setop_suite",
    oracle="""
    SELECT 'union_all' AS op, CAST(key AS BIGINT) AS key, kind AS tag FROM (
      SELECT c_custkey AS key, 'customer' AS kind FROM customer
      UNION ALL
      SELECT s_suppkey AS key, 'supplier' AS kind FROM supplier
    )
    UNION ALL
    SELECT 'intersect', CAST(nationkey AS BIGINT), NULL FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT 'except_all', CAST(custkey AS BIGINT), NULL FROM (
      SELECT o_custkey AS custkey FROM orders
      EXCEPT ALL
      SELECT c_custkey FROM customer
    )
    """,
)
def setop_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O59+O60+O61 as one tagged union: unionByName (bag), intersect
    (set), exceptAll (bag difference) — each branch the same plan as
    its per-operator query, tagged and conformed to (op, key, tag)."""
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")

    union_all = (
        c.select(F.col("c_custkey").alias("key"), F.lit("customer").alias("kind"))
        .unionByName(
            s.select(
                F.col("s_suppkey").alias("key"), F.lit("supplier").alias("kind")
            )
        )
        .select(
            F.lit("union_all").alias("op"),
            F.col("key").cast("bigint").alias("key"),
            F.col("kind").alias("tag"),
        )
    )
    intersected = (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .intersect(s.select(F.col("s_nationkey").alias("nationkey")))
        .select(
            F.lit("intersect").alias("op"),
            F.col("nationkey").cast("bigint").alias("key"),
            F.lit(None).cast("string").alias("tag"),
        )
    )
    excepted = (
        o.select(F.col("o_custkey").alias("custkey"))
        .exceptAll(c.select(F.col("c_custkey").alias("custkey")))
        .select(
            F.lit("except_all").alias("op"),
            F.col("custkey").cast("bigint").alias("key"),
            F.lit(None).cast("string").alias("tag"),
        )
    )
    return union_all.unionByName(intersected).unionByName(excepted)


# --- JSON / map / hash scalars: O79 + O81 + O86 ----------------------------

@register(
    "json_map_suite",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           LEN(json_keys(props)) AS n_keys,
           md5(props) AS props_md5,
           sha256(props) AS props_sha256
    FROM events
    """,
)
def json_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O79+O81+O86 per event row: JSON path extraction, the map surface
    (from_json → element_at / map_keys), and cryptographic content
    hashes — same public algorithms both engines → same hex."""
    e = t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.element_at(m, "k").cast("bigint").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.md5("props").alias("props_md5"),
        F.sha2("props", 256).alias("props_sha256"),
    )


# --- Time-series alignment: O25 + O26 + O27 --------------------------------

@register(
    "ts_locf_suite",
    oracle="""
    WITH m AS (
      SELECT event_id, user_id, ts, value,
             floor(epoch(ts)) AS tsec,
             CASE WHEN event_type = 'purchase' THEN value END AS v
      FROM events
    ),
    w AS (
      SELECT *,
             last_value(v IGNORE NULLS) OVER fwd AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN tsec END IGNORE NULLS)
               OVER fwd AS pt,
             first_value(v IGNORE NULLS) OVER bwd AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN tsec END IGNORE NULLS)
               OVER bwd AS nt
      FROM m
      WINDOW fwd AS (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             bwd AS (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id, ts,
           pv AS last_purchase_value,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv) *
                     (CASE WHEN nt <> pt THEN (tsec - pt) / (nt - pt)
                           ELSE 0.0 END)
           END AS interp_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER rng AS DOUBLE)
             / COUNT(value) OVER rng AS ma_1h
    FROM w
    WINDOW rng AS (PARTITION BY user_id ORDER BY tsec
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def ts_locf_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O25+O26+O27 in one pass over events per user: LOCF of the last
    purchase value (operators.series.forward_fill), time-weighted
    linear interpolation across purchase gaps
    (operators.series.linear_interpolate), and a trailing 1 h
    time-range moving average — the reference's align/fill/smooth
    stage on the grading stream."""
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    base = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        purchase_val.alias("last_purchase_value"),
        purchase_val.alias("interp_value"),
    )
    ff = forward_fill(
        base, cols=["last_purchase_value"], ts_col="ts", partition_by=["user_id"]
    )
    li = linear_interpolate(
        ff, cols=["interp_value"], ts_col="ts", partition_by=["user_id"]
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    ma = (
        F.sum(F.col("value").cast("decimal(18,6)")).over(wr).cast("double")
        / F.count("value").over(wr)
    )
    return li.select(
        "event_id",
        "user_id",
        "ts",
        "last_purchase_value",
        "interp_value",
        ma.alias("ma_1h"),
    )
