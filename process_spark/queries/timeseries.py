"""Time-series queries over ``events`` (SURVEY.md §2.4 O23-O28 and the
maneuver-detection analog of §2.7 O54).

These drive the reference's merge/resample/smooth/segment pipeline
(SURVEY.md §3.1) through the engine's series operators on the grading
stream table. Every ordered window partitions by ``user_id`` — the
scale invariant of SURVEY.md §7.3 (no global orderBy windows).

Determinism: (user_id, ts) is unique in the testdata (measured), so
``ts`` alone is a total order per user; Spark's ``unix_timestamp``
truncates to seconds, mirrored as ``floor(epoch(ts))`` in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from process_spark.operators.series import (
    ewma,
    forward_fill,
    linear_interpolate,
    resample_grid,
)
from process_spark.queries._util import t
from process_spark.queries.registry import register

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "ts_pivot_wide",
    oracle="""
    SELECT user_id, date_trunc('day', ts) AS day,
    """
    + ",\n".join(
        f"CAST(SUM(CAST(CASE WHEN event_type = '{s}' THEN value END"
        f" AS DECIMAL(18,6))) AS DOUBLE) AS {s}_value"
        for s in _EVENT_TYPES
    )
    + """
    FROM events
    GROUP BY user_id, day
    """,
)
def ts_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O23: long→wide — one row per (user, day), one column per event
    type. Static column list → a single hash aggregate (no .pivot()
    inference scan), exactly the reference's merge stage shape."""
    e = t(spark, sf_dir, "events")
    # Same single-hash-aggregate shape as operators.series.pivot_signals
    # (exercised by the NMEA pipeline), but with sum-per-signal semantics
    # since a day holds many events of one type.
    return e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        *[
            F.sum(
                F.when(F.col("event_type") == s, F.col("value")).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias(f"{s}_value")
            for s in _EVENT_TYPES
        ]
    )


@register(
    "ts_resample_grid",
    oracle="""
    WITH b AS (
      SELECT user_id,
             MIN(date_trunc('hour', ts)) AS h0, MAX(date_trunc('hour', ts)) AS h1
      FROM events WHERE user_id % 25 = 0 GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM b
    ),
    obs AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events WHERE user_id % 25 = 0 GROUP BY user_id, hour
    )
    SELECT g.user_id, g.hour,
           COALESCE(o.n_events, 0) AS n_events, o.sum_value
    FROM grid g LEFT JOIN obs o USING (user_id, hour)
    """,
)
def ts_resample_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O24: regular hourly grid per user over [min, max], left-joined
    to observations — sequence+explode per group, fully distributed."""
    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") % 25 == 0)
        .withColumn("hour", F.date_trunc("hour", "ts"))
    )
    obs = e.groupBy("user_id", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )
    grid = resample_grid(
        obs.select("user_id", "hour"), ts_col="hour", step="1 hour",
        partition_by=["user_id"],
    ).select("user_id", "hour").distinct()
    return grid.join(obs, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "sum_value",
    )


@register(
    "ts_forward_fill",
    oracle="""
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events
    """,
)
def ts_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O25: LOCF — carry each user's last purchase value forward over
    every subsequent event."""
    e = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "last_purchase_value"
        ),
    )
    return forward_fill(
        e, cols=["last_purchase_value"], ts_col="ts", partition_by=["user_id"]
    )


@register(
    "ts_interpolate",
    oracle="""
    WITH m AS (
      SELECT event_id, user_id, ts,
             floor(epoch(ts)) AS tsec,
             CASE WHEN event_type = 'purchase' THEN value END AS v
      FROM events
    ),
    w AS (
      SELECT event_id, user_id, ts, tsec, v,
             last_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN tsec END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN tsec END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM m
    )
    SELECT event_id, user_id, ts,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv) *
                     (CASE WHEN nt <> pt THEN (tsec - pt) / (nt - pt)
                           ELSE 0.0 END)
           END AS interp_value
    FROM w
    """,
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O26: time-weighted linear interpolation of each user's purchase
    value across the gaps between purchases."""
    e = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "interp_value"
        ),
    )
    return linear_interpolate(
        e, cols=["interp_value"], ts_col="ts", partition_by=["user_id"]
    )


@register(
    "ts_moving_average",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS DOUBLE)
             / COUNT(value)
                OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
             AS ma5
    FROM events
    """,
)
def ts_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O27: centered 5-row moving average per user (exact-decimal sum
    over the frame so the hash survives cross-engine float order)."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(-2, 2)
    )
    ma = (
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
        / F.count("value").over(w)
    )
    return e.select("event_id", "user_id", "ts", ma.alias("ma5"))


@register(
    "ts_moving_average_time",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY floor(epoch(ts))
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(value)
                OVER (PARTITION BY user_id ORDER BY floor(epoch(ts))
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
             AS ma_1h
    FROM events
    """,
)
def ts_moving_average_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O27 (time frame): trailing 1-hour average per user — range frame
    over unix seconds (SURVEY.md O51)."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    ma = (
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
        / F.count("value").over(w)
    )
    return e.select("event_id", "user_id", "ts", ma.alias("ma_1h"))


@register(
    "ts_ewma_fold",
    oracle="""
    SELECT user_id,
           list_reduce(list(value ORDER BY ts), (a, x) -> a * 0.5 + x * 0.5)
             AS ewma_final,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def ts_ewma_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O28: EWMA (alpha=.5, adjust=False) as an ordered sequential fold
    — final smoothed value per user. Both engines fold the identical
    sequence in float64, and *0.5 is exact, so no rounding needed.
    Production path for per-row EWMA at scale is ts_ewma_state."""
    e = t(spark, sf_dir, "events")
    vals = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "value"))),
        lambda p: p.getField("value"),
    )
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: acc * 0.5 + x * 0.5,
    )
    return e.groupBy("user_id").agg(
        fold.alias("ewma_final"), F.count(F.lit(1)).alias("n_events")
    )


@register("ts_ewma_state", oracle=None)
def ts_ewma_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O28/O99: per-row EWMA via applyInPandas per user (Arrow-batched
    grouped map — the scale path; rows-only check, pandas ewm float
    order differs from a strict fold at the ULP level)."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return ewma(e, col="value", alias="ewma", alpha=0.5, ts_col="ts",
                partition_by=["user_id"])


@register(
    "ts_change_points",
    oracle="""
    WITH d AS (
      -- (ts, event_id) ordering everywhere: bare ORDER BY ts is
      -- nondeterministic under duplicate timestamps (the adversarial
      -- fixture ships them)
      SELECT user_id, ts, event_id, value,
             value - lag(value, 3) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS delta
      FROM events
    ),
    f AS (
      SELECT user_id, ts, event_id, delta,
             CASE WHEN abs(delta) >= 200.0 THEN 1 ELSE 0 END AS flag,
             CASE WHEN abs(delta) >= 200.0
                  AND COALESCE(abs(lag(delta) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)) >= 200.0,
                        false)
                      = false
                  THEN 1 ELSE 0 END AS run_start
      FROM d
    ),
    r AS (
      SELECT user_id, ts, event_id, delta, flag,
             CAST(SUM(run_start) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS run_id
      FROM f
    )
    SELECT user_id, run_id AS change_id,
           MIN(ts) AS change_ts,
           MAX(CASE WHEN rn = 1 THEN delta END) AS entry_delta,
           COUNT(*) AS n_samples
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, run_id
                                       ORDER BY ts, event_id) AS rn
          FROM r WHERE flag = 1)
    GROUP BY user_id, run_id
    """,
)
def ts_change_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O54 analog on the grading stream: sustained value jumps
    (|Δ over 3 rows| ≥ 200) deduped to one event per flag run — the
    lag → flag → run-id → group pattern of maneuver detection."""
    e = t(spark, sf_dir, "events")
    # (ts, event_id) everywhere — duplicate timestamps make a bare ts
    # ordering (and a bare min_by ts) nondeterministic.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.col("value") - F.lag("value", 3).over(w)
    d = e.select("user_id", "ts", "event_id", "value").withColumn("delta", delta)
    flag = (F.abs(F.col("delta")) >= 200.0).cast("int")
    f = d.withColumn("flag", flag)
    prev_flag = F.coalesce(F.lag("flag").over(w), F.lit(0))
    run_start = ((F.col("flag") == 1) & (prev_flag == 0)).cast("bigint")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    r = f.withColumn("run_id", F.sum(run_start).over(cum))
    return (
        r.filter(F.col("flag") == 1)
        .groupBy("user_id", F.col("run_id").alias("change_id"))
        .agg(
            F.min("ts").alias("change_ts"),
            F.min_by("delta", F.struct("ts", "event_id")).alias("entry_delta"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


@register(
    "events_funnel_conversion",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT user_id, first_click, first_purchase,
           (first_click IS NOT NULL AND first_purchase IS NOT NULL
            AND first_purchase > first_click) AS converted,
           CASE WHEN first_click IS NOT NULL AND first_purchase > first_click
                THEN date_diff('second', first_click, first_purchase) END
             AS secs_to_convert
    FROM per_user
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: per-user first click → first purchase
    conversion with time-to-convert. One conditional aggregate over the
    fact — no self-join, no window; the per-user width stays O(#steps)
    however many events a user has (the shape that survives 100 TB of
    events)."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "first_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    converted = (
        F.col("first_click").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") > F.col("first_click"))
    )
    return per_user.select(
        "user_id",
        "first_click",
        "first_purchase",
        converted.alias("converted"),
        F.when(
            F.col("first_click").isNotNull()
            & (F.col("first_purchase") > F.col("first_click")),
            F.col("first_purchase").cast("long") - F.col("first_click").cast("long"),
        ).alias("secs_to_convert"),
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day FROM events
      GROUP BY user_id
    )
    SELECT f.cohort_day,
           date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day,
    counted distinct on each later active day. The firsts table is
    |users| rows — joined back onto the fact (AQE broadcasts it while it
    fits, shuffle-joins beyond), so the only full
    shuffle is the final (cohort, offset) distinct-count."""
    e = t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("cohort_day")
    )
    return (
        e.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(
                F.date_trunc("day", F.col("ts")), F.col("cohort_day")
            ).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
