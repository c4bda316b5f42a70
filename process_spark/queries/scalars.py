"""Scalar-function queries: JSON, strings, regex, arrays, maps, math,
hashes, timestamps (SURVEY.md §2.3 O14-O22, §2.12 O79-O87).

The NMEA math (coords, angles, true wind, haversine, VMG) is oracle-
checked here by applying the engine's expression library to numeric
columns of the grading tables — same formulas, both engines, bit-equal
results (SURVEY.md §5.2: the staged-table strategy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from process_spark.functions import angles, geo
from process_spark.queries._util import fscaled, o_fscaled, o_pmod, t
from process_spark.queries.registry import register


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O79: JSON field extraction from events.props."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
    )


@register(
    "json_build_shape",
    oracle="""
    SELECT o_orderkey,
           to_json({'order_key': o_orderkey, 'status': o_orderstatus,
                    'price': o_totalprice}) AS doc
    FROM orders
    """,
)
def json_build_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O80: JSON document shaping — the reference's export stage
    (SURVEY.md D6) on relational rows."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("order_key"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").alias("price"),
            )
        ).alias("doc"),
    )


@register(
    "string_core_fns",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           LENGTH(c_name) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CONCAT(c_name, '#', c_mktsegment) AS name_tagged,
           TRIM(LPAD(CAST(c_custkey AS VARCHAR), 8, '0')) AS key_padded,
           REPLACE(c_name, 'Customer', 'Cust') AS name_replaced,
           INSTR(c_name, '#') AS hash_pos
    FROM customer
    """,
)
def string_core_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O71: core string functions."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias(
            "name_tagged"
        ),
        F.trim(F.lpad(F.col("c_custkey").cast("string"), 8, "0")).alias(
            "key_padded"
        ),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_replaced"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
    )


@register(
    "regex_extract_like",
    oracle="""
    SELECT p_partkey, p_type,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
           (p_type LIKE 'PROMO%') AS is_promo,
           regexp_matches(p_name, '[0-9]') AS has_digit,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
    FROM part
    """,
)
def regex_extract_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O72: regexp extract/replace, LIKE, RLIKE."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_type",
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_head"),
        F.col("p_type").like("PROMO%").alias("is_promo"),
        F.col("p_name").rlike("[0-9]").alias("has_digit"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
    )


@register(
    "math_fns",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,6)), 1) * 10
                AS BIGINT) AS price_dimes,
           ABS(l_discount - 0.05) AS disc_dev,
           SQRT(l_quantity) AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq,
           {o_fscaled('LN(l_extendedprice)', 'price_ln_milli', 1000)},
           {o_fscaled('EXP(l_discount)', 'disc_exp_scaled', 100000)},
           LEAST(l_quantity, 25.0) AS qty_capped,
           GREATEST(l_tax, l_discount) AS max_rate,
           CAST(SIGN(l_quantity - 25) AS BIGINT) AS qty_side,
           CAST(FLOOR(l_quantity / 5) * 5 AS BIGINT) AS qty_bin,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil
    FROM lineitem
    """,
)
def math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O85: math function battery, hashed representation-independently
    (`_util` module docstring): exact IEEE ops (abs/sqrt/x*x/least/
    greatest over identical parquet bits) pass through raw; ROUND runs
    in exact DECIMAL arithmetic then lands on an integer (dimes); the
    transcendentals (ln/exp — libm, never bit-guaranteed cross-engine)
    emit half-up-scaled integers so no engine's double-ROUND formatting
    participates in the hash."""
    li = t(spark, sf_dir, "lineitem")
    price_dec = F.col("l_extendedprice").cast("decimal(18,6)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.round(price_dec, 1) * 10).cast("long").alias("price_dimes"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        fscaled(F.log("l_extendedprice"), "price_ln_milli", 1000),
        fscaled(F.exp("l_discount"), "disc_exp_scaled", 100000),
        F.least("l_quantity", F.lit(25.0)).alias("qty_capped"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.signum(F.col("l_quantity") - 25).cast("long").alias("qty_side"),
        (F.floor(F.col("l_quantity") / 5) * 5).cast("long").alias("qty_bin"),
        F.ceil(F.col("l_discount") * 100).cast("long").alias("disc_pct_ceil"),
    )


@register(
    "timestamp_fns",
    oracle="""
    SELECT o_orderkey,
           DATE_TRUNC('month', o_orderdate) AS order_month,
           YEAR(o_orderdate) AS yr,
           MONTH(o_orderdate) AS mo,
           DAYOFWEEK(o_orderdate) + 1 AS dow,
           CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s,
           o_orderdate + INTERVAL 90 DAY AS due_date,
           DATEDIFF('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k
    FROM orders
    """,
)
def timestamp_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O22: timestamp functions. DOW normalized to Spark's 1=Sunday
    convention (DuckDB's dayofweek is 0=Sunday)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
        F.datediff(
            F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate")
        ).alias("days_to_y2k"),
    )


@register(
    "array_hofs",
    oracle="""
    WITH base AS (
      SELECT o_custkey, LIST(o_totalprice ORDER BY o_orderkey) AS prices
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           LEN(prices) AS n,
           array_to_string(list_transform(prices, x -> CAST(CAST(FLOOR(x * 1.1 * 10000.0 + 0.5) AS BIGINT) AS VARCHAR)), ',') AS taxed_e4,
           array_to_string(list_transform(list_filter(prices, x -> x > 50000), x -> CAST(x AS VARCHAR)), ',') AS big,
           CAST(list_sum(list_transform(prices, x -> CAST(x AS DECIMAL(38,6)))) AS DOUBLE) AS total,
           array_to_string(list_transform(list_sort(prices), x -> CAST(x AS VARCHAR)), ',') AS sorted_prices,
           list_contains(list_transform(prices, x -> x > 100000), true) AS any_six_figure
    FROM base
    """,
)
def array_hofs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O82-O84: array HOFs — transform/filter/aggregate/exists plus
    sort/size/contains (lambda path = DuckDB list lambdas). Array
    outputs are exposed comma-joined: the driver's canonicalizer
    cannot hash list cells, and double→string rendering matches
    across engines for these parquet-born values."""
    o = t(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.array_sort(
            F.collect_list(F.struct("o_orderkey", "o_totalprice"))
        ).alias("__pairs")
    ).select(
        "o_custkey",
        F.transform("__pairs", lambda p: p.getField("o_totalprice")).alias(
            "prices"
        ),
    )
    def joined(col: Column) -> Column:
        return F.array_join(F.transform(col, lambda x: x.cast("string")), ",")

    return base.select(
        "o_custkey",
        F.size("prices").alias("n"),
        # x*1.1 is one IEEE multiply over identical parquet bits →
        # identical product both engines; half-up-scaled int (not ROUND —
        # cross-build double-ROUND rendering differs, `_util` docstring).
        joined(
            F.transform(
                "prices", lambda x: F.floor(x * 1.1 * 10000.0 + 0.5).cast("long")
            )
        ).alias("taxed_e4"),
        joined(F.filter("prices", lambda x: x > 50000)).alias("big"),
        F.aggregate(
            "prices",
            F.lit(0).cast("decimal(38,6)"),
            lambda acc, x: (acc + x.cast("decimal(38,6)")).cast("decimal(38,6)"),
        )
        .cast("double")
        .alias("total"),
        joined(F.sort_array("prices")).alias("sorted_prices"),
        F.exists("prices", lambda x: x > 100000).alias("any_six_figure"),
    )


@register(
    "array_explode_posexplode",
    oracle="""
    SELECT vec_id, pos - 1 AS pos, val
    FROM (
      SELECT vec_id, UNNEST(embedding) AS val,
             generate_subscripts(embedding, 1) AS pos
      FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20)
    )
    """,
)
def array_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O82: posexplode arrays → rows (embeddings elementwise)."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    )


@register(
    "map_fns",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           LEN(json_keys(props)) AS n_keys
    FROM events
    """,
)
def map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O81: map functions — props parsed to map<string,string>, then
    element_at / map_keys (DuckDB twin uses its JSON surface)."""
    e = t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return e.select(
        "event_id",
        F.element_at(m, "k").cast("bigint").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "hash_fns_md5_sha",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256
    FROM documents
    """,
)
def hash_fns_md5_sha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O86: cryptographic content hashes (dedup keys, value-hash
    checks). Same public algorithms in both engines → same hex."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@register("ids_and_sampling")  # rows-only: nondeterministic across engines
def ids_and_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O87: monotonically_increasing_id + seeded sample (engine-
    specific id layout and PRNG → rows-only check by design)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.sample(fraction=0.1, seed=42)
        .withColumn("row_id", F.monotonically_increasing_id())
        .select("row_id", "doc_id", "lang")
    )


@register(
    "sample_hash_deterministic",
    oracle="""
    WITH keyed AS (
      SELECT l_orderkey, l_linenumber, l_returnflag,
             md5(CAST(l_orderkey AS VARCHAR) || '-'
                 || CAST(l_linenumber AS VARCHAR)) AS sample_key
      FROM lineitem
    )
    SELECT 'uniform' AS op, l_orderkey, l_linenumber, sample_key
    FROM keyed WHERE sample_key < '2'
    UNION ALL
    SELECT 'stratified' AS op, l_orderkey, l_linenumber, sample_key
    FROM keyed
    WHERE sample_key < (CASE l_returnflag WHEN 'R' THEN '4'
                                          WHEN 'A' THEN '2'
                                          ELSE '1' END)
    """,
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O87 (oracle-backed): content-keyed deterministic sampling — the
    reproducible 100 TB path. ``md5(primary key)`` compared against a
    hex-prefix threshold gives a uniform sample with NO PRNG state: the
    same rows are selected on every run, on any engine, and rerunning a
    failed partition cannot change the sample (seeded `sample()` cannot
    promise that across engines — see ids_and_sampling). The hash
    doubles as a stable surrogate id (O87's id half). Stratified rates
    come from a per-stratum threshold (R=1/4, A=1/8, else 1/16) — the
    same per-language-quota shape as sample_stratified_by. Pure
    expression, no shuffle: the filter rides the scan."""
    li = t(spark, sf_dir, "lineitem")
    keyed = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.md5(
            F.concat_ws(
                "-",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("sample_key"),
    )
    uniform = keyed.filter(F.col("sample_key") < "2").select(
        F.lit("uniform").alias("op"), "l_orderkey", "l_linenumber", "sample_key"
    )
    threshold = (
        F.when(F.col("l_returnflag") == "R", F.lit("4"))
        .when(F.col("l_returnflag") == "A", F.lit("2"))
        .otherwise(F.lit("1"))
    )
    stratified = keyed.filter(F.col("sample_key") < threshold).select(
        F.lit("stratified").alias("op"), "l_orderkey", "l_linenumber", "sample_key"
    )
    return uniform.unionByName(stratified)


@register("sample_stratified_by")  # rows-only: PRNG is engine-specific
def sample_stratified_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O87 stratified: per-stratum Bernoulli sampling via sampleBy —
    the 100 TB downsampling path (per-language quotas for a training
    mix). Seeded for run-to-run determinism within Spark; PRNG differs
    across engines → rows-only check."""
    d = t(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "zh": 0.2, "es": 0.2, "de": 0.1, "fr": 0.1}
    return (
        d.sampleBy("lang", fractions=fractions, seed=7)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


# --- NMEA math over relational columns (O14-O20 oracle strategy) ----------

@register(
    "nmea_coord_conversion",
    oracle="""
    SELECT c_custkey,
           (FLOOR(c_acctbal / 100) + FMOD(c_acctbal, 100) / 60)
             * (CASE WHEN c_custkey % 2 = 0 THEN -1 ELSE 1 END) AS coord_deg
    FROM customer
    WHERE c_acctbal >= 0
    """,
)
def nmea_coord_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O14: ddmm.mmmm → signed decimal degrees (functions.geo), driven
    over customer balances as the dd/mm source with a synthetic
    hemisphere — same formula both engines."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= 0)
    hemi = F.when(F.col("c_custkey") % 2 == 0, F.lit("S")).otherwise(F.lit("N"))
    return c.select(
        "c_custkey",
        geo.nmea_coord_to_deg(F.col("c_acctbal"), hemi).alias("coord_deg"),
    )


@register(
    "angle_normalization",
    oracle=f"""
    SELECT e1.event_id,
           {o_pmod('e1.value * 7', '360')} AS norm360,
           {o_pmod('(e1.value * 7 + 180)', '360')} - 180 AS norm180,
           {o_pmod('((e1.value * 7 - e1.value * 3) + 180)', '360')} - 180 AS delta
    FROM events e1
    WHERE e1.value IS NOT NULL
    """,
)
def angle_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O17: angle wrap/delta (functions.angles) on synthetic headings.
    Oracle replicates Spark's pmod exactly (see _util.o_pmod)."""
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    a = F.col("value") * 7
    b = F.col("value") * 3
    return e.select(
        "event_id",
        angles.norm_360(a).alias("norm360"),
        angles.norm_180(a).alias("norm180"),
        angles.angle_diff(a, b).alias("delta"),
    )


@register(
    "true_wind_vmg",
    oracle=f"""
    WITH obs AS (
      SELECT event_id,
             value AS bs,
             FMOD({o_pmod('value * 13', '360')}, 180) AS awa,
             value * CAST(1.5 AS DOUBLE) + CAST(4 AS DOUBLE) AS aws
      FROM events WHERE value IS NOT NULL AND value > 0
    ), tw AS (
      SELECT event_id, bs,
             SQRT(aws*aws + bs*bs - 2*aws*bs*COS(RADIANS(awa))) AS tws,
             DEGREES(ATAN2(aws * SIN(RADIANS(awa)), aws * COS(RADIANS(awa)) - bs)) AS twa
      FROM obs
    )
    SELECT event_id,
           {o_fscaled('tws', 'tws_e4', 10000)},
           {o_fscaled('twa', 'twa_e4', 10000)},
           {o_fscaled('bs * COS(RADIANS(twa))', 'vmg_e4', 10000)}
    FROM tw
    """,
)
def true_wind_vmg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O18+O19: true wind + VMG (functions.angles) — the reference's
    core sailing math, driven over synthetic apparent-wind columns.
    Trig outputs (JVM vs libm: ULP noise) hashed as half-up-scaled
    integers per the `_util` float policy."""
    e = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    bs = F.col("value")
    awa = angles.norm_360(bs * 13) % 180
    aws = bs * 1.5 + 4
    twa = angles.true_wind_angle(aws, awa, bs)
    return e.select(
        "event_id",
        fscaled(angles.true_wind_speed(aws, awa, bs), "tws_e4", 10000),
        fscaled(twa, "twa_e4", 10000),
        fscaled(angles.vmg(bs, twa), "vmg_e4", 10000),
    )


@register(
    "haversine_distance",
    oracle="""
    WITH fixes AS (
      SELECT event_id,
             37.0 + value / 100 AS lat1, -122.0 - value / 200 AS lon1,
             37.0 + value / 90  AS lat2, -122.0 - value / 210 AS lon2
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_id,
           CAST(FLOOR(2 * 6371000.0 * ASIN(SQRT(
             POW(SIN((RADIANS(lat2) - RADIANS(lat1)) / 2), 2)
             + COS(RADIANS(lat1)) * COS(RADIANS(lat2))
               * POW(SIN((RADIANS(lon2) - RADIANS(lon1)) / 2), 2)
           )) + 0.5) AS BIGINT) AS dist_m_floor
    FROM fixes
    """,
)
def haversine_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O20: haversine (functions.geo) over synthetic fixes; hashed as
    whole-meter floors — the ~1e7 m magnitude makes finer grids
    boundary-risky against transcendental ULP noise (`_util`)."""
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = F.col("value")
    return e.select(
        "event_id",
        fscaled(
            geo.haversine_m(
                F.lit(37.0) + v / 100,
                F.lit(-122.0) - v / 200,
                F.lit(37.0) + v / 90,
                F.lit(-122.0) - v / 210,
            ),
            "dist_m_floor",
            1,
        ),
    )


@register(
    "unit_conversions",
    oracle="""
    SELECT event_id,
           value / (3600.0 / 1852.0) AS speed_mps,
           value * 1852.0 AS dist_m,
           RADIANS(value) AS val_rad,
           DEGREES(value / 10) AS val_deg
    FROM events WHERE value IS NOT NULL
    """,
)
def unit_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O15: unit conversions (knots→m/s, nm→m, deg↔rad)."""
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return e.select(
        "event_id",
        angles.knots_to_mps("value").alias("speed_mps"),
        angles.nm_to_meters("value").alias("dist_m"),
        F.radians("value").alias("val_rad"),
        F.degrees(F.col("value") / 10).alias("val_deg"),
    )


@register(
    "mag_true_heading",
    oracle=f"""
    SELECT event_id,
           {o_pmod('value + 16.0', '360.0')} AS hdg_true,
           {o_pmod('value - 16.0', '360.0')} AS hdg_mag
    FROM events
    """,
)
def mag_true_heading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O16: magnetic↔true heading via variation, wrapped to [0, 360)
    (events.value as the pseudo-heading, +16°E variation)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        angles.mag_to_true(F.col("value"), F.lit(16.0)).alias("hdg_true"),
        angles.norm_360(F.col("value") - F.lit(16.0)).alias("hdg_mag"),
    )


@register(
    "nmea_polar_table",
    oracle=f"""
    WITH obs AS (
      SELECT value AS bs,
             FMOD({o_pmod('value * 13', '360')}, 180) AS awa,
             value * CAST(1.5 AS DOUBLE) + CAST(4 AS DOUBLE) AS aws
      FROM events WHERE value IS NOT NULL AND value > 0
    ), tw AS (
      SELECT bs,
             CAST(FLOOR(SQRT(aws*aws + bs*bs - 2*aws*bs*COS(RADIANS(awa)))
                        * 10000.0 + 0.5) AS BIGINT) AS tws_e4,
             CAST(FLOOR(ABS(DEGREES(ATAN2(aws * SIN(RADIANS(awa)),
                                          aws * COS(RADIANS(awa)) - bs)))
                        * 10000.0 + 0.5) AS BIGINT) AS twa_e4
      FROM obs
    )
    SELECT CAST((tws_e4 // 20000) * 2 AS INT) AS tws_bin,
           CAST((twa_e4 // 100000) * 10 AS INT) AS twa_bin,
           COUNT(*) AS n_obs,
           {o_fscaled('QUANTILE_CONT(bs, 0.9)', 'p90_micro')}
    FROM tw
    GROUP BY 1, 2
    """,
)
def nmea_polar_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's polar performance table (SURVEY.md O41/O46):
    target boat speed = 90th percentile of observed speed per
    (2-kn TWS bin × 10° |TWA| bin), over the same synthetic
    apparent-wind series as true_wind_vmg. TWS/TWA are half-up-scaled to
    integers BEFORE binning, so the bin edge comparison is integer
    division — transcendental ULP noise can only flip at the 1e-4
    floor grid, never at a ROUND tie; percentile hashed as micro-units
    (`_util` float policy)."""
    e = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    bs = F.col("value")
    awa = angles.norm_360(bs * 13) % 180
    aws = bs * 1.5 + 4
    tws_e4 = F.floor(angles.true_wind_speed(aws, awa, bs) * 10000.0 + 0.5)
    twa_e4 = F.floor(F.abs(angles.true_wind_angle(aws, awa, bs)) * 10000.0 + 0.5)
    return (
        e.select(
            # tws_e4/20000 is an exact-int double division well below
            # 2^53 — floor of it equals DuckDB's BIGINT // (positives).
            (F.floor(tws_e4 / 20000) * 2).cast("int").alias("tws_bin"),
            (F.floor(twa_e4 / 100000) * 10).cast("int").alias("twa_bin"),
            bs.alias("bs"),
        )
        .groupBy("tws_bin", "twa_bin")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            fscaled(F.percentile("bs", 0.9), "p90_micro"),
        )
    )
