"""Fixed, declared schemas for every table the engine touches.

SURVEY.md §1.2: schemas are declared (never inferred) so oracle schema
checks are deterministic and Parquet scans prune columns against a
known ReadSchema. Measured from /root/testdata parquet (SURVEY.md §1.2
table, tag [T]).
"""

from __future__ import annotations

from pyspark.sql import types as T

TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # NOTE: events.ts layout has drifted between driver testdata
    # generations (TIMESTAMP(NANOS) in round 1, TIMESTAMP(MICROS) since
    # round 2). sources.io.load sniffs the parquet footer and branches:
    # µs reads directly against this schema; ns falls back to a legacy
    # long read + timestamp_micros(ts DIV 1000) (the truncation DuckDB
    # applies when narrowing ns → µs).
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# --- NMEA domain schemas (SURVEY.md §1.1 D1-D3) -------------------------

#: D1/D2 — one parsed NMEA 0183 sentence per row (long format).
NMEA_LONG = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("talker", T.StringType()),
        T.StructField("sentence", T.StringType()),
        T.StructField("fields", T.ArrayType(T.StringType())),
        T.StructField("valid", T.BooleanType()),
        T.StructField("raw", T.StringType()),
    ]
)

#: D3 — unified 1 Hz time-series record merging all instruments.
NMEA_WIDE = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("sog", T.DoubleType()),   # speed over ground, kn
        T.StructField("cog", T.DoubleType()),   # course over ground, deg true
        T.StructField("hdg", T.DoubleType()),   # heading, deg true
        T.StructField("speed", T.DoubleType()),  # speed through water, kn
        T.StructField("awa", T.DoubleType()),   # apparent wind angle, deg
        T.StructField("aws", T.DoubleType()),   # apparent wind speed, kn
        T.StructField("twa", T.DoubleType()),   # true wind angle (derived)
        T.StructField("tws", T.DoubleType()),   # true wind speed (derived)
        T.StructField("twd", T.DoubleType()),   # true wind direction (derived)
        T.StructField("vmg", T.DoubleType()),   # velocity made good (derived)
    ]
)

#: Multimodal column convention (SURVEY.md §1.2): opaque binary payload
#: plus typed metadata. No binary test table exists, so this is the
#: declared engine convention for image/audio/video columns.
MULTIMODAL_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)
