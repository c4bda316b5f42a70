"""Sources & sinks (SURVEY.md §2.1, O1-O8).

Scale notes:
- Every reader declares an explicit schema (column pruning + stable
  oracle schemas; SURVEY.md §1.2).
- ``load`` reads one parquet file per table as the driver lays them out
  (TESTDATA.md). On a cluster the same call reads a directory of many
  files; nothing here assumes single-file.
- Writers partition by a supplied column so a 100 TB output shards
  instead of funnelling through one task.
"""

from __future__ import annotations

import datetime
import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from process_spark.schemas import TABLES


@lru_cache(maxsize=None)
def _events_ts_layout(path: str) -> str:
    """Sniff the parquet footer once per path: 'us', 'ns', or 'unknown'.

    Driver testdata has shipped both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) layouts across regenerations; a hard-coded
    assumption silently corrupts every events-based query (1970-era
    timestamps), so the unit is read from the file, never assumed.
    Footer-only: no Spark job, no data scan.
    """
    try:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(path)
        unit = pf.schema_arrow.field("ts").type.unit
        # Cheap drift guard from footer statistics: events must be
        # modern-era. A unit mismatch shows up as 1970 values; fail loud
        # instead of grading garbage.
        try:
            stats = pf.metadata.row_group(0).column(
                pf.schema_arrow.get_field_index("ts")
            ).statistics
            if stats is not None and stats.has_min_max:
                min_ts = stats.min
                if isinstance(min_ts, datetime.datetime) and min_ts.year < 2000:
                    raise ValueError(
                        f"events.ts min {min_ts} predates 2000 — testdata "
                        f"layout drift at {path}; refusing to load garbage"
                    )
        except (AttributeError, IndexError):
            pass
        return unit if unit in ("us", "ns") else "unknown"
    except (ImportError, OSError, KeyError):
        return "unknown"


def read_events(
    spark: SparkSession, path: str, streaming: bool = False, **options
) -> DataFrame:
    """Layout-aware events read shared by the batch scan (O2) and the
    file-stream source (O7) — ONE copy of the ns/µs branch, so the
    next testdata-layout drift is handled in a single place.

    Legacy nanos layout: Spark can't map TIMESTAMP(NANOS) to
    TimestampType, so ts reads as long and truncates ns → µs exactly
    as DuckDB does; the legacy conf is only touched on that branch.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if streaming:
        # File stream sources take a directory; select the one table
        # file with a glob (a real deployment streams a directory).
        reader = spark.readStream
        options = {**options, "pathGlobFilter": os.path.basename(path)}
        read_path = os.path.dirname(path)
    else:
        reader = spark.read
        read_path = path
    if _events_ts_layout(path) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ns_schema = T.StructType(
            [
                T.StructField(f.name, T.LongType() if f.name == "ts" else f.dataType)
                for f in TABLES["events"].fields
            ]
        )
        df = reader.schema(ns_schema).options(**options).parquet(read_path)
        return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return reader.schema(TABLES["events"]).options(**options).parquet(read_path)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """O2 — Parquet scan of one testdata table with its declared schema.

    ``events.ts`` parquet unit is sniffed from the footer (µs vs ns —
    the driver has shipped both); see ``_events_ts_layout``.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Defensive: the driver's session may not carry the engine confs.
    # UTC keeps timestamp semantics aligned with the DuckDB oracle even
    # on a non-UTC host (SURVEY.md §7.3). Idempotent, runtime-settable.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return read_events(spark, path)
    reader = spark.read
    if name in TABLES:
        reader = reader.schema(TABLES[name])
    return reader.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table keyed by name."""
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all tables as temp views for the SQL surface (O102)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def read_nmea_text(spark: SparkSession, path: str) -> DataFrame:
    """O1 — raw NMEA day-log scan: one sentence per line.

    Adds ``source_file`` lineage so multi-day/multi-file loads keep
    per-day provenance (the reference processed one file per day;
    SURVEY.md §1.1 D1).
    """
    return spark.read.text(path).select(
        F.col("value").alias("raw"),
        F.input_file_name().alias("source_file"),
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """O3 — delimited ingest (aux tables: race times, variation)."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """O4 — JSON scan (re-read emitted docs)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """O6 — columnar materialization, partitioned for scale."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json_docs(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """O5 — JSON sink: the reference's primary output (nested per-race
    docs). Callers shape nested structs first (functions.jsonshape)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
