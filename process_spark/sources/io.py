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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from process_spark.schemas import TABLES


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """O2 — Parquet scan of one testdata table with its declared schema.

    ``events.ts`` is parquet TIMESTAMP(NANOS): read as long (legacy
    nanosAsLong) and truncate to µs exactly as DuckDB does.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Defensive: the driver's session may not carry the engine confs.
    # Both are runtime-settable; UTC keeps timestamp semantics aligned
    # with the DuckDB oracle even on a non-UTC host (SURVEY.md §7.3).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.read
    if name in TABLES:
        reader = reader.schema(TABLES[name])
    df = reader.parquet(path)
    if name == "events":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


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
