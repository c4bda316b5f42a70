"""process_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``HomegrownMarine/process`` (NMEA sailing-log ETL →
unified time series → derived metrics → segmentation/maneuver
analytics → JSON export), extended with the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text
analysis) and designed for 100 TB scale.

Layout (see SURVEY.md §7):
- ``session``    SparkSession builder (AQE, Arrow, UTC, tuned shuffle)
- ``schemas``    fixed StructTypes for every table
- ``sources``    readers/writers (parquet/csv/json/text/streaming)
- ``functions``  pure Column-expression libraries (nmea, angles, geo,
                 text, vectors) — no Python UDFs on the hot path
- ``operators``  composite DataFrame ops (as-of join, interval join,
                 resample/LOCF, sessionization, maneuver detection,
                 dedup, similarity)
- ``streaming``  Structured Streaming twins of the batch operators
- ``queries``    the gradable registry: queries() + oracle_sql()
"""

__version__ = "0.1.0"
