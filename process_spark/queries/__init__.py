"""The gradable query registry (driver contract in __spark_entry__.py).

Every operator from SURVEY.md §2 that is implemented ships here as a
named query with (where SQL-expressible) a DuckDB oracle. Import of
this package populates the registry.
"""

from process_spark.queries.registry import REGISTRY, oracle_sql, queries, register

# Each module registers its queries at import time.
from process_spark.queries import relational  # noqa: E402,F401
from process_spark.queries import aggregates  # noqa: E402,F401
from process_spark.queries import windows  # noqa: E402,F401
from process_spark.queries import setops  # noqa: E402,F401
from process_spark.queries import scalars  # noqa: E402,F401
from process_spark.queries import text  # noqa: E402,F401
from process_spark.queries import vectors  # noqa: E402,F401
from process_spark.queries import nmea  # noqa: E402,F401
from process_spark.queries import timeseries  # noqa: E402,F401
from process_spark.queries import streaming  # noqa: E402,F401
from process_spark.queries import io_udf  # noqa: E402,F401
from process_spark.queries import multimodal  # noqa: E402,F401
from process_spark.queries import tpch  # noqa: E402,F401
from process_spark.queries import tpch_more  # noqa: E402,F401
from process_spark.queries import tpch_rest  # noqa: E402,F401
from process_spark.queries import pipeline  # noqa: E402,F401
from process_spark.queries import suites  # noqa: E402,F401
from process_spark.queries import retrieval  # noqa: E402,F401

__all__ = ["REGISTRY", "queries", "oracle_sql", "register"]
