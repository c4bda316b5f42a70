"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``process_spark`` package; the registry in
``process_spark.queries`` maps one entry per implemented operator from
SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Spark's Python WORKERS inherit the driver's environment, not its
# sys.path — a UDF/kernel closure that (directly or via cloudpickle's
# by-reference function pickling) imports process_spark would fail in
# the worker if the driver was launched outside the repo. Export the
# repo on PYTHONPATH before any worker spawns.
if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-style pricing summary over lineitem (SURVEY.md §7.2 PR1).
    """
    from process_spark.queries.relational import q1_pricing_summary
    from process_spark.session import configure_existing

    configure_existing(spark)
    return q1_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from process_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (absent → rows-only check)."""
    from process_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
