"""Shared pytest fixtures: one SparkSession per test run (JVM startup
is ~10 s — amortize it; SURVEY.md §6)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from process_spark.session import get_spark

    spark = get_spark("process-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    from process_spark.oracle import duck_connect

    con = duck_connect(SF_ORACLE)
    yield con
    con.close()
