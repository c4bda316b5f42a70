"""Rehearsal of the driver's t2 gate (SURVEY.md §5.2): every registered
query with an oracle must match DuckDB exactly at sf0.001 (the small SF
keeps the full sweep fast; the standalone `python -m process_spark.oracle`
run covers sf0.01 before each commit)."""

from __future__ import annotations

import pytest

from process_spark.queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"


def _names() -> list[str]:
    return sorted(REGISTRY)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, name):
    from process_spark.oracle import compare_query

    res = compare_query(spark, name, sf_dir=SF_SMALL)
    assert res.ok, str(res)
