"""Skew mitigation (SURVEY.md §4.2 "salting for skew", §7.3).

AQE's skew-join splitting covers joins; aggregations over HOT KEYS
(a groupBy with few distinct values — event_type has 5) still funnel
each key through one reducer. Two-phase salted aggregation spreads
phase 1 over ``n_salts`` reducers per key and combines the partials in
a tiny phase 2 — the standard shape for 100 TB hot-key rollups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    alias: str,
    salt: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase sum: groupBy(keys + salt) → groupBy(keys).

    ``value`` should already be exact-typed (decimal/long) — a salted
    double sum would re-order float addition between runs. ``salt``
    must be deterministic per row (hash a unique column), never
    ``rand()``, so plans replay identically.
    """
    salted = df.withColumn("__salt", F.pmod(salt, F.lit(n_salts)))
    phase1 = salted.groupBy(*keys, "__salt").agg(F.sum(value).alias("__partial"))
    return phase1.groupBy(*keys).agg(F.sum("__partial").alias(alias))
