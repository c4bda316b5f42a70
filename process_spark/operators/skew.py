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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small.

    A hot key (one user with 10% of all events) funnels its whole
    partition through a single reducer in a plain shuffled join. Here
    the big side gets a deterministic per-row salt in [0, n_salts) and
    the small side is exploded across ALL salt values, so the hot key's
    rows spread over ``n_salts`` reducers. Output equals the plain
    join exactly (each big row meets its one replicated partner), so
    the rewrite is semantically free; cost is small-side amplification
    ×``n_salts`` — use when the small side is dim-sized. AQE's
    skew-join handles sort-merge cases adaptively; this form also
    covers aggregation-feeding joins and pre-AQE plans, and its output
    partitioning spreads the hot key for the NEXT stage too.

    ``salt`` must be deterministic per row (hash a unique column, never
    ``rand()``) so retries and replays see the same assignment.
    """
    b = big.withColumn("__salt", F.pmod(salt, F.lit(n_salts)).cast("long"))
    s = small.withColumn(
        "__salt",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long"))
        ),
    )
    joined = b.join(s, [key, "__salt"], how)
    return joined.drop("__salt")
