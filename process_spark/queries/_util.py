"""Shared helpers for oracle-checked queries.

The driver hash-compares values between Spark and DuckDB
(SURVEY.md §5.2). Floating-point sums are order-dependent, and Spark
and DuckDB will sum partitions in different orders — so any query that
exposes a raw ``SUM(double)`` is a latent hash mismatch.

Policy (applied identically on BOTH sides):
- **Exact-decimal aggregation**: ``SUM(CAST(x AS DECIMAL(18,6)))`` is
  exact integer arithmetic — order-independent and engine-independent —
  then ``CAST(... AS DOUBLE)`` lands both engines on the identical
  float64. Averages = exact decimal sum (as double) / count: one IEEE
  division of identical operands → identical bits.
- **Statistical aggregates** (stddev/corr/...) have no exact form;
  round to a few decimals and keep the magnitude of the rounding unit
  far above the cross-engine numerical noise.
- Raw column values passing through unaggregated are already identical
  bits (both engines read the same parquet) — no rounding needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from process_spark.sources.io import load

__all__ = ["load", "dsum", "davg", "o_dsum", "o_davg", "t"]

# Decimal(18, 6) holds ±1e12 at micro precision — covers every measure
# in the testdata (prices ~1e5, quantities ~1e2) with room for 100 TB
# row counts in the summed magnitude via the wider sum type.
_PREC, _SCALE = 18, 6


def dsum(col: str | Column, alias: str) -> Column:
    """Order-independent, engine-exact sum of a double column → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({_PREC},{_SCALE})")).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Engine-exact average: exact decimal sum (as double) / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal({_PREC},{_SCALE})")).cast("double")
        / F.count(c)
    ).alias(alias)


def o_dsum(expr: str, alias: str) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({_PREC},{_SCALE}))) AS DOUBLE) AS {alias}"


def o_davg(expr: str, alias: str) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL({_PREC},{_SCALE}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand table loader used throughout the query modules."""
    return load(spark, sf_dir, name)


def o_pmod(expr: str, m: str) -> str:
    """DuckDB twin of Spark's float pmod: ``fmod(x, m)`` plus one
    conditional ``+ m`` when negative. The naive
    ``FMOD(FMOD(x,m)+m, m)`` idiom re-rounds through ``x+m`` and drifts
    a ULP — measured, not hypothetical."""
    f = f"FMOD({expr}, {m})"
    return f"(CASE WHEN {f} < 0 THEN {f} + {m} ELSE {f} END)"
