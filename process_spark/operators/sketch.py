"""Mergeable-summary sketches (contract extension: frequency analysis
at 100 TB — SURVEY.md §2.13's approximate-aggregate family beside the
engine HLL/GK sketches).

The pattern here is SKETCH + EXACT VERIFY: a bounded-memory first pass
proposes a candidate set with a coverage GUARANTEE (every item above
the frequency bar is in it), then a plain distributed second pass
computes exact counts of just the candidates. The output is therefore
EXACT — SQL-oracle-checkable — while no executor ever holds more than
``capacity`` counters, no matter how many distinct items the stream
carries. That is the production shape: the sketch bounds memory, the
verify pass restores exactness. Because Misra-Gries summaries are
MERGEABLE (Agarwal et al., "Mergeable Summaries", PODS 2012 — public
method), the same construction works one micro-batch at a time: see
:func:`mg_partition_summaries` + :func:`mg_merge` composed by the
streaming twin in queries/streaming.py.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_partition_summaries(df: DataFrame, col: str, capacity: int) -> list:
    """Pass 1 of Misra-Gries: one ``capacity``-counter summary per
    partition via mapInPandas, collected. Each partition also emits a
    NULL-keyed row carrying its raw row count, so the stream total
    needs no second scan. The collect is ≤ capacity × n_partitions
    rows + one total row per partition — bounded BY CONSTRUCTION."""
    import pandas as pd  # noqa: PLC0415

    def mg(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                n_rows += 1
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    dead = []
                    for k2 in counters:
                        counters[k2] -= 1
                        if counters[k2] == 0:
                            dead.append(k2)
                    for k2 in dead:
                        del counters[k2]
        yield pd.DataFrame(
            {
                col: list(counters.keys()) + [None],
                "c": list(counters.values()) + [n_rows],
            }
        )

    return (
        df.select(col)
        .mapInPandas(mg, schema=f"{col} string, c long")
        .collect()
    )


def mg_merge(counters: dict, capacity: int) -> dict:
    """The mergeable-summaries rule: given pointwise-summed counters,
    subtract the (capacity+1)-th largest value and drop non-positives.
    Preserves the MG guarantee — any item with TRUE frequency >
    total/capacity over everything summed so far survives."""
    if len(counters) > capacity:
        sub = sorted(counters.values(), reverse=True)[capacity]
        counters = {k: v - sub for k, v in counters.items() if v - sub > 0}
    return counters


def frequent_items(df: DataFrame, col: str, capacity: int = 16) -> DataFrame:
    """Heavy hitters via Misra-Gries + exact verify: every value of
    ``col`` whose global frequency is at least ``total // capacity +
    1``, with its EXACT count.

    Pass 1 = :func:`mg_partition_summaries`; the per-partition
    summaries merge driver-side via :func:`mg_merge`, which preserves
    the MG guarantee: any item with global frequency > total/capacity
    survives. Because the output threshold is STRICTLY greater than
    total/capacity, the candidate set provably contains every
    qualifying item, and pass 2 — a literal IN filter pushed to the
    scan, then an exact hash aggregate — restores exact counts. The
    only driver-side state is capacity × n_partitions counter rows and
    the ≤ capacity-item candidate list."""
    summaries = mg_partition_summaries(df, col, capacity)
    total = sum(r["c"] for r in summaries if r[col] is None)
    merged: dict = {}
    for r in summaries:
        if r[col] is not None:
            merged[r[col]] = merged.get(r[col], 0) + r["c"]
    merged = mg_merge(merged, capacity)
    return exact_verify(df, col, list(merged.keys()), total, capacity)


def exact_verify(
    df: DataFrame, col: str, candidates: list, total: int, capacity: int
) -> DataFrame:
    """Pass 2: exact counts of the ≤ capacity candidates (literal IN
    pushed to the scan), filtered at the strictly-above-total/capacity
    bar the sketch guarantees coverage for."""
    thr = total // capacity + 1
    exact = (
        df.filter(F.col(col).isin(candidates))
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return exact.filter(F.col("cnt") >= thr).withColumn(
        "threshold", F.lit(thr).cast("long")
    )
