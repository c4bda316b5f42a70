"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], one shared SparkSession (JVM startup is NOT
benchmarked — SURVEY.md §6), per-query wall time + total.

Usage: python bench.py [query ...]   (default: the headline set)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Headline set: one per operator family — aggregation, fact-dim join,
#: window, as-of, dedup, text, vectors. Updated as coverage widens.
HEADLINE = [
    "q1_pricing_summary",
    "join_fact_dims_chain",
    "join_left_outer",
    "agg_count_distinct",
    "agg_conditional",
    "join_asof_purchase_before_click",
    "join_interval_events_windows",
]


def main() -> None:
    from process_spark.queries import REGISTRY
    from process_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or [n for n in HEADLINE if n in REGISTRY]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"error: unknown queries {unknown}; known: {sorted(REGISTRY)}", file=sys.stderr)
        sys.exit(2)

    spark = get_spark("process-spark-bench")
    # Warm the JVM + parquet footers once so per-query times measure the
    # query, not first-touch costs.
    spark.range(1).count()

    timings: dict[str, float] = {}
    t_total0 = time.perf_counter()
    for name in names:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()  # full materialization of the result
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)
    total = round(time.perf_counter() - t_total0, 4)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
