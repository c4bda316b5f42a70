"""Time every registered query at a given SF (default sf0.1).

Robustness/perf sweep: the driver grades correctness at sf0.01, but
the engine claims 100 TB shape — this sweep runs each registered
query at 10x the grading SF and prints per-query wall time sorted
slowest-first, so pathological plans surface before they matter.

Usage: python scripts/sweep_timing.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from process_spark.queries import REGISTRY
    from process_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = [a for a in args if not os.path.isdir(a)] or list(REGISTRY)

    spark = get_spark("process-spark-sweep")
    spark.range(1).count()

    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    failures: dict[str, str] = {}
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            failures[name] = "unknown query (or mistyped sf_dir path)"
            print(f"# {name}: SKIP unknown", flush=True)
            continue
        t0 = time.perf_counter()
        try:
            df = spec.fn(spark, sf_dir)
            rows[name] = df.count()
            times[name] = time.perf_counter() - t0
        except Exception as e:  # keep sweeping; report at the end
            failures[name] = f"{type(e).__name__}: {e}"
            times[name] = time.perf_counter() - t0
        print(f"# {name}: {times[name]:.3f}s rows={rows.get(name, -1)}", flush=True)

    print("\n== slowest 20 ==")
    for name in sorted(times, key=times.get, reverse=True)[:20]:
        print(f"{times[name]:8.3f}s  {name}  rows={rows.get(name, -1)}")
    total = sum(times.values())
    print(f"\ntotal {total:.1f}s across {len(times)} queries at {sf_dir}")
    if failures:
        print(f"\n== {len(failures)} FAILURES ==")
        for name, err in failures.items():
            print(f"  {name}: {err}")
        sys.exit(1)


if __name__ == "__main__":
    main()
