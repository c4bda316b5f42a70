"""Simulate the grading driver's CORRECTNESS run exactly.

The driver grades ``list(queries())[:50]`` with a VANILLA SparkSession —
default 200 shuffle partitions, none of the engine confs from
``process_spark.session.get_spark`` — comparing each query against its
``oracle_sql()`` entry on DuckDB at sf0.01 (row count + schema + value
hash over column-name-sorted, row-sorted, stringified cells).

Run this before every round close: the in-repo sweep
(``python -m process_spark.oracle``) verifies the same comparisons but
under the engine session; this script is the only check that would
catch a query whose result depends on engine confs (partition counts,
timezone, AQE) the driver does not set.

Usage: python scripts/driver_sim.py [sf_dir] [n_window]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_window = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import __spark_entry__ as mod
    from pyspark.sql import SparkSession

    # Vanilla: master only — no shuffle-partition, AQE, or TZ confs.
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    con = duckdb.connect()
    for t_name in TABLES:
        con.execute(
            f"CREATE VIEW {t_name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t_name}.parquet')"
        )

    from process_spark.oracle import _canon_frame

    qs = mod.queries()
    osql = mod.oracle_sql()
    window = list(qs)[:n_window]
    t_start = time.perf_counter()
    n_ok = n_fail = 0
    for name in window:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001 — driver records errors too
            print(f"[ERR ] {name}: spark side raised {exc!r}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in osql:
            # Rows-only contract: the driver records just the row count.
            print(f"[OK  ] {name}: rows-only {len(sdf)} ({dt:.2f}s)")
            n_ok += 1
            continue
        try:
            odf = con.execute(osql[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"[ERR ] {name}: oracle raised {exc!r}")
            n_fail += 1
            continue
        rows_ok = len(sdf) == len(odf)
        cols_ok = sorted(map(str, sdf.columns)) == sorted(map(str, odf.columns))
        vals_ok = rows_ok and cols_ok and _canon_frame(sdf) == _canon_frame(odf)
        if rows_ok and cols_ok and vals_ok:
            n_ok += 1
            print(f"[OK  ] {name}: {len(sdf)} rows ({dt:.2f}s)")
        else:
            n_fail += 1
            print(
                f"[FAIL] {name}: rows {len(sdf)}/{len(odf)} "
                f"rows_ok={rows_ok} cols_ok={cols_ok} vals_ok={vals_ok}"
            )
    wall = time.perf_counter() - t_start
    print(f"\n{n_ok}/{len(window)} OK under vanilla session, {wall:.1f}s wall")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
