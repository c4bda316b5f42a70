"""Local mirror of the driver's correctness gate (SURVEY.md §5.2).

Runs a registered query in Spark and its oracle in DuckDB over the
same parquet, then compares row count, schema shape, and
order-insensitive values — so every hash mismatch is caught here
before the driver sees it.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from process_spark.schemas import TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def duck_connect(sf_dir: str = DEFAULT_SF_DIR) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the driver's pre-registered views."""
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:  # pragma: no cover
        status = "OK  " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for i in self.issues[:5]:
            msg += f"\n        {i}"
        return msg


def _canon_cell(v):
    """Canonicalize one value for order-insensitive comparison.

    Type-strict on numerics: the driver hashes *stringified* cells, so
    Spark int 2207 vs DuckDB float 2207.0 is a driver-side mismatch
    even though Python's ``2207 == 2207.0`` would hide it. Tagging the
    Python type makes this mirror exactly as strict as the driver
    (numpy scalars collapse to Python types first, so int32 vs int64
    width — which stringifies identically — does not false-positive).
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", repr(v))
    if hasattr(v, "dtype") and hasattr(v, "tolist") and not hasattr(v, "columns"):
        # numpy scalar or ndarray
        return _canon_cell(v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _canon_frame(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_cell(row[c]) for c in cols)
        for _, row in pdf.iterrows()
    ]
    return sorted(rows, key=repr)


def compare_query(
    spark: SparkSession,
    name: str,
    sf_dir: str = DEFAULT_SF_DIR,
    con: duckdb.DuckDBPyConnection | None = None,
) -> CompareResult:
    """Run one registered query against its oracle and diff."""
    from process_spark.queries import REGISTRY

    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()

    if spec.oracle is None:
        return CompareResult(
            name=name, ok=len(spark_pdf) >= 0, spark_rows=len(spark_pdf), oracle_rows=-1,
            issues=["rows-only check (no oracle)"],
        )

    own_con = con is None
    if own_con:
        con = duck_connect(sf_dir)
    try:
        duck_pdf = con.execute(spec.oracle).df()
    finally:
        if own_con:
            con.close()

    issues: list[str] = []
    # The driver's canonicalizer crashes on list/array/dict cells
    # (pandas factorize over unhashables); any such cell in an
    # oracle-backed result is a guaranteed driver ERR even though this
    # mirror could compare it. Be exactly as strict.
    for frame, side in ((spark_pdf, "spark"), (duck_pdf, "oracle")):
        for c in frame.columns:
            col = frame[c].dropna()
            if not len(col):
                continue
            v = col.iloc[0]
            # numpy/pandas SCALARS are fine (they stringify like Python
            # scalars); only container cells (ndarray, list, dict) crash
            # the driver's canonicalizer.
            is_ndarray = hasattr(v, "dtype") and getattr(v, "ndim", 0) > 0
            if isinstance(v, (list, tuple, dict, set)) or is_ndarray:
                issues.append(
                    f"unhashable {side} cell type in column {c!r} "
                    f"({type(v).__name__}) — driver would ERR; "
                    "stringify/flatten before exposing"
                )
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        issues.append(
            f"column mismatch: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
    if len(spark_pdf) != len(duck_pdf):
        issues.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")

    if not issues:
        s_rows = _canon_frame(spark_pdf)
        d_rows = _canon_frame(duck_pdf)
        if s_rows != d_rows:
            diffs = [
                f"  spark: {s!r}\n  duck:  {d!r}"
                for s, d in zip(s_rows, d_rows)
                if s != d
            ][:3]
            issues.append("value mismatch; first diffs:\n" + "\n".join(diffs))

    return CompareResult(
        name=name,
        ok=not issues,
        spark_rows=len(spark_pdf),
        oracle_rows=len(duck_pdf),
        issues=issues,
    )


def compare_all(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: list[str] | None = None
) -> list[CompareResult]:
    from process_spark.queries import REGISTRY

    con = duck_connect(sf_dir)
    results = []
    try:
        for name in names or sorted(REGISTRY):
            try:
                results.append(compare_query(spark, name, sf_dir, con))
            except Exception as e:  # surface, keep going
                results.append(
                    CompareResult(
                        name=name, ok=False, spark_rows=-1, oracle_rows=-1,
                        issues=[f"exception: {type(e).__name__}: {e}"],
                    )
                )
    finally:
        con.close()
    return results


if __name__ == "__main__":  # pragma: no cover
    import sys

    from process_spark.session import get_spark

    spark = get_spark("oracle-check")
    names = sys.argv[1:] or None
    res = compare_all(spark, names=names)
    n_ok = sum(r.ok for r in res)
    for r in res:
        print(r)
    print(f"\n{n_ok}/{len(res)} OK")
    sys.exit(0 if n_ok == len(res) else 1)
