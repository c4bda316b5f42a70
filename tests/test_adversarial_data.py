"""Oracle parity on ADVERSARIAL testdata (code-review regression).

The driver regenerates /root/testdata between rounds (it has already
shipped two different events.ts layouts), so oracle parity must not
depend on data properties the schema doesn't guarantee. This builds an
events table with exactly the traps a regeneration could introduce —
negative values (pmod-vs-fmod and floor-vs-trunc divergence),
duplicate (user_id, ts) pairs (session tie-breaks), and an event_type
outside the weights lexicon (join-scoped aggregates) — and re-runs the
Spark-vs-DuckDB comparison for every query whose oracle a review
flagged as data-shape-dependent.
"""

from __future__ import annotations

import os
import shutil

import pytest

SRC = "/root/testdata/sf0.001"
DST = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), ".scratch", "adversarial"
)

QUERIES = [
    "nmea_time_coord_suite",   # pmod vs FMOD on negative values
    "udf_scalar_python",       # floor-div vs trunc-div on negatives
    "udf_pandas_suite",        # same, numpy kernel
    "win_sessionize",          # duplicate-ts session tie-break
    "win_session_stats",
    "win_events_suite",
    "stream_session_window",
    "stream_user_state_suite",  # unknown event_type + weights join scope
    "agg_stats_suite",         # moments/percentiles over negatives
]


@pytest.fixture(scope="module")
def adversarial_dir():
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    for name in os.listdir(SRC):
        if name.endswith(".parquet") and name != "events.parquet":
            shutil.copyfile(os.path.join(SRC, name), os.path.join(DST, name))

    tbl = pq.read_table(os.path.join(SRC, "events.parquet"))
    df = tbl.to_pandas()
    # negatives: shift a third of the values below zero
    df.loc[df.index % 3 == 0, "value"] = df["value"] - 500.0
    # duplicate (user_id, ts): clone every 10th row with a fresh id
    dup = df[df.index % 10 == 0].copy()
    dup["event_id"] = dup["event_id"] + 1_000_000
    # unknown event type on a slice of the clones
    dup.loc[dup.index % 2 == 0, "event_type"] = "mystery"
    out = (
        type(df)
        .from_records(list(df.to_records(index=False)) + list(dup.to_records(index=False)))
    )
    out.columns = df.columns
    pq.write_table(
        pa.Table.from_pandas(out, schema=tbl.schema, preserve_index=False),
        os.path.join(DST, "events.parquet"),
    )
    yield DST


@pytest.mark.parametrize("name", QUERIES)
def test_parity_on_adversarial_events(spark, adversarial_dir, name):
    from process_spark.oracle import compare_query

    res = compare_query(spark, name, sf_dir=adversarial_dir)
    assert res.ok, str(res)
