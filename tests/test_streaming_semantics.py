"""Value-pinned semantics for the rows-only streaming operators
(SURVEY.md §2.13 O91-O93, O95).

These queries have no cross-engine SQL twin (emission timing and batch
boundaries are engine-specific), so the driver only row-counts them.
Locally we can still pin the *final* state against the batch
computation: after an availableNow drain, running aggregates must have
reached exactly the batch totals, and dedup must have produced a
key-unique result.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from process_spark.queries import REGISTRY
from process_spark.queries._util import t

SF = "/root/testdata/sf0.001"


def _batch_events(spark):
    return t(spark, SF, "events")


def test_stream_dedup_watermark_key_unique(spark):
    out = REGISTRY["stream_dedup_watermark"].fn(spark, SF)
    n = out.count()
    n_distinct = out.select("event_id").distinct().count()
    assert n == n_distinct, "dedup emitted a duplicate event_id"
    # events.event_id is unique in the testdata, so exactly-once
    # delivery means every event survives.
    assert n == _batch_events(spark).count()


@pytest.mark.parametrize(
    "name", ["stream_stateful_user_stats", "stream_transform_with_state"]
)
def test_stateful_running_stats_reach_batch_totals(spark, name):
    out = REGISTRY[name].fn(spark, SF)
    # update-mode emissions: one row per (user, micro-batch touched);
    # the running count per user peaks at the batch total, and the
    # running max never exceeds (and finally equals) the batch max.
    final = out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("max_value").alias("max_value"),
    )
    batch = (
        _batch_events(spark)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("value").alias("max_value"),
        )
    )
    f_rows = {r["user_id"]: (r["n_events"], r["max_value"]) for r in final.collect()}
    b_rows = {r["user_id"]: (r["n_events"], r["max_value"]) for r in batch.collect()}
    assert f_rows.keys() == b_rows.keys()
    for uid, (n_f, v_f) in f_rows.items():
        n_b, v_b = b_rows[uid]
        assert n_f == n_b, f"user {uid}: running count {n_f} != batch {n_b}"
        assert v_f == pytest.approx(v_b), f"user {uid}: running max mismatch"


def test_foreach_batch_export_totals_match_batch(spark):
    out = REGISTRY["stream_foreach_batch_export"].fn(spark, SF)
    per_type = {
        r["event_type"]: (r["n"], r["sum_value"])
        for r in out.groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))
        .collect()
    }
    batch = {
        r["event_type"]: (r["n"], r["sum_value"])
        for r in _batch_events(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    assert per_type.keys() == batch.keys()
    for et, (n_s, v_s) in per_type.items():
        n_b, v_b = batch[et]
        assert n_s == n_b, f"{et}: exported count {n_s} != batch {n_b}"
        # cross-batch double re-sum: tolerance, not bit equality
        assert v_s == pytest.approx(v_b, abs=1e-6)
