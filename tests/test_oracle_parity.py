"""Rehearsal of the driver's t2 gate (SURVEY.md §5.2): every registered
query with an oracle must match DuckDB exactly at sf0.001 (the small SF
keeps the full sweep fast; the standalone `python -m process_spark.oracle`
run covers sf0.01 before each commit).

Fast/slow split (conftest docstring): the heavyweight lifecycle /
streaming / unrolled-MMR composites dominate the sweep's wall time
(the two e2e rows alone are ~3 min EACH — their DuckDB oracle unrolls
a 5-step MMR CTE chain), so every measured >8 s replay that is NOT in
the driver's graded window is marked slow. The graded 50 stay in the
default profile unconditionally, and the full 282-query sweep still
runs with --runslow / SPARK_GRAFT_SLOW=1 (and standalone via
`python -m process_spark.oracle`, the pre-commit ritual)."""

from __future__ import annotations

import pytest

from process_spark.queries import REGISTRY
from process_spark.queries.registry import GRADED_WINDOW

SF_SMALL = "/root/testdata/sf0.001"

#: Measured >8 s per replay on this host (pytest --durations, r14) and
#: not driver-graded: the stored-index lifecycle, streaming-sink and
#: MMR-unroll composites whose cost is fixed (index writes, restarts,
#: recursive CTEs), not data-sized.
SLOW_ORACLE = {
    "retrieval_e2e_stored",
    "retrieval_e2e_stored_fixedq",
    "vec_mmr_rerank_ivf",
    "stream_srp_index_probe_guarded",
    "stream_dedup_index_compacted",
    "dedup_band_index_updated",
    "stream_bm25_index_updated",
    "stream_srp_index_compacted",
    "vec_srp_stored_lifecycle",
    "stream_stream_join",
    "dedup_band_index_compact",
    "stream_bm25_index_compacted",
    "vec_ivf_stored_updated",
    "stream_dedup_index_probe_guarded",
    "stream_srp_index_probe",
    "vec_ivf_index_repaired",
    "text_postings_stored_lifecycle",
    "vec_ann_srp_search_tuned",
    "stream_dedup_index_probe",
    "vec_ivf_index_audit",
    "text_postings_stats_audit",
    "vec_pq_drift_report",
}


def test_slow_set_never_covers_graded_window():
    """The driver grades the window — its parity replays must never be
    skippable, whatever their cost."""
    assert not SLOW_ORACLE & set(GRADED_WINDOW)


def _params():
    for name in sorted(REGISTRY):
        if name in SLOW_ORACLE and name not in GRADED_WINDOW:
            yield pytest.param(name, marks=pytest.mark.slow)
        else:
            yield name


@pytest.mark.parametrize("name", list(_params()))
def test_query_matches_oracle(spark, name):
    from process_spark.oracle import compare_query

    res = compare_query(spark, name, sf_dir=SF_SMALL)
    assert res.ok, str(res)
