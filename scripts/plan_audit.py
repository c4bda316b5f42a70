"""Generate PLANS.md: physical-plan audit of the headline queries.

For each bench headline query (bench.py:HEADLINE), capture the
AQE-final formatted plan at $SPARK_GRAFT_SF_DIR and annotate the scale
properties that matter at 100 TB: scan pushdown/pruning, join strategy,
exchange count, and whole-stage-codegen coverage. Run after any plan-
affecting change:

    python scripts/plan_audit.py > PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Per-query scale commentary: why this plan survives a 100× scale-up.
NOTES = {
    "text_bm25_topk": (
        "BM25 with a fixed query workload: the corpus tokenizes ONCE "
        "(explode_outer keeps the interpreted HOF out of inferred "
        "pre-filters), the (doc, term) aggregate combines map-side, and "
        "every join against the 13-row workload/df tables is broadcast - "
        "nothing vocabulary-sized shuffles. The only O(corpus) exchange "
        "is the (doc_id, tok) partial-agg shuffle; score summation is "
        "int64 (order-independent). x100 probe: 16.8x at 100x docs."
    ),
    "vec_hybrid_rrf": (
        "Two independent retrieval channels - BM25 (broadcast workload "
        "joins) and brute-cosine (broadcast query side, corpus never "
        "shuffles for scoring) - fused by a unionByName + one small "
        "integer-sum groupBy on (query, doc): the channels NEVER join. "
        "Work is O(corpus x |queries|) in the cosine channel by "
        "definition; a fixed production workload makes it linear in the "
        "corpus, and the IVF/SRP family replaces the exact channel when "
        "the corpus outgrows full scans."
    ),
    "text_postings_stored_lifecycle": (
        "Stored inverted index: postings partitioned on term_bucket = "
        "pmod(hash(tok), 16), so the probe's bounded bucket IN-set "
        "reaches the scan as PartitionFilters and df is exact within "
        "the pruned read; global N/avgdl ride a 1-row sidecar, never "
        "derived from a pruned scan. Compaction rewrites dirs to one "
        "file each - probe latency is file-count-bounded forever."
    ),
    "vec_hybrid_rrf_ann_fixedq": (
        "The hybrid stack's production shape: a FIXED 50-query workload "
        "against a growing corpus. The BM25 channel broadcasts the "
        "workload terms; the vector channel probes the STORED IVF index "
        "- the bounded probed-cell IN-set reaches the cell-partitioned "
        "scan as PartitionFilters, so scoring reads ~n_probe/n_cells of "
        "the corpus; fusion is a unionByName + one integer-sum groupBy. "
        "Per-run cost includes the index BUILD+WRITE (self-contained "
        "query) - a deployment amortizes that across probes."
    ),
    "retrieval_e2e_stored_fixedq": (
        "The full stack's production shape: a FIXED 50-query workload "
        "through postings-probe BM25 (bucket PartitionFilters), "
        "stored-IVF ANN (cell PartitionFilters), integer RRF fuse, and "
        "applyInPandas MMR over fused top-10 pools. Both index builds "
        "are per-run costs a deployment amortizes; the probes and the "
        "pool stage are all bounded by the constant workload, so only "
        "the builds and the pruned reads track corpus size."
    ),
    "retrieval_e2e_stored": (
        "The whole retrieval stack over STORED state in one plan: "
        "postings-index write (one corpus tokenize, term_bucket dirs), "
        "BM25 probe (bucket PartitionFilters; query-by-example term "
        "sets touch most buckets BY WORKLOAD SHAPE - pruning returns "
        "with selective workloads), stored-IVF ANN probe (cell "
        "PartitionFilters), integer RRF fuse, and an applyInPandas MMR "
        "over fused top-10 pools. Both index builds are per-run costs a "
        "deployment amortizes; no stage shuffles more than the "
        "(doc, term) partial agg."
    ),
    "vec_mmr_rerank": (
        "Candidate pools from the broadcast-query brute-force scorer; "
        "the pool's pairwise-sim relation is pool-squared per query "
        "(bounded), and the greedy selection runs in one "
        "FlatMapGroupsInPandas over query groups - the cluster "
        "parallelizes across queries, the sequential loop never sees "
        "more than one pool."
    ),
    "pipeline_domain_cap": (
        "One window over the (source, lang) cell partitioning + one "
        "hash agg - a single exchange keyed on the cell; the md5 "
        "content ordering is computed inside the window sort, and "
        "skewed mega-domains are exactly the rows the cap cuts."
    ),
    "q1_pricing_summary": (
        "Single scan with `l_shipdate` pushed to parquet; map-side partial "
        "HashAggregate on 6 groups -> one tiny exchange. Scales linearly in "
        "input; shuffle volume is O(groups), constant."
    ),
    "q3_shipping_priority": (
        "No broadcast hints: the planner/AQE picks the join strategy from "
        "size stats, so filtered `orders`/`customer` broadcast at small SF "
        "and fall back to shuffle joins when they outgrow executors. "
        "Top-10 via TakeOrderedAndProject - no global sort."
    ),
    "q6_forecast_revenue": (
        "Pure scan-filter-aggregate: every predicate in PushedFilters, "
        "ReadSchema pruned to 4 columns, one-row result. The minimal plan."
    ),
    "q10_returned_items": (
        "Fact-side scans filtered before the joins; dims join by size "
        "stats (no SF-scaling hints). Output bounded by TakeOrdered(20)."
    ),
    "sql_q5_local_supplier_volume": (
        "SQL surface: same Catalyst pipeline as the DataFrame queries - "
        "star join with bounded dims (region/nation) broadcast."
    ),
    "join_fact_dims_chain": (
        "4-dim star join chain; bounded dims (nation, region) broadcast "
        "forever, SF-scaling sides (customer/orders) left to the "
        "optimizer's size estimates."
    ),
    "join_left_outer": (
        "Outer join then aggregate; at scale both sides shuffle on the "
        "join key once - no double exchange (agg reuses the join "
        "partitioning where keys align)."
    ),
    "agg_count_distinct": (
        "Exact distinct via Spark's two-phase expand/partial-agg; the "
        "distinct expansion combines map-side before the key shuffle."
    ),
    "agg_conditional": (
        "count_if/sum(when) are plain aggregate expressions - one "
        "partial+final HashAggregate pair, one exchange."
    ),
    "join_asof_purchase_before_click": (
        "As-of join as union+LOCF: one shuffle on (user, ts) instead of a "
        "per-row range probe; state is a single last-value column."
    ),
    "join_interval_events_windows": (
        "Interval join via time-bucket equi-join with residual range "
        "predicate - shuffle-partitioned, never a broadcast nested loop."
    ),
    "win_sessionize": (
        "Gap sessionization: two stacked windows, both partitioned by "
        "user_id - no global window, scales with user cardinality."
    ),
    "ts_pivot_wide": (
        "Long->wide via groupBy(ts).pivot(fixed signal list): pivot "
        "columns are declared, so no extra distinct-scan job; one shuffle "
        "on the time key."
    ),
    "text_term_frequency": (
        "explode(tokens) -> hash agg; map-side combine absorbs the token "
        "explosion before the shuffle."
    ),
    "text_minhash_lsh_pairs": (
        "Signature table computed once (localCheckpoint - at warehouse "
        "scale, a materialized table) and reused on both sides of the "
        "banded equi-join; explicit repartition parallelizes the "
        "CPU-bound shingle/hash stage. The candidate join is "
        "(band_idx, band_hash) equi - never all-pairs."
    ),
    "vec_knn_bruteforce": (
        "Query side broadcast (small by construction); corpus scored "
        "map-side; the only shuffle is the per-query top-k aggregate."
    ),
    "pipeline_quality_filter": (
        "Pure per-row expressions (length/token/shape/repetition "
        "signals + first-failing-rule CASE) - one scan, zero shuffles, "
        "everything inside whole-stage codegen."
    ),
    "pipeline_pack_sequences": (
        "Running token offsets windowed PER SOURCE stream - no global "
        "sort/window; chunk ids are integer arithmetic on the offsets. "
        "The (source, shard) two-phase variant "
        "(pipeline_pack_sequences_sharded) removes even the per-source "
        "serialization."
    ),
    "pipeline_minhash_dedup_components": (
        "Banded MinHash LSH pairs (md5/concat oracle chain) feeding "
        "min-label propagation: band equi-join for edges, one "
        "edge-join+min-agg shuffle per CC iteration, lineage cut per "
        "iteration; label state is (vertex, long) only."
    ),
    "text_lsh_hot_bucket_guard": (
        "The guarded LSH pair join: windowed bucket census partitioned "
        "on the SAME key the self-join shuffles on, over-cap buckets "
        "cut BEFORE the join (per-task work capped at cap^2), skipped "
        "count broadcast onto every output row (+ all-skipped "
        "sentinel)."
    ),
    "vec_ann_srp_bucketed": (
        "Approximate k-NN as a multi-band bucket EQUI-join: one 63-bit "
        "pool signature per vector computed map-side, 112 band buckets "
        "bit-selected from it, broadcast query bands - only "
        "band-colliding candidates are deduped and exactly re-ranked "
        "(OR-amplification sized for recall@10 >= 0.9 on isotropic "
        "data; SCALE.md). Partial WindowGroupLimit takes per-partition "
        "top-5 BEFORE the q_id shuffle - the exchange carries k rows "
        "per (query, partition), not the candidate set."
    ),
    "sort_topk_suite": (
        "repartition(l_orderkey) + sortWithinPartitions + per-order "
        "top-3: the window's ENSURE_REQUIREMENTS is satisfied by the "
        "explicit repartition, so the whole suite runs in ONE exchange, "
        "and WindowGroupLimit prunes to k rows per group before the "
        "final window evaluation."
    ),
    "sample_hash_deterministic": (
        "Content-keyed md5-threshold sampling: pure row-local "
        "expressions, zero shuffles - both sample branches ride the "
        "same scan and the filter evaluates inside whole-stage codegen. "
        "Reproducible at any scale with no PRNG state."
    ),
    "pipeline_dedup_keeper_lsh": (
        "The production keeper chain: guarded LSH edges (per-task work "
        "capped at cap^2) -> min-label components -> one ranked window "
        "over the (doc_id, component, n_chars) table partitioned by "
        "component. x10 ratio 1.2x where the exact all-pairs-edge "
        "variant measured 3.6x."
    ),
    "dedup_band_index_probe": (
        "Incremental dedup against the STORED band index: historical "
        "bands written partitionBy(band_idx, band_bucket) (repartition "
        "on the keys first - one file per dir), probe batch's bounded "
        "bucket set pushed as PartitionFilters, candidates from the "
        "band equi-join - the historical corpus is never re-joined."
    ),
    "pipeline_semantic_keeper_guarded": (
        "The production keep-one path: IVF cells partition the pair "
        "join, cells over the 512-vector cap are cut JVM-side BEFORE "
        "the grouped map (a window count + filter - the Python worker "
        "never sees a hot cell), components are cell-local, and the "
        "1-row skip census broadcasts onto the output. The quadratic "
        "blow-up a boilerplate cell would cause is bounded at cap**2 "
        "by construction."
    ),
    "pipeline_quality_cascade_dedup": (
        "One corpus scan computes every per-doc signal as fused "
        "projections (no UDF); the cascade is a single CASE; the dedup "
        "stage adds the one unavoidable content-keyed exchange "
        "(row_number over md5(text) groups - md5 keys the shuffle, not "
        "full document text); the scrub touches only final keepers; "
        "the report aggregate is map-side combined on the bounded "
        "(lang, source) domain."
    ),
    "vec_ivf_drift_report": (
        "The stored-IVF rebuild trigger: one map-side-combined "
        "aggregation over the assignments (n_cells output rows) joined "
        "to the n_cells-row centroid table. The corpus is scanned "
        "once; the join is k x k rows. Monitoring cost is one "
        "aggregation regardless of corpus size."
    ),
}

#: Non-headline queries whose plan shape is a scale showcase worth
#: auditing alongside the bench set.
EXTRA_AUDIT = [
    "vec_mmr_rerank",
    "text_postings_stored_lifecycle",
    "pipeline_domain_cap",
    "vec_ann_srp_bucketed",
    "sort_topk_suite",
    "sample_hash_deterministic",
    "pipeline_dedup_keeper_lsh",
    "dedup_band_index_probe",
    "vec_sq8_knn",
    "pipeline_scrubbed_pack",
    "pipeline_stratified_sample",
    "text_heavy_hitters",
    "vec_ivf_stored_append",
    "pipeline_semantic_keeper_guarded",
    "pipeline_quality_cascade_dedup",
    "vec_ivf_drift_report",
]


def main() -> None:
    from bench import HEADLINE
    from process_spark.queries import REGISTRY
    from process_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-audit")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    print("# PLANS — physical-plan audit of the headline queries")
    print()
    print(f"Generated by `python scripts/plan_audit.py` at `{sf_dir}`.")
    print("For each bench headline query: the scale rationale, then the")
    print("operator tree Catalyst/AQE produces. Regenerate after any")
    print("plan-affecting change; tests/test_plan_lint.py and")
    print("tests/test_plan_shapes.py enforce the load-bearing shapes.")
    print()

    for name in HEADLINE + EXTRA_AUDIT:
        df = REGISTRY[name].fn(spark, sf_dir)
        # Execute THIS plan (count() would plan a different query):
        # AQE finalizes and codegen ids appear only after execution.
        df.collect()
        qe = df._jdf.queryExecution()
        plan = qe.explainString(mode)
        # keep the tree section only (drop the per-node detail dump),
        # and within it the AQE *final* plan — the initial plan would
        # double-count exchanges and show pre-runtime join choices
        tree = []
        in_initial = False
        for line in plan.splitlines():
            if "== Initial Plan ==" in line:
                in_initial = True
                continue
            if line.startswith("=="):
                continue
            if not line.strip():
                break
            if not in_initial:
                tree.append(line.replace("== Final Plan ==", "").rstrip())
        n_exchanges = len(re.findall(r"\bExchange\b", "\n".join(tree)))
        # codegen spans: the simple plan marks fused stages `*(N) Op`
        n_codegen = len(
            set(re.findall(r"\*\((\d+)\)", qe.executedPlan().toString()))
        )
        print(f"## {name}")
        print()
        print(NOTES.get(name, ""))
        print()
        print(
            f"Shuffle exchanges in tree: {n_exchanges}; "
            f"whole-stage-codegen spans: {n_codegen}."
        )
        print()
        print("```")
        print("\n".join(tree))
        print("```")
        print()


if __name__ == "__main__":
    main()
