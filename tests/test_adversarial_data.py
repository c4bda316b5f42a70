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

# Vector queries over the degenerate-embeddings table: a zero vector
# and an underflow vector ([0, ..., 1e-320]: squares underflow, norm
# is exactly 0 despite a nonzero element) must be EXCLUDED from cosine
# scoring by both engines — not crash the job (ANSI DIVIDE_BY_ZERO,
# round-3 regression on unit_with) and not score inf/nan in DuckDB.
VEC_QUERIES = [
    "vec_norms",
    "vec_cosine_pairs",
    "vec_knn_bruteforce",
    "vec_near_dup",
    "vec_norm_dup_suite",
    "vec_ann_srp_bucketed",
    "vec_srp_lsh_buckets",
    "vec_centroids",
    "vec_near_dup_arrow",  # rows-only: per-block matmul kernel
    "vec_ivf_knn",        # rows-only: must complete, not crash
    "vec_ivf_knn_arrow",  # rows-only: broadcast-probe matmul path
    "vec_knn_arrow",      # rows-only: batch matmul kernel path
    "vec_kmeans_clusters",  # rows-only: assignment over zero vectors
    "vec_knn_arrow_idset",     # margin-guarded Arrow oracle: must stay
    "vec_near_dup_arrow_idset",  # green when extra/degenerate ids appear
    "vec_ivf_knn_md5_idset",   # end-to-end IVF oracle, same robustness
    "vec_kmeans_md5_assignments",  # unrolled-Lloyd oracle, same robustness
    # round-7 additions: tuners/adaptive search must COMPLETE (rows-
    # only) over zero/underflow vectors; the stored/soft oracles must
    # stay hash-green
    "vec_ann_srp_tuned",
    "vec_ivf_tuned",
    "vec_ann_srp_search_tuned",
    "vec_ivf_search_tuned",
    "vec_pq_knn",
    "vec_ivf_stored_probe",
    "pipeline_semantic_dedup_ivf_soft",
    # int8 ADC over degenerate vectors: constant dims quantize to 0
    # on both engines, the integer oracle must stay hash-green
    "vec_sq8_knn",
    # append lifecycle over degenerate vectors: the md5-chain oracle
    # (build on evens, assign everything) must stay hash-green
    "vec_ivf_stored_append",
    # rows-only: IVF×SQ8 composition must complete over zero/underflow
    # vectors (both excluded by the __cn > 0 gates)
    "vec_ivf_sq8_knn",
    # round-8: the int8-matmul twin shares vec_sq8_knn's exact oracle
    # and must stay hash-green with degenerate vectors excluded the
    # same way; the composed md5 idset and the compaction lifecycle
    # replay their chains over the degenerate rows too
    "vec_sq8_knn_arrow",
    "vec_ivf_sq8_md5_idset",
    "vec_ivf_stored_compact",
    # keep-one policy over degenerate vectors: zero/underflow rows pair
    # with nothing, so each must survive as its own keeper
    "pipeline_semantic_keeper",
    # round-9: the guarded keeper replays the same chain with the
    # hot-cell cap + skip census; degenerate rows are still singletons
    # and the census rides on every row
    "pipeline_semantic_keeper_guarded",
    # round-9: the stored SRP lifecycle (write→probe→append→compact→
    # re-probe) must stay exact-hash green over zero/underflow vectors
    # (they band like any vector; cosine re-rank NULLs them out — the
    # same degenerate handling the in-memory SRP query has)
    "vec_srp_stored_lifecycle",
    # round-9: the streaming vector-ingest sink replays the md5 IVF
    # chain over the degenerate rows (2-d fixture norms ≥ 1, so every
    # row assigns and pairs deterministically) — oracle must stay green
    "stream_semantic_dedup_probe",
    # round-9: the streaming SRP sink — degenerate vectors band
    # deterministically (zero/underflow rows sign to signature 0 on
    # both engines) and may pair with each other; the band-collision
    # oracle must stay green
    "stream_srp_index_probe",
    # round-9: the drift report replays the md5 chain + one more
    # aggregation; degenerate rows assign deterministically (2-d
    # fixture) and shift the per-cell means identically on both sides
    "vec_ivf_drift_report",
]

# Text queries over the degenerate-documents table: empty text,
# whitespace-only text, and single-token docs (shorter than the
# 3-gram shingle window).
TEXT_QUERIES = [
    "text_tokenize_stats",
    "text_term_frequency",
    "text_tfidf",
    "text_ngram_shingles",
    "text_jaccard_pairs_blocked",
    "text_minhash_lsh_md5_pairs",
    "text_simhash_candidates",
    "text_exact_content_dedup",
    "text_fingerprint_rolling",
    "text_quality_signals",
    "text_language_guess",
    "text_lang_source_stats",
    "text_lexicon_score",
    "text_lsh_hot_bucket_guard",   # guard census over degenerate docs
    "text_simhash_md5_pairs",      # empty docs vote to signature 0
    "mm_decode_real_headers",      # header round trip incl. nc=0 docs
    "mm_decode_ppm_pixels",        # 1-px-wide rasters (w=1 duplicates
    "mm_decode_wav_pcm",           # resize indices), 1-sample PCM
    # round-7: stored-index lifecycle + streaming twin over degenerate
    # docs (empty/whitespace texts band to empty shingle sets — the
    # write→probe→append cycle and the foreachBatch stream must stay
    # oracle-green, not crash on them)
    "dedup_band_index_append",
    "stream_dedup_index_probe",
    # round-9: the stored SimHash index — degenerate docs vote to
    # signature 0, band identically on both engines, and may pair
    # cross-population; the md5-chain oracle must stay green
    "dedup_simhash_index_probe",
    # zero-token docs have no LM probability: both engines must DROP
    # them (not emit NULL means or divide by zero)
    "pipeline_lm_quality_score",
    # docs shorter than the span window have zero spans (empty range
    # on both engines), zero-token docs are dropped entirely
    "pipeline_span_dedup_coverage",
    # scrubs must pass zero-token / sub-window docs through with
    # clean_text = '' / original tokens, not drop or crash on them
    "pipeline_contamination_scrub",
    "pipeline_span_scrub",
    "pipeline_scrubbed_pack",
    # round-8: maintenance, gates, redaction and budgets over
    # degenerate docs — empty/whitespace texts band to empty shingle
    # sets (compaction must not choke on them), the repetition gate
    # keeps zero-shingle docs, PII injection appends to '' cleanly,
    # the budget report's discrete median covers 1-doc groups, and
    # the cascade composes all of it
    "dedup_band_index_compact",
    "text_repetition_filter",
    "pipeline_pii_scrub",
    "pipeline_token_budget_report",
    "pipeline_quality_cascade",
    # round-9: the dedup-stage cascade — the adversarial table's two
    # empty-text docs are cut_quality BEFORE the content window, so
    # they must never pair on the empty content key
    "pipeline_quality_cascade_dedup",
    "text_heavy_hitters_by_lang",
    # zero-token docs excluded; the srcY mirrors must appear (the
    # non-vacuity test below pins that)
    "pipeline_source_overlap",
    # empty text → 0 everywhere; whitespace-only text → n_ws_tokens 0
    # but n_bpe_tokens 1 (the residual \\s+ branch) on BOTH engines
    "text_bpe_token_count",
    # sketch+verify over degenerate docs: the threshold moves with the
    # appended tokens, output stays exactly the oracle's filter
    "text_heavy_hitters",
    # cluster histogram over the degenerate graph (empty-shingle docs
    # band nowhere → singletons) must match the keeper chain's oracle
    "pipeline_dedup_cluster_stats",
    # per-source counts over degenerate docs; zero-token docs are
    # never exact-dup members (srcX holds two of them — they must NOT
    # pair on the empty content key)
    "pipeline_source_quality_report",
    # deterministic per-lang top-k unaffected by appended rows beyond
    # rank shifts — both engines agree on the md5 order
    "pipeline_stratified_sample",
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

    # --- embeddings: append degenerate vectors ------------------------
    etbl = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    edf = etbl.to_pandas()
    dim = len(edf["embedding"].iloc[0])
    max_id = int(edf["vec_id"].max())
    import numpy as np

    degenerates = [
        # exact zero vector
        np.zeros(dim, dtype="float32"),
        # nonzero f32 element whose f64 SQUARE underflows to 0 during
        # the norm fold (1e-170² = 1e-340 → 0): passes any-nonzero
        # filters yet has norm exactly 0 — the round-3 crash repro.
        np.array([0.0] * (dim - 1) + [1e-170], "float32"),
        # tiny-but-valid norm (≈8e-23): must normalize, not drop
        np.full(dim, 1e-23, dtype="float32"),
    ]
    edf2 = type(edf)(
        {
            "vec_id": list(edf["vec_id"])
            + [max_id + 1 + i for i in range(len(degenerates))],
            "embedding": list(edf["embedding"]) + degenerates,
            "label": list(edf["label"]) + list(edf["label"][: len(degenerates)]),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(edf2, schema=etbl.schema, preserve_index=False),
        os.path.join(DST, "embeddings.parquet"),
    )

    # --- documents: append degenerate texts ---------------------------
    dtbl = pq.read_table(os.path.join(SRC, "documents.parquet"))
    ddf = dtbl.to_pandas()
    dmax = int(ddf["doc_id"].max())
    extras = [
        ("", "en", "srcX"),            # empty
        ("   \t  \n ", "en", "srcX"),  # whitespace-only
        ("solo", "en", "srcX"),        # single token < shingle window
        ("two tokens", "de", "srcX"),  # below 3-gram window
    ]
    # cross-source mirrors: two existing texts re-published under a
    # source that does not otherwise exist — pipeline_source_overlap
    # must report the (orig_source, srcY) pairs, and the span/LSH
    # dedup queries must treat them as ordinary cross-doc duplicates
    extras += [
        (str(ddf["text"].iloc[0]), "en", "srcY"),
        (str(ddf["text"].iloc[1]), "fr", "srcY"),
    ]
    drows = {
        "doc_id": list(ddf["doc_id"]) + [dmax + 1 + i for i in range(len(extras))],
        "text": list(ddf["text"]) + [e[0] for e in extras],
        "lang": list(ddf["lang"]) + [e[1] for e in extras],
        "source": list(ddf["source"]) + [e[2] for e in extras],
        "n_chars": list(ddf["n_chars"]) + [len(e[0]) for e in extras],
    }
    pq.write_table(
        pa.Table.from_pandas(type(ddf)(drows), schema=dtbl.schema,
                             preserve_index=False),
        os.path.join(DST, "documents.parquet"),
    )

    tbl = pq.read_table(os.path.join(SRC, "events.parquet"))
    df = tbl.to_pandas()
    # negatives: shift a third of the values below zero
    df.loc[df.index % 3 == 0, "value"] = df["value"] - 500.0
    # duplicate (user_id, ts): clone every 10th row with a fresh id
    dup = df[df.index % 10 == 0].copy()
    dup["event_id"] = dup["event_id"] + 1_000_000
    # unknown event type on a slice of the clones
    dup.loc[dup.index % 2 == 0, "event_type"] = "mystery"
    # a user with ALL-NULL values (conditional aggs / LOCF must not
    # assume every user has data) and a single-event user (windows,
    # sessionization, lag-3 deltas degenerate to one row)
    extremes = df.iloc[:8].copy()
    max_uid = int(df["user_id"].max())
    extremes["event_id"] = extremes["event_id"] + 2_000_000
    extremes["user_id"] = max_uid + 1
    extremes["value"] = None
    solo = df.iloc[8:9].copy()
    solo["event_id"] = solo["event_id"] + 3_000_000
    solo["user_id"] = max_uid + 2
    out = type(df).from_records(
        list(df.to_records(index=False))
        + list(dup.to_records(index=False))
        + list(extremes.to_records(index=False))
        + list(solo.to_records(index=False))
    )
    out.columns = df.columns
    pq.write_table(
        pa.Table.from_pandas(out, schema=tbl.schema, preserve_index=False),
        os.path.join(DST, "events.parquet"),
    )
    yield DST



#: Measured >8 s per replay on this host (r14 durations): stored-index
#: lifecycle / streaming composites whose cost is fixed (index writes,
#: restarts), not data-sized. Skipped in the default fast profile,
#: covered by --runslow / SPARK_GRAFT_SLOW=1 (conftest docstring).
SLOW_ADVERSARIAL = {
    "dedup_band_index_compact",
    "stream_dedup_index_probe",
    "stream_srp_index_probe",
    "vec_srp_stored_lifecycle",
    "vec_ann_srp_search_tuned",
}


def _p(names):
    return [
        pytest.param(n, marks=pytest.mark.slow)
        if n in SLOW_ADVERSARIAL
        else n
        for n in names
    ]


@pytest.mark.parametrize("name", _p(QUERIES))
def test_parity_on_adversarial_events(spark, adversarial_dir, name):
    from process_spark.oracle import compare_query

    res = compare_query(spark, name, sf_dir=adversarial_dir)
    assert res.ok, str(res)


@pytest.mark.parametrize("name", _p(VEC_QUERIES))
def test_parity_on_degenerate_embeddings(spark, adversarial_dir, name):
    from process_spark.oracle import compare_query

    res = compare_query(spark, name, sf_dir=adversarial_dir)
    assert res.ok, str(res)


@pytest.mark.parametrize("name", _p(TEXT_QUERIES))
def test_parity_on_degenerate_documents(spark, adversarial_dir, name):
    from process_spark.oracle import compare_query

    res = compare_query(spark, name, sf_dir=adversarial_dir)
    assert res.ok, str(res)


def _window_rest():
    from process_spark.queries.registry import GRADED_WINDOW

    covered = set(QUERIES) | set(VEC_QUERIES) | set(TEXT_QUERIES)
    return [n for n in GRADED_WINDOW if n not in covered]


@pytest.mark.parametrize("name", _window_rest())
def test_graded_window_parity_on_adversarial(spark, adversarial_dir, name):
    """EVERY graded-window query must stay oracle-correct on the
    adversarial tables — the driver regenerates testdata between
    rounds, and a query whose parity depends on a data property the
    schema doesn't guarantee is a latent red row (this sweep caught
    the bare-trim whitespace mismatch in udf_python_udtf_suite)."""
    from process_spark.oracle import compare_query

    res = compare_query(spark, name, sf_dir=adversarial_dir)
    assert res.ok, str(res)


def test_lsh_hot_bucket_guard_bounds_pair_blowup(spark):
    """A boilerplate corpus (10k byte-identical docs → one huge band
    bucket) must NOT produce O(n²) candidate pairs when the guard is
    on: hot buckets are cut before the self-join, so no task ever holds
    the quadratic set; the skipped-bucket count rides the output, and a
    small (under-cap) duplicate group still pairs normally."""
    from process_spark.operators.dedup import (
        lsh_band_bucket_stats,
        minhash_lsh_pairs,
    )

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(10_000)]
    rows += [(20_000 + j, "a small genuine near dup group body text") for j in range(3)]
    rows += [
        (30_000 + j, f"unique filler document number {j} token {j * 7} {j * 13}")
        for j in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    guarded = minhash_lsh_pairs(
        df, "doc_id", num_hashes=16, bands=4, max_bucket_size=8
    )
    out = guarded.collect()  # unguarded would emit ~2e8 pair-band rows
    assert out, "under-cap duplicate group must still produce pairs"
    # The 3-doc under-cap group must pair fully (all 4 bands shared);
    # NOTHING from the 10k hot bucket (its ~5e7 pairs are the thing
    # being prevented); total stays tiny (filler docs may legitimately
    # collide on shared shingles).
    group = [r for r in out if 20_000 <= r["id_a"] < 20_003]
    assert len(group) == 3
    assert all(r["n_shared_bands"] == 4 for r in group)
    assert not any(r["id_a"] < 10_000 or r["id_b"] < 10_000 for r in out)
    assert len(out) < 500
    # every band's boilerplate bucket was skipped, and the output says so
    assert all(r["n_skipped_buckets"] == 4 for r in out)

    stats = {
        r["band_idx"]: r
        for r in lsh_band_bucket_stats(
            df, "doc_id", num_hashes=16, bands=4, max_bucket_size=8
        ).collect()
    }
    assert set(stats) == {0, 1, 2, 3}
    for s in stats.values():
        assert s["max_bucket_size"] == 10_000
        assert s["n_over_cap"] == 1


def test_lsh_guard_all_skipped_emits_sentinel(spark):
    """When EVERY band bucket exceeds the cap, the pair set is empty —
    the skipped count must still be observable from the OUTPUT (one
    sentinel row with NULL ids), not vanish exactly in the
    most-truncated case."""
    from process_spark.operators.dedup import minhash_lsh_pairs

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(i, boiler) for i in range(50)], "doc_id long, text string"
    )
    out = minhash_lsh_pairs(
        df, "doc_id", num_hashes=16, bands=4, max_bucket_size=8
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row["id_a"] is None and row["id_b"] is None
    assert row["n_shared_bands"] is None
    assert row["n_skipped_buckets"] == 4


def test_simhash_md5_rejects_uneven_band_bits(spark):
    """base_hash='md5' (60-bit signature) with the xxhash64 default
    band_bits=16 would silently band only 48 of 60 bits — must raise
    instead of weakening the pigeonhole guarantee."""
    import pytest as _pytest

    from process_spark.operators.dedup import simhash_dedup_candidates

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="band_bits"):
        simhash_dedup_candidates(df, "doc_id", base_hash="md5")


def test_simhash_guard_bounds_boilerplate_bucket(spark):
    """The SimHash band join has the same boilerplate failure mode as
    MinHash LSH (identical docs → identical 64-bit signature → one
    huge band bucket); the max_bucket_size guard must cut it before
    the self-join while an under-cap duplicate group still pairs."""
    from process_spark.operators.dedup import simhash_dedup_candidates

    rows = [(i, "the same boilerplate body repeated everywhere") for i in range(5_000)]
    rows += [(10_000 + j, "a tiny distinct duplicate group body") for j in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = simhash_dedup_candidates(df, "doc_id", max_bucket_size=8).collect()
    assert out, "under-cap duplicate group must still produce pairs"
    assert not any(r["id_a"] < 10_000 or r["id_b"] < 10_000 for r in out)
    small = {(r["id_a"], r["id_b"]) for r in out}
    assert small == {(10_000, 10_001), (10_000, 10_002), (10_001, 10_002)}
    assert all(r["hamming"] == 0 for r in out)


def test_source_overlap_not_vacuous(spark, adversarial_dir):
    """pipeline_source_overlap returns 0 rows on the pristine testdata
    (no cross-source exact duplicates exist there) — the srcY mirrors
    in this fixture are what actually exercise the pair join, so pin
    that they show up."""
    from process_spark.queries.registry import REGISTRY

    import pyarrow.parquet as pq

    rows = (
        REGISTRY["pipeline_source_overlap"].fn(spark, adversarial_dir).collect()
    )
    pairs = {(r["src_a"], r["src_b"]) for r in rows}
    # derive the expected pairs from the fixture itself (the mirrored
    # texts' original sources depend on driver-generated testdata)
    ddf = pq.read_table(
        os.path.join(adversarial_dir, "documents.parquet")
    ).to_pandas()
    mirrored_srcs = set(ddf["source"].iloc[:2])
    expected = {tuple(sorted((s, "srcY"))) for s in mirrored_srcs}
    assert pairs == expected, rows
    assert all(b == "srcY" for _, b in pairs), rows
    total_shared = sum(r["n_shared_contents"] for r in rows)
    assert total_shared == 2, rows
