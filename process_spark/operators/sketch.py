"""Mergeable-summary sketches (contract extension: frequency analysis
at 100 TB — SURVEY.md §2.13's approximate-aggregate family beside the
engine HLL/GK sketches).

The pattern here is SKETCH + EXACT VERIFY: a bounded-memory first pass
proposes a candidate set with a coverage GUARANTEE (every item above
the frequency bar is in it), then a plain distributed second pass
computes exact counts of just the candidates. The output is therefore
EXACT — SQL-oracle-checkable — while no executor ever holds more than
``capacity`` counters, no matter how many distinct items the stream
carries. That is the production shape: the sketch bounds memory, the
verify pass restores exactness. Because Misra-Gries summaries are
MERGEABLE (Agarwal et al., "Mergeable Summaries", PODS 2012 — public
method), the same construction works one micro-batch at a time: see
:func:`mg_partition_summaries` + :func:`mg_merge` composed by the
streaming twin in queries/streaming.py, and the durable per-batch
state table (:func:`mg_save_batch_summary` / :func:`mg_load_state`)
that makes the streaming twin restartable.

Pass 1 is VECTORIZED: each Arrow batch contributes an exact
``value_counts()`` table (itself a zero-error summary), merged into the
running counters with the mergeable-summaries rule — never a per-row
Python loop. NULL values are excluded by contract (their frequency is
not defined for the literal-IN verify pass); they do not count toward
the total either.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def mg_merge(counters: dict, capacity: int) -> dict:
    """The mergeable-summaries rule: given pointwise-summed counters,
    subtract the (capacity+1)-th largest value and drop non-positives.
    Preserves the MG guarantee — any item with TRUE frequency >
    total/capacity over everything summed so far survives."""
    if len(counters) > capacity:
        sub = sorted(counters.values(), reverse=True)[capacity]
        counters = {k: v - sub for k, v in counters.items() if v - sub > 0}
    return counters


def mg_partition_summaries(
    df: DataFrame, col: str, capacity: int
) -> Tuple[dict, int]:
    """Pass 1 of Misra-Gries, vectorized: one ``capacity``-counter
    summary per partition via mapInPandas, each Arrow batch folded in
    as an exact ``value_counts()`` table (a zero-error summary) merged
    under the mergeable-summaries rule — the per-item work is
    per-DISTINCT-item-per-batch, never per row. Each partition emits
    exactly ONE typed row ``(items array<T>, counts array<long>,
    part_total long)`` where ``T`` is derived from ``df.schema`` — no
    string coercion, no NULL-keyed sentinel. NULL values are excluded
    from both candidates and the total by contract (documented in the
    module docstring). Returns ``(summed_counters, total_non_null)``;
    the collect is one row per partition — bounded BY CONSTRUCTION."""
    import pandas as pd  # noqa: PLC0415

    elem_t = df.schema[col].dataType.simpleString()
    cap = capacity

    def mg(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            vc = pdf[col].value_counts(dropna=True)
            n_rows += int(vc.sum())
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            counters = mg_merge(counters, cap)
        yield pd.DataFrame(
            {
                "items": [list(counters.keys())],
                "counts": [list(counters.values())],
                "part_total": [n_rows],
            }
        )

    rows = (
        df.select(col)
        .mapInPandas(
            mg,
            schema=(
                f"items array<{elem_t}>, counts array<long>,"
                " part_total long"
            ),
        )
        .collect()
    )
    merged: dict = {}
    total = 0
    for r in rows:
        total += r["part_total"]
        for k, c in zip(r["items"] or [], r["counts"] or []):
            merged[k] = merged.get(k, 0) + c
    return merged, total


def frequent_items(df: DataFrame, col: str, capacity: int = 16) -> DataFrame:
    """Heavy hitters via Misra-Gries + exact verify: every value of
    ``col`` whose global frequency is at least ``total // capacity +
    1``, with its EXACT count.

    Pass 1 = :func:`mg_partition_summaries` (already pointwise-summed
    across partitions); :func:`mg_merge` bounds the driver table at
    ``capacity`` while preserving the MG guarantee: any item with
    global frequency > total/capacity survives. Because the output
    threshold is STRICTLY greater than total/capacity, the candidate
    set provably contains every qualifying item, and pass 2 — a
    literal IN filter pushed to the scan, then an exact hash
    aggregate — restores exact counts. The only driver-side state is
    one array row per partition and the ≤ capacity-item candidate
    list."""
    counters, total = mg_partition_summaries(df, col, capacity)
    merged = mg_merge(counters, capacity)
    return exact_verify(df, col, list(merged.keys()), total, capacity)


def exact_verify(
    df: DataFrame, col: str, candidates: list, total: int, capacity: int
) -> DataFrame:
    """Pass 2: exact counts of the ≤ capacity candidates (literal IN
    pushed to the scan), filtered at the strictly-above-total/capacity
    bar the sketch guarantees coverage for."""
    thr = total // capacity + 1
    exact = (
        df.filter(F.col(col).isin(candidates))
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return exact.filter(F.col("cnt") >= thr).withColumn(
        "threshold", F.lit(thr).cast("long")
    )


# ---------------------------------------------------------------------
# Durable streaming state: per-batch summary table
#
# A restartable streaming deployment cannot keep the MG counters in a
# driver dict — a driver restart wipes them while the checkpoint marks
# the consumed files done, silently undercounting on resume. The
# durable shape: each micro-batch writes its OWN summary (pre-merge —
# the batch's exact/MG counters plus the batch's row total) to a
# batch_id-keyed subdirectory with mode=overwrite. Because the write
# is keyed by batch_id and overwritten whole, a replayed batch (the
# at-least-once foreachBatch contract) rewrites the same directory
# instead of double-counting — the documented exactly-once-via-batchId
# pattern. Reload = read every batch row, pointwise-sum, mg_merge:
# exact by the mergeable-summaries theorem, regardless of how many
# times the driver died in between.
# ---------------------------------------------------------------------


def mg_save_batch_summary(
    spark: SparkSession,
    state_dir: str,
    batch_id: int,
    counters: dict,
    batch_total: int,
    elem_type: str = "string",
) -> None:
    """Persist ONE micro-batch's MG summary as a single typed row under
    ``state_dir/batch_id=<id>/`` (mode=overwrite → idempotent under
    foreachBatch replay). The row is the same arrays shape pass 1
    emits; state volume is one tiny file per batch, compacted away by
    reload's mg_merge.

    Sealed-replay guard: a batch at or below the compactor's
    ``sealed_through`` watermark is already folded into the sealed
    ``batch_id = -1`` summary — a crash-mid-batch → compact → restart
    replay of it must NOT write a second copy (the counts would
    double on every later reload). Such a save is a no-op."""
    import pandas as pd  # noqa: PLC0415

    if batch_id >= 0 and batch_id <= _mg_read_watermark(spark, state_dir):
        return
    pdf = pd.DataFrame(
        {
            "items": [list(counters.keys())],
            "counts": [[int(v) for v in counters.values()]],
            "batch_total": [int(batch_total)],
        }
    )
    sdf = spark.createDataFrame(
        pdf,
        schema=(
            f"items array<{elem_type}>, counts array<long>,"
            " batch_total long"
        ),
    )
    sdf.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch_id={batch_id}")
    )


def mg_load_state(
    spark: SparkSession, state_dir: str, capacity: int
) -> Tuple[dict, int]:
    """Reconstruct the cross-batch MG state from the per-batch summary
    table: pointwise-sum every stored batch summary, then one
    :func:`mg_merge`. Exact by mergeability — the result covers every
    item above total/capacity over EVERYTHING ingested so far, no
    matter how many restarts interleaved the batches. Returns
    ``({}, 0)`` when no state exists yet. The collect is one row per
    batch — bounded by batch count, never by data volume.

    Rows from live batches at or below the ``sealed_through``
    watermark are SKIPPED: their counts already live inside the sealed
    ``batch_id = -1`` summary (the save-side guard makes such rows
    unreachable going forward; the load-side skip also neutralizes any
    written before the guard existed)."""
    try:
        rows = spark.read.option("basePath", state_dir).parquet(
            os.path.join(state_dir, "batch_id=*")
        ).collect()
    except Exception:
        _mg_raise_if_half_swapped(spark, state_dir)
        return {}, 0
    wm = _mg_read_watermark(spark, state_dir)
    merged: dict = {}
    total = 0
    for r in rows:
        if 0 <= r["batch_id"] <= wm:
            continue
        total += r["batch_total"]
        for k, c in zip(r["items"] or [], r["counts"] or []):
            merged[k] = merged.get(k, 0) + c
    return mg_merge(merged, capacity), total


def mg_partition_summaries_by_group(
    df: DataFrame, group_col: str, col: str, capacity: int
) -> Tuple[dict, dict]:
    """Pass 1 of GROUPED Misra-Gries: one ``capacity``-counter summary
    per (partition, group) — the per-batch work is a single vectorized
    ``groupby().value_counts()`` folded in under the mergeable-
    summaries rule, never a per-row loop. Emits one typed row per
    (partition, group); the collect and the executor memory are
    bounded at ``capacity × |groups| × n_partitions`` counters, so the
    CONTRACT is a bounded-domain group column (lang, source, shard —
    never user_id). Returns ``(counters_by_group, totals_by_group)``
    with NULL group keys and NULL values excluded (same exclusion
    contract as :func:`mg_partition_summaries`)."""
    import pandas as pd  # noqa: PLC0415

    elem_t = df.schema[col].dataType.simpleString()
    grp_t = df.schema[group_col].dataType.simpleString()
    cap = capacity

    def mg(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}
        totals: dict = {}
        for pdf in batches:
            vc = pdf.groupby(group_col, dropna=True)[col].value_counts(
                dropna=True
            )
            for (g, v), c in vc.items():
                d = counters.setdefault(g, {})
                d[v] = d.get(v, 0) + int(c)
                totals[g] = totals.get(g, 0) + int(c)
            for g in counters:
                counters[g] = mg_merge(counters[g], cap)
        yield pd.DataFrame(
            {
                "grp": list(counters.keys()),
                "items": [list(counters[g].keys()) for g in counters],
                "counts": [list(counters[g].values()) for g in counters],
                "part_total": [totals[g] for g in counters],
            }
        )

    rows = (
        df.select(group_col, col)
        .mapInPandas(
            mg,
            schema=(
                f"grp {grp_t}, items array<{elem_t}>,"
                " counts array<long>, part_total long"
            ),
        )
        .collect()
    )
    merged: dict = {}
    totals: dict = {}
    for r in rows:
        g = r["grp"]
        totals[g] = totals.get(g, 0) + r["part_total"]
        d = merged.setdefault(g, {})
        for k, c in zip(r["items"] or [], r["counts"] or []):
            d[k] = d.get(k, 0) + c
    return (
        {g: mg_merge(d, capacity) for g, d in merged.items()},
        totals,
    )


def frequent_items_by_group(
    df: DataFrame, group_col: str, col: str, capacity: int = 16
) -> DataFrame:
    """GROUPED heavy hitters — sketch + exact verify PER GROUP: every
    (group, value) whose within-group frequency is at least
    ``group_total // capacity + 1``, with its EXACT count and the
    group's threshold. The per-group MG guarantee is the ungrouped one
    applied group-wise (each group's summary only ever merges rows of
    that group), so coverage holds per group; pass 2 joins the bounded
    (group, candidate) table — broadcast, ≤ capacity × |groups| rows —
    back onto the corpus for exact counts, map-side combined. Same
    bounded-group-domain contract as pass 1."""
    merged, totals = mg_partition_summaries_by_group(
        df, group_col, col, capacity
    )
    spark = df.sparkSession
    grp_t = df.schema[group_col].dataType.simpleString()
    elem_t = df.schema[col].dataType.simpleString()
    cand = spark.createDataFrame(
        [(g, k) for g, d in merged.items() for k in d],
        f"{group_col} {grp_t}, {col} {elem_t}",
    )
    thr = spark.createDataFrame(
        [(g, t // capacity + 1) for g, t in totals.items()],
        f"{group_col} {grp_t}, threshold long",
    )
    exact = (
        df.join(F.broadcast(cand), [group_col, col])
        .groupBy(group_col, col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return exact.join(F.broadcast(thr), group_col).filter(
        F.col("cnt") >= F.col("threshold")
    )


def mg_save_batch_summary_by_group(
    spark: SparkSession,
    state_dir: str,
    batch_id: int,
    counters_by_group: dict,
    totals_by_group: dict,
    grp_type: str = "string",
    elem_type: str = "string",
) -> None:
    """Grouped twin of :func:`mg_save_batch_summary`: one typed row per
    GROUP under ``state_dir/batch_id=<id>/`` (mode=overwrite → the
    whole batch directory is rewritten on a foreachBatch replay, so no
    group double-counts). Row volume per batch = |groups| — bounded by
    the same bounded-group-domain contract as pass 1. Same
    sealed-replay guard as the ungrouped save: a batch at or below the
    ``sealed_through`` watermark is a no-op."""
    import pandas as pd  # noqa: PLC0415

    if batch_id >= 0 and batch_id <= _mg_read_watermark(spark, state_dir):
        return
    groups = sorted(totals_by_group)
    pdf = pd.DataFrame(
        {
            "grp": groups,
            "items": [
                list(counters_by_group.get(g, {}).keys()) for g in groups
            ],
            "counts": [
                [int(v) for v in counters_by_group.get(g, {}).values()]
                for g in groups
            ],
            "batch_total": [int(totals_by_group[g]) for g in groups],
        }
    )
    sdf = spark.createDataFrame(
        pdf,
        schema=(
            f"grp {grp_type}, items array<{elem_type}>,"
            " counts array<long>, batch_total long"
        ),
    )
    sdf.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch_id={batch_id}")
    )


def mg_load_state_by_group(
    spark: SparkSession, state_dir: str, capacity: int
) -> Tuple[dict, dict]:
    """Reconstruct per-group MG state from the grouped batch-summary
    table: pointwise-sum each group's stored summaries, then one
    :func:`mg_merge` per group — exact per group by mergeability,
    restart-proof for the same reason the ungrouped loader is.
    Returns ``(counters_by_group, totals_by_group)``; ``({}, {})``
    when no state exists. The collect is |groups| rows per batch.
    Same sealed-replay skip as the ungrouped loader."""
    try:
        rows = spark.read.option("basePath", state_dir).parquet(
            os.path.join(state_dir, "batch_id=*")
        ).collect()
    except Exception:
        _mg_raise_if_half_swapped(spark, state_dir)
        return {}, {}
    wm = _mg_read_watermark(spark, state_dir)
    merged: dict = {}
    totals: dict = {}
    for r in rows:
        if 0 <= r["batch_id"] <= wm:
            continue
        g = r["grp"]
        totals[g] = totals.get(g, 0) + r["batch_total"]
        d = merged.setdefault(g, {})
        for k, c in zip(r["items"] or [], r["counts"] or []):
            d[k] = d.get(k, 0) + c
    return {g: mg_merge(d, capacity) for g, d in merged.items()}, totals


def _mg_fs(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Path factory) for ``path`` — the same
    FS-agnostic routing :func:`compact_partitioned_index` uses, so the
    durable MG state table works on local disk, HDFS, or any
    configured ``hadoop-*`` connector alike."""
    from process_spark.operators.fsutil import fs_path

    return fs_path(spark, path)


def _mg_raise_if_half_swapped(spark: SparkSession, state_dir: str) -> None:
    """A missing/unreadable state dir is NORMAL before first ingest —
    but if the crash window between the compactor's two renames left
    the only copy under ``__precompact``, silently returning empty
    state would zero the deployment's counters. Detect and fail loudly
    with the recovery path instead.

    FS-probe failures are NOT swallowed: this runs only when the state
    read already failed, and if the FileSystem itself cannot be
    resolved (mistyped scheme, missing connector) the deployment's
    counters would otherwise silently reset to empty — the exact
    outcome the loud-fail exists to prevent. Only the benign case
    (probe succeeds, no half-swap evidence) returns."""
    fs, HPath = _mg_fs(spark, state_dir)
    old = state_dir.rstrip("/") + "__precompact"
    if (not fs.exists(HPath(state_dir))) and fs.exists(HPath(old)):
        raise RuntimeError(
            f"MG state dir {state_dir} is missing but {old} exists — "
            "a compaction crashed mid-swap; rename the __precompact "
            "copy back into place before loading"
        )


def _mg_read_watermark(spark: SparkSession, state_dir: str) -> int:
    """``sealed_through`` watermark of the state dir: the highest
    batch_id folded into the sealed summary, or -1 when the dir was
    never compacted (operators/fsutil.py — the shared sealed-state
    discipline; the postings ``_stats`` sidecar uses the same one)."""
    from process_spark.operators.fsutil import read_watermark

    return read_watermark(spark, state_dir)


def _mg_write_watermark(spark: SparkSession, state_dir: str, wm: int) -> None:
    from process_spark.operators.fsutil import write_watermark

    write_watermark(spark, state_dir, wm)


def _mg_live_batch_ids(spark: SparkSession, state_dir: str) -> list:
    """Non-sealed batch_ids currently present as partition subdirs —
    bounded by batch count (one listStatus), used by the compactor to
    advance the sealed_through watermark."""
    from process_spark.operators.fsutil import live_batch_ids

    return live_batch_ids(spark, state_dir)


def _mg_state_files(spark: SparkSession, state_dir: str) -> int:
    fs, HPath = _mg_fs(spark, state_dir)
    hp = HPath(state_dir)
    if not fs.exists(hp):
        return 0
    it = fs.listFiles(hp, True)
    n = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            n += 1
    return n


def _mg_swap_in(spark: SparkSession, state_dir: str, tmp: str) -> None:
    """Atomically-as-the-FS-allows replace ``state_dir`` with ``tmp``:
    rename aside, rename in, restore on failure, drop the old copy
    (operators/fsutil.py swap_in). Identical contract (and S3
    copy+delete caveat) to the index compactor's swap."""
    from process_spark.operators.fsutil import swap_in

    swap_in(spark, state_dir, tmp, label="mg state")


def mg_compact_state(
    spark: SparkSession,
    state_dir: str,
    capacity: int,
    elem_type: str = "string",
) -> dict:
    """Maintenance op for the durable MG state table: fold every
    per-batch summary into ONE sealed ``batch_id = -1`` row — the same
    small-files rhythm the stored indexes get from
    ``compact_partitioned_index``. Without it the state dir grows one
    subdirectory per micro-batch forever, and every
    :func:`mg_load_state` opens one file per batch ingested since the
    deployment started. Sealing is exact by the mergeable-summaries
    theorem: the sealed summary is the pointwise sum + one bounding
    merge — exactly what reload computes anyway — so a resume after
    compaction reconstructs identical state (kill-resume tested).

    Crash-safe ordering: the sealed summary is written COMPLETE to a
    scratch sibling (``<state_dir>__compacting``) first, then swapped
    in whole (rename aside → rename in → restore on failure — the
    index compactor's swap). At no point is the only copy of the
    state a half-written directory: a crash before the swap leaves
    the original per-batch dirs untouched (stale scratch is deleted
    on the next run); a crash between the two renames leaves the full
    state under ``__precompact``, which :func:`mg_load_state` detects
    and reports loudly instead of returning empty state. Paths route
    through the Hadoop FileSystem API, so local disk, HDFS, and
    object-store connectors all work (S3-like "rename" is copy+delete
    — there, prefer a fresh prefix + catalog pointer flip).

    Sealed-replay safety: the sealed summary carries a
    ``sealed_through`` watermark (the ``_SEALED_THROUGH`` sidecar —
    max batch_id folded in, written INSIDE the scratch dir so it swaps
    atomically with the summary). A batch replayed after its summary
    was sealed (crash mid-batch → compact → restart) is skipped by
    :func:`mg_save_batch_summary` and, defensively, by
    :func:`mg_load_state` — without the watermark its counts would be
    double-counted forever (summaries carry no doc identity to
    anti-join against, unlike the band index, but they don't need it:
    batch_ids are monotone, so "already folded" is a pure ordering
    fact).

    Returns ``{"files_before", "files_after"}``."""
    counters, total = mg_load_state(spark, state_dir, capacity)
    wm = max(
        [_mg_read_watermark(spark, state_dir)]
        + _mg_live_batch_ids(spark, state_dir)
    )
    files_before = _mg_state_files(spark, state_dir)
    fs, HPath = _mg_fs(spark, state_dir)
    tmp = state_dir.rstrip("/") + "__compacting"
    fs.delete(HPath(tmp), True)
    mg_save_batch_summary(spark, tmp, -1, counters, total, elem_type)
    _mg_write_watermark(spark, tmp, wm)
    _mg_swap_in(spark, state_dir, tmp)
    return {
        "files_before": files_before,
        "files_after": _mg_state_files(spark, state_dir),
    }


def mg_compact_state_by_group(
    spark: SparkSession,
    state_dir: str,
    capacity: int,
    grp_type: str = "string",
    elem_type: str = "string",
) -> dict:
    """Grouped twin of :func:`mg_compact_state`: seals one row PER
    GROUP under ``batch_id = -1`` (|groups| rows total — bounded by
    the bounded-group-domain contract). Same exactness argument
    (mergeable per group), same write-to-scratch-then-swap crash
    ordering, same Hadoop-FS routing, same ``sealed_through``
    watermark (sealed-replay batches skip at save AND load)."""
    counters_by_group, totals_by_group = mg_load_state_by_group(
        spark, state_dir, capacity
    )
    wm = max(
        [_mg_read_watermark(spark, state_dir)]
        + _mg_live_batch_ids(spark, state_dir)
    )
    files_before = _mg_state_files(spark, state_dir)
    fs, HPath = _mg_fs(spark, state_dir)
    tmp = state_dir.rstrip("/") + "__compacting"
    fs.delete(HPath(tmp), True)
    mg_save_batch_summary_by_group(
        spark, tmp, -1, counters_by_group, totals_by_group,
        grp_type, elem_type,
    )
    _mg_write_watermark(spark, tmp, wm)
    _mg_swap_in(spark, state_dir, tmp)
    return {
        "files_before": files_before,
        "files_after": _mg_state_files(spark, state_dir),
    }
