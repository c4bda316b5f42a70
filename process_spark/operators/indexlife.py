"""Generic DELETE/UPDATE lifecycle for STORED partitioned indexes —
the tombstone → purge-at-compaction → re-ingest rhythm the postings
family ships in operators/retrieval.py, factored out so every other
stored family (the IVF cell index, the SRP/MinHash/SimHash band
indexes) gets the same answer from ONE implementation instead of four
ports (SURVEY.md §2 contract extension "deduplication" / "similarity
search" — the maintenance story those stored layouts need at 100 TB).

Why this exists: deleting a document updates the text index
(queries/retrieval.stream_bm25_index_updated) but its EMBEDDING stayed
searchable and its SIGNATURES kept matching — semantic dedup and ANN
retrieval would resurrect deleted content forever. Same rhythm as
Lucene's soft-deletes + merge-time purge (cited as a design analogy,
not copied code).

Layout (all under one index ``path``):

- ``data/`` — the index rows, ``partitionBy(part_cols)`` (the family's
  pruning key: ``cell_id`` for IVF, ``(band_idx, band_bucket)`` for
  band indexes). One file per touched dir per write.
- ``_ids/`` — identity membership, ``partitionBy(id_bucket)`` with
  ``id_bucket = pmod(hash(id), n_id_buckets)``: the index's pruning
  key depends on CONTENT (an updated embedding lands in a different
  cell; re-tokenized text in different buckets), so "is this id in the
  index?" needs an id-keyed sidecar to stay a pruned lookup — the
  postings ``_docs`` precedent, minus the dl payload (no probe here
  needs global stats corrected).
- ``_meta/`` — one row ``(id_col, part_cols, n_id_buckets)`` persisted
  at build time, so tombstone/append/compact derive their pruning
  config from the index instead of trusting caller-supplied values
  (the mismatched-n_buckets bug class the postings family had to
  validate away).
- ``_tombstones/`` — logical deletes ``(id_bucket, id)``; probes
  anti-join them out immediately, bytes go at the next compaction.

Unlike the postings index there is NO stats sidecar: BM25 needed
(N, Σdl) corrected per delete; cosine/Jaccard probes score per-pair,
so a delete is complete once the row is invisible.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from process_spark.operators.fsutil import fs_exists, fs_path


def _ids_membership(
    rows: DataFrame, id_col: str, n_id_buckets: int
) -> DataFrame:
    """``(id_bucket, <id_col>)`` — one row per distinct id."""
    return (
        rows.select(id_col)
        .distinct()
        .select(
            F.pmod(F.hash(id_col), F.lit(n_id_buckets))
            .cast("int")
            .alias("id_bucket"),
            id_col,
        )
    )


def index_meta(spark: SparkSession, path: str) -> dict:
    """The persisted index config: ``{"id_col", "part_cols",
    "n_id_buckets"}`` (part_cols as a list)."""
    row = spark.read.parquet(posixpath.join(path, "_meta")).collect()
    if len(row) != 1:
        raise ValueError(
            f"stored index at {path}: _meta must hold exactly one row, "
            f"found {len(row)}"
        )
    return {
        "id_col": row[0]["id_col"],
        "part_cols": row[0]["part_cols"].split(","),
        "n_id_buckets": int(row[0]["n_id_buckets"]),
    }


def _bucket_in_set(ids: DataFrame, id_col: str, n_id_buckets: int) -> list:
    """Bounded (≤ n_id_buckets ints) bucket IN-set of an id relation."""
    return sorted(
        r["b"]
        for r in ids.select(
            F.pmod(F.hash(id_col), F.lit(n_id_buckets)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    )


def write_stored_index(
    rows: DataFrame,
    path: str,
    part_cols: list[str],
    id_col: str,
    mode: str = "overwrite",
    n_id_buckets: int = 16,
    n_write_tasks: int = 8,
) -> None:
    """Write (or append to) a stored index under the lifecycle layout.

    ``mode="overwrite"`` is an in-place REBUILD: stale ``_tombstones``
    from a previous life at the path are deleted first (they would
    silently anti-join live ids out of every probe — the same gap the
    postings writer closed), and ``_ids``/``_meta`` are rewritten.

    ``mode="append"`` validates against the persisted ``_meta`` (a
    caller-supplied layout that disagrees with the bytes fails loudly,
    never prunes wrong) and enforces the APPEND-ONLY identity contract:
    any batch id already in ``_ids`` — live OR tombstoned-but-unpurged
    — raises with the update recipe. Detection is exact and content-
    independent (the id-keyed sidecar sees a changed-content re-ingest
    whose index rows share no partition with the stored copy).

    Crash ordering: ``_ids`` is written BEFORE ``data`` on purpose. A
    crash between the two writes leaves the batch's ids REGISTERED but
    its index rows absent, so re-running the append RAISES the
    already-ingested error above — fail loud, then repair
    (:func:`tombstone_index_ids` the batch's ids →
    :func:`compact_stored_index` purges them from ``_ids`` →
    re-ingest) and the index is exact again. The opposite order would
    leave the rows in ``data`` invisible to the ``_ids``-based
    validation, so the re-run would APPEND THE SAME ROWS AGAIN —
    silent duplicates (inflated band-collision counts, duplicate ANN
    candidates) that nothing downstream detects. The half-ingested
    state is visible to :func:`stored_index_audit` as
    ``n_ids_without_data > 0``."""
    data_dir = posixpath.join(path, "data")
    ids_dir = posixpath.join(path, "_ids")
    meta_dir = posixpath.join(path, "_meta")
    spark = rows.sparkSession
    if mode == "append":
        meta = index_meta(spark, path)
        if (
            meta["id_col"] != id_col
            or meta["part_cols"] != list(part_cols)
            or meta["n_id_buckets"] != n_id_buckets
        ):
            raise ValueError(
                f"stored index at {path} was built with {meta}, append "
                f"requested id_col={id_col!r}, part_cols={list(part_cols)}, "
                f"n_id_buckets={n_id_buckets}"
            )
        bids = rows.select(id_col).distinct().localCheckpoint(eager=True)
        held = (
            spark.read.parquet(ids_dir)
            .filter(
                F.col("id_bucket").isin(
                    _bucket_in_set(bids, id_col, n_id_buckets)
                )
            )
            .join(F.broadcast(bids), id_col, "left_semi")
        )
        foreign = [r[id_col] for r in held.limit(5).collect()]
        if foreign:
            raise ValueError(
                f"stored index at {path}: append re-ingests ids already "
                f"in the index (sample: {foreign}) — ids are append-only."
                " To UPDATE: tombstone_index_ids, compact_stored_index "
                "(purges every trace), then re-ingest the new version"
            )
    else:
        fs, HPath = fs_path(spark, path)
        fs.delete(HPath(posixpath.join(path, "_tombstones")), True)
    rows = rows.localCheckpoint(eager=False)  # two consumers below
    # _ids FIRST (see the crash-ordering contract in the docstring):
    # a crash between the writes must make the re-run fail loud, not
    # silently duplicate the batch's data rows.
    (
        _ids_membership(rows, id_col, n_id_buckets)
        .repartition(1)
        .write.mode(mode)
        .partitionBy("id_bucket")
        .parquet(ids_dir)
    )
    (
        rows.repartition(n_write_tasks, *[F.col(c) for c in part_cols])
        .write.mode(mode)
        .partitionBy(*part_cols)
        .parquet(data_dir)
    )
    if mode != "append":
        spark.createDataFrame(
            [(id_col, ",".join(part_cols), n_id_buckets)],
            "id_col string, part_cols string, n_id_buckets int",
        ).coalesce(1).write.mode("overwrite").parquet(meta_dir)
    spark.catalog.refreshByPath(data_dir)
    spark.catalog.refreshByPath(ids_dir)


def tombstone_index_ids(
    spark: SparkSession, path: str, ids: DataFrame
) -> dict:
    """Logical DELETE: record ``ids`` (a bounded maintenance request,
    single column named as the index's id_col) under
    ``_tombstones/(id_bucket)``. Probes must exclude them immediately
    (:func:`live_index_rows`); bytes are purged at the next
    :func:`compact_stored_index`, after which the ids are free to
    re-ingest (the UPDATE path). Raises on ids never ingested (deleting
    what does not exist is a caller bug, not a no-op); re-tombstoning
    is idempotent (skipped). Returns ``{"n_tombstoned": n}``."""
    meta = index_meta(spark, path)
    id_col, nb = meta["id_col"], meta["n_id_buckets"]
    ids_dir = posixpath.join(path, "_ids")
    tomb_dir = posixpath.join(path, "_tombstones")
    req = ids.select(id_col).distinct().localCheckpoint(eager=True)
    members = (
        spark.read.parquet(ids_dir)
        .filter(F.col("id_bucket").isin(_bucket_in_set(req, id_col, nb)))
        .join(F.broadcast(req), id_col, "left_semi")
        .select("id_bucket", id_col)
        .localCheckpoint(eager=True)
    )
    missing = [
        r[id_col]
        for r in req.join(members, id_col, "left_anti").limit(5).collect()
    ]
    if missing:
        raise ValueError(
            f"tombstone_index_ids: ids not in the index at {path} "
            f"(sample: {missing})"
        )
    fresh = members
    if fs_exists(spark, tomb_dir):
        fresh = members.join(
            spark.read.parquet(tomb_dir).select(id_col), id_col, "left_anti"
        )
    n = fresh.count()
    if n:
        (
            fresh.repartition(1)
            .write.mode("append")
            .partitionBy("id_bucket")
            .parquet(tomb_dir)
        )
    return {"n_tombstoned": n}


def live_index_rows(spark: SparkSession, path: str) -> DataFrame:
    """The index's LIVE rows: ``data/`` minus tombstoned ids. Partition
    filters a caller stacks on top (the probe's cell/bucket IN-set)
    still reach the scan — the anti-join keys on the id column, so the
    pruning predicate pushes below it. No broadcast hint on the
    tombstone side: the set grows until the next purge — AQE sizes the
    join (the postings probe's reasoning, verbatim)."""
    meta = index_meta(spark, path)
    stored = spark.read.parquet(posixpath.join(path, "data"))
    tomb_dir = posixpath.join(path, "_tombstones")
    if fs_exists(spark, tomb_dir):
        stored = stored.join(
            spark.read.parquet(tomb_dir).select(meta["id_col"]),
            meta["id_col"],
            "left_anti",
        )
    return stored


def compact_stored_index(
    spark: SparkSession, path: str, n_write_tasks: int = 8
) -> dict:
    """Offline maintenance pass: rewrite ``data/`` (one file per
    partition dir) and ``_ids/`` with tombstoned ids PURGED (the
    deletes ride the rewrite compaction does anyway —
    compact_partitioned_index's ``row_filter`` hook), then drop the
    tombstones LAST — after which the ids are free to re-ingest.

    Crash ordering: every component swaps whole; a crash anywhere
    before the tombstone drop leaves probes correct (tombstones still
    anti-join, purged rows resolve to nothing) and re-ingests of the
    half-purged ids still REFUSED (``_ids`` keeps them until its own
    purge lands) — re-running the compactor converges (purges are
    idempotent, the drop completes). Refuses a tombstone set covering
    the ENTIRE index (the rewrite would leave empty parquet dirs that
    fail schema inference on every later read — drop the index
    directory instead). ``n_purged_ids`` counts ids actually still
    present before the rewrite (0 on a post-crash re-run), not the
    tombstone count. Run between ingest runs, like every compactor
    (the directory swaps are not transactional against in-flight
    readers)."""
    from process_spark.operators.dedup import compact_partitioned_index

    meta = index_meta(spark, path)
    id_col = meta["id_col"]
    data_dir = posixpath.join(path, "data")
    ids_dir = posixpath.join(path, "_ids")
    tomb_dir = posixpath.join(path, "_tombstones")

    row_filter = None
    tomb_ids = None
    n_purged = 0
    if fs_exists(spark, tomb_dir):
        tomb_ids = (
            spark.read.parquet(tomb_dir)
            .select(id_col)
            .distinct()
            .localCheckpoint(eager=True)  # outlives the dir drop below
        )
        idx_ids = spark.read.parquet(ids_dir).select(id_col)
        n_purged = idx_ids.join(tomb_ids, id_col, "left_semi").count()
        if idx_ids.join(tomb_ids, id_col, "left_anti").limit(1).count() == 0:
            raise ValueError(
                f"compact_stored_index: tombstones at {path} cover the "
                "ENTIRE index — purging would leave empty data/_ids dirs "
                "that fail schema inference on every later read. Drop "
                "the whole index directory instead"
            )

        def row_filter(df):  # noqa: F811 — the purge hook
            return df.join(tomb_ids, id_col, "left_anti")

    out = {
        "data": compact_partitioned_index(
            spark, data_dir, meta["part_cols"], n_write_tasks,
            row_filter=row_filter,
        ),
        "ids": compact_partitioned_index(
            spark, ids_dir, ["id_bucket"], n_write_tasks,
            row_filter=row_filter,
        ),
        "n_purged_ids": n_purged,
    }
    if tomb_ids is not None:
        fs, HPath = fs_path(spark, tomb_dir)
        fs.delete(HPath(tomb_dir), True)
    spark.catalog.refreshByPath(data_dir)
    spark.catalog.refreshByPath(ids_dir)
    return out


def stored_index_audit(spark: SparkSession, path: str) -> DataFrame:
    """Cross-component INTEGRITY MONITOR for a stored-index layout
    (the postings family's ``postings_stats_audit``, for the generic
    lifecycle): reconcile the ``_ids`` identity sidecar, the ``data``
    rows, and the ``_tombstones`` against each other — one row of
    exact integers with a ``consistent`` verdict. Every divergence
    class this catches maps to a named crash window:

    - ``n_ids_without_data > 0`` — an append crashed between the
      ``_ids`` write and the ``data`` write (the fail-loud half of
      :func:`write_stored_index`'s crash-ordering contract); repair =
      tombstone the orphaned ids → :func:`compact_stored_index` →
      re-ingest.
    - ``n_data_ids_without_ids > 0`` — rows reached ``data`` around
      the sidecar (a raw write, or an index written before the
      _ids-first ordering existed): these ids are INVISIBLE to the
      append-only validation, so a re-ingest would silently duplicate
      them; repair = rebuild with ``mode="overwrite"``.
    - ``n_dup_id_rows > 0`` — the same id registered twice in
      ``_ids`` (double-append around the validation); repair =
      rebuild.
    - ``n_tombstones_without_ids > 0`` — a compaction crashed between
      the ``_ids`` purge and the tombstone drop (the documented
      re-run-converges window); repair = re-run
      :func:`compact_stored_index`.

    All reconciliation is distributed (distinct + one full-outer join
    on the id column, aggregated to counts — no driver-side id sets),
    so the audit holds at any index size. ``consistent`` is TRUE iff
    all four divergence counts are zero."""
    meta = index_meta(spark, path)
    id_col = meta["id_col"]
    ids_rows = spark.read.parquet(posixpath.join(path, "_ids")).select(
        id_col
    )
    data_ids = (
        spark.read.parquet(posixpath.join(path, "data"))
        .select(id_col)
        .distinct()
    )
    id_counts = ids_rows.agg(
        F.count(F.lit(1)).cast("long").alias("n_id_rows"),
        F.countDistinct(id_col).cast("long").alias("n_ids"),
    )
    recon = (
        ids_rows.distinct()
        .withColumn("_in_ids", F.lit(1))
        .join(data_ids.withColumn("_in_data", F.lit(1)), id_col, "full_outer")
        .agg(
            F.coalesce(F.sum("_in_data"), F.lit(0))
            .cast("long")
            .alias("n_data_ids"),
            F.coalesce(
                F.sum(
                    F.when(F.col("_in_data").isNull(), F.lit(1)).otherwise(
                        F.lit(0)
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_ids_without_data"),
            F.coalesce(
                F.sum(
                    F.when(F.col("_in_ids").isNull(), F.lit(1)).otherwise(
                        F.lit(0)
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_data_ids_without_ids"),
        )
    )
    tomb_dir = posixpath.join(path, "_tombstones")
    if fs_exists(spark, tomb_dir):
        tomb_ids = (
            spark.read.parquet(tomb_dir).select(id_col).distinct()
        )
        tomb = (
            tomb_ids.join(
                ids_rows.distinct().withColumn("_in_ids", F.lit(1)),
                id_col,
                "left_outer",
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_tombstoned"),
                F.coalesce(
                    F.sum(
                        F.when(F.col("_in_ids").isNull(), F.lit(1))
                        .otherwise(F.lit(0))
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_tombstones_without_ids"),
            )
        )
    else:
        tomb = spark.createDataFrame(
            [(0, 0)],
            "n_tombstoned long, n_tombstones_without_ids long",
        )
    return (
        id_counts.crossJoin(recon)
        .crossJoin(tomb)
        .select(
            "n_ids",
            (F.col("n_id_rows") - F.col("n_ids")).alias("n_dup_id_rows"),
            "n_data_ids",
            "n_ids_without_data",
            "n_data_ids_without_ids",
            "n_tombstoned",
            "n_tombstones_without_ids",
            (
                (F.col("n_ids_without_data") == 0)
                & (F.col("n_data_ids_without_ids") == 0)
                & (F.col("n_id_rows") == F.col("n_ids"))
                & (F.col("n_tombstones_without_ids") == 0)
            ).alias("consistent"),
        )
    )


def repair_stored_index(spark: SparkSession, path: str) -> dict:
    """Offline REPAIR for a stored index whose
    :func:`stored_index_audit` verdict is FALSE — the recovery tool
    for every divergence class the audit names, cheaper than the
    rebuild it replaces (one id-column scan of ``data`` instead of
    re-deriving the whole index from source):

    - ``_ids`` is REBUILT from the distinct ids actually present in
      ``data`` — in one pass this heals orphaned registrations (ids
      without rows: the failed-append residue), rows written around
      the sidecar (ids the append-only validation couldn't see — now
      registered, so a re-ingest fails loud instead of duplicating),
      and duplicate registrations.
    - tombstones referencing ids no longer in the rebuilt ``_ids``
      are DROPPED (their bytes are already gone — the
      crashed-mid-compaction residue); tombstones of live ids are
      KEPT (they are pending deletes, not corruption — the next
      :func:`compact_stored_index` purges them as usual).

    The rebuilt ``_ids`` is written COMPLETE to a scratch sibling and
    swapped in whole (the compactor's crash ordering), so a crash
    mid-repair leaves the old sidecar intact and the repair is
    re-runnable. Returns the before/after audit verdicts plus what
    was rewritten: ``{"was_consistent", "n_ids", "n_dropped_
    tombstones", "consistent"}``.

    NOT a substitute for the append crash repair while the failed
    append's content is still wanted: this makes the layout
    self-consistent with what ``data`` holds — a batch whose rows
    never landed is simply forgotten (re-ingest it afterwards; the
    rebuilt ``_ids`` no longer blocks it)."""
    from process_spark.operators.fsutil import swap_in

    meta = index_meta(spark, path)
    id_col, nb = meta["id_col"], meta["n_id_buckets"]
    data_dir = posixpath.join(path, "data")
    ids_dir = posixpath.join(path, "_ids")
    tomb_dir = posixpath.join(path, "_tombstones")

    before = stored_index_audit(spark, path).collect()[0]
    if before["consistent"]:
        return {
            "was_consistent": True,
            "n_ids": int(before["n_ids"]),
            "n_dropped_tombstones": 0,
            "consistent": True,
        }

    rebuilt = _ids_membership(
        spark.read.parquet(data_dir), id_col, nb
    ).localCheckpoint(eager=True)  # pinned: outlives the _ids swap
    tmp = ids_dir.rstrip("/") + "__repairing"
    fs, HPath = fs_path(spark, tmp)
    fs.delete(HPath(tmp), True)
    (
        rebuilt.repartition(1)
        .write.mode("overwrite")
        .partitionBy("id_bucket")
        .parquet(tmp)
    )
    swap_in(spark, ids_dir, tmp, label="stored-index ids")

    n_dropped = 0
    if fs_exists(spark, tomb_dir):
        tombs = spark.read.parquet(tomb_dir).localCheckpoint(eager=True)
        keep = tombs.join(rebuilt.select(id_col), id_col, "left_semi")
        n_keep = keep.count()
        n_dropped = tombs.count() - n_keep
        if n_dropped:
            if n_keep == 0:
                fs.delete(HPath(tomb_dir), True)
            else:
                tmp_t = tomb_dir.rstrip("/") + "__repairing"
                fs.delete(HPath(tmp_t), True)
                (
                    keep.select("id_bucket", id_col)
                    .repartition(1)
                    .write.mode("overwrite")
                    .partitionBy("id_bucket")
                    .parquet(tmp_t)
                )
                swap_in(spark, tomb_dir, tmp_t, label="stored-index tombs")
    spark.catalog.refreshByPath(ids_dir)
    after = stored_index_audit(spark, path).collect()[0]
    return {
        "was_consistent": False,
        "n_ids": int(after["n_ids"]),
        "n_dropped_tombstones": int(n_dropped),
        "consistent": bool(after["consistent"]),
    }
