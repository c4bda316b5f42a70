"""Deduplication family (SURVEY.md O62-O64; contract: "dedup" for
LLM-data pipelines).

Tiers, cheapest first — at 100 TB you run them in this order:
1. exact           — hash groupBy on content hash (one shuffle)
2. keep_latest     — row_number over the business key
3. minhash_lsh     — shingle → minhash → band-bucket equi-join
4. simhash         — 64-bit signature, bucket by band
5. ngram_jaccard   — exact token-set Jaccard within blocks (oracle-able)
6. embedding near-dup → operators.similarity (cosine threshold)
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from process_spark.functions.textfn import simhash64, tokens


def exact_dedup(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """O62 — exact dedup. dropDuplicates = hash shuffle on the subset;
    map-side combine makes this safe at any scale."""
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def keep_latest(
    df: DataFrame, key: Sequence[str], order_col: str, desc: bool = True
) -> DataFrame:
    """O62 keep-latest variant: one row per key by recency."""
    ob = F.col(order_col).desc() if desc else F.col(order_col).asc()
    w = Window.partitionBy(*key).orderBy(ob)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def content_hash_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact near-trivial text dedup: normalize whitespace+case, keep
    one doc per xxhash64 of the normalized text."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return keep_latest(
        df.withColumn("__h", F.xxhash64(norm)), ["__h"], df.columns[0], desc=False
    ).drop("__h")


#: 31-bit prime from the universal-hash family ``(a*h + b) mod p`` —
#: the largest prime below 2^31 used by Spark MLlib's MinHashLSH
#: (public); small enough that a*h stays inside signed-64 arithmetic.
_MINHASH_PRIME = 2038074743


def _minhash_coefficients(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic (a_i, b_i) permutation constants, a_i ≠ 0 mod p.

    Derived from a fixed-seed PRNG so signatures are byte-identical
    across runs/executors (same reason the fixture generator avoids
    RNG: reproducible dedup decisions are part of the contract).
    """
    rng = random.Random(8191)
    a = [rng.randint(1, _MINHASH_PRIME - 1) for _ in range(num_hashes)]
    b = [rng.randint(0, _MINHASH_PRIME - 1) for _ in range(num_hashes)]
    return a, b


def _fast_shingles(text: Column, n: int = 3) -> Column:
    """Shingle construction tuned for the MinHash hot path: the same
    word n-gram STRINGS as functions.textfn.word_ngrams, built by
    zipping the token array against its shifted selves (two zip_with
    passes) instead of one slice+concat per position — measured 1.8x
    faster at sf0.1. No array_distinct: MIN is duplicate-invariant, so
    deduping shingles costs a pass and changes nothing."""
    a = tokens(text)
    size = F.size(a)
    body = F.greatest(size - (n - 1), F.lit(0))
    shifted = [F.slice(a, i + 1, body) for i in range(n)]
    z = shifted[0]
    for s in shifted[1:]:
        z = F.zip_with(z, s, lambda x, y: F.concat_ws(" ", x, y))
    return (
        F.when(size >= n, z)
        .when(size > 0, F.array(F.concat_ws(" ", a)))
        .otherwise(F.array().cast("array<string>"))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document, as pure expressions.

    Shingle (word n-grams) → base hash → ``num_hashes`` universal-hash
    permutations ``(a_i*h + b_i) mod p`` with p a 31-bit prime — the
    same public hash family Spark MLlib's MinHashLSH uses; min over the
    shingle set approximates Jaccard (MinHash, Broder '97). The 31-bit
    prime keeps ``a_i*h`` inside signed-64 arithmetic, and hashing the
    shingle STRING once (then permuting the integer) is ~num_hashes×
    cheaper than seeded re-hashes of the bytes per permutation
    (measured: 1.6 s → sub-second signature stage at sf0.1).

    Physical shape: explode shingles → one hash-aggregate computing all
    ``num_hashes`` mins at once. Array-HOF per-permutation transforms
    re-evaluate the tokenize+shingle pipeline per permutation (Catalyst
    collapses projections back into the consumer — measured 9 s at
    sf0.1); the explode+agg form is whole-stage-codegen'd, combines
    map-side, and shuffles only (id, 64×8 bytes) — the same plan shape
    scales to 100 TB of documents.
    """
    mins = _minhash_mins(df, id_col, text_col, num_hashes, shingle_n, base_hash)
    return mins.select(F.col(id_col), F.col("__mins").alias("minhash"))


def _minhash_mins(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    shingle_n: int,
    base_hash: str,
) -> DataFrame:
    """Signature mins as ONE ``__mins`` array<bigint> column.

    The 64 per-permutation aggregates are assembled as a single SQL
    string parsed server-side by one ``F.expr`` call: building them as
    Python Column objects cost ~5 py4j round trips per permutation
    (~320 per call site), and a py4j round trip measures ~2-3 ms in
    this environment — plan CONSTRUCTION alone was a measured multi-
    second cost per bench rep for the minhash family (guide §1:
    measure first; the cost was on the driver, not in any stage)."""
    # Repartition by id BEFORE the tokenize/shingle/hash map work: a
    # single-file local scan is one partition, which would serialize
    # the whole CPU-heavy stage on one core. The partition count is
    # explicit (defaultParallelism) because AQE would coalesce a
    # few-MB text shuffle back to one partition — right for IO-bound
    # stages, wrong for this CPU-bound one.
    n_part = df.sparkSession.sparkContext.defaultParallelism
    exploded = df.repartition(n_part, F.col(id_col)).select(
        F.col(id_col),
        F.explode(_fast_shingles(F.col(text_col), shingle_n)).alias("__sh"),
    )
    a, b = _minhash_coefficients(num_hashes)
    if base_hash == "md5":
        # Cross-engine base hash: first 8 hex chars of md5 as a 32-bit
        # int (DuckDB reproduces it byte-for-byte — the oracle path;
        # xxhash64 is the cheaper default but has no SQL twin).
        base = F.conv(F.substring(F.md5(F.col("__sh")), 1, 8), 16, 10).cast(
            "long"
        )
    else:
        base = F.xxhash64(F.col("__sh"))
    hashed = exploded.select(
        F.col(id_col),
        F.pmod(base, F.lit(_MINHASH_PRIME)).alias("__h"),
    )
    # Plain % (not pmod): every operand is non-negative (__h ∈ [0,p),
    # a>0, b≥0), so remainder == pmod without pmod's sign branch —
    # measured ~15% off the 64-permutation aggregate. The array-of-
    # aggregates form is the same hash aggregate (one min accumulator
    # per permutation, map-side combine) with the array assembled in
    # the agg's result projection.
    mins_sql = (
        "array("
        + ",".join(
            f"min((__h * {a[i]} + {b[i]}) % {_MINHASH_PRIME})"
            for i in range(num_hashes)
        )
        + ")"
    )
    return hashed.groupBy(id_col).agg(F.expr(mins_sql).alias("__mins"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    base_hash: str = "xxhash64",
    band_key: str = "hash",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """O63 — candidate near-dup pairs via banded MinHash LSH.

    Split the signature into ``bands`` bands of r = num_hashes/bands
    rows; docs colliding on any full band are candidates. The band
    bucket join is an equi-join on (band_idx, band_hash) — shuffle
    partitioned, no cross join anywhere, which is what makes this the
    100 TB path. Returns (id_a, id_b, n_shared_bands), id_a < id_b.

    ``max_bucket_size`` is the hot-bucket guard: a boilerplate-heavy
    corpus (shared headers/footers, templated pages) collapses many
    docs into ONE band bucket, and the bucket's pair output is
    O(|bucket|²) — a single reduce task that OOMs a worker at 100 TB.
    When set, buckets larger than the cap are EXCLUDED from pair
    generation and the result carries an ``n_skipped_buckets`` column
    (constant per run — no silent truncation; a pipeline routes the
    skipped buckets' members to the next tier, e.g. exact Jaccard over
    a per-bucket sample or a re-band with more bands). The bucket-size
    window partitions by the SAME key the self-join shuffles on, its
    output is checkpointed so the census is computed once for all
    three consumers — and the guard bounds every join task at
    ≤ max_bucket_size² intermediate rows by construction.
    """
    banded = _minhash_banded(
        df, id_col, text_col, num_hashes, bands, shingle_n, base_hash, band_key
    )
    extra_cols: list[Column] = []
    if max_bucket_size is not None:
        # One count-over-window partitioned by the join key sizes every
        # bucket; buckets over the cap are cut BEFORE the join, so no
        # task ever materializes a hot bucket's quadratic pair set.
        # The sized relation is checkpointed because THREE consumers
        # read it (both join sides + the skipped-count branch) and
        # Catalyst/AQE does not reuse the window's exchange across
        # them — without the cut the posexplode+window would run three
        # times (verified in the physical plan).
        wb = Window.partitionBy("band_idx", "band_hash")
        sized = banded.withColumn(
            "__bn", F.count(F.lit(1)).over(wb)
        ).localCheckpoint(eager=False)
        banded = sized.filter(F.col("__bn") <= max_bucket_size).drop("__bn")
        skipped = (
            sized.filter(F.col("__bn") > max_bucket_size)
            .select("band_idx", "band_hash")
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_skipped_buckets"))
        )
        extra_cols = [F.col("n_skipped_buckets")]
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    if max_bucket_size is None:
        return pairs
    # Checkpoint: pairs feeds TWO branches below (the output rows and
    # the all-skipped sentinel's emptiness probe) and Catalyst does not
    # reuse the join subplan across them — without the cut the banded
    # self-join would run twice.
    pairs = pairs.localCheckpoint(eager=False)
    # 1-row broadcast cross join: every pair row carries the skipped-
    # bucket count, so truncation is visible in the OUTPUT, not a log.
    out = pairs.join(F.broadcast(skipped)).select(
        "id_a", "id_b", "n_shared_bands", *extra_cols
    )
    # All-skipped observability: when EVERY bucket exceeds the cap the
    # pair set is empty and a cross join alone would erase the skipped
    # count — the contract ("truncation is visible in the OUTPUT")
    # would fail exactly in the most-truncated case. Emit one sentinel
    # row (NULL ids, the count) iff buckets were skipped AND no pair
    # survived: a left-anti against the (≤1-row, broadcast) head of
    # pairs keeps the whole probe data-independent and in-plan.
    id_type = dict(pairs.dtypes)["id_a"]
    sentinel = (
        skipped.filter(F.col("n_skipped_buckets") > 0)
        .join(F.broadcast(pairs.select("id_a").limit(1)), F.lit(True), "left_anti")
        .select(
            F.lit(None).cast(id_type).alias("id_a"),
            F.lit(None).cast(id_type).alias("id_b"),
            F.lit(None).cast("long").alias("n_shared_bands"),
            F.col("n_skipped_buckets"),
        )
    )
    return out.unionByName(sentinel)


def _minhash_banded(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    bands: int,
    shingle_n: int,
    base_hash: str,
    band_key: str,
) -> DataFrame:
    """The exploded band relation (id, band_idx, band_hash) shared by
    the pair join and the stored-index build. Materializes the BAND
    projection once — a self-join otherwise recomputes the whole
    tokenize→shingle→hash pipeline on BOTH sides (no ReusedExchange
    across the join; verified in the physical plan). Banding before
    the cut shrinks the checkpoint payload to ``bands`` longs per doc
    and computes band hashes straight off the aggregate's wide columns
    — no array build + element_at round-trip."""
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands
    mins = _minhash_mins(df, id_col, text_col, num_hashes, shingle_n, base_hash)
    bands_df = mins.select(
        id_col, F.expr(_band_array_sql(bands, r, band_key)).alias("__bands")
    ).localCheckpoint(eager=False)
    return bands_df.select(
        id_col,
        F.posexplode(F.col("__bands")).alias("band_idx", "band_hash"),
    )


def _band_array_sql(bands: int, r: int, band_key: str) -> str:
    """SQL for the per-doc band-key array over the ``__mins`` signature
    array (one ``F.expr`` parse instead of ~6 py4j round trips per
    band — see _minhash_mins). band_key="concat" keeps the raw joined
    string (has an exact SQL twin for the oracle variant); "hash"
    shrinks the shuffle key to 8 bytes — the default at scale."""
    per_band = [
        "concat_ws(','"
        + "".join(f", cast(__mins[{b * r + j}] as string)" for j in range(r))
        + ")"
        for b in range(bands)
    ]
    if band_key != "concat":
        per_band = [f"xxhash64({e})" for e in per_band]
    return "array(" + ",".join(per_band) + ")"


def minhash_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    base_hash: str = "xxhash64",
    band_key: str = "hash",
    n_buckets: int = 256,
) -> DataFrame:
    """The STORED dedup index: one row per (doc, band) with a bounded
    ``band_bucket`` partition key (``pmod(band_hash, n_buckets)``).
    Written ``partitionBy(band_idx, band_bucket)``, this is the layout
    that turns incremental dedup into a point lookup — a new batch of
    docs computes its own bands and reads ONLY the matching partitions
    (real partition pruning, asserted in tests/test_plan_shapes.py)
    instead of re-joining the whole historical corpus. Same contract
    as the IVF cell-partitioned layout."""
    banded = _minhash_banded(
        df, id_col, text_col, num_hashes, bands, shingle_n, base_hash, band_key
    )
    return banded.withColumn(
        "band_bucket", F.pmod(F.xxhash64(F.col("band_hash")), F.lit(n_buckets))
    )


def lsh_band_bucket_stats(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    base_hash: str = "xxhash64",
    band_key: str = "hash",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Companion introspection for the hot-bucket guard: per band,
    bucket-population stats — how many buckets, the largest one, and
    how many exceed ``max_bucket_size`` (0 when unset). This is the
    view an operator reads BEFORE picking the cap, and the non-silent
    record of what :func:`minhash_lsh_pairs` skipped. Same plan prefix
    as the pair join (shingle→signature→band), one aggregate on the
    bucket key, one tiny per-band rollup."""
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands
    mins = _minhash_mins(df, id_col, text_col, num_hashes, shingle_n, base_hash)
    banded = mins.select(
        id_col,
        F.posexplode(
            F.expr(_band_array_sql(bands, r, band_key))
        ).alias("band_idx", "band_hash"),
    )
    cap = F.lit(max_bucket_size if max_bucket_size is not None else None)
    buckets = banded.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return buckets.groupBy("band_idx").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("__n").alias("max_bucket_size"),
        F.sum(
            F.when(F.col("__n") > cap, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_over_cap"),
    )


def _simhash_banded(
    df: DataFrame,
    id_col: str,
    text_col: str,
    band_bits: int,
    base_hash: str,
) -> DataFrame:
    """Shared banding stage of the SimHash family: per-token hash →
    per-bit majority vote → signature → band split. Returns
    (``id_col``, __sim, band_idx, band_val) — consumed by the
    candidate self-join (:func:`simhash_dedup_candidates`) and the
    stored index builder (:func:`simhash_band_index`)."""
    sig_bits = 60 if base_hash == "md5" else 64
    if sig_bits % band_bits:
        # Mirror minhash_lsh_pairs' num_hashes/bands check: silently
        # truncating to floor(sig_bits/band_bits) bands would band only
        # part of the signature and weaken the pigeonhole candidate
        # guarantee without the caller noticing (e.g. base_hash='md5'
        # with the xxhash64 default band_bits=16 covers 48 of 60 bits).
        raise ValueError(
            f"band_bits must divide sig_bits evenly: {sig_bits} % "
            f"{band_bits} != 0 (use band_bits=15 for base_hash='md5')"
        )
    n_bands = sig_bits // band_bits
    mask = (1 << band_bits) - 1
    n_part = df.sparkSession.sparkContext.defaultParallelism
    # Explode-and-aggregate signature, NOT the array-HOF vote
    # (functions.textfn.simhash64): each of the ``sig_bits`` HOF
    # filters re-evaluates the per-token hash pipeline (Catalyst
    # collapses the projection into every consumer) — measured 13.5 s
    # → 2.5 s at sf0.01 for the md5 base. Here each token is hashed
    # ONCE; the vote is one codegen'd hash aggregate with a
    # conditional sum per bit — the same plan shape as _minhash_mins,
    # shuffling only (id, sig_bits counters).
    ids = df.repartition(n_part, F.col(id_col)).select(F.col(id_col)).localCheckpoint(
        eager=False
    )
    exploded = df.repartition(n_part, F.col(id_col)).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__w")
    )
    if base_hash == "md5":
        h = F.conv(F.substring(F.md5(F.col("__w")), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(F.col("__w"))
    # The per-bit vote sums and the signature fold are assembled as
    # TWO SQL strings parsed server-side by one F.expr each: built as
    # Python Column objects they cost ~14 py4j round trips per bit
    # (~900 per call site at ~2.5 ms each — multi-second driver-side
    # plan construction; see _minhash_mins for the measurement). The
    # parsed expressions are identical — same sum aggregates (map-side
    # combine), same long-typed CASE/bitwise-OR fold, same values.
    votes_sql = (
        "array("
        + ",".join(f"sum(shiftright(__h, {b}) & 1)" for b in range(sig_bits))
        + ")"
    )
    votes = (
        exploded.select(F.col(id_col), h.alias("__h"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.expr(votes_sql).alias("__sv"),
        )
    )
    sig = F.expr(
        " | ".join(
            f"(case when __sv[{b}] * 2 > __n then shiftleft(1L, {b}) else 0L end)"
            for b in range(sig_bits)
        )
    )
    # Token-less docs (empty/whitespace text) vote to signature 0 —
    # the explode drops them, so join them back with sig 0.
    signed = (
        ids.join(votes.select(id_col, sig.alias("__sim")), id_col, "left")
        .select(id_col, F.coalesce(F.col("__sim"), F.lit(0).cast("long")).alias("__sim"))
        .localCheckpoint(eager=False)  # compute once, not per join side
    )
    return signed.select(
        id_col,
        "__sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("__sim"), i * band_bits)
                    .bitwiseAND(F.lit(mask))
                    for i in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )


def simhash_dedup_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    band_bits: int = 16,
    max_bucket_size: int | None = None,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup candidates: 64-bit signature split into 4
    16-bit bands; Hamming-close docs share ≥1 exact band (pigeonhole).
    Equi-join on band value — same scale shape as MinHash LSH, and the
    same boilerplate failure mode, so the same ``max_bucket_size``
    hot-bucket guard (over-cap band buckets are cut before the
    self-join; see :func:`minhash_lsh_pairs`). ``base_hash="md5"``
    (with band_bits=15 → 4 bands over 60 bits) is the DuckDB-
    reproducible variant backing the oracle query."""
    banded = _simhash_banded(df, id_col, text_col, band_bits, base_hash)
    if max_bucket_size is not None:
        # checkpoint: both join sides read the sized relation and the
        # window's exchange is not reused across them (see
        # minhash_lsh_pairs).
        wb = Window.partitionBy("band_idx", "band_val")
        banded = (
            banded.withColumn("__bn", F.count(F.lit(1)).over(wb))
            .filter(F.col("__bn") <= max_bucket_size)
            .drop("__bn")
            .localCheckpoint(eager=False)
        )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col("a.__sim").alias("sim_a"),
        F.col("b.__sim").alias("sim_b"),
    ).distinct()
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return pairs.select("id_a", "id_b", ham.alias("hamming"))


def simhash_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    band_bits: int = 16,
    base_hash: str = "xxhash64",
    n_buckets: int = 16,
) -> DataFrame:
    """STORED-index form of the SimHash banding — the fourth index
    family gets the same persisted lifecycle as the MinHash band
    index, the IVF cells, and the SRP bands: one row per (doc, band),
    carrying the full signature so a probe can compute Hamming
    distances without re-reading documents. Write it
    ``partitionBy(band_idx, band_bucket)`` (``band_bucket =
    band_val % n_buckets`` — the same bounded-domain pruning key as
    minhash_band_index: a probe collects its ≤ n_buckets bucket
    IN-set and the stored scan prunes to those partition dirs).
    Returns (``id_col``, sim, band_idx, band_val, band_bucket)."""
    banded = _simhash_banded(df, id_col, text_col, band_bits, base_hash)
    return banded.select(
        id_col,
        F.col("__sim").alias("sim"),
        "band_idx",
        "band_val",
        F.pmod(F.col("band_val"), F.lit(n_buckets)).alias("band_bucket"),
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    block_col: str | None = None,
    min_jaccard: float = 0.0,
    max_block_size: int | None = None,
) -> DataFrame:
    """O63 exact variant — token-set Jaccard for every pair within a
    block (oracle-checkable in SQL). Blocking keeps the pair count
    bounded; at scale pass a real blocking key (source, length bucket,
    LSH band) — never run unblocked.

    ``max_block_size`` is the same guard contract as
    :func:`minhash_lsh_pairs`' hot-bucket cap: the per-block self-join
    is O(|block|²), so one boilerplate-heavy block (every doc from one
    templated source) is a single quadratic task at 100 TB. When set
    (requires ``block_col``), blocks over the cap are EXCLUDED from
    pair generation BEFORE the join — every join task is bounded at
    ≤ max_block_size² intermediate rows by construction. The output
    schema and row semantics are MODE-INVARIANT: always exactly
    (id_a, id_b, jaccard), one row per surviving pair, so guarded and
    unguarded results union cleanly and no consumer needs a
    NULL-sentinel filter. The skip census is OUT-OF-BAND — use
    :func:`jaccard_pairs_with_census` when the pipeline must surface
    the truncation (every registered guarded query does). A pipeline
    routes skipped blocks' members to a cheaper tier (banded LSH —
    minhash_lsh_pairs — whose cost is linear in the bucket census,
    not quadratic in the block)."""
    if max_block_size is not None and block_col is None:
        raise ValueError("max_block_size requires block_col (the guard caps blocks)")
    n_part = df.sparkSession.sparkContext.defaultParallelism
    toks = (
        df.repartition(n_part, F.col(id_col))  # parallelize tokenization
        .select(
            F.col(id_col),
            F.array_distinct(tokens(text_col)).alias("__toks"),
            *([F.col(block_col)] if block_col else []),
        )
        .localCheckpoint(eager=False)  # tokenize once, not per join side
    )
    if max_block_size is not None:
        # Census partitioned on the SAME key the self-join shuffles
        # on. The skipped-block COUNT is not computed here — use
        # jaccard_pairs_with_census for the observable variant.
        wb = Window.partitionBy(block_col)
        toks = (
            toks.withColumn("__bn", F.count(F.lit(1)).over(wb))
            .filter(F.col("__bn") <= max_block_size)
            .drop("__bn")
        )
    a, b = toks.alias("a"), toks.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = F.size(F.array_intersect(F.col("a.__toks"), F.col("b.__toks")))
    uni = F.size(F.array_union(F.col("a.__toks"), F.col("b.__toks")))
    jac = F.when(uni > 0, inter.cast("double") / uni.cast("double")).otherwise(0.0)
    pairs = (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
    return pairs


def jaccard_pairs_with_census(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    block_col: str | None = None,
    min_jaccard: float = 0.0,
    max_block_size: int | None = None,
) -> tuple:
    """Guarded :func:`jaccard_pairs` plus its skip census, OUT-OF-BAND:
    returns ``(pairs, census)`` where ``pairs`` has the mode-invariant
    (id_a, id_b, jaccard) schema and ``census`` is exactly one row
    ``(n_skipped_blocks bigint)`` — 0 when nothing was cut, present
    even when every block was cut and the pair set is empty. This
    replaces the old in-band design (an ``n_skipped_blocks`` column on
    every pair row plus a NULL-id sentinel when all blocks skipped),
    which made the pair relation's schema depend on the guard mode and
    forced every consumer to filter the sentinel. A pipeline that must
    surface truncation (every registered guarded query) broadcasts the
    1-row census onto its OWN output instead."""
    if max_block_size is None:
        raise ValueError(
            "jaccard_pairs_with_census requires max_block_size; use "
            "jaccard_pairs when nothing can be skipped"
        )
    if block_col is None:
        raise ValueError("max_block_size requires block_col (the guard caps blocks)")
    n_part = df.sparkSession.sparkContext.defaultParallelism
    toks = (
        df.repartition(n_part, F.col(id_col))
        .select(
            F.col(id_col),
            F.array_distinct(tokens(text_col)).alias("__toks"),
            F.col(block_col),
        )
        .localCheckpoint(eager=False)
    )
    # Census partitioned on the SAME key the self-join shuffles on;
    # checkpointed because three consumers read it (two join sides +
    # the skipped-count branch) and Catalyst does not reuse the window
    # exchange across them.
    wb = Window.partitionBy(block_col)
    sized = toks.withColumn(
        "__bn", F.count(F.lit(1)).over(wb)
    ).localCheckpoint(eager=False)
    kept = sized.filter(F.col("__bn") <= max_block_size).drop("__bn")
    census = (
        sized.filter(F.col("__bn") > max_block_size)
        .select(block_col)
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_skipped_blocks"))
    )
    a, b = kept.alias("a"), kept.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & (
        F.col(f"a.{block_col}") == F.col(f"b.{block_col}")
    )
    inter = F.size(F.array_intersect(F.col("a.__toks"), F.col("b.__toks")))
    uni = F.size(F.array_union(F.col("a.__toks"), F.col("b.__toks")))
    jac = F.when(uni > 0, inter.cast("double") / uni.cast("double")).otherwise(0.0)
    pairs = (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
    return pairs, census


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    The cluster-formation step of a near-dup pipeline: candidate pairs
    (MinHash/Jaccard edges) → one component id per document, so a
    keeper can be chosen per component. Each vertex starts labeled with
    its own id; every iteration each vertex takes the min of its label
    and its neighbors' labels, until a fixpoint (≤ graph diameter
    iterations — near-dup graphs are dense and shallow, typically 2-4).

    Scale shape: one shuffle per iteration (edge⋈label hash join +
    groupBy min), label state is (vertex, long) only, and lineage is
    cut per iteration with localCheckpoint so plans don't grow. The
    driver only sees one count per iteration (convergence check) —
    never the data. For graphs with huge diameter (not dedup graphs),
    switch to alternating small-star/large-star; for dedup workloads
    plain propagation converges faster in wall-clock.

    Returns (``id_col``, component) — component = min vertex id in the
    component; singleton vertices (if ``vertices`` given) map to
    themselves.

    ``checkpoint_dir``: directory for RELIABLE checkpoints
    (HDFS/object-store path on a real cluster). localCheckpoint blocks
    live in executor memory/disk and die with the executor — fine on
    local[n], but an 8-iteration propagation at 100 TB that loses one
    executor would restart from zero. With a dir set, each iteration's
    label state goes through ``checkpoint()`` instead and survives
    executor loss.
    """
    spark = edges.sparkSession

    def cut(df: DataFrame, eager: bool = False) -> DataFrame:
        if checkpoint_dir is not None:
            spark.sparkContext.setCheckpointDir(checkpoint_dir)
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)

    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    sym = e.union(e.select(F.col("__d").alias("__s"), F.col("__s").alias("__d")))
    # Pin the symmetrized edges PRE-PARTITIONED on the join key (__d):
    # the checkpoint preserves the hash partitioning, so every
    # iteration's edge⋈label join reuses it instead of re-shuffling the
    # edge relation once per round (guide §2.4 — the edge set is the
    # big side of a dedup graph; the label side still shuffles, but it
    # is (vertex, long) only). Explicit partition count: the pinned
    # partitioning must stay stable across iterations for the reuse to
    # hold.
    n_part = spark.sparkContext.defaultParallelism
    sym = cut(sym.repartition(n_part, F.col("__d")))

    if vertices is None:
        verts = sym.select(F.col("__s").alias("id")).distinct()
    else:
        verts = vertices.select(F.col(id_col).alias("id")).distinct()
    labels = verts.withColumn("label", F.col("id"))

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["__d"] == labels["id"])
            .groupBy("__s")
            .agg(F.min("label").alias("__nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["__s"], "left")
            .select(
                F.col("id"),
                F.least(
                    F.col("label"), F.coalesce(F.col("__nbr_min"), F.col("label"))
                ).alias("label"),
                (
                    F.coalesce(F.col("__nbr_min"), F.col("label")) < F.col("label")
                ).alias("__changed"),
            )
        )
        # Cut lineage each iteration, LAZILY: the convergence count is
        # the checkpoint's materializing action, so each iteration runs
        # ONE job (materialize-and-count) instead of two (eager pin,
        # then a count over the pinned blocks) — one driver barrier per
        # round saved (guide §1.5/§5: per-iteration jobs are
        # cluster-wide barriers; the count reads the same pinned rows
        # either way).
        new_labels = cut(new_labels, eager=False)
        n_changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if n_changed == 0:
            break
    return labels.select(F.col("id"), F.col("label").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components by ALTERNATING large-star / small-star
    (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected
    Components in MapReduce and Beyond", SoCC 2014 — public method):
    the O(log n)-round twin of :func:`connected_components` for graphs
    whose DIAMETER is large. Min-label propagation needs one round per
    hop of the longest shortest path — fine for dedup graphs (dense,
    shallow, converge in 2-4), hopeless for a 10k-link chain. The star
    operations instead contract the graph geometrically:

      large-star: every node's HIGHER neighbors re-attach to the
      minimum of its closed neighborhood;
      small-star: every node and its LOWER neighbors re-attach to
      that minimum.

    Each is one groupBy-min + one join over the current edge set; the
    edge count never grows, and the alternation provably converges to
    a forest of stars whose centers are the component minima. Result
    schema matches :func:`connected_components` exactly
    ((``id_col``, component), singletons map to themselves), so the
    two are drop-in interchangeable — same oracle, same consumers.
    Convergence is detected by edge-set fixpoint (two bounded counts
    per round); lineage is cut per round (localCheckpoint, or
    ``checkpoint_dir`` for executor-loss-proof state at cluster
    scale — same contract as the propagation twin)."""
    spark = edges.sparkSession

    def cut(df: DataFrame, eager: bool = False) -> DataFrame:
        if checkpoint_dir is not None:
            spark.sparkContext.setCheckpointDir(checkpoint_dir)
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)

    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = cut(e, eager=True)

    converged = e.limit(1).count() == 0  # no edges → trivially a forest
    for _ in range(max_iter):
        # large-star: m(u) = min(N(u) ∪ {u}); emit (v, m(u)) for v > u
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over hi→lo directed edges: m(u) = min of the
        # lower neighborhood; emit (v, m) for every lower neighbor v
        # and (u, m) for the center
        d = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        smins = d.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            d.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        small = cut(small, eager=True)
        # fixpoint: the edge SET is unchanged (two bounded counts —
        # the driver never sees edges, only the two scalars)
        if (
            small.exceptAll(e).limit(1).count() == 0
            and e.exceptAll(small).limit(1).count() == 0
        ):
            e = small
            converged = True
            break
        e = small

    if not converged:
        # On a non-fixpoint edge set a node can still carry several
        # edges with CONFLICTING labels — emitting them would produce
        # duplicate (id, component) rows silently. Fail loudly instead
        # of returning a wrong labeling: max_iter=30 covers any graph
        # a 2^30-node cluster could hold (rounds are O(log n)).
        raise RuntimeError(
            "connected_components_star did not reach the star-forest "
            f"fixpoint within max_iter={max_iter} rounds; raise max_iter"
        )
    labels = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    if vertices is None:
        verts = (
            edges.select(F.col(src).alias("id"))
            .union(edges.select(F.col(dst).alias("id")))
            .distinct()
        )
    else:
        verts = vertices.select(F.col(id_col).alias("id")).distinct()
    return verts.join(labels, "id", "left").select(
        F.col("id"),
        F.coalesce(F.col("component"), F.col("id")).alias("component"),
    )


def compact_partitioned_index(
    spark,
    path: str,
    part_cols: Sequence[str],
    n_write_tasks: int = 64,
    row_filter=None,
) -> dict:
    """Maintenance op for any STORED partitioned index: rewrite every
    partition directory to ONE file.

    Appends accrete one file per touched dir per batch (the
    one-file-per-write discipline), so after N ingest batches a probe
    reads N files per pruned partition — the classic streaming-ingest
    small-files decay. Compaction rewrites the whole index with the
    rows hash-repartitioned on exactly the partition keys (each dir
    written by one task → one file per dir) into a sibling directory,
    then atomically swaps it in (rename, rename, remove). Probe
    results are invariant by construction — the rows are untouched,
    only the file layout changes (the lifecycle oracles already prove
    storage-layout independence; invariance is also asserted directly
    in tests/test_plan_shapes.py).

    If the index carries a ``batch_id`` partition level (the
    idempotent streaming layout — see incremental_dedup_sink), the
    compacted history is SEALED as ``batch_id = -1``: future appends
    keep their replay-overwrite semantics and future probes'
    ``batch_id < current`` history filter still sees every sealed row.
    Run it offline (between streaming runs / behind a catalog swap) —
    the directory swap is not transactional against in-flight readers.

    Crash-ordering caveat: prefer running compaction only after a
    CLEANLY terminated stream (last batch committed to the
    checkpoint). If the stream died mid-batch and compaction sealed
    the orphaned batch's rows into ``batch_id = -1``, a naive restart
    would probe the batch against its own sealed bands and re-append
    duplicates; the engine's three streaming sinks
    (``incremental_dedup_sink``, ``incremental_vector_sink``,
    ``incremental_srp_sink``) all defend against exactly this (each
    detects and skips its own sealed ids), but third-party sinks over
    the same layout must either replicate that hygiene or observe the
    clean-termination ordering.

    Filesystem-agnostic: the census and the swap go through the
    Hadoop FileSystem API (``Path.getFileSystem`` on the active Hadoop
    conf), so local paths, HDFS, and any configured ``hadoop-*``
    connector all work — not just the local OS rename this op shipped
    with first. One object-store caveat: on S3-like stores "rename"
    is copy+delete (O(index bytes), not O(1)) — there, prefer
    compacting into a NEW prefix and flipping a catalog pointer; on
    HDFS and local filesystems the swap is a metadata op.

    Returns ``{"files_before", "files_after", "rows"}``."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path

    def _hpath(p: str):
        return HPath(p)

    fs = _hpath(path).getFileSystem(hconf)

    def _count_files(p: str) -> int:
        hp = _hpath(p)
        if not fs.exists(hp):
            return 0
        it = fs.listFiles(hp, True)
        n = 0
        while it.hasNext():
            if it.next().getPath().getName().endswith(".parquet"):
                n += 1
        return n

    files_before = _count_files(path)
    df = spark.read.parquet(path)
    if row_filter is not None:
        # Purge hook (DataFrame -> DataFrame): compaction is the ONE
        # moment the whole index is rewritten anyway, so logically
        # deleted rows (tombstones — see retrieval.tombstone_postings
        # _docs) ride out for free. Identity when absent.
        df = row_filter(df)
    part_cols = list(part_cols)
    has_batch = "batch_id" in df.columns and "batch_id" not in part_cols
    if has_batch:
        df = df.withColumn("batch_id", F.lit(-1))
    n_rows = df.count()
    tmp = path.rstrip("/") + "__compacting"
    old = path.rstrip("/") + "__precompact"
    fs.delete(_hpath(tmp), True)
    fs.delete(_hpath(old), True)
    df.repartition(n_write_tasks, *[F.col(c) for c in part_cols]).write.mode(
        "overwrite"
    ).partitionBy(*(part_cols + (["batch_id"] if has_batch else []))).parquet(
        tmp
    )
    if not fs.rename(_hpath(path), _hpath(old)):
        raise IOError(f"compaction swap failed: rename {path} -> {old}")
    if not fs.rename(_hpath(tmp), _hpath(path)):
        # restore the original index before failing — never leave the
        # path empty with the only copy under a scratch suffix
        fs.rename(_hpath(old), _hpath(path))
        raise IOError(f"compaction swap failed: rename {tmp} -> {path}")
    fs.delete(_hpath(old), True)
    spark.catalog.refreshByPath(path)
    return {
        "files_before": files_before,
        "files_after": _count_files(path),
        "rows": n_rows,
    }


def compact_band_index(spark, path: str, n_write_tasks: int = 64) -> dict:
    """:func:`compact_partitioned_index` specialized to the MinHash
    band index's (band_idx, band_bucket) layout — see that docstring
    for the contract. The IVF cell index compacts with the same op on
    ``["cell_id"]`` (queries/vectors.py:vec_ivf_stored_compact)."""
    return compact_partitioned_index(
        spark, path, ["band_idx", "band_bucket"], n_write_tasks
    )
