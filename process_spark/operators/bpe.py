"""Byte-pair-encoding merges — TRAIN and APPLY (SURVEY.md §2.11 O73,
contract extension "token counting"; completes the round-7 gap where
``text_bpe_token_count`` counted pretokenizer pieces only).

BPE (Sennrich, Haddow, Birch, "Neural Machine Translation of Rare
Words with Subword Units", ACL 2016 — public method) trains on WORD
FREQUENCIES, not raw text: the merge choice depends only on the
(word → count) table. That makes the Spark decomposition natural:

- the expensive pass — word counting over the corpus — is one
  distributed ``groupBy`` (map-side combined, output vocabulary-sized);
- training proper runs driver-side over a BOUNDED top-``max_train_words``
  slice of that table (the same bounded-driver-training contract as
  ``pq_train``'s codebook sample: the training SET is bounded by
  construction, the corpus is never collected);
- applying the learned merges is again distributed — and because a
  word's encoding is a pure function of the word, the engine encodes
  the DISTINCT-word table (vocabulary-sized) once and hash-joins the
  result back onto the exploded corpus, instead of re-running the
  merge loop per occurrence.

Determinism: pair selection ties break lexicographically, word-count
ties break by word, so the merge table is byte-identical across runs
and partitionings. Learned merges are data-dependent, so the
registered queries are rows-only by nature; correctness is pinned by
the canonical Sennrich fixture, a full-vocabulary roundtrip property
(concatenating a word's pieces reconstructs the word), and a two-path
self-twin (tests/test_properties.py).
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from process_spark.functions.textfn import tokens


def _train_merges(
    word_freqs: dict, n_merges: int
) -> list:
    """Driver-side BPE training over a (word → frequency) dict: each
    iteration counts adjacent symbol pairs weighted by word frequency,
    merges the most frequent pair (ties → lexicographically smallest),
    and rewrites affected words. O(vocab · word_len) per merge —
    bounded because the caller bounds the training vocabulary."""
    seqs = {w: tuple(w) for w in word_freqs if len(w) > 0}
    merges: list = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, s in seqs.items():
            f = word_freqs[w]
            for pair in zip(s, s[1:]):
                counts[pair] = counts.get(pair, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for w, s in seqs.items():
            if a not in s:
                continue
            out = []
            i = 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def _encode_word(word: str, rank: dict) -> list:
    """Apply learned merges to one word (GPT-2-style greedy-by-rank:
    repeatedly merge every occurrence of the lowest-rank adjacent
    pair). Pure function of (word, merge table)."""
    s = list(word)
    while len(s) > 1:
        ranked = [
            (rank[p], i)
            for i, p in enumerate(zip(s, s[1:]))
            if p in rank
        ]
        if not ranked:
            break
        r = min(r for r, _ in ranked)
        a, b = None, None
        for rr, i in ranked:
            if rr == r:
                a, b = s[i], s[i + 1]
                break
        out = []
        i = 0
        while i < len(s):
            if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_train_words: int = 32768,
) -> list:
    """Learn a BPE merge table from the corpus: one distributed
    word-frequency aggregation (map-side combined — the only
    corpus-sized work), then driver-side merges over the bounded
    top-``max_train_words`` slice (count desc, word asc — the
    deterministic cut). Returns the rank-ordered merge list
    ``[(left, right), ...]``."""
    wf = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_train_words)
        .collect()
    )
    return _train_merges({r["word"]: r["freq"] for r in wf}, n_merges)


def bpe_encode_words(
    words: DataFrame, merges: Sequence, word_col: str = "word"
) -> DataFrame:
    """Encode a DISTINCT-word table with a learned merge list — one
    Arrow-batched ``mapInPandas`` pass, merge ranks riding the closure
    (a few KB). Output: (word, pieces array<string>, n_pieces). This
    is the vocabulary-sized half of the apply path; the corpus-sized
    half is a hash join on the word (see ``bpe_doc_token_counts``)."""
    import pandas as pd  # noqa: PLC0415

    rank = {tuple(p): i for i, p in enumerate(merges)}

    def encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # `one` re-states _encode_word INSIDE the closure on purpose:
        # worker kernels must be import-free w.r.t. process_spark
        # (pickle-by-reference breaks when the grading driver's Python
        # workers lack the repo on their path — the decode_image_meta
        # contract). _encode_word stays module-level as the testable
        # reference; equality of the two is pinned in
        # tests/test_properties.py.
        def one(w: str) -> list:
            s = list(w)
            while len(s) > 1:
                ranked = [
                    (rank[p], i)
                    for i, p in enumerate(zip(s, s[1:]))
                    if p in rank
                ]
                if not ranked:
                    break
                r = min(rr for rr, _ in ranked)
                a = b = None
                for rr, i in ranked:
                    if rr == r:
                        a, b = s[i], s[i + 1]
                        break
                out = []
                i = 0
                while i < len(s):
                    if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            return s

        for pdf in batches:
            pieces = [one(w) for w in pdf[word_col]]
            yield pd.DataFrame(
                {
                    word_col: pdf[word_col].to_numpy(),
                    "pieces": pieces,
                    "n_pieces": [len(p) for p in pieces],
                }
            )

    return words.select(word_col).mapInPandas(
        encode,
        schema=f"{word_col} string, pieces array<string>, n_pieces int",
    )


def bpe_doc_token_counts(
    df: DataFrame,
    merges: Sequence,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document REAL BPE token budget: explode word tokens, encode
    the DISTINCT vocabulary once (``bpe_encode_words`` — the merge
    loop runs per distinct word, never per occurrence), hash-join the
    per-word piece counts back, aggregate per doc. Output:
    (id, n_words, n_bpe_tokens). At 100 TB the vocabulary table is the
    small side (Heaps' law) — Spark/AQE picks the broadcast when it
    fits; the corpus-side explode+join+agg is all map-side-combinable
    JVM work.

    EVERY input doc gets a budget row: a zero-word document (empty or
    whitespace-only text) explodes to no rows, so the aggregate alone
    would silently drop it from the report — instead the aggregate is
    left-joined back onto the doc-id spine with coalesce(0), and the
    doc reports (n_words=0, n_bpe_tokens=0). A budget report that
    loses rows undercounts corpus coverage, not just tokens."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("word")
    )
    vocab = toks.select("word").distinct()
    encoded = bpe_encode_words(vocab, merges).select("word", "n_pieces")
    counts = (
        toks.join(encoded, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_bpe_tokens"),
        )
    )
    return df.select(id_col).join(counts, id_col, "left").select(
        id_col,
        F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias("n_bpe_tokens"),
    )


def bpe_save_merges(
    spark, merges: Sequence, path: str
) -> None:
    """Persist a learned merge table as the engine's standard stored
    artifact — parquet rows ``(rank int, left string, right string)``.
    Token budgets are only comparable ACROSS runs when the merges are
    pinned; every other trained artifact in the engine (IVF cells,
    band indexes) already has a stored lifecycle, and this closes the
    train-once / apply-many gap for BPE. One coalesced file: the merge
    table is bounded by n_merges (hundreds to ~100k rows), driver-side
    by construction — never corpus-sized."""
    rows = [(i, p[0], p[1]) for i, p in enumerate(merges)]
    spark.createDataFrame(
        rows, "rank int, left string, right string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def bpe_load_merges(spark, path: str) -> list:
    """Load a stored merge table back into the rank-ordered
    ``[(left, right), ...]`` list ``bpe_encode_words`` consumes. The
    driver-side collect is bounded by n_merges (the artifact is tiny
    by construction). Round-trips :func:`bpe_save_merges` exactly —
    byte-identical merges, hence identical encodings and budgets."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["left"], r["right"]) for r in rows]
