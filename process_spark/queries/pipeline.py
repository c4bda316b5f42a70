"""Training-data pipeline composites over ``documents`` — the
end-to-end shapes an LLM-data pipeline runs at 100 TB (contract
extensions per BASELINE.json: dedup / text analysis), composed from
the primitives in operators.dedup and functions.textfn.

- benchmark contamination check: flag corpus docs sharing word n-grams
  with a held-out benchmark set (the decontamination pass every
  training corpus needs). Plan shape: explode distinct shingles on
  both sides → equi-join on the shingle → per-doc aggregate. The join
  is shuffle-partitioned on the shingle string — no cross join — and
  the benchmark side is orders of magnitude smaller, so at scale it
  broadcast-joins after the explode.
- dedup keeper selection: near-dup pairs → connected components → pick
  one canonical doc per component (longest text, doc_id tiebreak) —
  the final "which row survives" step of a dedup pipeline. One window
  over the (small) component table, never over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from process_spark.functions.textfn import tokens, word_ngrams
from process_spark.operators.dedup import connected_components, jaccard_pairs
from process_spark.queries._util import t
from process_spark.queries.registry import register
from process_spark.queries.text import _O_TOKS

#: DuckDB twin of word_ngrams(tokens(text), 3) — keep in sync with
#: queries.text's shingle oracle idiom.
_O_SHINGLES = f"""(
  SELECT CASE WHEN len(toks) >= 3 THEN
           list_transform(range(1, len(toks) - 1),
                          i -> array_to_string(toks[i:i+2], ' '))
         ELSE [array_to_string(toks, ' ')] END
  FROM (SELECT {_O_TOKS} AS toks)
)"""


@register(
    "pipeline_contamination_check",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, source, unnest(list_distinct({_O_SHINGLES})) AS shingle
      FROM documents
    ),
    bench AS (SELECT DISTINCT shingle, doc_id AS bench_id
              FROM sh WHERE source = 'src0'),
    corpus AS (SELECT doc_id, shingle FROM sh WHERE source <> 'src0')
    SELECT c.doc_id,
           COUNT(DISTINCT c.shingle) AS n_shared_shingles,
           COUNT(DISTINCT b.bench_id) AS n_benchmark_docs
    FROM corpus c JOIN bench b ON b.shingle = c.shingle
    GROUP BY c.doc_id
    """,
)
def pipeline_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs (source != src0) that
    share any word 3-gram with the benchmark set (source = src0),
    with how many distinct shingles and benchmark docs they hit.
    Both sides explode to (doc, shingle) and meet in one equi-join on
    the shingle — the shape that scales: no pairwise comparison, and
    the benchmark side stays tiny relative to the corpus."""
    d = t(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(word_ngrams(tokens(F.col("text")), 3))).alias(
            "shingle"
        ),
    )
    bench = (
        sh.filter(F.col("source") == "src0")
        .select(F.col("shingle").alias("b_shingle"), F.col("doc_id").alias("bench_id"))
        .distinct()
    )
    corpus = sh.filter(F.col("source") != "src0").select("doc_id", "shingle")
    return (
        corpus.join(bench, corpus.shingle == bench.b_shingle)
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("bench_id").alias("n_benchmark_docs"),
        )
    )


@register(
    "pipeline_dedup_keeper",
    oracle=f"""
    WITH RECURSIVE tk AS (
      SELECT doc_id, lang, source, n_chars, list_distinct({_O_TOKS}) AS toks
      FROM documents WHERE doc_id % 5 = 0
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM tk a JOIN tk b
        ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      WHERE CASE WHEN len(list_distinct(a.toks || b.toks)) > 0 THEN
              CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                / len(list_distinct(a.toks || b.toks))
            ELSE 0.0 END >= 0.2
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    walk(node, label) AS (
      SELECT doc_id, doc_id FROM tk
      UNION
      SELECT e.d, w.label FROM walk w JOIN edges e ON e.s = w.node
    ),
    comp AS (
      SELECT node AS doc_id, MIN(label) AS component FROM walk GROUP BY node
    ),
    ranked AS (
      SELECT c.doc_id, c.component, tk.n_chars,
             ROW_NUMBER() OVER (PARTITION BY c.component
                                ORDER BY tk.n_chars DESC, c.doc_id) AS rn,
             FIRST_VALUE(c.doc_id) OVER (PARTITION BY c.component
                                ORDER BY tk.n_chars DESC, c.doc_id) AS keeper_id
      FROM comp c JOIN tk ON tk.doc_id = c.doc_id
    )
    SELECT doc_id, component, keeper_id, rn = 1 AS is_keeper
    FROM ranked
    """,
)
def pipeline_dedup_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup keeper selection: near-dup clusters (Jaccard >= 0.2 within
    (lang, source) blocks, same sampled population as
    dedup_connected_components) → one canonical doc per cluster by
    (longest text, lowest doc_id). The ranking window runs over the
    component table — corpus-sized but one row per doc with three
    columns, partitioned by component — and is the pattern that picks
    survivors at 100 TB without ever re-reading document text."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    blocked = d.withColumn("__blk", F.concat_ws("|", "lang", "source"))
    edges = jaccard_pairs(blocked, "doc_id", "text", block_col="__blk", min_jaccard=0.2)
    comp = connected_components(
        edges, src="id_a", dst="id_b", vertices=d, id_col="doc_id"
    ).withColumnRenamed("id", "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        comp.join(d.select("doc_id", "n_chars"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("keeper_id", F.first("doc_id").over(w))
        .select(
            "doc_id",
            "component",
            "keeper_id",
            (F.col("rn") == 1).alias("is_keeper"),
        )
    )
