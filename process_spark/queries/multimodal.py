"""Multimodal-column queries (SURVEY.md O70; contract: "multimodal
columns"). No binary grading table exists, so payloads are derived
deterministically from ``documents.text`` (UTF-8 bytes) — which also
lets the pure-expression metadata queries carry real DuckDB oracles;
the mapInPandas decode/featurize kernels are rows-only (stub decode,
SURVEY.md §1.2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from process_spark.operators.multimodal import (
    attach_blob,
    decode_image_meta,
    extract_features,
    sample_frames,
)
from process_spark.queries._util import t
from process_spark.queries.registry import register


def _blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    mime = F.when(F.col("lang") == "zh", F.lit("image/png")).otherwise(
        F.lit("image/jpeg")
    )
    uri = F.concat(F.lit("blob://"), F.col("source"), F.lit("/"), F.col("doc_id"))
    return attach_blob(d, F.encode(F.col("text"), "UTF-8"), mime, uri)


@register(
    "mm_blob_metadata_stats",
    oracle="""
    SELECT CASE WHEN lang = 'zh' THEN 'image/png' ELSE 'image/jpeg' END AS mime,
           COUNT(*) AS n_blobs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MAX(octet_length(encode(text))) AS max_bytes
    FROM documents
    GROUP BY 1
    """,
)
def mm_blob_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O70: binary payload + typed metadata struct — per-mime storage
    stats straight off the metadata (never touching payload content —
    the point of carrying typed metadata beside an opaque blob)."""
    b = _blobs(spark, sf_dir)
    return b.groupBy(F.col("media_meta.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum("media_meta.size").alias("total_bytes"),
        F.max("media_meta.size").alias("max_bytes"),
    )


@register(
    "mm_frame_sample",
    oracle="""
    WITH v AS (
      SELECT doc_id, n_chars % 120 AS duration_s FROM documents
    )
    SELECT doc_id,
           CAST(unnest(range(greatest(duration_s // 10, 1))) AS INT) AS frame_idx,
           unnest(range(greatest(duration_s // 10, 1))) * 10 AS frame_ts_s
    FROM v
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O70: video frame-sampling plan — one row per sampled frame
    (sequence+explode; the decode kernel would hang off each row)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") % 120).alias("duration_s")
    )
    return sample_frames(d, "duration_s", every_s=10)


def _o_hexbyte(hex_expr: str, i: int) -> str:
    """DuckDB: i-th byte (0-based) of a lowercase hex digest string."""
    hv1 = f"(strpos('0123456789abcdef', substr({hex_expr}, {2 * i + 1}, 1)) - 1)"
    hv2 = f"(strpos('0123456789abcdef', substr({hex_expr}, {2 * i + 2}, 1)) - 1)"
    return f"({hv1} * 16 + {hv2})"


@register(
    "mm_decode_image_meta",
    # The stub decode derives pseudo-dimensions from md5(payload)
    # digest bytes (operators/multimodal._stub_dims), and the payload
    # is the document's UTF-8 bytes — which DuckDB's md5() hashes
    # identically, so the "decode" has an exact SQL twin.
    oracle=f"""
    WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents)
    SELECT doc_id,
           CAST(64 + {_o_hexbyte('hx', 0)} * 4 AS INT) AS width,
           CAST(64 + {_o_hexbyte('hx', 1)} * 4 AS INT) AS height,
           CAST(1 + {_o_hexbyte('hx', 2)} % 4 AS INT) AS channels
    FROM h
    """,
)
def mm_decode_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O70/O100: Arrow-batched decode over mapInPandas (stubbed header
    read — deterministic digest-derived pseudo-dimensions, which is
    what lets the Python kernel carry an exact DuckDB oracle)."""
    return decode_image_meta(_blobs(spark, sf_dir))


@register(
    "mm_extract_features",
    # Stub features are sha256(payload) bytes / 255 rounded to float32;
    # DuckDB reproduces each element (CAST(b/255.0 AS REAL)) and the
    # norm mirrors the engine's left-to-right double fold exactly.
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             CASE WHEN lang = 'zh' THEN 'image/png' ELSE 'image/jpeg' END
               AS mime,
             sha256(text) AS hx
      FROM documents
    )
    SELECT doc_id, mime,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), [{', '.join(
               f"power(CAST(CAST({_o_hexbyte('hx', i)} / 255.0 AS REAL)"
               f" AS DOUBLE), 2)"
               for i in range(16)
           )}]), (a, x) -> a + x)) AS feature_norm
    FROM h
    """,
)
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O70: blob → dense feature vector via mapInPandas (stub model),
    joined back to the metadata for a per-mime feature norm — the
    multimodal-embedding pipeline shape. Elements are cast to double
    before squaring so both engines fold identical float64 values."""
    b = _blobs(spark, sf_dir)
    feats = extract_features(b)
    joined = feats.join(
        b.select("doc_id", F.col("media_meta.mime").alias("mime")), "doc_id"
    )
    l2 = F.sqrt(
        F.aggregate(
            F.transform("feature", lambda x: F.pow(x.cast("double"), 2)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    return joined.select("doc_id", "mime", l2.alias("feature_norm"))
