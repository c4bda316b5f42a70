"""Edge-case pins for the hand-built operators (SURVEY.md §4.2): empty
inputs, single rows, all-null value columns, duplicate timestamps.
None of these shapes appear in the driver testdata, but all of them
appear in a real 100 TB run (empty partitions after a selective
filter, sensors that never report, repeated capture timestamps), so
the operators must return — not throw — and return the pinned thing.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

TS = "ts double, user_id long, v double"


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, v double"
    )


EMPTY = []
SINGLE = [(_ts("2024-01-01T00:00:00"), 1, 2.0)]
ALL_NULL_V = [
    (_ts("2024-01-01T00:00:00"), 1, None),
    (_ts("2024-01-01T00:01:00"), 1, None),
]
DUP_TS = [
    (_ts("2024-01-01T00:00:00"), 1, 1.0),
    (_ts("2024-01-01T00:00:00"), 1, 2.0),
    (_ts("2024-01-01T00:05:00"), 1, None),
]


def test_forward_fill_edges(spark):
    from process_spark.operators.series import forward_fill

    assert forward_fill(_events(spark, EMPTY), ["v"], "ts", ["user_id"]).count() == 0
    assert forward_fill(
        _events(spark, SINGLE), ["v"], "ts", ["user_id"]
    ).collect()[0]["v"] == 2.0
    # all-null column stays all-null (nothing to carry)
    out = forward_fill(_events(spark, ALL_NULL_V), ["v"], "ts", ["user_id"])
    assert [r["v"] for r in out.collect()] == [None, None]
    # duplicate ts: LOCF fills from the last row in (ts, order) — the
    # null third row gets a non-null carried value
    out = forward_fill(_events(spark, DUP_TS), ["v"], "ts", ["user_id"])
    assert [r["v"] for r in out.orderBy("ts", "v").collect()][-1] is not None


def test_linear_interpolate_edges(spark):
    from process_spark.operators.series import linear_interpolate

    assert (
        linear_interpolate(_events(spark, EMPTY), ["v"], "ts", ["user_id"]).count()
        == 0
    )
    # all-null column: no anchors on either side -> stays null
    out = linear_interpolate(_events(spark, ALL_NULL_V), ["v"], "ts", ["user_id"])
    assert [r["v"] for r in out.collect()] == [None, None]
    # boundary null (before the first observation) takes the next value
    rows = [
        (_ts("2024-01-01T00:00:00"), 1, None),
        (_ts("2024-01-01T00:01:00"), 1, 10.0),
        (_ts("2024-01-01T00:03:00"), 1, None),
        (_ts("2024-01-01T00:05:00"), 1, 20.0),
    ]
    out = linear_interpolate(_events(spark, rows), ["v"], "ts", ["user_id"])
    got = [r["v"] for r in out.orderBy("ts").collect()]
    assert got[0] == 10.0  # leading null -> next anchor
    assert got[2] == pytest.approx(15.0)  # halfway between 10 and 20


def test_resample_grid_edges(spark):
    from process_spark.operators.series import resample_grid

    assert (
        resample_grid(_events(spark, EMPTY), "ts", "1 minute", ["user_id"]).count()
        == 0
    )
    # single row -> single grid cell, value preserved
    out = resample_grid(_events(spark, SINGLE), "ts", "1 minute", ["user_id"])
    assert out.count() == 1 and out.collect()[0]["v"] == 2.0


def test_sessionize_edges(spark):
    from process_spark.operators.series import sessionize

    assert (
        sessionize(
            _events(spark, EMPTY), ts_col="ts", gap="5 minutes",
            partition_by=["user_id"],
        ).count()
        == 0
    )
    out = sessionize(
        _events(spark, SINGLE), ts_col="ts", gap="5 minutes",
        partition_by=["user_id"],
    )
    assert out.count() == 1
    # duplicate-ts rows land in the same session
    out = sessionize(
        _events(spark, DUP_TS), ts_col="ts", gap="10 minutes",
        partition_by=["user_id"],
    )
    assert out.select("session_id").distinct().count() == 1


def test_asof_join_edges(spark):
    from process_spark.operators.relational import asof_join

    left = _events(spark, SINGLE).select("ts", "user_id")
    right_empty = _events(spark, EMPTY).select(
        "ts", "user_id", F.col("v").alias("rv")
    )
    out = asof_join(
        left, right_empty, on_ts="ts", by=["user_id"], value_cols=["rv"]
    )
    rows = out.collect()
    # left rows survive with null as-of values when the right side is empty
    assert len(rows) == 1 and rows[0]["rv"] is None
    # exact-timestamp match counts as "at or before"
    right = _events(spark, SINGLE).select(
        "ts", "user_id", F.col("v").alias("rv")
    )
    out = asof_join(left, right, on_ts="ts", by=["user_id"], value_cols=["rv"])
    assert out.collect()[0]["rv"] == 2.0


def test_interval_join_edges(spark):
    from process_spark.operators.relational import interval_join

    points = _events(spark, SINGLE).select("ts", "user_id")
    iv_schema = "s timestamp, e timestamp, iv_id long"
    empty_iv = spark.createDataFrame([], iv_schema)
    assert (
        interval_join(points, empty_iv, "ts", "s", "e").count() == 0
    )
    # zero-length interval [t, t) matches nothing (half-open)
    t0 = _ts("2024-01-01T00:00:00")
    zero_iv = spark.createDataFrame([(t0, t0, 1)], iv_schema)
    assert interval_join(points, zero_iv, "ts", "s", "e").count() == 0
    # bucket-spanning interval still matches (explode covers every bucket)
    wide_iv = spark.createDataFrame(
        [(_ts("2023-12-25T00:00:00"), _ts("2024-01-07T00:00:00"), 2)], iv_schema
    )
    assert interval_join(points, wide_iv, "ts", "s", "e").count() == 1


def test_dedup_edges(spark):
    from process_spark.operators.dedup import keep_latest, minhash_lsh_pairs

    df = spark.createDataFrame([], "doc_id long, text string, ts long")
    assert keep_latest(df, ["doc_id"], "ts").count() == 0
    assert minhash_lsh_pairs(df, "doc_id", "text").count() == 0
    # single doc: no pairs, no crash
    one = spark.createDataFrame([(1, "alpha beta gamma delta", 0)],
                                "doc_id long, text string, ts long")
    assert minhash_lsh_pairs(one, "doc_id", "text").count() == 0


def test_jaccard_pairs_block_guard(spark):
    """max_block_size mirrors the LSH hot-bucket guard contract: blocks
    over the cap are cut BEFORE the all-pairs join. The pair relation's
    schema is MODE-INVARIANT — always (id_a, id_b, jaccard), no census
    column, no NULL-id sentinel — so guarded and unguarded outputs
    union cleanly; the skip count comes out-of-band from
    jaccard_pairs_with_census."""
    import pytest as _pytest

    from process_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_with_census,
    )

    rows = [(i, "common tokens shared by every doc", "hot") for i in range(5)]
    rows += [(10, "zebra quark", "cold"), (11, "zebra quark", "cold")]
    df = spark.createDataFrame(rows, "doc_id long, text string, blk string")

    guarded = jaccard_pairs(
        df, "doc_id", "text", block_col="blk", min_jaccard=0.5, max_block_size=3
    )
    unguarded = jaccard_pairs(
        df, "doc_id", "text", block_col="blk", min_jaccard=0.5
    )
    # schema identical across modes; union needs no special handling
    assert guarded.columns == unguarded.columns == ["id_a", "id_b", "jaccard"]
    out = guarded.collect()
    # hot block (5 docs > cap 3) cut: only the cold pair survives
    assert {(r["id_a"], r["id_b"]) for r in out} == {(10, 11)}
    assert all(r["id_a"] is not None for r in out)  # no sentinel rows
    assert guarded.unionByName(unguarded).count() == 1 + 11

    # census variant: pairs keep the same schema; the count is a
    # separate 1-row relation — present even when ALL blocks are cut
    pairs2, census2 = jaccard_pairs_with_census(
        df, "doc_id", "text", block_col="blk", min_jaccard=0.5,
        max_block_size=3,
    )
    assert pairs2.columns == ["id_a", "id_b", "jaccard"]
    assert census2.collect()[0]["n_skipped_blocks"] == 1

    hot = df.filter(F.col("blk") == "hot")
    pairs3, census3 = jaccard_pairs_with_census(
        hot, "doc_id", "text", block_col="blk", min_jaccard=0.5,
        max_block_size=3,
    )
    assert pairs3.count() == 0  # empty pair set, NOT a sentinel row
    assert census3.collect()[0]["n_skipped_blocks"] == 1

    _, census4 = jaccard_pairs_with_census(
        df, "doc_id", "text", block_col="blk", min_jaccard=0.5,
        max_block_size=99,
    )
    assert census4.collect()[0]["n_skipped_blocks"] == 0

    with _pytest.raises(ValueError):
        jaccard_pairs(df, "doc_id", "text", max_block_size=3)
    with _pytest.raises(ValueError):
        jaccard_pairs_with_census(df, "doc_id", "text", block_col="blk")


def test_semantic_hot_cell_guard(spark):
    """The semantic twin of the jaccard block guard: a boilerplate-heavy
    IVF cell (near-identical template embeddings, the real-corpus skew
    shape) is cut BEFORE the BLAS pair scan, so the grouped map never
    sees a quadratic block. Pair schema is mode-invariant; the census
    rides out-of-band; the expression twin honors the same cap."""
    import pytest as _pytest

    from process_spark.operators.similarity import (
        near_dup_embeddings,
        near_dup_embeddings_arrow,
        near_dup_embeddings_arrow_with_census,
    )

    # hot cell: 8 near-identical "template" vectors; cold cell: 2 dups
    rows = [(i, [1.0, 0.001 * i], "hot") for i in range(8)]
    rows += [(100, [0.0, 1.0], "cold"), (101, [0.0, 1.0], "cold")]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cell string"
    )

    guarded = near_dup_embeddings_arrow(
        df, threshold=0.99, block_col="cell", max_block_size=4
    )
    unguarded = near_dup_embeddings_arrow(df, threshold=0.99, block_col="cell")
    assert guarded.columns == unguarded.columns  # mode-invariant schema
    got = {(r["id_a"], r["id_b"]) for r in guarded.collect()}
    assert got == {(100, 101)}  # hot cell (8 > cap 4) cut pre-join
    assert unguarded.count() == 8 * 7 // 2 + 1  # and it WAS quadratic

    # expression twin honors the same cap with the same survivors
    expr = near_dup_embeddings(
        df, threshold=0.99, block_col="cell", max_block_size=4
    )
    assert {(r["id_a"], r["id_b"]) for r in expr.collect()} == {(100, 101)}

    pairs, census = near_dup_embeddings_arrow_with_census(
        df, threshold=0.99, block_col="cell", max_block_size=4
    )
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(100, 101)}
    assert census.collect()[0]["n_skipped_blocks"] == 1
    _, census_all = near_dup_embeddings_arrow_with_census(
        df, threshold=0.99, block_col="cell", max_block_size=99
    )
    assert census_all.collect()[0]["n_skipped_blocks"] == 0

    with _pytest.raises(ValueError):
        near_dup_embeddings(
            df, threshold=0.99, block_col=None, max_block_size=4
        )
    with _pytest.raises(ValueError):
        near_dup_embeddings_arrow_with_census(
            df, threshold=0.99, block_col="cell"
        )


def test_knn_edges(spark):
    from process_spark.operators.similarity import brute_force_knn

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    empty_q = spark.createDataFrame([], "q_id long, q_emb array<double>")
    assert brute_force_knn(empty_q, corpus, k=1).count() == 0
    # k larger than the corpus returns the whole corpus, ranked
    q = spark.createDataFrame(
        [(9, [1.0, 0.0])], "q_id long, q_emb array<double>"
    )
    out = brute_force_knn(q, corpus, k=10).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [1, 2]
    assert out[0]["score"] == pytest.approx(1.0)


def test_media_header_parser_edge_cases():
    """The stdlib header parser must read geometry from well-formed
    container headers (incl. the awkward-but-legal shapes: top-down
    BMPs, PPM comments, WAV with a stranger chunk before fmt) and
    return None — never raise — on corrupt, truncated, or non-media
    bytes."""
    import struct

    from process_spark.operators.multimodal import (
        _media_fixture_encoder,
        _media_header_parser,
    )

    enc, parse = _media_fixture_encoder(), _media_header_parser()

    # round trips
    assert parse(enc("bmp", w=640, h=480, ch=3)) == {
        "format": "bmp", "width": 640, "height": 480, "channels": 3,
        "sample_rate": None, "duration_ms": None,
    }
    assert parse(enc("wav", ch=2, rate=16000, n_samples=8000)) == {
        "format": "wav", "width": None, "height": None, "channels": 2,
        "sample_rate": 16000, "duration_ms": 500,
    }

    # top-down BMP: negative height is legal; reported as abs
    td = bytearray(enc("bmp", w=10, h=20, ch=3))
    struct.pack_into("<i", td, 22, -20)
    assert parse(bytes(td))["height"] == 20

    # PPM with interleaved comments
    assert parse(b"P6\n# a comment\n10 # w\n20\n255\n\x00") == {
        "format": "ppm", "width": 10, "height": 20, "channels": 3,
        "sample_rate": None, "duration_ms": None,
    }
    # P5 (grayscale) → 1 channel
    assert parse(b"P5\n4 4\n255\n")["channels"] == 1

    # WAV with a LIST chunk before fmt — chunk walk must skip it
    wav = enc("wav", ch=1, rate=8000, n_samples=800)
    with_list = wav[:12] + b"LIST" + struct.pack("<I", 4) + b"INFO" + wav[12:]
    m = parse(with_list)
    assert m["sample_rate"] == 8000 and m["duration_ms"] == 100

    # corrupt / hostile inputs: None, never an exception
    bad = [
        b"", b"B", b"BM", b"P6", b"GIF89a", b"RIFF\x00\x00\x00\x00",
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 4,           # truncated pre-IHDR
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 18,           # wrong chunk tag
        b"BM" + b"\x00" * 60,                          # zero dims/bits
        b"GIF89a" + struct.pack("<HH", 0, 5) + b"\x00",  # zero width
        b"P6\nabc def\n255\n",                         # non-numeric dims
        "plain text that is definitely not media".encode(),
        bytes(range(256)),
    ]
    for b in bad:
        assert parse(b) is None, b[:16]


def test_pixel_and_pcm_decode_kernels(spark):
    """Pixel/PCM decode kernels must recover exact stats from real
    bodies and degrade truncated/mistyped payloads to NULL rows."""
    import struct

    from process_spark.operators.multimodal import (
        _media_fixture_encoder,
        decode_ppm_pixel_stats,
        decode_wav_pcm_stats,
    )

    enc = _media_fixture_encoder()
    good_ppm = enc("ppm", w=4, h=3, body_seed=10)
    trunc_ppm = good_ppm[:-5]  # header ok, body short
    good_wav = enc("wav", ch=1, rate=8000, n_samples=5, body_seed=1)
    wav8 = bytearray(good_wav)
    struct.pack_into("<H", wav8, 34, 8)  # claim 8-bit → unsupported
    df = spark.createDataFrame(
        [
            (1, bytearray(good_ppm)),
            (2, bytearray(trunc_ppm)),
            (3, b"not a ppm at all"),
        ],
        "doc_id long, blob binary",
    )
    rows = {r["doc_id"]: r for r in decode_ppm_pixel_stats(df).collect()}
    exp_r = sum((3 * x + 5 * y + 10) % 256 for y in range(3) for x in range(4))
    assert rows[1]["width"] == 4 and rows[1]["height"] == 3
    assert rows[1]["sum_r"] == exp_r
    # resize 2x2: y in {0,1}, x in {0,2}, all channels
    exp_rs = sum(
        (3 * x + 5 * y + 7 * c + 10) % 256
        for y in (0, 1) for x in (0, 2) for c in (0, 1, 2)
    )
    assert rows[1]["resize2_sum"] == exp_rs
    assert rows[2]["sum_r"] is None and rows[3]["width"] is None

    dfw = spark.createDataFrame(
        [(1, bytearray(good_wav)), (2, bytearray(bytes(wav8))), (3, b"RIFFxxxx")],
        "doc_id long, blob binary",
    )
    wrows = {r["doc_id"]: r for r in decode_wav_pcm_stats(dfw).collect()}
    samples = [((7 * i + 1) % 2003) - 1001 for i in range(5)]
    assert wrows[1]["n_samples"] == 5
    assert wrows[1]["sum_abs"] == sum(abs(v) for v in samples)
    assert wrows[1]["sum_sq"] == sum(v * v for v in samples)
    assert wrows[1]["peak"] == max(abs(v) for v in samples)
    assert wrows[2]["n_samples"] is None  # 8-bit: unsupported → NULL
    assert wrows[3]["n_samples"] is None


def test_approx_distinct_within_error_bounds(spark):
    """agg_approx_distinct is rows-only (HLL sketches are
    engine-specific), so pin its QUALITY instead: every per-group
    estimate at rsd=0.01 must sit within 5*rsd of the exact distinct
    count — an approximate operator with unbounded error would
    otherwise stay green forever."""
    from process_spark.queries import REGISTRY
    from process_spark.queries._util import t

    sf = "/root/testdata/sf0.01"
    approx = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["agg_approx_distinct"].fn(spark, sf).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in t(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for et, est in approx.items():
        rel_err = abs(est - exact[et]) / max(1, exact[et])
        assert rel_err <= 0.05, (et, est, exact[et], rel_err)


def test_approx_percentile_rank_error_bound(spark):
    """agg_approx_percentile is rows-only (GK sketches are
    engine-specific); pin its QUALITY: each estimate's RANK among the
    group's actual values must sit within the sketch's guaranteed
    n/accuracy rank error (with slack for ties/boundaries)."""
    from process_spark.queries import REGISTRY
    from process_spark.queries._util import t

    sf = "/root/testdata/sf0.01"
    est = {
        r["event_type"]: (r["p50_approx"], r["p90_approx"])
        for r in REGISTRY["agg_approx_percentile"].fn(spark, sf).collect()
    }
    vals = {}
    for r in t(spark, sf, "events").select("event_type", "value").collect():
        if r["value"] is not None:
            vals.setdefault(r["event_type"], []).append(r["value"])
    assert est.keys() == vals.keys()
    for et, (p50, p90) in est.items():
        s = sorted(vals[et])
        n = len(s)
        tol = max(2, 2 * n // 10000)  # 2x the guaranteed rank error
        for target, v in ((0.5, p50), (0.9, p90)):
            # rank range occupied by the estimate's value (ties!)
            import bisect

            lo = bisect.bisect_left(s, v)
            hi = bisect.bisect_right(s, v)
            want = target * (n - 1)
            assert lo - tol <= want <= hi + tol, (et, target, v, lo, hi, n)


def test_bmp_dib_header_discrimination():
    """The BMP branch must read the DIB size at offset 14:
    BITMAPCOREHEADER (size 12, int16 fields) would misparse as int32
    garbage → must return None; BITMAPINFOHEADER with legal 4-bit
    palette depth must parse."""
    import struct

    from process_spark.operators.multimodal import (
        _media_fixture_encoder,
        _media_header_parser,
    )

    enc, parse = _media_fixture_encoder(), _media_header_parser()

    # BITMAPCOREHEADER: 12-byte DIB, uint16 width/height at 18/20
    core = (
        b"BM" + struct.pack("<IHHI", 26 + 12, 0, 0, 26)
        + struct.pack("<IHHHH", 12, 7, 9, 1, 24) + b"\x00" * 8
    )
    assert parse(core) is None

    # 4-bit (16-color palette) BMP: legal bit depth, channels >= 1
    b4 = bytearray(enc("bmp", w=5, h=6, ch=3))
    struct.pack_into("<H", b4, 28, 4)
    m = parse(bytes(b4))
    assert m is not None and m["width"] == 5 and m["channels"] == 1


def test_fetch_blobs_by_uri_schemes(spark, tmp_path):
    """fetch_blobs_by_uri: file:// URIs and bare paths read bytes;
    missing files, NULL uris and non-local schemes (no fetcher in this
    container) degrade to NULL blobs — never an exception."""
    from process_spark.operators.multimodal import fetch_blobs_by_uri

    p = tmp_path / "payload.bin"
    p.write_bytes(b"\x01\x02\x03")
    rows = [
        (1, "file://" + str(p)),
        (2, str(p)),
        (3, "file://" + str(tmp_path / "missing.bin")),
        (4, "s3://bucket/key"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, uri string")
    got = {r["doc_id"]: r["blob"] for r in fetch_blobs_by_uri(df).collect()}
    assert bytes(got[1]) == b"\x01\x02\x03"
    assert bytes(got[2]) == b"\x01\x02\x03"
    assert got[3] is None and got[4] is None and got[5] is None


def test_fetch_blobs_by_uri_hostile_rows(spark, tmp_path):
    """Bad manifest rows NEVER abort the task: a NUL-embedded URI
    (ValueError from open) and a non-string uri cell both degrade to a
    NULL blob through the default fetcher."""
    from process_spark.operators.multimodal import fetch_blobs_by_uri

    p = tmp_path / "ok.bin"
    p.write_bytes(b"ok")
    rows = [(1, str(p)), (2, "bad\x00nul.bin"), (3, "\x00"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, uri string")
    got = {r["doc_id"]: r["blob"] for r in fetch_blobs_by_uri(df).collect()}
    assert bytes(got[1]) == b"ok"
    assert got[2] is None and got[3] is None and got[4] is None


def test_fetch_blobs_by_uri_pluggable_fetcher(spark):
    """The deployment seam: a custom fetcher (e.g. an s3/http client)
    is called per URI worker-side; whatever it raises degrades to a
    NULL blob for that row only."""
    from process_spark.operators.multimodal import fetch_blobs_by_uri

    def fake_store(u):
        if u.startswith("mem://"):
            return b"payload:" + u[len("mem://"):].encode()
        if u.startswith("boom://"):
            raise RuntimeError("store exploded")
        return None

    rows = [(1, "mem://a"), (2, "boom://b"), (3, "other://c"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, uri string")
    got = {
        r["doc_id"]: r["blob"]
        for r in fetch_blobs_by_uri(df, fetcher=fake_store).collect()
    }
    assert bytes(got[1]) == b"payload:a"
    assert got[2] is None and got[3] is None and got[4] is None


def test_frequent_items_guarantee_under_eviction(spark):
    """Misra-Gries sketch+verify must return EXACTLY the items at or
    above total//capacity + 1 even when the distinct-value count far
    exceeds the sketch capacity (the testdata vocabulary never
    triggers eviction, so this fixture does: 500 distinct tokens vs
    capacity 16, with planted heavy hitters and near-threshold
    decoys)."""
    from collections import Counter

    from process_spark.operators.sketch import frequent_items

    rows = []
    # planted heavy hitters: far above the bar
    for i, n in enumerate((900, 700, 500)):
        rows += [(f"heavy{i}",)] * n
    # 500 distinct light tokens, 5-12 occurrences each
    for j in range(500):
        rows += [(f"tail{j}",)] * (5 + j % 8)
    # a decoy that lands below the threshold (total ≈ 6.9k → bar ≈ 430)
    rows += [("decoy",)] * 300
    df = spark.createDataFrame(rows, "tok string").repartition(8)

    out = {
        r["tok"]: (r["cnt"], r["threshold"])
        for r in frequent_items(df, "tok", capacity=16).collect()
    }
    counts = Counter(v for (v,) in rows)
    total = sum(counts.values())
    thr = total // 16 + 1
    expected = {k: c for k, c in counts.items() if c >= thr}
    assert set(out) == set(expected), (thr, sorted(out), sorted(expected))
    for k, (c, t_) in out.items():
        assert c == expected[k] and t_ == thr, (k, c, t_, expected[k], thr)


def test_decode_image_real_degrades_without_pil(spark):
    """mm_decode_image_real in a codec-less environment: every blob
    degrades to the deterministic stub (decoder='stub'), values equal
    the oracle-anchored stub tier, and NOTHING raises — the old
    NotImplementedError guard is gone."""
    from process_spark.queries.registry import REGISTRY

    real = REGISTRY["mm_decode_image_real"].fn(
        spark, "/root/testdata/sf0.001"
    )
    rows = real.collect()
    assert rows and all(r["decoder"] == "stub" for r in rows)
    stub = {
        (r["doc_id"], r["width"], r["height"], r["channels"])
        for r in REGISTRY["mm_decode_image_meta"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert {
        (r["doc_id"], r["width"], r["height"], r["channels"]) for r in rows
    } == stub


def test_decode_image_real_uses_pil_when_present():
    """Drive the worker kernel DIRECTLY with a fake PIL injected into
    sys.modules: decodable blobs must come back with the codec's real
    dimensions and decoder='pil'; an unparseable blob in the same
    batch degrades per-row to the stub — proving the real branch's
    plumbing without the codec installed."""
    import sys
    import types

    import pandas as pd

    from process_spark.operators.multimodal import _real_image_kernel

    class FakeImg:
        def __init__(self, data: bytes):
            if not data.startswith(b"\x89PNG"):
                raise OSError("cannot identify image file")
            self.size = (640, 480)

        def getbands(self):
            return ("R", "G", "B")

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake_image_mod = types.SimpleNamespace(open=lambda fp: FakeImg(fp.read()))
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    saved = {k: sys.modules.get(k) for k in ("PIL", "PIL.Image")}
    sys.modules["PIL"] = fake_pil
    sys.modules["PIL.Image"] = fake_image_mod  # type: ignore[assignment]
    try:
        # tiny in-repo PNG fixture: signature + IHDR prefix (the fake
        # codec keys on the signature; a real PIL parses the header)
        png = (
            b"\x89PNG\r\n\x1a\n\x00\x00\x00\rIHDR"
            b"\x00\x00\x00\x01\x00\x00\x00\x01\x08\x02\x00\x00\x00"
        )
        batch = pd.DataFrame(
            {"doc_id": [1, 2], "blob": [png, b"not an image at all"]}
        )
        kernel = _real_image_kernel("blob", "doc_id")
        out = pd.concat(list(kernel(iter([batch]))))
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    by_id = out.set_index("doc_id")
    assert by_id.loc[1, "decoder"] == "pil"
    assert (
        by_id.loc[1, "width"],
        by_id.loc[1, "height"],
        by_id.loc[1, "channels"],
    ) == (640, 480, 3)
    assert by_id.loc[2, "decoder"] == "stub"  # per-row degradation


def test_grouped_frequent_items_guarantee_under_eviction(spark):
    """Per-group MG guarantee: each group's heavy value must survive
    that group's OWN eviction pressure — 500 distinct noise tokens per
    group vs capacity 8, different heavy token per group, and a third
    group that is pure noise (no heavy hitter at all)."""
    from process_spark.operators.sketch import frequent_items_by_group

    rows = (
        [("en", "heavy_en")] * 300
        + [("en", f"na{j}") for j in range(500)]
        + [("de", "heavy_de")] * 200
        + [("de", f"nb{j}") for j in range(300)]
        + [("fr", f"nc{j}") for j in range(100) for _ in range(2)]
    )
    df = spark.createDataFrame(rows, "lang string, tok string").repartition(8)
    out = frequent_items_by_group(df, "lang", "tok", capacity=8)
    got = {(r["lang"], r["tok"]): (r["cnt"], r["threshold"]) for r in out.collect()}
    # en: total 800, bar 101 — only heavy_en (300) clears it
    # de: total 500, bar 63 — only heavy_de (200) clears it
    # fr: total 200, bar 26 — nothing clears it (all tokens freq 2)
    assert got == {
        ("en", "heavy_en"): (300, 101),
        ("de", "heavy_de"): (200, 63),
    }, got


def test_grouped_frequent_items_typed_group_and_value(spark):
    """The grouped summary derives BOTH column types from the schema —
    a bigint group key with bigint values round-trips as ints."""
    from process_spark.operators.sketch import frequent_items_by_group

    rows = [(1, 7)] * 40 + [(1, j) for j in range(100, 130)] + [(2, 9)] * 20
    df = spark.createDataFrame(rows, "g long, v long")
    out = frequent_items_by_group(df, "g", "v", capacity=8).collect()
    got = {(r["g"], r["v"]): r["cnt"] for r in out}
    assert got == {(1, 7): 40, (2, 9): 20}
    assert all(isinstance(r["g"], int) and isinstance(r["v"], int) for r in out)


def test_quality_cascade_dedup_stage_engages(spark, tmp_path):
    """The sf0.01 table has no exact-content duplicates (the registered
    oracle covers the n_cut_dedup=0 path), so pin the ENGAGED path on a
    constructed corpus: three copies of one quality-passing text must
    yield exactly one keeper + two cut_dedup, duplicates are cut AFTER
    the quality stages (never double-counted), and the scrub touches
    keepers only (one injected PII span per kept doc)."""
    import os

    from process_spark.queries.registry import REGISTRY

    words = [f"signal{i:02d} value{i:02d}" for i in range(14)]
    good = " ".join(words)  # 28 distinct tokens, mean len ~7, ~200 chars
    assert len(good) >= 100
    rows = [
        (1, good, "en", "src0", len(good)),
        (2, good, "en", "src0", len(good)),   # dup of 1
        (3, good, "en", "src0", len(good)),   # dup of 1
        (4, good + " extra tailword closing", "en", "src0", len(good) + 24),
        (5, "tiny", "en", "src0", 4),          # cut_quality (nc < 100)
        (6, "tiny", "en", "src0", 4),          # dup TEXT but already cut
    ]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )

    out = {
        (r["lang"], r["source"]): r
        for r in REGISTRY["pipeline_quality_cascade_dedup"].fn(spark, d).collect()
    }
    r = out[("en", "src0")]
    assert r["n_docs_in"] == 6
    assert r["n_cut_quality"] == 2   # both tiny docs cut by quality
    assert r["n_cut_dedup"] == 2     # docs 2, 3 — NOT the quality-cut dups
    assert r["n_kept"] == 2          # doc 1 (keeper) + doc 4 (unique)
    assert r["n_pii_spans"] == 2     # scrub touched keepers only
