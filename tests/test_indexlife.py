"""Generic stored-index DELETE/UPDATE lifecycle
(operators/indexlife.py): tombstone semantics, append-only identity
validation, purge-at-compaction, crash-window convergence — the
postings family's contracts (tests/test_retrieval.py) replayed on the
id-generic toolkit that serves the IVF cell index and the band-index
layouts. The registered oracle (vec_ivf_stored_updated) proves engine
parity end to end; these pin the edges the oracle can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from process_spark.operators.fsutil import fs_exists
from process_spark.operators.indexlife import (
    compact_stored_index,
    index_meta,
    live_index_rows,
    tombstone_index_ids,
    write_stored_index,
)


def _rows(spark, data):
    """(vec_id, cell_id, payload) — a miniature cell-partitioned index."""
    return spark.createDataFrame(
        data, "vec_id long, cell_id int, payload double"
    )


def _ids(spark, vals, col="vec_id"):
    return spark.createDataFrame([(v,) for v in vals], f"{col} long")


def _live_set(spark, path):
    return {
        (r["vec_id"], r["cell_id"])
        for r in live_index_rows(spark, path).collect()
    }


@pytest.mark.slow  # measured >8s (r14 durations); full profile via --runslow
def test_delete_update_lifecycle(spark, tmp_path):
    path = str(tmp_path / "idx")
    write_stored_index(
        _rows(spark, [(1, 0, 0.1), (2, 0, 0.2), (3, 1, 0.3)]),
        path, ["cell_id"], "vec_id", mode="overwrite",
    )
    write_stored_index(
        _rows(spark, [(4, 1, 0.4)]), path, ["cell_id"], "vec_id",
        mode="append",
    )
    assert index_meta(spark, path) == {
        "id_col": "vec_id", "part_cols": ["cell_id"], "n_id_buckets": 16,
    }
    assert _live_set(spark, path) == {(1, 0), (2, 0), (3, 1), (4, 1)}

    # unknown id → loud; delete 2 and 4; re-tombstone idempotent
    with pytest.raises(ValueError, match="not in the index"):
        tombstone_index_ids(spark, path, _ids(spark, [99]))
    assert tombstone_index_ids(
        spark, path, _ids(spark, [2, 4])
    )["n_tombstoned"] == 2
    assert tombstone_index_ids(
        spark, path, _ids(spark, [2])
    )["n_tombstoned"] == 0
    assert _live_set(spark, path) == {(1, 0), (3, 1)}

    # re-ingest before the purge → loud, with the update recipe
    with pytest.raises(ValueError, match="tombstone_index_ids"):
        write_stored_index(
            _rows(spark, [(2, 1, 9.9)]), path, ["cell_id"], "vec_id",
            mode="append",
        )

    out = compact_stored_index(spark, path)
    assert out["n_purged_ids"] == 2
    assert not fs_exists(spark, path + "/_tombstones")
    spark.catalog.refreshByPath(path + "/data")
    assert {
        r["vec_id"] for r in spark.read.parquet(path + "/data").collect()
    } == {1, 3}
    assert {
        r["vec_id"] for r in spark.read.parquet(path + "/_ids").collect()
    } == {1, 3}

    # the UPDATE lands: id 2's new version, possibly in a new cell
    write_stored_index(
        _rows(spark, [(2, 1, 9.9)]), path, ["cell_id"], "vec_id",
        mode="append",
    )
    assert _live_set(spark, path) == {(1, 0), (3, 1), (2, 1)}


def test_append_only_validation_content_independent(spark, tmp_path):
    """A changed-content re-ingest whose index rows share NO partition
    with the stored copy is still caught — detection keys on the
    id-bucketed _ids sidecar, not the content-dependent layout."""
    path = str(tmp_path / "idx")
    write_stored_index(
        _rows(spark, [(1, 0, 0.1)]), path, ["cell_id"], "vec_id",
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="append-only"):
        write_stored_index(
            _rows(spark, [(1, 7, 0.9)]),  # different cell entirely
            path, ["cell_id"], "vec_id", mode="append",
        )


def test_meta_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "idx")
    write_stored_index(
        _rows(spark, [(1, 0, 0.1)]), path, ["cell_id"], "vec_id",
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="was built with"):
        write_stored_index(
            _rows(spark, [(2, 0, 0.2)]), path, ["cell_id"], "vec_id",
            mode="append", n_id_buckets=8,
        )


@pytest.mark.slow  # measured >8s (r14 durations); full profile via --runslow
def test_overwrite_rebuild_clears_stale_tombstones(spark, tmp_path):
    path = str(tmp_path / "idx")
    write_stored_index(
        _rows(spark, [(1, 0, 0.1), (2, 1, 0.2)]), path, ["cell_id"],
        "vec_id", mode="overwrite",
    )
    tombstone_index_ids(spark, path, _ids(spark, [1]))
    write_stored_index(
        _rows(spark, [(1, 0, 0.5), (3, 1, 0.3)]), path, ["cell_id"],
        "vec_id", mode="overwrite",
    )
    assert not fs_exists(spark, path + "/_tombstones")
    assert _live_set(spark, path) == {(1, 0), (3, 1)}  # id 1 LIVE again


def test_compact_refuses_all_purged(spark, tmp_path):
    path = str(tmp_path / "idx")
    write_stored_index(
        _rows(spark, [(1, 0, 0.1), (2, 1, 0.2)]), path, ["cell_id"],
        "vec_id", mode="overwrite",
    )
    tombstone_index_ids(spark, path, _ids(spark, [1, 2]))
    with pytest.raises(ValueError, match="ENTIRE index"):
        compact_stored_index(spark, path)
    assert fs_exists(spark, path + "/_tombstones")
    assert _live_set(spark, path) == set()  # empty-index semantics hold


@pytest.mark.slow  # measured >8s (r14 durations); full profile via --runslow
def test_compact_rerun_converges_on_stale_tombstones(spark, tmp_path):
    """Crash window: purge swapped in, tombstone drop didn't happen.
    Re-running converges — purge no-ops, n_purged_ids reports 0 (docs
    actually removed, not the stale tombstone count), the tombstones
    drop, and re-ingest of the updated id is accepted."""
    path = str(tmp_path / "idx")
    write_stored_index(
        _rows(spark, [(1, 0, 0.1), (2, 1, 0.2)]), path, ["cell_id"],
        "vec_id", mode="overwrite",
    )
    tombstone_index_ids(spark, path, _ids(spark, [2]))
    compact_stored_index(spark, path)
    # simulate the crash: re-create the stale tombstone
    spark.createDataFrame([(2,)], "vec_id long").withColumn(
        "id_bucket", F.pmod(F.hash("vec_id"), F.lit(16)).cast("int")
    ).select("id_bucket", "vec_id").write.mode("overwrite").partitionBy(
        "id_bucket"
    ).parquet(path + "/_tombstones")
    out = compact_stored_index(spark, path)
    assert out["n_purged_ids"] == 0
    assert not fs_exists(spark, path + "/_tombstones")
    write_stored_index(
        _rows(spark, [(2, 0, 9.9)]), path, ["cell_id"], "vec_id",
        mode="append",
    )
    assert _live_set(spark, path) == {(1, 0), (2, 0)}


@pytest.mark.slow  # measured >8s (r14 durations); full profile via --runslow
def test_band_index_layout_generality(spark, tmp_path):
    """The same toolkit serves the band-index families: multi-column
    partition keys ((band_idx, band_bucket)) and a doc_id identity —
    delete/update works without any family-specific code."""
    path = str(tmp_path / "bidx")
    rows = spark.createDataFrame(
        [
            (10, 0, 3, 111), (10, 1, 5, 222),
            (20, 0, 3, 111), (20, 1, 9, 333),
        ],
        "doc_id long, band_idx int, band_bucket int, sig long",
    )
    write_stored_index(
        rows, path, ["band_idx", "band_bucket"], "doc_id",
        mode="overwrite",
    )
    tombstone_index_ids(spark, path, _ids(spark, [10], col="doc_id"))
    live = live_index_rows(spark, path)
    assert {r["doc_id"] for r in live.collect()} == {20}
    out = compact_stored_index(spark, path)
    assert out["n_purged_ids"] == 1
    # the updated doc re-ingests with entirely different band buckets
    write_stored_index(
        spark.createDataFrame(
            [(10, 0, 7, 999)],
            "doc_id long, band_idx int, band_bucket int, sig long",
        ),
        path, ["band_idx", "band_bucket"], "doc_id", mode="append",
    )
    assert {
        (r["doc_id"], r["band_bucket"])
        for r in live_index_rows(spark, path).collect()
    } == {(20, 3), (20, 9), (10, 7)}
    # the audit is layout-generic too: multi-column partition keys,
    # doc_id identity — consistent after the full lifecycle
    from process_spark.operators.indexlife import stored_index_audit

    r = stored_index_audit(spark, path).collect()[0]
    assert r["consistent"] and r["n_ids"] == 2 and r["n_data_ids"] == 2


@pytest.mark.slow  # measured >8s (r14 durations); full profile via --runslow
def test_append_crash_between_ids_and_data_fails_loud(
    spark, tmp_path, monkeypatch
):
    """The append crash-window contract: _ids lands BEFORE data, so a
    crash between the two writes makes the re-run RAISE the
    already-ingested error (loud, repairable) instead of silently
    appending the same data rows twice. Injected by failing the
    data-dir write only — if the writer ever flipped the order back,
    the injected crash would leave the batch IN data/ and absent from
    _ids/, and the duplicate-append assertion below would catch it."""
    from pyspark.sql.readwriter import DataFrameWriter

    path = str(tmp_path / "idx")
    write_stored_index(
        _rows(spark, [(1, 0, 0.1), (2, 1, 0.2)]),
        path, ["cell_id"], "vec_id", mode="overwrite",
    )

    orig = DataFrameWriter.parquet
    state = {"crash": True}

    def crashing(self, p, *a, **kw):
        if state["crash"] and p.rstrip("/").endswith("/data"):
            raise RuntimeError("injected crash before the data write")
        return orig(self, p, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", crashing)
    with pytest.raises(RuntimeError, match="injected crash"):
        write_stored_index(
            _rows(spark, [(3, 0, 0.3)]), path, ["cell_id"], "vec_id",
            mode="append",
        )
    state["crash"] = False
    spark.catalog.refreshByPath(path + "/_ids")
    spark.catalog.refreshByPath(path + "/data")

    # the half-ingested state: id registered, rows absent
    assert {
        r["vec_id"] for r in spark.read.parquet(path + "/_ids").collect()
    } == {1, 2, 3}
    assert {
        r["vec_id"] for r in spark.read.parquet(path + "/data").collect()
    } == {1, 2}

    # the re-run fails LOUD — this is the assertion that dies if the
    # write order regresses to data-before-_ids (silent duplicates)
    with pytest.raises(ValueError, match="append-only"):
        write_stored_index(
            _rows(spark, [(3, 0, 0.3)]), path, ["cell_id"], "vec_id",
            mode="append",
        )

    # the documented repair converges: tombstone the orphaned id,
    # compact (purges it from _ids; data has nothing to purge),
    # re-ingest — the index is exact again
    tombstone_index_ids(spark, path, _ids(spark, [3]))
    compact_stored_index(spark, path)
    write_stored_index(
        _rows(spark, [(3, 0, 0.3)]), path, ["cell_id"], "vec_id",
        mode="append",
    )
    assert _live_set(spark, path) == {(1, 0), (2, 1), (3, 0)}


@pytest.mark.slow  # measured >8s (r14 durations); full profile via --runslow
def test_stored_index_audit_divergence_classes(spark, tmp_path):
    """stored_index_audit: TRUE on a clean lifecycle (tombstoned docs
    still registered), then each divergence class seeded on purpose
    flips consistent FALSE through its own named column — orphaned
    registration (append crash), rows written around the sidecar,
    duplicate registration, orphaned tombstone (compaction crash)."""
    from process_spark.operators.indexlife import (
        _ids_membership,
        stored_index_audit,
    )

    def audit(path):
        return stored_index_audit(spark, path).collect()[0]

    path = str(tmp_path / "idx")
    write_stored_index(
        _rows(spark, [(1, 0, 0.1), (2, 0, 0.2), (3, 1, 0.3)]),
        path, ["cell_id"], "vec_id", mode="overwrite",
    )
    tombstone_index_ids(spark, path, _ids(spark, [2]))
    r = audit(path)
    assert r["consistent"] and r["n_ids"] == 3 and r["n_data_ids"] == 3
    assert r["n_tombstoned"] == 1 and r["n_tombstones_without_ids"] == 0

    # (a) orphaned registration: id 9 in _ids, no data rows (the
    # append crash window write_stored_index now fails loud on)
    (
        _ids_membership(_rows(spark, [(9, 0, 9.9)]), "vec_id", 16)
        .repartition(1)
        .write.mode("append")
        .partitionBy("id_bucket")
        .parquet(path + "/_ids")
    )
    spark.catalog.refreshByPath(path + "/_ids")
    r = audit(path)
    assert not r["consistent"] and r["n_ids_without_data"] == 1
    assert r["n_data_ids_without_ids"] == 0

    # (b) rows around the sidecar: id 8 straight into data/
    (
        _rows(spark, [(8, 1, 8.8)])
        .repartition(1)
        .write.mode("append")
        .partitionBy("cell_id")
        .parquet(path + "/data")
    )
    spark.catalog.refreshByPath(path + "/data")
    r = audit(path)
    assert not r["consistent"] and r["n_data_ids_without_ids"] == 1

    # (c) duplicate registration: id 1 registered twice
    (
        _ids_membership(_rows(spark, [(1, 0, 0.1)]), "vec_id", 16)
        .repartition(1)
        .write.mode("append")
        .partitionBy("id_bucket")
        .parquet(path + "/_ids")
    )
    spark.catalog.refreshByPath(path + "/_ids")
    r = audit(path)
    assert r["n_dup_id_rows"] == 1 and r["n_ids"] == 4  # 1,2,3,9

    # (d) orphaned tombstone on a FRESH index: tombstone an id, then
    # simulate the compaction crash (ids purged, tombstones not yet
    # dropped) by rewriting _ids without it
    import shutil

    path2 = str(tmp_path / "idx2")
    write_stored_index(
        _rows(spark, [(1, 0, 0.1), (2, 1, 0.2)]),
        path2, ["cell_id"], "vec_id", mode="overwrite",
    )
    tombstone_index_ids(spark, path2, _ids(spark, [2]))
    survivors = _rows(spark, [(1, 0, 0.1)])
    tmp_ids = path2 + "/_ids_new"
    (
        _ids_membership(survivors, "vec_id", 16)
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("id_bucket")
        .parquet(tmp_ids)
    )
    shutil.rmtree(path2 + "/_ids")
    shutil.move(tmp_ids, path2 + "/_ids")
    spark.catalog.refreshByPath(path2 + "/_ids")
    r = audit(path2)
    assert not r["consistent"] and r["n_tombstones_without_ids"] == 1
    # the documented repair: re-run the compactor -> converges clean
    compact_stored_index(spark, path2)
    spark.catalog.refreshByPath(path2 + "/data")
    spark.catalog.refreshByPath(path2 + "/_ids")
    r = audit(path2)
    assert r["consistent"] and r["n_ids"] == 1 and r["n_tombstoned"] == 0


@pytest.mark.slow  # measured >8s (r14 durations); full profile via --runslow
def test_repair_stored_index_converges_all_divergences(spark, tmp_path):
    """repair_stored_index heals every divergence class the audit
    names in ONE pass — _ids rebuilt from data, orphaned tombstones
    dropped, live tombstones kept as pending deletes — and the healed
    index behaves: the forgotten batch re-ingests (no stale block),
    the around-the-sidecar rows now fail loud on re-ingest, and the
    kept tombstone still purges at the next compaction."""
    from process_spark.operators.indexlife import (
        _ids_membership,
        repair_stored_index,
        stored_index_audit,
    )

    path = str(tmp_path / "idx")
    write_stored_index(
        _rows(spark, [(1, 0, 0.1), (2, 0, 0.2), (3, 1, 0.3)]),
        path, ["cell_id"], "vec_id", mode="overwrite",
    )
    tombstone_index_ids(spark, path, _ids(spark, [2]))  # pending delete

    # no-op on a consistent index
    out = repair_stored_index(spark, path)
    assert out == {
        "was_consistent": True, "n_ids": 3,
        "n_dropped_tombstones": 0, "consistent": True,
    }

    # seed: (a) orphaned registration 9, (b) raw data row 8,
    # (c) duplicate registration of 1, (d) orphaned tombstone 7
    (
        _ids_membership(
            _rows(spark, [(9, 0, 9.9), (1, 0, 0.1)]), "vec_id", 16
        )
        .repartition(1).write.mode("append")
        .partitionBy("id_bucket").parquet(path + "/_ids")
    )
    (
        _rows(spark, [(8, 1, 8.8)])
        .repartition(1).write.mode("append")
        .partitionBy("cell_id").parquet(path + "/data")
    )
    (
        _ids_membership(_rows(spark, [(7, 0, 7.7)]), "vec_id", 16)
        .repartition(1).write.mode("append")
        .partitionBy("id_bucket").parquet(path + "/_tombstones")
    )
    spark.catalog.refreshByPath(path + "/_ids")
    spark.catalog.refreshByPath(path + "/data")
    assert not stored_index_audit(spark, path).collect()[0]["consistent"]

    out = repair_stored_index(spark, path)
    assert out == {
        "was_consistent": False, "n_ids": 4,  # 1,2,3,8
        "n_dropped_tombstones": 1, "consistent": True,
    }
    spark.catalog.refreshByPath(path + "/_ids")
    r = stored_index_audit(spark, path).collect()[0]
    assert r["consistent"] and r["n_tombstoned"] == 1  # 2 still pending

    # the forgotten batch (9) re-ingests; the healed registration (8)
    # now blocks a silent duplicate
    write_stored_index(
        _rows(spark, [(9, 0, 9.9)]), path, ["cell_id"], "vec_id",
        mode="append",
    )
    with pytest.raises(ValueError, match="append-only"):
        write_stored_index(
            _rows(spark, [(8, 1, 8.8)]), path, ["cell_id"], "vec_id",
            mode="append",
        )
    # pending delete still pending, then purged as usual
    assert _live_set(spark, path) == {(1, 0), (3, 1), (8, 1), (9, 0)}
    out = compact_stored_index(spark, path)
    assert out["n_purged_ids"] == 1
    spark.catalog.refreshByPath(path + "/data")
    spark.catalog.refreshByPath(path + "/_ids")
    assert _live_set(spark, path) == {(1, 0), (3, 1), (8, 1), (9, 0)}
    assert stored_index_audit(spark, path).collect()[0]["consistent"]
