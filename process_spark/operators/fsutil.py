"""Hadoop-FileSystem helpers shared by the engine's durable state
tables (MG summaries in operators/sketch.py, the postings `_stats`
sidecar in operators/retrieval.py): existence probes, the
scratch-then-swap compaction ordering, and the ``sealed_through``
watermark sidecar that makes sealed state safe against foreachBatch
replays.

Everything routes through ``Path.getFileSystem`` on the active Hadoop
conf, so local disk, HDFS, and any configured ``hadoop-*`` connector
work alike. One object-store caveat (inherited by every caller): on
S3-like stores "rename" is copy+delete — there, prefer compacting into
a fresh prefix and flipping a catalog pointer.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import SparkSession

#: Watermark sidecar written by compactors INSIDE the sealed directory
#: (so it swaps atomically with the sealed rows): the highest batch_id
#: whose contribution is folded into the sealed ``batch_id = -1`` copy.
WATERMARK_FILE = "_SEALED_THROUGH"


def fs_path(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Path factory) for ``path``."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    return HPath(path).getFileSystem(hconf), HPath


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, HPath = fs_path(spark, path)
    return bool(fs.exists(HPath(path)))


def read_watermark(spark: SparkSession, state_dir: str) -> int:
    """``sealed_through`` watermark of a sealed state dir: the highest
    batch_id folded into the sealed ``batch_id = -1`` copy, or -1 when
    the dir was never compacted. A missing file is normal; an
    unresolvable FILESYSTEM propagates loudly (a mistyped scheme must
    never silently read as "no watermark")."""
    fs, HPath = fs_path(spark, state_dir)
    p = HPath(posixpath.join(state_dir, WATERMARK_FILE))
    if not fs.exists(p):
        return -1
    inp = fs.open(p)
    try:
        return int(inp.readUTF())
    finally:
        inp.close()


def write_watermark(spark: SparkSession, state_dir: str, wm: int) -> None:
    fs, HPath = fs_path(spark, state_dir)
    out = fs.create(HPath(posixpath.join(state_dir, WATERMARK_FILE)), True)
    try:
        out.writeUTF(str(int(wm)))
    finally:
        out.close()


def live_batch_ids(spark: SparkSession, state_dir: str) -> list:
    """Non-sealed ``batch_id=N`` partition subdirs currently present —
    bounded by batch count (one listStatus); compactors advance the
    watermark to their max."""
    fs, HPath = fs_path(spark, state_dir)
    hp = HPath(state_dir)
    if not fs.exists(hp):
        return []
    ids = []
    for st in fs.listStatus(hp):
        name = st.getPath().getName()
        if name.startswith("batch_id="):
            b = int(name.split("=", 1)[1])
            if b >= 0:
                ids.append(b)
    return ids


def swap_in(
    spark: SparkSession, state_dir: str, tmp: str, label: str = "state"
) -> None:
    """Atomically-as-the-FS-allows replace ``state_dir`` with ``tmp``:
    rename aside, rename in, restore on failure, drop the old copy. At
    no point is the only copy of the state a half-written directory; a
    crash between the two renames leaves the full state under
    ``__precompact`` for loaders to detect loudly."""
    fs, HPath = fs_path(spark, state_dir)
    old = state_dir.rstrip("/") + "__precompact"
    fs.delete(HPath(old), True)
    if not fs.rename(HPath(state_dir), HPath(old)):
        raise IOError(f"{label} swap failed: rename {state_dir} -> {old}")
    if not fs.rename(HPath(tmp), HPath(state_dir)):
        # restore the original state before failing — never leave the
        # path empty with the only copy under a scratch suffix
        fs.rename(HPath(old), HPath(state_dir))
        raise IOError(f"{label} swap failed: rename {tmp} -> {state_dir}")
    fs.delete(HPath(old), True)
