"""Sink layer: every way data leaves the engine (SURVEY.md §2.1 S3-S5).

The reference's sinks are row-at-a-time JDBC INSERTs plus DROP/CREATE
DDL (full refresh, ETL_FINAL.py:38-44,220-223); here each becomes a
bulk, declarative write:

- full refresh      -> overwrite-mode parquet (atomic per directory)
- incremental load  -> ``merge_upsert`` (the Delta ``MERGE INTO ... WHEN
  [NOT] MATCHED`` shape, emulated on parquet since this container ships
  no delta-spark; the API is the Delta call signature so swapping the
  backend is a one-liner)
- big-table layout  -> ``write_partitioned`` (partition pruning) and
  ``write_bucketed`` (shuffle-free co-located joins)
- JDBC parity       -> thin ``df.write.jdbc`` passthrough

Scale notes: partition columns must be low-cardinality (a directory per
value); bucket counts should match downstream join parallelism; the
merge emulation rewrites the whole target (as the reference's full
refresh did) — Delta/Iceberg make it file-level, the call sites don't
change.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

# Scratch space for queries that materialize intermediates (graph edge
# memos, the et06 incremental-warehouse simulation). Cluster-valid by
# construction: either the explicitly configured shared location, or a
# dir beside the SQL warehouse dir — which must already be shared
# storage for saveAsTable to work at all. Never a node-local tempdir.
# Entries are (path, hadoop_fs_or_None): for scheme'd paths the Hadoop
# FileSystem handle is captured AT ALLOC TIME, because at atexit the
# SparkSession is usually already stopped (getActiveSession -> None)
# and a lazily-resolved handle would silently no-op, accumulating
# remote scratch across runs.
_SCRATCH_CREATED: list[tuple[str, object | None]] = []


def scratch_root(spark: SparkSession) -> str:
    """``spark.fp_lakehouse.scratch_dir`` if set (point it at the lake
    bucket / HDFS tmp on a real cluster), else ``_fp_scratch`` beside
    the session's SQL warehouse dir."""
    configured = spark.conf.get("spark.fp_lakehouse.scratch_dir", "")
    if configured:
        return configured
    wh = spark.conf.get("spark.sql.warehouse.dir")
    for prefix in ("file://", "file:"):
        if wh.startswith(prefix):
            wh = wh[len(prefix):]
            break
    return os.path.join(wh, "_fp_scratch")


def _has_scheme(path: str) -> bool:
    return "://" in path


def _hadoop_fs(spark: SparkSession, path: str):
    """Resolve the Hadoop FileSystem (and Path class) for a scheme'd
    path while a live session exists. Returned handle stays valid as
    long as the JVM gateway is up — which outlives SparkSession.stop(),
    so atexit cleanup can still use it."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def delete_scratch(path: str, fs: object | None = None) -> None:
    """Best-effort recursive delete that follows the path's filesystem:
    local paths via shutil; scheme'd paths (s3://, hdfs://) through the
    Hadoop FileSystem — the handle captured at alloc time if given,
    else the active session's. Local os/shutil calls on a remote URI
    would silently manipulate a junk local directory and leave the
    remote data accumulating."""
    if not _has_scheme(path):
        shutil.rmtree(path, ignore_errors=True)
        return
    try:
        if fs is not None:
            hfs, jvm = fs
            hfs.delete(jvm.org.apache.hadoop.fs.Path(path), True)
            return
        spark = SparkSession.getActiveSession()
        if spark is None:
            return  # no captured handle and session gone: best-effort only
        hfs, jvm = _hadoop_fs(spark, path)
        hfs.delete(jvm.org.apache.hadoop.fs.Path(path), True)
    except Exception:
        pass


def alloc_scratch(spark: SparkSession, prefix: str) -> str:
    """Allocate a fresh scratch dir under scratch_root, registered for
    best-effort removal at process exit (scratch must not accumulate
    across runs). Local roots are created eagerly; scheme'd roots are
    left to the writer (Hadoop output committers create directories on
    write), but their FileSystem handle is captured NOW so exit-time
    deletion works even after SparkSession.stop()."""
    path = scratch_root(spark).rstrip("/") + f"/{prefix}_{uuid.uuid4().hex[:8]}"
    fs = None
    if not _has_scheme(path):
        os.makedirs(path, exist_ok=True)
    else:
        try:
            fs = _hadoop_fs(spark, path)
        except Exception:
            fs = None  # unreachable FS config: fall back to lazy resolve
    _SCRATCH_CREATED.append((path, fs))
    return path


def _cleanup_scratch() -> None:
    while _SCRATCH_CREATED:
        path, fs = _SCRATCH_CREATED.pop()
        delete_scratch(path, fs=fs)


atexit.register(_cleanup_scratch)


def write_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Plain parquet table write (the reference's full-refresh table
    load, bulk instead of row-at-a-time)."""
    df.write.mode(mode).parquet(path)


def write_partitioned(df: DataFrame, path: str, *partition_cols: str, mode: str = "overwrite") -> None:
    """Hive-style partitioned layout: queries filtering on the partition
    columns scan only matching directories (partition pruning — the
    PartitionFilters annotation in the scan, asserted in tests)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    *bucket_cols: str,
    n_buckets: int = 16,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_cols) at
    WRITE time, so equi-joins and aggregations on those columns read
    pre-shuffled data — no Exchange in the join plan (asserted in
    tests). The 100 TB pattern for fact-fact joins that repeat every
    run: pay the shuffle once at load, never at query."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    insert_only: bool = False,
    assume_unique: bool = False,
    assume_new: bool = False,
) -> None:
    """MERGE INTO emulation on parquet: WHEN MATCHED THEN UPDATE (update
    row wins), WHEN NOT MATCHED THEN INSERT — the batch equivalent of
    the reference's per-row get-or-create (U1, ETL_FINAL.py:128-134).

    Updates must be unique on ``keys`` (enforced — duplicate update rows
    would make the result order-dependent, the classic MERGE trap).
    Implemented as target-anti-join-updates ∪ updates, written to a
    scratch directory then swapped in, so a failed write never corrupts
    the live table.

    ``insert_only=True`` is the WHEN-NOT-MATCHED-INSERT-only MERGE:
    rows whose key already exists are DROPPED (existing rows win —
    exactly the reference's get-or-create, which SELECTs the id and
    never updates), and only the surviving new rows APPEND as new
    files. This is the 100 TB path for incremental loads: a daily
    batch adds batch-sized files instead of rewriting the whole table
    — the file-level behavior Delta's MERGE has and a full-rewrite
    emulation must opt into. Atomicity scope: the tmp-swap crash
    safety below applies to the REWRITE path; the append path relies
    on Spark's file-commit protocol (staged in _temporary, moved on
    job commit — standard append semantics), and on Delta/Iceberg the
    same call is a fully transactional MERGE. ``assume_new=True``
    additionally skips the existing-key anti-join when the CALLER
    already filtered updates to new keys (the dim loader does its own
    get-or-create anti-join) — only valid with ``insert_only``
    (enforced), and misuse on unfiltered input would append duplicate
    keys, so set ``FP_LAKEHOUSE_MERGE_DEBUG=1`` in CI to turn the
    skipped anti-join into a loud assertion.
    """
    if assume_new and not insert_only:
        raise ValueError(
            "assume_new=True only makes sense with insert_only=True: the "
            "rewrite path's anti-join is load-bearing, not an optimization"
        )
    # The uniqueness guard is its own Spark job; callers whose updates
    # are unique BY CONSTRUCTION (the loader dedups on the natural /
    # composite key before calling) skip it with assume_unique=True.
    if not assume_unique:
        dup = updates.groupBy(*keys).count().filter("count > 1").limit(1).count()
        if dup:
            raise ValueError(f"updates are not unique on merge keys {keys}")

    if not os.path.exists(target_path):
        updates.write.parquet(target_path)
        return

    target = spark.read.parquet(target_path)
    if insert_only:
        if assume_new and os.environ.get("FP_LAKEHOUSE_MERGE_DEBUG"):
            # Opt-in CI assertion: assume_new promises the caller already
            # anti-joined away existing keys; verify it loudly instead of
            # silently appending duplicates that only surface when a
            # downstream join fans out.
            n_dup = updates.join(target.select(*keys), keys, "left_semi").limit(1).count()
            if n_dup:
                raise AssertionError(
                    f"merge_upsert(assume_new=True) received updates whose keys "
                    f"{keys} already exist in {target_path}"
                )
        new_rows = (
            updates
            if assume_new
            else updates.join(target.select(*keys), keys, "left_anti")
        )
        new_rows.select(target.columns).write.mode("append").parquet(target_path)
        return
    merged = target.join(updates.select(*keys), keys, "left_anti").unionByName(updates)

    tmp = tempfile.mkdtemp(prefix="merge_upsert_", dir=os.path.dirname(target_path.rstrip("/")))
    swap = target_path.rstrip("/") + ".old"
    moved = False
    try:
        merged.write.mode("overwrite").parquet(tmp)
        os.rename(target_path, swap)
        moved = True
        os.rename(tmp, target_path)
        shutil.rmtree(swap, ignore_errors=True)
    except Exception:
        # Never leave the live path empty: if the target was already
        # moved aside, put it back before surfacing the error.
        if moved and not os.path.exists(target_path):
            os.rename(swap, target_path)
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options: str) -> None:
    """JDBC sink parity with the reference (S3/S4) — bulk DataFrame
    write instead of cursor round-trips. Untested here (no database in
    the container); the call shape is the standard Spark JDBC writer."""
    df.write.mode(mode).options(**options).jdbc(url, table)
