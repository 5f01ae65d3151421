"""Versioned tables: snapshot writes + time travel on plain parquet —
the minimal table-format layer (what Delta/Iceberg metadata logs do,
reduced to its essentials) for environments without one.

Layout:
    table_dir/
        v00001/ v00002/ ...   immutable snapshot directories (parquet)
        _LATEST               text file holding the current version number

Writers never mutate a published snapshot: a new version is fully
written to its own directory FIRST, then the pointer file swaps via
atomic rename — readers either see the old version or the new one,
never a partial write (single-filesystem semantics; on object stores a
real table format's log gives the same property transactionally).
Time travel = read any retained version number; vacuum drops old
snapshots explicitly, so "how far back can I query" is an operator
decision, exactly as in Delta VACUUM.

Backend seam: every metadata/filesystem touch goes through a
``VersionedBackend`` (version listing, pointer read/commit, snapshot
removal) — the parquet data reads/writes are Spark's own and already
follow the path's scheme. Two in-repo implementations prove the seam:

- ``LocalFsBackend``: os/shutil/tempfile on a local path (the default
  for plain paths). Pointer commit is a true atomic ``os.replace``.
- ``HadoopFsBackend``: the JVM Hadoop FileSystem API, so the same
  table works on any scheme Spark can reach (hdfs://, s3a://,
  file://). Pointer commit is write-tmp + rename — atomic on HDFS;
  on S3-like stores rename is copy+delete, which is exactly why real
  deployments put a Delta/Iceberg LOG there instead; the seam is
  where that swap happens without touching call sites.

``tests/test_versioned.py`` runs the full MERGE / CDF / time-travel /
vacuum contract parametrized over BOTH backends.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PTR = "_LATEST"
_VDIR = re.compile(r"^v(\d{5})$")


class LocalFsBackend:
    """Metadata ops on a local filesystem path (default for plain paths)."""

    def list_names(self, d: str) -> list[str]:
        return os.listdir(d) if os.path.isdir(d) else []

    def makedirs(self, d: str) -> None:
        os.makedirs(d, exist_ok=True)

    def read_text(self, p: str) -> str | None:
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read()

    def write_text_atomic(self, p: str, content: str) -> None:
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(p), prefix="._latest_")
        with os.fdopen(fd, "w") as f:
            f.write(content)
        os.replace(tmp, p)  # atomic commit

    def rmtree(self, p: str) -> None:
        shutil.rmtree(p, ignore_errors=True)


class HadoopFsBackend:
    """Metadata ops through the JVM Hadoop FileSystem — one backend for
    every scheme Spark itself can write parquet to. Needs a live
    session only to reach the JVM gateway; handles are captured at
    construction (same rationale as sinks.alloc_scratch)."""

    def __init__(self, spark: SparkSession):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._gateway = spark.sparkContext._gateway

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self, p: str):
        return self._path(p).getFileSystem(self._conf)

    def list_names(self, d: str) -> list[str]:
        fs = self._fs(d)
        hp = self._path(d)
        if not fs.exists(hp):
            return []
        return [st.getPath().getName() for st in fs.listStatus(hp)]

    def makedirs(self, d: str) -> None:
        self._fs(d).mkdirs(self._path(d))

    def read_text(self, p: str) -> str | None:
        fs = self._fs(p)
        hp = self._path(p)
        if not fs.exists(hp):
            return None
        stream = fs.open(hp)
        try:
            # one bulk JVM call, not one py4j round trip per byte
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def write_text_atomic(self, p: str, content: str) -> None:
        # write-tmp + OVERWRITE-rename (FileContext): atomic on HDFS with
        # no delete-then-rename window where the pointer file does not
        # exist; copy+delete on S3-likes (where a log-based table format
        # replaces this backend). Plain FileSystem.rename refuses to
        # overwrite, which is why the naive form needed the unsafe
        # delete first.
        fs = self._fs(p)
        tmp = self._path(p + ".tmp")
        stream = fs.create(tmp, True)
        try:
            stream.write(bytearray(content, "utf-8"))
        finally:
            stream.close()
        dest = self._path(p)
        try:
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                dest.toUri(), self._conf
            )
            rename_cls = self._jvm.org.apache.hadoop.fs.Options.Rename
            opts = self._gateway.new_array(rename_cls, 1)
            opts[0] = rename_cls.OVERWRITE
            fc.rename(tmp, dest, opts)
        except Exception:
            # FileContext unsupported for this scheme: fall back to the
            # windowed delete+rename (still last-writer-wins correct,
            # with a transient not-found window a retry absorbs).
            if fs.exists(dest):
                fs.delete(dest, False)
            fs.rename(tmp, dest)

    def rmtree(self, p: str) -> None:
        fs = self._fs(p)
        hp = self._path(p)
        if fs.exists(hp):
            fs.delete(hp, True)


def _backend_for(table_dir: str, spark: SparkSession | None = None):
    """Default backend resolution: scheme'd paths (including file://)
    go through Hadoop; bare paths stay on the local backend."""
    if "://" not in table_dir:
        return LocalFsBackend()
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"a scheme'd versioned table ({table_dir}) needs an active "
            "SparkSession (or an explicit backend) for its filesystem"
        )
    return HadoopFsBackend(spark)


def _version_dirs(table_dir: str, backend=None) -> list[int]:
    backend = backend or _backend_for(table_dir)
    out = []
    for name in backend.list_names(table_dir):
        m = _VDIR.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def versions(table_dir: str, backend=None) -> list[int]:
    """Retained (queryable) snapshot versions, ascending."""
    return _version_dirs(table_dir, backend)


def latest_version(table_dir: str, backend=None) -> int | None:
    backend = backend or _backend_for(table_dir)
    txt = backend.read_text(f"{table_dir.rstrip('/')}/{_PTR}")
    return int(txt.strip()) if txt is not None else None


def write_version(df: DataFrame, table_dir: str, backend=None) -> int:
    """Publish a new immutable snapshot; returns its version number.
    The pointer swap is the commit point — a crash before it leaves the
    table at the previous version with an orphan directory (cleaned by
    vacuum), never a torn table."""
    backend = backend or _backend_for(table_dir, df.sparkSession)
    backend.makedirs(table_dir)
    existing = _version_dirs(table_dir, backend)
    v = (existing[-1] + 1) if existing else 1
    df.write.mode("overwrite").parquet(f"{table_dir.rstrip('/')}/v{v:05d}")
    backend.write_text_atomic(f"{table_dir.rstrip('/')}/{_PTR}", str(v))
    return v


def read_table(
    spark: SparkSession, table_dir: str, version: int | None = None, backend=None
) -> DataFrame:
    """Read the committed snapshot (default: latest). ``version`` time
    travels to any retained snapshot; reading a vacuumed or uncommitted
    version raises."""
    backend = backend or _backend_for(table_dir, spark)
    if version is None:
        version = latest_version(table_dir, backend)
        if version is None:
            raise FileNotFoundError(f"no committed version in {table_dir}")
    if version not in _version_dirs(table_dir, backend):
        raise FileNotFoundError(f"version {version} not retained in {table_dir}")
    committed = latest_version(table_dir, backend) or 0
    if version > committed:
        raise FileNotFoundError(f"version {version} not committed yet in {table_dir}")
    return spark.read.parquet(f"{table_dir.rstrip('/')}/v{version:05d}")


def merge_into_version(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    keys: list[str],
    merge_schema: bool = False,
    backend=None,
) -> int:
    """MERGE INTO a versioned table: publishes a NEW snapshot holding
    (previous version WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN
    INSERT of ``updates``) — the Delta ``MERGE`` + transaction-log shape
    on the snapshot layout, so every increment is also a time-travel
    point. First merge into an empty table is a plain initial load.

    Updates must be unique on ``keys`` (same MERGE precondition as
    ``sinks.merge_upsert``); the previous snapshot is never mutated, so
    a failed merge leaves the table at the old version.

    ``merge_schema=True`` is Delta's ``mergeSchema`` for MERGE: columns
    present on only one side are added to the new snapshot (null-filled
    on the other side). Off by default so an accidental column rename
    fails loudly instead of forking the schema.
    """
    backend = backend or _backend_for(table_dir, spark)
    dup = updates.groupBy(*keys).count().filter("count > 1").limit(1).count()
    if dup:
        raise ValueError(f"updates are not unique on merge keys {keys}")
    if latest_version(table_dir, backend) is None:
        return write_version(updates, table_dir, backend)
    prev = read_table(spark, table_dir, backend=backend)
    # allowMissingColumns null-fills BOTH directions: columns new in
    # updates appear (null for surviving old rows), columns absent from
    # updates persist (null for the new rows).
    merged = prev.join(updates.select(*keys), keys, "left_anti").unionByName(
        updates, allowMissingColumns=merge_schema
    )
    return write_version(merged, table_dir, backend)


def delete_from_version(
    spark: SparkSession, table_dir: str, condition, backend=None
) -> int:
    """DELETE WHERE ``condition`` as a new snapshot (rows NOT matching
    the condition survive). Returns the new version number."""
    backend = backend or _backend_for(table_dir, spark)
    prev = read_table(spark, table_dir, backend=backend)
    return write_version(prev.filter(~condition), table_dir, backend)


def change_feed(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int,
    keys: list[str],
    backend=None,
) -> DataFrame:
    """Change-data-feed between two retained snapshots: one row per key
    whose payload changed, tagged ``_change_type`` in
    {'insert','update_postimage','delete'} (the Delta CDF vocabulary,
    minus preimages). Non-key columns carry the post-image for
    inserts/updates and the pre-image for deletes.

    Implemented as a single full-outer equi-join on the keys with a
    null-safe struct comparison over the payload — one shuffle, no
    driver materialization, so diffing two 100 TB snapshots is an
    ordinary co-partitioned join (and shuffle-free entirely if the
    snapshots are bucketed on the keys)."""
    backend = backend or _backend_for(table_dir, spark)
    old = read_table(spark, table_dir, from_version, backend=backend)
    new = read_table(spark, table_dir, to_version, backend=backend)
    non_keys = [c for c in new.columns if c not in keys]
    if not non_keys:
        raise ValueError("change_feed requires at least one non-key column")
    o = old.select(*keys, F.struct(*non_keys).alias("_old"))
    n = new.select(*keys, F.struct(*non_keys).alias("_new"))
    j = o.join(n, keys, "full_outer").filter(~F.col("_old").eqNullSafe(F.col("_new")))
    img = F.coalesce("_new", "_old")
    return j.select(
        *keys,
        F.when(F.col("_old").isNull(), F.lit("insert"))
        .when(F.col("_new").isNull(), F.lit("delete"))
        .otherwise(F.lit("update_postimage"))
        .alias("_change_type"),
        *[img.getField(c).alias(c) for c in non_keys],
    )


def vacuum(table_dir: str, keep_last: int = 2, backend=None) -> list[int]:
    """Drop all but the newest ``keep_last`` committed snapshots (plus
    any orphan newer-than-committed directory from a failed write).
    Returns the versions removed."""
    backend = backend or _backend_for(table_dir)
    committed = latest_version(table_dir, backend)
    if committed is None:
        return []
    removed = []
    for v in _version_dirs(table_dir, backend):
        orphan = v > committed
        expired = v <= committed - keep_last
        if orphan or expired:
            backend.rmtree(f"{table_dir.rstrip('/')}/v{v:05d}")
            removed.append(v)
    return removed
