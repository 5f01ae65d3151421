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


def _version_dirs(table_dir: str) -> list[int]:
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        m = _VDIR.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def versions(table_dir: str) -> list[int]:
    """Retained (queryable) snapshot versions, ascending."""
    return _version_dirs(table_dir)


def latest_version(table_dir: str) -> int | None:
    ptr = os.path.join(table_dir, _PTR)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip())


def write_version(df: DataFrame, table_dir: str) -> int:
    """Publish a new immutable snapshot; returns its version number.
    The pointer swap is the commit point — a crash before it leaves the
    table at the previous version with an orphan directory (cleaned by
    vacuum), never a torn table."""
    os.makedirs(table_dir, exist_ok=True)
    existing = _version_dirs(table_dir)
    v = (existing[-1] + 1) if existing else 1
    vdir = os.path.join(table_dir, f"v{v:05d}")
    df.write.mode("overwrite").parquet(vdir)

    fd, tmp = tempfile.mkstemp(dir=table_dir, prefix="._latest_")
    with os.fdopen(fd, "w") as f:
        f.write(str(v))
    os.replace(tmp, os.path.join(table_dir, _PTR))  # atomic commit
    return v


def read_table(spark: SparkSession, table_dir: str, version: int | None = None) -> DataFrame:
    """Read the committed snapshot (default: latest). ``version`` time
    travels to any retained snapshot; reading a vacuumed or uncommitted
    version raises."""
    if version is None:
        version = latest_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no committed version in {table_dir}")
    if version not in _version_dirs(table_dir):
        raise FileNotFoundError(f"version {version} not retained in {table_dir}")
    committed = latest_version(table_dir) or 0
    if version > committed:
        raise FileNotFoundError(f"version {version} not committed yet in {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, f"v{version:05d}"))


def merge_into_version(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    keys: list[str],
    merge_schema: bool = False,
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
    dup = updates.groupBy(*keys).count().filter("count > 1").limit(1).count()
    if dup:
        raise ValueError(f"updates are not unique on merge keys {keys}")
    if latest_version(table_dir) is None:
        return write_version(updates, table_dir)
    prev = read_table(spark, table_dir)
    # allowMissingColumns null-fills BOTH directions: columns new in
    # updates appear (null for surviving old rows), columns absent from
    # updates persist (null for the new rows).
    merged = prev.join(updates.select(*keys), keys, "left_anti").unionByName(
        updates, allowMissingColumns=merge_schema
    )
    return write_version(merged, table_dir)


def delete_from_version(spark: SparkSession, table_dir: str, condition) -> int:
    """DELETE WHERE ``condition`` as a new snapshot (rows NOT matching
    the condition survive). Returns the new version number."""
    prev = read_table(spark, table_dir)
    return write_version(prev.filter(~condition), table_dir)


def change_feed(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int,
    keys: list[str],
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
    old = read_table(spark, table_dir, from_version)
    new = read_table(spark, table_dir, to_version)
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


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` committed snapshots (plus
    any orphan newer-than-committed directory from a failed write).
    Returns the versions removed."""
    committed = latest_version(table_dir)
    if committed is None:
        return []
    removed = []
    for v in _version_dirs(table_dir):
        orphan = v > committed
        expired = v <= committed - keep_last
        if orphan or expired:
            shutil.rmtree(os.path.join(table_dir, f"v{v:05d}"), ignore_errors=True)
            removed.append(v)
    return removed
