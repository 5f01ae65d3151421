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
