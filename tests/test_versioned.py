"""Versioned-table semantics: snapshot isolation, time travel, commit
atomicity (pointer is the commit point), vacuum retention."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from fp_data_lakehouse_spark.sources.versioned import (
    latest_version,
    read_table,
    vacuum,
    versions,
    write_version,
)


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="vtable_")
    yield f"{d}/t"
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, n):
    return spark.range(n).selectExpr("id", "id * 2 AS v")


def test_write_read_time_travel(spark, tdir):
    assert write_version(_df(spark, 3), tdir) == 1
    assert write_version(_df(spark, 5), tdir) == 2
    assert write_version(_df(spark, 7), tdir) == 3

    assert read_table(spark, tdir).count() == 7  # latest
    assert read_table(spark, tdir, version=1).count() == 3  # time travel
    assert read_table(spark, tdir, version=2).count() == 5
    assert versions(tdir) == [1, 2, 3]
    assert latest_version(tdir) == 3


def test_uncommitted_version_is_invisible(spark, tdir):
    """A fully-written snapshot directory without the pointer swap must
    not be readable as latest — the pointer is the commit."""
    write_version(_df(spark, 3), tdir)
    # simulate a crash after data write, before commit: write v2 dir by hand
    _df(spark, 9).write.parquet(os.path.join(tdir, "v00002"))
    assert latest_version(tdir) == 1
    assert read_table(spark, tdir).count() == 3
    with pytest.raises(FileNotFoundError):
        read_table(spark, tdir, version=2)
    # the next real write supersedes the orphan... which vacuum removes
    removed = vacuum(tdir, keep_last=5)
    assert removed == [2]
    assert write_version(_df(spark, 4), tdir) == 2
    assert read_table(spark, tdir).count() == 4


def test_vacuum_retention(spark, tdir):
    for n in (1, 2, 3, 4):
        write_version(_df(spark, n), tdir)
    removed = vacuum(tdir, keep_last=2)
    assert removed == [1, 2]
    assert versions(tdir) == [3, 4]
    assert read_table(spark, tdir, version=3).count() == 3
    with pytest.raises(FileNotFoundError):
        read_table(spark, tdir, version=1)
