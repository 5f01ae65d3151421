"""Sink-layer tests: partition pruning, bucketed join co-location, and
MERGE-upsert semantics — each asserted at the plan level where the
property actually lives."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from fp_data_lakehouse_spark.plans import physical_plan
from fp_data_lakehouse_spark.sources.sinks import (
    merge_upsert,
    write_bucketed,
    write_partitioned,
    write_table,
)

from .conftest import SF_ORACLE


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sinks_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_write_prunes_partitions(spark, tmpdir):
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = f"{tmpdir}/orders_by_year"
    write_partitioned(orders, path, "o_year")

    back = spark.read.parquet(path).filter(F.col("o_year") == 1995)
    plan = physical_plan(back)
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters", 1)[1][:200]
    want = orders.filter(F.col("o_year") == 1995).count()
    assert back.count() == want


def test_bucketed_join_needs_no_exchange(spark, tmpdir):
    """Two tables bucketed on the join key must join with zero shuffles:
    the Exchange the join would otherwise plan was paid at write time."""
    # warehouse dir is static config; use the default (./spark-warehouse,
    # gitignored) — DROP DATABASE CASCADE below removes the table files
    spark.sql("CREATE DATABASE IF NOT EXISTS sink_test")
    spark.sql("USE sink_test")
    try:
        orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
        write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=8)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "lineitem_b",
            "o_orderkey",
            n_buckets=8,
        )
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        plan = physical_plan(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP DATABASE IF EXISTS sink_test CASCADE")
        spark.sql("USE default")


def test_merge_upsert_semantics(spark, tmpdir):
    path = f"{tmpdir}/dim"
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id INT, nk STRING, v INT"
    )
    write_table(base, path)

    updates = spark.createDataFrame(
        [(2, "b", 99), (4, "d", 40)], "id INT, nk STRING, v INT"
    )
    merge_upsert(spark, path, updates, keys=["id"])

    got = {(r.id, r.nk, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a", 10), (2, "b", 99), (3, "c", 30), (4, "d", 40)}


def test_merge_upsert_rejects_duplicate_keys(spark, tmpdir):
    path = f"{tmpdir}/dim"
    write_table(spark.createDataFrame([(1, 1)], "id INT, v INT"), path)
    dup = spark.createDataFrame([(2, 1), (2, 2)], "id INT, v INT")
    with pytest.raises(ValueError, match="not unique"):
        merge_upsert(spark, path, dup, keys=["id"])


def test_merge_upsert_creates_missing_target(spark, tmpdir):
    path = f"{tmpdir}/fresh"
    updates = spark.createDataFrame([(1, "x")], "id INT, nk STRING")
    merge_upsert(spark, path, updates, keys=["id"])
    assert os.path.exists(path)
    assert spark.read.parquet(path).count() == 1


def test_merge_upsert_insert_only_appends_new_keys(spark, tmpdir):
    """insert_only: existing keys keep their ORIGINAL rows (get-or-create
    semantics — the update row is dropped, not applied), new keys
    append, and the target's original files are untouched."""
    import os

    path = f"{tmpdir}/t.parquet"
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id INT, v STRING"
    ).write.parquet(path)
    files_before = {
        f for f in os.listdir(path) if f.endswith(".parquet")
    }
    updates = spark.createDataFrame([(2, "CHANGED"), (3, "c")], "id INT, v STRING")
    merge_upsert(spark, path, updates, keys=["id"], insert_only=True)
    rows = {(r.id, r.v) for r in spark.read.parquet(path).collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c")}
    files_after = {f for f in os.listdir(path) if f.endswith(".parquet")}
    assert files_before <= files_after  # appended, never rewrote


def test_write_jdbc_roundtrip_append_overwrite(spark):
    """S3/S4 certified against the bundled embedded Derby: bulk write,
    append accumulates, overwrite resets, types round-trip."""
    from fp_data_lakehouse_spark.sources.sinks import write_jdbc

    url = "jdbc:derby:memory:sinktest;create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id BIGINT, tag STRING, v DOUBLE"
    )
    write_jdbc(df, url, "T_SINK", mode="overwrite", **props)
    write_jdbc(df, url, "T_SINK", mode="append", **props)
    back = spark.read.options(**props).jdbc(url, "T_SINK")
    assert back.count() == 4  # append accumulated
    write_jdbc(df, url, "T_SINK", mode="overwrite", **props)
    back = spark.read.options(**props).jdbc(url, "T_SINK")
    assert {(r.id, r.tag, r.v) for r in back.collect()} == {(1, "a", 1.5), (2, "b", 2.5)}
