"""Delta interop OUT (sources/delta_export.py publish_delta_log):
a versioned snapshot becomes a spec-shaped ``_delta_log`` readable by
(a) our own spec-implemented read_delta and (b) a VANILLA parquet scan
of the log-listed files — clean snapshots zero-copy, column-mapped
snapshots as name-mode columnMapping, dv'd snapshots with real
RoaringBitmapArray ``.bin`` descriptors. Incremental re-export writes
only the diff; idempotent re-export writes nothing."""

from __future__ import annotations

import json
import os

import pytest

from fp_data_lakehouse_spark.sources.delta import delta_snapshot, read_delta
from fp_data_lakehouse_spark.sources.delta_export import publish_delta_log
from pyspark.sql import functions as F

from fp_data_lakehouse_spark.sources.versioned import (
    add_column,
    delete_where_cow,
    delete_where_dv,
    rename_column,
    write_version,
)


def _ids(df):
    return {tuple(r) for r in df.collect()}


def test_export_clean_snapshot_zero_copy(spark, tmp_path):
    td = str(tmp_path / "t")
    df = spark.range(200).selectExpr("id", "id * 7 AS v")
    write_version(df.repartitionByRange(4, "id"), td, manifest=True)

    assert publish_delta_log(spark, td) == 0
    back = read_delta(spark, td)
    assert set(back.columns) == {"id", "v"}
    assert _ids(back.select("id", "v")) == {(i, i * 7) for i in range(200)}

    # VANILLA readback: scan exactly the log-listed files, no library
    snap = delta_snapshot(td, spark=spark)
    paths = sorted(f"{td}/{p}" for p in snap["files"])
    vanilla = spark.read.parquet(*paths)
    assert _ids(vanilla.select("id", "v")) == {(i, i * 7) for i in range(200)}
    # stats travel: numRecords per add action
    with open(f"{td}/_delta_log/{0:020d}.json") as f:
        adds = [json.loads(ln)["add"] for ln in f if '"add"' in ln]
    assert adds and all(
        json.loads(a["stats"])["numRecords"] > 0 and a["size"] > 0 for a in adds
    )

    # idempotent: nothing new to say -> same delta version, no commit 1
    assert publish_delta_log(spark, td) == 0
    assert not os.path.exists(f"{td}/_delta_log/{1:020d}.json")


def test_export_incremental_diff(spark, tmp_path):
    """A file-granular CoW DELETE exports as a MINIMAL second commit:
    removes for rewritten files, adds for fresh ones, carried files
    untouched."""
    td = str(tmp_path / "t")
    df = spark.range(400).selectExpr("id", "id * 3 AS v")
    write_version(df.repartitionByRange(8, "id"), td, manifest=True)
    assert publish_delta_log(spark, td, version=1) == 0

    assert delete_where_cow(spark, td, F.expr("id < 50")) == 2
    assert publish_delta_log(spark, td, version=2) == 1
    back = read_delta(spark, td)
    assert _ids(back.select("id")) == {(i,) for i in range(50, 400)}

    with open(f"{td}/_delta_log/{1:020d}.json") as f:
        actions = [json.loads(ln) for ln in f]
    n_removes = sum(1 for a in actions if "remove" in a)
    n_adds = sum(1 for a in actions if "add" in a)
    # only the hit file(s) were rewritten: far fewer than 8 adds
    assert 1 <= n_removes <= 2 and 1 <= n_adds <= 2
    # time travel through the exported log still serves version 0
    v0 = read_delta(spark, td, version=0)
    assert v0.count() == 400


def test_export_dv_snapshot_real_bitmaps(spark, tmp_path):
    """A dv'd snapshot exports deletionVector descriptors backed by a
    real RoaringBitmapArray .bin; read_delta (which decodes the spec
    bitmaps executor-side) returns exactly the live rows."""
    td = str(tmp_path / "t")
    df = spark.range(300).selectExpr("id", "id * 2 AS v")
    write_version(df.repartitionByRange(4, "id"), td, manifest=True)
    assert delete_where_dv(spark, td, F.expr("id % 10 = 0")) == 2

    # the dv bound refuses oversized driver-side assembly loudly
    # (checked before the real export: an already-exported snapshot
    # is an idempotent no-op and never reaches assembly)
    with pytest.raises(ValueError, match="compact"):
        publish_delta_log(spark, td, version=2, max_dv_rows=3)

    assert publish_delta_log(spark, td, version=2) == 0
    snap = delta_snapshot(td, spark=spark)
    assert snap["dv"], "export must carry deletionVector descriptors"
    assert all(d["storageType"] == "u" for d in snap["dv"].values())
    assert (snap["protocol"] or {}).get("minReaderVersion") == 3

    back = read_delta(spark, td)
    assert _ids(back.select("id")) == {(i,) for i in range(300) if i % 10}


def test_export_cdf_dv_commit_roundtrip(spark, tmp_path):
    """CDF write-side (r12 verdict item 2): a DV-changing export on a
    CDF-enabled table writes _change_data cdc files and cdc actions, so
    read_delta_changes consumes this engine's own DV commits instead of
    refusing; append-shaped exports stay derive-path (no cdc bytes);
    the SECOND dv wave's cdc carries only the NEWLY-masked rows."""
    from fp_data_lakehouse_spark.sources.delta import read_delta_changes

    td = str(tmp_path / "t")
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    write_version(df.repartitionByRange(2, "id"), td, manifest=True)
    assert publish_delta_log(spark, td, version=1, enable_cdf=True) == 0
    log = f"{td}/_delta_log"
    with open(f"{log}/{0:020d}.json") as f:
        acts0 = [json.loads(ln) for ln in f]
    assert not any("cdc" in a for a in acts0)  # pure append: derive path
    meta0 = next(a["metaData"] for a in acts0 if "metaData" in a)
    assert meta0["configuration"]["delta.enableChangeDataFeed"] == "true"
    proto0 = next(a["protocol"] for a in acts0 if "protocol" in a)
    assert proto0["minWriterVersion"] == 4  # CDF's legacy writer floor

    # DV delete -> the export MUST be cdc-authoritative (enable_cdf is
    # sticky: not passed again)
    assert delete_where_dv(spark, td, F.expr("id % 10 = 0")) == 2
    assert publish_delta_log(spark, td, version=2) == 1
    with open(f"{log}/{1:020d}.json") as f:
        acts1 = [json.loads(ln) for ln in f]
    cdcs = [a["cdc"] for a in acts1 if "cdc" in a]
    assert cdcs and all(
        a["path"].startswith("_change_data/") and a["size"] > 0 for a in cdcs
    )
    assert any(
        (a.get("add") or {}).get("deletionVector") for a in acts1
    ), "the DV re-add still rides the commit"

    # the round-trip the r12 verdict flagged as refused:
    got = {
        (r.id, r._change_type, r._commit_version)
        for r in read_delta_changes(spark, td, 1, 1).collect()
    }
    assert got == {(i, "delete", 1) for i in range(0, 100, 10)}
    full = {
        (r.id, r._change_type, r._commit_version)
        for r in read_delta_changes(spark, td, 0).collect()
    }
    assert full == {(i, "insert", 0) for i in range(100)} | {
        (i, "delete", 1) for i in range(0, 100, 10)
    }

    # a second wave masks MORE rows: its cdc carries only the new ones
    assert delete_where_dv(spark, td, F.expr("id % 10 = 5")) == 3
    assert publish_delta_log(spark, td, version=3) == 2
    got2 = {
        (r.id, r._change_type, r._commit_version)
        for r in read_delta_changes(spark, td, 2, 2).collect()
    }
    assert got2 == {(i, "delete", 2) for i in range(5, 100, 10)}
    # live reads are unaffected
    assert _ids(read_delta(spark, td).select("id")) == {
        (i,) for i in range(100) if i % 10 not in (0, 5)
    }


def test_export_cdf_remove_carries_descriptor(spark, tmp_path):
    """An export that DROPS a previously-DV'd file (CoW rewrite after a
    dv delete) emits the remove with its prior deletionVector
    descriptor, so derive-path CDF readers subtract already-dead
    positions — and with CDF enabled the commit is cdc-authoritative
    with exactly the live rows as deletes."""
    from fp_data_lakehouse_spark.sources.delta import read_delta_changes

    td = str(tmp_path / "t")
    write_version(
        spark.range(40).selectExpr("id", "id AS v").coalesce(1), td,
        manifest=True,
    )
    assert delete_where_dv(spark, td, F.expr("id < 10")) == 2
    assert publish_delta_log(spark, td, version=2, enable_cdf=True) == 0

    # CoW delete rewrites the file set: old dv'd file removed
    assert delete_where_cow(spark, td, F.expr("id >= 30")) == 3
    assert publish_delta_log(spark, td, version=3) == 1
    log = f"{td}/_delta_log"
    with open(f"{log}/{1:020d}.json") as f:
        acts1 = [json.loads(ln) for ln in f]
    removes = [a["remove"] for a in acts1 if "remove" in a]
    assert removes and any(r.get("deletionVector") for r in removes)

    got = {
        (r.id, r._change_type)
        for r in read_delta_changes(spark, td, 1, 1).collect()
    }
    # the rewrite: removed file's LIVE rows (10..39) delete, fresh
    # file's rows (10..29) insert — never the dv-dead ids 0..9
    assert got == {(i, "delete") for i in range(10, 40)} | {
        (i, "insert") for i in range(10, 30)
    }


def test_export_column_mapped_snapshot(spark, tmp_path):
    """RENAME + ADD COLUMN export as name-mode columnMapping: logical
    names with physicalName metadata over unchanged physical files;
    read_delta serves logical names, pre-add files null-backfill."""
    td = str(tmp_path / "t")
    write_version(
        spark.range(60).selectExpr("id", "id * 5 AS v"), td, manifest=True
    )
    assert rename_column(spark, td, "v", "value") == 2
    assert add_column(spark, td, "score", "bigint") == 3

    assert publish_delta_log(spark, td, version=3) == 0
    snap = delta_snapshot(td, spark=spark)
    assert snap["column_mapping_mode"] == "name"
    assert (snap["configuration"] or {}).get("delta.columnMapping.mode") == "name"

    back = read_delta(spark, td)
    assert back.columns == ["id", "value", "score"]
    got = {(r.id, r.value, r.score) for r in back.collect()}
    assert got == {(i, i * 5, None) for i in range(60)}


def test_export_dv_then_compaction_transition(spark, tmp_path):
    """Export across a dv -> clean transition: the dv'd export carries
    descriptors; after compaction the re-export's adds DROP them and
    the protocol story stays readable end-to-end."""
    from fp_data_lakehouse_spark.sources.versioned import compact_version

    td = str(tmp_path / "t")
    write_version(
        spark.range(100).selectExpr("id", "id AS v").coalesce(1), td, manifest=True
    )
    assert delete_where_dv(spark, td, F.expr("id >= 90")) == 2
    assert publish_delta_log(spark, td, version=2) == 0
    assert read_delta(spark, td).count() == 90

    assert compact_version(spark, td, 2, manifest=True) == 3
    assert publish_delta_log(spark, td, version=3) == 1
    snap = delta_snapshot(td, spark=spark)
    assert snap["dv"] == {}
    assert read_delta(spark, td).count() == 90
    # and the dv'd export remains time-travelable
    assert read_delta(spark, td, version=0).count() == 90


def test_export_vdir_snapshot(spark, tmp_path):
    """Copy-published (v-dir) versions export too — plain adds."""
    td = str(tmp_path / "t")
    write_version(spark.range(30).selectExpr("id"), td)  # v-dir publish
    assert publish_delta_log(spark, td) == 0
    assert read_delta(spark, td).count() == 30


def test_checkpoint_delta_log_and_retention(spark, tmp_path):
    """checkpoint_delta_log writes a spec checkpoint + _last_checkpoint
    of the exported log: commit JSONs at or below it can be deleted and
    the table still reads (the r11 reader's checkpoint support is the
    consumer); DV descriptors AND the fpDvRel breadcrumbs survive the
    checkpoint, so a later re-export still diffs minimally."""
    import glob

    from fp_data_lakehouse_spark.sources.delta_export import checkpoint_delta_log

    td = str(tmp_path / "t")
    write_version(
        spark.range(200).selectExpr("id", "id AS v").repartitionByRange(4, "id"),
        td,
        manifest=True,
    )
    assert delete_where_dv(spark, td, F.expr("id % 20 = 0")) == 2
    assert publish_delta_log(spark, td, version=1) == 0
    assert publish_delta_log(spark, td, version=2) == 1

    assert checkpoint_delta_log(spark, td, parts=2) == 1
    log = f"{td}/_delta_log"
    assert len(glob.glob(f"{log}/*.checkpoint.*.parquet")) == 2
    for c in (0, 1):
        os.remove(f"{log}/{c:020d}.json")

    # reads seed from the checkpoint: dv'd head, clean v0 both gone
    # (retention removed v0's commit and no checkpoint covers it)
    assert {r.id for r in read_delta(spark, td).collect()} == {
        i for i in range(200) if i % 20
    }
    with pytest.raises(FileNotFoundError):
        read_delta(spark, td, version=0)

    # breadcrumbs survived: an unchanged-snapshot re-export is still a
    # no-op, and a new snapshot re-exports as a DIFF commit
    assert publish_delta_log(spark, td, version=2) == 1  # idempotent via cp
    from fp_data_lakehouse_spark.sources.versioned import compact_version

    assert compact_version(spark, td, 2, manifest=True) == 3
    assert publish_delta_log(spark, td, version=3) == 2
    assert read_delta(spark, td).count() == 190


def test_read_delta_timestamp_as_of(spark, tmp_path):
    """read_delta(as_of=...) resolves versions by commit mtime with the
    monotonic adjustment; asking before the earliest commit raises."""
    import time as _time

    td = str(tmp_path / "t")
    write_version(spark.range(10).selectExpr("id"), td, manifest=True)
    assert publish_delta_log(spark, td, version=1) == 0
    from fp_data_lakehouse_spark.sources.versioned import write_version as _wv

    log = f"{td}/_delta_log"
    # pin distinct commit times a minute apart
    os.utime(f"{log}/{0:020d}.json", (1_700_000_000, 1_700_000_000))
    _wv(spark.range(25).selectExpr("id"), td, manifest=True)
    assert publish_delta_log(spark, td, version=2) == 1
    os.utime(f"{log}/{1:020d}.json", (1_700_000_060, 1_700_000_060))

    assert read_delta(spark, td, as_of=1_700_000_030).count() == 10
    assert read_delta(spark, td, as_of=1_700_000_060).count() == 25
    assert read_delta(spark, td, as_of="2023-11-14T22:13:20+00:00").count() == 10
    with pytest.raises(FileNotFoundError, match="at or before"):
        read_delta(spark, td, as_of=1_600_000_000)
    with pytest.raises(ValueError, match="not both"):
        read_delta(spark, td, version=0, as_of=1_700_000_030)

    # a timestamp after the newest commit raises (Delta parity: never a
    # silent clamp-to-latest — round-11 advice)
    with pytest.raises(ValueError, match="after the latest"):
        read_delta(spark, td, as_of=1_700_000_120)

    # monotonic adjustment: a LATER commit whose mtime runs BACKWARD is
    # treated as predecessor+1ms, so time order == version order
    _wv(spark.range(40).selectExpr("id"), td, manifest=True)
    assert publish_delta_log(spark, td, version=3) == 2
    os.utime(f"{log}/{2:020d}.json", (1_600_000_000, 1_600_000_000))
    assert read_delta(spark, td, as_of=1_700_000_059).count() == 10
    # the backdated head's ADJUSTED time is v1+1ms, so 60.5s is "after
    # the latest" under the monotonic clock, not a head read
    with pytest.raises(ValueError, match="after the latest"):
        read_delta(spark, td, as_of=1_700_000_060.5)
    assert read_delta(spark, td, version=2).count() == 40


def test_export_carried_dv_writes_no_orphan_bin(spark, tmp_path):
    """An incremental export whose dv'd files are all CARRIED unchanged
    must neither rescan the dv parquet nor write an orphan .bin no add
    references (round-11 advice)."""
    td = str(tmp_path / "t")
    df = spark.range(400).selectExpr("id", "id * 3 AS v")
    write_version(df.repartitionByRange(8, "id"), td, manifest=True)
    assert delete_where_dv(spark, td, F.expr("id = 7")) == 2
    assert publish_delta_log(spark, td, version=2) == 0
    bins0 = {n for n in os.listdir(td) if n.endswith(".bin")}
    assert len(bins0) == 1

    # CoW delete hitting a different file range: the dv'd file carries
    assert delete_where_cow(spark, td, F.expr("id >= 350")) == 3
    assert publish_delta_log(spark, td, version=3) == 1
    bins1 = {n for n in os.listdir(td) if n.endswith(".bin")}
    assert bins1 == bins0, "carried-dv export must not write a new .bin"

    back = read_delta(spark, td)
    assert _ids(back.select("id")) == {
        (i,) for i in range(350) if i != 7
    }


def test_export_dv_assembly_is_distributed(spark, tmp_path, monkeypatch):
    """The DV export never collects raw position lists to the driver:
    every collect() during export carries only scalar/binary columns
    (per-file compressed bitmaps), no array column (round-11 verdict
    item 1). Read-back equality certifies the executor-side
    serialization is byte-faithful."""
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.types import ArrayType

    td = str(tmp_path / "t")
    df = spark.range(5000).selectExpr("id", "id * 2 AS v")
    write_version(df.repartitionByRange(4, "id"), td, manifest=True)
    assert delete_where_dv(spark, td, F.expr("id % 3 = 0")) == 2

    collected_schemas = []
    real_collect = DataFrame.collect

    def spy(self):
        collected_schemas.append(self.schema)
        return real_collect(self)

    monkeypatch.setattr(DataFrame, "collect", spy)
    assert publish_delta_log(spark, td, version=2) == 0
    monkeypatch.undo()

    assert collected_schemas, "export should plan at least one collect"
    for schema in collected_schemas:
        assert not any(
            isinstance(f.dataType, ArrayType) for f in schema.fields
        ), f"positions collected driver-side: {schema.simpleString()}"

    back = read_delta(spark, td)
    assert _ids(back.select("id")) == {(i,) for i in range(5000) if i % 3}


def test_stale_last_checkpoint_hint_warns(spark, tmp_path):
    """A _last_checkpoint naming a version the listing found no complete
    checkpoint for (incomplete multi-part write) trips a loud warning;
    the read itself stays listing-authoritative (round-11 advice)."""
    import warnings as _warnings

    td = str(tmp_path / "t")
    write_version(spark.range(30).selectExpr("id"), td, manifest=True)
    assert publish_delta_log(spark, td, version=1) == 0
    log = f"{td}/_delta_log"
    # write PART 1 of 2 only: an incomplete multi-part checkpoint
    import shutil

    stage = f"{td}/_cp_stage"
    spark.range(0).write.mode("overwrite").parquet(stage)
    src = next(n for n in os.listdir(stage) if n.endswith(".parquet"))
    os.replace(
        f"{stage}/{src}", f"{log}/{0:020d}.checkpoint.{1:010d}.{2:010d}.parquet"
    )
    shutil.rmtree(stage)
    with open(f"{log}/_last_checkpoint", "w") as f:
        json.dump({"version": 0, "size": 3, "parts": 2}, f)

    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        assert read_delta(spark, td).count() == 30
    assert any("no complete checkpoint" in str(w.message) for w in caught)


# ---------------------------------------------------------------------------
# foreign-table APPEND (round 12): add-only commits into existing logs
# ---------------------------------------------------------------------------


def _foreign_log(spark, tmp_path, n=20):
    """A Delta table 'someone else' created: one staged file + v0."""
    import uuid as _uuid

    td = str(tmp_path / "ft")
    log = f"{td}/_delta_log"
    os.makedirs(log)
    tmp = f"{td}/_tmp_{_uuid.uuid4().hex[:6]}"
    spark.range(n).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    src = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
    os.replace(f"{tmp}/{src}", f"{td}/base.parquet")
    import shutil

    shutil.rmtree(tmp)
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
        ],
    })
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "ft", "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema, "partitionColumns": [],
                      "configuration": {}}},
        {"add": {"path": "base.parquet", "partitionValues": {},
                 "size": os.path.getsize(f"{td}/base.parquet"),
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(f"{log}/{0:020d}.json", "w", encoding="utf-8") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return td, log


def test_append_into_foreign_log(spark, tmp_path):
    """append_delta_table commits an add-only v1 into a log a foreign
    writer created; read_delta serves old + new files, and a VANILLA
    scan of the log-listed files matches (round-11 verdict item 9)."""
    from fp_data_lakehouse_spark.sources.delta_export import append_delta_table

    td, log = _foreign_log(spark, tmp_path)
    new = spark.range(20, 30).selectExpr("id", "id * 2 AS v")
    assert append_delta_table(spark, td, new) == 1

    back = read_delta(spark, td)
    assert _ids(back.select("id", "v")) == {(i, i * 2) for i in range(30)}
    snap = delta_snapshot(td, spark=spark)
    vanilla = spark.read.parquet(*[f"{td}/{p}" for p in snap["files"]])
    assert _ids(vanilla.select("id", "v")) == {(i, i * 2) for i in range(30)}
    # old version still serves the pre-append state
    assert read_delta(spark, td, version=0).count() == 20

    # schema mismatch is refused — appends never evolve a foreign table
    with pytest.raises(ValueError, match="schema mismatch"):
        append_delta_table(spark, td, spark.range(3).selectExpr("id"))


def test_append_nullability_gate(spark, tmp_path):
    """Appending NULLs into a column the foreign table declares
    non-nullable is refused by DATA validation (ADVICE r12) — while a
    nullable-DECLARED frame that carries no nulls still appends (Spark
    frames are almost always declared nullable)."""
    import shutil

    from fp_data_lakehouse_spark.sources.delta_export import append_delta_table

    td, log = _foreign_log(spark, tmp_path)
    # flip column v to non-nullable via a metaData update at v1
    strict = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "long", "nullable": False, "metadata": {}},
        ],
    })
    with open(f"{log}/{1:020d}.json", "w", encoding="utf-8") as f:
        f.write(json.dumps({"metaData": {
            "id": "ft", "format": {"provider": "parquet", "options": {}},
            "schemaString": strict, "partitionColumns": [],
            "configuration": {}}}) + "\n")

    with_nulls = spark.range(30, 35).selectExpr(
        "id", "CASE WHEN id = 32 THEN NULL ELSE id * 2 END AS v"
    )
    with pytest.raises(ValueError, match="non-nullable"):
        append_delta_table(spark, td, with_nulls)

    clean = spark.range(30, 35).selectExpr(
        "id", "CASE WHEN id < 0 THEN NULL ELSE id * 2 END AS v"
    )
    assert clean.schema["v"].nullable  # declared nullable, data clean
    assert append_delta_table(spark, td, clean) == 2
    assert _ids(read_delta(spark, td).select("id", "v")) == {
        (i, i * 2) for i in range(20)
    } | {(i, i * 2) for i in range(30, 35)}


def test_append_concurrent_loser_retries(spark, tmp_path):
    """A lost put-if-absent race re-reads the snapshot and retries at
    the new head; the staged files commit exactly once."""
    from fp_data_lakehouse_spark.sources.delta_export import append_delta_table

    td, log = _foreign_log(spark, tmp_path)
    # a concurrent writer lands v1 while our append is staging: since
    # staging happens before the commit loop, pre-creating v1 makes
    # our first create_exclusive lose and retry at v2
    with open(f"{log}/{1:020d}.json", "w", encoding="utf-8") as f:
        f.write(json.dumps({"add": {
            "path": "base.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": False}}) + "\n")
    new = spark.range(20, 25).selectExpr("id", "id * 2 AS v")
    assert append_delta_table(spark, td, new) == 2
    assert _ids(read_delta(spark, td).select("id")) == {(i,) for i in range(25)}


def test_append_refuses_unsupported_writer_features(spark, tmp_path):
    from fp_data_lakehouse_spark.sources.delta_export import append_delta_table

    td, log = _foreign_log(spark, tmp_path)
    # upgrade the protocol to demand generated columns (rowTracking,
    # the r12 example, is HONORED since r13 — see the tests below)
    with open(f"{log}/{1:020d}.json", "w", encoding="utf-8") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": [],
            "writerFeatures": ["generatedColumns"]}}) + "\n")
    with pytest.raises(ValueError, match="generatedColumns"):
        append_delta_table(spark, td, spark.range(1).selectExpr("id", "id AS v"))


def test_append_rowtracking_assigns_row_ids(spark, tmp_path):
    """r12 verdict stretch item 8: appending into a rowTracking table
    assigns consecutive baseRowId ranges from the delta.rowTracking
    high-water mark, stamps defaultRowCommitVersion, and advances the
    mark via a domainMetadata action — across TWO appends; compaction
    refuses the table (a rewrite cannot preserve ids without
    materializing them)."""
    from fp_data_lakehouse_spark.sources.delta_export import (
        append_delta_table,
        compact_delta_table,
    )

    td, log = _foreign_log(spark, tmp_path)  # base.parquet: 20 rows
    with open(f"{log}/{1:020d}.json", "w", encoding="utf-8") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": [],
            "writerFeatures": ["rowTracking", "domainMetadata"]}}) + "\n")
        f.write(json.dumps({"domainMetadata": {
            "domain": "delta.rowTracking",
            "configuration": json.dumps({"rowIdHighWaterMark": 19}),
            "removed": False}}) + "\n")

    assert append_delta_table(
        spark, td,
        spark.range(20, 30).selectExpr("id", "id * 2 AS v").coalesce(1),
    ) == 2
    with open(f"{log}/{2:020d}.json") as f:
        acts = [json.loads(ln) for ln in f]
    adds = [a["add"] for a in acts if "add" in a]
    assert len(adds) == 1
    assert adds[0]["baseRowId"] == 20
    assert adds[0]["defaultRowCommitVersion"] == 2
    assert json.loads(adds[0]["stats"])["numRecords"] == 10
    dm = next(a["domainMetadata"] for a in acts if "domainMetadata" in a)
    assert dm["domain"] == "delta.rowTracking"
    assert json.loads(dm["configuration"])["rowIdHighWaterMark"] == 29

    # the mark replays through the snapshot: a second append continues
    assert append_delta_table(
        spark, td,
        spark.range(30, 35).selectExpr("id", "id * 2 AS v").coalesce(1),
    ) == 3
    with open(f"{log}/{3:020d}.json") as f:
        acts3 = [json.loads(ln) for ln in f]
    assert [a["add"]["baseRowId"] for a in acts3 if "add" in a] == [30]
    dm3 = next(a["domainMetadata"] for a in acts3 if "domainMetadata" in a)
    assert json.loads(dm3["configuration"])["rowIdHighWaterMark"] == 34
    assert _ids(read_delta(spark, td).select("id")) == {
        (i,) for i in range(35)
    }

    with pytest.raises(ValueError, match="rowTracking"):
        compact_delta_table(spark, td, min_files=1)


def test_append_enforces_check_constraints(spark, tmp_path):
    """r13: delta.constraints.* flip from refusal to ENFORCEMENT — a
    violating batch is refused with the constraint named; a clean batch
    (including NULLs, which PASS per SQL CHECK semantics) commits."""
    import shutil

    from fp_data_lakehouse_spark.sources.delta_export import append_delta_table

    td, log = _foreign_log(spark, tmp_path)
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
        ],
    })
    with open(f"{log}/{1:020d}.json", "w", encoding="utf-8") as f:
        f.write(json.dumps({"metaData": {
            "id": "ft", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {"delta.constraints.v_nonneg": "v >= 0"}}})
            + "\n")

    with pytest.raises(ValueError, match="v_nonneg"):
        append_delta_table(
            spark, td,
            spark.range(20, 25).selectExpr("id", "id - 100 AS v"),
        )
    # NULL passes (SQL CHECK semantics); non-violating rows commit
    assert append_delta_table(
        spark, td,
        spark.range(20, 25).selectExpr(
            "id", "CASE WHEN id = 22 THEN NULL ELSE id END AS v"
        ),
    ) == 2
    assert read_delta(spark, td).count() == 25


def test_append_partitioned_and_mapped(spark, tmp_path):
    """Append into a name-mapped, PARTITIONED exported table: files
    carry physical column names, partitionValues carry physical keys,
    and read_delta round-trips the union."""
    from fp_data_lakehouse_spark.sources.delta_export import append_delta_table

    import uuid as _uuid

    td = str(tmp_path / "pm")
    log = f"{td}/_delta_log"
    os.makedirs(log)
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "c-1"}},
            {"name": "bucket", "type": "integer", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "c-2"}},
        ],
    })
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "pm", "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema, "partitionColumns": ["bucket"],
                      "configuration": {"delta.columnMapping.mode": "name",
                                        "delta.columnMapping.maxColumnId": "2"}}},
    ]
    with open(f"{log}/{0:020d}.json", "w", encoding="utf-8") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")

    df = spark.range(12).selectExpr(
        "id", "CAST(id % 3 AS INT) AS bucket"
    )
    assert append_delta_table(spark, td, df) == 1
    snap = delta_snapshot(td, spark=spark)
    assert len(snap["files"]) == 3
    assert all(set(pv) == {"c-2"} for pv in snap["files"].values())
    back = read_delta(spark, td)
    assert _ids(back.select("id", "bucket")) == {(i, i % 3) for i in range(12)}


def test_append_and_compact_nested_mapped(spark, tmp_path):
    """r12 verdict item 5: NESTED schemas physicalize on the write path
    (recursive rename via positional cast + parquet field ids through
    the write schema) — a name-mapped foreign table with a struct
    column round-trips append AND bin-packed compaction; the staged
    files carry physical names and field ids at every level."""
    import pyarrow.parquet as pq

    from fp_data_lakehouse_spark.sources.delta_export import (
        append_delta_table,
        compact_delta_table,
    )
    from tests.test_delta_reader_features import _commit as _rcommit
    from tests.test_delta_reader_features import _stage

    logical = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aaa"}},
            {"name": "nested",
             "type": {"type": "struct", "fields": [
                 {"name": "score", "type": "long", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 3,
                               "delta.columnMapping.physicalName": "col-ccc"}},
             ]},
             "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-bbb"}},
        ],
    })
    td = str(tmp_path / "nm")
    log = f"{td}/_delta_log"
    os.makedirs(log)
    a0 = _stage(
        spark, td, "f0.parquet", 0, 10,
        exprs=("id AS `col-aaa`", "named_struct('col-ccc', id * 2) AS `col-bbb`"),
    )
    _rcommit(log, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "nm", "format": {"provider": "parquet",
                                             "options": {}},
                      "schemaString": logical, "partitionColumns": [],
                      "configuration": {
                          "delta.columnMapping.mode": "name",
                          "delta.columnMapping.maxColumnId": "3"}}},
        a0,
    ])

    new = spark.range(10, 20).selectExpr(
        "id", "named_struct('score', id * 2) AS nested"
    )
    assert append_delta_table(spark, td, new) == 1
    back = read_delta(spark, td)
    assert back.columns == ["id", "nested"]
    assert {(r.id, r.nested.score) for r in back.collect()} == {
        (i, i * 2) for i in range(20)
    }
    # the staged file's footer: physical names + field ids, nested too
    snap = delta_snapshot(td, spark=spark)
    staged = [p for p in snap["files"] if p != "f0.parquet"]
    sch = pq.read_schema(f"{td}/{staged[0]}")
    assert sch.names == ["col-aaa", "col-bbb"]
    assert sch.field("col-bbb").type.field(0).name == "col-ccc"
    assert sch.field("col-aaa").metadata[b"PARQUET:field_id"] == b"1"
    assert (
        sch.field("col-bbb").type.field(0).metadata[b"PARQUET:field_id"] == b"3"
    )

    # compaction (bin-packed rewrite) round-trips the same nested shape
    assert compact_delta_table(spark, td) == 2
    assert {(r.id, r.nested.score)
            for r in read_delta(spark, td).collect()} == {
        (i, i * 2) for i in range(20)
    }

    # a frame whose nested NAMES diverge is still a schema mismatch
    with pytest.raises(ValueError, match="schema mismatch"):
        append_delta_table(
            spark, td,
            spark.range(3).selectExpr(
                "id", "named_struct('points', id) AS nested"
            ),
        )


def test_export_10m_row_dv_bounded_driver(spark, tmp_path, monkeypatch):
    """The round-11 verdict's done-criterion for distributed DV
    assembly: an export over a >=10M-row deletion vector passes with
    bounded driver memory — no position list ever collects (every
    collected schema is scalar/binary only), and the read-back census
    is exact."""
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.types import ArrayType

    td = str(tmp_path / "t")
    write_version(
        spark.range(25_000_000).selectExpr("id").repartitionByRange(4, "id"),
        td,
        manifest=True,
    )
    # mask 10M of 25M rows (40% — under the versioned layer's 50%
    # read-amplification gate)
    assert delete_where_dv(spark, td, F.expr("id % 5 < 2")) == 2

    collected_schemas = []
    real_collect = DataFrame.collect

    def spy(self):
        collected_schemas.append(self.schema)
        return real_collect(self)

    monkeypatch.setattr(DataFrame, "collect", spy)
    assert publish_delta_log(spark, td, version=2, max_dv_rows=20_000_000) == 0
    monkeypatch.undo()
    assert collected_schemas
    for schema in collected_schemas:
        assert not any(isinstance(f.dataType, ArrayType) for f in schema.fields)

    snap = delta_snapshot(td, spark=spark)
    assert sum(int(d["cardinality"]) for d in snap["dv"].values()) == 10_000_000
    back = read_delta(spark, td)
    assert back.count() == 15_000_000
    assert back.agg(F.max("id")).collect()[0][0] == 24_999_999


def test_checkpoint_delta_log_v2_form(spark, tmp_path):
    """checkpoint_delta_log(form='v2') writes the UUID-named top-level
    file + _sidecars/ parquet (the layout newer Delta writers emit),
    upgrading a legacy protocol with a v2Checkpoint feature commit
    first; commits at or below the checkpoint can be deleted and the
    table still reads through our own v2 reader; a later incremental
    export still diffs minimally (dv descriptors + breadcrumbs survive
    the checkpoint)."""
    from fp_data_lakehouse_spark.sources.delta_export import checkpoint_delta_log

    td = str(tmp_path / "t")
    write_version(
        spark.range(100).selectExpr("id", "id AS v").repartitionByRange(4, "id"),
        td,
        manifest=True,
    )
    assert delete_where_dv(spark, td, F.expr("id % 25 = 0")) == 2
    assert publish_delta_log(spark, td, version=2) == 0
    log = f"{td}/_delta_log"

    # dv'd export already carries a (3,7) protocol WITHOUT v2Checkpoint
    # -> the checkpoint writes an upgrade commit at version 1 first
    cp_v = checkpoint_delta_log(spark, td, form="v2", parts=2)
    assert cp_v == 1
    names = os.listdir(log)
    assert any(".checkpoint." in n and n.endswith(".parquet") and len(n) > 40
               for n in names)
    assert len(os.listdir(f"{log}/_sidecars")) == 2
    snap = delta_snapshot(td, spark=spark)
    assert "v2Checkpoint" in (snap["protocol"] or {}).get("readerFeatures", [])

    # retention: delete the covered commits; replay seeds from the v2 cp
    os.remove(f"{log}/{0:020d}.json")
    os.remove(f"{log}/{1:020d}.json")
    back = read_delta(spark, td)
    assert _ids(back.select("id")) == {(i,) for i in range(100) if i % 25}

    # incremental export after the checkpoint still diffs minimally
    assert delete_where_cow(spark, td, F.expr("id >= 75")) == 3
    assert publish_delta_log(spark, td, version=3) == 2
    back2 = read_delta(spark, td)
    assert _ids(back2.select("id")) == {(i,) for i in range(75) if i % 25}


def test_compact_foreign_delta_table(spark, tmp_path):
    """compact_delta_table rewrites a foreign table's live files into
    one per partition tuple and commits removes+adds with
    dataChange=false — the OPTIMIZE shape the streaming source passes
    over; deletion vectors are applied physically (same logical rows);
    a tailing fp_delta_feed stream crosses the compaction silently."""
    from fp_data_lakehouse_spark.sources.delta_export import (
        append_delta_table,
        compact_delta_table,
    )
    from fp_data_lakehouse_spark.sources.pyds import register_python_sources

    td, log = _foreign_log(spark, tmp_path)
    # a couple of appends -> several small files
    assert append_delta_table(
        spark, td, spark.range(20, 30).selectExpr("id", "id * 2 AS v").coalesce(1)
    ) == 1
    assert append_delta_table(
        spark, td, spark.range(30, 40).selectExpr("id", "id * 2 AS v").coalesce(1)
    ) == 2
    snap = delta_snapshot(td, spark=spark)
    assert len(snap["files"]) == 3

    v = compact_delta_table(spark, td)
    assert v == 3
    snap2 = delta_snapshot(td, spark=spark)
    assert len(snap2["files"]) == 1
    assert _ids(read_delta(spark, td).select("id", "v")) == {
        (i, i * 2) for i in range(40)
    }
    # the commit is pure rearrangement
    with open(f"{log}/{3:020d}.json") as f:
        acts = [json.loads(ln) for ln in f]
    assert all(
        not (a.get("add") or a.get("remove") or {}).get("dataChange", True)
        for a in acts
    )

    # a stream that consumed the pre-compaction table crosses v3
    # silently and still tails later real appends
    register_python_sources(spark)
    work = str(tmp_path / "w")

    def drain():
        q = (
            spark.readStream.format("fp_delta_feed").option("path", td)
            .option("startingVersion", "0").load()
            .writeStream.format("parquet")
            .option("path", f"{work}/out")
            .option("checkpointLocation", f"{work}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r.id, r._commit_version)
                for r in spark.read.parquet(f"{work}/out").collect()}

    got = drain()
    assert got == {(i, 0) for i in range(20)} | {(i, 1) for i in range(20, 30)} | {
        (i, 2) for i in range(30, 40)
    }
    assert append_delta_table(
        spark, td, spark.range(40, 45).selectExpr("id", "id * 2 AS v").coalesce(1)
    ) == 4
    got2 = drain()
    assert got2 == got | {(i, 4) for i in range(40, 45)}


def test_compact_foreign_applies_dvs(spark, tmp_path):
    """Compacting a DV'd foreign table drops the masked rows physically
    and clears the descriptors — same logical rows, clean files."""
    from fp_data_lakehouse_spark.sources.delta_export import compact_delta_table
    from fp_data_lakehouse_spark.sources.roaring import new_dv_file, z85_encode
    import uuid as _uuid

    td, log = _foreign_log(spark, tmp_path)
    # mask ids 0..4 via a real DV + protocol upgrade
    pos = [
        r[0]
        for r in spark.read.parquet(f"{td}/base.parquet")
        .selectExpr("_metadata.row_index", "id").where("id < 5").collect()
    ]
    blob, spans = new_dv_file([sorted(pos)])
    u = _uuid.uuid4()
    with open(f"{td}/deletion_vector_{u}.bin", "wb") as f:
        f.write(blob)
    with open(f"{log}/{1:020d}.json", "w", encoding="utf-8") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"]}}) + "\n")
        f.write(json.dumps({"remove": {"path": "base.parquet",
                                       "dataChange": False}}) + "\n")
        f.write(json.dumps({"add": {
            "path": "base.parquet", "partitionValues": {},
            "size": os.path.getsize(f"{td}/base.parquet"),
            "modificationTime": 0, "dataChange": True,
            "deletionVector": {
                "storageType": "u", "pathOrInlineDv": z85_encode(u.bytes),
                "offset": spans[0][0], "sizeInBytes": spans[0][1],
                "cardinality": len(pos)}}}) + "\n")
    assert read_delta(spark, td).count() == 15

    assert compact_delta_table(spark, td, min_files=1) == 2
    snap = delta_snapshot(td, spark=spark)
    assert snap["dv"] == {}
    assert _ids(read_delta(spark, td).select("id")) == {(i,) for i in range(5, 20)}


def test_compact_bin_packed_parallel_rewrite(spark, tmp_path, monkeypatch):
    """r12 verdict item 1: the compaction rewrite is SIZE-BINNED and
    parallel — an unpartitioned table above max_file_bytes packs into
    >= 2 output files (one per bin, written by parallel tasks), never
    one task rewriting the whole table; coalesce(1) is never used
    (monkeypatch tripwire — it would also drag the upstream read into
    the same task); values are identical."""
    from pyspark.sql import DataFrame

    from fp_data_lakehouse_spark.sources.delta_export import (
        append_delta_table,
        compact_delta_table,
    )

    td, log = _foreign_log(spark, tmp_path)
    for lo in (20, 40, 60):
        append_delta_table(
            spark, td,
            spark.range(lo, lo + 20).selectExpr("id", "id * 2 AS v").coalesce(1),
        )
    snap = delta_snapshot(td, spark=spark)
    assert len(snap["files"]) == 4
    # target fits any TWO near-equal files but never three — exactly 2
    # bins of the 4 files regardless of the uuid-name pack order
    target = 2 * max(snap["sizes"].values()) + 1

    def _no_coalesce(self, *_a, **_k):
        raise AssertionError("compaction must never coalesce")

    monkeypatch.setattr(DataFrame, "coalesce", _no_coalesce)
    v = compact_delta_table(spark, td, max_file_bytes=target)
    monkeypatch.undo()
    assert v == 4
    snap2 = delta_snapshot(td, spark=spark)
    assert len(snap2["files"]) == 2  # >= 2 parallel bins, not one task
    assert _ids(read_delta(spark, td).select("id", "v")) == {
        (i, i * 2) for i in range(80)
    }
    # every new file respects the bin target (compressed output of a
    # bin of inputs stays near the inputs' total)
    assert all(s <= 2 * target for s in snap2["sizes"].values())


def test_compact_bin_packed_partitioned(spark, tmp_path):
    """Bins never cross a partition tuple, and a tuple larger than the
    target splits into multiple files with correct partitionValues."""
    import shutil

    from fp_data_lakehouse_spark.sources.delta_export import (
        append_delta_table,
        compact_delta_table,
    )

    td = str(tmp_path / "pt")
    log = f"{td}/_delta_log"
    os.makedirs(log)
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "part", "type": "long", "nullable": True, "metadata": {}},
        ],
    })
    with open(f"{log}/{0:020d}.json", "w", encoding="utf-8") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 1,
                                         "minWriterVersion": 2}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "pt", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": ["part"],
            "configuration": {}}}) + "\n")
    # three appends per partition value -> 6 small files across 2 tuples
    for lo in (0, 100, 200):
        append_delta_table(
            spark, td,
            spark.range(lo, lo + 40).selectExpr("id", "id % 2 AS part"),
        )
    snap = delta_snapshot(td, spark=spark)
    assert len(snap["files"]) == 6
    # target fits any TWO near-equal files but never three
    target = 2 * max(snap["sizes"].values()) + 1

    v = compact_delta_table(spark, td, max_file_bytes=target)
    snap2 = delta_snapshot(td, spark=spark)
    # each tuple's 3 files pack into 2 bins -> 4 files total
    assert len(snap2["files"]) == 4
    by_tuple = {}
    for p, pv in snap2["files"].items():
        by_tuple.setdefault(pv["part"], []).append(p)
    assert sorted(by_tuple) == ["0", "1"] and all(
        len(v2) == 2 for v2 in by_tuple.values()
    )
    back = read_delta(spark, td, version=v)
    assert _ids(back.select("id", "part")) == {
        (i, i % 2) for lo in (0, 100, 200) for i in range(lo, lo + 40)
    }


def test_vacuum_delta_table(spark, tmp_path):
    """VACUUM (r13): tombstoned files past retention are deleted (aged
    by the remove's deletionTimestamp), untracked *.parquet orphans past
    retention are reaped, live files and live DV .bin files survive,
    fresh orphans survive, the retention floor refuses short windows
    unless overridden, and dry_run deletes nothing."""
    import time as _time

    from fp_data_lakehouse_spark.sources.delta_export import (
        append_delta_table,
        vacuum_delta_table,
    )

    td, log = _foreign_log(spark, tmp_path)  # v0: base.parquet
    assert append_delta_table(
        spark, td, spark.range(20, 30).selectExpr("id", "id * 2 AS v").coalesce(1)
    ) == 1
    # v2: CoW-style remove of base.parquet with an OLD deletionTimestamp
    old_ms = int((_time.time() - 30 * 24 * 3600) * 1000)
    with open(f"{log}/{2:020d}.json", "w", encoding="utf-8") as f:
        f.write(json.dumps({"remove": {
            "path": "base.parquet", "dataChange": True,
            "deletionTimestamp": old_ms}}) + "\n")

    # an old orphan (aborted staging) and a fresh one
    with open(f"{td}/orphan_old.parquet", "wb") as f:
        f.write(b"x")
    os.utime(f"{td}/orphan_old.parquet",
             (_time.time() - 10 * 24 * 3600,) * 2)
    with open(f"{td}/orphan_new.parquet", "wb") as f:
        f.write(b"x")
    # a non-candidate artifact kind must never be touched
    with open(f"{td}/notes.txt", "w") as f:
        f.write("keep")
    os.utime(f"{td}/notes.txt", (_time.time() - 10 * 24 * 3600,) * 2)

    with pytest.raises(ValueError, match="retention"):
        vacuum_delta_table(spark, td, retention_hours=0)

    planned = vacuum_delta_table(
        spark, td, retention_hours=168, dry_run=True
    )
    assert set(planned) == {"base.parquet", "orphan_old.parquet"}
    assert os.path.exists(f"{td}/base.parquet")  # dry run: untouched

    deleted = vacuum_delta_table(spark, td, retention_hours=168)
    assert set(deleted) == {"base.parquet", "orphan_old.parquet"}
    assert not os.path.exists(f"{td}/base.parquet")
    assert not os.path.exists(f"{td}/orphan_old.parquet")
    assert os.path.exists(f"{td}/orphan_new.parquet")
    assert os.path.exists(f"{td}/notes.txt")
    # the head still reads: only unreferenced bytes were reclaimed
    assert _ids(read_delta(spark, td).select("id")) == {
        (i,) for i in range(20, 30)
    }


def test_vacuum_keeps_live_dv_bins(spark, tmp_path):
    """A DV .bin referenced by a live add is pinned even when aged;
    after the DVs are compacted away the aged .bin becomes reclaimable
    via the recursive listing."""
    import time as _time

    from fp_data_lakehouse_spark.sources.delta_export import (
        compact_delta_table,
        vacuum_delta_table,
    )
    from fp_data_lakehouse_spark.sources.roaring import new_dv_file, z85_encode
    import uuid as _uuid

    td, log = _foreign_log(spark, tmp_path)
    pos = [
        r[0]
        for r in spark.read.parquet(f"{td}/base.parquet")
        .selectExpr("_metadata.row_index", "id").where("id < 5").collect()
    ]
    blob, spans = new_dv_file([sorted(pos)])
    u = _uuid.uuid4()
    dv_name = f"deletion_vector_{u}.bin"
    with open(f"{td}/{dv_name}", "wb") as f:
        f.write(blob)
    os.utime(f"{td}/{dv_name}", (_time.time() - 10 * 24 * 3600,) * 2)
    with open(f"{log}/{1:020d}.json", "w", encoding="utf-8") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"]}}) + "\n")
        f.write(json.dumps({"add": {
            "path": "base.parquet", "partitionValues": {},
            "size": os.path.getsize(f"{td}/base.parquet"),
            "modificationTime": 0, "dataChange": True,
            "deletionVector": {
                "storageType": "u", "pathOrInlineDv": z85_encode(u.bytes),
                "offset": spans[0][0], "sizeInBytes": spans[0][1],
                "cardinality": len(pos)}}}) + "\n")

    # live DV bin: aged but referenced -> survives
    assert vacuum_delta_table(
        spark, td, retention_hours=168, dry_run=True
    ) == []

    # compaction clears the DVs; age the tombstoned file, vacuum reaps
    assert compact_delta_table(spark, td, min_files=1) == 2
    deleted = vacuum_delta_table(
        spark, td, retention_hours=0.000001, enforce_retention_floor=False
    )
    assert "base.parquet" in deleted and dv_name in deleted
    assert read_delta(spark, td).count() == 15
