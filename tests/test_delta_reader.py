"""Delta Lake log reader (sources/delta.py): snapshot reconstruction,
time travel, partition-value injection, checkpoint replay, and the
protocol/feature refusals — against logs synthesized per the PUBLIC
Delta protocol spec (the container ships no delta-spark JAR, so there
is no live cross-implementation round trip; the fixture encodes the
spec's action shapes directly)."""

from __future__ import annotations

import json
import os
import uuid

import pytest

from fp_data_lakehouse_spark.sources.delta import delta_snapshot, read_delta

_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
            {"name": "part", "type": "integer", "nullable": True, "metadata": {}},
        ],
    }
)


def _meta(partition_cols, configuration=None):
    return {
        "metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _SCHEMA,
            "partitionColumns": partition_cols,
            "configuration": configuration or {},
        }
    }


def _protocol(mrv=1, reader_features=None):
    p = {"minReaderVersion": mrv, "minWriterVersion": 2}
    if reader_features is not None:
        p["readerFeatures"] = reader_features
    return {"protocol": p}


def _commit(log_dir, v, actions):
    with open(f"{log_dir}/{v:020d}.json", "w", encoding="utf-8") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _stage_file(spark, table_dir, name, lo, hi, part):
    """One data file holding ids [lo, hi) — WITHOUT the partition
    column (Delta stores partition values only in the log)."""
    tmp = f"{table_dir}/_tmp_{uuid.uuid4().hex[:8]}"
    (
        spark.range(lo, hi)
        .selectExpr("id", "id * 10 AS v")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    src = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
    os.makedirs(os.path.dirname(f"{table_dir}/{name}"), exist_ok=True)
    os.replace(f"{tmp}/{src}", f"{table_dir}/{name}")
    import shutil

    shutil.rmtree(tmp)
    return {
        "add": {
            "path": name,
            "partitionValues": {"part": str(part)},
            "size": os.path.getsize(f"{table_dir}/{name}"),
            "modificationTime": 0,
            "dataChange": True,
        }
    }


@pytest.fixture
def delta_table(spark, tmp_path):
    td = str(tmp_path / "dtable")
    log = f"{td}/_delta_log"
    os.makedirs(log)
    a0 = _stage_file(spark, td, "part=0/f0.parquet", 0, 100, 0)
    a1 = _stage_file(spark, td, "part=1/f1.parquet", 100, 200, 1)
    _commit(log, 0, [_protocol(), _meta(["part"]), a0, a1])
    a2 = _stage_file(spark, td, "part=0/f2.parquet", 200, 250, 0)
    _commit(log, 1, [a2])
    a3 = _stage_file(spark, td, "part=1/f3.parquet", 250, 300, 1)
    _commit(
        log,
        2,
        [
            {"remove": {"path": "part=0/f0.parquet", "dataChange": True}},
            a3,
        ],
    )
    return td


def test_snapshot_replay_and_time_travel(spark, delta_table):
    head = read_delta(spark, delta_table)
    assert head.columns == ["id", "v", "part"]
    got = {(r.id, r.v, r.part) for r in head.collect()}
    # f0 (ids 0..99) was removed at v2; f2 holds ids 200..249 in part 0
    want = {
        (i, i * 10, 0 if 200 <= i < 250 else 1) for i in range(100, 300)
    }
    assert got == want

    v0 = read_delta(spark, delta_table, version=0)
    assert v0.count() == 200 and v0.filter("part = 0").count() == 100
    v1 = read_delta(spark, delta_table, version=1)
    assert v1.count() == 250
    # partition column is typed from the declared schema, not string
    assert dict(head.dtypes)["part"] == "int"
    assert {r.part for r in head.select("part").distinct().collect()} == {0, 1}

    with pytest.raises(FileNotFoundError, match="version 9"):
        read_delta(spark, delta_table, version=9)


def test_checkpoint_replay(spark, delta_table):
    """A parquet checkpoint replaces the commits at or below it: the
    reader must resume JSON replay ABOVE the checkpoint version."""
    snap1 = delta_snapshot(delta_table, 1)
    log = f"{delta_table}/_delta_log"
    # synthesize the v1 checkpoint from the replayed state (add rows +
    # one metaData + one protocol), per the spec's checkpoint schema
    rows = [
        {
            "add": {"path": p, "partitionValues": pv},
            "remove": None,
            "metaData": None,
            "protocol": None,
        }
        for p, pv in snap1["files"].items()
    ]
    rows.append(
        {
            "add": None,
            "remove": None,
            "metaData": {
                "id": "cp",
                "schemaString": snap1["schema_json"],
                "partitionColumns": snap1["partition_columns"],
                "configuration": {},
            },
            "protocol": None,
        }
    )
    rows.append(
        {
            "add": None,
            "remove": None,
            "metaData": None,
            "protocol": {"minReaderVersion": 1},
        }
    )
    cp_schema = (
        "add struct<path:string,partitionValues:map<string,string>>, "
        "remove struct<path:string>, "
        "metaData struct<id:string,schemaString:string,"
        "partitionColumns:array<string>,configuration:map<string,string>>, "
        "protocol struct<minReaderVersion:int>"
    )
    spark.createDataFrame(rows, cp_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{log}/_cp_stage")
    src = next(
        n for n in os.listdir(f"{log}/_cp_stage") if n.endswith(".parquet")
    )
    os.replace(f"{log}/_cp_stage/{src}", f"{log}/{1:020d}.checkpoint.parquet")
    # delete the commits the checkpoint subsumes: replay MUST use it
    os.remove(f"{log}/{0:020d}.json")
    os.remove(f"{log}/{1:020d}.json")

    head = read_delta(spark, delta_table)
    assert head.count() == 200  # 250 at cp - 50 removed + ... v2: -100 +50
    got = {r.id for r in head.collect()}
    assert got == set(range(100, 300))


def test_protocol_refusals(spark, tmp_path):
    """Unknown reader features / protocol versions and unknown column
    mapping modes are refused loudly; features this reader DOES
    implement (deletionVectors, columnMapping, timestampNtz,
    v2Checkpoint since r12) pass the gate. (v2Checkpoint and id-mode
    mapping were refusals until round 12 — both now read;
    test_delta_reader_features.py covers them positively.)"""
    td = str(tmp_path / "tw_table")
    log = f"{td}/_delta_log"
    os.makedirs(log)
    a = _stage_file(spark, td, "f0.parquet", 0, 10, 0)
    _commit(
        log, 0,
        [_protocol(mrv=3, reader_features=["typeWidening"]), _meta([]), a],
    )
    with pytest.raises(ValueError, match="typeWidening"):
        read_delta(spark, td)

    td2 = str(tmp_path / "cmid_table")
    log2 = f"{td2}/_delta_log"
    os.makedirs(log2)
    a2 = _stage_file(spark, td2, "f0.parquet", 0, 10, 0)
    _commit(
        log2, 0,
        [
            _protocol(mrv=2),
            _meta([], configuration={"delta.columnMapping.mode": "bogus"}),
            a2,
        ],
    )
    with pytest.raises(ValueError, match="'name' and 'id'"):
        read_delta(spark, td2)

    td3 = str(tmp_path / "future_table")
    log3 = f"{td3}/_delta_log"
    os.makedirs(log3)
    a3 = _stage_file(spark, td3, "f0.parquet", 0, 10, 0)
    _commit(log3, 0, [_protocol(mrv=4, reader_features=["deletionVectors"]), _meta([]), a3])
    with pytest.raises(ValueError, match="minReaderVersion 4"):
        read_delta(spark, td3)

    # a SUPPORTED v3 feature set passes the gate even when declared
    td4 = str(tmp_path / "ok_table")
    log4 = f"{td4}/_delta_log"
    os.makedirs(log4)
    a4 = _stage_file(spark, td4, "f0.parquet", 0, 10, 0)
    _commit(
        log4, 0,
        [
            _protocol(mrv=3, reader_features=["deletionVectors", "timestampNtz"]),
            _meta(["part"]),
            a4,
        ],
    )
    assert read_delta(spark, td4).count() == 10

    with pytest.raises(FileNotFoundError, match="_delta_log"):
        read_delta(spark, str(tmp_path / "not_delta"))


def test_unpartitioned_and_empty(spark, tmp_path):
    td = str(tmp_path / "flat")
    log = f"{td}/_delta_log"
    os.makedirs(log)
    a = _stage_file(spark, td, "f0.parquet", 0, 50, 0)
    schema2 = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "long", "nullable": True, "metadata": {}},
            ],
        }
    )
    meta2 = {
        "metaData": {
            "id": "flat",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema2,
            "partitionColumns": [],
            "configuration": {},
        }
    }
    a["add"]["partitionValues"] = {}
    _commit(log, 0, [_protocol(), meta2, a])
    df = read_delta(spark, td)
    assert df.columns == ["id", "v"]
    got = {(r.id, r.v) for r in df.collect()}
    assert got == {(i, i * 10) for i in range(50)}

    _commit(log, 1, [{"remove": {"path": "f0.parquet", "dataChange": True}}])
    empty = read_delta(spark, td)
    assert empty.count() == 0
    assert empty.columns == ["id", "v"]


def test_schema_evolution_and_encoded_paths(spark, tmp_path):
    """Files written before a metadata-only ADD COLUMN must read the
    new column as NULL (declared-schema scan, never footer inference),
    and add.path is RFC 2396 URL-decoded before touching the
    filesystem."""
    td = str(tmp_path / "evolve")
    log = f"{td}/_delta_log"
    os.makedirs(log)
    schema_v0 = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )
    schema_v1 = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "w", "type": "long", "nullable": True, "metadata": {}},
            ],
        }
    )

    def meta(sch):
        return {
            "metaData": {
                "id": "ev",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": sch,
                "partitionColumns": [],
                "configuration": {},
            }
        }

    # old file: id only, under a DIRECTORY WITH A SPACE (the log
    # records the URL-encoded form)
    tmp = f"{td}/_t1"
    spark.range(5).coalesce(1).write.mode("overwrite").parquet(tmp)
    src = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
    os.makedirs(f"{td}/dir a", exist_ok=True)
    os.replace(f"{tmp}/{src}", f"{td}/dir a/old.parquet")
    _commit(
        log, 0,
        [
            _protocol(),
            meta(schema_v0),
            {"add": {"path": "dir%20a/old.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ],
    )
    # ADD COLUMN w (metadata only), then a new file carrying both
    tmp2 = f"{td}/_t2"
    spark.range(5, 8).selectExpr("id", "id * 2 AS w").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp2)
    src2 = next(n for n in os.listdir(tmp2) if n.endswith(".parquet"))
    os.replace(f"{tmp2}/{src2}", f"{td}/new.parquet")
    _commit(
        log, 1,
        [
            meta(schema_v1),
            {"add": {"path": "new.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0, "dataChange": True}},
        ],
    )
    df = read_delta(spark, td)
    got = {(r.id, r.w) for r in df.collect()}
    assert got == {(i, None) for i in range(5)} | {(i, i * 2) for i in (5, 6, 7)}


def test_contiguity_refusal(spark, delta_table):
    """Retention-cleaned commits below a missing/unsupported checkpoint
    must refuse loudly, never return a silently partial snapshot."""
    os.remove(f"{delta_table}/_delta_log/{1:020d}.json")
    with pytest.raises(FileNotFoundError, match="commits \\[1\\]"):
        read_delta(spark, delta_table)
