"""Iceberg reader (sources/iceberg.py): spec-synthesized tables —
metadata JSON + manifest-list/manifest Avro built with the from-
scratch codec (tests/test_avro.py pins its byte fidelity), parquet
data files with ARBITRARY column names matched by field id — read
back through read_iceberg: snapshots, time travel, add-column null
backfill, v2 position deletes and equality deletes with the spec's
sequence-number application rules, loud refusals."""

from __future__ import annotations

import json
import os
import uuid

import pytest

from fp_data_lakehouse_spark.sources.avro import write_avro_file
from fp_data_lakehouse_spark.sources.iceberg import (
    iceberg_snapshot,
    read_iceberg,
)

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}

_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {"name": "sequence_number", "type": ["null", "long"], "default": None},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {
                        "name": "equality_ids",
                        "type": ["null", {"type": "array", "items": "int"}],
                        "default": None,
                    },
                ],
            },
        },
    ],
}


def _stage_ids(spark, td, name, rows_df, cols_with_ids):
    """Write ONE parquet file under arbitrary PHYSICAL column names
    annotated with parquet field ids."""
    import shutil

    from pyspark.sql import functions as F

    tmp = f"{td}/_tmp_{uuid.uuid4().hex[:6]}"
    exprs = [
        F.col(src).alias(phys, metadata={"parquet.field.id": fid})
        for src, phys, fid in cols_with_ids
    ]
    rows_df.select(*exprs).coalesce(1).write.mode("overwrite").parquet(tmp)
    src_f = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
    os.makedirs(f"{td}/data", exist_ok=True)
    os.replace(f"{tmp}/{src_f}", f"{td}/data/{name}")
    shutil.rmtree(tmp)
    return f"{td}/data/{name}"


def _manifest(td, name, entries):
    blob = write_avro_file(_MANIFEST_SCHEMA, entries)
    os.makedirs(f"{td}/metadata", exist_ok=True)
    p = f"{td}/metadata/{name}"
    with open(p, "wb") as f:
        f.write(blob)
    return p


def _manifest_list(td, name, manifests):
    blob = write_avro_file(_MANIFEST_LIST_SCHEMA, manifests)
    p = f"{td}/metadata/{name}"
    with open(p, "wb") as f:
        f.write(blob)
    return p


def _entry(path, seq=None, content=0, status=1, record_count=10,
           equality_ids=None):
    return {
        "status": status,
        "snapshot_id": None,
        "sequence_number": seq,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "record_count": record_count,
            "file_size_in_bytes": os.path.getsize(path),
            "equality_ids": equality_ids,
        },
    }


def _mf(path, seq, content=0):
    return {
        "manifest_path": path,
        "manifest_length": os.path.getsize(path),
        "partition_spec_id": 0,
        "content": content,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": 100,
    }


_SCHEMA_FIELDS = [
    {"id": 1, "name": "id", "required": False, "type": "long"},
    {"id": 2, "name": "v", "required": False, "type": "long"},
    {"id": 9, "name": "added_later", "required": False, "type": "long"},
]


def _metadata(td, snapshots, current, fv=2, schema_fields=None):
    meta = {
        "format-version": fv,
        "table-uuid": str(uuid.uuid4()),
        "location": td,
        "last-sequence-number": 99,
        "last-updated-ms": 1700000000000,
        "last-column-id": 9,
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": schema_fields or _SCHEMA_FIELDS,
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "current-snapshot-id": current,
        "snapshots": snapshots,
        "snapshot-log": [
            {"snapshot-id": s["snapshot-id"], "timestamp-ms": s["timestamp-ms"]}
            for s in snapshots
        ],
    }
    os.makedirs(f"{td}/metadata", exist_ok=True)
    with open(f"{td}/metadata/v{len(snapshots)}.metadata.json", "w") as f:
        json.dump(meta, f)


def test_read_iceberg_field_ids_and_time_travel(spark, tmp_path):
    """Data files carry ARBITRARY physical names; the scan matches by
    field id; a schema field present in no file reads NULL; snapshot
    time travel + as_of through the snapshot-log."""
    td = str(tmp_path / "t")
    f1 = _stage_ids(
        spark, td, "f1.parquet",
        spark.range(0, 10).selectExpr("id", "id * 2 AS v"),
        [("id", "weird-a", 1), ("v", "weird-b", 2)],
    )
    f2 = _stage_ids(
        spark, td, "f2.parquet",
        spark.range(10, 20).selectExpr("id", "id * 2 AS v"),
        [("id", "other-x", 1), ("v", "other-y", 2)],
    )
    m1 = _manifest(td, "m1.avro", [_entry(f1, seq=1)])
    m2 = _manifest(td, "m2.avro", [_entry(f2, seq=2)])
    ml1 = _manifest_list(td, "snap-100.avro", [_mf(m1, 1)])
    ml2 = _manifest_list(td, "snap-200.avro", [_mf(m1, 1), _mf(m2, 2)])
    snapshots = [
        {"snapshot-id": 100, "timestamp-ms": 1700000001000,
         "manifest-list": ml1, "schema-id": 0,
         "summary": {"operation": "append"}},
        {"snapshot-id": 200, "timestamp-ms": 1700000002000,
         "manifest-list": ml2, "schema-id": 0,
         "summary": {"operation": "append"}},
    ]
    _metadata(td, snapshots, current=200)

    cur = read_iceberg(spark, td)
    got = {(r.id, r.v, r.added_later) for r in cur.collect()}
    assert got == {(i, i * 2, None) for i in range(20)}
    assert cur.columns == ["id", "v", "added_later"]

    old = read_iceberg(spark, td, snapshot_id=100)
    assert {r.id for r in old.collect()} == set(range(10))

    # as_of: epoch seconds between the two snapshot timestamps
    asof = read_iceberg(spark, td, as_of=1700000001.5)
    assert {r.id for r in asof.collect()} == set(range(10))
    with pytest.raises(FileNotFoundError, match="at or before"):
        read_iceberg(spark, td, as_of=1600000000)


def test_position_deletes_sequence_rules(spark, tmp_path):
    """A position delete applies to data files with seq <= its own:
    rows deleted from the seq-1 file; a seq-3 data file re-adding the
    same positions is untouched by the seq-2 delete."""
    td = str(tmp_path / "t")
    f1 = _stage_ids(
        spark, td, "f1.parquet",
        spark.range(0, 10).selectExpr("id", "id * 2 AS v"),
        [("id", "a", 1), ("v", "b", 2)],
    )
    f3 = _stage_ids(
        spark, td, "f3.parquet",
        spark.range(0, 3).selectExpr("id + 100 AS id", "id AS v"),
        [("id", "a", 1), ("v", "b", 2)],
    )
    # position delete file: kill positions 0..4 of f1
    pd = _stage_ids(
        spark, td, "pd.parquet",
        spark.range(0, 5).selectExpr(
            f"'{f1}' AS fp", "id AS pos"
        ),
        [("fp", "file_path", 2147483546), ("pos", "pos", 2147483545)],
    )
    m_data = _manifest(
        td, "md.avro", [_entry(f1, seq=1), _entry(f3, seq=3)]
    )
    m_del = _manifest(td, "mdel.avro", [_entry(pd, seq=2, content=1)])
    ml = _manifest_list(
        td, "snap-100.avro", [_mf(m_data, 1), _mf(m_del, 2, content=1)]
    )
    _metadata(td, [{"snapshot-id": 100, "timestamp-ms": 1700000001000,
                    "manifest-list": ml, "schema-id": 0,
                    "summary": {"operation": "delete"}}], current=100)

    got = {r.id for r in read_iceberg(spark, td).collect()}
    assert got == set(range(5, 10)) | {100, 101, 102}

    snap = iceberg_snapshot(td)
    assert len(snap["data_files"]) == 2
    assert len(snap["position_deletes"]) == 1


def test_equality_deletes_strict_sequence(spark, tmp_path):
    """An equality delete applies only to data files with seq STRICTLY
    below its own: ids deleted from the seq-1 file survive in the
    seq-5 file (the re-insert pattern equality deletes exist for)."""
    td = str(tmp_path / "t")
    f1 = _stage_ids(
        spark, td, "f1.parquet",
        spark.range(0, 10).selectExpr("id", "id * 2 AS v"),
        [("id", "a", 1), ("v", "b", 2)],
    )
    f5 = _stage_ids(
        spark, td, "f5.parquet",
        spark.range(3, 6).selectExpr("id", "id * 7 AS v"),
        [("id", "a", 1), ("v", "b", 2)],
    )
    eq = _stage_ids(
        spark, td, "eq.parquet",
        spark.range(3, 6).selectExpr("id"),
        [("id", "whatever", 1)],
    )
    m_data = _manifest(td, "md.avro", [_entry(f1, seq=1), _entry(f5, seq=5)])
    m_del = _manifest(
        td, "mdel.avro",
        [_entry(eq, seq=4, content=2, equality_ids=[1])],
    )
    ml = _manifest_list(
        td, "snap-100.avro", [_mf(m_data, 1), _mf(m_del, 4, content=1)]
    )
    _metadata(td, [{"snapshot-id": 100, "timestamp-ms": 1700000001000,
                    "manifest-list": ml, "schema-id": 0,
                    "summary": {"operation": "overwrite"}}], current=100)

    got = {(r.id, r.v) for r in read_iceberg(spark, td).collect()}
    # seq-1 rows with id 3..5 die (1 < 4); seq-5 re-inserts survive
    assert got == {(i, i * 2) for i in range(10) if i not in (3, 4, 5)} | {
        (i, i * 7) for i in (3, 4, 5)
    }


def test_refusals_and_vacuumed_entries(spark, tmp_path):
    td = str(tmp_path / "t")
    f1 = _stage_ids(
        spark, td, "f1.parquet",
        spark.range(3).selectExpr("id", "id AS v"),
        [("id", "a", 1), ("v", "b", 2)],
    )
    # a DELETED-status entry (status 2) must be ignored
    m = _manifest(
        td, "m.avro",
        [_entry(f1, seq=1), _entry(f1, seq=1, status=2)],
    )
    ml = _manifest_list(td, "snap-100.avro", [_mf(m, 1)])
    _metadata(td, [{"snapshot-id": 100, "timestamp-ms": 1,
                    "manifest-list": ml, "schema-id": 0,
                    "summary": {}}], current=100)
    assert read_iceberg(spark, td).count() == 3

    # format-version 3 refused
    td3 = str(tmp_path / "t3")
    os.makedirs(f"{td3}/metadata")
    with open(f"{td3}/metadata/v1.metadata.json", "w") as f:
        json.dump({"format-version": 3}, f)
    with pytest.raises(ValueError, match="format-version"):
        read_iceberg(spark, td3)

    # ORC data files refused
    m_orc = _manifest(td, "morc.avro", [
        {**_entry(f1, seq=1),
         "data_file": {**_entry(f1, seq=1)["data_file"],
                       "file_format": "ORC"}}
    ])
    ml2 = _manifest_list(td, "snap-200.avro", [_mf(m_orc, 1)])
    _metadata(td, [{"snapshot-id": 200, "timestamp-ms": 2,
                    "manifest-list": ml2, "schema-id": 0,
                    "summary": {}}], current=200)
    with pytest.raises(ValueError, match="ORC"):
        read_iceberg(spark, td).count()


def test_unknown_snapshot_and_missing_metadata(spark, tmp_path):
    td = str(tmp_path / "nope")
    os.makedirs(f"{td}/metadata")
    with pytest.raises(FileNotFoundError, match="metadata.json"):
        read_iceberg(spark, td)

def test_gzip_metadata_json(spark, tmp_path):
    """The NNNNN-uuid.gz.metadata.json form is gunzipped before JSON
    decoding (previously selected as current but handed raw gzip bytes
    to json.loads)."""
    import gzip

    td = str(tmp_path / "t")
    f1 = _stage_ids(
        spark, td, "f1.parquet",
        spark.range(0, 4).selectExpr("id", "id * 2 AS v"),
        [("id", "a", 1), ("v", "b", 2)],
    )
    m1 = _manifest(td, "m1.avro", [_entry(f1, seq=1)])
    ml1 = _manifest_list(td, "snap-100.avro", [_mf(m1, 1)])
    snapshots = [
        {"snapshot-id": 100, "timestamp-ms": 1700000001000,
         "manifest-list": ml1, "schema-id": 0,
         "summary": {"operation": "append"}},
    ]
    meta = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": td,
        "last-sequence-number": 99,
        "last-updated-ms": 1700000000000,
        "last-column-id": 9,
        "schemas": [{"schema-id": 0, "type": "struct",
                     "fields": _SCHEMA_FIELDS}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "current-snapshot-id": 100,
        "snapshots": snapshots,
        "snapshot-log": [{"snapshot-id": 100,
                          "timestamp-ms": 1700000001000}],
    }
    name = f"00001-{uuid.uuid4()}.gz.metadata.json"
    with open(f"{td}/metadata/{name}", "wb") as f:
        f.write(gzip.compress(json.dumps(meta).encode("utf-8")))
    got = {(r.id, r.v) for r in read_iceberg(spark, td).collect()}
    assert got == {(i, i * 2) for i in range(4)}


def test_existing_entry_null_seq_refused_v2(spark, tmp_path):
    """Per the v2 spec only ADDED (status=1) entries inherit the
    manifest's sequence number; an EXISTING (status=0) entry with a
    null seq is malformed and refused instead of silently inheriting
    the newer manifest's seq (which would change delete application)."""
    td = str(tmp_path / "t")
    f1 = _stage_ids(
        spark, td, "f1.parquet",
        spark.range(3).selectExpr("id", "id AS v"),
        [("id", "a", 1), ("v", "b", 2)],
    )
    m = _manifest(td, "m.avro", [_entry(f1, seq=None, status=0)])
    ml = _manifest_list(td, "snap-100.avro", [_mf(m, 7)])
    _metadata(td, [{"snapshot-id": 100, "timestamp-ms": 1,
                    "manifest-list": ml, "schema-id": 0,
                    "summary": {}}], current=100)
    with pytest.raises(ValueError, match="status=0"):
        read_iceberg(spark, td)

    # status=1 with null seq still inherits (the spec's intended path)
    td2 = str(tmp_path / "t2")
    f2 = _stage_ids(
        spark, td2, "f1.parquet",
        spark.range(3).selectExpr("id", "id AS v"),
        [("id", "a", 1), ("v", "b", 2)],
    )
    m2 = _manifest(td2, "m.avro", [_entry(f2, seq=None, status=1)])
    ml2 = _manifest_list(td2, "snap-100.avro", [_mf(m2, 7)])
    _metadata(td2, [{"snapshot-id": 100, "timestamp-ms": 1,
                     "manifest-list": ml2, "schema-id": 0,
                     "summary": {}}], current=100)
    snap = iceberg_snapshot(td2)
    assert [d["seq"] for d in snap["data_files"]] == [7]


def test_basename_collision_refused(spark, tmp_path):
    """Two DISTINCT data files sharing a basename are refused even at
    EQUAL sequence numbers — both would alias under the basename join
    key and position deletes against one would hit the other."""
    import shutil

    td = str(tmp_path / "t")
    f1 = _stage_ids(
        spark, td, "f1.parquet",
        spark.range(3).selectExpr("id", "id AS v"),
        [("id", "a", 1), ("v", "b", 2)],
    )
    os.makedirs(f"{td}/data2")
    f1b = f"{td}/data2/f1.parquet"
    shutil.copy(f1, f1b)
    m = _manifest(td, "m.avro", [_entry(f1, seq=1), _entry(f1b, seq=1)])
    ml = _manifest_list(td, "snap-100.avro", [_mf(m, 1)])
    _metadata(td, [{"snapshot-id": 100, "timestamp-ms": 1,
                    "manifest-list": ml, "schema-id": 0,
                    "summary": {}}], current=100)
    with pytest.raises(ValueError, match="basename collision"):
        read_iceberg(spark, td)
