"""Delta streaming source (sources/delta_feed.py fp_delta_feed):
initial snapshot + log tail, startingVersion replay, the append-only
gate with skipChangeCommits, deletion-vector snapshots, and flat
name-mode column mapping with typed partition-value injection —
against spec-synthesized logs (helpers shared with
tests/test_delta_reader_features.py)."""

from __future__ import annotations

import json
import pytest
from tests.test_delta_reader_features import (
    _commit,
    _dv_descriptor_u,
    _meta,
    _readd,
    _stage,
)

from fp_data_lakehouse_spark.sources.pyds import register_python_sources


def _drain(spark, td, work, options=None):
    """availableNow drain into a parquet file sink (the memory sink
    cannot RESUME from a checkpoint); returns the CUMULATIVE rows of
    the output dir. The Python micro-batch source runs availableNow as
    one batch — offsets pending at start are consumed; later commits
    need another drain on the SAME work dir (the restart-tail
    pattern), whose rows append to the same output."""
    register_python_sources(spark)
    reader = spark.readStream.format("fp_delta_feed").option("path", td)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(f"{work}/out").collect()


def _log(tmp_path, spark, n_files=2, per=10):
    td = str(tmp_path / "t")
    log = f"{td}/_delta_log"
    import os

    os.makedirs(log)
    adds = [
        _stage(spark, td, f"f{i}.parquet", i * per, (i + 1) * per)
        for i in range(n_files)
    ]
    return td, log, adds


def test_initial_snapshot_then_tail(spark, tmp_path):
    td, log, adds = _log(tmp_path, spark, n_files=2)
    _commit(log, 0, [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
                     _meta(), adds[0]])
    _commit(log, 1, [adds[1]])
    work = str(tmp_path / "w")

    rows = _drain(spark, td, work)
    # first batch = FULL snapshot at the stream-start version
    assert {(r.id, r._commit_version) for r in rows} == {
        (i, 1) for i in range(20)
    }

    # new append AFTER the first drain tails with its own version
    # (same work dir -> resume from checkpoint; output is cumulative)
    a2 = _stage(spark, td, "f2.parquet", 20, 30)
    _commit(log, 2, [a2])
    rows2 = _drain(spark, td, work)
    assert {(r.id, r._commit_version) for r in rows2} == {
        (i, 1) for i in range(20)
    } | {(i, 2) for i in range(20, 30)}


def test_starting_version_replay(spark, tmp_path):
    td, log, adds = _log(tmp_path, spark, n_files=3)
    _commit(log, 0, [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
                     _meta(), adds[0]])
    _commit(log, 1, [adds[1]])
    _commit(log, 2, [adds[2]])

    rows = _drain(spark, td, str(tmp_path / "w1"), {"startingVersion": "1"})
    # NO initial snapshot: only commits 1..2, stamped per commit
    assert {(r.id, r._commit_version) for r in rows} == {
        (i, 1) for i in range(10, 20)
    } | {(i, 2) for i in range(20, 30)}

    with pytest.raises(Exception, match="does not exist"):
        _drain(spark, td, str(tmp_path / "w2"), {"startingVersion": "9"})


def test_change_commit_gate_and_skip(spark, tmp_path):
    td, log, adds = _log(tmp_path, spark, n_files=2)
    _commit(log, 0, [{"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                                   "readerFeatures": ["deletionVectors"]}},
                     _meta(), adds[0]])
    # commit 1: a REMOVE (change commit); commit 2: a plain append
    _commit(log, 1, [{"remove": {"path": "f0.parquet", "dataChange": True}},
                     adds[1]])
    a2 = _stage(spark, td, "f2.parquet", 20, 25)
    _commit(log, 2, [a2])

    with pytest.raises(Exception, match="skipChangeCommits"):
        _drain(spark, td, str(tmp_path / "w1"), {"startingVersion": "1"})

    rows = _drain(
        spark, td, str(tmp_path / "w2"),
        {"startingVersion": "1", "skipChangeCommits": "true"},
    )
    # the change commit is skipped WHOLE (its add not emitted)
    assert {(r.id, r._commit_version) for r in rows} == {
        (i, 2) for i in range(20, 25)
    }

    # dv'd adds are change commits too
    (d0,) = _dv_descriptor_u(td, "", [[1]])
    _commit(log, 3, [_readd(a2, d0)])
    with pytest.raises(Exception, match="skipChangeCommits"):
        _drain(spark, td, str(tmp_path / "w3"), {"startingVersion": "3"})


def test_initial_snapshot_applies_dvs(spark, tmp_path):
    td, log, adds = _log(tmp_path, spark, n_files=1, per=20)
    _commit(log, 0, [{"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                                   "readerFeatures": ["deletionVectors"]}},
                     _meta(), adds[0]])
    (d0,) = _dv_descriptor_u(td, "", [[3, 4, 5]])
    _commit(log, 1, [_readd(adds[0], d0)])

    rows = _drain(spark, td, str(tmp_path / "w"))
    assert {r.id for r in rows} == set(range(20)) - {3, 4, 5}
    assert {r._commit_version for r in rows} == {1}


def test_flat_column_mapping_and_partition_values(spark, tmp_path):
    logical = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName": "p-1"}},
                {"name": "region", "type": "integer", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 2,
                              "delta.columnMapping.physicalName": "p-2"}},
                {"name": "v", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 3,
                              "delta.columnMapping.physicalName": "p-3"}},
            ],
        }
    )
    td = str(tmp_path / "t")
    log = f"{td}/_delta_log"
    import os

    os.makedirs(log)
    a0 = _stage(spark, td, "f0.parquet", 0, 15,
                exprs=("id AS `p-1`", "id * 3 AS `p-3`"))
    a0["add"]["partitionValues"] = {"p-2": "7"}  # PHYSICAL key, string value
    _commit(
        log, 0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _meta(["region"], schema=logical,
                  configuration={"delta.columnMapping.mode": "name"}),
            a0,
        ],
    )
    rows = _drain(spark, td, str(tmp_path / "w"))
    got = {(r.id, r.region, r.v, r._commit_version) for r in rows}
    assert got == {(i, 7, i * 3, 0) for i in range(15)}


def test_nested_mapped_schema_refused(spark, tmp_path):
    logical = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "nested",
                 "type": {"type": "struct", "fields": [
                     {"name": "x", "type": "long", "nullable": True,
                      "metadata": {"delta.columnMapping.id": 2,
                                   "delta.columnMapping.physicalName": "p-2"}}]},
                 "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName": "p-1"}},
            ],
        }
    )
    td = str(tmp_path / "t")
    log = f"{td}/_delta_log"
    import os

    os.makedirs(log)
    a0 = _stage(spark, td, "f0.parquet", 0, 3,
                exprs=("named_struct('p-2', id) AS `p-1`",))
    _commit(
        log, 0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _meta([], schema=logical,
                  configuration={"delta.columnMapping.mode": "name"}),
            a0,
        ],
    )
    with pytest.raises(Exception, match="FLAT"):
        _drain(spark, td, str(tmp_path / "w"))
