"""Iceberg-interop driver certificates (round 13): the spec-
implemented Iceberg reader (sources/iceberg.py) on the driver's hard
signal — a table SYNTHESIZED per the public Iceberg v2 spec over the
sf_dir's own ``orders`` rows (metadata JSON + manifest-list/manifest
Avro via the from-scratch codec in sources/avro.py, parquet data
files under ARBITRARY physical column names matched by field id),
then read back through ``read_iceberg`` and aggregated; the oracle
reconstructs the expected state from the base parquet — DuckDB never
sees Iceberg metadata (the dl01/et08 pattern).

il01 certifies snapshot reads + time travel; il02 certifies v2
merge-on-read row-level deletes — position deletes and equality
deletes under the spec's sequence-number application rules.

Scale notes live on read_iceberg: metadata replay is driver-side and
KB-sized; the scan is ONE field-id-resolved parquet read + a
broadcast (file -> sequence) tag + one anti-join per delete shape.

Reference parity: the reference ingests external tables by full MySQL
SELECT (ETL_FINAL.py:38); this is that seam pointed at the second
open lakehouse format, SURVEY.md §2.6 extension tier.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.avro import write_avro_file
from ..sources.sinks import alloc_scratch
from .deltaquery import _cust_totals
from .registry import register

_ML_SCHEMA = {
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

_M_SCHEMA = {
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

_FIELDS = [
    {"id": 1, "name": "o_custkey", "required": False, "type": "long"},
    {"id": 2, "name": "cents", "required": False, "type": "long"},
]


def _stage_ids(df: DataFrame, td: str, name: str, phys: list[tuple]) -> str:
    """ONE sorted parquet file under arbitrary physical names + field
    ids (sorted by o_custkey so row POSITIONS are deterministic — the
    position-delete fixture targets reproducible rows)."""
    import shutil

    tmp = f"{td}/_tmp_{uuid.uuid4().hex[:6]}"
    exprs = [
        F.col(src).alias(p, metadata={"parquet.field.id": fid})
        for src, p, fid in phys
    ]
    (
        df.repartition(1)
        .sortWithinPartitions(phys[0][0])
        .select(*exprs)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    src_f = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
    os.makedirs(f"{td}/data", exist_ok=True)
    os.replace(f"{tmp}/{src_f}", f"{td}/data/{name}")
    shutil.rmtree(tmp)
    return f"{td}/data/{name}"


def _entry(path, seq, content=0, equality_ids=None):
    return {
        "status": 1,
        "snapshot_id": None,
        "sequence_number": seq,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "record_count": 0,
            "file_size_in_bytes": os.path.getsize(path),
            "equality_ids": equality_ids,
        },
    }


def _write_avro(td, name, schema, records) -> str:
    os.makedirs(f"{td}/metadata", exist_ok=True)
    p = f"{td}/metadata/{name}"
    with open(p, "wb") as f:
        f.write(write_avro_file(schema, records))
    return p


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


def _metadata(td, snapshots, current):
    meta = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": td,
        "last-sequence-number": 99,
        "last-updated-ms": 1700000000000,
        "last-column-id": 2,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": _FIELDS}],
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
    with open(f"{td}/metadata/v{len(snapshots)}.metadata.json", "w") as f:
        json.dump(meta, f)


_IL01_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(o_custkey % 2 AS INT) AS bucket,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
)
SELECT CAST(1 AS INT) AS ver,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM t WHERE bucket = 0
UNION ALL
SELECT CAST(2 AS INT), CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
FROM t
"""


@register("il01_iceberg_snapshot_read", oracle=_IL01_SQL)
def il01_iceberg_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICEBERG interop IN (round 13): customer totals land as two
    parquet files under OPAQUE physical column names (field-id
    matching is Iceberg's core contract — file names are never
    consulted), a two-snapshot v2 metadata tree is synthesized per the
    public spec (metadata JSON, manifest-list + manifest Avro via the
    from-scratch codec), and ``read_iceberg`` serves the head while
    ``as_of`` time-travels to the first snapshot through the
    snapshot-log. Censuses oracle-pinned per snapshot."""
    from ..sources.iceberg import read_iceberg

    td = alloc_scratch(spark, "il01_iceberg") + "/t"
    totals = _cust_totals(spark, sf_dir)
    f1 = _stage_ids(
        totals.where(F.col("o_custkey") % 2 == 0), td, "f1.parquet",
        [("o_custkey", "c-x1", 1), ("cents", "c-x2", 2)],
    )
    f2 = _stage_ids(
        totals.where(F.col("o_custkey") % 2 == 1), td, "f2.parquet",
        [("o_custkey", "c-y1", 1), ("cents", "c-y2", 2)],
    )
    m1 = _write_avro(td, "m1.avro", _M_SCHEMA, [_entry(f1, 1)])
    m2 = _write_avro(td, "m2.avro", _M_SCHEMA, [_entry(f2, 2)])
    ml1 = _write_avro(td, "snap-100.avro", _ML_SCHEMA, [_mf(m1, 1)])
    ml2 = _write_avro(
        td, "snap-200.avro", _ML_SCHEMA, [_mf(m1, 1), _mf(m2, 2)]
    )
    _metadata(
        td,
        [
            {"snapshot-id": 100, "timestamp-ms": 1700000001000,
             "manifest-list": ml1, "schema-id": 0,
             "summary": {"operation": "append"}},
            {"snapshot-id": 200, "timestamp-ms": 1700000002000,
             "manifest-list": ml2, "schema-id": 0,
             "summary": {"operation": "append"}},
        ],
        current=200,
    )

    def _census(df: DataFrame, ver: int) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("cents").alias("sum_cents"),
        ).select(F.lit(ver).cast("int").alias("ver"), "n_cust", "sum_cents")

    v1 = _census(read_iceberg(spark, td, as_of=1700000001.5), 1)
    head = _census(read_iceberg(spark, td), 2)
    return v1.unionByName(head)


_IL02_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
),
ranked AS (
    SELECT o_custkey, cents,
           ROW_NUMBER() OVER (ORDER BY o_custkey) - 1 AS rn
    FROM t
),
f1_live AS (
    SELECT o_custkey, cents FROM ranked
    WHERE rn >= 100 AND o_custkey % 7 <> 0
),
f2 AS (
    SELECT o_custkey, cents + 1 AS cents FROM t WHERE o_custkey % 7 = 0
),
u AS (SELECT * FROM f1_live UNION ALL SELECT * FROM f2)
SELECT CAST(o_custkey % 3 AS INT) AS grp,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM u GROUP BY grp
"""


@register("il02_iceberg_row_deletes", oracle=_IL02_SQL)
def il02_iceberg_row_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICEBERG v2 merge-on-read ROW-LEVEL DELETES (round 13): the base
    file (seq 1, custkey-sorted so positions are deterministic) takes
    a POSITION delete (seq 2) killing its first 100 rows AND an
    EQUALITY delete (seq 2, equality_ids=[o_custkey]) killing every
    7th customer; a seq-3 file RE-INSERTS those customers with
    adjusted cents and must be untouched (equality deletes apply
    STRICTLY below their sequence number, position deletes at-or-
    below — the spec's application rules, both certified here). The
    oracle reconstructs the survivor census with a ROW_NUMBER mirror
    of the positional kill."""
    from ..sources.iceberg import read_iceberg

    td = alloc_scratch(spark, "il02_iceberg") + "/t"
    totals = _cust_totals(spark, sf_dir)
    f1 = _stage_ids(
        totals, td, "f1.parquet",
        [("o_custkey", "a-1", 1), ("cents", "a-2", 2)],
    )
    f3 = _stage_ids(
        totals.where(F.col("o_custkey") % 7 == 0).select(
            "o_custkey", (F.col("cents") + 1).alias("cents")
        ),
        td, "f3.parquet",
        [("o_custkey", "b-1", 1), ("cents", "b-2", 2)],
    )
    pos_del = _stage_ids(
        spark.range(0, 100).select(
            F.lit(f1).alias("fp"), F.col("id").alias("p")
        ),
        td, "pd.parquet",
        [("fp", "file_path", 2147483546), ("p", "pos", 2147483545)],
    )
    eq_del = _stage_ids(
        totals.where(F.col("o_custkey") % 7 == 0).select("o_custkey"),
        td, "eq.parquet",
        [("o_custkey", "any-name", 1)],
    )
    m_data = _write_avro(
        td, "md.avro", _M_SCHEMA, [_entry(f1, 1), _entry(f3, 3)]
    )
    m_del = _write_avro(
        td, "mdel.avro", _M_SCHEMA,
        [_entry(pos_del, 2, content=1),
         _entry(eq_del, 2, content=2, equality_ids=[1])],
    )
    ml = _write_avro(
        td, "snap-100.avro", _ML_SCHEMA,
        [_mf(m_data, 1), _mf(m_del, 2, content=1)],
    )
    _metadata(
        td,
        [{"snapshot-id": 100, "timestamp-ms": 1700000001000,
          "manifest-list": ml, "schema-id": 0,
          "summary": {"operation": "overwrite"}}],
        current=100,
    )

    back = read_iceberg(spark, td)
    return (
        back.groupBy((F.col("o_custkey") % 3).cast("int").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("cents").alias("sum_cents"),
        )
    )
