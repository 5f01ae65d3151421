"""Delta-interop driver certificates (round 11): the spec-implemented
Delta log reader (sources/delta.py) exercised on the driver's hard
signal — a transaction log SYNTHESIZED per the public protocol spec
over the sf_dir's own ``orders`` rows (the et08 pattern: the oracle
reconstructs the expected state from the base parquet; DuckDB never
sees a log), then read back through ``read_delta`` and aggregated.

dl01 certifies the base replay (adds/removes, log-borne partition
values, time travel); dl02 certifies deletion vectors (real
RoaringBitmapArray ``.bin`` bitmaps, executor-side decode, positional
anti-join); dl03 certifies name-mode column mapping composed with a
MULTI-PART checkpoint seeding replay after commit retention.

Synthesis is driver-local file plumbing (the test-fixture half);
the certified product surface is the READ path. Scale notes live on
read_delta itself: one scan of the live file set + one broadcast
partition-value join + a size-gated DV anti-join; log replay is
metadata-sized by construction.

Reference parity: the reference ingests external tables by full MySQL
SELECT (ETL_FINAL.py:38); these certify the same ingestion seam
pointed at the lakehouse format third-party engines write.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from ..sources.sinks import alloc_scratch
from .registry import register


def _cust_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_custkey, cents) — io13's exact-cents aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return orders.groupBy("o_custkey").agg(F.sum(cents).alias("cents"))


def _stage_bucket_files(
    totals: DataFrame, td: str, n_buckets: int, cols: list[str] | None = None
) -> list[str]:
    """One sorted parquet file per (o_custkey % n_buckets) bucket under
    ``td`` — scratch synthesis (driver-local), returns file names in
    bucket order. ONE partitioned write stages every bucket (the
    per-bucket filter+coalesce loop cost N full scans and dominated
    dl03's bench line); repartitioning on the bucket key pins each
    bucket to exactly one task = exactly one file per directory, and
    the (bucket, key) sort makes row POSITIONS deterministic, so
    dl02's deletion vectors target reproducible rows. The partitionBy
    writer drops the bucket column from the files — exactly the
    Delta partition contract dl01 certifies."""
    import shutil

    key = cols[0] if cols else "o_custkey"
    df = totals.withColumn(
        "__b", (F.col("o_custkey") % n_buckets).cast("int")
    )
    if cols:
        df = df.select(
            *[F.col(c).alias(a) for c, a in zip(["o_custkey", "cents"], cols)], "__b"
        )
    stage = f"{td}/_stage_{uuid.uuid4().hex[:8]}"
    (
        df.repartition(n_buckets, "__b")
        .sortWithinPartitions("__b", key)
        .write.partitionBy("__b")
        .mode("overwrite")
        .parquet(stage)
    )
    names = []
    for b in range(n_buckets):
        d = f"{stage}/__b={b}"
        srcs = [n for n in os.listdir(d) if n.endswith(".parquet")]
        assert len(srcs) == 1, f"bucket {b} staged {len(srcs)} files"
        name = f"b{b}.parquet"
        os.replace(f"{d}/{srcs[0]}", f"{td}/{name}")
        names.append(name)
    shutil.rmtree(stage)
    return names


def _commit(log_dir: str, v: int, actions: list[dict]) -> None:
    os.makedirs(log_dir, exist_ok=True)
    with open(f"{log_dir}/{v:020d}.json", "w", encoding="utf-8") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _add(td: str, name: str, pv: dict | None = None, dv: dict | None = None) -> dict:
    a = {
        "path": name,
        "partitionValues": pv or {},
        "size": os.path.getsize(f"{td}/{name}"),
        "modificationTime": 0,
        "dataChange": True,
    }
    if dv:
        a["deletionVector"] = dv
    return {"add": a}


_SCHEMA_PLAIN = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "o_custkey", "type": "long", "nullable": True, "metadata": {}},
            {"name": "cents", "type": "long", "nullable": True, "metadata": {}},
        ],
    }
)


def _meta(schema: str, partition_cols: list[str], configuration: dict | None = None) -> dict:
    return {
        "metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema,
            "partitionColumns": partition_cols,
            "configuration": configuration or {},
        }
    }


# ---------------------------------------------------------------------------
# dl01: base replay + log-borne partition values + time travel
# ---------------------------------------------------------------------------

_DL01_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(o_custkey % 4 AS INT) AS bucket,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
),
b AS (
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM t GROUP BY bucket
)
SELECT CAST(0 AS INT) AS ver, bucket, n_cust, sum_cents FROM b
UNION ALL
SELECT CAST(1 AS INT) AS ver, bucket, n_cust, sum_cents FROM b WHERE bucket <> 0
"""


@register("dl01_delta_log_read", oracle=_DL01_SQL)
def dl01_delta_log_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta interop IN on the driver's hard signal: customer totals
    land as 4 parquet files WITHOUT their partition column (``bucket``
    lives only in each add's ``partitionValues``, Delta's hive-less
    contract), a 2-commit log is synthesized per the protocol spec
    (v0 adds all buckets; v1 removes bucket 0's file), and
    ``read_delta`` serves BOTH versions — the partition column joined
    back from the log, typed from the declared schema, time travel by
    log replay. The oracle rebuilds both snapshots from ``orders``
    directly; a hash match certifies replay, partition-value
    injection, and removal semantics in one row.

    Scale: the read is one scan of the live files + ONE broadcast join
    on the file name (plan fan-out independent of partition count);
    replay is O(log segment). SURVEY §2.6 interop tier."""
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "o_custkey", "type": "long", "nullable": True, "metadata": {}},
                {"name": "cents", "type": "long", "nullable": True, "metadata": {}},
                {"name": "bucket", "type": "integer", "nullable": True, "metadata": {}},
            ],
        }
    )
    td = alloc_scratch(spark, "dl01_delta") + "/t"
    os.makedirs(td, exist_ok=True)
    names = _stage_bucket_files(_cust_totals(spark, sf_dir), td, 4)
    log = f"{td}/_delta_log"
    _commit(
        log, 0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(schema, ["bucket"]),
            *[_add(td, n, pv={"bucket": str(b)}) for b, n in enumerate(names)],
        ],
    )
    _commit(log, 1, [{"remove": {"path": names[0], "dataChange": True}}])

    from ..sources.delta import read_delta

    legs = []
    for ver in (0, 1):
        df = read_delta(spark, td, version=ver)
        legs.append(
            df.groupBy("bucket").agg(
                F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("sum_cents")
            ).select(F.lit(ver).cast("int").alias("ver"), "bucket", "n_cust", "sum_cents")
        )
    return legs[0].unionByName(legs[1])


# ---------------------------------------------------------------------------
# dl02: deletion vectors — real spec bitmaps, executor-side decode
# ---------------------------------------------------------------------------

_DL02_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
)
SELECT CAST(0 AS INT) AS ver,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM t
UNION ALL
SELECT CAST(1 AS INT),
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(cents) AS BIGINT)
FROM t WHERE o_custkey % 10 <> 0
"""


@register("dl02_delta_deletion_vectors", oracle=_DL02_SQL)
def dl02_delta_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta DELETION VECTORS end-to-end on the driver's hard signal:
    v1 attaches a REAL RoaringBitmapArray ``.bin`` (sources/roaring.py,
    spec framing: version byte, per-entry size/CRC, Z85 'u'-storage
    uuid path) masking every row whose o_custkey % 10 == 0 — positions
    derived from the staged files' actual ``_metadata.row_index``, all
    four files' masks at offsets in ONE shared .bin. ``read_delta``
    decodes the bitmaps EXECUTOR-side (binaryFile + Arrow expansion)
    and applies the size-gated positional anti-join; the oracle filters
    ``orders`` directly. v0 (pre-DV) certifies the masks don't leak
    backward in time.

    Scale: DV bytes never touch the driver on the read path; the
    anti-join broadcast rides only under the descriptors' recorded
    cardinality bound (versioned._dv_hinted)."""
    from ..sources.delta import read_delta
    from ..sources.roaring import new_dv_file, z85_encode

    td = alloc_scratch(spark, "dl02_delta") + "/t"
    os.makedirs(td, exist_ok=True)
    names = _stage_bucket_files(_cust_totals(spark, sf_dir), td, 4)
    log = f"{td}/_delta_log"
    adds = [_add(td, n) for n in names]
    _commit(
        log, 0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"],
                }
            },
            _meta(_SCHEMA_PLAIN, []),
            *adds,
        ],
    )
    # positions of the to-be-masked rows, from the files' REAL layout
    entries = []
    for n in names:
        pos = [
            r[0]
            for r in spark.read.parquet(f"{td}/{n}")
            .select(F.col("_metadata.row_index"))
            .where(F.col("o_custkey") % 10 == 0)
            .collect()
        ]
        entries.append(sorted(int(p) for p in pos))
    blob, spans = new_dv_file(entries)
    u = uuid.uuid4()
    with open(f"{td}/deletion_vector_{u}.bin", "wb") as f:
        f.write(blob)
    dv_adds = []
    for n, positions, (off, size) in zip(names, entries, spans):
        desc = {
            "storageType": "u",
            "pathOrInlineDv": z85_encode(u.bytes),
            "offset": off,
            "sizeInBytes": size,
            "cardinality": len(positions),
        }
        dv_adds.append({"remove": {"path": n, "dataChange": False}})
        dv_adds.append(_add(td, n, dv=desc))
    _commit(log, 1, dv_adds)

    legs = []
    for ver in (0, 1):
        df = read_delta(spark, td, version=ver)
        legs.append(
            df.agg(
                F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("sum_cents")
            ).select(F.lit(ver).cast("int").alias("ver"), "n_cust", "sum_cents")
        )
    return legs[0].unionByName(legs[1])


# ---------------------------------------------------------------------------
# dl03: name-mode column mapping × multi-part checkpoint
# ---------------------------------------------------------------------------

_DL03_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(o_custkey % 3 AS INT) AS grp,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
)
SELECT grp,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM t GROUP BY grp
"""


@register("dl03_delta_mapped_checkpoint", oracle=_DL03_SQL)
def dl03_delta_mapped_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name-mode COLUMN MAPPING composed with a MULTI-PART checkpoint:
    files carry physical names (``c-1``/``c-2``); the declared schema
    maps them to logical ``o_custkey``/``cents`` via
    delta.columnMapping.physicalName metadata; a 2-part
    ``%020d.checkpoint.%010d.%010d.parquet`` (+ ``_last_checkpoint``
    pointer) is synthesized at v0 and the v0 commit is retention-
    deleted — so the read MUST seed replay from the multi-part
    checkpoint, then apply commit v1's add. The oracle aggregates
    ``orders`` directly; the hash certifies mapped projection +
    checkpoint-seeded replay in one row.

    Scale: checkpoint parts are one parquet scan regardless of part
    count; the mapped scan requests the physicalized schema (column
    pruning intact) and projects to logical names plan-side."""
    from ..sources.delta import delta_snapshot, read_delta

    logical = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "o_custkey",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "c-1",
                    },
                },
                {
                    "name": "cents",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "c-2",
                    },
                },
            ],
        }
    )
    td = alloc_scratch(spark, "dl03_delta") + "/t"
    os.makedirs(td, exist_ok=True)
    names = _stage_bucket_files(
        _cust_totals(spark, sf_dir), td, 3, cols=["c-1", "c-2"]
    )
    log = f"{td}/_delta_log"
    conf = {"delta.columnMapping.mode": "name", "delta.columnMapping.maxColumnId": "2"}
    _commit(
        log, 0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _meta(logical, [], configuration=conf),
            _add(td, names[0]),
            _add(td, names[1]),
        ],
    )
    # multi-part checkpoint at v0 (2 parts), then retention-delete v0
    snap0 = delta_snapshot(td, 0, spark=spark)
    cp_rows = [
        {"add": {"path": p, "partitionValues": {}}, "metaData": None, "protocol": None}
        for p in sorted(snap0["files"])
    ] + [
        {
            "add": None,
            "metaData": {
                "id": "cp",
                "schemaString": snap0["schema_json"],
                "partitionColumns": [],
                "configuration": dict(snap0["configuration"]),
            },
            "protocol": None,
        },
        {"add": None, "metaData": None, "protocol": {"minReaderVersion": 2}},
    ]
    cp_schema = (
        "add struct<path:string,partitionValues:map<string,string>>, "
        "metaData struct<id:string,schemaString:string,"
        "partitionColumns:array<string>,configuration:map<string,string>>, "
        "protocol struct<minReaderVersion:int>"
    )
    for part, rows in enumerate((cp_rows[:2], cp_rows[2:]), start=1):
        stage = f"{log}/_cp_stage"
        # ONE slice up front: coalesce(1) over a python-rows frame
        # would compute its defaultParallelism pickled partitions
        # SEQUENTIALLY in a single task (one Python worker launch
        # each — measured ~4 s per tiny checkpoint write)
        ordered = [tuple(r[k] for k in ("add", "metaData", "protocol")) for r in rows]
        spark.createDataFrame(
            spark.sparkContext.parallelize(ordered, 1), cp_schema
        ).write.mode("overwrite").parquet(stage)
        src = next(n for n in os.listdir(stage) if n.endswith(".parquet"))
        os.replace(
            f"{stage}/{src}", f"{log}/{0:020d}.checkpoint.{part:010d}.{2:010d}.parquet"
        )
        import shutil

        shutil.rmtree(stage)
    with open(f"{log}/_last_checkpoint", "w", encoding="utf-8") as f:
        json.dump({"version": 0, "size": len(cp_rows), "parts": 2}, f)
    _commit(log, 1, [_add(td, names[2])])
    os.remove(f"{log}/{0:020d}.json")

    df = read_delta(spark, td)  # MUST seed from the multi-part checkpoint
    return (
        df.groupBy((F.col("o_custkey") % 3).cast("int").alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("sum_cents"))
    )


# ---------------------------------------------------------------------------
# dl04: Delta table as a STREAMING SOURCE (initial snapshot + replay)
# ---------------------------------------------------------------------------

_DL04_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(o_custkey % 4 AS INT) AS bucket,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
),
b AS (
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM t GROUP BY bucket
)
SELECT 'snapshot' AS mode, CAST(2 AS INT) AS ver,
       CAST(SUM(n_cust) AS BIGINT) AS n_cust,
       CAST(SUM(sum_cents) AS BIGINT) AS sum_cents
FROM b
UNION ALL
SELECT 'replay', CAST(0 AS INT),
       CAST(SUM(n_cust) AS BIGINT), CAST(SUM(sum_cents) AS BIGINT)
FROM b WHERE bucket IN (0, 1)
UNION ALL
SELECT 'replay', CAST(1 AS INT), n_cust, sum_cents FROM b WHERE bucket = 2
UNION ALL
SELECT 'replay', CAST(2 AS INT), n_cust, sum_cents FROM b WHERE bucket = 3
"""


@register("dl04_delta_feed_stream", oracle=_DL04_SQL)
def dl04_delta_feed_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta table as a STREAMING SOURCE (sources/delta_feed.py,
    ``fp_delta_feed``) on the driver's hard signal: a 3-commit Delta
    log over customer totals is drained through REAL Structured
    Streaming queries (availableNow, parquet sink, checkpointed) in
    BOTH contract modes — the default INITIAL SNAPSHOT (one batch =
    the live snapshot at stream start, ``_commit_version`` = that
    version) and ``startingVersion=0`` replay (no snapshot; every
    appended file stamped with ITS commit version). The oracle
    rebuilds both emission sets from ``orders`` directly, so the hash
    certifies offset planning, per-commit file attribution, and the
    append-only tail in one row.

    Scale: offsets are log versions (metadata); each micro-batch plans
    only that commit's added files — the O(new data) tail the
    fp_versioned_feed already certifies, here over the ECOSYSTEM's
    format. Change commits (removes/dv) fail loudly or skip via
    skipChangeCommits per the Delta source contract (pytest-covered,
    tests/test_delta_feed.py)."""
    from ..sources.pyds import register_python_sources

    td = alloc_scratch(spark, "dl04_feed") + "/t"
    os.makedirs(td, exist_ok=True)
    names = _stage_bucket_files(_cust_totals(spark, sf_dir), td, 4)
    log = f"{td}/_delta_log"
    _commit(
        log, 0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(_SCHEMA_PLAIN, []),
            _add(td, names[0]),
            _add(td, names[1]),
        ],
    )
    _commit(log, 1, [_add(td, names[2])])
    _commit(log, 2, [_add(td, names[3])])

    register_python_sources(spark)
    work = alloc_scratch(spark, "dl04_drain")
    legs = []
    for mode, opts in (("snapshot", {}), ("replay", {"startingVersion": "0"})):
        reader = spark.readStream.format("fp_delta_feed").option("path", td)
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", f"{work}/{mode}/out")
            .option("checkpointLocation", f"{work}/{mode}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        drained = spark.read.parquet(f"{work}/{mode}/out")
        legs.append(
            drained.groupBy(F.col("_commit_version").cast("int").alias("ver"))
            .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("sum_cents"))
            .select(F.lit(mode).alias("mode"), "ver", "n_cust", "sum_cents")
        )
    return legs[0].unionByName(legs[1])
