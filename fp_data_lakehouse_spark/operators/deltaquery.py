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
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from ..sources.sinks import alloc_scratch
from .registry import register, run_overlapped


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

    def _drain_leg(leg: tuple[str, dict]) -> DataFrame:
        """snapshot/replay legs are fully independent (own checkpoint,
        own sink dir, read-only source table) — run both concurrently
        (guide §2.6): each leg's wall is streaming start/stop round
        trips, not data, so overlapping them halves the machinery.
        Self-cleaning (run_overlapped's retry contract): the leg dir is
        reset on entry so a sequential fallback restarts from scratch."""
        mode, opts = leg
        shutil.rmtree(f"{work}/{mode}", ignore_errors=True)
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
        # The 120 s bound is a hang guard, not a completion contract: a
        # timeout must stop the query and FAIL the leg (self-cleaning
        # retry), never fall through to read a half-written sink.
        if not q.awaitTermination(120):
            q.stop()
            raise RuntimeError(f"dl04 {mode} leg did not drain within 120 s")
        drained = spark.read.parquet(f"{work}/{mode}/out")
        return (
            drained.groupBy(F.col("_commit_version").cast("int").alias("ver"))
            .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("sum_cents"))
            .select(F.lit(mode).alias("mode"), "ver", "n_cust", "sum_cents")
        )

    legs = run_overlapped(
        _drain_leg, (("snapshot", {}), ("replay", {"startingVersion": "0"})), 2,
        spark=spark,
    )
    return legs[0].unionByName(legs[1])


# ---------------------------------------------------------------------------
# dl05: admission control — maxFilesPerTrigger over snapshot AND tail
# ---------------------------------------------------------------------------

_DL05_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(o_custkey % 6 AS INT) AS bucket,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
),
b AS (
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM t GROUP BY bucket
)
SELECT CAST(bucket AS INT) AS run,
       CAST(CASE WHEN bucket < 4 THEN 0 ELSE 1 END AS INT) AS ver,
       bucket, n_cust, sum_cents
FROM b
"""


@register("dl05_delta_feed_rate_limited", oracle=_DL05_SQL)
def dl05_delta_feed_rate_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADMISSION CONTROL on the Delta streaming source (round 12):
    ``maxFilesPerTrigger=1`` splits the 4-file INITIAL SNAPSHOT and a
    2-file tail commit into SIX bounded micro-batches — each drained
    by its own availableNow run (the Python source API pins one capped
    batch per run), every boundary a cold checkpoint restart. Rows are
    stamped with the RUN that served them; the oracle demands run ==
    bucket (the deterministic sorted-file order), so an unbounded
    batch, a skipped file, or an inexact restart each flip a row.
    ``_commit_version`` separates the snapshot (0) from the tail (1).

    Scale: this is the difference between "first batch = the whole
    100 TB table in one transaction" and a bounded, resumable
    backfill; offsets carry a file index so restart is exact at file
    granularity (sources/delta_feed.py)."""
    from ..sources.pyds import register_python_sources

    td = alloc_scratch(spark, "dl05_rate") + "/t"
    os.makedirs(td, exist_ok=True)
    names = _stage_bucket_files(_cust_totals(spark, sf_dir), td, 6)
    log = f"{td}/_delta_log"
    _commit(
        log, 0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(_SCHEMA_PLAIN, []),
            *[_add(td, n) for n in names[:4]],
        ],
    )

    register_python_sources(spark)
    work = alloc_scratch(spark, "dl05_drain")
    out = f"{work}/rows"

    def drain(run_idx: int) -> None:
        def sink(bdf, _eid):
            bdf.withColumn("run", F.lit(run_idx).cast("int")).write.mode(
                "append"
            ).parquet(out)

        q = (
            spark.readStream.format("fp_delta_feed").option("path", td)
            .option("maxFilesPerTrigger", "1").load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{work}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for r in range(4):
        drain(r)
    _commit(log, 1, [_add(td, names[4]), _add(td, names[5])])
    for r in range(4, 6):
        drain(r)

    drained = spark.read.parquet(out)
    return (
        drained.groupBy(
            "run",
            F.col("_commit_version").cast("int").alias("ver"),
            (F.col("o_custkey") % 6).cast("int").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("sum_cents"))
        .select("run", "ver", "bucket", "n_cust", "sum_cents")
    )


# ---------------------------------------------------------------------------
# dl06: id-mode column mapping (parquet field-id matching)
# ---------------------------------------------------------------------------

_DL06_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(o_custkey % 3 AS INT) AS grp,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
)
SELECT grp,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(COUNT(*) FILTER (WHERE FALSE) AS BIGINT) AS n_added
FROM t GROUP BY grp
"""


@register("dl06_delta_id_mapping", oracle=_DL06_SQL)
def dl06_delta_id_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """id-mode COLUMN MAPPING (round 12, the Iceberg-converted-table
    shape): files carry OPAQUE physical column names plus parquet
    field ids; the log's schema maps logical names by
    delta.columnMapping.id, and the scan matches via Spark's native
    field-id resolution — file column names are never consulted. A
    third logical column (id 9) exists in no file and must read NULL
    (n_added counts its non-nulls: oracle says zero).

    Scale: field-id matching is a scan-level rewrite — column pruning
    and pushdown are unchanged, no extra pass."""
    from ..sources.delta import read_delta

    td = alloc_scratch(spark, "dl06_idmap") + "/t"
    os.makedirs(td, exist_ok=True)
    # files under physical names c-1/c-2 with field ids 1/2: stage the
    # plain bucket files, then rewrite with id-annotated schema
    names = _stage_bucket_files(
        _cust_totals(spark, sf_dir), td, 3, cols=["c-1", "c-2"]
    )
    import shutil

    for n in names:
        tmp = f"{td}/_rw_{n}"
        df = spark.read.parquet(f"{td}/{n}")
        # re-alias with parquet field ids (metadata-only projection;
        # fieldId.write is on by default, so the rewrite carries ids)
        df.select(
            F.col("`c-1`").alias("c-1", metadata={"parquet.field.id": 1}),
            F.col("`c-2`").alias("c-2", metadata={"parquet.field.id": 2}),
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        os.replace(f"{tmp}/{src}", f"{td}/{n}")
        shutil.rmtree(tmp)

    logical = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "o_custkey", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName": "c-1"}},
                {"name": "cents", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 2,
                              "delta.columnMapping.physicalName": "c-2"}},
                {"name": "added_later", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 9,
                              "delta.columnMapping.physicalName": "c-9"}},
            ],
        }
    )
    conf = {"delta.columnMapping.mode": "id", "delta.columnMapping.maxColumnId": "9"}
    log = f"{td}/_delta_log"
    _commit(
        log, 0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _meta(logical, [], configuration=conf),
            *[_add(td, n) for n in names],
        ],
    )

    df = read_delta(spark, td)
    return (
        df.groupBy((F.col("o_custkey") % 3).cast("int").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("cents").alias("sum_cents"),
            F.count("added_later").alias("n_added"),
        )
    )


# ---------------------------------------------------------------------------
# dl07: v2 spec checkpoint (UUID-named + sidecars) seeds replay
# ---------------------------------------------------------------------------

_DL07_SQL = _DL03_SQL  # same downstream aggregate as dl03


@register("dl07_delta_v2_checkpoint", oracle=_DL07_SQL)
def dl07_delta_v2_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2 SPEC CHECKPOINT read (round 12): a UUID-named top-level
    checkpoint parquet (checkpointMetadata + sidecar actions) with the
    add state in a ``_delta_log/_sidecars/`` parquet seeds replay
    after the covered commit is retention-deleted; commit v1's add
    applies on top. Same downstream aggregate as dl03, so the hash
    isolates exactly the checkpoint-form difference.

    Scale: sidecars are one parquet scan regardless of count — the
    same O(metadata) seeding as classic checkpoints; newer Delta
    writers emit exactly this layout."""
    import shutil
    import uuid as _u

    from ..sources.delta import read_delta

    td = alloc_scratch(spark, "dl07_v2cp") + "/t"
    os.makedirs(td, exist_ok=True)
    names = _stage_bucket_files(_cust_totals(spark, sf_dir), td, 3)
    log = f"{td}/_delta_log"
    proto = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["v2Checkpoint"],
        "writerFeatures": ["v2Checkpoint"],
    }
    meta = _meta(_SCHEMA_PLAIN, [])
    _commit(log, 0, [{"protocol": proto}, meta, _add(td, names[0]), _add(td, names[1])])

    # sidecar parquet with the v0 add state
    os.makedirs(f"{log}/_sidecars")
    sc_schema = "add struct<path:string,partitionValues:map<string,string>,size:bigint>"
    sc_rows = [
        ((n, {}, os.path.getsize(f"{td}/{n}")),) for n in names[:2]
    ]
    stage = f"{td}/_sc_stage"
    spark.createDataFrame(
        spark.sparkContext.parallelize(sc_rows, 1), sc_schema
    ).write.mode("overwrite").parquet(stage)
    src = next(x for x in os.listdir(stage) if x.endswith(".parquet"))
    sc_name = f"{_u.uuid4()}.parquet"
    os.replace(f"{stage}/{src}", f"{log}/_sidecars/{sc_name}")
    shutil.rmtree(stage)

    top_schema = (
        "checkpointMetadata struct<version:bigint>, "
        "sidecar struct<path:string,sizeInBytes:bigint>, "
        "metaData struct<id:string,format:struct<provider:string,"
        "options:map<string,string>>,schemaString:string,"
        "partitionColumns:array<string>,configuration:map<string,string>>, "
        "protocol struct<minReaderVersion:int,minWriterVersion:int,"
        "readerFeatures:array<string>,writerFeatures:array<string>>"
    )
    m = meta["metaData"]
    top_rows = [
        ((0,), None, None, None),
        (None, (sc_name, os.path.getsize(f"{log}/_sidecars/{sc_name}")), None, None),
        (None, None, (m["id"], ("parquet", {}), m["schemaString"], [], {}), None),
        (None, None, None,
         (3, 7, ["v2Checkpoint"], ["v2Checkpoint"])),
    ]
    stage2 = f"{td}/_cp_stage"
    spark.createDataFrame(
        spark.sparkContext.parallelize(top_rows, 1), top_schema
    ).write.mode("overwrite").parquet(stage2)
    src = next(x for x in os.listdir(stage2) if x.endswith(".parquet"))
    os.replace(f"{stage2}/{src}", f"{log}/{0:020d}.checkpoint.{_u.uuid4()}.parquet")
    shutil.rmtree(stage2)

    os.remove(f"{log}/{0:020d}.json")  # retention: v0 seeds from the v2 cp
    _commit(log, 1, [_add(td, names[2])])

    df = read_delta(spark, td)
    return (
        df.groupBy((F.col("o_custkey") % 3).cast("int").alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("sum_cents"))
    )


# ---------------------------------------------------------------------------
# dl08: nested name-mapped schema through the STREAMING feed
# ---------------------------------------------------------------------------

_DL08_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
)
SELECT CAST(0 AS INT) AS ver,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM t
"""


@register("dl08_delta_feed_nested_mapped", oracle=_DL08_SQL)
def dl08_delta_feed_nested_mapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED name-mode column mapping through the STREAMING source
    (round 12 — a refusal until now): files carry physical struct AND
    inner-field names (``m-1``/``m-k``/``m-c``); the feed's executor
    renames them to logical ``payload.key``/``payload.cents`` via a
    zero-copy arrow view. The census aggregates the NESTED field, so
    any rename slip (wrong field, dropped null mask) flips the hash.

    Scale: the rename is metadata-only (arrow ``view``) — no copy, no
    Python per-row work."""
    import shutil

    from ..sources.pyds import register_python_sources

    td = alloc_scratch(spark, "dl08_nested") + "/t"
    os.makedirs(td, exist_ok=True)
    totals = _cust_totals(spark, sf_dir)
    tmp = f"{td}/_stage"
    totals.selectExpr(
        "named_struct('m-k', o_custkey, 'm-c', cents) AS `m-1`"
    ).coalesce(1).write.mode("overwrite").parquet(tmp)
    src = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
    os.replace(f"{tmp}/{src}", f"{td}/f0.parquet")
    shutil.rmtree(tmp)

    logical = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "payload",
                 "type": {"type": "struct", "fields": [
                     {"name": "key", "type": "long", "nullable": True,
                      "metadata": {"delta.columnMapping.id": 2,
                                   "delta.columnMapping.physicalName": "m-k"}},
                     {"name": "cents", "type": "long", "nullable": True,
                      "metadata": {"delta.columnMapping.id": 3,
                                   "delta.columnMapping.physicalName": "m-c"}}]},
                 "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName": "m-1"}},
            ],
        }
    )
    conf = {"delta.columnMapping.mode": "name", "delta.columnMapping.maxColumnId": "3"}
    log = f"{td}/_delta_log"
    _commit(
        log, 0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _meta(logical, [], configuration=conf),
            _add(td, "f0.parquet"),
        ],
    )

    from ..sources.pyds import register_python_sources

    register_python_sources(spark)
    work = alloc_scratch(spark, "dl08_drain")
    q = (
        spark.readStream.format("fp_delta_feed").option("path", td).load()
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    drained = spark.read.parquet(f"{work}/out")
    return drained.agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("payload.cents").alias("sum_cents"),
    ).select(
        F.lit(0).cast("int").alias("ver"), "n_cust", "sum_cents"
    )


# ---------------------------------------------------------------------------
# dl09: OPTIMIZE (dataChange=false) commits pass over silently
# ---------------------------------------------------------------------------

_DL09_SQL = """
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
SELECT CAST(0 AS INT) AS ver,
       CAST(SUM(n_cust) AS BIGINT) AS n_cust,
       CAST(SUM(sum_cents) AS BIGINT) AS sum_cents
FROM b WHERE bucket IN (0, 1)
UNION ALL
SELECT CAST(2 AS INT), n_cust, sum_cents FROM b WHERE bucket = 2
"""


@register("dl09_delta_feed_compaction_passover", oracle=_DL09_SQL)
def dl09_delta_feed_compaction_passover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Delta streaming source's dataChange CONTRACT (round 12): an
    OPTIMIZE-shaped commit (removes + a combined re-add, all
    ``dataChange: false``) is passed over SILENTLY — its adds are
    never emitted (the rows were already served from the compacted
    files) and its removes do not trip the append-only gate; a later
    real append still tails. The oracle's emission set has NO rows
    stamped with the compaction's version — a duplicate emission or a
    false gate trip flips the hash.

    Scale: OPTIMIZE runs continuously on production tables; a source
    that dies (or double-serves) on every compaction is unusable."""
    from ..sources.pyds import register_python_sources

    td = alloc_scratch(spark, "dl09_opt") + "/t"
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
    # v1 = OPTIMIZE: f0+f1 -> c0, nothing a data change. Stage the
    # combined file by concatenating the two buckets' rows.
    import shutil

    tmp = f"{td}/_opt"
    spark.read.parquet(f"{td}/{names[0]}", f"{td}/{names[1]}").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    src = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
    os.replace(f"{tmp}/{src}", f"{td}/c0.parquet")
    shutil.rmtree(tmp)
    c0 = _add(td, "c0.parquet")
    c0["add"]["dataChange"] = False
    _commit(
        log, 1,
        [
            {"remove": {"path": names[0], "dataChange": False}},
            {"remove": {"path": names[1], "dataChange": False}},
            c0,
        ],
    )
    _commit(log, 2, [_add(td, names[2])])

    register_python_sources(spark)
    work = alloc_scratch(spark, "dl09_drain")
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
    drained = spark.read.parquet(f"{work}/out")
    return (
        drained.groupBy(F.col("_commit_version").cast("int").alias("ver"))
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("sum_cents"))
    )


# ---------------------------------------------------------------------------
# io17: APPEND into a foreign Delta log (write-side interop)
# ---------------------------------------------------------------------------

_IO17_SQL = """
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
SELECT CAST(0 AS INT) AS ver, CAST(SUM(n_cust) AS BIGINT) AS n_cust,
       CAST(SUM(sum_cents) AS BIGINT) AS sum_cents
FROM b WHERE bucket = 0
UNION ALL
SELECT CAST(1 AS INT), CAST(SUM(n_cust) AS BIGINT), CAST(SUM(sum_cents) AS BIGINT)
FROM b
"""


@register("io17_delta_foreign_append", oracle=_IO17_SQL)
def io17_delta_foreign_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-side Delta interop (round 12): ``append_delta_table``
    commits an add-only v1 (put-if-absent, concurrent-loser retry)
    into a log a FOREIGN writer created — here a spec-synthesized v0
    holding bucket 0 of the customer totals; the append contributes
    buckets 1-3. ``read_delta`` serves v0 (bucket 0 only) and v1 (all
    buckets); the oracle reconstructs both censuses from ``orders``,
    so a dropped file, a schema fork, or a replayed add flips a row.

    Scale: the append stages files once, moves bytes through the
    backend, and commits one metadata-sized JSON — O(new data), no
    table rewrite; losers of the commit race retry without re-staging
    (sources/delta_export.py append_delta_table)."""
    from ..sources.delta import read_delta
    from ..sources.delta_export import append_delta_table

    td = alloc_scratch(spark, "io17_append") + "/t"
    os.makedirs(td, exist_ok=True)
    totals = _cust_totals(spark, sf_dir)
    names = _stage_bucket_files(totals.where(F.col("o_custkey") % 4 == 0), td, 1)
    log = f"{td}/_delta_log"
    _commit(
        log, 0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(_SCHEMA_PLAIN, []),
            _add(td, names[0]),
        ],
    )
    new_rows = totals.where(F.col("o_custkey") % 4 != 0).select("o_custkey", "cents")
    assert append_delta_table(spark, td, new_rows) == 1

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
# dl10: CHANGE DATA FEED read — cdc-authoritative + derive paths
# ---------------------------------------------------------------------------

_DL10_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(o_custkey % 2 AS INT) AS bucket,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
),
b AS (
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM t GROUP BY bucket
)
SELECT CAST(0 AS INT) AS ver, 'insert' AS ctype,
       CAST(SUM(n_cust) AS BIGINT) AS n_cust,
       CAST(SUM(sum_cents) AS BIGINT) AS sum_cents
FROM b
UNION ALL
SELECT CAST(1 AS INT), 'delete', n_cust, sum_cents FROM b WHERE bucket = 0
UNION ALL
SELECT CAST(2 AS INT), 'update_preimage', n_cust, sum_cents FROM b WHERE bucket = 1
UNION ALL
SELECT CAST(2 AS INT), 'update_postimage', n_cust, sum_cents + n_cust
FROM b WHERE bucket = 1
"""


@register("dl10_delta_change_feed", oracle=_DL10_SQL)
def dl10_delta_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED over a Delta log (round 12,
    ``read_delta_changes`` — the spec's table-changes surface): v0's
    adds derive as ``insert`` rows, v1's dataChange remove derives as
    ``delete`` rows read from the removed file's still-present bytes,
    and v2 is cdc-AUTHORITATIVE — a ``_change_data`` parquet carries
    update_preimage/postimage rows (every bucket-1 total bumped one
    cent) and the commit's own add is ignored by CDF. The oracle
    reconstructs all four change censuses from ``orders``; a missed
    derive, a double-served cdc commit, or a wrong type stamp flips a
    row.

    Scale: one scan of the derive-path files + one broadcast
    (file -> version/type) join, one scan of the cdc files — plan
    fan-out independent of the commit count (sources/delta.py
    read_delta_changes)."""
    import shutil

    from ..sources.delta import read_delta_changes

    td = alloc_scratch(spark, "dl10_cdf") + "/t"
    os.makedirs(td, exist_ok=True)
    totals = _cust_totals(spark, sf_dir)
    names = _stage_bucket_files(totals, td, 2)
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
    _commit(log, 1, [{"remove": {"path": names[0], "dataChange": True}}])

    # v2: cdc-authoritative update of every bucket-1 row (+1 cent)
    b1 = totals.where(F.col("o_custkey") % 2 == 1)
    cdc_rows = b1.selectExpr(
        "o_custkey", "cents", "'update_preimage' AS _change_type"
    ).unionByName(
        b1.selectExpr(
            "o_custkey", "cents + 1 AS cents", "'update_postimage' AS _change_type"
        )
    )
    tmp = f"{td}/_cdc_stage"
    cdc_rows.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
    os.makedirs(f"{td}/_change_data", exist_ok=True)
    os.replace(f"{tmp}/{src}", f"{td}/_change_data/cdc-0.parquet")
    shutil.rmtree(tmp)
    post = f"{td}/_post_stage"
    b1.selectExpr("o_custkey", "cents + 1 AS cents").coalesce(1).write.mode(
        "overwrite"
    ).parquet(post)
    src = next(n for n in os.listdir(post) if n.endswith(".parquet"))
    os.replace(f"{post}/{src}", f"{td}/b1_post.parquet")
    shutil.rmtree(post)
    _commit(
        log, 2,
        [
            {
                "cdc": {
                    "path": "_change_data/cdc-0.parquet",
                    "partitionValues": {},
                    "size": os.path.getsize(f"{td}/_change_data/cdc-0.parquet"),
                    "dataChange": False,
                }
            },
            {"remove": {"path": names[1], "dataChange": True}},
            _add(td, "b1_post.parquet"),
        ],
    )

    changes = read_delta_changes(spark, td, 0)
    return (
        changes.groupBy(
            F.col("_commit_version").alias("ver"),
            F.col("_change_type").alias("ctype"),
        )
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("sum_cents"))
    )


# ---------------------------------------------------------------------------
# io18: the Delta MAINTENANCE WRITER — OPTIMIZE + v2 checkpoint + retention
# ---------------------------------------------------------------------------

_IO18_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
)
SELECT 'precompact' AS stage,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(3 AS INT) AS n_files
FROM t
UNION ALL
SELECT 'postretention', CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT),
       CAST(1 AS INT)
FROM t
"""


@register("io18_delta_maintenance_writer", oracle=_IO18_SQL)
def io18_delta_maintenance_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Delta MAINTENANCE-WRITER loop against a foreign log
    (round 12): two ``append_delta_table`` commits land buckets 1-2
    next to the foreign v0 file; ``compact_delta_table`` bin-packs the
    three small files into ONE (all under the size target) as a
    dataChange=false rearrangement;
    ``checkpoint_delta_log(form="v2")`` upgrades the protocol with the
    v2Checkpoint feature and writes the UUID-named checkpoint +
    sidecar; every commit JSON at or below it is retention-deleted and
    the head still reads THROUGH the v2 checkpoint. The oracle pins
    both censuses AND the file counts (3 before, 1 after), so a
    dropped row, a duplicated rearrangement, or a checkpoint that
    fails to seed each flip a row.

    Scale: this is the nightly table-maintenance loop — appends
    O(new data), compaction ONE shuffle into one parallel task per
    size-targeted bin (driver-side greedy pack over the snapshot's
    file sizes — r13; never coalesce(1)), checkpoint metadata-sized,
    retention frees O(commits)."""
    import os as _os

    from ..sources.delta import delta_snapshot, read_delta
    from ..sources.delta_export import (
        append_delta_table,
        checkpoint_delta_log,
        compact_delta_table,
    )

    td = alloc_scratch(spark, "io18_maint") + "/t"
    os.makedirs(td, exist_ok=True)
    totals = _cust_totals(spark, sf_dir)
    names = _stage_bucket_files(totals.where(F.col("o_custkey") % 3 == 0), td, 1)
    log = f"{td}/_delta_log"
    _commit(
        log, 0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(_SCHEMA_PLAIN, []),
            _add(td, names[0]),
        ],
    )
    for b in (1, 2):
        assert append_delta_table(
            spark,
            td,
            totals.where(F.col("o_custkey") % 3 == b).select("o_custkey", "cents")
            .coalesce(1),
        ) == b

    pre = read_delta(spark, td)
    pre_files = len(delta_snapshot(td, spark=spark)["files"])
    pre_leg = pre.agg(
        F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("sum_cents")
    ).select(
        F.lit("precompact").alias("stage"), "n_cust", "sum_cents",
        F.lit(pre_files).cast("int").alias("n_files"),
    )
    pre_leg = pre_leg.localCheckpoint()  # pin BEFORE retention moves files

    assert compact_delta_table(spark, td) == 3
    cp_v = checkpoint_delta_log(spark, td, form="v2")
    for c in range(cp_v + 1):
        p = f"{log}/{c:020d}.json"
        if _os.path.exists(p):
            _os.remove(p)

    post = read_delta(spark, td)  # MUST seed from the v2 checkpoint
    post_files = len(delta_snapshot(td, spark=spark)["files"])
    post_leg = post.agg(
        F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("sum_cents")
    ).select(
        F.lit("postretention").alias("stage"), "n_cust", "sum_cents",
        F.lit(post_files).cast("int").alias("n_files"),
    )
    return pre_leg.unionByName(post_leg)


# ---------------------------------------------------------------------------
# dl11: CHANGE DATA FEED as a STREAM (readChangeFeed on fp_delta_feed)
# ---------------------------------------------------------------------------

_DL11_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(o_custkey % 2 AS INT) AS bucket,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
),
b AS (
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM t GROUP BY bucket
)
SELECT CAST(0 AS INT) AS ver, 'insert' AS ctype,
       CAST(SUM(n_cust) AS BIGINT) AS n_cust,
       CAST(SUM(sum_cents) AS BIGINT) AS sum_cents
FROM b
UNION ALL
SELECT CAST(1 AS INT), 'delete', n_cust, sum_cents FROM b WHERE bucket = 0
UNION ALL
SELECT CAST(2 AS INT), 'update_preimage', n_cust, sum_cents FROM b WHERE bucket = 1
UNION ALL
SELECT CAST(2 AS INT), 'update_postimage', n_cust, sum_cents + n_cust
FROM b WHERE bucket = 1
"""


@register("dl11_delta_feed_change_stream", oracle=_DL11_SQL)
def dl11_delta_feed_change_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED as a STREAM (round 12,
    ``option("readChangeFeed", "true")`` on fp_delta_feed): the same
    3-commit change history dl10 certifies in batch — derive-path
    inserts (v0), a derive-path delete reading the removed file's
    bytes (v1), and a cdc-AUTHORITATIVE update commit whose
    ``_change_data`` rows carry their own ``_change_type`` and whose
    add is ignored (v2) — drained through a REAL Structured Streaming
    query with ``startingVersion=0``. The oracle reconstructs every
    change census from ``orders``; batch/stream CDF parity holds by
    construction (dl10's SQL is dl11's minus nothing).

    Scale: the stream's unit of work is a change FILE (admission
    control composes); commit parsing is metadata-sized; no
    append-only gate applies — OPTIMIZE commits pass over and change
    commits are the payload."""
    import shutil

    from ..sources.pyds import register_python_sources

    td = alloc_scratch(spark, "dl11_cdfs") + "/t"
    os.makedirs(td, exist_ok=True)
    totals = _cust_totals(spark, sf_dir)
    names = _stage_bucket_files(totals, td, 2)
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
    _commit(log, 1, [{"remove": {"path": names[0], "dataChange": True}}])
    b1 = totals.where(F.col("o_custkey") % 2 == 1)
    cdc_rows = b1.selectExpr(
        "o_custkey", "cents", "'update_preimage' AS _change_type"
    ).unionByName(
        b1.selectExpr(
            "o_custkey", "cents + 1 AS cents", "'update_postimage' AS _change_type"
        )
    )
    tmp = f"{td}/_cdc_stage"
    cdc_rows.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
    os.makedirs(f"{td}/_change_data", exist_ok=True)
    os.replace(f"{tmp}/{src}", f"{td}/_change_data/cdc-0.parquet")
    shutil.rmtree(tmp)
    post = f"{td}/_post_stage"
    b1.selectExpr("o_custkey", "cents + 1 AS cents").coalesce(1).write.mode(
        "overwrite"
    ).parquet(post)
    src = next(n for n in os.listdir(post) if n.endswith(".parquet"))
    os.replace(f"{post}/{src}", f"{td}/b1_post.parquet")
    shutil.rmtree(post)
    _commit(
        log, 2,
        [
            {
                "cdc": {
                    "path": "_change_data/cdc-0.parquet",
                    "partitionValues": {},
                    "size": os.path.getsize(f"{td}/_change_data/cdc-0.parquet"),
                    "dataChange": False,
                }
            },
            {"remove": {"path": names[1], "dataChange": True}},
            _add(td, "b1_post.parquet"),
        ],
    )

    register_python_sources(spark)
    work = alloc_scratch(spark, "dl11_drain")
    q = (
        spark.readStream.format("fp_delta_feed").option("path", td)
        .option("startingVersion", "0").option("readChangeFeed", "true").load()
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    drained = spark.read.parquet(f"{work}/out")
    return (
        drained.groupBy(
            F.col("_commit_version").cast("int").alias("ver"),
            F.col("_change_type").alias("ctype"),
        )
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("sum_cents"))
    )


# ---------------------------------------------------------------------------
# dl12: CDF WRITE-side — this engine's own DV commit consumed end-to-end
# ---------------------------------------------------------------------------

_DL12_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
),
legs AS (
    SELECT CAST(0 AS INT) AS ver, 'insert' AS ctype,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM t
    UNION ALL
    SELECT CAST(1 AS INT), 'delete', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM t WHERE o_custkey % 3 = 0
)
SELECT s.stage, l.ver, l.ctype, l.n_cust, l.sum_cents
FROM legs l
CROSS JOIN (SELECT 'batch' AS stage UNION ALL SELECT 'stream') s
"""


@register("dl12_delta_cdf_export_roundtrip", oracle=_DL12_SQL)
def dl12_delta_cdf_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF WRITE-side round-trip (r12 verdict item 2): customer totals
    land as a VERSIONED table, ``publish_delta_log(enable_cdf=True)``
    exports the clean snapshot (delta v0, derive-path inserts — no cdc
    bytes for a pure append), a merge-on-read ``delete_where_dv`` masks
    every third customer and the incremental re-export emits the spec's
    ``_change_data`` cdc files for the newly-masked rows (delta v1,
    cdc-AUTHORITATIVE — the shape r12's readers refused because no
    writer produced it). BOTH consumers then read the same history:
    ``read_delta_changes`` in batch and the fp_delta_feed change STREAM
    (``readChangeFeed``, startingVersion=0) through a real availableNow
    drain — each leg aggregates (version, change type) censuses the
    oracle reconstructs from ``orders``, and batch/stream parity is
    pinned by the shared expected rows.

    Scale: cdc assembly is DIFF-sized (one scan of the changed files +
    positional anti/semi joins against the dv masks, nothing driver-
    side but file moves); the consumers' plans are the dl10/dl11
    shapes — one scan per leg + a broadcast attribution join."""
    from ..sources.delta import read_delta_changes
    from ..sources.delta_export import publish_delta_log
    from ..sources.pyds import register_python_sources
    from ..sources.versioned import delete_where_dv, write_version

    td = alloc_scratch(spark, "dl12_cdfw") + "/t"
    totals = _cust_totals(spark, sf_dir)
    write_version(totals.repartitionByRange(4, "o_custkey"), td, manifest=True)
    assert publish_delta_log(spark, td, version=1, enable_cdf=True) == 0
    assert delete_where_dv(spark, td, F.col("o_custkey") % 3 == 0) == 2
    assert publish_delta_log(spark, td, version=2) == 1  # cdc-authoritative

    def _census(df: DataFrame, stage: str) -> DataFrame:
        return (
            df.groupBy(
                F.col("_commit_version").cast("int").alias("ver"),
                F.col("_change_type").alias("ctype"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_cust"),
                F.sum("cents").alias("sum_cents"),
            )
            .select(F.lit(stage).alias("stage"), "ver", "ctype", "n_cust",
                    "sum_cents")
        )

    batch = _census(read_delta_changes(spark, td, 0), "batch")

    register_python_sources(spark)
    work = alloc_scratch(spark, "dl12_drain")
    q = (
        spark.readStream.format("fp_delta_feed").option("path", td)
        .option("startingVersion", "0").option("readChangeFeed", "true").load()
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream = _census(spark.read.parquet(f"{work}/out"), "stream")
    return batch.unionByName(stream)


# ---------------------------------------------------------------------------
# io19: NESTED column-mapped append + bin-packed compaction (write path)
# ---------------------------------------------------------------------------

_IO19_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(o_custkey % 2 AS INT) AS bucket,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM t GROUP BY bucket
"""

_IO19_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "o_custkey", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "c-1"}},
            {"name": "props",
             "type": {"type": "struct", "fields": [
                 {"name": "cents", "type": "long", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 3,
                               "delta.columnMapping.physicalName": "c-3"}},
             ]},
             "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "c-2"}},
        ],
    }
)


@register("io19_delta_nested_mapped_append", oracle=_IO19_SQL)
def io19_delta_nested_mapped_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED-schema column-mapped WRITE path (round 13, r12 verdict
    item 5): a foreign name-mapped table whose ``props`` column is a
    struct (physical names ``c-2``/``c-3``, the real mapped-table
    shape) takes an ``append_delta_table`` of the odd-customer bucket —
    files staged under recursive PHYSICAL names with parquet field ids
    at every nesting level (positional-cast rename + alias metadata,
    delta_export._stage_physical) — then the bin-packed
    ``compact_delta_table`` rewrites the same nested shape. The r12
    writers REFUSED nested mapped schemas; the oracle pins the
    per-bucket census through read_delta's logical projection after
    both commits.

    Scale: identical plan shapes to io17/io18 — the nested rename is
    a zero-shuffle projection fused into the staging write."""
    import shutil

    from ..sources.delta import read_delta
    from ..sources.delta_export import append_delta_table, compact_delta_table

    td = alloc_scratch(spark, "io19_nested") + "/t"
    os.makedirs(td, exist_ok=True)
    totals = _cust_totals(spark, sf_dir)
    b0 = totals.where(F.col("o_custkey") % 2 == 0).selectExpr(
        "o_custkey AS `c-1`", "named_struct('c-3', cents) AS `c-2`"
    )
    tmp = f"{td}/_stage"
    b0.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
    os.replace(f"{tmp}/{src}", f"{td}/b0.parquet")
    shutil.rmtree(tmp)
    log = f"{td}/_delta_log"
    _commit(
        log, 0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _meta(_IO19_SCHEMA, [], {
                "delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": "3",
            }),
            _add(td, "b0.parquet"),
        ],
    )

    b1 = totals.where(F.col("o_custkey") % 2 == 1).select(
        "o_custkey", F.struct(F.col("cents").alias("cents")).alias("props")
    )
    assert append_delta_table(spark, td, b1) == 1
    assert compact_delta_table(spark, td) == 2

    back = read_delta(spark, td)
    return (
        back.select(
            (F.col("o_custkey") % 2).cast("int").alias("bucket"),
            F.col("props.cents").alias("cents"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("cents").alias("sum_cents"),
        )
    )


# ---------------------------------------------------------------------------
# io20: rowTracking append — baseRowId assignment + high-water mark
# ---------------------------------------------------------------------------

_IO20_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(o_custkey % 3 AS INT) AS bucket,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM t GROUP BY bucket
"""


@register("io20_delta_rowtracking_append", oracle=_IO20_SQL)
def io20_delta_rowtracking_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rowTracking WRITE support (round 13, r12 verdict stretch item
    8): a foreign table whose protocol demands the ``rowTracking``
    writer feature — the most common refusal left in r12's
    ``_check_writer_protocol`` — takes TWO ``append_delta_table``
    commits. Each append assigns its files consecutive ``baseRowId``
    ranges from the ``delta.rowTracking`` domain-metadata high-water
    mark, stamps ``defaultRowCommitVersion``, and advances the mark —
    asserted exactly against per-file row counts read from the log's
    own numRecords stats (the builder re-derives the id ranges from
    the commits and fails on any gap/overlap). The oracle pins the
    3-bucket census through read_delta after both appends.

    Scale: the high-water mark is one domainMetadata action per
    commit (metadata-sized); per-file row counts come from the staged
    footers driver-side — no extra data pass."""
    from ..sources.delta import delta_snapshot, read_delta
    from ..sources.delta_export import append_delta_table

    td = alloc_scratch(spark, "io20_rowtrack") + "/t"
    os.makedirs(td, exist_ok=True)
    totals = _cust_totals(spark, sf_dir)
    names = _stage_bucket_files(totals.where(F.col("o_custkey") % 3 == 0), td, 1)
    n0 = spark.read.parquet(f"{td}/{names[0]}").count()
    log = f"{td}/_delta_log"
    _commit(
        log, 0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": [],
                          "writerFeatures": ["rowTracking",
                                             "domainMetadata"]}},
            _meta(_SCHEMA_PLAIN, [],
                  {"delta.enableRowTracking": "true"}),
            _add(td, names[0]),
            {"domainMetadata": {"domain": "delta.rowTracking",
                                "configuration": json.dumps(
                                    {"rowIdHighWaterMark": n0 - 1}),
                                "removed": False}},
        ],
    )

    expect_base = n0
    for v, b in ((1, 1), (2, 2)):
        batch = totals.where(F.col("o_custkey") % 3 == b).select(
            "o_custkey", "cents"
        ).coalesce(1)
        assert append_delta_table(spark, td, batch) == v
        with open(f"{log}/{v:020d}.json") as f:
            acts = [json.loads(ln) for ln in f]
        adds = [a["add"] for a in acts if "add" in a]
        for a in sorted(adds, key=lambda a: a["baseRowId"]):
            assert a["baseRowId"] == expect_base, (a, expect_base)
            assert a["defaultRowCommitVersion"] == v
            expect_base += json.loads(a["stats"])["numRecords"]
        dm = next(a["domainMetadata"] for a in acts if "domainMetadata" in a)
        assert json.loads(dm["configuration"])["rowIdHighWaterMark"] == (
            expect_base - 1
        )
    # the snapshot replays the advanced mark
    snap = delta_snapshot(td, spark=spark)
    assert json.loads(snap["domain_metadata"]["delta.rowTracking"])[
        "rowIdHighWaterMark"
    ] == expect_base - 1

    back = read_delta(spark, td)
    return (
        back.select(
            (F.col("o_custkey") % 3).cast("int").alias("bucket"), "cents"
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("cents").alias("sum_cents"),
        )
    )


# ---------------------------------------------------------------------------
# dl13: id-mode column mapping through the STREAMING feed
# ---------------------------------------------------------------------------

_DL13_SQL = _DL06_SQL  # same downstream aggregate as the batch id-mode cert


@register("dl13_delta_feed_id_mapping", oracle=_DL13_SQL)
def dl13_delta_feed_id_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """id-mode column mapping through fp_delta_feed (round 13 — the
    r12 refusal flips): the same opaque-physical-names + parquet
    field-ids fixture dl06 certifies in batch, drained through a REAL
    Structured Streaming query. Executors resolve each FILE's columns
    by ``PARQUET:field_id`` schema metadata (file column names are
    never consulted), a logical column whose id exists in no file
    reads NULL, and rows arrive stamped with ``_commit_version``. The
    oracle is dl06's — batch/stream id-mode parity by construction.

    Scale: resolution is one footer-schema read per file partition —
    the same metadata the parquet scan opens anyway; no extra pass."""
    import shutil

    from ..sources.pyds import register_python_sources

    td = alloc_scratch(spark, "dl13_idfeed") + "/t"
    os.makedirs(td, exist_ok=True)
    names = _stage_bucket_files(
        _cust_totals(spark, sf_dir), td, 3, cols=["c-1", "c-2"]
    )
    for n in names:
        tmp = f"{td}/_rw_{n}"
        df = spark.read.parquet(f"{td}/{n}")
        df.select(
            F.col("`c-1`").alias("c-1", metadata={"parquet.field.id": 1}),
            F.col("`c-2`").alias("c-2", metadata={"parquet.field.id": 2}),
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        os.replace(f"{tmp}/{src}", f"{td}/{n}")
        shutil.rmtree(tmp)

    logical = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "o_custkey", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName": "c-1"}},
                {"name": "cents", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 2,
                              "delta.columnMapping.physicalName": "c-2"}},
                {"name": "added_later", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 9,
                              "delta.columnMapping.physicalName": "c-9"}},
            ],
        }
    )
    conf = {"delta.columnMapping.mode": "id",
            "delta.columnMapping.maxColumnId": "9"}
    log = f"{td}/_delta_log"
    _commit(
        log, 0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _meta(logical, [], configuration=conf),
            *[_add(td, n) for n in names],
        ],
    )

    register_python_sources(spark)
    work = alloc_scratch(spark, "dl13_drain")
    q = (
        spark.readStream.format("fp_delta_feed").option("path", td).load()
        .writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    drained = spark.read.parquet(f"{work}/out")
    return (
        drained.groupBy((F.col("o_custkey") % 3).cast("int").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("cents").alias("sum_cents"),
            F.count("added_later").alias("n_added"),
        )
    )


# ---------------------------------------------------------------------------
# io21: VACUUM — storage reclaim closing the maintenance loop
# ---------------------------------------------------------------------------

_IO21_SQL = """
WITH t AS (
    SELECT o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(1 AS INT) AS n_live_files,
       CAST(0 AS INT) AS n_stale_left
FROM t
"""


@register("io21_delta_vacuum_reclaim", oracle=_IO21_SQL)
def io21_delta_vacuum_reclaim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM closes the maintenance-writer loop (round 13): three
    appended bucket files are bin-packed by ``compact_delta_table``
    into one (removes+adds, dataChange=false), an orphan from an
    "aborted staging" is planted, and ``vacuum_delta_table`` (floor
    deliberately overridden as a maintenance job would) reclaims the
    three tombstoned files AND the orphan while the live compacted
    file and the log survive. The result pins the census read AFTER
    the reclaim plus the live/stale file counts — a vacuum that
    deleted a live file flips the census; one that missed a stale
    file flips n_stale_left.

    Scale: vacuum is driver-side log replay + a recursive listing —
    metadata-sized; deletes are per-object backend calls."""
    from ..sources.delta import delta_snapshot, read_delta
    from ..sources.delta_export import (
        append_delta_table,
        compact_delta_table,
        vacuum_delta_table,
    )

    td = alloc_scratch(spark, "io21_vacuum") + "/t"
    os.makedirs(td, exist_ok=True)
    totals = _cust_totals(spark, sf_dir)
    names = _stage_bucket_files(totals.where(F.col("o_custkey") % 3 == 0), td, 1)
    log = f"{td}/_delta_log"
    _commit(
        log, 0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(_SCHEMA_PLAIN, []),
            _add(td, names[0]),
        ],
    )
    for b in (1, 2):
        assert append_delta_table(
            spark, td,
            totals.where(F.col("o_custkey") % 3 == b)
            .select("o_custkey", "cents").coalesce(1),
        ) == b
    assert compact_delta_table(spark, td) == 3
    with open(f"{td}/orphan_staging.parquet", "wb") as f:
        f.write(b"aborted")
    import time as _time

    # a day-old aborted staging (deterministic age vs the tiny window)
    _old = _time.time() - 86400
    os.utime(f"{td}/orphan_staging.parquet", (_old, _old))

    pre_files = set(delta_snapshot(td, spark=spark)["files"])
    deleted = set(
        vacuum_delta_table(
            spark, td, retention_hours=0.000001,
            enforce_retention_floor=False,
        )
    )
    assert "orphan_staging.parquet" in deleted
    assert not (deleted & pre_files), "vacuum must never touch live files"
    stale_left = sum(
        1
        for n in os.listdir(td)
        if n.endswith(".parquet")
        and n not in {p.rsplit("/", 1)[-1] for p in pre_files}
    )
    back = read_delta(spark, td)
    return back.agg(
        F.count(F.lit(1)).alias("n_cust"), F.sum("cents").alias("sum_cents")
    ).select(
        "n_cust",
        "sum_cents",
        F.lit(len(pre_files)).cast("int").alias("n_live_files"),
        F.lit(stale_left).cast("int").alias("n_stale_left"),
    )
