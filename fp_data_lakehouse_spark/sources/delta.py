"""Minimal Delta Lake TABLE READER — interop IN, the mirror of the
symlink-manifest export's interop OUT (operators/io.py io13/io15).

Reads a Delta table directly from its transaction log per the PUBLIC
Delta protocol spec (delta-io/delta PROTOCOL.md) with no Delta JAR and
no DeltaCatalog: list ``_delta_log/``, start from the newest parquet
checkpoint at or before the requested version, replay the JSON commits
above it (``add`` / ``remove`` keyed by file path; last ``metaData`` /
``protocol`` win), and scan the resulting file set with the schema the
log declares. Hive-less partitioning is honored the way Delta defines
it: partition column VALUES live in each ``add``'s ``partitionValues``
map (the parquet files do not contain those columns), so files are
grouped by partition tuple and each group's scan gets the values
injected as typed literals.

Scope (documented, enforced): reader protocol version 1 tables, plus
version-3 tables whose ``readerFeatures`` we actually implement (none
beyond the base yet) — tables requiring ``deletionVectors`` or
``columnMapping`` are REFUSED loudly rather than silently resurrecting
deleted rows or misnaming columns; this repo's own versioned layer is
the place those features are implemented (sources/versioned.py vt13/
vt14). Time travel via ``version=``. Reference parity: the reference
consumes external tables by full MySQL SELECT (ETL_FINAL.py:38); this
is that ingestion seam pointed at the lakehouse format the rest of the
ecosystem writes.

Caveat, stated plainly: the container ships no delta-spark JAR, so the
test fixture (tests/test_delta_reader.py) synthesizes logs per the
protocol spec rather than round-tripping tables written by Delta
itself — field-shape fidelity rests on the spec, not on a live
cross-implementation check.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_COMMIT = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT = re.compile(r"^(\d{20})\.checkpoint\.parquet$")

# readerFeatures this implementation actually implements (protocol v3
# tables list required features explicitly; v1/v2 tables imply none)
_SUPPORTED_READER_FEATURES: frozenset = frozenset()


def _log_entries(log_dir: str) -> tuple[list[int], list[int]]:
    """(commit versions, checkpoint versions) present in _delta_log."""
    commits, checkpoints = [], []
    try:
        names = os.listdir(log_dir)
    except FileNotFoundError:
        raise FileNotFoundError(f"not a Delta table: no _delta_log under {log_dir}")
    for n in names:
        m = _COMMIT.match(n)
        if m:
            commits.append(int(m.group(1)))
        m = _CHECKPOINT.match(n)
        if m:
            checkpoints.append(int(m.group(1)))
    return sorted(commits), sorted(checkpoints)


def _check_protocol(protocol: dict | None, table_dir: str) -> None:
    if protocol is None:
        return
    mrv = protocol.get("minReaderVersion", 1)
    features = set(protocol.get("readerFeatures") or [])
    unsupported = features - _SUPPORTED_READER_FEATURES
    if mrv >= 3 and unsupported:
        raise ValueError(
            f"Delta table {table_dir} requires reader features "
            f"{sorted(unsupported)} this reader does not implement — "
            "refusing rather than returning wrong rows (deletion "
            "vectors would resurrect deleted rows, column mapping "
            "would misname columns)"
        )
    if mrv == 2:
        # reader version 2 == column mapping capability; actual use is
        # signaled in metaData configuration, checked in read_delta
        return
    if mrv > 3:
        raise ValueError(
            f"Delta table {table_dir} requires minReaderVersion {mrv} "
            "(> 3); refusing an unknown protocol"
        )


def delta_snapshot(table_dir: str, version: int | None = None, spark=None) -> dict:
    """Reconstruct the snapshot state at ``version`` (default: latest):
    ``{"version", "files": {path: partitionValues}, "schema_json",
    "partition_columns", "protocol", "configuration"}``. Pure log
    replay — checkpoint parquet (if ``spark`` given and one helps) then
    JSON commits; O(log segment), no data files touched."""
    td = table_dir.rstrip("/")
    log_dir = f"{td}/_delta_log"
    commits, checkpoints = _log_entries(log_dir)
    if not commits and not checkpoints:
        raise FileNotFoundError(f"empty _delta_log in {table_dir}")
    latest = max(commits[-1] if commits else -1,
                 checkpoints[-1] if checkpoints else -1)
    v = latest if version is None else version
    if v > latest or (v not in commits and v not in checkpoints):
        raise FileNotFoundError(
            f"version {v} not present in {table_dir} (latest {latest})"
        )

    files: dict[str, dict] = {}
    meta: dict | None = None
    protocol: dict | None = None
    start = 0
    usable_cp = [c for c in checkpoints if c <= v]
    if usable_cp and spark is not None:
        cp = usable_cp[-1]
        cp_df = spark.read.parquet(f"{log_dir}/{cp:020d}.checkpoint.parquet")
        have = set(cp_df.columns)
        rows = cp_df.select(
            *[c for c in ("add", "remove", "metaData", "protocol") if c in have]
        ).collect()
        for r in rows:
            d = r.asDict(recursive=True)
            add = d.get("add")
            if add and add.get("path"):
                files[add["path"]] = add.get("partitionValues") or {}
            # checkpoints hold the CURRENT state: removes are
            # tombstones for vacuum, not live files
            if d.get("metaData") and d["metaData"].get("schemaString"):
                meta = d["metaData"]
            if d.get("protocol") and d["protocol"].get("minReaderVersion"):
                protocol = d["protocol"]
        start = cp + 1
    for c in commits:
        if c < start or c > v:
            continue
        with open(f"{log_dir}/{c:020d}.json", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    a = action["add"]
                    files[a["path"]] = a.get("partitionValues") or {}
                elif "remove" in action:
                    files.pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "protocol" in action:
                    protocol = action["protocol"]
    _check_protocol(protocol, table_dir)
    if meta is None:
        raise ValueError(f"no metaData action found in {table_dir}'s log")
    conf = meta.get("configuration") or {}
    if conf.get("delta.columnMapping.mode", "none") not in ("", "none"):
        raise ValueError(
            f"Delta table {table_dir} uses column mapping "
            f"(delta.columnMapping.mode={conf['delta.columnMapping.mode']}) "
            "— physical file columns differ from the logical schema; "
            "refusing rather than misnaming columns"
        )
    return {
        "version": v,
        "files": files,
        "schema_json": meta["schemaString"],
        "partition_columns": list(meta.get("partitionColumns") or []),
        "protocol": protocol,
        "configuration": conf,
    }


def read_delta(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table snapshot as a DataFrame (see module doc).
    Partition columns are injected per partition-tuple group as typed
    literals (cast from the log's string ``partitionValues`` under the
    declared schema — Delta's own serialization rule), data columns are
    selected under the declared schema; column order follows the
    schema. An empty snapshot returns an empty frame with the declared
    schema."""
    snap = delta_snapshot(table_dir, version, spark=spark)
    td = table_dir.rstrip("/")
    schema = StructType.fromJson(json.loads(snap["schema_json"]))
    pcols = snap["partition_columns"]
    dcols = [f.name for f in schema.fields if f.name not in pcols]
    ptypes = {f.name: f.dataType for f in schema.fields if f.name in pcols}
    out_order = [f.name for f in schema.fields]

    if not snap["files"]:
        return spark.createDataFrame([], schema)

    # group files by partition tuple: Delta files do NOT contain the
    # partition columns physically, so each group's scan injects them
    # as typed literals (one scan per distinct tuple — partition counts
    # are bounded by the table's layout; at pathological cardinality
    # partitioning wasn't the right layout to begin with)
    groups: dict[tuple, list[str]] = {}
    for path, pvals in snap["files"].items():
        key = tuple((pvals or {}).get(c) for c in pcols)
        groups.setdefault(key, []).append(f"{td}/{path}")
    legs = []
    for key, paths in sorted(groups.items()):
        leg = spark.read.parquet(*sorted(paths)).select(*dcols)
        for c, val in zip(pcols, key):
            # Delta serializes partition values as strings (null for
            # NULL); the declared schema's type drives the cast back
            lit = F.lit(val).cast(ptypes[c]) if val is not None else F.lit(
                None
            ).cast(ptypes[c])
            leg = leg.withColumn(c, lit)
        legs.append(leg.select(*out_order))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out
