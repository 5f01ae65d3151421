"""Delta table as a STREAMING SOURCE — interop IN for Structured
Streaming: ``spark.readStream.format("fp_delta_feed").option("path",
table_dir)`` tails an external Delta table's transaction log, the
production ingest pattern Delta calls "streaming from a table".

Semantics follow the public Delta source contract:

- **Initial snapshot**: by default the first micro-batch serves the
  FULL live snapshot at the version current when the stream starts
  (deletion vectors applied), then subsequent batches tail the log.
- ``option("startingVersion", n)`` skips the initial snapshot and
  replays the log's APPENDED files from version ``n`` inclusive
  (Delta's startingVersion contract: a nonexistent version fails
  loudly; latest+1 tails from the next commit).
- **Append-only gate**: a tailed commit containing ``remove`` actions
  or deletion-vector changes is NOT expressible as an append — the
  stream fails loudly (Delta's default), unless
  ``option("skipChangeCommits", "true")`` skips such commits entirely
  (Delta's skipChangeCommits semantics: their adds are NOT emitted).
- Rows are stamped with ``_commit_version`` (the snapshot version for
  the initial batch; the commit version for tailed files).

Feature support matches sources/delta.py: name-mode column mapping
(FLAT schemas — a mapped nested struct is refused loudly; the batch
reader's Arrow path renames top-level columns only), log-borne
partition values (typed via Arrow cast), deletion vectors in the
initial snapshot (decoded driver-side at planning via the backend
seam, positions shipped per partition — DV bitmaps are per-file and
metadata-sized). Log access rides ``versioned._backend_for``.

Offsets are ``{"version": N}`` with ``-1`` meaning "before the initial
snapshot"; snapshots/commits are immutable, so the checkpoint holds
the entire replay position and restart is exact (same contract as the
fp_versioned_feed source).

Reference parity: the reference polls MySQL by re-running full SELECTs
(ETL_FINAL.py:38); this is that ingestion seam as an incremental
stream over the lakehouse format, SURVEY.md §2.6 extension tier.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql.types import LongType, StructField, StructType

from .delta import (
    _check_protocol,
    _dv_file_path,
    _log_entries,
    _physicalize,
    delta_snapshot,
)
from .roaring import deserialize_rbm_array, positions_from_dv_blob, z85_decode


def _backend(table_dir: str):
    from .versioned import _backend_for

    return _backend_for(table_dir, None)


def _dv_positions(desc: dict, td: str, backend) -> list[int]:
    """Deleted row positions for one add's deletionVector descriptor,
    decoded DRIVER-side (planning time) through the backend seam —
    bitmaps are per-file and metadata-sized, and the planner already
    holds the log; executors then apply a plain positional mask."""
    if desc["storageType"] == "i":
        data = z85_decode(desc["pathOrInlineDv"])
        size = desc.get("sizeInBytes")
        if size is not None:
            data = data[: int(size)]
        return deserialize_rbm_array(data)
    blob = backend.read_bytes(_dv_file_path(desc, td))
    if blob is None:
        raise FileNotFoundError(f"deletion vector file missing for {desc}")
    return positions_from_dv_blob(
        blob, int(desc.get("offset") or 1), int(desc["sizeInBytes"])
    )


class _DeltaFilePartition(InputPartition):
    def __init__(self, file_path, version, read_cols, pvals, dead):
        self.file_path = file_path
        self.version = version
        self.read_cols = read_cols  # physical name per DATA column
        self.pvals = pvals  # partition col -> string value (logical order)
        self.dead = dead  # sorted deleted row positions (list[int]) or None


class DeltaFeedStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, table_dir: str, options: dict):
        if not schema.fields or schema.fields[-1].name != "_commit_version":
            raise ValueError(
                "fp_delta_feed requires the schema to end with the "
                "_commit_version bigint column (omit .schema(...) to use "
                "the source-provided one)"
            )
        self._td = table_dir.rstrip("/")
        sv = options.get("startingversion")
        self._starting_version = int(sv) if sv is not None else None
        self._skip_change = str(options.get("skipchangecommits", "")).lower() == "true"

        # resolve the TABLE schema (logical + physical) once, from the
        # head; schema drift mid-stream is surfaced by Spark's own
        # schema check on the emitted batches
        snap = delta_snapshot(self._td, backend=_backend(self._td))
        logical = StructType.fromJson(json.loads(snap["schema_json"]))
        mapped = snap["column_mapping_mode"] == "name"
        if mapped:
            from pyspark.sql.types import ArrayType, MapType

            def _nested(dt):
                return isinstance(dt, (StructType, ArrayType, MapType))

            if any(_nested(f.dataType) for f in logical.fields):
                raise ValueError(
                    "fp_delta_feed supports name-mode column mapping for "
                    "FLAT schemas only (the Arrow batch path renames "
                    "top-level columns); read nested mapped tables in "
                    "batch via read_delta"
                )
        physical = _physicalize(logical) if mapped else logical
        self._phys_of = {
            lf.name: pf.name for lf, pf in zip(logical.fields, physical.fields)
        }
        self._pcols = list(snap["partition_columns"])
        self._data_cols = [
            f.name for f in logical.fields if f.name not in self._pcols
        ]
        declared = [f.name for f in schema.fields[:-1]]
        want = [f.name for f in logical.fields]
        if declared != want:
            raise ValueError(
                f"fp_delta_feed schema mismatch: table declares {want}, "
                f"stream schema carries {declared}"
            )
        from pyspark.sql.pandas.types import to_arrow_type

        self._field_arrow = {
            f.name: to_arrow_type(f.dataType) for f in schema.fields[:-1]
        }

    # --- offsets ---------------------------------------------------------

    def initialOffset(self) -> dict:  # noqa: N802
        backend = _backend(self._td)
        commits, checkpoints = _log_entries(f"{self._td}/_delta_log", backend)
        latest = max(
            commits[-1] if commits else -1,
            max(checkpoints) if checkpoints else -1,
        )
        sv = self._starting_version
        if sv is not None:
            # Delta's startingVersion: replay the LOG from sv, no
            # initial snapshot; nonexistent versions fail loudly,
            # latest+1 tails from the next commit
            if latest < 0:
                raise ValueError(
                    f"startingVersion {sv} on {self._td}: the table has "
                    "no committed versions to replay"
                )
            if sv > latest + 1:
                raise ValueError(
                    f"startingVersion {sv} does not exist in {self._td} "
                    f"(latest committed version is {latest}; "
                    f"{latest + 1} tails from the next commit)"
                )
            if commits and sv < commits[0]:
                raise ValueError(
                    f"startingVersion {sv} predates the earliest retained "
                    f"commit {commits[0]} in {self._td} (checkpointed-away "
                    "history cannot replay as appends)"
                )
            return {"version": sv - 1, "snapshot_done": True}
        # initial-snapshot mode: nothing consumed yet; the snapshot
        # version is pinned at first latestOffset/partitions call
        return {"version": -1, "snapshot_done": False}

    def latestOffset(self) -> dict:  # noqa: N802
        backend = _backend(self._td)
        commits, checkpoints = _log_entries(f"{self._td}/_delta_log", backend)
        latest = max(
            commits[-1] if commits else -1,
            max(checkpoints) if checkpoints else -1,
        )
        return {"version": latest, "snapshot_done": True}

    # --- planning --------------------------------------------------------

    def _snapshot_partitions(self, v: int) -> list[_DeltaFilePartition]:
        backend = _backend(self._td)
        snap = delta_snapshot(self._td, v, backend=backend)
        out = []
        for path, pv in sorted(snap["files"].items()):
            desc = snap["dv"].get(path)
            dead = sorted(_dv_positions(desc, self._td, backend)) if desc else None
            out.append(self._partition_for(path, v, pv, dead))
        return out

    def _partition_for(self, path, v, pv, dead) -> _DeltaFilePartition:
        from urllib.parse import unquote

        p = unquote(path)
        fs_path = p if ("://" in p or p.startswith("/")) else f"{self._td}/{p}"
        pvals = {
            c: (pv or {}).get(self._phys_of.get(c, c)) for c in self._pcols
        }
        read_cols = [self._phys_of.get(c, c) for c in self._data_cols]
        return _DeltaFilePartition(fs_path, v, read_cols, pvals, dead)

    def _commit_actions(self, v: int, backend) -> tuple[list[dict], bool]:
        """(adds, is_change_commit) for commit ``v`` — a change commit
        carries removes or dv'd adds and is not expressible as an
        append."""
        txt = backend.read_text(f"{self._td}/_delta_log/{v:020d}.json")
        if txt is None:
            raise FileNotFoundError(
                f"commit {v} missing in {self._td}/_delta_log — history "
                "below a checkpoint cannot replay as appends (use "
                "startingVersion at or above the earliest retained commit)"
            )
        adds, change = [], False
        for line in txt.splitlines():
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if "remove" in action:
                change = True
            elif "add" in action:
                a = action["add"]
                if (a.get("deletionVector") or {}).get("storageType"):
                    change = True
                adds.append(a)
            elif "protocol" in action:
                _check_protocol(action["protocol"], self._td)
        return adds, change

    def partitions(self, start: dict, end: dict):  # noqa: N802
        backend = _backend(self._td)
        out: list[_DeltaFilePartition] = []
        from_v = int(start["version"]) + 1
        if not start.get("snapshot_done", True):
            # first batch = the full live snapshot at end.version
            v = int(end["version"])
            if v >= 0:
                out.extend(self._snapshot_partitions(v))
            return out
        for v in range(from_v, int(end["version"]) + 1):
            adds, change = self._commit_actions(v, backend)
            if change:
                if self._skip_change:
                    continue  # Delta skipChangeCommits: commit skipped whole
                raise ValueError(
                    f"commit {v} of {self._td} contains removes or "
                    "deletion-vector changes — a streaming source only "
                    "supports appends; set option('skipChangeCommits', "
                    "'true') to skip such commits, or re-stream from a "
                    "fresh initial snapshot"
                )
            for a in adds:
                out.append(
                    self._partition_for(a["path"], v, a.get("partitionValues"), None)
                )
        return out

    # --- execution (runs in the executor's Python worker) -----------------

    def read(self, partition: _DeltaFilePartition):
        import pyarrow as pa

        from .pyds import _read_parquet_batches

        offset = 0
        dead = partition.dead
        for raw in _read_parquet_batches(partition.file_path, partition.read_cols, []):
            n = raw.num_rows
            if dead:
                import numpy as np

                d = np.asarray(dead, dtype=np.int64)
                lo = int(np.searchsorted(d, offset, side="left"))
                hi = int(np.searchsorted(d, offset + n, side="left"))
                if hi > lo:
                    mask = np.ones(n, dtype=bool)
                    mask[d[lo:hi] - offset] = False
                    raw = raw.filter(pa.array(mask))
            offset += n
            cols, names = [], []
            data_arrays = dict(zip(partition.read_cols, raw.columns))
            # emit in DECLARED schema order: data columns renamed
            # physical -> logical, partition columns injected typed
            for f_name in [*self._field_arrow]:
                if f_name in self._pcols:
                    val = partition.pvals.get(f_name)
                    typ = self._field_arrow[f_name]
                    arr = pa.array([val] * raw.num_rows, pa.string()).cast(typ)
                else:
                    arr = data_arrays[
                        partition.read_cols[self._data_cols.index(f_name)]
                    ]
                cols.append(arr)
                names.append(f_name)
            cols.append(pa.array([partition.version] * raw.num_rows, pa.int64()))
            names.append("_commit_version")
            yield pa.RecordBatch.from_arrays(cols, names=names)

    def commit(self, end: dict) -> None:  # noqa: N802
        pass  # log is immutable; the checkpoint holds the position


class DeltaFeedDataSource(DataSource):
    """``spark.readStream.format("fp_delta_feed").option("path", d)``:
    initial snapshot + log tail of an external Delta table, rows
    stamped with ``_commit_version`` (see module doc)."""

    @classmethod
    def name(cls) -> str:
        return "fp_delta_feed"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("fp_delta_feed requires option('path', <table_dir>)")
        snap = delta_snapshot(path.rstrip("/"), backend=_backend(path))
        logical = StructType.fromJson(json.loads(snap["schema_json"]))
        return StructType(
            list(logical.fields) + [StructField("_commit_version", LongType(), False)]
        )

    def streamReader(self, schema: StructType) -> DeltaFeedStreamReader:  # noqa: N802
        return DeltaFeedStreamReader(schema, self.options["path"], dict(self.options))
