"""Delta table as a STREAMING SOURCE — interop IN for Structured
Streaming: ``spark.readStream.format("fp_delta_feed").option("path",
table_dir)`` tails an external Delta table's transaction log, the
production ingest pattern Delta calls "streaming from a table".

Semantics follow the public Delta source contract:

- **Initial snapshot**: by default the first served rows are the FULL
  live snapshot at the version current when the stream starts
  (deletion vectors applied), then subsequent batches tail the log.
- ``option("startingVersion", n)`` skips the initial snapshot and
  replays the log's APPENDED files from version ``n`` inclusive
  (Delta's startingVersion contract: a nonexistent version fails
  loudly; latest+1 tails from the next commit).
- ``option("startingTimestamp", t)`` (r13) resolves ``t`` (epoch
  seconds or ISO-8601, naive = UTC) to the EARLIEST version whose
  monotonic-adjusted commit time is at or after it — every commit at
  or after the timestamp replays, Delta-source parity — then behaves
  exactly like startingVersion; a timestamp past the newest commit
  tails from the next commit. Mutually exclusive with
  startingVersion.
- **dataChange semantics** (Delta's streaming-source contract): only
  actions with ``dataChange: true`` matter. An OPTIMIZE/compaction
  commit (removes + adds with ``dataChange: false`` — a rearrangement,
  not a data change) is passed over silently: its adds are NEVER
  emitted (the rows were already served from the files it compacted)
  and its removes do NOT trip the append-only gate.
- **Append-only gate**: a tailed commit containing ``dataChange: true``
  removes or deletion-vector changes is NOT expressible as an append —
  the stream fails loudly (Delta's default), unless
  ``option("skipChangeCommits", "true")`` skips such commits entirely
  (Delta's skipChangeCommits semantics: their adds are NOT emitted).
- **Mid-stream schema change**: a tailed ``metaData`` action whose
  schemaString or column-mapping configuration differs from the one
  the stream pinned at start fails loudly at PLANNING time ("schema
  changed mid-stream, restart the query") — never an obscure
  missing-column error inside an executor scan, and never stale
  columns silently served past an evolution.
- **Admission control**: ``option("maxFilesPerTrigger", n)`` /
  ``option("maxBytesPerTrigger", b)`` bound each micro-batch — the
  INITIAL SNAPSHOT and large commits split into bounded batches with
  exact file-granular restart (offsets carry a file index). maxBytes
  is a soft cap per Delta's contract: files are admitted until the
  budget is exceeded, at least one per batch; when both are set,
  whichever limit is hit first applies. At 100 TB this is the
  difference between "first batch = the whole table in one
  transaction" and a bounded, resumable backfill.
- Rows are stamped with ``_commit_version`` (the snapshot version for
  initial-snapshot batches; the commit version for tailed files).
- **Change data feed**: ``option("readChangeFeed", "true")`` streams
  CHANGE ROWS instead of appends — the initial snapshot serves as
  ``insert`` rows, cdc-authoritative commits serve their
  ``_change_data`` files (typed by the file's own ``_change_type``
  column), commits without cdc derive (dataChange adds as inserts,
  dataChange removes as deletes over the removed file's bytes MINUS
  any positions the remove's own deletionVector descriptor masks —
  rows an earlier DV commit already deleted are never re-emitted,
  OPTIMIZE contributes nothing), and add-side DV changes without cdc
  fail loudly — the same contract as the batch
  ``delta.read_delta_changes``. The append-only gate does not apply
  (a change feed exists to serve change commits); combining with
  skipChangeCommits is refused as contradictory. Admission control
  composes (the unit is a change FILE).

**Trigger caveat (Python DataSource API)**: ``Trigger.AvailableNow``
pins the FIRST ``latestOffset()`` as the run's terminal offset (the
Python source API has no SupportsTriggerAvailableNow/ReadLimit hook),
so a rate-limited availableNow run drains exactly ONE bounded batch
and terminates; re-run to continue (each run advances one batch,
checkpoint-exact). For steady multi-batch rate-limited draining use a
processingTime trigger. Unlimited availableNow serves everything
pending in one batch, as before.

Feature support matches sources/delta.py: name-mode column mapping
including NESTED schemas (struct/array/map field renames ride a
zero-copy arrow ``view`` — physical and logical schemas differ only
in field names), id-mode column mapping (r13: executors resolve each
FILE's columns by ``PARQUET:field_id`` schema metadata — file column
names are never consulted; a top-level id absent from a file reads
NULL), log-borne partition values (typed via Arrow cast),
deletion vectors in the initial snapshot. DV bitmaps decode
EXECUTOR-side: partitions carry only the metadata-sized DESCRIPTOR
(never position lists — a 10M-row DV would otherwise ride an ~80 MB
task pickle), and the executor fetches/decodes the referenced bytes
through a pyarrow filesystem. Log access rides
``versioned._backend_for``.

Offsets are ``{"version": N[, "index": K], "snapshot_done": B}``:
``index`` (present only mid-version) counts files already consumed of
version N's deterministic file list — the snapshot's sorted file set,
or a tailed commit's emittable adds in log order; absent index means
N fully consumed. ``{"version": -1, "snapshot_done": false}`` is
"before the initial snapshot". Unlimited streams emit exactly the
round-11 offset shape, so existing checkpoints resume unchanged.
Snapshots/commits are immutable, so the checkpoint holds the entire
replay position and restart is exact (same contract as the
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
    _adjusted_commit_times,
    _check_protocol,
    _dv_file_path,
    _log_entries,
    _physicalize,
    _ts_to_epoch,
    delta_snapshot,
)
from .roaring import deserialize_rbm_array, positions_from_dv_blob, z85_decode


def _backend(table_dir: str):
    from .versioned import _backend_for

    return _backend_for(table_dir, None)


def _offset(version: int, index: int | None, snapshot_done: bool) -> dict:
    """Canonical offset dict — FIXED key order and index omitted when
    the version is fully consumed, so a caught-up latestOffset
    re-emits byte-identical JSON (Spark compares offset strings for
    "new data available") and pre-rate-limit checkpoints stay valid."""
    if index is None:
        return {"version": version, "snapshot_done": snapshot_done}
    return {"version": version, "index": index, "snapshot_done": snapshot_done}


def _parse(offset: dict) -> tuple[int, int | None, bool]:
    return (
        int(offset["version"]),
        None if offset.get("index") is None else int(offset["index"]),
        bool(offset.get("snapshot_done", True)),
    )


def _pos_key(offset: dict) -> tuple:
    """Total order over stream positions (monotonic-advance guard)."""
    v, i, done = _parse(offset)
    big = float("inf")
    return (1 if done else 0, v, big if i is None else i)


class _DeltaFilePartition(InputPartition):
    def __init__(
        self, file_path, version, read_cols, pvals, dv_desc, table_dir,
        ctype=None, is_cdc=False, field_ids=None,
    ):
        self.file_path = file_path
        self.version = version
        self.read_cols = read_cols  # physical name per DATA column
        self.pvals = pvals  # partition col -> string value (logical order)
        self.dv_desc = dv_desc  # deletionVector DESCRIPTOR (metadata) or None
        self.table_dir = table_dir  # for executor-side DV resolution
        self.ctype = ctype  # CDF: constant _change_type, or None
        self.is_cdc = is_cdc  # CDF: _change_type lives IN the file
        self.field_ids = field_ids  # id mode: field id per DATA column


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
        st = options.get("startingtimestamp")
        if st is not None:
            if sv is not None:
                raise ValueError(
                    "pass either startingVersion or startingTimestamp, "
                    "not both (Delta source contract)"
                )
            self._starting_version = self._resolve_starting_timestamp(st)
        self._skip_change = str(options.get("skipchangecommits", "")).lower() == "true"
        self._cdf = str(options.get("readchangefeed", "")).lower() == "true"
        if self._cdf and self._skip_change:
            raise ValueError(
                "readChangeFeed and skipChangeCommits contradict each "
                "other (a change feed EXISTS to serve change commits) — "
                "pass one or the other"
            )
        mft = options.get("maxfilespertrigger")
        self._max_files = int(mft) if mft is not None else None
        if self._max_files is not None and self._max_files < 1:
            raise ValueError(
                f"maxFilesPerTrigger must be >= 1, got {self._max_files}"
            )
        mbt = options.get("maxbytespertrigger")
        self._max_bytes = int(mbt) if mbt is not None else None
        if self._max_bytes is not None and self._max_bytes < 1:
            raise ValueError(
                f"maxBytesPerTrigger must be >= 1, got {self._max_bytes}"
            )
        # last KNOWN stream position, for rate capping. Updated by
        # initialOffset / partitions / commit; every traced restart
        # path re-plans the checkpointed batch (partitions) before the
        # first latestOffset, so a rate-limited stream never caps from
        # a stale base. Monotonic: commit() of an old batch can arrive
        # after partitions() of a newer one.
        self._pos: dict | None = None
        # driver-side caches (log segments are immutable). Bounded:
        # a stream tails for months — unbounded per-version caches
        # would grow with the log, not with the working set.
        self._commit_cache: dict[int, tuple[list[dict], bool]] = {}
        self._snap_cache: dict[int, list] = {}
        self._cache_cap = 64

        # resolve the TABLE schema (logical + physical) once, from the
        # head, and PIN it: a tailed metaData that diverges fails the
        # stream at planning time
        snap = delta_snapshot(self._td, backend=_backend(self._td))
        self._pinned_schema_json = snap["schema_json"]
        self._pinned_mapping_conf = {
            k: v
            for k, v in (snap["configuration"] or {}).items()
            if k.startswith("delta.columnMapping.")
        }
        logical = StructType.fromJson(json.loads(snap["schema_json"]))
        self._id_mode = snap["column_mapping_mode"] == "id"
        mapped = snap["column_mapping_mode"] in ("name", "id")
        physical = _physicalize(logical) if mapped else logical
        self._phys_of = {
            lf.name: pf.name for lf, pf in zip(logical.fields, physical.fields)
        }
        self._pcols = list(snap["partition_columns"])
        self._data_cols = [
            f.name for f in logical.fields if f.name not in self._pcols
        ]
        self._data_field_ids = None
        if self._id_mode:
            # id mode (r13): executors resolve each FILE's columns by
            # parquet field id — file column names are never consulted
            from .delta import _ID_KEY

            ids = {}
            for f in logical.fields:
                fid = (f.metadata or {}).get(_ID_KEY)
                if fid is None:
                    raise ValueError(
                        f"id-mapped Delta schema field {f.name!r} carries "
                        f"no {_ID_KEY} metadata — refusing rather than "
                        "guessing field ids"
                    )
                ids[f.name] = int(fid)
            self._data_field_ids = [ids[n] for n in self._data_cols]
        declared = [f.name for f in schema.fields[:-1]]
        want = [f.name for f in logical.fields] + (
            ["_change_type"] if self._cdf else []
        )
        if declared != want:
            raise ValueError(
                f"fp_delta_feed schema mismatch: table declares {want}, "
                f"stream schema carries {declared}"
            )
        from pyspark.sql.pandas.types import to_arrow_type

        self._field_arrow = {
            f.name: to_arrow_type(f.dataType)
            for f in schema.fields[:-1]
            if f.name != "_change_type"
        }
        # arrow type each DATA column is READ under (physical nested
        # field names) vs emitted under (logical): same layout, names
        # only — executor renames via zero-copy Array.view
        phys_by_logical = {
            lf.name: pf for lf, pf in zip(logical.fields, physical.fields)
        }
        self._read_arrow = {
            n: to_arrow_type(phys_by_logical[n].dataType) for n in self._data_cols
        }

    def _resolve_starting_timestamp(self, st) -> int:
        """Delta's STREAMING startingTimestamp contract (r12 verdict
        item 6): the stream replays every commit whose (monotonic-
        adjusted, same as delta_version_as_of) commit time is AT OR
        AFTER the timestamp — i.e. the EARLIEST such version. A
        timestamp past the newest commit tails from the next commit
        (latest+1 — Delta's canReturnLastCommit shape, not an error:
        a stream is forward-looking, unlike batch AS OF). A timestamp
        at or before the earliest retained commit starts there."""
        try:
            ts = float(st)  # options arrive as strings: epoch-seconds
        except (TypeError, ValueError):
            ts = _ts_to_epoch(st)  # ISO-8601 (naive = UTC)
        backend = _backend(self._td)
        log_dir = f"{self._td}/_delta_log"
        commits, _cps = _log_entries(log_dir, backend)
        if not commits:
            raise ValueError(
                f"startingTimestamp on {self._td}: the table has no "
                "commit JSON retained to resolve a timestamp against"
            )
        adjusted = _adjusted_commit_times(log_dir, commits, backend)
        for c, mt in adjusted:
            if mt >= ts:
                return c
        return adjusted[-1][0] + 1  # beyond the head: tail from next

    # --- position bookkeeping ---------------------------------------------

    def _advance(self, offset: dict) -> None:
        if self._pos is None or _pos_key(offset) > _pos_key(self._pos):
            self._pos = dict(offset)

    def _latest_version(self, backend) -> int:
        commits, checkpoints = _log_entries(f"{self._td}/_delta_log", backend)
        return max(
            commits[-1] if commits else -1,
            max(checkpoints) if checkpoints else -1,
        )

    # --- offsets ------------------------------------------------------------

    def _initial(self) -> dict:
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
            return _offset(sv - 1, None, True)
        # initial-snapshot mode: nothing consumed yet; the snapshot
        # version is pinned at the first latestOffset/partitions call
        return _offset(-1, None, False)

    def initialOffset(self) -> dict:  # noqa: N802
        off = self._initial()
        self._advance(off)
        return off

    def latestOffset(self) -> dict:  # noqa: N802
        backend = _backend(self._td)
        latest = self._latest_version(backend)
        if self._max_files is None and self._max_bytes is None:
            return _offset(latest, None, True)
        # rate-limited: walk forward from the last known position by
        # files, within the file/byte budget. On the very first call of
        # a FRESH stream latestOffset precedes initialOffset — derive
        # the base the same way initialOffset would.
        base = self._pos if self._pos is not None else self._initial()
        bv, bi, bdone = _parse(base)
        taken_files = 0
        taken_bytes = 0

        def room(size: int) -> bool:
            if self._max_files is not None and taken_files >= self._max_files:
                return False
            if (
                self._max_bytes is not None
                and taken_files >= 1  # always admit at least one file
                and taken_bytes >= self._max_bytes
            ):
                return False
            return True

        if not bdone:
            # snapshot mode: pin S at the head current NOW (first call)
            # or keep the pinned S; never cross into the tail in the
            # same batch (keeps the snapshot version recoverable from
            # the offset pair alone)
            if bv < 0:
                if latest < 0:
                    return dict(base)  # no committed version yet
                s, j = latest, 0
            else:
                s, j = bv, (bi or 0)
            files = self._snapshot_list(s)
            for _path, _pv, _dv, size in files[j:]:
                if not room(size):
                    break
                taken_files += 1
                taken_bytes += size
            j2 = j + taken_files
            if j2 < len(files):
                return _offset(s, j2, False)
            return _offset(s, None, True)
        pos_v, pos_i = bv, bi  # pos_i None = bv fully consumed
        v = bv if bi is not None else bv + 1
        while v <= latest:
            adds = (
                self._commit_changes(v, backend)
                if self._cdf
                else self._commit_files(v, backend)
            )
            j = pos_i if (v == bv and bi is not None) else 0
            took = 0
            for a in adds[j:]:
                if not room(int(a.get("size") or 0)):
                    break
                took += 1
                taken_files += 1
                taken_bytes += int(a.get("size") or 0)
            j2 = j + took
            if j2 < len(adds):
                if j2 == j:
                    # budget exhausted at v's boundary without entering
                    # it (the first file of a batch is always admitted,
                    # so no-progress mid-version cannot happen): end at
                    # the last FULL position, canonical form
                    return _offset(pos_v, pos_i, True)
                return _offset(v, j2, True)
            pos_v, pos_i = v, None
            v += 1
        return _offset(pos_v, pos_i, True)

    # --- planning -------------------------------------------------------

    def _snapshot_list(self, v: int) -> list:
        """Deterministic snapshot file list at version ``v``:
        [(path, partitionValues, dv_descriptor, size)] sorted by path —
        the order both latestOffset (budget walk) and partitions
        (slicing) index into."""
        cached = self._snap_cache.get(v)
        if cached is not None:
            return cached
        snap = delta_snapshot(self._td, v, backend=_backend(self._td))
        snap_conf = {
            k: val
            for k, val in (snap["configuration"] or {}).items()
            if k.startswith("delta.columnMapping.")
        }
        if (
            snap["schema_json"] != self._pinned_schema_json
            or snap_conf != self._pinned_mapping_conf
        ):
            raise ValueError(
                f"snapshot version {v} of {self._td} carries a different "
                "schema or column mapping than the one this stream pinned "
                "at start — the table changed mid-stream; restart the "
                "query to pick up the new schema"
            )
        out = [
            (
                path,
                pv,
                snap["dv"].get(path),
                int(snap["sizes"].get(path) or 0),
            )
            for path, pv in sorted(snap["files"].items())
        ]
        while len(self._snap_cache) >= getattr(self, "_cache_cap", 64):
            self._snap_cache.pop(next(iter(self._snap_cache)))
        self._snap_cache[v] = out
        return out

    def _partition_for(
        self, path, v, pv, dv_desc, ctype=None, is_cdc=False
    ) -> _DeltaFilePartition:
        from urllib.parse import unquote

        p = unquote(path)
        fs_path = p if ("://" in p or p.startswith("/")) else f"{self._td}/{p}"
        pvals = {
            c: (pv or {}).get(self._phys_of.get(c, c)) for c in self._pcols
        }
        read_cols = [self._phys_of.get(c, c) for c in self._data_cols]
        return _DeltaFilePartition(
            fs_path, v, read_cols, pvals, dv_desc, self._td,
            ctype=ctype, is_cdc=is_cdc,
            field_ids=getattr(self, "_data_field_ids", None),
        )

    def _commit_changes(self, v: int, backend) -> list[dict]:
        """CDF mode's per-commit emittable units, in deterministic
        order: a cdc-authoritative commit yields its ``_change_data``
        files (type read FROM the file); a commit without cdc derives
        — dataChange adds as ``insert`` units, dataChange removes as
        ``delete`` units over the removed file's bytes minus the
        remove's own DV-masked positions, OPTIMIZE contributes
        nothing; an add-side DV change without cdc is refused (same
        contract as read_delta_changes). Cached + pinned-schema
        checked like _commit_files."""
        cache = getattr(self, "_cdf_cache", None)
        if cache is None:
            cache = self._cdf_cache = {}
        if v in cache:
            return cache[v]
        txt = backend.read_text(f"{self._td}/_delta_log/{v:020d}.json")
        if txt is None:
            raise FileNotFoundError(
                f"commit {v} missing in {self._td}/_delta_log — history "
                "below a checkpoint cannot replay as a change feed"
            )
        adds, removes, cdcs, dv_change = [], [], [], False
        for line in txt.splitlines():
            line = line.strip()
            if not line:
                continue
            action = json.loads(line)
            if "cdc" in action:
                cdcs.append(action["cdc"])
            elif "add" in action:
                a = action["add"]
                if (a.get("deletionVector") or {}).get("storageType"):
                    dv_change = True
                if a.get("dataChange", True):
                    adds.append(a)
            elif "remove" in action:
                r = action["remove"]
                if r.get("dataChange", True):
                    removes.append(r)
            elif "protocol" in action:
                _check_protocol(action["protocol"], self._td)
            elif "metaData" in action:
                m = action["metaData"]
                m_conf = {
                    k: val
                    for k, val in (m.get("configuration") or {}).items()
                    if k.startswith("delta.columnMapping.")
                }
                if (
                    m.get("schemaString") != self._pinned_schema_json
                    or m_conf != self._pinned_mapping_conf
                ):
                    raise ValueError(
                        f"commit {v} of {self._td} changes the table "
                        "schema or column mapping mid-stream — restart "
                        "the query to pick up the new schema"
                    )
        if cdcs:
            units = [
                {
                    "path": c["path"],
                    "partitionValues": c.get("partitionValues"),
                    "size": int(c.get("size") or 0),
                    "ctype": None,
                    "cdc": True,
                }
                for c in cdcs
            ]
        else:
            if dv_change:
                raise ValueError(
                    f"commit {v} of {self._td} changes deletion vectors "
                    "without cdc files — positional masks cannot be "
                    "rederived as row changes; a spec-compliant CDF "
                    "writer emits _change_data for DV commits"
                )
            units = [
                {
                    "path": a["path"],
                    "partitionValues": a.get("partitionValues"),
                    "size": int(a.get("size") or 0),
                    "ctype": "insert",
                    "cdc": False,
                }
                for a in adds
            ] + [
                {
                    "path": r["path"],
                    "partitionValues": r.get("partitionValues"),
                    "size": int(r.get("size") or 0),
                    "ctype": "delete",
                    "cdc": False,
                    # remove-side DV descriptor: positions already dead
                    # BEFORE this remove — the executor-side mask
                    # subtracts them so derived deletes never re-emit
                    # rows an earlier DV commit deleted (ADVICE r12)
                    "dv": (
                        r["deletionVector"]
                        if (r.get("deletionVector") or {}).get("storageType")
                        else None
                    ),
                }
                for r in removes
            ]
        while len(cache) >= getattr(self, "_cache_cap", 64):
            cache.pop(next(iter(cache)))
        cache[v] = units
        return units

    def _commit_files(self, v: int, backend) -> list[dict]:
        """The emittable adds of commit ``v``, in log order — after
        dataChange filtering, the append-only gate, and the pinned-
        schema check. Cached (commits are immutable). Raises on a
        dataChange change commit unless skipChangeCommits (-> [])."""
        cached = self._commit_cache.get(v)
        if cached is not None:
            adds, change = cached
        else:
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
                    # dataChange=false removes are OPTIMIZE/compaction
                    # rearrangements, not data changes (Delta contract)
                    if action["remove"].get("dataChange", True):
                        change = True
                elif "add" in action:
                    a = action["add"]
                    if not a.get("dataChange", True):
                        # a compaction's adds re-house already-served
                        # rows: emitting them would duplicate data
                        continue
                    if (a.get("deletionVector") or {}).get("storageType"):
                        change = True
                    adds.append(a)
                elif "protocol" in action:
                    _check_protocol(action["protocol"], self._td)
                elif "metaData" in action:
                    m = action["metaData"]
                    m_conf = {
                        k: val
                        for k, val in (m.get("configuration") or {}).items()
                        if k.startswith("delta.columnMapping.")
                    }
                    if (
                        m.get("schemaString") != self._pinned_schema_json
                        or m_conf != self._pinned_mapping_conf
                    ):
                        raise ValueError(
                            f"commit {v} of {self._td} changes the table "
                            "schema or column mapping mid-stream — restart "
                            "the query to pick up the new schema (the "
                            "stream pinned the schema at start; serving "
                            "old columns past an evolution would be "
                            "silently wrong)"
                        )
            while len(self._commit_cache) >= getattr(self, "_cache_cap", 64):
                self._commit_cache.pop(next(iter(self._commit_cache)))
            self._commit_cache[v] = (adds, change)
        if change:
            if self._skip_change:
                return []  # Delta skipChangeCommits: commit skipped whole
            raise ValueError(
                f"commit {v} of {self._td} contains removes or "
                "deletion-vector changes — a streaming source only "
                "supports appends; set option('skipChangeCommits', "
                "'true') to skip such commits, or re-stream from a "
                "fresh initial snapshot"
            )
        return adds

    def partitions(self, start: dict, end: dict):  # noqa: N802
        backend = _backend(self._td)
        out: list[_DeltaFilePartition] = []
        sv, si, sdone = _parse(start)
        ev, ei, edone = _parse(end)
        try:
            if not sdone:
                # snapshot mode: S is pinned in whichever offset names it
                s = ev if sv < 0 else sv
                cdf = self._cdf
                snap_ct = "insert" if cdf else None
                if s >= 0:
                    files = self._snapshot_list(s)
                    lo = 0 if sv < 0 else (si or 0)
                    hi = len(files) if (edone or ei is None) else ei
                    for path, pv, dv, _size in files[lo:hi]:
                        out.append(self._partition_for(path, s, pv, dv, ctype=snap_ct))
                    # a mid-snapshot checkpoint restarted WITHOUT rate
                    # limits: the unlimited latestOffset names the true
                    # head, so this batch must also carry the tail
                    # commits (s, ev] or they would never be served
                    if edone and ev > s:
                        for v in range(s + 1, ev + 1):
                            out.extend(self._tail_partitions(v, backend))
                return out
            from_v = sv if si is not None else sv + 1
            for v in range(from_v, ev + 1):
                units = self._tail_partitions(v, backend)
                lo = si if (v == sv and si is not None) else 0
                hi = ei if (v == ev and ei is not None) else len(units)
                out.extend(units[lo:hi])
            return out
        finally:
            self._advance(end)

    def _tail_partitions(self, v: int, backend) -> list[_DeltaFilePartition]:
        """Partitions for tailed commit ``v``, in the same deterministic
        order the rate walk counted — append mode emits adds; CDF mode
        emits change units (constant-typed derive files or cdc files
        whose type is a column)."""
        if self._cdf:
            return [
                self._partition_for(
                    u["path"], v, u.get("partitionValues"), u.get("dv"),
                    ctype=u["ctype"], is_cdc=u["cdc"],
                )
                for u in self._commit_changes(v, backend)
            ]
        return [
            self._partition_for(a["path"], v, a.get("partitionValues"), None)
            for a in self._commit_files(v, backend)
        ]

    # --- execution (runs in the executor's Python worker) -----------------

    def _dead_positions(self, partition: _DeltaFilePartition):
        """Decode the partition's deletionVector DESCRIPTOR to sorted
        deleted positions — EXECUTOR-side (only the metadata-sized
        descriptor rides the task pickle; file-backed bitmaps are
        fetched through a pyarrow filesystem here)."""
        desc = partition.dv_desc
        if not desc:
            return None
        if desc["storageType"] == "i":
            data = z85_decode(desc["pathOrInlineDv"])
            size = desc.get("sizeInBytes")
            if size is not None:
                data = data[: int(size)]
            return sorted(deserialize_rbm_array(data))
        from .pyds import _fs_and_path

        path = _dv_file_path(desc, partition.table_dir)
        fs, p = _fs_and_path(path)
        with fs.open_input_stream(p) as f:
            blob = f.read()
        return sorted(
            positions_from_dv_blob(
                blob, int(desc.get("offset") or 1), int(desc["sizeInBytes"])
            )
        )

    def _resolve_field_ids(self, partition) -> tuple[list[str], dict]:
        """id mode, executor-side: map each wanted field id to THIS
        file's column name from its parquet/arrow schema metadata
        (``PARQUET:field_id``) — file column names are never trusted.
        An id absent from the file (post-ADD-COLUMN) reads as NULL via
        the added-column backfill (top-level; nested id evolution is
        the batch reader's Spark-native territory)."""
        import pyarrow.dataset as pads

        from .pyds import _fs_and_path

        fs, p = _fs_and_path(partition.file_path)
        sch = pads.dataset(p, format="parquet", filesystem=fs).schema
        file_names = set(sch.names)
        by_id: dict[int, str] = {}
        for f in sch:
            fid = (f.metadata or {}).get(b"PARQUET:field_id")
            if fid is not None:
                by_id[int(fid)] = f.name
        resolved: list[str] = []
        added: dict = {}
        for logical_name, fid in zip(self._data_cols, partition.field_ids):
            name = by_id.get(fid)
            if name is None:
                # id absent from this file -> ALWAYS null-backfill. Never
                # fall back to the logical name: in id mode a file may
                # legally contain a column with that name under a
                # DIFFERENT field id (rename/swap), and reading its data
                # would be silent wrongness. A sentinel name guaranteed
                # absent from the file forces _read_parquet_batches down
                # the null-backfill path unconditionally.
                sentinel = f"__fp_absent_fid_{fid}"
                while sentinel in file_names:
                    sentinel += "_"
                resolved.append(sentinel)
                added[sentinel] = self._field_arrow[logical_name]
            else:
                resolved.append(name)
        return resolved, added

    def read(self, partition: _DeltaFilePartition):
        import pyarrow as pa

        from .pyds import _read_parquet_batches

        offset = 0
        dead = self._dead_positions(partition)
        read_arrow = getattr(self, "_read_arrow", {})
        cdf = getattr(self, "_cdf", False)
        is_cdc = getattr(partition, "is_cdc", False)
        id_mode = bool(getattr(partition, "field_ids", None))
        added_arrow = None
        if id_mode:
            data_keys, added_arrow = self._resolve_field_ids(partition)
        else:
            data_keys = list(partition.read_cols)
        key_of = dict(zip(self._data_cols, data_keys))
        want_cols = data_keys + (["_change_type"] if is_cdc else [])
        for raw in _read_parquet_batches(
            partition.file_path, want_cols, [], added_arrow
        ):
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
            data_arrays = dict(zip(want_cols, raw.columns))
            # emit in DECLARED schema order: data columns renamed
            # physical -> logical (nested field names via zero-copy
            # view — layouts are identical, only names differ),
            # partition columns injected typed
            for f_name in [*self._field_arrow]:
                typ = self._field_arrow[f_name]
                if f_name in self._pcols:
                    val = partition.pvals.get(f_name)
                    arr = pa.array([val] * raw.num_rows, pa.string()).cast(typ)
                else:
                    arr = data_arrays[key_of[f_name]]
                    phys_typ = read_arrow.get(f_name)
                    # nested mapped schema: the read type differs from
                    # the logical one in FIELD NAMES only — zero-copy
                    # rename (flat mappings rename via `names` below).
                    # id mode: the FILE's nested names are arbitrary,
                    # so normalize to the logical type whenever they
                    # differ (layouts are identical by id contract)
                    if (
                        phys_typ is not None and phys_typ != typ and arr.type != typ
                    ) or (id_mode and arr.type != typ):
                        if isinstance(arr, pa.ChunkedArray):
                            arr = arr.combine_chunks()
                        arr = arr.view(typ)
                cols.append(arr)
                names.append(f_name)
            if cdf:
                if is_cdc:
                    ct = data_arrays["_change_type"]
                    if isinstance(ct, pa.ChunkedArray):
                        ct = ct.combine_chunks()
                else:
                    ct = pa.array(
                        [getattr(partition, "ctype", None)] * raw.num_rows,
                        pa.string(),
                    )
                cols.append(ct)
                names.append("_change_type")
            cols.append(pa.array([partition.version] * raw.num_rows, pa.int64()))
            names.append("_commit_version")
            yield pa.RecordBatch.from_arrays(cols, names=names)

    def commit(self, end: dict) -> None:  # noqa: N802
        # log is immutable; the checkpoint holds the position — only
        # the rate-cap base advances here
        self._advance(end)


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
        extra = []
        if str(self.options.get("readchangefeed", "")).lower() == "true":
            from pyspark.sql.types import StringType

            extra.append(StructField("_change_type", StringType(), True))
        return StructType(
            list(logical.fields)
            + extra
            + [StructField("_commit_version", LongType(), False)]
        )

    def streamReader(self, schema: StructType) -> DeltaFeedStreamReader:  # noqa: N802
        return DeltaFeedStreamReader(schema, self.options["path"], dict(self.options))
