"""Apache ICEBERG table reader — interop IN for the second major
open table format, built the same way as the Delta reader
(sources/delta.py): directly from the PUBLIC Iceberg table spec
(https://iceberg.apache.org/spec/, v1 + v2), no Iceberg runtime JAR.

Read path per the spec:

1. ``metadata/`` holds ``*.metadata.json`` (``vN.metadata.json`` or
   the ``NNNNN-uuid.metadata.json`` object-store form); the CURRENT
   one is the highest version (``version-hint.text`` is consulted as
   a hint, listing stays authoritative — same stance as Delta's
   ``_last_checkpoint``).
2. The metadata names snapshots; each snapshot points at ONE
   manifest-list Avro file; manifest lists name manifest Avro files
   (``content``: 0 = data, 1 = deletes) with their sequence numbers;
   manifests carry entries (``status``: 1 added / 0 existing /
   2 deleted) whose ``data_file`` records name the parquet data /
   delete files. All Avro decoding rides the from-scratch codec in
   sources/avro.py (this container has no Avro library) — and is
   METADATA-plane only, driver-side, exactly like Delta log replay.
3. The scan resolves columns BY FIELD ID (Iceberg's core contract —
   file column names are never trusted): the Iceberg schema
   (``fields: [{id, name, required, type}]``, nested struct/list/map
   forms) converts to a Spark schema annotated with
   ``parquet.field.id`` metadata and scans under the same cloned
   field-id session the Delta id-mode reader uses
   (delta._id_scan_session); a field id absent from a file
   (ADD COLUMN) reads NULL. Iceberg data files always CONTAIN their
   partition columns (identity transforms), so no partition-value
   injection is needed.
4. **Row-level deletes (v2, merge-on-read)**: POSITION delete files
   (parquet: ``file_path``, ``pos``) anti-join the scan on
   (file, row position) for data files whose data sequence number is
   <= the delete file's; EQUALITY delete files anti-join on their
   ``equality_ids`` columns for data files whose sequence number is
   STRICTLY LESS than the delete's — both per the spec's sequence-
   number application rules, expressed as two anti-joins over ONE
   data scan with a broadcast (file -> sequence number) tag.

Time travel: ``snapshot_id=`` or ``as_of=`` (epoch seconds / ISO
string, resolved through the metadata's ``snapshot-log``). Unsupported
shapes are refused loudly: format versions > 2, non-parquet file
formats, unknown types.

Caveat, stated plainly (mirror of the Delta reader's): no Iceberg
runtime ships in this container, so fixtures are synthesized per the
spec (tests/test_iceberg.py) with the same Avro codec the reader
uses; field-shape fidelity rests on the spec text.

Reference parity: the reference ingests external tables by full MySQL
SELECT (ETL_FINAL.py:38); this is that ingestion seam pointed at the
second lakehouse format, SURVEY.md §2.6 extension tier.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from .avro import read_avro_file

_META_V = re.compile(r"^v(\d+)\.metadata\.json$")
_META_OBJ = re.compile(r"^(\d+)-[0-9a-fA-F-]+(?:\.gz)?\.metadata\.json$")
_DECIMAL = re.compile(r"^decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)$")
_FIXED = re.compile(r"^fixed\[(\d+)\]$")

_FIELD_ID_KEY = "parquet.field.id"


def _backend(table_dir: str, spark=None):
    from .versioned import _backend_for

    return _backend_for(table_dir, spark)


def _spark_type(t):
    """Iceberg type (spec string or nested dict) -> Spark type."""
    if isinstance(t, str):
        prim = {
            "boolean": BooleanType(),
            "int": IntegerType(),
            "long": LongType(),
            "float": FloatType(),
            "double": DoubleType(),
            "date": DateType(),
            "string": StringType(),
            "uuid": StringType(),
            "binary": BinaryType(),
            "timestamp": TimestampNTZType(),
            "timestamptz": TimestampType(),
        }
        if t in prim:
            return prim[t]
        m = _DECIMAL.match(t)
        if m:
            return DecimalType(int(m.group(1)), int(m.group(2)))
        if _FIXED.match(t):
            return BinaryType()
        raise ValueError(f"unsupported Iceberg type {t!r}")
    kind = t.get("type")
    if kind == "struct":
        return StructType([_field(f) for f in t["fields"]])
    if kind == "list":
        from pyspark.sql.types import ArrayType

        et = _spark_type(t["element"])
        # element ids ride nested parquet.field.id via the struct-free
        # path; Spark's field-id resolution matches list elements
        # positionally under the annotated parent
        return ArrayType(et, not t.get("element-required", False))
    if kind == "map":
        from pyspark.sql.types import MapType

        return MapType(
            _spark_type(t["key"]),
            _spark_type(t["value"]),
            not t.get("value-required", False),
        )
    raise ValueError(f"unsupported Iceberg type {t!r}")


def _field(f: dict) -> StructField:
    return StructField(
        f["name"],
        _spark_type(f["type"]),
        not f.get("required", False),
        {_FIELD_ID_KEY: int(f["id"])},
    )


def iceberg_schema_to_spark(schema: dict) -> StructType:
    """Iceberg schema JSON -> Spark StructType with parquet.field.id
    metadata on every top-level field (nested struct fields carry
    theirs recursively via _field)."""
    return StructType([_field(f) for f in schema["fields"]])


def _current_metadata(td: str, backend) -> dict:
    meta_dir = f"{td}/metadata"
    names = backend.list_names(meta_dir)
    candidates: list[tuple[int, str]] = []
    for n in names:
        m = _META_V.match(n) or _META_OBJ.match(n)
        if m:
            candidates.append((int(m.group(1)), n))
    if not candidates:
        raise FileNotFoundError(
            f"not an Iceberg table: no *.metadata.json under {meta_dir}"
        )
    hint = backend.read_text(f"{meta_dir}/version-hint.text")
    if hint:
        try:
            hv = int(hint.strip())
            if hv > max(v for v, _n in candidates):
                import warnings

                warnings.warn(
                    f"version-hint.text in {meta_dir} names version {hv} "
                    "but the listing found no such metadata file — a torn "
                    "commit; reading the newest listed metadata",
                    RuntimeWarning,
                    stacklevel=2,
                )
        except ValueError:
            pass  # torn hint: listing rules (same stance as Delta)
    _v, name = max(candidates)
    if name.endswith(".gz.metadata.json"):
        # _META_OBJ admits the spec's gzip-compressed form — decompress
        # it rather than handing gzip bytes to json.loads (which fails
        # with an opaque decode error).
        import gzip

        raw = backend.read_bytes(f"{meta_dir}/{name}")
        if raw is None:
            raise FileNotFoundError(f"metadata file {name} vanished in {meta_dir}")
        return json.loads(gzip.decompress(raw).decode("utf-8"))
    txt = backend.read_text(f"{meta_dir}/{name}")
    if txt is None:
        raise FileNotFoundError(f"metadata file {name} vanished in {meta_dir}")
    return json.loads(txt)


def _resolve_path(p: str, td: str) -> str:
    """Manifest/data paths in metadata are absolute per spec, but
    synthesized / relocated tables use relative or stale-prefix forms;
    anchor anything under the table's own directory name."""
    if "://" in p:
        # strip scheme'd prefixes down to the table-relative suffix
        # when the table has moved (the spec stores absolute URIs)
        marker = "/" + td.rsplit("/", 1)[-1] + "/"
        idx = p.find(marker)
        if idx >= 0:
            return td + p[idx + len(marker) - 1:]
        return p
    return p if p.startswith("/") else f"{td}/{p}"


def iceberg_snapshot(
    table_dir: str,
    snapshot_id: int | None = None,
    as_of=None,
    spark=None,
    backend=None,
) -> dict:
    """Resolve table state at a snapshot: ``{"snapshot_id", "schema",
    "data_files": [{path, seq, record_count}], "position_deletes":
    [{path, seq}], "equality_deletes": [{path, seq, equality_ids}],
    "format_version"}``. Pure metadata replay (JSON + Avro),
    driver-side, O(manifests)."""
    backend = backend or _backend(table_dir, spark)
    td = table_dir.rstrip("/")
    meta = _current_metadata(td, backend)
    fv = int(meta.get("format-version", 1))
    if fv > 2:
        raise ValueError(
            f"Iceberg format-version {fv} (> 2) in {td} — refusing an "
            "unknown spec revision"
        )
    if as_of is not None:
        if snapshot_id is not None:
            raise ValueError("pass either snapshot_id or as_of, not both")
        from .delta import _ts_to_epoch

        ts_ms = _ts_to_epoch(as_of) * 1000.0
        best = None
        for entry in meta.get("snapshot-log") or []:
            if entry["timestamp-ms"] <= ts_ms:
                best = entry["snapshot-id"]
        if best is None:
            raise FileNotFoundError(
                f"no Iceberg snapshot in {td} at or before {as_of}"
            )
        snapshot_id = best
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots") or []}
    sid = (
        snapshot_id
        if snapshot_id is not None
        else meta.get("current-snapshot-id")
    )
    if sid is None or sid == -1 or sid not in snaps:
        raise FileNotFoundError(
            f"snapshot {sid} not present in {td} "
            f"(known: {sorted(snaps)})"
        )
    snap = snaps[sid]

    # schema: v2 = schemas[] + (snapshot's schema-id else current); v1 = schema
    schema = None
    schema_id = snap.get("schema-id", meta.get("current-schema-id"))
    for s in meta.get("schemas") or []:
        if s.get("schema-id") == schema_id:
            schema = s
    if schema is None:
        schema = meta.get("schema")
    if schema is None:
        raise ValueError(f"no schema resolvable for snapshot {sid} of {td}")

    def _read_avro(path: str) -> list:
        p = _resolve_path(path, td)
        data = backend.read_bytes(p)
        if data is None:
            raise FileNotFoundError(f"Iceberg metadata file missing: {p}")
        _schema, records = read_avro_file(data)
        return records

    ml_path = snap.get("manifest-list")
    if not ml_path:
        raise ValueError(
            f"snapshot {sid} of {td} carries no manifest-list — the v1 "
            "inline-manifests form predates the spec's current layout; "
            "refusing"
        )
    data_files: list[dict] = []
    pos_deletes: list[dict] = []
    eq_deletes: list[dict] = []
    for m in _read_avro(ml_path):
        content = int(m.get("content") or 0)  # 0 data, 1 deletes
        m_seq = int(m.get("sequence_number") or 0)
        for entry in _read_avro(m["manifest_path"]):
            status = int(entry.get("status") or 0)
            if status == 2:  # DELETED
                continue
            df_ = entry["data_file"]
            fmt = str(df_.get("file_format") or "PARQUET").upper()
            if fmt != "PARQUET":
                raise ValueError(
                    f"Iceberg data file format {fmt!r} in {td} — only "
                    "PARQUET is supported; refusing"
                )
            # v2 sequence-number inheritance: per the spec, ONLY
            # status=1 (ADDED) entries may inherit the manifest's
            # sequence number; an EXISTING (status=0) entry with a null
            # seq in a v2 manifest is malformed (a rewritten manifest
            # must carry the original seq forward) and inheriting the
            # newer manifest's seq would change which deletes apply.
            # v1 has no sequence numbers (treat as 0).
            seq = entry.get("sequence_number")
            if seq is None:
                if fv >= 2 and status == 0:
                    raise ValueError(
                        f"EXISTING (status=0) manifest entry for "
                        f"{df_.get('file_path')!r} carries a null "
                        "sequence_number in v2 metadata — malformed; "
                        "refusing"
                    )
                seq = m_seq
            else:
                seq = int(seq)
            rec = {
                "path": _resolve_path(df_["file_path"], td),
                "seq": seq,
                "record_count": int(df_.get("record_count") or 0),
            }
            fcontent = int(df_.get("content") or 0)
            if content == 0 and fcontent == 0:
                data_files.append(rec)
            elif fcontent == 1:
                pos_deletes.append(rec)
            elif fcontent == 2:
                eq = df_.get("equality_ids")
                if not eq:
                    raise ValueError(
                        f"equality delete file {rec['path']} carries no "
                        "equality_ids — refusing"
                    )
                rec["equality_ids"] = [int(i) for i in eq]
                eq_deletes.append(rec)
            else:
                raise ValueError(
                    f"manifest content={content} carries data_file "
                    f"content={fcontent} — malformed metadata"
                )
    return {
        "snapshot_id": sid,
        "format_version": fv,
        "schema": schema,
        "data_files": data_files,
        "position_deletes": pos_deletes,
        "equality_deletes": eq_deletes,
    }


def read_iceberg(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    as_of=None,
    backend=None,
) -> DataFrame:
    """Read an Iceberg table snapshot as a DataFrame (see module doc).

    Plan shape: ONE field-id-resolved scan of the live data files +
    a broadcast (file basename -> sequence number) tag; position
    deletes apply as one positional anti-join gated on
    ``delete_seq >= data_seq``; each distinct equality-id set applies
    as one anti-join on its columns gated on ``delete_seq >
    data_seq`` — per the spec's application rules. No per-file plan
    fan-out; delete frames are merge-on-read small by design."""
    from .delta import _id_scan_session

    backend = backend or _backend(table_dir, spark)
    td = table_dir.rstrip("/")
    snap = iceberg_snapshot(
        td, snapshot_id=snapshot_id, as_of=as_of, spark=spark, backend=backend
    )
    logical = iceberg_schema_to_spark(snap["schema"])
    out_order = [f.name for f in logical.fields]
    if not snap["data_files"]:
        return spark.createDataFrame([], logical)

    scan_spark = _id_scan_session(spark)
    paths = sorted({d["path"] for d in snap["data_files"]})
    seq_of: dict[str, int] = {}
    path_of: dict[str, str] = {}
    for d in snap["data_files"]:
        bn = d["path"].rsplit("/", 1)[-1]
        # TWO DISTINCT data files sharing a basename would alias under
        # the basename join key (position deletes targeting one would
        # delete the same row positions in the other) — refuse on ANY
        # duplicate basename across distinct paths, matching
        # read_delta's stricter collision stance; equal-seq duplicates
        # of the SAME path are benign re-listings.
        if bn in path_of and path_of[bn] != d["path"]:
            raise ValueError(
                f"data-file basename collision across distinct paths: "
                f"{path_of[bn]!r} vs {d['path']!r}"
            )
        if bn in seq_of and seq_of[bn] != d["seq"]:
            raise ValueError(
                f"data-file basename collision with differing sequence "
                f"numbers: {bn}"
            )
        path_of[bn] = d["path"]
        seq_of[bn] = d["seq"]

    scanned = scan_spark.read.schema(logical).parquet(*paths)
    need_tag = bool(snap["position_deletes"]) or bool(snap["equality_deletes"])
    if not need_tag:
        return scanned.select(*out_order)

    scanned = scanned.withColumn(
        "__ib_file",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1),
    ).withColumn("__ib_pos", F.col("_metadata.row_index"))
    seq_lookup = spark.createDataFrame(
        sorted(seq_of.items()), "__ib_file string, __ib_seq long"
    )
    scanned = scanned.join(F.broadcast(seq_lookup), "__ib_file")

    if snap["position_deletes"]:
        # (file basename, pos, delete seq) — file_path values in the
        # delete files are full URIs; key on basename like the scan tag
        pd_paths = sorted({d["path"] for d in snap["position_deletes"]})
        pd_seq = {
            d["path"].rsplit("/", 1)[-1]: d["seq"]
            for d in snap["position_deletes"]
        }
        pd_seq_lookup = spark.createDataFrame(
            sorted(pd_seq.items()), "__ib_dfile string, __ib_dseq long"
        )
        dels = (
            spark.read.schema("file_path string, pos bigint")
            .parquet(*pd_paths)
            .withColumn(
                "__ib_dfile",
                F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1),
            )
            .join(F.broadcast(pd_seq_lookup), "__ib_dfile")
            .select(
                F.element_at(F.split(F.col("file_path"), "/"), -1).alias(
                    "__ib_tfile"
                ),
                F.col("pos").alias("__ib_tpos"),
                "__ib_dseq",
            )
        )
        scanned = scanned.join(
            dels,
            (F.col("__ib_file") == F.col("__ib_tfile"))
            & (F.col("__ib_pos") == F.col("__ib_tpos"))
            & (F.col("__ib_dseq") >= F.col("__ib_seq")),
            "left_anti",
        )

    if snap["equality_deletes"]:
        by_ids: dict[tuple, list[dict]] = {}
        for d in snap["equality_deletes"]:
            by_ids.setdefault(tuple(sorted(d["equality_ids"])), []).append(d)
        id_to_name = {
            int(f.metadata[_FIELD_ID_KEY]): f.name for f in logical.fields
        }
        for ids, files in sorted(by_ids.items()):
            cols = [id_to_name[i] for i in ids]
            eq_schema = StructType(
                [logical[c] for c in cols]
            )
            eq_seq = {
                d["path"].rsplit("/", 1)[-1]: d["seq"] for d in files
            }
            eq_seq_lookup = spark.createDataFrame(
                sorted(eq_seq.items()), "__ib_dfile string, __ib_dseq long"
            )
            dels = (
                scan_spark.read.schema(eq_schema)
                .parquet(*sorted({d["path"] for d in files}))
                .withColumn(
                    "__ib_dfile",
                    F.element_at(
                        F.split(F.col("_metadata.file_path"), "/"), -1
                    ),
                )
                .join(F.broadcast(eq_seq_lookup), "__ib_dfile")
                .drop("__ib_dfile")
            )
            cond = F.col("__ib_dseq") > F.col("__ib_seq")
            for c in cols:
                cond = cond & (scanned[c].eqNullSafe(dels[c]))
            scanned = scanned.join(dels, cond, "left_anti")

    return scanned.select(*out_order)
