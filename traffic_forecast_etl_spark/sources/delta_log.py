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

Honesty: round-trips are pinned self-consistent and against the
published protocol document; cross-validation against delta-spark
itself is environment-blocked (no jars here). Advanced reader
features (column mapping, deletion vectors) raise NotImplementedError
rather than mis-reading.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG_DIR = "_delta_log"


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG_DIR)


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


def _read_checkpoint(spark: SparkSession, path: str) -> tuple[int, list[dict]] | None:
    """(checkpoint version, actions) from ``_last_checkpoint``, or
    None. Checkpoint parquet rows each carry ONE non-null action
    struct (the spec's columnar action layout)."""
    lc = os.path.join(_log_dir(path), "_last_checkpoint")
    if not os.path.exists(lc):
        return None
    with open(lc) as f:
        meta = json.load(f)
    v = int(meta["version"])
    parts = meta.get("parts")
    if parts:
        files = [
            os.path.join(
                _log_dir(path),
                f"{v:020d}.checkpoint.{i + 1:010d}.{parts:010d}.parquet",
            )
            for i in range(int(parts))
        ]
    else:
        files = [os.path.join(_log_dir(path), f"{v:020d}.checkpoint.parquet")]
    rows = spark.read.parquet(*files).toJSON().collect()
    actions = []
    for r in rows:
        d = json.loads(r)
        for k in ("protocol", "metaData", "add", "remove"):
            if d.get(k) is not None:
                actions.append({k: d[k]})
    return v, actions


def _replay(
    spark: SparkSession, path: str, version: int | None = None
) -> tuple[dict, dict, dict[str, dict]]:
    """Replay the log up to ``version`` (inclusive; default latest).
    Returns (protocol, metaData, active files: relative path → add
    action)."""
    latest = _latest_version(path) if version is None else version
    start = 0
    protocol: dict = {}
    meta: dict = {}
    adds: dict[str, dict] = {}
    cp = _read_checkpoint(spark, path)
    if cp is not None and cp[0] <= latest:
        start = cp[0] + 1
        for a in cp[1]:
            if "protocol" in a:
                protocol = a["protocol"]
            elif "metaData" in a:
                meta = a["metaData"]
            elif "add" in a:
                adds[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                adds.pop(a["remove"]["path"], None)
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
                if not line:
                    continue
                a = json.loads(line)
                if "protocol" in a:
                    protocol = a["protocol"]
                elif "metaData" in a:
                    meta = a["metaData"]
                elif "add" in a:
                    adds[a["add"]["path"]] = a["add"]
                elif "remove" in a:
                    adds.pop(a["remove"]["path"], None)
    if not meta:
        raise ValueError(f"Delta log at {path} never committed metaData")
    if int(protocol.get("minReaderVersion", 1)) > 2 or protocol.get(
        "readerFeatures"
    ):
        raise NotImplementedError(
            "Delta table requires reader features "
            f"{protocol.get('readerFeatures') or protocol} (column mapping / "
            "deletion vectors are out of this reader's scope)"
        )
    return protocol, meta, adds


def delta_schema(meta: dict) -> T.StructType:
    """Delta's ``schemaString`` IS the Spark schema JSON."""
    return T.StructType.fromJson(json.loads(meta["schemaString"]))


def delta_snapshot_files(
    spark: SparkSession, path: str, version: int | None = None
) -> list[dict]:
    """Planning surface: the active add actions (path, size,
    partitionValues, stats) at ``version`` — pure log arithmetic,
    zero data-file reads."""
    _, _, adds = _replay(spark, path, version)
    return sorted(adds.values(), key=lambda a: a["path"])


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table from its transaction log: replay →
    reconstruct the active file set → plain parquet scan of exactly
    those files, with partition columns re-attached from the log's
    ``partitionValues`` (they are NOT in the data files, per the
    protocol). ``version=`` time-travels."""
    _, meta, adds = _replay(spark, path, version)
    schema = delta_schema(meta)
    part_cols = list(meta.get("partitionColumns") or [])
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    data_schema = T.StructType(data_fields)
    if not adds:
        return spark.createDataFrame([], schema)
    if not part_cols:
        files = [os.path.join(path, a["path"]) for a in adds.values()]
        return spark.read.schema(data_schema).parquet(*files).select(
            *[f.name for f in schema.fields]
        )
    # group files by partition tuple; inject the tuple as literals
    # (cast through the schema type — partitionValues are strings)
    by_tuple: dict[tuple, list[str]] = {}
    for a in adds.values():
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in part_cols)
        by_tuple.setdefault(key, []).append(os.path.join(path, a["path"]))
    out = None
    types = {f.name: f.dataType for f in schema.fields}
    # NULL partition values sort first (tuple keys may mix None/str)
    for key, files in sorted(
        by_tuple.items(), key=lambda kv: tuple((v is not None, v) for v in kv[0])
    ):
        df = spark.read.schema(data_schema).parquet(*files)
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
) -> int:
    """Append ``df`` to a Delta table (creating it at version 0 with
    protocol (1, 2) if absent). Data files stage under uniquely-named
    parquet parts; the commit is one put-if-absent JSON file of add
    actions — O(new files), the same commit shape as tablefmt
    appends. Returns the committed version.

    Creation records ``partition_by`` as the table's
    ``partitionColumns``; appends must match the existing
    partitioning (protocol invariant)."""
    try:
        latest = _latest_version(path)
    except FileNotFoundError:
        latest = None
    if latest is not None:
        _, meta, _ = _replay(spark, path)
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
    _commit_delta(path, version, actions)
    return version
