"""Native Structured Streaming source over a snapshot table's
row-level change feed (PySpark 4 Python Data Source API).

``consume_snapshot_changes`` (micro_batch.py) is the foreachBatch-dual
PULL consumer; this module is the same feed as a first-class
``spark.readStream.format("snapshot_changes")`` source — offsets ARE
table versions, so the streaming checkpoint natively remembers the
version cursor, restarts resume exactly where they stopped, and every
downstream Structured Streaming operator (windowed aggs, joins,
watermarks, foreachBatch sinks) composes with the feed unchanged.

Planning runs driver-side over the JSON manifests (zero Spark jobs —
the tablefmt scan-planning contract); reading runs on executors with
pyarrow, one input partition per change/data file, so a big version's
feed parallelizes across the cluster. The table path must be visible
from executors (shared filesystem / object store — the same
requirement every file source has).

Version semantics mirror :func:`..tablefmt.read_snapshot_changes`:
recorded change files for CDF-enabled MERGE/DELETE/UPDATE commits,
file-level synthesis for append/overwrite/restore/first commits,
compaction versions contribute nothing, and an unrecorded
merge/delete/update raises at planning time (enable ``change_feed``
on the writer).

Reference anchor: the reference's consumers re-poll whole Postgres
serving tables on the DAG's 12-hour schedule (reference:
dags/utils.py:98-127); this source replaces the re-poll with exact
row deltas delivered through Spark's own streaming engine.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType


def _manifest(path: str, version: int) -> dict:
    with open(
        os.path.join(path, "_manifests", f"v{version:08d}.json")
    ) as f:
        return json.load(f)


def _latest_version(path: str) -> int:
    with open(os.path.join(path, "_manifests", "LATEST")) as f:
        return int(json.load(f)["version"])


def _oldest_version(path: str) -> int:
    versions = [
        int(n[1:9])
        for n in os.listdir(os.path.join(path, "_manifests"))
        if n.startswith("v") and n.endswith(".json")
    ]
    if not versions:
        raise FileNotFoundError(f"no snapshot table at {path}")
    return min(versions)


def _entries_of(path: str, m: dict) -> list[dict]:
    """Data-file entries of a manifest (inline or sharded)."""
    if "segments" in m:
        out: list[dict] = []
        for seg in m["segments"]:
            with open(os.path.join(path, "_manifests", seg["path"])) as f:
                out.extend(json.load(f)["files"])
        return out
    return list(m["files"])


_MAX_EMBEDDED_DELETE_KEYS = 100_000


def _delete_filters(path: str, m: dict, file_seq: int) -> list[tuple]:
    """(key_cols, key_tuple_set) filters for the equality-delete files
    that apply to a data file of sequence ``file_seq`` under the
    merge-on-read sequencing rule. Keys are loaded driver-side with
    pyarrow and EMBEDDED in the partition (delete files are key-only
    and small by design); a feed whose pending deletes exceed the
    embed cap should be consumed through the batch
    read_snapshot_changes / foreachBatch path instead."""
    import pyarrow.parquet as pq

    appl = [
        d for d in (m.get("eq_deletes") or []) if d["seq"] > file_seq
    ]
    if not appl:
        return []
    total = sum(d["rows"] for d in appl)
    if total > _MAX_EMBEDDED_DELETE_KEYS:
        raise ValueError(
            f"{total} pending merge-on-read delete keys exceed the "
            f"streaming source's embed cap ({_MAX_EMBEDDED_DELETE_KEYS}) — "
            "compact the table to materialize them, or consume via "
            "tablefmt.read_snapshot_changes / consume_snapshot_changes"
        )
    by_keys: dict[tuple, set] = {}
    for d in appl:
        cols = tuple(d["keys"])
        tbl = pq.read_table(os.path.join(path, d["path"]), columns=list(cols))
        rows = zip(*(tbl.column(c).to_pylist() for c in cols))
        by_keys.setdefault(cols, set()).update(rows)
    return [(cols, keys) for cols, keys in by_keys.items()]


class _ChangeFilePartition(InputPartition):
    """One parquet file to read on an executor: either a recorded
    change file (carries its own _change_type column) or a data file
    synthesized with a constant change type. ``del_filters`` carries
    the applicable merge-on-read delete-key sets (empty for recorded
    change files — those are exact rows already)."""

    def __init__(
        self,
        abs_path: str,
        change_type: str | None,
        version: int,
        del_filters: list[tuple] | None = None,
    ):
        self.abs_path = abs_path
        self.change_type = change_type
        self.version = version
        self.del_filters = del_filters or []


class SnapshotChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._path = options["path"]
        self._start = options.get("startingversion")  # options lowercase keys
        self._schema = schema
        self._data_cols = [
            f.name
            for f in schema.fields
            if f.name not in ("_change_type", "_commit_version")
        ]

    # -- offsets: {"version": N} = "everything through N consumed" --

    def initialOffset(self) -> dict:
        if self._start is not None:
            return {"version": int(self._start)}
        return {"version": _oldest_version(self._path) - 1}

    def latestOffset(self) -> dict:
        return {"version": _latest_version(self._path)}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        parts: list[InputPartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            m = _manifest(self._path, v)
            op = m["op"]
            if op == "compact":
                continue
            if m.get("changes") is not None:
                parts.extend(
                    _ChangeFilePartition(
                        os.path.join(self._path, e["path"]), None, v
                    )
                    for e in m["changes"]
                )
                continue
            if m["parent"] is None or op in (
                "overwrite", "append", "restore", "replace_partitions",
            ):
                cur = _entries_of(self._path, m)
                parent_entries: list[dict] = []
                m_par = None
                if m["parent"] is not None:
                    m_par = _manifest(self._path, m["parent"])
                    parent_entries = _entries_of(self._path, m_par)
                pset = {e["path"] for e in parent_entries}
                cset = {e["path"] for e in cur}
                parts.extend(
                    _ChangeFilePartition(
                        os.path.join(self._path, e["path"]), "insert", v,
                        _delete_filters(self._path, m, e.get("seq", 0)),
                    )
                    for e in cur
                    if e["path"] not in pset
                )
                if (
                    op in ("overwrite", "restore", "replace_partitions")
                    and m_par is not None
                ):
                    parts.extend(
                        _ChangeFilePartition(
                            os.path.join(self._path, e["path"]), "delete", v,
                            _delete_filters(
                                self._path, m_par, e.get("seq", 0)
                            ),
                        )
                        for e in parent_entries
                        if e["path"] not in cset
                    )
                continue
            raise ValueError(
                f"version {v} (op={op}) has no recorded change feed — "
                "commit with change_feed=True"
            )
        return parts

    def read(self, partition: _ChangeFilePartition):
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.abs_path)
        names = set(tbl.schema.names)
        cols = []
        n = tbl.num_rows
        for c in self._data_cols:
            if c in names:
                cols.append(tbl.column(c).to_pylist())
            else:
                cols.append([None] * n)  # evolved column, file predates it
        if partition.change_type is not None:
            ctypes = [partition.change_type] * n
        else:
            ctypes = tbl.column("_change_type").to_pylist()
        ver = [partition.version] * n
        keep = None
        if partition.del_filters:
            col_idx = {c: i for i, c in enumerate(self._data_cols)}
            keep = [True] * n
            for key_cols, key_set in partition.del_filters:
                idxs = [col_idx[c] for c in key_cols]
                for i in range(n):
                    if keep[i] and tuple(cols[j][i] for j in idxs) in key_set:
                        keep[i] = False
        for i, row in enumerate(zip(*cols, ctypes, ver)):
            if keep is None or keep[i]:
                yield row

    def commit(self, end: dict) -> None:
        pass  # offsets live in the streaming checkpoint


class SnapshotChangesDataSource(DataSource):
    """``spark.readStream.format("snapshot_changes")``. Options:

    - ``path`` (required): snapshot table root
    - ``startingVersion`` (optional): consume changes AFTER this
      version (default: everything retained)
    """

    @classmethod
    def name(cls) -> str:
        return "snapshot_changes"

    def schema(self) -> StructType:
        path = self.options["path"]
        table = StructType.fromJson(
            json.loads(_manifest(path, _latest_version(path))["schema"])
        )
        return StructType(
            table.fields
            + [
                StructField("_change_type", StringType()),
                StructField("_commit_version", LongType()),
            ]
        )

    def streamReader(self, schema: StructType) -> SnapshotChangesStreamReader:
        return SnapshotChangesStreamReader(schema, dict(self.options))


def read_snapshot_changes_stream(
    spark, path: str, starting_version: int | None = None
):
    """Register the source (idempotent) and open the change-feed
    stream for ``path``. Returns a streaming DataFrame with the
    table's columns plus ``_change_type`` / ``_commit_version``."""
    spark.dataSource.register(SnapshotChangesDataSource)
    reader = spark.readStream.format("snapshot_changes").option("path", path)
    if starting_version is not None:
        reader = reader.option("startingVersion", str(starting_version))
    return reader.load()
