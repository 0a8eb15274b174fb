"""Snapshot metadata log for the lake table.

Layout (all under the table root):

    _meta/v{N}.json   -- immutable snapshot N (schema, file lists, summary)
    _meta/_current    -- single line: latest committed snapshot number
    data/...          -- immutable parquet data files referenced by snapshots

Commit protocol: write ``v{N}.json`` and the new ``_current`` via
write-temp-then-``os.rename`` — atomic on POSIX, so a reader never observes
a partial snapshot and a crashed writer leaves at most unreferenced temp
files (never a corrupt log). Single-writer by design (one streaming query
owns a table); a production deployment swaps this module for an Iceberg
catalog whose compare-and-swap commit provides multi-writer safety.

Idempotency: every snapshot carries the set of **commit keys**
(``epoch:{id}`` from the streaming sink) it folded in, plus the cumulative
set from its parent — so "was this epoch already applied?" is one O(1) set
lookup on the current snapshot, exactly the Iceberg snapshot-summary
pattern the north rule names.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

FORMAT_VERSION = 1


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    schema_json: dict[str, Any]          # Spark StructType.jsonValue()
    n_buckets: int
    key_cols: list[str]
    files: dict[str, list[str]]          # bucket (as str) -> data file paths (table-relative)
    summary: dict[str, Any] = field(default_factory=dict)
    commit_keys: list[str] = field(default_factory=list)  # cumulative

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.schema_json)

    def to_json(self) -> dict[str, Any]:
        return {
            "format_version": FORMAT_VERSION,
            "snapshot_id": self.snapshot_id,
            "parent_id": self.parent_id,
            "schema": self.schema_json,
            "n_buckets": self.n_buckets,
            "key_cols": self.key_cols,
            "files": self.files,
            "summary": self.summary,
            "commit_keys": self.commit_keys,
        }

    @staticmethod
    def from_json(d: dict[str, Any]) -> "Snapshot":
        return Snapshot(
            snapshot_id=d["snapshot_id"],
            parent_id=d.get("parent_id"),
            schema_json=d["schema"],
            n_buckets=d["n_buckets"],
            key_cols=d["key_cols"],
            files=d["files"],
            summary=d.get("summary", {}),
            commit_keys=d.get("commit_keys", []),
        )


class MetadataLog:
    def __init__(self, table_root: str):
        self.root = table_root
        self.meta_dir = os.path.join(table_root, "_meta")

    # -- paths ---------------------------------------------------------
    def _snap_path(self, sid: int) -> str:
        return os.path.join(self.meta_dir, f"v{sid}.json")

    def _current_path(self) -> str:
        return os.path.join(self.meta_dir, "_current")

    # -- reads ---------------------------------------------------------
    def exists(self) -> bool:
        return os.path.exists(self._current_path())

    def current_id(self) -> int | None:
        try:
            with open(self._current_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def load(self, sid: int) -> Snapshot:
        with open(self._snap_path(sid)) as f:
            return Snapshot.from_json(json.load(f))

    def current(self) -> Snapshot | None:
        sid = self.current_id()
        return None if sid is None else self.load(sid)

    def history(self) -> list[Snapshot]:
        """Retained snapshots, oldest first (time travel / lineage audits).
        The walk stops at the expiry horizon: a parent pruned by
        ``LakeTable.expire_snapshots`` simply ends the chain."""
        out, sid = [], self.current_id()
        while sid is not None:
            try:
                snap = self.load(sid)
            except FileNotFoundError:
                break
            out.append(snap)
            sid = snap.parent_id
        return list(reversed(out))

    def delete_snapshot(self, sid: int) -> None:
        try:
            os.remove(self._snap_path(sid))
        except FileNotFoundError:
            pass

    # -- atomic commit ---------------------------------------------------
    def _atomic_write(self, path: str, payload: str) -> None:
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    def commit(self, snap: Snapshot) -> None:
        os.makedirs(self.meta_dir, exist_ok=True)
        self._atomic_write(self._snap_path(snap.snapshot_id), json.dumps(snap.to_json()))
        self._atomic_write(self._current_path(), str(snap.snapshot_id))
