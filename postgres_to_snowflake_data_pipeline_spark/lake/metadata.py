"""Snapshot metadata log for the lake table — O(batch) metadata per commit.

Layout (all under the table root):

    _meta/v{N}.json        -- immutable snapshot N (schema, manifest list,
                              summary); CAS-created, so exactly one writer
                              ever owns snapshot id N
    _meta/m{N}-{tok}.json  -- immutable manifest: the file entries ADDED (or
                              the bucket file-lists REPLACED) by commit N
                              (tok = per-attempt token; legacy m{N}.json
                              names from v1 tables still resolve)
    _meta/_current         -- advisory hint: latest snapshot number (truth
                              is the highest v{N}.json; see current_id)
    data/...          -- immutable parquet data files referenced by manifests

Manifest-list indirection (Iceberg-style): a snapshot does NOT re-serialize
the cumulative file map — it stores an ordered list of manifest pointers
``{path, op, buckets}``; the full map is reconstructed by folding manifests
in order (``append`` extends a bucket's file list, ``replace`` sets it).
Each merge therefore writes O(batch) metadata, not O(table history), and a
compaction commit PRUNES every parent manifest whose buckets it fully
replaces — so the manifest list stays O(commits since last compaction)
rather than O(all commits). Manifests are immutable and cached in memory.

Commit protocol (optimistic concurrency, Iceberg HadoopTableOperations
style): write the (uniquely-named) manifest, then CAS-create ``v{N}.json``
— on the default local backend via write-temp-then-``os.link`` (EEXIST =
lost race), on an object store via conditional PUT; all storage I/O goes
through the ``LakeFS`` seam (lake/fs.py), chosen by the table-root URI.
A lost CAS raises ``CommitConflictError`` so the
caller can rebase onto the new current and retry; finally update
``_current``. ``_current`` is an advisory HINT, not the source of truth:
``current_id`` probes forward from it for newer ``v{N}.json`` files, so a
lost or stale hint write can never hide (or roll back) a committed
snapshot. A reader never observes a partial snapshot — the snapshot file
lands only after its manifest — and a crashed writer leaves at most
unreferenced temp/manifest/data files, garbage-collected by
``expire_snapshots``. A production deployment swaps this module for an
Iceberg catalog whose metastore CAS provides the same contract.

Idempotency: "was this epoch already applied?" must not require a
cumulative key list (at 10^3-10^4 epochs that list itself becomes the
quadratic-metadata problem). Epoch-shaped keys (``epoch:{n}``) are
compressed to a **watermark range**: every epoch in
``[epoch_base, epoch_watermark]`` is committed (base anchors at the first
epoch ever seen, so checkpoints that resume at batch N>0 still compress);
only out-of-range epochs and non-epoch keys remain in the residual
``commit_keys`` list — O(1) state for the common contiguous-epoch replay,
with ``commit_count`` preserving the total for observability.
"""

from __future__ import annotations

import json
import os
import re
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import types as T

from postgres_to_snowflake_data_pipeline_spark.lake.fs import (  # noqa: F401
    atomic_write_json,  # re-export: every sidecar writer imports it here
    fs_for,
)

FORMAT_VERSION = 2


class CommitConflictError(RuntimeError):
    """Another writer committed the snapshot id this commit targeted.

    The caller's data/manifest writes remain valid (merge deltas are pure
    appends under unique names); rebuild the snapshot metadata against the
    new current and retry — ``LakeTable._next_commit`` does exactly that.
    """

_EPOCH_RE = re.compile(r"^epoch:(\d+)$")


def epoch_of(key: str) -> int | None:
    """The epoch number of an ``epoch:{n}`` commit key, else None."""
    m = _EPOCH_RE.match(key)
    return int(m.group(1)) if m else None


def fold_commit_keys(
    base: int | None,
    watermark: int,
    residual: list[str],
    new_key: str | None,
) -> tuple[int | None, int, list[str]]:
    """Advance the epoch high-watermark with ``new_key`` folded in; return
    (new_base, new_watermark, new_residual). The committed range is
    [base, watermark]: contiguous epochs collapse into it, gaps and
    non-epoch keys stay listed explicitly. ``base`` anchors at the FIRST
    epoch ever committed — a stream whose batch ids resume at N>0 (resumed
    checkpoint, table added to a fleet mid-stream) still compresses, and
    epochs below base are correctly reported as not-committed."""
    keys = set(residual)
    if new_key is not None:
        keys.add(new_key)
    epochs = sorted(e for e in (epoch_of(k) for k in keys) if e is not None)
    if base is None and epochs:
        base = epochs[0]
        watermark = base - 1
    w = watermark
    # absorb in BOTH directions until fixpoint: the range grows upward from
    # the watermark and downward from the base (an epoch arriving just
    # below the anchor must compress too, or the residual grows unboundedly
    # for streams that ever emit a lower batch id)
    changed = True
    while changed:
        changed = False
        for e in epochs:
            if base is not None and e == base - 1:
                base = e
                changed = True
            elif e == w + 1:
                w = e
                changed = True

    def _covered(k: str) -> bool:
        e = epoch_of(k)
        return e is not None and base is not None and base <= e <= w

    keep = sorted(k for k in keys if not _covered(k))
    return base, w, keep


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    schema_json: dict[str, Any]          # Spark StructType.jsonValue()
    n_buckets: int
    key_cols: list[str]
    #: ordered manifest pointers: {"path": "m{N}.json", "op": "append"|"replace",
    #: "buckets": [str, ...]} — folded in order to reconstruct the file map
    manifests: list[dict[str, Any]] = field(default_factory=list)
    summary: dict[str, Any] = field(default_factory=dict)
    #: residual keys only (epochs outside [base, watermark], non-epoch keys)
    commit_keys: list[str] = field(default_factory=list)
    #: every epoch in [epoch_base, epoch_watermark] is committed
    #: (base None = no epochs committed yet)
    epoch_watermark: int = -1
    epoch_base: int | None = None
    #: total commit keys ever folded in (observability; the cumulative count)
    commit_count: int = 0
    #: Iceberg-style stable column ids: current field name -> id. Survive
    #: renames (the id moves with the column), so identity is positional
    #: history, not the name.
    column_ids: dict[str, int] = field(default_factory=dict)
    #: per-current-field prior names — the names older data files were
    #: written under; the read path coalesces them into the current name
    prior_names: dict[str, list[str]] = field(default_factory=dict)
    #: names that may never be (re)introduced: dropped columns and every
    #: prior name. Reusing one would resurrect old files' values under the
    #: new column.
    retired_names: list[str] = field(default_factory=list)
    next_column_id: int = 0
    #: table properties (Iceberg-style): small JSON-able values that FOLD
    #: FORWARD — every child snapshot inherits its parent's map, so a
    #: property survives retention expiry of the commit that set it (unlike
    #: per-commit summaries). Updatable atomically WITH a data commit
    #: (LakeTable.merge(props_update=...)) — the mechanism that lets
    #: derived state (e.g. an ANN index's quantizer) version in lockstep
    #: with the layout it describes. Keep values SMALL: props ride every
    #: snapshot JSON, so a big value taxes every future commit.
    props: dict[str, Any] = field(default_factory=dict)
    #: resolved bucket -> file-entry list; lazily folded from manifests
    _files: dict[str, list[dict[str, Any]]] | None = field(
        default=None, repr=False, compare=False
    )
    _resolver: Callable[[list[dict[str, Any]]], dict[str, list[dict[str, Any]]]] | None = field(
        default=None, repr=False, compare=False
    )

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.schema_json)

    @property
    def files(self) -> dict[str, list[dict[str, Any]]]:
        if self._files is None:
            assert self._resolver is not None, "detached snapshot has no file map"
            self._files = self._resolver(self.manifests)
        return self._files

    def has_commit_key(self, key: str) -> bool:
        e = epoch_of(key)
        if (
            e is not None
            and self.epoch_base is not None
            and self.epoch_base <= e <= self.epoch_watermark
        ):
            return True
        return key in self.commit_keys

    def to_json(self) -> dict[str, Any]:
        return {
            "format_version": FORMAT_VERSION,
            "snapshot_id": self.snapshot_id,
            "parent_id": self.parent_id,
            "schema": self.schema_json,
            "n_buckets": self.n_buckets,
            "key_cols": self.key_cols,
            "manifests": self.manifests,
            "summary": self.summary,
            "commit_keys": self.commit_keys,
            "epoch_watermark": self.epoch_watermark,
            "epoch_base": self.epoch_base,
            "commit_count": self.commit_count,
            "column_ids": self.column_ids,
            "prior_names": self.prior_names,
            "retired_names": self.retired_names,
            "next_column_id": self.next_column_id,
            "props": self.props,
        }

    @staticmethod
    def from_json(d: dict[str, Any]) -> "Snapshot":
        snap = Snapshot(
            snapshot_id=d["snapshot_id"],
            parent_id=d.get("parent_id"),
            schema_json=d["schema"],
            n_buckets=d["n_buckets"],
            key_cols=d["key_cols"],
            manifests=d.get("manifests", []),
            summary=d.get("summary", {}),
            commit_keys=d.get("commit_keys", []),
            epoch_watermark=d.get("epoch_watermark", -1),
            # snapshots written before the base anchor existed carry a
            # watermark whose implied semantics were "every epoch <= w is
            # committed" — default their base to 0, or the whole committed
            # range would read as uncommitted and be re-applied on replay
            epoch_base=d.get(
                "epoch_base", 0 if d.get("epoch_watermark", -1) >= 0 else None
            ),
            commit_count=d.get("commit_count", len(d.get("commit_keys", []))),
            # pre-evolution snapshots: derive positional ids (no renames
            # existed, so every snapshot derives the same mapping)
            column_ids=d.get("column_ids")
            or {f["name"]: i + 1 for i, f in enumerate(d["schema"]["fields"])},
            prior_names=d.get("prior_names", {}),
            retired_names=d.get("retired_names", []),
            next_column_id=d.get("next_column_id")
            or len(d["schema"]["fields"]) + 1,
            props=d.get("props", {}),
        )
        if "files" in d:  # format v1: inline cumulative file map
            snap._files = d["files"]
            snap._legacy_inline_files = True
        return snap


class MetadataLog:
    def __init__(self, table_root: str):
        self.root = table_root
        self.fs = fs_for(table_root)
        self.meta_dir = os.path.join(table_root, "_meta")
        self._manifest_cache: dict[str, dict[str, list[dict[str, Any]]]] = {}
        self._snap_cache: dict[int, Snapshot] = {}

    # -- paths ---------------------------------------------------------
    def _snap_path(self, sid: int) -> str:
        return os.path.join(self.meta_dir, f"v{sid}.json")

    def manifest_path(self, name: str) -> str:
        return os.path.join(self.meta_dir, name)

    def _current_path(self) -> str:
        return os.path.join(self.meta_dir, "_current")

    # -- reads ---------------------------------------------------------
    def exists(self) -> bool:
        return self.fs.exists(self._current_path())

    def current_id(self) -> int | None:
        """Latest committed snapshot id. ``_current`` is only a hint (a
        racer's hint write can be lost or land out of order); the truth is
        the highest existing ``v{N}.json``, found by probing forward from
        the hint — O(commits since the hint was written), normally 0-1
        stat calls."""
        try:
            sid = int(self.fs.read_text(self._current_path()).strip())
        except FileNotFoundError:
            return None
        while self.fs.exists(self._snap_path(sid + 1)):
            sid += 1
        return sid

    # -- tags (named snapshot refs) -------------------------------------
    _TAG_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")

    def _tag_path(self, name: str) -> str:
        return os.path.join(self.meta_dir, f"tag-{name}.json")

    def create_tag(self, name: str, snapshot_id: int) -> None:
        """Pin a name to a snapshot (Iceberg-style ref). One file per tag,
        CAS-created — concurrent creators of the same name race safely
        (exactly one wins, the loser gets the error)."""
        if not self._TAG_RE.match(name):
            raise ValueError(f"invalid tag name: {name!r}")
        payload = json.dumps(
            {"snapshot_id": snapshot_id, "created_at_unix": time.time()}
        )
        if not self._cas_create(self._tag_path(name), payload):
            raise ValueError(f"tag already exists: {name}")

    def drop_tag(self, name: str) -> None:
        try:
            self.fs.remove(self._tag_path(name))
        except FileNotFoundError:
            raise ValueError(f"no such tag: {name}") from None

    def tags(self) -> dict[str, int]:
        """name -> snapshot_id for every tag."""
        out: dict[str, int] = {}
        try:
            names = self.fs.listdir(self.meta_dir)
        except FileNotFoundError:
            return out
        for f in names:
            if f.startswith("tag-") and f.endswith(".json"):
                try:
                    payload = self.fs.read_text(os.path.join(self.meta_dir, f))
                except FileNotFoundError:
                    continue  # dropped by a concurrent writer mid-listing
                out[f[4:-5]] = int(json.loads(payload)["snapshot_id"])
        return out

    # -- staged commits (write-audit-publish) ----------------------------
    def _staged_path(self, name: str) -> str:
        return os.path.join(self.meta_dir, f"staged-{name}.json")

    def write_staged(self, name: str, payload: dict[str, Any]) -> bool:
        """CAS-create the staged-commit descriptor ``staged-{name}.json``
        (exactly one stager per name; returns False on a lost race). The
        descriptor lives OUTSIDE the v-chain, so readers never see it."""
        if not self._TAG_RE.match(name):
            raise ValueError(f"invalid staged-commit name: {name!r}")
        return self._cas_create(self._staged_path(name), json.dumps(payload))

    def load_staged(self, name: str) -> dict[str, Any] | None:
        try:
            return json.loads(self.fs.read_text(self._staged_path(name)))
        except FileNotFoundError:
            return None

    def delete_staged(self, name: str) -> None:
        try:
            self.fs.remove(self._staged_path(name))
        except FileNotFoundError:
            pass

    def staged_list(self) -> dict[str, dict[str, Any]]:
        """name -> descriptor for every staged commit on disk."""
        out: dict[str, dict[str, Any]] = {}
        try:
            names = self.fs.listdir(self.meta_dir)
        except FileNotFoundError:
            return out
        for f in names:
            if f.startswith("staged-") and f.endswith(".json"):
                d = self.load_staged(f[7:-5])
                if d is not None:  # dropped by a concurrent publish/discard
                    out[f[7:-5]] = d
        return out

    def repair_hint(self) -> None:
        """Recreate a missing ``_current`` hint from the snapshot files on
        disk (crash between a CAS-created snapshot and its hint write).
        No-op when the hint already exists — committed state never moves."""
        if self.fs.exists(self._current_path()):
            return
        try:
            sids = [
                int(f[1:-5])
                for f in self.fs.listdir(self.meta_dir)
                if f.startswith("v") and f.endswith(".json")
            ]
        except FileNotFoundError:
            return
        if sids:
            # the truth is the HIGHEST snapshot file (current_id's contract).
            # min(sids) would be wrong when an old tag-pinned snapshot sits
            # detached below a gap: forward probing from it stops at the gap
            # and silently rolls the table back.
            self._atomic_write(self._current_path(), str(max(sids)))

    def _load_manifest(self, name: str) -> dict[str, list[dict[str, Any]]]:
        m = self._manifest_cache.get(name)
        if m is None:
            m = json.loads(self.fs.read_text(self.manifest_path(name)))["files"]
            self._manifest_cache[name] = m
        return m

    @staticmethod
    def own_manifest_pointers(snap: "Snapshot") -> list[dict[str, Any]]:
        """The manifest-pointer entries snapshot ``snap`` itself introduced
        — recognized by the name grammar ``m{sid}.json`` (legacy) or
        ``m{sid}-{token}.json`` (per-attempt unique). The single place that
        knows this grammar; key_history/changes consult the ``op`` field to
        tell a genuine per-commit delta (append) from a format-v1 upgrade's
        cumulative replace."""
        sid = snap.snapshot_id
        legacy, prefix = f"m{sid}.json", f"m{sid}-"
        return [
            m
            for m in snap.manifests
            if m["path"] == legacy or m["path"].startswith(prefix)
        ]

    def manifest_of(self, sid: int) -> dict[str, list[dict[str, Any]]] | None:
        """The delta manifest written BY commit ``sid`` (bucket -> entries
        added in that commit), or None if the commit added no files. The
        incremental-read primitive: a changefeed consumer asks exactly
        'what did commit N add?' without reconstructing any file map.

        Manifest names carry a per-attempt token (``m{sid}-{token}.json``)
        so concurrent committers can never clobber each other's files; the
        name of the manifest commit ``sid`` introduced is recovered from
        snapshot ``sid``'s own manifest list (legacy ``m{sid}.json`` names
        from pre-concurrency tables still resolve)."""
        try:
            snap = self.load(sid)
        except FileNotFoundError:
            snap = None
        if snap is not None:
            names = [m["path"] for m in self.own_manifest_pointers(snap)]
        else:  # expired snapshot: only the legacy deterministic name is known
            names = [f"m{sid}.json"]
        for name in names:
            try:
                return self._load_manifest(name)
            except FileNotFoundError:
                continue
        return None

    def resolve_files(
        self, manifests: list[dict[str, Any]]
    ) -> dict[str, list[dict[str, Any]]]:
        """Fold the manifest list (in commit order) into the full
        bucket -> file-entries map. Entry dicts are shared with the cache
        (treat as immutable); the lists are fresh copies."""
        files: dict[str, list[dict[str, Any]]] = {}
        for m in manifests:
            data = self._load_manifest(m["path"])
            if m["op"] == "replace":
                for b, es in data.items():
                    files[b] = list(es)
            else:
                for b, es in data.items():
                    files.setdefault(b, []).extend(es)
        return files

    #: cap on cached snapshots — each may hold a resolved O(table-files)
    #: file map, so an unbounded cache grows O(commits x files) in driver
    #: memory over a 10^4-epoch stream even though disk metadata is
    #: O(batch). FIFO eviction; evicted snapshots simply re-load/re-resolve.
    SNAP_CACHE_MAX = 64

    def _cache_snap(self, snap: Snapshot) -> None:
        self._snap_cache[snap.snapshot_id] = snap
        while len(self._snap_cache) > self.SNAP_CACHE_MAX:
            self._snap_cache.pop(next(iter(self._snap_cache)))

    def load(self, sid: int) -> Snapshot:
        snap = self._snap_cache.get(sid)
        if snap is None:
            snap = Snapshot.from_json(
                json.loads(self.fs.read_text(self._snap_path(sid)))
            )
            snap._resolver = self.resolve_files
            self._cache_snap(snap)
        return snap

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
        self._snap_cache.pop(sid, None)
        try:
            self.fs.remove(self._snap_path(sid))
        except FileNotFoundError:
            pass

    def delete_manifest(self, name: str) -> None:
        self._manifest_cache.pop(name, None)
        try:
            self.fs.remove(self.manifest_path(name))
        except FileNotFoundError:
            pass

    def list_snapshot_ids(self) -> list[int]:
        """Every snapshot id with a file on disk — including snapshots an
        earlier expiry detached from the parent chain (kept alive by a
        tag, or garbage once the tag is dropped)."""
        try:
            return sorted(
                int(f[1:-5])
                for f in self.fs.listdir(self.meta_dir)
                if f.startswith("v") and f.endswith(".json")
            )
        except FileNotFoundError:
            return []

    def list_manifests(self) -> list[str]:
        try:
            return [f for f in self.fs.listdir(self.meta_dir)
                    if f.startswith("m") and f.endswith(".json")]
        except FileNotFoundError:
            return []

    # -- atomic commit ---------------------------------------------------
    # both primitives delegate to the LakeFS backend (lake/fs.py): local
    # stores keep the historical temp+fsync+rename / temp+os.link-CAS
    # behavior verbatim; an object-store backend maps them to plain PUT /
    # conditional PUT (If-None-Match) respectively
    def _atomic_write(self, path: str, payload: str) -> None:
        self.fs.write_atomic(path, payload)

    def _cas_create(self, path: str, payload: str) -> bool:
        return self.fs.cas_create(path, payload)

    def commit(
        self,
        snap: Snapshot,
        new_manifest: tuple[str, dict[str, list[dict[str, Any]]]] | None = None,
    ) -> None:
        """Commit a snapshot; ``new_manifest`` = (name, bucket->entries) is
        the delta this commit introduces (None for metadata-only commits).
        Manifest first, then the snapshot via CAS-create, then the _current
        hint — each atomic, so a crash at any point leaves a readable
        table. If another writer won the race for this snapshot id, the
        just-written manifest is removed and ``CommitConflictError`` is
        raised so the caller can rebase and retry."""
        self.fs.makedirs(self.meta_dir)
        if new_manifest is not None:
            name, files = new_manifest
            self._atomic_write(
                self.manifest_path(name), json.dumps({"files": files})
            )
            self._manifest_cache[name] = files
        snap._resolver = self.resolve_files
        if not self._cas_create(
            self._snap_path(snap.snapshot_id), json.dumps(snap.to_json())
        ):
            if new_manifest is not None:
                self.delete_manifest(new_manifest[0])
            raise CommitConflictError(
                f"snapshot {snap.snapshot_id} was committed by another writer"
            )
        self._atomic_write(self._current_path(), str(snap.snapshot_id))
        self._cache_snap(snap)
