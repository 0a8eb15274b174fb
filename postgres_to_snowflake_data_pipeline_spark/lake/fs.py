"""Filesystem seam for the lake's commit/metadata/stats I/O.

The reference's whole sink side is an object store
(/root/reference/scripts/export_to_s3.py:108-114 ``put_object``;
/root/reference/dags/s3_to_snowflake_dag.py:137-147 COPY from an S3
stage). This engine's commit protocol was written against a plain
filesystem; this module makes the dependency EXPLICIT and swappable:
every metadata read/write/CAS, footer-stat open, listing, and GC delete
goes through a ``LakeFS`` implementation chosen by the table-root URI.

Backends:

- ``LocalFS`` (default, any root without a scheme): exactly the
  historical behavior — temp-file + fsync + ``os.rename`` for atomic
  replace, temp-file + ``os.link`` for CAS create (EEXIST = lost race).
- ``MemoryFS`` (``memory://`` roots): an in-process dict store with a
  lock-held CAS — the backend the seam's contract tests run against,
  proving no code path sneaks around the abstraction. Driver-process
  only (Spark executors cannot see it), so it serves metadata-level
  tests, not Spark data-file writes.

Object-store deployment notes (the part this sandbox cannot run):

- **CAS**: S3 now supports conditional PUT (``If-None-Match: *``;
  GCS has ``ifGenerationMatch=0``, ABFS has ``If-None-Match``), which is
  exactly ``cas_create`` — a lost race surfaces as HTTP 412. Implement
  ``cas_create`` with one conditional PUT; no temp file or rename is
  needed because object stores publish objects atomically.
- **atomic replace** (``write_atomic``): a plain PUT — object stores
  never expose partial objects, so the temp+rename dance collapses.
- **reads/list/delete**: GET / LIST(prefix) / DELETE; ``open_parquet``
  should return a ``pyarrow.fs.FileSystem.from_uri`` input file so
  footer reads stay ranged GETs (never whole-object downloads).
- Spark's own DATA file writes/reads go through Hadoop's S3A connector
  (the cluster's concern, not this module's): the engine only ever
  hands Spark path strings, which carry the scheme through unchanged.
"""

from __future__ import annotations

import io
import json
import os
import posixpath
import threading
import uuid
from typing import Any, BinaryIO, Iterator


class LakeFS:
    """Interface. Paths are plain strings; backends own their semantics.

    Error contract (matches the historical ``os`` behavior the commit
    protocol was built on): ``read_text``/``remove``/``listdir`` raise
    ``FileNotFoundError`` on a missing target; ``cas_create`` returns
    False (never raises) on a lost race; ``write_atomic`` overwrites."""

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def getsize(self, path: str) -> int:
        raise NotImplementedError

    def getmtime(self, path: str) -> float:
        """Last-modified time (GC's in-flight-commit grace window).
        Object stores report it on every LIST/HEAD."""
        raise NotImplementedError

    def write_atomic(self, path: str, payload: str) -> None:
        raise NotImplementedError

    def cas_create(self, path: str, payload: str) -> bool:
        raise NotImplementedError

    def open_parquet(self, path: str) -> str | BinaryIO:
        """Something ``pyarrow.parquet.ParquetFile`` accepts (a path for
        local stores — pyarrow then memory-maps; a file-like for remote
        backends)."""
        raise NotImplementedError

    def walk_files(self, root: str) -> Iterator[str]:
        """Every regular file under ``root``, any depth (GC/orphan
        walks). Missing root yields nothing."""
        raise NotImplementedError

    def remove_empty_dirs(self, root: str) -> None:
        """Prune now-empty directories under root (no-op where the
        backend has no real directories)."""
        raise NotImplementedError


class LocalFS(LakeFS):
    """The historical plain-filesystem behavior, verbatim."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def remove(self, path: str) -> None:
        os.remove(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def getsize(self, path: str) -> int:
        return os.path.getsize(path)

    def getmtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def write_atomic(self, path: str, payload: str) -> None:
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    def cas_create(self, path: str, payload: str) -> bool:
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def open_parquet(self, path: str) -> str:
        return path

    def walk_files(self, root: str) -> Iterator[str]:
        for dirpath, _dirs, names in os.walk(root):
            for n in names:
                yield os.path.join(dirpath, n)

    def remove_empty_dirs(self, root: str) -> None:
        for dirpath, _dirs, names in os.walk(root, topdown=False):
            if dirpath != root and not os.listdir(dirpath):
                try:
                    os.rmdir(dirpath)
                except OSError:
                    pass


class MemoryFS(LakeFS):
    """In-process dict-backed store for seam contract tests. One shared
    store per process (like a bucket); a lock makes ``cas_create`` the
    same all-or-nothing primitive conditional PUT provides."""

    _store: dict[str, bytes] = {}
    _mtimes: dict[str, float] = {}
    _lock = threading.Lock()

    @classmethod
    def _reset(cls) -> None:  # test hook
        with cls._lock:
            cls._store.clear()
            cls._mtimes.clear()

    _SCHEME = "memory://"

    @classmethod
    def _norm(cls, path: str) -> str:
        # normpath would collapse the scheme's double slash
        rest = path[len(cls._SCHEME):] if path.startswith(cls._SCHEME) else path
        return cls._SCHEME + posixpath.normpath(rest)

    def exists(self, path: str) -> bool:
        p = self._norm(path)
        with self._lock:
            return p in self._store or any(
                k.startswith(p + "/") for k in self._store
            )

    def read_text(self, path: str) -> str:
        with self._lock:
            data = self._store.get(self._norm(path))
        if data is None:
            raise FileNotFoundError(path)
        return data.decode("utf-8")

    def listdir(self, path: str) -> list[str]:
        p = self._norm(path) + "/"
        with self._lock:
            names = {
                k[len(p):].split("/", 1)[0]
                for k in self._store
                if k.startswith(p)
            }
        if not names and not self.exists(path):
            raise FileNotFoundError(path)
        return sorted(names)

    def remove(self, path: str) -> None:
        p = self._norm(path)
        with self._lock:
            if p not in self._store:
                raise FileNotFoundError(path)
            del self._store[p]

    def makedirs(self, path: str) -> None:
        pass  # object stores have no directories

    def getsize(self, path: str) -> int:
        with self._lock:
            data = self._store.get(self._norm(path))
        if data is None:
            raise FileNotFoundError(path)
        return len(data)

    def getmtime(self, path: str) -> float:
        p = self._norm(path)
        with self._lock:
            if p not in self._store:
                raise FileNotFoundError(path)
            return self._mtimes.get(p, 0.0)

    def write_atomic(self, path: str, payload: str) -> None:
        import time as _time

        p = self._norm(path)
        with self._lock:
            self._store[p] = payload.encode("utf-8")
            self._mtimes[p] = _time.time()

    def cas_create(self, path: str, payload: str) -> bool:
        import time as _time

        p = self._norm(path)
        with self._lock:
            if p in self._store:
                return False
            self._store[p] = payload.encode("utf-8")
            self._mtimes[p] = _time.time()
            return True

    def open_parquet(self, path: str) -> BinaryIO:
        with self._lock:
            data = self._store.get(self._norm(path))
        if data is None:
            raise FileNotFoundError(path)
        return io.BytesIO(data)

    def walk_files(self, root: str) -> Iterator[str]:
        p = self._norm(root) + "/"
        with self._lock:
            keys = [k for k in self._store if k.startswith(p)]
        yield from keys

    def remove_empty_dirs(self, root: str) -> None:
        pass


def fs_for(path: str) -> LakeFS:
    """Backend by root URI: ``memory://...`` -> the in-process store;
    anything without a scheme -> the local filesystem. Unknown schemes
    raise rather than silently treating a URI as a local path."""
    if path.startswith("memory://"):
        return MemoryFS()
    sep = path.find("://")
    if sep > 0 and "/" not in path[:sep]:
        raise ValueError(
            f"no LakeFS backend for scheme {path[:sep]!r} (see lake/fs.py's "
            "object-store deployment notes for the S3 adapter contract)"
        )
    return LocalFS()


def atomic_write_json(path: str, obj: Any, **dump_kwargs: Any) -> None:
    """Crash-safe JSON sidecar write through the seam: temp+fsync+rename
    on local stores, plain atomic PUT on object stores. Shared by every
    sidecar writer — frontier markers (cdc/multi.py), view group->bucket
    hints (lake/view.py), ANN centroids (lake/ann_index.py) — so
    durability fixes land in one place."""
    fs = fs_for(path)
    d = os.path.dirname(path) or "."
    fs.makedirs(d)
    fs.write_atomic(path, json.dumps(obj, **dump_kwargs))
