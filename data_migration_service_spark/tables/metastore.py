"""Pluggable snapshot-commit protocol — the object-store boundary.

`SnapshotTable`'s correctness rests on exactly two metadata primitives:

1. **create-if-absent** of an immutable manifest (the single-writer lock:
   of two committers racing to snapshot id N, exactly one wins);
2. **pointer flip** of HEAD to the winning manifest (readers see either
   the old or the new snapshot, never a torn state).

On a POSIX filesystem those are ``open(..., "x")`` and ``os.replace`` —
what `LocalFsMetaStore` does, and all the sandbox needs. At 100 TB the
table lives on an object store, where the same two primitives are
S3 conditional PUT (``If-None-Match: *``, GA since 2024), GCS
``ifGenerationMatch=0``, or an Iceberg/Hive/DynamoDB catalog CAS.
`ConditionalPutMetaStore` expresses the commit protocol against exactly
that interface — anything providing ``put_if_absent`` and
``compare_and_swap`` — so swapping the sandbox's local store for a real
object store (or delegating the whole commit to an Iceberg catalog, the
module docstring's stated boundary in `lake.py`) changes ONE constructor
argument and zero engine logic.

Reference parity: the reference serializes writers per table with an
in-process job-parameter lock (BatchJobParameterHolder.java:44-53) and
relies on the RDBMS for atomicity (DataMigrationService.java:156-160);
here both collapse into the manifest create-if-absent.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from typing import Any, Protocol


class CommitConflict(RuntimeError):
    """Another writer committed this snapshot id first (lost the race)."""


class MetaStore(Protocol):
    """Metadata I/O surface SnapshotTable commits through."""

    def read_head(self) -> int | None: ...

    def swap_head(self, sid: int) -> None: ...

    def put_manifest(self, sid: int, manifest: dict) -> None:
        """MUST be create-if-absent; raise CommitConflict if sid exists."""
        ...

    def get_manifest(self, sid: int) -> dict: ...

    def list_manifest_ids(self) -> list[int]: ...

    def delete_manifest(self, sid: int) -> None: ...

    def put_ref(self, name: str, sid: int) -> None:
        """Named ref (tag) -> snapshot id. MUST be create-if-absent; raise
        CommitConflict if the name exists (tags are immutable — retag =
        delete + create, exactly Iceberg's tag semantics)."""
        ...

    def get_ref(self, name: str) -> int | None: ...

    def list_refs(self) -> dict[str, int]: ...

    def delete_ref(self, name: str) -> None: ...


def _check_ref_name(name: str) -> str:
    if not name or any(ch in name for ch in "/\\\0\n") or name.startswith("."):
        raise ValueError(f"invalid ref name: {name!r}")
    return name


class LocalFsMetaStore:
    """POSIX commit protocol: ``open('x')`` + ``os.replace`` (atomic on one
    filesystem). This is byte-compatible with tables written before the
    store abstraction existed (same `_meta/HEAD`, `_meta/snapshots/*.json`
    layout)."""

    def __init__(self, root: str):
        self._meta = os.path.join(root, "_meta")
        self._snapdir = os.path.join(self._meta, "snapshots")

    def ensure_layout(self) -> None:
        os.makedirs(self._snapdir, exist_ok=True)

    def _path(self, sid: int) -> str:
        return os.path.join(self._snapdir, f"{sid:08d}.json")

    def read_head(self) -> int | None:
        try:
            with open(os.path.join(self._meta, "HEAD")) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def swap_head(self, sid: int) -> None:
        tmp = os.path.join(self._meta, f".HEAD.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(sid))
        os.replace(tmp, os.path.join(self._meta, "HEAD"))

    def put_manifest(self, sid: int, manifest: dict) -> None:
        try:
            with open(self._path(sid), "x") as f:
                json.dump(manifest, f)
        except FileExistsError as e:
            raise CommitConflict(f"snapshot {sid} already committed") from e

    def get_manifest(self, sid: int) -> dict:
        with open(self._path(sid)) as f:
            return json.load(f)

    def list_manifest_ids(self) -> list[int]:
        return sorted(
            int(p.split(".")[0])
            for p in os.listdir(self._snapdir)
            if p.endswith(".json")
        )

    def delete_manifest(self, sid: int) -> None:
        os.remove(self._path(sid))

    # ---- refs (tags): same create-if-absent primitive as manifests ----

    def _refdir(self) -> str:
        d = os.path.join(self._meta, "refs")
        os.makedirs(d, exist_ok=True)
        return d

    def put_ref(self, name: str, sid: int) -> None:
        try:
            with open(os.path.join(self._refdir(),
                                   _check_ref_name(name)), "x") as f:
                f.write(str(sid))
        except FileExistsError as e:
            raise CommitConflict(f"ref {name!r} already exists") from e

    def get_ref(self, name: str) -> int | None:
        try:
            with open(os.path.join(self._refdir(),
                                   _check_ref_name(name))) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def list_refs(self) -> dict[str, int]:
        d = self._refdir()
        out = {}
        for n in sorted(os.listdir(d)):
            with open(os.path.join(d, n)) as f:
                out[n] = int(f.read().strip())
        return out

    def delete_ref(self, name: str) -> None:
        try:
            os.remove(os.path.join(self._refdir(), _check_ref_name(name)))
        except FileNotFoundError:
            pass


class BlobStore(Protocol):
    """The two object-store conditional primitives the protocol needs
    (S3: PUT If-None-Match:* / GCS: ifGenerationMatch=0; HEAD CAS via a
    catalog row or S3 conditional-write ETag match)."""

    def put_if_absent(self, key: str, value: bytes) -> bool: ...

    def get(self, key: str) -> bytes | None: ...

    def compare_and_swap(self, key: str, expected: bytes | None,
                         value: bytes) -> bool: ...

    def list_keys(self, prefix: str) -> list[str]: ...

    def delete(self, key: str) -> None: ...


class ConditionalPutMetaStore:
    """Commit protocol over any `BlobStore` — the 100 TB shape.

    HEAD is flipped with compare-and-swap against the id the committer
    derived the new snapshot from, which is *strictly stronger* than the
    local store's unconditional replace: even a blob store whose
    create-if-absent were only eventually consistent could not leave HEAD
    pointing backwards. Retries on a stale HEAD are the caller's choice
    (SnapshotTable surfaces the conflict; `cdc_apply`'s epoch guard makes
    the retry idempotent)."""

    def __init__(self, blobs: BlobStore, prefix: str = "_meta"):
        self._blobs = blobs
        self._prefix = prefix.rstrip("/")

    def ensure_layout(self) -> None:  # object stores have no directories
        pass

    def _key(self, sid: int) -> str:
        return f"{self._prefix}/snapshots/{sid:08d}.json"

    def read_head(self) -> int | None:
        raw = self._blobs.get(f"{self._prefix}/HEAD")
        return int(raw) if raw is not None else None

    def swap_head(self, sid: int) -> None:
        # Monotone CAS loop: the manifest put already elected this
        # committer for id `sid`; HEAD only ever advances. A committer that
        # stalls between its put and its flip (object-store reality) finds
        # HEAD already >= sid and no-ops — flipping would move HEAD
        # backwards over a newer commit.
        key = f"{self._prefix}/HEAD"
        new = str(sid).encode()
        while True:
            cur = self._blobs.get(key)
            if cur is not None and int(cur) >= sid:
                return
            if self._blobs.compare_and_swap(key, cur, new):
                return

    def put_manifest(self, sid: int, manifest: dict) -> None:
        body = json.dumps(manifest).encode()
        if not self._blobs.put_if_absent(self._key(sid), body):
            raise CommitConflict(f"snapshot {sid} already committed")

    def get_manifest(self, sid: int) -> dict:
        raw = self._blobs.get(self._key(sid))
        if raw is None:
            raise FileNotFoundError(self._key(sid))
        return json.loads(raw)

    def list_manifest_ids(self) -> list[int]:
        pre = f"{self._prefix}/snapshots/"
        return sorted(
            int(k[len(pre):].split(".")[0])
            for k in self._blobs.list_keys(pre)
            if k.endswith(".json")
        )

    def delete_manifest(self, sid: int) -> None:
        self._blobs.delete(self._key(sid))

    # ---- refs (tags): put_if_absent IS the immutability guarantee ----

    def _ref_key(self, name: str) -> str:
        return f"{self._prefix}/refs/{_check_ref_name(name)}"

    def put_ref(self, name: str, sid: int) -> None:
        if not self._blobs.put_if_absent(self._ref_key(name),
                                         str(sid).encode()):
            raise CommitConflict(f"ref {name!r} already exists")

    def get_ref(self, name: str) -> int | None:
        raw = self._blobs.get(self._ref_key(name))
        return int(raw) if raw is not None else None

    def list_refs(self) -> dict[str, int]:
        pre = f"{self._prefix}/refs/"
        return {k[len(pre):]: int(self._blobs.get(k))
                for k in self._blobs.list_keys(pre)}

    def delete_ref(self, name: str) -> None:
        self._blobs.delete(self._ref_key(name))


class InMemoryBlobStore:
    """Test double with real conditional semantics (and a race hook so
    tests can interleave two committers deterministically). NOT a cache:
    it exists to prove the protocol, not to store data."""

    def __init__(self):
        self._lock = threading.Lock()
        self._data: dict[str, bytes] = {}
        self.before_put: Any = None  # optional hook(key) for race tests

    def put_if_absent(self, key: str, value: bytes) -> bool:
        if self.before_put is not None:
            self.before_put(key)
        with self._lock:
            if key in self._data:
                return False
            self._data[key] = value
            return True

    def get(self, key: str) -> bytes | None:
        with self._lock:
            return self._data.get(key)

    def compare_and_swap(self, key: str, expected: bytes | None,
                         value: bytes) -> bool:
        with self._lock:
            if self._data.get(key) != expected:
                return False
            self._data[key] = value
            return True

    def list_keys(self, prefix: str) -> list[str]:
        with self._lock:
            return sorted(k for k in self._data if k.startswith(prefix))

    def delete(self, key: str) -> None:
        with self._lock:
            self._data.pop(key, None)
