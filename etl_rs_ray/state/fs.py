"""Filesystem abstraction for the lake's durable surfaces.

At sandbox scale every lake path is a local directory; at 100 TB the
table lives in object storage. This module keeps the local path exactly
as fast as before (plain ``os``/``shutil`` — no wrapper objects, no
per-call scheme sniff beyond one ``"://" in path`` check) and routes
any path carrying a URI scheme (``memory://``, ``s3://``, ``gs://``,
``file://``) through ``fsspec``.

Scope: ONLY the durable, shared surfaces go through here — manifests,
staged bucket files, committed data files. The transient exchange spill
(``pipelines/cdc.py`` shuffle dir) is *node-local by design* (fast local
disk / ramdisk on each worker node) and keeps raw ``os`` access.

Atomicity notes (why publish-by-manifest makes this safe):

- Local: data files are written ``tmp`` + ``os.replace`` (atomic), and
  the manifest CURRENT pointer swap is the single commit point.
- Object stores: there is no rename, but a single PUT is atomic-visible,
  so ``replace_into`` writes the final object directly. Uncommitted
  objects are garbage until a manifest references them — a half-failed
  epoch never becomes visible, and retried tasks re-PUT identical bytes
  to the same key (deterministic staging filenames).

Workers re-instantiate the filesystem from the URI (``_fs`` is cached
per scheme+process), so staged writes work from any node for real
shared stores. ``memory://`` is per-process and therefore only usable
for driver-side operations (tests).
"""

from __future__ import annotations

import json
import os
import posixpath
import shutil

import pyarrow.parquet as pq

__all__ = [
    "is_uri", "join", "makedirs", "exists", "listdir", "find_files",
    "unlink", "rmtree", "replace_into", "read_text", "write_text_atomic",
    "write_json_atomic", "read_json", "read_table", "write_table_atomic",
]

_FS_CACHE: dict[str, object] = {}


def is_uri(path: str) -> bool:
    return "://" in path


def _fs(path: str):
    """fsspec filesystem for a URI, cached per scheme in this process."""
    scheme = path.split("://", 1)[0]
    fs = _FS_CACHE.get(scheme)
    if fs is None:
        import fsspec

        fs = fsspec.filesystem(scheme)
        _FS_CACHE[scheme] = fs
    return fs


def _strip(path: str) -> str:
    """Canonical scheme-less path for pyarrow ``filesystem=`` calls —
    fsspec's own normalization (e.g. MemoryFileSystem roots paths at /)
    so reads and writes agree on the key."""
    return _fs(path)._strip_protocol(path) if "://" in path else path


def join(base: str, *parts: str) -> str:
    if is_uri(base):
        return posixpath.join(base, *parts)
    return os.path.join(base, *parts)


def makedirs(path: str) -> None:
    if is_uri(path):
        _fs(path).makedirs(path, exist_ok=True)
    else:
        os.makedirs(path, exist_ok=True)


def exists(path: str) -> bool:
    if is_uri(path):
        return _fs(path).exists(path)
    return os.path.exists(path)


def listdir(path: str) -> list[str]:
    """Base names of entries directly under ``path`` ([] if absent)."""
    if is_uri(path):
        fs = _fs(path)
        if not fs.exists(path):
            return []
        return [posixpath.basename(p.rstrip("/")) for p in fs.ls(path, detail=False)]
    if not os.path.isdir(path):
        return []
    return os.listdir(path)


def find_files(path: str) -> list[str]:
    """Every file path under ``path`` recursively, in the same form the
    caller would build with ``join`` (scheme preserved for URIs)."""
    if is_uri(path):
        fs = _fs(path)
        if not fs.exists(path):
            return []
        # rebuild each result as <path>/<suffix> so returned strings are
        # comparable to join(path, ...)-built ones (fs.find returns
        # scheme-less canonical paths, e.g. rooted at / for memory://)
        root = _strip(path).rstrip("/")
        base = path.rstrip("/")
        return [base + p[len(root):] for p in fs.find(path)]
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(os.path.join(root, fn) for fn in files)
    return out


def unlink(path: str) -> None:
    if is_uri(path):
        _fs(path).rm_file(path)
    else:
        os.unlink(path)


def rmtree(path: str) -> None:
    if is_uri(path):
        fs = _fs(path)
        if fs.exists(path):
            fs.rm(path, recursive=True)
    else:
        shutil.rmtree(path, ignore_errors=True)


def replace_into(staged: str, final: str) -> None:
    """Move a staged object to its final name. Local: atomic rename.
    Object store: server-side move (copy+delete under fsspec); safe
    because nothing reads the final name until the manifest commits."""
    if is_uri(staged):
        _fs(staged).mv(staged, final)
    else:
        os.replace(staged, final)


def read_text(path: str) -> str:
    if is_uri(path):
        with _fs(path).open(path, "r") as f:
            return f.read()
    with open(path) as f:
        return f.read()


def write_text_atomic(path: str, data: str) -> None:
    """Local: tmp + fsync + rename (atomic). URI: direct PUT (atomic per
    object-store semantics — readers see old or new, never partial).

    The tmp name is unique per writer (pid + thread id): a shared tmp
    name let two concurrent writers race between ``open`` and
    ``os.replace`` — the loser's rename raised FileNotFoundError after
    the winner moved the shared tmp away (tripped by the manifest race
    test in round 4's review run)."""
    if is_uri(path):
        with _fs(path).open(path, "w") as f:
            f.write(data)
        return
    import threading

    tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def write_json_atomic(path: str, obj: dict) -> None:
    write_text_atomic(path, json.dumps(obj, indent=1, sort_keys=True))


def advance_int_pointer(path: str, value: int) -> int:
    """Monotonic advance of an integer pointer file: after the call the
    file holds ``max(existing, value)``; returns that current value.

    Local paths serialize racers with an flock'd sidecar (read-check-
    write is atomic under the lock), so a slower committer of an OLDER
    epoch can never regress a pointer a newer epoch already swung — the
    tear window the round-4 review flagged in ManifestStore.commit. URI
    paths do a best-effort read-check-PUT: object stores lack a portable
    CAS, and the manifest protocol's epoch idempotence (same-epoch racers
    write identical bytes; commit() pre-checks ``current >= epoch``)
    keeps last-wins safe there."""
    if is_uri(path):
        try:
            cur = int(read_text(path).strip())
        except (FileNotFoundError, ValueError):
            cur = None
        if cur is not None and cur >= value:
            return cur
        with _fs(path).open(path, "w") as f:
            f.write(str(value))
        return value
    import fcntl

    with open(path + ".lock", "a") as lk:
        fcntl.flock(lk.fileno(), fcntl.LOCK_EX)
        try:
            try:
                with open(path) as f:
                    cur = int(f.read().strip())
            except (FileNotFoundError, ValueError):
                cur = None
            if cur is not None and cur >= value:
                return cur
            write_text_atomic(path, str(value))
            return value
        finally:
            fcntl.flock(lk.fileno(), fcntl.LOCK_UN)


def publish_text_exclusive(path: str, data: str) -> bool:
    """First-writer-wins publish (compare-and-swap on existence): write a
    private tmp, then ``os.link`` it to the final name — link fails with
    EEXIST if ANY writer got there first, so exactly one content wins
    even under concurrent racers (a plain rename would let the slower
    writer tear the faster one's already-published bytes). Returns True
    iff THIS call's content is the published one. URI paths fall back to
    last-wins PUT (object stores lack cross-writer CAS here) and return
    whether the object was absent before."""
    if is_uri(path):
        fsys = _fs(path)
        existed = fsys.exists(path)
        if not existed:
            with fsys.open(path, "w") as f:
                f.write(data)
        return not existed
    # pid + thread id (not id(data): two threads publishing the SAME
    # object would share the tmp and A's unlink races B's link)
    import threading

    tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def publish_json_exclusive(path: str, obj: dict) -> bool:
    return publish_text_exclusive(path, json.dumps(obj, indent=1, sort_keys=True))


def read_json(path: str) -> dict:
    return json.loads(read_text(path))


def read_table(path: str, **kwargs):
    if is_uri(path):
        return pq.read_table(_strip(path), filesystem=_fs(path), **kwargs)
    return pq.read_table(path, **kwargs)


def parquet_file(path: str) -> pq.ParquetFile:
    if is_uri(path):
        return pq.ParquetFile(_fs(path).open(path, "rb"))
    return pq.ParquetFile(path)


def write_table_atomic(table, final_path: str, **kwargs) -> None:
    """Publish a parquet file at ``final_path`` such that a concurrent
    reader never sees partial bytes. Local: write tmp, atomic rename.
    URI: direct write (single-PUT visibility; the manifest protocol
    guarantees nobody reads the name before commit anyway)."""
    if is_uri(final_path):
        pq.write_table(table, _strip(final_path), filesystem=_fs(final_path), **kwargs)
        return
    # pid AND thread id: same-process racing writers (e.g. concurrent
    # matview refreshes) would otherwise share the tmp name, and one
    # racer's os.replace yanks the file from under the other — the same
    # bug class the r4 review found in write_text_atomic
    import threading

    tmp = final_path + f".tmp-{os.getpid()}-{threading.get_ident()}"
    pq.write_table(table, tmp, **kwargs)
    os.replace(tmp, final_path)
