"""Pluggable storage for datasets, guid logs, and cluster files.

The reference routes every file touch through iopath's ``PathManager`` so
the same code runs on local disk and manifold/memcache URIs
(reference: strategy.py:681-711 checkpoint writes via ``self._pathmgr``;
dataset/config.py:12-25 ``manifold://`` default data paths).  The TPU
rebuild's equivalent: plain local paths take the zero-overhead
os/builtins fast path, and any URL-style path (``gs://``, ``s3://``,
``memory://``, ...) dispatches to fsspec — so bucket-hosted Panoptic or
InterHand trees, remote guid-log replay, and remote cluster files work
without code changes.  Checkpoints already ride orbax, which speaks
``gs://`` natively.

Only metadata and small-file IO belongs here.  The JPEG decode hot path
(data/pipeline.py) also calls :func:`read_bytes` — for remote roots the
decoded-view cache in the loader is the read shield; the native C++
decoder still applies (it decodes from the fetched bytes).

fsspec import stays lazy: local-only runs (tests, the bench, the
forkserver decode workers) never pay it.
"""

from __future__ import annotations

import io
import os
import re
import shutil

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def is_remote(path) -> bool:
    """True when `path` is a URL-style path that dispatches to fsspec.

    ``file://`` counts: fsspec resolves it natively, whereas the os
    fast path would treat the whole URI as a literal relative name."""
    return bool(_SCHEME_RE.match(str(path)))


def _fs(path):
    import fsspec

    fs, fpath = fsspec.core.url_to_fs(str(path))
    return fs, fpath


def open_file(path, mode: str = "r"):
    """Open for read/write; text modes are UTF-8 on remote backends."""
    if not is_remote(path):
        return open(path, mode)
    fs, fpath = _fs(path)
    if "w" in mode or "a" in mode or "x" in mode:
        fs.makedirs(fs._parent(fpath), exist_ok=True)
    f = fs.open(fpath, mode if "b" in mode else mode + "b")
    if "b" in mode:
        return f
    return io.TextIOWrapper(f, encoding="utf-8")


def read_bytes(path) -> bytes:
    """Whole-file read; the image hot path (one JPEG per view) uses this."""
    if not is_remote(path):
        with open(path, "rb") as f:
            return f.read()
    fs, fpath = _fs(path)
    return fs.cat_file(fpath)


def exists(path) -> bool:
    if not is_remote(path):
        return os.path.exists(path)
    fs, fpath = _fs(path)
    return fs.exists(fpath)


def isdir(path) -> bool:
    if not is_remote(path):
        return os.path.isdir(path)
    fs, fpath = _fs(path)
    return fs.isdir(fpath)


def makedirs(path) -> None:
    if not is_remote(path):
        os.makedirs(path, exist_ok=True)
        return
    fs, fpath = _fs(path)
    fs.makedirs(fpath, exist_ok=True)


def listdir(path):
    """Base names of entries under `path` (sorted for remote backends,
    whose listing order is backend-defined)."""
    if not is_remote(path):
        return os.listdir(path)
    fs, fpath = _fs(path)
    try:
        entries = fs.ls(fpath, detail=False)
    except FileNotFoundError:
        # Object stores have no directory objects: a prefix nothing has
        # been written under yet "does not exist" even right after
        # makedirs (a no-op on gcsfs/s3fs).  Empty is the truthful answer.
        return []
    return sorted(
        name.rstrip("/").rsplit("/", 1)[-1] for name in entries
    )


def copy(src, dst) -> None:
    """Copy one file, across backends if needed; parent dirs are created.
    Streams in chunks — checkpoint shards must not be materialized whole
    in host RAM (orbax param files run to hundreds of MB)."""
    if not is_remote(src) and not is_remote(dst):
        parent = os.path.dirname(str(dst))
        if parent:
            os.makedirs(parent, exist_ok=True)
        shutil.copy(src, dst)
        return
    if not is_remote(dst):
        parent = os.path.dirname(str(dst))
        if parent:
            os.makedirs(parent, exist_ok=True)
        fs, spath = _fs(src)
        fs.get_file(spath, str(dst))
        return
    if not is_remote(src):
        fs, dpath = _fs(dst)
        fs.makedirs(fs._parent(dpath), exist_ok=True)
        fs.put_file(str(src), dpath)
        return
    with open_file(src, "rb") as r, open_file(dst, "wb") as w:
        shutil.copyfileobj(r, w, 1024 * 1024)


def copytree(src, dst) -> None:
    """Recursive copy (dirs_exist_ok semantics), across backends."""
    if not is_remote(src) and not is_remote(dst):
        shutil.copytree(src, dst, dirs_exist_ok=True)
        return
    sfs, spath = (None, str(src)) if not is_remote(src) else _fs(src)
    if sfs is None:
        names = []
        for root, _, files in os.walk(spath):
            rel = os.path.relpath(root, spath)
            names += [os.path.join(rel, f) if rel != "." else f for f in files]
    else:
        names = [
            p[len(spath) :].lstrip("/")
            for p in sfs.find(spath)
        ]
    for name in names:
        copy(join(str(src), name), join(str(dst), name))


def join(base, *parts) -> str:
    """os.path.join for local paths, '/'-join for remote ones."""
    if not is_remote(base):
        return os.path.join(base, *parts)
    out = str(base).rstrip("/")
    for p in parts:
        out += "/" + str(p).strip("/")
    return out
