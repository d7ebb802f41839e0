"""Native (C++) host-runtime components, bound via ctypes.

Built on first import with g++ into a user cache directory, keyed by a
content hash of the source (a stale binary can never shadow newer source,
and no binary ever lives in the repo). The loader additionally checks the
library's `pq_abi_version` export against its own expectation. Falls back to
a pure-Python free-list with identical semantics if no toolchain is
available, so the package never hard-fails — but the native path is the
product path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pq_alloc.cpp")
_BPE_SRC = os.path.join(_DIR, "pq_bpe.cpp")
_ABI_VERSION = 2
_BPE_ABI_VERSION = 1
_build_lock = threading.Lock()


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = os.path.join(base, "protoquant_tpu")
    try:
        os.makedirs(d, exist_ok=True)
        return d
    except OSError:
        return tempfile.gettempdir()


def _build(src: str = _SRC, stem: str = "_pq_alloc") -> str | None:
    with _build_lock:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(_cache_dir(), f"{stem}_{digest}.so")
        if os.path.exists(so):
            return so
        try:
            tmp = so + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so)  # atomic: concurrent builders race safely
            return so
        except Exception:
            return None


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.pq_abi_version.restype = ctypes.c_int32
    lib.pq_abi_version.argtypes = []
    if lib.pq_abi_version() != _ABI_VERSION:
        return None
    lib.pq_alloc_create.restype = ctypes.c_void_p
    lib.pq_alloc_create.argtypes = [ctypes.c_int32]
    lib.pq_alloc_destroy.argtypes = [ctypes.c_void_p]
    lib.pq_alloc_pages.restype = ctypes.c_int32
    lib.pq_alloc_pages.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.pq_free_pages.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.pq_num_free.restype = ctypes.c_int32
    lib.pq_num_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class PageAllocator:
    """O(1) KV page allocator; native C++ when available."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self._lib = _load()
        if self._lib is not None:
            self._h = self._lib.pq_alloc_create(num_pages)
            self.native = self._h is not None
        else:
            self.native = False
        if not self.native:
            self._free = list(range(num_pages - 1, -1, -1))

    def alloc(self, n: int) -> list[int] | None:
        """All-or-nothing: returns n page ids or None."""
        if self.native:
            out = (ctypes.c_int32 * n)()
            got = self._lib.pq_alloc_pages(self._h, n, out)
            return list(out) if got == n else None
        if len(self._free) < n:
            return None
        return [self._free.pop() for _ in range(n)]

    def free(self, pages) -> None:
        if not pages:
            return
        if self.native:
            arr = (ctypes.c_int32 * len(pages))(*pages)
            self._lib.pq_free_pages(self._h, arr, len(pages))
        else:
            self._free.extend(pages)

    @property
    def num_free(self) -> int:
        if self.native:
            return int(self._lib.pq_num_free(self._h))
        return len(self._free)

    def __del__(self):  # pragma: no cover
        if getattr(self, "native", False) and self._lib is not None:
            try:
                self._lib.pq_alloc_destroy(self._h)
            except Exception:
                pass


_bpe_lib = None


def _load_bpe():
    global _bpe_lib
    if _bpe_lib is not None:
        return _bpe_lib
    so = _build(_BPE_SRC, "_pq_bpe")
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.pq_bpe_abi_version.restype = ctypes.c_int32
    lib.pq_bpe_abi_version.argtypes = []
    if lib.pq_bpe_abi_version() != _BPE_ABI_VERSION:
        return None
    p_i32 = ctypes.POINTER(ctypes.c_int32)
    lib.pq_bpe_new.restype = ctypes.c_void_p
    lib.pq_bpe_new.argtypes = [ctypes.c_int32, p_i32, p_i32, p_i32]
    lib.pq_bpe_free.argtypes = [ctypes.c_void_p]
    lib.pq_bpe_encode.restype = ctypes.c_int32
    lib.pq_bpe_encode.argtypes = [ctypes.c_void_p, p_i32, ctypes.c_int32, p_i32]
    _bpe_lib = lib
    return lib


class BpeMerger:
    """BPE merge loop over initial symbol ids; native C++ when available,
    pure-Python fallback with identical semantics (lowest merge rank first,
    leftmost on ties) otherwise. ``merges`` is a list of (left_id, right_id,
    new_id) in RANK ORDER."""

    def __init__(self, merges):
        self._lib = _load_bpe()
        self.native = False
        if self._lib is not None and merges:
            n = len(merges)
            left = (ctypes.c_int32 * n)(*[m[0] for m in merges])
            right = (ctypes.c_int32 * n)(*[m[1] for m in merges])
            out = (ctypes.c_int32 * n)(*[m[2] for m in merges])
            self._h = self._lib.pq_bpe_new(n, left, right, out)
            self.native = self._h is not None
        if not self.native:
            self._ranks = {}
            for r, (a, b, nid) in enumerate(merges):
                self._ranks.setdefault((a, b), (r, nid))

    def merge(self, ids: list) -> list:
        if not ids:
            return []
        if self.native:
            n = len(ids)
            inp = (ctypes.c_int32 * n)(*ids)
            out = (ctypes.c_int32 * n)()
            m = self._lib.pq_bpe_encode(self._h, inp, n, out)
            return list(out[:m])
        sym = list(ids)
        while len(sym) > 1:
            best = None
            best_i = -1
            for i in range(len(sym) - 1):
                v = self._ranks.get((sym[i], sym[i + 1]))
                if v is not None and (best is None or v[0] < best[0]):
                    best, best_i = v, i
            if best is None:
                break
            sym[best_i : best_i + 2] = [best[1]]
        return sym

    def __del__(self):  # pragma: no cover
        if getattr(self, "native", False) and self._lib is not None:
            try:
                self._lib.pq_bpe_free(self._h)
            except Exception:
                pass
