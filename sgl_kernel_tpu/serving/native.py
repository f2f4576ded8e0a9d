"""ctypes bindings for the native serving runtime (csrc/serving_native.cpp).

Builds the shared library on first use if the toolchain is available;
falls back to a pure-Python implementation otherwise (tests cover both).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libserving_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_CSRC, "serving_native.cpp")
    stale = not os.path.exists(_LIB_PATH) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if stale:
        # Always rebuild when the source is newer than the library so edits to
        # serving_native.cpp take effect (the .so is not version-controlled).
        try:
            subprocess.run(["make", "-C", _CSRC, "-B"], check=True, capture_output=True, timeout=120)
        except Exception as e:
            if not os.path.exists(_LIB_PATH):
                return None
            # NEVER silently load a stale binary over edited source — the
            # behavior/code divergence is worse than losing the native path
            raise RuntimeError(
                f"csrc/serving_native.cpp is newer than the built library and "
                f"rebuilding failed ({e}); fix the build or delete the stale .so"
            ) from e
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.sn_create.restype = ctypes.c_int64
    lib.sn_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.sn_destroy.argtypes = [ctypes.c_int64]
    lib.sn_free_count.restype = ctypes.c_int32
    lib.sn_free_count.argtypes = [ctypes.c_int64]
    lib.sn_alloc.restype = ctypes.c_int32
    lib.sn_alloc.argtypes = [ctypes.c_int64, ctypes.c_int32, i32p]
    lib.sn_release.argtypes = [ctypes.c_int64, ctypes.c_int32, i32p]
    lib.sn_assemble_tables.argtypes = [ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p]
    lib.sn_radix_match.restype = ctypes.c_int32
    lib.sn_radix_match.argtypes = [ctypes.c_int64, i32p, ctypes.c_int32, i32p, ctypes.c_int32]
    lib.sn_radix_insert.restype = ctypes.c_int32
    lib.sn_radix_insert.argtypes = [ctypes.c_int64, i32p, ctypes.c_int32, i32p, ctypes.c_int32]
    lib.sn_radix_match_lock.restype = ctypes.c_int32
    lib.sn_radix_match_lock.argtypes = [
        ctypes.c_int64, i32p, ctypes.c_int32, i32p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.sn_radix_unlock.restype = ctypes.c_int32
    lib.sn_radix_unlock.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.sn_radix_evict.restype = ctypes.c_int32
    lib.sn_radix_evict.argtypes = [ctypes.c_int64, ctypes.c_int32]
    lib.sn_radix_cached_pages.restype = ctypes.c_int64
    lib.sn_radix_cached_pages.argtypes = [ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_i32(arr) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(arr, dtype=np.int32))


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class NativeAllocator:
    """Native paged-KV allocator with a radix prefix cache.

    Same free-list semantics as serving.engine.PageAllocator plus
    longest-prefix KV-page reuse (the SGLang radix-cache serving feature),
    all bookkeeping in C++.
    """

    def __init__(self, num_pages: int, page_size: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native serving library unavailable")
        self._lib = lib
        self._h = lib.sn_create(num_pages, page_size)
        self.num_pages = num_pages
        self.page_size = page_size

    def __del__(self):
        try:
            self._lib.sn_destroy(self._h)
        except Exception:
            pass

    @property
    def free(self) -> int:
        return int(self._lib.sn_free_count(self._h))

    def alloc(self, n: int) -> Optional[List[int]]:
        out = np.empty(n, np.int32)
        r = self._lib.sn_alloc(self._h, n, _ptr(out))
        return out.tolist() if r == n else None

    def release(self, pages: List[int]):
        arr = _as_i32(pages)
        self._lib.sn_release(self._h, len(pages), _ptr(arr))

    def assemble_tables(self, page_lists: List[List[int]], max_pages: int) -> np.ndarray:
        batch = len(page_lists)
        flat = _as_i32([p for lst in page_lists for p in lst])
        counts = _as_i32([len(lst) for lst in page_lists])
        out = np.zeros((batch, max_pages), np.int32)
        self._lib.sn_assemble_tables(batch, max_pages, _ptr(flat), _ptr(counts), _ptr(out))
        return out

    # ---- radix prefix cache ------------------------------------------
    def match_prefix(self, tokens: List[int]) -> Tuple[int, List[int]]:
        toks = _as_i32(tokens)
        out = np.empty(max(1, len(tokens) // self.page_size + 1), np.int32)
        n = self._lib.sn_radix_match(self._h, _ptr(toks), len(tokens), _ptr(out), len(out))
        return int(n), out[: n // self.page_size].tolist()

    def match_prefix_locked(self, tokens: List[int]) -> Tuple[int, List[int], int]:
        """match_prefix + pin the path against eviction.

        Returns (matched_tokens, pages, lock_id); release the pin with
        ``unlock(lock_id)``. Handle-based release stays exact across later
        edge splits (token replay does not).
        """
        toks = _as_i32(tokens)
        out = np.empty(max(1, len(tokens) // self.page_size + 1), np.int32)
        lock_id = ctypes.c_int64(0)
        n = self._lib.sn_radix_match_lock(
            self._h, _ptr(toks), len(tokens), _ptr(out), len(out), ctypes.byref(lock_id)
        )
        return int(n), out[: n // self.page_size].tolist(), int(lock_id.value)

    def unlock(self, lock_id: int):
        self._lib.sn_radix_unlock(self._h, lock_id)

    def insert_prefix(self, tokens: List[int], pages: List[int]) -> int:
        toks = _as_i32(tokens)
        pg = _as_i32(pages)
        return int(self._lib.sn_radix_insert(self._h, _ptr(toks), len(tokens), _ptr(pg), len(pages)))

    def evict(self, want_pages: int) -> int:
        return int(self._lib.sn_radix_evict(self._h, want_pages))

    @property
    def cached_pages(self) -> int:
        return int(self._lib.sn_radix_cached_pages(self._h))
