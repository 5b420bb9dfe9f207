"""ctypes binding for the native KV-pool bookkeeping (csrc/kvpool.cpp).

Same semantics as the pure-Python BlockAllocator + prefix maps (which
remain the reference implementation and fallback): refcounted blocks, an
idle-cached LRU tier for registered prompt prefixes, and the hash->block
prefix index. Allocation order and eviction order are IDENTICAL to the
Python path (LIFO free list, oldest-tick eviction), so the two are
interchangeable block-for-block — asserted by tests/test_paged.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

from tinygpt_tpu.utils.logging import get_logger

log = get_logger("engine.native_pool")

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _so_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "_native", "libtgpool.so",
    )


def _src_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))),
        "csrc", "kvpool.cpp",
    )


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("TINYGPT_NO_NATIVE"):
            return None
        so, src = _so_path(), _src_path()
        if not os.path.exists(src) and not os.path.exists(so):
            return None
        if os.path.exists(src) and (
            not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)
        ):
            try:
                os.makedirs(os.path.dirname(so), exist_ok=True)
                subprocess.run(
                    [os.environ.get("CXX", "g++"), "-O2", "-std=c++17",
                     "-fPIC", "-shared", "-o", so, src],
                    check=True, capture_output=True, timeout=120,
                )
            except (OSError, subprocess.SubprocessError) as e:
                log.warning("native pool build failed: %s", e)
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:
            log.warning("native pool load failed: %s", e)
            return None
        lib.tg_pool_create.restype = ctypes.c_void_p
        lib.tg_pool_create.argtypes = [ctypes.c_int32]
        lib.tg_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.tg_pool_n_free.argtypes = [ctypes.c_void_p]
        lib.tg_pool_n_free.restype = ctypes.c_int32
        lib.tg_pool_alloc.argtypes = [
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.tg_pool_alloc.restype = ctypes.c_int32
        lib.tg_pool_share.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.tg_pool_release.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
        ]
        lib.tg_pool_register_prefix.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_int32,
        ]
        lib.tg_pool_lookup_prefix.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
        ]
        lib.tg_pool_lookup_prefix.restype = ctypes.c_int32
        lib.tg_pool_block_is_registered.argtypes = [
            ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.tg_pool_block_is_registered.restype = ctypes.c_int32
        lib.tg_pool_n_idle_cached.argtypes = [ctypes.c_void_p]
        lib.tg_pool_n_idle_cached.restype = ctypes.c_int32
        if lib.tg_pool_abi_version() != 2:
            return None
        _LIB = lib
        return _LIB


def _i32(blocks: Sequence[int]) -> np.ndarray:
    return np.asarray(list(blocks), dtype=np.int32)


class NativePoolIndex:
    """Allocator + prefix index backed by csrc/kvpool.cpp."""

    def __init__(self, n_blocks: int, lib):
        self._lib = lib
        self._h = lib.tg_pool_create(n_blocks)
        self.n_blocks = n_blocks

    def __del__(self):
        try:
            if self._h:
                self._lib.tg_pool_destroy(self._h)
        except Exception:
            pass

    @property
    def n_free(self) -> int:
        return int(self._lib.tg_pool_n_free(self._h))

    @property
    def n_idle_cached(self) -> int:
        return int(self._lib.tg_pool_n_idle_cached(self._h))

    def alloc(self, n: int) -> Optional[List[int]]:
        out = np.zeros(max(n, 1), np.int32)
        rc = self._lib.tg_pool_alloc(
            self._h, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        )
        if rc != 0:
            return None
        return out[:n].tolist()

    def share(self, blocks: Sequence[int]) -> None:
        if not blocks:
            return
        arr = _i32(blocks)
        self._lib.tg_pool_share(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(arr),
        )

    def release(self, blocks: Sequence[int], keep_cached=()) -> None:
        if not blocks:
            return
        arr = _i32(blocks)
        keep = set(keep_cached)
        karr = np.asarray([1 if b in keep else 0 for b in blocks], np.uint8)
        self._lib.tg_pool_release(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            karr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(arr),
        )

    def register_prefix(self, h: int, block: int) -> None:
        # h is a 128-bit chain digest (scheduler._block_hashes)
        self._lib.tg_pool_register_prefix(
            self._h,
            ctypes.c_uint64((h >> 64) & 0xFFFFFFFFFFFFFFFF),
            ctypes.c_uint64(h & 0xFFFFFFFFFFFFFFFF),
            block,
        )

    def lookup_prefix(self, h: int) -> Optional[int]:
        b = self._lib.tg_pool_lookup_prefix(
            self._h,
            ctypes.c_uint64((h >> 64) & 0xFFFFFFFFFFFFFFFF),
            ctypes.c_uint64(h & 0xFFFFFFFFFFFFFFFF),
        )
        return None if b < 0 else int(b)

    def is_registered(self, block: int) -> bool:
        return bool(self._lib.tg_pool_block_is_registered(self._h, block))


class PythonPoolIndex:
    """Pure-Python reference implementation over BlockAllocator."""

    def __init__(self, n_blocks: int):
        from tinygpt_tpu.engine.paged_kv import BlockAllocator

        self._a = BlockAllocator(n_blocks)
        self._prefix = {}
        self._block_hash = {}
        self.n_blocks = n_blocks

        def on_evict(b):
            h = self._block_hash.pop(b, None)
            if h is not None:
                self._prefix.pop(h, None)

        self._a.on_evict = on_evict

    @property
    def n_free(self) -> int:
        return self._a.n_free

    @property
    def n_idle_cached(self) -> int:
        return len(self._a.cached_idle)

    def alloc(self, n):
        return self._a.alloc(n)

    def share(self, blocks):
        self._a.share(list(blocks))

    def release(self, blocks, keep_cached=()):
        self._a.release(list(blocks), keep_cached=keep_cached)

    def register_prefix(self, h, block):
        if h not in self._prefix:
            self._prefix[h] = block
            self._block_hash[block] = h

    def lookup_prefix(self, h):
        return self._prefix.get(h)

    def is_registered(self, block):
        return block in self._block_hash


def create_pool_index(n_blocks: int):
    """NativePoolIndex when the C++ core is available, else Python."""
    lib = _load()
    if lib is not None:
        return NativePoolIndex(n_blocks, lib)
    return PythonPoolIndex(n_blocks)
