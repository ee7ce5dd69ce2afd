"""ctypes bindings for the native (C++) data loader.

``NativeBatchLoader`` mirrors ``BatchLoader``'s iterator surface for the
GT-crop pipeline but runs decode + crop + augmentation in a C++ thread
pool (native/loader.cc) with zero Python in the loop — the framework-
grade replacement for the reference's DataLoader worker processes.

Falls back gracefully: ``available()`` is False when the shared library
hasn't been built (``native/build.sh``) and callers keep using the
Python ``BatchLoader``.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import shutil
import subprocess
import tempfile
from typing import Iterator

import numpy as np

_LIB_PATH = pathlib.Path(__file__).resolve().parents[2] / "native" / "libsrganfd_loader.so"
_lib = None


def _rebuild() -> bool:
    script = _LIB_PATH.parent / "build.sh"
    try:
        subprocess.run(["sh", str(script)], check=True, capture_output=True)
    except Exception:
        return False
    return _LIB_PATH.exists()


def _bind(lib) -> None:
    """Declare the ctypes signatures. Raises AttributeError on a stale .so
    that predates a required symbol (handled by _load with a rebuild)."""
    lib.loader_create3.restype = ctypes.c_void_p
    lib.loader_create3.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_uint64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_uint64,
    ]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.decode_image.restype = ctypes.c_int
    lib.decode_image.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]


def _load(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        if not (build_if_missing and _rebuild()):
            return None
    rebuilt = False
    path = str(_LIB_PATH)
    while True:
        try:
            lib = ctypes.CDLL(path)
            _bind(lib)
            break
        except (AttributeError, OSError):
            # Stale/unloadable .so from an older checkout: rebuild once,
            # else report unavailable so callers fall back to BatchLoader.
            if rebuilt or not build_if_missing or not _rebuild():
                return None
            rebuilt = True
            # dlopen dedupes loaded objects by inode and the linker may
            # truncate in place, so the stale image could shadow the fresh
            # build at the canonical path — load via a unique temp copy
            # (removed at interpreter exit; the mapping stays valid).
            import atexit

            tmp = tempfile.NamedTemporaryFile(suffix=".so", delete=False)
            tmp.close()
            shutil.copy2(_LIB_PATH, tmp.name)
            atexit.register(lambda p=tmp.name: os.unlink(p) if os.path.exists(p) else None)
            path = tmp.name
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeBatchLoader:
    """Infinite iterator of ``{"gt": (N, crop, crop, 3) float32}`` batches
    decoded and augmented natively."""

    def __init__(
        self,
        image_paths: list[str],
        crop: int,
        batch_size: int,
        seed: int = 0,
        num_threads: int = 4,
        train: bool = True,
        uint8: bool = False,
        start_batch: int = 0,
    ) -> None:
        """``uint8=True`` yields raw byte batches (the /255 then happens
        on-device inside the degradation program) — 4x less host->device
        transfer, which matters through remote-execution tunnels.

        ``start_batch`` seeks the deterministic stream (batches are a pure
        function of (seed, batch id), emitted in id order): the first
        ``__iter__`` yield is exactly batch ``start_batch`` — an O(1) skip
        for exact mid-run resume."""
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (build native/build.sh)")
        self._lib = lib
        self.crop = crop
        self.batch_size = batch_size
        self.uint8 = uint8
        arr = (ctypes.c_char_p * len(image_paths))(
            *[p.encode() for p in image_paths]
        )
        self._handle = lib.loader_create3(
            arr, len(image_paths), crop, batch_size, seed, num_threads, int(train),
            int(uint8), int(start_batch),
        )
        dtype = np.uint8 if uint8 else np.float32
        self._buf = np.empty((batch_size, crop, crop, 3), dtype)

    def __iter__(self) -> Iterator[dict]:
        while True:
            ok = self._lib.loader_next(
                self._handle, self._buf.ctypes.data_as(ctypes.c_void_p)
            )
            if not ok:
                return
            yield {"gt": self._buf.copy()}

    def close(self) -> None:
        if self._handle:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self) -> None:  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def decode_image_native(path: str, max_side: int = 8192) -> np.ndarray | None:
    """Decode one image to float32 RGB [0,1] via the native decoder."""
    lib = _load()
    if lib is None:
        return None
    buf = np.empty((max_side, max_side, 3), np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.decode_image(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_side,
        max_side,
        ctypes.byref(h),
        ctypes.byref(w),
    )
    if rc != 1:
        return None
    return buf.reshape(-1)[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()
