"""ctypes binding for the native zstd codec (builds on demand).

Falls back to "unavailable" (raw blob envelope) when no compiler/libzstd
exists; blob encode/decode stays functional either way.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libspt_zstd.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "libspt_zstd.so"],
                capture_output=True, timeout=120, check=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.spt_zstd_compress.restype = ctypes.c_size_t
        lib.spt_zstd_decompress.restype = ctypes.c_size_t
        lib.spt_zstd_compress_bound.restype = ctypes.c_size_t
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def zstd_available() -> bool:
    return _load() is not None


def zstd_compress(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native zstd codec unavailable")
    bound = lib.spt_zstd_compress_bound(len(data))
    dst = ctypes.create_string_buffer(bound)
    n = lib.spt_zstd_compress(data, len(data), dst, bound)
    if n == 0:
        raise RuntimeError("zstd compression failed")
    return dst.raw[:n]


def zstd_decompress(data: bytes, max_size: int = 1 << 22) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native zstd codec unavailable")
    dst = ctypes.create_string_buffer(max_size)
    n = lib.spt_zstd_decompress(data, len(data), dst, max_size)
    if n == 0:
        raise RuntimeError("zstd decompression failed")
    return dst.raw[:n]
