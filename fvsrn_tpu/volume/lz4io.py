"""ctypes bindings for the native LZ4 block codec.

Auto-builds ``libfvsrn_native.so`` from fvsrn_tpu/native on first use (the
toolchain ships g++; no pip deps). If the build fails, compression is
reported unavailable and .cvol IO falls back to uncompressed writes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfvsrn_native.so"))

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        srcs = [os.path.join(_NATIVE_DIR, f)
                for f in ("lz4.cpp", "arith.cpp")]
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH)
                    < max(os.path.getmtime(s) for s in srcs
                          if os.path.exists(s))):
                subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                               check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
        except (OSError, subprocess.CalledProcessError) as e:
            _build_error = str(e)
            return None
        lib.fv_lz4_compress_bound.restype = ctypes.c_int
        lib.fv_lz4_compress_bound.argtypes = [ctypes.c_int]
        lib.fv_lz4_compress.restype = ctypes.c_int
        lib.fv_lz4_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        lib.fv_lz4_decompress.restype = ctypes.c_int
        lib.fv_lz4_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        lib.fv_lz4_decompress_prefix.restype = ctypes.c_int
        lib.fv_lz4_decompress_prefix.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def compress(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native LZ4 unavailable: {_build_error}")
    bound = lib.fv_lz4_compress_bound(len(data))
    out = ctypes.create_string_buffer(bound)
    n = lib.fv_lz4_compress(data, len(data), out, bound)
    if n <= 0:
        raise RuntimeError("LZ4 compression failed")
    return out.raw[:n]


def decompress(data: bytes, raw_len: int) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native LZ4 unavailable: {_build_error}")
    out = ctypes.create_string_buffer(raw_len)
    n = lib.fv_lz4_decompress(data, len(data), out, raw_len)
    if n != raw_len:
        raise RuntimeError(f"LZ4 decompression failed (code {n})")
    return out.raw


def decompress_into(data: bytes, out: np.ndarray, pos: int) -> int:
    """Streaming-chunk decode: decompress the block ``data`` into the
    uint8 buffer ``out`` at offset ``pos``, allowing matches to reach
    back into ``out[:pos]`` (the lz4cpp dictionary-continuation case).
    Returns the number of bytes produced."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native LZ4 unavailable: {_build_error}")
    assert out.dtype == np.uint8 and out.flags["C_CONTIGUOUS"]
    dst = out.ctypes.data + pos
    n = lib.fv_lz4_decompress_prefix(data, len(data), dst,
                                     out.size - pos, min(pos, 65535))
    if n < 0:
        raise RuntimeError(f"LZ4 chunk decompression failed (code {n})")
    return n
