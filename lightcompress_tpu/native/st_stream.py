"""ctypes bindings for the native safetensors shard streamer.

Builds ``st_stream.cpp`` with g++ on first use (cached next to the
source, keyed on source mtime) and exposes zero-copy numpy views into the
mmapped data section: ``get(key)`` costs one np.frombuffer — no read(),
no copy; the OS pages bytes in as the loader touches them.  bf16 tensors
come back as uint16 bit patterns (the convention the loader's _np_to_jnp
already speaks); fp8 as uint8 bits.

Falls back cleanly: ``native_available()`` is False when no compiler is
present, and ``models.hf_loader._ShardReader`` keeps its pure-Python
path.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "st_stream.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_st_stream.so")

_DTYPES: Dict[str, Tuple[np.dtype, int]] = {
    "F64": (np.dtype(np.float64), 8),
    "F32": (np.dtype(np.float32), 4),
    "F16": (np.dtype(np.float16), 2),
    "BF16": (np.dtype(np.uint16), 2),   # raw bits; _np_to_jnp decodes
    "I64": (np.dtype(np.int64), 8),
    "I32": (np.dtype(np.int32), 4),
    "I16": (np.dtype(np.int16), 2),
    "I8": (np.dtype(np.int8), 1),
    "U8": (np.dtype(np.uint8), 1),
    "BOOL": (np.dtype(np.bool_), 1),
    # F8_E4M3/F8_E5M2 deliberately absent: consumers of fp8 checkpoints
    # (_Fp8DequantReader) expect DECODED float values from the torch
    # fallback, not raw bits — get() returns None and the reader falls
    # back (tests/test_fp8_checkpoint.py)
}

_lib = None
_build_err: Optional[str] = None


def _build() -> Optional[ctypes.CDLL]:
    global _build_err
    if os.path.exists(_LIB) and \
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return ctypes.CDLL(_LIB)
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB + ".tmp"],
            check=True, capture_output=True, timeout=120)
        os.replace(_LIB + ".tmp", _LIB)
        return ctypes.CDLL(_LIB)
    except (OSError, subprocess.SubprocessError) as e:
        _build_err = str(e)
        return None


def _get_lib():
    global _lib
    if _lib is None and _build_err is None:
        lib = _build()
        if lib is not None:
            lib.sts_open.argtypes = [ctypes.c_char_p]
            lib.sts_open.restype = ctypes.c_int
            lib.sts_header_len.argtypes = [ctypes.c_int]
            lib.sts_header_len.restype = ctypes.c_uint64
            lib.sts_header.argtypes = [ctypes.c_int]
            lib.sts_header.restype = ctypes.c_void_p
            lib.sts_data.argtypes = [ctypes.c_int]
            lib.sts_data.restype = ctypes.c_void_p
            lib.sts_data_len.argtypes = [ctypes.c_int]
            lib.sts_data_len.restype = ctypes.c_uint64
            lib.sts_advise_seq.argtypes = [ctypes.c_int]
            lib.sts_close.argtypes = [ctypes.c_int]
        _lib = lib
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


class NativeShardStreamer:
    """Zero-copy tensor views over one .safetensors shard."""

    def __init__(self, path: str, sequential: bool = False):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError(f"native streamer unavailable: {_build_err}")
        self._lib = lib
        self._h = lib.sts_open(path.encode())
        if self._h < 0:
            raise OSError(f"sts_open({path}) failed: {self._h}")
        hlen = lib.sts_header_len(self._h)
        raw = ctypes.string_at(lib.sts_header(self._h), hlen)
        self.header = json.loads(raw)
        self.header.pop("__metadata__", None)
        self._data = lib.sts_data(self._h)
        self._data_len = lib.sts_data_len(self._h)
        if sequential:
            lib.sts_advise_seq(self._h)

    def keys(self):
        return self.header.keys()

    def dtype_of(self, key: str) -> str:
        return self.header[key]["dtype"]

    def get(self, key: str) -> Optional[np.ndarray]:
        """Zero-copy view (read-only) of one tensor; None if absent or a
        dtype this path doesn't map (caller falls back)."""
        ent = self.header.get(key)
        if ent is None:
            return None
        dt = _DTYPES.get(ent["dtype"])
        if dt is None:
            return None
        start, end = ent["data_offsets"]
        n = (end - start) // dt[1]
        if end > self._data_len:
            raise ValueError(f"{key}: offsets beyond data section")
        buf = (ctypes.c_uint8 * (end - start)).from_address(
            self._data + start)
        arr = np.frombuffer(buf, dtype=dt[0], count=n)
        return arr.reshape(ent["shape"])

    def close(self):
        """Unmap the shard.  Views returned by ``get`` die with it — the
        loader consumes each tensor (casts into a jax array) before
        moving on, so nothing outlives the mapping in practice; without
        an explicit close the mapping persists for the process lifetime
        (safe, just address space)."""
        if getattr(self, "_h", -1) >= 0:
            self._lib.sts_close(self._h)
            self._h = -1
