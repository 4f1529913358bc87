"""ctypes bindings for the native I/O runtime (native/tpumixio.cpp).

Loads ``libtpumixio.so`` if present (builds it on first use when a compiler
is available); every entry point has the numpy implementation in
tpumix/data/wavio.py as fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_NATIVE = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_REPO_NATIVE, "build", "libtpumixio.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False

FORMAT_NAMES = {1: "PCM_16", 2: "PCM_24", 3: "PCM_32", 4: "FLOAT", 5: "DOUBLE"}


def _build() -> bool:
    makefile = os.path.join(_REPO_NATIVE, "Makefile")
    if not os.path.exists(makefile):
        return False
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_REPO_NATIVE)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("TPUMIX_NO_NATIVE"):
        return None
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.tpumixio_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.tpumixio_info.restype = ctypes.c_int
    lib.tpumixio_read_f32.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.tpumixio_read_f32.restype = ctypes.c_int64
    lib.tpumixio_read_mono_f32.argtypes = lib.tpumixio_read_f32.argtypes
    lib.tpumixio_read_mono_f32.restype = ctypes.c_int64
    lib.tpumixio_read_chunks_mono_f32.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.tpumixio_read_chunks_mono_f32.restype = ctypes.c_int64
    lib.tpumixio_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.tpumixio_write.restype = ctypes.c_int
    _lib = lib
    return _lib


def info(path: str) -> Optional[Tuple[int, int, int, str]]:
    lib = get_lib()
    if lib is None:
        return None
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    frames = ctypes.c_int64()
    fmt = ctypes.c_int32()
    rc = lib.tpumixio_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                           ctypes.byref(frames), ctypes.byref(fmt))
    if rc != 0:
        return None
    return sr.value, ch.value, frames.value, FORMAT_NAMES.get(fmt.value, "?")


def read_f32(path: str, start: int, count: int, channels: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((count, channels), dtype=np.float32)
    got = lib.tpumixio_read_f32(
        path.encode(), start, count, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    if got < 0:
        return None
    return out[:got]


def read_mono_f32(path: str, start: int, count: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(count, dtype=np.float32)
    got = lib.tpumixio_read_mono_f32(
        path.encode(), start, count, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    if got < 0:
        return None
    return out[:got]


def read_chunks_mono_f32(path: str, chunk_samples: int, num_chunks: int) -> Optional[np.ndarray]:
    """Whole-song fused decode+downmix+chunk: ``[num_chunks, chunk_samples]``."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((num_chunks, chunk_samples), dtype=np.float32)
    got = lib.tpumixio_read_chunks_mono_f32(
        path.encode(), chunk_samples, num_chunks,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if got < 0:
        return None
    return out


def write(path: str, data: np.ndarray, samplerate: int, subtype: str = "FLOAT") -> bool:
    lib = get_lib()
    if lib is None:
        return False
    data = np.ascontiguousarray(np.atleast_2d(data.T).T if data.ndim == 1 else data,
                                dtype=np.float32)
    if data.ndim == 1:
        data = data[:, None]
    code = {"FLOAT": 4, "PCM_16": 1}.get(subtype)
    if code is None:
        return False
    rc = lib.tpumixio_write(
        path.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        data.shape[0], data.shape[1], samplerate, code,
    )
    return rc == 0
