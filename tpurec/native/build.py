"""Lazy g++ build + ctypes loading of the native library."""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ("csv_loader.cpp",)
_LIB_NAME = "libtpurec_native.so"

_lock = threading.Lock()
_lib = None
_build_failed = False


def _lib_path() -> str:
    cache = os.environ.get(
        "TPUREC_NATIVE_CACHE", os.path.join(_SRC_DIR, "_build")
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, _LIB_NAME)


def _needs_build(lib: str) -> bool:
    if not os.path.exists(lib):
        return True
    lib_mtime = os.path.getmtime(lib)
    return any(
        os.path.getmtime(os.path.join(_SRC_DIR, s)) > lib_mtime
        for s in _SOURCES
    )


def _build(lib: str) -> None:
    srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
    # build into a temp file then rename: concurrent processes race benignly
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(lib))
    os.close(fd)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", "-o", tmp, *srcs,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, lib)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_library():
    """ctypes handle to the native library, building if needed.

    Returns None when no toolchain is available (callers fall back to
    NumPy paths)."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        lib_file = _lib_path()
        try:
            if _needs_build(lib_file):
                _build(lib_file)
            lib = ctypes.CDLL(lib_file)
        except Exception:
            _build_failed = True
            return None
        lib.trc_count_rows.restype = ctypes.c_int
        lib.trc_count_rows.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.trc_parse_i32.restype = ctypes.c_int64
        lib.trc_parse_i32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_library() is not None
