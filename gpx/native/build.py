"""On-demand g++ build + ctypes loader for the native components."""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

_HERE = pathlib.Path(__file__).parent
_LOCK = threading.Lock()
_CACHE: dict = {}


def _build(src: pathlib.Path, so: pathlib.Path) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(src), "-o", str(so)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load_fastcsv():
    """Return the fastcsv ctypes library, or None if unavailable."""
    with _LOCK:
        if "fastcsv" in _CACHE:
            return _CACHE["fastcsv"]
        src = _HERE / "fastcsv.cpp"
        so = _HERE / "_fastcsv.so"
        lib = None
        try:
            if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
                if not _build(src, so):
                    _CACHE["fastcsv"] = None
                    return None
            lib = ctypes.CDLL(str(so))
            lib.gpx_write_csv.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64,
            ]
            lib.gpx_write_csv.restype = ctypes.c_int
            lib.gpx_csv_shape.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ]
            lib.gpx_csv_shape.restype = ctypes.c_int
            lib.gpx_read_csv.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64,
            ]
            lib.gpx_read_csv.restype = ctypes.c_int
        except Exception:
            lib = None
        _CACHE["fastcsv"] = lib
        return lib
