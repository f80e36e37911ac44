"""Native (C++) host runtime: threaded image decode/resize via ctypes.

Build is lazy + cached: the first import compiles loader.cpp with g++ against
the system libpng. Falls back cleanly (callers catch RuntimeError and use the
PIL thread pool instead).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "loader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_loader.so")
_lib = None


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _SO, "-lpng", "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", b"") or b""
        raise RuntimeError(
            f"native loader build failed: {detail.decode(errors='replace')}"
        ) from e
    return _SO


def _get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [ctypes.c_int]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        lib.loader_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int,
        ]
        lib.loader_wait.restype = ctypes.c_int
        lib.loader_wait.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
        ]
        _lib = lib
    return _lib


class NativeImageLoader:
    """Ticketed async PNG decode/resize on a C++ thread pool."""

    def __init__(self, n_threads: int | None = None):
        self.lib = _get_lib()
        n = n_threads or max(2, (os.cpu_count() or 4) - 1)
        self.handle = ctypes.c_void_p(self.lib.loader_create(n))
        self._next_ticket = 0
        self._pending: dict[int, tuple[int, int]] = {}

    def submit(self, path: str, width: int, height: int,
               im_scale: float = 1.0) -> int:
        t = self._next_ticket
        self._next_ticket += 1
        self.lib.loader_submit(self.handle, path.encode(), width, height,
                               ctypes.c_float(im_scale), t)
        self._pending[t] = (width, height)
        return t

    def wait(self, ticket: int) -> np.ndarray:
        w, h = self._pending.pop(ticket)
        out = np.empty((h, w, 3), np.float32)
        rc = self.lib.loader_wait(
            self.handle, ticket,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size,
        )
        if rc != 0:
            raise IOError(f"native decode failed (rc={rc}) for ticket {ticket}")
        return out

    def close(self):
        if self.handle:
            self.lib.loader_destroy(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
