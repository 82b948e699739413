"""ctypes bridge to the C++ native runtime (native/zaru_native.cpp).

Builds on first use via the Makefile (g++, libjpeg, V4L2 kernel headers —
all part of the base toolchain). Set ``ZARU_TPU_NATIVE=0`` to disable and
fall back to pure-Python paths.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

log = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "build" / "libzaru_native.so"

_lib = None


class NativeUnavailable(RuntimeError):
    pass


def lib() -> ctypes.CDLL:
    """Returns the loaded native library, building it if needed."""
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("ZARU_TPU_NATIVE", "1") == "0":
        raise NativeUnavailable("disabled via ZARU_TPU_NATIVE=0")
    src = _NATIVE_DIR / "zaru_native.cpp"
    if not src.is_file() and not _SO_PATH.is_file():
        # Installed as a wheel without the native tree.
        raise NativeUnavailable(
            f"native sources not found at {src}; install from the source "
            "repo or set ZARU_TPU_NATIVE=0 to silence"
        )
    if not _SO_PATH.is_file() or (
        src.is_file() and _SO_PATH.stat().st_mtime < src.stat().st_mtime
    ):
        log.info("building native library in %s", _NATIVE_DIR)
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                text=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            detail = getattr(e, "stderr", str(e))
            raise NativeUnavailable(f"native build failed: {detail}") from e
    try:
        _lib = ctypes.CDLL(str(_SO_PATH))
    except OSError as e:
        # A make that exits 0 without producing the .so must still take
        # the graceful NativeUnavailable fallback paths, not raise a raw
        # OSError past them.
        raise NativeUnavailable(f"native library load failed: {e}") from e
    _configure(_lib)
    return _lib


def _configure(l: ctypes.CDLL) -> None:
    l.zj_jpeg_size.restype = ctypes.c_int
    l.zj_jpeg_size.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    l.zj_jpeg_decode.restype = ctypes.c_int
    l.zj_jpeg_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_void_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_size_t,
    ]
    l.zj_cam_query.restype = ctypes.c_int
    l.zj_cam_query.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint32),
    ]
    l.zj_cam_enum.restype = ctypes.c_int
    l.zj_cam_enum.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int,
    ]
    l.zj_cam_open.restype = ctypes.c_void_p
    l.zj_cam_open.argtypes = [ctypes.c_char_p] + [ctypes.c_uint32] * 5
    l.zj_cam_read.restype = ctypes.c_long
    l.zj_cam_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
    l.zj_cam_close.restype = None
    l.zj_cam_close.argtypes = [ctypes.c_void_p]
